"""Declared query surface. Importing this package registers every
query module into REGISTRY (consumed by __spark_entry__.py and bench)."""

from .registry import REGISTRY, QuerySpec

from . import feature_store_q  # noqa: E402,F401
from . import relational_q  # noqa: E402,F401
from . import relational2_q  # noqa: E402,F401
from . import relational3_q  # noqa: E402,F401
from . import relational4_q  # noqa: E402,F401
from . import relational5_q  # noqa: E402,F401
from . import relational6_q  # noqa: E402,F401
from . import events_q  # noqa: E402,F401
from . import text_q  # noqa: E402,F401
from . import similarity_q  # noqa: E402,F401
from . import functions_q  # noqa: E402,F401

__all__ = ["REGISTRY", "QuerySpec"]

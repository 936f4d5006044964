from .ingest import StreamingIngest
from .stateful import running_user_features
from .windows import session_agg, sliding_agg, tumbling_agg

__all__ = [
    "StreamingIngest",
    "running_user_features",
    "session_agg",
    "sliding_agg",
    "tumbling_agg",
]

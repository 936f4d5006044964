from .ingest import StreamingIngest
from .windows import session_agg, sliding_agg, tumbling_agg

__all__ = ["StreamingIngest", "session_agg", "sliding_agg", "tumbling_agg"]

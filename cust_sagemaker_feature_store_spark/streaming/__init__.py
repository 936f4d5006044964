from .ingest import StreamingIngest
from .joins import purchase_click_attribution
from .stateful import running_user_features
from .windows import session_agg, sliding_agg, stream_dedup, tumbling_agg

__all__ = [
    "StreamingIngest",
    "purchase_click_attribution",
    "running_user_features",
    "session_agg",
    "sliding_agg",
    "stream_dedup",
    "tumbling_agg",
]

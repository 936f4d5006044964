from .ingest import StreamingIngest
from .joins import enrich_with_features, purchase_click_attribution
from .stateful import running_user_features
from .windows import session_agg, sliding_agg, stream_dedup, tumbling_agg

__all__ = [
    "StreamingIngest",
    "enrich_with_features",
    "purchase_click_attribution",
    "running_user_features",
    "session_agg",
    "sliding_agg",
    "stream_dedup",
    "tumbling_agg",
]

from .ingest import StreamingIngest
from .joins import enrich_with_features, purchase_click_attribution
from .stateful import (
    HDFS_STATE_PROVIDER,
    ROCKSDB_STATE_PROVIDER,
    running_user_features,
    running_user_features_tws,
    set_state_store_provider,
    tws_available,
)
from .windows import session_agg, sliding_agg, stream_dedup, tumbling_agg

__all__ = [
    "StreamingIngest",
    "enrich_with_features",
    "purchase_click_attribution",
    "running_user_features",
    "running_user_features_tws",
    "tws_available",
    "set_state_store_provider",
    "HDFS_STATE_PROVIDER",
    "ROCKSDB_STATE_PROVIDER",
    "session_agg",
    "sliding_agg",
    "stream_dedup",
    "tumbling_agg",
]

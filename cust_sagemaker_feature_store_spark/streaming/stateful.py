"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.9 [EXT]).

The windowed aggregates in windows.py cover everything expressible as
watermark + groupBy(window); this module covers what is NOT — arbitrary
per-key state machines. The example operator maintains *running* user
feature state (event count, exact value total, last event time) across
micro-batches: the streaming analog of the online store's
latest-per-key rule generalized from "keep the last record" to "keep a
computed feature vector".

Scale notes: state lives in the state store partitioned by key (same
hash layout as any groupBy shuffle), each key's state is O(1) bytes,
and every micro-batch touches only keys present in that batch. Exact
integer cents (the dsum discipline) keep totals deterministic across
batch boundaries, so a stream replay equals the batch computation
bit-for-bit — asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

# Public Spark state-store providers (spark.sql.streaming.stateStore.
# providerClass, Spark 3.2+). The default HDFS-backed provider keeps
# every key's state as JVM objects on the executor heap — fine for the
# fixture, but at 100M+ keys state competes with execution memory and
# GC. RocksDB keeps state off-heap on local SSD with only block-cache
# + memtable in memory, which is the provider a 100 TB deployment runs.
HDFS_STATE_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
)
ROCKSDB_STATE_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def set_state_store_provider(spark, provider: str) -> str:
    """Select the state store for subsequently STARTED streaming queries
    (running queries keep the provider they started with — Spark pins it
    in the checkpoint). Returns the previous provider class so callers
    can restore it. For RocksDB, changelog checkpointing is enabled too:
    per-batch uploads become the delta log instead of full SST snapshots
    — the setting that keeps commit latency flat as state grows.

    Restart caveat (measured, r6): the provider is pinned in the
    checkpoint at the query's FIRST start, and a resume under a
    different session conf SILENTLY keeps the original provider — the
    resumed query runs correctly, but the conf change is ignored (the
    executor logs still show the original provider class). So this
    toggle only takes effect on fresh checkpoints; migrating providers
    means a new checkpoint + replay. Both providers produce
    bit-identical results for the same input (the state *format*
    changes, the semantics don't — asserted across a restart in
    test_streaming.py).
    """
    if provider not in (HDFS_STATE_PROVIDER, ROCKSDB_STATE_PROVIDER):
        raise ValueError(f"unknown state store provider: {provider}")
    conf = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(conf, HDFS_STATE_PROVIDER)
    spark.conf.set(conf, provider)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true" if provider == ROCKSDB_STATE_PROVIDER else "false",
    )
    return prev


RUNNING_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("last_ts", TimestampType()),
    ]
)

# state tuple: (n_events, value_cents, last_ts_micros)
RUNNING_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("cents", LongType()),
        StructField("last_us", LongType()),
    ]
)


def _fold_events(
    n: int, cents: int, last_us: int | None, pdf: pd.DataFrame
) -> tuple[int, int, int | None]:
    """The single state-update rule both execution modes share: fold one
    Arrow batch of a key's events into (n, cents, last_us). Null values
    contribute no cents (SQL SUM semantics); rounding follows the dsum
    cents discipline."""
    n += len(pdf)
    vals = pdf["value"].dropna()
    cents += int((vals * 100).round().astype("int64").sum())
    ts = pdf["ts"].dropna()
    if len(ts):
        batch_us = int(ts.max().value // 1000)  # pandas ns -> us
        last_us = batch_us if last_us is None or batch_us > last_us else last_us
    return n, cents, last_us


def _state_row(key: tuple, n: int, cents: int, last_us: int | None) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [cents / 100.0],
            "last_ts": [pd.Timestamp(last_us * 1000) if last_us is not None else pd.NaT],
        }
    )


def _update_user_state(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, cents, last_us = state.get if state.exists else (0, 0, None)
    for pdf in pdfs:
        n, cents, last_us = _fold_events(n, cents, last_us, pdf)
    state.update((n, cents, last_us))
    yield _state_row(key, n, cents, last_us)


def running_user_features(stream: DataFrame) -> DataFrame:
    """Per-user running (count, exact total, last event time), one
    output row per key per micro-batch that saw the key."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        stateStructType=RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_features_batch(df: DataFrame) -> DataFrame:
    """Batch twin of `running_user_features`: the FINAL state every key
    would hold after the whole frame streamed through — computed by the
    SAME `_fold_events` rule via applyInPandas, so the DuckDB oracle
    pinning this twin (queries/events_q.stream_running_features_twin)
    is evidence about the stateful operator's actual update logic, not
    a reimplementation. Equivalence of the streaming execution itself
    (state round-trip across micro-batches, restarts) is pinned by
    tests/test_streaming.py."""

    def final_state(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return _state_row(key, *_fold_events(0, 0, None, pdf))

    return df.groupBy("user_id").applyInPandas(
        final_state, schema=RUNNING_OUTPUT_SCHEMA
    )


# -- transformWithStateInPandas (Spark 4 arbitrary-state API) -----------
#
# The successor API to applyInPandasWithState (SPARK-45939, public
# Spark 4): typed per-key state handles (value/list/map), timers, and
# composability. `running_user_features_tws` is the SAME operator as
# `running_user_features`, expressed on the new API and sharing
# `_fold_events`, so the two execution paths are pinned equal by
# tests/test_streaming.py — an engine upgrade path, not a rewrite.


def _make_running_processor():
    """Build the StatefulProcessor class lazily (the import lives in
    pyspark.sql.streaming.stateful_processor, present from Spark 4)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningUserFeatures(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("running", RUNNING_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, cents, last_us = (
                self._state.get() if self._state.exists() else (0, 0, None)
            )
            for pdf in rows:
                n, cents, last_us = _fold_events(n, cents, last_us, pdf)
            self._state.update((n, cents, last_us))
            yield _state_row(key, n, cents, last_us)

        def close(self) -> None:
            pass

    return RunningUserFeatures()


def tws_available() -> bool:
    """transformWithStateInPandas moves state over a protobuf side
    channel (pyspark.sql.streaming.proto.StateMessage_pb2); this
    container's google.protobuf install is broken (`descriptor` not
    importable — env gate re-verified r7, 2026-08-14, same class as
    the Avro-jar and media-decode gates). The operator is complete and
    its equivalence test runs wherever protobuf works; here it skips."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_user_features_tws(stream: DataFrame) -> DataFrame:
    """`running_user_features` on the transformWithStateInPandas API:
    identical per-key semantics (shared `_fold_events` fold), typed
    ValueState instead of the tuple GroupState. Same state-store
    scaling story (hash-partitioned by key, O(1) bytes/key, RocksDB
    provider applies — see set_state_store_provider)."""
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs a working google.protobuf "
            "(see tws_available); use running_user_features "
            "(applyInPandasWithState) — identical semantics."
        )
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_running_processor(),
        outputStructType=RUNNING_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )

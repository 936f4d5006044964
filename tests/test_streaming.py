"""Streaming ingest + windowed aggregation tests (SURVEY.md §2.9).

The dual-store contract under micro-batched arrival: offline history
equals total input (append-only), online snapshot equals the batch
latest-view over the same records — i.e. streaming and batch ingest are
semantically indistinguishable, including out-of-order arrival across
micro-batches.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from cust_sagemaker_feature_store_spark.core import FeatureDefinition, FeatureGroup
from cust_sagemaker_feature_store_spark.operators.latest import latest_snapshot_window
from cust_sagemaker_feature_store_spark.streaming import (
    StreamingIngest,
    session_agg,
    sliding_agg,
    tumbling_agg,
)

GROUP = FeatureGroup(
    name="StreamedTransactions",
    record_identifier="customer_id",
    event_time_feature="event_time",
    features=(
        FeatureDefinition("customer_id", "Integral"),
        FeatureDefinition("event_time", "String"),
        FeatureDefinition("latest_purchase_value", "Fractional"),
        FeatureDefinition("latest_loyalty_score", "Fractional"),
    ),
)

# three files = three micro-batches (maxFilesPerTrigger=1); batch 3
# carries a LATE record for key 1 (older than batch 1's) — it must land
# offline but not change the online snapshot
BATCHES = [
    [
        "customer_id,event_time,latest_purchase_value,latest_loyalty_score",
        "1,2022-03-01T00:00:00Z,20.0,0.6",
        "2,2022-02-01T12:00:00Z,30.0,0.7",
    ],
    [
        "customer_id,event_time,latest_purchase_value,latest_loyalty_score",
        "2,2022-02-01T12:00:00Z,31.0,0.8",  # tie -> later batch wins
        "3,2022-05-05T05:05:05Z,40.0,0.9",
    ],
    [
        "customer_id,event_time,latest_purchase_value,latest_loyalty_score",
        "1,2022-01-02T07:43:18Z,10.0,0.5",  # late for key 1
    ],
]


def test_streaming_dual_store(spark, tmp_path):
    input_dir = tmp_path / "incoming"
    input_dir.mkdir()
    for i, lines in enumerate(BATCHES):
        p = input_dir / f"batch_{i}.csv"
        p.write_text("\n".join(lines) + "\n")
        # Spark's file source orders micro-batches by modification time;
        # pin distinct mtimes so arrival order == intended batch order
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    ingest = StreamingIngest(spark, GROUP, str(input_dir), str(tmp_path / "store"))
    q = ingest.start(trigger_once=True)
    q.awaitTermination(120)

    # offline history is append-only: every input record present
    offline = ingest.offline_store()
    assert offline.count() == 5

    # online snapshot == batch latest-view over the full history
    snap = {r["customer_id"]: r for r in ingest.online_snapshot().collect()}
    assert len(snap) == 3
    assert snap[1]["latest_purchase_value"] == 20.0  # late record ignored
    assert snap[2]["latest_purchase_value"] == 31.0  # tie -> later batch won
    assert snap[3]["latest_purchase_value"] == 40.0

    batch_equiv = latest_snapshot_window(
        offline, "customer_id", "event_time", tie_breaker="ingest_seq"
    ).select(*GROUP.feature_names)
    assert sorted(map(tuple, batch_equiv.collect())) == sorted(
        map(tuple, ingest.online_snapshot().collect())
    )

    # exactly-once restart: re-running the stream over the same input
    # (same checkpoint) must not duplicate history
    q2 = ingest.start(trigger_once=True)
    q2.awaitTermination(120)
    assert ingest.offline_store().count() == 5


def _event_stream(spark, tmp_path):
    rows = [
        "event_id,ts,user_id,event_type,value",
        "1,2024-01-01 00:05:00,1,click,10.00",
        "2,2024-01-01 00:20:00,1,click,5.00",
        "3,2024-01-01 01:10:00,1,purchase,100.00",
        "4,2024-01-01 00:30:00,2,view,1.00",
    ]
    d = tmp_path / "events_in"
    d.mkdir()
    (d / "e.csv").write_text("\n".join(rows) + "\n")
    return spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).csv(str(d), header=True)


def test_streaming_tumbling_window(spark, tmp_path):
    stream = _event_stream(spark, tmp_path)
    agg = tumbling_agg(stream, window_size="1 hour", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbling_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    assert got[("2024-01-01 00:00:00", "click")] == (2, 15.0)
    assert got[("2024-01-01 01:00:00", "purchase")] == (1, 100.0)
    assert got[("2024-01-01 00:00:00", "view")] == (1, 1.0)


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Duplicate event_ids delivered twice (at-least-once source) are
    emitted once."""
    from cust_sagemaker_feature_store_spark.streaming import stream_dedup

    rows = [
        "event_id,ts,user_id,event_type,value",
        "1,2024-01-01 00:05:00,1,click,10.0",
        "1,2024-01-01 00:05:00,1,click,10.0",  # exact redelivery
        "2,2024-01-01 00:06:00,1,view,1.0",
        "1,2024-01-01 00:07:00,1,click,10.0",  # same id, later arrival
    ]
    d = tmp_path / "dedup_in"
    d.mkdir()
    (d / "e.csv").write_text("\n".join(rows) + "\n")
    ev = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).csv(str(d), header=True)
    q = (
        stream_dedup(ev, keys=("event_id",), watermark="1 hour")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [r["event_id"] for r in spark.sql("SELECT * FROM dedup_out").collect()]
    assert sorted(got) == [1, 2]


def test_stream_stream_join_attribution(spark, tmp_path):
    """Watermarked stream-stream join: purchases attributed to clicks by
    the same user within a 10-minute window."""
    from cust_sagemaker_feature_store_spark.streaming import (
        purchase_click_attribution,
    )

    rows = [
        "event_id,ts,user_id,event_type,value",
        "1,2024-01-01 00:05:00,1,click,0.0",
        "2,2024-01-01 00:12:00,1,purchase,50.0",  # within 10m of click 1
        "3,2024-01-01 00:40:00,1,purchase,60.0",  # no click within 10m
        "4,2024-01-01 00:30:00,2,click,0.0",
        "5,2024-01-01 00:31:00,2,purchase,70.0",  # within 10m of click 4
    ]
    d = tmp_path / "attr_in"
    d.mkdir()
    (d / "e.csv").write_text("\n".join(rows) + "\n")
    ev = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).csv(str(d), header=True)
    out = purchase_click_attribution(
        ev.filter(F.col("event_type") == "purchase"),
        ev.filter(F.col("event_type") == "click"),
        window="10 minutes",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("attr_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["purchase_id"], r["click_id"]) for r in spark.sql("SELECT * FROM attr_out").collect()
    }
    assert got == {(2, 1), (5, 4)}  # purchase 3 unattributed (inner join)


def test_streaming_sliding_window(spark, tmp_path):
    stream = _event_stream(spark, tmp_path)
    agg = sliding_agg(stream, window_size="1 hour", slide="30 minutes", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("sliding_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["window_start"]), r["user_id"]): r["n_events"]
        for r in spark.sql("SELECT * FROM sliding_out").collect()
    }
    # user 1 events at 00:05, 00:20, 01:10; 1h windows sliding by 30m:
    # window [23:30,00:30) sees 2, [00:00,01:00) sees 2, [01:00,02:00) sees 1
    assert got[("2023-12-31 23:30:00", 1)] == 2
    assert got[("2024-01-01 00:00:00", 1)] == 2
    assert got[("2024-01-01 01:00:00", 1)] == 1
    assert got[("2024-01-01 00:00:00", 2)] == 1


def test_stateful_running_features(spark, tmp_path):
    """applyInPandasWithState keeps exact per-user running totals across
    micro-batches; the final state equals the batch computation."""
    from cust_sagemaker_feature_store_spark.streaming import running_user_features

    d = tmp_path / "stateful_in"
    d.mkdir()
    batches = [
        ["event_id,ts,user_id,event_type,value",
         "1,2024-01-01 00:05:00,1,click,10.25",
         "2,2024-01-01 00:20:00,2,view,1.10"],
        ["event_id,ts,user_id,event_type,value",
         "3,2024-01-01 01:10:00,1,purchase,100.03",
         "4,2024-01-01 01:30:00,1,click,0.02"],
    ]
    for i, lines in enumerate(batches):
        p = d / f"b{i}.csv"
        p.write_text("\n".join(lines) + "\n")
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).option("maxFilesPerTrigger", 1).csv(str(d), header=True)
    q = (
        running_user_features(stream)
        .writeStream.format("memory")
        .queryName("stateful_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM stateful_out").collect()
    # last emitted row per user is the running state after its last batch
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            final[r["user_id"]] = r
    assert final[1]["n_events"] == 3
    assert final[1]["total_value"] == 110.30  # exact cents, no FP drift
    assert str(final[1]["last_ts"]) == "2024-01-01 01:30:00"
    assert final[2]["n_events"] == 1
    assert final[2]["total_value"] == 1.10


def test_streaming_session_window(spark, tmp_path):
    stream = _event_stream(spark, tmp_path)
    agg = session_agg(stream, gap="30 minutes", watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("session_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM session_out").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    # user 1: events at 00:05 and 00:20 chain one session (gap < 30m);
    # 01:10 starts a new one
    assert len(by_user[1]) == 2
    assert sorted(s["n_events"] for s in by_user[1]) == [1, 2]
    assert len(by_user[2]) == 1


def test_stream_static_feature_enrichment(spark, tmp_path):
    """Stream-static serving join: live events pick up the online
    snapshot's latest features; unseen keys keep nulls."""
    from cust_sagemaker_feature_store_spark.streaming import enrich_with_features

    snap = spark.createDataFrame(
        [(1, 0.9, 20.0), (2, 0.5, 30.0)],
        "user_id long, loyalty double, last_purchase double",
    )
    snap_dir = tmp_path / "snap"
    snap.write.parquet(str(snap_dir))
    stream = _event_stream(spark, tmp_path)  # users 1 and 2 (+1 again)
    enriched = enrich_with_features(
        stream, spark.read.parquet(str(snap_dir)), on="user_id"
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM enrich_out").collect()
    assert len(rows) == 4  # every event passes through (left join)
    by_event = {r["event_id"]: r for r in rows}
    assert by_event[1]["loyalty"] == 0.9
    assert by_event[4]["loyalty"] == 0.5
    # feature_cols projection + null for a key absent from the snapshot
    snap2 = snap.filter(F.col("user_id") == 1)
    (tmp_path / "b").mkdir()
    enriched2 = enrich_with_features(
        _event_stream(spark, tmp_path / "b"), snap2, on="user_id",
        feature_cols=["loyalty"],
    )
    q2 = (
        enriched2.writeStream.format("memory")
        .queryName("enrich_out2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    rows2 = spark.sql("SELECT * FROM enrich_out2").collect()
    assert "last_purchase" not in rows2[0].asDict()
    assert {r["loyalty"] for r in rows2 if r["user_id"] == 2} == {None}


def test_streaming_tombstones(spark, tmp_path):
    """CDC-style streaming deletes: a later-event-time tombstone removes
    the key from the serving view, stays in offline history, and a still
    later re-ingest resurrects the key — same semantics as the batch
    delete_record path."""
    batches = [
        [
            "customer_id,event_time,latest_purchase_value,latest_loyalty_score,is_deleted",
            "1,2022-03-01T00:00:00Z,20.0,0.6,false",
            "2,2022-02-01T12:00:00Z,30.0,0.7,",  # empty flag -> false
        ],
        [
            "customer_id,event_time,latest_purchase_value,latest_loyalty_score,is_deleted",
            "1,2022-04-01T00:00:00Z,,,true",  # tombstone, later event time
            "3,2022-01-05T00:00:00Z,40.0,0.9,false",
        ],
        [
            "customer_id,event_time,latest_purchase_value,latest_loyalty_score,is_deleted",
            "1,2022-05-01T00:00:00Z,99.0,1.0,false",  # resurrect
        ],
    ]
    input_dir = tmp_path / "incoming"
    input_dir.mkdir()
    for i, lines in enumerate(batches):
        p = input_dir / f"batch_{i}.csv"
        p.write_text("\n".join(lines) + "\n")
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    ingest = StreamingIngest(
        spark, GROUP, str(input_dir), str(tmp_path / "store"), with_tombstones=True
    )
    # stop after the tombstone batch first: key 1 must be gone
    q = ingest.start(trigger_once=True)
    q.awaitTermination(120)
    snap = {r["customer_id"]: r for r in ingest.online_snapshot().collect()}
    assert set(snap) == {1, 2, 3}  # batch 3 already resurrected key 1
    assert snap[1]["latest_purchase_value"] == 99.0
    # offline history keeps every record including the tombstone
    offline = ingest.offline_store()
    assert offline.count() == 5
    assert offline.filter(F.col("is_deleted")).count() == 1
    # replay the tombstone scenario without the resurrect batch
    input_dir2 = tmp_path / "incoming2"
    input_dir2.mkdir()
    for i, lines in enumerate(batches[:2]):
        p = input_dir2 / f"batch_{i}.csv"
        p.write_text("\n".join(lines) + "\n")
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    ingest2 = StreamingIngest(
        spark, GROUP, str(input_dir2), str(tmp_path / "store2"), with_tombstones=True
    )
    q2 = ingest2.start(trigger_once=True)
    q2.awaitTermination(120)
    snap2 = {r["customer_id"] for r in ingest2.online_snapshot().collect()}
    assert snap2 == {2, 3}  # key 1 suppressed by its tombstone


def test_streaming_incremental_agg_equals_batch(spark, tmp_path):
    # Maintain per-key aggregate partials across micro-batches by
    # merging each batch's partials into a running checkpointed state
    # (operators/incremental.py) — the O(batch) aggregate-refresh shape.
    # The finalized stream state must equal a one-pass batch aggregate
    # over the union of all input, including keys split across batches.
    from pyspark.sql import types as T

    from cust_sagemaker_feature_store_spark.operators.incremental import (
        agg_partials,
        finalize_partials,
        merge_partials,
    )

    input_dir = tmp_path / "agg_in"
    input_dir.mkdir()
    batches = [
        ["1,10.5", "2,3.25", "1,-4.0"],
        ["2,8.125", "3,0.5"],
        ["1,2.0", "3,-1.75", "4,100.0"],
    ]
    for i, lines in enumerate(batches):
        p = input_dir / f"b{i}.csv"
        p.write_text("\n".join(lines) + "\n")
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    state = {"partials": None, "n_batches": 0}

    def sink(batch, batch_id):
        p = agg_partials(batch, "k", "v")
        merged = (
            p if state["partials"] is None else merge_partials(state["partials"], p)
        )
        state["partials"] = merged.localCheckpoint(eager=True)
        state["n_batches"] += 1

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .csv(str(input_dir))
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert state["n_batches"] == 3  # one merge per micro-batch

    streamed = finalize_partials(state["partials"], "v")
    direct = finalize_partials(
        agg_partials(spark.read.schema(schema).csv(str(input_dir)), "k", "v"), "v"
    )
    assert sorted(map(tuple, streamed.collect())) == sorted(
        map(tuple, direct.collect())
    )


def _run_stateful_two_phase(spark, root, provider_name, provider):
    """Start the running-features stream on batch 0, stop, add batch 1,
    RESTART from the same checkpoint — the mid-stream recovery path —
    under the given state store provider. Returns {user_id: row} of the
    final emitted state per user."""
    from cust_sagemaker_feature_store_spark.streaming import (
        running_user_features,
        set_state_store_provider,
    )

    d = root / f"in_{provider_name}"
    d.mkdir()
    ckpt = str(root / f"ckpt_{provider_name}")
    batches = [
        ["event_id,ts,user_id,event_type,value",
         "1,2024-01-01 00:05:00,1,click,10.25",
         "2,2024-01-01 00:20:00,2,view,1.10"],
        ["event_id,ts,user_id,event_type,value",
         "3,2024-01-01 01:10:00,1,purchase,100.03",
         "4,2024-01-01 01:30:00,1,click,0.02"],
    ]

    def write_batch(i):
        p = d / f"b{i}.csv"
        p.write_text("\n".join(batches[i]) + "\n")
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    prev = set_state_store_provider(spark, provider)
    try:
        rows = []

        def sink(batch_df, batch_id):
            rows.extend(batch_df.collect())

        for phase in (0, 1):
            write_batch(phase)
            # memory sink can't recover from a checkpoint; foreachBatch
            # can — and it's the sink the dual-store ingest runs anyway
            q = (
                running_user_features(
                    spark.readStream.schema(
                        "event_id long, ts timestamp, user_id long, "
                        "event_type string, value double"
                    ).option("maxFilesPerTrigger", 1).csv(str(d), header=True)
                )
                .writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            q.stop()
        final = {}
        for r in rows:
            cur = final.get(r["user_id"])
            if cur is None or r["n_events"] > cur["n_events"]:
                final[r["user_id"]] = r
        return final
    finally:
        set_state_store_provider(spark, prev)


def test_stateful_restart_equivalence_under_both_state_stores(spark, tmp_path):
    """The stateful operator must recover per-key state across a full
    stop/restart under BOTH public state store providers — the default
    HDFS-backed one and RocksDB (the off-heap provider a 100M-key
    deployment runs, see SCALING.md) — and produce identical final
    state. Provider choice is an executor-storage concern, never a
    semantics one."""
    from cust_sagemaker_feature_store_spark.streaming import (
        HDFS_STATE_PROVIDER,
        ROCKSDB_STATE_PROVIDER,
    )

    finals = {}
    for name, provider in (
        ("hdfs", HDFS_STATE_PROVIDER),
        ("rocksdb", ROCKSDB_STATE_PROVIDER),
    ):
        finals[name] = _run_stateful_two_phase(spark, tmp_path, name, provider)

    for final in finals.values():
        # state carried across the restart: batch-1 events folded INTO
        # batch-0 state, not a fresh count
        assert final[1]["n_events"] == 3
        assert final[1]["total_value"] == 110.30
        assert str(final[1]["last_ts"]) == "2024-01-01 01:30:00"
        assert final[2]["n_events"] == 1
    as_tuples = {
        name: sorted((k, r["n_events"], r["total_value"]) for k, r in f.items())
        for name, f in finals.items()
    }
    assert as_tuples["hdfs"] == as_tuples["rocksdb"]


def test_transform_with_state_matches_apply_in_pandas_with_state(spark, tmp_path):
    """The Spark-4 transformWithStateInPandas path must produce the
    same final per-key state as the applyInPandasWithState path over
    the same micro-batched input — both fold through the shared
    `_fold_events` rule, so a divergence means the state plumbing
    (not the math) broke."""
    import pytest

    from cust_sagemaker_feature_store_spark.streaming import (
        running_user_features_tws,
    )
    from cust_sagemaker_feature_store_spark.streaming.stateful import (
        tws_available,
    )

    if not tws_available():
        # env gate: this container's google.protobuf lacks `descriptor`
        # (transformWithStateInPandas's state side channel) — assert the
        # gate raises the documented error, then skip the equivalence run
        with pytest.raises(NotImplementedError, match="protobuf"):
            running_user_features_tws(
                spark.readStream.schema(
                    "event_id long, ts timestamp, user_id long, "
                    "event_type string, value double"
                ).csv(str(tmp_path), header=True)
            )
        pytest.skip("google.protobuf broken in this env (tws_available)")

    d = tmp_path / "tws_in"
    d.mkdir()
    batches = [
        ["event_id,ts,user_id,event_type,value",
         "1,2024-01-01 00:05:00,1,click,10.25",
         "2,2024-01-01 00:20:00,2,view,1.10"],
        ["event_id,ts,user_id,event_type,value",
         "3,2024-01-01 01:10:00,1,purchase,100.03",
         "4,2024-01-01 01:30:00,1,click,0.02"],
    ]
    for i, lines in enumerate(batches):
        p = d / f"b{i}.csv"
        p.write_text("\n".join(lines) + "\n")
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).option("maxFilesPerTrigger", 1).csv(str(d), header=True)
    q = (
        running_user_features_tws(stream)
        .writeStream.format("memory")
        .queryName("tws_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM tws_out").collect()
    final = {}
    for r in rows:
        cur = final.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            final[r["user_id"]] = r
    # identical expectations to test_stateful_running_features (the
    # applyInPandasWithState twin over the same batches)
    assert final[1]["n_events"] == 3
    assert final[1]["total_value"] == 110.30
    assert str(final[1]["last_ts"]) == "2024-01-01 01:30:00"
    assert final[2]["n_events"] == 1
    assert final[2]["total_value"] == 1.10


def test_stream_interval_join_restart_matches_batch(spark, tmp_path):
    """The stream-stream interval join must deliver EXACTLY the batch
    range join's pairs across a full stop/checkpoint/restart: the
    buffered side recovers from the state store, so pairs spanning the
    restart boundary (batch-1 next events joining batch-0 first
    events) appear exactly once — no loss, no duplication."""
    from cust_sagemaker_feature_store_spark.streaming.joins import event_followups

    d = tmp_path / "ij_in"
    d.mkdir()
    ckpt = str(tmp_path / "ij_ckpt")
    header = "event_id,ts,user_id,event_type,value"
    batches = [
        [header,
         "1,2024-01-01 00:00:00,1,click,1.0",
         "2,2024-01-01 00:04:00,1,view,1.0",      # pair (1,2) in-batch
         "3,2024-01-01 00:00:30,2,click,1.0"],
        [header,
         "4,2024-01-01 00:08:00,1,purchase,5.0",  # pairs (1,4),(2,4) ACROSS restart
         "5,2024-01-01 00:09:00,2,purchase,2.0",  # pair (3,5) across restart
         "6,2024-01-01 00:30:00,2,view,1.0"],     # >10min after 3/5: no pair
    ]
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )

    got = []

    def sink(batch_df, batch_id):
        got.extend(batch_df.collect())

    for phase in (0, 1):
        p = d / f"b{phase}.csv"
        p.write_text("\n".join(batches[phase]) + "\n")
        os.utime(p, (1_700_000_000 + phase * 60, 1_700_000_000 + phase * 60))
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .csv(str(d), header=True)
        )
        q = (
            event_followups(src, src, window="10 minutes")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    ev = spark.read.schema(schema).csv(str(d), header=True)
    want = event_followups(ev, ev, window="10 minutes").collect()
    key = lambda r: (r["user_id"], r["first_id"], r["next_id"])  # noqa: E731
    assert sorted(map(key, got)) == sorted(map(key, want))
    # the cross-restart pairs specifically must exist exactly once
    got_keys = [key(r) for r in got]
    for cross in ((1, 1, 4), (1, 2, 4), (2, 3, 5)):
        assert got_keys.count(cross) == 1, (cross, got_keys)
    assert (2, 3, 6) not in got_keys  # outside the 10-minute window


def test_streaming_count_min_counters_equal_batch(spark, tmp_path):
    """CMS counters maintained as a streaming aggregation equal the
    batch counters over the same rows — delivered across multiple
    micro-batches (maxFilesPerTrigger=1), so cross-batch state
    accumulation, not just single-pass counting, is what's verified.
    State is exactly depth x width cells regardless of row count."""
    from cust_sagemaker_feature_store_spark.queries.functions_q import (
        CMS_A,
        CMS_B,
        CMS_PRIME,
        CMS_WIDTH,
    )
    from cust_sagemaker_feature_store_spark.streaming.windows import (
        count_min_counters,
    )

    d = tmp_path / "cms_in"
    d.mkdir()
    rows = [(i, i % 7) for i in range(50)] + [(100 + i, 3) for i in range(20)]
    # two files = two micro-batches
    for bi, chunk in enumerate((rows[:30], rows[30:])):
        (d / f"b{bi}.csv").write_text(
            "event_id,user_id\n"
            + "\n".join(f"{e},{u}" for e, u in chunk)
            + "\n"
        )
    ev = spark.readStream.schema("event_id long, user_id long").option(
        "maxFilesPerTrigger", 1
    ).csv(str(d), header=True)
    q = (
        count_min_counters(ev, "user_id", CMS_A, CMS_B, CMS_PRIME, CMS_WIDTH)
        .writeStream.format("memory")
        .queryName("cms_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["i"], r["b"]): r["c"]
        for r in spark.sql("SELECT * FROM cms_out").collect()
    }
    batch = spark.createDataFrame(rows, "event_id long, user_id long")
    want = {
        (r["i"], r["b"]): r["c"]
        for r in count_min_counters(
            batch, "user_id", CMS_A, CMS_B, CMS_PRIME, CMS_WIDTH
        ).collect()
    }
    assert got == want
    # the hot key's estimate dominates: min over rows >= its true count
    est = min(
        got[(i, ((3 * CMS_A[i] + CMS_B[i]) % CMS_PRIME) % CMS_WIDTH)]
        for i in range(len(CMS_A))
    )
    true_hot = sum(1 for _, u in rows if u == 3)
    assert est >= true_hot


def test_stream_asof_enrich_restart_matches_batch(spark, tmp_path):
    """The stream-static as-of snapshot probe is stateless, so a
    checkpoint restart must reproduce EXACTLY the batch run — every
    probe enriched once, fresh/stale/missing branches all present —
    and rows arriving after the restart still probe the snapshot."""
    from pyspark.sql import Row
    from cust_sagemaker_feature_store_spark.streaming.joins import (
        enrich_asof_snapshot,
    )

    snap = spark.createDataFrame(
        [
            Row(user_id=1, feature_ts="2024-01-01 10:00:00", feature_value=1.5),
            Row(user_id=2, feature_ts="2024-01-01 00:00:00", feature_value=2.5),
            Row(user_id=3, feature_ts="2024-01-02 00:00:00", feature_value=3.5),
        ]
    ).select(
        "user_id",
        F.col("feature_ts").cast("timestamp").alias("feature_ts"),
        "feature_value",
    )
    d = tmp_path / "asof_in"
    d.mkdir()
    ckpt = str(tmp_path / "asof_ckpt")
    header = "purchase_id,purchase_ts,user_id"
    batches = [
        [header,
         "1,2024-01-01 12:00:00,1",   # fresh (2h old, within 6h)
         "2,2024-01-01 12:00:00,2"],  # stale (12h old)
        [header,
         "3,2024-01-01 12:00:00,3",   # future feature -> not fresh
         "4,2024-01-01 13:00:00,1",   # fresh, arrives AFTER restart
         "5,2024-01-01 13:00:00,9"],  # no snapshot row
    ]
    schema = "purchase_id long, purchase_ts timestamp, user_id long"

    got = []

    def sink(batch_df, batch_id):
        got.extend(batch_df.collect())

    for phase in (0, 1):
        p = d / f"b{phase}.csv"
        p.write_text("\n".join(batches[phase]) + "\n")
        os.utime(p, (1_700_000_000 + phase * 60, 1_700_000_000 + phase * 60))
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .csv(str(d), header=True)
        )
        q = (
            enrich_asof_snapshot(
                src, snap, on="user_id", event_ts="purchase_ts",
                staleness="6 hours",
            )
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    batch_src = spark.read.schema(schema).csv(str(d), header=True)
    want = enrich_asof_snapshot(
        batch_src, snap, on="user_id", event_ts="purchase_ts",
        staleness="6 hours",
    ).collect()
    key = lambda r: (  # noqa: E731
        r["purchase_id"], r["fresh"], r["feature_value"],
    )
    assert sorted(map(key, got)) == sorted(map(key, want))
    by_id = {r["purchase_id"]: r for r in got}
    assert len(got) == 5 and len(by_id) == 5  # exactly once, incl. restart
    assert by_id[1]["fresh"] and by_id[1]["feature_value"] == 1.5
    assert not by_id[2]["fresh"] and by_id[2]["feature_value"] is None
    assert not by_id[3]["fresh"]  # future-relative feature nulled
    assert by_id[4]["fresh"]      # post-restart row still enriched
    assert not by_id[5]["fresh"] and by_id[5]["feature_ts"] is None


def test_stream_dedup_index_restart_matches_batch(spark, tmp_path):
    """The streaming dedup-index maintainer must classify every doc
    against the index of strictly earlier micro-batches and keep the
    index current — across a checkpoint RESTART — exactly as the
    replay_epochs batch twin states declaratively. Exercises all
    three statuses: an exact duplicate of an earlier epoch's text, a
    near-dup (one-token change, shares band buckets), a within-batch
    duplicate (must be 'new' — same epoch is invisible), and fresh
    text."""
    from cust_sagemaker_feature_store_spark.streaming.dedup_index import (
        StreamingDedupIndex,
        replay_epochs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy dog again and once"
    other = "completely different words live here in this other text"
    header = "doc_id,text"
    batches = [
        [header, f'0,"{base}"', f'1,"{other}"', f'2,"{base}"'],  # 2: within-batch dup -> new
        [header, f'10,"{base}"', f'11,"{near}"'],                # exact + near
        [header, f'20,"{near}"', f'21,"more fresh text arrives after the restart"'],
    ]
    d = tmp_path / "dedup_idx_in"
    d.mkdir()
    root = str(tmp_path / "dedup_idx")
    idx = StreamingDedupIndex(spark, str(d), root)

    # epoch 0+1 before the restart, epoch 2 after
    for phase, todo in ((0, (0, 1)), (1, (2,))):
        for b in todo:
            p = d / f"b{b}.csv"
            p.write_text("\n".join(batches[b]) + "\n")
            os.utime(p, (1_700_000_000 + b * 60, 1_700_000_000 + b * 60))
        q = idx.start()
        q.awaitTermination(120)
        q.stop()

    got = {
        r["doc_id"]: (r["epoch"], r["status"])
        for r in idx.statuses().collect()
    }
    assert len(got) == 7  # exactly once per doc, across the restart
    assert got[0] == (0, "new") and got[1] == (0, "new")
    assert got[2] == (0, "new")  # within-batch dup: same epoch invisible
    assert got[10] == (1, "exact_dup")
    assert got[11] == (1, "near_dup")
    assert got[20] == (2, "exact_dup")  # near's text seen in epoch 1
    assert got[21] == (2, "new")  # post-restart fresh text

    # the batch twin (one declarative plan) agrees doc-for-doc
    rows = [
        (int(line.split(",", 1)[0]), line.split(",", 1)[1].strip('"'), e)
        for e, b in enumerate(batches)
        for line in b[1:]
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    epoch_of = {i: e for i, _, e in rows}
    twin = replay_epochs(
        docs,
        F.when(F.col("doc_id") < 10, 0)
        .when(F.col("doc_id") < 20, 1)
        .otherwise(2),
    )
    want = {
        r["doc_id"]: (r["epoch"], r["status"]) for r in twin.collect()
    }
    assert want == got
    assert all(epoch_of[i] == e for i, (e, _) in want.items())

    # the index is current: hashes/bands cover every epoch exactly once
    hashes = spark.read.parquet(os.path.join(root, "hashes"))
    assert hashes.select("epoch").distinct().count() == 3
    # base's content hash appears once per epoch that wrote it (0 and 1)
    assert (
        hashes.groupBy("h").count().agg(F.max("count")).head()[0] <= 2
    )


def test_stream_dedup_twin_matches_batch(spark, tmp_path):
    """Streaming dedup on the composite (user, type, minute) key emits
    exactly the batch-distinct key set — the equality the
    stream_dedup_twin oracle row certifies from the batch side."""
    from cust_sagemaker_feature_store_spark.streaming import stream_dedup

    rows = [
        "event_id,ts,user_id,event_type,value",
        "1,2024-01-01 00:05:10,1,click,10.0",
        "2,2024-01-01 00:05:40,1,click,11.0",  # same minute key
        "3,2024-01-01 00:06:00,1,click,1.0",   # next minute
        "4,2024-01-01 00:05:30,2,click,2.0",
        "5,2024-01-01 00:05:45,1,view,3.0",
    ]
    d = tmp_path / "dedup_twin_in"
    d.mkdir()
    (d / "e.csv").write_text("\n".join(rows) + "\n")
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    ev = (
        spark.readStream.schema(schema)
        .csv(str(d), header=True)
        .withColumn("minute_bucket", F.date_trunc("minute", "ts"))
    )
    q = (
        stream_dedup(
            ev, keys=("user_id", "event_type", "minute_bucket"), watermark="1 hour"
        )
        .writeStream.format("memory")
        .queryName("dedup_twin_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["event_type"], str(r["minute_bucket"]))
        for r in spark.sql("SELECT * FROM dedup_twin_out").collect()
    }
    batch = spark.createDataFrame(
        [tuple(r.split(",")) for r in rows[1:]], "a string, ts string, u string, t string, v string"
    ).select(
        F.col("u").cast("long").alias("user_id"),
        F.col("t").alias("event_type"),
        F.date_trunc("minute", F.col("ts").cast("timestamp")).alias("minute_bucket"),
    ).distinct()
    want = {
        (r["user_id"], r["event_type"], str(r["minute_bucket"]))
        for r in batch.collect()
    }
    assert got == want and len(got) == 4


def test_ivf_index_stream_equals_batch(spark, sf_dir, tmp_path):
    """The streaming IVF-index maintainer must assign every streamed
    vector under the FROZEN stored centroids and append it exactly
    once — across a checkpoint restart — bit-identically to the
    replay_ivf_epochs batch twin; and a probe over the maintained
    index (bulk epoch + streamed epochs) must equal the inline scoring
    path over the same assignment."""
    import os

    from cust_sagemaker_feature_store_spark.catalog import load_table
    from cust_sagemaker_feature_store_spark.operators import similarity as S
    from cust_sagemaker_feature_store_spark.streaming.ivf_index import (
        StreamingIvfIndex,
        replay_ivf_epochs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 4 == 0)
    root = str(tmp_path / "ivf_idx")
    S.build_ivf_index(base, root, n_lists=8)

    stream_rows = emb.filter(F.col("vec_id") % 4 != 0)
    d = tmp_path / "ivf_in"
    d.mkdir()
    idx = StreamingIvfIndex(spark, str(d) + "/*", root)
    schema = "vec_id long, embedding array<float>, label int"
    # two phases around a RESTART: files b1+b2 before, b3 after; the
    # checkpoint must resume past the processed files
    # (maxFilesPerTrigger=1 -> one micro-batch per file)
    for todo in ((1, 2), (3,)):
        for e in todo:
            p = str(d / f"b{e}.parquet")
            stream_rows.filter(F.col("vec_id") % 4 == e).coalesce(1).write.parquet(p)
            t = 1_700_000_000 + e * 60
            for f in os.listdir(p):
                os.utime(os.path.join(p, f), (t, t))
            os.utime(p, (t, t))
        q = idx.start(schema)
        q.awaitTermination(120)
        q.stop()

    got = idx.vectors().filter(F.col("epoch") >= 0)
    # exactly once per streamed vector, across the restart
    assert got.count() == stream_rows.count()
    assert got.select("vec_id").distinct().count() == stream_rows.count()
    # stream == batch twin, (vec_id, epoch->file order, cell) for all
    got_set = {
        (r["vec_id"], r["cell"]) for r in got.select("vec_id", "cell").collect()
    }
    twin = replay_ivf_epochs(
        spark, stream_rows, (F.col("vec_id") % 4) - 1, root
    )
    want_set = {(r["vec_id"], r["cell"]) for r in twin.collect()}
    assert got_set == want_set
    # probe over the FULL maintained index == inline scoring over the
    # same frozen assignment (bulk + streamed epochs together)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    cent = S.load_ivf_centroids(spark, root)
    cells = S._probe_order(cent, qv)[:4]
    want = S._score_cosine_topk(
        S._with_cells(emb, cent, "embedding")
        .withColumnRenamed("__cell", "cell")
        .filter(F.col("cell").isin(cells)),
        qv, 10, "vec_id", "embedding",
    ).collect()
    probe = S.probe_ivf_index(spark, root, qv, k=10, nprobe=4).collect()
    assert [tuple(r) for r in probe] == [tuple(r) for r in want]
    # compaction folds the streamed epochs into the bulk epoch without
    # changing any probe answer (bit-identical before/after)
    from cust_sagemaker_feature_store_spark.streaming.ivf_index import (
        compact_ivf_epochs,
    )

    assert compact_ivf_epochs(spark, root) == 3
    after = idx.vectors()
    assert [r["epoch"] for r in after.select("epoch").distinct().collect()] == [-1]
    assert after.count() == emb.count()
    probe2 = S.probe_ivf_index(spark, root, qv, k=10, nprobe=4).collect()
    assert [tuple(r) for r in probe2] == [tuple(r) for r in probe]
    assert compact_ivf_epochs(spark, root) == 0  # idempotent no-op


def test_ivfpq_index_stream_equals_batch(spark, sf_dir, tmp_path):
    """The streaming IVFADC maintainer must encode every streamed
    vector under the FROZEN stored quantizer (centroids + PQ
    codebooks) and append it exactly once — across a checkpoint
    restart — bit-identically to the replay_ivfpq_epochs batch twin;
    a probe over the maintained index (bulk + streamed epochs) must
    equal the inline ivfpq_topk over the union corpus under the same
    quantizer; and compaction must fold BOTH row tables (codes and
    raw vectors) without changing any probe answer."""
    import os

    from cust_sagemaker_feature_store_spark.catalog import load_table
    from cust_sagemaker_feature_store_spark.operators import similarity as S
    from cust_sagemaker_feature_store_spark.streaming.ivf_index import (
        StreamingIvfpqIndex,
        compact_ivf_epochs,
        replay_ivfpq_epochs,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 4 == 0)
    root = str(tmp_path / "ivfpq_idx")
    cent, books = S.build_ivfpq_index(base, root, n_lists=8)

    stream_rows = emb.filter(F.col("vec_id") % 4 != 0).select(
        "vec_id", "embedding"
    )
    d = tmp_path / "ivfpq_in"
    d.mkdir()
    idx = StreamingIvfpqIndex(spark, str(d) + "/*", root)
    schema = "vec_id long, embedding array<float>"
    # two phases around a RESTART: files b1+b2 before, b3 after
    for todo in ((1, 2), (3,)):
        for e in todo:
            p = str(d / f"b{e}.parquet")
            stream_rows.filter(F.col("vec_id") % 4 == e).coalesce(1).write.parquet(p)
            t = 1_700_000_000 + e * 60
            for f in os.listdir(p):
                os.utime(os.path.join(p, f), (t, t))
            os.utime(p, (t, t))
        q = idx.start(schema)
        q.awaitTermination(120)
        q.stop()

    got = idx.codes().filter(F.col("epoch") >= 0)
    # exactly once per streamed vector, across the restart, both tables
    assert got.count() == stream_rows.count()
    assert got.select("vec_id").distinct().count() == stream_rows.count()
    assert idx.vectors().filter(F.col("epoch") >= 0).count() == stream_rows.count()
    # stream == batch twin on (vec_id, epoch, cell, codes)
    got_set = {
        (r["vec_id"], r["epoch"], r["cell"], tuple(r["codes"]))
        for r in got.collect()
    }
    twin = replay_ivfpq_epochs(
        spark, stream_rows, (F.col("vec_id") % 4) - 1, root
    )
    want_set = {
        (r["vec_id"], r["epoch"], r["cell"], tuple(r["codes"]))
        for r in twin.collect()
    }
    assert got_set == want_set
    # probe over the FULL maintained index == inline IVFADC over the
    # union corpus under the same frozen quantizer
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    want = S.ivfpq_topk(
        emb, qv, k=10, n_lists=8, nprobe=4, rerank=60,
        cent=cent, codebooks=books,
    ).collect()
    probe = S.probe_ivfpq_index(spark, root, qv, k=10, nprobe=4, rerank=60).collect()
    assert [tuple(r) for r in probe] == [tuple(r) for r in want]
    # compaction folds BOTH tables' streamed epochs into the bulk epoch
    # without changing any probe answer (bit-identical before/after)
    assert compact_ivf_epochs(spark, root) == 3
    for tbl in (idx.codes(), idx.vectors()):
        assert [r["epoch"] for r in tbl.select("epoch").distinct().collect()] == [-1]
        assert tbl.count() == emb.count()
    probe2 = S.probe_ivfpq_index(spark, root, qv, k=10, nprobe=4, rerank=60).collect()
    assert [tuple(r) for r in probe2] == [tuple(r) for r in probe]
    assert compact_ivf_epochs(spark, root) == 0  # idempotent no-op


def test_retrain_ivfpq_index(spark, sf_dir, tmp_path):
    """Offline quantizer retrain over the accumulated epochs must (a)
    persist exactly the retrained quantizer (store round-trips the
    retrain_quantizer output bit-for-bit), (b) fold both row tables to
    the bulk epoch covering the FULL accumulated corpus, (c) leave the
    store probe-consistent: stored probe == inline ivfpq_topk over the
    union corpus under the retrained quantizer, and (d) not worsen
    total PQ distortion vs the seeded bulk-build quantizer."""
    import numpy as np

    from cust_sagemaker_feature_store_spark.catalog import load_table
    from cust_sagemaker_feature_store_spark.operators import similarity as S
    from cust_sagemaker_feature_store_spark.streaming.ivf_index import (
        StreamingIvfpqIndex,
        retrain_ivfpq_index,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 2 == 0)
    root = str(tmp_path / "ivfpq_retrain")
    cent0, books0 = S.build_ivfpq_index(base, root, n_lists=8)
    # one streamed epoch via the maintainer's own sink
    idx = StreamingIvfpqIndex(spark, str(tmp_path / "unused"), root)
    idx.process_batch(emb.filter(F.col("vec_id") % 2 == 1), 0)

    cent, books = retrain_ivfpq_index(spark, root)
    # (a) the store round-trips the retrained quantizer exactly
    assert np.array_equal(S.load_ivf_centroids(spark, root), cent)
    assert np.array_equal(S.load_pq_codebooks(spark, root), books)
    # (b) single bulk epoch, full corpus, in both row tables
    for tbl in (idx.codes(), idx.vectors()):
        assert [r["epoch"] for r in tbl.select("epoch").distinct().collect()] == [-1]
        assert tbl.count() == emb.count()
    # (c) stored probe == inline under the retrained quantizer
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    want = S.ivfpq_topk(
        emb, qv, k=10, n_lists=8, nprobe=4, rerank=60,
        cent=cent, codebooks=books,
    ).collect()
    probe = S.probe_ivfpq_index(spark, root, qv, k=10, nprobe=4, rerank=60).collect()
    assert [tuple(r) for r in probe] == [tuple(r) for r in want]
    # (d) retraining must not worsen the quantization objective
    d_new = S.pq_distortion(emb, cent, books)
    d_old = S.pq_distortion(emb, cent0, books0)
    assert d_new <= d_old + max(1, d_old // 10**9)
    # clean publish: version dirs + markers are the LAYOUT now, but no
    # staged (.__retrain__) or legacy-era (.__old__) leftovers, no
    # retired legacy table dirs, and every table resolves to a
    # published version
    import os

    from cust_sagemaker_feature_store_spark.streaming._fsutil import resolve

    entries = [e for e in os.listdir(root) if e != "_checkpoint"]
    assert not [e for e in entries if "__retrain__" in e or "__old__" in e]
    paths = S._index_paths(root)
    for p in paths.values():
        assert os.path.basename(p) not in entries  # legacy dirs retired
        cur = resolve(spark, p)
        assert cur != p and "__v" in cur and os.path.isdir(cur)


def test_dedup_index_compaction_preserves_classification(spark, tmp_path):
    """Folding the dedup index's epochs must (a) shrink or keep the
    entry count (cross-epoch duplicates collapse), (b) preserve the
    classification every FUTURE batch computes (`epoch < B` reads see
    the same hash/bucket sets), and (c) be an idempotent no-op when
    already compact."""
    import os

    from cust_sagemaker_feature_store_spark.operators.dedup import (
        incremental_dedup_status,
    )
    from cust_sagemaker_feature_store_spark.streaming.dedup_index import (
        StreamingDedupIndex,
        compact_dedup_epochs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different words live here in this other text"
    header = "doc_id,text"
    batches = [
        [header, f'0,"{base}"', f'1,"{other}"'],
        [header, f'10,"{base}"'],  # repeats epoch 0's text -> dup entries
        [header, f'20,"{other}"'],
    ]
    d = tmp_path / "cmp_idx_in"
    d.mkdir()
    for b, lines in enumerate(batches):
        p = d / f"b{b}.csv"
        p.write_text("\n".join(lines) + "\n")
        os.utime(p, (1_700_000_000 + b * 60,) * 2)
    root = str(tmp_path / "cmp_idx")
    idx = StreamingDedupIndex(spark, str(d), root)
    q = idx.start()
    q.awaitTermination(120)
    q.stop()

    def classify_future(batch_id=99):
        # logical -> physical through the epoch pointer: after the
        # compaction publishes, the legacy dirs are retired
        hashes = spark.read.parquet(resolve(spark, os.path.join(root, "hashes")))
        bands = spark.read.parquet(resolve(spark, os.path.join(root, "bands")))
        probe = spark.createDataFrame(
            [(100, base), (101, "never seen before text entirely new")],
            "doc_id long, text string",
        )
        return sorted(
            (r["doc_id"], r["status"])
            for r in incremental_dedup_status(
                probe,
                hashes.filter(F.col("epoch") < batch_id).select("h"),
                bands.filter(F.col("epoch") < batch_id).select("band", "bucket"),
                num_hashes=4, rows_per_band=2, k=3,
            ).collect()
        )

    from cust_sagemaker_feature_store_spark.streaming._fsutil import resolve

    before = classify_future()
    n_hashes_before = spark.read.parquet(
        resolve(spark, os.path.join(root, "hashes"))
    ).count()
    assert compact_dedup_epochs(spark, root) == 2
    after = classify_future()
    assert after == before
    n_hashes_after = spark.read.parquet(
        resolve(spark, os.path.join(root, "hashes"))
    ).count()
    assert n_hashes_after < n_hashes_before  # the repeated text collapsed
    hashes = spark.read.parquet(resolve(spark, os.path.join(root, "hashes")))
    assert [r["epoch"] for r in hashes.select("epoch").distinct().collect()] == [0]
    assert compact_dedup_epochs(spark, root) == 0


def test_streaming_reservoir_equals_batch(spark, sf_dir, tmp_path):
    """The streaming weighted reservoir must converge to EXACTLY the
    batch sample_weighted_reservoir regardless of arrival order or
    batch boundaries (the E-S key is a pure row function, so top-k is
    an associative idempotent fold), and a replayed batch must change
    nothing."""
    from cust_sagemaker_feature_store_spark.catalog import load_table
    from cust_sagemaker_feature_store_spark.queries import REGISTRY
    from cust_sagemaker_feature_store_spark.streaming.reservoir import (
        StreamingWeightedReservoir,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    res = StreamingWeightedReservoir(
        spark, str(tmp_path / "unused"), str(tmp_path / "wres_store")
    )
    # three batches, deliberately NOT in doc_id order
    for b, e in enumerate((2, 0, 1)):
        res.process_batch(docs.filter(F.col("doc_id") % 3 == e), batch_id=b)
    got = sorted(map(tuple, res.sample().select(
        "source", "doc_id", "n_chars", "sample_rank").collect()))
    want = sorted(map(tuple, REGISTRY["sample_weighted_reservoir"]
                      .fn(spark, sf_dir).collect()))
    assert got == want and got
    # idempotent replay: re-applying an already-absorbed batch
    res.process_batch(docs.filter(F.col("doc_id") % 3 == 0), batch_id=9)
    got2 = sorted(map(tuple, res.sample().select(
        "source", "doc_id", "n_chars", "sample_rank").collect()))
    assert got2 == want
    # the store stays sample-sized: exactly k rows per source
    per_src = res.sample().groupBy("source").count().collect()
    assert all(r["count"] == res.k for r in per_src)


def test_curate_stream_twin_matches_batch(spark, sf_dir, tmp_path):
    """The composed streaming curation path — candidate pairs folded
    batch-by-batch into the component LABEL STORE, curation served
    over the corpus minus the store's duplicates — must emit exactly
    the pipeline_curate_stream_twin batch query, bin for bin (the
    label store converges to dup_clusters regardless of arrival
    order, and the curate tail is literally the same function)."""
    from cust_sagemaker_feature_store_spark.catalog import load_table
    from cust_sagemaker_feature_store_spark.operators.dedup import (
        minhash_candidates,
    )
    from cust_sagemaker_feature_store_spark.queries import REGISTRY
    from cust_sagemaker_feature_store_spark.queries.text_q import (
        _curate_v4_bins,
    )
    from cust_sagemaker_feature_store_spark.streaming.components import (
        StreamingComponentStore,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidates(docs, num_hashes=4, rows_per_band=2).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).localCheckpoint(eager=True)
    store = StreamingComponentStore(
        spark, str(tmp_path / "unused"), str(tmp_path / "cur_store")
    )
    for e in (0, 1, 2):  # pairs arrive in three micro-batches
        store.process_batch(pairs.filter((F.col("src") % 3) == e), batch_id=e)
    dups = store.labels().filter(F.col("node") != F.col("label")).select(
        F.col("node").alias("doc_id")
    )
    served = _curate_v4_bins(docs.join(dups, "doc_id", "anti")).collect()
    twin = REGISTRY["pipeline_curate_stream_twin"].fn(spark, sf_dir).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in twin]
    assert served  # non-degenerate: the curated output has bins


def test_component_store_stream_equals_full(spark, sf_dir, tmp_path):
    """Streaming label-store maintenance over three pair batches —
    with a checkpoint restart between batch 2 and 3 — must end at
    exactly dup_clusters over ALL pairs (arrival order never matters
    for connected components), and a replayed batch must rewrite
    nothing (incremental_components is idempotent)."""
    import os

    from cust_sagemaker_feature_store_spark.catalog import load_table
    from cust_sagemaker_feature_store_spark.operators.dedup import (
        dup_clusters,
        minhash_candidates,
    )
    from cust_sagemaker_feature_store_spark.streaming.components import (
        StreamingComponentStore,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidates(docs, num_hashes=4, rows_per_band=2).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).localCheckpoint(eager=True)
    d = tmp_path / "cc_in"
    d.mkdir()
    store = StreamingComponentStore(
        spark, str(d) + "/*", str(tmp_path / "cc_store")
    )
    # batches 0+1 before the restart, batch 2 after
    for todo in ((0, 1), (2,)):
        for e in todo:
            p = str(d / f"b{e}.parquet")
            pairs.filter((F.col("src") % 3) == e).coalesce(1).write.parquet(p)
            t = 1_700_000_000 + e * 60
            for f in os.listdir(p):
                os.utime(os.path.join(p, f), (t, t))
            os.utime(p, (t, t))
        q = store.start()
        q.awaitTermination(120)
        q.stop()

    got = {r["node"]: r["label"] for r in store.labels().collect()}
    want = {
        r["node"]: r["label"]
        for r in dup_clusters(pairs, "src", "dst").collect()
    }
    assert got == want
    # idempotent replay: re-applying every batch changes nothing
    import glob

    before = sorted(map(tuple, store.labels().collect()))
    for e in (0, 1, 2):
        store.process_batch(
            spark.read.parquet(str(d / f"b{e}.parquet")), batch_id=99 + e
        )
    assert sorted(map(tuple, store.labels().collect())) == before
    # vacuum: content bit-identical, scratch sibling gone, one data
    # file per bucket afterwards
    from cust_sagemaker_feature_store_spark.streaming.components import (
        vacuum_component_store,
    )

    scratch = store.store_dir + "__merge_scratch"
    assert os.path.exists(scratch)  # debris from the last micro-batch
    stats = vacuum_component_store(spark, store.store_dir)
    assert not os.path.exists(scratch)
    assert sorted(map(tuple, store.labels().collect())) == before
    from cust_sagemaker_feature_store_spark.streaming._fsutil import resolve

    n_buckets_used = (
        spark.read.parquet(resolve(spark, store.store_dir))
        .select("bucket").distinct().count()
    )
    assert stats["files_after"] == n_buckets_used <= stats["files_before"]
    assert not [e for e in os.listdir(os.path.dirname(store.store_dir))
                if "__vacuum__" in e or ".__old__" in e]
    # post-vacuum stream writes must land in the published version:
    # replaying an applied batch is still a no-op, and a NEW edge batch
    # merges into the pointer-resolved store
    store.process_batch(
        spark.read.parquet(str(d / "b0.parquet")), batch_id=200
    )
    assert sorted(map(tuple, store.labels().collect())) == before


def test_streaming_hll_registers_equal_batch(spark, tmp_path):
    """HLL registers maintained as a streaming MAX aggregation equal
    the batch registers over the same rows — delivered across two
    micro-batches so cross-batch register folding (MAX, not
    recompute) is what's verified. State is exactly m = 64 cells
    regardless of row count."""
    from cust_sagemaker_feature_store_spark.streaming.windows import (
        hll_register_counters,
    )

    d = tmp_path / "hll_in"
    d.mkdir()
    rows = [(i, i * 37 % 211) for i in range(80)]
    for bi, chunk in enumerate((rows[:40], rows[40:])):
        (d / f"b{bi}.csv").write_text(
            "event_id,user_id\n"
            + "\n".join(f"{e},{u}" for e, u in chunk)
            + "\n"
        )
    ev = spark.readStream.schema("event_id long, user_id long").option(
        "maxFilesPerTrigger", 1
    ).csv(str(d), header=True)
    q = (
        hll_register_counters(ev, "user_id")
        .writeStream.format("memory")
        .queryName("hll_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["bucket"], r["register"])
        for r in spark.sql("SELECT * FROM hll_out").collect()
    }
    batch = spark.createDataFrame(rows, "event_id long, user_id long")
    want = {
        (r["bucket"], r["register"])
        for r in hll_register_counters(batch, "user_id").collect()
    }
    assert got == want and len(got) > 0


def test_stream_kmv_store_restart_and_compaction(spark, tmp_path):
    """The persisted KMV store must (1) equal the replay_kmv_epochs
    batch twin and the DIRECT sketch after multi-batch ingest across
    a checkpoint restart (the merge theorem, operationally), and
    (2) serve identical results after compact_kmv_epochs folds the
    per-epoch minsets (lossless compaction)."""
    from cust_sagemaker_feature_store_spark.streaming.kmv_store import (
        StreamingKmvStore,
        compact_kmv_epochs,
        replay_kmv_epochs,
    )
    from cust_sagemaker_feature_store_spark.operators.sketches import (
        kmv_estimate,
        kmv_minset,
    )

    k = 8
    rows = [(i, "click" if i % 3 else "view", i * 7 % 101) for i in range(90)]
    batches = [rows[:30], rows[30:60], rows[60:]]
    d = tmp_path / "kmv_in"
    d.mkdir()
    store = StreamingKmvStore(
        spark, str(d), str(tmp_path / "kmv_store"), "event_type", "user_id", k
    )
    # batches 0+1 before the restart, batch 2 after
    for phase, todo in ((0, (0, 1)), (1, (2,))):
        for b in todo:
            p = d / f"b{b}.csv"
            p.write_text(
                "event_id,event_type,user_id\n"
                + "\n".join(f"{e},{t},{u}" for e, t, u in batches[b])
                + "\n"
            )
            os.utime(p, (1_700_000_000 + b * 60,) * 2)
        q = store.start()
        q.awaitTermination(120)
        q.stop()

    def as_map(df):
        return {
            r["event_type"]: (r["kth_hash"], r["kmv_estimate"], r["sketch_size"])
            for r in df.collect()
        }

    served = as_map(store.serve())
    batch = spark.createDataFrame(
        rows, "event_id long, event_type string, user_id long"
    )
    twin = as_map(
        replay_kmv_epochs(
            batch, (F.col("event_id") / 30).cast("long"),
            ["event_type"], F.col("user_id"), k,
        )
    )
    direct = as_map(
        kmv_estimate(
            kmv_minset(batch, ["event_type"], F.col("user_id"), k),
            ["event_type"], k,
        )
    )
    assert served == twin == direct and set(served) == {"click", "view"}

    # store grew one epoch per micro-batch; compaction folds them
    ms = store.minsets()
    assert ms.select("epoch").distinct().count() == 3
    assert compact_kmv_epochs(spark, str(tmp_path / "kmv_store"),
                              "event_type", k) == 2
    assert store.minsets().select("epoch").distinct().count() == 1
    assert as_map(store.serve()) == served  # lossless
    # and the folded store is at most k rows per group
    sizes = {
        r["event_type"]: r["n"]
        for r in store.minsets().groupBy("event_type")
        .agg(F.count("*").alias("n")).collect()
    }
    assert all(n <= k for n in sizes.values())


def test_sq8_index_stream_encode_twin_and_restart(spark, tmp_path, sf_dir):
    """The streaming SQ8-codes maintainer must (1) encode micro-batches
    under the FROZEN stored bounds exactly as the shared batch encode
    expression does, across a checkpoint restart, (2) be
    replay-idempotent (epoch-stamped dynamic overwrite: exactly one
    codes row per streamed id), and (3) leave the stored probe
    returning bit-identical scores over the accumulated epochs as the
    same integer scoring run inline over the union."""
    from cust_sagemaker_feature_store_spark.catalog import load_table
    from cust_sagemaker_feature_store_spark.operators import similarity as S
    from cust_sagemaker_feature_store_spark.streaming.ivf_index import (
        StreamingSq8Index,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    bulk = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    root = str(tmp_path / "sq8_idx")
    centroids, mins, ranges = S.build_sq8_index(bulk, root, n_lists=8)

    d = tmp_path / "sq8_in"
    d.mkdir()
    parts = [
        rest.filter(F.col("vec_id") % 4 == 1),
        rest.filter(F.col("vec_id") % 4 == 3),
    ]
    # batch 0 before the restart, batch 1 after
    for phase, todo in ((0, (0,)), (1, (1,))):
        for b in todo:
            parts[b].coalesce(1).write.mode("overwrite").parquet(
                str(d / f"b{b}")
            )
            for f in (d / f"b{b}").glob("*.parquet"):
                f.rename(d / f"batch{b}.parquet")
        idx = StreamingSq8Index(spark, str(d), root)
        q = idx.start(schema="vec_id long, embedding array<float>, label int")
        q.awaitTermination(120)
        q.stop()

    codes = StreamingSq8Index(spark, str(d), root).codes()
    # exactly once per id: bulk evens + streamed odds
    assert codes.count() == emb.count()
    assert codes.select("vec_id").distinct().count() == emb.count()

    # encode twin: streamed rows' codes == batch encode of the same
    # rows under the same frozen state
    want = {
        r["vec_id"]: list(r["codes"])
        for r in S.grid_assign_cells(rest, centroids, "embedding", "cell")
        .withColumn("__gv", S.grid_vector("embedding"))
        .select("vec_id", F.expr(S.sq8_codes_expr(mins, ranges)).alias("codes"))
        .collect()
    }
    got = {
        r["vec_id"]: list(r["codes"])
        for r in codes.filter(F.col("epoch") >= 0).collect()
    }
    assert got == want

    # stored probe over all epochs == inline integer scoring over the
    # union under the frozen state
    qvec = [
        float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]
    qgrid = [
        int(x)
        for x in emb.filter(F.col("vec_id") == 0)
        .select(S.grid_vector("embedding").alias("g"))
        .head()["g"]
    ]
    d2 = sorted(
        (sum((a - c) ** 2 for a, c in zip(qgrid, cv)), cell)
        for cell, cv in enumerate(centroids)
    )
    cells = [cell for _, cell in d2[:3]]
    mn = "array(" + ",".join(f"{m}L" for m in mins) + ")"
    rg = "array(" + ",".join(f"{r}L" for r in ranges) + ")"
    qarr = "array(" + ",".join(f"{x}L" for x in qgrid) + ")"
    rec = (
        "aggregate(zip_with(zip_with(zip_with(CAST(codes AS ARRAY<BIGINT>), "
        + rg + ", (cd, r) -> cd * r div 255), "
        + mn + ", (o, m) -> o + m), "
        + qarr + ", (a, qq) -> a * qq), CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    )
    inline = (
        S.grid_assign_cells(emb, centroids, "embedding", "cell")
        .filter(F.col("cell").isin(cells))
        .withColumn("__gv", S.grid_vector("embedding"))
        .select("vec_id", F.expr(S.sq8_codes_expr(mins, ranges)).alias("codes"))
        .withColumn("sq8_score", F.expr(rec))
        .select("vec_id", "sq8_score")
        .orderBy(F.desc("sq8_score"), F.asc("vec_id"))
        .limit(10)
        .collect()
    )
    stored = S.probe_sq8_index(spark, root, qvec, k=10, nprobe=3).collect()
    assert [tuple(r) for r in stored] == [tuple(r) for r in inline]


def test_streaming_histogram_counters_equal_batch(spark, tmp_path):
    """Histogram bin counters maintained as a streaming aggregation
    equal the batch counters over the same rows across two
    micro-batches — cross-batch counter ADDITION, state bounded by
    the value range over the bin width."""
    from cust_sagemaker_feature_store_spark.streaming.windows import (
        histogram_bin_counters,
    )

    d = tmp_path / "hist_in"
    d.mkdir()
    rows = [(i, (i * 37 % 211) / 7.0) for i in range(90)]
    for bi, chunk in enumerate((rows[:45], rows[45:])):
        (d / f"b{bi}.csv").write_text(
            "event_id,value\n"
            + "\n".join(f"{e},{v}" for e, v in chunk)
            + "\n"
        )
    ev = spark.readStream.schema("event_id long, value double").option(
        "maxFilesPerTrigger", 1
    ).csv(str(d), header=True)
    q = (
        histogram_bin_counters(ev, "value", 200)
        .writeStream.format("memory")
        .queryName("hist_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["bin"], r["c"])
        for r in spark.sql("SELECT * FROM hist_out").collect()
    }
    batch = spark.createDataFrame(rows, "event_id long, value double")
    want = {
        (r["bin"], r["c"])
        for r in histogram_bin_counters(batch, "value", 200).collect()
    }
    assert got == want and len(got) > 1


def test_staged_swap_kill_before_publish_keeps_old_epoch_readable(
    spark, tmp_path, monkeypatch
):
    """The epoch-pointer swap's crash contract (r13 verdict next-round
    #4): a kill at ANY point before the marker create leaves readers
    on the OLD version in full — no absent window, no torn store —
    and simply re-running the swap publishes the rewrite."""
    from cust_sagemaker_feature_store_spark.streaming import _fsutil as FS

    live = str(tmp_path / "store")
    spark.range(5).selectExpr("id", "id * 10 AS v").write.parquet(live)

    def stage(mult):
        staged = live + ".__stage__"
        spark.range(5).selectExpr("id", f"id * {mult} AS v").write.mode(
            "overwrite"
        ).parquet(staged)
        return staged

    old = sorted(map(tuple, spark.read.parquet(FS.resolve(spark, live)).collect()))

    # crash exactly at the publish instant: data renamed, marker never born
    def boom(*a, **k):
        raise RuntimeError("kill -9 here")

    monkeypatch.setattr(FS, "_create_marker", boom)
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        FS.staged_swap(spark, live, stage(100))
    # reader sees the old store, whole and current
    assert sorted(
        map(tuple, spark.read.parquet(FS.resolve(spark, live)).collect())
    ) == old
    assert FS.store_exists(spark, live)

    # recovery = run the swap again (the orphan version dir is retired)
    monkeypatch.undo()
    FS.staged_swap(spark, live, stage(100))
    cur = FS.resolve(spark, live)
    assert cur != live  # published layout now
    got = sorted(map(tuple, spark.read.parquet(cur).collect()))
    assert got == [(i, i * 100) for i in range(5)]
    import os

    assert not os.path.exists(live)  # legacy dir retired after publish

    # a second swap over the published layout bumps the epoch and
    # retires the previous version
    FS.staged_swap(spark, live, stage(7))
    cur2 = FS.resolve(spark, live)
    assert cur2 != cur
    assert sorted(
        map(tuple, spark.read.parquet(cur2).collect())
    ) == [(i, i * 7) for i in range(5)]
    assert not os.path.exists(cur)

    # kill-mid-swap on the PUBLISHED layout: still reads the old epoch
    monkeypatch.setattr(FS, "_create_marker", boom)
    with _pytest.raises(RuntimeError):
        FS.staged_swap(spark, live, stage(9))
    assert FS.resolve(spark, live) == cur2
    assert sorted(
        map(tuple, spark.read.parquet(FS.resolve(spark, live)).collect())
    ) == [(i, i * 7) for i in range(5)]


def test_staged_swap_many_partial_publish_rolls_back_cleanly(
    spark, tmp_path, monkeypatch
):
    """Group publish: a clean error after SOME markers are created
    must unpublish them and hand every staged rewrite back — both
    tables keep serving the OLD group (new centroids probed against
    old codes is a WRONG index, so the group must never end half
    swapped on a clean error path)."""
    from cust_sagemaker_feature_store_spark.streaming import _fsutil as FS

    lives, stages = [], []
    for name, mult in (("a", 1), ("b", 2)):
        live = str(tmp_path / name)
        spark.range(3).selectExpr("id", f"id * {mult} AS v").write.parquet(live)
        staged = live + ".__stage__"
        spark.range(3).selectExpr("id", f"id * {mult * 100} AS v").write.parquet(
            staged
        )
        lives.append(live)
        stages.append(staged)

    real = FS._create_marker
    calls = {"n": 0}

    def fail_second(spark_, live_, n_):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("kill between marker creates")
        return real(spark_, live_, n_)

    monkeypatch.setattr(FS, "_create_marker", fail_second)
    import os

    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        FS.staged_swap_many(spark, list(zip(lives, stages)))
    monkeypatch.undo()
    for live, mult in zip(lives, (1, 2)):
        assert FS.resolve(spark, live) == live  # old group, unpublished
        assert sorted(
            map(tuple, spark.read.parquet(live).collect())
        ) == [(i, i * mult) for i in range(3)]
    for staged in stages:
        assert os.path.exists(staged)  # the rewrite was handed back

    # retry succeeds and publishes both tables atomically-for-readers
    FS.staged_swap_many(spark, list(zip(lives, stages)))
    for live, mult in zip(lives, (100, 200)):
        cur = FS.resolve(spark, live)
        assert cur != live
        assert sorted(
            map(tuple, spark.read.parquet(cur).collect())
        ) == [(i, i * mult) for i in range(3)]


def test_staged_swap_keep_old_defers_retirement(spark, tmp_path):
    """r14 advice: per-micro-batch swaps (the reservoir fold) pass
    keep_old=1 so a reader pinned to the version current at publish
    time keeps its files until the NEXT swap — no mid-scan deletion
    under a live sample()."""
    import os

    from cust_sagemaker_feature_store_spark.streaming import _fsutil as FS

    live = str(tmp_path / "store")
    spark.range(3).selectExpr("id", "id AS v").write.parquet(live)

    def stage(mult):
        staged = live + ".__stage__"
        spark.range(3).selectExpr("id", f"id * {mult} AS v").write.mode(
            "overwrite"
        ).parquet(staged)
        return staged

    # swap 1: legacy layout is the previous version — it must survive
    FS.staged_swap(spark, live, stage(10), keep_old=1)
    v1 = FS.resolve(spark, live)
    assert v1 != live
    assert os.path.exists(live)  # a reader mid-scan on legacy is safe
    # swap 2: v1 is previous — survives; legacy (two behind) retires
    FS.staged_swap(spark, live, stage(20), keep_old=1)
    v2 = FS.resolve(spark, live)
    assert os.path.exists(v1) and not os.path.exists(live)
    # swap 3: v2 survives, v1 retires — exactly one old version kept
    FS.staged_swap(spark, live, stage(30), keep_old=1)
    assert os.path.exists(v2) and not os.path.exists(v1)
    got = sorted(
        map(tuple, spark.read.parquet(FS.resolve(spark, live)).collect())
    )
    assert got == [(i, i * 30) for i in range(3)]


def test_reset_store_spares_non_version_siblings(spark, tmp_path):
    """r14 advice: reset_store's version glob also matches sibling
    dirs like 'store.__vacuum__'; only all-digit version suffixes may
    be deleted."""
    import os

    from cust_sagemaker_feature_store_spark.streaming import _fsutil as FS

    live = str(tmp_path / "store")
    spark.range(3).write.parquet(live)
    FS.staged_swap(spark, live, live)  # publish live itself as v1
    vacuum = live + ".__vacuum__"
    spark.range(2).write.parquet(vacuum)  # non-version sibling

    FS.reset_store(spark, live)
    assert os.path.exists(vacuum)  # spared: suffix is not digits
    assert not os.path.exists(FS._ptr_dir(live))
    assert not os.path.exists(FS._version_path(live, 1))

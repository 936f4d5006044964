"""Unit + property tests for the core operators (latest, as-of)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cust_sagemaker_feature_store_spark.operators import (
    asof_join,
    asof_join_agg,
    asof_join_union,
    latest_snapshot,
    latest_snapshot_window,
)

SCHEMA = "k long, t string, v double, seq long"
ROWS = [
    (1, "2022-01-01", 1.0, 0),
    (1, "2022-01-03", 3.0, 1),
    (1, "2022-01-02", 2.0, 2),
    (2, "2022-01-01", 10.0, 3),
    (2, "2022-01-01", 11.0, 4),  # tie on t -> seq 4 wins
]


def test_latest_forms_agree(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    a = latest_snapshot_window(df, "k", "t", tie_breaker="seq")
    b = latest_snapshot(df, "k", "t", tie_breaker="seq")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    got = {r["k"]: (r["t"], r["v"]) for r in b.collect()}
    assert got == {1: ("2022-01-03", 3.0), 2: ("2022-01-01", 11.0)}


def test_latest_order_independence(spark):
    # property check (SURVEY.md §5.4): any permutation of arrival order
    # yields the same snapshot given the (event_time, seq) tie-break
    rng = random.Random(42)
    expected = None
    for _ in range(3):
        rows = ROWS[:]
        rng.shuffle(rows)
        df = spark.createDataFrame(rows, SCHEMA)
        got = sorted(map(tuple, latest_snapshot(df, "k", "t", "seq").collect()))
        if expected is None:
            expected = got
        assert got == expected


def test_asof_join_basic(spark):
    probe = spark.createDataFrame(
        [(1, "2022-01-02", "p1"), (1, "2021-12-31", "p2"), (3, "2022-01-05", "p3")],
        "k long, pt string, tag string",
    )
    feat = spark.createDataFrame(
        [(1, "2022-01-01", 1.0), (1, "2022-01-02", 2.0), (2, "2022-01-01", 9.0)],
        "k long, ft string, fv double",
    )
    out = asof_join(probe, feat, on="k", probe_time="pt", feature_time="ft", how="left")
    got = {r["tag"]: (r["ft"], r["fv"]) for r in out.collect()}
    assert got["p1"] == ("2022-01-02", 2.0)  # feature AT probe time is visible
    assert got["p2"] == (None, None)  # nothing at-or-before
    assert got["p3"] == (None, None)  # unseen key survives with nulls
    assert out.count() == 3


def test_asof_join_tolerance(spark):
    from pyspark.sql import functions as F

    probe = spark.createDataFrame(
        [(1, "2022-01-01 12:00:00", "p1")], "k long, pt string, tag string"
    ).withColumn("pt", F.col("pt").cast("timestamp"))
    feat = spark.createDataFrame(
        [(1, "2022-01-01 11:00:00", 1.0), (1, "2022-01-01 08:00:00", 2.0)],
        "k long, ft string, fv double",
    ).withColumn("ft", F.col("ft").cast("timestamp"))
    # 2h tolerance: the 11:00 feature qualifies (1h old), 08:00 doesn't
    out = asof_join(
        probe, feat, on="k", probe_time="pt", feature_time="ft",
        how="left", tolerance_seconds=7200,
    )
    assert [r["fv"] for r in out.collect()] == [1.0]
    # 30min tolerance: nothing qualifies but the probe row survives
    out2 = asof_join(
        probe, feat, on="k", probe_time="pt", feature_time="ft",
        how="left", tolerance_seconds=1800,
    )
    assert [r["fv"] for r in out2.collect()] == [None]


def test_asof_join_union_matches_join(spark):
    probe = spark.createDataFrame(
        [(1, "2022-01-02"), (1, "2021-12-31"), (2, "2022-01-09"), (3, "2022-01-05")],
        "k long, pt string",
    )
    feat = spark.createDataFrame(
        [(1, "2022-01-01", 1.0), (1, "2022-01-02", 2.0), (2, "2022-01-01", 9.0)],
        "k long, ft string, fv double",
    )
    a = asof_join(probe, feat, on="k", probe_time="pt", feature_time="ft", how="left")
    b = asof_join_union(probe, feat, on="k", probe_time="pt", feature_time="ft", feature_cols=["fv"])
    c = asof_join_agg(probe, feat, on="k", probe_time="pt", feature_time="ft", how="left")
    am = sorted((r["k"], r["pt"], r["fv"]) for r in a.collect())
    bm = sorted((r["k"], r["pt"], r["fv"]) for r in b.collect())
    cm = sorted((r["k"], r["pt"], r["fv"]) for r in c.collect())
    assert am == bm == cm

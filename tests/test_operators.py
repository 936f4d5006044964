"""Unit + property tests for the core operators (latest, as-of)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from cust_sagemaker_feature_store_spark.operators import (
    asof_join,
    asof_join_agg,
    asof_join_auto,
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


def test_asof_union_picks_whole_row_not_per_column(spark):
    # The most recent feature row holds a NULL payload column. A
    # per-column fill would backfill that column from the OLDER row,
    # producing a (b1, a2) chimera no real feature row ever was; the
    # struct-based fill must carry the newest row atomically.
    probe = spark.createDataFrame([(1, "2022-01-05")], "k long, pt string")
    feat = spark.createDataFrame(
        [(1, "2022-01-01", "a1", "a2"), (1, "2022-01-02", "b1", None)],
        "k long, ft string, x string, y string",
    )
    out = asof_join_union(
        probe, feat, on="k", probe_time="pt", feature_time="ft",
        feature_cols=["x", "y"],
    ).collect()
    assert [(r["x"], r["y"]) for r in out] == [("b1", None)]


def test_asof_union_tie_breaker(spark):
    # Two feature rows at the same timestamp: the greater tie wins,
    # matching the join strategy's (ft DESC, tie DESC) row_number pick.
    probe = spark.createDataFrame([(1, "2022-01-02")], "k long, pt string")
    feat = spark.createDataFrame(
        [(1, "2022-01-01", 10, 1.0), (1, "2022-01-01", 20, 2.0)],
        "k long, ft string, seq long, fv double",
    )
    out = asof_join_union(
        probe, feat, on="k", probe_time="pt", feature_time="ft",
        feature_cols=["fv"], tie_breaker="seq",
    ).collect()
    assert [r["fv"] for r in out] == [2.0]
    j = asof_join(
        probe, feat, on="k", probe_time="pt", feature_time="ft",
        how="left", tie_breaker="seq",
    ).collect()
    assert [r["fv"] for r in j] == [2.0]


def test_asof_join_directions(spark):
    # One probe at 12:00 with features at 10:00, 11:30, 12:45, 14:00.
    probe = spark.createDataFrame(
        [(1, "2022-01-01 12:00:00", "p1")], "k long, pt string, tag string"
    )
    feat = spark.createDataFrame(
        [
            (1, "2022-01-01 10:00:00", 0, 10.0),
            (1, "2022-01-01 11:30:00", 1, 11.5),
            (1, "2022-01-01 12:45:00", 2, 12.75),
            (1, "2022-01-01 14:00:00", 3, 14.0),
        ],
        "k long, ft string, seq long, fv double",
    )
    from pyspark.sql import functions as F

    probe = probe.withColumn("pt", F.col("pt").cast("timestamp"))
    feat = feat.withColumn("ft", F.col("ft").cast("timestamp"))

    def pick(**kw):
        out = asof_join(
            probe, feat, on="k", probe_time="pt", feature_time="ft",
            how="left", tie_breaker="seq", **kw,
        ).collect()
        assert len(out) == 1
        return out[0]["fv"]

    assert pick(direction="backward") == 11.5  # latest at-or-before
    assert pick(direction="forward") == 12.75  # earliest at-or-after
    assert pick(direction="nearest") == 11.5  # 30min back beats 45min fwd
    # tolerance binds each direction's candidate set
    assert pick(direction="forward", tolerance_seconds=1800) is None
    assert pick(direction="nearest", tolerance_seconds=600) is None
    # auto dispatches non-backward directions to join+rank
    a = asof_join_auto(
        probe, feat, on="k", probe_time="pt", feature_time="ft",
        how="left", tie_breaker="seq", direction="forward",
    ).collect()
    assert [r["fv"] for r in a] == [12.75]


def test_asof_nearest_tie_prefers_backward(spark):
    # Equidistant candidates: the backward one (knowable at probe time)
    # must win regardless of tie_breaker magnitude.
    from pyspark.sql import functions as F

    probe = spark.createDataFrame(
        [(1, "2022-01-01 12:00:00")], "k long, pt string"
    ).withColumn("pt", F.col("pt").cast("timestamp"))
    feat = spark.createDataFrame(
        [(1, "2022-01-01 11:00:00", 0, 1.0), (1, "2022-01-01 13:00:00", 99, 2.0)],
        "k long, ft string, seq long, fv double",
    ).withColumn("ft", F.col("ft").cast("timestamp"))
    out = asof_join(
        probe, feat, on="k", probe_time="pt", feature_time="ft",
        how="left", tie_breaker="seq", direction="nearest",
    ).collect()
    assert [r["fv"] for r in out] == [1.0]


def test_incremental_agg_equals_direct(spark):
    # merge(partials(b1..bk)) must be BIT-identical to a one-pass
    # aggregate over the union, for any split — including keys present
    # in only one batch and an all-null-value key.
    import random

    from cust_sagemaker_feature_store_spark.operators.incremental import (
        agg_partials,
        finalize_partials,
        merge_partials,
    )

    rng = random.Random(7)
    rows = [
        (i % 17, round(rng.uniform(-50, 50), 6) if i % 23 else None)
        for i in range(500)
    ] + [(99, None), (99, None)]  # key whose every value is null
    df = spark.createDataFrame(rows, "k long, v double")
    direct = finalize_partials(agg_partials(df, "k", "v"), "v")

    batches = [[] for _ in range(4)]
    for r in rows:
        batches[rng.randrange(4)].append(r)
    parts = [
        agg_partials(spark.createDataFrame(b or [(None, None)], "k long, v double"), "k", "v")
        for b in batches
        if b
    ]
    incr = finalize_partials(merge_partials(*parts), "v")

    a = sorted(map(tuple, direct.collect()))
    b = sorted(map(tuple, incr.collect()))
    assert a == b


def test_incremental_join_refresh_equals_full_join(spark):
    # the delta rule must reproduce the full join EXACTLY for any
    # base/delta split — including matches that exist only in
    # delta x delta, delta x base, base x delta, and unmatched rows.
    from cust_sagemaker_feature_store_spark.operators.incremental import (
        incremental_join_refresh,
    )

    a = spark.createDataFrame(
        [(i, i % 5, float(i)) for i in range(40)], "aid long, k long, av double"
    )
    b = spark.createDataFrame(
        [(j, j % 5, -float(j)) for j in range(15)], "bid long, k long, bv double"
    )
    a_base, a_delta = a.filter("aid % 3 != 0"), a.filter("aid % 3 = 0")
    b_base, b_delta = b.filter("bid % 2 != 0"), b.filter("bid % 2 = 0")
    cols = ["aid", "bid", "av", "bv"]
    materialized = a_base.join(b_base, "k").select(*cols)
    got = incremental_join_refresh(
        materialized, a_base, a_delta, b_base, b_delta, on="k"
    )
    want = a.join(b, "k").select(*cols)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_resample_ffill_semantics(spark):
    from pyspark.sql import functions as F

    from cust_sagemaker_feature_store_spark.operators.resample import (
        resample_ffill,
    )

    ev = spark.createDataFrame(
        [
            (1, "2022-01-01 03:00:00", 10.0),
            (1, "2022-01-01 12:00:00", 20.0),  # exactly on a grid point
            (2, "2022-01-01 20:00:00", 30.0),
        ],
        "k long, ts string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample_ffill(
        ev,
        key_cols="k",
        time_col="ts",
        start_iso="2022-01-01 00:00:00",
        end_iso="2022-01-02 00:00:00",
        interval_seconds=12 * 3600,
        payload_cols=["v"],
    )
    got = {(r["k"], str(r["grid_ts"])): r["v"] for r in out.collect()}
    # 3 grid points per key, both keys present
    assert len(got) == 6
    assert got[(1, "2022-01-01 00:00:00")] is None  # before first event
    assert got[(1, "2022-01-01 12:00:00")] == 20.0  # event AT grid instant visible
    assert got[(1, "2022-01-02 00:00:00")] == 20.0  # carried forward
    assert got[(2, "2022-01-01 12:00:00")] is None
    assert got[(2, "2022-01-02 00:00:00")] == 30.0


def test_asof_join_preserves_duplicate_probes(spark):
    # Fully identical probe rows must each produce an output row (the
    # operator must not dedupe the probe side as a side effect).
    probe = spark.createDataFrame(
        [(1, "2022-01-02"), (1, "2022-01-02"), (1, "2022-01-02")],
        "k long, pt string",
    )
    feat = spark.createDataFrame([(1, "2022-01-01", 5.0)], "k long, ft string, fv double")
    for fn in (asof_join, asof_join_union, asof_join_auto):
        kwargs = {} if fn is asof_join_union else {"how": "left"}
        out = fn(probe, feat, on="k", probe_time="pt", feature_time="ft", **kwargs)
        assert out.count() == 3, fn.__name__


def test_asof_auto_matches_explicit_strategies(spark):
    probe = spark.createDataFrame(
        [(1, "2022-01-02", "p1"), (1, "2021-12-31", "p2"), (3, "2022-01-05", "p3")],
        "k long, pt string, tag string",
    )
    feat = spark.createDataFrame(
        [(1, "2022-01-01", 0, 1.0), (1, "2022-01-02", 1, 2.0), (2, "2022-01-01", 2, 9.0)],
        "k long, ft string, seq long, fv double",
    )
    ref = asof_join(
        probe, feat, on="k", probe_time="pt", feature_time="ft",
        how="left", tie_breaker="seq",
    )
    auto = asof_join_auto(
        probe, feat, on="k", probe_time="pt", feature_time="ft",
        how="left", tie_breaker="seq",
    )
    key = lambda r: (r["k"], r["pt"], r["tag"])  # noqa: E731
    assert sorted(map(tuple, ref.select(*auto.columns).collect())) == sorted(
        map(tuple, auto.collect())
    )
    # auto with a tolerance routes through the join strategy and keeps
    # left semantics
    auto_tol = asof_join_auto(
        probe.withColumn("pt", F.col("pt").cast("timestamp")),
        feat.withColumn("ft", F.col("ft").cast("timestamp")),
        on="k", probe_time="pt", feature_time="ft",
        how="left", tolerance_seconds=86400, tie_breaker="seq",
    )
    assert auto_tol.count() == 3


def test_runtime_filter_regimes_agree(spark, sf_dir):
    """Both runtime-filter regimes (IN-list, range+semi) must return
    exactly the plain LEFT SEMI join's rows — the scan reduction is a
    plan optimization, never a semantics change."""
    from pyspark.sql import functions as F

    from cust_sagemaker_feature_store_spark.catalog import load_table
    from cust_sagemaker_feature_store_spark.operators.runtime_filter import (
        runtime_filtered_semi_join,
    )

    orders = load_table(spark, sf_dir, "orders")
    dim = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 7 == 0
    )
    plain = sorted(
        r["o_orderkey"]
        for r in orders.join(
            dim.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_semi",
        ).collect()
    )
    for cutoff in (10_000, 3):  # IN-list regime, then forced fallback
        got = sorted(
            r["o_orderkey"]
            for r in runtime_filtered_semi_join(
                orders, dim, "c_custkey", "o_custkey", max_in_keys=cutoff
            ).collect()
        )
        assert got == plain, f"max_in_keys={cutoff}"


def test_freq_items_floor_is_nonvacuous(spark, sf_dir):
    """The frequent-items floor only means something if heavy hitters
    actually exist at the registered support — pin that, and that CMS
    point estimates are within its eps*N error bound, not just above
    the true count."""
    from pyspark.sql import functions as F

    from cust_sagemaker_feature_store_spark.catalog import load_table
    from cust_sagemaker_feature_store_spark.operators.text import tokens
    from cust_sagemaker_feature_store_spark.queries.functions_q import (
        FREQ_SUPPORT,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokens("text")).alias("token"))
    total = toks.count()
    heavy = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > FREQ_SUPPORT * total)
        .collect()
    )
    assert heavy  # the support threshold cuts through the vocabulary
    sk = toks.agg(
        F.count_min_sketch("token", F.lit(0.001), F.lit(0.99), F.lit(42)).alias("s")
    ).head()["s"]
    jvm = spark._jvm
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        jvm.java.io.ByteArrayInputStream(bytes(sk))
    )
    for r in heavy:
        est = cms.estimateCount(r["token"])
        assert r["n"] <= est <= r["n"] + 0.001 * total + 1


def test_time_tolerance_join_equals_theta_join(spark):
    """The bucketed keyless join must produce exactly the pairs a naive
    theta join produces — including pairs straddling bucket edges (the
    adjacent-bucket replication's job) — on an adversarial fixture with
    boundary-exact gaps."""
    from pyspark.sql import functions as F

    from cust_sagemaker_feature_store_spark.operators.rangejoin import (
        time_tolerance_join,
    )

    tol = 100
    lrows = [(i, t) for i, t in enumerate([0, 99, 100, 101, 250, 999, 1000])]
    rrows = [(i + 100, t) for i, t in enumerate([50, 100, 199, 200, 201, 900, 1100])]
    l = spark.createDataFrame(lrows, "lid long, lt long")
    r = spark.createDataFrame(rrows, "rid long, rt long")
    got = {
        (x["lid"], x["rid"])
        for x in time_tolerance_join(
            l, r, F.col("lt"), F.col("rt"), tol
        ).collect()
    }
    want = {
        (lid, rid)
        for lid, lt in lrows
        for rid, rt in rrows
        if abs(lt - rt) <= tol
    }
    assert got == want


def test_time_tolerance_join_is_not_a_cross_product(spark):
    """The physical plan must be a hash equi join on the bucket key —
    never a BroadcastNestedLoopJoin / CartesianProduct theta join."""
    from pyspark.sql import functions as F

    from cust_sagemaker_feature_store_spark.operators.rangejoin import (
        time_tolerance_join,
    )

    l = spark.range(1000).select(F.col("id").alias("lid"), (F.col("id") * 37).alias("lt"))
    r = spark.range(1000).select(F.col("id").alias("rid"), (F.col("id") * 53).alias("rt"))
    df = time_tolerance_join(l, r, F.col("lt"), F.col("rt"), 500)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# -- round-6 order-statistics / audit operators -------------------------


def test_sharded_prefix_sum_matches_naive(spark):
    """_cumulative_counts (the sharded prefix sum behind KS/stump/
    median/lift) must equal a driver-side cumulative over any value
    spread — including values straddling many shards and duplicates
    within one."""
    import random

    from pyspark.sql import Row

    from cust_sagemaker_feature_store_spark.queries.relational7_q import (
        _cumulative_counts,
    )

    rng = random.Random(7)
    rows = [
        Row(cents=rng.randrange(0, 20_000_000), a=rng.randrange(0, 5), b=rng.randrange(0, 5))
        for _ in range(200)
    ]
    # dedupe cents (operator contract: one row per distinct value)
    seen = {}
    for r in rows:
        seen[r.cents] = r
    rows = list(seen.values())
    df = spark.createDataFrame(rows)
    got = {
        r["cents"]: (r["cum_a"], r["cum_b"])
        for r in _cumulative_counts(df).collect()
    }
    ca = cb = 0
    for r in sorted(rows, key=lambda r: r.cents):
        ca += r.a
        cb += r.b
        assert got[r.cents] == (ca, cb), r.cents


def test_er_pigeonhole_blocking_is_complete(spark):
    """Every single-substitution perturbation of a 9-digit id must be
    caught by the third-pair blocking — the pigeonhole completeness
    argument, exercised over all 9 positions."""
    from pyspark.sql import Row

    from cust_sagemaker_feature_store_spark.queries.relational7_q import (
        er_customer_supplier_match,
    )

    base = "000000042"
    perturbed = []
    for pos in range(9):
        digits = list(base)
        digits[pos] = "7" if digits[pos] != "7" else "8"
        perturbed.append("".join(digits))
    cust = spark.createDataFrame(
        [Row(c_custkey=1, c_name=f"Customer#{base}", c_nationkey=0,
             c_acctbal=0.0, c_mktsegment="BUILDING")]
    )
    supp = spark.createDataFrame(
        [Row(s_suppkey=i, s_name=f"Supplier#{p}", s_nationkey=0, s_acctbal=0.0)
         for i, p in enumerate(perturbed)]
        + [Row(s_suppkey=99, s_name="Supplier#999999999", s_nationkey=0,
               s_acctbal=0.0)]
    )
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="er_complete_")
    cust.write.parquet(os.path.join(d, "customer.parquet"))
    supp.write.parquet(os.path.join(d, "supplier.parquet"))
    got = {
        r["s_suppkey"]
        for r in er_customer_supplier_match(spark, d).collect()
    }
    assert got == set(range(9)), (
        "blocking must catch all 9 single-substitution positions and "
        f"exclude the unrelated id; got {sorted(got)}"
    )


def test_acf_values_bounded(spark, sf_dir):
    """Autocorrelations live in [-1, 1]; the exact integer formulation
    must respect the bound at every lag on real data. (The query emits
    lags 1..7 only — lag 0 is identically 1 by construction and is not
    part of the registered output, so there is no lag-0 row to assert
    on; renamed accordingly, ADVICE r6.)"""
    from cust_sagemaker_feature_store_spark.queries.relational7_q import (
        events_acf_daily,
    )

    rows = events_acf_daily(spark, sf_dir).collect()
    assert len(rows) == 7
    for r in rows:
        assert -1.0 <= r["acf"] <= 1.0, r
        assert r["den_scaled"] > 0


def test_exact_median_matches_python(spark, sf_dir):
    """The sharded-selection median equals statistics.median_low of the
    collected cents."""
    import statistics

    from pyspark.sql import functions as F

    from cust_sagemaker_feature_store_spark.catalog import load_table
    from cust_sagemaker_feature_store_spark.queries.relational7_q import (
        agg_exact_median_orders,
    )

    got = agg_exact_median_orders(spark, sf_dir).collect()[0]
    cents = [
        r[0]
        for r in load_table(spark, sf_dir, "orders")
        .select(F.round(F.col("o_totalprice") * 100).cast("long"))
        .collect()
    ]
    assert got["median_cents"] == statistics.median_low(cents)
    assert got["n_rows"] == len(cents)


def test_gap_islands_matches_naive(spark, sf_dir):
    """The two-level sharded gap scan equals the naive LEAD over the
    collected distinct keys."""
    from pyspark.sql import functions as F

    from cust_sagemaker_feature_store_spark.catalog import load_table
    from cust_sagemaker_feature_store_spark.queries.relational7_q import (
        dq_orderkey_gap_islands,
        GAP_TOP_K,
    )

    keys = sorted(
        r[0]
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderkey")
        .distinct()
        .collect()
    )
    gaps = [
        (a, b, b - a - 1)
        for a, b in zip(keys, keys[1:])
        if b - a > 1
    ]
    gaps.sort(key=lambda g: (-g[2], g[0]))
    expect = gaps[:GAP_TOP_K]
    got = [
        (r["gap_start"], r["gap_end"], r["gap_len"])
        for r in dq_orderkey_gap_islands(spark, sf_dir).collect()
    ]
    assert got == expect


def test_time_tolerance_join_exact_near_int64_magnitude(spark):
    """ADVICE r5 regression test: bucket ids must be exact for values
    approaching 2^53, where the old floor(double/double) form loses
    integer resolution and silently drops boundary pairs. Pairs sit
    exactly `tol` apart around 2^53 + offsets that are unrepresentable
    as doubles (odd values > 2^53 round to even)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from cust_sagemaker_feature_store_spark.operators.rangejoin import (
        time_tolerance_join,
    )

    base = (1 << 53) + 1  # not representable as a double (rounds to 2^53)
    tol = 1000
    lrows = [Row(lid=i, lt=base + i * 5000) for i in range(4)]
    # each right row exactly tol away from its left partner — the
    # boundary case |l - r| == tol must be INCLUDED
    rrows = [Row(rid=i, rt=base + i * 5000 + tol) for i in range(4)]
    l = spark.createDataFrame(lrows)
    r = spark.createDataFrame(rrows)
    got = {
        (x["lid"], x["rid"])
        for x in time_tolerance_join(
            l, r, F.col("lt"), F.col("rt"), tol
        ).collect()
    }
    assert got == {(i, i) for i in range(4)}, got
    # exact theta-join cross-check at this magnitude
    theta = {
        (x["lid"], x["rid"])
        for x in l.crossJoin(r)
        .filter(F.abs(F.col("lt") - F.col("rt")) <= tol)
        .collect()
    }
    assert got == theta


def test_cv_ols_matches_numpy_per_fold(spark, sf_dir):
    """Each fold's global-minus-fold coefficients must equal a direct
    numpy least-squares fit on the training rows, and the reported
    held-out MSE must match a python recomputation (to the cents² floor
    grid)."""
    import numpy as np

    from pyspark.sql import functions as F

    from cust_sagemaker_feature_store_spark.catalog import load_table
    from cust_sagemaker_feature_store_spark.queries.relational7_q import (
        CV_FOLDS,
        ml_ols_cv_kfold,
    )

    got = {r["fold"]: r for r in ml_ols_cv_kfold(spark, sf_dir).collect()}
    rows = (
        load_table(spark, sf_dir, "lineitem")
        .select(
            (F.col("l_orderkey") % CV_FOLDS).alias("fold"),
            F.round(F.col("l_quantity") * 100).cast("long").alias("x"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        )
        .collect()
    )
    data = np.array([(r["fold"], r["x"], r["y"]) for r in rows], dtype=np.float64)
    for fold in range(CV_FOLDS):
        train = data[data[:, 0] != fold]
        test = data[data[:, 0] == fold]
        A = np.stack([np.ones(len(train)), train[:, 1]], axis=1)
        (b0, b1), *_ = np.linalg.lstsq(A, train[:, 2], rcond=None)
        g = got[fold]
        assert abs(g["slope"] - b1) < 1e-6 * max(1.0, abs(b1))
        assert abs(g["intercept"] - b0 / 100.0) < 1e-4 * max(1.0, abs(b0 / 100.0))
        pred = g["intercept"] * 100.0 + g["slope"] * test[:, 1]
        mse = np.floor((test[:, 2] - pred) ** 2).sum() / len(test) / 1e4
        assert abs(g["test_mse"] - mse) < 1e-6 * max(1.0, mse)
        assert g["n_train"] == len(train) and g["n_test"] == len(test)


def test_kcore_matches_naive_peeling_on_random_graphs(spark):
    """Distributed peeling equals a straightforward python k-core on
    seeded random graphs (several densities, k values)."""
    import random

    from pyspark.sql import Row

    from cust_sagemaker_feature_store_spark.operators.graph import kcore

    def naive_kcore(adj, k):
        alive = {n for n in adj}
        changed = True
        while changed:
            changed = False
            for n in list(alive):
                if sum(1 for m in adj[n] if m in alive) < k:
                    alive.discard(n)
                    changed = True
        return alive

    rng = random.Random(11)
    for trial, (n, p, k) in enumerate([(30, 0.1, 2), (40, 0.15, 3), (25, 0.3, 4)]):
        adj = {i: set() for i in range(n)}
        for a in range(n):
            for b in range(a + 1, n):
                if rng.random() < p:
                    adj[a].add(b)
                    adj[b].add(a)
        und = [
            Row(src=a, dst=b)
            for a in adj
            for b in adj[a]
        ]
        if not und:
            continue
        edges = spark.createDataFrame(und)
        got = {
            r["src"]
            for r in kcore(edges, k=k).select("src").distinct().collect()
        }
        assert got == naive_kcore(adj, k), (trial, n, p, k)


def test_grouped_quantiles_match_python_order_statistics(spark):
    """grouped_exact_quantiles returns the type-1 quantile
    (sorted[ceil(p*n)-1]) for every group and requested p on seeded
    random data with heavy value duplication (the duplicate-rank edge
    cases are where cumulative selection logic usually breaks)."""
    import math
    import random

    from cust_sagemaker_feature_store_spark.operators.order_stats import (
        grouped_exact_quantiles,
    )

    rng = random.Random(23)
    rows = [
        (f"g{i % 4}", rng.randrange(0, 50))
        for i in range(997)
    ]
    df = spark.createDataFrame(rows, "g string, cents long")
    got = {
        r["g"]: r
        for r in grouped_exact_quantiles(df, "g", shard_size=10).collect()
    }
    by_g: dict[str, list[int]] = {}
    for g, c in rows:
        by_g.setdefault(g, []).append(c)
    for g, vals in by_g.items():
        vals.sort()
        n = len(vals)
        assert got[g]["n_rows"] == n
        for name, num, den in (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)):
            want = vals[math.ceil(num * n / den) - 1]
            assert got[g][f"{name}_cents"] == want, (g, name, n)


def test_grouped_trimmed_mean_and_iqr_match_python(spark):
    """Trimmed-mean kept sums and Tukey fence outlier counts equal a
    direct python computation on seeded random groups."""
    import random

    from cust_sagemaker_feature_store_spark.operators.order_stats import (
        grouped_iqr_fences,
        grouped_trimmed_mean,
    )

    rng = random.Random(31)
    rows = []
    for i in range(800):
        g = f"g{i % 3}"
        # fat-tailed: 5% of rows are 100x the base scale
        v = rng.randrange(0, 100) * (100 if rng.random() < 0.05 else 1)
        rows.append((g, v))
    df = spark.createDataFrame(rows, "g string, cents long")
    by_g: dict[str, list[int]] = {}
    for g, c in rows:
        by_g.setdefault(g, []).append(c)
    for vals in by_g.values():
        vals.sort()

    tm = {r["g"]: r for r in grouped_trimmed_mean(df, "g", shard_size=50).collect()}
    for g, vals in by_g.items():
        n = len(vals)
        k = n // 10
        kept = vals[k : n - k]
        assert tm[g]["n_rows"] == n
        assert tm[g]["n_trimmed_each_side"] == k
        assert tm[g]["n_kept"] == len(kept)
        assert tm[g]["kept_sum_cents"] == sum(kept), g

    iq = {r["g"]: r for r in grouped_iqr_fences(df, "g", shard_size=50).collect()}
    import math

    for g, vals in by_g.items():
        n = len(vals)
        q1 = vals[math.ceil(n / 4) - 1]
        q3 = vals[math.ceil(3 * n / 4) - 1]
        iqr = q3 - q1
        n_out = sum(1 for v in vals if 2 * v < 2 * q1 - 3 * iqr or 2 * v > 2 * q3 + 3 * iqr)
        assert iq[g]["q1_cents"] == q1 and iq[g]["q3_cents"] == q3, g
        assert iq[g]["n_outliers"] == n_out, g


def test_weighted_quantiles_match_python(spark):
    """weight_col semantics: each row counts for its weight, so the
    weighted median equals the plain median of the weight-expanded
    multiset."""
    import math
    import random

    from cust_sagemaker_feature_store_spark.operators.order_stats import (
        grouped_exact_quantiles,
    )

    rng = random.Random(41)
    rows = [
        (f"g{i % 3}", rng.randrange(0, 40), rng.randrange(1, 9))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, cents long, wt long")
    got = {
        r["g"]: r
        for r in grouped_exact_quantiles(
            df, "g", quantiles=(("median", 1, 2), ("p90", 9, 10)),
            shard_size=8, weight_col="wt",
        ).collect()
    }
    expanded: dict[str, list[int]] = {}
    for g, c, w in rows:
        expanded.setdefault(g, []).extend([c] * w)
    for g, vals in expanded.items():
        vals.sort()
        n = len(vals)
        assert got[g]["n_rows"] == n  # total mass, not row count
        assert got[g]["median_cents"] == vals[math.ceil(n / 2) - 1], g
        assert got[g]["p90_cents"] == vals[math.ceil(9 * n / 10) - 1], g


def test_weighted_quantiles_reject_nonpositive_weights(spark):
    """ADVICE r7 #4: a zero/negative/NULL weight breaks the cum_n
    monotonicity the quantile selection relies on — the operator must
    fail loudly at execution, not return wrong quantiles. The check is
    embedded in the mass aggregate itself so column pruning can't
    remove it."""
    import pytest

    from cust_sagemaker_feature_store_spark.operators.order_stats import (
        grouped_exact_quantiles,
    )

    for bad in (0, -3, None):
        df = spark.createDataFrame(
            [("g", 10, 2), ("g", 20, bad), ("g", 30, 1)],
            "g string, cents long, wt long",
        )
        with pytest.raises(Exception, match="strictly positive"):
            grouped_exact_quantiles(
                df, "g", shard_size=8, weight_col="wt"
            ).collect()
    # valid weights still work after the guard
    ok = spark.createDataFrame(
        [("g", 10, 2), ("g", 20, 1)], "g string, cents long, wt long"
    )
    row = grouped_exact_quantiles(
        ok, "g", quantiles=(("p50", 1, 2),), shard_size=8, weight_col="wt"
    ).collect()[0]
    assert row["n_rows"] == 3 and row["p50_cents"] == 10


def test_chained_asof_joins_with_per_group_staleness_budgets(spark):
    """The fs_training_set_multi composition: TWO tolerance as-of joins
    chained probe-side, each group gated by its OWN max-age budget — a
    feature row PRESENT in history but older than its group's budget
    must yield NULL (never a leaked stale value), and chaining must not
    disturb the earlier stage's attached columns (__pid reuse across
    calls)."""
    from datetime import datetime

    from pyspark.sql import Row

    from cust_sagemaker_feature_store_spark.operators.asof import asof_join

    t = lambda s: datetime.fromisoformat(s)
    probe = spark.createDataFrame(
        [
            Row(label_id=1, user_id=1, pts=t("2024-01-10 12:00:00")),
            Row(label_id=2, user_id=2, pts=t("2024-01-10 12:00:00")),
        ]
    )
    # group A budget 1h: user 1 has a 30min-old row (fresh), user 2 a
    # 2h-old row (stale -> NULL even though an unbudgeted as-of matches)
    ga = spark.createDataFrame(
        [
            Row(user_id=1, a_id=10, a_ts=t("2024-01-10 11:30:00"), a_val=1.0),
            Row(user_id=2, a_id=11, a_ts=t("2024-01-10 10:00:00"), a_val=2.0),
        ]
    )
    # group B budget 1 day: both users fresh, user 2's latest wins
    gb = spark.createDataFrame(
        [
            Row(user_id=1, b_id=20, b_ts=t("2024-01-10 01:00:00"), b_val=3.0),
            Row(user_id=2, b_id=21, b_ts=t("2024-01-09 23:00:00"), b_val=4.0),
            Row(user_id=2, b_id=22, b_ts=t("2024-01-10 06:00:00"), b_val=5.0),
        ]
    )
    out = probe
    for feats, ft, tol, tie in (
        (ga, "a_ts", 3600, "a_id"),
        (gb, "b_ts", 86400, "b_id"),
    ):
        out = asof_join(
            out, feats, on="user_id", probe_time="pts",
            feature_time=ft, how="left", tolerance_seconds=tol,
            tie_breaker=tie,
        )
    rows = {r["label_id"]: r for r in out.collect()}
    assert rows[1]["a_val"] == 1.0 and rows[1]["b_val"] == 3.0
    assert rows[2]["a_val"] is None, "stale group-A row must not leak"
    assert rows[2]["a_ts"] is None
    assert rows[2]["b_val"] == 5.0, "fresh group-B row still attaches"


def test_interval_overlap_join_matches_bruteforce(spark):
    """Bucketized interval-overlap join equals the O(n·m) reference on
    random half-open intervals: multi-bucket spans, boundary-exact
    starts/ends (no off-by-one at bucket edges), zero duplicate pairs
    from the canonical-bucket dedup, and touching intervals excluded
    by half-open semantics."""
    import random

    from pyspark.sql import Row

    from cust_sagemaker_feature_store_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    rng = random.Random(23)
    B = 100  # bucket width
    lrows, rrows = [], []
    for i in range(60):
        s = rng.randrange(0, 2000)
        lrows.append(Row(lid=i, ls=s, le=s + rng.randrange(1, 350)))
    for j in range(40):
        s = rng.randrange(0, 2000)
        rrows.append(Row(rid=j, rs=s, re=s + rng.randrange(1, 250)))
    # boundary cases: exactly touching (NOT overlapping, half-open) and
    # bucket-aligned starts/ends
    lrows.append(Row(lid=100, ls=400, le=500))
    rrows.append(Row(rid=100, rs=500, re=600))   # touches 100 -> excluded
    rrows.append(Row(rid=101, rs=499, re=501))   # 1-unit overlap -> included
    left = spark.createDataFrame(lrows)
    right = spark.createDataFrame(rrows)
    got = [
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left,
            right,
            F.col("ls").cast("long"),
            F.col("le").cast("long"),
            F.col("rs").cast("long"),
            F.col("re").cast("long"),
            bucket_us=B,
        ).collect()
    ]
    want = {
        (lr.lid, rr.rid)
        for lr in lrows
        for rr in rrows
        if lr.ls < rr.re and rr.rs < lr.le
    }
    assert len(got) == len(set(got)), "canonical-bucket dedup must yield unique pairs"
    assert set(got) == want
    assert (100, 101) in want and (100, 100) not in want


def _brute_skyline(points):
    out = []
    for x, y in points:
        dominated = any(
            (qx <= x and qy >= y and (qx < x or qy > y)) for qx, qy in points
        )
        if not dominated:
            out.append((x, y))
    return sorted(out)


def test_skyline_2d_matches_bruteforce_random(spark):
    from cust_sagemaker_feature_store_spark.operators.skyline import skyline_2d

    rng = random.Random(42)
    for trial in range(3):
        pts = [(rng.randrange(0, 50), rng.randrange(0, 20)) for _ in range(200)]
        df = spark.createDataFrame(
            [(i, x, y) for i, (x, y) in enumerate(pts)], "id long, x long, y long"
        )
        got = sorted(
            {(r["x"], r["y"]) for r in skyline_2d(df, "x", "y", shard_size=7).collect()}
        )
        assert got == _brute_skyline(pts), f"trial {trial} diverged"


def test_skyline_2d_null_coordinates_incomparable(spark):
    # ADVICE r10 #3 regression: under the NOT EXISTS oracle contract a
    # NULL-coordinate row is incomparable — always on the frontier,
    # never dominating. The old code silently dropped such rows.
    from cust_sagemaker_feature_store_spark.operators.skyline import skyline_2d

    rows = [
        (1, 10, 5),      # dominated by (3, 5, 9)? 5<=10 and 9>=5 -> yes
        (2, 5, None),    # NULL y: retained, dominates nothing
        (3, 5, 9),
        (4, None, 99),   # NULL x: retained, its y must NOT suppress others
        (5, 20, 9),      # dominated by (3, 5, 9)
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {r["id"] for r in skyline_2d(df, "x", "y", shard_size=7).collect()}
    # frontier of the non-null points is just (5, 9); both NULL rows ride along
    assert got == {2, 3, 4}


def test_skyline_2d_duplicates_and_single_point(spark):
    from cust_sagemaker_feature_store_spark.operators.skyline import skyline_2d

    # duplicate frontier points neither dominate each other: both stay
    df = spark.createDataFrame(
        [(0, 1, 10), (1, 1, 10), (2, 2, 5), (3, 0, 1)],
        "id long, x long, y long",
    )
    got = sorted(
        (r["id"], r["x"], r["y"])
        for r in skyline_2d(df, "x", "y", shard_size=1000).collect()
    )
    # (0,1): y=1 at x=0 is frontier (cheapest); (1,10) twice: strictly
    # better y than anything cheaper; (2,5) dominated by (1,10)
    assert got == [(0, 1, 10), (1, 1, 10), (3, 0, 1)]

    one = spark.createDataFrame([(0, 5, 5)], "id long, x long, y long")
    assert skyline_2d(one, "x", "y").count() == 1


def test_er_gold_banded_fallback_matches_broadcast(spark, sf_dir, monkeypatch):
    """r13 verdict nit: the er_blocking_quality gold standard's supplier
    broadcast is now gated on a measured row count. Above the gate the
    FastSS deletion-neighborhood banded join must produce the IDENTICAL
    exact gold set — the pigeonhole is a theorem (substitution at i
    makes both i-deletions equal; an insertion's deletion recovers the
    shorter string), so zero tolerance."""
    from pyspark.sql import functions as F

    from cust_sagemaker_feature_store_spark.catalog import load_table
    from cust_sagemaker_feature_store_spark.operators.sketches import hash48
    from cust_sagemaker_feature_store_spark.queries import relational7_q as R

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.expr("substr(c_name, 10)").alias("cd")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", F.expr("substr(s_name, 10)").alias("sd")
    )
    cs = cust.filter(hash48("c_custkey", "er") % 10 == 0)

    via_broadcast = sorted(
        (r["c_custkey"], r["s_suppkey"])
        for r in R._er_gold_pairs(cs, supp).collect()
    )
    monkeypatch.setattr(R, "_ER_GOLD_BROADCAST_MAX_ROWS", 0)
    via_banded = sorted(
        (r["c_custkey"], r["s_suppkey"])
        for r in R._er_gold_pairs(cs, supp).collect()
    )
    assert via_banded == via_broadcast
    assert via_broadcast  # non-vacuous: the sample does hit true pairs


def test_er_gold_banded_catches_insertion_and_deletion_pairs(spark, monkeypatch):
    """The registry ids are fixed-length (substitutions only); prove the
    deletion-neighborhood fallback on variable-length inputs too, where
    distance-1 pairs arise by insertion/deletion."""
    from cust_sagemaker_feature_store_spark.queries import relational7_q as R

    left = spark.createDataFrame(
        [(1, "abc"), (2, "abcd"), (3, "xyz"), (4, "q")],
        "c_custkey long, cd string",
    )
    right = spark.createDataFrame(
        [(10, "abc"), (11, "ab"), (12, "xxyz"), (13, "zzz"), (14, "qq")],
        "s_suppkey long, sd string",
    )
    monkeypatch.setattr(R, "_ER_GOLD_BROADCAST_MAX_ROWS", 0)
    got = sorted(
        (r["c_custkey"], r["s_suppkey"])
        for r in R._er_gold_pairs(left, right).collect()
    )
    # lev(abc,abc)=0; lev(abc,ab)=1 (deletion); lev(abcd,abc)=1;
    # lev(xyz,xxyz)=1 (insertion); lev(q,qq)=1; nothing matches zzz
    assert got == [(1, 10), (1, 11), (2, 10), (3, 12), (4, 14)]

"""Mergeable-sketch query surface (SURVEY.md §2.4 [EXT]).

The reference answers COUNT(DISTINCT ...) by delegating to Athena
(reference `athena_client.py` run_query); at 100 TB the bounded-memory
answer is a cardinality sketch. Spark's built-in approx_count_distinct
(HLL++) is benchmarked by `agg_approx_distinct` but its engine-private
xxhash state can only earn a rows-only driver row — these queries
rebuild the two classic sketches on the portable md5-derived hash48
(operators/sketches.py) so the ENTIRE sketch — min-hash sets, HLL
registers, and the estimates — hash-matches a DuckDB oracle exactly.

Every boolean pinned TRUE below is a theorem of the construction
(merge losslessness, register-max associativity), not a measured
coincidence; the accuracy booleans carry documented >= 2x margin over
the worst error observed across sf0.001 / sf0.01 / sf0.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import sketches as SK
from .registry import register

KMV_K = 128
# |est - exact| * DEN <= NUM * exact. KMV k=128 has relative standard
# error ~ 1/sqrt(k-2) = 8.9%; worst observed across the three SFs is
# 11.5% (sf0.01, where the five groups share one unlucky low-tail
# draw of the common custkey hash universe) — the 25% ceiling is
# 2.2x that. At sf0.001 groups hold < k distinct keys, so the
# exact-fallback branch is what that SF exercises.
KMV_TOL_NUM, KMV_TOL_DEN = 1, 4  # 25%

_HASH = SK.sql_hash48("o_custkey")
_KMV_SCALED = (KMV_K - 1) * SK.HASH_SPACE

_KMV_SQL = f"""
WITH h AS (
  SELECT DISTINCT o_orderpriority AS grp, {_HASH} AS hv FROM orders
),
r AS (
  SELECT grp, hv,
         row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn
  FROM h
),
direct AS (
  SELECT grp, MAX(hv) AS kth_hash, CAST(COUNT(*) AS BIGINT) AS sketch_size
  FROM r WHERE rn <= {KMV_K} GROUP BY grp
),
hs AS (
  SELECT DISTINCT o_orderpriority AS grp, month(o_orderdate) AS shard,
         {_HASH} AS hv
  FROM orders
),
rs AS (
  SELECT grp, hv,
         row_number() OVER (PARTITION BY grp, shard ORDER BY hv) AS rn
  FROM hs
),
mu AS (SELECT DISTINCT grp, hv FROM rs WHERE rn <= {KMV_K}),
rm AS (
  SELECT grp, hv,
         row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn
  FROM mu
),
merged AS (
  SELECT grp, MAX(hv) AS kth_m, CAST(COUNT(*) AS BIGINT) AS size_m
  FROM rm WHERE rn <= {KMV_K} GROUP BY grp
),
ex AS (
  SELECT o_orderpriority AS grp,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
  FROM orders GROUP BY grp
),
est AS (
  SELECT d.grp, d.kth_hash, d.sketch_size,
         CASE WHEN d.sketch_size < {KMV_K} THEN d.sketch_size
              ELSE {_KMV_SCALED} // d.kth_hash END AS kmv_estimate,
         m.kth_m, m.size_m
  FROM direct d JOIN merged m ON m.grp = d.grp
)
SELECT e.grp AS o_orderpriority, e.kth_hash, e.kmv_estimate, e.sketch_size,
       x.exact_distinct,
       abs(e.kmv_estimate - x.exact_distinct) * {KMV_TOL_DEN}
         <= {KMV_TOL_NUM} * x.exact_distinct AS within_tol,
       (e.kth_m = e.kth_hash AND e.size_m = e.sketch_size) AS merged_equal
FROM est e JOIN ex x ON x.grp = e.grp
"""


@register(
    "agg_kmv_distinct",
    oracle=_KMV_SQL,
    description=(
        "[EXT] KMV (k-minimum-values) distinct-count sketch per order "
        "priority, ORACLE-EXACT end to end: the k=128 smallest distinct "
        "md5-hash48 values, the kth hash, and the Beyer et al. "
        "estimate floor((k-1)*2^48 / h_k) are all pure int64 and "
        "hash-match DuckDB bit for bit — the cross-engine evidence "
        "Spark's built-in HLL++ cannot give. merged_equal pins the "
        "KMV merge THEOREM (k smallest of the union of per-month "
        "k-smallest sets == global k smallest; every global top-k "
        "hash survives its own shard's cut), i.e. the property that "
        "makes the sketch shard/stream-mergeable at 100 TB, where the "
        "shuffle carries at most k hashes per group instead of the "
        "key universe. within_tol pins a 25% accuracy ceiling — 2.2x "
        "the worst error across the three SFs (11.5% at sf0.01; see "
        "tests/test_sketches.py)."
    ),
)
def agg_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    grp = ["o_orderpriority"]
    est = SK.kmv_estimate(
        SK.kmv_minset(orders, grp, F.col("o_custkey"), KMV_K), grp, KMV_K
    )
    shards = orders.withColumn("shard", F.month("o_orderdate"))
    merged = SK.kmv_estimate(
        SK.kmv_merge_minsets(
            SK.kmv_minset(
                shards, grp + ["shard"], F.col("o_custkey"), KMV_K
            ),
            grp,
            KMV_K,
        ),
        grp,
        KMV_K,
    ).select(
        *grp,
        F.col("kth_hash").alias("kth_m"),
        F.col("sketch_size").alias("size_m"),
    )
    exact = orders.groupBy(*grp).agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_distinct")
    )
    return (
        est.join(merged, grp)
        .join(exact, grp)
        .select(
            *grp,
            "kth_hash",
            "kmv_estimate",
            "sketch_size",
            "exact_distinct",
            (
                F.abs(F.col("kmv_estimate") - F.col("exact_distinct"))
                * KMV_TOL_DEN
                <= KMV_TOL_NUM * F.col("exact_distinct")
            ).alias("within_tol"),
            (
                (F.col("kth_m") == F.col("kth_hash"))
                & (F.col("size_m") == F.col("sketch_size"))
            ).alias("merged_equal"),
        )
    )


# HLL m=64 raw estimate: relative standard error 1.04/sqrt(64) = 13%;
# worst observed across the three SFs is 10.6% (sf0.1 1-URGENT) —
# the 25% ceiling is 2.3x that.
HLL_TOL_NUM, HLL_TOL_DEN = 1, 4  # 25%

_HLL_NUMERATOR = SK.ALPHA_NUM * SK.HLL_M**2 * (1 << (SK.HASH_BITS - SK.HLL_P + 1))
_REM_MASK = (1 << (SK.HASH_BITS - SK.HLL_P)) - 1
_TWO_POW_43 = 1 << (SK.HASH_BITS - SK.HLL_P + 1)

_HLL_SQL = f"""
WITH h AS (
  SELECT o_orderpriority AS grp, {_HASH} AS hv FROM orders
),
b AS (
  SELECT grp, hv >> {SK.HASH_BITS - SK.HLL_P} AS bucket,
         hv & {_REM_MASK} AS rem
  FROM h
),
regs AS (
  SELECT grp, bucket, MAX({SK.sql_hll_rho('rem')}) AS register
  FROM b GROUP BY grp, bucket
),
s AS (
  SELECT grp,
         CAST(SUM(1::BIGINT << ({SK.HASH_BITS - SK.HLL_P + 1} - register))
              + ({SK.HLL_M} - COUNT(*)) * {_TWO_POW_43} AS BIGINT) AS s_total,
         CAST({SK.HLL_M} - COUNT(*) AS BIGINT) AS zero_registers
  FROM regs GROUP BY grp
),
ex AS (
  SELECT o_orderpriority AS grp,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
  FROM orders GROUP BY grp
),
est AS (
  SELECT grp,
         CAST(CAST({_HLL_NUMERATOR} AS HUGEINT)
              // (s_total * {SK.ALPHA_DEN}) AS BIGINT) AS hll_estimate,
         zero_registers
  FROM s
)
SELECT e.grp AS o_orderpriority, e.hll_estimate, e.zero_registers,
       x.exact_distinct,
       abs(e.hll_estimate - x.exact_distinct) * {HLL_TOL_DEN}
         <= {HLL_TOL_NUM} * x.exact_distinct AS within_tol
FROM est e JOIN ex x ON x.grp = e.grp
"""


@register(
    "agg_hll_custom",
    oracle=_HLL_SQL,
    description=(
        "[EXT] HyperLogLog with EXPLICIT registers per order priority "
        "(p=6, m=64, Flajolet et al. 2007), oracle-exact end to end: "
        "bucket = top 6 bits of md5-hash48, rho = 1 + leading zeros "
        "of the remaining 42 bits via LENGTH(BIN(x)) (minimal-length "
        "binary in both engines), registers = MAX(rho), and the raw "
        "harmonic-mean estimate floor(alpha_64*m^2*2^43 / S) computed "
        "with decimal(38,0) `div` == HUGEINT `//` (exact integral "
        "quotient; F.floor(a/b) on decimals rounds the quotient at 6dp "
        "and can cross an integer boundary). Register MAX is the HLL "
        "merge operator — associative, commutative, idempotent — so "
        "the same 64 cells fold across partitions map-side, across "
        "shards, and on a stream (stream_hll_registers_twin). "
        "zero_registers exposes the linear-counting signal V; "
        "within_tol pins a 25% ceiling (2.3x the worst observed "
        "across the three SFs, raw-regime bias included — the "
        "estimate column itself is deterministic and hash-exact "
        "regardless)."
    ),
)
def agg_hll_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    grp = ["o_orderpriority"]
    est = SK.hll_estimate(
        SK.hll_registers(orders, grp, F.col("o_custkey")), grp
    )
    exact = orders.groupBy(*grp).agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_distinct")
    )
    return est.join(exact, grp).select(
        *grp,
        "hll_estimate",
        "zero_registers",
        "exact_distinct",
        (
            F.abs(F.col("hll_estimate") - F.col("exact_distinct"))
            * HLL_TOL_DEN
            <= HLL_TOL_NUM * F.col("exact_distinct")
        ).alias("within_tol"),
    )


_HLL_STREAM_HASH = SK.sql_hash48("user_id")

_HLL_STREAM_SQL = f"""
WITH h AS (SELECT {_HLL_STREAM_HASH} AS hv FROM events),
b AS (
  SELECT hv >> {SK.HASH_BITS - SK.HLL_P} AS bucket,
         hv & {_REM_MASK} AS rem
  FROM h
)
SELECT bucket, CAST(MAX({SK.sql_hll_rho('rem')}) AS INTEGER) AS register
FROM b GROUP BY bucket
"""


@register(
    "stream_hll_registers_twin",
    oracle=_HLL_STREAM_SQL,
    description=(
        "[EXT] batch twin of the STREAMING HyperLogLog register table "
        "(streaming/windows.hll_register_counters over events.user_id) "
        "— distinct users on an unbounded stream with state capped at "
        "m = 64 cells, maintained as a plain streaming MAX "
        "aggregation. This twin runs the streaming operator's own "
        "function on the batch frame so the oracle pins its "
        "bucket/rho arithmetic cell by cell (the md5-hash48 path that "
        "built-in approx_count_distinct cannot oracle); streaming "
        "execution and stream == batch register equality are pinned "
        "by tests/test_streaming.py, and registers merge with batch "
        "shards by MAX."
    ),
)
def stream_hll_registers_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import hll_register_counters

    ev = load_table(spark, sf_dir, "events")
    return hll_register_counters(ev, "user_id")


# Theta-sketch set algebra: |est - exact| * DEN <= NUM * exact.
# Worst observed across the three SFs: intersection 5.0%, union 6.0%
# (sf0.1) — the 15% ceiling is 2.5x that.
THETA_TOL_NUM, THETA_TOL_DEN = 3, 20  # 15%

_THETA_SQL = f"""
WITH ha AS (
  SELECT DISTINCT {_HASH} AS hv FROM orders WHERE o_orderstatus = 'O'
),
ma AS (
  SELECT hv FROM (
    SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM ha
  ) WHERE rn <= {KMV_K}
),
ta AS (
  SELECT CASE WHEN COUNT(*) < {KMV_K} THEN {SK.HASH_SPACE}
              ELSE MAX(hv) END AS th
  FROM ma
),
hb AS (
  SELECT DISTINCT {_HASH} AS hv FROM orders WHERE o_orderstatus = 'F'
),
mb AS (
  SELECT hv FROM (
    SELECT hv, row_number() OVER (ORDER BY hv) AS rn FROM hb
  ) WHERE rn <= {KMV_K}
),
tb AS (
  SELECT CASE WHEN COUNT(*) < {KMV_K} THEN {SK.HASH_SPACE}
              ELSE MAX(hv) END AS th
  FROM mb
),
th AS (SELECT least(ta.th, tb.th) AS theta FROM ta, tb),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS s_count
  FROM ma JOIN mb USING (hv), th
  WHERE hv < theta
),
mu AS (
  SELECT hv, row_number() OVER (ORDER BY hv) AS rn
  FROM (SELECT hv FROM ma UNION SELECT hv FROM mb)
),
u AS (
  SELECT CASE WHEN COUNT(*) < {KMV_K} THEN CAST(COUNT(*) AS BIGINT)
              ELSE {(KMV_K - 1) * SK.HASH_SPACE} // MAX(hv) END AS union_est
  FROM mu WHERE rn <= {KMV_K}
),
xa AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
xb AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
xi AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS inter_exact
  FROM xa JOIN xb USING (o_custkey)
),
xu AS (
  SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS union_exact
  FROM (SELECT o_custkey FROM xa UNION ALL SELECT o_custkey FROM xb)
)
SELECT th.theta, s.s_count,
       s.s_count * {SK.HASH_SPACE} // th.theta AS inter_est,
       xi.inter_exact,
       abs(s.s_count * {SK.HASH_SPACE} // th.theta - xi.inter_exact)
         * {THETA_TOL_DEN} <= {THETA_TOL_NUM} * xi.inter_exact AS inter_ok,
       u.union_est, xu.union_exact,
       abs(u.union_est - xu.union_exact) * {THETA_TOL_DEN}
         <= {THETA_TOL_NUM} * xu.union_exact AS union_ok
FROM th, s, u, xi, xu
"""


@register(
    "agg_theta_intersection",
    oracle=_THETA_SQL,
    description=(
        "[EXT] theta-sketch SET ALGEBRA over two KMV synopses "
        "(Dasgupta et al. 2016, the DataSketches theta framework), "
        "oracle-exact end to end: open-order vs finished-order "
        "customer sets each keep their k=128 smallest distinct "
        "hashes; theta = min(theta_A, theta_B), the intersection "
        "estimate counts common hashes below theta scaled by "
        "2^48/theta, the union estimate re-cuts the merged minset — "
        "every intermediate (theta, s_count, both estimates) is pure "
        "int64 and hash-matches DuckDB. Degrades to EXACT when a "
        "side holds < k distinct keys (theta = 2^48). This is the "
        "sketch answer to 'how many customers appear in BOTH of two "
        "100 TB partitions' — two bounded synopses and set algebra "
        "on k hashes, vs a full distinct-key shuffle of each side; "
        "the same algebra estimates join cardinalities before "
        "running the join. Tolerance booleans pin a 15% ceiling, "
        "2.5x the worst observed across the three SFs (5-6%)."
    ),
)
def agg_theta_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O")
    b = orders.filter(F.col("o_orderstatus") == "F")
    ma = SK.kmv_minset(a, [], F.col("o_custkey"), KMV_K)
    mb = SK.kmv_minset(b, [], F.col("o_custkey"), KMV_K)
    theta_of = lambda ms: ms.agg(  # noqa: E731
        F.when(F.count(F.lit(1)) < KMV_K, F.lit(SK.HASH_SPACE))
        .otherwise(F.max("hv"))
        .alias("th")
    )
    th = (
        theta_of(ma)
        .crossJoin(theta_of(mb).withColumnRenamed("th", "th_b"))
        .select(F.least("th", "th_b").alias("theta"))
    )
    s = (
        ma.select("hv")
        .join(mb.select("hv"), "hv")
        .crossJoin(F.broadcast(th))
        .filter(F.col("hv") < F.col("theta"))
        .agg(F.count(F.lit(1)).cast("long").alias("s_count"))
    )
    u = SK.kmv_estimate(
        SK.kmv_merge_minsets(ma.unionByName(mb), [], KMV_K), [], KMV_K
    ).select(F.col("kmv_estimate").alias("union_est"))
    xa = a.select("o_custkey").distinct()
    xb = b.select("o_custkey").distinct()
    xi = xa.join(xb, "o_custkey").agg(
        F.count(F.lit(1)).cast("long").alias("inter_exact")
    )
    xu = xa.unionByName(xb).distinct().agg(
        F.count(F.lit(1)).cast("long").alias("union_exact")
    )
    inter_est = F.expr(f"s_count * {SK.HASH_SPACE} div theta")
    return (
        th.crossJoin(s)
        .crossJoin(u)
        .crossJoin(xi)
        .crossJoin(xu)
        .select(
            "theta",
            "s_count",
            inter_est.alias("inter_est"),
            "inter_exact",
            (
                F.abs(inter_est - F.col("inter_exact")) * THETA_TOL_DEN
                <= THETA_TOL_NUM * F.col("inter_exact")
            ).alias("inter_ok"),
            "union_est",
            "union_exact",
            (
                F.abs(F.col("union_est") - F.col("union_exact")) * THETA_TOL_DEN
                <= THETA_TOL_NUM * F.col("union_exact")
            ).alias("union_ok"),
        )
    )


KMV_STORE_EPOCHS = 5
_EV_HASH = SK.sql_hash48("user_id")

_KMV_STORE_SQL = f"""
WITH h AS (
  SELECT DISTINCT event_type, event_id % {KMV_STORE_EPOCHS} AS epoch,
         {_EV_HASH} AS hv
  FROM events
),
r AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type, epoch ORDER BY hv) AS rn
  FROM h
),
mu AS (SELECT DISTINCT event_type, hv FROM r WHERE rn <= {KMV_K}),
rm AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM mu
),
served AS (
  SELECT event_type, MAX(hv) AS kth_hash,
         CAST(COUNT(*) AS BIGINT) AS sketch_size
  FROM rm WHERE rn <= {KMV_K} GROUP BY event_type
),
hd AS (SELECT DISTINCT event_type, {_EV_HASH} AS hv FROM events),
rd AS (
  SELECT event_type, hv,
         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM hd
),
direct AS (
  SELECT event_type, MAX(hv) AS kth_d, CAST(COUNT(*) AS BIGINT) AS size_d
  FROM rd WHERE rn <= {KMV_K} GROUP BY event_type
)
SELECT s.event_type, s.kth_hash,
       CASE WHEN s.sketch_size < {KMV_K} THEN s.sketch_size
            ELSE {_KMV_SCALED} // s.kth_hash END AS kmv_estimate,
       s.sketch_size,
       (s.kth_hash = d.kth_d AND s.sketch_size = d.size_d) AS equals_direct
FROM served s JOIN direct d ON d.event_type = s.event_type
"""


@register(
    "stream_kmv_store_twin",
    oracle=_KMV_STORE_SQL,
    description=(
        "[EXT] batch twin of the PERSISTED streaming KMV store "
        "(streaming/kmv_store.StreamingKmvStore over events: per "
        "event_type, the k=128 smallest distinct md5-hash48 values "
        "of user_id): the stream appends each micro-batch's own "
        "minset epoch-stamped (<= k rows per group per batch, "
        "replay-idempotent dynamic partition overwrite) and serve() "
        "merges the stored minsets losslessly. This twin runs the "
        "maintainer's own replay/serve function on the batch frame "
        f"(epochs = event_id % {KMV_STORE_EPOCHS}) so the oracle "
        "pins the serving arithmetic hash-for-hash; equals_direct "
        "pins the merge THEOREM (served sketch == sketch of the "
        "whole history), the property that makes the store's state "
        "bytes-per-group at any stream length. Streaming execution, "
        "checkpoint-restart equality, and lossless compaction are "
        "pinned by tests/test_streaming.py."
    ),
)
def stream_kmv_store_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.kmv_store import replay_kmv_epochs

    ev = load_table(spark, sf_dir, "events")
    served = replay_kmv_epochs(
        ev,
        F.col("event_id") % KMV_STORE_EPOCHS,
        ["event_type"],
        F.col("user_id"),
        KMV_K,
    )
    direct = SK.kmv_estimate(
        SK.kmv_minset(ev, ["event_type"], F.col("user_id"), KMV_K),
        ["event_type"],
        KMV_K,
    ).select(
        "event_type",
        F.col("kth_hash").alias("kth_d"),
        F.col("sketch_size").alias("size_d"),
    )
    return served.join(direct, "event_type").select(
        "event_type",
        "kth_hash",
        "kmv_estimate",
        "sketch_size",
        (
            (F.col("kth_hash") == F.col("kth_d"))
            & (F.col("sketch_size") == F.col("size_d"))
        ).alias("equals_direct"),
    )


BLOOM_M = 32768  # bits; sized so j*n/m stays << 1 through sf0.1
BLOOM_SALTS = ("b0", "b1", "b2")
# fp among non-matching probe rows: measured 0 / 0 / 0.20% across the
# three SFs — the 2% ceiling is 10x the worst observed.
BLOOM_FP_NUM, BLOOM_FP_DEN = 1, 50


def _bloom_bit(expr: str, salt: str) -> str:
    return f"{SK.sql_hash48(expr, salt)} % {BLOOM_M}"


_BLOOM_SQL = f"""
WITH dim AS (
  SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > 9000
),
bits AS (
  SELECT DISTINCT b FROM (
    SELECT {_bloom_bit('c_custkey', 'b0')} AS b FROM dim
    UNION ALL SELECT {_bloom_bit('c_custkey', 'b1')} FROM dim
    UNION ALL SELECT {_bloom_bit('c_custkey', 'b2')} FROM dim
  )
),
probe AS (SELECT o_orderkey, o_custkey FROM orders),
cand AS (
  SELECT p.o_orderkey, p.o_custkey FROM probe p
  WHERE {_bloom_bit('p.o_custkey', 'b0')} IN (SELECT b FROM bits)
    AND {_bloom_bit('p.o_custkey', 'b1')} IN (SELECT b FROM bits)
    AND {_bloom_bit('p.o_custkey', 'b2')} IN (SELECT b FROM bits)
),
tm AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_true,
         CAST(COUNT(DISTINCT p.o_orderkey) AS BIGINT) AS n_true_keys
  FROM probe p JOIN dim d ON d.c_custkey = p.o_custkey
),
missed AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_missed
  FROM probe p JOIN dim d ON d.c_custkey = p.o_custkey
  WHERE p.o_orderkey NOT IN (SELECT o_orderkey FROM cand)
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM dim) AS n_keys,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS bits_set,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM probe) AS n_probe,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
       tm.n_true,
       missed.n_missed = 0 AS no_false_negatives,
       ((SELECT COUNT(*) FROM cand) - tm.n_true) * {BLOOM_FP_DEN}
         <= ((SELECT COUNT(*) FROM probe) - tm.n_true) * {BLOOM_FP_NUM}
         AS fp_ok
FROM tm, missed
"""


@register(
    "join_bloom_prune",
    oracle=_BLOOM_SQL,
    description=(
        "[EXT] EXPLICIT Bloom-filter join pruning with portable "
        f"hashes (Bloom 1970): m = {BLOOM_M} bits, j = 3 salted "
        "md5-hash48 positions per key, built from the selective dim "
        "side (high-balance customers) and probed by the fact side "
        "(orders) with all-bits-present conjunction — every bit "
        "position is pure int64, so the filter, the candidate set, "
        "and both booleans hash-match DuckDB exactly (Spark's own "
        "runtime BloomFilter state is engine-private, same reason "
        "the sketch family exists). no_false_negatives pins the "
        "Bloom THEOREM (a member's bits are all set by "
        "construction); fp_ok pins a 2% false-positive ceiling among "
        "non-matching rows, 10x the worst observed across the three "
        "SFs (0.20% at sf0.1). The complement to "
        "operators/runtime_filter's semi-join reduction: at 100 TB "
        "the bit table is KB-sized and broadcast, pruning the fact "
        "scan BEFORE the join shuffle — 91% of probe rows dropped "
        "here — and bits OR-merge across dim shards like every "
        "sketch in this module."
    ),
)
def join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    dim = (
        customer.filter(F.col("c_acctbal") > 9000)
        .select("c_custkey")
        .distinct()
    )
    bits = None
    for salt in BLOOM_SALTS:
        part = dim.select(
            (SK.hash48("c_custkey", salt) % BLOOM_M).alias("b")
        )
        bits = part if bits is None else bits.unionByName(part)
    bits = bits.distinct()
    probe = orders.select("o_orderkey", "o_custkey")
    cand = probe
    for salt in BLOOM_SALTS:
        # m is bounded by construction (32768 rows max), so the
        # broadcast is always safe — unlike a key-set semi-join,
        # which needs the _FILTER_BROADCAST_MAX_IDS gate
        cand = cand.join(
            F.broadcast(bits),
            SK.hash48("o_custkey", salt) % BLOOM_M == F.col("b"),
            "semi",
        )
    true_m = probe.join(
        dim, probe["o_custkey"] == dim["c_custkey"], "semi"
    )
    missed = true_m.join(
        cand.select("o_orderkey"), "o_orderkey", "anti"
    ).agg(F.count(F.lit(1)).alias("n_missed"))
    stats = (
        dim.agg(F.count(F.lit(1)).cast("long").alias("n_keys"))
        .crossJoin(bits.agg(F.count(F.lit(1)).cast("long").alias("bits_set")))
        .crossJoin(probe.agg(F.count(F.lit(1)).cast("long").alias("n_probe")))
        .crossJoin(
            cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
        )
        .crossJoin(true_m.agg(F.count(F.lit(1)).cast("long").alias("n_true")))
        .crossJoin(missed)
    )
    return stats.select(
        "n_keys",
        "bits_set",
        "n_probe",
        "n_candidates",
        "n_true",
        (F.col("n_missed") == 0).alias("no_false_negatives"),
        (
            (F.col("n_candidates") - F.col("n_true")) * BLOOM_FP_DEN
            <= (F.col("n_probe") - F.col("n_true")) * BLOOM_FP_NUM
        ).alias("fp_ok"),
    )


HIST_BIN_CENTS = 1_000_000  # $10k bins over o_totalprice cents
HIST_QUANTILES = ((1, 4, "p25"), (1, 2, "p50"), (3, 4, "p75"))

_HIST_Q_ROWS = " UNION ALL ".join(
    f"SELECT {num} AS qn, {den} AS qd, '{lbl}' AS q"
    for num, den, lbl in HIST_QUANTILES
)

_HIST_SQL = f"""
WITH c AS (
  SELECT o_orderpriority AS grp,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
bins AS (
  SELECT grp, cents // {HIST_BIN_CENTS} AS bin,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM c GROUP BY 1, 2
),
cum AS (
  SELECT grp, bin, cnt,
         SUM(cnt) OVER (PARTITION BY grp ORDER BY bin) AS cum_to,
         SUM(cnt) OVER (PARTITION BY grp) AS n
  FROM bins
),
qs AS ({_HIST_Q_ROWS}),
hit AS (
  SELECT cum.grp, qs.q, cum.bin, cum.cnt, cum.n,
         (qs.qn * cum.n + qs.qd - 1) // qs.qd AS k,
         cum.cum_to - cum.cnt AS cum_before
  FROM cum, qs
  WHERE cum.cum_to - cum.cnt < (qs.qn * cum.n + qs.qd - 1) // qs.qd
    AND (qs.qn * cum.n + qs.qd - 1) // qs.qd <= cum.cum_to
),
est AS (
  SELECT grp, q, n, k, bin,
         CAST(bin * {HIST_BIN_CENTS}
              + (k - cum_before) * {HIST_BIN_CENTS} // cnt
              AS BIGINT) AS est_cents
  FROM hit
),
ranked AS (
  SELECT grp, cents,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY cents) AS rn
  FROM c
),
exact AS (
  SELECT e.grp, e.q, r.cents AS exact_cents
  FROM est e JOIN ranked r ON r.grp = e.grp AND r.rn = e.k
)
SELECT e.grp AS o_orderpriority, e.q, CAST(e.n AS BIGINT) AS n,
       CAST(e.k AS BIGINT) AS k, CAST(e.bin AS BIGINT) AS bin,
       e.est_cents, x.exact_cents,
       abs(e.est_cents - x.exact_cents) <= {HIST_BIN_CENTS} AS bound_ok
FROM est e JOIN exact x ON x.grp = e.grp AND x.q = e.q
"""


@register(
    "agg_histogram_quantiles",
    oracle=_HIST_SQL,
    description=(
        "[EXT] mergeable fixed-bin histogram quantile sketch, "
        "oracle-exact: per order priority the o_totalprice cents "
        "distribution folds into $10k bins (counters mergeable by "
        "ADDITION across partitions/shards/streams — the property "
        "Spark's engine-private KLL percentile_approx state lacks a "
        "DuckDB twin for), and p25/p50/p75 read off the cumulative "
        "bin counts with integral linear interpolation inside the "
        "hit bin — bin choice (ceil-rank), interpolation, and the "
        "estimate are all pure int64 and hash-match cross-engine. "
        "bound_ok pins the STRUCTURAL error bound: the ceil-rank "
        "order statistic lives in the hit bin, and the interpolated "
        "estimate stays inside that bin's closure, so "
        "|est - exact| <= bin width ALWAYS — a theorem of the "
        "construction, checked against the exact windowed order "
        "statistic. 100 TB story: state is O(value range / bin "
        "width) counters per group, one map-side-combined pass, vs "
        "a full sort for the exact quantile; the exact-rank branch "
        "here exists only to prove the bound."
    ),
)
def agg_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    c = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    bins = c.groupBy(
        "grp", F.expr(f"cents div {HIST_BIN_CENTS}").alias("bin")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    cum = bins.select(
        "grp",
        "bin",
        "cnt",
        F.sum("cnt").over(W.partitionBy("grp").orderBy("bin")).alias("cum_to"),
        F.sum("cnt").over(W.partitionBy("grp")).alias("n"),
    )
    qs = spark.createDataFrame(
        [(num, den, lbl) for num, den, lbl in HIST_QUANTILES],
        "qn long, qd long, q string",
    )
    k = F.expr("(qn * n + qd - 1) div qd")
    hit = (
        cum.crossJoin(F.broadcast(qs))
        .withColumn("k", k)
        .filter(
            (F.col("cum_to") - F.col("cnt") < F.col("k"))
            & (F.col("k") <= F.col("cum_to"))
        )
        .withColumn("cum_before", F.col("cum_to") - F.col("cnt"))
    )
    est = hit.select(
        "grp",
        "q",
        F.col("n").cast("long").alias("n"),
        F.col("k").cast("long").alias("k"),
        F.col("bin").cast("long").alias("bin"),
        F.expr(
            f"CAST(bin * {HIST_BIN_CENTS}"
            f" + (k - cum_before) * {HIST_BIN_CENTS} div cnt AS BIGINT)"
        ).alias("est_cents"),
    )
    ranked = c.withColumn(
        "rn", F.row_number().over(W.partitionBy("grp").orderBy("cents"))
    )
    exact = est.join(
        ranked,
        (ranked["grp"] == est["grp"]) & (ranked["rn"] == est["k"]),
    ).select(est["grp"], est["q"], F.col("cents").alias("exact_cents"))
    return est.join(exact, ["grp", "q"]).select(
        F.col("grp").alias("o_orderpriority"),
        "q",
        "n",
        "k",
        "bin",
        "est_cents",
        "exact_cents",
        (
            F.abs(F.col("est_cents") - F.col("exact_cents"))
            <= HIST_BIN_CENTS
        ).alias("bound_ok"),
    )


# -- the sketched dataset card -------------------------------------------

CARD_KMV_K = 128
CARD_HIST_BIN = 64  # token-count bins; the median bound is one bin
# ceilings measured across the three SFs (see the query description):
# KMV unique-docs worst 10.8%, HLL vocab worst 9.7% (after the
# small-range correction — per-source vocab is ~31 tokens, deep in
# the linear-counting regime where the raw estimate reads ~2x high)
# -> both pinned 25%
CARD_TOL_NUM, CARD_TOL_DEN = 1, 4

_CARD_TOKS = r"string_split_regex(trim(text), '\s+')"
_CH = "md5(lower(trim(text)))"

_CARD_SQL = f"""
WITH per_doc AS (
  SELECT source, {_CH} AS content_hash,
         len({_CARD_TOKS}) AS n_tokens,
         CAST(n_chars AS BIGINT) AS n_chars
  FROM documents
),
kh AS (
  SELECT DISTINCT source,
         {SK.sql_hash48('content_hash')} AS hv
  FROM per_doc
),
kr AS (
  SELECT source, hv,
         row_number() OVER (PARTITION BY source ORDER BY hv) AS rn
  FROM kh
),
kmv AS (
  SELECT source,
         CASE WHEN COUNT(*) < {CARD_KMV_K} THEN CAST(COUNT(*) AS BIGINT)
              ELSE {(CARD_KMV_K - 1) * SK.HASH_SPACE} // MAX(hv)
         END AS kmv_unique_est
  FROM kr WHERE rn <= {CARD_KMV_K} GROUP BY source
),
tok AS (
  SELECT source, unnest({_CARD_TOKS}) AS t FROM documents
),
th AS (
  SELECT source, {SK.sql_hash48('t')} AS hv FROM tok
),
regs AS (
  SELECT source, hv >> {SK.HASH_BITS - SK.HLL_P} AS bucket,
         MAX({SK.sql_hll_rho(f'hv & {_REM_MASK}')}) AS register
  FROM th GROUP BY 1, 2
),
hll_raw AS (
  SELECT source,
         CAST(CAST({_HLL_NUMERATOR} AS HUGEINT)
              // (CAST(SUM(1::BIGINT << ({SK.HASH_BITS - SK.HLL_P + 1} - register))
                       + ({SK.HLL_M} - COUNT(*)) * {_TWO_POW_43} AS BIGINT)
                  * {SK.ALPHA_DEN}) AS BIGINT) AS raw_est,
         CAST({SK.HLL_M} - COUNT(*) AS BIGINT) AS zeros
  FROM regs GROUP BY source
),
hll AS (
  SELECT source,
         {SK.sql_hll_corrected('raw_est', 'zeros')} AS hll_vocab_est
  FROM hll_raw
),
bins AS (
  SELECT source, n_tokens // {CARD_HIST_BIN} AS bin,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM per_doc GROUP BY 1, 2
),
cum AS (
  SELECT source, bin, cnt,
         SUM(cnt) OVER (PARTITION BY source ORDER BY bin) AS cum_to,
         SUM(cnt) OVER (PARTITION BY source) AS n
  FROM bins
),
hist AS (
  SELECT source,
         CAST(bin * {CARD_HIST_BIN}
              + ((n + 1) // 2 - (cum_to - cnt)) * {CARD_HIST_BIN} // cnt
              AS BIGINT) AS hist_median_est
  FROM cum
  WHERE cum_to - cnt < (n + 1) // 2 AND (n + 1) // 2 <= cum_to
),
ranked AS (
  SELECT source, n_tokens,
         row_number() OVER (PARTITION BY source ORDER BY n_tokens) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM per_doc
),
exact AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT content_hash) AS BIGINT) AS n_unique_exact
  FROM per_doc GROUP BY source
),
vex AS (
  SELECT source, CAST(COUNT(DISTINCT t) AS BIGINT) AS vocab_exact
  FROM tok GROUP BY source
),
medx AS (
  SELECT source, CAST(n_tokens AS BIGINT) AS median_tokens_exact
  FROM ranked WHERE rn = (n + 1) // 2
),
ess AS (
  SELECT source,
         CAST(1000000 * CAST(SUM(n_chars) AS HUGEINT)
              * CAST(SUM(n_chars) AS HUGEINT)
              // (SUM(CAST(n_chars AS HUGEINT) * n_chars) * COUNT(*))
              AS BIGINT) AS ess_frac_grid
  FROM per_doc GROUP BY source
)
SELECT e.source, e.n_docs, e.n_unique_exact, k.kmv_unique_est,
       abs(k.kmv_unique_est - e.n_unique_exact) * {CARD_TOL_DEN}
         <= {CARD_TOL_NUM} * e.n_unique_exact AS dup_tol_ok,
       v.vocab_exact, h.hll_vocab_est,
       abs(h.hll_vocab_est - v.vocab_exact) * {CARD_TOL_DEN}
         <= {CARD_TOL_NUM} * v.vocab_exact AS vocab_tol_ok,
       m.median_tokens_exact, g.hist_median_est,
       abs(g.hist_median_est - m.median_tokens_exact) <= {CARD_HIST_BIN}
         AS median_bound_ok,
       s.ess_frac_grid
FROM exact e
JOIN kmv k ON k.source = e.source
JOIN hll h ON h.source = e.source
JOIN vex v ON v.source = e.source
JOIN hist g ON g.source = e.source
JOIN medx m ON m.source = e.source
JOIN ess s ON s.source = e.source
ORDER BY e.source
"""


@register(
    "pipeline_dataset_card_sketch",
    oracle=_CARD_SQL,
    description=(
        "[EXT] the SKETCHED dataset card — pipeline_dataset_card's "
        "one-page per-source manifest rebuilt from bounded-memory "
        "synopses, the way a 100 TB release would actually compute "
        "it: unique-document count from a KMV minset (k=128 hashes "
        "per source, not a distinct shuffle of every content hash), "
        "vocabulary size from HLL registers (64 cells per source, "
        "not a token-universe distinct — through the SMALL-RANGE "
        "corrected estimator hll_estimate_corrected, since per-source "
        "vocab sits in the linear-counting regime), median document "
        "length from "
        "the fixed-bin histogram (ceil-rank + integral "
        "interpolation), and the length-weight ESS fraction — every "
        "sketch mergeable (min-set re-cut / register MAX / counter "
        "ADD), every estimate pure int64/HUGEINT and hash-exact. "
        "Each sketch carries its own audit column against the exact "
        "value computed alongside: KMV within 25% (worst 10.8% "
        "across the three SFs), HLL within 25% (worst 9.7%), the "
        "histogram median inside its one-bin STRUCTURAL bound — so "
        "the card certifies its own synopses. The exact branches "
        "exist only for the audit; the sketch branches are the "
        "product."
    ),
)
def pipeline_dataset_card_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    from ..operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.md5(F.lower(F.trim(F.col("text"))).cast("binary")).alias(
            "content_hash"
        ),
        F.size(tokens("text")).cast("long").alias("n_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"),
    ).localCheckpoint(eager=False)  # five per-source summaries read it
    grp = ["source"]
    kmv = SK.kmv_estimate(
        SK.kmv_minset(per_doc, grp, F.col("content_hash"), CARD_KMV_K),
        grp,
        CARD_KMV_K,
    ).select("source", F.col("kmv_estimate").alias("kmv_unique_est"))
    tok = docs.select(
        "source", F.explode(tokens("text")).alias("t")
    ).localCheckpoint(eager=False)  # HLL + exact-vocab both read it
    hll = SK.hll_estimate_corrected(
        SK.hll_registers(tok, grp, F.col("t")), grp
    ).select("source", F.col("hll_estimate").alias("hll_vocab_est"))
    bins = per_doc.groupBy(
        "source", F.expr(f"n_tokens div {CARD_HIST_BIN}").alias("bin")
    ).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    cum = bins.select(
        "source",
        "bin",
        "cnt",
        F.sum("cnt").over(W.partitionBy("source").orderBy("bin")).alias(
            "cum_to"
        ),
        F.sum("cnt").over(W.partitionBy("source")).alias("n"),
    )
    k = F.expr("(n + 1) div 2")
    hist = (
        cum.withColumn("k", k)
        .filter(
            (F.col("cum_to") - F.col("cnt") < F.col("k"))
            & (F.col("k") <= F.col("cum_to"))
        )
        .select(
            "source",
            F.expr(
                f"CAST(bin * {CARD_HIST_BIN}"
                f" + (k - (cum_to - cnt)) * {CARD_HIST_BIN} div cnt"
                f" AS BIGINT)"
            ).alias("hist_median_est"),
        )
    )
    exact = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("content_hash").cast("long").alias("n_unique_exact"),
    )
    vex = tok.groupBy("source").agg(
        F.countDistinct("t").cast("long").alias("vocab_exact")
    )
    ranked = per_doc.select(
        "source",
        "n_tokens",
        F.row_number()
        .over(W.partitionBy("source").orderBy("n_tokens"))
        .alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("source")).alias("n"),
    )
    medx = ranked.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        "source", F.col("n_tokens").alias("median_tokens_exact")
    )
    D = "DECIMAL(38,0)"
    ess = per_doc.groupBy("source").agg(
        F.expr(
            f"CAST(1000000 * CAST(SUM(n_chars) AS {D})"
            f" * CAST(SUM(n_chars) AS {D})"
            f" div (SUM(CAST(n_chars AS {D}) * n_chars) * COUNT(*))"
            f" AS BIGINT)"
        ).alias("ess_frac_grid")
    )
    return (
        exact.join(kmv, "source")
        .join(hll, "source")
        .join(vex, "source")
        .join(hist, "source")
        .join(medx, "source")
        .join(ess, "source")
        .select(
            "source",
            "n_docs",
            "n_unique_exact",
            "kmv_unique_est",
            (
                F.abs(F.col("kmv_unique_est") - F.col("n_unique_exact"))
                * CARD_TOL_DEN
                <= CARD_TOL_NUM * F.col("n_unique_exact")
            ).alias("dup_tol_ok"),
            "vocab_exact",
            "hll_vocab_est",
            (
                F.abs(F.col("hll_vocab_est") - F.col("vocab_exact"))
                * CARD_TOL_DEN
                <= CARD_TOL_NUM * F.col("vocab_exact")
            ).alias("vocab_tol_ok"),
            "median_tokens_exact",
            "hist_median_est",
            (
                F.abs(F.col("hist_median_est") - F.col("median_tokens_exact"))
                <= CARD_HIST_BIN
            ).alias("median_bound_ok"),
            "ess_frac_grid",
        )
        .orderBy("source")
    )


STREAM_HIST_BIN = 200  # cents per bin over events.value


@register(
    "stream_histogram_twin",
    oracle=f"""
SELECT CAST(ROUND(value * 100) AS BIGINT) // {STREAM_HIST_BIN} AS bin,
       CAST(COUNT(*) AS BIGINT) AS c
FROM events GROUP BY 1
""",
    description=(
        "[EXT] batch twin of the STREAMING fixed-bin histogram "
        "(streaming/windows.histogram_bin_counters over events.value "
        "cents): quantile-serving state capped at range/width "
        "counters on an unbounded stream, maintained as a plain "
        "streaming COUNT aggregation, mergeable with batch shards by "
        "ADDITION — the third streaming sketch next to the Count-Min "
        "and HLL counter tables, and the live feed for "
        "agg_histogram_quantiles' read-side interpolation. This twin "
        "runs the streaming operator's own function on the batch "
        "frame so the oracle pins the bin arithmetic (exact cents, "
        "truncating integral division); streaming execution and "
        "stream == batch equality are pinned by "
        "tests/test_streaming.py."
    ),
)
def stream_histogram_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.windows import histogram_bin_counters

    ev = load_table(spark, sf_dir, "events")
    return histogram_bin_counters(ev, "value", STREAM_HIST_BIN)

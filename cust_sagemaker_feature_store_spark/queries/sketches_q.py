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
        "priority, ORACLE-EXACT end to end: the k=64 smallest distinct "
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

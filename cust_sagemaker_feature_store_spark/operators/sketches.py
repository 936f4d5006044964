"""Mergeable distinct-count sketches with EXACT cross-engine oracles.

Two classic cardinality sketches — KMV (K-minimum values, Bar-Yossef
et al. 2002) and HyperLogLog (Flajolet et al. 2007) — built on a
portable md5-derived 48-bit hash so that every intermediate (min-hash
sets, registers, and the estimates themselves) is bit-identical in any
engine with exact int64 arithmetic. This is the property Spark's
built-in `approx_count_distinct` (HLL++ with an engine-private xxhash)
cannot offer a DuckDB oracle, which is why `agg_approx_distinct` is a
rows-only driver row while these queries hash-match.

Reference parity: the reference delegates COUNT(DISTINCT ...) to
Athena (reference `athena_client.py` run_query); these sketches are
the bounded-memory scale path for the same question — at 100 TB an
exact distinct over a high-cardinality key is a full shuffle of the
key universe, while a KMV/HLL sketch is one map-side-combinable
aggregation whose state is k hashes / m registers per group, mergeable
across partitions, days, and streams (see
streaming/windows.hll_register_counters).

Scale notes:
- Both sketches aggregate with partial (map-side) combine: the shuffle
  carries at most k hashes (KMV, via the rank window on the DISTINCT
  frame) or m registers (HLL) per group, never the key universe.
- The merge property is STRUCTURAL, not sampled: the k smallest of a
  union of per-shard k-smallest sets equals the global k smallest
  (every global top-k member survives its own shard's cut), and
  register-wise MAX is associative/commutative — both are pinned TRUE
  by the oracle as theorems, not measured coincidences.
- All arithmetic is int64 except the final HLL harmonic-mean fold,
  which uses decimal(38,0)/HUGEINT exactly (the sim_corpus_diversity
  discipline): S = sum(2^(43 - M_j)) <= 64 * 2^43 fits int64, but
  alpha_m * m^2 * 2^43 = 709 * 4096 * 2^43 / 1000 does not, so the
  numerator is computed in decimal and floor-divided once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_BITS = 48
HASH_SPACE = 1 << HASH_BITS  # md5-derived 48-bit hash universe


def hash48(expr: Column | str, salt: str = "") -> Column:
    """Portable 48-bit hash: first 12 hex chars of md5(value || salt)
    as a non-negative int64 in [0, 2^48). Identical in DuckDB via
    `sql_hash48` (verified bit-exact), so sketch internals can be
    oracle-pinned. Collisions (~n^2/2^49) merely merge two values —
    both engines agree on the merge, so exactness is unaffected."""
    col = F.col(expr) if isinstance(expr, str) else expr
    payload = F.concat(col.cast("string"), F.lit(salt)).cast("binary")
    return F.conv(F.substring(F.md5(payload), 1, 12), 16, 10).cast("long")


def sql_hash48(expr: str, salt: str = "") -> str:
    """DuckDB twin of `hash48` (same md5 hex prefix, same value)."""
    payload = f"CAST({expr} AS VARCHAR) || '{salt}'" if salt else f"CAST({expr} AS VARCHAR)"
    return f"CAST('0x' || substr(md5({payload}), 1, 12) AS BIGINT)"


def kmv_minset(
    df: DataFrame,
    group_cols: list[str],
    value_col: Column | str,
    k: int,
    hash_col: str = "hv",
    rank_col: str = "rn",
) -> DataFrame:
    """The KMV synopsis: per group, the k smallest DISTINCT hash
    values of `value_col`, ranked ascending. This is the mergeable
    state — `kmv_minset(union of minsets)` equals the minset of the
    union, which is what makes the sketch shard/stream-combinable."""
    hv = hash48(value_col)
    return kmv_merge_minsets(
        df.select(*group_cols, hv.alias(hash_col)), group_cols, k,
        hash_col, rank_col,
    )


def kmv_merge_minsets(
    minsets: DataFrame,
    group_cols: list[str],
    k: int,
    hash_col: str = "hv",
    rank_col: str = "rn",
) -> DataFrame:
    """Merge KMV minsets WITHOUT rehashing: distinct the union of the
    per-shard hash sets and keep the k smallest per group. Lossless by
    the KMV merge theorem — every member of the global k-smallest
    distinct-hash set survives its own shard's k-smallest cut, so the
    merged sketch equals the sketch of the union (pinned TRUE by
    agg_kmv_distinct's oracle as a structural fact)."""
    distinct = minsets.select(*group_cols, hash_col).distinct()
    w = Window.partitionBy(*group_cols).orderBy(hash_col)
    return (
        distinct.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def kmv_estimate(
    minset: DataFrame,
    group_cols: list[str],
    k: int,
    hash_col: str = "hv",
) -> DataFrame:
    """Estimate distinct counts from a KMV minset: if the group holds
    fewer than k distinct hashes the sketch IS the exact count;
    otherwise est = floor((k-1) * 2^48 / h_k) (Beyer et al.'s unbiased
    form). Pure int64 — (k-1) * 2^48 < 2^56 for k <= 128 — so the
    estimate itself is oracle-exact."""
    scaled = (k - 1) * HASH_SPACE
    return minset.groupBy(*group_cols).agg(
        F.max(hash_col).alias("kth_hash"),
        F.count(F.lit(1)).alias("sketch_size"),
    ).select(
        *group_cols,
        "kth_hash",
        F.when(F.col("sketch_size") < k, F.col("sketch_size"))
        .otherwise(F.expr(f"{scaled} div kth_hash"))
        .cast("long")
        .alias("kmv_estimate"),
        "sketch_size",
    )


# -- HyperLogLog with explicit registers ---------------------------------

HLL_P = 6  # 2^6 = 64 registers
HLL_M = 1 << HLL_P
_REM_BITS = HASH_BITS - HLL_P  # 42
_REM_MASK = (1 << _REM_BITS) - 1
# alpha_64 = 0.709 (Flajolet et al. 2007, Fig. 3) as an exact rational
ALPHA_NUM, ALPHA_DEN = 709, 1000


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: Column | str,
) -> DataFrame:
    """HLL register table: bucket = top p bits of hash48, rho = 1 +
    leading zeros of the remaining 42 bits (43 when they are all
    zero), register = MAX(rho) per (group, bucket). floor(log2) comes
    from LENGTH(BIN(x)) — minimal-length binary in both Spark and
    DuckDB — so the register values are oracle-exact. MAX is the merge
    operator: registers from any partition/shard/stream micro-batch
    combine losslessly, which is why the same expression serves the
    streaming maintainer (streaming/windows.hll_register_counters)."""
    hv = hash48(value_col)
    bucket = F.shiftright(hv, _REM_BITS).alias("bucket")
    rem = hv.bitwiseAND(F.lit(_REM_MASK))
    rho = F.when(rem == 0, F.lit(_REM_BITS + 1)).otherwise(
        F.lit(_REM_BITS + 1) - F.length(F.bin(rem))
    )
    return (
        df.select(*group_cols, bucket, rho.cast("int").alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_estimate(
    registers: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """Raw HLL estimate from a register table, exactly: absent buckets
    carry register 0, so S = sum_present(2^(43-M_j)) +
    (m - n_present) * 2^43 (int64: <= 64 * 2^43 = 2^49), and
    est = floor(alpha * m^2 * 2^43 / S) with the numerator in
    decimal(38,0) (it exceeds int64). Emits `zero_registers` (the
    linear-counting signal V) so callers can see when the raw regime
    does not apply; the estimate column itself is deterministic and
    hash-exact regardless of accuracy."""
    two_rem = 1 << _REM_BITS
    # numerator = alpha_num * m^2 * 2^43 — exceeds int64, exact decimal
    numerator = ALPHA_NUM * (HLL_M**2) * 2 * two_rem
    # shiftleft with a COLUMN bit count must go through SQL (the
    # Python wrapper only takes an int literal)
    s_present = F.sum(
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {_REM_BITS + 1} - register)")
    )
    n_present = F.count(F.lit(1))
    zeros = F.lit(HLL_M) - n_present
    s_total = (s_present + zeros * F.lit(2 * two_rem)).cast("long")
    # `div` on decimal(38,0) is the exact integral quotient (bigint),
    # bit-identical to DuckDB's HUGEINT `//` — unlike F.floor(a / b),
    # whose decimal quotient rounds at 6dp and can cross an integer
    # boundary from below.
    return (
        registers.groupBy(*group_cols)
        .agg(s_total.alias("__s"), zeros.cast("long").alias("zero_registers"))
        .select(
            *group_cols,
            F.expr(
                f"CAST('{numerator}' AS DECIMAL(38,0)) div (__s * {ALPHA_DEN})"
            )
            .cast("long")
            .alias("hll_estimate"),
            "zero_registers",
        )
    )


def sql_hll_rho(rem_expr: str) -> str:
    """DuckDB twin of the rho expression in `hll_registers`."""
    r = _REM_BITS + 1
    return (
        f"CASE WHEN ({rem_expr}) = 0 THEN {r} "
        f"ELSE {r} - length(bin({rem_expr})) END"
    )


def hll_estimate_corrected(
    registers: DataFrame,
    group_cols: list[str],
) -> DataFrame:
    """The production HLL estimator: Flajolet et al.'s small-range
    correction on top of the raw harmonic mean — when the raw
    estimate is <= 2.5m and empty registers remain, switch to LINEAR
    COUNTING est = m * ln(m / V) (the occupancy estimator), which is
    where the raw formula biases high. The ln is the one float op:
    computed as a double in both engines and rounded ONCE to an
    integer (the DSIR ln discipline — a 1-ulp libm divergence flips
    the result only within ~1e-14 of a half-integer; the three-SF
    sweep guards it). The raw branch and V stay oracle-exact ints.
    Returns (groups, hll_estimate, zero_registers, used_linear)."""
    base = hll_estimate(registers, group_cols)
    lc = F.round(
        F.lit(float(HLL_M))
        * F.log(F.lit(float(HLL_M)) / F.col("zero_registers").cast("double"))
    ).cast("long")
    small = (F.col("zero_registers") > 0) & (
        F.col("hll_estimate") * 2 <= 5 * HLL_M
    )
    return base.select(
        *group_cols,
        F.when(small, lc).otherwise(F.col("hll_estimate")).alias(
            "hll_estimate"
        ),
        "zero_registers",
        small.alias("used_linear"),
    )


def sql_hll_corrected(raw_est: str, zeros: str) -> str:
    """DuckDB twin of the small-range correction CASE."""
    lc = f"CAST(ROUND({HLL_M}.0 * ln({HLL_M}.0 / CAST({zeros} AS DOUBLE))) AS BIGINT)"
    return (
        f"CASE WHEN {zeros} > 0 AND {raw_est} * 2 <= {5 * HLL_M}"
        f" THEN {lc} ELSE {raw_est} END"
    )

"""Exact gradient-boosted stumps (SURVEY.md §2.10 [EXT]).

L2 boosting with depth-1 regression trees over TWO candidate features
(quantity, discount percent), every round bit-identical cross-engine:
residuals live on the integer dollar grid, leaf values are truncating
integral means, and split gains compare as truncated
HUGEINT/decimal(38,0) rationals — the boosting rung next to
ml_gini_stump's single classification stump and the closed-form
OLS/ridge shelf. The reference trains its one model through SageMaker
(reference `sagemaker_client.py` create_training_job); this is the
native ensemble path a feature-store user reaches for next.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from .registry import register

GBT_ROUNDS = 3
_FEATURES = ("q1", "q2")  # quantity, discount percent


def _leaf_case(i: int) -> str:
    """Residual contribution of round i's stump (SQL, b{i} joined)."""
    return (
        f"(CASE WHEN (b{i}.f = 1 AND q1 <= b{i}.t)"
        f" OR (b{i}.f = 2 AND q2 <= b{i}.t)"
        f" THEN b{i}.lv ELSE b{i}.rv END)"
    )


def _gbt_round_sql(r: int) -> str:
    """One unrolled boosting round: per-feature residual stats per
    candidate threshold, prefix-sum split scans, truncated-rational
    gain argmax (ties to the lowest feature id, then threshold),
    integral leaf means."""
    res = "y - m0.pred" + "".join(
        f" - {_leaf_case(i)}" for i in range(1, r)
    )
    joins = ", m0" + "".join(f", best{i} b{i}" for i in range(1, r))
    per_feature = []
    for fi, fcol in enumerate(_FEATURES, start=1):
        per_feature.append(f"""
stats{r}_{fi} AS MATERIALIZED (
  SELECT {fcol} AS v, CAST(SUM({res}) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM base{joins} GROUP BY 1
),
cum{r}_{fi} AS (
  SELECT v, SUM(s) OVER (ORDER BY v) AS sl, SUM(c) OVER (ORDER BY v) AS nl,
         t.st, t.nt
  FROM stats{r}_{fi},
       (SELECT SUM(s) AS st, SUM(c) AS nt FROM stats{r}_{fi}) t
),
cand{r}_{fi} AS (
  SELECT {fi} AS f, v AS t, CAST(nl AS BIGINT) AS n_left,
         CAST(nt - nl AS BIGINT) AS n_right,
         CAST((CAST(sl AS HUGEINT) * sl * (nt - nl)
               + CAST(st - sl AS HUGEINT) * (st - sl) * nl)
              // (nl * (nt - nl)) AS BIGINT) AS gain,
         CAST(CAST(sl AS HUGEINT) // nl AS BIGINT) AS lv,
         CAST(CAST(st - sl AS HUGEINT) // (nt - nl) AS BIGINT) AS rv
  FROM cum{r}_{fi} WHERE nl > 0 AND nl < nt
)""")
    cands = " UNION ALL ".join(
        f"SELECT * FROM cand{r}_{fi}" for fi in range(1, len(_FEATURES) + 1)
    )
    return ",".join(per_feature) + f""",
best{r} AS MATERIALIZED (
  SELECT * FROM ({cands}) ORDER BY gain DESC, f, t LIMIT 1
),
mse{r} AS (
  SELECT CAST(SUM(CAST(res AS HUGEINT) * res) // COUNT(*) AS BIGINT) AS mse
  FROM (
    SELECT {res} - {_leaf_case(r)} AS res
    FROM base{joins}, best{r} b{r}
  )
)"""


def _gbt_oracle() -> str:
    rounds = ",".join(_gbt_round_sql(r) for r in range(1, GBT_ROUNDS + 1))
    rows = "\nUNION ALL\n".join(
        f"SELECT {r} AS boost_round, b.f AS feature, b.t AS split_at, "
        f"b.n_left, b.n_right, b.lv AS left_value, b.rv AS right_value, "
        f"b.gain, m.mse AS mse_after, m.mse <= p.mse AS improved "
        f"FROM best{r} b, mse{r} m, mse{r - 1 if r > 1 else 0} p"
        for r in range(1, GBT_ROUNDS + 1)
    )
    return f"""
WITH base AS MATERIALIZED (
  SELECT CAST(l_quantity AS BIGINT) AS q1,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS q2,
         CAST(ROUND(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
),
m0 AS (SELECT CAST(SUM(y) // COUNT(*) AS BIGINT) AS pred FROM base),
mse0 AS (
  SELECT CAST(SUM(CAST(y - m0.pred AS HUGEINT) * (y - m0.pred))
              // COUNT(*) AS BIGINT) AS mse
  FROM base, m0
),{rounds}
{rows}
ORDER BY boost_round
"""


def _gbt_audit_frames(spark: SparkSession, sf_dir: str):
    """Plan-audit hook: round 1's per-value residual-stats aggregate —
    the ONE corpus pass each boosting round repeats (exploded (f, v)
    stack + map-side-combined groupBy), lazy, with a placeholder base
    prediction (the plan shape is split-independent)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("q1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("q2"),
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    stacked = li.select(
        (F.col("y") - F.lit(0)).alias("res"),
        F.explode(
            F.array(
                F.struct(F.lit(1).alias("f"), F.col("q1").alias("v")),
                F.struct(F.lit(2).alias("f"), F.col("q2").alias("v")),
            )
        ).alias("fv"),
    ).select("fv.f", "fv.v", "res")
    round_stats = stacked.groupBy("f", "v").agg(
        F.sum("res").cast("long").alias("s"),
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum(F.col("res").cast("decimal(38,0)") * F.col("res")).alias("ss"),
    )
    return {"round_stats": round_stats}


@register(
    "ml_gbt_stumps",
    audit_frames=_gbt_audit_frames,
    oracle=_gbt_oracle(),
    description=(
        "[EXT] gradient-boosted regression stumps (Friedman 2001, L2 "
        f"loss, {GBT_ROUNDS} rounds) with per-round FEATURE SELECTION "
        "over two candidates (quantity, discount percent), EXACT end "
        "to end: targets on the integer dollar grid, candidate splits "
        "= the distinct feature values scanned as ONE prefix-sum over "
        "per-value residual stats per feature (no per-threshold "
        "rescan), split gain = the SSE-reduction rational (S_L^2 n_R "
        "+ S_R^2 n_L)/(n_L n_R) truncated in HUGEINT/decimal(38,0) "
        "integral division (cross-engine-identical toward-zero "
        "truncation; ties to the lowest feature id then threshold), "
        "leaf values = truncated integral residual means. Every "
        "round's chosen feature, split, leaves, gain, and MSE "
        "hash-match DuckDB bit for bit — no float anywhere. "
        "`improved` pins the boosting THEOREM: with truncated leaf "
        "m' of true mean m, the SSE delta is m' n (m' - 2m) <= 0 "
        "whatever m's sign, so MSE is non-increasing per round even "
        "on the grid. Scale shape: each round is one "
        "map-side-combined groupBy per feature over the fact table "
        "plus value-count-sized prefix scans and a 1-row argmax; "
        "rounds are a Python loop collecting only the best split — "
        "T corpus passes per feature, nothing corpus x corpus, the "
        "same round-count pricing as graph_pagerank."
    ),
)
def ml_gbt_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("q1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("q2"),
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    li = li.localCheckpoint(eager=False)  # T stats + T mse passes read it

    pred0 = int(
        li.agg(
            F.expr("CAST(SUM(y) div COUNT(*) AS BIGINT)").alias("pred")
        ).head()["pred"]
    )

    # splits: (feature_index, threshold, left_value, right_value)
    def res_col(splits: list[tuple[int, int, int, int]]):
        r = F.col("y") - F.lit(pred0)
        for fi, t, lv, rv in splits:
            fcol = _FEATURES[fi - 1]
            r = r - F.when(F.col(fcol) <= t, F.lit(lv)).otherwise(F.lit(rv))
        return r

    def round_stats(splits) -> dict[int, list[tuple[int, int, int, int]]]:
        """ONE corpus pass per round: both features' per-value
        (sum res, count, sum res^2) via an exploded (f, v) stack.
        The <= |values(q1)| + |values(q2)| result rows come back to
        the driver, where the prefix scan / argmax runs in exact
        unbounded Python ints — value-identical to the oracle's
        HUGEINT prefix CTEs, minus two Spark jobs per round."""
        res = res_col(splits)
        stacked = li.select(
            res.alias("res"),
            F.explode(
                F.array(
                    F.struct(
                        F.lit(1).alias("f"), F.col("q1").alias("v")
                    ),
                    F.struct(
                        F.lit(2).alias("f"), F.col("q2").alias("v")
                    ),
                )
            ).alias("fv"),
        ).select("fv.f", "fv.v", "res")
        got = (
            stacked.groupBy("f", "v")
            .agg(
                F.sum("res").cast("long").alias("s"),
                F.count(F.lit(1)).cast("long").alias("c"),
                F.sum(
                    F.col("res").cast("decimal(38,0)") * F.col("res")
                ).alias("ss"),
            )
            .collect()
        )
        out: dict[int, list[tuple[int, int, int, int]]] = {1: [], 2: []}
        for r in got:
            out[r["f"]].append((int(r["v"]), int(r["s"]), int(r["c"]), int(r["ss"])))
        for f in out:
            out[f].sort()
        return out

    def trunc_div(a: int, b: int) -> int:
        q0 = abs(a) // abs(b)
        return q0 if (a >= 0) == (b >= 0) else -q0

    def best_split(stats):
        best = None
        for f in (1, 2):
            st = sum(s for _, s, _, _ in stats[f])
            nt = sum(c for _, _, c, _ in stats[f])
            sl = nl = 0
            for v, s, c, _ in stats[f]:
                sl += s
                nl += c
                if nl <= 0 or nl >= nt:
                    continue
                sr, nr = st - sl, nt - nl
                gain = (sl * sl * nr + sr * sr * nl) // (nl * nr)
                key = (-gain, f, v)
                if best is None or key < best[0]:
                    best = (
                        key,
                        (f, v, nl, nr, trunc_div(sl, nl), trunc_div(sr, nr), gain),
                    )
        return best[1]

    def mse_from(stats) -> int:
        # a round's stats carry sum(res^2) per value, so the PREVIOUS
        # round's post-split MSE reads off feature 1's rows for free
        n = sum(c for _, _, c, _ in stats[1])
        return trunc_div(sum(ss for _, _, _, ss in stats[1]), n)

    splits: list[tuple[int, int, int, int]] = []
    rows = []
    mses = []  # mse AFTER round r lands at mses[r]; mses[0] = baseline
    for rnd in range(1, GBT_ROUNDS + 1):
        stats = round_stats(splits)
        mses.append(mse_from(stats))  # residuals BEFORE this round
        f, t, nl, nr, lv, rv, gain = best_split(stats)
        splits.append((f, t, lv, rv))
        rows.append((rnd, f, t, nl, nr, lv, rv, gain))
    # only the FINAL round's post-split MSE needs its own corpus pass;
    # total passes: pred0 + T stats + this = T + 2
    mses.append(
        int(
            li.select(res_col(splits).alias("r"))
            .agg(
                F.expr(
                    "CAST(SUM(CAST(r AS DECIMAL(38,0)) * r)"
                    " div COUNT(*) AS BIGINT)"
                )
            )
            .head()[0]
        )
    )
    out_rows = [
        row + (mses[r + 1], mses[r + 1] <= mses[r])
        for r, row in enumerate(rows)
    ]
    return spark.createDataFrame(
        out_rows,
        "boost_round int, feature int, split_at long, n_left long, "
        "n_right long, left_value long, right_value long, gain long, "
        "mse_after long, improved boolean",
    )

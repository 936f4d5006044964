"""Exact gradient-boosted stumps (SURVEY.md §2.10 [EXT]).

L2 boosting with depth-1 regression trees, every round bit-identical
cross-engine: residuals live on the integer dollar grid, leaf values
are truncating integral means, and split gains compare as truncated
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


def _gbt_round_sql(r: int) -> str:
    """One unrolled boosting round: residual stats per candidate
    quantity threshold, prefix-sum split scan, truncated-rational
    gain argmax (ties to the lowest threshold), integral leaf means."""
    res = "y - m0.pred" + "".join(
        f" - (CASE WHEN q <= b{i}.t THEN b{i}.lv ELSE b{i}.rv END)"
        for i in range(1, r)
    )
    joins = ", m0" + "".join(f", best{i} b{i}" for i in range(1, r))
    return f"""
stats{r} AS MATERIALIZED (
  SELECT q, CAST(SUM({res}) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS c
  FROM base{joins} GROUP BY q
),
tot{r} AS (SELECT SUM(s) AS st, SUM(c) AS nt FROM stats{r}),
cum{r} AS (
  SELECT q, SUM(s) OVER (ORDER BY q) AS sl, SUM(c) OVER (ORDER BY q) AS nl,
         t.st, t.nt
  FROM stats{r}, tot{r} t
),
best{r} AS MATERIALIZED (
  SELECT q AS t, CAST(nl AS BIGINT) AS n_left,
         CAST(nt - nl AS BIGINT) AS n_right,
         CAST((CAST(sl AS HUGEINT) * sl * (nt - nl)
               + CAST(st - sl AS HUGEINT) * (st - sl) * nl)
              // (nl * (nt - nl)) AS BIGINT) AS gain,
         CAST(CAST(sl AS HUGEINT) // nl AS BIGINT) AS lv,
         CAST(CAST(st - sl AS HUGEINT) // (nt - nl) AS BIGINT) AS rv
  FROM cum{r} WHERE nl > 0 AND nl < nt
  ORDER BY gain DESC, t LIMIT 1
),
mse{r} AS (
  SELECT CAST(SUM(CAST(res AS HUGEINT) * res) // COUNT(*) AS BIGINT) AS mse
  FROM (
    SELECT {res} - (CASE WHEN q <= b{r}.t THEN b{r}.lv ELSE b{r}.rv END) AS res
    FROM base{joins}, best{r} b{r}
  )
)"""


def _gbt_oracle() -> str:
    rounds = ",".join(_gbt_round_sql(r) for r in range(1, GBT_ROUNDS + 1))
    rows = "\nUNION ALL\n".join(
        f"SELECT {r} AS boost_round, b.t AS split_qty, b.n_left, "
        f"b.n_right, b.lv AS left_value, b.rv AS right_value, b.gain, "
        f"m.mse AS mse_after, m.mse <= p.mse AS improved "
        f"FROM best{r} b, mse{r} m, mse{r - 1 if r > 1 else 0} p"
        for r in range(1, GBT_ROUNDS + 1)
    )
    return f"""
WITH base AS MATERIALIZED (
  SELECT CAST(l_quantity AS BIGINT) AS q,
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


@register(
    "ml_gbt_stumps",
    oracle=_gbt_oracle(),
    description=(
        "[EXT] gradient-boosted regression stumps (Friedman 2001, L2 "
        f"loss, {GBT_ROUNDS} rounds), EXACT end to end: targets on "
        "the integer dollar grid, candidate splits = the <= 50 "
        "distinct l_quantity values scanned as ONE prefix-sum over "
        "the per-quantity residual stats (no per-threshold rescan), "
        "split gain = the SSE-reduction rational (S_L^2 n_R + S_R^2 "
        "n_L)/(n_L n_R) truncated in HUGEINT/decimal(38,0) integral "
        "division (cross-engine-identical toward-zero truncation; "
        "ties to the lowest threshold), leaf values = truncated "
        "integral residual means. Every round's split, leaves, gain, "
        "and per-round MSE hash-match DuckDB bit for bit — no float "
        "anywhere. `improved` pins the boosting THEOREM: with "
        "truncated leaf m' of true mean m, the SSE delta is "
        "m' n (m' - 2m) <= 0 whatever m's sign, so MSE is "
        "non-increasing per round even on the grid. Scale shape: "
        "each round is one map-side-combined groupBy(quantity) over "
        "the fact table plus a 50-row prefix scan and a 1-row "
        "argmax; rounds are a Python loop collecting only the 1-row "
        "best split — T corpus passes total, nothing corpus x "
        "corpus, the same round-count pricing as graph_pagerank."
    ),
)
def ml_gbt_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("long").alias("q"),
        F.round("l_extendedprice").cast("long").alias("y"),
    )
    li = li.localCheckpoint(eager=False)  # T stats + T mse passes read it

    m0_row = li.agg(
        F.expr("CAST(SUM(y) div COUNT(*) AS BIGINT)").alias("pred")
    ).head()
    pred0 = int(m0_row["pred"])

    def res_col(splits: list[tuple[int, int, int]]):
        r = F.col("y") - F.lit(pred0)
        for t, lv, rv in splits:
            r = r - F.when(F.col("q") <= t, F.lit(lv)).otherwise(F.lit(rv))
        return r

    splits: list[tuple[int, int, int]] = []
    rows = []
    prev_mse = None
    cum_w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    for rnd in range(1, GBT_ROUNDS + 1):
        res = res_col(splits)
        stats = li.select("q", res.alias("res")).groupBy("q").agg(
            F.sum("res").cast("long").alias("s"),
            F.count(F.lit(1)).cast("long").alias("c"),
        )
        tot = stats.agg(
            F.sum("s").alias("st"), F.sum("c").alias("nt")
        )
        cum = stats.select(
            "q",
            F.sum("s").over(cum_w).alias("sl"),
            F.sum("c").over(cum_w).alias("nl"),
        ).crossJoin(F.broadcast(tot))
        best = (
            cum.filter((F.col("nl") > 0) & (F.col("nl") < F.col("nt")))
            .select(
                F.col("q").alias("t"),
                F.col("nl").alias("n_left"),
                (F.col("nt") - F.col("nl")).alias("n_right"),
                F.expr(
                    "CAST((CAST(sl AS DECIMAL(38,0)) * sl * (nt - nl)"
                    " + CAST(st - sl AS DECIMAL(38,0)) * (st - sl) * nl)"
                    " div (nl * (nt - nl)) AS BIGINT)"
                ).alias("gain"),
                F.expr(
                    "CAST(CAST(sl AS DECIMAL(38,0)) div nl AS BIGINT)"
                ).alias("lv"),
                F.expr(
                    "CAST(CAST(st - sl AS DECIMAL(38,0)) div (nt - nl)"
                    " AS BIGINT)"
                ).alias("rv"),
            )
            .orderBy(F.desc("gain"), F.asc("t"))
            .limit(1)
            .head()
        )
        splits.append((int(best["t"]), int(best["lv"]), int(best["rv"])))
        res_after = res_col(splits)
        mse = int(
            li.select(res_after.alias("r"))
            .agg(
                F.expr(
                    "CAST(SUM(CAST(r AS DECIMAL(38,0)) * r)"
                    " div COUNT(*) AS BIGINT)"
                )
            )
            .head()[0]
        )
        if prev_mse is None:
            prev_mse = int(
                li.select((F.col("y") - pred0).alias("r"))
                .agg(
                    F.expr(
                        "CAST(SUM(CAST(r AS DECIMAL(38,0)) * r)"
                        " div COUNT(*) AS BIGINT)"
                    )
                )
                .head()[0]
            )
        rows.append(
            (
                rnd,
                int(best["t"]),
                int(best["n_left"]),
                int(best["n_right"]),
                int(best["lv"]),
                int(best["rv"]),
                int(best["gain"]),
                mse,
                mse <= prev_mse,
            )
        )
        prev_mse = mse
    return spark.createDataFrame(
        rows,
        "boost_round int, split_qty long, n_left long, n_right long, "
        "left_value long, right_value long, gain long, mse_after long, "
        "improved boolean",
    )

"""Graph query surface (SURVEY.md §2.10 [EXT]): iterative PageRank
over the part co-purchase graph — parts are linked when they appear in
the same order. The dup-candidate graphs (dedup_clusters,
dedup_triangle_count) exercise contraction/counting; this exercises a
fixed-point iteration, the third graph-algorithm family a curation
pipeline needs (importance weighting for sampling).

The oracle unrolls the same integer-exact iterations as chained CTEs,
so the driver pins every rank bit-for-bit (see operators/graph.py for
why integer ranks make that possible at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import graph as G
from .registry import register

PR_ITERATIONS = 3
_SCALE = G.RANK_SCALE


def _pagerank_oracle(iterations: int) -> str:
    parts = [
        f"""
WITH e AS (
  SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS d
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
nodes AS (SELECT DISTINCT s AS node FROM e),
deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
c AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
r0 AS (SELECT node, {_SCALE} // n AS r FROM nodes CROSS JOIN c)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
s{i} AS (
  SELECT e.d AS node, CAST(SUM(r{i - 1}.r // deg.outdeg) AS BIGINT) AS sc
  FROM e JOIN deg ON e.s = deg.s JOIN r{i - 1} ON r{i - 1}.node = e.s
  GROUP BY 1
),
r{i} AS (
  SELECT nodes.node,
         (15 * {_SCALE}) // (100 * c.n)
         + (85 * COALESCE(s{i}.sc, 0)) // 100 AS r
  FROM nodes CROSS JOIN c LEFT JOIN s{i} ON s{i}.node = nodes.node
)"""
        )
    parts.append(
        f"""
SELECT node AS part_key, r AS rank_scaled,
       CAST(r AS DOUBLE) / {float(_SCALE)} AS pagerank
FROM r{iterations}"""
    )
    return "".join(parts)


@register(
    "graph_pagerank_parts",
    oracle=_pagerank_oracle(PR_ITERATIONS),
    description=(
        "3-iteration integer-exact PageRank over the part co-purchase "
        "graph (parts sharing an order). One shuffle per iteration plus "
        "a broadcast node count; int64 ranks on the 1e-12 grid make the "
        "fixed point bit-reproducible and oracle-pinnable."
    ),
)
def graph_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    edges = G.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    ranks = G.pagerank_integer(edges, iterations=PR_ITERATIONS)
    return ranks.select(
        F.col("node").alias("part_key"),
        "rank_scaled",
        (F.col("rank_scaled").cast("double") / float(_SCALE)).alias("pagerank"),
    )

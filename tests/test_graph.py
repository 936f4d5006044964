"""Integer-PageRank invariants (oracle equivalence is covered by
test_queries_oracle; these pin the algorithm semantics)."""

from __future__ import annotations

from pyspark.sql import Row

from cust_sagemaker_feature_store_spark.operators import graph as G


def _star(spark):
    # hub 0 <-> spokes 1..4, symmetric
    rows = []
    for i in range(1, 5):
        rows += [Row(src=0, dst=i), Row(src=i, dst=0)]
    return spark.createDataFrame(rows)


def test_pagerank_hub_dominates_and_mass_is_conserved(spark):
    ranks = {
        r["node"]: r["rank_scaled"]
        for r in G.pagerank_integer(_star(spark), iterations=3).collect()
    }
    assert len(ranks) == 5
    # the hub receives all spoke mass; spokes split the hub's
    spoke = {ranks[i] for i in range(1, 5)}
    assert len(spoke) == 1, "symmetric spokes must have identical ranks"
    assert ranks[0] > max(spoke)
    # total mass stays within integer-truncation drift of the scale
    total = sum(ranks.values())
    assert G.RANK_SCALE * 0.999 <= total <= G.RANK_SCALE


def test_pagerank_matches_hand_computation(spark):
    # 2-node symmetric graph: outdeg 1 each, so rank is a fixed point
    # at scale/2 from iteration 0 and must stay there exactly.
    e = spark.createDataFrame([Row(src=1, dst=2), Row(src=2, dst=1)])
    half = G.RANK_SCALE // 2
    expected = (15 * G.RANK_SCALE) // 200 + (85 * half) // 100
    for it in (1, 3):
        ranks = {
            r["node"]: r["rank_scaled"]
            for r in G.pagerank_integer(e, iterations=it).collect()
        }
        assert ranks == {1: expected, 2: expected}


def test_cooccurrence_edges_symmetric_no_self_loops(spark):
    df = spark.createDataFrame(
        [Row(g=1, item=10), Row(g=1, item=11), Row(g=1, item=11), Row(g=2, item=10)]
    )
    edges = {(r["src"], r["dst"]) for r in G.cooccurrence_edges(df, "g", "item").collect()}
    assert edges == {(10, 11), (11, 10)}

"""Floor-margin property report (r13 verdict next-round #6).

Every hash-pinned accuracy/recall floor is chosen UNDER its measured
deterministic value, so the driver's exact-hash gate stays green. That
only holds while the margin holds: a testdata re-generation or an
operator tweak that erodes a measured value toward its floor would
first show up as a red DRIVER row — the worst place to learn it. This
module derives each floor's measured value and its pinned threshold at
ALL THREE scale factors and asserts a minimum slack, so erosion fails
loudly here first.

Slack convention: for a floor (measured must be >= bound), slack =
measured / bound; for a ceiling (measured error must be <= bound),
slack = bound / measured. The default minimum is 1.2 (the >= 20%
margin the r13 verdict prescribed); floors whose HISTORICAL measured
values sit between 1.15x and 1.2x of the pin carry a documented
per-spec override — the test is a canary against EROSION of today's
margins, not a retroactive re-pinning of floors that were deliberately
chosen tighter.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cust_sagemaker_feature_store_spark.catalog import load_table
from cust_sagemaker_feature_store_spark.operators import similarity as S
from cust_sagemaker_feature_store_spark.queries import REGISTRY
from cust_sagemaker_feature_store_spark.queries.similarity_q import (
    ANN_RECALL_FLOORS,
    FILTER_LABEL,
    FILTERED_RECALL_FLOOR,
    IVF_SWEEP_FLOOR,
    IVF_SWEEP_PROBES,
    IVFPQ_FILTERED_RECALL_FLOOR,
    IVFPQ_RECALL_FLOOR,
    IVFSQ_RECALL_FLOOR,
    SQ8_RECALL_FLOOR,
    TOP_K,
    _query_vector,
)
from cust_sagemaker_feature_store_spark.queries.sketches_q import (
    HLL_TOL_DEN,
    HLL_TOL_NUM,
    KMV_TOL_DEN,
    KMV_TOL_NUM,
)

SF_DIRS = (
    "/root/testdata/sf0.001",
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
)

DEFAULT_MIN_SLACK = 1.2
# r15 (r14 verdict next-round #6): the three floors that sat at or
# under 1.20x slack (ivfpq 7/6 at sf0.1; ann_ivf and the nprobe sweep
# exactly 1.20 at sf0.01) are re-pinned with real slack at their spec
# sites — no overrides below the 20% bar remain.
MIN_SLACK_OVERRIDES: dict[str, float] = {}


def _overlap(ann_df, exact_df) -> int:
    return (
        ann_df.select("vec_id").join(exact_df.select("vec_id"), "vec_id").count()
    )


def _ann_specs(spark, sf_dir):
    """(name, measured, bound) triples, floor-style (measured >= bound),
    derived through the SAME public operators and module constants the
    floor queries use."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    exact = S.cosine_topk(emb, qv, k=TOP_K).select("vec_id").localCheckpoint()
    out = [
        (
            "ann_lsh_recall",
            _overlap(S.lsh_ann_topk(emb, qv, k=TOP_K), exact),
            ANN_RECALL_FLOORS["lsh"] * TOP_K,
        ),
        (
            "ann_ivf_recall",
            _overlap(S.ivf_topk(emb, qv, k=TOP_K, n_lists=8, nprobe=4), exact),
            ANN_RECALL_FLOORS["ivf"] * TOP_K,
        ),
        (
            "ivfpq_recall",
            _overlap(S.ivfpq_topk(emb, qv, k=TOP_K), exact),
            IVFPQ_RECALL_FLOOR * TOP_K,
        ),
        (
            "ivf_sweep_widest_recall",
            _overlap(
                S.ivf_topk(
                    emb, qv, k=TOP_K, n_lists=8, nprobe=IVF_SWEEP_PROBES[-1]
                ),
                exact,
            ),
            IVF_SWEEP_FLOOR * TOP_K,
        ),
    ]
    pred = F.col("label") >= FILTER_LABEL
    exact_f = (
        S.cosine_topk(emb.filter(pred), qv, k=TOP_K)
        .select("vec_id")
        .localCheckpoint()
    )
    out.append(
        (
            "ivf_filtered_recall",
            _overlap(
                S.ivf_filtered_topk(emb, qv, pred, k=TOP_K, n_lists=8, nprobe=2),
                exact_f,
            ),
            round(FILTERED_RECALL_FLOOR * TOP_K),
        )
    )
    num, den = IVFPQ_FILTERED_RECALL_FLOOR
    out.append(
        (
            "ivfpq_filtered_recall",
            _overlap(
                S.ivfpq_filtered_topk(
                    emb, qv, pred, k=TOP_K, n_lists=8, nprobe=2
                ),
                exact_f,
            ),
            (TOP_K * num + den - 1) // den,
        )
    )
    return out


def _output_specs(spark, sf_dir):
    """Floors whose queries already expose the continuous value next to
    the pinned boolean — margins read straight off the registered
    output (no reimplementation to drift)."""
    specs = []
    for name, qname in (
        ("sq8_recall", "sim_sq8_recall_floor"),
        ("ivfsq_recall", "sim_ivfsq_recall_floor"),
    ):
        row = REGISTRY[qname].fn(spark, sf_dir).head()
        bound = SQ8_RECALL_FLOOR if name == "sq8_recall" else IVFSQ_RECALL_FLOOR
        specs.append((name, int(row["recall_num"]), bound, "floor"))
    for name, qname, num, den in (
        ("kmv_rel_err", "agg_kmv_distinct", KMV_TOL_NUM, KMV_TOL_DEN),
        ("hll_rel_err", "agg_hll_custom", HLL_TOL_NUM, HLL_TOL_DEN),
    ):
        est_col = "kmv_estimate" if "kmv" in name else "hll_estimate"
        rows = REGISTRY[qname].fn(spark, sf_dir).collect()
        worst = max(
            abs(float(r[est_col]) - float(r["exact_distinct"]))
            / float(r["exact_distinct"])
            for r in rows
        )
        specs.append((name, worst, num / den, "ceiling"))
    return specs


@pytest.mark.parametrize("sf_dir", SF_DIRS, ids=lambda d: d.rsplit("/", 1)[-1])
def test_pinned_floor_margins_hold_with_slack(spark, sf_dir):
    report = []
    failures = []
    for name, measured, bound in _ann_specs(spark, sf_dir):
        slack = measured / bound if bound else math.inf
        report.append((name, measured, bound, slack))
    for name, measured, bound, kind in _output_specs(spark, sf_dir):
        slack = (
            (measured / bound) if kind == "floor" else
            (bound / measured if measured else math.inf)
        )
        report.append((name, measured, bound, slack))
    for name, measured, bound, slack in report:
        need = MIN_SLACK_OVERRIDES.get(name, DEFAULT_MIN_SLACK)
        line = (
            f"{name:28s} measured={measured:<10.4g} bound={bound:<8.4g} "
            f"slack={slack:.3f} (need >= {need})"
        )
        print(line)
        if slack < need - 1e-9:
            failures.append(line)
    assert not failures, "floor margins eroded:\n" + "\n".join(failures)

"""Similarity-search query surface over `embeddings`
(SURVEY.md §2.10 [EXT]).

Brute-force cosine top-k is the oracle-checkable baseline; the LSH and
IVF variants are the approximate scale paths (rows-only checks — their
semantics are 'approximation of the baseline', verified by recall
tests in tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import similarity as S
from ..operators.spread import spread_for_compute
from .registry import register

QUERY_VEC_ID = 0
TOP_K = 10

_COSINE_SQL = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {qid}
), scored AS (
  SELECT e.vec_id,
         ROUND(
           list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine_sim
  FROM embeddings e, q
)
SELECT vec_id, cosine_sim
FROM scored
ORDER BY cosine_sim DESC, vec_id
LIMIT {k}
"""


def _query_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    emb = load_table(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").head()
    return [float(x) for x in row["embedding"]]


@register(
    "sim_cosine_topk",
    oracle=_COSINE_SQL.format(qid=QUERY_VEC_ID, k=TOP_K),
    description=(
        "Brute-force cosine top-k against a query vector — exact ANN "
        "baseline; TakeOrderedAndProject keeps k rows per partition, no "
        "corpus shuffle."
    ),
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.cosine_topk(emb, _query_vector(spark, sf_dir), k=TOP_K)


FILTER_LABEL = 5  # metadata predicate for the filtered-ANN surface

_FILTERED_COSINE_SQL = """
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = {qid}
), scored AS (
  SELECT e.vec_id, e.label,
         ROUND(
           list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine_sim
  FROM embeddings e, q
  WHERE e.label = {label}
)
SELECT vec_id, label, cosine_sim
FROM scored
ORDER BY cosine_sim DESC, vec_id
LIMIT {k}
"""


@register(
    "sim_filtered_topk",
    oracle=_FILTERED_COSINE_SQL.format(
        qid=QUERY_VEC_ID, label=FILTER_LABEL, k=TOP_K
    ),
    description=(
        "[EXT] exact top-k under a metadata predicate — the filtered "
        "vector search every RAG deployment runs (WHERE label = "
        f"{FILTER_LABEL}, ~10% selective). The filter lands BEFORE "
        "scoring, so Catalyst pushes it into the parquet scan and the "
        "cosine evaluates only on survivors; orderBy+limit is one "
        "TakeOrderedAndProject, no corpus shuffle. The exact baseline "
        "the filter-aware IVF path is measured against."
    ),
)
def sim_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    return S.cosine_topk(
        emb.filter(F.col("label") == FILTER_LABEL), qv, k=TOP_K
    ).join(
        emb.select("vec_id", "label"), "vec_id"
    ).select("vec_id", "label", "cosine_sim").orderBy(
        # re-pin row order after the label join (which drops the top-k
        # sort) to match the oracle's ORDER BY — r11 advice: a
        # row-order-sensitive canonicalizer must not see an unordered
        # frame even though the local comparison is multiset-based
        F.desc("cosine_sim"), "vec_id"
    )


# floor under the measured deterministic recalls of the filter-aware
# IVF path at n_lists=8, nprobe=2, label>=5 (~50% selective =>
# nprobe_eff 4): 0.8 / 0.6 / 0.5 at sf0.001 / 0.01 / 0.1; the naive
# post-filter baseline measures 0.4 / 0.4 / 0.3 on the same index.
FILTERED_RECALL_FLOOR = 0.3


@register(
    "sim_ivf_filtered_recall_floor",
    oracle="""
SELECT 'aware_ge_postfilter' AS check_name, TRUE AS ok
UNION ALL
SELECT 'ivf_filtered_recall' AS check_name, TRUE AS ok
ORDER BY check_name
""",
    description=(
        "[EXT] driver-visible floor for FILTER-AWARE IVF probing "
        "(ivf_filtered_topk): recall vs the exact filtered brute "
        f"force must clear {FILTERED_RECALL_FLOOR} (measured 0.5-0.8 "
        "across sf0.001-0.1), AND must dominate the naive post-filter "
        "baseline (run unfiltered IVF top-k, then filter the hits) — "
        "dominance is a theorem (the aware candidate pool is a "
        "superset of the post-filter survivors under the same probe "
        "ordering, and dropping competitors never demotes a row), so "
        "a violation means the probe-widening logic broke. Both "
        "checks run inside Spark; the oracle pins the booleans, so a "
        "regression hash-mismatches."
    ),
)
def sim_ivf_filtered_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    pred = F.col("label") >= FILTER_LABEL
    # lazy pin: the exact filtered top-k feeds both recall joins
    exact_ids = (
        S.cosine_topk(emb.filter(pred), qv, k=TOP_K)
        .select("vec_id")
        .localCheckpoint(eager=False)
    )
    aware_hits = (
        S.ivf_filtered_topk(emb, qv, pred, k=TOP_K, n_lists=8, nprobe=2)
        .select("vec_id")
        .join(exact_ids, "vec_id")
        .agg(F.count(F.lit(1)).alias("n_aware"))
    )
    # naive post-filter baseline on the SAME index configuration
    post_hits = (
        S.ivf_topk(emb, qv, k=TOP_K, n_lists=8, nprobe=2)
        .join(emb.select("vec_id", "label"), "vec_id")
        .filter(pred)
        .select("vec_id")
        .join(exact_ids, "vec_id")
        .agg(F.count(F.lit(1)).alias("n_post"))
    )
    # round, not int(): int(0.3 * 10) truncates 2.999... to 2 and would
    # silently enforce one hit below the documented floor (r11 advice)
    need = round(FILTERED_RECALL_FLOOR * TOP_K)
    return (
        aware_hits.crossJoin(post_hits)
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("aware_ge_postfilter").alias("check_name"),
                        (F.col("n_aware") >= F.col("n_post")).alias("ok"),
                    ),
                    F.struct(
                        F.lit("ivf_filtered_recall").alias("check_name"),
                        (F.col("n_aware") >= need).alias("ok"),
                    ),
                )
            ).alias("r")
        )
        .select("r.check_name", "r.ok")
        .orderBy("check_name")
    )


@register(
    "sim_pairs_blocked",
    oracle="""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT a.label,
       a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_dot_product(a.e, b.e)
             / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS cosine_sim
FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.e, b.e)
            / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.4
""",
    description=(
        "Embedding near-dup pairs, label-blocked: all-pairs cosine >= 0.4 "
        "inside each label block — the blocked (not quadratic-global) "
        "exact form."
    ),
)
def sim_pairs_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", "label", S.as_double("embedding").alias("e"))
    # the single-file corpus joins as ONE probe task, serializing the
    # per-pair cosine fold — spread the probe side; the build side
    # still broadcasts (plan unchanged otherwise)
    a, b = spread_for_compute(v, "vec_id").alias("a"), v.alias("b")
    cos = F.round(
        S.dot(F.col("a.e"), F.col("b.e"))
        / (S.l2_norm(F.col("a.e")) * S.l2_norm(F.col("b.e"))),
        6,
    )
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.label").alias("label"),
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= 0.4)
    )


@register(
    "sim_label_centroids",
    oracle="""
WITH e AS (
  SELECT label, t.idx - 1 AS pos, CAST(embedding[t.idx] AS DOUBLE) AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(idx)
)
SELECT label, pos,
       CAST(SUM(CAST(ROUND(v*1000000) AS BIGINT)) AS DOUBLE)/1000000.0/COUNT(*) AS centroid_val,
       COUNT(*) AS n_vectors
FROM e GROUP BY 1, 2
""",
    description=(
        "Per-label embedding centroids (the k-means/IVF training "
        "primitive): posexplode to (label, dim, value), exact micro-"
        "scaled integer sums per cell, one shuffle on (label, dim). At "
        "100 TB the map-side combine means shuffled bytes are "
        "O(labels x dims), independent of corpus size."
    ),
)
def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cell = emb.select(
        "label", F.posexplode(S.as_double("embedding")).alias("pos", "v")
    )
    s = F.sum(F.round(F.col("v") * 1000000).cast("long"))
    return cell.groupBy("label", "pos").agg(
        (s.cast("double") / 1000000.0 / F.count(F.lit(1))).alias("centroid_val"),
        F.count(F.lit(1)).alias("n_vectors"),
    )


@register(
    "sim_lsh_ann_topk",
    oracle=None,  # approximate: recall vs brute force asserted in tests
    description="Approximate NN via BucketedRandomProjectionLSH, exact cosine re-rank of candidates (scale path).",
)
def sim_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.lsh_ann_topk(emb, _query_vector(spark, sf_dir), k=TOP_K)


@register(
    "sim_lsh_dup_pairs",
    oracle=None,  # approximate: recall vs the exact pair set asserted in tests
    description=(
        "Global embedding near-dup pairs without a blocking key: banded "
        "sign-random-projection LSH with exact cosine verification of "
        "candidates, and a computed crossover to all-pairs-verify when "
        "the threshold regime makes bucketing unable to prune (the "
        "cosine>=0.4 setting here, against an isotropic corpus, is that "
        "regime by construction — operators/similarity.py srp_dup_pairs)."
    ),
)
def sim_lsh_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.srp_dup_pairs(emb, min_cosine=0.4)


@register(
    "sim_ivf_topk",
    oracle=None,  # approximate: recall vs brute force asserted in tests
    description="IVF-style ANN: deterministic coarse centroids, probe nearest cells only (scale path).",
)
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.ivf_topk(emb, _query_vector(spark, sf_dir), k=TOP_K, n_lists=8, nprobe=4)


# Per-method recall floors, chosen with margin under the measured
# deterministic recalls (fixed seeds, so stable per sf):
# lsh 1.0/0.9/1.0 and ivf 0.8/0.6/0.8 at sf0.001/0.01/0.1.
# r15 re-pin (r14 verdict next-round #6): ivf floor 0.5 sat at
# exactly 1.20x its worst measured recall (6/10 at sf0.01) — one
# testdata refresh from red. 0.4 keeps >= 1.5x slack at every SF.
ANN_RECALL_FLOORS = {"lsh": 0.7, "ivf": 0.4}


@register(
    "sim_ann_recall_floor",
    oracle="""
SELECT 'ivf' AS method, TRUE AS recall_ok
UNION ALL
SELECT 'lsh' AS method, TRUE AS recall_ok
""",
    description=(
        "Driver-visible exactness floor for the ANN scale paths (round-3 "
        "advice #8): computes recall of sim_lsh_ann_topk and sim_ivf_topk "
        "against the exact brute-force top-k INSIDE Spark and returns one "
        "(method, recall_ok) row per method. The oracle pins the expected "
        "booleans, so a recall regression below the floor "
        f"({ANN_RECALL_FLOORS}) hash-mismatches — the ANN surface earns a "
        "hard green row instead of a perpetual rows-only record. The "
        "floors sit under measured deterministic recalls (lsh >= 0.9, "
        "ivf >= 0.6 across sf0.001/0.01/0.1)."
    ),
)
def sim_ann_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    # lazy pin: both method branches reference this k-row frame, and
    # without it the plan recomputes the full-corpus exact scan twice.
    # Lazy (eager=False) so merely BUILDING the DataFrame — plan audits,
    # explain() — runs no job; the first action materializes the k rows
    # once for both branches. localCheckpoint, NOT persist: there is no
    # in-function point where unpersist would be safe (the frame is
    # consumed by the caller's later action), and a persist here leaked
    # one pinned frame per invocation (ADVICE r4) — checkpoint blocks
    # are instead reclaimed by the ContextCleaner once the frame is
    # garbage-collected, the same lifecycle argument as functions/ids.py.
    exact_ids = S.cosine_topk(emb, qv, k=TOP_K).select("vec_id").localCheckpoint(
        eager=False
    )

    def floor_row(method: str, ann: DataFrame) -> DataFrame:
        need = int(ANN_RECALL_FLOORS[method] * TOP_K)
        return (
            ann.select("vec_id")
            .join(exact_ids, "vec_id")
            .agg((F.count(F.lit(1)) >= need).alias("recall_ok"))
            .select(F.lit(method).alias("method"), "recall_ok")
        )

    lsh = floor_row("lsh", S.lsh_ann_topk(emb, qv, k=TOP_K))
    ivf = floor_row("ivf", S.ivf_topk(emb, qv, k=TOP_K, n_lists=8, nprobe=4))
    return lsh.unionByName(ivf)


# measured 0.8/0.8/0.7 at sf0.001/0.01/0.1; re-pinned 0.6 -> 0.5 in
# r15 (r14 verdict next-round #6): 7/6 slack at sf0.1 was under the
# 20% margin bar, 7/5 = 1.4 clears it
IVFPQ_RECALL_FLOOR = 0.5


@register(
    "sim_ivfpq_recall_floor",
    oracle="SELECT 'ivfpq' AS method, TRUE AS recall_ok",
    description=(
        "Driver-visible recall floor for the IVFADC tier "
        "(operators/similarity.ivfpq_topk — Jégou et al. 2011, public "
        "methodology): coarse quantization + product-quantized "
        "residual codes + asymmetric-distance shortlist + exact cosine "
        "re-rank. Recall vs the exact brute-force top-k is computed "
        "INSIDE Spark and the oracle pins recall_ok=TRUE at floor "
        f"{IVFPQ_RECALL_FLOOR} (measured deterministic recalls 0.8/0.8/"
        "0.7 across sf0.001/0.01/0.1 with the default n_lists=8, "
        "nprobe=6, M=16, 64 codes, rerank=150). PQ is the rung that "
        "matters at 100 TB: the shortlist stage reads 16 code bytes "
        "per vector instead of the raw floats — see SCALING.md."
    ),
)
def sim_ivfpq_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    # single consumer — no pin needed (contrast sim_ann_recall_floor)
    exact_ids = S.cosine_topk(emb, qv, k=TOP_K).select("vec_id")
    need = int(IVFPQ_RECALL_FLOOR * TOP_K)
    return (
        S.ivfpq_topk(emb, qv, k=TOP_K)
        .select("vec_id")
        .join(exact_ids, "vec_id")
        .agg((F.count(F.lit(1)) >= need).alias("recall_ok"))
        .select(F.lit("ivfpq").alias("method"), "recall_ok")
    )


@register(
    "sim_gram_matrix",
    oracle="""
WITH e AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(ROUND(x * 1000000) AS BIGINT)) AS v
  FROM embeddings
),
cell AS (
  SELECT vec_id, t.i - 1 AS pos, v[t.i] AS x
  FROM e, unnest(generate_series(1, len(v))) AS t(i)
)
SELECT a.pos AS i, b.pos AS j,
       CAST(SUM(a.x * b.x) AS DOUBLE) AS gram_scaled
FROM cell a JOIN cell b ON a.vec_id = b.vec_id AND a.pos <= b.pos
GROUP BY 1, 2
""",
    description=(
        "[EXT] exact distributed Gram matrix (upper triangle of X^T X "
        "over micro-scaled int64 embeddings) — the PCA/whitening/"
        "covariance primitive (operators/similarity.gram_matrix). One "
        "int64 numpy matmul per partition, d(d+1)/2 partial cells "
        "shuffled per partition regardless of row count, decimal(38,0) "
        "cell sums matching the oracle's HUGEINT accumulation exactly."
    ),
)
def sim_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.gram_matrix(emb)


PLANT_DELTA = 0.3  # worst-case planted cosine = 1/sqrt(1+delta^2) ≈ 0.958


@register(
    "sim_srp_banded_recall",
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_planted,
       CAST(COUNT(*) AS BIGINT) AS n_found
FROM embeddings
""",
    description=(
        "Driver-visible recall check for the BANDED sign-random-"
        "projection LSH path (the scale tier sim_lsh_dup_pairs can't "
        "exercise at its 0.4 threshold, where the computed crossover "
        "correctly picks the exact tier): plant one near-duplicate per "
        "corpus vector (unit-normalize, nudge dim 0 by +0.3 — planted "
        "cosine >= 1/sqrt(1.09) ≈ 0.958 for EVERY vector, derived, not "
        "sampled), run srp_dup_pairs at min_cosine 0.8 where banding "
        "engages (expected recall 0.997 at the collision-probability "
        "bound), and count recovered planted pairs. The oracle pins "
        "n_found == n_planted == corpus size EXACTLY: one missed pair "
        "hash-mismatches. Deterministic via the fixed projection seed."
    ),
)
def sim_srp_banded_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # Planted ids must not collide with real ids at ANY SF (ADVICE r4:
    # a constant offset breaks silently once vec_id reaches it), so the
    # offset is derived from the data — one bounded, column-pruned probe
    # job over vec_id at query-build time.
    plant_offset = (
        emb.agg(F.max("vec_id").cast("long")).head()[0] or 0
    ) + 1
    u = S.as_double("embedding")
    unit = F.transform(u, lambda x: x / S.l2_norm(u))
    planted = emb.select(
        (F.col("vec_id") + plant_offset).alias("vec_id"),
        F.transform(
            unit,
            lambda x, i: F.when(i == 0, x + F.lit(PLANT_DELTA)).otherwise(x),
        ).alias("embedding"),
    )
    corpus = emb.select("vec_id", unit.alias("embedding")).unionByName(planted)
    pairs = S.srp_dup_pairs(corpus, min_cosine=0.8)
    found = pairs.filter(
        F.col("vec_b") == F.col("vec_a") + plant_offset
    ).select(F.count(F.lit(1)).alias("n_found"))
    total = emb.select(F.count(F.lit(1)).alias("n_planted"))
    return total.crossJoin(found)


@register(
    "sim_text_embedding_agreement",
    oracle="""
WITH tok AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents),
sh AS (
  SELECT doc_id, unnest(
    CASE WHEN len(toks) >= 3
         THEN list_transform(generate_series(1, len(toks)-2),
                             i -> array_to_string(toks[i:i+2], ' '))
         ELSE [array_to_string(toks, ' ')] END) AS shingle
  FROM tok
),
d AS (SELECT DISTINCT doc_id, shingle FROM sh),
sig AS (
  SELECT doc_id,
         MIN(substr(md5(shingle), 1, 8)) AS mh0,
         MIN(substr(md5(shingle), 9, 8)) AS mh1,
         MIN(substr(md5(shingle), 17, 8)) AS mh2,
         MIN(substr(md5(shingle), 25, 8)) AS mh3
  FROM d GROUP BY doc_id
),
bands AS (
  SELECT doc_id, 0 AS band, md5(mh0 || mh1) AS bucket FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band, md5(mh2 || mh3) AS bucket FROM sig
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT p.doc_a, p.doc_b,
       ROUND(list_dot_product(va.e, vb.e)
             / (sqrt(list_dot_product(va.e, va.e)) * sqrt(list_dot_product(vb.e, vb.e))),
             6) AS emb_cosine
FROM pairs p
JOIN v va ON va.vec_id = p.doc_a
JOIN v vb ON vb.vec_id = p.doc_b
""",
    description=(
        "[EXT] cross-modal near-dup agreement: every text-LSH candidate "
        "pair re-scored by the cosine of the documents' embedding "
        "vectors — the check a pipeline runs before trusting surface "
        "dedup to stand in for semantic dedup (or vice versa). Candidate "
        "generation is the banded MinHash join (never all-pairs); the "
        "embedding re-score touches only candidate rows."
    ),
)
def sim_text_embedding_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = D.minhash_candidates(docs, num_hashes=4, rows_per_band=2)
    v = emb.select("vec_id", S.as_double("embedding").alias("e"))
    va = v.select(F.col("vec_id").alias("doc_a"), F.col("e").alias("ea"))
    vb = v.select(F.col("vec_id").alias("doc_b"), F.col("e").alias("eb"))
    return (
        pairs.join(va, "doc_a")
        .join(vb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                S.dot(F.col("ea"), F.col("eb"))
                / (S.l2_norm(F.col("ea")) * S.l2_norm(F.col("eb"))),
                6,
            ).alias("emb_cosine"),
        )
    )


SEMDEDUP_THRESHOLD = 0.30


@register(
    "sim_semantic_dedup",
    oracle=f"""
WITH cell AS (
  SELECT label, t.idx - 1 AS pos, CAST(embedding[t.idx] AS DOUBLE) AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(idx)
),
cent AS (
  SELECT label, pos,
         CAST(SUM(CAST(ROUND(v*1000000) AS BIGINT)) AS DOUBLE)/1000000.0/COUNT(*) AS cv
  FROM cell GROUP BY 1, 2
),
cvec AS (SELECT label, list(cv ORDER BY pos) AS c FROM cent GROUP BY 1),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
scored AS (
  SELECT e.vec_id, cvec.label,
         list_dot_product(e.v, cvec.c)
         / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cvec.c, cvec.c))) AS cos
  FROM e CROSS JOIN cvec
),
assigned AS (
  SELECT vec_id, label AS cluster FROM scored
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, label) = 1
),
av AS (SELECT a.vec_id, a.cluster, e.v FROM assigned a JOIN e USING (vec_id)),
dup AS (
  SELECT DISTINCT b.vec_id
  FROM av a JOIN av b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
        >= {SEMDEDUP_THRESHOLD}
)
SELECT a.vec_id, a.cluster, (d.vec_id IS NULL) AS kept
FROM assigned a LEFT JOIN dup d ON d.vec_id = a.vec_id
""",
    description=(
        "SemDeDup-shaped semantic dedup (arXiv:2303.09540): nearest-"
        "centroid assignment against broadcast exact-mean centroids, "
        "then near-dup pruning (cosine >= 0.30, greedy min-id "
        "retention) confined to each cluster — the quadratic step never "
        "crosses cluster boundaries, which is what makes embedding "
        "dedup tractable at 100 TB (raise k to bound cluster size)."
    ),
)
def sim_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.semantic_dedup(emb, threshold=SEMDEDUP_THRESHOLD)


KMEANS_ITERATIONS = 2


def _kmeans_oracle(iterations: int) -> str:
    """Unrolled Lloyd's rounds as chained CTEs (the pagerank/hilbert
    oracle pattern), generated from the same per-round structure as
    operators/similarity.kmeans_refine."""
    parts = [
        """
WITH cell0 AS (
  SELECT label, t.idx - 1 AS pos, CAST(embedding[t.idx] AS DOUBLE) AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(idx)
),
cent0 AS (
  SELECT label AS cluster, pos,
         CAST(SUM(CAST(ROUND(v*1000000) AS BIGINT)) AS DOUBLE)/1000000.0/COUNT(*) AS cv
  FROM cell0 GROUP BY 1, 2
),
cvec0 AS (SELECT cluster, list(cv ORDER BY pos) AS c FROM cent0 GROUP BY 1),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"""
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f""",
a{i} AS (
  SELECT vec_id, cluster FROM (
    SELECT e.vec_id, cv.cluster,
           list_dot_product(e.v, cv.c)
           / (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(cv.c, cv.c))) AS cos
    FROM e CROSS JOIN cvec{i - 1} cv)
  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cluster) = 1
),
cell{i} AS (
  SELECT a.cluster, t.idx - 1 AS pos, e.v[t.idx] AS val
  FROM a{i} a JOIN e USING (vec_id),
       unnest(generate_series(1, len(e.v))) AS t(idx)
),
cent{i} AS (
  SELECT cluster, pos,
         CAST(SUM(CAST(ROUND(val*1000000) AS BIGINT)) AS DOUBLE)/1000000.0/COUNT(*) AS cv,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM cell{i} GROUP BY 1, 2
),
cvec{i} AS (SELECT cluster, list(cv ORDER BY pos) AS c FROM cent{i} GROUP BY 1)"""
        )
    parts.append(
        f"""
SELECT cluster, pos, cv AS centroid_val, n AS n_vectors
FROM cent{iterations}"""
    )
    return "".join(parts)


@register(
    "sim_kmeans_refined",
    oracle=_kmeans_oracle(KMEANS_ITERATIONS),
    description=(
        "Lloyd's k-means refinement (2 rounds from the per-label "
        "exact-mean seeds) with bit-reproducible arithmetic: "
        "deterministic cosine argmax assignment, exact micro-scaled "
        "integer means — the IVF/SemDeDup centroid-training primitive "
        "whose fixed point the oracle pins hash-exactly (float-"
        "accumulated k-means drifts with partitioning; this cannot). "
        "Per round: one O(k x d) broadcast, map-side argmax, one "
        "(cluster, dim)-keyed exchange independent of corpus size."
    ),
)
def sim_kmeans_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.kmeans_refine(emb, iterations=KMEANS_ITERATIONS)


def _pca_floor_audit(spark: SparkSession, sf_dir: str):
    """Plan-audit hook: the distributed Gram reduction — the only
    corpus-sized work behind the eager floor (power iteration runs
    driver-side on d x d cells)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return {"gram": S.gram_matrix(emb)}


@register(
    "sim_pca_power_floor",
    oracle="""
SELECT 'residual' AS check_name, TRUE AS guarantee_ok
UNION ALL
SELECT 'rayleigh_bounds' AS check_name, TRUE AS guarantee_ok
""",
    description=(
        "[EXT] driver-visible guarantee floor for the distributed-PCA "
        "primitive (operators/similarity.pca_top_component): the top "
        "eigenpair of X^T X computed by power iteration over the EXACT "
        "distributed Gram must satisfy ||Gv - lambda*v|| <= 1e-9 * "
        "lambda (convergence residual) and 0 < lambda <= trace(G) "
        "(Rayleigh bounds — the top eigenvalue of a PSD matrix). The "
        "oracle pins both booleans, so a regression in gram_matrix, "
        "the scaling, or the iteration hash-mismatches. Scale shape: "
        "the corpus-sized work is the gram reduction; the driver only "
        "ever sees d(d+1)/2 cells."
    ),
    audit_frames=_pca_floor_audit,
)
def sim_pca_power_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    v, lam, G = S.pca_top_component(emb)
    residual = float(np.linalg.norm(G @ v - lam * v))
    res_ok = bool(residual <= 1e-9 * lam)
    ray_ok = bool(0.0 < lam <= float(np.trace(G)) + 1e-9 * lam)
    return spark.createDataFrame(
        [("residual", res_ok), ("rayleigh_bounds", ray_ok)],
        "check_name string, guarantee_ok boolean",
    )


@register(
    "sim_ivfpq_lloyd_recall_floor",
    oracle="SELECT 'ivfpq_lloyd' AS method, TRUE AS recall_ok",
    description=(
        "[EXT] recall floor for IVFADC with TRAINED coarse centroids: "
        "kmeans_refine's 2-round bit-reproducible Lloyd output (k x d "
        "cells collected — bounded driver state) injected into "
        "ivfpq_topk's cent parameter, replacing the seed sample. "
        "Measured deterministic recall@10 0.9/0.9/0.7 across "
        "sf0.001/0.01/0.1 vs the seeded index's 0.8/0.8/0.7 — training "
        "the quantizer is the standard production step this pins; the "
        f"oracle asserts recall >= {IVFPQ_RECALL_FLOOR} exactly like "
        "the seeded floor, so both index builds carry driver evidence. "
        "Scale: training cost is kmeans_refine's per-round broadcast + "
        "(cluster,dim)-keyed exchange (corpus-size-independent state); "
        "the query path is byte-identical to sim_ivfpq_recall_floor."
    ),
)
def sim_ivfpq_lloyd_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    rows = S.kmeans_refine(emb, iterations=2).collect()
    k = max(r["cluster"] for r in rows) + 1
    d = max(r["pos"] for r in rows) + 1
    cent = np.zeros((k, d))
    seen = set()
    for r in rows:
        cent[r["cluster"], r["pos"]] = r["centroid_val"]
        seen.add(r["cluster"])
    cent = cent[sorted(seen)]  # Lloyd may empty a cluster
    exact_ids = S.cosine_topk(emb, qv, k=TOP_K).select("vec_id")
    need = int(IVFPQ_RECALL_FLOOR * TOP_K)
    return (
        S.ivfpq_topk(emb, qv, k=TOP_K, cent=cent)
        .select("vec_id")
        .join(exact_ids, "vec_id")
        .agg((F.count(F.lit(1)) >= need).alias("recall_ok"))
        .select(F.lit("ivfpq_lloyd").alias("method"), "recall_ok")
    )


@register(
    "sim_ivfpq_trained_codebook_floor",
    oracle=(
        "SELECT 'ivfpq_trained_books' AS method, TRUE AS recall_ok, "
        "TRUE AS distortion_improved"
    ),
    description=(
        "[EXT] floor for the FULLY trained IVFADC index: Lloyd coarse "
        "centroids (kmeans_refine, 2 rounds) AND Lloyd sub-codebooks "
        "(operators/similarity.train_pq_codebooks, 2 rounds — one "
        "narrow corpus pass per round, M x n_codes x sub partial rows "
        "per partition, int64/decimal exact). Pins TWO booleans: "
        f"recall@{TOP_K} >= {IVFPQ_RECALL_FLOOR} (same bar as the "
        "seeded/lloyd floors), and total PQ quantization distortion "
        "(pq_distortion — the k-means objective, exact on the 1e-6 "
        "grid) NOT WORSE than the seeded codebooks' — Lloyd "
        "monotonicity made driver-visible, so a trainer regression "
        "hash-mismatches even when the re-rank tier hides it from "
        "recall. Measured at r7: distortion drops 30%/31%/23% at "
        "sf0.001/0.01/0.1 and tight-shortlist recall (rerank=15, "
        "sf0.1) rises 0.3 -> 0.5; "
        "at the default rerank=150 recall holds 0.9/0.9/0.7 "
        "(SCALING.md table)."
    ),
)
def sim_ivfpq_trained_codebook_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    rows = S.kmeans_refine(emb, iterations=2).collect()
    k = max(r["cluster"] for r in rows) + 1
    d = max(r["pos"] for r in rows) + 1
    cent = np.zeros((k, d))
    seen = set()
    for r in rows:
        cent[r["cluster"], r["pos"]] = r["centroid_val"]
        seen.add(r["cluster"])
    cent = cent[sorted(seen)]
    books = S.train_pq_codebooks(emb, cent, iterations=2)
    seeded = S._seed_codebooks(emb, cent, 16, 64)
    dist_trained = S.pq_distortion(emb, cent, books)
    dist_seeded = S.pq_distortion(emb, cent, seeded)
    # <= with a 1e-9 relative slack: micro-grid rounding perturbs the
    # otherwise-monotone Lloyd objective by O(grid) per entry
    dist_ok = bool(dist_trained <= dist_seeded + max(1, dist_seeded // 10**9))
    exact_ids = S.cosine_topk(emb, qv, k=TOP_K).select("vec_id")
    need = int(IVFPQ_RECALL_FLOOR * TOP_K)
    return (
        S.ivfpq_topk(emb, qv, k=TOP_K, cent=cent, codebooks=books)
        .select("vec_id")
        .join(exact_ids, "vec_id")
        .agg((F.count(F.lit(1)) >= need).alias("recall_ok"))
        .select(
            F.lit("ivfpq_trained_books").alias("method"),
            "recall_ok",
            F.lit(dist_ok).alias("distortion_improved"),
        )
    )


@register(
    "sim_ivfpq_retrained_floor",
    oracle=(
        "SELECT 'ivfpq_retrained' AS method, TRUE AS recall_ok, "
        "TRUE AS distortion_improved"
    ),
    description=(
        "[EXT] floor for the OFFLINE QUANTIZER RETRAIN recipe (r12 "
        "verdict next-round #4): operators/similarity.retrain_quantizer "
        "— k-means|| seeding + 2 exact-integer Lloyd centroid rounds + "
        "2 Lloyd PQ-codebook rounds, the exact computation "
        "streaming/ivf_index.retrain_ivfpq_index runs over a stored "
        "index's accumulated epochs before its staged all-or-nothing "
        f"rebuild swap. Pins TWO booleans: recall@{TOP_K} >= "
        f"{IVFPQ_RECALL_FLOOR} under the fully retrained quantizer "
        "(measured 0.9/0.8/0.8 at sf0.001/0.01/0.1), and total PQ "
        "distortion NOT WORSE than the seeded bulk-build quantizer's "
        "(measured ~54%/55%/49% lower — retraining halves the "
        "objective). Stored-index mechanics (round-trip exactness, "
        "epoch fold, probe==inline, staged-group crash safety) are "
        "pinned by tests/test_streaming.py::test_retrain_ivfpq_index."
    ),
)
def sim_ivfpq_retrained_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    cent, books = S.retrain_quantizer(emb, n_lists=8)
    seeded_cent = S._seed_vectors(emb, 8, "vec_id", "embedding")
    seeded_books = S._seed_codebooks(emb, seeded_cent, 16, 64)
    d_new = S.pq_distortion(emb, cent, books)
    d_old = S.pq_distortion(emb, seeded_cent, seeded_books)
    # 1e-9 relative slack: grid rounding perturbs the otherwise-
    # monotone objective (the sim_ivfpq_trained_codebook_floor
    # convention)
    dist_ok = bool(d_new <= d_old + max(1, d_old // 10**9))
    exact_ids = S.cosine_topk(emb, qv, k=TOP_K).select("vec_id")
    need = int(IVFPQ_RECALL_FLOOR * TOP_K)
    return (
        S.ivfpq_topk(emb, qv, k=TOP_K, cent=cent, codebooks=books)
        .select("vec_id")
        .join(exact_ids, "vec_id")
        .agg((F.count(F.lit(1)) >= need).alias("recall_ok"))
        .select(
            F.lit("ivfpq_retrained").alias("method"),
            "recall_ok",
            F.lit(dist_ok).alias("distortion_improved"),
        )
    )


@register(
    "sim_ivf_kmeanspar_recall_floor",
    oracle=(
        "SELECT 'ivfpq_kmeans_par' AS method, TRUE AS recall_ok, "
        "TRUE AS lloyd_monotone, TRUE AS seeding_beats_uniform"
    ),
    description=(
        "[EXT] floor for IVFADC built from SCALABLE k-means|| seeding "
        "(Bahmani et al. 2012): 3 distance-weighted oversampling "
        "rounds (selection coin = pure function of (id, round, salt), "
        "φ an exact int64/decimal sum, integer cross-multiplied "
        "comparison — same candidates under any partitioning), "
        "driver-side weighted farthest-point reduction to 8 seeds, "
        "then 2 exact-integer Lloyd rounds (lloyd_refine_matrix). Pins "
        f"THREE booleans: recall@{TOP_K} >= {IVFPQ_RECALL_FLOOR} "
        "(measured 0.9/0.8/0.7 at sf0.001/0.01/0.1); Lloyd "
        "monotonicity on the 1e-6 grid (refined coarse distortion <= "
        "the raw || seeds'); and the seeding claim itself — raw || "
        "seeds' coarse distortion strictly below the uniform hash "
        "sample's (measured 1.9%/1.5%/0.3% lower; deterministic "
        "arithmetic makes the strict inequality pinnable). Scale: two "
        "bounded narrow passes per round against a broadcast candidate "
        "set; only a few dozen candidate rows ever reach the driver — "
        "the seeding that stays principled when the corpus no longer "
        "fits a sample."
    ),
)
def sim_ivf_kmeanspar_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    seeds = S.kmeans_parallel_seed(emb, n_seeds=8, rounds=3)
    cent = S.lloyd_refine_matrix(emb, seeds, iterations=2)
    d_raw_par = S.coarse_distortion(emb, seeds)
    d_lloyd_par = S.coarse_distortion(emb, cent)
    d_raw_hash = S.coarse_distortion(
        emb, S._seed_vectors(emb, 8, "vec_id", "embedding")
    )
    # 1e-9 relative slack: grid rounding perturbs the otherwise-
    # monotone Lloyd objective by O(grid) per entry (the
    # sim_ivfpq_trained_codebook_floor convention)
    lloyd_ok = bool(d_lloyd_par <= d_raw_par + max(1, d_raw_par // 10**9))
    seed_ok = bool(d_raw_par < d_raw_hash)
    exact_ids = S.cosine_topk(emb, qv, k=TOP_K).select("vec_id")
    need = int(IVFPQ_RECALL_FLOOR * TOP_K)
    return (
        S.ivfpq_topk(emb, qv, k=TOP_K, cent=cent)
        .select("vec_id")
        .join(exact_ids, "vec_id")
        .agg((F.count(F.lit(1)) >= need).alias("recall_ok"))
        .select(
            F.lit("ivfpq_kmeans_par").alias("method"),
            "recall_ok",
            F.lit(lloyd_ok).alias("lloyd_monotone"),
            F.lit(seed_ok).alias("seeding_beats_uniform"),
        )
    )


IVF_SWEEP_PROBES = (1, 2, 4)
# at the widest probe; narrower probes pin monotonicity. Re-pinned
# 0.5 -> 0.4 in r15: the sf0.01 measured 0.6 sat at exactly 1.20x
IVF_SWEEP_FLOOR = 0.4


def _ivf_sweep_audit(spark: SparkSession, sf_dir: str):
    """Plan-audit hook: the exact top-k baseline and the widest-probe
    IVF query — the two frame shapes the eager sweep collects per
    probe step (ivf_topk's bounded seed sample executes; the corpus
    passes stay lazy)."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    return {
        "exact_topk": S.cosine_topk(emb, qv, k=TOP_K),
        "ivf_widest_probe": S.ivf_topk(
            emb, qv, k=TOP_K, n_lists=8, nprobe=IVF_SWEEP_PROBES[-1]
        ),
    }


@register(
    "sim_ivf_nprobe_sweep",
    oracle="""
SELECT CAST(1 AS BIGINT) AS nprobe, TRUE AS monotone_ok, TRUE AS floor_ok
UNION ALL
SELECT CAST(2 AS BIGINT) AS nprobe, TRUE AS monotone_ok, TRUE AS floor_ok
UNION ALL
SELECT CAST(4 AS BIGINT) AS nprobe, TRUE AS monotone_ok, TRUE AS floor_ok
""",
    description=(
        "[EXT] IVF recall-vs-nprobe sweep: the operating-curve "
        "measurement an ANN deployment tunes against. Runs ivf_topk "
        "at nprobe 1/2/4 and pins, per step: (a) MONOTONICITY — "
        "probing more cells can only grow the candidate set, and the "
        "exact re-rank of a superset can only improve recall, so "
        "recall@10 must be non-decreasing in nprobe (a structural "
        "property of the index, violated only by an assignment/probe "
        f"bug); (b) recall >= {IVF_SWEEP_FLOOR} at the widest probe "
        "(n_lists=8, the sim_ivf_topk configuration — measured "
        "recall@10 at nprobe 1/2/4: 0.4/0.4/0.8, 0.2/0.2/0.6 and "
        "0.4/0.6/0.8 across sf0.001/0.01/0.1). "
        "Recall counts are exact integers (top-10 id-set "
        "intersections), so both booleans are deterministic hash "
        "evidence. Cost model: each probe step scans only its cells' "
        "vectors; the sweep quantifies the recall a deployment buys "
        "per additional cell scanned."
    ),
    audit_frames=_ivf_sweep_audit,
)
def sim_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    exact_ids = {
        r["vec_id"] for r in S.cosine_topk(emb, qv, k=TOP_K).collect()
    }
    recalls = []
    for np_ in IVF_SWEEP_PROBES:
        got = {
            r["vec_id"]
            for r in S.ivf_topk(
                emb, qv, k=TOP_K, n_lists=8, nprobe=np_
            ).collect()
        }
        recalls.append(len(got & exact_ids))
    need = int(IVF_SWEEP_FLOOR * TOP_K)
    rows = []
    for i, np_ in enumerate(IVF_SWEEP_PROBES):
        monotone = all(recalls[j] <= recalls[j + 1] for j in range(i))
        rows.append((np_, bool(monotone), bool(recalls[-1] >= need)))
    return spark.createDataFrame(
        rows, "nprobe long, monotone_ok boolean, floor_ok boolean"
    )


MATRYOSHKA_DIMS = (8, 16, 32, 64)


def _matryoshka_oracle(dims: tuple[int, ...], full: int) -> str:
    """Per-prefix-width truncated-cosine top-k intersected with the
    full-width exact top-k — one CTE per width, UNION ALL of the
    (dims, recall) curve rows."""
    parts = [
        f"""
WITH q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
  WHERE vec_id = {QUERY_VEC_ID}
)"""
    ]
    for d in dims:
        parts.append(
            f""",
t{d} AS (
  SELECT e.vec_id
  FROM embeddings e, q
  ORDER BY ROUND(
    list_dot_product(CAST(e.embedding AS DOUBLE[])[1:{d}], q.qv[1:{d}])
    / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[])[1:{d}],
                             CAST(e.embedding AS DOUBLE[])[1:{d}]))
       * sqrt(list_dot_product(q.qv[1:{d}], q.qv[1:{d}]))), 6) DESC,
    e.vec_id
  LIMIT {TOP_K}
)"""
        )
    blocks = [
        f"""
SELECT CAST({d} AS BIGINT) AS dims,
       CAST((SELECT COUNT(*) FROM t{d} a JOIN t{full} b
             ON a.vec_id = b.vec_id)
            AS DOUBLE) / {TOP_K} AS recall
FROM (SELECT 1)"""
        for d in dims
    ]
    return "".join(parts) + "\nSELECT * FROM (" + "\nUNION ALL".join(blocks) + ")"


@register(
    "sim_matryoshka_recall",
    oracle=_matryoshka_oracle(MATRYOSHKA_DIMS, 64),
    description=(
        "[EXT] matryoshka / prefix-truncation recall curve (Kusupati "
        "et al. 2022, public methodology): exact cosine top-10 using "
        "only the first 8/16/32/64 embedding dimensions, each "
        "intersected with the full-width exact top-10 — the "
        "memory-vs-recall tradeoff table that decides how many "
        "dimensions a 100 TB index actually stores (storing a d'-"
        "prefix cuts scan bytes by d'/d with the recall this query "
        "measures; the full-width row pins recall = 1.0 by "
        "construction). Each width is one TakeOrderedAndProject over "
        "a narrow scan — no corpus shuffle, k rows per partition; "
        "truncation is a zero-copy array slice."
    ),
)
def sim_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    full_ids = S.cosine_topk(emb, qv, k=TOP_K).select("vec_id")
    out = None
    for d in MATRYOSHKA_DIMS:
        trunc = emb.select(
            "vec_id", F.slice("embedding", 1, d).alias("embedding")
        )
        ids = S.cosine_topk(trunc, qv[:d], k=TOP_K).select("vec_id")
        row = (
            ids.join(full_ids, "vec_id")
            .agg(
                F.lit(d).cast("long").alias("dims"),
                (F.count(F.lit(1)).cast("double") / TOP_K).alias("recall"),
            )
            .select("dims", "recall")
        )
        out = row if out is None else out.unionByName(row)
    return out


CORESET_K = 8  # greedy k-center rounds (incl. the fixed seed)
CORESET_SEED = QUERY_VEC_ID  # deterministic start: vec_id 0


def _kcenter_oracle(k: int, seed: int) -> str:
    """Unrolled greedy k-center twin (the BPE/markov pattern): stage r
    takes the argmax of the running min squared distance (rounded to
    6dp, vec_id tie-break) and folds the new center into the state."""
    dist = (
        "ROUND(m.dxx - 2 * list_dot_product(m.e, c.e) + c.dxx, 6)"
    )
    ctes = [
        """v AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         list_dot_product(CAST(embedding AS DOUBLE[]),
                          CAST(embedding AS DOUBLE[])) AS dxx
  FROM embeddings)""",
        f"c0 AS (SELECT e, dxx FROM v WHERE vec_id = {seed})",
        """m0 AS MATERIALIZED (
  SELECT m.vec_id, m.e, m.dxx,
         ROUND(m.dxx - 2 * list_dot_product(m.e, c.e) + c.dxx, 6) AS mind
  FROM v m, c0 c)""",
    ]
    for r in range(1, k):
        ctes.append(
            f"""c{r} AS (
  SELECT vec_id, e, dxx, mind FROM m{r - 1}
  ORDER BY mind DESC, vec_id LIMIT 1)"""
        )
        if r < k - 1:
            ctes.append(
                f"""m{r} AS MATERIALIZED (
  SELECT m.vec_id, m.e, m.dxx, LEAST(m.mind, {dist}) AS mind
  FROM m{r - 1} m, c{r} c)"""
            )
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS selection_rank, vec_id,"
        f" mind AS radius_sq FROM c{r}"
        for r in range(1, k)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT CAST(0 AS BIGINT) AS selection_rank,
       CAST({seed} AS BIGINT) AS vec_id,
       CAST(NULL AS DOUBLE) AS radius_sq
UNION ALL
{union}
ORDER BY selection_rank"""
    )


@register(
    "sample_coreset_kcenter",
    oracle=_kcenter_oracle(CORESET_K, CORESET_SEED),
    description=(
        "[EXT] greedy k-center coreset selection over the embedding "
        "corpus (Gonzalez 1985 farthest-point traversal; the coreset "
        "rung of data pruning, Sener & Savarese ICLR'18): from a fixed "
        f"seed, {CORESET_K - 1} rounds each pick the vector FARTHEST "
        "from every already-selected center (max of the running min "
        "squared L2, 6dp grid, vec_id tie-break) — the diversity "
        "sample that covers the corpus within the reported radius, "
        "2-approximation guaranteed. Scale shape: the min-distance "
        "state UPDATES INCREMENTALLY (one narrow pass against the "
        "single new center per round — never re-scanning all centers), "
        "each argmax is one TakeOrderedAndProject, zero shuffles "
        "total; per-round lazy localCheckpoints keep the plan linear. "
        "The oracle unrolls the same greedy recursion; radius_sq is "
        "each pick's covering distance at selection time (NULL for "
        "the seed), monotonically non-increasing."
    ),
)
def sample_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id", S.as_double("embedding").alias("e")
    ).withColumn("dxx", S.dot(F.col("e"), F.col("e")))
    seed = v.filter(F.col("vec_id") == CORESET_SEED).head()

    def dist_to(center_vec: list, center_dxx: float):
        c = F.array(*[F.lit(float(x)) for x in center_vec])
        return F.round(
            F.col("dxx") - 2 * S.dot(F.col("e"), c) + F.lit(float(center_dxx)),
            6,
        )

    cur = v.withColumn("mind", dist_to(seed["e"], seed["dxx"]))
    picks = [(0, int(seed["vec_id"]), None)]
    for r in range(1, CORESET_K):
        # lazy pin per round: the argmax head() and the next round's
        # update both read this frame; unpinned, lineage re-derives
        # every prior round per job (the Bellman-Ford rule)
        cur = cur.localCheckpoint(eager=False)
        top = cur.orderBy(F.desc("mind"), "vec_id").head()
        picks.append((r, int(top["vec_id"]), float(top["mind"])))
        if r < CORESET_K - 1:
            cur = cur.withColumn(
                "mind", F.least(F.col("mind"), dist_to(top["e"], top["dxx"]))
            )
    return emb.sparkSession.createDataFrame(
        picks, "selection_rank long, vec_id long, radius_sq double"
    ).orderBy("selection_rank")


IVF_TWIN_EPOCHS = 4  # vec_id % 4 — four micro-batches
IVF_TWIN_LISTS = 8   # frozen centroids = the 8 smallest vec_ids

_IVF_TWIN_SQL = f"""
WITH g AS (
  SELECT vec_id, vec_id % {IVF_TWIN_EPOCHS} AS epoch,
         list_transform(embedding,
           x -> CAST(ROUND(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS gv
  FROM embeddings
),
cent AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, gv AS cv
  FROM g WHERE vec_id < {IVF_TWIN_LISTS}
),
dist AS (
  SELECT g.vec_id, g.epoch, c.cell,
         CAST(list_sum(list_transform(range(1, 1 + len(g.gv)),
           i -> (g.gv[i]-c.cv[i])*(g.gv[i]-c.cv[i]))) AS BIGINT) AS d2
  FROM g CROSS JOIN cent c
),
best AS (
  SELECT vec_id, epoch, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
  FROM dist
)
SELECT CAST(epoch AS BIGINT) AS epoch, cell,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(vec_id) AS BIGINT) AS sum_vec_id
FROM best WHERE rn = 1
GROUP BY epoch, cell
ORDER BY epoch, cell
"""


@register(
    "stream_ivf_index_twin",
    oracle=_IVF_TWIN_SQL,
    description=(
        "[EXT] batch twin of the streaming IVF-index maintainer "
        "(streaming/ivf_index.StreamingIvfIndex): the corpus split "
        f"into {IVF_TWIN_EPOCHS} ingest epochs (vec_id % "
        f"{IVF_TWIN_EPOCHS}), every vector assigned to its nearest "
        "FROZEN centroid, per-(epoch, cell) partition counts + "
        "vec_id-sum — exactly the partition content the maintainer's "
        "dynamic-overwrite appends produce. Assignment runs on the "
        "exact int64 1e-6 component grid (grid_assign_cells) so the "
        "argmin is bit-identical cross-engine — the float "
        "_with_cells argmin is not ORACLE-portable, the same reason "
        "dedup_simhash pins an md5 twin; the production float path's "
        "stream == batch == probe identities are pinned by "
        "tests/test_streaming.py::test_ivf_index_stream_equals_batch "
        "and tests/test_text_dedup_similarity.py::"
        "test_ivf_index_probe_matches_inline. Centroids: the "
        f"{IVF_TWIN_LISTS} smallest vec_ids' vectors, frozen — the "
        "IVF serving contract (lists grow, quantizer retrains "
        "offline). One narrow assignment pass, one grouped count; "
        "nothing corpus x corpus (the n_lists fan-out is a flat "
        "JVM expression, not a join)."
    ),
)
def stream_ivf_index_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.filter(F.col("vec_id") < IVF_TWIN_LISTS)
        .select("vec_id", S.grid_vector("embedding").alias("gv"))
        .orderBy("vec_id")
        .collect()
    )
    centroids = [[int(x) for x in r["gv"]] for r in cent_rows]
    assigned = S.grid_assign_cells(
        emb.withColumn(
            "epoch", (F.col("vec_id") % IVF_TWIN_EPOCHS).cast("long")
        ),
        centroids,
    )
    return (
        assigned.groupBy("epoch", "cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("vec_id").cast("long").alias("sum_vec_id"),
        )
        .orderBy("epoch", "cell")
    )


IVFPQ_TWIN_BLOCKS = 4  # M sub-codebooks over the 64-dim grid vectors
IVFPQ_TWIN_CODES = 8   # codebook entries = residuals of vec_ids [8, 16)

_IVFPQ_TWIN_SQL = f"""
WITH g AS MATERIALIZED (
  SELECT vec_id, vec_id % {IVF_TWIN_EPOCHS} AS epoch,
         list_transform(embedding,
           x -> CAST(ROUND(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS gv
  FROM embeddings
),
cent AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, gv AS cv
  FROM g WHERE vec_id < {IVF_TWIN_LISTS}
),
dist AS (
  SELECT g.vec_id, g.epoch, g.gv, c.cell, c.cv,
         CAST(list_sum(list_transform(range(1, 1 + len(g.gv)),
           i -> (g.gv[i]-c.cv[i])*(g.gv[i]-c.cv[i]))) AS BIGINT) AS d2
  FROM g CROSS JOIN cent c
),
res AS MATERIALIZED (
  SELECT vec_id, epoch, cell,
         list_transform(range(1, 1 + len(gv)), i -> gv[i]-cv[i]) AS rv
  FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
    FROM dist
  ) WHERE rn = 1
),
cb AS (
  SELECT CAST(vec_id - {IVF_TWIN_LISTS} AS INT) AS code, rv AS cbv
  FROM res
  WHERE vec_id >= {IVF_TWIN_LISTS}
    AND vec_id < {IVF_TWIN_LISTS + IVFPQ_TWIN_CODES}
),
bd AS (
  SELECT r.vec_id, b.j, c.code,
         CAST(list_sum(list_transform(range(1, 17),
           i -> (r.rv[b.j*16 + i] - c.cbv[b.j*16 + i])
              * (r.rv[b.j*16 + i] - c.cbv[b.j*16 + i]))) AS BIGINT) AS d2
  FROM res r
  CROSS JOIN (SELECT CAST(unnest(range({IVFPQ_TWIN_BLOCKS})) AS INT) AS j) b
  CROSS JOIN cb c
),
vcodes AS (
  SELECT vec_id, CAST(SUM(code) AS BIGINT) AS code_sum
  FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, code) AS rn
    FROM bd
  ) WHERE rn = 1
  GROUP BY vec_id
)
SELECT CAST(r.epoch AS BIGINT) AS epoch, r.cell,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(r.vec_id) AS BIGINT) AS sum_vec_id,
       CAST(SUM(k.code_sum) AS BIGINT) AS sum_codes
FROM res r JOIN vcodes k USING (vec_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register(
    "stream_ivfpq_index_twin",
    oracle=_IVFPQ_TWIN_SQL,
    description=(
        "[EXT] batch twin of the streaming IVFADC-index maintainer "
        "(streaming/ivf_index.StreamingIvfpqIndex, r12 verdict "
        f"next-round #3): the corpus split into {IVF_TWIN_EPOCHS} "
        "ingest epochs, every vector coarse-assigned to its nearest "
        "FROZEN centroid AND PQ-encoded against FROZEN sub-codebooks "
        f"({IVFPQ_TWIN_BLOCKS} blocks x {IVFPQ_TWIN_CODES} codes = "
        "residuals of a fixed sample), reduced to per-(epoch, cell) "
        "counts + vec_id-sum + code-sum — exactly the codes-table "
        "content the maintainer's dynamic-overwrite appends produce. "
        "Assignment and encoding run on the exact int64 1e-6 grid "
        "(grid_pq_codes) so argmins are bit-identical cross-engine; "
        "the production float path's stream == batch == probe == "
        "compaction identities are pinned by tests/test_streaming.py"
        "::test_ivfpq_index_stream_equals_batch. One narrow encode "
        "pass (flat JVM expressions, no Python), one grouped count; "
        "the M x n_codes fan-out is expression-level, never a join."
    ),
)
def stream_ivfpq_index_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    rows = (
        emb.filter(F.col("vec_id") < IVF_TWIN_LISTS + IVFPQ_TWIN_CODES)
        .select("vec_id", S.grid_vector("embedding").alias("gv"))
        .orderBy("vec_id")
        .collect()
    )
    centroids = [[int(x) for x in r["gv"]] for r in rows[:IVF_TWIN_LISTS]]
    sub = len(centroids[0]) // IVFPQ_TWIN_BLOCKS
    # codebook entry c of block j = block j of sample vector (8+c)'s
    # residual against ITS nearest frozen centroid — Python ints, the
    # same exact arithmetic both engines run on the corpus side
    codebooks: list[list[list[int]]] = [[] for _ in range(IVFPQ_TWIN_BLOCKS)]
    for r in rows[IVF_TWIN_LISTS:]:
        gv = [int(x) for x in r["gv"]]
        d2 = [sum((a - b) * (a - b) for a, b in zip(gv, c)) for c in centroids]
        cell = d2.index(min(d2))
        rv = [a - b for a, b in zip(gv, centroids[cell])]
        for j in range(IVFPQ_TWIN_BLOCKS):
            codebooks[j].append(rv[j * sub : (j + 1) * sub])
    assigned = S.grid_pq_codes(
        emb.withColumn(
            "epoch", (F.col("vec_id") % IVF_TWIN_EPOCHS).cast("long")
        ),
        centroids,
        codebooks,
    )
    return (
        assigned.groupBy("epoch", "cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("vec_id").cast("long").alias("sum_vec_id"),
            F.sum(
                F.aggregate(
                    "codes", F.lit(0).cast("long"), lambda a, x: a + x
                )
            ).cast("long").alias("sum_codes"),
        )
        .orderBy("epoch", "cell")
    )


# floor under the measured deterministic recalls of the filter-aware
# IVFADC path at n_lists=8, nprobe=2, label>=5 (~50% selective =>
# nprobe_eff 4): 0.8 / 0.6 / 0.4 at sf0.001 / 0.01 / 0.1; the naive
# post-filter baseline measures 0.4 / 0.4 / 0.3 on the same index.
IVFPQ_FILTERED_RECALL_FLOOR = (3, 10)  # num/den — no float truncation


@register(
    "sim_ivfpq_filtered_recall_floor",
    oracle="""
SELECT 'aware_ge_postfilter' AS check_name, TRUE AS ok
UNION ALL
SELECT 'ivfpq_filtered_recall' AS check_name, TRUE AS ok
ORDER BY check_name
""",
    description=(
        "[EXT] driver-visible floor for FILTER-AWARE IVFADC probing "
        "(ivfpq_filtered_topk — r11's selectivity-scaled probing "
        "composed with the PQ shortlist tier, the operation a 100 TB "
        "vector store runs for filtered search over quantized codes): "
        "recall vs the exact filtered brute force must clear 3/10 "
        "(measured 0.4-0.8 across sf0.001-0.1), AND must dominate the "
        "naive post-filter baseline (run unfiltered IVFADC, filter "
        "the k hits) — dominance is STRUCTURAL as of r13 (ADVICE r12 "
        "#1): the operator unions the eligible members of the "
        "unfiltered nprobe shortlist into the rerank pool, so the "
        "pool contains everything the baseline can return, and exact "
        "rerank over a superset pool keeps every true-top-k pool "
        "member (fewer than k candidates can outrank it). Both "
        "checks run inside Spark; the oracle pins the booleans, so a "
        "regression hash-mismatches."
    ),
)
def sim_ivfpq_filtered_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qv = _query_vector(spark, sf_dir)
    pred = F.col("label") >= FILTER_LABEL
    # lazy pin: the exact filtered top-k feeds both recall joins
    exact_ids = (
        S.cosine_topk(emb.filter(pred), qv, k=TOP_K)
        .select("vec_id")
        .localCheckpoint(eager=False)
    )
    aware_hits = (
        S.ivfpq_filtered_topk(emb, qv, pred, k=TOP_K, n_lists=8, nprobe=2)
        .select("vec_id")
        .join(exact_ids, "vec_id")
        .agg(F.count(F.lit(1)).alias("n_aware"))
    )
    # naive post-filter baseline on the SAME index configuration
    post_hits = (
        S.ivfpq_topk(emb, qv, k=TOP_K, n_lists=8, nprobe=2)
        .join(emb.select("vec_id", "label"), "vec_id")
        .filter(pred)
        .select("vec_id")
        .join(exact_ids, "vec_id")
        .agg(F.count(F.lit(1)).alias("n_post"))
    )
    num, den = IVFPQ_FILTERED_RECALL_FLOOR
    need = (TOP_K * num + den - 1) // den  # exact ceil, no float path
    return (
        aware_hits.crossJoin(post_hits)
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("aware_ge_postfilter").alias("check_name"),
                        (F.col("n_aware") >= F.col("n_post")).alias("ok"),
                    ),
                    F.struct(
                        F.lit("ivfpq_filtered_recall").alias("check_name"),
                        (F.col("n_aware") >= need).alias("ok"),
                    ),
                )
            ).alias("r")
        )
        .select("r.check_name", "r.ok")
        .orderBy("check_name")
    )


_IVF_SKEW_SQL = f"""
WITH g AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(ROUND(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS gv
  FROM embeddings
),
cent AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, gv AS cv
  FROM g WHERE vec_id < {IVF_TWIN_LISTS}
),
dist AS (
  SELECT g.vec_id, c.cell,
         CAST(list_sum(list_transform(range(1, 1 + len(g.gv)),
           i -> (g.gv[i]-c.cv[i])*(g.gv[i]-c.cv[i]))) AS BIGINT) AS d2
  FROM g CROSS JOIN cent c
),
best AS (
  SELECT vec_id, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
  FROM dist
),
sizes AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n FROM best WHERE rn = 1 GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(n) AS BIGINT) AS n_vecs,
       CAST(MIN(n) AS BIGINT) AS min_cell,
       CAST(MAX(n) AS BIGINT) AS max_cell,
       CAST(MAX(n) * COUNT(*) AS DOUBLE) / SUM(n) AS imbalance
FROM sizes
"""


@register(
    "sim_ivf_list_skew",
    oracle=_IVF_SKEW_SQL,
    description=(
        "[EXT] IVF inverted-list skew audit: per-cell population of "
        "the grid-assignment index (same portable centroids/argmin as "
        "stream_ivf_index_twin) reduced to the serving-health summary "
        "— cell count, min/max list size, and the imbalance factor "
        "max_cell / mean_cell that bounds worst-case probe latency "
        "(a probe reads nprobe lists; one hot list = the tail "
        "latency). The metric a vector-store operator watches to "
        "decide when to retrain centroids — the ops counterpart of "
        "the recall floors. Exact int64 sizes, ONE division for the "
        "factor (max * n_cells / total, mirrored term-for-term); one "
        "narrow assignment pass + a cell-sized aggregate."
    ),
)
def sim_ivf_list_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.filter(F.col("vec_id") < IVF_TWIN_LISTS)
        .select("vec_id", S.grid_vector("embedding").alias("gv"))
        .orderBy("vec_id")
        .collect()
    )
    centroids = [[int(x) for x in r["gv"]] for r in cent_rows]
    sizes = (
        S.grid_assign_cells(emb, centroids)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return sizes.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("n").cast("long").alias("n_vecs"),
        F.min("n").cast("long").alias("min_cell"),
        F.max("n").cast("long").alias("max_cell"),
        (
            (F.max("n") * F.count(F.lit(1))).cast("double") / F.sum("n")
        ).alias("imbalance"),
    )


_QUANT_DRIFT_SQL = f"""
WITH g AS (
  SELECT vec_id, vec_id % {IVF_TWIN_EPOCHS} AS epoch,
         list_transform(embedding,
           x -> CAST(ROUND(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS gv
  FROM embeddings
),
cent AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, gv AS cv
  FROM g WHERE vec_id < {IVF_TWIN_LISTS}
),
dist AS (
  SELECT g.vec_id, g.epoch, c.cell,
         CAST(list_sum(list_transform(range(1, 1 + len(g.gv)),
           i -> (g.gv[i]-c.cv[i])*(g.gv[i]-c.cv[i]))) AS BIGINT) AS d2
  FROM g CROSS JOIN cent c
),
best AS (
  SELECT vec_id, epoch, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
  FROM dist
)
SELECT CAST(epoch AS BIGINT) AS epoch,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CAST(d2 AS HUGEINT)) AS DOUBLE) AS sum_d2,
       CAST(SUM(CAST(d2 AS HUGEINT)) AS DOUBLE) / COUNT(*) AS mean_d2
FROM best WHERE rn = 1
GROUP BY epoch
ORDER BY epoch
"""


@register(
    "sim_quantizer_drift",
    oracle=_QUANT_DRIFT_SQL,
    description=(
        "[EXT] quantizer-drift monitor — the WHEN-TO-RETRAIN signal "
        "(r13; the ops counterpart of sim_ivf_list_skew's hot-list "
        "view, feeding retrain_ivfpq_index's schedule): per ingest "
        "epoch, the coarse quantization error of the FROZEN quantizer "
        "— count + exact sum/mean of squared grid distance to the "
        "assigned centroid. Later epochs drifting to a higher mean "
        "than the epoch the quantizer was trained on = the data has "
        "moved; probe quality decays before recall floors catch it. "
        "Exact arithmetic end to end: int64 per-vector distances "
        "(grid_distance_array — the same fold grid_assign_cells "
        "argmins), per-epoch sums through decimal(38,0)/HUGEINT (a "
        "64-dim grid d2 reaches ~2.6e16, corpus sums overflow int64 — "
        "the sim_corpus_diversity discipline), ONE double conversion "
        "+ ONE division mirrored term-for-term. One narrow assignment "
        "pass, an epoch-sized aggregate; nothing corpus x corpus."
    ),
)
def sim_quantizer_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.filter(F.col("vec_id") < IVF_TWIN_LISTS)
        .select("vec_id", S.grid_vector("embedding").alias("gv"))
        .orderBy("vec_id")
        .collect()
    )
    centroids = [[int(x) for x in r["gv"]] for r in cent_rows]
    d2 = F.array_min(S.grid_distance_array(centroids, "embedding"))
    per_vec = emb.select(
        (F.col("vec_id") % IVF_TWIN_EPOCHS).cast("long").alias("epoch"),
        d2.alias("d2"),
    )
    sum_d2 = F.sum(F.col("d2").cast("decimal(38,0)")).cast("double")
    return (
        per_vec.groupBy("epoch")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            sum_d2.alias("sum_d2"),
            (sum_d2 / F.count(F.lit(1))).alias("mean_d2"),
        )
        .orderBy("epoch")
    )


BATCH_Q = 4  # serving-batch size for the batched-KNN surface


@register(
    "sim_batch_topk",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {BATCH_Q}
),
scored AS (
  SELECT q.query_id, e.vec_id,
         ROUND(
           list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv)
           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cosine_sim
  FROM embeddings e CROSS JOIN q
),
r AS (
  SELECT query_id, vec_id, cosine_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine_sim DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, CAST(rn AS BIGINT) AS rank, vec_id, cosine_sim
FROM r WHERE rn <= {TOP_K}
ORDER BY query_id, rank
""",
    description=(
        "[EXT] batched exact KNN (r13 — the bulk-serving surface next "
        f"to the single-vector sim_cosine_topk): {BATCH_Q} query "
        "vectors scored against the corpus in ONE pass via a "
        "broadcast of the query batch, per-query top-10 by the same "
        "round-6 cosine + id tie-break contract, compiled to "
        "WindowGroupLimit (each partition keeps <= k rows PER QUERY "
        "before the shuffle — the exchange carries O(parts*Q*k), "
        "never the corpus). For a large Q, serve each query from the "
        "stored IVF/IVFADC index instead; this is the exact baseline "
        "those probes are graded against, in batch form."
    ),
)
def sim_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < BATCH_Q).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return S.cosine_topk_batch(emb, queries, k=TOP_K)


_SILHOUETTE_SQL = f"""
WITH g AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(ROUND(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS gv
  FROM embeddings
),
cent AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, gv AS cv
  FROM g WHERE vec_id < {IVF_TWIN_LISTS}
),
dist AS (
  SELECT g.vec_id, c.cell,
         CAST(list_sum(list_transform(range(1, 1 + len(g.gv)),
           i -> (g.gv[i]-c.cv[i])*(g.gv[i]-c.cv[i]))) AS BIGINT) AS d2
  FROM g CROSS JOIN cent c
),
r1 AS (
  SELECT vec_id, cell, d2,
         row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
  FROM dist
),
ab AS (
  SELECT a.vec_id, a.cell, a.d2 AS a2, b.d2 AS b2
  FROM r1 a JOIN r1 b ON a.vec_id = b.vec_id AND a.rn = 1 AND b.rn = 2
),
s AS (
  SELECT vec_id, cell,
         CASE WHEN b2 = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(ROUND(
                (sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE)))
                / sqrt(CAST(b2 AS DOUBLE)) * 1000000000) AS BIGINT)
         END AS sg
  FROM ab
)
SELECT cell,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(sg) AS BIGINT) AS sil_grid_sum,
       CAST(SUM(sg) AS DOUBLE) / 1000000000 / COUNT(*) AS mean_silhouette
FROM s GROUP BY cell ORDER BY cell
"""


@register(
    "sim_silhouette_cells",
    oracle=_SILHOUETTE_SQL,
    description=(
        "[EXT] per-cell SIMPLIFIED SILHOUETTE of the frozen coarse "
        "quantizer (Hruschka et al.'s centroid-based variant — O(n*k), "
        "the form that exists at corpus scale where the classic "
        "O(n^2) pairwise silhouette does not): per vector, a = "
        "distance to its assigned centroid, b = distance to the "
        "nearest OTHER centroid (second-smallest, ties by value), "
        "s = (b - a)/b in [0, 1]; per-cell mean says which inverted "
        "lists are well-separated and which bleed into a neighbor — "
        "completing the quantizer ops triptych with sim_ivf_list_skew "
        "(balance) and sim_quantizer_drift (freshness). Cross-engine "
        "exact: int64 grid distances (grid_distance_array), sqrt is "
        "correctly rounded IEEE on identical int64 inputs, the ratio "
        "mirrored term-for-term and snapped to the 1e-9 grid before "
        "the int64 sum (the ml_woe_iv convention), ONE division pair "
        "for the mean. One narrow pass + a k-sized aggregate."
    ),
)
def sim_silhouette_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.filter(F.col("vec_id") < IVF_TWIN_LISTS)
        .select("vec_id", S.grid_vector("embedding").alias("gv"))
        .orderBy("vec_id")
        .collect()
    )
    centroids = [[int(x) for x in r["gv"]] for r in cent_rows]
    x = emb.withColumn(
        "__d", S.grid_distance_array(centroids, "embedding")
    ).select(
        "vec_id",
        (F.array_position(F.col("__d"), F.array_min("__d")) - 1)
        .cast("int")
        .alias("cell"),
        F.array_min("__d").alias("a2"),
        F.array_sort("__d")[1].alias("b2"),
    )
    a_d = F.sqrt(F.col("a2").cast("double"))
    b_d = F.sqrt(F.col("b2").cast("double"))
    sg = F.when(F.col("b2") == 0, F.lit(0).cast("long")).otherwise(
        F.round((b_d - a_d) / b_d * F.lit(1_000_000_000.0)).cast("long")
    )
    return (
        x.select("cell", sg.alias("sg"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum("sg").cast("long").alias("sil_grid_sum"),
            (
                F.sum("sg").cast("double")
                / F.lit(1_000_000_000.0)
                / F.count(F.lit(1))
            ).alias("mean_silhouette"),
        )
        .orderBy("cell")
    )


DIV_GRID = 1_000_000  # 1e-6 unit-vector component grid


@register(
    "sim_corpus_diversity",
    oracle=f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
nrm AS (
  SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nv FROM e
),
u AS (
  SELECT vec_id,
         list_transform(v, x -> CAST(ROUND(x / nv * {DIV_GRID}) AS BIGINT)) AS g
  FROM nrm
),
gd AS (
  SELECT vec_id, i AS pos, g[i] AS gx
  FROM u, unnest(generate_series(1, len(g))) AS t(i)
),
sums AS (SELECT pos, CAST(SUM(gx) AS BIGINT) AS s FROM gd GROUP BY 1),
q AS (SELECT SUM(CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS ssq FROM sums),
m AS (
  SELECT CAST(SUM(gx * gx) AS BIGINT) AS sn,
         CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n
  FROM gd
)
SELECT m.n,
       m.sn AS sum_norm_sq,
       CAST(q.ssq AS DOUBLE) AS sum_vec_sq,
       (CAST(q.ssq AS DOUBLE) - CAST(m.sn AS DOUBLE))
         / (CAST(m.n AS DOUBLE) * (m.n - 1)) / {DIV_GRID * DIV_GRID}.0
         AS mean_pairwise_cosine
FROM q CROSS JOIN m
""",
    description=(
        "[EXT] corpus semantic-diversity audit WITHOUT the quadratic "
        "pair join: mean pairwise cosine over unit vectors via the "
        "sum identity sum_(i!=j) cos(i,j) = ||sum_i u_i||^2 - "
        "sum_i ||u_i||^2 — one narrow pass + a dim-sized aggregate "
        "where the naive form is n^2 d (25M pairs already at sf0.1). "
        "The collapse-detection signal curation watches next to "
        "near-dup rates: diversity falling toward 1 means the corpus "
        "is semantically collapsing even when no pair crosses a dedup "
        "threshold. Exactness: unit vectors snap to the 1e-6 "
        "component grid (identical IEEE divide/round both engines), "
        "per-dimension sums are exact int64, their squares accumulate "
        "in decimal(38)/HUGEINT, and the final mean is a mirrored "
        "division chain over those exact integers."
    ),
)
def sim_corpus_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DecimalType

    emb = load_table(spark, sf_dir, "embeddings")
    v = S.as_double("embedding")
    nv = S.l2_norm(v)
    g = F.transform(v, lambda x: F.round(x / nv * DIV_GRID).cast("long"))
    gd = (
        emb.select("vec_id", F.posexplode(g).alias("pos", "gx"))
        # feeds the per-dimension sums AND the norm/count aggregate
        .localCheckpoint(eager=False)
    )
    q = (
        gd.groupBy("pos")
        .agg(F.sum("gx").cast("long").alias("s"))
        .agg(
            F.sum(
                F.col("s").cast(DecimalType(38, 0))
                * F.col("s").cast(DecimalType(38, 0))
            ).alias("ssq")
        )
    )
    m = gd.agg(
        F.sum(F.col("gx") * F.col("gx")).cast("long").alias("sn"),
        F.countDistinct("vec_id").cast("long").alias("n"),
    )
    return q.crossJoin(m).select(
        "n",
        F.col("sn").alias("sum_norm_sq"),
        F.col("ssq").cast("double").alias("sum_vec_sq"),
        (
            (F.col("ssq").cast("double") - F.col("sn").cast("double"))
            / (F.col("n").cast("double") * (F.col("n") - 1))
            / F.lit(float(DIV_GRID) * float(DIV_GRID))
        ).alias("mean_pairwise_cosine"),
    )


SQ8_SHORTLIST = 100
SQ8_RECALL_FLOOR = 8  # of TOP_K=10; measured 10/10 at all three SFs

_SQ8_SQL = f"""
WITH g AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(ROUND(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS gv
  FROM embeddings
),
dims AS (
  SELECT i, MIN(v) AS mn, MAX(v) - MIN(v) AS rg
  FROM (SELECT unnest(gv) AS v, generate_subscripts(gv, 1) AS i FROM g)
  GROUP BY i
),
b AS (
  SELECT list(mn ORDER BY i) AS mns, list(rg ORDER BY i) AS rgs FROM dims
),
q AS (SELECT gv AS qv FROM g WHERE vec_id = {QUERY_VEC_ID}),
approx AS (
  SELECT g.vec_id,
         CAST(list_sum(list_transform(range(1, 1 + len(g.gv)),
           i -> (CASE WHEN b.rgs[i] = 0 THEN b.mns[i]
                      ELSE b.mns[i]
                           + ((g.gv[i] - b.mns[i]) * 255 // b.rgs[i])
                             * b.rgs[i] // 255 END) * q.qv[i]))
           AS BIGINT) AS sq8_score
  FROM g, b, q
),
short AS (
  SELECT vec_id,
         row_number() OVER (ORDER BY sq8_score DESC, vec_id) AS rn
  FROM approx
),
qf AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
  WHERE vec_id = {QUERY_VEC_ID}
),
rerank AS (
  SELECT e.vec_id,
         ROUND(
           list_dot_product(CAST(e.embedding AS DOUBLE[]), qf.qv)
           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(qf.qv, qf.qv))), 6) AS cosine_sim
  FROM embeddings e JOIN short s ON s.vec_id = e.vec_id, qf
  WHERE s.rn <= {SQ8_SHORTLIST}
),
sq8_top AS (
  SELECT vec_id FROM rerank ORDER BY cosine_sim DESC, vec_id LIMIT {TOP_K}
),
exact_top AS (
  SELECT vec_id FROM (
    SELECT e.vec_id,
           ROUND(
             list_dot_product(CAST(e.embedding AS DOUBLE[]), qf.qv)
             / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(qf.qv, qf.qv))), 6) AS cosine_sim
    FROM embeddings e, qf
  ) ORDER BY cosine_sim DESC, vec_id LIMIT {TOP_K}
)
SELECT 'sq8' AS method,
       CAST({SQ8_SHORTLIST} AS BIGINT) AS shortlist_size,
       CAST({TOP_K} AS BIGINT) AS k,
       CAST((SELECT COUNT(*) FROM sq8_top JOIN exact_top USING (vec_id))
            AS BIGINT) AS recall_num,
       (SELECT COUNT(*) FROM sq8_top JOIN exact_top USING (vec_id))
         >= {SQ8_RECALL_FLOOR} AS recall_ok
"""


@register(
    "sim_sq8_recall_floor",
    oracle=_SQ8_SQL,
    description=(
        "[EXT] int8 scalar quantization (SQ8) ANN rung, ORACLE-EXACT: "
        "per-dim (min, range) bounds on the 1e-6 grid compress the "
        "corpus 8x; candidates rank by the ASYMMETRIC reconstructed "
        "inner product (corpus quantized, query full-precision — the "
        "FAISS SQ trick) in pure integer `div` arithmetic, so the "
        f"shortlist, the rerank, and recall_num are all bit-identical "
        "cross-engine — unlike the float IVF path, whose floors are "
        "measured, this one's recall is itself hash-pinned. Top-"
        f"{SQ8_SHORTLIST} shortlist by TakeOrdered, exact 6dp-grid "
        "cosine rerank on the shortlist only, recall vs the exact "
        f"top-{TOP_K} (measured {TOP_K}/{TOP_K} at all three SFs; "
        f"floor {SQ8_RECALL_FLOOR} allows boundary ties to move). "
        "100 TB story: SQ8 is the cheapest memory tier — bounds are "
        "one flat 2d-aggregate pass, scoring is one narrow scan, and "
        "the same codes drop into the IVF cells as a PQ alternative "
        "(FAISS IndexIVFScalarQuantizer shape)."
    ),
)
def sim_sq8_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    mins, ranges = S.sq8_bounds(emb)
    qgrid = [
        int(x)
        for x in emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(S.grid_vector("embedding").alias("g"))
        .head()["g"]
    ]
    short = (
        S.sq8_scores(emb, mins, ranges, qgrid)
        .orderBy(F.desc("sq8_score"), F.asc("vec_id"))
        .limit(SQ8_SHORTLIST)
        .select("vec_id")
    )
    qvec = _query_vector(spark, sf_dir)
    sq8_top = S.cosine_topk(
        emb.join(F.broadcast(short), "vec_id"), qvec, k=TOP_K
    ).select("vec_id")
    exact_top = S.cosine_topk(emb, qvec, k=TOP_K).select("vec_id")
    hits = sq8_top.join(exact_top, "vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("recall_num")
    )
    return hits.select(
        F.lit("sq8").alias("method"),
        F.lit(SQ8_SHORTLIST).cast("long").alias("shortlist_size"),
        F.lit(TOP_K).cast("long").alias("k"),
        "recall_num",
        (F.col("recall_num") >= SQ8_RECALL_FLOOR).alias("recall_ok"),
    )


IVFSQ_LISTS = 8
IVFSQ_NPROBE = 3
IVFSQ_RECALL_FLOOR = 6  # of TOP_K=10; measured 10/10 at all three SFs

_IVFSQ_SQL = f"""
WITH g AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(ROUND(CAST(x AS DOUBLE)*1000000) AS BIGINT)) AS gv
  FROM embeddings
),
cent AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, gv AS cv
  FROM g WHERE vec_id < {IVFSQ_LISTS}
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT g.vec_id, c.cell,
           row_number() OVER (PARTITION BY g.vec_id ORDER BY
             CAST(list_sum(list_transform(range(1, 1 + len(g.gv)),
               i -> (g.gv[i]-c.cv[i])*(g.gv[i]-c.cv[i]))) AS BIGINT),
             c.cell) AS rn
    FROM g CROSS JOIN cent c
  ) WHERE rn = 1
),
q AS (SELECT gv AS qv FROM g WHERE vec_id = {QUERY_VEC_ID}),
probed AS (
  SELECT cell FROM (
    SELECT c.cell,
           row_number() OVER (ORDER BY
             CAST(list_sum(list_transform(range(1, 1 + len(q.qv)),
               i -> (q.qv[i]-c.cv[i])*(q.qv[i]-c.cv[i]))) AS BIGINT),
             c.cell) AS rn
    FROM cent c, q
  ) WHERE rn <= {IVFSQ_NPROBE}
),
dims AS (
  SELECT i, MIN(v) AS mn, MAX(v) - MIN(v) AS rg
  FROM (SELECT unnest(gv) AS v, generate_subscripts(gv, 1) AS i FROM g)
  GROUP BY i
),
b AS (
  SELECT list(mn ORDER BY i) AS mns, list(rg ORDER BY i) AS rgs FROM dims
),
cand AS (
  SELECT g.vec_id, g.gv FROM g
  JOIN assign a ON a.vec_id = g.vec_id
  JOIN probed p ON p.cell = a.cell
),
approx AS (
  SELECT cand.vec_id,
         CAST(list_sum(list_transform(range(1, 1 + len(cand.gv)),
           i -> (CASE WHEN b.rgs[i] = 0 THEN b.mns[i]
                      ELSE b.mns[i]
                           + ((cand.gv[i] - b.mns[i]) * 255 // b.rgs[i])
                             * b.rgs[i] // 255 END) * q.qv[i]))
           AS BIGINT) AS sq8_score
  FROM cand, b, q
),
short AS (
  SELECT vec_id,
         row_number() OVER (ORDER BY sq8_score DESC, vec_id) AS rn
  FROM approx
),
qf AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
  WHERE vec_id = {QUERY_VEC_ID}
),
rerank AS (
  SELECT e.vec_id,
         ROUND(
           list_dot_product(CAST(e.embedding AS DOUBLE[]), qf.qv)
           / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[])))
              * sqrt(list_dot_product(qf.qv, qf.qv))), 6) AS cosine_sim
  FROM embeddings e JOIN short s ON s.vec_id = e.vec_id, qf
  WHERE s.rn <= {SQ8_SHORTLIST}
),
ivfsq_top AS (
  SELECT vec_id FROM rerank ORDER BY cosine_sim DESC, vec_id LIMIT {TOP_K}
),
exact_top AS (
  SELECT vec_id FROM (
    SELECT e.vec_id,
           ROUND(
             list_dot_product(CAST(e.embedding AS DOUBLE[]), qf.qv)
             / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                      CAST(e.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(qf.qv, qf.qv))), 6) AS cosine_sim
    FROM embeddings e, qf
  ) ORDER BY cosine_sim DESC, vec_id LIMIT {TOP_K}
)
SELECT 'ivf_sq8' AS method,
       CAST({IVFSQ_NPROBE} AS BIGINT) AS nprobe,
       CAST({TOP_K} AS BIGINT) AS k,
       CAST((SELECT COUNT(*) FROM ivfsq_top JOIN exact_top USING (vec_id))
            AS BIGINT) AS recall_num,
       (SELECT COUNT(*) FROM ivfsq_top JOIN exact_top USING (vec_id))
         >= {IVFSQ_RECALL_FLOOR} AS recall_ok
"""


@register(
    "sim_ivfsq_recall_floor",
    oracle=_IVFSQ_SQL,
    description=(
        "[EXT] IVF + SQ8 composed ANN (the FAISS "
        "IndexIVFScalarQuantizer shape), ORACLE-EXACT end to end: "
        "vectors assign to frozen grid centroids (the "
        "stream_ivf_index_twin quantizer contract), the query probes "
        f"nprobe={IVFSQ_NPROBE} of {IVFSQ_LISTS} cells, candidates "
        "in probed cells rank by the asymmetric SQ8 reconstructed "
        "inner product (pure integer div), exact 6dp cosine rerank "
        f"on the top-{SQ8_SHORTLIST} shortlist — assignment, probe "
        "set, shortlist, and recall_num are ALL bit-identical "
        "cross-engine, so unlike the float-IVF floors this "
        f"composition's recall is itself hash-pinned (measured {TOP_K}"
        f"/{TOP_K} at all three SFs; floor {IVFSQ_RECALL_FLOOR} allows "
        "probe-set misses on other data). "
        "100 TB story: the cell filter prunes the scan to nprobe "
        "inverted lists BEFORE any scoring (with the stored index, "
        "partition-pruned directory reads), and SQ8 cuts candidate "
        "bytes 8x on top — probe cost ~ nprobe/n_lists * corpus/8."
    ),
)
def sim_ivfsq_recall_floor(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cent_rows = (
        emb.filter(F.col("vec_id") < IVFSQ_LISTS)
        .select("vec_id", S.grid_vector("embedding").alias("gv"))
        .orderBy("vec_id")
        .collect()
    )
    centroids = [[int(x) for x in r["gv"]] for r in cent_rows]
    qgrid = [
        int(x)
        for x in emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(S.grid_vector("embedding").alias("g"))
        .head()["g"]
    ]
    # probe set: exact int64 distances, ties to the lowest cell —
    # identical to the oracle's (d2, cell) ordering
    d2 = sorted(
        (sum((q - c) ** 2 for q, c in zip(qgrid, cv)), cell)
        for cell, cv in enumerate(centroids)
    )
    probed = [cell for _, cell in d2[:IVFSQ_NPROBE]]
    cand = S.grid_assign_cells(emb, centroids).filter(
        F.col("cell").isin(probed)
    )
    mins, ranges = S.sq8_bounds(emb)
    short = (
        S.sq8_scores(cand, mins, ranges, qgrid)
        .orderBy(F.desc("sq8_score"), F.asc("vec_id"))
        .limit(SQ8_SHORTLIST)
        .select("vec_id")
    )
    qvec = _query_vector(spark, sf_dir)
    ivfsq_top = S.cosine_topk(
        emb.join(F.broadcast(short), "vec_id"), qvec, k=TOP_K
    ).select("vec_id")
    exact_top = S.cosine_topk(emb, qvec, k=TOP_K).select("vec_id")
    hits = ivfsq_top.join(exact_top, "vec_id").agg(
        F.count(F.lit(1)).cast("long").alias("recall_num")
    )
    return hits.select(
        F.lit("ivf_sq8").alias("method"),
        F.lit(IVFSQ_NPROBE).cast("long").alias("nprobe"),
        F.lit(TOP_K).cast("long").alias("k"),
        "recall_num",
        (F.col("recall_num") >= IVFSQ_RECALL_FLOOR).alias("recall_ok"),
    )

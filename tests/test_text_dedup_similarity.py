"""Property tests for the non-oracle LLM-pipeline operators: SimHash
locality, ANN recall vs the brute-force baseline, Jaccard behavior on
constructed near-duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cust_sagemaker_feature_store_spark.catalog import load_table
from cust_sagemaker_feature_store_spark.operators import dedup as D
from cust_sagemaker_feature_store_spark.operators import similarity as S
from cust_sagemaker_feature_store_spark.operators import text as T


def hamming(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def test_simhash_locality(spark):
    base = "spark window join filter group sort merge hash scan table " * 5
    near = base.replace("merge hash", "merge fast hash", 1)  # tiny edit
    far = "completely different vocabulary about cooking pasta sauce " * 5
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["simhash"] for r in D.simhash64(df).collect()}
    assert hamming(got[0], got[1]) < hamming(got[0], got[2])
    assert hamming(got[0], got[1]) <= 8  # near-identical -> close fingerprints


def test_simhash_candidates_find_near_dups(spark):
    base = "spark window join filter group sort merge hash scan table " * 5
    near = base.replace("merge hash", "merge fast hash", 1)
    far = "completely different vocabulary about cooking pasta sauce " * 5
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, far)], "doc_id long, text string"
    )
    fps = {r["doc_id"]: r["simhash"] for r in D.simhash64(df).collect()}
    h01 = hamming(fps[0], fps[1])
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in D.simhash_candidates(df, max_hamming=8).collect()
    }
    # chunk-join completeness is guaranteed only at hamming <= 3
    # (pigeonhole over 4 chunks); above that, candidates surface iff a
    # 16-bit chunk happens to agree — assert exactly that contract
    shares_chunk = any(
        ((fps[0] >> (16 * ci)) & 0xFFFF) == ((fps[1] >> (16 * ci)) & 0xFFFF)
        for ci in range(4)
    )
    if h01 <= 3 or shares_chunk:
        assert got.get((0, 1)) == h01
    # the far document never pairs with anything
    assert all(2 not in pair for pair in got)


def test_lsh_dup_pairs_recall_vs_exact(spark, sf_dir):
    # exact global pair set at cosine>=0.45 (O(n^2), fine at test SF);
    # thresholds chosen to be NON-vacuous on the driver data (max
    # pairwise cosine there is ~0.48)
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", S.as_double("embedding").alias("e"))
    a, b = v.alias("a"), v.alias("b")
    cos = S.dot(F.col("a.e"), F.col("b.e")) / (
        S.l2_norm(F.col("a.e")) * S.l2_norm(F.col("b.e"))
    )
    exact = {
        (r["va"], r["vb"])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("va"),
            F.col("b.vec_id").alias("vb"),
            cos.alias("c"),
        )
        .filter(F.col("c") >= 0.45)
        .collect()
    }
    assert exact  # the driver data must exercise the test
    rows = S.srp_dup_pairs(emb, min_cosine=0.4).collect()
    got = {(r["vec_a"], r["vec_b"]) for r in rows}
    # every >=0.45 pair must be recalled at the looser 0.4 threshold,
    # and nothing below 0.4 may appear (exact re-check on candidates)
    assert len(exact & got) / len(exact) >= 0.9
    assert all(r["cosine_sim"] >= 0.4 for r in rows)


def test_srp_banded_path_recall_and_pruning(spark):
    # Planted near-dups at a REAL near-dup threshold (0.8): the banded
    # SRP path must engage (no all-pairs fallback), recall every
    # planted pair, and generate fewer candidates than all pairs.
    import random

    rng = random.Random(7)
    dim = 32
    base = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(60)]
    rows = []
    for i, v in enumerate(base):
        rows.append((2 * i, v))
        # near-dup: tiny perturbation -> cosine ~0.99
        rows.append((2 * i + 1, [x + rng.gauss(0, 0.02) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert S.srp_recall_estimate(0.85) >= 0.95  # banded path engages
    got = {
        (r["vec_a"], r["vec_b"])
        for r in S.srp_dup_pairs(emb, min_cosine=0.8).collect()
    }
    planted = {(2 * i, 2 * i + 1) for i in range(60)}
    assert len(planted & got) / len(planted) >= 0.95
    # every reported pair actually clears the exact threshold
    v = emb.select("vec_id", S.as_double("embedding").alias("e"))
    a, b = v.alias("a"), v.alias("b")
    cos = S.dot(F.col("a.e"), F.col("b.e")) / (
        S.l2_norm(F.col("a.e")) * S.l2_norm(F.col("b.e"))
    )
    exact = {
        (r["va"], r["vb"])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb"), cos.alias("c"))
        .filter(F.col("c") >= 0.8)
        .collect()
    }
    assert got <= exact


def test_jaccard_pairs_find_near_dups(spark):
    base = "a b c d e f g h i j k l m n o p q r s t"
    near = base + " extra"
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, "x y z entirely different words here")],
        "doc_id long, text string",
    )
    pairs = D.jaccard_pairs(df, threshold=0.4).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [(0, 1)]
    assert pairs[0]["jaccard"] > 0.8


def test_minhash_candidates_cover_jaccard_pairs(spark, sf_dir):
    # LSH candidates must include every high-jaccard pair found exactly
    # (2 bands x 2 rows at j>=0.9 -> P[miss] = (1-j^2)^2 < 4%; the
    # driver data's near-dups are byte-prefix copies with j ~ 1)
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in D.jaccard_pairs(docs, threshold=0.9).collect()
    }
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_candidates(docs).collect()
    }
    missed = exact - cand
    assert len(missed) <= max(1, len(exact) // 10), f"LSH missed {missed}"


def test_ann_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    exact = [r["vec_id"] for r in S.cosine_topk(emb, q, k=10).collect()]
    lsh = [r["vec_id"] for r in S.lsh_ann_topk(emb, q, k=10).collect()]
    ivf = [r["vec_id"] for r in S.ivf_topk(emb, q, k=10, n_lists=8, nprobe=4).collect()]
    assert len(set(exact) & set(lsh)) >= 5  # recall@10 >= 0.5
    # bucket-hash centroid seeding (uniform corpus spread) lifted IVF
    # recall from the >=3 the first-n-by-id seeds managed (measured 8/10
    # at sf0.001, 6/10 at sf0.01 with n_lists=8, nprobe=4)
    assert len(set(exact) & set(ivf)) >= 5  # recall@10 >= 0.5
    assert exact[0] == 0  # the query vector itself is its own 1-NN


def test_exact_pairs_tiled_equals_bruteforce(spark):
    # The distributed tiled GEMM (no driver collect, r2 review) must
    # return EXACTLY the brute-force pair set — forced across many
    # tiles with a tiny block size so diagonal masking, off-diagonal
    # orientation, and cross-tile completeness are all exercised.
    import random

    rng = random.Random(11)
    dim = 16
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(120)
    ]
    # plant a few exact-direction dups so the threshold is non-vacuous
    for i in range(5):
        rows.append((1000 + i, [2.0 * x for x in rows[i][1]]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    unit = S._unit(emb, "vec_id", "embedding")
    tiled = S._exact_pairs(unit, 0.5, "vec_id", block_rows=16).collect()
    got = {(r["vec_a"], r["vec_b"]): r["cosine_sim"] for r in tiled}

    v = emb.select("vec_id", S.as_double("embedding").alias("e"))
    a, b = v.alias("a"), v.alias("b")
    cos = S.dot(F.col("a.e"), F.col("b.e")) / (
        S.l2_norm(F.col("a.e")) * S.l2_norm(F.col("b.e"))
    )
    exact = {
        (r["va"], r["vb"])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("va"),
            F.col("b.vec_id").alias("vb"),
            F.round(cos, 6).alias("c"),
        )
        .filter(F.col("c") >= 0.5)
        .collect()
    }
    assert set(got) == exact
    assert {(i, 1000 + i) for i in range(5)} <= set(got)
    # every pair reported exactly once (no double emission off-diagonal)
    assert len(tiled) == len(got)


def test_ivf_scales_to_many_lists(spark, sf_dir):
    # r2 review: cell assignment must be flat in n_lists (broadcast
    # centroid matmul), not an O(n_lists)-deep when() chain. 256 lists
    # over the test corpus must plan exactly one Python stage and still
    # find the query vector itself.
    emb = load_table(spark, sf_dir, "embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    res = S.ivf_topk(emb, q, k=10, n_lists=256, nprobe=32)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    rows = res.collect()
    assert rows and rows[0]["vec_id"] == 0  # own cell always probed first


def test_ivf_filtered_topk_semantics(spark, sf_dir):
    # Filter-aware IVF probing: (1) a selective predicate widens the
    # probe to ALL cells, making the result EQUAL the exact filtered
    # brute force; (2) recall always dominates the naive post-filter
    # baseline (theorem: superset candidate pool, same probe order);
    # (3) an unsatisfiable predicate raises instead of returning an
    # empty frame recall can't be defined against.
    import pytest

    emb = load_table(spark, sf_dir, "embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]

    # (1) label == 5 is ~10% selective -> nprobe_eff = ceil(2/0.1) = 20,
    # capped at n_lists=8 = probe everything = exact
    sel = F.col("label") == 5
    exact_sel = [
        (r["vec_id"], r["cosine_sim"])
        for r in S.cosine_topk(emb.filter(sel), q, k=10).collect()
    ]
    aware_sel = [
        (r["vec_id"], r["cosine_sim"])
        for r in S.ivf_filtered_topk(emb, q, sel, k=10, n_lists=8, nprobe=2).collect()
    ]
    assert aware_sel == exact_sel

    # (2) dominance at the registered half-selective configuration
    pred = F.col("label") >= 5
    exact = {r["vec_id"] for r in S.cosine_topk(emb.filter(pred), q, k=10).collect()}
    aware = {
        r["vec_id"]
        for r in S.ivf_filtered_topk(emb, q, pred, k=10, n_lists=8, nprobe=2).collect()
    }
    keep = {r["vec_id"] for r in emb.filter(pred).select("vec_id").collect()}
    post = {
        r["vec_id"]
        for r in S.ivf_topk(emb, q, k=10, n_lists=8, nprobe=2).collect()
    } & keep
    assert len(aware & exact) >= len(post & exact)

    # (3) empty predicate fails loudly
    with pytest.raises(ValueError, match="no rows"):
        S.ivf_filtered_topk(emb, q, F.col("label") == -99, k=10)


def test_cosine_self_similarity(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(20)
    sims = emb.select(
        F.round(
            S.cosine(S.as_double("embedding"), S.as_double("embedding")), 6
        ).alias("s")
    ).collect()
    assert all(abs(r["s"] - 1.0) < 1e-6 for r in sims)


def test_dup_clusters_components(spark):
    # A 5-node path (diameter 4 — forces multiple propagation rounds),
    # a separate triangle, and an isolated pair: every node must label
    # with its component's min id, and no cross-component bleed.
    from cust_sagemaker_feature_store_spark.operators.dedup import dup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),      # path
         (10, 11), (11, 12), (10, 12),        # triangle
         (20, 21)],                            # pair
        "doc_a long, doc_b long",
    )
    got = {r["node"]: r["label"] for r in dup_clusters(pairs, "doc_a", "doc_b").collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


def test_gram_matrix_exact_across_partitions(spark):
    """Partial-sum correctness: the distributed Gram matrix over a
    3-partition frame must equal the single-machine integer product of
    the same micro-scaled vectors, exactly."""
    import numpy as np

    vecs = [
        (1, [0.1, -0.25, 3.5]),
        (2, [1.0, 0.5, -0.125]),
        (3, [2.25, 0.0, 0.75]),
        (4, [-0.3, 1.5, 0.2]),
        (5, [0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>"
    ).repartition(3)
    got = {
        (r["i"], r["j"]): r["gram_scaled"]
        for r in S.gram_matrix(df).collect()
    }
    M = np.array(
        [np.round(np.asarray(v, dtype=np.float64) * 1e6) for _, v in vecs],
        dtype=np.int64,
    )
    G = M.T @ M
    want = {
        (i, j): float(G[i, j]) for i in range(3) for j in range(3) if i <= j
    }
    assert got == want


def test_max_gram_count_and_dup_frac(spark):
    from cust_sagemaker_feature_store_spark.operators import text as T

    df = spark.createDataFrame(
        [
            (1, ["a b", "c d", "a b", "a b", "x y"]),  # "a b" x3, 2 repeats
            (2, ["q r"]),                              # single gram
            (3, ["", ""]),                             # degenerate empties
        ],
        "doc_id long, g array<string>",
    )
    got = {
        r["doc_id"]: (r["m"], r["d"])
        for r in df.select(
            "doc_id",
            T.max_gram_count(F.col("g")).alias("m"),
            T.dup_gram_frac(F.col("g")).alias("d"),
        ).collect()
    }
    assert got[1][0] == 3 and abs(got[1][1] - (1 - 3 / 5)) < 1e-12
    assert got[2] == (1, 0.0)
    assert got[3][0] == 2 and abs(got[3][1] - 0.5) < 1e-12


def _uf_labels(edges):
    """Union-find ground truth: node -> component-minimum id."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_dup_clusters_long_path_converges_sublinearly(spark):
    """Diameter-199 chain — the skewed-graph case round-3 flagged: the
    old hash-min loop needed diameter rounds (raising past max_iter=30);
    star-contraction must converge within its O(log² n) bound. A large
    star (hot root, 300 leaves) and a shuffled-id chain ride along to
    cover skew and the id-order-adversarial layout."""
    from cust_sagemaker_feature_store_spark.operators.dedup import dup_clusters

    path = [(i, i + 1) for i in range(1, 200)]                    # 1..200 chain
    star = [(1000, 1000 + i) for i in range(1, 301)]              # hot hub
    # chain whose ids zig-zag so min-propagation can't shortcut by order
    zig = [(5000 + (i * 7919) % 400, 5000 + ((i + 1) * 7919) % 400)
           for i in range(399)]
    pairs = spark.createDataFrame(
        path + star + zig, "doc_a long, doc_b long"
    )
    got = {
        r["node"]: r["label"]
        for r in dup_clusters(pairs, "doc_a", "doc_b", max_iter=12).collect()
    }
    assert got == _uf_labels(path + star + zig)


def test_dup_clusters_random_graphs_match_union_find(spark):
    """Randomized components check vs a union-find oracle (fixed seeds,
    three densities: sparse forest, ~phase-transition, dense)."""
    import random

    from cust_sagemaker_feature_store_spark.operators.dedup import dup_clusters

    for seed, n, m in ((1, 120, 60), (2, 120, 130), (3, 80, 400)):
        rng = random.Random(seed)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
        got = {
            r["node"]: r["label"]
            for r in dup_clusters(pairs, "doc_a", "doc_b").collect()
        }
        assert got == _uf_labels(edges), f"seed={seed}"


def test_contamination_overlap_external_benchmark(spark):
    """Operator form: benchmark is a separate frame (not a corpus
    slice); corpus docs sharing a word 4-gram with it are flagged with
    exact shared-gram / bench-doc counts, and all strategies agree."""
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "the quick brown fox sleeps all day long"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(900, "watch the quick brown fox jumps high")],
        "doc_id long, text string",
    )
    expect = {1: (2, 1), 3: (1, 1)}  # doc2 shares no 4-gram
    results = {}
    for strategy in ("broadcast", "shuffle", "auto"):
        got = {
            r["doc_id"]: (r["n_shared_grams"], r["n_bench_docs"])
            for r in T.contamination_overlap(
                corpus, bench, strategy=strategy
            ).collect()
        }
        results[strategy] = got
        assert got == expect, strategy
    assert results["broadcast"] == results["shuffle"] == results["auto"]


def test_contamination_overlap_column_remap_and_self_exclusion(spark):
    """bench_id_col/bench_text_col remap a differently-shaped benchmark;
    exclude_same_id drops the trivial self-match when the benchmark is
    carved from the corpus."""
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "zeta eta theta iota kappa")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("b1", "alpha beta gamma delta epsilon")],
        "bid string, body string",
    )
    got = T.contamination_overlap(
        corpus, bench, bench_id_col="bid", bench_text_col="body"
    ).collect()
    assert {r["doc_id"] for r in got} == {1}

    # held-out-slice fixture shape: benchmark == subset of corpus
    hits = T.contamination_overlap(
        corpus, corpus.filter(F.col("doc_id") == 1), exclude_same_id=True
    ).collect()
    assert hits == []  # only the self-match existed, and it's excluded


def test_ivfpq_recall_and_index_compactness(spark, sf_dir):
    """IVFADC: recall@10 >= the registered floor vs brute force, the
    shortlist stage consumes only (id, cell, codes) — M small ints per
    vector — and every code is a valid codebook index."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    exact = {r["vec_id"] for r in S.cosine_topk(emb, q, k=10).collect()}
    pq = [r["vec_id"] for r in S.ivfpq_topk(emb, q, k=10).collect()]
    assert len(exact & set(pq)) >= 6  # floor 0.6, measured 0.8/0.8/0.7
    assert pq[0] == 0  # the query vector itself survives both tiers

    cent = S._seed_vectors(emb, 8, "vec_id", "embedding")
    seeds = S._seed_vectors(emb, 64, "vec_id", "embedding", salt=S.PQ_SEED_SALT)
    c_sq = (cent * cent).sum(axis=1)
    resid = seeds - cent[(c_sq[None, :] - 2.0 * (seeds @ cent.T)).argmin(axis=1)]
    books = np.stack([resid[:, j * 4 : (j + 1) * 4] for j in range(16)])
    index = S.pq_encode(emb, cent, books).collect()
    assert len(index) == emb.count()
    for r in index[:20]:
        assert 0 <= r["__cell"] < len(cent)
        assert len(r["__codes"]) == 16
        assert all(0 <= c < len(seeds) for c in r["__codes"])


def test_ivfpq_rejects_nontiling_blocks(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = [0.0] * 64
    with pytest.raises(ValueError, match="must divide"):
        S.ivfpq_topk(emb, q, m_subvectors=7)


def test_pca_top_component_matches_eigh(spark):
    """The power-iteration + RQI eigenpair must agree with numpy's
    dense symmetric eigensolver on the same Gram matrix: eigenvalue to
    1e-9 relative, eigenvector to |cos| > 1 - 1e-9 (sign-free)."""
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = [
        (i, [float(x) for x in rng.normal(size=8)]) for i in range(40)
    ]
    df = spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>"
    ).repartition(4)
    v, lam, G = S.pca_top_component(df)
    w, V = np.linalg.eigh(G)
    assert abs(lam - w[-1]) <= 1e-9 * abs(w[-1])
    assert abs(float(v @ V[:, -1])) > 1 - 1e-9
    assert np.linalg.norm(G @ v - lam * v) <= 1e-9 * lam


def test_pca_top_component_zero_matrix(spark):
    """All-zero vectors: the zero-matrix guard returns without dividing
    by zero and reports eigenvalue 0."""
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    v, lam, G = S.pca_top_component(df)
    assert lam == 0.0
    assert (G == 0).all()


def test_incremental_dedup_status_planted(spark):
    """Planted batch outcomes: an exact copy of a corpus doc ->
    exact_dup, a one-word edit -> near_dup (shares a band bucket but
    not the content hash), and unrelated text -> new."""
    base = "spark window join filter group sort merge hash scan table " * 5
    near = "alpha " + base  # shares both band buckets with base
    corpus = spark.createDataFrame(
        [(0, base), (2, "some other corpus doc about storage engines " * 5)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, base), (11, near), (12, "totally unrelated cooking pasta " * 5)],
        "doc_id long, text string",
    )
    hashes = corpus.select(
        F.md5(F.lower(F.trim(F.col("text")))).alias("h")
    ).distinct()
    bands = D.minhash_bands(corpus).select("band", "bucket")
    got = {
        r["doc_id"]: r["status"]
        for r in D.incremental_dedup_status(batch, hashes, bands).collect()
    }
    assert got == {10: "exact_dup", 11: "near_dup", 12: "new"}


def test_pca_rqi_guard_on_near_degenerate_spectrum(spark):
    """ADVICE r5 regression test: with lambda2/lambda1 ~ 1 the power
    iterate is still a mixture and unguarded RQI can lock onto the
    SECOND eigenpair. The dominance guard must keep the returned
    Rayleigh quotient within the top-eigenvalue neighborhood — never
    below the pre-polish power-iteration quotient, and at least as
    large as lambda2 (a return of exactly lambda2's eigenpair with
    lambda < lambda2 + gap would betray the regression)."""
    import numpy as np
    from pyspark.sql import Row

    from cust_sagemaker_feature_store_spark.operators import similarity as S

    # two nearly-equal dominant directions: vectors along e1 and e2
    # with norms making eigenvalues ~1.000 and ~0.999 of each other
    rows = []
    vid = 0
    for _ in range(50):
        rows.append(Row(vec_id=vid, embedding=[1.0, 0.0, 0.01, 0.0])); vid += 1
        rows.append(Row(vec_id=vid, embedding=[0.0, 0.9999, 0.0, 0.01])); vid += 1
    emb = spark.createDataFrame(rows)
    v, lam, G = S.pca_top_component(emb, iters=30)  # few iters: mixture basin
    evals = np.linalg.eigvalsh(G)
    top, second = float(evals[-1]), float(evals[-2])
    # guard contract: monotone improvement — the result cannot be the
    # second eigenpair when the power quotient already exceeded it
    assert lam >= second - 1e-6 * top
    assert lam <= top * (1 + 1e-9)
    # and the residual still certifies an (approximate) eigenpair
    resid = float(np.linalg.norm(G @ v - lam * v))
    assert resid <= 1e-3 * top


def test_pq_codebook_training_reduces_distortion_deterministically(spark):
    """train_pq_codebooks must (a) never worsen the quantization
    objective it minimizes (Lloyd monotonicity, to micro-grid slack),
    (b) strictly help on a clusterable corpus, and (c) be
    bit-reproducible run-to-run (the property the driver hash relies
    on)."""
    import random

    import numpy as np
    from pyspark.sql import Row

    from cust_sagemaker_feature_store_spark.operators import similarity as S

    rng = random.Random(7)
    centers = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(4)]
    rows = []
    for vid in range(300):
        c = centers[vid % 4]
        rows.append(
            Row(
                vec_id=vid,
                embedding=[x + rng.gauss(0, 0.3) for x in c],
            )
        )
    emb = spark.createDataFrame(rows)
    cent = S._seed_vectors(emb, 4, "vec_id", "embedding")
    seeded = S._seed_codebooks(emb, cent, m_subvectors=4, n_codes=8)
    b1 = S.train_pq_codebooks(emb, cent, m_subvectors=4, n_codes=8, iterations=1)
    b2 = S.train_pq_codebooks(emb, cent, m_subvectors=4, n_codes=8, iterations=2)
    d0 = S.pq_distortion(emb, cent, seeded)
    d1 = S.pq_distortion(emb, cent, b1)
    d2 = S.pq_distortion(emb, cent, b2)
    slack = max(1, d0 // 10**9)
    assert d1 <= d0 + slack and d2 <= d1 + slack, (d0, d1, d2)
    assert d2 < d0, "training must strictly reduce distortion here"
    b2_again = S.train_pq_codebooks(
        emb, cent, m_subvectors=4, n_codes=8, iterations=2
    )
    assert np.array_equal(b2, b2_again), "training must be deterministic"


def test_pq_distortion_raises_on_int64_wrap_risk(spark):
    """ADVICE r7 #3: pq_distortion applies the same per-batch
    batch_rows * max(scaled) < 2^63 wrap guard as train_pq_codebooks —
    astronomically large residuals must raise OverflowError, not wrap
    silently into a corrupt distortion total."""
    import pytest
    from pyspark.sql import Row

    from cust_sagemaker_feature_store_spark.operators import similarity as S

    big = 4.0e6  # err ~ (4e6)^2 * 16 dims ~ 2.6e14 -> scaled ~ 2.6e20 > 2^63/2
    rows = [Row(vec_id=i, embedding=[big] * 16) for i in range(4)]
    emb = spark.createDataFrame(rows).coalesce(1)
    cent = [[0.0] * 16]
    books = [[[0.0] * 4 for _ in range(2)] for _ in range(4)]  # m=4, sub=4
    with pytest.raises(Exception, match="wrap int64"):
        S.pq_distortion(emb, cent, books)


def test_doc_line_segments_chunking_edges(spark):
    """Fixed-width token 'lines': exact non-overlapping 3-token chunks,
    a short final chunk, and whole-doc lines for docs shorter than the
    width — plus whitespace normalization (multi-space collapses)."""
    from pyspark.sql import Row

    from cust_sagemaker_feature_store_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d e f g"),  # 3+3+1
            Row(doc_id=2, text="  x   y  "),      # 1 short line, messy ws
            Row(doc_id=3, text="solo"),           # < width -> whole doc
        ]
    )
    got = {
        (r["doc_id"], r["line_no"]): r["line"]
        for r in T.doc_line_segments(docs, line_tokens=3).collect()
    }
    assert got == {
        (1, 0): "a b c",
        (1, 1): "d e f",
        (1, 2): "g",
        (2, 0): "x y",
        (3, 0): "solo",
    }


def test_strip_boilerplate_hand_corpus(spark):
    """End-to-end boilerplate strip on a planted corpus: the header
    line shared by 3 docs is removed at min_df=3, unique lines survive
    in original order, and a doc that is ALL boilerplate retains ''."""
    from pyspark.sql import Row

    from cust_sagemaker_feature_store_spark.operators import text as T

    hdr = "all rights reserved"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{hdr} alpha beta gamma"),
            Row(doc_id=2, text=f"delta eps zeta {hdr}"),
            Row(doc_id=3, text=hdr),
            Row(doc_id=4, text="eta theta iota"),
        ]
    )
    dfreq = {
        r["line"]: (r["df"], r["n_total"])
        for r in T.line_document_frequency(
            T.doc_line_segments(docs, line_tokens=3)
        ).collect()
    }
    assert dfreq[hdr] == (3, 3)
    out = {
        r["doc_id"]: r
        for r in T.strip_boilerplate(docs, line_tokens=3, min_df=3).collect()
    }
    assert (out[1]["n_lines"], out[1]["n_boiler_lines"]) == (2, 1)
    assert out[1]["retained_chars"] == len("alpha beta gamma")
    assert out[2]["n_boiler_lines"] == 1
    assert out[3]["retained_chars"] == 0 and out[3]["removed_frac"] == 1.0
    assert out[4]["n_boiler_lines"] == 0 and out[4]["removed_frac"] == 0.0
    # retained text keeps ORIGINAL line order: md5 of the exact rejoin
    import hashlib

    assert out[1]["retained_md5"] == hashlib.md5(
        b"alpha beta gamma"
    ).hexdigest()


def test_threshold_sweep_monotone_and_planted_clusters(spark):
    """Planted corpus with two near-dup pairs at different similarity
    levels: the sweep's removable-doc counts are monotone non-
    increasing in the threshold (nested edge sets), and each row's
    cluster arithmetic is consistent (n_removable = n_docs -
    n_clusters)."""
    from pyspark.sql import Row

    from cust_sagemaker_feature_store_spark.operators import dedup as D

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text=base),                       # exact dup of 1
            Row(doc_id=3, text=base + " extra tail words"), # high-jaccard dup
            Row(doc_id=4, text="completely different content here truly"),
        ]
    )
    rows = {
        r["threshold"]: r
        for r in D.threshold_sweep(
            docs, thresholds=(0.5, 0.9, 1.0)
        ).collect()
    }
    assert set(rows) == {0.5, 0.9, 1.0}
    for r in rows.values():
        assert r["n_removable"] == r["n_docs"] - r["n_clusters"]
    removable = [rows[t]["n_removable"] for t in (0.5, 0.9, 1.0)]
    assert removable == sorted(removable, reverse=True)
    # at 1.0 only the exact dup survives; at 0.5 the tail variant joins
    assert rows[1.0]["n_removable"] == 1
    assert rows[0.5]["n_removable"] >= rows[1.0]["n_removable"]
    assert rows[0.5]["n_pairs"] >= rows[0.9]["n_pairs"] >= rows[1.0]["n_pairs"]


def test_kmeans_parallel_seed_deterministic_and_finds_clusters(spark):
    """k-means|| seeding: identical output under different
    partitionings (the exact-φ / hash-coin design claim), and on a
    planted 3-blob corpus the 3 seeds land one per blob — the case
    where a uniform sample routinely doubles up."""
    import numpy as np
    from pyspark.sql import Row

    from cust_sagemaker_feature_store_spark.operators import similarity as S

    rng = np.random.default_rng(7)
    rows = []
    centers = np.array([[10.0, 0.0], [-10.0, 8.0], [0.0, -12.0]])
    for i in range(120):
        c = centers[i % 3]
        v = c + rng.normal(0, 0.3, 2)
        rows.append(Row(vec_id=i, embedding=[float(v[0]), float(v[1])]))
    emb = spark.createDataFrame(rows)
    s1 = S.kmeans_parallel_seed(emb, n_seeds=3, rounds=3)
    s2 = S.kmeans_parallel_seed(emb.repartition(7), n_seeds=3, rounds=3)
    assert np.array_equal(s1, s2), "partitioning must not change seeds"
    # one seed per blob: nearest planted center of each seed is distinct
    owner = {
        int(np.linalg.norm(centers - s, axis=1).argmin()) for s in s1
    }
    assert owner == {0, 1, 2}


def test_lloyd_refine_matrix_monotone_and_keeps_empty_clusters(spark):
    """lloyd_refine_matrix: coarse distortion never increases round
    over round (exact-grid Lloyd), and a centroid that owns no vector
    keeps its previous position (constant k for the IVF list count)."""
    import numpy as np
    from pyspark.sql import Row

    from cust_sagemaker_feature_store_spark.operators import similarity as S

    rng = np.random.default_rng(11)
    rows = [
        Row(vec_id=i, embedding=[float(x) for x in rng.normal(0, 1, 4)])
        for i in range(60)
    ]
    emb = spark.createDataFrame(rows)
    init = np.vstack(
        [rng.normal(0, 1, (3, 4)), np.full((1, 4), 1e6)]  # far-away dead seed
    )
    d_prev = S.coarse_distortion(emb, init)
    cent = init
    for _ in range(2):
        cent = S.lloyd_refine_matrix(emb, cent, iterations=1)
        d_now = S.coarse_distortion(emb, cent)
        assert d_now <= d_prev + max(1, d_prev // 10**9)
        d_prev = d_now
    assert (cent[3] == 1e6).all(), "empty cluster must keep its centroid"
    assert cent.shape == init.shape


def test_coarse_distortion_matches_numpy(spark):
    """coarse_distortion equals the grid-floored numpy reference
    regardless of partitioning."""
    import numpy as np
    from pyspark.sql import Row

    from cust_sagemaker_feature_store_spark.operators import similarity as S

    rng = np.random.default_rng(3)
    X = rng.normal(0, 1, (40, 5))
    C = rng.normal(0, 1, (4, 5))
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in X[i]]) for i in range(40)]
    )
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2).min(axis=1)
    want = int(np.floor(np.maximum(d2, 0.0) * S.COARSE_SCALE).sum())
    assert S.coarse_distortion(emb, C) == want
    assert S.coarse_distortion(emb.repartition(9), C) == want


def test_repeated_span_coverage_interval_union(spark):
    """Planted repeats: two docs share one 4-token phrase at different
    alignments, one doc repeats a phrase internally with OVERLAPPING
    windows (the union must not double count), one doc is clean."""
    from pyspark.sql import Row

    from cust_sagemaker_feature_store_spark.operators import text as T

    phrase = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [
            # doc 1: phrase at tokens 0-3
            Row(doc_id=1, text=f"{phrase} uno dos tres cuatro"),
            # doc 2: phrase at tokens 2-5 (different alignment)
            Row(doc_id=2, text=f"x y {phrase} z w"),
            # doc 3: 'a b a b a b' — gram 'a b a b' occurs at starts 0
            # AND 2 (in-doc repeat); the overlapping intervals [0,3]
            # and [2,5] union to all 6 tokens without double counting
            Row(doc_id=3, text="a b a b a b"),
            # doc 4: all-unique tokens, nothing repeated
            Row(doc_id=4, text="q r s t u v w"),
        ]
    )
    out = {
        r["doc_id"]: r
        for r in T.repeated_span_coverage(docs, gram_tokens=4).collect()
    }
    assert out[1]["n_repeated_windows"] == 1
    assert out[1]["covered_tokens"] == 4 and out[1]["n_tokens"] == 8
    assert out[2]["covered_tokens"] == 4
    # doc 3: repeated windows at starts 0 and 2 -> merged island [0,5]
    assert out[3]["n_repeated_windows"] == 2
    assert out[3]["covered_tokens"] == 6 and out[3]["covered_frac"] == 1.0
    assert out[4]["n_repeated_windows"] == 0
    assert out[4]["covered_tokens"] == 0 and out[4]["covered_frac"] == 0.0


def test_shared_span_pairs_finds_planted_clone(spark):
    """Two docs share a verbatim 10-token run (at different offsets);
    a third is unrelated. The report must name exactly that pair with
    longest_shared_tokens == 10, found via the diagonal islands — and
    a within-doc repeat must NOT pair a doc with itself."""
    import pytest
    from pyspark.sql import Row

    from cust_sagemaker_feature_store_spark.operators.text import (
        shared_span_pairs,
    )

    run = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="intro words here " + run + " tail one"),
            Row(doc_id=2, text=run + " completely different ending text"),
            Row(doc_id=3, text="unrelated filler " * 8),
            # within-doc repetition only: must not appear in the report
            Row(doc_id=4, text="rep one two three four rep one two three four"),
        ]
    )
    rows = shared_span_pairs(docs, gram_tokens=4, max_occ=16).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in rows}
    assert set(pairs) == {(1, 2)}
    r = pairs[(1, 2)]
    assert r["longest_shared_tokens"] == 10
    # a 10-token run has 7 aligned 4-gram windows
    assert r["n_shared_windows"] == 7

    with pytest.raises(ValueError, match="max_occ"):
        shared_span_pairs(docs, max_occ=1)
    with pytest.raises(ValueError, match="gram_tokens"):
        shared_span_pairs(docs, gram_tokens=0)


def test_allpairs_prefix_join_lossless_vs_naive(spark, sf_dir):
    # The prefix filter is a LOSSLESS pruning: the result must equal
    # the naive all-pairs shingle join at the same (k, threshold) —
    # same pairs, same intersection counts, same jaccard values.
    docs = load_table(spark, sf_dir, "documents")
    for k, t in [(5, 0.5), (3, 0.4), (4, 0.8)]:
        naive = {
            (r["doc_a"], r["doc_b"]): (r["inter"], round(r["jaccard"], 9))
            for r in D.jaccard_pairs(docs, k=k, threshold=t).collect()
        }
        pref = {
            (r["doc_a"], r["doc_b"]): (r["inter"], round(r["jaccard"], 9))
            for r in D.allpairs_prefix_join(docs, k=k, threshold=t).collect()
        }
        assert pref == naive, f"prefix join diverged at k={k}, t={t}"


def test_allpairs_prefix_join_planted_and_pruning(spark):
    # Planted near-dups must surface; the prefix relation must be
    # strictly smaller than the full shingle relation (the pruning
    # actually happened), and disjoint docs must produce no pair.
    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " zz"
    other = " ".join(f"v{i}" for i in range(40))
    df = spark.createDataFrame(
        [(0, base), (1, near), (2, other), (3, base + " tail_token")],
        "doc_id long, text string",
    )
    out = D.allpairs_prefix_join(df, k=5, threshold=0.5)
    pairs = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    assert (0, 1) in pairs and (0, 3) in pairs
    assert all(2 not in p for p in pairs)
    # pruning: prefix posting lists shorter than full posting lists
    sets_ = D.shingle_sets(df, k=5)
    n_full = sets_.count()
    # reproduce the operator's prefix relation size via its internals
    from pyspark.sql import Window as W

    sizes = sets_.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    dfreq = sets_.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    ranked = (
        sets_.join(dfreq, "shingle")
        .withColumn(
            "pos",
            F.row_number().over(W.partitionBy("doc_id").orderBy("df", "shingle")),
        )
        .join(sizes, "doc_id")
    )
    n_prefix = ranked.filter(
        F.col("pos") <= F.col("n") - F.ceil(F.col("n") * F.lit(0.5)).cast("long") + 1
    ).count()
    assert n_prefix < n_full


def test_allpairs_prefix_join_exact_threshold_boundary(spark):
    # ADVICE r10 #1 regression: t=0.55 is not a binary double, so the
    # former double bounds (F.ceil(n*t) and b.n >= a.n*t) overshot by
    # an ULP at exact boundaries. |A|=20, |B|=11 with B subset of A has
    # Jaccard exactly 11/20 = 0.55 and MUST be returned; the old
    # length filter required 11 >= 20*0.55 = 11.000000000000002 and
    # silently dropped it. Also checks the (num, den) tuple form and
    # the argument guards.
    import pytest

    a_text = " ".join(f"t{i:02d}" for i in range(20))
    b_text = " ".join(f"t{i:02d}" for i in range(11))
    df = spark.createDataFrame(
        [(0, a_text), (1, b_text)], "doc_id long, text string"
    )
    for thr in (0.55, (11, 20)):
        rows = D.allpairs_prefix_join(df, k=1, threshold=thr).collect()
        assert len(rows) == 1, f"boundary pair missed at threshold={thr}"
        assert rows[0]["inter"] == 11 and rows[0]["jaccard"] == 11 / 20
    # the naive join agrees (double division of 11/20 rounds to the
    # same double as the literal 0.55)
    naive = D.jaccard_pairs(df, k=1, threshold=0.55).collect()
    assert len(naive) == 1
    with pytest.raises(ValueError, match="threshold"):
        D.allpairs_prefix_join(df, threshold=0.0)
    with pytest.raises(ValueError, match="denominator"):
        D.allpairs_prefix_join(df, threshold=(1, 10_000_019))
    # r11 advice: a computed float whose repr round-trips to a huge
    # denominator (1/3) must NOT raise — it floors onto a 1e-6 grid
    # (333333/1000000 < 1/3), so the subset pair at Jaccard 11/20 is
    # still returned (floor never loses wanted pairs).
    rows = D.allpairs_prefix_join(df, k=1, threshold=1 / 3).collect()
    assert len(rows) == 1 and rows[0]["inter"] == 11


def test_curriculum_pack_monotone_quality(spark, sf_dir):
    # curriculum invariant: quality (max_gates) never increases as
    # bin_id advances — easy/clean bins come first
    from cust_sagemaker_feature_store_spark.queries import REGISTRY

    rows = sorted(
        REGISTRY["pipeline_curriculum_pack"].fn(spark, sf_dir).collect(),
        key=lambda r: r["bin_id"],
    )
    assert rows, "no bins"
    # the stream is sorted by gates desc, so an earlier bin's WORST doc
    # is still at least as good as a later bin's BEST doc
    for a, b in zip(rows, rows[1:]):
        assert a["min_gates"] >= b["max_gates"], (a, b)
    # every bin is non-empty and every document lands in exactly one bin
    assert all(r["n_docs"] >= 1 for r in rows)
    assert sum(r["n_docs"] for r in rows) == 500


def test_ivf_index_probe_matches_inline(spark, sf_dir, tmp_path):
    """probe-from-stored-index must be BIT-identical to the inline
    ivf_topk on the same corpus (same centroids, same assignment,
    same scoring tail) — the build-once/probe-many contract of
    build_ivf_index. Also pins the filtered probe against the
    equivalent inline filter placement."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    root = str(tmp_path / "ivf_idx")
    S.build_ivf_index(emb, root, n_lists=8)
    for nprobe in (2, 4):
        inline = S.ivf_topk(emb, q, k=10, n_lists=8, nprobe=nprobe).collect()
        stored = S.probe_ivf_index(spark, root, q, k=10, nprobe=nprobe).collect()
        assert [tuple(r) for r in stored] == [tuple(r) for r in inline]
    # stored centroids round-trip bit-for-bit
    import numpy as np

    cent = S._seed_vectors(emb, 8, "vec_id", "embedding")
    assert np.array_equal(S.load_ivf_centroids(spark, root), cent)
    # filtered probe: same candidates as filtering the assigned frame
    # inline before the scoring tail
    pred = F.col("label") >= 5
    assigned = S._with_cells(emb, cent, "embedding")
    cells = S._probe_order(cent, q)[:4]
    want = S._score_cosine_topk(
        assigned.filter(F.col("__cell").isin(cells)).filter(pred),
        q, 10, "vec_id", "embedding",
    ).collect()
    got = S.probe_ivf_index(
        spark, root, q, k=10, nprobe=4, predicate=pred
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_ivfpq_index_probe_matches_inline(spark, sf_dir, tmp_path):
    """IVFADC probe from stored centroids/codebooks/codes/vectors must
    be bit-identical to the inline ivfpq_topk for the same trained
    state (float64 and int32 parquet round-trips are exact)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    root = str(tmp_path / "ivfpq_idx")
    cent, books = S.build_ivfpq_index(emb, root, n_lists=8)
    inline = S.ivfpq_topk(
        emb, q, k=10, n_lists=8, cent=cent, codebooks=books
    ).collect()
    stored = S.probe_ivfpq_index(spark, root, q, k=10).collect()
    assert [tuple(r) for r in stored] == [tuple(r) for r in inline]
    # filtered stored probe == inline filtered path for the same
    # quantizer and predicate (metadata columns travel with the stored
    # vectors; both paths measure the same selectivity, widen to the
    # same nprobe_eff, and build the same structural-dominance pool)
    pred = F.col("label") >= 5
    want = S.ivfpq_filtered_topk(
        emb, q, pred, k=10, n_lists=8, nprobe=2,
        cent=cent, codebooks=books,
    ).collect()
    got = S.probe_ivfpq_index(
        spark, root, q, k=10, nprobe=2, predicate=pred
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert all(
        r["label"] >= 5
        for r in emb.join(
            spark.createDataFrame(
                [(x["vec_id"],) for x in got], "vec_id long"
            ),
            "vec_id",
        ).collect()
    )


def test_grid_assign_cells_exact_ties(spark):
    """grid_assign_cells must argmin on exact int64 grid distances
    with ties to the LOWEST cell id — including a planted exact tie
    a float path could break either way."""
    df = spark.createDataFrame(
        [
            (0, [0.0, 0.0]),       # equidistant from cells 1 and 2 -> 1
            (1, [1.0, 0.0]),       # exactly cell 1
            (2, [-0.9999995, 0.0]) # rounds to -1.0 grid -> cell 2
        ],
        "vec_id long, embedding array<float>",
    )
    cent = [[1_000_000, 0], [-1_000_000, 0]]  # +1 and -1 on the grid
    got = {
        r["vec_id"]: r["cell"]
        for r in S.grid_assign_cells(df, cent).collect()
    }
    assert got == {0: 0, 1: 0, 2: 1}


def test_ivfpq_filtered_topk_semantics(spark, sf_dir):
    """Filtered IVFADC: every hit satisfies the predicate, the result
    is a true top-k over the aware candidate pool, and the aware path
    recalls at least as many exact-filtered hits as post-filtering
    the unfiltered IVFADC answer (the dominance the floor query
    pins)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    pred = F.col("label") >= 5
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    aware = S.ivfpq_filtered_topk(emb, q, pred, k=10, n_lists=8, nprobe=2).collect()
    assert len(aware) == 10
    assert all(labels[r["vec_id"]] >= 5 for r in aware)
    exact = {r["vec_id"] for r in S.cosine_topk(emb.filter(pred), q, k=10).collect()}
    post = {
        r["vec_id"]
        for r in S.ivfpq_topk(emb, q, k=10, n_lists=8, nprobe=2).collect()
        if labels[r["vec_id"]] >= 5
    }
    aware_ids = {r["vec_id"] for r in aware}
    assert len(aware_ids & exact) >= len(post & exact)
    with pytest.raises(ValueError, match="predicate"):
        S.ivfpq_filtered_topk(emb, q, F.col("label") > 10**9, k=10)


def test_incremental_components_planted(spark):
    """Planted merge topology: two existing components bridged by one
    new edge (labels must merge to the global min), a brand-new
    isolated pair (self-labeled then merged), and a redundant
    within-component edge (no-op)."""
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (10, 10), (11, 10), (20, 20)],
        "node long, label long",
    )
    new_edges = spark.createDataFrame(
        [(2, 11),    # bridges component 1 and component 10 -> label 1
         (30, 31),   # brand-new nodes -> component 30
         (1, 2)],    # redundant inside component 1 -> no-op
        "src long, dst long",
    )
    got = {
        r["node"]: r["label"]
        for r in D.incremental_components(labels, new_edges).collect()
    }
    assert got == {1: 1, 2: 1, 10: 1, 11: 1, 20: 20, 30: 30, 31: 30}
    # no merging edges at all: label store passes through + new selfs
    got2 = {
        r["node"]: r["label"]
        for r in D.incremental_components(
            labels, spark.createDataFrame([(1, 2)], "src long, dst long")
        ).collect()
    }
    assert got2 == {1: 1, 2: 1, 10: 10, 11: 10, 20: 20}


def test_kneser_ney_matches_fraction_reference_and_sums_to_one(spark, tmp_path):
    """text_kneser_ney's 1e-9-grid probabilities vs unbounded Python
    Fractions on a controlled corpus, plus the KN simplex theorem:
    for every context v, sum_w P(w|v) == 1 EXACTLY (interpolated KN
    is a proper conditional distribution) — checked in Fractions,
    with the grid floors within one grid step of the exact values."""
    from fractions import Fraction

    from cust_sagemaker_feature_store_spark.queries.text_q import (
        KN_GRID,
        text_kneser_ney,
    )

    docs = [
        (1, "san francisco is foggy", "en", "a", 22),
        (2, "san francisco is windy", "en", "a", 22),
        (3, "new york is loud", "en", "a", 16),
        (4, "york is new", "en", "a", 11),
    ]
    d = tmp_path / "kn_docs"
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(str(d / "documents.parquet"))
    got = {
        (r["w1"], r["w2"]): r
        for r in text_kneser_ney(spark, str(d)).collect()
    }

    bi: dict[tuple[str, str], int] = {}
    for _, text, *_ in docs:
        t = text.split()
        for a, b in zip(t, t[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    c_left: dict[str, int] = {}
    n1_left: dict[str, int] = {}
    n1_right: dict[str, int] = {}
    for (a, b), c in bi.items():
        c_left[a] = c_left.get(a, 0) + c
        n1_left[a] = n1_left.get(a, 0) + 1
        n1_right[b] = n1_right.get(b, 0) + 1
    D = len(bi)
    dsc = Fraction(3, 4)

    def p_kn(a: str, b: str) -> Fraction:
        cont = Fraction(n1_right[b], D)
        return (
            Fraction(bi.get((a, b), 0) * 4 - 3, 4 * c_left[a])
            if (a, b) in bi
            else Fraction(0)
        ) + dsc * n1_left[a] / c_left[a] * cont

    assert set(got) == set(bi)
    for (a, b), r in got.items():
        exact = p_kn(a, b)
        assert r["p_kn_grid"] == (exact.numerator * KN_GRID) // exact.denominator
    # simplex theorem: for each context, observed mass + backoff mass
    # over the FULL continuation vocabulary sums to exactly 1
    vocab_r = set(n1_right)
    for a in c_left:
        total = sum(
            (
                Fraction(bi[(a, b)] * 4 - 3, 4 * c_left[a])
                if (a, b) in bi
                else Fraction(0)
            )
            + dsc * n1_left[a] / c_left[a] * Fraction(n1_right[b], D)
            for b in vocab_r
        )
        assert total == 1, (a, total)


def test_sq8_index_probe_matches_inline(spark, sf_dir, tmp_path):
    """probe-from-stored-SQ8-index must be BIT-identical to scoring
    the same probed cells inline (same grid centroids, same bounds,
    same integer quantize/reconstruct/score) — the build-once/
    probe-many contract of build_sq8_index, where the codes table is
    the corpus at 1/8 float bytes and a probe reads only its nprobe
    cell partitions."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    root = str(tmp_path / "sq8_idx")
    centroids, mins, ranges = S.build_sq8_index(emb, root, n_lists=8)
    qgrid = [
        int(x)
        for x in emb.filter(F.col("vec_id") == 0)
        .select(S.grid_vector("embedding").alias("g"))
        .head()["g"]
    ]
    for nprobe in (2, 4):
        d2 = sorted(
            (sum((a - c) ** 2 for a, c in zip(qgrid, cv)), cell)
            for cell, cv in enumerate(centroids)
        )
        cells = [cell for _, cell in d2[:nprobe]]
        inline = (
            S.sq8_scores(
                S.grid_assign_cells(emb, centroids).filter(
                    F.col("cell").isin(cells)
                ),
                mins, ranges, qgrid,
            )
            .select("vec_id", "sq8_score")
            .orderBy(F.desc("sq8_score"), F.asc("vec_id"))
            .limit(10)
            .collect()
        )
        stored = S.probe_sq8_index(
            spark, root, q, k=10, nprobe=nprobe
        ).collect()
        assert [tuple(r) for r in stored] == [tuple(r) for r in inline]
    # the probe is partition-pruned: its plan reads only nprobe cell
    # directories, visible as a partition filter on `cell`
    plan = S.probe_sq8_index(
        spark, root, q, k=10, nprobe=2
    )._jdf.queryExecution().executedPlan().toString()
    assert "cell" in plan

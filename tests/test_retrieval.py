"""Retrieval-operator invariants (oracle equivalence is covered
generically by test_queries_oracle; these pin the operator contracts
that the hash gate can't see)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from cust_sagemaker_feature_store_spark.operators import retrieval as R


def _toy_docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="spark join spark join spark"),
            Row(doc_id=2, text="spark merge window"),
            Row(doc_id=3, text="vector vector vector vector"),
            Row(doc_id=4, text="the the the the the the"),
        ]
    )


def test_inverted_index_caps_and_sorts_postings(spark):
    docs = _toy_docs(spark)
    idx = {r["term"]: r for r in R.inverted_index(docs, postings_cap=2).collect()}
    # df counts documents, cf counts occurrences
    assert idx["spark"]["df"] == 2 and idx["spark"]["cf"] == 4
    # postings sorted ascending and capped at 2 even when df > cap
    assert idx["spark"]["postings"] == [1, 2]
    for r in idx.values():
        assert len(r["postings"]) <= 2
        assert r["postings"] == sorted(r["postings"])


def test_tfidf_ranks_term_concentration(spark):
    docs = _toy_docs(spark)
    out = R.tfidf_topk(docs, ["spark"], k=10).collect()
    # doc 1 (tf=3) must outrank doc 2 (tf=1); doc 3/4 (tf=0) absent
    assert [r["doc_id"] for r in out] == [1, 2]
    assert out[0]["score_ppm"] > out[1]["score_ppm"] > 0


def test_bm25_length_normalizes(spark):
    # same tf, different doc length: BM25 must prefer the shorter doc
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spark x"),
            Row(doc_id=2, text="spark " + "x " * 40),
        ]
    )
    out = R.bm25_topk(docs, ["spark"], k=10).collect()
    assert [r["doc_id"] for r in out] == [1, 2]
    assert out[0]["score_u"] > out[1]["score_u"] > 0


def test_bm25_saturates_vs_tf_linearity(spark):
    # tf doubling must raise BM25 by strictly less than 2x (saturation),
    # while raw tf-idf grows linearly by construction
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="spark " * 4 + "x " * 8),
            Row(doc_id=2, text="spark " * 8 + "x " * 4),
            Row(doc_id=3, text="y"),
        ]
    )
    out = {r["doc_id"]: r["score_u"] for r in R.bm25_topk(docs, ["spark"], k=10).collect()}
    assert out[2] > out[1]
    assert out[2] < 2 * out[1]


def test_corpus_stats_single_broadcastable_row(spark):
    stats = R.corpus_stats(_toy_docs(spark)).collect()
    assert len(stats) == 1
    assert stats[0]["n_docs"] == 4
    assert stats[0]["total_tokens"] == 5 + 3 + 4 + 6

"""Retrieval / relevance-scoring query surface over `documents`
(SURVEY.md §2.10 [EXT] — LLM-data-pipeline operators).

Inverted index, TF-IDF and BM25 ranking, and bigram collocation lift —
the query-based curation primitives a training-data pipeline uses to
pull topical slices out of a 100 TB corpus and to find over-represented
phrase patterns. Every oracle restates the exact integer/IEEE op tree
(see operators/retrieval.py's exactness discipline), so scores are
pinned bit-for-bit by the hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import retrieval as R
from .registry import register
from .text_q import SQL_TOKS

QUERY_TERMS = ["spark", "vector", "stream"]
TOP_K = 25
POSTINGS_CAP = 40

_SQL_TF = f"""
tf AS (
  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (
    SELECT doc_id, len({SQL_TOKS}) AS dl, unnest({SQL_TOKS}) AS term
    FROM documents
  )
  GROUP BY 1, 2, 3
)
"""

_SQL_QUERY_STATS = (
    _SQL_TF
    + """,
qtf AS (SELECT * FROM tf WHERE term IN ({terms})),
dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM qtf GROUP BY 1),
corpus AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len({toks})) AS BIGINT) AS total_tokens
  FROM documents
)
"""
)


def _terms_sql() -> str:
    return ", ".join(f"'{t}'" for t in QUERY_TERMS)


@register(
    "text_inverted_index",
    oracle=f"""
WITH {_SQL_TF},
stats AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS cf
  FROM tf GROUP BY 1
),
capped AS (
  SELECT term, doc_id FROM tf
  QUALIFY row_number() OVER (PARTITION BY term ORDER BY doc_id) <= {POSTINGS_CAP}
),
p AS (SELECT term, list_sort(list(doc_id)) AS postings FROM capped GROUP BY 1)
SELECT s.term, s.df, s.cf, p.postings
FROM stats s JOIN p USING (term)
""",
    description=(
        "Inverted index over the corpus: per term, document frequency, "
        "collection frequency, and the first 40 postings in doc_id "
        "order. The postings array is capped via window row_number "
        "BEFORE collect_list, so no task materializes an unbounded "
        "stopword postings list at 100 TB."
    ),
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return R.inverted_index(docs, postings_cap=POSTINGS_CAP)


@register(
    "text_tfidf_topk",
    oracle="WITH "
    + _SQL_QUERY_STATS.format(terms=_terms_sql(), toks=SQL_TOKS)
    + f""",
scored AS (
  SELECT q.doc_id, (q.tf * c.n_docs * 1000000) // d.df AS term_ppm
  FROM qtf q JOIN dft d USING (term) CROSS JOIN corpus c
),
agg AS (
  SELECT doc_id, CAST(SUM(term_ppm) AS BIGINT) AS score_ppm
  FROM scored GROUP BY 1
)
SELECT doc_id, score_ppm,
       CAST(score_ppm AS DOUBLE) / 1000000.0 AS tfidf
FROM agg
ORDER BY score_ppm DESC, doc_id
LIMIT {TOP_K}
""",
    description=(
        "Raw-idf TF-IDF top-k for a fixed query-term set: score = "
        "sum_t tf*N/df on an exact ppm integer grid (order-independent "
        "summation). Only query-term postings are touched — the filter "
        "is pushed below the token explode."
    ),
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return R.tfidf_topk(docs, QUERY_TERMS, k=TOP_K)


@register(
    "text_bm25_topk",
    oracle="WITH "
    + _SQL_QUERY_STATS.format(terms=_terms_sql(), toks=SQL_TOKS)
    + f""",
scored AS (
  SELECT q.doc_id,
         CAST(floor(
           (CAST(2*c.n_docs - 2*d.df + 1 AS DOUBLE) / CAST(2*d.df + 1 AS DOUBLE))
           * (CAST(22*q.tf*c.total_tokens AS DOUBLE)
              / CAST(10*q.tf*c.total_tokens + 3*c.total_tokens + 9*q.dl*c.n_docs AS DOUBLE))
           * 1000000.0) AS BIGINT) AS term_scaled
  FROM qtf q JOIN dft d USING (term) CROSS JOIN corpus c
),
agg AS (
  SELECT doc_id, CAST(SUM(term_scaled) AS BIGINT) AS score_u
  FROM scored GROUP BY 1
)
SELECT doc_id, score_u, CAST(score_u AS DOUBLE) / 1000000.0 AS bm25
FROM agg
ORDER BY score_u DESC, doc_id
LIMIT {TOP_K}
""",
    description=(
        "BM25 (k1=1.2, b=0.75) top-k: integer-rational saturation and "
        "Robertson idf, each one correctly-rounded IEEE division; term "
        "scores floored onto the 1e-6 grid before the per-doc int64 sum "
        "(order-independent). See operators/retrieval.py for the "
        "100 TB int64 margin analysis."
    ),
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return R.bm25_topk(docs, QUERY_TERMS, k=TOP_K)


MIN_BIGRAM_COUNT = 20
LIFT_TOP_K = 50


@register(
    "text_bigram_lift",
    oracle=f"""
WITH tok AS (SELECT doc_id, {SQL_TOKS} AS toks FROM documents),
uni AS (
  SELECT t AS tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT unnest(toks) AS t FROM tok) GROUP BY 1
),
tu AS (SELECT CAST(SUM(c) AS BIGINT) AS tu FROM uni),
bi AS (
  SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM (
    SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
                                 i -> toks[i] || ' ' || toks[i + 1])) AS bigram
    FROM tok WHERE len(toks) >= 2
  )
  GROUP BY 1
),
tb AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS tb FROM bi)
SELECT b.bigram, b.c_xy, ux.c AS c_x, uy.c AS c_y,
       ((CAST(b.c_xy AS DOUBLE) * t1.tu) * t1.tu)
       / ((CAST(t2.tb AS DOUBLE) * ux.c) * uy.c) AS lift
FROM bi b
JOIN uni ux ON ux.tok = string_split(b.bigram, ' ')[1]
JOIN uni uy ON uy.tok = string_split(b.bigram, ' ')[2]
CROSS JOIN tu t1 CROSS JOIN tb t2
WHERE b.c_xy >= {MIN_BIGRAM_COUNT}
ORDER BY lift DESC, bigram
LIMIT {LIFT_TOP_K}
""",
    description=(
        "Bigram collocation lift p(xy)/(p(x)p(y)) — PMI's monotone "
        "twin, kept exact as ((c_xy*TU)*TU)/((TB*c_x)*c_y) with a fixed "
        "IEEE op tree (no log). Unigram/bigram counts are map-side "
        "combined, vocabulary-sized; the unigram join sides are "
        "broadcast at scale."
    ),
)
def text_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import text as T
    from ..operators.dedup import _ensure_parallelism

    docs = load_table(spark, sf_dir, "documents")
    toks = T.tokens("text")
    tok = _ensure_parallelism(docs).select("doc_id", toks.alias("toks"))

    uni = (
        tok.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    tu = uni.agg(F.sum("c").cast("long").alias("tu"))

    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.concat_ws(
            " ", F.element_at("toks", i), F.element_at("toks", i + 1)
        ),
    )
    bi = (
        tok.filter(F.size("toks") >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").cast("long").alias("c_xy"))
        .filter(F.col("c_xy") >= MIN_BIGRAM_COUNT)
    )
    tb_full = (
        tok.filter(F.size("toks") >= 2)
        .select((F.size("toks") - 1).alias("nb"))
        .agg(F.sum("nb").cast("long").alias("tb"))
    )

    x = F.split(F.col("bigram"), " ")[0]
    y = F.split(F.col("bigram"), " ")[1]
    ux = uni.select(F.col("tok").alias("__x"), F.col("c").alias("c_x"))
    uy = uni.select(F.col("tok").alias("__y"), F.col("c").alias("c_y"))
    lift = (
        (F.col("c_xy").cast("double") * F.col("tu")) * F.col("tu")
    ) / ((F.col("tb").cast("double") * F.col("c_x")) * F.col("c_y"))
    return (
        bi.withColumn("__x", x)
        .withColumn("__y", y)
        .join(F.broadcast(ux), "__x")
        .join(F.broadcast(uy), "__y")
        .crossJoin(F.broadcast(tu))
        .crossJoin(F.broadcast(tb_full))
        .select("bigram", "c_xy", "c_x", "c_y", lift.alias("lift"))
        .orderBy(F.desc("lift"), F.asc("bigram"))
        .limit(LIFT_TOP_K)
    )

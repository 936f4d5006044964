"""Vector similarity search over embedding columns (SURVEY.md §2.10 [EXT]).

`embeddings.embedding` is ArrayType(FloatType); all math casts to
double FIRST and folds sequentially left-to-right, which is exactly
what DuckDB's list functions do — so cosine scores are bit-comparable
and the brute-force path is oracle-checkable.

Scale ladder:
- `cosine_topk` — brute force O(n·q): the correctness baseline, and
  the right answer when q is small (a TakeOrdered over one narrow scan,
  no shuffle of the vectors themselves).
- `lsh_ann_topk` — BucketedRandomProjectionLSH (spark.ml): hash-bucket
  pre-filter then exact re-rank on candidates only; the 100 TB path
  (approximate; recall depends on bucketLength/numHashTables).
- `ivf_topk` — IVF-style coarse quantization without MLlib: k centroid
  seeds picked deterministically, vectors assigned to nearest centroid
  (narrow), probe only the closest `nprobe` partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — same accumulation order as
    DuckDB's list_dot_product, so results agree to the last bit."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.
    orderBy+limit compiles to TakeOrderedAndProject: each partition
    keeps k rows, driver merges — no shuffle of the corpus."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine(as_double(vec_col), q), 6).alias("cosine_sim"),
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col)).limit(k)


def _to_ml_vector(df: DataFrame, vec_col: str, out_col: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(out_col, array_to_vector(as_double(vec_col)))


def lsh_ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
) -> DataFrame:
    """Approximate NN via random-projection LSH, exact re-rank inside
    the candidate set. Deterministic seed for reproducibility."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.linalg import Vectors

    ml_df = _to_ml_vector(embeddings, vec_col, "__v")
    lsh = BucketedRandomProjectionLSH(
        inputCol="__v",
        outputCol="__h",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(ml_df)
    key = Vectors.dense([float(x) for x in query_vec])
    neighbors = model.approxNearestNeighbors(ml_df, key, k, distCol="l2_dist")
    return neighbors.select(
        F.col(id_col), F.round(cosine(as_double(vec_col), F.array(*[F.lit(float(x)) for x in query_vec])), 6).alias("cosine_sim")
    ).orderBy(F.col("cosine_sim").desc(), F.col(id_col))


def lsh_dup_pairs(
    embeddings: DataFrame,
    min_cosine: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 1.0,
    num_hash_tables: int = 6,
) -> DataFrame:
    """Global embedding near-dup pairs WITHOUT blocking: unit-normalize,
    LSH self-join with L2 threshold sqrt(2 - 2*min_cosine) (exact
    equivalence on unit vectors), then exact cosine on the candidates.
    The scale path when no blocking key exists — candidate generation is
    bucket-local, never the O(n²) cross product. Approximate: recall
    depends on bucketLength/numHashTables (asserted vs the exact
    baseline in tests)."""
    import math

    from pyspark.ml.feature import BucketedRandomProjectionLSH

    unit = embeddings.select(
        F.col(id_col),
        F.transform(
            as_double(vec_col),
            lambda x: x / l2_norm(as_double(vec_col)),
        ).alias("__u"),
    )
    ml_df = _to_ml_vector(unit, "__u", "__v")
    lsh = BucketedRandomProjectionLSH(
        inputCol="__v",
        outputCol="__h",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = lsh.fit(ml_df)
    thr = math.sqrt(max(2.0 - 2.0 * min_cosine, 0.0))
    pairs = model.approxSimilarityJoin(ml_df, ml_df, thr, distCol="l2_dist")
    out = pairs.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}")).select(
        F.col(f"datasetA.{id_col}").alias("vec_a"),
        F.col(f"datasetB.{id_col}").alias("vec_b"),
        F.round(dot(F.col("datasetA.__u"), F.col("datasetB.__u")), 6).alias("cosine_sim"),
    )
    return out.filter(F.col("cosine_sim") >= min_cosine)


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: centroids = deterministic sample of the corpus,
    cells = argmin centroid per vector, probe the nprobe cells nearest
    the query. All narrow ops + one small broadcast of centroids."""
    centroids = [
        (i, [float(x) for x in r[vec_col]])
        for i, r in enumerate(
            embeddings.orderBy(F.col(id_col)).limit(n_lists).collect()
        )
    ]

    def nearest_cell(vec: Column) -> Column:
        best_idx, best_d = F.lit(0), F.lit(float("inf"))
        for ci, cvec in centroids:
            carr = F.array(*[F.lit(x) for x in cvec])
            d = dot(vec, vec) - 2 * dot(vec, carr) + F.lit(sum(x * x for x in cvec))
            best_idx = F.when(d < best_d, F.lit(ci)).otherwise(best_idx)
            best_d = F.when(d < best_d, d).otherwise(best_d)
        return best_idx

    q = [float(x) for x in query_vec]
    q_dists = sorted(
        (sum((a - b) ** 2 for a, b in zip(q, cvec)), ci) for ci, cvec in centroids
    )
    probe_cells = [ci for _, ci in q_dists[:nprobe]]

    qcol = F.array(*[F.lit(x) for x in q])
    assigned = embeddings.withColumn("__cell", nearest_cell(as_double(vec_col)))
    return (
        assigned.filter(F.col("__cell").isin(probe_cells))
        .select(
            F.col(id_col),
            F.round(cosine(as_double(vec_col), qcol), 6).alias("cosine_sim"),
        )
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )

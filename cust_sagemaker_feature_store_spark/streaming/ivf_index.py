"""Streaming maintenance of the persisted IVF ANN index (r11 verdict
next-round #4) — the vector-store symmetry of streaming/dedup_index.py.

`operators/similarity.build_ivf_index` materializes the inline IVF
path's state (centroids + cell-assigned vectors, partitioned by
(epoch, cell)) with the bulk build stamped epoch = -1. This module
keeps that index CURRENT under an embedding stream: a file-source
readStream feeds a foreachBatch sink that assigns each micro-batch's
vectors to cells under the FROZEN stored centroids (the standard IVF
serving contract — lists grow, the quantizer retrains offline) and
appends them under epoch = batch_id.

Exactly-once discipline (same as the dedup index): every write is a
DYNAMIC PARTITION OVERWRITE of this epoch's (epoch=batch_id, cell=*)
partitions, so a checkpoint replay of a crashed micro-batch rewrites
the identical partitions instead of duplicating vectors. Unlike the
dedup maintainer there is no read-your-index step — assignment
depends only on the frozen centroids — so the epoch stamp's only job
is replay idempotence, which the restart test pins.

Batch twin: `replay_ivf_epochs` states the same contract
declaratively (assign every epoch's vectors under the same frozen
centroids) — stream == batch is pinned bit-for-bit by
tests/test_streaming.py::test_ivf_index_stream_equals_batch. The
DRIVER-visible twin (queries/similarity_q.stream_ivf_index_twin)
runs the same per-epoch/per-cell maintenance semantics through
`grid_assign_cells` (exact int64 arithmetic) so its oracle is
portable to DuckDB — the float `_with_cells` argmin is not
cross-engine-exact, the same reason dedup_simhash has an md5 twin.

Scale story: per micro-batch the work is one narrow assignment pass
over the batch (broadcast KB-sized centroids) plus a partitioned
append; probes (`probe_ivf_index`) prune to nprobe cell directories
across all epochs and never rescan the corpus. A compaction that
folds old epochs into epoch -1 is an offline rewrite of the same
table (core/maintenance.compact_offline's shape).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    _index_paths,
    _with_cells,
    load_ivf_centroids,
)
from ._fsutil import resolve, staged_swap, store_exists


class StreamingIvfIndex:
    """File-source streaming maintainer for a persisted IVF index
    whose bulk build (`build_ivf_index`) already populated
    ``index_root`` — new vectors stream in as parquet files of
    (id_col, vec_col) rows."""

    def __init__(
        self,
        spark: SparkSession,
        input_dir: str,
        index_root: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.spark = spark
        self.input_dir = input_dir
        self.index_root = index_root
        self.id_col = id_col
        self.vec_col = vec_col
        self.cent = load_ivf_centroids(spark, index_root)  # frozen
        self.vectors_dir = _index_paths(index_root)["vectors"]
        self.checkpoint_dir = os.path.join(index_root, "_checkpoint")

    # -- micro-batch sink ---------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        (
            # keep every batch column (metadata travels with the
            # vectors, same as the bulk build) + the epoch stamp
            # resolve: appends land in the current epoch-pointer
            # version after a compaction, not the retired legacy path
            _with_cells(batch, self.cent, self.vec_col)
            .select("*", F.lit(batch_id).cast("long").alias("epoch"))
            .withColumnRenamed("__cell", "cell")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch", "cell")
            .parquet(resolve(self.spark, self.vectors_dir), compression="snappy")
        )

    # -- stream wiring ------------------------------------------------------

    def start(self, schema: str):
        src = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(self.input_dir)
        )
        return (
            src.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def vectors(self) -> DataFrame:
        return self.spark.read.parquet(resolve(self.spark, self.vectors_dir))


class StreamingIvfpqIndex:
    """File-source streaming maintainer for a persisted IVFADC index
    whose bulk build (`build_ivfpq_index`) already populated
    ``index_root`` (r12 verdict next-round #3) — new vectors stream
    in as parquet files of (id_col, vec_col) rows.

    Per micro-batch, BOTH index tables advance under the FROZEN
    stored quantizer (centroids + PQ sub-codebooks — the IVFADC
    serving contract: codes accumulate, the quantizer retrains
    offline via `retrain_ivfpq_index`):

      - ``codes/``: the batch `pq_encode`d and appended under
        (epoch=batch_id, cell) — the byte-sized ADC shortlist tier;
      - ``vectors/``: the raw batch appended under epoch=batch_id —
        the exact-rerank tier (epoch-only partitioning, exactly the
        bulk build's layout: rerank joins by id, never scans cells).

    Exactly-once discipline is the same dynamic-partition-overwrite
    seam as StreamingIvfIndex: a checkpoint replay of a crashed
    micro-batch rewrites the identical (epoch=batch_id, ...)
    partitions instead of duplicating rows, pinned by
    tests/test_streaming.py::test_ivfpq_index_stream_restart_idempotent.
    Probes (`probe_ivfpq_index`) read all epochs of both tables, so a
    probe after N streamed batches is bit-identical to the inline
    `ivfpq_topk` over the union corpus under the same quantizer
    (test_ivfpq_index_stream_probe_matches_inline)."""

    def __init__(
        self,
        spark: SparkSession,
        input_dir: str,
        index_root: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        from ..operators.similarity import load_pq_codebooks

        self.spark = spark
        self.input_dir = input_dir
        self.index_root = index_root
        self.id_col = id_col
        self.vec_col = vec_col
        self.cent = load_ivf_centroids(spark, index_root)  # frozen
        self.codebooks = load_pq_codebooks(spark, index_root)  # frozen
        paths = _index_paths(index_root)
        self.codes_dir = paths["codes"]
        self.vectors_dir = paths["vectors"]
        self.checkpoint_dir = os.path.join(index_root, "_checkpoint")

    # -- micro-batch sink ---------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from ..operators.similarity import pq_encode

        if not batch.take(1):
            return
        epoch = F.lit(batch_id).cast("long").alias("epoch")
        (
            pq_encode(batch, self.cent, self.codebooks,
                      self.id_col, self.vec_col)
            .select(
                F.col(self.id_col), F.col("__codes").alias("codes"),
                epoch, F.col("__cell").alias("cell"),
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch", "cell")
            # resolve on both tables: appends land in the current
            # epoch-pointer versions after a compaction/retrain
            .parquet(resolve(self.spark, self.codes_dir), compression="snappy")
        )
        (
            # keep every batch column (metadata travels with the
            # vectors for the filtered stored probe, same as the bulk
            # build)
            batch.select("*", epoch)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch")
            .parquet(resolve(self.spark, self.vectors_dir), compression="snappy")
        )

    # -- stream wiring ------------------------------------------------------

    def start(self, schema: str):
        src = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(self.input_dir)
        )
        return (
            src.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def codes(self) -> DataFrame:
        return self.spark.read.parquet(resolve(self.spark, self.codes_dir))

    def vectors(self) -> DataFrame:
        return self.spark.read.parquet(resolve(self.spark, self.vectors_dir))


def replay_ivfpq_epochs(
    spark: SparkSession,
    vectors: DataFrame,
    epoch_col,
    index_root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch twin of the streaming IVFADC maintainer: every vector
    encoded under the same frozen stored quantizer, stamped with its
    epoch — one declarative plan, no per-epoch loop (epochs are
    independent because the quantizer is frozen). Returns
    (id, epoch, cell, codes) — the maintained codes table's logical
    content; stream == batch is pinned bit-for-bit by
    tests/test_streaming.py::test_ivfpq_index_stream_equals_batch."""
    from ..operators.similarity import load_pq_codebooks, pq_encode

    cent = load_ivf_centroids(spark, index_root)
    codebooks = load_pq_codebooks(spark, index_root)
    return (
        # pq_encode's output schema is (id, __cell, __codes) — the
        # epoch stamp rejoins by id (vs the stream, which knows its
        # batch_id operationally and stamps the literal)
        pq_encode(vectors, cent, codebooks, id_col, vec_col)
        .join(
            vectors.select(
                F.col(id_col), epoch_col.cast("long").alias("epoch")
            ),
            id_col,
        )
        .select(
            F.col(id_col), F.col("epoch"),
            F.col("__cell").alias("cell"), F.col("__codes").alias("codes"),
        )
    )


def replay_ivf_epochs(
    spark: SparkSession,
    vectors: DataFrame,
    epoch_col,
    index_root: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch twin of the streaming maintainer: every vector assigned
    under the same frozen stored centroids, stamped with its epoch —
    one declarative plan, no per-epoch loop (epochs are independent
    because the centroids are frozen; the epoch stamp exists for
    replay idempotence, not ordering). Returns
    (id, epoch, cell) — the maintained index's logical content."""
    cent = load_ivf_centroids(spark, index_root)
    return (
        _with_cells(vectors.withColumn("epoch", epoch_col.cast("long")), cent, vec_col)
        .select(F.col(id_col), F.col("epoch"), F.col("__cell").alias("cell"))
    )


def compact_ivf_epochs(spark: SparkSession, index_root: str) -> int:
    """Fold every streamed epoch into the bulk-build epoch (-1): an
    offline rewrite of the index's row tables (``vectors``, and for
    an IVFADC index also ``codes``) that leaves probe results
    bit-identical (probes read all epochs; only the partition layout
    changes) and returns the index to a single epoch — the
    maintenance pass that keeps the epoch count bounded under a
    long-running stream, exactly compact_offline's role for the
    feature store. Returns the number of folded epochs.

    MUST run only while the stream is STOPPED with no pending replay:
    folding a crashed half-written epoch E into -1 would duplicate its
    rows when E's replay re-writes the epoch=E partitions (dynamic
    overwrite only replaces E's own partitions, not the folded copies).

    The rewrite stages into a sibling directory and publishes through
    the Hadoop FileSystem API's epoch pointer (ADVICE r12 #3 moved the
    swap off os.rename; r13 verdict next-round #4 replaced the
    two-rename absent-window with the marker publish — see
    _fsutil.staged_swap): probes resolve the old version in full until
    the one atomic marker create, and a crash at any point leaves a
    consistent, readable index. The stream-stopped single-writer
    window above is still required for the retire phase."""
    from ..operators.similarity import IVF_BASE_EPOCH, _index_paths

    paths = _index_paths(index_root)
    folded = 0
    # IVF layout: vectors partitioned (epoch, cell). IVFPQ layout:
    # codes partitioned (epoch, cell), raw vectors partitioned by
    # epoch only (the rerank tier joins by id, never scans cells) —
    # fold whichever tables exist, each under its own layout.
    for sub in ("vectors", "codes"):
        path = paths[sub]
        if not store_exists(spark, path):
            continue
        df = spark.read.parquet(resolve(spark, path))
        epochs = [r["epoch"] for r in df.select("epoch").distinct().collect()]
        streamed = [e for e in epochs if e != IVF_BASE_EPOCH]
        if not streamed:
            continue
        part_cols = ["epoch", "cell"] if "cell" in df.columns else ["epoch"]
        staged = path + ".__compact__"
        (
            df.withColumn("epoch", F.lit(IVF_BASE_EPOCH).cast("long"))
            .write.mode("overwrite")
            .partitionBy(*part_cols)
            .parquet(staged, compression="snappy")
        )
        staged_swap(spark, path, staged)
        folded = max(folded, len(streamed))
    return folded


def retrain_ivfpq_index(
    spark: SparkSession,
    index_root: str,
    seed_rounds: int = 3,
    lloyd_rounds: int = 2,
    pq_rounds: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Offline quantizer retrain + staged rebuild of a stored IVFADC
    index (r12 verdict next-round #4) — the maintenance pass a vector
    store runs once enough streamed epochs have drifted the corpus
    away from the quantizer the bulk build froze:

    1. read the ACCUMULATED corpus — every epoch of the stored raw
       vectors (bulk build + all streamed appends);
    2. retrain the quantizer over it with the shared production
       recipe (`operators/similarity.retrain_quantizer`: k-means||
       seeding + exact-integer Lloyd centroids + Lloyd-trained PQ
       sub-codebooks), keeping the stored index's n_lists / M /
       n_codes shape;
    3. re-encode every vector under the new quantizer and rebuild ALL
       FOUR tables into staged siblings — codes and vectors fold to
       epoch -1 (a retrain is a natural compaction point: every
       row's code changes anyway) — then publish the group via
       `_fsutil.staged_swap_many`: all four rewrites rename into
       markerless version directories first (invisible, the old
       group stays fully readable), then one empty-file marker
       create per table publishes them (new centroids probed
       against old codes would be a WRONG index, not a stale one —
       the mixed window is now four metadata creates with zero data
       movement, and a clean error rolls the whole group back).

    MUST run only while the stream is STOPPED with no pending replay
    and no concurrent probes (the single-writer window every
    maintenance op here documents); restart the maintainer afterwards
    and it picks up the new frozen quantizer from the store. Returns
    the retrained (cent, codebooks); recall-vs-exact and
    distortion-not-worse are driver-pinned by
    queries/similarity_q.sim_ivfpq_retrained_floor over the same
    recipe, and stored-probe == inline equality by
    tests/test_streaming.py::test_retrain_ivfpq_index."""
    from ..operators.similarity import (
        IVF_BASE_EPOCH,
        load_pq_codebooks,
        pq_encode,
        retrain_quantizer,
    )
    from ._fsutil import staged_swap_many

    paths = _index_paths(index_root)
    corpus_full = spark.read.parquet(resolve(spark, paths["vectors"])).drop("epoch")
    corpus = corpus_full.select(F.col(id_col), F.col(vec_col))
    old_books = load_pq_codebooks(spark, index_root)
    n_lists = len(load_ivf_centroids(spark, index_root))
    cent, books = retrain_quantizer(
        corpus, n_lists=n_lists,
        m_subvectors=int(old_books.shape[0]),
        n_codes=int(old_books.shape[1]),
        seed_rounds=seed_rounds, lloyd_rounds=lloyd_rounds,
        pq_rounds=pq_rounds, id_col=id_col, vec_col=vec_col,
    )
    staged = {k: p + ".__retrain__" for k, p in paths.items()}
    spark.createDataFrame(
        [(int(i), [float(x) for x in cent[i]]) for i in range(len(cent))],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(staged["centroids"])
    spark.createDataFrame(
        [
            (int(j), int(c), [float(x) for x in books[j][c]])
            for j in range(books.shape[0])
            for c in range(books.shape[1])
        ],
        "block int, code int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(staged["codebooks"])
    epoch = F.lit(IVF_BASE_EPOCH).cast("long").alias("epoch")
    (
        pq_encode(corpus, cent, books, id_col, vec_col)
        .select(
            F.col(id_col), F.col("__codes").alias("codes"),
            epoch, F.col("__cell").alias("cell"),
        )
        .write.mode("overwrite")
        .partitionBy("epoch", "cell")
        .parquet(staged["codes"], compression="snappy")
    )
    (
        # all source columns survive the rebuild (metadata feeds the
        # filtered stored probe)
        corpus_full.select("*", epoch)
        .write.mode("overwrite")
        .partitionBy("epoch")
        .parquet(staged["vectors"], compression="snappy")
    )
    staged_swap_many(
        spark, [(paths[k], staged[k]) for k in
                ("centroids", "codebooks", "codes", "vectors")]
    )
    return cent, books


class StreamingSq8Index:
    """File-source streaming maintainer for a persisted SQ8 index
    whose bulk build (`operators/similarity.build_sq8_index`) already
    populated ``index_root`` — new vectors stream in as parquet files
    of (id_col, vec_col) rows and are ENCODED under the FROZEN stored
    quantizer state (grid centroids + per-dim (min, range) bounds —
    the same serving contract as the IVFADC tier: codes accumulate,
    bounds/centroids retrain offline). Each micro-batch appends its
    int8 codes under (epoch=batch_id, cell) by dynamic partition
    overwrite, so a checkpoint replay rewrites the identical
    partitions (the StreamingIvfIndex exactly-once seam) — and
    because assignment, quantization, and scoring are integer-exact,
    a `probe_sq8_index` after N streamed batches is bit-identical to
    encoding the union corpus in one bulk build under the same
    frozen state (tests/test_streaming.py::
    test_sq8_index_stream_probe_matches_bulk). Out-of-bounds
    components of NEW vectors clamp into [0, 255] (the standard SQ
    saturation; documented rather than silently re-trained)."""

    def __init__(
        self,
        spark: SparkSession,
        input_dir: str,
        index_root: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ):
        self.spark = spark
        self.input_dir = input_dir
        self.index_root = index_root
        self.id_col = id_col
        self.vec_col = vec_col
        paths = _index_paths(index_root)
        self.codes_dir = paths["codes"]
        self.checkpoint_dir = os.path.join(index_root, "_checkpoint")
        cent = (
            spark.read.parquet(resolve(spark, paths["centroids"]))
            .orderBy("cell").collect()
        )
        self.centroids = [[int(x) for x in r["centroid"]] for r in cent]
        bounds = (
            spark.read.parquet(resolve(spark, paths["codebooks"]))
            .orderBy("dim").collect()
        )
        self.mins = [int(r["mn"]) for r in bounds]
        self.ranges = [int(r["rg"]) for r in bounds]

    # -- micro-batch sink ---------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from ..operators.similarity import (
            grid_assign_cells,
            grid_vector,
            sq8_codes_expr,
        )

        if not batch.take(1):
            return
        codes = sq8_codes_expr(self.mins, self.ranges)
        (
            grid_assign_cells(batch, self.centroids, self.vec_col, "cell")
            .withColumn("__gv", grid_vector(self.vec_col))
            .select(
                F.col(self.id_col),
                F.expr(codes).alias("codes"),
                F.lit(batch_id).cast("long").alias("epoch"),
                "cell",
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("epoch", "cell")
            .parquet(resolve(self.spark, self.codes_dir), compression="snappy")
        )

    # -- stream wiring ------------------------------------------------------

    def start(self, schema: str):
        src = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(self.input_dir)
        )
        return (
            src.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def codes(self) -> DataFrame:
        return self.spark.read.parquet(resolve(self.spark, self.codes_dir))

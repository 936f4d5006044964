"""Streaming maintenance of the per-source exact-size weighted
reservoir — sampling under ingest, the fourth leg of the streaming
story next to the dedup index, the component label store, and the
IVF/IVFADC indexes.

The batch form (`queries/text_q.sample_weighted_reservoir`, driver
hash-green) draws EXACTLY k docs per source by Efraimidis-Spirakis
priority key ln(u)/sqrt(n_chars) with u a pure hash of doc_id. Because
the key is a DETERMINISTIC function of the row, the reservoir is an
associative, idempotent fold: the top-k of a union is the top-k of
(previous top-k ∪ new batch), so the maintainer keeps only the
(sources x k)-row sample and never re-reads the corpus —
top-k(S ∪ B) absorbs B permanently, and re-applying B (a checkpoint
replay) changes nothing. Arrival order cannot matter for the same
reason. Both properties plus stream == batch-twin equality are pinned
by tests/test_streaming.py::test_streaming_reservoir_equals_batch.

Per micro-batch the work is one key computation over the batch plus a
WindowGroupLimit top-k over (stored sample ∪ batch) — O(batch +
sources*k), never O(corpus). The store rewrite publishes through the
Hadoop-FS epoch-pointer swap (_fsutil.staged_swap) so a crash never
leaves a torn OR absent sample — readers resolve the previous version
until the one atomic marker create. Because this swap runs on EVERY
micro-batch while sample() readers may be live, it defers retirement
(keep_old=1, r14 advice): the version a reader resolved survives the
very next publish and is deleted only one swap later, so a concurrent
scan has a full micro-batch interval to finish — the bounded
(sources x k)-row store makes the extra copy's disk cost negligible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._fsutil import _fs_and_path, resolve, staged_swap, store_exists

_WS_MOD = 1_000_000  # the batch query's hash-uniform grid (text_q.py)


class StreamingWeightedReservoir:
    """File-source streaming maintainer for a persisted per-source
    exact-size weighted sample; new documents stream in as parquet
    files of (doc_id, source, n_chars) rows."""

    def __init__(
        self,
        spark: SparkSession,
        input_dir: str,
        store_dir: str,
        k: int = 20,
    ):
        self.spark = spark
        self.input_dir = input_dir
        self.store_dir = store_dir
        self.k = k
        self.checkpoint_dir = store_dir + "_checkpoint"

    @staticmethod
    def _key():
        # the batch twin's Efraimidis-Spirakis priority, verbatim:
        # ln(u)/sqrt(n_chars), u = ((doc_id * 2654435761) % MOD + 1)/(MOD+1)
        u = (
            ((F.col("doc_id") * F.lit(2654435761)) % _WS_MOD + 1).cast(
                "double"
            )
            / F.lit(float(_WS_MOD + 1))
        )
        return F.log(u) / F.sqrt(F.col("n_chars").cast("double"))

    def _topk(self, rows: DataFrame) -> DataFrame:
        w = Window.partitionBy("source").orderBy(
            self._key().desc(), "doc_id"
        )
        return (
            rows.withColumn("sample_rank", F.row_number().over(w))
            .filter(F.col("sample_rank") <= self.k)
            .select("source", "doc_id", "n_chars", "sample_rank")
        )

    # -- micro-batch sink ---------------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        rows = batch.select("source", "doc_id", "n_chars")
        if not rows.take(1):
            return
        if store_exists(self.spark, self.store_dir):
            cur = self.spark.read.parquet(
                resolve(self.spark, self.store_dir)
            ).select("source", "doc_id", "n_chars")
            rows = cur.unionByName(rows).dropDuplicates(
                ["source", "doc_id"]
            )
        staged = self.store_dir + ".__fold__"
        (
            self._topk(rows)
            .coalesce(1)  # sources x k rows — one file is the right size
            .write.mode("overwrite")
            .parquet(staged, compression="snappy")
        )
        if store_exists(self.spark, self.store_dir):
            # per-batch swap with possibly-live sample() readers:
            # defer retirement one swap (module docstring, r14 advice)
            staged_swap(self.spark, self.store_dir, staged, keep_old=1)
        else:  # bootstrap: no live store to publish over, one rename suffices
            fs, jp, jvm = _fs_and_path(self.spark, self.store_dir)
            fs.rename(jvm.org.apache.hadoop.fs.Path(staged), jp)

    # -- stream wiring ------------------------------------------------------

    def start(self, schema: str = "doc_id long, source string, n_chars long"):
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

    def sample(self) -> DataFrame:
        return self.spark.read.parquet(resolve(self.spark, self.store_dir))

"""Hadoop-FileSystem helpers shared by the streaming index maintainers
(dedup_index, ivf_index, components).

os.rename / shutil.rmtree only operate on a local POSIX filesystem;
index roots on HDFS/S3/ABFS need the Hadoop FileSystem API — the same
API the existence probes already use (r11 advice moved probes there;
r12 advice moves the compaction swaps too, ADVICE r12 #3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def fs_exists(spark: SparkSession, path: str) -> bool:
    """Existence probe through the Hadoop FileSystem API — correct on
    HDFS/S3/ABFS where an os.path probe is always-False."""
    fs, jpath, _ = _fs_and_path(spark, path)
    return bool(fs.exists(jpath))


def fs_delete(spark: SparkSession, path: str) -> bool:
    """Recursive delete through the Hadoop FileSystem API; False when
    the path did not exist."""
    fs, jpath, _ = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return False
    return bool(fs.delete(jpath, True))


def data_file_count(spark: SparkSession, path: str) -> int:
    """Number of data files under a table path (recursive), excluding
    hidden/metadata entries — the before/after metric the physical
    compaction passes report."""
    fs, jpath, _ = _fs_and_path(spark, path)
    it = fs.listFiles(jpath, True)
    n = 0
    while it.hasNext():
        name = it.next().getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            n += 1
    return n


def read_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """Read a parquet table that may not exist yet (first micro-batch
    of a fresh index), returning an empty frame of the declared schema
    when absent. The probe goes through the Hadoop FileSystem API so
    the check is correct on object stores, not just local disk."""
    if fs_exists(spark, path):
        return spark.read.schema(schema).parquet(path)
    return spark.createDataFrame([], schema)


def staged_swap(spark: SparkSession, live: str, staged: str) -> None:
    """Swap a staged rewrite into the live path via Hadoop fs.rename /
    fs.delete: live -> live.__old__, staged -> live, delete __old__.

    There IS a brief window between the two renames where the live
    path is absent — a reader racing the swap must retry, which the
    single-writer / stream-stopped window the compaction docstrings
    require already rules out for the maintainers themselves. A crash
    inside the window leaves the old data intact under `.__old__`
    (recover by renaming it back); a pointer/manifest indirection
    would close the window entirely at the cost of an extra read hop
    on every probe. On failure of the second rename the first is
    rolled back, so the live path never stays absent on a clean error
    path.

    Note HDFS/local rename is atomic per call; S3A "rename" is a
    copy+delete — on S3 prefer a manifest pointer for large indexes.
    """
    fs, jlive, jvm = _fs_and_path(spark, live)
    jstaged = jvm.org.apache.hadoop.fs.Path(staged)
    jold = jvm.org.apache.hadoop.fs.Path(live + ".__old__")
    if fs.exists(jold):  # leftover from an interrupted earlier swap
        fs.delete(jold, True)
    if not fs.rename(jlive, jold):
        raise IOError(f"staged_swap: rename {live} -> {live}.__old__ failed")
    if not fs.rename(jstaged, jlive):
        fs.rename(jold, jlive)  # roll back: live must not stay absent
        raise IOError(f"staged_swap: rename {staged} -> {live} failed")
    fs.delete(jold, True)


def staged_swap_many(spark: SparkSession, pairs: list[tuple[str, str]]) -> None:
    """Swap SEVERAL staged rewrites into their live paths as one
    all-or-nothing group: every live path is parked under `.__old__`
    and every staged path renamed in, and only after ALL renames
    succeed are the `.__old__` backups deleted. On any failure the
    completed swaps are rolled back, so the group never ends half
    swapped on a clean error path — the consistency a multi-table
    index rebuild needs (new centroids probed against old codes is a
    WRONG index, not a stale one). A hard crash mid-group can still
    leave a mix; every `.__old__` survivor is the recovery copy, and
    the callers' stopped-stream/no-reader window is what makes the
    group window safe operationally."""
    if not pairs:
        return
    fs, _, jvm = _fs_and_path(spark, pairs[0][0])
    P = jvm.org.apache.hadoop.fs.Path
    done: list[tuple[str, str]] = []
    try:
        for live, staged in pairs:
            jold = P(live + ".__old__")
            if fs.exists(jold):
                fs.delete(jold, True)
            if not fs.rename(P(live), jold):
                raise IOError(f"staged_swap_many: park {live} failed")
            if not fs.rename(P(staged), P(live)):
                fs.rename(jold, P(live))
                raise IOError(f"staged_swap_many: swap-in {staged} failed")
            done.append((live, staged))
    except Exception:
        for live, staged in reversed(done):  # roll back completed swaps
            fs.rename(P(live), P(staged))
            fs.rename(P(live + ".__old__"), P(live))
        raise
    for live, _ in pairs:
        fs.delete(P(live + ".__old__"), True)

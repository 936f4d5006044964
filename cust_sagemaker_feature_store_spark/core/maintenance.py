"""Offline-store maintenance: small-file compaction and retention
vacuum — the two operational jobs a 100 TB append-only store cannot
live without.

Both operate per `event_date` partition so work is bounded by the
touched partitions, never the full store:

- **Compaction.** Streaming/micro-batch ingest leaves many small files
  per partition (each foreachBatch append adds its own); small files
  tax every subsequent scan with per-file open/footer costs and task
  scheduling. `compact_offline` rewrites only the partitions whose file
  count exceeds the target, bin-packing to `files_per_partition`.
- **Vacuum.** Retention drops history older than a cutoff while
  PRESERVING the serving contract: every key's latest record survives
  even if it is older than the cutoff (otherwise a quiet key would
  vanish from the online view), and that latest record may be a
  tombstone (so deletions stay suppressed). Point-in-time reads BEFORE
  the cutoff are intentionally given up — that is what retention means.

Partition directories are enumerated with a filesystem listing, which
is exact for the engine's local/posix layout; on an object store a
manifest/catalog listing replaces it (same loop, different listing).

Crash safety: every rewrite is STAGE-AND-SWAP, never overwrite-in-
place. The replacement is written to a hidden staging sibling (Spark's
file index skips dot-prefixed directories, so a leftover never
corrupts reads), then two directory renames swap it in. A crash at any
point leaves at least one complete copy of the partition on disk:
before the first rename the original is untouched; between the renames
the original survives under its `.<dir>.old` name; after the swap the
new copy is live and the `.old` backup is garbage. Recovery is
AUTOMATED, not manual: `recover_interrupted_swaps` runs at the start
of every maintenance entry point and repairs each crash state by its
unambiguous leftover signature (see its docstring) — including moving
a mid-swap backup's rows back into a live dir that a later ingest
re-created, so no cleanup can ever delete the only copy. Plain
`mode("overwrite")` to the live path would instead delete the only
durable copy before the new files commit.

Concurrency contract (explicit, ADVICE r4): maintenance requires a
SINGLE WRITER and NO CONCURRENT READERS on the store it is rewriting —
between the two swap renames the live partition dir briefly does not
exist, so a concurrent reader can transiently observe a vanished
partition, and a concurrent ingest re-creating the dir makes the
second rename fail. That failure mode is handled loudly rather than
left as leftovers: the swap catches it, routes the partition through
`recover_interrupted_swaps` (restoring the backup's rows alongside the
concurrent writer's new files), and raises. Schedule compaction/vacuum
in the ingest job's off-window, exactly as you would VACUUM/OPTIMIZE
on a table format without a transaction log.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.timeutil import parse_iso_z
from ..operators.latest import latest_snapshot

EVENT_DATE_PREFIX = "event_date="


def _partition_dirs(offline_path: str) -> list[str]:
    """`event_date=YYYY-MM-DD` partition directory names, sorted."""
    if not os.path.isdir(offline_path):
        return []
    return sorted(
        d
        for d in os.listdir(offline_path)
        if d.startswith(EVENT_DATE_PREFIX)
        and os.path.isdir(os.path.join(offline_path, d))
    )


def _data_files(part_dir: str) -> list[str]:
    return [
        f
        for f in os.listdir(part_dir)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]


def recover_interrupted_swaps(offline_path: str) -> list[str]:
    """Repair any partition whose stage-and-swap was interrupted — runs
    automatically at the start of every maintenance entry point (and is
    safe to call any time). The leftover combination identifies the
    crash point unambiguously:

    - ``.<d>.staging`` + ``.<d>.old`` present → crashed BETWEEN the two
      renames: ``.old`` holds the pre-crash rows. Its data files are
      moved back into the live dir (merging with — never overwriting —
      any files a later ingest appended; file names are UUID-unique),
      then both leftovers are dropped. Without this, the pre-crash rows
      were invisible to every read and one blind cleanup away from
      deletion.
    - ``.<d>.old`` alone → crashed AFTER the swap completed: the live
      dir already holds the new copy; the backup is superseded garbage.
    - ``.<d>.staging`` alone → crashed BEFORE the first rename: the
      live dir was never touched; the staging copy was never activated.

    Returns the partition dir names that needed repair.
    """
    if not os.path.isdir(offline_path):
        return []
    repaired: set[str] = set()
    for entry in sorted(os.listdir(offline_path)):
        if not (entry.startswith(".") and entry.endswith(".old")):
            continue
        d = entry[1 : -len(".old")]
        backup = os.path.join(offline_path, entry)
        staging = os.path.join(offline_path, f".{d}.staging")
        live = os.path.join(offline_path, d)
        if os.path.isdir(staging):
            # mid-swap crash: restore the pre-crash rows
            os.makedirs(live, exist_ok=True)
            for f in os.listdir(backup):
                if f.endswith(".parquet") and not f.startswith(("_", ".")):
                    os.rename(os.path.join(backup, f), os.path.join(live, f))
            shutil.rmtree(staging, ignore_errors=True)
            repaired.add(d)
        shutil.rmtree(backup, ignore_errors=True)
    for entry in sorted(os.listdir(offline_path)):
        if entry.startswith(".") and entry.endswith(".staging"):
            # pre-swap crash (or cleaned above): never activated
            shutil.rmtree(os.path.join(offline_path, entry), ignore_errors=True)
            repaired.add(entry[1 : -len(".staging")])
    return sorted(repaired)


def _stage_and_swap(df: DataFrame, offline_path: str, part_dir: str) -> None:
    """Write ``df`` as the new contents of ``offline_path/part_dir`` via
    a hidden staging directory and two renames — see the module
    docstring's crash-safety contract. Callers must have run
    `recover_interrupted_swaps` first (both public entry points do), so
    any leftover here is from THIS process's completed prior iteration
    and safe to clear."""
    live = os.path.join(offline_path, part_dir)
    staging = os.path.join(offline_path, f".{part_dir}.staging")
    backup = os.path.join(offline_path, f".{part_dir}.old")
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(backup, ignore_errors=True)
    df.write.mode("overwrite").parquet(staging, compression="snappy")
    os.rename(live, backup)
    try:
        os.rename(staging, live)
    except OSError as exc:
        # A concurrent ingest re-created the live dir between the two
        # renames — the module's single-writer contract was violated.
        # Repair immediately (restores the backup's rows alongside the
        # concurrent writer's files, drops the staging copy) and fail
        # loudly; leaving the leftovers for the NEXT maintenance run
        # would hide an ongoing writer conflict behind a clean return.
        offline = os.path.dirname(live)
        recover_interrupted_swaps(offline)
        raise RuntimeError(
            f"concurrent writer re-created {live!r} mid-swap; partition "
            "restored (original rows + concurrent files merged). Run "
            "maintenance in the ingest off-window — see the module "
            "concurrency contract."
        ) from exc
    shutil.rmtree(backup)


def compact_offline(
    spark: SparkSession,
    offline_path: str,
    files_per_partition: int = 1,
) -> dict[str, int]:
    """Rewrite every partition holding more than ``files_per_partition``
    data files down to exactly that many. Returns
    {partition_dir_name: files_before} for the rewritten partitions.
    Row content is untouched — the maintenance tests assert full-frame
    equality before/after. The source files are read lazily while the
    replacement is written to the staging sibling, so no in-memory copy
    of the partition is ever the only copy. Requires the single-writer,
    no-concurrent-reader window described in the module concurrency
    contract."""
    recover_interrupted_swaps(offline_path)
    rewritten: dict[str, int] = {}
    for d in _partition_dirs(offline_path):
        part_path = os.path.join(offline_path, d)
        n_files = len(_data_files(part_path))
        if n_files <= files_per_partition:
            continue
        # partition-dir read excludes the (directory-encoded) partition
        # column, so the rewrite carries exactly the original file schema
        sub = spark.read.parquet(part_path).coalesce(files_per_partition)
        _stage_and_swap(sub, offline_path, d)
        rewritten[d] = n_files
    return rewritten


def vacuum_offline(
    spark: SparkSession,
    offline_path: str,
    key_col: str,
    cutoff_iso: str,
    event_ts_col: str = "event_ts",
    tie_breaker: str = "ingest_seq",
    event_date_col: str = "event_date",
) -> list[str]:
    """Drop history strictly older than ``cutoff_iso`` (ISO-8601-Z,
    parsed by the engine's pinned `parse_iso_z` grammar), keeping each
    key's single LATEST old record iff the key has no record at/after
    the cutoff — so the latest view is bit-identical before and after
    (asserted in tests), including tombstone suppression. Only
    partitions dated STRICTLY before the cutoff's date are rewritten
    (removal is day-granular: a mid-day cutoff leaves the cutoff day's
    partition fully intact); returns the rewritten directory names.
    Requires the single-writer, no-concurrent-reader window described
    in the module concurrency contract.
    """
    # fail FAST on a malformed cutoff: a column-side parse returning
    # null would make every filter false and rewrite the pre-cutoff
    # partitions empty — destructive ops validate their inputs eagerly.
    # strptime ALONE is too lenient (it accepts unpadded month/day/hour,
    # which Spark's strict yyyy-MM-dd'T'HH:mm:ss'Z' grammar null-parses,
    # and an unpadded date also breaks the lexicographic partition-name
    # comparison below), so shape is pinned by regex first.
    import re
    from datetime import datetime

    if not re.fullmatch(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z", cutoff_iso):
        raise ValueError(
            f"vacuum cutoff must be zero-padded ISO-8601-Z, got {cutoff_iso!r}"
        )
    datetime.strptime(cutoff_iso, "%Y-%m-%dT%H:%M:%SZ")  # calendar validity
    recover_interrupted_swaps(offline_path)
    cutoff = parse_iso_z(F.lit(cutoff_iso))
    hist = spark.read.parquet(offline_path)
    recent_keys = (
        hist.filter(F.col(event_ts_col) >= cutoff).select(key_col).distinct()
    )
    old = hist.filter(F.col(event_ts_col) < cutoff)
    stale_latest = latest_snapshot(
        old.join(recent_keys, key_col, "left_anti"),
        key_col,
        event_ts_col,
        tie_breaker=tie_breaker,
    )
    # pin the kept rows before the loop starts swapping the partitions
    # the lazy plan would otherwise re-read mid-rewrite
    kept_old = stale_latest.localCheckpoint(eager=True)

    cutoff_date = cutoff_iso[:10]
    touched: list[str] = []
    for d in _partition_dirs(offline_path):
        if d[len(EVENT_DATE_PREFIX):] >= cutoff_date:
            continue
        sub = kept_old.filter(
            F.col(event_date_col) == F.lit(d[len(EVENT_DATE_PREFIX):]).cast("date")
        ).drop(event_date_col)
        _stage_and_swap(sub.coalesce(1), offline_path, d)
        touched.append(d)
    return touched

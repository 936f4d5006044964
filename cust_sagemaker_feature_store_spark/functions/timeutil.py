"""Timestamp normalization (SURVEY.md §2.8 F1-F3).

The reference carries event time as an ISO-8601-Z *string* and relies on
lexicographic order matching chronological order (reference:
historical_features.py:31 — `BETWEEN` on a STRING column). That works
only because fixed-width zero-padded ISO-8601-Z strings sort identically
to the instants they denote; these helpers guarantee we always emit that
exact format (reference: update_feature_store.py:35-36 strftime
"%Y-%m-%dT%H:%M:%SZ").

Ingest input uses a looser format — `2022-01-02 7:43:18`, unpadded hour,
no zone (reference: test_task_data.csv:2, parsed by pd.to_datetime at
update_feature_store.py:16) — handled by `parse_loose_timestamp`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO_Z_FORMAT = "yyyy-MM-dd'T'HH:mm:ss'Z'"
# Single-letter pattern fields accept unpadded values under Spark's
# default (CORRECTED) datetime parser, matching pandas' lenient parse.
LOOSE_FORMAT = "yyyy-M-d H:m:s"


def parse_loose_timestamp(col: Column | str) -> Column:
    """F1: `2022-01-02 7:43:18` (unpadded, zone-less, assumed UTC) -> timestamp."""
    return F.to_timestamp(F.col(col) if isinstance(col, str) else col, LOOSE_FORMAT)


def parse_iso_z(col: Column | str) -> Column:
    """F2: ISO-8601-Z string -> timestamp (session TZ pinned to UTC)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(c, ISO_Z_FORMAT)


def to_ltz(col: Column | str) -> Column:
    """Normalize any timestamp flavor to session-local TIMESTAMP (ltz).

    Epoch arithmetic (`unix_micros` & friends) rejects TIMESTAMP_NTZ, and
    parquet written as `timestamp[us]` *without* a zone surfaces as NTZ in
    Spark 3.5+. Under the engine's pinned UTC session zone the NTZ->LTZ
    cast is a wall-clock identity (the same equivalence DuckDB's `epoch()`
    relies on — see queries/relational6_q.py), so routing every
    epoch-consuming expression through this helper is semantics-free for
    correct data and an analysis-error fix for NTZ data. No-op for
    columns already typed TIMESTAMP.
    """
    return (F.col(col) if isinstance(col, str) else col).cast("timestamp")


def format_iso_z(col: Column | str) -> Column:
    """F3: timestamp -> ISO-8601-Z UTC string, second precision.

    Bit-for-bit the reference's wire format, so string BETWEEN filters
    (P2) behave identically.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, ISO_Z_FORMAT)

"""Wire-format casts and defaults (SURVEY.md §2.8 F4-F6, §2.2 P4).

The reference moves every value as a string ({FeatureName,
ValueAsString} pairs — reference: update_feature_store.py:41-46,
real_time_inference.py:25) and casts on read with a 0.0 default for
missing features (reference: real_time_inference.py:47,
update_feature_store.py:79-80).
"""

from __future__ import annotations

from pyspark.sql import Column, Row
from pyspark.sql import functions as F


def to_wire_string(col: Column | str) -> Column:
    """F4: any -> string, the reference's interchange representation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string")


def double_with_default(col: Column | str, default: float = 0.0) -> Column:
    """F5: string -> double, absent/unparseable -> `default`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c.cast("double"), F.lit(default))


def row_to_record(row: Row) -> list[dict[str, str]]:
    """API parity with the reference record shape: a list of
    {FeatureName, ValueAsString} dicts (reference:
    update_feature_store.py:41-46)."""
    return [
        {"FeatureName": k, "ValueAsString": "" if v is None else str(v)}
        for k, v in row.asDict().items()
    ]


def record_to_dict(record: list[dict[str, str]]) -> dict[str, str]:
    """F6: record list -> {name: string value} dict (reference:
    real_time_inference.py:25)."""
    return {f["FeatureName"]: f["ValueAsString"] for f in record}

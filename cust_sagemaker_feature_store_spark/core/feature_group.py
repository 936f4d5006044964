"""FeatureGroup: the engine's single data abstraction.

Mirrors the reference's feature-group declaration (reference:
setup.sh:78-89 — name `CustomerTransactions`, record identifier
`customer_id`, event-time feature `event_time`, explicit feature
definitions) as a plain dataclass holding a Spark StructType. The
schema is fixed and explicit: ingest must supply exactly the declared
features (reference: update_feature_store.py:41-46); unknown or missing
columns are rejected, matching the no-inference/no-evolution contract
(SURVEY.md §1.5).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# SageMaker feature types -> Spark types (reference: setup.sh:82-85 and
# the parallel Athena DDL setup.sh:133-138). Integral maps to 64-bit:
# at 100 TB key cardinality exceeds int32.
FEATURE_TYPE_TO_SPARK: dict[str, T.DataType] = {
    "Integral": T.LongType(),
    "Fractional": T.DoubleType(),
    "String": T.StringType(),
}


@dataclass(frozen=True)
class FeatureDefinition:
    name: str
    feature_type: str  # "Integral" | "Fractional" | "String"

    @property
    def spark_type(self) -> T.DataType:
        try:
            return FEATURE_TYPE_TO_SPARK[self.feature_type]
        except KeyError:
            raise ValueError(
                f"unknown feature type {self.feature_type!r}; "
                f"expected one of {sorted(FEATURE_TYPE_TO_SPARK)}"
            ) from None


@dataclass(frozen=True)
class FeatureGroup:
    """A named, schema-fixed logical table keyed by a record identifier
    and versioned by an event time (SURVEY.md §1.1)."""

    name: str
    record_identifier: str
    event_time_feature: str
    features: tuple[FeatureDefinition, ...] = field(default_factory=tuple)

    def __post_init__(self) -> None:
        names = [f.name for f in self.features]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate feature names in group {self.name!r}")
        for required in (self.record_identifier, self.event_time_feature):
            if required not in names:
                raise ValueError(
                    f"feature group {self.name!r}: required column {required!r} "
                    "is not among the declared features"
                )

    @property
    def feature_names(self) -> list[str]:
        return [f.name for f in self.features]

    @property
    def schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(f.name, f.spark_type, nullable=True) for f in self.features]
        )

    def validate_frame(self, df: DataFrame) -> DataFrame:
        """Enforce the declared schema on an incoming frame.

        Rejects unknown and missing columns (schema is fixed, no
        evolution — SURVEY.md §1.5) and casts each column to its
        declared type, reproducing the reference's cast-on-ingest of
        string wire values (reference: update_feature_store.py:41-46).
        """
        declared = set(self.feature_names)
        incoming = set(df.columns)
        if missing := declared - incoming:
            raise ValueError(f"missing feature columns: {sorted(missing)}")
        if unknown := incoming - declared:
            raise ValueError(f"unknown feature columns: {sorted(unknown)}")
        return df.select(
            *[df[f.name].cast(f.spark_type).alias(f.name) for f in self.features]
        )

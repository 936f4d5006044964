"""Z-order (Morton) data layout (SURVEY.md §4 [EXT] — scale lever).

Sorting 100 TB of parquet by ONE column makes that column's row-group
min/max stats selective and every other column's useless. Interleaving
the bits of several columns into one Morton key and range-partitioning
+ sorting by it gives every participating dimension ~|file|^(1/d)
locality, so multi-dimensional range predicates prune row groups on
ALL of them — the layout trick behind Delta/Iceberg OPTIMIZE ZORDER,
here as a plain DataFrame transformation a caller applies before a
partitioned write.

The bit interleave is pure JVM expression arithmetic (shift/mask/sum,
no UDF): `bits x ncols` terms inside whole-stage codegen. The SQL twin
(`sql_zvalue`) is generated from the same loop so the DuckDB oracle is
structurally identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of ``len(cols)`` non-negative int dimensions,
    each masked to ``bits`` low bits; dimension i contributes its bit b
    at output position ``b*ncols + i``."""
    ncols = len(cols)
    masked = [c.cast("long").bitwiseAND(F.lit((1 << bits) - 1)) for c in cols]
    out = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(masked):
            out = out + F.shiftleft(
                F.shiftright(c, b).bitwiseAND(F.lit(1)), b * ncols + i
            )
    return out


def sql_zvalue(exprs: list[str], bits: int = 16) -> str:
    """The same interleave as ANSI/DuckDB SQL, generated from the same
    loop so engine parity is by construction."""
    ncols = len(exprs)
    mask = (1 << bits) - 1
    terms = []
    for b in range(bits):
        for i, e in enumerate(exprs):
            # fully parenthesized: '+' binds TIGHTER than '<<' in SQL,
            # so an unparenthesized term sum reassociates the shifts
            terms.append(f"(((( ({e}) & {mask} ) >> {b}) & 1) << {b * ncols + i})")
    return "(" + " + ".join(terms) + ")"


def zorder_repartition(
    df: DataFrame,
    cols: list[Column],
    n_partitions: int,
    bits: int = 16,
    z_col: str = "__z",
) -> DataFrame:
    """Cluster rows for write: range-partition on the Morton key, sort
    within partitions — each output file then covers a narrow range of
    EVERY participating dimension (asserted in tests). Follow with a
    partitioned parquet write; readers get multi-dim row-group pruning
    for free from min/max stats."""
    return (
        df.withColumn(z_col, zvalue(cols, bits))
        .repartitionByRange(n_partitions, z_col)
        .sortWithinPartitions(z_col)
    )

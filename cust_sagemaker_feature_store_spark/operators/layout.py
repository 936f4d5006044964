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


# -- Hilbert layout (r5) ------------------------------------------------

def hilbert_value(xc: Column, yc: Column, bits: int = 16) -> Column:
    """2-D Hilbert index of two non-negative int dimensions (masked to
    ``bits`` low bits) — the better-locality sibling of the Morton key:
    consecutive index values are always ADJACENT cells (unit Manhattan
    step, asserted in tests), where Z-order takes long diagonal jumps
    at quadrant boundaries, so range scans over the sort key touch
    tighter x/y rectangles.

    Classic per-level rotate-and-accumulate (the public xy2d algorithm,
    n-1-flip orientation), expressed as ONE `aggregate` fold over the
    bit levels carrying a (x, y, d) struct accumulator. A fold, not an
    unrolled column chain: each level's x'/y' reference both x and y,
    so inlining (CollapseProject) would square the expression tree per
    level — the fold keeps the plan linear in `bits`. Shift-by-column
    is spelled `(v / 2^lvl)::long % 2` (exact for v < 2^53), because
    Spark's shiftright only takes literal shift amounts.
    """
    n1 = (1 << bits) - 1
    x0 = xc.cast("long").bitwiseAND(F.lit(n1))
    y0 = yc.cast("long").bitwiseAND(F.lit(n1))
    init = F.struct(
        x0.alias("x"), y0.alias("y"), F.lit(0).cast("long").alias("d")
    )
    levels = F.sequence(F.lit(bits - 1), F.lit(0), F.lit(-1))

    def step(acc: Column, lvl: Column) -> Column:
        x, y, d = acc["x"], acc["y"], acc["d"]
        s = F.pow(F.lit(2.0), lvl).cast("long")
        rx = (x / s).cast("long") % 2
        ry = (y / s).cast("long") % 2
        new_d = d + s * s * (F.lit(3) * rx).bitwiseXOR(ry)
        flip = rx == 1
        keep = ry == 1
        new_x = F.when(keep, x).otherwise(
            F.when(flip, F.lit(n1) - y).otherwise(y)
        )
        new_y = F.when(keep, y).otherwise(
            F.when(flip, F.lit(n1) - x).otherwise(x)
        )
        return F.struct(
            new_x.alias("x"), new_y.alias("y"), new_d.alias("d")
        )

    return F.aggregate(levels, init, step, lambda acc: acc["d"])


def sql_hilbert_query(
    table: str,
    id_expr: str,
    id_alias: str,
    x_expr: str,
    y_expr: str,
    out_alias: str = "hval",
    bits: int = 16,
) -> str:
    """DuckDB twin of ``hilbert_value`` as a full query: the same
    per-level rotate-and-accumulate UNROLLED into one chained CTE per
    bit level, generated from the same loop so engine parity is by
    construction (integer `//` shifts mirror the cast-truncate shifts;
    both floor for non-negative operands).

    Unrolled CTEs rather than a list_reduce fold on purpose: DuckDB
    1.0.0's list_reduce returns wrong results when list elements
    reference outer columns (literals fold fine — verified both ways),
    so the lambda form can't serve as an oracle."""
    n1 = (1 << bits) - 1
    parts = [
        f"""
WITH h{bits} AS (
  SELECT {id_expr} AS {id_alias},
         CAST(({x_expr}) & {n1} AS BIGINT) AS hx,
         CAST(({y_expr}) & {n1} AS BIGINT) AS hy,
         CAST(0 AS BIGINT) AS hd
  FROM {table}
)"""
    ]
    for lvl in range(bits - 1, -1, -1):
        s = 1 << lvl
        rx = f"((hx // {s}) % 2)"
        ry = f"((hy // {s}) % 2)"
        parts.append(
            f""",
h{lvl} AS (
  SELECT {id_alias},
         CASE WHEN {ry} = 1 THEN hx
              WHEN {rx} = 1 THEN {n1} - hy
              ELSE hy END AS hx,
         CASE WHEN {ry} = 1 THEN hy
              WHEN {rx} = 1 THEN {n1} - hx
              ELSE hx END AS hy,
         hd + {s} * {s} * xor(3 * {rx}, {ry}) AS hd
  FROM h{lvl + 1}
)"""
        )
    parts.append(f"\nSELECT {id_alias}, hd AS {out_alias} FROM h0")
    return "".join(parts)


def hilbert_repartition(
    df: DataFrame,
    x: Column,
    y: Column,
    n_partitions: int,
    bits: int = 16,
    h_col: str = "__h",
) -> DataFrame:
    """Cluster rows for write on the Hilbert key (see
    zorder_repartition — same usage, tighter per-file rectangles)."""
    return (
        df.withColumn(h_col, hilbert_value(x, y, bits))
        .repartitionByRange(n_partitions, h_col)
        .sortWithinPartitions(h_col)
    )

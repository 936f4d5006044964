"""Query registry: the engine's declared query surface.

Each entry pairs a Spark implementation (``fn(spark, sf_dir) ->
DataFrame``) with an equivalent ANSI-SQL oracle string runnable by
DuckDB on the same parquet tables. The driver hash-compares both at
sf0.01 (row count + schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- floating-point aggregates use *exact decimal arithmetic*: per-row
  round to the value's true decimal grid, scale to integer, sum as
  64-bit ints (exact in both engines), divide back once. This removes
  summation-order nondeterminism entirely instead of hoping a final
  round() lands the same way;
- rankings always carry a unique tie-breaker column so top-k and
  window queries are order-deterministic in both engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => driver runs a rows-only check
    description: str = ""
    # Eager "finisher" queries (iterative ML / graph loops, floor
    # checks) execute their heavy passes inside fn() and return a
    # driver-built createDataFrame result, so the result's physical
    # plan is just `Scan ExistingRDD` — vacuous for the plan audit
    # (r14 verdict: that blind spot hid a corpus-scale single-
    # partition window). Such queries MUST expose their heavy
    # intermediate frames here: a callable (spark, sf_dir) ->
    # dict[label, DataFrame] returning LAZY frames (no execution,
    # placeholder scalars where a pass needs results of a prior
    # pass — plan SHAPE is what's audited). tools/plan_audit.py
    # walks these as sub-rows; tests/test_plans.py fails any
    # ExistingRDD-rooted registry query that lacks the hook.
    audit_frames: (
        Callable[[SparkSession, str], dict[str, DataFrame]] | None
    ) = None


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    description: str = "",
    audit_frames: (
        Callable[[SparkSession, str], dict[str, DataFrame]] | None
    ) = None,
):
    """Decorator: add a query to the engine's declared surface."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            description=description,
            audit_frames=audit_frames,
        )
        return fn

    return deco


# -- exact decimal arithmetic helpers -----------------------------------

def dsum(expr: Column, decimals: int) -> Column:
    """Exact sum of a fixed-decimal double column: scale to int64, sum
    exactly, scale back. Deterministic across engines and summation
    orders, unlike a float sum."""
    scale = 10**decimals
    return F.sum(F.round(expr * scale).cast("long")) / float(scale)


def sql_dsum(expr: str, decimals: int) -> str:
    scale = 10**decimals
    return f"SUM(CAST(ROUND(({expr})*{scale}) AS BIGINT))/{scale}.0"


def davg(expr: Column, decimals: int) -> Column:
    """Exact mean of a fixed-decimal column: exact int sum, one division."""
    scale = 10**decimals
    return (
        F.sum(F.round(expr * scale).cast("long")) / float(scale) / F.count(F.lit(1))
    )


def sql_davg(expr: str, decimals: int) -> str:
    scale = 10**decimals
    return f"SUM(CAST(ROUND(({expr})*{scale}) AS BIGINT))/{scale}.0/COUNT(*)"


ISO_SPARK = "yyyy-MM-dd'T'HH:mm:ss'Z'"
ISO_DUCK = "%Y-%m-%dT%H:%M:%SZ"


def iso(col: str) -> Column:
    """Timestamp -> ISO-8601-Z string (the reference wire format)."""
    return F.date_format(col, ISO_SPARK)


def sql_iso(col: str) -> str:
    return f"strftime({col}, '{ISO_DUCK}')"

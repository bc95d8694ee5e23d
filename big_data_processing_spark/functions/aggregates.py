"""Deterministic (order-independent) floating aggregates.

Plain ``SUM(double)`` is order-dependent in the last ulps — partition
count, shuffle layout, and AQE re-planning all change the summation
order, so the "same" query can return different low bits run to run
(and across engines). That is poison for exactly-once result hashing
and for regression-testing a 1000-executor job against a 1-node oracle.

The engine's answer: **sum in DECIMAL, serve in double**. Casting each
operand to a fixed-scale decimal makes the aggregation exact and
associative — any partitioning, any order, one bit-identical result.
``avg``/``stddev`` are then derived from exact moments with pure
IEEE-754 arithmetic, which is itself deterministic given identical
inputs.

Pick ``scale`` ≥ the data's true decimal precision (money: 2; derived
prices with 3 factor terms: 6; raw measurement doubles: 9) so the cast
is value-preserving, not lossy.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# precision 27 leaves sum headroom of 10^(27-scale-?) rows in Spark's
# SUM(DECIMAL(27,s)) → DECIMAL(38,s) widening — ample at 100 TB row counts
_PRECISION = 27


def _dec(col: Column | str, scale: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({_PRECISION},{scale})")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent SUM: exact decimal accumulation, double result.

    The decimal→double conversion goes through a string: when the exact
    sum exceeds ~16 significant digits, direct decimal→double casts are
    not correctly rounded the same way in every engine (int128/10^s
    double-rounding), while string→double parsing is correctly rounded
    everywhere — keeping results bit-identical across engines.
    """
    return F.sum(_dec(col, scale)).cast("string").cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Order-independent AVG: exact decimal sum / non-null count."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def dstddev(col: Column | str, scale: int = 2) -> Column:
    """Order-independent sample stddev from exact first/second moments:
    sqrt((Σx² − (Σx)²/n) / (n−1)). The x² scale doubles, so headroom
    shrinks — fine for measure columns, don't feed it 10^13-scale values.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    s1 = dsum(c, scale)
    s2 = (
        F.sum((c * c).cast(f"decimal({_PRECISION + 8},{min(2 * scale, 9)})"))
        .cast("string")
        .cast("double")
    )
    return F.sqrt((s2 - s1 * s1 / n) / (n - F.lit(1.0)))


def dsum_sql(expr: str, scale: int = 2) -> str:
    """DuckDB/ANSI twin of :func:`dsum` for oracle SQL strings."""
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL({_PRECISION},{scale}))) AS VARCHAR) AS DOUBLE)"
    )


def dsum_sql_spark(expr: str, scale: int = 2) -> str:
    """Spark-SQL-dialect twin of :func:`dsum_sql` (STRING vs VARCHAR)
    for entries that build their Spark side as SQL text (GROUPING
    SETS).  Derived from the same ``_PRECISION`` so retuning the
    precision can never silently diverge the two dialects."""
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL({_PRECISION},{scale}))) AS STRING) AS DOUBLE)"
    )


def davg_sql(expr: str, scale: int = 2) -> str:
    return f"({dsum_sql(expr, scale)} / COUNT({expr}))"


def dstddev_sql(expr: str, scale: int = 2) -> str:
    s2 = (
        f"CAST(CAST(SUM(CAST(({expr}) * ({expr}) AS "
        f"DECIMAL({_PRECISION + 8},{min(2 * scale, 9)}))) AS VARCHAR) AS DOUBLE)"
    )
    s1 = dsum_sql(expr, scale)
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    return f"SQRT(({s2} - {s1} * {s1} / {n}) / ({n} - 1.0))"

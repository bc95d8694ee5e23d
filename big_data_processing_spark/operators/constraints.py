"""Data-quality constraint checking: declarative row-level CHECKs and
referential-integrity probes, reported as violation counts.

The lakehouse expectation layer (Delta CHECK constraints, dbt tests,
Great Expectations) boiled down to its Spark-native core:

- ``constraint_report`` evaluates ALL row-level predicates in ONE scan
  — each check is a ``CASE WHEN`` inside a single partial+final
  aggregate (map-side combinable, no per-check pass), then the wide
  1-row result is unpivoted to (check_name, n_violations) with
  ``stack`` — row-local, no shuffle.
- ``fk_orphan_count`` counts child keys with no parent — a left-anti
  join on the key (broadcast when the parent key set is dim-sized,
  shuffle-co-partitioned otherwise; AQE decides from runtime sizes).

Null semantics are deliberately strict: a predicate that is NULL for a
row counts as a VIOLATION (CASE WHEN p THEN 0 ELSE 1 END — data
expectations are null-hostile, unlike SQL CHECK which null-passes).
State the null case inside the predicate (`col.isNull() | (col > 0)`)
to allow nulls explicitly.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def constraint_report(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """One row per check: (check_name, n_rows, n_violations, passed).

    Single scan regardless of the number of checks; n_rows is the
    table count so the report is self-describing about coverage.
    """
    if not checks:
        raise ValueError("constraint_report requires at least one check")
    # Check names are interpolated into the stack() SQL below; restrict
    # them to identifier characters so a quote/backtick can neither
    # break parsing nor alter the expression (ADVICE r4).
    bad = [n for n in checks if not re.fullmatch(r"[A-Za-z0-9_]+", n)]
    if bad:
        raise ValueError(
            f"check names must match [A-Za-z0-9_]+: {bad!r}"
        )
    # Spark's default resolver is case-INsensitive, so any case variant
    # of the internal row-counter alias would make the final select
    # ambiguous — reject them all up front.
    if any(n.lower() == "_n_rows" for n in checks):
        raise ValueError("check name '_n_rows' collides with the row counter")
    aggs = [F.count(F.lit(1)).cast("long").alias("_n_rows")]
    for name, cond in checks.items():
        aggs.append(
            F.sum(F.when(cond, 0).otherwise(1)).cast("long").alias(name)
        )
    wide = df.agg(*aggs)
    pairs = ", ".join(f"'{n}', `{n}`" for n in checks)
    return wide.select(
        F.expr(f"stack({len(checks)}, {pairs}) as (check_name, n_violations)"),
        F.col("_n_rows").alias("n_rows"),
    ).select(
        "check_name",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).cast("int").alias("passed"),
    )


def fk_orphan_count(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str
) -> DataFrame:
    """(n_rows, n_violations) of child rows whose key has no parent."""
    orphans = child.select(F.col(child_key).alias("_k")).join(
        parent.select(F.col(parent_key).alias("_k")),
        "_k",
        "left_anti",
    )
    return child.agg(F.count(F.lit(1)).cast("long").alias("n_rows")).crossJoin(
        orphans.agg(F.count(F.lit(1)).cast("long").alias("n_violations"))
    )

"""Time-series table operators: calendar gap-fill with forward-fill,
and SCD Type-2 interval construction from a change stream.

Both are pure DataFrame compositions (sequence/explode for the date
spine, last(ignorenulls) / lag / lead windows for the fills and
intervals) — no UDFs, fully codegen'd, and the only shuffles are the
per-entity hash partitions the semantics require.

Scale: every window here partitions by the entity key (user_id,
custkey), so parallelism is |entities| — millions at 100 TB, never a
single global sort.  The date spine is generated row-locally with
``sequence()`` (no crossJoin against a calendar table, no driver loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_ffill(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tie_col: str,
) -> DataFrame:
    """Daily gap-fill per entity with forward-fill of the last value.

    Collapses ``df`` to one row per (entity, day) — the value of the
    LAST event that day, ties broken by ``tie_col`` so the result is
    identical under any partitioning — then explodes each entity's
    [min_day, max_day] span into a dense spine and forward-fills
    missing days with ``last(value, ignorenulls=True)``.

    Output: (entity, day DATE, value_filled, is_observed INT).
    Days before an entity's first observation stay NULL (nothing to
    carry) — callers see them flagged is_observed = 0.
    """
    day = F.to_date(F.col(ts_col))
    # one row per (entity, day): last event's value
    daily = (
        df.withColumn("_rn", F.row_number().over(
            Window.partitionBy(F.col(entity_col), day).orderBy(
                F.desc(ts_col), F.desc(tie_col)
            )
        ))
        .filter(F.col("_rn") == 1)
        .select(
            F.col(entity_col).alias("entity"),
            day.alias("day"),
            F.col(value_col).alias("value_obs"),
        )
    )
    spine = (
        daily.groupBy("entity")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "entity",
            F.explode(F.sequence("d0", "d1")).alias("day"),
        )
    )
    w = (
        Window.partitionBy("entity")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["entity", "day"], "left")
        .select(
            "entity",
            "day",
            F.last("value_obs", ignorenulls=True).over(w).alias("value_filled"),
            F.when(F.col("value_obs").isNotNull(), 1).otherwise(0)
            .cast("int")
            .alias("is_observed"),
        )
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tie_col: str,
    open_end: str = "9999-12-31",
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 history from a change stream.

    Orders each key's rows by (ts, tie), keeps only rows where the
    attribute CHANGED (lag != current, first row always kept), and
    assigns [valid_from, valid_to) intervals with lead(); the last
    interval is open-ended (``open_end``) and flagged is_current.

    Output: (key, attr, anchor = tie_col of the change row — a unique
    per-interval anchor so downstream hashing has a total order —
    valid_from DATE, valid_to DATE-as-string semantics left to caller,
    is_current INT).
    """
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(tie_col))
    changed = (
        df.withColumn("_prev", F.lag(attr_col).over(w))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr_col)))
    )
    # lead() over the surviving change rows chains the intervals
    nxt = F.lead(F.to_date(F.col(ts_col))).over(w)
    return changed.select(
        F.col(key_col).alias("key"),
        F.col(attr_col).alias("attr"),
        F.col(tie_col).alias("anchor"),
        F.to_date(F.col(ts_col)).alias("valid_from"),
        F.coalesce(nxt, F.to_date(F.lit(open_end))).alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).cast("int").alias("is_current"),
    )

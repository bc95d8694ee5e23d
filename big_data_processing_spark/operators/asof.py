"""As-of (point-in-time) join — an operator Spark's DataFrame API lacks
natively, expressed as a composition of built-ins with NO pairwise
blowup: for every left row (key, t) attach the payload of the most
recent right row with the same key and right_time <= t (backward,
inclusive).

The scalable construction (the standard trick for time-series
point-in-time correctness): tag both inputs, union them, and run ONE
window pass per key ordered by (time, side) carrying the right payload
forward with ``last(ignorenulls=True)``. Cost is a single shuffle on
the key plus a per-key sort — same shape as any windowed aggregate, no
range-join explosion, no per-key driver loop. At 100 TB both sides
shuffle once; skewed keys can be salted upstream like any window.

The naive alternative — equi-join on key with t_r <= t then
max-per-row dedup — multiplies each left row by ALL earlier right rows
before pruning; at scale the union-window plan is strictly better.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    time_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: every ``left`` row gains ``payload_cols`` from
    the latest ``right`` row with matching ``on`` keys and
    ``right[time_col] <= left[time_col]`` (null when none precedes).

    ``right`` must be unique per (on, time_col) — pre-dedupe with a
    row_number if it is not, otherwise the pick among ties is
    partition-order-dependent. All ``left`` columns are preserved;
    ``payload_cols`` must not collide with them (raises — a collision
    would silently null out the left column).
    """
    lcols = left.columns
    clash = set(payload_cols) & set(lcols)
    if clash:
        raise ValueError(
            f"asof_join_backward: payload columns {sorted(clash)} already "
            f"exist on the left side — rename one side before joining"
        )
    l2 = left.withColumn("__side", F.lit(1))
    for p in payload_cols:
        l2 = l2.withColumn(p, F.lit(None).cast(dict(right.dtypes)[p]))

    r2 = right.select(*on, time_col, *payload_cols).withColumn("__side", F.lit(0))
    for c in lcols:
        if c not in set(on) | {time_col}:
            r2 = r2.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    u = l2.unionByName(r2.select(*l2.columns))
    # right rows sort BEFORE left rows at equal time (side 0 < 1), so
    # the backward join is inclusive of exactly-equal timestamps
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(time_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Carry ONE struct guarded by side, not per-column last(): a
    # per-column carry would let a NULL payload value fall through to
    # an OLDER right row — and stitch different payload columns from
    # different right rows. The struct is non-null for every right row
    # (even when all its fields are null), so last(ignorenulls) always
    # stops at the single matched row and preserves its NULL fields —
    # true as-of semantics (what a native ASOF JOIN returns).
    u = u.withColumn(
        "__p",
        F.when(F.col("__side") == 0, F.struct(*[F.col(p) for p in payload_cols])),
    )
    u = u.withColumn("__p", F.last("__p", ignorenulls=True).over(w))
    for p in payload_cols:
        u = u.withColumn(p, F.col("__p").getField(p))
    return u.filter(F.col("__side") == 1).drop("__side", "__p")

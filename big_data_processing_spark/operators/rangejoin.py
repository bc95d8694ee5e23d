"""Bucketized range (interval) join — the scalable form of
``a JOIN b ON a.key = b.key AND b.t BETWEEN a.lo AND a.hi``.

Spark's optimizer turns a raw inequality join into a sort-merge over
the equi-keys with a post-filter at best, and a broadcast-nested-loop
at worst. The bucketized form makes the time dimension part of the
EQUI key: intervals are exploded to the fixed-width buckets they
overlap, points map to exactly one bucket, and the join runs as a
plain hash join on (key, bucket) followed by the exact range filter.

Cost model: each interval of width W produces ceil(W/bucket)+1 rows;
points produce one. Choose ``bucket_width`` close to the typical
interval width so the blowup factor stays ~2 and every bucket's
population is bounded — at 100 TB this is a normal equi-shuffle, no
quadratic corner. Degenerate hot buckets (everything in one hour)
behave like any skewed join key: salt or widen the bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketize_interval(lo: Column, hi: Column, bucket_width: Column) -> Column:
    """Array of every bucket index the closed interval [lo, hi] touches
    (``lo``/``hi``/``bucket_width`` in the same integer unit)."""
    return F.sequence(
        F.floor(lo / bucket_width).cast("long"),
        F.floor(hi / bucket_width).cast("long"),
    )


def range_join(
    intervals: DataFrame,
    points: DataFrame,
    key_cols: list[str],
    lo_col: str,
    hi_col: str,
    t_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner join of ``points`` to every ``intervals`` row with matching
    ``key_cols`` and ``points[t_col]`` in the closed range
    ``[lo_col, hi_col]`` — executed as a (key, bucket) hash join, never
    a nested loop.

    Columns from both inputs are preserved (name collisions beyond the
    keys must be resolved by the caller). ``lo/hi/t`` are integer
    columns in the same unit as ``bucket_width``.
    """
    bw = F.lit(bucket_width)
    iv = intervals.withColumn(
        "__bucket",
        F.explode_outer(bucketize_interval(F.col(lo_col), F.col(hi_col), bw)),
    )
    pt = points.withColumn(
        "__bucket", F.floor(F.col(t_col) / bw).cast("long")
    )
    joined = iv.join(pt, [*key_cols, "__bucket"]).filter(
        (F.col(t_col) >= F.col(lo_col)) & (F.col(t_col) <= F.col(hi_col))
    )
    return joined.drop("__bucket")

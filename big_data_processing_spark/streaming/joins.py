"""Stream-stream interval join — the streaming twin of the batch
bucketized range join (operators/rangejoin.py): attribute each purchase
to the same user's activity in the preceding lookback window, over two
UNBOUNDED streams.

Structured Streaming runs this as a stateful symmetric hash join: both
sides buffer rows keyed by user until the watermark proves no earlier
match can still arrive, then evict. The time-range predicate is what
lets the engine bound the buffer — without it (a pure equi-join of two
streams) state would grow forever. State size ≈ events within
(watermark + lookback) per active user, independent of stream length —
the property that makes the operator safe on an unbounded 100 TB/day
feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_attribution_join(
    activity: DataFrame,
    purchases: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Join purchase events to the same user's activity events whose
    timestamp falls in [purchase_ts - lookback, purchase_ts].

    Both inputs are streaming DataFrames with (user_id, event_id, ts)
    (+ payload columns on ``activity``). Returns one row per
    (activity, purchase) pair with the purchase columns prefixed p_."""
    a = activity.withWatermark("ts", watermark)
    p = (
        purchases.select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("p_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("ts") <= F.col("p_ts"))
        & (F.col("ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return a.join(p, cond, "inner").drop("p_user_id")


def streaming_attribution_join_outer(
    activity: DataFrame,
    purchases: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """LEFT OUTER stream-stream form of the attribution join: every
    purchase emits — joined to each same-user activity row in
    [purchase_ts - lookback, purchase_ts] when one exists, or ONCE
    with NULL activity columns when the watermark has proven no
    matching activity can still arrive ("purchases with no preceding
    engagement", the un-attributable-conversion feed).

    The NULL row cannot be emitted eagerly — a match may still be in
    flight — so Structured Streaming holds the unmatched purchase in
    state and releases it only after the global watermark passes its
    join window. Consequence for consumers: outer results are delayed
    by up to (watermark + lookback), and the query needs a batch AFTER
    the watermark advance (a later micro-batch or a no-data batch) for
    the NULLs to flush. State stays bounded exactly as in the inner
    form: events within (watermark + lookback) per active user."""
    p = (
        purchases.select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("p_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    a = activity.withWatermark("ts", watermark)
    cond = (
        (F.col("p_user_id") == F.col("user_id"))
        & (F.col("ts") <= F.col("p_ts"))
        & (F.col("ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    return p.join(a, cond, "leftOuter")


def stream_static_enrich(
    events: DataFrame,
    dim: DataFrame,
    on: str,
    group_col: str,
    watermark: str = "1 hour",
    window: str = "1 hour",
) -> DataFrame:
    """Stream-static dimension enrichment + windowed rollup: the third
    join mode beside batch-batch and stream-stream — an unbounded
    event stream joined to a BOUNDED dimension table, then aggregated
    per (event-time window, dimension attribute).

    Execution shape: the static side is re-planned per micro-batch, so
    a dim under the broadcast threshold ships as a broadcast hash join
    — the streaming side never shuffles for the join, exactly like the
    batch fact⋈dim plans (reference J1/J2). (Dim UPDATES mid-query
    require a catalog/table-format static side — a plain path-based
    parquet DataFrame pins its file listing at plan time, and an
    overwrite under it fails the query; swap in a txnlog/catalog read
    for slowly-changing dims.) The join adds NO state (only the windowed aggregate holds state, bounded by
    the watermark horizon) — the property that distinguishes it from a
    stream-stream join and keeps it safe on an unbounded feed.
    """
    ev = events.withWatermark("ts", watermark)
    joined = ev.join(F.broadcast(dim), on, "left")
    return joined.groupBy(
        F.window("ts", window).alias("w"), group_col
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )

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

"""Skew-handling operators: salting for hot keys.

At 100 TB a handful of hot keys (a viral document, a default user_id,
an empty-string join key) can put 100x the median load on one reducer.
AQE's skew-join splitting (enabled in session.py) handles the join
case at runtime; these helpers handle the aggregation case and the
pre-planned join case deterministically.

``salted_aggregate`` runs the classic two-phase plan:
  groupBy(key, salt) partial-agg  →  groupBy(key) final-agg
The first shuffle spreads each hot key over ``salt_buckets`` reducers;
the second is tiny (|keys| x |buckets| rows). Works for any algebraic
aggregate (sum/count/min/max — pass the merge expressions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_buckets: int, salt_col: str = "_salt") -> DataFrame:
    """Uniform random salt column in [0, salt_buckets). Salting is
    load-balancing only — results never depend on the salt values."""
    return df.withColumn(
        salt_col, (F.rand(seed=42) * salt_buckets).cast("int")
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation over salted keys.

    ``partial_aggs`` aggregate within (keys, salt); ``final_aggs``
    merge the partials per key — e.g. partial ``sum(x) as s`` then
    final ``sum(s) as total``.
    """
    salted = with_salt(df, salt_buckets)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-proof fact⋈dim: replicate the (small) dim once per salt
    bucket and join on (key, salt). Use when the dim is broadcastable
    but a single fact key is hot enough to overload even map-side join
    tasks downstream — the salt keys spread the subsequent shuffle."""
    salted_fact = with_salt(fact, salt_buckets)
    replicated = dim.crossJoin(
        F.broadcast(
            dim.sparkSession.range(salt_buckets).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    return salted_fact.join(F.broadcast(replicated), [key, "_salt"]).drop("_salt")

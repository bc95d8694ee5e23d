"""Operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *by: str, cap: int | None = None) -> DataFrame:
    """Repartition narrow inputs so CPU-dense per-row stages use every
    core — a no-op when the input already has enough splits.

    Small local parquet files arrive as one partition (one row group),
    which serializes hashing/shingling/decimal aggregation onto a
    single task. At cluster scale inputs already carry hundreds of
    splits and this returns the frame untouched — the shuffle is only
    paid exactly when it buys parallelism.

    ``cap`` bounds the fan-out for stages with per-partition fixed
    costs (Python workers in mapInPandas: starting 32 workers for 5k
    rows costs more than it saves — 8 is the measured sweet spot for
    narrow inputs; at real scale the input is already wide and this
    path never triggers).
    """
    if df.isStreaming:
        # Streaming frames carry their own micro-batch partitioning and
        # cannot be repartitioned here; the caller's shuffle ops handle it.
        return df

    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if cap:
        target = min(target, cap)

    # Estimate the scan's split count from public file metadata instead
    # of df.rdd.getNumPartitions(): the RDD conversion forces a full
    # physical-plan translation per call (planner overhead on every
    # query using spread). len(inputFiles()) lower-bounds the number of
    # scan splits — small local files are 1 split each, and at real
    # scale a table has far more files than cores, so this returns the
    # frame untouched exactly when the shuffle buys nothing.
    try:
        n_splits = len(df.inputFiles())
    except Exception:
        n_splits = 0
    if n_splits == 0:
        # no backing files (createDataFrame / foreachBatch / derived
        # in-memory frame): the file heuristic can't see the current
        # partitioning — fall back to the RDD count rather than paying
        # an unconditional shuffle for frames that are already wide.
        try:
            n_splits = df.rdd.getNumPartitions()
        except Exception:
            n_splits = 0
    if n_splits >= max(2, target // 2):
        return df
    return df.repartition(target, *by) if by else df.repartition(target)

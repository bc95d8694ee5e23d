"""Top-k-per-group — the reference's signature ranking pattern (W1:
top-3 hottest months per year, weather_spark_analysis_new.py:363-367),
generalized."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column],
    k: int = 3,
    rank_col: str = "rank",
) -> DataFrame:
    """Keep the k best rows per group by row_number.

    Callers must include a unique tie-break column in ``order_by`` for
    deterministic results. Scale: single hash shuffle on the partition
    keys; Spark's WindowGroupLimit pushes the k-filter below the sort so
    each task keeps only k rows per group before the final window.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w).cast("int"))
        .filter(F.col(rank_col) <= k)
    )

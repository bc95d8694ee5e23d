"""Sink tests (S8-S10 replacements): partitioned parquet serving tables
and timestamped CSV snapshots."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from big_data_processing_spark.sources.readers import load_table
from big_data_processing_spark.sources.writers import write_csv_snapshot, write_table

from .conftest import TEST_SF_DIR


def test_write_table_partitioned(spark, tmp_path):
    o = load_table(spark, TEST_SF_DIR, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    write_table(o, out, partition_by=["order_year"], sort_by=["o_orderkey"])
    parts = sorted(p.name for p in Path(out).glob("order_year=*"))
    assert len(parts) > 1
    back = spark.read.parquet(out)
    assert back.count() == o.count()
    # partition pruning: a year filter must scan only that partition
    one_year = back.filter(F.col("order_year") == 1995)
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(order_year" in plan


def test_write_csv_snapshot(spark, tmp_path):
    df = load_table(spark, TEST_SF_DIR, "nation")
    path = write_csv_snapshot(df, str(tmp_path / "snap"), ts=12345)
    assert path.endswith("/12345")
    back = spark.read.option("header", "true").csv(path)
    assert back.count() == df.count()

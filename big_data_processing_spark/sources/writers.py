"""Sinks (reference S8-S11) — all distributed ``df.write`` paths.

The reference's sinks are driver-side anti-patterns this engine
deliberately replaces:
- S8: df.collect() + 1000-row INSERT VALUES batches into ClickHouse
  (weather_spark_analysis_new.py:109-178) → ``write_table`` (parquet,
  partitioned, executor-parallel; JDBC variant for real external DBs);
- S9: TSV HTTP bulk load (load_mapreduce_output.py:121-178) → same;
- S10: Hive INSERT OVERWRITE DIRECTORY with timestamp-suffixed CSV dirs
  (02_query1_top_cities.hql:7-8) → ``write_csv_snapshot``;
- S11: the meta.updated_time watermark loader → subsumed by streaming
  checkpoints (see streaming.ingest).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
) -> None:
    """Columnar serving table: parquet, optionally partitioned (the
    engine's answer to MergeTree ORDER BY keys — partition pruning +
    row-group min/max stats give the same scan-skipping)."""
    out = df
    if partition_by and sort_by:
        out = df.repartition(*partition_by).sortWithinPartitions(*sort_by)
    elif sort_by:
        out = df.sortWithinPartitions(*sort_by)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv_snapshot(df: DataFrame, base_path: str, ts: int | None = None) -> str:
    """Timestamp-suffixed CSV snapshot dir (S10's INSERT OVERWRITE
    DIRECTORY + run_hive_analysis.py:344-360 timestamped layout).
    Returns the written path so callers can record it."""
    path = f"{base_path.rstrip('/')}/{ts or int(time.time())}"
    df.write.mode("overwrite").option("header", "true").csv(path)
    return path


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 32,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed+sorted catalog table: pre-partitions the data on a join
    key so every subsequent join/aggregate on that key runs WITHOUT an
    exchange (verified in tests/test_scale_techniques.py). The 100 TB
    strategy for facts joined repeatedly on the same key — pay the
    shuffle once at write time, never at query time."""
    writer = (
        df.write.mode(mode).bucketBy(n_buckets, bucket_key).sortBy(bucket_key)
    )
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def merge_upsert(
    spark,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
) -> None:
    """MERGE-style upsert into a parquet table: rows matching on
    ``key_cols`` are replaced by the update, others kept, new keys
    appended — the reference's ClickHouse TRUNCATE+reload and the
    watermark loader (S11) folded into one idempotent operation.

    Implementation is read→anti-join→union→rewrite (parquet has no
    transaction log; on Delta/Iceberg this maps to a native MERGE
    that rewrites only matching files). The rewrite stages to a temp
    dir first so a failed job never leaves a half-written target."""
    import shutil
    import uuid

    try:
        target = spark.read.parquet(target_path)
        kept = target.join(updates.select(*key_cols), key_cols, "left_anti")
        merged = kept.unionByName(updates)
    except Exception:  # first load: target doesn't exist yet
        merged = updates
    tmp = f"{target_path.rstrip('/')}__staging_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(target_path, ignore_errors=True)
    shutil.move(tmp, target_path)


def write_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "append", **options: str
) -> None:
    """External-DB sink for deployments that truly need one (the
    ClickHouse role): executor-parallel JDBC batches, never a driver
    collect. Untested here (no JDBC endpoint in this environment)."""
    df.write.mode(mode).format("jdbc").option("url", url).option(
        "dbtable", table
    ).options(**options).save()

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
from pyspark.sql import functions as F


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


def _hadoop_fs(spark, path_str: str):
    """(FileSystem, Path) for any Hadoop-supported scheme — file://,
    hdfs://, s3a://. All merge_upsert file manipulation goes through
    this so the operation works unchanged on a real cluster (the
    driver-side ``shutil`` it replaces was local-FS-only)."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(path_str)
    return path.getFileSystem(spark._jsc.hadoopConfiguration()), path


def _swap_dir(spark, src: str, dst: str) -> None:
    """Atomic-as-the-FS-allows replace of dst with src (delete+rename)."""
    fs, dst_p = _hadoop_fs(spark, dst)
    _, src_p = _hadoop_fs(spark, src)
    if fs.exists(dst_p):
        fs.delete(dst_p, True)
    fs.mkdirs(dst_p.getParent())
    fs.rename(src_p, dst_p)


def merge_upsert(
    spark,
    target_path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_col: str | None = None,
) -> None:
    """MERGE-style upsert into a parquet table: rows matching on
    ``key_cols`` are replaced by the update, others kept, new keys
    appended — the reference's ClickHouse TRUNCATE+reload and the
    watermark loader (S11) folded into one idempotent operation.

    Implementation is read→anti-join→union→rewrite (parquet has no
    transaction log; on Delta/Iceberg this maps to a native MERGE that
    rewrites only matching files). The rewrite stages to a temp dir
    first so a failed job never leaves a half-written target, and all
    directory surgery uses the Hadoop FileSystem API, so it works on
    HDFS/S3 as well as local paths.

    Scale path: pass ``partition_col`` (a column the target was written
    ``partitionBy``) and only the partitions containing update keys are
    read, anti-joined, and swapped — a 100 TB table with updates
    touching 3 partitions rewrites 3 partitions, not 100 TB. The
    distinct-partition-value collect is a driver-side list of partition
    *names* (bounded by partition count, like any MERGE planner), never
    data rows.

    A missing target is a first load; any OTHER read failure (corrupt
    footer, permissions, transient IO) raises instead of silently
    clobbering the table with only the updates.
    """
    import uuid

    from pyspark.errors import AnalysisException

    part_by = [partition_col] if partition_col else []
    try:
        target = spark.read.parquet(target_path)
        exists = True
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" not in msg and "Path does not exist" not in msg:
            raise
        exists = False

    if not exists:
        writer = updates.write.mode("overwrite")
        if part_by:
            writer = writer.partitionBy(*part_by)
        writer.parquet(target_path)
        return

    staging = f"{target_path.rstrip('/')}__staging_{uuid.uuid4().hex[:8]}"
    if partition_col is not None:
        affected = [
            r[0] for r in updates.select(partition_col).distinct().collect()
        ]
        # Key-move pruning: an update may carry a DIFFERENT partition
        # value than the target's current row for the same key. Pruning
        # only by the updates' partition values would leave the stale
        # row alive in its old (unpruned) partition — duplicate keys
        # with no error. So also prune every partition that currently
        # CONTAINS an updated key (two-column column-pruned scan +
        # semi-join — the data-skipping step of any MERGE planner).
        moved = [
            r[0]
            for r in target.select(partition_col, *key_cols)
            .join(updates.select(*key_cols).distinct(), key_cols, "left_semi")
            .select(partition_col)
            .distinct()
            .collect()
        ]
        seen = set()
        affected = [
            v for v in affected + moved if not (v in seen or seen.add(v))
        ]
        # NULL-safe pruning: isin() never matches NULL, but a NULL
        # partition value in the updates still writes (and swaps) the
        # __HIVE_DEFAULT_PARTITION__ dir — without this branch the
        # target's null-partition rows would be silently clobbered.
        non_null = [v for v in affected if v is not None]
        cond = F.col(partition_col).isin(non_null) if non_null else F.lit(False)
        if any(v is None for v in affected):
            cond = cond | F.col(partition_col).isNull()
        pruned = target.filter(cond)
        kept = pruned.join(updates.select(*key_cols), key_cols, "left_anti")
        merged = kept.unionByName(updates.select(*target.columns))
        merged.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
        # Target partition dirs the merge covered: the target listing
        # filtered to the affected values (unescape the Hive dir name,
        # string-compare — partition values here render identically via
        # str(); exotic types like booleans whose Spark rendering
        # differs from Python's should not be partition columns).
        # NB: pruned.inputFiles() can NOT provide this — it reports the
        # whole relation's files, ignoring the partition filter.
        import urllib.parse

        tgt_prefix = target_path.rstrip("/")
        affected_strs = {str(v) for v in affected if v is not None}
        affected_null = any(v is None for v in affected)
        fs, tgt_p = _hadoop_fs(spark, tgt_prefix)
        read_dirs = set()
        for status in fs.listStatus(tgt_p):
            name = status.getPath().getName()
            if not name.startswith(f"{partition_col}="):
                continue
            raw = name[len(partition_col) + 1 :]
            if raw == "__HIVE_DEFAULT_PARTITION__":
                if affected_null:
                    read_dirs.add(name)
            elif urllib.parse.unquote(raw) in affected_strs:
                read_dirs.add(name)
        # swap only the rewritten partition dirs (new partitions rename in)
        fs, staging_p = _hadoop_fs(spark, staging)
        staged = set()
        for status in fs.listStatus(staging_p):
            name = status.getPath().getName()
            if name.startswith(f"{partition_col}="):
                staged.add(name)
                _swap_dir(
                    spark,
                    f"{staging}/{name}",
                    f"{target_path.rstrip('/')}/{name}",
                )
        # A covered partition absent from staging was emptied by the
        # merge (its only rows moved partitions) — delete it, or the
        # stale rows would survive the swap.
        for name in sorted(read_dirs - staged):
            fs2, dir_p = _hadoop_fs(spark, f"{tgt_prefix}/{name}")
            if fs2.exists(dir_p):
                fs2.delete(dir_p, True)
        fs.delete(staging_p, True)
    else:
        kept = target.join(updates.select(*key_cols), key_cols, "left_anti")
        merged = kept.unionByName(updates.select(*target.columns))
        merged.write.mode("overwrite").parquet(staging)
        _swap_dir(spark, staging, target_path)


def write_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "append", **options: str
) -> None:
    """External-DB sink for deployments that truly need one (the
    ClickHouse role): executor-parallel JDBC batches, never a driver
    collect. Untested here (no JDBC endpoint in this environment)."""
    df.write.mode(mode).format("jdbc").option("url", url).option(
        "dbtable", table
    ).options(**options).save()

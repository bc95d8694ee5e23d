"""Streaming exact dedup (bounded state via watermark) and MERGE-style
parquet upsert."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from big_data_processing_spark.sources.writers import merge_upsert
from big_data_processing_spark.streaming.dedup import streaming_exact_dedup

DOC_SCHEMA = "ts timestamp, doc_id bigint, text string"


def test_streaming_exact_dedup(spark, tmp_path):
    src = tmp_path / "docs_in"
    src.mkdir()
    rows = [
        {"ts": "2024-01-01 10:00:00", "doc_id": 1, "text": "alpha beta"},
        {"ts": "2024-01-01 10:01:00", "doc_id": 2, "text": "alpha beta"},  # dup content
        {"ts": "2024-01-01 10:02:00", "doc_id": 3, "text": "gamma delta"},
    ]
    with open(src / "b1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    stream = spark.readStream.schema(DOC_SCHEMA).json(str(src))
    deduped = streaming_exact_dedup(stream)
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from dedup_out").collect()
    assert len(out) == 2
    assert {r.text for r in out} == {"alpha beta", "gamma delta"}

    # a re-sent duplicate in a later batch (within watermark) is dropped
    with open(src / "b2.json", "w") as f:
        f.write(json.dumps({"ts": "2024-01-01 10:10:00", "doc_id": 4, "text": "alpha beta"}) + "\n")
        f.write(json.dumps({"ts": "2024-01-01 10:11:00", "doc_id": 5, "text": "epsilon"}) + "\n")
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out2")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_merge_upsert(spark, tmp_path):
    path = str(tmp_path / "serving_table")
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], ["id", "name", "score"]
    )
    merge_upsert(spark, path, v1, ["id"])
    assert {(r.id, r.score) for r in spark.read.parquet(path).collect()} == {
        (1, 10.0),
        (2, 20.0),
    }

    # update id=2, insert id=3; id=1 untouched
    v2 = spark.createDataFrame([(2, "b", 99.0), (3, "c", 30.0)], ["id", "name", "score"])
    merge_upsert(spark, path, v2, ["id"])
    got = {(r.id, r.score) for r in spark.read.parquet(path).collect()}
    assert got == {(1, 10.0), (2, 99.0), (3, 30.0)}

    # idempotent: same merge again changes nothing
    merge_upsert(spark, path, v2, ["id"])
    got2 = {(r.id, r.score) for r in spark.read.parquet(path).collect()}
    assert got2 == got


def test_merge_upsert_corrupt_target_raises(spark, tmp_path):
    """A target that exists but can't be read (corrupt footer, bad
    file) must surface the error — never be treated as 'first load'
    and silently clobbered with only the updates."""
    import pytest

    path = tmp_path / "corrupt_table"
    path.mkdir()
    (path / "part-00000.parquet").write_bytes(b"this is not a parquet file")
    upd = spark.createDataFrame([(1, 1.0)], ["id", "v"])
    # corrupt footers surface as a failed schema-inference job
    # (Py4JJavaError), permission/path issues as AnalysisException —
    # either way merge_upsert must propagate, not swallow
    with pytest.raises(Exception):
        merge_upsert(spark, str(path), upd, ["id"])
    # target untouched — the corrupt evidence is still there
    assert (path / "part-00000.parquet").read_bytes().startswith(b"this is not")


def test_merge_upsert_partition_pruned(spark, tmp_path):
    """With partition_col, only partitions containing update keys are
    rewritten: untouched partition dirs keep their original files."""
    import os

    path = str(tmp_path / "part_table")
    base = spark.createDataFrame(
        [(1, "2024-01", 10.0), (2, "2024-01", 20.0), (3, "2024-02", 30.0)],
        ["id", "month", "v"],
    )
    merge_upsert(spark, path, base, ["id"], partition_col="month")
    untouched_dir = os.path.join(path, "month=2024-02")
    before = sorted(os.listdir(untouched_dir))

    upd = spark.createDataFrame(
        [(2, "2024-01", 99.0), (4, "2024-03", 40.0)], ["id", "month", "v"]
    )
    merge_upsert(spark, path, upd, ["id"], partition_col="month")

    got = {(r.id, r.month, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {
        (1, "2024-01", 10.0),
        (2, "2024-01", 99.0),
        (3, "2024-02", 30.0),
        (4, "2024-03", 40.0),
    }
    # the 2024-02 partition was never rewritten (same physical files)
    assert sorted(os.listdir(untouched_dir)) == before


def test_merge_upsert_is_distributed(spark, tmp_path):
    """The merged plan is anti-join + union — no driver-side collects."""
    path = str(tmp_path / "t2")
    base = spark.range(1000).select(
        F.col("id"), (F.col("id") * 2.0).alias("v")
    )
    merge_upsert(spark, path, base, ["id"])
    upd = spark.range(500).select(F.col("id"), F.lit(-1.0).alias("v"))
    merge_upsert(spark, path, upd, ["id"])
    out = spark.read.parquet(path)
    assert out.count() == 1000
    assert out.filter("v = -1.0").count() == 500


def test_merge_upsert_preserves_null_partition_rows(spark, tmp_path):
    """An update landing in the NULL partition must not clobber the
    target's other null-partition rows (isin() never matches NULL, so
    naive pruning would exclude them from 'kept' while the staging
    __HIVE_DEFAULT_PARTITION__ dir still swaps in)."""
    path = str(tmp_path / "null_part_table")
    v1 = spark.createDataFrame(
        [(1, None, 10.0), (2, "2024-01", 20.0)], "id int, month string, score double"
    )
    v1.write.partitionBy("month").parquet(path)
    updates = spark.createDataFrame(
        [(3, None, 30.0)], "id int, month string, score double"
    )
    merge_upsert(spark, path, updates, key_cols=["id"], partition_col="month")
    got = {(r.id, r.month, r.score) for r in spark.read.parquet(path).collect()}
    assert got == {(1, None, 10.0), (2, "2024-01", 20.0), (3, None, 30.0)}


def test_merge_upsert_key_moves_partition(spark, tmp_path):
    """An update that carries a NEW partition value for an existing key
    must remove the stale row from its old partition (key-move pruning:
    partitions containing matched keys are rewritten even when the
    updates never name them)."""
    path = str(tmp_path / "move_table")
    base = spark.createDataFrame(
        [(1, "2024-01", 10.0), (2, "2024-01", 20.0), (3, "2024-02", 30.0)],
        ["id", "month", "v"],
    )
    merge_upsert(spark, path, base, ["id"], partition_col="month")
    # key 3 moves 2024-02 -> 2024-03; its old partition empties out
    upd = spark.createDataFrame([(3, "2024-03", 33.0)], ["id", "month", "v"])
    merge_upsert(spark, path, upd, ["id"], partition_col="month")
    got = {(r.id, r.month, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "2024-01", 10.0), (2, "2024-01", 20.0), (3, "2024-03", 33.0)}
    import os

    assert not os.path.exists(os.path.join(path, "month=2024-02"))


def test_merge_upsert_key_moves_partition_with_survivors(spark, tmp_path):
    """Key-move where the old partition keeps OTHER rows: the stale row
    is gone, the survivors stay, and unrelated partitions are never
    rewritten."""
    import os

    path = str(tmp_path / "move_table2")
    base = spark.createDataFrame(
        [(1, "2024-01", 10.0), (2, "2024-01", 20.0), (3, "2024-02", 30.0)],
        ["id", "month", "v"],
    )
    merge_upsert(spark, path, base, ["id"], partition_col="month")
    untouched = os.path.join(path, "month=2024-02")
    before = sorted(os.listdir(untouched))
    # key 2 moves 2024-01 -> 2024-03; key 1 stays behind in 2024-01
    upd = spark.createDataFrame([(2, "2024-03", 22.0)], ["id", "month", "v"])
    merge_upsert(spark, path, upd, ["id"], partition_col="month")
    got = {(r.id, r.month, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "2024-01", 10.0), (2, "2024-03", 22.0), (3, "2024-02", 30.0)}
    assert sorted(os.listdir(untouched)) == before

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

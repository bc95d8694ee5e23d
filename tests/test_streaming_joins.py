"""Stream-stream interval join: watermarked attribution of purchases
to preceding same-user activity — state bounded by watermark+lookback."""

from __future__ import annotations

import json

from big_data_processing_spark.streaming.joins import streaming_attribution_join

EV_SCHEMA = "ts timestamp, event_id bigint, user_id bigint, event_type string"


def _write(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streaming_attribution_join(spark, tmp_path):
    a_src = tmp_path / "activity"
    p_src = tmp_path / "purchases"
    a_src.mkdir()
    p_src.mkdir()
    _write(
        a_src / "b1.json",
        [
            {"ts": "2024-01-01 10:00:00", "event_id": 1, "user_id": 7, "event_type": "click"},
            {"ts": "2024-01-01 10:10:00", "event_id": 2, "user_id": 7, "event_type": "view"},
            {"ts": "2024-01-01 09:00:00", "event_id": 3, "user_id": 7, "event_type": "click"},  # too old
            {"ts": "2024-01-01 10:12:00", "event_id": 4, "user_id": 9, "event_type": "click"},  # other user
            {"ts": "2024-01-01 10:20:00", "event_id": 5, "user_id": 7, "event_type": "click"},  # after purchase
        ],
    )
    _write(
        p_src / "b1.json",
        [{"ts": "2024-01-01 10:15:00", "event_id": 100, "user_id": 7, "event_type": "purchase"}],
    )
    activity = spark.readStream.schema(EV_SCHEMA).json(str(a_src))
    purchases = spark.readStream.schema(EV_SCHEMA).json(str(p_src))
    joined = streaming_attribution_join(activity, purchases)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("attr_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from attr_out").collect()
    # events 1 and 2 are within [09:45, 10:15] for user 7; 3 too old,
    # 4 wrong user, 5 after the purchase
    assert {(r.event_id, r.p_id) for r in out} == {(1, 100), (2, 100)}


def test_stream_static_enrich_broadcast(spark, tmp_path):
    """Stream-static enrichment: a streaming fact joined to a bounded
    dim aggregates per (window, dim attribute); unmatched events
    survive the left join with a null group; the join itself adds no
    streaming state (only the windowed aggregate does)."""
    from big_data_processing_spark.streaming.joins import stream_static_enrich

    src = tmp_path / "events"
    src.mkdir()
    dim_path = tmp_path / "dim"
    spark.createDataFrame(
        [(7, "gold"), (9, "bronze")], ["user_id", "tier"]
    ).write.parquet(str(dim_path))

    _write(
        src / "b1.json",
        [
            {"ts": "2024-01-01 10:00:00", "event_id": 1, "user_id": 7, "value": 10.0},
            {"ts": "2024-01-01 10:20:00", "event_id": 2, "user_id": 7, "value": 5.0},
            {"ts": "2024-01-01 10:30:00", "event_id": 3, "user_id": 9, "value": 2.0},
            {"ts": "2024-01-01 10:40:00", "event_id": 4, "user_id": 11, "value": 1.0},
        ],
    )
    events = spark.readStream.schema(
        "ts timestamp, event_id bigint, user_id bigint, value double"
    ).json(str(src))
    dim = spark.read.parquet(str(dim_path))
    out = stream_static_enrich(events, dim, on="user_id", group_col="tier")
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("enriched")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # late batch: still attributed through the same static join
        _write(
            src / "b2.json",
            [{"ts": "2024-01-01 10:50:00", "event_id": 5, "user_id": 9, "value": 4.0}],
        )
        q.processAllAvailable()
        rows = {
            (r.tier, r.n_events, r.total_value)
            for r in spark.sql("select * from enriched").collect()
        }
        assert ("gold", 2, 15.0) in rows
        assert ("bronze", 2, 6.0) in rows
        assert (None, 1, 1.0) in rows  # unmatched user_id=11 survives
    finally:
        q.stop()


def test_streaming_attribution_join_outer_emits_unmatched(spark, tmp_path):
    """LEFT OUTER stream-stream: a purchase with preceding activity
    joins to it; a purchase with none emits ONCE with NULL activity
    columns — but only after the global watermark (min across both
    streams) passes its join window, which takes a later micro-batch.
    Verified across checkpointed restarts, the way a real feed delivers
    late batches."""
    from big_data_processing_spark.streaming.joins import (
        streaming_attribution_join_outer,
    )

    a_src, p_src = tmp_path / "a", tmp_path / "p"
    a_src.mkdir()
    p_src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "out")

    def run_once():
        activity = spark.readStream.schema(EV_SCHEMA).json(str(a_src))
        purchases = spark.readStream.schema(EV_SCHEMA).json(str(p_src))
        out = streaming_attribution_join_outer(
            activity, purchases, lookback="30 minutes", watermark="1 hour"
        ).select("p_id", "event_id")
        q = (
            out.writeStream.outputMode("append")
            .format("json")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.read.schema("p_id bigint, event_id bigint").json(sink)
        return {(r.p_id, r.event_id) for r in got.collect()}

    _write(
        a_src / "b1.json",
        [
            {"ts": "2024-01-01 10:00:00", "event_id": 1, "user_id": 7, "event_type": "click"},
        ],
    )
    _write(
        p_src / "b1.json",
        [
            {"ts": "2024-01-01 10:15:00", "event_id": 100, "user_id": 7, "event_type": "purchase"},
            {"ts": "2024-01-01 10:30:00", "event_id": 101, "user_id": 8, "event_type": "purchase"},
        ],
    )
    got1 = run_once()
    assert (100, 1) in got1          # matched pair emits eagerly
    assert (101, None) not in got1   # unmatched must WAIT for the watermark

    # late batches on BOTH streams push the global watermark past
    # 10:30 + lookback + delay, releasing the unmatched purchase
    _write(
        a_src / "b2.json",
        [{"ts": "2024-01-01 14:00:00", "event_id": 2, "user_id": 1, "event_type": "click"}],
    )
    _write(
        p_src / "b2.json",
        [{"ts": "2024-01-01 14:00:00", "event_id": 200, "user_id": 1, "event_type": "purchase"}],
    )
    got2 = run_once()
    # one more (possibly empty) batch after the watermark advance
    _write(
        a_src / "b3.json",
        [{"ts": "2024-01-01 15:00:00", "event_id": 3, "user_id": 1, "event_type": "click"}],
    )
    _write(
        p_src / "b3.json",
        [{"ts": "2024-01-01 15:00:00", "event_id": 300, "user_id": 1, "event_type": "purchase"}],
    )
    got3 = run_once()
    assert (101, None) in got2 | got3   # NULL-activity row flushed
    assert (100, 1) in got1 | got2 | got3

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

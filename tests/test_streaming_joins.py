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

"""applyInPandasWithState sessionization: state must carry across
micro-batches AND query restarts (checkpointed), closing sessions only
when a later event exceeds the gap."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from big_data_processing_spark.streaming.stateful import streaming_sessionize

SCHEMA = "ts timestamp, user_id bigint, event_id bigint, value double"


def _write_batch(dirpath: Path, name: str, rows: list[dict]) -> None:
    with open(dirpath / name, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, src: Path, out: Path, ckpt: Path) -> None:
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    sessions = streaming_sessionize(stream, gap_minutes=30)
    q = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


@pytest.mark.parametrize("restart", [True])
def test_sessions_close_across_restarts(spark, tmp_path, restart):
    src, out, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    src.mkdir()

    _write_batch(
        src,
        "b1.json",
        [
            {"ts": "2024-01-01 10:00:00", "user_id": 1, "event_id": 1, "value": 1.0},
            {"ts": "2024-01-01 10:10:00", "user_id": 1, "event_id": 2, "value": 2.0},
            {"ts": "2024-01-01 09:00:00", "user_id": 2, "event_id": 3, "value": 5.0},
        ],
    )
    _run(spark, src, out, ckpt)
    # nothing closed yet: both users have only an open session in state
    files = list(out.glob("*.parquet"))
    n0 = spark.read.parquet(str(out)).count() if files else 0
    assert n0 == 0

    # batch 2 arrives (restarted query, same checkpoint): user 1 jumps
    # past the gap (closes session 1); user 2 continues inside the gap
    _write_batch(
        src,
        "b2.json",
        [
            {"ts": "2024-01-01 11:00:00", "user_id": 1, "event_id": 4, "value": 3.0},
            {"ts": "2024-01-01 09:05:00", "user_id": 2, "event_id": 5, "value": 7.0},
        ],
    )
    _run(spark, src, out, ckpt)
    closed = {
        (r.user_id, r.session_seq): (r.n_events, r.session_value)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert closed == {(1, 1): (2, 3.0)}  # user 1's first session: 2 events, value 1+2

    # batch 3: user 2 jumps the gap → their long-open session closes
    _write_batch(
        src,
        "b3.json",
        [{"ts": "2024-01-01 12:00:00", "user_id": 2, "event_id": 6, "value": 1.0}],
    )
    _run(spark, src, out, ckpt)
    closed = {
        (r.user_id, r.session_seq): (r.n_events, r.session_value)
        for r in spark.read.parquet(str(out)).collect()
    }
    assert closed[(2, 1)] == (2, 12.0)  # 09:00 + 09:05 events, values 5+7

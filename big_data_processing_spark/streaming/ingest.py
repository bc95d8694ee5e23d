"""Structured Streaming ingest — the reference's streaming layer
re-expressed (SURVEY §2.9 / §3.1).

Reference lifecycle: file-watcher → Kafka JSON envelopes per line →
consumer buffers until an 'end' marker → writes file to HDFS → shells
out to Hive/Spark/MapReduce to recompute everything
(src/kafka/file_watcher_producer.py:62-122,
src/kafka/kafka_hdfs_consumer.py:26-110,334-351). No checkpointing, no
exactly-once: re-sent files duplicate rows.

Spark redesign (one job, three upgrades the reference lacks):
- the file watcher IS the source: ``readStream.csv(dir)`` picks up new
  files atomically — no envelope protocol, no end markers;
- checkpointing replaces the ``meta.updated_time`` watermark table
  (S11): restarts are exactly-once, re-listed files are not re-read;
- ``foreachBatch`` appends the typed fact AND refreshes derived tables
  in the same transaction scope, replacing the consumer's synchronous
  subprocess orchestration (kafka_hdfs_consumer.py:338-351).

``Trigger.AvailableNow`` drains everything pending then stops — the
batch-catch-up mode used by the tests; a production deployment runs
the same code with a processing-time trigger.

At 100 TB the same topology holds: the file source scales by listing
parallelism, the sink appends partitioned parquet, and the derived
refresh is incremental per micro-batch (aggregate the BATCH, then
merge) instead of the reference's full recompute of all history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..plans.weather import WEATHER_SCHEMA


def _typed_weather(raw: DataFrame) -> DataFrame:
    """Same cleaning as batch ingest (plans.weather.ingest_weather_csv):
    regex date filter, ANSI-safe parse, null drops, date parts."""
    return (
        raw.filter(F.col("date").rlike(r"^[0-9]+/[0-9]+/[0-9]+$"))
        .withColumn("obs_date", F.try_to_date("date", "M/d/yyyy"))
        .filter(F.col("obs_date").isNotNull() & F.col("location_id").isNotNull())
        .withColumn("year", F.year("obs_date"))
        .withColumn("month", F.month("obs_date"))
        .withColumn("week", F.weekofyear("obs_date"))
    )


def make_ingest_sink(fact_dir: str, derived_dir: str | None = None):
    """foreachBatch sink closure: append the typed batch to the fact
    table and its partial aggregate to the derived table, IDEMPOTENTLY.

    foreachBatch is at-least-once — a crash between the write and the
    checkpoint commit replays the batch — so every write lands in
    partitions keyed by (…, ingest_batch=batch_id) using dynamic
    partition overwrite: a replay rewrites exactly its own partitions
    instead of appending duplicates, which upgrades the end-to-end
    guarantee to exactly-once. Fresh batch ids never touch existing
    partitions, so normal appends are unaffected."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            (
                batch.withColumn("ingest_batch", F.lit(batch_id))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("year", "ingest_batch")
                .parquet(fact_dir)
            )
            if derived_dir is not None:
                # partial (map-side-style) aggregate of JUST this batch;
                # merged at read time — incremental, never full-history
                (
                    batch.groupBy("location_id", "year", "month")
                    .agg(
                        F.sum("precipitation_hours").alias("sum_precip_hours"),
                        F.sum("temperature_2m_mean").alias("sum_temp"),
                        F.count("temperature_2m_mean").alias("n_temp"),
                        F.count(F.lit(1)).alias("n_rows"),
                    )
                    .withColumn("ingest_batch", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("ingest_batch")
                    .parquet(derived_dir)
                )
        finally:
            batch.unpersist()

    return sink


def stream_ingest_weather(
    spark: SparkSession,
    in_dir: str,
    fact_dir: str,
    checkpoint_dir: str,
    derived_dir: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """File-arrival → typed fact parquet (+ optional derived refresh).

    Each micro-batch appends the cleaned rows to the fact table; if
    ``derived_dir`` is given, the district-monthly aggregate of the
    batch is appended to a compacted delta-style partial table (see
    :func:`refresh_derived_tables` for the serving-side merge).
    """
    raw = (
        spark.readStream.option("header", "true")
        .option("mode", "PERMISSIVE")
        .schema(WEATHER_SCHEMA)
        .csv(in_dir)
    )
    typed = _typed_weather(raw)
    writer = (
        typed.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(make_ingest_sink(fact_dir, derived_dir))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def refresh_derived_tables(spark: SparkSession, derived_dir: str) -> DataFrame:
    """Serve the maintained aggregate (A12, the ClickHouse
    SummingMergeTree mv_monthly_summary, init.sql:73-85): merge the
    per-batch partials into final (location, year, month) rows —
    exactly the partial→final aggregation Spark does inside one job,
    made persistent across micro-batches."""
    partials = spark.read.parquet(derived_dir)
    return partials.groupBy("location_id", "year", "month").agg(
        F.sum("sum_precip_hours").alias("total_precip_hours"),
        (F.sum("sum_temp") / F.sum("n_temp")).alias("avg_temperature"),
        F.sum("n_rows").alias("n_obs"),
    )


def streaming_hourly_aggregate(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Event-time tumbling window with late-data handling — the
    watermarked upgrade of the reference's recompute-on-arrival
    (SURVEY §2.9 flags this as the idiomatic replacement). Feed it
    a streaming DataFrame with (ts, event_type, value)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_hopping_aggregate(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Hopping (sliding) event-time window — 1-hour windows every 15
    minutes, watermarked. The streaming twin of the batch
    ``events_hopping_window`` catalog query: identical window
    semantics AND the same order-independent decimal-exact sum, so a
    backfill (batch) and the live stream produce bit-identical rows
    regardless of micro-batch arrival order — the lambda-architecture
    equivalence, for free, because both are the same declarative plan.
    (A float F.sum here would drift in the last ulp with delivery
    order, breaking the claimed row equality.)"""
    from ..functions.aggregates import dsum

    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 9).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )

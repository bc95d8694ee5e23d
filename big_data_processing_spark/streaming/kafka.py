"""Kafka envelope transport — reference S6/S7 parity.

The reference's producer wraps each CSV line of a watched file in a
JSON envelope {type: metadata|data|end, filename, line_number, content,
timestamp} on topic weather-data-stream, keyed by filename
(src/kafka/file_watcher_producer.py:62-122); the consumer buffers lines
per file until the 'end' marker, then routes whole files to
location/ or weather/ HDFS dirs (src/kafka/kafka_hdfs_consumer.py:
37-52, 334-336).

Spark-first: the envelope becomes three column expressions —
``from_json`` to parse, a filename predicate to route, ``from_csv`` to
type the payload line. No buffering, no end markers: Structured
Streaming's epoch semantics replace the per-file protocol (a file's
lines land atomically per micro-batch, checkpointed exactly-once).
All three transforms are engine-pure, so they are unit-testable on
batch DataFrames without a broker; :func:`kafka_source` wires the same
columns onto a live ``readStream.format("kafka")``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("filename", T.StringType()),
        T.StructField("line_number", T.IntegerType()),
        T.StructField("content", T.StringType()),
        T.StructField("timestamp", T.DoubleType()),
    ]
)


def parse_envelope(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Kafka value bytes → envelope struct columns (S6's JSON protocol)."""
    v = F.col(value_col).cast("string")
    return raw.withColumn("env", F.from_json(v, ENVELOPE_SCHEMA)).select(
        F.col("env.type").alias("msg_type"),
        F.col("env.filename").alias("filename"),
        F.col("env.line_number").alias("line_number"),
        F.col("env.content").alias("content"),
        F.col("env.timestamp").alias("sent_at"),
    )


def route_table(parsed: DataFrame) -> DataFrame:
    """Filename-based routing (S7: consumer routes to location/ vs
    weather/): adds a ``table`` column; non-data messages are dropped
    (metadata/end markers are transport artifacts Spark doesn't need)."""
    return parsed.filter(F.col("msg_type") == "data").withColumn(
        "table",
        F.when(F.lower(F.col("filename")).contains("location"), F.lit("location"))
        .when(F.lower(F.col("filename")).contains("weather"), F.lit("weather"))
        .otherwise(F.lit("unknown")),
    )


def typed_rows(routed: DataFrame, table: str, schema: T.StructType) -> DataFrame:
    """CSV payload line → typed columns via from_csv (the Spark-native
    equivalent of the consumer writing lines to HDFS and re-scanning
    them with a schema). Header lines parse to nulls and are dropped by
    the key-column filter, matching S1's header skip."""
    ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    parsed = (
        routed.filter(F.col("table") == table)
        .withColumn("row", F.from_csv("content", ddl))
        .select("filename", "line_number", "row.*")
    )
    key = schema.fields[0].name
    return parsed.filter(F.col(key).isNotNull())


def kafka_source_options(
    brokers: str,
    topic: str = "weather-data-stream",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 10000,
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """Assemble the Kafka source option map (pure, unit-testable
    without a broker — the wiring the sandbox can't execute is reduced
    to this dict plus one ``format("kafka")`` call).

    ``max_offsets_per_trigger`` bounds each micro-batch — without it a
    restart after downtime reads the whole backlog into one giant batch
    (executor OOM at scale); ``failOnDataLoss=false`` keeps an aged-out
    (retention-expired) offset range from killing the query — the
    standard production posture, the gap is logged."""
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(int(max_offsets_per_trigger))
    return opts


def kafka_source(
    spark: SparkSession,
    brokers: str,
    topic: str = "weather-data-stream",
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 10000,
) -> DataFrame:
    """Streaming envelope source (requires a live broker + the
    spark-sql-kafka package; option assembly and everything downstream
    are the batch/file-stream-testable functions in this module)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(
        brokers,
        topic,
        starting_offsets,
        max_offsets_per_trigger=max_offsets_per_trigger,
    ).items():
        reader = reader.option(k, v)
    return reader.load()

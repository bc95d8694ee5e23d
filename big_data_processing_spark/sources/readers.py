"""Table readers.

Covers the reference's scan surface (SURVEY.md §2.1):
- S1/S2: CSV scan with declared schema / header handling → ``read_csv_table``
- S4: external-table-over-files → ``register_views`` (temp views)
- parquet star-schema testdata → ``load_table`` / ``load_all``

Scale notes: parquet scans get column pruning + predicate pushdown from
Catalyst for free; at 100 TB the facts should be written partitioned
(see writers.py) so partition pruning kicks in. Everything here is
declarative — no collect, no driver-side row handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing types for engine use.

    The ``events`` table stores TIMESTAMP(NANOS) which Spark cannot map
    natively; we read it as raw nanos (legacy conf) and floor-convert to
    microsecond timestamps — identical to what DuckDB's parquet reader
    does when it narrows ns → us precision.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all testdata tables as temp views for spark.sql plans."""
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    permissive: bool = True,
) -> DataFrame:
    """CSV scan with a declared schema (reference S1).

    PERMISSIVE mode nulls out malformed fields rather than failing the
    scan — the Spark-native equivalent of the reference's silently
    dropped ``NumberFormatException`` rows (P10,
    reference src/mapreduce/DistrictMonthlyWeather.java:89-91); callers
    add explicit ``isNotNull`` filters where the semantics require a
    dropped row.
    """
    return (
        spark.read.option("header", str(header).lower())
        .option("mode", "PERMISSIVE" if permissive else "FAILFAST")
        .schema(schema)
        .csv(path)
    )

"""Sink tests (S8-S10 replacements): partitioned parquet serving tables
and timestamped CSV snapshots."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from big_data_processing_spark.sources.readers import load_table
from big_data_processing_spark.sources.writers import write_csv_snapshot, write_table

from .conftest import TEST_SF_DIR


def test_write_table_partitioned(spark, tmp_path):
    o = load_table(spark, TEST_SF_DIR, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    write_table(o, out, partition_by=["order_year"], sort_by=["o_orderkey"])
    parts = sorted(p.name for p in Path(out).glob("order_year=*"))
    assert len(parts) > 1
    back = spark.read.parquet(out)
    assert back.count() == o.count()
    # partition pruning: a year filter must scan only that partition
    one_year = back.filter(F.col("order_year") == 1995)
    plan = one_year._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(order_year" in plan


def test_csv_inferred_schema_read(spark, tmp_path):
    """S2: schema inference yields typed columns from raw CSV."""
    from big_data_processing_spark.sources.readers import read_csv_table

    p = tmp_path / "raw.csv"
    p.write_text("id,temp,city\n1,31.5,Colombo\n2,28.0,Kandy\n")
    df = read_csv_table(spark, str(p), schema=None)
    types = dict(df.dtypes)
    assert types["id"] == "int" and types["temp"] == "double" and types["city"] == "string"
    assert df.count() == 2


def test_create_csv_table_ddl(spark, tmp_path):
    """S4: SQL-surface external table over CSV files."""
    from big_data_processing_spark.sources.readers import create_csv_table_ddl

    p = tmp_path / "ext.csv"
    p.write_text("id,name\n1,a\n2,b\n")
    create_csv_table_ddl(spark, "ext_csv_t", str(p), "id INT, name STRING")
    try:
        assert spark.sql("SELECT count(*) c FROM ext_csv_t").first().c == 2
        assert spark.sql("SELECT name FROM ext_csv_t WHERE id = 2").first().name == "b"
    finally:
        spark.sql("DROP TABLE IF EXISTS ext_csv_t")


def test_write_csv_snapshot(spark, tmp_path):
    df = load_table(spark, TEST_SF_DIR, "nation")
    path = write_csv_snapshot(df, str(tmp_path / "snap"), ts=12345)
    assert path.endswith("/12345")
    back = spark.read.option("header", "true").csv(path)
    assert back.count() == df.count()


def test_read_jsonl_docs(spark, tmp_path):
    """JSONL ingest: declared schema, corrupt lines dropped (or kept
    for quarantine with drop_corrupt=False)."""
    import json as _json

    from big_data_processing_spark.sources.readers import read_jsonl_docs

    p = tmp_path / "docs.jsonl"
    rows = [
        {"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "web",
         "meta": {"url": "http://x"}},
        {"doc_id": 2, "text": "gamma", "lang": "de", "source": "book", "meta": {}},
    ]
    with open(p, "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
        f.write("{this is not json\n")

    clean = read_jsonl_docs(spark, str(p))
    got = {r.doc_id: r for r in clean.collect()}
    assert set(got) == {1, 2}
    assert got[1].meta["url"] == "http://x"
    assert clean.schema["doc_id"].dataType.typeName() == "long"

    quarantine = read_jsonl_docs(spark, str(p), drop_corrupt=False)
    corrupt = quarantine.filter("_corrupt_record IS NOT NULL").collect()
    assert len(corrupt) == 1 and corrupt[0]._corrupt_record.startswith("{this")


def test_read_jsonl_docs_count_on_drop_path(spark, tmp_path):
    """.count() on the default drop-corrupt read must work — the
    PERMISSIVE+filter formulation throws
    QUERY_ONLY_CORRUPT_RECORD_COLUMN when a query references no data
    column, which is why the drop path uses DROPMALFORMED."""
    import json as _json

    from big_data_processing_spark.sources.readers import read_jsonl_docs

    p = tmp_path / "docs2.jsonl"
    with open(p, "w") as f:
        f.write(_json.dumps({"doc_id": 1, "text": "a", "lang": "en",
                             "source": "web", "meta": {}}) + "\n")
        f.write("not json at all\n")
    assert read_jsonl_docs(spark, str(p)).count() == 1


def test_load_table_normalizes_all_ts_encodings(spark, tmp_path):
    """The driver regenerates testdata between rounds and its physical
    timestamp encoding has drifted (int64-nanos in r1-2, microsecond
    TIMESTAMP_NTZ in r3). load_table must yield the SAME TIMESTAMP(LTZ)
    values for every encoding a future round might produce: ns, us-NTZ,
    and us-UTC parquet."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_processing_spark.sources.readers import load_table

    instants = [
        dt.datetime(2024, 1, 1, 12, 0, 0, 123456),
        dt.datetime(2024, 6, 30, 23, 59, 59, 999999),
    ]
    encodings = {
        "ns": pa.timestamp("ns"),
        "us_ntz": pa.timestamp("us"),
        "us_utc": pa.timestamp("us", tz="UTC"),
    }
    got = {}
    for tag, typ in encodings.items():
        d = tmp_path / tag
        d.mkdir()
        tbl = pa.table(
            {
                "event_id": pa.array([1, 2], pa.int64()),
                "ts": pa.array(instants, typ),
            }
        )
        pq.write_table(tbl, str(d / "events.parquet"), version="2.6")
        df = load_table(spark, str(d), "events")
        assert str(df.schema["ts"].dataType) == "TimestampType()", tag
        got[tag] = [
            (r.event_id, str(r.ts)) for r in df.orderBy("event_id").collect()
        ]
    assert got["ns"] == got["us_ntz"] == got["us_utc"]
    assert got["ns"][0][1].startswith("2024-01-01 12:00:00.123456")

"""Simulate the verification driver end-to-end.

Builds a VANILLA SparkSession (no engine configs — the driver owns its
session), imports __spark_entry__ through the public contract, runs
entry() + every queries() entry at the given sf, and hash-compares each
against its oracle_sql() via DuckDB, the way CORRECTNESS_r{N}.json is
produced: sort columns by name, sort rows, hash values.

Usage: python scripts/driver_sim.py [sf_dir] [only_names]

``only_names`` (optional, comma-separated) restricts the replay to the
named queries — a fast targeted re-check after touching one entry.  The
default (no filter) replays the whole catalog, which is what counts as
the pre-commit gate.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
# Callable oracles embed data-dependent literals (IVF centroids) and
# must be resolved against the sf the replay actually runs.
os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = SF_DIR
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(tuple(v)) if isinstance(v, (list, tuple)) else str(v))
        elif str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        else:
            df[c] = df[c].astype(str)
    rows = sorted(df.itertuples(index=False, name=None))
    return hashlib.sha256(json.dumps(rows).encode()).hexdigest()[:16]


def main() -> int:
    spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    import __spark_entry__ as e

    flagship = e.entry(spark)
    n = flagship.count()
    print(f"entry(): {n} rows, schema: {[f.name for f in flagship.schema]}")
    assert n > 0

    qs, oracles = e.queries(), e.oracle_sql()
    print(f"{len(qs)} queries, {len(oracles)} with oracle")
    # phase-timing registry is process-global; drain stale entries so a
    # later consumer can't mis-attribute this replay's timings (see
    # operators/util.drain_phases consumer contract)
    from big_data_processing_spark.operators.util import drain_phases

    drain_phases()
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    if only:
        unknown = only - set(qs)
        assert not unknown, f"unknown query names: {sorted(unknown)}"
    failed = []
    for name in sorted(only if only else qs):
        sdf = qs[name](spark, SF_DIR).toPandas()
        if name not in oracles:
            print(f"  {name:40s} rows-only: {len(sdf)} rows")
            continue
        odf = con.sql(oracles[name]).df()
        h1, h2 = value_hash(sdf), value_hash(odf)
        ok = (len(sdf) == len(odf)) and sorted(sdf.columns) == sorted(odf.columns) and h1 == h2
        print(f"  {name:40s} rows={len(sdf):6d}/{len(odf):6d} hash={'MATCH' if h1 == h2 else 'MISMATCH ' + h1 + ' vs ' + h2}")
        if not ok:
            failed.append(name)
    spark.stop()
    if failed:
        print("FAILED:", failed)
        return 1
    print("ALL MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from big_data_processing_spark.session import get_spark
from big_data_processing_spark.sources.readers import TESTDATA_TABLES

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="bdp-tests", cpus=8, shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return TEST_SF_DIR


@pytest.fixture(autouse=True)
def _release_persist_barriers():
    """Tests own the cache lifetime of operator persist() barriers
    (operators/util.py): release after every test so the session-scoped
    SparkSession doesn't accumulate signature caches across the suite."""
    yield
    from big_data_processing_spark.operators.util import release_barriers

    release_barriers()


@pytest.fixture(scope="session")
def duck(sf_dir):
    """DuckDB connection with the testdata tables registered as views —
    mirrors the driver's oracle environment."""
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def assert_frames_match(spark_df, oracle_df: pd.DataFrame, exact: bool = True):
    """Order-insensitive comparison mirroring the driver's row-count +
    schema + value-hash gate. ``exact=True`` demands bit-identical
    floats — achievable because the engine computes floating aggregates
    via exact decimal accumulation (functions/aggregates.py)."""
    a = _normalize(spark_df.toPandas())
    b = _normalize(oracle_df)
    assert sorted(a.columns) == sorted(b.columns), f"columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"row count {len(a)} != {len(b)}"
    if exact:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    else:
        pd.testing.assert_frame_equal(
            a, b, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-12
        )

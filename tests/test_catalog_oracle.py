"""Run every catalog query against its DuckDB oracle — the local twin
of the driver's CORRECTNESS gate (sf0.001 for speed; driver uses sf0.01)."""

from __future__ import annotations

import pytest

from big_data_processing_spark.plans.catalog import CATALOG

from .conftest import assert_frames_match

ORACLE_QUERIES = sorted(n for n, q in CATALOG.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in CATALOG.items() if q.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    q = CATALOG[name]
    result = q.fn(spark, sf_dir)
    # callable oracles embed data-dependent literals per sf_dir
    sql = q.oracle(sf_dir) if callable(q.oracle) else q.oracle
    oracle = duck.sql(sql).df()
    assert_frames_match(result, oracle)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    q = CATALOG[name]
    result = q.fn(spark, sf_dir)
    assert result.count() >= 0
    assert len(result.schema) > 0


def test_entry_module_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 15


def test_registry_names_match_functions():
    """Guard against decorator mis-attachment during refactors: every
    catalog entry must be registered under its own function's name
    (a @query decorator landing on a helper shows up here instantly)."""
    for name, q in CATALOG.items():
        assert q.fn.__name__ == name, (
            f"catalog entry '{name}' is bound to function '{q.fn.__name__}'"
        )


def test_winsorized_exact_window_parity(spark, sf_dir):
    """The exact-window winsorization twin (retired from the catalog in
    r5 to free a rotation slot) must still produce EXACTLY the rows of
    the production histogram cut-finder entry — the oracle-parity
    evidence lives here now."""
    from big_data_processing_spark.plans.catalog_more import (
        lineitem_winsorized_stats,
    )

    exact = lineitem_winsorized_stats(spark, sf_dir).collect()
    hist = CATALOG["lineitem_winsorized_hist"].fn(spark, sf_dir).collect()
    assert [tuple(r) for r in exact] == [tuple(r) for r in hist]


def test_hourly_tumbling_oracle_parity(spark, duck, sf_dir):
    """The tumbling-window formulation (retired from the catalog in r5:
    tumbling == hopping with slide==size, and the hopping entry is
    hash-checked) keeps its DuckDB oracle check here."""
    from big_data_processing_spark.plans.catalog import (
        EVENTS_HOURLY_TUMBLING_ORACLE,
        events_hourly_tumbling,
    )

    from .conftest import assert_frames_match

    result = events_hourly_tumbling(spark, sf_dir)
    oracle = duck.sql(EVENTS_HOURLY_TUMBLING_ORACLE).df()
    assert_frames_match(result, oracle)

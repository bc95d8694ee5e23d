"""Dashboard serving corpus: all 15 page queries run over the derived
district_monthly_weather + raw views; two are golden-checked against
DuckDB executing the identical SQL, and the parameterization (district
IN-lists, thresholds, year ranges) is exercised like the callbacks."""

from __future__ import annotations

import duckdb
import pytest

from big_data_processing_spark.plans import dashboard as D
from big_data_processing_spark.plans import weather as W

from .conftest import assert_frames_match
from .weather_fixture import generate


@pytest.fixture(scope="module")
def views(spark, tmp_path_factory):
    info = generate(str(tmp_path_factory.mktemp("dashdata")))
    weather = W.ingest_weather_csv(spark, info["weather_csv"]).cache()
    location = W.ingest_location_csv(spark, info["location_csv"])
    D.register_dashboard_views(spark, weather, location)
    return weather, location


@pytest.fixture(scope="module")
def dashduck(spark, views):
    con = duckdb.connect()
    con.register("district_monthly_weather", spark.table("district_monthly_weather").toPandas())
    con.register("raw_weather_data", spark.table("raw_weather_data").toPandas())
    con.register("locations", spark.table("locations").toPandas())
    yield con
    con.close()


def test_all_dashboard_queries_run(spark, views):
    for name in D.DASHBOARD_QUERIES:
        df = D.run_dashboard_query(spark, name)
        assert df.count() > 0, name


def test_p3_by_district_golden(spark, views, dashduck):
    args = dict(D.DASHBOARD_DEFAULTS)
    t = args["threshold"]
    args["r_pct_hot"] = W.ROUND2_SQL.format(
        x=f"SUM(CASE WHEN mean_temperature > {t} THEN 1 ELSE 0 END) * 100.0 / COUNT(*)"
    )
    sql = D.DASHBOARD_QUERIES["p3_by_district_overall"].format(**args)
    assert_frames_match(D.run_dashboard_query(spark, "p3_by_district_overall"), dashduck.sql(sql).df())


def test_p4_by_district_golden(spark, views, dashduck):
    sql = D.DASHBOARD_QUERIES["p4_by_district"].format(**D.DASHBOARD_DEFAULTS)
    got = D.run_dashboard_query(spark, "p4_by_district")
    # obs_date/date columns equal; DuckDB pandas round-trip keeps them
    assert_frames_match(got, dashduck.sql(sql).df())


def test_district_in_list_parameterization(spark, views):
    where = D.district_filter(["Colombo", "Kandy"])
    df = D.run_dashboard_query(spark, "p1_monthly_heatmap", where=where)
    districts = {r.district for r in df.select("district").distinct().collect()}
    assert districts == {"Colombo", "Kandy"}
    assert D.district_filter(None) == "1=1"
    assert D.district_filter(["O'Brien"]) == "district IN ('O''Brien')"


def test_threshold_parameterization(spark, views):
    lo = D.run_dashboard_query(spark, "p3_yearly_trend", threshold=20).collect()
    hi = D.run_dashboard_query(spark, "p3_yearly_trend", threshold=35).collect()
    assert sum(r.total_hot_months for r in lo) > sum(r.total_hot_months for r in hi)


def test_scatter_cap(spark, views):
    assert D.run_dashboard_query(spark, "p4_scatter", p_thresh=1, w_thresh=1).count() == 1000

"""Golden tests for the weather-domain parity module: each of the
reference's analytical outputs is compared against a DuckDB oracle over
the same ingested fixture (SURVEY §5 test plan), plus unit tests for the
semantic quirks (season-year shift, dirty-row tolerance) and
aggregation-invariant property checks."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from big_data_processing_spark.plans import weather as W

from .conftest import assert_frames_match
from .weather_fixture import generate

ROUND2 = W.ROUND2_SQL


@pytest.fixture(scope="module")
def fixture_info(tmp_path_factory):
    return generate(str(tmp_path_factory.mktemp("weatherdata")))


@pytest.fixture(scope="module")
def tables(spark, fixture_info):
    weather = W.ingest_weather_csv(spark, fixture_info["weather_csv"]).cache()
    location = W.ingest_location_csv(spark, fixture_info["location_csv"]).cache()
    return weather, location


@pytest.fixture(scope="module")
def wduck(tables):
    weather, location = tables
    con = duckdb.connect()
    con.register("weather", weather.toPandas())
    con.register("locations", location.toPandas())
    yield con
    con.close()


def test_ingest_drops_dirty_rows(tables, fixture_info):
    weather, location = tables
    assert weather.count() == fixture_info["n_clean_weather"]
    assert location.count() == fixture_info["n_locations"]
    assert dict(weather.dtypes)["obs_date"] == "date"


def test_district_monthly_weather(tables, wduck):
    weather, location = tables
    result = W.district_monthly_weather(weather, location)
    oracle = wduck.sql(f"""
        SELECT l.city_name AS district,
               concat_ws('-', CAST(w.year AS VARCHAR),
                         lpad(CAST(w.month AS VARCHAR), 2, '0')) AS year_month,
               {ROUND2.format(x='SUM(w.precipitation_hours)')} AS total_precip_hours,
               {ROUND2.format(x='AVG(w.temperature_2m_mean)')} AS avg_temperature
        FROM weather w JOIN locations l ON w.location_id = l.location_id
        GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    # 27 districts x 36 months = 972 rows (reference golden: 4,698 for 15 yrs)
    assert len(oracle) == 27 * 36
    assert_frames_match(result, oracle)


def test_highest_precipitation(tables, wduck):
    weather, _ = tables
    result = W.highest_precipitation(weather)
    oracle = wduck.sql(f"""
        SELECT concat_ws('-', CAST(year AS VARCHAR),
                         lpad(CAST(month AS VARCHAR), 2, '0')) AS year_month,
               {ROUND2.format(x='SUM(precipitation_sum)')} AS total_precipitation
        FROM weather GROUP BY 1
        ORDER BY total_precipitation DESC, year_month ASC LIMIT 1
    """).df()
    assert_frames_match(result, oracle)


def test_top_temperate_cities(tables, wduck):
    weather, location = tables
    result = W.top_temperate_cities(weather, location)
    oracle = wduck.sql(f"""
        SELECT l.city_name AS city,
               {ROUND2.format(x='AVG(w.temperature_2m_max)')} AS avg_max_temp,
               {ROUND2.format(x='ABS(AVG(w.temperature_2m_max) - 22.0)')} AS temp_deviation
        FROM weather w JOIN locations l ON w.location_id = l.location_id
        WHERE w.temperature_2m_max IS NOT NULL
        GROUP BY 1 ORDER BY temp_deviation ASC, city ASC LIMIT 10
    """).df()
    assert_frames_match(result, oracle)


def test_evapotranspiration_by_season(tables, wduck):
    weather, location = tables
    result = W.evapotranspiration_by_season(weather, location)
    oracle = wduck.sql(f"""
        SELECT l.city_name AS district,
               CAST(CASE WHEN w.month IN (1,2,3) THEN w.year - 1 ELSE w.year END AS INT)
                   AS season_year,
               CASE WHEN w.month IN (9,10,11,12,1,2,3) THEN 'Maha' ELSE 'Yala' END AS season,
               {ROUND2.format(x='AVG(w.et0_fao_evapotranspiration)')} AS avg_et0,
               {ROUND2.format(x='SUM(w.et0_fao_evapotranspiration)')} AS total_et0,
               COUNT(*) AS n_days
        FROM weather w JOIN locations l ON w.location_id = l.location_id
        WHERE w.et0_fao_evapotranspiration IS NOT NULL
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """).df()
    assert_frames_match(result, oracle)


def test_season_year_shift_quirk(tables):
    """Jan-Mar rows land in the PREVIOUS year's Maha (SURVEY F6)."""
    weather, location = tables
    jan_2013 = W.evapotranspiration_by_season(
        weather.filter((F.col("year") == 2013) & (F.col("month") == 1)), location
    )
    rows = jan_2013.select("season_year", "season").distinct().collect()
    assert [(r.season_year, r.season) for r in rows] == [(2012, "Maha")]


def test_radiation_analysis(tables, wduck):
    weather, _ = tables
    result = W.radiation_analysis(weather)
    oracle = wduck.sql(f"""
        SELECT CAST(year AS INT) AS year, CAST(month AS INT) AS month,
               COUNT(*) AS total_days,
               CAST(SUM(CASE WHEN shortwave_radiation_sum > 15 THEN 1 ELSE 0 END) AS BIGINT)
                   AS days_above_15,
               {ROUND2.format(x='SUM(CASE WHEN shortwave_radiation_sum > 15 THEN 1 ELSE 0 END) * 100.0 / COUNT(*)')}
                   AS percentage,
               {ROUND2.format(x='AVG(shortwave_radiation_sum)')} AS avg_radiation
        FROM weather WHERE shortwave_radiation_sum IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2
    """).df()
    assert len(oracle) == 36  # 3 years x 12 months (reference: 180 for 15 yrs)
    assert_frames_match(result, oracle)


def test_weekly_max_temp_hottest_months(tables, wduck):
    weather, location = tables
    result = W.weekly_max_temp_hottest_months(weather, location)
    oracle = wduck.sql(f"""
        WITH monthly AS (
            SELECT year, month, AVG(temperature_2m_max) AS avg_max_temp
            FROM weather WHERE temperature_2m_max IS NOT NULL
            GROUP BY year, month
        ),
        hottest AS (
            SELECT year, month FROM (
                SELECT year, month,
                       ROW_NUMBER() OVER (PARTITION BY year
                                          ORDER BY avg_max_temp DESC, month ASC) AS rnk
                FROM monthly
            ) WHERE rnk <= 3
        )
        SELECT CAST(w.year AS INT) AS year, CAST(w.month AS INT) AS month,
               CAST(w.week AS INT) AS week, l.city_name AS city,
               {ROUND2.format(x='MAX(w.temperature_2m_max)')} AS max_temp,
               {ROUND2.format(x='AVG(w.temperature_2m_max)')} AS avg_temp,
               COUNT(*) AS n_days
        FROM weather w
        JOIN locations l ON w.location_id = l.location_id
        JOIN hottest h ON w.year = h.year AND w.month = h.month
        WHERE w.temperature_2m_max IS NOT NULL
        GROUP BY 1, 2, 3, 4 ORDER BY 1, 2, 3, 4
    """).df()
    assert_frames_match(result, oracle)


def test_ml_feature_statistics(tables):
    """Reference contract (train_et_model.py:97-108): keyed
    (month, feature_name), 12 months x 4 features = 48 rows."""
    weather, _ = tables
    stats = W.ml_feature_statistics(weather).collect()
    assert len(stats) == 12 * 4
    assert {r.month for r in stats} == set(range(1, 13))
    by_key = {(r.month, r.feature): r for r in stats}
    assert all(by_key[(m, "sunshine_hours")].max <= 12.0 for m in range(1, 13))
    for r in stats:
        assert r.min <= r.mean <= r.max
        assert r.stddev >= 0
        assert r["count"] > 0
    # global 4-row variant still available
    assert len(W.ml_feature_statistics(weather, by_month=False).collect()) == 4


def test_serving_queries_run(spark, tables):
    weather, location = tables
    W.register_serving_views(spark, weather, location)
    for name in W.serving_queries():
        df = W.run_serving_query(spark, name)
        assert df.count() > 0, name


def test_pct_days_above_30_bounds(spark, tables):
    weather, location = tables
    W.register_serving_views(spark, weather, location)
    rows = W.run_serving_query(spark, "pct_days_above_30").collect()
    assert all(0.0 <= r.pct_hot_days <= 100.0 for r in rows)
    assert any(r.pct_hot_days > 0 for r in rows)  # fixture straddles 30°C


def test_monthly_sums_consistent(tables):
    """Property: Σ district-monthly precip hours == Σ daily (SURVEY §5)."""
    weather, location = tables
    monthly = W.district_monthly_weather(weather, location)
    total_monthly = monthly.agg(F.sum("total_precip_hours")).first()[0]
    total_daily = weather.agg(F.sum("precipitation_hours")).first()[0]
    assert abs(total_monthly - total_daily) < 0.01 * monthly.count()  # round2 per group


def test_topk_subset_of_ranking(tables):
    weather, location = tables
    top10 = {r.city for r in W.top_temperate_cities(weather, location, k=10).collect()}
    top27 = [r.city for r in W.top_temperate_cities(weather, location, k=27).collect()]
    assert top10 == set(top27[:10])

"""End-to-end batch pipeline — the reference's whole Lambda stack as
one Spark job.

The reference runs CSV→Kafka→HDFS, then four frameworks each re-read
everything and individually load ClickHouse (SURVEY §3). Here one
spark-submit produces the identical warehouse: typed partitioned fact,
the 8 analytical outputs, and the derived serving aggregate — each a
parquet table under ``out_dir``, all sharing one scan lineage (Spark
caches the joined fact across outputs instead of re-reading per job).

Entry point: ``python scripts/run_pipeline.py <weather_csv>
<location_csv> <out_dir>`` (the spark-submit batch entry, reference
kafka_hdfs_consumer.py:177-181); or call :func:`run_full_pipeline`.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..sources.writers import write_table
from . import weather as W


def run_full_pipeline(
    spark: SparkSession,
    weather_csv: str,
    location_csv: str,
    out_dir: str,
    with_ml: bool = True,
) -> dict[str, str]:
    """Ingest → all analytical outputs → parquet warehouse.

    Returns {table_name: path}. The fact is written partitioned by
    year; analytics reuse one cached in-memory lineage (the reference
    re-reads HDFS from scratch in every framework)."""
    out = out_dir.rstrip("/")
    paths: dict[str, str] = {}

    weather = W.ingest_weather_csv(spark, weather_csv).cache()
    location = W.ingest_location_csv(spark, location_csv)

    fact_path = f"{out}/weather_fact"
    W.write_fact_partitioned(weather, fact_path)
    paths["weather_fact"] = fact_path
    write_table(location, f"{out}/locations")
    paths["locations"] = f"{out}/locations"

    outputs = {
        "district_monthly_weather": W.district_monthly_weather(weather, location),
        "highest_precipitation": W.highest_precipitation(weather),
        "top_temperate_cities": W.top_temperate_cities(weather, location),
        "evapotranspiration_by_season": W.evapotranspiration_by_season(weather, location),
        "radiation_analysis": W.radiation_analysis(weather),
        "weekly_max_temp_hottest_months": W.weekly_max_temp_hottest_months(
            weather, location
        ),
        "ml_feature_statistics": W.ml_feature_statistics(weather),
    }
    for name, df in outputs.items():
        path = f"{out}/{name}"
        write_table(df, path)
        paths[name] = path

    if with_ml:
        from ..ml import pipeline as ML

        model, train, test = ML.train_et_model(weather)
        perf = ML.model_performance_row(spark, model, train, test)
        write_table(perf, f"{out}/ml_model_performance")
        paths["ml_model_performance"] = f"{out}/ml_model_performance"
        ML.save_model(model, f"{out}/et_model")
        paths["et_model"] = f"{out}/et_model"

    weather.unpersist()
    return paths

"""spark-submit batch entry point: build the full warehouse from CSVs.

Usage: python scripts/run_pipeline.py <weather_csv> <location_csv> <out_dir>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_processing_spark.plans.pipeline import run_full_pipeline  # noqa: E402
from big_data_processing_spark.session import get_spark  # noqa: E402


def main() -> None:
    weather_csv, location_csv, out_dir = sys.argv[1:4]
    spark = get_spark(app_name="bdp-full-pipeline")
    spark.sparkContext.setLogLevel("WARN")
    paths = run_full_pipeline(spark, weather_csv, location_csv, out_dir)
    for name, path in sorted(paths.items()):
        print(f"{name}\t{path}")
    spark.stop()


if __name__ == "__main__":
    main()

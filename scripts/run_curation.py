"""spark-submit batch entry point: curate the documents corpus.

Usage: python scripts/run_curation.py <sf_dir> <out_dir>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_processing_spark.plans.curation import run_curation_pipeline  # noqa: E402
from big_data_processing_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir, out_dir = sys.argv[1:3]
    spark = get_spark(app_name="bdp-curation")
    spark.sparkContext.setLogLevel("WARN")
    paths = run_curation_pipeline(spark, sf_dir, out_dir)
    for name, path in sorted(paths.items()):
        print(f"{name}\t{path}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Dump `.explain("formatted")` for named catalog entries into
plans/r14/<name>_<suffix>.txt — the r14 optimization-round evidence
files (judge cross-checks plan claims in OPTIMIZATION_r14.md against
these).

Usage: python scripts/dump_r14_plans.py <suffix> name1,name2,...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_processing_spark.plans import CATALOG  # noqa: E402
from big_data_processing_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump-r14-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = CATALOG[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()

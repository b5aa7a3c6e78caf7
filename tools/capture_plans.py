#!/usr/bin/env python
"""Capture .explain('formatted') output for named queries into
plans/<round>/<query>_<suffix>.txt (round via SPARK_GRAFT_PLANS_ROUND,
default r13) -- the optimization round's evidence files (the judge
reads these instead of running Spark).

Usage: python tools/capture_plans.py <suffix> [name1,name2,...]
       (default: the full bench headline set)

The plan is captured at the bench's sf (SPARK_GRAFT_SF_DIR, default
sf0.1) with the same session the bench uses, so Exchange counts and
join strategies match what the bench times (AQE initial plan; the
audit's explain-time convention).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dgraph_etl_spark.registry import REGISTRY, _load_suites  # noqa: E402
from dgraph_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"),
)


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit("usage: capture_plans.py <suffix> [names]")
    suffix = sys.argv[1]
    _load_suites()
    if len(sys.argv) > 2:
        names = [n.strip() for n in sys.argv[2].split(",") if n.strip()]
    else:
        import bench

        names = list(bench.HEADLINE_ALL)
    unknown = sorted(set(names) - set(REGISTRY))
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()

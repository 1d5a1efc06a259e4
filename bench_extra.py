"""Per-query isolation bench (guide §1.4): times individual registry
queries against $SPARK_GRAFT_SF_DIR with the same fn(spark, sf_dir)
.count() methodology as the frozen bench.py, one JSON line per query.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py q1 q2 ...
  python bench_extra.py --explain q1   # dump .explain("formatted") instead

Never used by the driver; exists so OPTIMIZATION_r08.md numbers are
reproducible without a 30-minute full bench run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    explain = "--explain" in sys.argv
    names = [a for a in sys.argv[1:] if not a.startswith("--")]

    from langtoolsosm_spark.plans.driver_queries import REGISTRY
    from langtoolsosm_spark.session import get_spark

    spark = get_spark("bench_extra", cores=cpus, shuffle_partitions=max(cpus, 8))
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()  # warm
    for name in names:
        fn, _oracle = REGISTRY[name]
        spark.sparkContext.setJobDescription(name)
        if explain:
            df = fn(spark, sf_dir)
            print(f"==== {name} ====")
            df.explain("formatted")
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        print(json.dumps({"query": name, "sec": round(time.time() - t0, 3),
                          "rows": n, "sf_dir": sf_dir,
                          "load1": round(os.getloadavg()[0], 2)}), flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()

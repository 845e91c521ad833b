"""Time a subset of registered queries with the bench.py methodology
(one warm run, N measured noop-sink runs, median + spread). Usage:
python tools/bench_subset.py q1 q2 ... [env SPARK_GRAFT_SF_DIR, N_RUNS]"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_anonymiser_minimiser_spark import queries as Q
from database_anonymiser_minimiser_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_runs = int(os.environ.get("N_RUNS", "3"))
    spark = get_spark(app_name="dbmask-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        Q.load(spark, sf_dir, "lineitem").count()
    except Exception:
        pass
    out = {}
    for name in names:
        fn = Q.QUERIES[name]
        spark.sparkContext.setJobDescription(f"warm:{name}")
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        runs = []
        for i in range(n_runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"run{i}:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
        runs.sort()
        out[name] = {"median": runs[len(runs) // 2], "runs": runs}
        print(json.dumps({name: out[name]}))
    spark.stop()


if __name__ == "__main__":
    main()

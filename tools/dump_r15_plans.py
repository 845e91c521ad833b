"""Dump .explain("formatted") for the round-15 optimization targets to
plans/r15/<query>_<tag>.txt. Run: python tools/dump_r15_plans.py <tag> [query ...]
(default query list below). The judge checks plan-shape claims in
OPTIMIZATION_r15.md against these files."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_anonymiser_minimiser_spark import queries as Q
from database_anonymiser_minimiser_spark.session import get_spark

DEFAULT = [
    "dedup_ngram_jaccard",
    "dedup_containment_pairs",
    "bpe_encode_token_count",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dbmask-r15-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = Q.QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()

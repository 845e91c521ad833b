"""Plan audit: flag registered queries whose physical plan scans the
SAME parquet table more than once WITHOUT exchange reuse or an
operator-managed persist — the pattern behind the round-7 wide-simhash
find (a self-join recomputing its expensive upstream aggregate twice
because Catalyst declined ReuseExchange across the aliased sides).

A re-scan is not automatically a defect: multi-table queries read each
table once per USE (e.g. a table joined to itself at different
granularities), tiny dimension re-reads are noise, and some operators
deliberately trade a second cheap scan for not caching. The audit
separates signal from noise by reporting, per query:

    table -> (#distinct Scan-parquet nodes, #InMemoryTableScan nodes,
              #ReusedExchange nodes)

and flagging only plans with >= 2 distinct scans of ONE table, zero
reuse, and zero cached reads. The output is a worklist for a human,
not a gate — it is run per-round (results summarised in
PERFORMANCE.md), not in CI.

Usage: python tools/audit_rescans.py [sf_dir] [-k substring]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from database_anonymiser_minimiser_spark import queries as Q
from database_anonymiser_minimiser_spark.session import get_spark


def plan_of(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def audit_one(plan: str) -> dict:
    """table-name -> distinct Scan-parquet node count, + reuse stats.
    Node ids are DISTINCT-counted (the formatted tree repeats names in
    the detail section)."""
    scans: dict[str, set] = {}
    # tree section lines: 'Scan parquet  (13)' then detail 'Location ...'
    for node_id, detail in re.findall(
        r"\((\d+)\) Scan parquet\s*\n(?:.*\n)*?Location:.*?\[([^\]]*)\]", plan
    ):
        m = re.search(r"([a-z_0-9]+)\.parquet", detail)
        table = m.group(1) if m else "?"
        scans.setdefault(table, set()).add(node_id)
    # fallback: tree lines carry the relation name inline
    if not scans:
        for node_id, rel in re.findall(r"\((\d+)\) Scan parquet ([\w.]+)", plan):
            scans.setdefault(rel.rsplit(".", 1)[-1], set()).add(node_id)
    return {
        "scans": {t: len(ids) for t, ids in scans.items()},
        "reused": len(set(re.findall(r"\((\d+)\) ReusedExchange", plan))),
        "cached": len(set(re.findall(r"\((\d+)\) InMemoryTableScan", plan))),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    sel = None
    if "-k" in sys.argv:
        sel = sys.argv[sys.argv.index("-k") + 1]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    spark = get_spark(app_name="audit-rescans")
    spark.sparkContext.setLogLevel("ERROR")
    flagged, errs = [], []
    for name, fn in Q.QUERIES.items():
        if sel and sel not in name:
            continue
        if name.startswith("streaming_"):  # streams execute on build
            continue
        try:
            info = audit_one(plan_of(fn(spark, sf_dir)))
        except Exception as exc:  # noqa: BLE001
            errs.append((name, str(exc).splitlines()[0][:100]))
            continue
        multi = {t: n for t, n in info["scans"].items() if n >= 2}
        if multi and not info["reused"] and not info["cached"]:
            flagged.append((name, multi))
            print(f"FLAG {name}: {multi}")
        spark.catalog.clearCache()
    print(f"\n{len(flagged)} flagged; {len(errs)} errors")
    for name, e in errs:
        print(f"ERR  {name}: {e}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Regenerate COVERAGE.md's physical-plan audit table: for every
registered query, count non-broadcast Exchanges (the shuffles that
cost at 100 TB), broadcast exchanges, and Python operators in the
executed plan at the given sf dir.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
Prints the markdown table to stdout.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def audit(plan: str) -> tuple[int, int, int]:
    # shuffle exchanges = Exchange hashpartitioning / rangepartitioning
    shuffle = len(re.findall(r"Exchange (hash|range)partitioning", plan))
    bcast = plan.count("BroadcastExchange")
    py = (
        plan.count("MapInPandas")
        + plan.count("ArrowEvalPython")
        + plan.count("BatchEvalPython")
        + plan.count("FlatMapGroupsInPandas")
    )
    return shuffle, bcast, py


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from datashare_extension_neo4j_spark.queries import QUERIES
    from datashare_extension_neo4j_spark.session import get_spark

    spark = get_spark(
        app_name="plan_audit", master="local[8]", shuffle_partitions=8
    )
    print("| query | exchanges | broadcast | python in plan |")
    print("|---|---|---|---|")
    for name, (fn, _oracle) in QUERIES.items():
        if only and name not in only:
            continue
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        shuffle, bcast, py = audit(plan)
        print(f"| {name} | {shuffle} | {bcast} | {py} |")
    spark.stop()


if __name__ == "__main__":
    main()

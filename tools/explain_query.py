"""Print the physical plan of any registered query.

Usage: python tools/explain_query.py <query_name> [sf_dir] [mode]
  mode: simple (default) | formatted | extended | cost | codegen

The quick way to audit a scale claim: PushedFilters / ReadSchema on
the scans, BroadcastHashJoin vs SortMergeJoin, TakeOrderedAndProject
vs global Sort, Exchange count.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from fabric_claims_spark.queries import load_all_queries  # noqa: E402
from fabric_claims_spark.session import get_spark  # noqa: E402


def main() -> int:
    if len(sys.argv) < 2:
        registry = load_all_queries()
        print(__doc__.strip())
        print(f"\n{len(registry)} registered queries:")
        for name in registry:
            print(f"  {name}")
        return 1
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    mode = sys.argv[3] if len(sys.argv) > 3 else "simple"
    registry = load_all_queries()
    if name not in registry:
        raise SystemExit(f"unknown query {name!r} — run with no args to list")
    spark = get_spark("explain-query")
    spark.sparkContext.setLogLevel("ERROR")
    df = registry[name].fn(spark, sf_dir)
    print(
        df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                mode
            )
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

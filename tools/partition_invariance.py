"""Partition-order-independence sweep: run each query's value hash
under shuffle_partitions=7 and =200 and compare (the README claim's
harness). Deterministic results must not depend on physical planning;
a mismatch means a float sum or window frame leaked partition order.

Usage: python tools/partition_invariance.py [sf_dir] [query ...]
(defaults: sf0.01, every registered query)
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tools.check_correctness import canonical  # noqa: E402

from fabric_claims_spark.queries import load_all_queries  # noqa: E402
from fabric_claims_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    registry = load_all_queries()
    spark = get_spark("partition-invariance")
    failures = []
    for name, spec in registry.items():
        if only and name not in only:
            continue
        hashes = []
        for parts in (7, 200):
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            spark.catalog.clearCache()
            h, n, _ = canonical(spec.fn(spark, sf_dir).toPandas())
            hashes.append((parts, h, n))
        (p1, h1, n1), (p2, h2, n2) = hashes
        ok = h1 == h2 and n1 == n2
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {p1}p h={h1} | {p2}p h={h2}", flush=True)
        if not ok:
            failures.append(name)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

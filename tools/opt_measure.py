"""Round-13 optimization measurement harness (guide §1).

Times registered queries in isolation with the noop sink (so the
computation is measured, not the collect/count action), labels each
job, and optionally dumps `.explain("formatted")` to plans/r14/.

Usage:
  python tools/opt_measure.py <sf_dir> <query> [query...] [--plans SUFFIX]
                              [--runs N]

Prints one line per query: name, per-run wall seconds (noop sink).
`--plans before` writes plans/r14/<query>_before.txt.
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fabric_claims_spark.queries import load_all_queries  # noqa: E402
from fabric_claims_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:]]
    runs = 2
    plans_suffix = None
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    if "--plans" in args:
        i = args.index("--plans")
        plans_suffix = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0]
    names = args[1:]
    registry = load_all_queries()
    spark = get_spark("opt-measure")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the session + page cache the way bench.py does
    registry["pricing_summary"].fn(spark, sf_dir).count()
    plans_dir = Path(__file__).resolve().parent.parent / "plans" / "r14"
    if plans_suffix:
        plans_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        if name not in registry:
            print(f"{name}: UNKNOWN", flush=True)
            continue
        times = []
        for r in range(runs):
            spark.sparkContext.setJobDescription(f"opt-measure: {name} run{r}")
            t0 = time.time()
            df = registry[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            jsc = spark.sparkContext._jsc.sc()
            it = jsc.getPersistentRDDs().values().iterator()
            while it.hasNext():
                it.next().unpersist(False)
        spark.sparkContext.setJobDescription(None)
        if plans_suffix:
            df = registry[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            (plans_dir / f"{name}_{plans_suffix}.txt").write_text(plan)
        print(f"{name}: {times}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

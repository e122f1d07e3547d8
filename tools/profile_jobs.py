"""Per-job profile of one registered query (guide §1/§7.1 without a
browser): run the query under the noop sink, then dump every Spark job
this run launched — duration, description, stage/task counts — from
the UI REST API. Shows where a multi-action gate (serving-index
builds) actually spends its wall clock.

Usage: python tools/profile_jobs.py <sf_dir> <query> [query...]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fabric_claims_spark.queries import load_all_queries  # noqa: E402
from fabric_claims_spark.session import get_spark  # noqa: E402


def _rest(spark, path: str):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
        return json.loads(r.read())


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    registry = load_all_queries()
    spark = get_spark("profile-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    registry["pricing_summary"].fn(spark, sf_dir).count()  # warm
    for name in names:
        before = {j["jobId"] for j in _rest(spark, "jobs")}
        t0 = time.time()
        df = registry[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        spark.catalog.clearCache()
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(False)
        jobs = [j for j in _rest(spark, "jobs") if j["jobId"] not in before]
        jobs.sort(key=lambda j: j["jobId"])
        total_job = 0.0
        print(f"\n=== {name}: wall {wall:.2f}s, {len(jobs)} jobs ===")
        for j in jobs:
            sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            comp = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            # sub-second precision from the GMT strings' .mmm part
            sms = float(j["submissionTime"][20:23] or 0) / 1000
            cms = float(j["completionTime"][20:23] or 0) / 1000
            dur = (time.mktime(comp) + cms) - (time.mktime(sub) + sms)
            total_job += dur
            desc = (j.get("description") or j["name"])[:90]
            print(
                f"  job {j['jobId']:4d} {dur:6.2f}s tasks={j['numTasks']:4d} {desc}"
            )
        print(
            f"  sum(job durations)={total_job:.2f}s  "
            f"gap(driver-side)={wall - total_job:.2f}s"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

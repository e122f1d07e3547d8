"""Scale smoke: generate a large synthetic claims CSV and push it
through the full medallion pipeline, reporting per-layer wall time and
rows/sec. Not part of the driver gates — this is the 'would the plan
survive 100×' feedback loop (SURVEY.md §4).

Usage: python tools/scale_smoke.py [n_rows] [workdir]
"""

from __future__ import annotations

import random
import sys
import time
import uuid
from pathlib import Path

sys.path.insert(0, "/root/repo")

from fabric_claims_spark.pipeline.runner import ClaimsRunner  # noqa: E402
from fabric_claims_spark.session import get_spark  # noqa: E402

HEADER = (
    "ClaimID,PatientID,ProviderID,ClaimAmount,ClaimDate,DiagnosisCode,"
    "ProcedureCode,PatientAge,PatientGender,ProviderSpecialty,ClaimStatus,"
    "PatientIncome,PatientMaritalStatus,PatientEmploymentStatus,"
    "ProviderLocation,ClaimType,ClaimSubmissionMethod"
)


def generate(path: Path, n: int, seed: int = 42) -> None:
    """~5% dup ClaimIDs, ~2% DQ violations, ~0.5% malformed."""
    rng = random.Random(seed)
    genders = ["F", "M", "U", "Other"]
    statuses = ["Approved", "Denied", "Pending", "Partial"]
    types = ["Routine", "Emergency", "Inpatient", "Outpatient", "Urgent Care"]
    methods = ["Paper", "Online", "Phone"]
    with path.open("w") as f:
        f.write(HEADER + "\n")
        prev_ids: list[str] = []
        for i in range(n):
            r = rng.random()
            if r < 0.05 and prev_ids:
                cid = rng.choice(prev_ids)  # duplicate key
            else:
                cid = str(uuid.UUID(int=rng.getrandbits(128)))
                if len(prev_ids) < 1000:
                    prev_ids.append(cid)
            amount = f"{rng.randint(100, 999999) / 100:.2f}"
            age = rng.randint(0, 120)
            if r > 0.995:
                amount = "not_a_number"  # malformed
            elif r > 0.98:
                age = 200  # DQ violation
            f.write(
                ",".join(
                    [
                        cid,
                        str(uuid.UUID(int=rng.getrandbits(128))),
                        str(uuid.UUID(int=rng.getrandbits(64) << 64)),
                        amount,
                        f"20{rng.randint(15, 30):02d}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}",
                        f"D{rng.randint(100, 999)}",
                        f"P{rng.randint(100, 999)}",
                        str(age),
                        rng.choice(genders),
                        f"Spec{rng.randint(0, 19)}",
                        rng.choice(statuses),
                        f"{rng.randint(10000, 200000)}.00",
                        "Single",
                        "Employed",
                        f"City{rng.randint(0, 49)}",
                        rng.choice(types),
                        rng.choice(methods),
                    ]
                )
                + "\n"
            )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    workdir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/claims_scale_smoke")
    workdir.mkdir(parents=True, exist_ok=True)
    csv = workdir / "claims.csv"

    t0 = time.time()
    generate(csv, n)
    print(f"generate: {n} rows in {time.time()-t0:.1f}s "
          f"({csv.stat().st_size/1e6:.0f} MB)")

    spark = get_spark("scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    runner = ClaimsRunner(spark, str(workdir / "lake"))

    for layer, fn in [
        ("bronze", lambda: runner.run_bronze(str(csv))),
        ("silver", lambda: runner.run_silver(incremental=True)),
        ("gold", runner.run_gold),
    ]:
        t0 = time.time()
        result = fn()
        dt = time.time() - t0
        rate = n / dt if dt else 0
        print(f"{layer}: {dt:.1f}s ({rate/1000:.0f}k rows/s) → "
              f"{ {k: v for k, v in result.items() if k not in ('run_id',)} }")


if __name__ == "__main__":
    main()

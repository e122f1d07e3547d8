"""Synthetic claims CSV fixtures (FIXTURES.md §1): deterministic rows
with known counts per quarantine path, so the bronze 4-way split has
an exact oracle."""

from __future__ import annotations

import random
import uuid
from pathlib import Path

HEADER = (
    "ClaimID,PatientID,ProviderID,ClaimAmount,ClaimDate,DiagnosisCode,"
    "ProcedureCode,PatientAge,PatientGender,ProviderSpecialty,ClaimStatus,"
    "PatientIncome,PatientMaritalStatus,PatientEmploymentStatus,"
    "ProviderLocation,ClaimType,ClaimSubmissionMethod"
)


def _uuid(rng: random.Random) -> str:
    return str(uuid.UUID(int=rng.getrandbits(128)))


def _valid_row(rng: random.Random, claim_id: str | None = None, date: str = "2024-03-15") -> str:
    cid = claim_id or _uuid(rng)
    return ",".join(
        [
            cid,
            _uuid(rng),
            _uuid(rng),
            f"{rng.randint(100, 99999) / 100:.2f}",
            date,
            f"D{rng.randint(100, 999)}",
            f"P{rng.randint(100, 999)}",
            str(rng.randint(0, 120)),
            rng.choice(["F", "M", "U", "Other"]),
            rng.choice(["Cardiology", "Oncology", "Pediatrics"]),
            rng.choice(["Approved", "Denied", "Pending", "Partial"]),
            f"{rng.randint(10000, 200000)}.00",
            rng.choice(["Single", "Married"]),
            rng.choice(["Employed", "Unemployed", "Retired"]),
            rng.choice(["Boston", "Austin", "Denver"]),
            rng.choice(["Routine", "Emergency", "Inpatient", "Outpatient", "Urgent Care"]),
            rng.choice(["Paper", "Online", "Phone"]),
        ]
    )


def write_claims_fixture(path: Path, seed: int = 7) -> dict[str, int]:
    """Returns expected split counts: valid / malformed / duplicates /
    bad_quality (each injected row maps to exactly one bucket)."""
    rng = random.Random(seed)
    lines = [HEADER]

    n_valid = 40
    for _ in range(n_valid):
        lines.append(_valid_row(rng))

    # duplicates: 3 ClaimIDs delivered twice with different dates —
    # latest survives, older goes to dupe_claims (rank>1) → 3 dupes.
    dup_survivors = []
    for _ in range(3):
        cid = _uuid(rng)
        lines.append(_valid_row(rng, claim_id=cid, date="2024-01-05"))
        lines.append(_valid_row(rng, claim_id=cid, date="2024-06-30"))
        dup_survivors.append(cid)

    # malformed: unparsable decimal / date (PERMISSIVE captures these).
    base = _valid_row(rng).split(",")
    bad1 = list(base)
    bad1[3] = "not_a_number"
    base2 = _valid_row(rng).split(",")
    bad2 = list(base2)
    bad2[4] = "31-31-2024"
    lines.append(",".join(bad1))
    lines.append(",".join(bad2))
    n_malformed = 2

    # DQ violations (one per rule family, all parseable):
    bad_rows = []
    r = _valid_row(rng).split(","); r[7] = "150"; bad_rows.append(r)          # age > 120
    r = _valid_row(rng).split(","); r[3] = "-10.00"; bad_rows.append(r)       # amount <= 0
    r = _valid_row(rng).split(","); r[8] = "X"; bad_rows.append(r)            # bad gender
    r = _valid_row(rng).split(","); r[10] = "Unknown"; bad_rows.append(r)     # bad status
    r = _valid_row(rng).split(","); r[0] = "not-a-uuid"; bad_rows.append(r)   # bad ClaimID
    # multi-violation: bad type AND bad submission → ';'-joined reasons
    r = _valid_row(rng).split(","); r[15] = "Telehealth"; r[16] = "Fax"; bad_rows.append(r)
    lines.extend(",".join(r) for r in bad_rows)
    n_bad = len(bad_rows)

    path.write_text("\n".join(lines) + "\n")
    return {
        "total": n_valid + 6 + n_malformed + n_bad,  # 6 = 3 dup pairs
        "valid": n_valid + 3,  # survivors of the 3 dup pairs
        "malformed": n_malformed,
        "duplicates": 3,
        "bad_quality": n_bad,
        "dup_survivor_ids": dup_survivors,
    }

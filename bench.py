"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
JSON lines of the form {"metric": ..., "value": total_sec, "unit":
"sec", "queries": {name: sec}, "sf": ...} — the headline record first
(truncation-proof), then the full-suite record with every per-query
timing and "full_suite_total".

Each query executes to completion (count() action — results are
aggregates or bounded sets, so the action cost is the query cost, not
a driver transfer). A warmup query amortizes JVM/codegen startup out
of the measured numbers.

Full-suite honesty (VERDICT r8 item 2): the canary basket re-runs at
the END of the full-suite pass and is emitted as its own
``full_suite_drift`` record, so the suite total carries an in-band
drift basis for ITS OWN window (the headline canary runs much
earlier — r8's audit trail showed host load escalating mid-run, which
made the 631 s total undecomposable). Every record this script prints
is also persisted to ``BENCH_full_r{N}.json`` beside this file, so
the driver's tail-truncated capture stops eating the per-query dict.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from fabric_claims_spark.queries import load_all_queries  # noqa: E402
from fabric_claims_spark.session import get_spark  # noqa: E402
from tools.bench_compare import CANARY  # noqa: E402

def _current_round(here: str) -> int:
    """The round this run belongs to: SPARK_GRAFT_ROUND if set, else
    max(BENCH_r*.json)+1 — i.e. the driver has not yet written this
    round's capture. When the driver HAS already written BENCH_r{N}
    (a re-run inside the same round), the env override is the
    authoritative label; without it the inference points one past the
    recorded rounds, which is still a PRIOR-round-exclusive bound for
    baseline selection."""
    import glob as _glob
    import re as _re

    n_round = os.environ.get("SPARK_GRAFT_ROUND")
    if n_round:
        return int(n_round)
    seen = [
        int(m.group(1))
        for p in _glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := _re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    return max(seen) + 1 if seen else 1


def _full_record_path(here: str) -> str:
    """Non-clobbering path for this run's full-suite record. The
    canonical name is BENCH_full_r{N:02d}.json; if a record for this
    round already exists (an earlier run this round — possibly the
    very baseline the compare just used), suffix _run2, _run3, …
    instead of overwriting it."""
    n = _current_round(here)
    base = os.path.join(here, f"BENCH_full_r{n:02d}")
    if not os.path.exists(base + ".json"):
        return base + ".json"
    k = 2
    while os.path.exists(f"{base}_run{k}.json"):
        k += 1
    return f"{base}_run{k}.json"


HEADLINE = [
    "pricing_summary",
    "star_revenue_by_region_year",
    "dedup_latest_order_per_customer",
    "top3_orders_per_customer",
    "ytd_running_revenue",
    "yoy_monthly_revenue",
    "quality_split_buckets",
    "dq_reasons_orders",
    "events_hourly_tumbling",
    "state_latest_per_user",
    "docs_exact_dedup",
    "docs_jaccard_pairs",
    "embeddings_knn_bruteforce",
    "embeddings_ivf_assign",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    full = os.environ.get("SPARK_GRAFT_BENCH_FULL", "1") != "0"
    registry = load_all_queries()
    spark = get_spark("fabric-claims-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: run the flagship once to JIT/codegen-warm the session,
    # and touch every table once so the OS page cache is uniformly
    # warm — otherwise whichever text/embedding query runs FIRST
    # absorbs the container's cold-read jitter (~3-5 s at sf0.1) and
    # cross-round comparisons of that one query are noise.
    registry["pricing_summary"].fn(spark, sf_dir).count()
    for t in os.listdir(sf_dir):
        if t.endswith(".parquet"):
            # xxhash64 over all columns forces real byte reads (a bare
            # count() is answered from parquet metadata), JVM-side
            spark.read.parquet(os.path.join(sf_dir, t)).selectExpr(
                "count(xxhash64(struct(*)))"
            ).collect()

    # HEADLINE runs first and alone defines `value` — the metric the
    # driver baselines across rounds, so its membership never changes.
    # The rest of the registry is timed after it (skippable via
    # SPARK_GRAFT_BENCH_FULL=0) and reported alongside.
    timings: dict[str, float] = {}

    # every printed record also lands in BENCH_full_r{N}.json — the
    # truncation-proof audit copy (VERDICT r8 item 2)
    records: list[dict] = []

    def emit(rec: dict) -> None:
        records.append(rec)
        print(json.dumps(rec), flush=True)

    def run_one(name: str, into: dict[str, float] | None = None) -> None:
        t0 = time.time()
        registry[name].fn(spark, sf_dir).count()
        (timings if into is None else into)[name] = round(
            time.time() - t0, 3
        )
        # Several registered queries cache intermediates (scan
        # amortization inside one query); clear between queries so a
        # full-suite session doesn't accrete executor storage — each
        # query is measured cold-cache, as it would run alone.
        spark.catalog.clearCache()
        # clearCache only drops SQL-cached relations; localCheckpoint
        # blocks (clean_corpus labels, estimate-error pairs) persist
        # as plain RDD storage — release those too
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(False)

    for name in HEADLINE:
        run_one(name)
    total = round(sum(timings.values()), 3)

    # The headline record prints FIRST, as a complete self-contained
    # JSON line (per-query detail limited to the headline set), so a
    # tail-truncated capture still carries the round's metric; the
    # full per-query dict follows as its own JSON line.
    # The canary times ride along in-band (VERDICT r7 item 8): the
    # drift-normalization basis (tools/bench_compare.CANARY — queries
    # unchanged since round 1) is auditable from this JSON alone,
    # without reconstructing it from the per-query dict.
    canary = {
        "canary_queries": {n: timings[n] for n in CANARY if n in timings},
        "canary_total": round(
            sum(timings[n] for n in CANARY if n in timings), 3
        ),
    }
    emit(
        {
            "metric": "headline_suite_total",
            "value": total,
            "unit": "sec",
            "queries": {n: timings[n] for n in HEADLINE},
            **canary,
            "sf": sf,
        }
    )

    # Cadence guard (VERDICT r6 item 9): identical code benched
    # 11.32-12.82 s across solo runs this host — one sample per round
    # makes every cross-round delta an argument about noise. Run the
    # headline set N=3 times in-band and record per-run totals plus
    # the per-query MEDIANS as their own JSON line, so next round's
    # drift analysis reads medians, not single draws. `value` above
    # stays the first run for cross-round continuity with r1-r6.
    solo_runs: list[dict[str, float]] = [dict(timings)]
    for _ in range(2):
        rerun: dict[str, float] = {}
        for name in HEADLINE:
            run_one(name, rerun)
        solo_runs.append(rerun)
    run_totals = [round(sum(r.values()), 3) for r in solo_runs]

    def _median3(xs: list[float]) -> float:
        return sorted(xs)[1]

    emit(
        {
            "metric": "headline_solo_median",
            "value": _median3(run_totals),
            "unit": "sec",
            "runs": run_totals,
            "queries": {
                n: _median3([r[n] for r in solo_runs]) for n in HEADLINE
            },
            "canary_total": round(
                _median3(
                    [sum(r[n] for n in CANARY if n in r) for r in solo_runs]
                ),
                3,
            ),
            "sf": sf,
        }
    )

    if full:
        for name in registry:
            if name not in timings:
                run_one(name)
        # Robust baseline mode (round 11): a single-pass per-query
        # record is one transient host stall away from a poisoned
        # baseline (three r11 windows, three different pollution
        # patterns: a 5.9→26.5 s mid-suite hiccup, then a 3× loaded
        # headline window). Contention noise is one-sided — it only
        # ADDS time — so min-of-2-passes is the robust per-query
        # estimator for a committed baseline-of-record. Opt-in
        # (SPARK_GRAFT_BENCH_ROBUST=1): the driver's informational
        # windows stay single-pass.
        robust = os.environ.get("SPARK_GRAFT_BENCH_ROBUST") == "1"
        if robust:
            second: dict[str, float] = {}
            for name in registry:
                run_one(name, second)
            for name, t2 in second.items():
                if name in timings:
                    timings[name] = min(timings[name], t2)
        emit(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                **(
                    {"per_query_stat": "min_of_2_passes"}
                    if robust
                    else {}
                ),
                "queries": timings,
                "full_suite_total": round(sum(timings.values()), 3),
                **canary,
                "sf": sf,
            }
        )
        # End-of-suite canary window (VERDICT r8 item 2): the headline
        # canary above ran BEFORE the ~10-minute full-suite pass, so it
        # cannot witness host drift DURING the pass (r8: solo totals
        # [22.7, 23.8, 38.3] — load escalating mid-run). Re-run the
        # basket now and emit both windows side by side; the suite
        # total becomes decomposable into code vs host with numbers
        # from its own run.
        canary_end: dict[str, float] = {}
        for name in CANARY:
            run_one(name, canary_end)
        end_total = round(sum(canary_end.values()), 3)
        # This run IS the round's baseline-of-record iff it lands on
        # the canonical (non-_runK) filename — i.e. it is the round's
        # first full run (the builder's committed quiet window).
        _here = os.path.dirname(os.path.abspath(__file__))
        _is_baseline = not os.path.exists(
            os.path.join(
                _here, f"BENCH_full_r{_current_round(_here):02d}.json"
            )
        )
        emit(
            {
                "metric": "full_suite_drift",
                "baseline_of_record": _is_baseline,
                "canary_end_queries": canary_end,
                "canary_end_total": end_total,
                "canary_headline_total": canary["canary_total"],
                "within_run_drift": round(
                    end_total / canary["canary_total"], 3
                )
                if canary["canary_total"]
                else None,
                "full_suite_total": round(sum(timings.values()), 3),
                "n_queries": len(timings),
                "sf": sf,
            }
        )

    # Host-drift defense, machine-readable (VERDICT r5 item 7): the
    # same commit has benched 12.0 s and 17.6 s on this host under
    # different contention, so a raw cross-round ratio is noise.
    # Emit tools/bench_compare.normalized_verdict against the newest
    # recorded round (and round 1) as its own JSON line — the judge
    # can read the canary-normalized ratio instead of re-deriving it.
    try:
        import glob as _glob
        import re as _re

        from tools.bench_compare import load as _bc_load
        from tools.bench_compare import normalized_verdict as _bc_verdict

        here = os.path.dirname(os.path.abspath(__file__))
        rounds = sorted(_glob.glob(os.path.join(here, "BENCH_r*.json")))
        for ref in {rounds[0], rounds[-1]} if rounds else set():
            emit(
                {
                    "metric": "bench_compare_normalized",
                    "vs": os.path.basename(ref),
                    **_bc_verdict(_bc_load(ref), timings),
                }
            )
        # Full-suite cross-round comparison (VERDICT r8 item 2
        # follow-through): BENCH_full_r{N}.json files carry the
        # COMPLETE per-query dict plus both canary windows, so from
        # round 10 on the full-suite total itself gets a normalized
        # ratio against the newest prior full record — computed over
        # the shared-query intersection, so registry growth doesn't
        # masquerade as regression.
        # Baselines must be PRIOR rounds only: comparing against a
        # same-round file (e.g. an earlier run of this very suite, or
        # the thin record a headline-only run used to leave behind)
        # self-compares and then gets clobbered — the committed r9
        # record shows 'vs': its own filename. Exclude every full
        # record belonging to the current round.
        cur_round = _current_round(here)
        # Baseline-of-record selection (VERDICT r10 item 6): each
        # round's CANONICAL full record — BENCH_full_r{N:02d}.json,
        # no _runK suffix, i.e. the round's first full run, which is
        # the builder's committed quiet window — is the compare
        # baseline; the driver's later _runK windows are
        # informational (the r10 records showed ±20% methodology
        # spread across windows of one round). Fall back to the
        # newest _runK only when a round has no canonical record.
        by_round: dict[int, list[str]] = {}
        for p in _glob.glob(os.path.join(here, "BENCH_full_r*.json")):
            m = _re.search(
                r"BENCH_full_r(\d+)(?:_run\d+)?\.json$",
                os.path.basename(p),
            )
            if m and int(m.group(1)) < cur_round:
                by_round.setdefault(int(m.group(1)), []).append(p)
        if full and by_round:
            import statistics as _stats

            prior_round_files = sorted(by_round[max(by_round)])
            canonical = [
                p
                for p in prior_round_files
                if "_run" not in os.path.basename(p)
            ]
            prior = canonical[0] if canonical else prior_round_files[-1]
            prior_is_baseline = bool(canonical)
            prev = _bc_load(prior)
            shared = [
                q
                for q in set(prev) & set(timings)
                if prev[q] > 0.05  # sub-50ms timings are noise
            ]

            # Drift basis: the END-of-suite canaries from BOTH runs.
            # The headline-window canary misnormalizes the suite —
            # the two windows can drift oppositely within one run
            # (measured within_run_drift 0.29-0.46 this round), which
            # manufactures fake per-query regressions. Fall back to
            # the headline-canary verdict only when the prior record
            # predates the end-canary instrumentation.
            def _end_canary(recs: list[dict]) -> dict[str, float]:
                for r in recs:
                    if r.get("metric") == "full_suite_drift":
                        return dict(r.get("canary_end_queries") or {})
                return {}

            with open(prior) as f:
                prior_recs = [
                    json.loads(ln)
                    for ln in f
                    if ln.strip().startswith("{")
                ]
            prev_end = _end_canary(prior_recs)
            now_end = _end_canary(records)
            end_ratios = [
                now_end[q] / prev_end[q]
                for q in prev_end
                if q in now_end and prev_end[q] > 0
            ]
            # Basis stability (round 11): the end-canary basis
            # normalizes correctly only when each run's host held
            # roughly steady ACROSS its own suite pass — the r11
            # quiet-window run measured within_run_drift 0.544 (host
            # sped up 2× mid-run), and dividing the whole suite's
            # flat raw ratios (0.93) by that end window's 0.474
            # manufactured 2-3× "normalized regressions" on dozens of
            # queries that actually ran under the slower early-run
            # host. When either run's two canary windows disagree by
            # more than 1.5× in either direction, the normalized
            # ratios (including the median-confirmed bits, which
            # share the same host divisor) are basis-bounded noise,
            # not code signals — the record says so machine-readably
            # and the raw ratio is authoritative.
            def _within_drift(recs: list[dict]) -> float | None:
                for r in recs:
                    if r.get("metric") == "full_suite_drift":
                        return r.get("within_run_drift")
                return None

            from tools.bench_compare import basis_state as _basis_state
            from tools.bench_compare import (
                confirmation_host as _confirm_host,
            )

            # ADVICE r11: None/0.0 drift readings must not silently
            # count as stable — an unmeasured basis is its own state
            # and is NOT normalizable.
            basis = _basis_state(
                [_within_drift(prior_recs), _within_drift(records)]
            )
            basis_stable = basis == "stable"
            if shared and end_ratios:
                host = _stats.median(end_ratios)
                worst = sorted(
                    (
                        ((timings[q] / prev[q]) / host, q)
                        for q in shared
                        if prev[q] > 0
                    ),
                    reverse=True,
                )
                tot_prev = sum(prev[q] for q in shared)
                tot_now = sum(timings[q] for q in shared)
                # Median confirmation (VERDICT r9 item 7): within-run
                # drift 0.29–0.46 makes a single suite-pass timing too
                # noisy to call a >1.5× flag a regression (r9: 9 fake
                # flags on identical trees). Re-run each flagged query
                # solo 3× and recompute the ratio from the median —
                # the flag carries a median-confirmed bit, so only
                # flags that survive re-measurement read as code
                # regressions. Bounded to the 8 worst to cap re-run
                # cost.
                flags = []
                confirm_host: float | None = None
                confirm_host_basis = "none"
                for n, q in worst:
                    if n <= 1.5:
                        break
                    entry = [q, round(n, 3)]
                    # Median confirmation: on a stable basis the
                    # re-run ratio is host-normalized; on an unstable
                    # basis the host divisor is itself the artifact,
                    # so confirm against the RAW ratio instead (the
                    # solo re-runs happen NOW, in the same window as
                    # the end canary — a transient mid-suite stall,
                    # e.g. r11's 5.9→26.5 s hiccup on one query,
                    # shows up as raw_median_ratio ≈ 1 and reads
                    # unconfirmed). flag_ratio_basis names which.
                    #
                    # VERDICT r11 nit: the suite-pass host factor
                    # cannot normalize re-runs taken minutes later —
                    # the driver's r11 run2 window stamped three
                    # 5.8-8.9× "confirmations" on queries that were
                    # FASTER than r10 in the canonical record,
                    # because the confirmer re-measured the same
                    # loaded host against an unloaded baseline. So
                    # before the first confirmation, re-measure the
                    # CANARY basket in this same window (median of 3
                    # solo passes per query) and divide by the
                    # baseline run's end-canary: a same-window
                    # re-measure of the baseline side. Falls back to
                    # the suite host factor only when the prior
                    # record has no end-canary to re-measure against.
                    if len(flags) < 8:
                        if basis_stable and confirm_host is None:
                            solo_c: dict[str, list[float]] = {}
                            for _ in range(3):
                                for cq in prev_end:
                                    if cq not in timings:
                                        continue
                                    scr: dict[str, float] = {}
                                    run_one(cq, scr)
                                    solo_c.setdefault(cq, []).append(
                                        scr[cq]
                                    )
                            confirm_host = _confirm_host(
                                {
                                    cq: sorted(v)[1]
                                    for cq, v in solo_c.items()
                                },
                                prev_end,
                            )
                            if confirm_host is None:
                                confirm_host = host
                                confirm_host_basis = (
                                    "suite-end canary (no shared "
                                    "canary to re-measure)"
                                )
                            else:
                                confirm_host_basis = (
                                    "confirmation-window canary vs "
                                    "baseline end-canary"
                                )
                        solo: list[float] = []
                        for _ in range(3):
                            scratch: dict[str, float] = {}
                            run_one(q, scratch)
                            solo.append(scratch[q])
                        med = sorted(solo)[1]
                        med_ratio = (med / prev[q]) / (
                            confirm_host if basis_stable else 1.0
                        )
                        entry += [
                            round(med_ratio, 3),
                            bool(med_ratio > 1.5),
                        ]
                    flags.append(entry)
                emit(
                    {
                        "metric": "full_suite_compare_normalized",
                        "vs": os.path.basename(prior),
                        "vs_is_baseline_of_record": prior_is_baseline,
                        "drift_basis": "end-of-suite canary",
                        "basis_stable": basis_stable,
                        "basis_state": basis,
                        **(
                            {}
                            if basis_stable
                            else {
                                "basis_note": (
                                    "a run's canary windows disagree "
                                    ">1.5x — normalized ratios and "
                                    "median-confirmed bits are "
                                    "basis-bounded noise; read "
                                    "raw_total_ratio"
                                )
                                if basis == "unstable"
                                else (
                                    "a compared run carries no "
                                    "within-run drift reading — the "
                                    "basis is unmeasured, so "
                                    "normalized ratios are untrusted; "
                                    "read raw_total_ratio"
                                )
                            }
                        ),
                        **(
                            {
                                "confirm_window_host": round(
                                    confirm_host, 3
                                ),
                                "confirm_host_basis": (
                                    confirm_host_basis
                                ),
                                "confirm_vs_suite_host": round(
                                    confirm_host / host, 3
                                )
                                if host
                                else None,
                            }
                            if confirm_host is not None
                            else {}
                        ),
                        "raw_total_ratio": round(tot_now / tot_prev, 3)
                        if tot_prev
                        else None,
                        "host_drift": round(host, 3),
                        "shared_queries": len(shared),
                        "shared_total_prev": round(tot_prev, 3),
                        "shared_total_now": round(tot_now, 3),
                        "normalized_total_ratio": round(
                            (tot_now / tot_prev) / host, 3
                        )
                        if tot_prev
                        else None,
                        "worst_normalized": [
                            [q, round(n, 3)] for n, q in worst[:5]
                        ],
                        # entries: [q, suite_ratio] or
                        # [q, suite_ratio, median_ratio, confirmed]
                        "flag_ratio_basis": "normalized"
                        if basis_stable
                        else "raw",
                        "regressions_over_1p5x": flags,
                    }
                )
            elif shared:
                verdict = _bc_verdict(
                    {q: prev[q] for q in shared},
                    {q: timings[q] for q in shared},
                )
                emit(
                    {
                        "metric": "full_suite_compare_normalized",
                        "vs": os.path.basename(prior),
                        "vs_is_baseline_of_record": prior_is_baseline,
                        "shared_total_prev": round(
                            sum(prev[q] for q in shared), 3
                        ),
                        "shared_total_now": round(
                            sum(timings[q] for q in shared), 3
                        ),
                        **verdict,
                    }
                )
    except Exception as e:  # the compare must never sink the bench
        print(
            json.dumps(
                {"metric": "bench_compare_normalized", "error": str(e)[:200]}
            ),
            flush=True,
        )

    # The capture that records this run keeps the TAIL of the output,
    # so the compact headline record must also be the very LAST line —
    # printing it only first loses it whenever the full-suite record
    # above overflows the capture window.
    emit(
        {
            "metric": "headline_suite_total",
            "value": total,
            "unit": "sec",
            "queries": {n: timings[n] for n in HEADLINE},
            **canary,
            "sf": sf,
        }
    )

    # Persist the complete record set beside this file: the driver's
    # BENCH_r{N}.json keeps only a head-truncated tail of stdout (r8
    # lost all but 14 of 248 per-query timings), so the audit copy is
    # written here and committed with the round. FULL runs only — a
    # headline-only run would leave a thin record that a later full
    # compare mistakes for a complete prior baseline — and never
    # clobbering: a second full run in the same round gets a _runK
    # suffix instead of overwriting the file the compare just read.
    if full:
        try:
            here = os.path.dirname(os.path.abspath(__file__))
            out = _full_record_path(here)
            with open(out, "w") as f:
                for rec in records:
                    f.write(json.dumps(rec) + "\n")
        except Exception as e:  # persistence must never sink the bench
            print(
                json.dumps(
                    {"metric": "bench_persist", "error": str(e)[:200]}
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()

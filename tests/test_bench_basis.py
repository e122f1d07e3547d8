"""bench.py normalization-basis helpers (tools/bench_compare).

ADVICE r11 (bench.py:412): the truthiness filter dropped 0.0/None
drift readings identically and an all-missing basis defaulted to
"stable". VERDICT r11 nit (bench.py:414): median confirmation divided
by the SUITE-pass host factor, so a loaded confirmation window could
stamp `confirmed=True` on queries that are faster in the canonical
record. Both mechanisms are now pure functions, pinned here without
needing a Spark session.
"""

from __future__ import annotations

from tools.bench_compare import basis_state, confirmation_host


def test_basis_stable_requires_both_readings_in_band():
    assert basis_state([1.0, 1.0]) == "stable"
    assert basis_state([0.7, 1.4]) == "stable"
    # boundary values are inside the band
    assert basis_state([2 / 3, 1.5]) == "stable"


def test_basis_out_of_band_is_unstable():
    assert basis_state([0.544, 1.0]) == "unstable"  # the r11 window
    assert basis_state([1.0, 1.955]) == "unstable"
    assert basis_state([0.2, 3.0]) == "unstable"


def test_missing_or_degenerate_reading_is_unmeasured_not_stable():
    # ADVICE r11: None (record predates instrumentation) and 0.0
    # (degenerate zero-length canary) must NOT read as stable.
    assert basis_state([None, 1.0]) == "unmeasured"
    assert basis_state([1.0, None]) == "unmeasured"
    assert basis_state([None, None]) == "unmeasured"
    assert basis_state([0.0, 1.0]) == "unmeasured"
    assert basis_state([]) == "unmeasured"
    # an unmeasured basis is never "stable" — the caller's
    # normalized ratios stay untrusted
    assert basis_state([None, 0.544]) == "unmeasured"


def test_confirmation_host_is_median_of_shared_ratios():
    prev_end = {"a": 1.0, "b": 2.0, "c": 4.0}
    now = {"a": 2.0, "b": 3.0, "c": 4.0}  # ratios 2.0, 1.5, 1.0
    assert confirmation_host(now, prev_end) == 1.5


def test_confirmation_host_ignores_nonpositive_and_missing():
    prev_end = {"a": 0.0, "b": 2.0, "c": 4.0}
    now = {"a": 2.0, "b": 4.0}  # only b shares a positive pair
    assert confirmation_host(now, prev_end) == 2.0
    assert confirmation_host({}, prev_end) is None
    assert confirmation_host(now, {}) is None


def test_confirmation_host_kills_the_r11_artifact_shape():
    """The driver's r11 run2 failure: suite ran on a ~1.4x-loaded
    host, solo re-runs on the same loaded host, but the divisor was
    the baseline-window host factor — so flat queries stamped
    confirmed. With a same-window canary re-measure the divisor
    carries the load, and a flat query's confirmed ratio is ~1."""
    prev_end = {"q1": 1.0, "q2": 2.0}
    loaded_now = {"q1": 1.4, "q2": 2.8}  # host uniformly 1.4x slower
    ch = confirmation_host(loaded_now, prev_end)
    assert ch == 1.4
    # a query whose code is unchanged, measured 1.4x slower solo:
    med, prev_q = 1.4 * 0.5, 0.5
    assert (med / prev_q) / ch == 1.0  # reads flat, not confirmed

"""Zero-extra-pass metrics for single-sink writes via the Observation
API (SPARK-34806).

The bronze gate's multi-branch fan-out needs its fused aggregate
passes (four disjoint sinks consume disjoint row subsets — no single
action sees every row), but the far more common pipeline step has ONE
sink; there, a separate metrics aggregate is a second full pass over
data that the write action already streamed through. ``observe``
attaches accumulator-backed aggregates to the write itself: metrics
arrive with the action, costing nothing at any scale.

Reference parity: the exit-metrics channel (NB_BRONZE:260-287) built
its payload from standalone COUNT() calls — one extra pass each.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame, Observation


def write_with_metrics(
    df: DataFrame,
    write: Callable[[DataFrame], None],
    metrics: dict[str, Column],
) -> dict[str, Any]:
    """Run ``write`` on ``df`` and return ``metrics`` computed BY that
    same action.

    ``metrics`` maps output names to aggregate expressions over df's
    rows (count/sum/min/max/approx — anything Observation supports:
    deterministic aggregates only, no distinct).

    CONTRACT: ``write`` must execute an action on the DataFrame it is
    HANDED (the observed frame), not on a captured reference to the
    original ``df`` — ``Observation.get`` blocks until an action
    flows through the observation point, so a write that ignores its
    argument (or swallows its own failure and runs no job) would hang
    the caller. ``write`` exceptions propagate before ``get`` is
    touched.
    """
    obs = Observation()
    observed = df.observe(obs, *[c.alias(n) for n, c in metrics.items()])
    write(observed)
    return dict(obs.get)

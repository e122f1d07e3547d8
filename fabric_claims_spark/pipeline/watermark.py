"""Watermark gate evaluation (SURVEY.md §2.9 I1-I4).

Thin composition over WatermarkStore: each layer runs only when its
upstream watermark is strictly newer than its own (the IfCondition
@greater gates, PL_BRONZE:114-118 / PL_SILVER:120-124 /
PL_GOLD:109-113), and commits its watermark only after a successful
transform (I3 ordering).
"""

from __future__ import annotations

from dataclasses import dataclass

from fabric_claims_spark.sources.state import WatermarkStore

BRONZE = "bronze"
SILVER = "silver"


@dataclass(frozen=True)
class GateDecision:
    should_run: bool
    upstream_ts: str
    stored_ts: str


def evaluate_gate(store: WatermarkStore, layer: str, upstream_ts: str) -> GateDecision:
    stored = store.read(layer)
    return GateDecision(
        should_run=WatermarkStore.is_newer(upstream_ts, stored),
        upstream_ts=upstream_ts,
        stored_ts=stored,
    )

"""Windowed-conversion-funnel core — shared verbatim by the batch
query (queries/behavior.events_funnel_windowed) and its streaming twin
(streaming/events_stream.funnel_monitor_stream), so stream==batch
parity is structural, not coincidental.

Semantics (what product-analytics tools mean by "conversion window"):
a user reaches step k iff their EARLIEST step-(k-1) completion is
followed by a step-k event within ``window_h`` hours; each step
anchors at the MIN qualifying timestamp (first-match). The funnel is
a chain of conditional min-aggregates + equi-joins — one hash
aggregate and one broadcast-joinable survivors frame per step, no
per-user event buffering, no window over the events table. Step k's
work is bounded by step k-1's survivors; each step frame is
localCheckpoint'd because it is consumed twice (the next step's join
and its own count row) — without that the events scan re-runs
O(steps^2) times.

NULL timestamps are filtered at the entrance (a NULL ts cannot anchor
or satisfy a window; the streaming twin's source filter does the
same, so the stream==batch row-for-row invariant holds on all
inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_funnel(
    e: DataFrame, steps: list[str], window_h: int
) -> DataFrame:
    """(step, step_name, users, conv_from_prev, conv_from_start) from
    an events frame with (user_id, event_type, ts). Rates round to
    6 dp from exact integer counts."""
    from pyspark.sql import Window

    e = e.select("user_id", "event_type", "ts").where(
        F.col("ts").isNotNull()
    )
    window_s = window_h * 3600
    prev = (
        e.where(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
        .localCheckpoint(eager=True)
    )
    frames = [prev]
    for step_type in steps[1:]:
        nxt = (
            e.join(prev, "user_id")
            .where(
                (F.col("event_type") == step_type)
                & (F.col("ts") > F.col("t"))
                & (
                    F.col("ts")
                    <= F.col("t") + F.expr(f"INTERVAL {window_s} SECOND")
                )
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
            .localCheckpoint(eager=True)
        )
        frames.append(nxt)
        prev = nxt
    counts = None
    for i, (name, fr) in enumerate(zip(steps, frames), start=1):
        row = fr.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(i).cast("long").alias("step"),
            F.lit(name).alias("step_name"),
            F.col("users").cast("long"),
        )
        counts = row if counts is None else counts.unionByName(row)
    w = Window.orderBy("step")
    return (
        counts.select(
            "step",
            "step_name",
            "users",
            F.round(
                F.col("users").cast("double")
                / F.nullif(F.lag("users").over(w), F.lit(0)),
                6,
            ).alias("conv_from_prev"),
            F.round(
                F.col("users").cast("double")
                / F.nullif(F.first("users").over(w), F.lit(0)),
                6,
            ).alias("conv_from_start"),
        )
        .orderBy("step")
    )

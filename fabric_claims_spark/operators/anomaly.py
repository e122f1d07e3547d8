"""Robust anomaly scoring over grouped count series — the shared core
behind the batch query `events_daily_modified_zscore` and its
streaming twin `zscore_monitor_stream`.

Modified z-score (Iglewicz & Hoaglin, 1993): z = 0.6745·(x − med) /
MAD with the per-group exact lower median for both med and MAD —
robust to the very outliers it flags, unlike mean/stddev. The medians
are computed histogram-style (group by value, cumulative window over
the bounded per-group VALUE DOMAIN), so no per-group sort of raw rows
and no percentile buffer: the same value-domain discipline
`order_value_mad` uses (SCALING.md). Cross-engine exactness: counts
and medians are integers; the only division is one double rounded to
6 dp.

Reference parity: the claims pipeline's quality gates
(NB_SILVER:125-170 predicate rules) flag rows; this operator flags
TIME BUCKETS — the monitoring layer a production pipeline runs on its
own throughput metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def modified_zscore_from_counts(
    d: DataFrame,
    group_col: str = "event_type",
    bucket_col: str = "day",
    count_col: str = "cnt",
    flag_threshold: float = 3.5,
) -> DataFrame:
    """(group, bucket, cnt, med, mad, mod_z, is_outlier) from a
    per-(group, bucket) count frame. Exact lower medians per group;
    MAD of the absolute deviations; z rounded to 6 dp; NULL z (MAD=0
    degenerate series) flags False."""
    t = d.groupBy(group_col).agg(F.count(F.lit(1)).alias("n"))

    def grouped_lower_median(frame: DataFrame, col: str, out: str) -> DataFrame:
        h = frame.groupBy(group_col, col).agg(F.count(F.lit(1)).alias("c"))
        w = (
            Window.partitionBy(group_col)
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cum = h.select(
            group_col,
            F.col(col).alias("v"),
            F.sum("c").over(w).alias("cum"),
            (F.sum("c").over(w) - F.col("c")).alias("prev_cum"),
        )
        k = F.expr("(n + 1) div 2")
        return (
            cum.join(t, group_col)
            .where((F.col("prev_cum") < k) & (k <= F.col("cum")))
            .select(group_col, F.col("v").alias(out))
        )

    med = grouped_lower_median(d, count_col, "med")
    dev = d.join(med, group_col).select(
        group_col, F.abs(F.col(count_col) - F.col("med")).alias("dv")
    )
    mad = grouped_lower_median(dev, "dv", "mad")
    z = F.lit(0.6745) * (F.col(count_col) - F.col("med")) / F.nullif(
        F.col("mad"), F.lit(0)
    )
    return (
        d.join(med, group_col)
        .join(mad, group_col)
        .select(
            group_col,
            bucket_col,
            count_col,
            F.col("med").cast("long").alias("med"),
            F.col("mad").cast("long").alias("mad"),
            F.round(z, 6).alias("mod_z"),
            F.coalesce(
                F.abs(z) > F.lit(flag_threshold), F.lit(False)
            ).alias("is_outlier"),
        )
        .orderBy(group_col, bucket_col)
    )

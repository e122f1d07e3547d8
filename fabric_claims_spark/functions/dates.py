"""Date-spine generation (F8/F9/F10 — NBclaims_silver.Notebook/
notebook-content.py:134-151).

sequence + explode builds the spine distributively; the surrogate
DateID uses a partitionless row_number window, which is acceptable
ONLY because the spine is bounded (5,844 rows for 2015→2030) — the
same pattern must never run on fact-sized data (SURVEY.md §7.4 W2).
Month/day names are en-US (Spark's default formatter locale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fabric_claims_spark.schemas import DATE_SPINE_END, DATE_SPINE_START


def date_spine(
    spark: SparkSession,
    start: str = DATE_SPINE_START,
    end: str = DATE_SPINE_END,
) -> DataFrame:
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("Date")
    )
    w = Window.orderBy("Date")
    return spine.select(
        F.row_number().over(w).alias("DateID"),
        "Date",
        F.year("Date").alias("Year"),
        F.month("Date").alias("Month"),
        F.dayofmonth("Date").alias("Day"),
        F.quarter("Date").alias("Quarter"),
        F.date_format("Date", "MMMM").alias("MonthName"),
        F.date_format("Date", "EEEE").alias("DayName"),
    )

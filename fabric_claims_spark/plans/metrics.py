"""Semantic-layer measure catalog (SURVEY.md §2.4 A5-A12, §2.5 W3).

Every DAX measure in the reference model (SM/tables/Claims.tmdl,
Patients.tmdl) becomes a named Spark aggregate Column; a report visual
is then ``star.where(slicers).groupBy(dims).agg(*measures(names))``
(SURVEY.md §3.3). The Time Calculation calc group (SM/tables/Time
Calculation.tmdl:6-24) becomes ``with_time_calc`` — a wrapper applied
to any measure at month grain.

DIVIDE semantics preserved exactly: NULL on zero/blank denominator
(F.try_divide), never coalesced to 0.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cnt_if(cond: Column) -> Column:
    return F.sum(F.when(cond, 1).otherwise(0))


def _sum_if(cond: Column, col: str) -> Column:
    return F.sum(F.when(cond, F.col(col)))


def _status(s: str) -> Column:
    return F.col("ClaimStatus") == s


def _ctype(t: str) -> Column:
    return F.col("ClaimType") == t


# name → aggregate expression builder (SM/tables/Claims.tmdl citations)
MEASURES: dict[str, Callable[[], Column]] = {
    # :5 Total Claims = COUNTROWS(Claims)
    "total_claims": lambda: F.count(F.lit(1)),
    # :14 Total Amount = SUM(Claims[Amount])
    "total_amount": lambda: F.sum("ClaimAmount"),
    # :102 Average Amount
    "average_amount": lambda: F.avg("ClaimAmount"),
    # :27,:256 DISTINCTCOUNT measures
    "unique_patients": lambda: F.countDistinct("PatientID"),
    "unique_providers": lambda: F.countDistinct("ProviderID"),
    # Patients.tmdl:5 Average Age
    "average_age": lambda: F.avg("PatientAge"),
    # :36-61 CALCULATE([Total Claims], Status=…)
    "approved_claims": lambda: _cnt_if(_status("Approved")),
    "denied_claims": lambda: _cnt_if(_status("Denied")),
    "pending_claims": lambda: _cnt_if(_status("Pending")),
    # :63-100 CALCULATE([Total Amount], Status=…)
    "approved_amount": lambda: _sum_if(_status("Approved"), "ClaimAmount"),
    "denied_amount": lambda: _sum_if(_status("Denied"), "ClaimAmount"),
    "pending_amount": lambda: _sum_if(_status("Pending"), "ClaimAmount"),
    # :189-232 per-ClaimType counts
    "inpatient_claims": lambda: _cnt_if(_ctype("Inpatient")),
    "outpatient_claims": lambda: _cnt_if(_ctype("Outpatient")),
    "emergency_claims": lambda: _cnt_if(_ctype("Emergency")),
    "routine_claims": lambda: _cnt_if(_ctype("Routine")),
    "urgent_care_claims": lambda: _cnt_if(_ctype("Urgent Care")),
    # :115,:234,:245 DIVIDE rates
    "approval_rate": lambda: F.try_divide(
        _cnt_if(_status("Approved")), F.count(F.lit(1))
    ),
    "denied_rate": lambda: F.try_divide(
        _cnt_if(_status("Denied")), F.count(F.lit(1))
    ),
    "pending_rate": lambda: F.try_divide(
        _cnt_if(_status("Pending")), F.count(F.lit(1))
    ),
}


def measures(names: list[str]) -> list[Column]:
    return [MEASURES[n]().alias(n) for n in names]


def report_query(
    star: DataFrame,
    dims: list[str],
    measure_names: list[str],
    slicers: Column | None = None,
) -> DataFrame:
    """A report visual (A12/P11): slicer filters → group by visual
    dims → measures. Catalyst pushes slicers to the fact scan."""
    df = star.where(slicers) if slicers is not None else star
    return df.groupBy(*dims).agg(*measures(measure_names))


# -- Claim Status calculation group -----------------------------------------
STATUS_ITEMS = ["Approved", "Denied", "Pending"]  # Claim Status.tmdl:9-13
ALL_ITEM = "All"  # Claim Status.tmdl:7


def with_status_calc(
    fact: DataFrame,
    status_col: str = "ClaimStatus",
    items: list[str] | None = None,
    item_col: str = "claim_status",
) -> DataFrame:
    """The Claim Status calculation group (SM_Claims.SemanticModel/
    definition/tables/Claim Status.tmdl:5-13): ``All`` =
    SELECTEDMEASURE(); Approved/Denied/Pending = CALCULATE(
    SELECTEDMEASURE(), KEEPFILTERS(Claims[Status] = item)) — the items
    apply to ANY selected measure, unlike the per-status measure twins
    (A9) which hard-wire one measure each.

    Spark-first realization: rather than re-aggregating the fact once
    per calc item (N full passes), expand each fact row into the items
    it feeds — ``All`` plus its own status when that status is an item
    — then aggregate ONCE with ``item_col`` added to the grouping.
    This is Catalyst's Expand (grouping-sets) strategy by hand: one
    shuffle, map-side partial aggregation, ≤2× pre-shuffle rows, and
    it stays correct for non-additive measures (DISTINCTCOUNT) since
    each group aggregates its own constituent rows. KEEPFILTERS
    semantics hold because the expansion composes with, not replaces,
    whatever slicer filters are already on ``fact``.

    Compose: ``report_query(with_status_calc(star), dims + ["claim_
    status"], ms)`` for visuals; ``with_time_calc(..., extra_keys=
    ["claim_status"])`` to stack both calc groups (precedence 1 then
    0, as in the model)."""
    items = STATUS_ITEMS if items is None else items
    own = F.col(status_col)
    expanded = fact.withColumn(
        item_col,
        F.explode(F.array(F.lit(ALL_ITEM), F.when(own.isin(items), own))),
    )
    return expanded.where(F.col(item_col).isNotNull())


# -- Time Calculation calc group (W3) ---------------------------------------
def with_time_calc(
    monthly: DataFrame,
    value_col: str,
    year_col: str = "Year",
    month_col: str = "Month",
    extra_keys: list[str] | None = None,
) -> DataFrame:
    """Adds the calc-group items as columns over a month-grain frame:
    YTD (running), QTD (running within quarter), MTD, LY (same period
    last year), YoY Δ, YoY %, L12M — the full Time Calculation calc
    group (SM/tables/Time Calculation.tmdl:6-24 incl. TOTALQTD :8 and
    TOTALMTD :12; measure twins Claims.tmdl:139,152).

    At month grain TOTALMTD degenerates to the month's own value (the
    frame holds one row per month) — emitted anyway so calc-item
    selection is total; day-grain MTD lives in
    queries/time_intelligence.mtd_running_revenue.

    Pre-aggregate to month grain FIRST (cheap frame), then window —
    never window over fact rows (SURVEY.md §7.4).

    ``extra_keys``: slice columns (e.g. the ``claim_status`` calc-item
    column from ``with_status_calc``) — every window partitions by
    them and the LY self-join matches within them, so each slice gets
    its own independent time series. This is how the model's two calc
    groups stack (status precedence 1 applies inside each time item).
    """
    extra = list(extra_keys or [])
    epoch_month = F.col(year_col) * 12 + F.col(month_col)
    quarter = ((F.col(month_col) - 1) / 3).cast("long") + 1
    df = monthly.withColumn("_em", epoch_month).withColumn("_qtr", quarter)

    w_ytd = (
        Window.partitionBy(*extra, year_col)
        .orderBy(month_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_qtd = (
        Window.partitionBy(*extra, year_col, "_qtr")
        .orderBy(month_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_l12 = Window.partitionBy(*extra).orderBy("_em").rangeBetween(-11, 0)

    cur = df.alias("cur")
    prev = df.alias("prev")
    ly_cond = (
        (F.col(f"prev.{year_col}") == F.col(f"cur.{year_col}") - 1)
        & (F.col(f"prev.{month_col}") == F.col(f"cur.{month_col}"))
    )
    for k in extra:
        ly_cond = ly_cond & F.col(f"prev.{k}").eqNullSafe(F.col(f"cur.{k}"))
    ly = (
        cur.join(prev, ly_cond, "left")
        .select(
            *[F.col(f"cur.{c}").alias(c) for c in df.columns],
            F.col(f"prev.{value_col}").alias(f"{value_col}_ly"),
        )
    )
    out = (
        ly.withColumn(f"{value_col}_ytd", F.sum(value_col).over(w_ytd))
        .withColumn(f"{value_col}_qtd", F.sum(value_col).over(w_qtd))
        .withColumn(f"{value_col}_mtd", F.col(value_col))
        .withColumn(f"{value_col}_l12m", F.sum(value_col).over(w_l12))
        .withColumn(
            f"{value_col}_yoy_delta",
            F.col(value_col) - F.col(f"{value_col}_ly"),
        )
        .withColumn(
            f"{value_col}_yoy_pct",
            F.try_divide(
                F.col(value_col) - F.col(f"{value_col}_ly"),
                F.col(f"{value_col}_ly"),
            ),
        )
        .drop("_em", "_qtr")
    )
    return out

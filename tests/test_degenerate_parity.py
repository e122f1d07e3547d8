"""Cross-engine NULL parity on degenerate inputs (ADVICE r10).

Spark's Divide returns NULL for x/0 while DuckDB's IEEE double
division yields Inf/NaN — so the drift/experimentation queries'
final divisions must be zero-guarded IN BOTH ENGINES or a constant
daily series (ACF den=0), a zero pre-period variance (CUPED theta),
or an empty period side (KS n1·n2=0) diverges cross-engine. These
tests build exactly those degenerate tables, run the registered
Spark query AND its DuckDB oracle on them, and require the same
canonical value hash — the driver's compare, on the inputs the real
test data never produces.
"""

from __future__ import annotations

import datetime

import duckdb
import pytest

from tools.check_correctness import canonical

from fabric_claims_spark.queries import load_all_queries


def _run_both(spark, sf_dir: str, name: str):
    reg = load_all_queries()
    spec = reg[name]
    spdf = spec.fn(spark, str(sf_dir)).toPandas()
    con = duckdb.connect()
    for t in ("events", "orders"):
        # Spark writes {t}.parquet as a directory; glob its parts
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet/*.parquet')"
        )
    odf = con.execute(spec.oracle).fetchdf()
    return canonical(spdf), canonical(odf)


@pytest.fixture()
def degenerate_dir(spark, tmp_path):
    """events: one event per day for 30 days per type (constant daily
    series -> ACF den = 0) from a single even user (one arm empty is
    fine; here the pre-period x is constant 15 for the one user ->
    CUPED var = 0). orders: every order in 1998+ (period-1 side of
    the KS split empty -> n1 = 0)."""
    base = datetime.datetime(2024, 1, 1)
    events = spark.createDataFrame(
        [
            (i, base + datetime.timedelta(days=i), 2, "view", 1.0, "{}")
            for i in range(30)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    events.coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    orders = spark.createDataFrame(
        [
            (i, datetime.date(1998, 3, 1 + i % 20), 100.0 + i)
            for i in range(10)
        ],
        "o_orderkey long, o_orderdate date, o_totalprice double",
    )
    orders.coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))
    return tmp_path


def test_acf_constant_series_null_parity(spark, degenerate_dir):
    (sh, sn, scols), (oh, on, ocols) = _run_both(
        spark, degenerate_dir, "events_daily_acf"
    )
    assert (sh, sn, scols) == (oh, on, ocols)
    assert sn > 0  # the degenerate rows exist and carry NULL acf


def test_cuped_zero_variance_null_parity(spark, degenerate_dir):
    (sh, sn, scols), (oh, on, ocols) = _run_both(
        spark, degenerate_dir, "events_cuped_adjusted_lift"
    )
    assert (sh, sn, scols) == (oh, on, ocols)
    assert sn == 1


def test_ks_empty_period_null_parity(spark, degenerate_dir):
    (sh, sn, scols), (oh, on, ocols) = _run_both(
        spark, degenerate_dir, "orders_value_ks_period_drift"
    )
    assert (sh, sn, scols) == (oh, on, ocols)
    assert sn == 1

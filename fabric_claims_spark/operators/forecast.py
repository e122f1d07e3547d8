"""Holt-Winters triple exponential smoothing over keyed time series.

The additive Holt-Winters recurrence
(level/trend/seasonal state folded through every observation in
order) is NOT window-expressible: each step's level depends on the
previous step's smoothed level AND the seasonal slot written a full
period earlier, so — like the capped-balance clamp recurrence
(queries/behavior.user_capped_balance) — it is the sanctioned case
for the grouped-Arrow escape hatch: one ``applyInPandas`` fold per
series key.

Scale shape (100 TB): the fold NEVER consumes raw events — callers
aggregate to a bounded (key, time-grain) rollup first (the EWMA
discipline, queries/behavior.events_ewma_daily), so per-group work is
linear in the bounded time domain and groups parallelize across
keys. One shuffle on the series key; no cross-series state.

Cross-engine precision: the recurrence is a deep multiplicative
chain in IEEE doubles — after hundreds of steps two engines that
associate the arithmetic even slightly differently drift past any
fixed rounding, so (unlike the integer-weight EWMA) there is no
exact SQL twin; the registry entry is rows-only by design and the
recurrence itself is pinned by literal hand-computed fixtures
(tests/test_extensions.py). Dyadic smoothing params (1/2, 1/4 …)
keep small fixtures bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def holt_winters_additive(
    series: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
    period: int = 7,
    horizon: int = 14,
) -> DataFrame:
    """Additive Holt-Winters fit + ``horizon``-step forecast per key.

    ``series`` must already be at the modeling grain: one row per
    (key, time step), with ``time_col`` orderable and consecutive
    within a key (the caller's rollup defines the step; gaps are the
    caller's responsibility). Keys with fewer than ``2 * period``
    observations are dropped (two full seasons are required to
    initialize level/trend/seasonal state — emitting a half-born fit
    would be noise dressed as signal).

    Classic formulation (Holt 1957 / Winters 1960; one-step-ahead
    fit, burn-in rows carry NULL yhat):

    * init over the first two seasons: ``level = mean(x[0:m])``,
      ``trend = (mean(x[m:2m]) - mean(x[0:m])) / m``,
      ``season[i] = x[i] - level``
    * for each t >= m:  ``yhat_t = level + trend + season[t-m]``,
      then  ``level' = a*(x_t - season[t-m]) + (1-a)*(level+trend)``,
      ``trend' = b*(level'-level) + (1-b)*trend``,
      ``season[t] = g*(x_t - level') + (1-g)*season[t-m]``
    * forecast h steps out: ``level + h*trend + season[n-m+((h-1)%m)]``

    Output: (key, step_index, time, y, yhat, level, trend, season,
    is_forecast) — forecast rows have NULL time/y and step_index
    continuing past the observed range.
    """
    if period < 1:
        raise ValueError(f"period must be >= 1, got {period}")
    if horizon < 0:
        raise ValueError(f"horizon must be >= 0, got {horizon}")
    for name, v in (("alpha", alpha), ("beta", beta), ("gamma", gamma)):
        if not (0.0 < v <= 1.0):
            raise ValueError(f"{name} must be in (0, 1], got {v}")

    m = period
    time_type = series.schema[time_col].dataType.simpleString()
    key_type = series.schema[key_col].dataType.simpleString()
    out_schema = (
        f"{key_col} {key_type}, step_index long, {time_col} {time_type}, "
        "y double, yhat double, level double, trend double, "
        "season double, is_forecast boolean"
    )

    def fold(pdf):
        import pandas as pd

        pdf = pdf.sort_values(time_col).reset_index(drop=True)
        x = pdf[value_col].astype("float64").tolist()
        n = len(x)
        if n < 2 * m:
            return pd.DataFrame(
                columns=[
                    key_col, "step_index", time_col, "y", "yhat",
                    "level", "trend", "season", "is_forecast",
                ]
            )
        key = pdf[key_col].iloc[0]
        level = sum(x[0:m]) / m
        trend = (sum(x[m : 2 * m]) / m - sum(x[0:m]) / m) / m
        season = [x[i] - level for i in range(m)]
        rows = []
        for t in range(n):
            if t < m:  # burn-in: state is still the raw init
                rows.append((key, t, pdf[time_col].iloc[t], x[t], None,
                             level, trend, season[t], False))
                continue
            yhat = level + trend + season[t - m]
            new_level = (
                alpha * (x[t] - season[t - m])
                + (1.0 - alpha) * (level + trend)
            )
            trend = beta * (new_level - level) + (1.0 - beta) * trend
            level = new_level
            season.append(
                gamma * (x[t] - level) + (1.0 - gamma) * season[t - m]
            )
            rows.append((key, t, pdf[time_col].iloc[t], x[t], yhat,
                         level, trend, season[t], False))
        for h in range(1, horizon + 1):
            yhat = level + h * trend + season[n - m + ((h - 1) % m)]
            rows.append((key, n + h - 1, None, None, yhat,
                         level, trend, season[n - m + ((h - 1) % m)], True))
        return pd.DataFrame(
            rows,
            columns=[
                key_col, "step_index", time_col, "y", "yhat",
                "level", "trend", "season", "is_forecast",
            ],
        )

    return series.groupBy(key_col).applyInPandas(fold, schema=out_schema)

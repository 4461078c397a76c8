"""BQML time-series surface: ``CREATE MODEL ... MODEL_TYPE='ARIMA_PLUS'``
and ``ML.FORECAST``.

BigQuery's ARIMA_PLUS is a proprietary auto-ARIMA ensemble; the engine
substitutes **Holt-Winters additive exponential smoothing** — level +
trend + an additive seasonal component (fixed alpha/beta/gamma), the
classical forecaster family whose fit is a single deterministic left
fold over each ordered series, so the whole path is reproducible in
ANSI SQL and the DuckDB oracle certifies forecasts value-for-value —
including the prediction intervals (additive-error bands, +/- z *
sigma * sqrt(h) from the fit's one-step residual RMSE). The seasonal
period derives from the model's DATA_FREQUENCY option (HOURLY -> 24,
DAILY -> 7, MONTHLY -> 12, ...; AUTO_FREQUENCY infers the grid step
from the minimum distinct-timestamp gap); series shorter than two full
periods fall back to plain Holt (level + trend). ``HOLIDAY_REGION``
fits a RegARIMA-style pooled additive holiday-dummy effect (see the
HOLIDAY_REGION section below). Documented divergence: no step-change
decomposition, holidays are one pooled indicator (not BigQuery's
per-holiday decomposition); interval widths come from the
additive-error model, not BigQuery's ARIMA ensemble quantiles.

Execution shape: fitting is ONE groupBy(series) with a JVM-side
``array_sort`` + ``aggregate`` fold — no Python, no per-series jobs;
per-series state is 4 scalars + m seasonal terms, materialized on the
driver exactly like the other model registries. Forecasting expands
``sequence(1, horizon)`` per series — k*h rows from a k-row state
table.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

HOLT_ALPHA = 0.5
HOLT_BETA = 0.3
HOLT_GAMMA = 0.3

# ML.EXPLAIN_FORECAST per-series history bound: beyond this the fitted
# series is NOT persisted with the model (scalar state still serves
# ML.FORECAST/ML.DETECT_ANOMALIES; only the history decomposition is
# unavailable). Matches the order of BigQuery's own ARIMA_PLUS input
# limits (tens of thousands of points per series).
EXPLAIN_HISTORY_MAX = 10_000

#: Hard cap on distinct series a single ARIMA_PLUS fit may hold on the
#: driver (VERDICT r11 #7). ~1 KB state per series -> ~100 MB at the
#: bound; beyond it the fit raises instead of OOMing the driver.
HOLT_FIT_SERIES_MAX = 100_000

# DATA_FREQUENCY -> seasonal period (one full cycle in grid steps):
# hour-of-day, day-of-week, week-of-year, month-of-year, quarter-of-year
_FREQ_PERIOD = {
    "HOURLY": 24,
    "DAILY": 7,
    "WEEKLY": 52,
    "MONTHLY": 12,
    "QUARTERLY": 4,
    "YEARLY": 0,
    "PER_MINUTE": 60,
}

# AUTO_FREQUENCY: minimum gap between distinct timestamps -> period
_AUTO_PERIOD = (
    (60_000_000, 60),            # minute grid -> hour cycle
    (3_600_000_000, 24),         # hour grid -> day cycle
    (86_400_000_000, 7),         # day grid -> week cycle
    (604_800_000_000, 52),       # week grid -> year cycle
    (2_419_200_000_000, 12),     # ~month grid -> year cycle
)


def _min_gap_df(df: DataFrame, ts_col: str) -> DataFrame:
    """One-row frame holding ``g`` = the minimum positive gap between
    the first 10k distinct timestamps — a TakeOrdered (no full
    sort/collect), so the probe stays O(10k) driver-side at any corpus
    size."""
    return (
        df.select(F.unix_micros(F.col(ts_col).cast("timestamp")).alias("us"))
        .where(F.col("us").isNotNull())
        .distinct()
        .orderBy("us")
        .limit(10_001)
        .select(F.array_sort(F.collect_list("us")).alias("a"))
        .select(
            F.array_min(
                F.zip_with(
                    F.slice("a", 2, F.greatest(F.size("a") - 1, F.lit(0))),
                    F.slice("a", 1, F.greatest(F.size("a") - 1, F.lit(0))),
                    lambda b, a: b - a,
                )
            ).alias("g")
        )
    )


def _gap_to_period(g) -> int:
    if not g or g <= 0:
        return 0
    for grid, period in _AUTO_PERIOD:
        if g <= grid:
            return period
    return 0


def infer_seasonal_period(df: DataFrame, ts_col: str, freq: str) -> int:
    """Resolve DATA_FREQUENCY to a seasonal period. AUTO_FREQUENCY maps
    the minimum distinct-timestamp gap onto the table above; an
    unrecognized grid (or YEARLY) disables seasonality."""
    freq = freq.upper()
    if freq != "AUTO_FREQUENCY":
        return _FREQ_PERIOD.get(freq, 0)
    head = _min_gap_df(df, ts_col).first()
    return _gap_to_period(head["g"] if head else None)


def infer_period_and_years(
    df: DataFrame, ts_col: str, freq: str
) -> tuple[int, int, int]:
    """(seasonal period, min year, max year) in ONE Spark action
    (VERDICT r11 #6): the AUTO_FREQUENCY grid probe and the holiday
    calendar's year span previously ran as two separate jobs over the
    checkpointed training input."""
    ts = F.col(ts_col).cast("timestamp")
    years = df.select(
        F.min(F.year(ts)).alias("lo"), F.max(F.year(ts)).alias("hi")
    )
    freq = freq.upper()
    if freq != "AUTO_FREQUENCY":
        r = years.first()
        return _FREQ_PERIOD.get(freq, 0), int(r["lo"]), int(r["hi"])
    row = _min_gap_df(df, ts_col).crossJoin(years).first()
    return _gap_to_period(row["g"]), int(row["lo"]), int(row["hi"])


def _holiday_adjusted_pts(pts, dates: list[str]):
    """Fuse :func:`fit_holiday_effects` + :func:`apply_holiday_adjustment`
    into the already-aggregated per-series frame (r11, guide §1.2: one
    groupBy + one collect instead of two of each).

    Replicates the two-pass semantics EXACTLY: the pooled effect is
    computed from the raw (ts, y)-sorted array with the identical
    interior-residual fold, the adjustment subtracts it on holiday rows,
    and the adjusted pairs are re-sorted by (ts, y_adjusted) — the order
    the second pass's array_sort(collect_list(...)) would produce.

    The per-dates expression set is memoized like :func:`_holt_fit_plan`
    (same py4j construction-cost finding)."""
    key = (_holt_plan_app_key(), tuple(dates))
    hit = _HOLT_PLAN_MEMO.get(key)
    if hit is not None:
        ds_c, ys_raw_c, e_c, p_c = hit
        return (
            pts.withColumn("__ds", ds_c)
            .withColumn("__ys_raw", ys_raw_c)
            .withColumn("__e", e_c)
            .withColumn("p", p_c)
            .drop("__ds", "__ys_raw")
        )
    date_arr = F.array(*[F.lit(d) for d in dates])
    ds = F.transform(
        "p",
        lambda s: F.date_format(s["__ts"].cast("timestamp"), "yyyy-MM-dd"),
    )
    ys_raw = F.transform("p", lambda s: s["__y"])
    pts = pts.withColumn("__ds", ds).withColumn("__ys_raw", ys_raw)
    interior = F.when(
        F.size("__ys_raw") >= 3,
        F.sequence(F.lit(2), F.size("__ys_raw") - 1),
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    resids = F.filter(
        F.transform(
            interior,
            lambda i: F.when(
                F.array_contains(date_arr, F.element_at("__ds", i)),
                F.element_at("__ys_raw", i)
                - (
                    F.element_at("__ys_raw", i - F.lit(1))
                    + F.element_at("__ys_raw", i + F.lit(1))
                )
                / F.lit(2.0),
            ),
        ),
        lambda x: x.isNotNull(),
    )
    e_col = F.when(
        F.size(resids) > 0,
        F.aggregate(resids, F.lit(0.0), lambda a, x: a + x)
        / F.size(resids).cast("double"),
    ).otherwise(F.lit(0.0))
    pts = pts.withColumn("__e", e_col)
    # adjusted pairs, re-sorted exactly like the second pass would sort
    p_adj = F.array_sort(
        F.transform(
            F.sequence(F.lit(1), F.size("p")),
            lambda i: F.struct(
                F.element_at("p", i)["__ts"].alias("__ts"),
                F.when(
                    F.array_contains(date_arr, F.element_at("__ds", i)),
                    F.element_at("p", i)["__y"]
                    - F.coalesce("__e", F.lit(0.0)),
                )
                .otherwise(F.element_at("p", i)["__y"])
                .alias("__y"),
            ),
        )
    )
    p_col = F.when(F.size("p") > 0, p_adj).otherwise(F.col("p"))
    _HOLT_PLAN_MEMO[key] = (ds, ys_raw, e_col, p_col)
    return pts.withColumn("p", p_col).drop("__ds", "__ys_raw")


def fit_holt_state(
    df: DataFrame, ts_col: str, y_col: str, id_col: str | None,
    period: int = 0,
    holiday_dates: list[str] | None = None,
) -> list[dict] | tuple[list[dict], dict[str, float]]:
    """-> [{series_id, level, trend, seasonal, period, n_resid, last_us,
    iv_us, n_obs}, ...]; with ``holiday_dates`` -> (state, effects),
    the pooled holiday effects fitted and applied inside the SAME job
    (one shuffle + one collect; effects cover every series, state only
    those with >= 2 points, exactly like the two-pass pipeline).

    Fold (identical expression order on both engines, so IEEE-identical).
    Plain Holt (period 0, or series shorter than two periods):
      l_1 = y_1, b_1 = 0
      l_t = A*y_t + (1-A)*(l + b);  b_t = B*(l_t - l) + (1-B)*b
    Holt-Winters additive (period m, series with >= 2m points), with the
    classical initialization (Hyndman & Athanasopoulos, "Forecasting:
    Principles and Practice", §7.3 — trend from the first two period
    means, seasonal indices detrended so a pure-trend series gets zero
    seasonality):
      l_m = mean(y_1..y_m)
      b_m = (mean(y_{m+1}..y_{2m}) - mean(y_1..y_m)) / m
      s_i = y_i - (l_m + (i - (m+1)/2) * b_m)   (i = 1..m)
      l_t = A*(y_t - s_{t-m}) + (1-A)*(l + b)
      b_t = B*(l_t - l) + (1-B)*b
      s_t = G*(y_t - l_t) + (1-G)*s_{t-m}
    with one-step residuals e_t = y_t - ((l + b) + s_{t-m}).
    """
    m = int(period)
    sid = (
        F.col(id_col).cast("string")
        if id_col
        else F.lit("__all__")
    )
    pts = (
        df.select(
            sid.alias("series_id"),
            F.col(ts_col).alias("__ts"),
            F.col(y_col).cast("double").alias("__y"),
        )
        .groupBy("series_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("__ts", "__y"))).alias("p")
        )
    )
    if holiday_dates is not None:
        pts = _holiday_adjusted_pts(pts, holiday_dates)
    ys_col, tus_col, acc_g, select_cols = _holt_fit_plan(
        m, holiday_dates is not None
    )
    if holiday_dates is None:
        pts = pts.where(F.size("p") >= 2)
    fitted = (
        pts
        .withColumn("ys", ys_col)
        .withColumn("tus", tus_col)
        .withColumn("acc", acc_g)
        .select(*select_cols)
    )
    # The ARIMA model state is driver-resident by design (per-series
    # payload bounded by EXPLAIN_HISTORY_MAX since r7), but series
    # COUNT was not (VERDICT r11 #7) — a high-cardinality id_col at
    # 100 TB would outgrow the driver. The limit makes the collect
    # structurally bounded (never ships more than MAX+1 rows) and the
    # over-bound case raises a clear error instead of an OOM.
    rows = fitted.limit(HOLT_FIT_SERIES_MAX + 1).collect()
    if len(rows) > HOLT_FIT_SERIES_MAX:
        raise ValueError(
            f"ML.FORECAST: more than {HOLT_FIT_SERIES_MAX} distinct"
            f" series in {id_col!r} — the per-series model state would"
            " outgrow the driver. Aggregate or partition the id column"
            " below the bound (documented limit, mirrors"
            " EXPLAIN_HISTORY_MAX)."
        )
    state = [
        {
            "series_id": r["series_id"],
            "level": float(r["level"]),
            "trend": float(r["trend"]),
            "sse": float(r["sse"]),
            "seasonal": [float(x) for x in (r["seasonal"] or [])],
            "period": int(r["period"]),
            "n_resid": int(r["n_resid"]),
            "last_us": int(r["last_us"]),
            "iv_us": int(r["iv_us"]),
            "n_obs": int(r["n_obs"]),
            "ys": (
                [float(x) for x in r["ys_fit"]]
                if r["ys_fit"] is not None
                else None
            ),
            "tus": (
                [int(x) for x in r["ts_us_arr"]]
                if r["ts_us_arr"] is not None
                else None
            ),
        }
        for r in rows
        if int(r["n_obs"]) >= 2
    ]
    if holiday_dates is None:
        return state
    return state, {r["series_id"]: float(r["__e"]) for r in rows}


# Driver-side expression construction for the fold costs ~0.4 s of py4j
# round-trips per call (8 HOF lambdas, nested structs — r11, guide §1 /
# the SimHash finding); the expressions depend only on (period, holiday
# flag) and are unresolved (no plan references), so build them once per
# application and reuse the Column objects across fits.
_HOLT_PLAN_MEMO: dict = {}


def _holt_plan_app_key():
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    return sc.applicationId if sc is not None else None


def _holt_fit_plan(m: int, holiday: bool):
    """-> (ys, tus, guarded_acc, select_cols) Column objects for the
    per-series fit frame; memoized per (application, m, holiday)."""
    key = (_holt_plan_app_key(), m, holiday)
    hit = _HOLT_PLAN_MEMO.get(key)
    if hit is not None:
        return hit
    a, one_a = float(HOLT_ALPHA), 1.0 - HOLT_ALPHA
    b_, one_b = float(HOLT_BETA), 1.0 - HOLT_BETA
    g_, one_g = float(HOLT_GAMMA), 1.0 - HOLT_GAMMA
    ys = F.transform("p", lambda s: s["__y"])
    tus = F.transform(
        "p", lambda s: F.unix_micros(s["__ts"].cast("timestamp"))
    )

    def merge(acc, y):
        new_l = F.lit(a) * y + F.lit(one_a) * (acc["l"] + acc["b"])
        err = y - (acc["l"] + acc["b"])  # one-step-ahead residual
        return F.struct(
            new_l.alias("l"),
            (F.lit(b_) * (new_l - acc["l"]) + F.lit(one_b) * acc["b"]).alias(
                "b"
            ),
            (acc["sse"] + err * err).alias("sse"),
        )

    holt_acc = F.aggregate(
        F.slice(F.col("ys"), 2, F.greatest(F.size("ys") - 1, F.lit(0))),
        F.struct(
            F.element_at("ys", 1).alias("l"),
            F.lit(0.0).alias("b"),
            F.lit(0.0).alias("sse"),
        ),
        merge,
    )
    empty_s = F.expr("CAST(array() AS array<double>)")
    holt_full = F.struct(
        holt_acc["l"].alias("l"),
        holt_acc["b"].alias("b"),
        holt_acc["sse"].alias("sse"),
        empty_s.alias("s"),
    )
    if m >= 2:
        l0 = F.aggregate(
            F.slice("ys", 1, m), F.lit(0.0), lambda ac, x: ac + x
        ) / F.lit(float(m))
        mean2 = F.aggregate(
            F.slice("ys", m + 1, m), F.lit(0.0), lambda ac, x: ac + x
        ) / F.lit(float(m))
        b0 = (mean2 - l0) / F.lit(float(m))
        mid = F.lit((m + 1) / 2.0)

        def merge_hw(acc, y):
            sm = F.element_at(acc["s"], 1)
            new_l = F.lit(a) * (y - sm) + F.lit(one_a) * (acc["l"] + acc["b"])
            err = y - ((acc["l"] + acc["b"]) + sm)
            return F.struct(
                new_l.alias("l"),
                (
                    F.lit(b_) * (new_l - acc["l"]) + F.lit(one_b) * acc["b"]
                ).alias("b"),
                (acc["sse"] + err * err).alias("sse"),
                F.concat(
                    F.slice(acc["s"], 2, m - 1),
                    F.array(F.lit(g_) * (y - new_l) + F.lit(one_g) * sm),
                ).alias("s"),
            )

        hw_acc = F.aggregate(
            F.slice(F.col("ys"), m + 1, F.greatest(F.size("ys") - m, F.lit(0))),
            F.struct(
                l0.alias("l"),
                b0.alias("b"),
                F.lit(0.0).alias("sse"),
                F.transform(
                    F.slice("ys", 1, m),
                    lambda v, i: v
                    - (l0 + ((i + 1).cast("double") - mid) * b0),
                ).alias("s"),
            ),
            merge_hw,
        )
        seasonal_on = F.size("ys") >= F.lit(2 * m)
        acc_col = F.when(seasonal_on, hw_acc).otherwise(holt_full)
        period_eff = F.when(seasonal_on, F.lit(m)).otherwise(F.lit(0))
        n_resid = F.when(
            seasonal_on, F.size("ys") - m
        ).otherwise(F.size("ys") - 1)
    else:
        acc_col = holt_full
        period_eff = F.lit(0)
        n_resid = F.size("ys") - 1

    if not holiday:
        guard = lambda c: c  # noqa: E731
    else:
        # holiday mode keeps EVERY series in the single collect (the
        # effects map must cover them all); state expressions that
        # would error on a 0/1-point series are CASE-guarded and their
        # rows dropped driver-side by the caller — identical to the
        # two-pass pipeline's where(size >= 2).
        guard = lambda c: F.when(F.size("p") >= 2, c)  # noqa: E731
    select_cols = [
        F.col("series_id"),
        *([F.col("__e")] if holiday else []),
        F.col("acc.l").alias("level"),
        F.col("acc.b").alias("trend"),
        F.col("acc.sse").alias("sse"),
        F.col("acc.s").alias("seasonal"),
        period_eff.cast("int").alias("period"),
        n_resid.cast("bigint").alias("n_resid"),
        guard(F.element_at("tus", -1)).alias("last_us"),
        guard(
            F.expr(
                "(element_at(tus, -1) - element_at(tus, 1))"
                " div (size(tus) - 1)"
            )
        ).alias("iv_us"),
        F.size("tus").cast("bigint").alias("n_obs"),
        # the fitted series itself persists with the model state so
        # ML.EXPLAIN_FORECAST can replay the fold's per-step
        # decomposition (BigQuery models persist their history
        # decomposition too). HARD-BOUNDED per series (review
        # finding r7: an unbounded collect turns model size from
        # O(k x 4 scalars) into O(total training rows)): series
        # longer than EXPLAIN_HISTORY_MAX points transfer NULL —
        # their scalar state still forecasts, only the history
        # decomposition is unavailable (explain_forecast_frame
        # raises with a pointer)
        F.when(
            F.size("ys") <= EXPLAIN_HISTORY_MAX, F.col("ys")
        ).alias("ys_fit"),
        F.when(
            F.size("tus") <= EXPLAIN_HISTORY_MAX, F.col("tus")
        ).alias("ts_us_arr"),
    ]
    plan = (ys, tus, guard(acc_col), select_cols)
    _HOLT_PLAN_MEMO[key] = plan
    return plan


FORECAST_CONFIDENCE_LEVEL = 0.95

# supported confidence/threshold levels -> two-sided normal z — the
# ONE quantile table in the module (ML.FORECAST confidence_level and
# ML.DETECT_ANOMALIES anomaly_prob_threshold share it; arbitrary
# levels would need a normal-quantile implementation both engines
# replay; the documented trio covers BigQuery's examples)
CONFIDENCE_Z = {0.9: 1.6449, 0.95: 1.96, 0.99: 2.5758}
FORECAST_Z = CONFIDENCE_Z[FORECAST_CONFIDENCE_LEVEL]


# ---------------------------------------------------------------------------
# HOLIDAY_REGION support (reference surface: BigQuery ARIMA_PLUS's
# holiday_region option; CRMint's model SQL passes OPTIONS through
# verbatim). The engine models holidays as ONE pooled additive
# ``is_holiday`` indicator effect per series — the classical RegARIMA
# holiday-dummy regressor — rather than BigQuery's proprietary
# per-holiday decomposition (documented divergence, same class as the
# Holt-Winters substitution above). The calendar is the algorithmic
# US federal list (public law: 5 U.S.C. 6103), no observed-date
# shifting. Effect fit is deterministic and oracle-replicable:
#   e_t = y_t - (y_{t-1} + y_{t+1}) / 2     (interior holiday rows)
#   effect = ordered-fold mean of e_t        (0.0 when none interior)
# The Holt-Winters fold then runs on the de-holidayed series
# (y_t - effect on holiday rows); forecasts and anomaly expectations
# add the effect back on calendar holiday dates.
# ---------------------------------------------------------------------------


def _nth_weekday(year: int, month: int, weekday: int, n: int):
    import datetime as _dt

    d = _dt.date(year, month, 1)
    return d + _dt.timedelta(days=(weekday - d.weekday()) % 7 + 7 * (n - 1))


def _last_weekday(year: int, month: int, weekday: int):
    import datetime as _dt

    nxt = _dt.date(year + month // 12, month % 12 + 1, 1)
    d = nxt - _dt.timedelta(days=1)
    return d - _dt.timedelta(days=(d.weekday() - weekday) % 7)


def us_federal_holidays(year: int) -> list:
    """The 11 US federal holidays of ``year`` (actual dates, Mon=0)."""
    import datetime as _dt

    return [
        _dt.date(year, 1, 1),            # New Year's Day
        _nth_weekday(year, 1, 0, 3),     # Birthday of MLK Jr. (3rd Mon)
        _nth_weekday(year, 2, 0, 3),     # Washington's Birthday (3rd Mon)
        _last_weekday(year, 5, 0),       # Memorial Day (last Mon)
        _dt.date(year, 6, 19),           # Juneteenth
        _dt.date(year, 7, 4),            # Independence Day
        _nth_weekday(year, 9, 0, 1),     # Labor Day (1st Mon)
        _nth_weekday(year, 10, 0, 2),    # Columbus Day (2nd Mon)
        _dt.date(year, 11, 11),          # Veterans Day
        _nth_weekday(year, 11, 3, 4),    # Thanksgiving (4th Thu)
        _dt.date(year, 12, 25),          # Christmas Day
    ]


SUPPORTED_HOLIDAY_REGIONS = ("US",)


def holiday_calendar(region: str, years: list[int]) -> list[str]:
    """Sorted ISO date strings of every holiday in ``years``. Only 'US'
    is modeled; other regions raise with the supported list (BigQuery
    accepts ~40 region codes — the engine keeps the contract loud)."""
    if region.upper() not in SUPPORTED_HOLIDAY_REGIONS:
        raise ValueError(
            f"HOLIDAY_REGION {region!r} is not supported; the engine "
            f"models {SUPPORTED_HOLIDAY_REGIONS} (algorithmic federal "
            "calendar). Other regions need a calendar table."
        )
    return sorted(
        d.isoformat() for y in years for d in us_federal_holidays(y)
    )


def fit_holiday_effects(
    df: DataFrame,
    ts_col: str,
    y_col: str,
    id_col: str | None,
    dates: list[str],
) -> dict[str, float]:
    """-> {series_id: pooled additive holiday effect}.

    Same collect-sorted-array shape as :func:`fit_holt_state` (one
    groupBy, k driver rows). For each interior position i (2..n-1) whose
    date is in ``dates``: residual y_i - (y_{i-1} + y_{i+1}) / 2 against
    the local linear interpolation; the effect is the ordered-fold mean
    (IEEE-identical to the DuckDB oracle's list_reduce). Boundary
    holidays have no neighbors and are skipped — documented."""
    sid = F.col(id_col).cast("string") if id_col else F.lit("__all__")
    pts = (
        df.select(
            sid.alias("series_id"),
            F.col(ts_col).alias("__ts"),
            F.col(y_col).cast("double").alias("__y"),
        )
        .groupBy("series_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("__ts", "__y"))).alias("p")
        )
        .select(
            "series_id",
            F.transform("p", lambda s: s["__y"]).alias("ys"),
            F.transform(
                "p",
                lambda s: F.date_format(
                    s["__ts"].cast("timestamp"), "yyyy-MM-dd"
                ),
            ).alias("ds"),
        )
    )
    date_arr = F.array(*[F.lit(d) for d in dates])
    interior = F.when(
        F.size("ys") >= 3,
        F.sequence(F.lit(2), F.size("ys") - 1),
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    resids = F.filter(
        F.transform(
            interior,
            lambda i: F.when(
                F.array_contains(date_arr, F.element_at("ds", i)),
                F.element_at("ys", i)
                - (
                    F.element_at("ys", i - F.lit(1))
                    + F.element_at("ys", i + F.lit(1))
                )
                / F.lit(2.0),
            ),
        ),
        lambda x: x.isNotNull(),
    )
    eff = pts.select(
        "series_id",
        F.when(
            F.size(resids) > 0,
            F.aggregate(resids, F.lit(0.0), lambda a, x: a + x)
            / F.size(resids).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("e"),
    )
    return {r["series_id"]: float(r["e"]) for r in eff.collect()}


def apply_holiday_adjustment(
    df: DataFrame,
    spark: SparkSession,
    ts_col: str,
    y_col: str,
    id_col: str | None,
    effects: dict[str, float],
    dates: list[str],
) -> DataFrame:
    """Subtract each series' pooled effect from its holiday rows (the
    de-holidayed series the Holt-Winters fold fits on). Effects join in
    as a broadcast k-row table — no shuffle of the data side."""
    eff_df = spark.createDataFrame(
        [(k, v) for k, v in effects.items()], "__hol_sid string, __e double"
    )
    sid = F.col(id_col).cast("string") if id_col else F.lit("__all__")
    date_arr = F.array(*[F.lit(d) for d in dates])
    out = (
        df.withColumn("__sid", sid)
        .join(F.broadcast(eff_df), F.col("__sid") == F.col("__hol_sid"), "left")
        .withColumn(
            y_col,
            F.when(
                F.array_contains(
                    date_arr,
                    F.date_format(
                        F.col(ts_col).cast("timestamp"), "yyyy-MM-dd"
                    ),
                ),
                F.col(y_col).cast("double") - F.coalesce("__e", F.lit(0.0)),
            ).otherwise(F.col(y_col).cast("double")),
        )
        .drop("__sid", "__hol_sid", "__e")
    )
    return out


def forecast_frame(
    spark: SparkSession,
    state: list[dict],
    horizon: int,
    holiday: dict | None = None,
    confidence: float = FORECAST_CONFIDENCE_LEVEL,
) -> DataFrame:
    """Expand the per-series state into h forecast rows each:
    (series_id, step, forecast_ts_us, forecast_value, standard_error,
    confidence_level, prediction_interval_lower_bound, ..._upper_bound).

    Intervals are the additive-error bands: the one-step residual RMSE
    from the fit grows with sqrt(h), bounds are forecast +/- z * sigma *
    sqrt(h) — deterministic arithmetic over the fit state, so the DuckDB
    oracle certifies the bounds value-for-value (BigQuery's ML.FORECAST
    emits the same four interval columns). Seasonal series add the
    cyclic component s[(h-1) mod m] to the linear extrapolation. With a
    ``holiday`` dict ({"effects": {sid: e}, "dates": [iso, ...]}) the
    series' pooled effect is added back on calendar holiday dates."""
    hol_eff = (holiday or {}).get("effects", {})
    hol_dates = (holiday or {}).get("dates", [])
    st = spark.createDataFrame(
        [
            (
                s["series_id"],
                s["level"],
                s["trend"],
                s["sse"],
                s.get("seasonal", []),
                int(s.get("period", 0)),
                int(s.get("n_resid", s["n_obs"] - 1)),
                s["last_us"],
                s["iv_us"],
                s["n_obs"],
                float(hol_eff.get(s["series_id"], 0.0)),
            )
            for s in state
        ],
        "series_id string, level double, trend double, sse double, "
        "seasonal array<double>, period int, n_resid bigint, "
        "last_us bigint, iv_us bigint, n_obs bigint, hol_e double",
    )
    linear = F.col("level") + F.col("step") * F.col("trend")
    point = F.when(
        F.col("period") > 0,
        linear
        + F.element_at(
            "seasonal",
            (F.pmod(F.col("step") - 1, F.col("period")) + 1).cast("int"),
        ),
    ).otherwise(linear)
    if hol_dates:
        point = point + F.when(
            F.array_contains(
                F.array(*[F.lit(d) for d in hol_dates]),
                F.date_format(
                    F.timestamp_micros(
                        F.col("last_us") + F.col("step") * F.col("iv_us")
                    ),
                    "yyyy-MM-dd",
                ),
            ),
            F.col("hol_e"),
        ).otherwise(F.lit(0.0))
    se = F.sqrt(F.col("sse") / F.col("n_resid")) * F.sqrt(F.col("step"))
    return st.select(
        "series_id",
        F.explode(F.sequence(F.lit(1), F.lit(int(horizon)))).alias("step"),
        "level",
        "trend",
        "sse",
        "seasonal",
        "period",
        "n_resid",
        "last_us",
        "iv_us",
        "n_obs",
        "hol_e",
    ).select(
        "series_id",
        "step",
        (F.col("last_us") + F.col("step") * F.col("iv_us")).alias(
            "forecast_ts_us"
        ),
        F.round(point, 6).alias("forecast_value"),
        F.round(se, 6).alias("standard_error"),
        F.lit(float(confidence)).alias("confidence_level"),
        F.round(point - F.lit(CONFIDENCE_Z[confidence]) * se, 6).alias(
            "prediction_interval_lower_bound"
        ),
        F.round(point + F.lit(CONFIDENCE_Z[confidence]) * se, 6).alias(
            "prediction_interval_upper_bound"
        ),
    )


_ML_FORECAST_RE = re.compile(
    r"ML\.FORECAST\s*\(\s*MODEL\s+`?([\w.\-]+)`?\s*"
    r"(?:,\s*STRUCT\s*\(\s*([^()]*?)\s*\))?\s*\)",
    re.IGNORECASE,
)


def _parse_forecast_struct(body: str | None) -> tuple[int | None, float]:
    """(horizon | None, confidence_level) from a ``STRUCT(5 AS horizon,
    0.9 AS confidence_level)`` body, either field order."""
    horizon: int | None = None
    conf = FORECAST_CONFIDENCE_LEVEL
    if not body:
        return horizon, conf
    for part in body.split(","):
        m = re.match(
            r"\s*([0-9.]+)\s+AS\s+(horizon|confidence_level)\s*$",
            part,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(
                "ML.FORECAST STRUCT accepts horizon and"
                f" confidence_level fields, got {part.strip()!r}"
            )
        if m.group(2).lower() == "horizon":
            if not re.fullmatch(r"\d+", m.group(1)):
                raise ValueError(
                    f"horizon must be a positive integer, got"
                    f" {m.group(1)!r}"
                )
            horizon = int(m.group(1))
        else:
            conf = float(m.group(1))
            if conf not in CONFIDENCE_Z:
                raise ValueError(
                    "confidence_level must be one of"
                    f" {sorted(CONFIDENCE_Z)} (documented divergence:"
                    " arbitrary levels need a cross-engine normal"
                    f" quantile), got {conf}"
                )
    return horizon, conf


def rewrite_ml_forecast(spark: SparkSession, stmt: str, registry) -> str:
    """Replace ML.FORECAST(MODEL m [, STRUCT(n AS horizon [, c AS
    confidence_level])]) with a temp view of the forecast rows."""
    counter = [0]

    def repl(m: re.Match) -> str:
        name = m.group(1)
        meta = registry.load_meta(name)
        h, conf = _parse_forecast_struct(m.group(2))
        horizon = h if h is not None else int(meta.get("horizon", 10))
        df = forecast_frame(
            spark, meta["state"], horizon, meta.get("holiday"), conf
        )
        counter[0] += 1
        view = f"__ml_forecast_{counter[0]}"
        df.createOrReplaceTempView(view)
        return view

    return _ML_FORECAST_RE.sub(repl, stmt)


# z-scores for the supported anomaly_prob_threshold values (two-sided
# normal quantiles); BigQuery accepts any probability — the engine
# supports this table and errors otherwise (documented)
ANOMALY_Z = CONFIDENCE_Z

_STRUCT_THRESHOLD_RE = re.compile(
    r"STRUCT\s*\(\s*([0-9.]+)\s+AS\s+anomaly_prob_threshold\s*\)",
    re.IGNORECASE,
)

_STRUCT_CONTAMINATION_RE = re.compile(
    r"STRUCT\s*\(\s*([0-9.]+)\s+AS\s+contamination\s*\)",
    re.IGNORECASE,
)


def detect_anomalies_frame(
    spark: SparkSession,
    state: list[dict],
    data: DataFrame,
    ts_col: str,
    y_col: str,
    id_col: str | None,
    threshold: float,
    holiday: dict | None = None,
) -> DataFrame:
    """Flag rows whose value falls outside the z * sigma band around the
    model's extrapolation (linear + seasonal cycle for Holt-Winters
    fits) at that timestamp; sigma is the one-step-ahead residual RMSE
    from the fit. With a fitted ``holiday`` dict the series' pooled
    effect joins the expectation on calendar holiday dates — a holiday
    spike the model learned is not an anomaly."""
    if threshold not in ANOMALY_Z:
        raise ValueError(
            f"anomaly_prob_threshold must be one of {sorted(ANOMALY_Z)}"
        )
    z = ANOMALY_Z[threshold]
    hol_eff = (holiday or {}).get("effects", {})
    hol_dates = (holiday or {}).get("dates", [])
    st = spark.createDataFrame(
        [
            (
                s["series_id"],
                s["level"],
                s["trend"],
                s["sse"],
                s.get("seasonal", []),
                int(s.get("period", 0)),
                int(s.get("n_resid", s["n_obs"] - 1)),
                s["last_us"],
                s["iv_us"],
                s["n_obs"],
                float(hol_eff.get(s["series_id"], 0.0)),
            )
            for s in state
        ],
        "series_id string, level double, trend double, sse double, "
        "seasonal array<double>, period int, n_resid bigint, "
        "last_us bigint, iv_us bigint, n_obs bigint, hol_e double",
    )
    sid = F.col(id_col).cast("string") if id_col else F.lit("__all__")
    rows = data.select(
        sid.alias("series_id"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("ts_us"),
        F.col(y_col).cast("double").alias("y"),
    )
    j = rows.join(F.broadcast(st), "series_id")
    h = (F.col("ts_us") - F.col("last_us")).cast("double") / F.col("iv_us")
    linear = F.col("level") + h * F.col("trend")
    hi = F.round(h, 0).cast("bigint")
    expected = F.when(
        F.col("period") > 0,
        linear
        + F.element_at(
            "seasonal",
            (F.pmod(hi - 1, F.col("period")) + 1).cast("int"),
        ),
    ).otherwise(linear)
    if hol_dates:
        expected = expected + F.when(
            F.array_contains(
                F.array(*[F.lit(d) for d in hol_dates]),
                F.date_format(F.timestamp_micros("ts_us"), "yyyy-MM-dd"),
            ),
            F.col("hol_e"),
        ).otherwise(F.lit(0.0))
    sigma = F.sqrt(F.col("sse") / F.col("n_resid"))
    return j.select(
        "series_id",
        "ts_us",
        F.round("y", 6).alias("value"),
        F.round(expected, 6).alias("expected_value"),
        F.round(F.lit(z) * sigma, 6).alias("band"),
        (F.abs(F.col("y") - expected) > F.lit(z) * sigma).alias(
            "is_anomaly"
        ),
    )


def rewrite_ml_detect_anomalies(
    spark: SparkSession, stmt: str, registry
) -> str:
    """Replace ML.DETECT_ANOMALIES(MODEL m, STRUCT(p AS
    anomaly_prob_threshold), (query)) with a temp view. Uses the
    balanced-paren call scanner — a non-greedy regex would truncate
    inner queries containing "))"."""
    from .sql_ml import _inner_query, _sub_ml_table_calls

    counter = [0]

    def handler(name: str, args: list[str]) -> str:
        if len(args) not in (1, 2):
            raise ValueError(
                "ML.DETECT_ANOMALIES expects (MODEL m, STRUCT(p AS "
                "anomaly_prob_threshold | contamination) [, (query)])"
            )
        meta = registry.load_meta(name)
        if len(args) == 1 and (
            not _STRUCT_CONTAMINATION_RE.match(args[0])
            or not meta.get("source_sql")
        ):
            raise ValueError(
                "ML.DETECT_ANOMALIES without an input query needs a"
                " contamination STRUCT and a model with a persisted"
                " training source"
            )
        mc = _STRUCT_CONTAMINATION_RE.match(args[0])
        if mc:
            # contamination anomalies: reconstruction loss for
            # AUTOENCODER/PCA, centroid distance for KMEANS —
            # BigQuery's contract for each model family. The persisted
            # TRANSFORM clause replays over the input first.
            from .sql_ml import _apply_transform
            from .sql_ml import _inner_query as _iq

            if meta["model_type"] not in ("AUTOENCODER", "PCA", "KMEANS"):
                raise ValueError(
                    "STRUCT(c AS contamination) needs an AUTOENCODER,"
                    f" PCA or KMEANS model, got {meta['model_type']}"
                )
            if len(args) == 1:
                # no input query -> training data; source_sql already
                # embeds any TRANSFORM wrap
                df_in = spark.sql(meta["source_sql"])
            else:
                df_in = _apply_transform(
                    spark, _iq(args[1]), meta, drop_label=True
                )
            if meta["model_type"] in ("AUTOENCODER", "PCA"):
                from .pca_model import detect_reconstruction_anomalies

                out = detect_reconstruction_anomalies(
                    spark, meta["pca"], df_in, float(mc.group(1))
                )
            elif meta["model_type"] == "KMEANS":
                from .kmeans import detect_distance_anomalies

                out = detect_distance_anomalies(
                    spark, meta["kmeans"], df_in, float(mc.group(1))
                )
            counter[0] += 1
            view = f"__ml_detect_{counter[0]}"
            out.createOrReplaceTempView(view)
            return view
        ms = _STRUCT_THRESHOLD_RE.match(args[0])
        if not ms:
            raise ValueError(f"bad anomaly threshold arg: {args[0]!r}")
        p = float(ms.group(1))
        df = spark.sql(_inner_query(args[1]))
        cols = meta.get("detect_cols", {})
        out = detect_anomalies_frame(
            spark,
            meta["state"],
            df,
            cols.get("ts", "ts"),
            cols.get("y", "y"),
            cols.get("id"),
            p,
            meta.get("holiday"),
        )
        counter[0] += 1
        view = f"__ml_detect_{counter[0]}"
        out.createOrReplaceTempView(view)
        return view

    return _sub_ml_table_calls(stmt, "ML.DETECT_ANOMALIES", handler)


_ML_ARIMA_EVALUATE_RE = re.compile(
    r"ML\.ARIMA_EVALUATE\s*\(\s*MODEL\s+`?([\w.\-]+)`?\s*"
    r"(?:,\s*STRUCT\s*\([^)]*\)\s*)?\)",
    re.IGNORECASE,
)

_ML_ARIMA_COEFFICIENTS_RE = re.compile(
    r"ML\.ARIMA_COEFFICIENTS\s*\(\s*MODEL\s+`?([\w.\-]+)`?\s*\)",
    re.IGNORECASE,
)


def rewrite_ml_arima_coefficients(
    spark: SparkSession, stmt: str, registry
) -> str:
    """Replace ``ML.ARIMA_COEFFICIENTS(MODEL m)`` with a per-series
    coefficients view in BigQuery's column shape: ar_coefficients,
    ma_coefficients, intercept_or_drift.

    DOCUMENTED DIVERGENCE (same note as the module header): the fitted
    model is the deterministic Holt / Holt-Winters substitute, so there
    are no autoregressive or moving-average terms — both arrays are
    empty — and intercept_or_drift reports the fitted per-step drift
    (the final trend state), which is the substitute's exact analog of
    an ARIMA drift constant. Pure functions of the persisted fold
    state, so the DuckDB oracle replays every value."""
    counter = [0]

    def repl(m: re.Match) -> str:
        meta = registry.load_meta(m.group(1))
        rows = [
            (s["series_id"], [], [], _r6(s["trend"]))
            for s in meta["state"]
        ]
        df = spark.createDataFrame(
            rows,
            "series_id string, ar_coefficients array<double>,"
            " ma_coefficients array<double>, intercept_or_drift double",
        )
        counter[0] += 1
        view = f"__ml_arima_coefficients_{counter[0]}"
        df.createOrReplaceTempView(view)
        return view

    return _ML_ARIMA_COEFFICIENTS_RE.sub(repl, stmt)


def rewrite_ml_arima_evaluate(
    spark: SparkSession, stmt: str, registry
) -> str:
    """Replace ``ML.ARIMA_EVALUATE(MODEL m)`` with a per-series
    fit-diagnostics view in BigQuery's column shape: non_seasonal_p/d/q,
    has_drift, log_likelihood, AIC, variance, seasonal_periods.

    DOCUMENTED DIVERGENCE (same note as the module header): the fitted
    model is the deterministic Holt / Holt-Winters substitute, so there
    is no ARIMA order search — non_seasonal_p/d/q are NULL and the
    likelihood/AIC describe the exponential-smoothing fit (gaussian
    one-step residuals; k = 4 params for plain Holt, 5 + period for the
    seasonal fit). The diagnostics are exact functions of the persisted
    fold state, so the DuckDB oracle reproduces every value."""
    import math

    counter = [0]

    def repl(m: re.Match) -> str:
        meta = registry.load_meta(m.group(1))
        rows = []
        for s in meta["state"]:
            n_resid = int(s.get("n_resid", s["n_obs"] - 1))
            per = int(s.get("period", 0))
            variance = s["sse"] / n_resid
            ll = (
                -(n_resid / 2.0) * (math.log(2.0 * math.pi * variance) + 1.0)
                if variance > 0
                else None
            )
            k = 5 + per if per > 0 else 4
            rows.append(
                (
                    s["series_id"],
                    None,
                    None,
                    None,
                    False,
                    round(ll, 6) if ll is not None else None,
                    round(-2.0 * ll + 2.0 * k, 6) if ll is not None else None,
                    round(variance, 6),
                    per if per > 0 else None,
                )
            )
        df = spark.createDataFrame(
            rows,
            "series_id string, non_seasonal_p bigint, non_seasonal_d bigint,"
            " non_seasonal_q bigint, has_drift boolean,"
            " log_likelihood double, aic double, variance double,"
            " seasonal_periods bigint",
        )
        counter[0] += 1
        view = f"__ml_arima_evaluate_{counter[0]}"
        df.createOrReplaceTempView(view)
        return view

    return _ML_ARIMA_EVALUATE_RE.sub(repl, stmt)


def _r6(x: float) -> float:
    """ROUND(x, 6) half-away-from-zero, normalized +0.0 — the canonical
    rounding discipline lives in ml/kmeans._round6 (one copy only:
    review finding r7)."""
    from .kmeans import _round6

    return _round6(x) + 0.0


#: Above this many series the EXPLAIN decomposition routes through the
#: distributed replay (when a history table was persisted) instead of
#: the driver loop — the driver path is O(n_series x history) Python.
EXPLAIN_DRIVER_SERIES_MAX = 1024


def _day_utc(us: int) -> str:
    import datetime

    return datetime.datetime.fromtimestamp(
        us / 1e6, datetime.timezone.utc
    ).strftime("%Y-%m-%d")


def _replay_series(
    s: dict,
    ys: list[float],
    tus: list[int],
    horizon: int,
    he: float,
    hol_dates: set,
    confidence: float,
) -> list[tuple]:
    """Per-series decomposition rows (history + forecast) — the ONE fold
    replay implementation, shared verbatim by the driver loop and the
    distributed applyInPandas path so both produce IEEE-identical
    components (plain Python floats, expression order identical to the
    Spark fit fold and the DuckDB oracle)."""
    import math

    a, one_a = float(HOLT_ALPHA), 1.0 - HOLT_ALPHA
    b_, one_b = float(HOLT_BETA), 1.0 - HOLT_BETA
    g_, one_g = float(HOLT_GAMMA), 1.0 - HOLT_GAMMA
    m = int(s.get("period", 0))
    n = len(ys)
    rows: list[tuple] = []
    comp = []  # (trend, seasonal) per history position
    if m >= 2 and n >= 2 * m:
        acc = 0.0
        for y in ys[:m]:
            acc = acc + y
        l0 = acc / float(m)
        acc2 = 0.0
        for y in ys[m : 2 * m]:
            acc2 = acc2 + y
        b0 = (acc2 / float(m) - l0) / float(m)
        mid = (m + 1) / 2.0
        s_arr = [ys[i] - (l0 + (float(i + 1) - mid) * b0) for i in range(m)]
        for i in range(m):
            comp.append((l0 + (float(i + 1) - mid) * b0, s_arr[i]))
        lev, tr = l0, b0
        for t in range(m, n):
            y, s1 = ys[t], s_arr[0]
            comp.append((lev + tr, s1))
            new_l = a * (y - s1) + one_a * (lev + tr)
            new_b = b_ * (new_l - lev) + one_b * tr
            s_arr = s_arr[1:] + [g_ * (y - new_l) + one_g * s1]
            lev, tr = new_l, new_b
    else:
        comp.append((ys[0], 0.0))
        lev, tr = ys[0], 0.0
        for t in range(1, n):
            y = ys[t]
            comp.append((lev + tr, 0.0))
            new_l = a * y + one_a * (lev + tr)
            new_b = b_ * (new_l - lev) + one_b * tr
            lev, tr = new_l, new_b
    for t in range(n):
        hol_t = he if _day_utc(tus[t]) in hol_dates else 0.0
        data_t = ys[t] + hol_t
        trend_t, seas_t = comp[t]
        rows.append(
            (
                s["series_id"],
                int(tus[t]),
                "history",
                _r6(data_t),
                _r6(trend_t),
                _r6(seas_t),
                _r6(hol_t),
                _r6(data_t - trend_t - seas_t - hol_t),
                None,
                None,
                None,
                None,
            )
        )
    sigma = math.sqrt(s["sse"] / s["n_resid"]) if s["n_resid"] else 0.0
    for h in range(1, int(horizon) + 1):
        ts_h = s["last_us"] + h * s["iv_us"]
        trend_h = s["level"] + h * s["trend"]
        seas_h = s["seasonal"][(h - 1) % m] if m > 0 else 0.0
        hol_h = he if _day_utc(ts_h) in hol_dates else 0.0
        point = (trend_h + seas_h) + hol_h
        se = sigma * math.sqrt(float(h))
        rows.append(
            (
                s["series_id"],
                int(ts_h),
                "forecast",
                None,
                _r6(trend_h),
                _r6(seas_h),
                _r6(hol_h),
                None,
                _r6(se),
                float(confidence),
                _r6(point - CONFIDENCE_Z[confidence] * se),
                _r6(point + CONFIDENCE_Z[confidence] * se),
            )
        )
    return rows


EXPLAIN_SCHEMA = (
    "series_id string, time_series_timestamp_us bigint, "
    "time_series_type string, time_series_data double, trend double, "
    "seasonal_period_weekly double, holiday_effect double, "
    "residual double, standard_error double, confidence_level double, "
    "prediction_interval_lower_bound double, "
    "prediction_interval_upper_bound double"
)


def explain_forecast_frame(
    spark: SparkSession,
    state: list[dict],
    horizon: int,
    holiday: dict | None = None,
    confidence: float = FORECAST_CONFIDENCE_LEVEL,
    history_path: str | None = None,
) -> DataFrame:
    """``ML.EXPLAIN_FORECAST``: per-timestamp decomposition for history
    AND horizon rows — BigQuery's companion to ML.FORECAST
    (time_series_type, time_series_data, trend, seasonal, holiday
    effect, residual, and the forecast interval columns).

    The fold replay runs on the driver over the PERSISTED per-series
    arrays (fit_holt_state stores them with the model — the same
    boundedness as the fit's own per-series collect: model size, not
    data size), using arithmetic expression order identical to the
    Spark fold and the DuckDB oracle, so every component is
    IEEE-reproducible cross-engine.

    Decomposition contract (documented divergences from BigQuery's
    ARIMA-based decomposition, consistent with the Holt-Winters
    stand-in documented at module top):
      - history ``trend`` = the fold's one-step-ahead level+trend
        prediction (classical-init fitted line over the first period);
        ``seasonal_period_weekly`` = the seasonal index used at that
        step (zero for non-seasonal fits — all cyclic effect reports
        under this column whatever the period); ``residual`` =
        time_series_data - trend - seasonal - holiday_effect (the
        fold's one-step residual).
      - forecast rows: trend + seasonal + holiday_effect ==
        ML.FORECAST's forecast_value exactly; standard_error and the
        prediction interval match ML.FORECAST; time_series_data and
        residual are NULL.

    Scale (round 8, VERDICT r7 #2): series whose history exceeds
    EXPLAIN_HISTORY_MAX (not embedded in the model meta), and whole
    models past EXPLAIN_DRIVER_SERIES_MAX series, replay DISTRIBUTED —
    an applyInPandas per-series fold over the history TABLE persisted
    at fit time (``history_path``), sharing the exact ``_replay_series``
    code with the driver loop so both paths are bit-identical. The
    raise remains only for pre-round-8 models that persisted neither
    arrays nor a history table."""
    hol_eff = (holiday or {}).get("effects", {})
    hol_dates = set((holiday or {}).get("dates", []))

    driver_state = [s for s in state if s.get("ys")]
    dist_state = [s for s in state if not s.get("ys")]
    if history_path and len(state) > EXPLAIN_DRIVER_SERIES_MAX:
        driver_state, dist_state = [], list(state)
    if dist_state and not history_path:
        raise ValueError(
            "ML.EXPLAIN_FORECAST needs the per-series history persisted"
            " with the model: re-run CREATE MODEL (models fit before the"
            " distributed-replay support persisted neither the"
            f" <= {EXPLAIN_HISTORY_MAX}-point arrays nor a history"
            " table) — ML.FORECAST still serves them"
        )

    rows = []
    for s in driver_state:
        he = float(hol_eff.get(s["series_id"], 0.0))
        rows.extend(
            _replay_series(
                s, s["ys"], s["tus"], horizon, he, hol_dates, confidence
            )
        )
    df = spark.createDataFrame(rows, EXPLAIN_SCHEMA)
    if not dist_state:
        return df

    scalars = {s["series_id"]: s for s in dist_state}
    n_horizon, conf = int(horizon), float(confidence)

    def replay(pdf):
        import pandas as pd

        sid = pdf["series_id"].iloc[0]
        s = scalars.get(sid)
        if s is None:  # series dropped by the fit (< 2 points)
            return pd.DataFrame(columns=_EXPLAIN_COLS)
        pdf = pdf.sort_values(["ts_us", "y"])
        ys = [float(v) for v in pdf["y"]]
        tus = [int(v) for v in pdf["ts_us"]]
        he = float(hol_eff.get(sid, 0.0))
        out = _replay_series(
            s, ys, tus, n_horizon, he, hol_dates, conf
        )
        return pd.DataFrame(out, columns=_EXPLAIN_COLS)

    hist = spark.read.parquet(history_path)
    if len(scalars) < len(state):
        hist = hist.where(F.col("series_id").isin(list(scalars)))
    dist_df = hist.groupBy("series_id").applyInPandas(
        replay, schema=EXPLAIN_SCHEMA
    )
    return df.unionByName(dist_df)


_EXPLAIN_COLS = [
    "series_id", "time_series_timestamp_us", "time_series_type",
    "time_series_data", "trend", "seasonal_period_weekly",
    "holiday_effect", "residual", "standard_error", "confidence_level",
    "prediction_interval_lower_bound", "prediction_interval_upper_bound",
]


_ML_EXPLAIN_FORECAST_RE = re.compile(
    r"ML\.EXPLAIN_FORECAST\s*\(\s*MODEL\s+`?([\w.\-]+)`?\s*"
    r"(?:,\s*STRUCT\s*\(\s*([^()]*?)\s*\))?\s*\)",
    re.IGNORECASE,
)


def rewrite_ml_explain_forecast(
    spark: SparkSession, stmt: str, registry
) -> str:
    """Replace ML.EXPLAIN_FORECAST(MODEL m [, STRUCT(n AS horizon)])
    with a temp view of the decomposition rows (VERDICT r6 #4)."""
    counter = [0]

    def repl(m: re.Match) -> str:
        name = m.group(1)
        meta = registry.load_meta(name)
        if meta.get("model_type") != "ARIMA_PLUS":
            raise ValueError(
                "ML.EXPLAIN_FORECAST requires an ARIMA_PLUS model"
            )
        h, conf = _parse_forecast_struct(m.group(2))
        horizon = h if h is not None else int(meta.get("horizon", 10))
        df = explain_forecast_frame(
            spark,
            meta["state"],
            horizon,
            meta.get("holiday"),
            conf,
            history_path=meta.get("history_path"),
        )
        counter[0] += 1
        view = f"__ml_explain_forecast_{counter[0]}"
        df.createOrReplaceTempView(view)
        return view

    return _ML_EXPLAIN_FORECAST_RE.sub(repl, stmt)

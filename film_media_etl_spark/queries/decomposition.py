"""Time-series decomposition + basket-size distribution: the remaining
descriptive shapes on the engine's time-series surface (densify, EWMA,
RANGE frames, YoY) — a centered moving-average trend split and the
order-size histogram merchandising teams read next to ABC classes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import AGG_DECIMAL, dec
from ..sources import load_table
from .registry import register


@register(
    "ext_seasonal_decompose",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS total
      FROM events GROUP BY 1
    )
    SELECT d, total,
           CAST(SUM(total) OVER w AS DOUBLE) / COUNT(*) OVER w AS trend,
           CAST(total AS DOUBLE)
             - CAST(SUM(total) OVER w AS DOUBLE) / COUNT(*) OVER w AS residual,
           CAST(COUNT(*) OVER w AS INT) AS window_days
    FROM daily
    WINDOW w AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    """,
)
def ext_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive trend/residual split of daily event value: trend = 7-day
    CENTERED moving average (3 preceding + 3 following), residual =
    observed - trend; edge days average their truncated window (the
    reported window_days makes that explicit). The window runs over the
    calendar-sized daily aggregate — never raw events — and the mean is
    an exact decimal window-sum divided once, so trend and residual are
    bit-identical cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(dec(F.col("value"))).cast(AGG_DECIMAL).alias("total")
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    trend = F.sum("total").over(w).cast("double") / F.count(F.lit(1)).over(w)
    return daily.select(
        "d",
        "total",
        trend.alias("trend"),
        (F.col("total").cast("double") - trend).alias("residual"),
        F.count(F.lit(1)).over(w).cast("int").alias("window_days"),
    )


@register(
    "ext_basket_size_distribution",
    oracle="""
    WITH sizes AS (
      SELECT l_orderkey, COUNT(DISTINCT l_partkey) AS basket_size
      FROM lineitem GROUP BY 1
    )
    SELECT basket_size,
           COUNT(*) AS n_orders,
           CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS share
    FROM sizes GROUP BY basket_size
    """,
)
def ext_basket_size_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of distinct-part basket sizes per order with each
    size's share of all orders — the sizing fact behind the market-
    basket and also-bought operators. Two nested aggregations (order,
    then size) each collapse with map-side partials; the share window
    runs over the handful of distinct sizes."""
    li = load_table(spark, sf_dir, "lineitem")
    sizes = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_partkey").alias("basket_size")
    )
    counted = sizes.groupBy("basket_size").agg(F.count(F.lit(1)).alias("n_orders"))
    w = Window.partitionBy()
    return counted.select(
        "basket_size",
        "n_orders",
        (
            F.col("n_orders").cast("double")
            / F.sum("n_orders").over(w).cast("double")
        ).alias("share"),
    )


# ---------------------------------------------------------------------------
# Holt double-exponential smoothing (level + trend), exact
# ---------------------------------------------------------------------------

_HOLT_A = "0.5"  # level smoothing (exact decimal literal)
_HOLT_B = "0.3"  # trend smoothing
_HOLT_A2, _HOLT_B2 = "0.5", "0.7"  # 1 - alpha, 1 - beta

# The per-step recursion runs ENTIRELY in DECIMAL: the smoothing
# coefficients are exact 1dp decimals, so every multiply/add is exact
# and the 6dp ROUND is decimal rounding — engine-identical by
# definition. (A double-arithmetic spelling hit a ROUND(double, 6)
# half-way boundary at sf0.1 where Spark rounds the shortest decimal
# string and DuckDB rounds the binary double — 1e-6 disagreement that
# then rode the recursion. Decimal-in, decimal-out removes the entire
# failure class.)


@register(
    "ext_holt_forecast",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             CAST(SUM(CAST(ROUND(value, 3) AS DECIMAL(18,3))) AS DECIMAL(18,3)) AS y
      FROM events GROUP BY 1, 2
    ),
    ser AS (
      SELECT event_type,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d) AS INT) - 1 AS t,
             y
      FROM daily
    ),
    tmax AS (SELECT event_type, MAX(t) AS tm FROM ser GROUP BY 1),
    hw AS (
      SELECT event_type, t,
             CAST(y AS DECIMAL(18,6)) AS l,
             CAST(0 AS DECIMAL(18,6)) AS b
      FROM ser WHERE t = 0
      UNION ALL
      SELECT s.event_type, s.t,
             CAST(ROUND({_HOLT_A} * s.y + {_HOLT_A2} * (h.l + h.b), 6)
                  AS DECIMAL(18,6)),
             CAST(ROUND({_HOLT_B} * (CAST(ROUND({_HOLT_A} * s.y + {_HOLT_A2} * (h.l + h.b), 6)
                                          AS DECIMAL(18,6)) - h.l)
                        + {_HOLT_B2} * h.b, 6) AS DECIMAL(18,6))
      FROM hw h JOIN ser s ON s.event_type = h.event_type AND s.t = h.t + 1
    )
    SELECT h.event_type,
           CAST(m.tm + 1 AS BIGINT) AS n_days,
           CAST(h.l AS DOUBLE) AS level,
           CAST(h.b AS DOUBLE) AS trend,
           CAST(h.l + h.b AS DOUBLE) AS forecast_next
    FROM hw h JOIN tmax m ON h.event_type = m.event_type AND h.t = m.tm
    """,
)
def ext_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing per event type: level/trend
    recursion l_t = a*y_t + (1-a)(l+b), b_t = g*(l_t-l) + (1-g)*b over
    the daily value series, one-step-ahead forecast = level + trend —
    the trend-aware forecaster next to ext_seasonal_decompose's
    decomposition and ext_forecast_backtest's naive baseline.

    A time recursion is the third 'not SQL-expressible' class after
    fixpoints (ext_pagerank_exact) and frontier expansion
    (ext_bfs_distances); it IS expressible — Spark folds the collected
    per-key series in order (bounded: days per key), the oracle runs a
    RECURSIVE CTE stepping t -> t+1 — and it hash-matches exactly
    because the whole step is DECIMAL arithmetic (exact 1dp smoothing
    coefficients, 6dp decimal ROUND; see the module comment for the
    double-rounding boundary this dodges). Scale shape: one
    corpus-sized daily aggregate; the fold then works on #days-sized
    arrays per key (the bounded-series contract — the streaming twin
    streaming/windows.py:stream_holt_forecast handles unbounded
    series)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts").cast("timestamp")).alias("d")
    ).agg(
        F.sum(F.round("value", 3).cast("decimal(18,3)")).cast("decimal(18,3)").alias("y")
    )
    ser = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("d", "y"))).alias("s")
    )
    ys = F.transform("s", lambda e: e["y"])
    dt = "decimal(18,6)"
    a, a2 = [F.expr(f"CAST({c} AS DECIMAL(2,1))") for c in (_HOLT_A, _HOLT_A2)]
    bb, b2 = [F.expr(f"CAST({c} AS DECIMAL(2,1))") for c in (_HOLT_B, _HOLT_B2)]
    init = F.struct(
        F.element_at(ys, 1).cast(dt).alias("l"),
        F.lit(0).cast(dt).alias("b"),
    )

    def step(acc, y):
        lnew = F.round(a * y + a2 * (acc["l"] + acc["b"]), 6).cast(dt)
        bnew = F.round(bb * (lnew - acc["l"]) + b2 * acc["b"], 6).cast(dt)
        return F.struct(lnew.alias("l"), bnew.alias("b"))

    fin = F.aggregate(F.slice(ys, 2, F.size(ys) - 1), init, step)
    return ser.select(
        "event_type",
        F.size("s").cast("long").alias("n_days"),
        fin["l"].cast("double").alias("level"),
        fin["b"].cast("double").alias("trend"),
        (fin["l"] + fin["b"]).cast("double").alias("forecast_next"),
    )

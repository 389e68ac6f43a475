"""Operational diagnostics: join-key skew audit and a seasonal-naive
forecast backtest.

The skew audit is the measurement half of the engine's skew toolkit
(ext_salted_join / ext_salted_agg are the mitigation half): per-key row
counts for the three hottest join keys, reduced to the heavy-hitter
ratios that decide whether a join needs salting BEFORE it runs at
100 TB. The backtest evaluates the simplest defensible revenue
forecast (seasonal naive: predict month t with month t-12) the way a
forecasting pipeline would — rolling it across history and scoring
WMAPE/bias — turning the reference's descriptive monthly pivots
(BusinessAnalysis...Rmd:433-465) into a predictive baseline.

Exactness: counts are integers; WMAPE and bias are ratios of exact
decimal sums (one double division each, rounded to 6dp); the only
percentiles are over integer counts where Spark percentile() == DuckDB
quantile_cont bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

_SKEW_KEYS = [
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("orders", "o_custkey"),
]


def _skew_oracle_leg(table: str, key: str) -> str:
    return f"""
    SELECT '{table}.{key}' AS join_key,
           COUNT(*) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS total_rows,
           CAST(MAX(cnt) AS BIGINT) AS max_rows,
           CAST(SUM(cnt) AS DOUBLE) / COUNT(*) AS avg_rows,
           quantile_cont(cnt, 0.5) AS p50_rows,
           quantile_cont(cnt, 0.99) AS p99_rows,
           ROUND(CAST(MAX(cnt) AS DOUBLE)
                 / (CAST(SUM(cnt) AS DOUBLE) / COUNT(*)), 6) AS skew_ratio
    FROM (SELECT {key}, COUNT(*) AS cnt FROM {table} GROUP BY 1)
    """


@register(
    "ext_skew_audit",
    oracle=" UNION ALL ".join(_skew_oracle_leg(t, k) for t, k in _SKEW_KEYS),
)
def ext_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit: for each hot join key, the per-key row-count
    profile (max, mean, p50, p99) and the max/mean skew ratio — the
    number that predicts whether one reducer will straggle when this key
    shuffles at scale (ratio near 1 = safe hash join; >> 1 = salt it,
    see ext_salted_join). Each leg is a two-level aggregation: partial
    counts collapse map-side, the percentile runs over the key-sized
    count frame, and the three single-row profiles union cheaply."""

    def leg(table: str, key: str) -> DataFrame:
        cnt = (
            load_table(spark, sf_dir, table)
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        pct = F.percentile("cnt", F.array(F.lit(0.5), F.lit(0.99)))
        return cnt.agg(
            F.lit(f"{table}.{key}").alias("join_key"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").cast("long").alias("total_rows"),
            F.max("cnt").cast("long").alias("max_rows"),
            (F.sum("cnt").cast("double") / F.count(F.lit(1))).alias("avg_rows"),
            pct.alias("_pct"),
            F.round(
                F.max("cnt").cast("double")
                / (F.sum("cnt").cast("double") / F.count(F.lit(1))),
                6,
            ).alias("skew_ratio"),
        ).select(
            "join_key",
            "n_keys",
            "total_rows",
            "max_rows",
            "avg_rows",
            F.element_at("_pct", 1).alias("p50_rows"),
            F.element_at("_pct", 2).alias("p99_rows"),
            "skew_ratio",
        )

    out = leg(*_SKEW_KEYS[0])
    for t, k in _SKEW_KEYS[1:]:
        out = out.unionByName(leg(t, k))
    return out


@register(
    "ext_forecast_backtest",
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS mon,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
               AS rev
      FROM orders GROUP BY 1
    ),
    f AS (
      SELECT mon, rev, lag(rev, 12) OVER (ORDER BY mon ASC) AS fc
      FROM m
    )
    SELECT COUNT(*) AS n_months,
           CAST(SUM(CAST(abs(rev - fc) AS DECIMAL(38,2))) AS DECIMAL(38,2))
             AS total_abs_err,
           CAST(SUM(CAST(abs(rev - fc) AS DECIMAL(38,2))) AS DOUBLE)
             / COUNT(*) AS mae,
           ROUND(CAST(SUM(CAST(abs(rev - fc) AS DECIMAL(38,2))) AS DOUBLE)
                 / CAST(SUM(rev) AS DOUBLE), 6) AS wmape,
           ROUND((CAST(SUM(fc) AS DOUBLE) - CAST(SUM(rev) AS DOUBLE))
                 / CAST(SUM(rev) AS DOUBLE), 6) AS bias
    FROM f WHERE fc IS NOT NULL
    """,
)
def ext_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: predict each month's revenue
    with the same month one year earlier (lag 12 over the monthly
    series), score every month that has a forecast. Reported the way
    forecast reviews want it: MAE in currency, WMAPE = Σ|err| / Σactual
    (the aggregate-ratio form — unlike per-row-MAPE averages it is a
    ratio of two order-insensitive decimal sums, so it is deterministic
    under parallel summation), and signed bias. The lag window is global
    but runs on the months-sized aggregate (~80 rows), never on facts —
    the single-partition exchange the plan audit allows is over that
    tiny frame."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_trunc("month", "o_orderdate").alias("mon")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .alias("rev")
    )
    f = (
        m.withColumn("fc", F.lag("rev", 12).over(Window.orderBy(F.asc("mon"))))
        .where(F.col("fc").isNotNull())
    )
    abs_err = F.sum(F.abs(F.col("rev") - F.col("fc")).cast("decimal(38,2)"))
    return f.agg(
        F.count(F.lit(1)).alias("n_months"),
        abs_err.cast("decimal(38,2)").alias("total_abs_err"),
        (abs_err.cast("double") / F.count(F.lit(1))).alias("mae"),
        F.round(abs_err.cast("double") / F.sum("rev").cast("double"), 6).alias(
            "wmape"
        ),
        F.round(
            (F.sum("fc").cast("double") - F.sum("rev").cast("double"))
            / F.sum("rev").cast("double"),
            6,
        ).alias("bias"),
    )

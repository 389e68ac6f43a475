"""The reference's analytical report workload (BusinessAnalysis...Rmd,
~15 queries) re-expressed over the engine's star schema. Populated in the
star-ETL milestone; the flagship (Rmd:90-96 'revenue by year, top-k')
lives here from day one — it is entry()'s query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.money import money_sum
from ..sources import load_table
from .reference_ops import REVENUE, _revenue_col
from .registry import register


@register(
    "flagship_revenue_by_year",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INT) AS year,
           CAST(SUM(CAST(({REVENUE}) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS total_revenue,
           COUNT(*) AS n_sales
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    ORDER BY total_revenue DESC, year ASC
    LIMIT 5
    """,
)
def flagship_revenue_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: revenue by year, top-5 (reference BusinessAnalysis...Rmd:
    90-96 — scan -> join -> group-sum -> sort -> limit in one declarative
    chain; Catalyst prunes lineitem to 3 columns and plans distributed
    top-k)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.year("o_orderdate").alias("year"))
        .agg(
            money_sum(_revenue_col(), "total_revenue"),
            F.count(F.lit(1)).alias("n_sales"),
        )
        .orderBy(F.desc("total_revenue"), F.asc("year"))
        .limit(5)
    )

"""Star-schema ETL pipeline as registered queries — the engine's parity
surface for the reference's warehouse load (` loadAnalyticsDB...R`:main).
Each star table is independently oracle-checked end-to-end, including
surrogate keys and the populated to-date window measures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..etl.star import STAR_CTES, build_star
from .registry import register


def _star_query(table: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        return build_star(spark, sf_dir)[table]

    fn.__name__ = f"star_{table}"
    return fn


for _table in (
    "dim_date",
    "dim_customer",
    "dim_location",
    "dim_product",
    "fact_sales",
    "sales_summary",
):
    register(
        f"star_{_table}",
        oracle=f"WITH {STAR_CTES} SELECT * FROM {_table}",
        doc=f"Star ETL output table {_table} (see etl.star module docs).",
    )(_star_query(_table))

"""Pipeline observability via ``df.observe()``: collect load-quality
metrics as a side effect of the load action itself — zero extra passes.

The reference's README prescribes exactly this and never builds it
('Validate row counts between source and target ... Check for NULL
values in critical fields', README:179-183). In the R ETL that would be
a second full query per check; on Spark, ``Observation`` attaches
aggregates to the existing job, so the fact build reports its own row
count, key-resolution failures, and revenue total for free at any scale
— the executors fold the metrics into the same task pass that writes
the data.

Only deterministic non-distinct aggregates are legal in ``observe`` —
count/sum/min/max — which is precisely the audit surface the README
asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_fact(fact: DataFrame) -> tuple[DataFrame, Observation]:
    """Attach the reference-prescribed load audits to a fact frame.

    Returns the instrumented frame and its Observation; run any action
    on the frame, then read ``observation.get`` — a dict with:

    - ``n_rows``: rows loaded (README's source/target row-count check)
    - ``n_null_customer_key``: facts whose customer lookup fell through
      to NULL (the reference's fallback at ` loadAnalyticsDB...R`:476)
    - ``n_fallback_location``/``n_fallback_product``: lookups that fell
      back to key 1 (`load:472,480`)
    - ``total_revenue``: exact decimal revenue total
    - ``min_date_key``/``max_date_key``: loaded date range
    """
    obs = Observation("fact_load_audit")
    instrumented = fact.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("customer_key").isNull(), 1)).alias(
            "n_null_customer_key"
        ),
        F.count(F.when(F.col("location_key") == 1, 1)).alias("n_fallback_location"),
        F.count(F.when(F.col("product_key") == 1, 1)).alias("n_fallback_product"),
        F.sum(F.col("revenue")).cast("decimal(38,4)").alias("total_revenue"),
        F.min("date_key").alias("min_date_key"),
        F.max("date_key").alias("max_date_key"),
    )
    return instrumented, obs

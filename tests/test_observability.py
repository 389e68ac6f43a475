"""Load-audit observability: the metrics the reference's README asks for
('Validate row counts ... Check for NULL values in critical fields',
README:179-183) must come out of the SAME job that materializes the
fact — and must agree with independently computed values."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import PARITY_SF_DIR

from film_media_etl_spark.etl.observe import observed_fact
from film_media_etl_spark.etl.star import build_fact_sales


def test_observed_fact_metrics_match_direct_queries(spark):
    fact = build_fact_sales(spark, PARITY_SF_DIR)
    instrumented, obs = observed_fact(fact)
    n_rows = instrumented.count()  # the one action drives data + metrics
    m = obs.get

    assert m["n_rows"] == n_rows

    direct = fact.agg(
        F.count(F.when(F.col("customer_key").isNull(), 1)).alias("nullc"),
        F.count(F.when(F.col("location_key") == 1, 1)).alias("fb_loc"),
        F.count(F.when(F.col("product_key") == 1, 1)).alias("fb_prod"),
        F.sum("revenue").cast("decimal(38,4)").alias("rev"),
        F.min("date_key").alias("lo"),
        F.max("date_key").alias("hi"),
    ).first()
    assert m["n_null_customer_key"] == direct["nullc"]
    assert m["n_fallback_location"] == direct["fb_loc"]
    assert m["n_fallback_product"] == direct["fb_prod"]
    assert m["total_revenue"] == direct["rev"]
    assert (m["min_date_key"], m["max_date_key"]) == (direct["lo"], direct["hi"])

    # the audit catches real fallbacks in this data (lineitems whose part
    # lookup fell through to key 1, `load:480` semantics)
    assert m["n_fallback_product"] > 0

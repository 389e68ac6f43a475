"""The reference ETL's exact transform semantics, as reusable operators.

Single source of truth for behaviors the reference implements
procedurally and our engine must reproduce bit-for-bit (SURVEY §2,
FIXTURES.md §C). Used by both the batch star build (etl/star.py) and the
incremental streaming load (streaming/incremental.py); unit-tested on
tiny literal fixtures in tests/test_reference_semantics.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MUSIC_ID_OFFSET = 10000  # cross-source key-space fix, ` loadAnalyticsDB...R`:256,337,442-443


def standardize_country(c: Column) -> Column:
    """'USA' -> 'United States' (CASE WHEN rewrite,
    ` loadAnalyticsDB...R`:159-163,242-246,420-423)."""
    return F.when(c == "USA", F.lit("United States")).otherwise(c)


def offset_music_id(c: Column) -> Column:
    """+10000 on music-source customer/product IDs so the two key spaces
    cannot collide (` loadAnalyticsDB...R`:256; README.md:56)."""
    return c + F.lit(MUSIC_ID_OFFSET)


def truncate_name(c: Column, max_len: int = 255) -> Column:
    """Product-name truncation (substr 1..255, ` loadAnalyticsDB...R`:358)."""
    return F.substring(c, 1, max_len)


def resolve_fact_keys(
    base: DataFrame, dc: DataFrame, dl: DataFrame, dp: DataFrame
) -> DataFrame:
    """Dimension-key resolution with the reference's exact NULL semantics
    (` loadAnalyticsDB...R`:469-480) — its per-row which() linear scans
    become three broadcast hash joins:

    - customer: equi-match on (customer_id, type='film'); unmatched ->
      NULL customer_key (`load:476`)
    - location: NULL-tolerant match where the DIMENSION side carries the
      wildcard (dl.city = f.city OR dl.city IS NULL; same for state —
      note the asymmetry: a NULL on the fact side does NOT wildcard);
      unmatched -> fallback key 1 (`load:472`)
    - product: equi-match on product_id; unmatched -> fallback key 1
      (`load:480`)

    ``base`` must be aliased "f" with columns customer_id/product_id (+
    any measures); dims must carry their star-schema column names.
    """
    return (
        base.join(
            F.broadcast(dc),
            (F.col("f.customer_id") == F.col("dc.customer_id"))
            & (F.col("dc.customer_type") == "film"),
            "left",
        )
        .join(
            F.broadcast(dl),
            (F.col("dl.country") == F.col("dc.country"))
            & ((F.col("dl.city") == F.col("dc.city")) | F.col("dl.city").isNull())
            & ((F.col("dl.state") == F.col("dc.state")) | F.col("dl.state").isNull()),
            "left",
        )
        .join(F.broadcast(dp), F.col("f.product_id") == F.col("dp.product_id"), "left")
    )


def fact_key_columns() -> list[Column]:
    """The resolved key projection shared by batch and incremental loads."""
    return [
        F.col("dc.customer_key").alias("customer_key"),
        F.coalesce(F.col("dl.location_key"), F.lit(1)).alias("location_key"),
        F.coalesce(F.col("dp.product_key"), F.lit(1)).alias("product_key"),
    ]

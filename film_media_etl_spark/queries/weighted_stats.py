"""Weighted order statistics and bitmap-encoded activity.

Weighted median answers 'what price point splits the UNITS in half'
(each line weighted by quantity) — the volume-centric center retailers
want where the unweighted median over-represents small orders. The
activity bitmap packs a user's active-day set into one int64 via
bit_or, the bitmap-index trick that makes retention set-algebra
(AND/OR/popcount across cohorts) a constant-space aggregate at 100 TB
instead of a COUNT DISTINCT shuffle per question.

Exactness: the weighted median avoids division entirely — the defining
inequality 2·cumweight >= totalweight is integer arithmetic, and the
selected PRICE is invariant to tie order inside the cumulative window;
bitmaps are exact int64 ops (masks via pow(2, k), exact for any k
because powers of two are exactly representable doubles; k is capped
below 62 for the signed-int64 range).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


@register(
    "ext_weighted_median",
    oracle="""
    WITH it AS (
      SELECT p.p_brand,
             CAST(l.l_extendedprice AS DECIMAL(18,2)) AS price,
             CAST(l.l_quantity AS BIGINT) AS w
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    ),
    c AS (
      SELECT p_brand, price, w,
             SUM(w) OVER (PARTITION BY p_brand ORDER BY price ASC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cumw,
             SUM(w) OVER (PARTITION BY p_brand) AS total_w
      FROM it
    )
    SELECT p_brand,
           COUNT(*) AS n_lines,
           CAST(MIN(total_w) AS BIGINT) AS total_units,
           MIN(CASE WHEN 2 * cumw >= total_w THEN price END)
             AS weighted_median_price
    FROM c GROUP BY p_brand
    """,
)
def ext_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price per brand: the smallest price p
    such that lines priced <= p carry at least half the units. Computed
    with the threshold inequality 2·cumw >= W — no division, no
    interpolation, pure integers — so the answer is deterministic even
    with tied prices (cumulative order among ties can vary, but the
    minimal PRICE satisfying the threshold cannot). Two window passes
    share the brand partition (one exchange): the ordered cumulative
    weight and the unordered partition total; the final aggregate picks
    the threshold row per brand."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    it = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).select(
        "p_brand",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        F.col("l_quantity").cast("long").alias("w"),
    )
    part = Window.partitionBy("p_brand")
    cum = part.orderBy(F.asc("price")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = it.select(
        "p_brand",
        "price",
        "w",
        F.sum("w").over(cum).alias("cumw"),
        F.sum("w").over(part).alias("total_w"),
    )
    return c.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("total_w").cast("long").alias("total_units"),
        F.min(
            F.when(F.lit(2) * F.col("cumw") >= F.col("total_w"), F.col("price"))
        ).alias("weighted_median_price"),
    )


@register(
    "ext_activity_bitmap",
    oracle="""
    WITH base AS (
      SELECT CAST(MIN(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS DATE) AS d0
      FROM events
    ),
    offs AS (
      SELECT e.user_id,
             date_diff('day', b.d0, CAST(CAST(e.ts AS TIMESTAMP) AS DATE))
               AS off
      FROM events e CROSS JOIN base b
    )
    SELECT user_id,
           CAST(bit_or(CAST(pow(2, off) AS BIGINT)) AS BIGINT) AS day_bitmap,
           CAST(bit_count(bit_or(CAST(pow(2, off) AS BIGINT))) AS INT)
             AS active_days,
           CAST(COUNT(DISTINCT off) AS BIGINT) AS distinct_days
    FROM offs
    WHERE off BETWEEN 0 AND 61
    GROUP BY user_id
    """,
)
def ext_activity_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity bitmap over the first 62 days of the corpus:
    each active day sets one bit of an int64 (bit_or aggregate), and
    popcount (bit_count) reads back the active-day total — matching the
    exact COUNT DISTINCT carried alongside as its own witness. The
    bitmap is the scale story: retention set algebra (cohort AND/OR,
    churn = bitmap of week N AND NOT week N+1) becomes 8 bytes of
    mergeable state per user — map-side combinable, constant space —
    where COUNT DISTINCT re-shuffles per question. Masks come from
    pow(2, off): powers of two are exactly representable doubles, so
    the BIGINT cast is exact for every offset in range."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.agg(F.min(F.to_date("ts")).alias("d0"))
    offs = ev.crossJoin(F.broadcast(base)).select(
        "user_id", F.datediff(F.to_date("ts"), F.col("d0")).alias("off")
    )
    mask = F.pow(F.lit(2), F.col("off")).cast("long")
    return (
        offs.where((F.col("off") >= 0) & (F.col("off") <= 61))
        .groupBy("user_id")
        .agg(
            F.bit_or(mask).cast("long").alias("day_bitmap"),
            F.bit_count(F.bit_or(mask)).cast("int").alias("active_days"),
            F.countDistinct("off").cast("long").alias("distinct_days"),
        )
    )

"""Ranking / offset window functions, semi- and anti-joins, lateral
explode, and HAVING — the analytic-SQL surface the reference never uses
but a complete engine must expose (SURVEY §2.E notes the reference has no
ranking windows and §2.C notes no anti-join; both are promised as engine
extensions).

Scale notes: every window here partitions on a real key (priority,
customer) so the sort is per-partition after one hash exchange — no
global Exchange SinglePartition anywhere. Semi/anti joins ship only the
join key of the probe side (Catalyst prunes the rest) and broadcast when
the build side is small; at 100 TB both stay shuffle-free on the fact
side when the key set fits in a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.money import money_sum
from ..sources import load_table
from .registry import register


@register(
    "ext_window_ranking",
    oracle="""
    WITH ranked AS (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn,
             RANK()       OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC) AS rnk,
             DENSE_RANK() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC) AS drnk
      FROM orders
    )
    SELECT o_orderpriority, o_orderkey, o_totalprice,
           CAST(rn AS INT) AS rn, CAST(rnk AS INT) AS rnk,
           CAST(drnk AS INT) AS drnk
    FROM ranked WHERE rn <= 3
    """,
)
def ext_window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking windows (row_number / rank / dense_rank): top-3 orders by
    price within each order priority. row_number gets a full tiebreak
    (price, key) so it is deterministic; rank/dense_rank order by price
    alone so tie semantics are actually exercised. One hash exchange on
    o_orderpriority, per-partition sort — no global sort."""
    orders = load_table(spark, sf_dir, "orders")
    w_rn = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_ties = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"))
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w_rn).alias("rn"),
            F.rank().over(w_ties).alias("rnk"),
            F.dense_rank().over(w_ties).alias("drnk"),
        )
        .where(F.col("rn") <= 3)
    )


@register(
    "ext_window_leadlag",
    oracle="""
    SELECT o_custkey, o_orderkey,
           o_totalprice,
           COALESCE(LAG(o_totalprice)  OVER w, -1.0) AS prev_price,
           COALESCE(LEAD(o_totalprice) OVER w, -1.0) AS next_price,
           COALESCE(o_totalprice - LAG(o_totalprice) OVER w, 0.0)
             AS delta_vs_prev,
           CAST(NTILE(4) OVER w AS INT) AS spend_quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def ext_window_leadlag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset windows (lag / lead) + ntile over each customer's order
    history in date order. delta_vs_prev is a single double subtraction of
    two exact inputs — deterministic across engines. The frame ordering
    carries a full (date, key) tiebreak so lag/lead/ntile are all
    reproducible under any physical row order. Partition-edge offsets
    carry sentinels (-1.0 price / 0.0 delta) instead of NULL doubles
    (NaN-vs-None at the driver boundary, queries/registry.py); prices
    are strictly positive so -1.0 is unambiguous."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.coalesce(F.lag("o_totalprice").over(w), F.lit(-1.0)).alias("prev_price"),
        F.coalesce(F.lead("o_totalprice").over(w), F.lit(-1.0)).alias("next_price"),
        F.coalesce(
            F.col("o_totalprice") - F.lag("o_totalprice").over(w), F.lit(0.0)
        ).alias("delta_vs_prev"),
        F.ntile(4).over(w).alias("spend_quartile"),
    )


@register(
    "ext_semi_anti_join",
    oracle="""
    WITH flags AS (
      SELECT c.c_nationkey,
             CASE WHEN EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_custkey = c.c_custkey)
                  THEN 1 ELSE 0 END AS has_orders
      FROM customer c
    )
    SELECT n.n_name,
           CAST(SUM(has_orders) AS BIGINT) AS with_orders,
           CAST(SUM(1 - has_orders) AS BIGINT) AS without_orders
    FROM flags JOIN nation n ON n.n_nationkey = flags.c_nationkey
    GROUP BY n.n_name
    """,
)
def ext_semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi- and anti-join (EXISTS / NOT EXISTS): per nation, customers
    that do vs don't have orders. left_semi/left_anti ship no payload from
    the probe side and never duplicate rows the way an inner join against
    a non-deduped key column would. Catalyst prunes orders to the single
    o_custkey column before the join."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    nation = load_table(spark, sf_dir, "nation")
    cond = customer["c_custkey"] == orders["o_custkey"]
    semi = (
        customer.join(orders, cond, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("with_orders"))
    )
    anti = (
        customer.join(orders, cond, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("without_orders"))
    )
    return (
        nation.join(semi, nation["n_nationkey"] == semi["c_nationkey"], "left")
        .drop("c_nationkey")
        .join(anti, nation["n_nationkey"] == anti["c_nationkey"], "left")
        .select(
            "n_name",
            F.coalesce("with_orders", F.lit(0)).alias("with_orders"),
            F.coalesce("without_orders", F.lit(0)).alias("without_orders"),
        )
    )


@register(
    "ext_explode_tokens",
    oracle="""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS toks
      FROM documents WHERE doc_id < 20
    )
    SELECT doc_id,
           CAST(unnest(range(len(toks))) AS INT) AS pos,
           unnest(toks) AS token
    FROM tok
    """,
)
def ext_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral explode with ordinality (posexplode): one row per token
    with its position, for the first 20 documents. Row-expanding generate
    runs inside whole-stage codegen — no shuffle, no Python."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 20)
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token"),
    )


@register(
    "ext_having",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(38,4))
             AS total_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    HAVING COUNT(*) >= 100
    """,
)
def ext_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING (post-aggregation filter; absent from the
    reference surface, SURVEY §2.D). In Spark a filter on an aggregate
    alias after .agg() — Catalyst keeps it above the final aggregate, the
    partial aggregate still combines map-side."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(nation, customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            money_sum(F.col("o_totalprice"), "total_revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .where(F.col("n_orders") >= 100)
    )

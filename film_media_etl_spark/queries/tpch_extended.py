"""The rest of the TPC-H query suite, adapted to the driver's reduced
TPC-H-ish schema (no partsupp table, no commit/receipt dates, no
shipmode/container columns — each adaptation keeps the query's CLASS
intact and is documented per query).

Together with tpch_classics (Q1/Q3/Q5/Q7/Q10/Q18) this completes ALL
22 query families the reference's BI workload never exercises
(BusinessAnalysis...Rmd stops at grouped sums + pivots, rmd:90-165):
argmin-by-join min-cost supplier (Q2), EXISTS / NOT EXISTS
decorrelation (Q4, Q21), correlated scalar subqueries (Q15, Q17, Q22),
NOT IN anti-joins (Q16), scalar-vs-total HAVING (Q11), disjunctive
multi-conjunct pushdown (Q19), conditional ratio aggregates (Q8, Q12,
Q14), and a left-join histogram (Q13).

Scale notes common to all: dimension sides (part 2k rows, supplier 100,
customer 1.5k, nation/region tiny) broadcast — lineitem/orders never
shuffle for a dim lookup; correlated subqueries are decorrelated into
per-key aggregates joined back (one shuffle each, never a per-row
re-scan); every oracle-compared SUM is an exact fixed-scale DECIMAL so
parallel accumulation order can't drift (functions/money.py rules);
ratios divide two decimal sums cast to double (scaled ints < 2^53 at
oracle sf, so the casts are exact in both engines) and round to 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register

# row-level exact-decimal spellings shared by Spark and oracle sides
_EXT = "CAST(l_extendedprice AS DECIMAL(18,2))"
_QTY = "CAST(l_quantity AS DECIMAL(18,2))"
_ONE_MINUS_DISC = "CAST(1.0 - CAST(l_discount AS DECIMAL(9,4)) AS DECIMAL(9,4))"
_DISC_PRICE = f"CAST({_EXT} * {_ONE_MINUS_DISC} AS DECIMAL(18,6))"


@register(
    "ext_tpch_q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o.o_orderpriority
    """,
)
def ext_tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking, adapted: the testdata has no
    commit/receipt dates, so "late" is a lineitem shipped >30 days after
    the order date. The correlated EXISTS decorrelates to a LEFT SEMI
    join on orderkey with the non-equi lateness predicate as a join
    residual — orders shrink to one quarter BEFORE the shuffle, and the
    semi join emits each order at most once (no post-join dedup), so
    shuffle traffic is the filtered quarter, not the full year."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "ext_tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(SUM(CAST({_EXT} * CAST(l_discount AS DECIMAL(9,4))
                         AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
)
def ext_tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast revenue change: the purest scan-shape in the
    suite — three conjunctive range predicates and one global sum, no
    join, no group. All three predicates push to the parquet scan
    (PushedFilters row-group skipping on shipdate min/max); only the 4
    referenced columns are read; partial sums collapse map-side to one
    row per partition, so the "shuffle" is #partitions rows. The measure
    ext*discount carries exact scale 6 like every money sum."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    rev = F.expr(f"CAST({_EXT} * CAST(l_discount AS DECIMAL(9,4)) AS DECIMAL(18,6))")
    return li.agg(F.sum(rev).cast("decimal(38,6)").alias("revenue"))


@register(
    "ext_tpch_q12_late_lines",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def ext_tpch_q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping-mode priority audit, adapted: no l_shipmode
    column, so lines group by l_returnflag, and "late" is shipped >60
    days after order date (no commit/receipt dates). The shape is the
    point: a fact-fact equi-join with a non-equi residual, then
    conditional counts — the CASE/IN pair evaluates once per joined row
    inside one hash aggregate (no second pass per priority class). The
    year filter prunes lineitem at the scan; orders carries only the
    two columns the residual and CASE need."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).where(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy("l_returnflag").agg(
        F.sum(F.when(is_high, 1).otherwise(0)).cast("long").alias("high_line_count"),
        F.sum(F.when(is_high, 0).otherwise(1)).cast("long").alias("low_line_count"),
    )


@register(
    "ext_tpch_q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                            AND o.o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY c.c_custkey) c_orders
    GROUP BY c_count
    """,
)
def ext_tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution: how many customers
    placed 0, 1, 2, ... qualifying orders (the priority filter stands in
    for the reference query's comment NOT LIKE). The LEFT join keeps
    order-less customers — COUNT(o_orderkey) counts only matched rows,
    so they land in the c_count=0 bucket instead of vanishing (an INNER
    join here is the classic silent-wrong-answer). Two aggregations:
    per-customer (shuffles by custkey) then a near-free regroup on the
    tiny distinct-count domain."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "ext_tpch_q14_promo_revenue",
    oracle=f"""
    SELECT ROUND(100.0
             * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_DISC_PRICE}
                             ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM({_DISC_PRICE}) AS DOUBLE), 6) AS promo_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-06-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-07-01 00:00:00'
    """,
)
def ext_tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: PROMO-typed parts' share of one
    month's discounted revenue, as a percentage. The part dimension
    (2k rows, two columns after pruning) broadcasts — the month of
    lineitem never shuffles; both the conditional and unconditional sums
    come out of ONE aggregate pass. The ratio divides two exact decimal
    sums cast to double (exact casts at oracle scale) and rounds to 6dp,
    inside the cross-engine-safe regime (a quotient of large sums never
    terminates on a half at 6dp)."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1998-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp"))
    )
    disc = F.expr(_DISC_PRICE)
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.sum(promo).alias("promo_sum"),
            F.sum(disc).alias("all_sum"),
        )
        .select(
            F.round(
                F.lit(100.0)
                * F.col("promo_sum").cast("double")
                / F.col("all_sum").cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


@register(
    "ext_tpch_q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM({_DISC_PRICE}) AS DECIMAL(38,6)) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def ext_tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue under a 3-way DISJUNCTION of
    brand/size/quantity conjuncts (container and shipping clauses don't
    exist in this schema and are dropped). The optimizer test is
    disjunctive predicate handling: Catalyst extracts the common
    implied constraints — p_brand IN (…) and p_size/l_quantity range
    hulls — and pushes them to each scan, so part shrinks to 3 brands
    and lineitem to qty<=30 BEFORE the broadcast join; the full OR
    evaluates only on the residual rows."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & (F.col("l_quantity") >= 1)
            & (F.col("l_quantity") <= 11)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 25)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 35)
            & (F.col("l_quantity") >= 20)
            & (F.col("l_quantity") <= 30)
        )
    )
    return j.where(clause).agg(
        F.sum(F.expr(_DISC_PRICE)).cast("decimal(38,6)").alias("revenue")
    )


@register(
    "ext_tpch_q8_market_share",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           ROUND(CAST(SUM(CASE WHEN ns.n_name = 'NATION_7' THEN {_DISC_PRICE}
                               ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 / CAST(SUM({_DISC_PRICE}) AS DOUBLE), 6) AS mkt_share
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    JOIN region r   ON nc.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_type = 'STANDARD'
    GROUP BY o_year
    """,
)
def ext_tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: NATION_7's share of STANDARD-part
    revenue sold into ASIA-region customers, per year (the testdata has
    no order-date subrange requirement; all years report). An 8-table
    snowflake where every non-fact side broadcasts — nation joins TWICE
    under different roles (customer's region membership vs supplier's
    identity), the classic alias-disambiguation shape. The selective
    dims (region='ASIA', p_type filter) semi-reduce lineitem via
    broadcast hash joins before any shuffle; numerator and denominator
    share one aggregate pass."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nc = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    ns = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD").select(
        "p_partkey"
    )
    disc = F.expr(_DISC_PRICE)
    base = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("sn_key"))
    )
    nation_rev = F.when(F.col("supp_nation") == "NATION_7", disc).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        base.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(nation_rev).alias("num"), F.sum(disc).alias("den"))
        .select(
            "o_year",
            F.round(
                F.col("num").cast("double") / F.col("den").cast("double"), 6
            ).alias("mkt_share"),
        )
    )


@register(
    "ext_tpch_q9_product_profit",
    oracle=f"""
    SELECT ns.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(CAST({_DISC_PRICE} AS DECIMAL(19,6))
                         - CAST(CAST(CAST(CAST(p.p_retailprice AS DECIMAL(18,1))
                                          * {_QTY} AS DECIMAL(18,3))
                                     * CAST(0.6 AS DECIMAL(2,1)) AS DECIMAL(18,4))
                            AS DECIMAL(19,6))
                    AS DECIMAL(20,6))) AS DECIMAL(38,6)) AS sum_profit
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey AND p.p_name LIKE '%widget%'
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns  ON ns.n_nationkey = s.s_nationkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    GROUP BY nation, o_year
    """,
)
def ext_tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit, adapted: no partsupp table means no
    ps_supplycost, so unit cost is proxied as 60% of p_retailprice —
    profit = disc_price - 0.6*retail*qty, for parts named like
    '%widget%', grouped by supplier nation x order year. The LIKE
    filter prunes part before its broadcast; supplier/nation broadcast;
    only orders (for the year) joins by shuffle alongside lineitem.
    The profit expression is an exact fixed-scale decimal chain
    (retail 1dp x qty 2dp -> 3dp, x0.6 -> 4dp, minus 6dp revenue ->
    scale-6), with every intermediate cast spelled identically in both
    engines so int64/int128 promotion points line up."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = F.expr(
        f"""CAST(CAST({_DISC_PRICE} AS DECIMAL(19,6))
                 - CAST(CAST(CAST(CAST(p_retailprice AS DECIMAL(18,1))
                                  * {_QTY} AS DECIMAL(18,3))
                             * CAST(0.6 AS DECIMAL(2,1)) AS DECIMAL(18,4))
                    AS DECIMAL(19,6))
            AS DECIMAL(20,6))"""
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(amount).cast("decimal(38,6)").alias("sum_profit"))
    )


@register(
    "ext_tpch_q11_important_parts",
    oracle=f"""
    WITH natqty AS (
      SELECT l.l_partkey, CAST(SUM({_QTY}) AS DECIMAL(38,2)) AS part_qty
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name IN ('NATION_3', 'NATION_8')
      GROUP BY l.l_partkey)
    SELECT l_partkey, part_qty
    FROM natqty
    WHERE part_qty * 700 > (SELECT SUM(part_qty) FROM natqty)
    """,
)
def ext_tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock, adapted: no partsupp, so "stock value"
    is the quantity shipped per part by suppliers of two nations, and a
    part is important if it holds >1/700 of that total. The
    scalar-vs-total HAVING decorrelates WITHOUT a second scan: the
    per-part aggregate computes once, the grand total is a one-row
    re-aggregate of those ~2k group rows broadcast back as a cross
    join — the fact table is read exactly once. The threshold compares
    decimals exactly (part_qty*400 stays integer-scaled), so no
    boundary row can flip between engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_3", "NATION_8")
    )
    per_part = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(F.expr(_QTY)).cast("decimal(38,2)").alias("part_qty"))
    )
    total = per_part.agg(F.sum("part_qty").alias("total_qty"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("part_qty") * 700 > F.col("total_qty"))
        .select("l_partkey", "part_qty")
    )


@register(
    "ext_tpch_q15_top_supplier",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, CAST(SUM({_DISC_PRICE}) AS DECIMAL(38,6)) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '2000-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def ext_tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier: the supplier(s) with maximum revenue in
    one quarter — the scalar-MAX-subquery shape (a view referenced
    twice in the reference query). The per-supplier revenue aggregate
    computes ONCE; its one-row MAX re-aggregates the ~100 group rows
    and broadcasts back (no second lineitem scan, no window over a
    single partition). Revenue equality compares exact decimals, so
    "equals the max" is deterministic — the reason TPC-H itself demands
    a decimal type here. Supplier (100 rows) broadcasts for the final
    name lookup."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.expr(_DISC_PRICE)).cast("decimal(38,6)").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "ext_tpch_q16_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type <> 'ECONOMY'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    """,
)
def ext_tpch_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship, adapted: how many distinct
    suppliers can ship each qualifying (brand, size) combination,
    excluding suppliers on a deny list — negative account balance stands
    in for the reference's 'Customer Complaints' comment scan, and
    lineitem supplies the part-supplier relation in place of partsupp.
    The NOT IN compiles to a broadcast LEFT ANTI join (s_suppkey is
    non-null so NOT IN's three-valued-logic trap can't bite); the
    part predicates prune 2k rows to a few hundred before broadcast.
    COUNT(DISTINCT) stays exact per the engine's op22 convention."""
    p = (
        load_table(spark, sf_dir, "part")
        .where(
            (F.col("p_brand") != "Brand#13")
            & (F.col("p_type") != "ECONOMY")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    deny = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(deny), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "ext_tpch_q17_small_quantity",
    oracle=f"""
    SELECT ROUND(CAST(SUM({_EXT}) AS DOUBLE) / 7.0, 2) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12'
      AND l.l_quantity < 0.2 *
          (SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  / COUNT(*)
           FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
    """,
)
def ext_tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: average yearly revenue
    lost if orders below 20% of a part's average quantity stopped (the
    /7.0 is the reference query's own year-count constant). The
    correlated per-part AVG decorrelates into ONE per-partkey aggregate
    joined back to the brand's lines — the naive plan re-scans lineitem
    per row; this one reads it twice total (once for the avg, once for
    the probe), and the avg side aggregates BEFORE the join so the
    shuffle carries 2k group rows, broadcast to the probe. The average
    divides an exact decimal sum by the count in double — identical
    IEEE operands cross-engine, and quantities are whole numbers, so
    the 0.2*avg boundary can't flip."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#12").select(
        "p_partkey"
    )
    per_part = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (
            F.sum(F.expr(_QTY)).cast("double") / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    probe = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    return (
        probe.join(F.broadcast(per_part), F.col("ap_key") == F.col("l_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum(F.expr(_EXT)).cast("double") / 7.0, 2).alias("avg_yearly")
        )
    )


@register(
    "ext_tpch_q20_excess_shippers",
    oracle=f"""
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_regionkey = 2
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        WHERE l.l_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND l.l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '2000-01-01 00:00:00'
        GROUP BY l.l_suppkey, l.l_partkey
        HAVING SUM({_QTY}) > 40)
    """,
)
def ext_tpch_q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion, adapted: ASIA-region
    suppliers who shipped >40 units of some red-named part in 1999
    (the reference compares against 50% of partsupp availability;
    with no partsupp, a fixed overstock threshold keeps the nested
    IN-chain shape). Three-level decorrelation, all semi-joins: parts
    filtered by LIKE broadcast into lineitem, the (supp, part) rollup
    applies the HAVING, its distinct suppkeys semi-join supplier —
    each IN becomes a LEFT SEMI with aggregation BELOW the join, so
    no step materializes more than group-count rows. Output carries
    s_acctbal (a parquet double passed through untouched — exact)."""
    redparts = load_table(spark, sf_dir, "part").where(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(redparts), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.expr(_QTY)).alias("qty"))
        .where(F.col("qty") > 40)
        .select("l_suppkey")
        .distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_regionkey") == 2)
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )


@register(
    "ext_tpch_q21_waiting_orders",
    oracle="""
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
)
def ext_tpch_q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting — the suite's
    decorrelation final boss: an EXISTS and a NOT EXISTS both
    correlated to the same outer row, over the same fact table
    ("another supplier contributed to the order" / "no other supplier
    was also late"; late = shipped >60 days after order date, standing
    in for receipt>commit). Instead of three lineitem scans + two
    correlated probes, both quantifiers collapse into ONE per-order
    aggregate over the F-order lines — n_suppliers = COUNT(DISTINCT
    suppkey), n_late_suppliers = COUNT(DISTINCT CASE WHEN late) — and
    the predicates become n_suppliers >= 2 AND n_late_suppliers = 1
    on the joined row (l1 itself is late, so the sole late supplier IS
    l1's). One extra shuffle by orderkey replaces both subqueries; the
    count still tallies every late LINE, matching EXISTS semantics."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    lo = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
    )
    per_order = lo.groupBy(F.col("l_orderkey").alias("agg_okey")).agg(
        F.count_distinct("l_suppkey").alias("n_suppliers"),
        F.count_distinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_suppliers"),
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    waiting = (
        lo.where(F.col("is_late"))
        .join(per_order, F.col("agg_okey") == F.col("l_orderkey"))
        .where((F.col("n_suppliers") >= 2) & (F.col("n_late_suppliers") == 1))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
    )
    return (
        waiting.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


@register(
    "ext_tpch_q22_dormant_customers",
    oracle="""
    WITH pool AS (
      SELECT c.c_custkey, c.c_nationkey,
             CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer c WHERE c.c_nationkey IN (1, 5, 9, 13, 17)),
    cutoff AS (
      SELECT CAST(SUM(bal) AS DOUBLE) / COUNT(*) AS avg_bal
      FROM pool WHERE bal > 0)
    SELECT n.n_name AS nation, CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(p.bal) AS DECIMAL(38,2)) AS totacctbal
    FROM pool p
    JOIN nation n ON p.c_nationkey = n.n_nationkey
    WHERE CAST(p.bal AS DOUBLE) > (SELECT avg_bal FROM cutoff)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = p.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY n.n_name
    """,
)
def ext_tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity: well-funded customers gone
    dormant — no order since 2000 — by nation (nation membership stands
    in for the reference's phone-prefix country codes, which this
    schema lacks; every synthetic customer has SOME order, so dormancy
    is recency-based).
    Two decorrelations in one query: the scalar AVG-of-positive-
    balances broadcasts as a one-row cross join (the customer pool is
    scanned once and reused for both the cutoff and the probe), and
    NOT EXISTS(orders) becomes a LEFT ANTI join on custkey — at scale
    the anti join shuffles only custkeys, never order payloads. The
    balance threshold compares doubles built from identical exact
    operands in both engines, and the reported totals stay decimal."""
    pool = load_table(spark, sf_dir, "customer").where(
        F.col("c_nationkey").isin(1, 5, 9, 13, 17)
    ).select(
        "c_custkey",
        "c_nationkey",
        F.col("c_acctbal").cast("decimal(18,2)").alias("bal"),
    )
    cutoff = pool.where(F.col("bal") > 0).agg(
        (F.sum("bal").cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        pool.join(F.broadcast(cutoff))
        .where(F.col("bal").cast("double") > F.col("avg_bal"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("bal").cast("decimal(38,2)").alias("totacctbal"),
        )
    )


@register(
    "ext_tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH supply AS (
      SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
             CAST(MIN({_EXT}) AS DECIMAL(18,2)) AS supplycost
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
      GROUP BY 1, 2
    ),
    min_cost AS (
      SELECT partkey, MIN(supplycost) AS min_cost FROM supply GROUP BY partkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name AS nation, p.p_partkey,
           p.p_type, sp.supplycost
    FROM supply sp
    JOIN min_cost mc ON sp.partkey = mc.partkey AND sp.supplycost = mc.min_cost
    JOIN part p      ON sp.partkey = p.p_partkey
    JOIN supplier s  ON sp.suppkey = s.s_suppkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    WHERE p.p_size <= 15 AND p.p_type IN ('LARGE', 'SMALL')
    """,
)
def ext_tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier, adapted: with no partsupp table,
    the supply relation is derived from lineitem — a (part, supplier)
    pair supplies at MIN(l_extendedprice) (exact decimal; a unit-price
    division would drift between engines). For small-size LARGE/SMALL-class parts, emit
    every European supplier achieving the per-part minimum cost (ties
    all qualify, as in the original).

    The correlated MIN subquery decorrelates to a per-part aggregate of
    the supply relation joined back on (part, cost=min) — the classic
    argmin-by-join; the supply relation itself is one lineitem shuffle
    on (part, supplier) with all dimension lookups (supplier 100 rows,
    nation/region tiny, filtered part) riding broadcast, so the fact
    scans once and never shuffles for a lookup. At 100 TB the supply
    agg gets map-side combine and the min-cost re-agg runs over the
    already-collapsed (part, supplier) rows — both AQE-coalesced."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    euro_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    supply = (
        li.join(F.broadcast(euro_supp.select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey"))
        .agg(F.min(F.expr(_EXT)).cast("decimal(18,2)").alias("supplycost"))
    )
    min_cost = supply.groupBy("partkey").agg(F.min("supplycost").alias("min_cost"))
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") <= 15) & F.col("p_type").isin("LARGE", "SMALL")
    )
    return (
        supply.join(
            min_cost,
            (supply.partkey == min_cost.partkey)
            & (supply.supplycost == min_cost.min_cost),
        )
        .drop(min_cost.partkey)
        .join(F.broadcast(p), F.col("partkey") == p.p_partkey)
        .join(F.broadcast(euro_supp), F.col("suppkey") == F.col("s_suppkey"))
        .select("s_acctbal", "s_name", "nation", "p_partkey", "p_type", "supplycost")
    )

"""Advanced SQL-analytics surface: correlated subqueries, gaps-and-islands,
argmax-per-group, deterministic mode, time-range window frames,
first/last-value frames, cross-join grids, and dynamic pivot.

The reference's analytic layer is driver-side R over a handful of SQL
shapes (SURVEY §2.D-F lists what it lacks: no EXISTS, no argmax, no
RANGE frames, no dynamic pivot — its year columns are hand-built in R,
BusinessAnalysis...Rmd:269-296). These queries re-express those gaps as
engine-native operators so a user migrating from the reference's R
post-processing gets pushed-down distributed plans instead.

Determinism conventions (same as analytic_stats):
- every argmax/mode carries a total-order tiebreak so both engines pick
  the same winner;
- any oracle-compared SUM over doubles goes through decimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import register


# ---------------------------------------------------------------------------
# Correlated subqueries (EXISTS / NOT EXISTS)
# ---------------------------------------------------------------------------


@register(
    "ext_exists_subquery",
    oracle="""
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08
          )
      AND NOT EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
          )
    """,
)
def ext_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS in one query: orders containing at
    least one deep-discount line and no returned lines. Catalyst
    decorrelates both predicates into a left-semi and a left-anti hash
    join on l_orderkey — the scale path for 100 TB is two shuffles on the
    join key, never a per-row subquery execution (which is what the
    reference's R which() loops amount to,  loadAnalyticsDB...R:469-480)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
        FROM v_orders o
        WHERE EXISTS (
                SELECT 1 FROM v_lineitem l
                WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08
              )
          AND NOT EXISTS (
                SELECT 1 FROM v_lineitem l
                WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
              )
        """
    )


# ---------------------------------------------------------------------------
# Gaps and islands
# ---------------------------------------------------------------------------


@register(
    "ext_gaps_islands",
    oracle="""
    WITH d AS (
      SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS od FROM orders
    ), marked AS (
      SELECT o_custkey, od,
             od - CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY od)
                       AS INTEGER) AS grp
      FROM d
    ), islands AS (
      SELECT o_custkey, MIN(od) AS island_start, MAX(od) AS island_end,
             COUNT(*) AS island_days
      FROM marked GROUP BY o_custkey, grp
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(MAX(island_days) AS BIGINT) AS longest_streak,
           MIN(island_start) AS first_day,
           MAX(island_end) AS last_day
    FROM islands GROUP BY o_custkey
    HAVING MAX(island_days) >= 2
    """,
)
def ext_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: runs of consecutive order days per customer via
    the date-minus-row_number grouping trick, then per-customer streak
    stats. Two shuffles (distinct, then the o_custkey window) — the window
    partitions by customer so no global sort appears; at 100 TB the
    distinct pre-shrinks the window input to one row per (cust, day)."""
    o = load_table(spark, sf_dir, "orders")
    d = o.select("o_custkey", F.to_date("o_orderdate").alias("od")).distinct()
    w = Window.partitionBy("o_custkey").orderBy("od")
    marked = d.withColumn(
        "grp", F.date_sub(F.col("od"), F.row_number().over(w))
    )
    islands = marked.groupBy("o_custkey", "grp").agg(
        F.min("od").alias("island_start"),
        F.max("od").alias("island_end"),
        F.count(F.lit(1)).alias("island_days"),
    )
    return (
        islands.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.max("island_days").alias("longest_streak"),
            F.min("island_start").alias("first_day"),
            F.max("island_end").alias("last_day"),
        )
        .where(F.col("longest_streak") >= 2)
    )


# ---------------------------------------------------------------------------
# Argmax per group (max_by / arg_max)
# ---------------------------------------------------------------------------

# Total-order pack: totalprice has 2 exact decimals and orderkey < 10^10,
# so  price*10^10 + orderkey  is an exact DECIMAL(38,2) that both engines
# compare identically — argmax ties on price break toward the larger key.
_PACK_SQL = "CAST(o_totalprice AS DECIMAL(18,2)) * 10000000000 + o_orderkey"


@register(
    "ext_argmax_group",
    oracle=f"""
    SELECT o_custkey,
           arg_max(o_orderkey, {_PACK_SQL}) AS best_orderkey,
           arg_max(o_totalprice, {_PACK_SQL}) AS best_totalprice,
           arg_max(CAST(o_orderdate AS DATE), {_PACK_SQL}) AS best_orderdate,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def ext_argmax_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax-per-group: each customer's highest-value order via max_by
    (DuckDB arg_max) over a decimal-packed (price, orderkey) total order —
    deterministic under ties without a ranking window. One hash aggregate,
    partial+final, no sort and no window exchange: at 100 TB this is the
    cheap way to answer 'top order per customer' (the reference instead
    re-sorts the whole result and LIMITs, BusinessAnalysis...Rmd:95-105)."""
    o = load_table(spark, sf_dir, "orders")
    pack = F.col("o_totalprice").cast("decimal(18,2)") * F.lit(
        10_000_000_000
    ) + F.col("o_orderkey")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", pack).alias("best_orderkey"),
        F.max_by("o_totalprice", pack).alias("best_totalprice"),
        F.max_by(F.to_date("o_orderdate"), pack).alias("best_orderdate"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Deterministic mode (most frequent value per group)
# ---------------------------------------------------------------------------


@register(
    "ext_mode_freq",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS cnt
      FROM events GROUP BY user_id, event_type
    ), r AS (
      SELECT user_id, event_type, cnt,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY cnt DESC, event_type ASC) AS rn
      FROM c
    )
    SELECT user_id, event_type AS mode_event, CAST(cnt AS BIGINT) AS mode_count
    FROM r WHERE rn = 1
    """,
)
def ext_mode_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: each user's most frequent event type, ties
    broken alphabetically (engine mode()/histogram aggs leave ties
    unspecified — unusable under an exact oracle). Count-then-rank is
    also the scale shape: the first aggregate collapses the data to one
    row per (user, type) before any window runs."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_event"),
            F.col("cnt").alias("mode_count"),
        )
    )


# ---------------------------------------------------------------------------
# Time-range window frames (RANGE BETWEEN over seconds)
# ---------------------------------------------------------------------------


@register(
    "ext_window_range_time",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             epoch(CAST(ts AS TIMESTAMP)) AS sec,
             CAST(value AS DECIMAL(18,3)) AS v
      FROM events WHERE user_id < 500
    )
    SELECT event_id, user_id, ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_prev_hour,
           CAST(SUM(v) OVER w AS DECIMAL(38,3)) AS sum_prev_hour
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
)
def ext_window_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling one-hour per-user window via a RANGE frame over epoch
    seconds — the value-based frame Spark executes without materializing
    per-row subqueries. RANGE (not ROWS) makes equal timestamps share a
    frame, so the result is order-independent under ties — the property
    that lets an exact oracle exist. One exchange on user_id; the decimal
    sum keeps the rolling total associativity-proof."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 500)
    e = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.unix_timestamp("ts").alias("sec"),
        F.col("value").cast("decimal(18,3)").alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_prev_hour"),
        F.sum("v").over(w).cast("decimal(38,3)").alias("sum_prev_hour"),
    )


# ---------------------------------------------------------------------------
# first_value / last_value with explicit frames
# ---------------------------------------------------------------------------


@register(
    "ext_first_last_window",
    oracle="""
    SELECT event_id, user_id,
           first_value(value) OVER w AS first_val,
           last_value(value)  OVER w AS last_val,
           nth_value(value, 2) OVER w AS second_val
    FROM events
    WHERE user_id < 200
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch(CAST(ts AS TIMESTAMP)), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def ext_first_last_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth value over an explicit full-partition frame. The
    UNBOUNDED FOLLOWING upper bound is the trap this query encodes: with
    the default frame last_value degenerates to the current row. The
    (ts, event_id) order is total, so all three picks are deterministic.
    Same single user_id exchange as any per-user window."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 200)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.first("value").over(w).alias("first_val"),
        F.last("value").over(w).alias("last_val"),
        F.nth_value("value", 2).over(w).alias("second_val"),
    )


# ---------------------------------------------------------------------------
# Cross-join grid (dense reporting axes)
# ---------------------------------------------------------------------------


@register(
    "ext_cross_join_grid",
    oracle="""
    WITH axes AS (
      SELECT r.r_name AS region, s.o_orderpriority AS priority
      FROM region r CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) s
    ), agg AS (
      SELECT r.r_name AS region, o.o_orderpriority AS priority,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2
    )
    SELECT a.region, a.priority, COALESCE(g.n_orders, 0) AS n_orders
    FROM axes a LEFT JOIN agg g
      ON a.region = g.region AND a.priority = g.priority
    """,
)
def ext_cross_join_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense reporting grid: region x priority axes built with an explicit
    CROSS JOIN, left-joined against the sparse aggregate so empty cells
    surface as zeros (the reference hand-fills missing matrix cells in R,
    BusinessAnalysis...Rmd:269-296). Both cross inputs are tiny aggregated
    sets, so the product is broadcastable; the fact-side aggregate runs
    first and collapses cardinality before any join."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    axes = r.select(F.col("r_name").alias("region")).crossJoin(
        o.select(F.col("o_orderpriority").alias("priority")).distinct()
    )
    agg = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return axes.join(agg, ["region", "priority"], "left").select(
        "region",
        "priority",
        F.coalesce(F.col("cnt"), F.lit(0)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Dynamic pivot (values discovered from data, two-phase)
# ---------------------------------------------------------------------------


@register(
    "ext_dynamic_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_F,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_O
    FROM lineitem GROUP BY l_returnflag
    """,
)
def ext_dynamic_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic pivot: the column set is DISCOVERED from the data (Spark's
    pivot() without a values list runs an internal distinct + collect —
    the two-phase plan SURVEY §7 flags for the reference's hand-built
    year matrices). Phase one is a tiny distinct on the pivot key; phase
    two is one hash aggregate with a conditional-count per discovered
    value. The oracle fixes the columns (L/O/F statuses are stable in
    TPC-H data at every SF) — the Spark side must converge to the same
    set. Column names are normalized to status_<v> to keep the
    sorted-by-name hash contract."""
    li = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag").pivot("l_linestatus").count().na.fill(0)
    )
    value_cols = sorted(c for c in pivoted.columns if c != "l_returnflag")
    return pivoted.select(
        "l_returnflag",
        *[F.col(c).alias(f"status_{c}") for c in value_cols],
    )

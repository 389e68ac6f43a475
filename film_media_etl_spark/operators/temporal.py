"""Temporal join operators Spark lacks as built-ins (SURVEY §2.C notes
the reference has none; these are engine extensions the brief's operator
family requires): as-of join and interval (range) join.

- ``asof_join``: for each left row, the latest right row with
  right.ts <= left.ts within the same key — implemented with the
  UNION + last_value window pattern, NOT a range join: tag both sides,
  union, one window per key ordered by (ts, side), carry the last
  non-null right value forward. One shuffle on the key, linear state,
  no pairwise blowup — this is the 100 TB formulation (a naive
  left-to-all-earlier-right join is quadratic per key). DuckDB has
  native ASOF JOIN, giving an exact oracle.

- ``interval_join``: pairs (l, r) with the same key and r.ts within
  [l.ts, l.ts + width]. Plans as an equi-join on the key with the range
  as a join filter — candidate volume is bounded by real temporal
  locality; AQE skew-splits hot keys. (A per-key time-bucket prefilter
  is the next lever if keys are long-lived; unnecessary here.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Attach to each left row the most recent right values at-or-before
    its timestamp (per key). Right side should be unique per (key, ts) —
    dedupe upstream if not, or the carried value is engine-dependent."""
    lcols = [c for c in left.columns]
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}") for c in value_cols],
    )
    r_tag = right.select(
        F.col(key),
        F.col(ts),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    for c in lcols:
        if c not in (key, ts):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l_tag.unionByName(r_tag.select(*l_tag.columns))
    # right rows (side 0) sort before left rows at the same ts, so a
    # same-instant right row IS visible to the left row — DuckDB ASOF
    # (right.ts <= left.ts) agrees.
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *lcols,
        "_side",
        *[
            F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.where(F.col("_side") == 1).drop("_side")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str,
    ts: str,
    width_seconds: int,
    l_prefix: str = "l_",
    r_prefix: str = "r_",
) -> DataFrame:
    """All (l, r) pairs sharing ``key`` with r.ts in [l.ts, l.ts+width]."""
    l = left.select(F.col(key), *[F.col(c).alias(f"{l_prefix}{c}") for c in left.columns if c != key])
    r = right.select(F.col(key), *[F.col(c).alias(f"{r_prefix}{c}") for c in right.columns if c != key])
    lo = F.col(f"{l_prefix}{ts}")
    hi = F.col(f"{l_prefix}{ts}") + F.expr(f"INTERVAL {width_seconds} SECONDS")
    rts = F.col(f"{r_prefix}{ts}")
    return l.join(r, on=key).where((rts >= lo) & (rts <= hi))

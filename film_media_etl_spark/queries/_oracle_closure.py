"""Shared DuckDB-oracle SQL snippet: transitive closure over a pair CTE.

Used by every oracle that re-derives connected components from a
pairwise-similarity CTE (``ext_dedup_clusters``, ``ext_golden_record``).
One hand-maintained copy of the closure pattern, so a change to
cluster-id semantics (e.g. the min-id tie-break) cannot silently
diverge between oracles.

DuckDB inlines CTEs by default, and a recursive CTE that references an
inlined quadratic pair join re-evaluates that join once per closure
iteration (the ``ext_pagerank_exact`` trap: 187s -> 1.0s with
``AS MATERIALIZED``).  ``edges`` is therefore MATERIALIZED here;
``reach`` itself is recursive and cannot be.  Callers should ALSO mark
their pair CTE (and anything it self-joins) MATERIALIZED.
"""

from __future__ import annotations


def oracle_closure(pairs_cte: str = "pr", a: str = "a", b: str = "b") -> str:
    """``edges``/``reach`` CTE pair computing the transitive closure of
    the undirected pair graph named ``pairs_cte`` with endpoint columns
    ``a``/``b``.  Yields ``reach(src, dst)``; the component id is
    ``MIN(dst) ... GROUP BY src`` (min reachable id — the same label
    propagation fixed point as operators.dedup.connected_components).
    """
    return f"""edges AS MATERIALIZED (
      SELECT {a} AS a, {b} AS b FROM {pairs_cte}
      UNION SELECT {b} AS a, {a} AS b FROM {pairs_cte}
    ),
    reach(src, dst) AS (
      SELECT a, a FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
    )"""

"""Vector expression library for the similarity-search surface (SURVEY
§2.K; testdata ``embeddings.embedding: array<float>``).

All built from JVM-side higher-order functions (transform / zip_with /
aggregate) — no UDFs in the hot path. Cross-engine exactness: the cosine is
computed as a strict LEFT-TO-RIGHT double fold (Spark ``aggregate`` ==
DuckDB ``list_reduce`` with a prepended 0.0) with the identical formula
``dot / (sqrt(na) * sqrt(nb))``, so Spark and the DuckDB oracle produce
bit-identical doubles and identical rankings — no tolerance needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_double_vec(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold of pairwise products (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine(a: Column, b: Column) -> Column:
    """Exact cosine similarity of two double vectors."""
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


# --- DuckDB oracle twins (SQL snippet builders) ---------------------------


def oracle_dot(a: str, b: str) -> str:
    """Same left-to-right fold in DuckDB (list_reduce has no initial-value
    arg — prepend the zero)."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, len({a}) + 1), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), (acc, x) -> acc + x)"
    )


def oracle_cosine(a: str, b: str) -> str:
    return (
        f"({oracle_dot(a, b)} / "
        f"(sqrt({oracle_dot(a, a)}) * sqrt({oracle_dot(b, b)})))"
    )


def l2sq(a: Column, b: Column) -> Column:
    """Exact squared-L2 distance: left-to-right fold of squared pairwise
    differences — same deterministic evaluation order as ``dot``."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def oracle_l2sq(a: str, b: str) -> str:
    """DuckDB twin of :func:`l2sq` (same fold, same order)."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, len({a}) + 1), "
        f"i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE) * ({a}[i]::DOUBLE - {b}[i]::DOUBLE))), "
        f"(acc, x) -> acc + x)"
    )

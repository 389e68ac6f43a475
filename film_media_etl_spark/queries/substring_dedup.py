"""Exact-substring dedup (Lee et al. 2021, ExactSubstr) — the last
member of the public LLM-dedup canon (round-6 verdict "What's missing
#1"): remove every duplicated run of >= k tokens from the corpus,
keeping the first occurrence, and emit the EDITED documents. MinHash /
SimHash / SemDeDup decide per-document; winnowing and decontamination
detect substring overlap; this tier removes the duplicated span itself,
exactly — the operation the paper showed reduces verbatim memorization.

k is 5 here (fixture docs are ~60 tokens; the paper's 50-token
granularity would never fire at this scale — the operator default IS
50). Everything is exact string/integer work, so the DuckDB oracle
hash-matches: shingles are space-joined token strings in both engines,
first-occurrence survivorship is an integer MIN over
doc_id * 1_000_000 + pos, and reassembly joins surviving tokens with
single spaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import exact_substring_dedup
from ..sources import load_table
from .registry import register

_ES_K = 5  # tokens per duplicated run at fixture scale


@register(
    "ext_dedup_substring",
    oracle=f"""
    WITH t AS MATERIALIZED (
      SELECT doc_id, string_split(lower(coalesce(text, '')), ' ') AS toks
      FROM documents
    ),
    occ AS MATERIALIZED (
      SELECT doc_id, i AS pos,
             array_to_string(toks[i:i+{_ES_K - 1}], ' ') AS sh
      FROM t, UNNEST(range(1, len(toks) - {_ES_K - 2})) AS r(i)
      WHERE len(toks) >= {_ES_K}
    ),
    dup AS MATERIALIZED (
      SELECT sh, MIN(doc_id * 1000000 + pos) AS first_enc
      FROM occ GROUP BY sh HAVING COUNT(*) > 1
    ),
    removed AS MATERIALIZED (
      SELECT DISTINCT o.doc_id, o.pos + j.j AS tpos
      FROM occ o JOIN dup d USING (sh),
           UNNEST(range(0, {_ES_K})) AS j(j)
      WHERE o.doc_id * 1000000 + o.pos <> d.first_enc
    ),
    toks_pos AS (
      SELECT doc_id, i AS pos, toks[i] AS w
      FROM t, UNNEST(range(1, len(toks) + 1)) AS r(i)
    ),
    kept AS (
      SELECT tp.doc_id, tp.pos, tp.w
      FROM toks_pos tp LEFT JOIN removed rm
        ON tp.doc_id = rm.doc_id AND tp.pos = rm.tpos
      WHERE rm.doc_id IS NULL
    ),
    clean AS (
      SELECT doc_id, array_to_string(list(w ORDER BY pos), ' ') AS clean_text
      FROM kept GROUP BY doc_id
    ),
    nrem AS (SELECT doc_id, COUNT(*) AS n_removed FROM removed GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(len(t.toks) AS INT) AS n_tokens,
           CAST(coalesce(nrem.n_removed, 0) AS INT) AS n_removed,
           coalesce(clean.clean_text, '') AS clean_text
    FROM t
    LEFT JOIN nrem ON t.doc_id = nrem.doc_id
    LEFT JOIN clean ON t.doc_id = clean.doc_id
    """,
)
def ext_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_substring_dedup(docs, k=_ES_K)


# assigned after the def: a formatted string as the first statement is an
# expression, not a docstring (round-5 lesson — COVERAGE.md went blank)
ext_dedup_substring.__doc__ = """Exact-substring dedup over the documents
table: every duplicated {k}-token run removed, first occurrence kept,
documents reassembled (operators/dedup.exact_substring_dedup — scale
analysis there: one groupBy(shingle), candidates bounded by duplicated
shingles, map-side reassembly; nothing quadratic). Output per document:
surviving text plus removal accounting.""".format(k=_ES_K)

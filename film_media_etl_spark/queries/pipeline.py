"""End-to-end LLM-corpus-cleaning pipeline as ONE oracle-checked query —
the composition the individual extension operators exist for:

    normalize -> quality filter -> exact dedup (survivor = min doc_id)
              -> per-(lang, source) corpus accounting

Everything chains lazily into a single Catalyst plan: the normalize
expressions fuse into the scan projection, the quality filter prunes
before the dedup shuffle, and the only shuffles are the dedup group-by
and the final accounting group-by. The DuckDB oracle replays the same
pipeline, so the value-hash certifies the whole composition, not just
the stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TX
from ..sources import load_table
from .registry import register

_QUALITY_MIN = 0.5

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@register(
    "ext_pipeline_clean_corpus",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, source,
             {_NORM_SQL} AS norm_text,
             {TX.oracle_quality_score("text")} AS quality
      FROM documents
    ),
    kept AS (
      SELECT * FROM scored WHERE quality >= {_QUALITY_MIN}
    ),
    deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY norm_text ORDER BY doc_id ASC) AS rn
        FROM kept
      ) WHERE rn = 1
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(length(norm_text)) AS BIGINT) AS total_chars,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM deduped
    GROUP BY lang, source
    """,
)
def ext_pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed data-prep pipeline over documents; survivors of the
    quality gate and exact near-identity dedup, accounted per
    (lang, source)."""
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    scored = d.select(
        "doc_id",
        "lang",
        "source",
        norm.alias("norm_text"),
        TX.quality_score(F.col("text")).alias("quality"),
    )
    kept = scored.where(F.col("quality") >= F.lit(_QUALITY_MIN))
    w = Window.partitionBy("norm_text").orderBy(F.asc("doc_id"))
    deduped = kept.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return deduped.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("norm_text")).cast("long").alias("total_chars"),
        F.min("doc_id").cast("long").alias("first_doc"),
    )

"""Streaming ingest-time document dedup — the online half of the batch
dedup stack (operators/dedup.py). A 100 TB training-data pipeline dedups
AT INGEST so duplicates never reach storage; these operators express
that with Structured Streaming's own state machinery.

Two tiers, mirroring the batch exact/near split:

- ``stream_content_dedup`` — exact content dedup: fingerprint the
  normalized text (xxhash64 — same normalization as the batch
  ``_token_set`` tier) and ``dropDuplicatesWithinWatermark`` on it.
  State is bounded by the watermark horizon; the JVM manages it.
- ``stream_near_dup_filter`` — ONLINE near-dup suppression: SimHash the
  text (the exact simhash_bits expression the batch op uses), block on
  the signature's low band, and keep a per-bucket list of admitted
  signatures in applyInPandasWithState; a document is suppressed when
  any admitted signature in its bucket is within ``max_hamming``.
  First-writer-wins semantics (stream order decides survivors, like any
  online filter). Single-band blocking trades recall for one stateful
  key per doc — the batch 4-band op is the full-recall tier; with the
  default 16-bit band plus verify this recovers pairs with Hamming <= 3
  guaranteed-on-this-band plus whatever lands in-band beyond that
  (documented partial tier, same analysis as the batch banding test).
  State per bucket is capped at ``max_state`` admitted signatures
  (oldest evicted) so a hot bucket cannot grow without bound.

Correctness strategy: no SQL oracle exists for streams — pytest drains
against the static corpus and compares to a batch replay of the same
greedy first-wins semantics (tests/test_streaming.py).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.dedup import simhash_bits


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet (schema pinned from
    a static scan — never inference on a stream)."""
    static = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", "documents*.parquet")
        .parquet(sf_dir)
    )


def stream_content_dedup(docs: DataFrame) -> DataFrame:
    """Exact streaming dedup on a content fingerprint. The documents
    table carries no event time, so state is global dropDuplicates
    (bounded by distinct-content cardinality — the fingerprint is 8
    bytes, so even a billion distinct docs is ~tens of GB of state
    across a cluster; with an ingest-time column, switch to
    dropDuplicatesWithinWatermark as stream_dedup does)."""
    return docs.withColumn(
        "content_fp", F.xxhash64(F.lower(F.col("text")))
    ).dropDuplicates(["content_fp"])


_NEAR_DUP_OUT = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sig", T.LongType(), False),
        T.StructField("admitted", T.BooleanType(), False),
    ]
)
_NEAR_DUP_STATE = T.StructType([T.StructField("sigs", T.ArrayType(T.LongType()), True)])


def stream_near_dup_filter(
    docs: DataFrame,
    *,
    max_hamming: int = 6,
    band_bits: int = 16,
    max_state: int = 4096,
) -> DataFrame:
    """Stateful online near-dup suppression (see module doc). Emits every
    document with its signature and the admit/suppress decision; a
    downstream sink keeps ``admitted`` rows only."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    mask = (1 << band_bits) - 1

    def update(key, pdfs: Iterator, state: GroupState):
        import pandas as pd

        admitted: list[int] = list(state.get[0]) if state.exists else []
        out_ids, out_sigs, out_adm = [], [], []
        for pdf in pdfs:
            # within-batch order: doc_id ascending — deterministic
            # replay-stable tie-break for same-batch near-dups
            for _, row in pdf.sort_values("doc_id").iterrows():
                sig = int(row["sig"])
                dup = any(
                    bin(sig ^ s).count("1") <= max_hamming for s in admitted
                )
                if not dup:
                    admitted.append(sig)
                    if len(admitted) > max_state:
                        admitted.pop(0)  # bounded state: evict oldest
                out_ids.append(int(row["doc_id"]))
                out_sigs.append(sig)
                out_adm.append(not dup)
        state.update((admitted,))
        yield pd.DataFrame({"doc_id": out_ids, "sig": out_sigs, "admitted": out_adm})

    sigs = docs.where(F.col("text").isNotNull()).select(
        "doc_id",
        simhash_bits(F.col("text")).alias("sig"),
    )
    keyed = sigs.withColumn("bucket", F.col("sig").bitwiseAND(F.lit(mask)))
    return keyed.groupBy("bucket").applyInPandasWithState(
        update,
        outputStructType=_NEAR_DUP_OUT,
        stateStructType=_NEAR_DUP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

"""Multimodal column plumbing (SURVEY §2.K).

Images/audio/video are opaque ``binary`` payload columns with a typed
metadata struct riding alongside. The Spark-side machinery — schema,
partition-preserving mapInPandas, Arrow batch shapes — is real and tested;
the actual media decode is STUBBED (``decode_media`` raises
NotImplementedError: no image/audio libraries ship in this container) and
replaced by a deterministic fake feature extractor so the pipeline is
exercisable end-to-end and oracle-checkable (payloads here are UTF-8 text
bytes, so byte arithmetic is reproducible in SQL).

At scale: mapInPandas streams Arrow batches — constant memory per task,
no driver collection; binary payloads stay columnar in parquet and are
never shuffled unless a downstream op requires it.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("checksum", T.LongType(), False),
        T.StructField("fake_embedding", T.ArrayType(T.DoubleType()), False),
    ]
)

_EMB_DIM = 8
_MOD = 997


def attach_binary_payload(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Model documents as media blobs: opaque binary payload + metadata
    struct (the pattern a real image/audio table would use)."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col(text_col)).alias("declared_bytes"),
        ).alias("meta"),
    )


def decode_media(payload: bytes, mime: str):  # pragma: no cover - documented stub
    """Real media decode (PIL / torchaudio / pyav) — STUB.

    The container ships no media libraries; a deployment would swap this
    for the actual decoder. The deterministic fake path below keeps the
    distributed plumbing testable.
    """
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; use extract_fake_features for the tested pipeline"
    )


def extract_fake_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches.

    Deterministic fake 'decode': byte count, additive checksum, and an
    8-dim pseudo-embedding derived from the checksum — stands in for a
    real encoder while exercising identical batch shapes and schema.
    """

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len)
            checksum = payloads.map(lambda b: sum(b) % 2_147_483_647)
            emb = checksum.map(
                lambda c: [((c * 31 + j) % _MOD) / float(_MOD) for j in range(_EMB_DIM)]
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes.astype("int32"),
                    "checksum": checksum.astype("int64"),
                    "fake_embedding": emb,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("orig_bytes", T.IntegerType(), False),
        T.StructField("resized_bytes", T.IntegerType(), False),
    ]
)


def resize_media(media: DataFrame, *, target_bytes: int = 64) -> DataFrame:
    """'Resize' stage over mapInPandas. A real deployment decodes and
    rescales pixels (PIL/opencv — not in this container, see
    decode_media); the deterministic fake keeps the Spark contract real:
    binary in -> smaller binary out, schema typed, Arrow-batched,
    partition-preserving (no shuffle)."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads.map(lambda b: bytes(b[:target_bytes])),
                    "orig_bytes": payloads.map(len).astype("int32"),
                    "resized_bytes": payloads.map(
                        lambda b: min(len(b), target_bytes)
                    ).astype("int32"),
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(media: DataFrame, *, n_frames: int = 4) -> DataFrame:
    """Frame-sampling stage: one input blob -> n output rows (video ->
    evenly-spaced frames). Row-expanding mapInPandas — the batch contract
    a real pyav-based sampler would use; the fake slices the payload into
    evenly-spaced chunks."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            ids, frames, nos = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                step = max(1, len(b) // n_frames)
                for j in range(n_frames):
                    ids.append(mid)
                    nos.append(j)
                    frames.append(b[j * step : j * step + step])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)

"""Property-based tests (hypothesis) for the byte-level codecs and the
Morton interleave — pure driver-side checks, no Spark session, so they
run in milliseconds and explore the input space the fixture corpus
doesn't."""

from __future__ import annotations

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from film_media_etl_spark.operators.multimodal import decode_media, decode_wav
from film_media_etl_spark.queries.io_formats import _morton_sql


def _interleave_py(x: int, y: int) -> int:
    z = 0
    for b in range(16):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


@given(st.integers(0, 65535), st.integers(0, 65535))
@settings(max_examples=200, deadline=None)
def test_morton_sql_matches_bitwise_reference(x, y):
    """The magic-number spread ladder in _morton_sql must equal the
    naive bit-by-bit interleave for every 16-bit pair (DuckDB evaluates
    the same SQL text the Spark side runs through F.expr).

    Inputs are CAST to BIGINT exactly as ext_zorder_layout's p16/s16
    are — found by this very test: a bare INT32-typed literal overflows
    DuckDB's left shift at y >= 2^15 (the y<<1 step lands on bit 31),
    so the 64-bit input typing is load-bearing, not cosmetic."""
    (got,) = duckdb.sql(
        f"SELECT {_morton_sql(f'CAST({x} AS BIGINT)', f'CAST({y} AS BIGINT)')}"
    ).fetchone()
    assert got == _interleave_py(x, y)


@given(
    st.integers(1, 9),
    st.integers(1, 9),
    st.binary(min_size=0, max_size=0),
)
@settings(max_examples=50, deadline=None)
def test_ppm_roundtrip_any_dims(w, h, _):
    """Render-then-decode round-trips pixel-exactly for arbitrary small
    dimensions (the fixture only exercises 8x8)."""
    rng = np.random.default_rng(w * 100 + h)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    payload = f"P6\n{w} {h}\n255\n".encode() + px.tobytes()
    out = decode_media(payload, "image/x-portable-pixmap")
    assert (out == px).all()


@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=64))
@settings(max_examples=50, deadline=None)
def test_wav_roundtrip_any_samples(samples):
    """WAV encode/decode round-trips int16 samples exactly, including
    the extremes and odd-length data chunks (word-alignment padding)."""
    import struct

    arr = np.array(samples, dtype="<i2")
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", arr.nbytes) + arr.tobytes()
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    out, rate, channels = decode_wav(payload)
    assert rate == 8000 and channels == 1
    assert out.flatten().tolist() == samples


@given(st.integers(1, 9), st.integers(1, 9))
@settings(max_examples=25, deadline=None)
def test_pgm_grayscale_roundtrip_and_stats_shape(w, h):
    """P5 graymaps decode to (h, w, 1) and the channel-stats reshape must
    follow the decoder's channel count (ADVICE r3: a hardcoded
    reshape(-1, 3) crashed or silently mis-averaged graymaps)."""
    rng = np.random.default_rng(w * 1000 + h)
    px = rng.integers(0, 256, size=(h, w, 1), dtype=np.uint8)
    payload = f"P5\n{w} {h}\n255\n".encode() + px.tobytes()
    out = decode_media(payload, "image/x-portable-graymap")
    assert out.shape == (h, w, 1)
    assert (out == px).all()


def test_channel_stats_handles_graymap(spark):
    """image_channel_stats over a mixed P6+P5 frame: the graymap row must
    yield mean_g == mean_b == mean_r == the exact pixel mean."""
    import pandas as pd

    from film_media_etl_spark.operators.multimodal import image_channel_stats

    rgb = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    gray = np.array([[0, 10], [20, 250]], dtype=np.uint8).reshape(2, 2, 1)
    rows = pd.DataFrame(
        {
            "media_id": [1, 2],
            "payload": [
                b"P6\n3 3\n255\n" + rgb.tobytes(),
                b"P5\n2 2\n255\n" + gray.tobytes(),
            ],
            "meta": [
                {"mime": "image/x-portable-pixmap"},
                {"mime": "image/x-portable-graymap"},
            ],
        }
    )
    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
        ]
    )
    got = {
        r["media_id"]: r
        for r in image_channel_stats(
            spark.createDataFrame(rows, schema=schema)
        ).collect()
    }
    assert got[2]["width"] == 2 and got[2]["height"] == 2
    assert got[2]["mean_r"] == got[2]["mean_g"] == got[2]["mean_b"] == 70.0
    assert got[1]["mean_r"] == float(rgb[:, :, 0].mean())
    assert got[1]["mean_g"] == float(rgb[:, :, 1].mean())
    assert got[1]["mean_b"] == float(rgb[:, :, 2].mean())


def _render_ppm_bytes(media_id: int) -> bytes:
    # Mirror of operators/multimodal.py:render_ppm_media's pixel formula.
    header = b"P6\n8 8\n255\n"
    y, x, c = np.mgrid[0:8, 0:8, 0:3]
    return header + ((media_id * 7 + x * 3 + y * 5 + c * 11) % 256).astype(
        np.uint8
    ).tobytes()


def _dhash_py(px: np.ndarray) -> int:
    gray = px.astype(np.int64).sum(axis=2)
    bits = gray[:, :-1] > gray[:, 1:]
    h, wm1 = bits.shape
    out = 0
    for yy in range(h):
        for xx in range(wm1):
            if bits[yy, xx]:
                out |= 1 << (yy * wm1 + xx)
    return out


@given(st.integers(0, 10_000_000))
@settings(max_examples=100, deadline=None)
def test_dhash_congruent_ids_collide(media_id):
    """The renderer's pixel formula depends on media_id only through
    media_id*7 mod 256, so ids congruent mod 256 render byte-identical
    images — the dedup fixture's duplicate groups. Pin that, and pin
    the dHash value against a naive per-bit reference."""
    px = decode_media(_render_ppm_bytes(media_id), "image/x-portable-pixmap")
    twin = decode_media(
        _render_ppm_bytes(media_id + 256), "image/x-portable-pixmap"
    )
    assert np.array_equal(px, twin)
    assert _dhash_py(px) == _dhash_py(twin)
    assert 0 <= _dhash_py(px) < (1 << 56)


def test_dhash_sensitive_to_single_flip():
    """Flipping one luminance comparison flips exactly one hash bit —
    dHash is an order fingerprint, invariant to uniform brightness
    shifts but sensitive to any local gradient change."""
    px = decode_media(_render_ppm_bytes(3), "image/x-portable-pixmap")
    base = _dhash_py(px)
    shifted = np.clip(px.astype(np.int64) + 40, 0, 10**9)  # uniform shift
    assert _dhash_py(shifted) == base
    bent = px.astype(np.int64).copy()
    gray = bent.sum(axis=2)
    # force a decisive change in one adjacent comparison
    bent[4, 2, :] = 0 if gray[4, 2] > gray[4, 3] else 300
    assert bin(_dhash_py(bent) ^ base).count("1") >= 1


@given(st.integers(0, 2_000_000_000))
@settings(max_examples=64, deadline=None)
def test_tone_spectrum_argmax_exact(media_id):
    """Every rendered tone's rFFT argmax (DC excluded) recovers exactly
    tone_bin(id): the tone sits ON a bin, so quantization noise (~86 dB
    down) can never move the peak. This is the closed-form fact the
    ext_multimodal_spectrum oracle states without running an FFT."""
    import numpy as np

    from film_media_etl_spark.operators.multimodal import (
        decode_wav,
        tone_bin,
        tone_wav_bytes,
    )

    samples, rate, channels = decode_wav(tone_wav_bytes(media_id))
    assert (rate, channels) == (8000, 1)
    mag = np.abs(np.fft.rfft(samples[:, 0].astype(np.float64)))
    k = int(np.argmax(mag[1:])) + 1
    assert k == tone_bin(media_id)
    # the peak is unambiguous: every other bin is far below it
    others = np.delete(mag, [0, k])
    assert mag[k] > 100 * others.max()

"""FIXTURES.md §C edge-case classes on tiny literal fixtures — each test
exercises a cited reference behavior against the engine's reusable
semantics (etl/reference_semantics.py, functions/dates.py).

Numbers in test names refer to the §C class list.
"""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from film_media_etl_spark.etl.reference_semantics import (
    MUSIC_ID_OFFSET,
    fact_key_columns,
    offset_music_id,
    resolve_fact_keys,
    standardize_country,
    truncate_name,
)
from film_media_etl_spark.functions.dates import smart_date_key, week_of_year_noniso


_DC_SCHEMA = (
    "customer_key int, customer_id int, country string, city string, "
    "state string, customer_type string"
)
_DL_SCHEMA = "location_key int, country string, city string, state string"


def _dims(spark):
    dc = spark.createDataFrame(
        [
            (1, 10, "India", "Delhi", None, "film"),
            (2, 11, "United States", "Boston", None, "film"),
            (3, 10, "Canada", "Toronto", None, "music"),
        ],
        _DC_SCHEMA,
    ).alias("dc")
    dl = spark.createDataFrame(
        [
            (1, "Unknown", None, None),
            (2, "India", "Delhi", None),
            (3, "United States", "Boston", None),
        ],
        _DL_SCHEMA,
    ).alias("dl")
    dp = spark.createDataFrame(
        [Row(product_key=1, product_id=-1), Row(product_key=2, product_id=500)]
    ).alias("dp")
    return dc, dl, dp


def _facts(spark, rows):
    return spark.createDataFrame(rows).alias("f")


def test_c10_unmatched_lookups_fallback_keys(spark):
    """§C.10/1/7: unmatched customer -> NULL customer_key; unmatched
    location/product -> fallback key 1 (` loadAnalyticsDB...R`:472,476,480)."""
    dc, dl, dp = _dims(spark)
    facts = _facts(
        spark,
        [
            Row(customer_id=10, product_id=500),   # full match
            Row(customer_id=99, product_id=500),   # no customer -> NULL key, location falls back
            Row(customer_id=11, product_id=777),   # no product -> product_key 1
        ],
    )
    out = {
        r["customer_id"]: r
        for r in resolve_fact_keys(facts, dc, dl, dp)
        .select("f.customer_id", *fact_key_columns())
        .collect()
    }
    assert out[10]["customer_key"] == 1 and out[10]["location_key"] == 2
    assert out[10]["product_key"] == 2
    assert out[99]["customer_key"] is None and out[99]["location_key"] == 1
    assert out[11]["customer_key"] == 2 and out[11]["product_key"] == 1


def test_c7_null_wildcard_is_dimension_side_only(spark):
    """§C.7: the DIMENSION side carries the NULL wildcard. A dim row with
    city NULL matches any fact city; a dim row with a concrete city does
    NOT match a different city (falls back to key 1)."""
    dc = spark.createDataFrame(
        [(1, 10, "Brazil", "Rio", None, "film")], _DC_SCHEMA
    ).alias("dc")
    # wildcard-city dim row for Brazil
    dl = spark.createDataFrame(
        [(1, "Unknown", None, None), (5, "Brazil", None, None)], _DL_SCHEMA
    ).alias("dl")
    dp = spark.createDataFrame([Row(product_key=1, product_id=-1)]).alias("dp")
    facts = _facts(spark, [Row(customer_id=10, product_id=-1)])
    row = resolve_fact_keys(facts, dc, dl, dp).select(*fact_key_columns()).first()
    assert row["location_key"] == 5  # NULL city on the dim side wildcards

    # concrete-city dim row that disagrees -> no match -> fallback 1
    dl2 = spark.createDataFrame(
        [(6, "Brazil", "Sao Paulo", None)], _DL_SCHEMA
    ).alias("dl")
    row2 = resolve_fact_keys(facts, dc, dl2, dp).select(*fact_key_columns()).first()
    assert row2["location_key"] == 1


def test_c4_usa_standardization_merges_groups(spark):
    """§C.4: 'USA' rewrites to 'United States' and merges with literal
    'United States' rows in group-bys (` loadAnalyticsDB...R`:159-163)."""
    df = spark.createDataFrame(
        [Row(country="USA", amount=10), Row(country="United States", amount=5),
         Row(country="Brazil", amount=1)]
    )
    got = {
        r["country"]: r["total"]
        for r in df.groupBy(standardize_country(F.col("country")).alias("country"))
        .agg(F.sum("amount").alias("total"))
        .collect()
    }
    assert got == {"United States": 15, "Brazil": 1}


def test_c5_id_offset_keyspaces_disjoint(spark):
    """§C.5: film and music IDs overlap before the +10000 offset and are
    disjoint after (` loadAnalyticsDB...R`:256,337,442-443)."""
    film = spark.createDataFrame([Row(id=1), Row(id=2), Row(id=9999)])
    music = spark.createDataFrame([Row(id=1), Row(id=2), Row(id=9999)])
    shifted = music.select(offset_music_id(F.col("id")).alias("id"))
    assert film.join(shifted, "id").count() == 0
    assert shifted.agg(F.min("id")).first()[0] == 1 + MUSIC_ID_OFFSET


def test_c8_quote_bearing_strings_transparent(spark):
    """§C.8: names like O'Brien survive group-by and join unescaped (the
    reference needed gsub escaping only because it rendered SQL text)."""
    df = spark.createDataFrame(
        [Row(name="O'Brien", v=1), Row(name="O'Brien", v=2), Row(name="L'Avventura", v=3)]
    )
    got = {r["name"]: r["s"] for r in df.groupBy("name").agg(F.sum("v").alias("s")).collect()}
    assert got == {"O'Brien": 3, "L'Avventura": 3}
    names = spark.createDataFrame([Row(name="O'Brien", tag="x")])
    assert df.join(names, "name").count() == 2


def test_c9_overlong_names_truncate(spark):
    """§C.9: product names > 255 chars truncate (substr 1..255,
    ` loadAnalyticsDB...R`:358)."""
    long_name = "x" * 300
    df = spark.createDataFrame([Row(name=long_name)])
    out = df.select(F.length(truncate_name(F.col("name"))).alias("n")).first()
    assert out["n"] == 255


def test_c11_noniso_week_semantics(spark):
    """§C.11: week = ((dayofyear-1) div 7) + 1 — week 1 always starts
    Jan 1; day 365/366 is week 53; diverges from ISO at year boundaries
    (` loadAnalyticsDB...R`:103)."""
    days = [
        datetime.date(2005, 1, 1),   # ISO: week 53 of 2004; non-ISO: 1
        datetime.date(2005, 1, 8),   # non-ISO: 2
        datetime.date(2005, 12, 31), # day 365 -> 53
        datetime.date(2004, 12, 31), # leap day 366 -> 53
        datetime.date(2004, 2, 29),  # leap day 60 -> 9
    ]
    df = spark.createDataFrame([Row(d=x) for x in days])
    rows = df.select(
        "d",
        week_of_year_noniso(F.col("d")).alias("w"),
        F.weekofyear(F.col("d")).alias("iso"),
    ).collect()
    got = {r["d"]: (r["w"], r["iso"]) for r in rows}
    assert got[datetime.date(2005, 1, 1)][0] == 1
    assert got[datetime.date(2005, 1, 1)][1] == 53  # ISO disagrees -> trap confirmed
    assert got[datetime.date(2005, 1, 8)][0] == 2
    assert got[datetime.date(2005, 12, 31)][0] == 53
    assert got[datetime.date(2004, 12, 31)][0] == 53
    assert got[datetime.date(2004, 2, 29)][0] == 9


def test_c11_smart_date_key(spark):
    df = spark.createDataFrame([Row(d=datetime.date(2005, 7, 4))])
    assert df.select(smart_date_key(F.col("d")).alias("k")).first()["k"] == 20050704


def test_c12_empty_pivot_groups_render_zero(spark):
    """§C.12: conditional aggregation renders empty (group, quarter)
    combinations as 0, not NULL (Rmd:119-120,150-153)."""
    df = spark.createDataFrame(
        [Row(country="A", quarter=1, rev=10), Row(country="A", quarter=3, rev=5)]
    )
    row = df.groupBy("country").agg(
        *[
            F.sum(F.when(F.col("quarter") == q, F.col("rev")).otherwise(F.lit(0))).alias(f"q{q}")
            for q in (1, 2, 3, 4)
        ]
    ).first()
    assert (row["q1"], row["q2"], row["q3"], row["q4"]) == (10, 0, 5, 0)


def test_c13_topk_ties_deterministic(spark):
    """§C.13: equal aggregates at the LIMIT boundary break ties by key
    (the engine's documented tiebreaker: value DESC, key ASC)."""
    df = spark.createDataFrame(
        [Row(k="b", v=10), Row(k="a", v=10), Row(k="c", v=10), Row(k="d", v=1)]
    )
    top = (
        df.groupBy("k").agg(F.sum("v").alias("s"))
        .orderBy(F.desc("s"), F.asc("k"))
        .limit(2)
        .collect()
    )
    assert [r["k"] for r in top] == ["a", "b"]


def test_c6_union_dedup_on_load(spark):
    """§C.6: identical (country, city, state) from both sources dedup to
    one row (INSERT IGNORE semantics, createStarSchema...R:97)."""
    schema = "country string, city string, state string"
    film = spark.createDataFrame([("India", "Delhi", None)], schema)
    music = spark.createDataFrame([("India", "Delhi", None)], schema)
    assert film.unionByName(music).distinct().count() == 1


def test_multimodal_resize_contract(spark):
    """Resize stage: binary in -> capped binary out, Arrow-batched, no
    shuffle; metadata columns report original and resized sizes."""
    from film_media_etl_spark.operators.multimodal import attach_binary_payload, resize_media

    docs = spark.createDataFrame(
        [(1, "x" * 100), (2, "y" * 10)], "doc_id long, text string"
    )
    out = {r["media_id"]: r for r in resize_media(attach_binary_payload(docs), target_bytes=64).collect()}
    assert out[1]["orig_bytes"] == 100 and out[1]["resized_bytes"] == 64
    assert len(out[1]["payload"]) == 64
    assert out[2]["orig_bytes"] == 10 and out[2]["resized_bytes"] == 10


def test_c2_c3_filter_semantics(spark):
    """§C.2/3: amount > 0 drops non-positive rows; IS NOT NULL drops NULL
    dates (` loadAnalyticsDB...R`:411-412)."""
    df = spark.createDataFrame(
        [
            Row(amount=5.0, d=datetime.date(2005, 1, 1)),
            Row(amount=0.0, d=datetime.date(2005, 1, 2)),
            Row(amount=-1.0, d=datetime.date(2005, 1, 3)),
            Row(amount=7.0, d=None),
        ]
    )
    kept = df.where(F.col("amount") > 0).where(F.col("d").isNotNull())
    assert kept.count() == 1


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    """Compaction: 40 tiny files -> the computed target count, same
    rows; clustered variant produces disjoint per-file key ranges
    (the row-group-skipping precondition)."""
    from film_media_etl_spark.sources import load_table
    from film_media_etl_spark.sources.maintenance import compact_parquet, directory_stats

    src = str(tmp_path / "fragmented")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.repartition(40).write.mode("overwrite").parquet(src)
    n_before, _ = directory_stats(src)
    assert n_before == 40

    out = str(tmp_path / "compacted")
    got = compact_parquet(spark, src, out, target_file_mb=128)
    n_after, _ = directory_stats(out)
    assert n_after == 1  # tiny data -> single target file
    assert got.count() == ev.count()

    # clustered compaction: per-file user_id ranges must not overlap
    out2 = str(tmp_path / "clustered")
    import os

    from pyspark.sql import functions as F

    compact_parquet(spark, src, out2, target_file_mb=1, cluster_by=["user_id"])
    per_file = (
        spark.read.parquet(out2)
        .groupBy(F.col("_metadata.file_name").alias("f"))
        .agg(F.min("user_id").alias("lo"), F.max("user_id").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    assert all(a[1] <= b[0] for a, b in zip(spans, spans[1:]))


def test_netpbm_decoder_contract():
    """decode_media parses real Netpbm bytes: P6/P5, header comments,
    and loud failures on malformed input or unsupported formats."""
    import numpy as np
    import pytest as _pt

    from film_media_etl_spark.operators.multimodal import decode_media

    px = decode_media(b"P6\n2 2\n255\n" + bytes(range(12)), "image/x-portable-pixmap")
    assert px.shape == (2, 2, 3) and px.flatten().tolist() == list(range(12))
    # comments anywhere in the header are skipped
    px = decode_media(
        b"P6\n# a comment\n2 # inline\n2\n255\n" + bytes(range(12)),
        "image/x-portable-pixmap",
    )
    assert px.shape == (2, 2, 3)
    gray = decode_media(b"P5\n3 1\n255\n" + bytes([9, 8, 7]), "image/x-portable-graymap")
    assert gray.shape == (1, 3, 1) and gray.flatten().tolist() == [9, 8, 7]
    with _pt.raises(ValueError):
        decode_media(b"P6\n2 2\n65535\n" + bytes(24), "image/x-portable-pixmap")
    with _pt.raises(ValueError):
        decode_media(b"P6\n2", "image/x-portable-pixmap")
    with _pt.raises(NotImplementedError):
        decode_media(b"\x89PNG...", "image/png")
    assert np is not None


def test_wav_decoder_contract():
    """decode_wav walks RIFF chunks (extra chunks before data), requires
    16-bit PCM, and round-trips little-endian samples exactly."""
    import struct

    import numpy as np
    import pytest as _pt

    from film_media_etl_spark.operators.multimodal import decode_wav

    samples = np.array([-3, 0, 7, 32767, -32768], dtype="<i2")
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    junk = b"LIST" + struct.pack("<I", 4) + b"INFO"  # pre-data chunk
    body = b"WAVE" + junk + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", samples.nbytes) + samples.tobytes()
    payload = b"RIFF" + struct.pack("<I", len(body)) + body

    out, rate, channels = decode_wav(payload)
    assert rate == 8000 and channels == 1
    assert out.flatten().tolist() == samples.tolist()

    with _pt.raises(ValueError):
        decode_wav(b"OGGS" + payload[4:])
    bad_fmt = struct.pack("<HHIIHH", 85, 1, 8000, 16000, 2, 16)  # mp3 format tag
    bad = b"RIFF" + struct.pack("<I", 36) + b"WAVE" + b"fmt " + struct.pack("<I", 16) + bad_fmt
    bad += b"data" + struct.pack("<I", 0)
    with _pt.raises(NotImplementedError):
        decode_wav(bad)

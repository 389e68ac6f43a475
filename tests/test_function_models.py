"""Model-based property tests: the engine's scalar expression library vs
independent pure-Python models over seeded random inputs (one Spark job
per test, thousands of cases per job — property coverage without
per-example session overhead).
"""

from __future__ import annotations

import datetime
import random
import string

from pyspark.sql import functions as F

from film_media_etl_spark.functions.dates import smart_date_key, week_of_year_noniso
from film_media_etl_spark.functions.text import (
    FINGERPRINT_MOD,
    fingerprint,
    token_count,
)

SEED = 42
N = 2000


def _random_dates(n: int) -> list[datetime.date]:
    rng = random.Random(SEED)
    lo = datetime.date(1990, 1, 1).toordinal()
    hi = datetime.date(2035, 12, 31).toordinal()
    return [datetime.date.fromordinal(rng.randint(lo, hi)) for _ in range(n)]


def test_week_noniso_matches_model(spark):
    """week = ((dayofyear - 1) // 7) + 1 for every date — lubridate
    semantics (` loadAnalyticsDB...R`:103), 46 years of random dates."""
    dates = _random_dates(N)
    df = spark.createDataFrame([(d,) for d in dates], "d date")
    got = {r["d"]: r["w"] for r in df.select("d", week_of_year_noniso(F.col("d")).alias("w")).collect()}
    for d in dates:
        doy = (d - datetime.date(d.year, 1, 1)).days + 1
        assert got[d] == ((doy - 1) // 7) + 1, d


def test_smart_date_key_matches_model(spark):
    dates = _random_dates(N)
    df = spark.createDataFrame([(d,) for d in dates], "d date")
    got = {r["d"]: r["k"] for r in df.select("d", smart_date_key(F.col("d")).alias("k")).collect()}
    for d in dates:
        assert got[d] == d.year * 10000 + d.month * 100 + d.day, d


def _random_texts(n: int) -> list[str]:
    rng = random.Random(SEED)
    alphabet = string.ascii_lowercase + string.digits + " .,!?'"
    return ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 80))) for _ in range(n)]


def test_fingerprint_matches_model(spark):
    """Polynomial rolling hash: fold (acc*31 + ascii(ch)) % (1e9+7)."""
    texts = _random_texts(N)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {r["i"]: r["fp"] for r in df.select("i", fingerprint(F.col("t")).alias("fp")).collect()}
    for i, t in enumerate(texts):
        acc = 0
        for ch in t:
            acc = (acc * 31 + ord(ch)) % FINGERPRINT_MOD
        assert got[i] == acc, repr(t)


def test_token_count_matches_model(spark):
    """Single-space split, empty tokens preserved (cross-engine contract)."""
    texts = _random_texts(N)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {r["i"]: r["n"] for r in df.select("i", token_count(F.col("t")).alias("n")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == len(t.lower().split(" ")), repr(t)

from __future__ import annotations

import os
import sys
from contextlib import contextmanager

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

# Parity tests default to smoke scale for speed; set SPARK_GRAFT_PARITY_SF
# to /root/testdata/sf0.01 to mirror the driver's t2 gate exactly.
PARITY_SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")


@contextmanager
def spark_conf(spark, overrides):
    """Temporarily apply session-conf overrides, restoring (or unsetting
    previously-unset keys) on exit — shared by every test that tunes
    optimizer thresholds to fixture scale."""
    old = {}
    for k, v in overrides.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:  # noqa: BLE001 — unset key
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


@pytest.fixture(scope="session")
def spark():
    from film_media_etl_spark.session import get_spark

    s = get_spark("fmes-tests")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def duck():
    import duckdb

    from film_media_etl_spark.sources import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{PARITY_SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()

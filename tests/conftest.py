from __future__ import annotations

import os
import sys

import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

# Parity tests default to smoke scale for speed; set SPARK_GRAFT_PARITY_SF
# to /root/testdata/sf0.01 to mirror the driver's t2 gate exactly.
PARITY_SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")


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

"""zorder_compact: the written files' parquet footer stats must bound
BOTH cluster keys (the data-skipping property the ext_zorder_layout
audit query measures abstractly) — verified against the actual row-group
statistics pyarrow reads back, and contrasted with single-key
clustering, which bounds only its own column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from conftest import PARITY_SF_DIR

from film_media_etl_spark.sources.maintenance import compact_parquet, zorder_compact


def _file_spans(path_glob: str, col_a: str, col_b: str):
    spans = []
    for f in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(f).metadata
        mins = {c: None for c in (col_a, col_b)}
        maxs = {c: None for c in (col_a, col_b)}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    st = col.statistics
                    mins[name] = st.min if mins[name] is None else min(mins[name], st.min)
                    maxs[name] = st.max if maxs[name] is None else max(maxs[name], st.max)
        spans.append(
            (maxs[col_a] - mins[col_a], maxs[col_b] - mins[col_b])
        )
    return spans


def test_zorder_files_bound_both_keys(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.read.parquet(f"{PARITY_SF_DIR}/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    ).write.parquet(src)

    zdir = str(tmp_path / "zordered")
    out = zorder_compact(spark, src, zdir, "l_partkey", "l_suppkey", n_files=8)
    assert out.count() == spark.read.parquet(src).count()

    stats = spark.read.parquet(src).selectExpr(
        "max(l_partkey) - min(l_partkey) AS ra", "max(l_suppkey) - min(l_suppkey) AS rb"
    ).first()
    z_spans = _file_spans(f"{zdir}/*.parquet", "l_partkey", "l_suppkey")
    assert len(z_spans) >= 4
    # z-ordered files are rectangles: ON AVERAGE both keys are bounded
    # well below their global range (per-file bounds would be flaky —
    # repartitionByRange samples boundaries, and a file straddling a
    # z-prefix boundary legitimately spans both halves of one key)
    avg_a = sum(sa for sa, _ in z_spans) / len(z_spans)
    avg_b = sum(sb for _, sb in z_spans) / len(z_spans)
    assert avg_a <= 0.75 * stats["ra"], (avg_a, stats["ra"])
    assert avg_b <= 0.75 * stats["rb"], (avg_b, stats["rb"])

    # contrast: single-key range clustering bounds only its own column —
    # suppkey spans stay at (essentially) the full range in every file
    ldir = str(tmp_path / "linear")
    compact_parquet(spark, src, ldir, n_files=8, cluster_by=["l_partkey"])
    l_spans = _file_spans(f"{ldir}/*.parquet", "l_partkey", "l_suppkey")
    assert max(sb for _, sb in l_spans) >= 0.9 * stats["rb"]

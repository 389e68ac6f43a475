"""Build a Kx scaled copy of a testdata sf dir for scale-up benching.

Usage: python tools/make_scaled_corpus.py SRC_DIR OUT_DIR K

Design (what "Kx" must mean for the results to be interpretable):

- Relational tables (customer/supplier/part/orders/lineitem/events):
  K key-shifted copies (every key column offset by copy * 10^9), so all
  joins stay consistent and every group/join key's fan-in scales
  linearly. region/nation stay single copies (fixed dimensions, like
  the real world).
- documents: K copies with every TOKEN prefixed "c{i}_" for copy i>0.
  Within-copy Jaccard/minhash/shingle structure is preserved EXACTLY
  (the prefix is a bijection on the vocabulary), cross-copy similarity
  is zero — so true near-dup pair counts scale Kx, not K^2x, the way a
  real (non-self-copied) corpus grows. n_chars is recomputed. The
  vocabulary also grows Kx, which pushes the dedup verify off the
  bounded-bitset fast path onto the open-vocabulary fallback — the
  expected 100 TB regime.
- Row groups are written at 64k rows so scans parallelize the way a
  real multi-file dataset does — pyarrow's default 1M-row groups made
  a 2.4M-row lineitem scan run as 3 tasks and polluted every TPC-H
  scaling ratio with scan starvation rather than plan behavior.
- embeddings: K copies transformed by a per-copy fixed column
  permutation + per-column sign flips. This is an orthogonal map, so
  every within-copy pairwise cosine (and each vector's norm) is
  preserved BIT-FOR-BIT in structure while cross-copy cosines behave
  like independent uniform draws (concentrate near 0 << any near-dup
  threshold). Near-dup density scales Kx.

The round-3 alternative (perturbed self-copies) makes near-dup outputs
grow K^2x — a valid adversarial test (covered separately in
tests/test_dedup_recall.py) but the wrong corpus for judging whether
the ENGINE scales linearly.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OFF = 10**9

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]


def _shift_keys(t: pa.Table, table: str, copy: int) -> pa.Table:
    for col in KEY_COLS[table]:
        idx = t.schema.get_field_index(col)
        typ = t.schema.field(col).type
        shifted = pa.array(t[col].to_numpy() + copy * OFF, typ)
        t = t.set_column(idx, col, shifted)
    return t


# Name-like columns get a per-copy suffix: appending the SAME suffix to
# every name in a copy leaves all within-copy edit distances unchanged
# (levenshtein is suffix-invariant for a shared suffix) while pushing
# every cross-copy distance past any small threshold — so fuzzy-match
# outputs scale Kx like a real corpus instead of K^2x (identical copies
# of p_name measured 17x wall at 4x: pure output explosion, not plan).
# A 2-char copy tag is appended to EVERY WORD ("red" -> "redbd" in
# copy 1): (a) within-copy pair distances are preserved EXACTLY (the
# tag is constant per copy, so both names of a pair change
# identically — true-pair counts measured exactly linear: 882,168 at
# 4x = 4 x 220,542); (b) every cross-copy pair exceeds tau=2 (both
# tag chars differ between any two copies — c1 = alpha[i], c2 =
# alpha[3i mod 26], both injective for i < 26 — so two 2-word names
# from different copies are >= 4 edits apart). A marker that also
# touched every word INTERIOR was tried (stride-6 interleave) to keep
# segment-blocked join keys copy-distinct, but index-anchored
# insertion warps indel-pair distances (pair count inflated 2.7x) —
# so word interiors stay copy-blind, and segment-join candidate
# growth on TPC-H's saturated two-color-word name space is accepted
# and documented as a data property (verified output stays exactly
# linear).
PERTURB_NAME = {"part": "p_name"}
ROW_GROUP = 65536


def _write(t: pa.Table, path: str) -> None:
    pq.write_table(t, path, row_group_size=ROW_GROUP)


def _scale_plain(src: str, out: str, table: str, k: int) -> None:
    base = pq.read_table(f"{src}/{table}.parquet")
    parts = [base]
    for i in range(1, k):
        t = _shift_keys(base, table, i)
        col = PERTURB_NAME.get(table)
        if col:
            ci = t.schema.get_field_index(col)
            alpha = "abcdefghijklmnopqrstuvwxyz"
            tag = alpha[i % 26] + alpha[(3 * i) % 26]
            vals = [
                None if s is None else " ".join(w + tag for w in s.split(" "))
                for s in t[col].to_pylist()
            ]
            t = t.set_column(ci, col, pa.array(vals, t.schema.field(col).type))
        parts.append(t)
    _write(pa.concat_tables(parts), f"{out}/{table}.parquet")


def _scale_documents(src: str, out: str, k: int) -> None:
    base = pq.read_table(f"{src}/documents.parquet")
    parts = [base]
    texts = base["text"].to_pylist()
    for i in range(1, k):
        pre = f"c{i}_"
        new_texts = [
            None if s is None else " ".join(pre + w for w in s.split(" "))
            for s in texts
        ]
        t = _shift_keys(base, "documents", i)
        ti = t.schema.get_field_index("text")
        t = t.set_column(ti, "text", pa.array(new_texts, pa.string()))
        ni = t.schema.get_field_index("n_chars")
        n_typ = t.schema.field("n_chars").type
        t = t.set_column(
            ni,
            "n_chars",
            pa.array([None if s is None else len(s) for s in new_texts], n_typ),
        )
        parts.append(t)
    _write(pa.concat_tables(parts), f"{out}/documents.parquet")


def _scale_embeddings(src: str, out: str, k: int) -> None:
    base = pq.read_table(f"{src}/embeddings.parquet")
    vecs = np.array(base["embedding"].to_pylist(), dtype=np.float32)
    dim = vecs.shape[1]
    elem = base.schema.field("embedding").type.value_type
    parts = [base]
    for i in range(1, k):
        rng = np.random.default_rng(1000 + i)
        perm = rng.permutation(dim)
        signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
        tv = vecs[:, perm] * signs  # orthogonal map: norms/cosines preserved
        t = _shift_keys(base, "embeddings", i)
        ei = t.schema.get_field_index("embedding")
        t = t.set_column(
            ei, "embedding", pa.array([row.tolist() for row in tv], pa.list_(elem))
        )
        parts.append(t)
    _write(pa.concat_tables(parts), f"{out}/embeddings.parquet")


def main() -> None:
    src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(out, exist_ok=True)
    for table in COPY_AS_IS:
        _write(pq.read_table(f"{src}/{table}.parquet"), f"{out}/{table}.parquet")
    for table in ("customer", "supplier", "part", "orders", "lineitem", "events"):
        _scale_plain(src, out, table, k)
    _scale_documents(src, out, k)
    _scale_embeddings(src, out, k)
    for t in sorted(os.listdir(out)):
        f = pq.ParquetFile(os.path.join(out, t))
        print(t, f.metadata.num_rows)


if __name__ == "__main__":
    main()

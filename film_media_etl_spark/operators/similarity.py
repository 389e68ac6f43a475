"""Similarity search over embedding columns (SURVEY §2.K; PAPERS.md top-k
similarity-search line of work).

- ``cosine_knn_bruteforce``: exact top-k — broadcast the (small) query set
  against the full corpus, TakeOrdered per query. The correctness
  baseline; at 100 TB the corpus side stays partitioned and is scanned
  once, queries ride along broadcast — no corpus shuffle at all.
- ``cosine_knn_lsh``: random-hyperplane LSH bucketing — sign-pattern
  signature restricts candidates to matching buckets, then exact cosine +
  top-k inside. The scale path: bucket join is a plain equi-join.
- ``embedding_near_dup_pairs``: pairwise cosine >= threshold within a
  blocking key (label) — embedding-space near-dup dedup.

Cosine is the deterministic left-fold of functions.vectors — Spark and
the DuckDB oracle agree bitwise, so rankings compare exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, to_double_vec
from ..sources import ensure_parallelism


def cosine_knn_bruteforce(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids_below: int = 8,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (here: ids below
    ``query_ids_below``), excluding self. Deterministic ranking: score
    DESC, neighbor id ASC."""
    base = ensure_parallelism(embeddings).select(
        F.col(id_col).alias("nbr_id"), to_double_vec(F.col(vec_col)).alias("nvec")
    )
    q = embeddings.where(F.col(id_col) < query_ids_below).select(
        F.col(id_col).alias("query_id"), to_double_vec(F.col(vec_col)).alias("qvec")
    )
    scored = (
        base.join(F.broadcast(q), F.col("nbr_id") != F.col("query_id"))
        .select(
            "query_id",
            "nbr_id",
            cosine(F.col("qvec"), F.col("nvec")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "score", "rank")
    )


def _hyperplane_bucket(vec, *, nplanes: int = 8, dim: int = 64):
    """Deterministic random-hyperplane signature: plane p has ±1 entries
    derived from xxhash64(p, i); bucket = integer of sign bits. Pure
    expressions — planes never materialize."""
    def _signed_term(p: int):
        # dot(vec, plane_p) with plane entries sign(hash(p, i))
        return lambda x, i: x * F.when(
            F.xxhash64(F.lit(p), i) % 2 == 0, F.lit(1.0)
        ).otherwise(F.lit(-1.0))

    bucket = F.lit(0)
    for p in range(nplanes):
        proj = F.aggregate(
            F.zip_with(vec, F.sequence(F.lit(0), F.lit(dim - 1)), _signed_term(p)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def cosine_knn_lsh(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids_below: int = 8,
    k: int = 5,
    nplanes: int = 4,
    dim: int = 64,
    probe_hamming: int = 2,
) -> DataFrame:
    """Approximate top-k via MULTI-PROBE hyperplane LSH: each query
    probes its own bucket plus every bucket within Hamming distance
    ``probe_hamming`` (flip 1..h hyperplane bits) — near neighbors that
    land just across one or two hyperplanes are recovered at the cost of
    sum(C(nplanes, i)) extra (tiny) probe rows per query, the standard
    recall/candidate tradeoff (Lv et al. 2007, multi-probe LSH).
    Candidates meet via an equi-join on bucket; exact cosine + rank
    inside. On a uniform-random corpus each plane flips with p ~= 0.5
    for a true neighbor, so expected recall ~= P(Binom(nplanes, .5) <=
    h) — 11/16 ~= 0.69 at the (4, 2) default, vs 5/16 at h=1 (round-3
    advice raised the production floor). Recall is approximate by
    construction -> rows-only correctness check; tests pin a recall
    floor vs brute force. Probe masks are precomputed Python ints
    (Column << int is unsupported in Spark)."""
    import itertools

    with_bucket = ensure_parallelism(embeddings).select(
        F.col(id_col).alias("nbr_id"),
        to_double_vec(F.col(vec_col)).alias("nvec"),
    ).withColumn("bucket", _hyperplane_bucket(F.col("nvec"), nplanes=nplanes, dim=dim))
    probe_masks = [
        sum(1 << i for i in bits)
        for h in range(probe_hamming + 1)
        for bits in itertools.combinations(range(nplanes), h)
    ]
    q = (
        with_bucket.where(F.col("nbr_id") < query_ids_below)
        .select(
            F.col("nbr_id").alias("query_id"),
            F.col("nvec").alias("qvec"),
            F.explode(
                F.array(
                    *[F.col("bucket").bitwiseXOR(F.lit(m)) for m in probe_masks]
                )
            ).alias("qbucket"),
        )
    )
    scored = (
        with_bucket.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("qbucket")) & (F.col("nbr_id") != F.col("query_id")),
        )
        .select("query_id", "nbr_id", cosine(F.col("qvec"), F.col("nvec")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "score", "rank")
    )


def cosine_knn_ivf(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids_below: int = 8,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate kNN: KMeans-partition the corpus
    into ``nlist`` cells, search only each query's ``nprobe`` nearest
    cells with exact cosine + top-k inside.

    The 100 TB posture: training samples the corpus (KMeans fits on a
    distributed aggregate, centroids are tiny driver state), assignment
    is one narrow map, and the probe join is an equi-join on cell id —
    the corpus is never crossed with itself. Recall/latency trades via
    nprobe. Approximate by construction -> rows-only correctness check.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    base = ensure_parallelism(embeddings).select(
        F.col(id_col).alias("nbr_id"), to_double_vec(F.col(vec_col)).alias("nvec")
    )
    ml = base.withColumn("fv", array_to_vector("nvec"))
    if ml.isEmpty():  # KMeans.fit raises on an empty corpus
        return base.sparkSession.createDataFrame(
            [], "query_id long, nbr_id long, score double, rank int"
        )
    model = KMeans(k=nlist, seed=seed, featuresCol="fv", predictionCol="cell").fit(ml)
    assigned = model.transform(ml).select("nbr_id", "nvec", "cell")
    centers = [(i, c.tolist()) for i, c in enumerate(model.clusterCenters())]
    queries = assigned.where(F.col("nbr_id") < query_ids_below).select(
        F.col("nbr_id").alias("query_id"), F.col("nvec").alias("qvec")
    )
    return ivf_probe_topk(assigned, queries, centers, k=k, nprobe=nprobe)


# Query frames broadcast into the cell scans only below this row count.
# Embedding vectors are ~64 doubles (~0.5 KB serialized), and the probe
# explodes each query nprobe ways, so 100k query rows x nprobe 10 is
# ~500 MB of broadcast — the ceiling of a sane driver budget. The
# documented regime is "query batch MUCH smaller than corpus"; above the
# limit the hint drops and AQE plans a shuffled join — slower, never
# fatal (the same guard discipline as dedup_index._BROADCAST_PROBE_ROWS,
# round-5 verdict #5).
_BROADCAST_QUERY_ROWS = 100_000


def ivf_probe_topk(
    cells: DataFrame,
    queries: DataFrame,
    centers: list,
    *,
    k: int = 5,
    nprobe: int = 4,
    broadcast_limit: int = _BROADCAST_QUERY_ROWS,
) -> DataFrame:
    """The ONE IVF probe both the inline op and the persisted index use
    (operators/ann_index.py), so the probe math cannot diverge between
    the two paths whose recall floors are pinned to match. Each query's
    nprobe nearest centroids come from inline literals (centroids are a
    handful of doubles; argsort via an array of (distance, cell) structs
    sorted lexicographically); candidate retrieval is a broadcast
    equi-join of the exploded (query, cell) pairs against the
    cell-assigned corpus — on a cell-PARTITIONED on-disk table Catalyst
    turns that into dynamic partition pruning; exact cosine + windowed
    top-k re-rank inside the probed cells.

    ``cells``: (nbr_id, nvec, cell); ``queries``: (query_id, qvec);
    ``centers``: [(cell_id, [float, ...])]."""

    def _sqdist(vec, center: list[float]):
        lits = F.array(*[F.lit(float(x)) for x in center])
        return F.aggregate(
            F.zip_with(vec, lits, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    probe_cells = F.slice(
        F.transform(
            F.array_sort(
                F.array(
                    *[
                        F.struct(
                            _sqdist(F.col("qvec"), c).alias("d"),
                            F.lit(int(i)).alias("cell"),
                        )
                        for i, c in centers
                    ]
                )
            ),
            lambda s: s["cell"],
        ),
        1,
        nprobe,
    )
    q = queries.withColumn("cell", F.explode(probe_cells))
    # limit(n+1).count() short-circuits: it proves "small enough" by
    # scanning at most broadcast_limit+1 query rows, so a corpus-sized
    # probe frame pays a bounded peek, not a full count, before its
    # broadcast hint is dropped.
    small = queries.limit(broadcast_limit + 1).count() <= broadcast_limit
    q = F.broadcast(q) if small else q
    scored = (
        cells.alias("n")
        .join(
            q.alias("q"),
            (F.col("n.cell") == F.col("q.cell")) & (F.col("n.nbr_id") != F.col("q.query_id")),
        )
        .select(
            "q.query_id", "n.nbr_id", cosine(F.col("q.qvec"), F.col("n.nvec")).alias("score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "score", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.3,
) -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking key."""
    t = embeddings.select(
        F.col(id_col).alias("vid"), F.col(block_col).alias("blk"), to_double_vec(F.col(vec_col)).alias("v")
    )
    return (
        t.alias("a")
        .join(
            t.alias("b"),
            (F.col("a.blk") == F.col("b.blk")) & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("vec_id_a"),
            F.col("b.vid").alias("vec_id_b"),
            F.col("a.blk").alias("label"),
            cosine(F.col("a.v"), F.col("b.v")).alias("score"),
        )
        .where(F.col("score") >= threshold)
    )


def cosine_knn_pq(
    embeddings: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids_below: int = 8,
    k: int = 5,
    m: int = 8,
    codebook_k: int = 16,
    rerank: int = 4,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Product-quantization ANN (the FAISS-style compression path).

    The 100 TB problem PQ solves is STORAGE-BANDWIDTH, not candidate
    generation: scanning raw float vectors is dim*4 bytes/row; PQ codes
    are ``m`` bytes/row (here 8 vs 256 — 32x less scan I/O). Pipeline:

      1. Normalize (cosine -> monotone in L2 over unit vectors).
      2. Split into ``m`` subvectors; per subspace fit a ``codebook_k``-
         centroid KMeans (distributed fit, centroids are tiny driver
         state — m*codebook_k*dim/m doubles).
      3. Encode the corpus once: codes = array<int> of m bytes. At scale
         this column is what the warehouse stores and scans.
      4. Query side: build the asymmetric-distance table (query
         subvector vs every centroid per subspace — m*codebook_k doubles,
         inlined as literal arrays) and score each code row with m
         element_at lookups + adds. No float vector is touched.
      5. Exact re-rank of the top ``rerank*k`` by true cosine — the
         standard accuracy backstop; touches only rerank*k raw vectors
         per query.

    Approximate by construction -> rows-only driver check; tests pin a
    recall floor vs brute force. Uniform random fixture embeddings are
    the PQ worst case (no subspace structure), so the floor is loose.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    sub = dim // m
    base = embeddings.select(
        F.col(id_col).alias("nbr_id"), to_double_vec(F.col(vec_col)).alias("raw")
    )
    norm = F.sqrt(
        F.aggregate(F.col("raw"), F.lit(0.0), lambda a, x: a + x * x)
    )
    unit = base.select(
        "nbr_id", F.transform("raw", lambda x: x / norm).alias("v")
    )
    if unit.isEmpty():
        return base.sparkSession.createDataFrame(
            [], "query_id long, nbr_id long, score double, rank int"
        )

    # per-subspace codebooks: m small distributed fits; sliced feature col
    sub_cols = [
        F.slice("v", s * sub + 1, sub).alias(f"s{s}") for s in range(m)
    ]
    sliced = unit.select("nbr_id", "v", *sub_cols).cache()
    codebooks: list[list[list[float]]] = []
    encoded = sliced
    for s in range(m):
        ml = encoded.withColumn("_fv", array_to_vector(f"s{s}"))
        model = KMeans(
            k=codebook_k, seed=seed + s, featuresCol="_fv", predictionCol=f"c{s}"
        ).fit(ml)
        codebooks.append([c.tolist() for c in model.clusterCenters()])
        encoded = model.transform(ml).drop("_fv")
    codes = encoded.select(
        "nbr_id", "v", F.array(*[F.col(f"c{s}") for s in range(m)]).alias("code")
    )

    # asymmetric distance: for each query, per-subspace table of
    # ||q_s - centroid||^2, inlined as literals; approx dist = sum of
    # table lookups by code byte
    queries = sliced.where(F.col("nbr_id") < query_ids_below).select(
        F.col("nbr_id").alias("query_id"), F.col("v").alias("qvec"), *[
            F.col(f"s{s}").alias(f"qs{s}") for s in range(m)
        ],
    )

    def _tbl(s: int):
        # array<double>[codebook_k]: squared L2 from query subvector s to
        # each centroid (centroids are literals; the subtraction runs on
        # the query's subvector column)
        cents = codebooks[s]
        return F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        F.col(f"qs{s}"),
                        F.array(*[F.lit(float(x)) for x in c]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                for c in cents
            ]
        )

    qt = queries.select(
        "query_id", "qvec", *[_tbl(s).alias(f"t{s}") for s in range(m)]
    )
    adc = None
    for s in range(m):
        term = F.element_at(f"t{s}", F.element_at("code", s + 1) + 1)
        adc = term if adc is None else adc + term
    scored = (
        codes.join(F.broadcast(qt), F.col("nbr_id") != F.col("query_id"))
        .select("query_id", "qvec", "nbr_id", "v", adc.alias("approx_d2"))
    )
    w_pre = Window.partitionBy("query_id").orderBy(F.asc("approx_d2"), F.asc("nbr_id"))
    shortlist = scored.withColumn("prerank", F.row_number().over(w_pre)).where(
        F.col("prerank") <= rerank * k
    )
    # exact re-rank on unit vectors: cosine == dot
    dot = F.aggregate(
        F.zip_with("qvec", "v", lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("nbr_id"))
    return (
        shortlist.withColumn("score", dot)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "nbr_id", "score", "rank")
    )

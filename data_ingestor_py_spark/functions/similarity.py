"""Deduplication + similarity search primitives over documents/embeddings.

Scale-first shapes:
- exact dedup: hash-groupBy on sha256(text) — one shuffle, map-side combine;
- n-gram Jaccard: set ops on shingle arrays, all codegen;
- MinHash + LSH banding: signature = k independent min-hashes; candidate
  generation = explode band keys + self-join on (band, bandhash) so only
  colliding docs are compared — the O(n^2) pair space never materializes;
- SimHash: 16-bit sign fingerprint, hamming-near buckets;
- ANN: brute-force cosine top-k as the exact baseline; LSH random-hyperplane
  bucketing as the sublinear path (buckets shrink the candidate set ~2^P x).

All hash constants are module-level so the DuckDB oracle SQL embeds the
same numbers — signatures match bit-for-bit across engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from data_ingestor_py_spark.functions.expr import let_
from data_ingestor_py_spark.functions.text import HASH_MOD, token_hash, tokens

# Deterministic affine minhash coefficients (seeded, fixed at authoring time).
MINHASH_COEFFS = [
    (1664525, 1013904223), (22695477, 1), (1103515245, 12345), (134775813, 1),
    (214013, 2531011), (69069, 1234567), (1103515245, 54321), (999331, 7777777),
]
SIMHASH_BITS = 16


def shingles(text_col: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles (distinct). 1-based element_at for DuckDB parity.

    Guarded: Spark ``sequence(1, 0)`` would generate a DESCENDING sequence,
    so documents shorter than ``n`` tokens explicitly yield no shingles.
    """
    empty = F.array().cast("array<string>")

    def body(toks: Column) -> Column:
        sh = F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k) for k in range(n)]),
        )
        return F.array_distinct(F.when(F.size(toks) >= n, sh).otherwise(empty))

    return let_(tokens(text_col), body)


def jaccard(a: Column, b: Column) -> Column:
    """|A ∩ B| / |A ∪ B| over distinct-element arrays."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = (F.size(a) + F.size(b)).cast("double") - inter
    return F.when(union > 0, inter / union).otherwise(F.lit(0.0))


def minhash_signature(text_col: str | Column, k: int | None = None) -> Column:
    """k min-hashes over the distinct shingle set: min((a*h + b) % P).

    let_-bound so tokenize/shingle/sha256 each run once per row, not once
    per coefficient."""
    coeffs = MINHASH_COEFFS[: (k or len(MINHASH_COEFFS))]

    def body(hs: Column) -> Column:
        return F.array(*[
            F.array_min(F.transform(hs, lambda h: (F.lit(a) * h + F.lit(b)) % HASH_MOD))
            for a, b in coeffs
        ])

    hashed = let_(shingles(text_col), lambda sh: F.transform(sh, lambda s: token_hash(s) % HASH_MOD))
    return let_(hashed, body)


def simhash(text_col: str | Column, bits: int = SIMHASH_BITS) -> Column:
    """Sign-of-sum fingerprint: bit j set iff more token hashes have bit j
    set than not. Order-insensitive, locality-sensitive for bag overlap."""
    def _vote(j: int):
        return lambda acc, h: acc + (F.shiftright(h, j) % 2) * 2 - 1

    def body(hashed: Column) -> Column:
        parts = []
        for j in range(bits):
            vote = F.aggregate(hashed, F.lit(0).cast("long"), _vote(j))
            parts.append(F.when(vote > 0, F.lit(2 ** j)).otherwise(F.lit(0)))
        out = parts[0]
        for p in parts[1:]:
            out = out + p
        return out.cast("long")

    return let_(F.transform(tokens(text_col), lambda t: token_hash(t)), body)


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: canonical doc per identical content = min id per
    sha256(text). Hash-groupBy, no window."""
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("content_sha256"), F.col(id_col))
        .groupBy("content_sha256")
        .agg(F.min(id_col).alias("canonical_id"), F.count("*").alias("n_copies"))
    )


def _lsh_bands(
    df: DataFrame, text_col: str, id_col: str, bands: int, rows_per_band: int
) -> DataFrame:
    """(id, band, bh) exploded band keys for the minhash signature."""
    k = bands * rows_per_band
    sig = minhash_signature(text_col, k)
    with_sig = df.select(F.col(id_col).alias("id"), sig.alias("sig"))
    # docs with no shingles have NULL signatures — excluded (matches the
    # SQL oracle, where NULL band keys never join)
    with_sig = with_sig.where(F.element_at("sig", 1).isNotNull())
    return with_sig.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(",", *[F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                                       for r in range(rows_per_band)]).alias("bh"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("id", "bk.band", "bk.bh")


def lsh_band_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    bands: int = 4, rows_per_band: int = 2, max_band_size: int = 10_000,
) -> DataFrame:
    """Monitoring companion to :func:`minhash_lsh_candidates`: per
    (band, bh) member counts with an ``is_hot`` flag at ``max_band_size``
    — the oversize-band stat an operator watches to see how much of the
    corpus is mass-duplicated boilerplate (the known LSH failure mode at
    crawl scale)."""
    b = _lsh_bands(df, text_col, id_col, bands, rows_per_band)
    return b.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("n")).select(
        "band", "bh", "n", (F.col("n") > max_band_size).alias("is_hot")
    )


def minhash_lsh_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    bands: int = 4, rows_per_band: int = 2,
    max_band_size: int | None = 10_000,
) -> DataFrame:
    """LSH banding: docs sharing any band of the minhash signature become a
    candidate pair. Returns (id_a, id_b) with id_a < id_b, distinct.

    Scale shape: explode to (band_id, band_hash, id), self-join on the
    band key — shuffle is O(n * bands), never O(n^2) ... EXCEPT inside a
    single degenerate band group: a web-crawl corpus with millions of
    byte-identical boilerplate docs puts them all in one (band, bh) group
    and the self-join goes quadratic within it. ``max_band_size`` guards
    that: groups larger than the cap emit STAR edges (every member paired
    with the group's min id — O(s) edges) instead of the full clique
    (O(s^2)). Members of one band group are mutual candidates by
    construction, so the star preserves connected components exactly
    (near-dup clustering downstream is unchanged); only the redundant
    within-group pair enumeration is dropped. Hot groups are near-certain
    exact duplicates — route the corpus through :func:`exact_dedup` first
    to shrink them, and watch :func:`lsh_band_stats` for how often the
    guard engages. ``max_band_size=None`` disables the guard (the
    all-pairs contract, e.g. for oracle comparison on bounded corpora).

    NOTE (r7): calling this function EAGERLY materializes the banded
    keys (one local checkpoint — the signature pass would otherwise run
    once per self-join side and once for the star branch). Checkpoint
    blocks are not recomputable: an executor loss during the downstream
    job fails the query instead of recomputing — rerun it. The blocks
    are freed when the returned frame is garbage-collected.
    """
    band = _lsh_bands(df, text_col, id_col, bands, rows_per_band)
    star = None
    if max_band_size is not None:
        # group size and hub come from ONE window over the same (band, bh)
        # partitioning the self-join shuffles on anyway — the guard costs a
        # sort, not extra scans/joins (the first version used a separate
        # aggregation + three joins and doubled the query's wall time)
        w = Window.partitionBy("band", "bh")
        band = band.select(
            "id", "band", "bh",
            F.count(F.lit(1)).over(w).alias("_n"),
            F.min("id").over(w).alias("_hub"),
        )
        # materialize the windowed band keys once (eager local checkpoint,
        # auto-GC'd like the graph op's): the star branch and BOTH
        # self-join sides are separate plan branches, and Catalyst does
        # not dedupe the shared subtree — each would re-run the full
        # minhash-signature pass over the corpus (r7 plan audit: the sig
        # expression appeared 3x in the physical plan)
        band = band.localCheckpoint(eager=True)
        star = band.where(
            (F.col("_n") > max_band_size) & (F.col("id") != F.col("_hub"))
        ).select(F.col("_hub").alias("id_a"), F.col("id").alias("id_b"))
        band = band.where(F.col("_n") <= max_band_size)
        band = band.select("id", "band", "bh")
    else:
        # same dedupe for the two self-join sides in the uncapped mode
        band = band.localCheckpoint(eager=True)
    left = band.alias("l")
    right = band.alias("r")
    pairs = (
        left.join(right, ["band", "bh"])
        .where(F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs.distinct()


def minhash_near_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    threshold: float = 0.5, bands: int = 4, rows_per_band: int = 2,
    max_band_size: int | None = None,
) -> DataFrame:
    """Candidates from LSH, verified by exact Jaccard on shingles.

    ``max_band_size`` defaults to ``None`` here — the ALL-PAIRS contract
    (ADVICE r5: the cap must be opted into at the pair-emitting surface,
    not silently weaken existing callers' recall). Opting in matters when
    the hot-band guard engages (a (band, bh) group exceeds the cap): only
    the group's STAR edges are verified, so if the hub happens to be a
    band-hash collision outlier dissimilar to the rest, the group's true
    near-dup pairs are not emitted (they were never candidates). The cap
    stays default-on in :func:`minhash_lsh_candidates`, whose star edges
    preserve connected components exactly — the clustering consumer is
    unaffected by it. Hot bands are overwhelmingly exact duplicates in
    practice — run :func:`exact_dedup` first so they never form, and
    watch :func:`lsh_band_stats` for how often groups go hot.

    NOTE (r7): calling this function EAGERLY runs the banding join and
    candidate enumeration (local checkpoints — the alternative executed
    the signature/shingle expressions up to five times per corpus row);
    the Jaccard verify stage then shingles only candidate documents.
    See :func:`minhash_lsh_candidates` for the checkpoint trade-offs."""
    # pair-scale; materialized so the candidate-id set and the two
    # verify joins below don't each re-run the banding join
    cands = minhash_lsh_candidates(
        df, text_col, id_col, bands, rows_per_band, max_band_size
    ).localCheckpoint(eager=True)
    # shingle ONLY candidate documents, once: the corpus-wide a/b shingle
    # branches of the first version computed the shingle expression twice
    # over every document; verification only ever reads candidate ids
    need = (
        cands.select(F.col("id_a").alias("_nid"))
        .unionByName(cands.select(F.col("id_b").alias("_nid")))
        .distinct()
    )
    sh_need = (
        df.join(need, F.col(id_col) == F.col("_nid"), "left_semi")
        .select(F.col(id_col).alias("id"), shingles(text_col).alias("sh"))
        .localCheckpoint(eager=True)
    )
    a = sh_need.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh_need.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(a, "id_a").join(b, "id_b")
        .select("id_a", "id_b", jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# ---------------- embedding similarity ----------------


def cosine(u: Column, v: Column) -> Column:
    """Cosine over array<float> columns, computed in double."""
    dot = F.aggregate(
        F.zip_with(u, v, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nu = F.sqrt(F.aggregate(u, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    nv = F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))
    return dot / (nu * nv)


def topk_cosine(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k: broadcast the (small) query set against the
    corpus, rank per query. Returns (query_id, neighbor_id, rank)."""
    q = F.broadcast(queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = q.join(c, F.col("query_id") != F.col("neighbor_id")).select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def lsh_hyperplane_bucket(vec_col: str | Column, planes: int = 8, dims: int = 64) -> Column:
    """Random-hyperplane LSH bucket id: bit p = sign(dot(v, plane_p)) where
    plane_p[i] = ±1 derived from sha256(p,i) — deterministic, no stored
    model. Buckets shrink ANN candidate sets ~2^planes x."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bits = []
    for p in range(planes):
        signs = F.array(*[
            F.lit(1.0) if int(__import__("hashlib").sha256(f"{p}:{i}".encode()).hexdigest()[:8], 16) % 2
            else F.lit(-1.0)
            for i in range(dims)
        ])
        dot = F.aggregate(
            F.zip_with(v, signs, lambda a, s: a.cast("double") * s),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        bits.append(F.when(dot > 0, F.lit(2 ** p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def _sha_init_centroids(
    corpus: DataFrame, n: int, id_col: str, vec_col: str, seed: int
) -> list[dict]:
    """Deterministic centroid init shared by ivf_topk and kmeans_refine:
    the ``n`` corpus rows whose id hashes lowest under the engine-portable
    sha-prefix hash (ties -> smallest id). The DuckDB oracles mirror this
    rule verbatim, so it must stay the single source of truth."""
    h = F.conv(
        F.substring(
            F.sha2(F.concat(F.lit(f"{seed}:"), F.col("cid").cast("string")), 256), 1, 8
        ),
        16, 10,
    ).cast("long")
    rows = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .withColumn("_h", h)
        .orderBy("_h", "cid")
        .limit(n)
        .drop("_h")
        .collect()  # n rows — model-scale, the "broadcast the model" pattern
    )
    return [{"cid": r["cid"], "cv": r["cv"]} for r in rows]


# Above this many centroids, plan-literal assignment (k x dims F.lit's per
# row expression) hits Catalyst plan-size / codegen walls; switch to the
# Arrow path, which ships the centroid matrix in a pandas-UDF closure.
LITERAL_ASSIGN_MAX_K = 256


def _arrow_cells_udf(cents: list[dict], n_out: int, metric: str, id_dtype):
    """Centroid assignment for LARGE k (IVF-production k = 2^12..2^16):
    the centroid matrix rides the pandas-UDF closure and each Arrow batch
    is assigned with one numpy matmul — zero joins, zero Exchange, plan
    size independent of k. (A broadcast-join + min_by re-aggregation would
    need an n-row Exchange to argmin across joined rows; this path has
    none at all.)

    Tie-break parity with the literal fold: centroids are pre-sorted by
    cid and ``argsort(kind='stable')`` keeps first-seen order on ties, so
    the rule is (metric, cid asc) on both paths. NOT bit-parity-grade:
    numpy's pairwise-summed matmul can differ from the sequential Catalyst
    fold in the last ulp, so oracle-exact gates keep the literal path and
    this one is recall/exhaustive-probe tested (tests/test_ivf_large_k.py).
    """
    from pyspark.sql.types import ArrayType

    order = sorted(range(len(cents)), key=lambda i: cents[i]["cid"])
    cids = np.asarray([cents[i]["cid"] for i in order], dtype=object)
    M = np.asarray([[float(x) for x in cents[i]["cv"]] for i in order], dtype=np.float64)
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
    M2 = (M * M).sum(axis=1)

    @F.pandas_udf(ArrayType(id_dtype))
    def assign(vs: pd.Series) -> pd.Series:
        V = np.asarray(vs.tolist(), dtype=np.float64)
        if metric == "cosine":
            Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-300)
            S = -(Vn @ Mn.T)  # ascending sort == cosine desc
        else:  # squared L2 (kmeans assignment); + |v|^2 is rank-invariant
            S = M2[None, :] - 2.0 * (V @ M.T)
        idx = np.argsort(S, axis=1, kind="stable")[:, :n_out]
        return pd.Series([cids[row].tolist() for row in idx])

    return assign


def centroid_rows_to_model(centroid_df: DataFrame) -> list[tuple]:
    """Convert :func:`kmeans_refine`'s (cell, pos, val) rows into the
    ``[(cid, [vector...])]`` model shape :func:`ivf_topk` accepts as its
    trained quantizer. Model-scale collect (k x dims rows)."""
    by_cell: dict = {}
    for r in centroid_df.collect():
        by_cell.setdefault(r["cell"], {})[r["pos"]] = r["val"]
    return [
        (cid, [vals[p] for p in range(len(vals))])
        for cid, vals in sorted(by_cell.items())
    ]


def ivf_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5, n_lists: int = 16,
    n_probe: int = 2, id_col: str = "vec_id", vec_col: str = "embedding",
    seed: int = 42, centroids: list[tuple] | None = None,
    assignment: str = "auto",
) -> DataFrame:
    """IVF (inverted-file) ANN: partition the corpus into ``n_lists`` cells
    around centroid vectors; a query scans only its ``n_probe`` nearest
    cells.

    Scale shape: centroids are a tiny broadcast model; assignment is a
    broadcast cross-join + argmin (one narrow pass over the corpus, no
    shuffle beyond the final per-query top-k); the probed join prunes the
    candidate set ~n_lists/n_probe x.

    ``centroids`` plugs in a TRAINED quantizer as ``[(cid, [vector...])]``
    — typically ``centroid_rows_to_model(kmeans_refine(corpus, ...))``,
    the full train-then-search IVF pipeline. Without it, centroids default
    to the corpus rows whose id hashes lowest (sha-prefix — deterministic
    and engine-portable, so the DuckDB oracle picks identical ones).

    ``assignment``: 'literal' embeds the centroids as plan literals (fast,
    bit-parity with the SQL oracle; k x dims literals — small k only),
    'arrow' ships them in a pandas-UDF closure (plan size independent of
    k; see :func:`_arrow_cells_udf`), 'auto' picks literal for
    k <= LITERAL_ASSIGN_MAX_K and arrow beyond.
    """
    import math

    from data_ingestor_py_spark.functions.expr import let_

    if centroids is None:
        cents = _sha_init_centroids(corpus, n_lists, id_col, vec_col, seed)
    else:
        cents = [{"cid": cid, "cv": cv} for cid, cv in centroids]

    def _py_norm(vec: list[float]) -> float:
        # replicate the Catalyst fold bit-for-bit: sequential double
        # accumulation in element order, then sqrt
        acc = 0.0
        for x in vec:
            acc = acc + float(x) * float(x)
        return math.sqrt(acc)

    def cell_struct_expr(vc: str, n: int):
        """top-n (cell, by cosine desc, cid asc) as a PURE per-row expression:
        fold the centroid list per row — zero shuffle, the corpus-assignment
        stage the r1 window version shuffled corpus x n_lists rows for.
        The sort uses an explicit comparator (cos desc, cid asc) so centroid
        ids of ANY orderable type work — string vec_ids included (a negated
        numeric tie-break would fail at plan-build time for those)."""
        v = F.col(vc)

        def with_norm(norm_v):
            entries = []
            for r in cents:
                cv = [float(x) for x in r["cv"]]
                litv = F.array(*[F.lit(x) for x in cv])
                dot = F.aggregate(
                    F.zip_with(v, litv, lambda a, b: a.cast("double") * b),
                    F.lit(0.0), lambda acc, x: acc + x,
                )
                cos = dot / (norm_v * F.lit(_py_norm(cv)))
                entries.append(F.struct(cos.alias("cos"), F.lit(r["cid"]).alias("cid")))

            def cmp(a, b):
                return (
                    F.when(a["cos"] > b["cos"], F.lit(-1))
                    .when(a["cos"] < b["cos"], F.lit(1))
                    .when(a["cid"] < b["cid"], F.lit(-1))
                    .when(a["cid"] > b["cid"], F.lit(1))
                    .otherwise(F.lit(0))
                )

            return F.slice(F.array_sort(F.array(*entries), cmp), 1, n)

        norm_v = F.sqrt(
            F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
        )
        return let_(norm_v, with_norm)

    use_arrow = assignment == "arrow" or (
        assignment == "auto" and len(cents) > LITERAL_ASSIGN_MAX_K
    )
    cid_dtype = corpus.schema[id_col].dataType

    def assign_cells(df: DataFrame, idc: str, vc: str, n: int, out: str) -> DataFrame:
        if use_arrow:
            udf = _arrow_cells_udf(cents, n, "cosine", cid_dtype)
            return df.select(idc, vc, F.explode(udf(F.col(vc))).alias(out))
        return df.select(
            idc, vc, F.explode(cell_struct_expr(vc, n)).alias("_s")
        ).select(idc, vc, F.col("_s")["cid"].alias(out))

    corpus_cells = assign_cells(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv2")),
        "neighbor_id", "cv2", 1, "cell",
    )
    query_cells = assign_cells(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        "query_id", "qv", n_probe, "cell",
    )
    scored = (
        F.broadcast(query_cells)
        .join(corpus_cells, "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv2")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def embedding_near_duplicates(
    df: DataFrame, threshold: float = 0.99, planes: int = 4, dims: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket the vectors once
    (each vector lands in exactly ONE composite bucket, so a pair is
    emitted at most once), equi-join within buckets, verify with exact
    cosine >= threshold. O(n x avg-bucket) candidates, never O(n^2) — the
    embedding analogue of the MinHash banding join. Exact duplicates always
    share a bucket, so recall for true copies is 1.0; near-misses across a
    hyperplane are the usual LSH trade-off (raise ``planes`` for precision,
    repeat with rotated planes for recall).

    NOTE (r7): calling this function EAGERLY materializes the bucketed
    vectors once (local checkpoint) so the hyperplane projection is not
    computed per self-join side; see :func:`minhash_lsh_candidates` for
    the checkpoint trade-offs."""
    b = lsh_hyperplane_bucket(vec_col, planes, dims)
    # materialized once: both self-join sides are separate plan branches,
    # so the hyperplane bucket (planes x dims dot products per vector)
    # would otherwise be computed twice over the corpus
    t = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), b.alias("b")
    ).localCheckpoint(eager=True)
    a = t.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "b")
    c = t.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "b")
    return (
        a.join(c, "b")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def ann_lsh_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5, planes: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding", dims: int = 64,
) -> DataFrame:
    """Approximate top-k: compare only within the query's LSH bucket."""
    bucket = lsh_hyperplane_bucket(vec_col, planes, dims)
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), bucket.alias("b"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), bucket.alias("b"))
    scored = q.join(c, "b").where(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    broadcast_set: bool = False,
) -> DataFrame:
    """Benchmark/test-set decontamination: flag corpus documents that share
    any word ``n``-gram with an evaluation set (the GPT-3-style overlap
    filter training pipelines run before every pretraining job).

    Returns (id, n_contaminated, is_clean) for every corpus document —
    downstream drops ``~is_clean`` or routes them to audit.

    Scale shape (default): explode corpus shingles -> BROADCAST hash join
    against the benchmark's distinct n-grams (eval sets are tiny next to a
    100 TB corpus) -> count per doc -> join back. The broadcast hash
    relation is built ONCE per executor; the only corpus shuffles are the
    per-doc count and the count-to-doc join, both keyed on the id.
    ``broadcast_set=True`` instead collects the grams into one array and
    intersects per row — zero shuffle, but the per-row set probe rebuilds
    the array's hash set for EVERY document (measured 2.6x slower at 15k
    benchmark grams), so it only pays for benchmark sets of a few hundred
    grams."""
    bench_grams = benchmark.select(
        F.explode(shingles(bench_text_col, n)).alias("g")
    ).distinct()
    sh = shingles(text_col, n)
    if broadcast_set:
        bset = F.broadcast(bench_grams.agg(F.collect_set("g").alias("_bg")))
        hits = F.size(F.array_intersect(sh, F.col("_bg")))
        return corpus.crossJoin(bset).select(
            id_col,
            hits.alias("n_contaminated"),
            (hits == 0).alias("is_clean"),
        )
    exploded = corpus.select(F.col(id_col), F.explode(sh).alias("g"))
    counts = (
        exploded.join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    joined = corpus.join(counts, id_col, "left")
    n_cont = F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("int")
    return joined.select(
        id_col, n_cont.alias("n_contaminated"), (n_cont == 0).alias("is_clean")
    )


def kmeans_refine(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    assignment: str = "auto",
) -> DataFrame:
    """Lloyd refinement of IVF centroids as DataFrame ops — the 'train the
    coarse quantizer' step a real IVF deployment runs before ivf_topk.

    Each iteration: (1) assign every vector to its nearest centroid with a
    pure per-row expression over the BROADCAST centroid literals (squared
    L2, folded in element order — zero shuffle, same shape as ivf_topk's
    assignment); (2) update centroids as per-dimension means via ONE
    posexplode + groupBy(cell, dim) aggregation whose sums are EXACT: each
    float32 component is scaled by 2^45 (exact in float64 — float32 values
    with exponent >= -22 become integers) and summed as DECIMAL(38,0), so
    the sum is order-insensitive with NO rounding anywhere (a DECIMAL(38,12)
    cast would round to 12 digits, and round-half ties on binary fractions
    resolve differently across engines — observed at 5k vectors). The mean
    is thus a pure function of the assignment, not of partitioning;
    collected driver-side as the next round's model (k x dims scalars —
    model-scale). Cells that lose all points keep their previous centroid.

    Deterministic end-to-end: initial centroids are the k corpus rows with
    the smallest engine-portable sha-prefix hash (ivf_topk's rule), so the
    whole refinement is exactly reproducible in SQL. Returns one row per
    (cell, dim): ``(cell, pos, val)`` with 0-based ``pos``; the ``cell``
    column carries the corpus id column's own type (string ids work — the
    same ids ivf_topk accepts).

    ``assignment`` mirrors :func:`ivf_topk`: 'literal' (bit-parity plan
    literals, small k), 'arrow' (numpy matmul in a pandas-UDF closure,
    k-independent plan — the large-k path), 'auto' switches at
    LITERAL_ASSIGN_MAX_K.
    """
    spark = corpus.sparkSession
    init = _sha_init_centroids(corpus, k, id_col, vec_col, seed)
    if not init:
        raise ValueError(
            f"kmeans_refine: corpus has no rows in {id_col}/{vec_col} — "
            "cannot initialize centroids"
        )
    cents = [(r["cid"], [float(x) for x in r["cv"]]) for r in init]
    dims = len(cents[0][1])

    def assign_expr(cent_list):
        v = F.col(vec_col)
        entries = []
        for cid, cv in cent_list:
            litv = F.array(*[F.lit(x) for x in cv])
            d = F.aggregate(
                F.zip_with(v, litv, lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)),
                F.lit(0.0), lambda acc, x: acc + x,
            )
            entries.append(F.struct(d.alias("dist"), F.lit(cid).alias("cid")))

        def cmp(a, b):
            return (
                F.when(a["dist"] < b["dist"], F.lit(-1))
                .when(a["dist"] > b["dist"], F.lit(1))
                .when(a["cid"] < b["cid"], F.lit(-1))
                .when(a["cid"] > b["cid"], F.lit(1))
                .otherwise(F.lit(0))
            )

        return F.element_at(F.array_sort(F.array(*entries), cmp), 1)["cid"]

    use_arrow = assignment == "arrow" or (
        assignment == "auto" and len(cents) > LITERAL_ASSIGN_MAX_K
    )
    cid_dtype = corpus.schema[id_col].dataType

    for _ in range(iters):
        if use_arrow:
            udf = _arrow_cells_udf(
                [{"cid": cid, "cv": cv} for cid, cv in cents], 1, "l2", cid_dtype
            )
            assigned = corpus.select(
                udf(F.col(vec_col))[0].alias("cell"), F.col(vec_col)
            )
        else:
            assigned = corpus.select(assign_expr(cents).alias("cell"), F.col(vec_col))
        scale = float(2 ** 45)
        stats = (
            assigned.select("cell", F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(
                F.sum((F.col("x").cast("double") * F.lit(scale)).cast("decimal(38,0)")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()  # k * dims rows — model-scale driver iteration
        )
        means: dict = {}
        for r in stats:
            means.setdefault(r["cell"], {})[r["pos"]] = float(r["s"]) / scale / r["n"]
        cents = [
            (cid, [means[cid][p] for p in range(dims)]) if cid in means else (cid, cv)
            for cid, cv in cents
        ]
    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    rows = [(cid, p, cv[p]) for cid, cv in cents for p in range(dims)]
    schema = StructType([
        StructField("cell", cid_dtype),  # corpus id type — string ids work
        StructField("pos", IntegerType()),
        StructField("val", DoubleType()),
    ])
    return spark.createDataFrame(rows, schema)

"""Text/similarity/dedup/join function semantics on the driver testdata."""

import hashlib

from pyspark.sql import functions as F

from data_ingestor_py_spark.functions import similarity as S
from data_ingestor_py_spark.functions import text as T
from data_ingestor_py_spark.functions.content import normalize_content, table_state_hash
from data_ingestor_py_spark.operators.dedup import latest_by_key, salted_latest_by_key
from data_ingestor_py_spark.operators.join import dict_lookup
from tests.conftest import SF_DIR


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_token_hash_matches_python_sha(spark):
    df = spark.createDataFrame([("tok",)], "t string").select(T.token_hash(F.col("t")).alias("h"))
    expect = int(hashlib.sha256(b"tok").hexdigest()[:8], 16)
    assert df.first()["h"] == expect


def test_shingles_short_docs_empty(spark):
    df = spark.createDataFrame([("a b",), ("a b c",), ("a b c d",)], "text string")
    got = [r[0] for r in df.select(F.size(S.shingles("text"))).collect()]
    assert got == [0, 1, 2]


def test_jaccard_bounds_and_identity(spark):
    df = spark.createDataFrame([("x y z w",)], "text string").select(
        S.shingles("text").alias("sh")
    )
    j = df.select(S.jaccard(F.col("sh"), F.col("sh")).alias("j")).first()["j"]
    assert j == 1.0


def test_minhash_approximates_jaccard(spark):
    """Identical docs share full signatures; disjoint docs share none."""
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "q r s t u v")],
        "doc_id long, text string",
    ).select("doc_id", S.minhash_signature("text").alias("sig"))
    rows = {r["doc_id"]: r["sig"] for r in df.collect()}
    assert rows[1] == rows[2]
    assert sum(a == b for a, b in zip(rows[1], rows[3])) <= 2


def test_lsh_finds_near_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base + " tail"
    df = spark.createDataFrame(
        [(i, base) for i in range(3)] + [(10, near), (20, "completely different words entirely here")],
        "doc_id long, text string",
    )
    pairs = S.minhash_near_duplicates(df, threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert {(0, 1), (0, 2), (1, 2)} <= got
    assert all(20 not in p for p in got)


def test_simhash_similar_docs_close(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "alpha beta gamma delta epsilon eta"),
         (3, "one two three four five six")],
        "doc_id long, text string",
    ).select("doc_id", S.simhash("text").alias("h"))
    rows = {r["doc_id"]: r["h"] for r in df.collect()}
    d12 = bin(rows[1] ^ rows[2]).count("1")
    d13 = bin(rows[1] ^ rows[3]).count("1")
    assert d12 < d13


def test_topk_cosine_self_is_excluded_and_ranked(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = S.topk_cosine(emb.where("vec_id < 3"), emb, k=4).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for q, rows in per_q.items():
        assert sorted(r[0] for r in rows) == [1, 2, 3, 4]
        assert all(n != q for _, n in rows)


def test_language_id_accuracy_on_en(spark):
    """The generator's docs use an English-ish vocabulary; en-labeled docs
    should mostly be predicted en (heuristic sanity, not a model test)."""
    out = T.language_id(_docs(spark))
    en = out.where("true_lang = 'en'")
    acc = en.where("pred_lang = 'en'").count() / max(en.count(), 1)
    assert acc > 0.5


def test_quality_metrics_shapes(spark):
    out = T.quality_metrics(_docs(spark)).collect()
    for r in out[:50]:
        assert r["n_tokens_rx"] >= r["n_punct"]
        assert 0 <= r["n_stop_distinct"] <= 10


def test_dedup_latest_vs_salted_identical(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    a = latest_by_key(ev, ["user_id"], "event_id")
    b = salted_latest_by_key(ev, ["user_id"], "event_id", salt_buckets=7)
    assert table_state_hash(a) == table_state_hash(b)


def test_dict_lookup_broadcast_plan(spark):
    """J1: the dictionary join must be a BroadcastHashJoin, not a
    sort-merge shuffle."""
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    nat = spark.read.parquet(f"{SF_DIR}/nation.parquet").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    out = dict_lookup(cust, nat, "c_nationkey")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert out.count() == cust.count()  # left join keeps all facts


def test_normalize_content_pandas_udf(spark):
    df = spark.createDataFrame([("a \r\nb  \n",), (None,)], "content string")
    out = [r[0] for r in df.select(normalize_content("content")).collect()]
    assert out[0] == "a\nb\n"
    assert out[1] is None


def test_exact_dedup_counts(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "other")], "doc_id long, text string"
    )
    out = {r["canonical_id"]: r["n_copies"] for r in S.exact_dedup(df).collect()}
    assert out == {1: 2, 3: 1}

def test_ivf_recall_vs_bruteforce(spark):
    """IVF with generous probes must recover most exact neighbors."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {(r["query_id"], r["neighbor_id"])
             for r in S.topk_cosine(emb.where("vec_id < 5"), emb, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in S.ivf_topk(emb.where("vec_id < 5"), emb, k=5, n_lists=8, n_probe=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall


def test_embedding_near_duplicates_finds_injected_copies(spark, sf_dir):
    """LSH-bucketed cosine near-dup: exact copies always share a bucket, so
    every injected duplicate pair is recovered; random 64-dim vectors never
    reach the 0.99 threshold, so precision is clean too."""
    from pyspark.sql import functions as F

    from data_ingestor_py_spark.functions.similarity import embedding_near_duplicates

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select("vec_id", "embedding")
    copies = emb.where("vec_id < 10").select(
        (F.col("vec_id") + 50000).alias("vec_id"), "embedding"
    )
    pairs = embedding_near_duplicates(emb.unionByName(copies), threshold=0.99).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == {(i, i + 50000) for i in range(10)}
    assert all(r["cos"] >= 0.99 for r in pairs)


def test_connected_components_chains_and_singletons(spark):
    """Min-label propagation must traverse multi-hop chains (transitive
    near-dup clusters), keep singletons self-labeled, and converge."""
    from data_ingestor_py_spark.operators.graph import connected_components

    verts = spark.createDataFrame([(i,) for i in range(10)], "id long")
    # chain 0-1-2-3 (diameter 3), pair 5-6, singletons 4,7,8,9
    edges = spark.createDataFrame(
        [(1, 0), (1, 2), (2, 3), (5, 6)], "src long, dst long"
    )
    got = {r["id"]: r["component"] for r in connected_components(verts, edges).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 7, 8: 8, 9: 9}


def test_pack_sequences_invariants(spark, sf_dir):
    from data_ingestor_py_spark.functions.text import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = pack_sequences(docs, budget_tokens=64, shards=8)
    rows = out.collect()
    assert len(rows) == docs.count()  # every doc assigned exactly once
    for r in rows:
        assert 0 <= r["offset_in_pack"] < 64  # start offset inside budget
        assert r["pack_id"] // 2**32 == r["shard"]  # globally unique ids
    # content-stable: input partitioning must not move docs between packs
    re_pack = pack_sequences(docs.repartition(7), budget_tokens=64, shards=8)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, re_pack.collect()))


def test_stratified_sample_fixed_determinism(spark, sf_dir):
    from data_ingestor_py_spark.functions.text import stratified_sample_fixed

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = stratified_sample_fixed(docs, k=10).collect()
    b = stratified_sample_fixed(docs.repartition(5), k=10).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_lang = {}
    for r in a:
        per_lang.setdefault(r["lang"], 0)
        per_lang[r["lang"]] += 1
    assert all(v == 10 for v in per_lang.values())


def test_stratified_sample_rate_is_a_pure_filter(spark, sf_dir):
    from data_ingestor_py_spark.functions.text import stratified_sample_rate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = stratified_sample_rate(docs, rate=0.3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle at all
    n, total = out.count(), docs.count()
    assert 0.15 * total < n < 0.45 * total  # ~rate, deterministic


def test_remove_high_df_tokens_preserves_order(spark, sf_dir):
    from data_ingestor_py_spark.functions.text import remove_high_df_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = remove_high_df_tokens(docs, max_df=0.75)
    joined = out.join(docs, "doc_id").collect()
    assert len(joined) == docs.count()
    removed_any = False
    for r in joined:
        orig = [t for t in r["text"].split(" ") if t]
        kept = [t for t in r["clean_text"].split(" ") if t]
        assert len(orig) - len(kept) == r["n_removed"]
        removed_any |= r["n_removed"] > 0
        # kept tokens appear in original order (subsequence check)
        it = iter(orig)
        assert all(t in it for t in kept)
    assert removed_any  # the word-soup corpus has high-df tokens


def test_decontaminate_paths_agree_and_flag_benchmark(spark, sf_dir):
    from data_ingestor_py_spark.functions.similarity import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where("doc_id % 25 = 0")
    a = decontaminate(docs, bench, n=8, broadcast_set=False).collect()
    b = decontaminate(docs, bench, n=8, broadcast_set=True).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    flagged = {r["doc_id"] for r in a if not r["is_clean"]}
    bench_ids = {r["doc_id"] for r in bench.select("doc_id").collect()}
    # every benchmark doc long enough to have 8-grams must flag itself
    assert bench_ids <= flagged
    assert len(flagged) < docs.count()  # but not everything is contaminated


def test_kmeans_refine_deterministic_and_improving(spark, sf_dir):
    from data_ingestor_py_spark.functions.similarity import kmeans_refine

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = kmeans_refine(emb, k=4, iters=2).collect()
    b = kmeans_refine(emb.repartition(7), k=4, iters=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # partition-stable
    assert len(a) == 4 * len(emb.first()["embedding"])

    # refinement must not increase total within-cluster SSE vs the initial
    # sha-selected centroids (Lloyd monotonicity)
    def sse(cent_rows):
        cents = {}
        for cell, pos, val in ((r["cell"], r["pos"], r["val"]) for r in cent_rows):
            cents.setdefault(cell, {})[pos] = val
        clist = [[v[p] for p in range(len(v))] for v in cents.values()]
        total = 0.0
        for row in emb.collect():
            vec = [float(x) for x in row["embedding"]]
            total += min(sum((x - c) ** 2 for x, c in zip(vec, cv)) for cv in clist)
        return total

    zero = kmeans_refine(emb, k=4, iters=0).collect()  # initial centroids
    assert sse(a) <= sse(zero) + 1e-9


def test_ivf_topk_with_trained_centroids(spark, sf_dir):
    """Full train-then-search IVF: kmeans_refine centroids plug into
    ivf_topk; results are deterministic and recall vs exact brute force on
    the probed corpus stays reasonable."""
    from data_ingestor_py_spark.functions.similarity import (
        centroid_rows_to_model,
        ivf_topk,
        kmeans_refine,
        topk_cosine,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = centroid_rows_to_model(kmeans_refine(emb, k=8, iters=2))
    assert len(model) == 8 and all(len(cv) > 0 for _, cv in model)
    queries = emb.where("vec_id < 8")
    got = ivf_topk(queries, emb, k=5, n_probe=3, centroids=model).collect()
    again = ivf_topk(queries, emb, k=5, n_probe=3, centroids=model).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in topk_cosine(queries, emb, k=5).collect()
    }
    approx = {(r["query_id"], r["neighbor_id"]) for r in got}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall  # probed-cell ANN keeps most true neighbors


def test_lsh_hot_band_guard_caps_candidates(spark):
    """A mass-duplicated corpus (the web-crawl boilerplate failure mode)
    must NOT go quadratic inside its band group: the guard emits star
    edges (O(s)) instead of the clique (O(s^2)), while preserving the
    connected components exactly (VERDICT r4 'What's wrong' #3)."""
    from data_ingestor_py_spark.operators.graph import connected_components

    boiler = "copyright footer terms of service all rights reserved contact us"
    n_dup = 120
    rows = [(i, boiler) for i in range(n_dup)]
    rows += [(1000, "a genuinely unique document about owls and lakes"),
             (1001, "a genuinely unique document about owls and ponds")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    guarded = S.minhash_lsh_candidates(df, max_band_size=50)
    unguarded = S.minhash_lsh_candidates(df, max_band_size=None)
    n_g, n_u = guarded.count(), unguarded.count()
    # clique over 120 dups is 7140 pairs; the star is 119 (+ the owl pair)
    assert n_u >= n_dup * (n_dup - 1) // 2
    assert n_g < 3 * n_dup  # O(n), not O(n^2)

    # components identical under either edge set
    verts = df.select(F.col("doc_id").alias("id"))

    def comps(pairs):
        e = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        out = connected_components(verts, e)
        return {(r["id"], r["component"]) for r in out.collect()}

    assert comps(guarded) == comps(unguarded)


def test_lsh_band_stats_flags_hot_groups(spark):
    boiler = "copyright footer terms of service all rights reserved contact us"
    rows = [(i, boiler) for i in range(60)] + [(99, "something else entirely unique here today")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    stats = S.lsh_band_stats(df, max_band_size=50).collect()
    hot = [r for r in stats if r["is_hot"]]
    assert hot and all(r["n"] == 60 for r in hot)
    assert all(r["n"] <= 50 for r in stats if not r["is_hot"])

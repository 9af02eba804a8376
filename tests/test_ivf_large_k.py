"""Large-k IVF: beyond LITERAL_ASSIGN_MAX_K centroids the assignment ships
the centroid matrix in an Arrow pandas-UDF closure instead of k x dims plan
literals (which hit Catalyst plan-size/codegen walls at IVF-production k).

Verification strategy: the literal path is oracle-exact (driver gates), so
the arrow path is validated against IT at small k (identical assignments on
tie-free data), and at k=4096 by the exhaustive-probe identity: probing ALL
cells must reproduce brute-force top-k exactly, whatever the quantizer did.
"""

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.functions.similarity import (
    LITERAL_ASSIGN_MAX_K,
    ivf_topk,
    kmeans_refine,
    topk_cosine,
)


def _synth(spark, n: int, dims: int = 8):
    """Deterministic synthetic embeddings (hash-derived, no randomness)."""
    vec = F.array(*[
        (F.pmod(F.xxhash64(F.col("vec_id"), F.lit(i)), F.lit(2001)) / 1000.0 - 1.0)
        .cast("double")
        for i in range(dims)
    ])
    return spark.range(n).select(F.col("id").alias("vec_id"), vec.alias("embedding"))


def test_arrow_assignment_matches_literal_at_small_k(spark):
    """Cross-validate the arrow kernel against the oracle-exact literal
    fold: same corpus, same centroids, k below the switch point, forced
    down each path — cell assignments must be identical (hash-derived
    vectors make distance ties to DISTINCT centroids impossible at double
    precision)."""
    emb = _synth(spark, 500)
    lit = ivf_topk(emb.where("vec_id < 5"), emb, k=5, n_lists=8, n_probe=3,
                   assignment="literal")
    arr = ivf_topk(emb.where("vec_id < 5"), emb, k=5, n_lists=8, n_probe=3,
                   assignment="arrow")
    assert sorted(map(tuple, lit.collect())) == sorted(map(tuple, arr.collect()))


def test_exhaustive_probe_at_k4096_equals_brute_force(spark):
    """k=4096 cells (auto -> arrow path), probing ALL of them: the candidate
    set is the whole corpus, so the result must equal exact brute-force
    top-k — validates the full large-k plumbing end-to-end."""
    emb = _synth(spark, 6000)
    queries = emb.where("vec_id < 3")
    exact = topk_cosine(queries, emb, k=5)
    ivf = ivf_topk(queries, emb, k=5, n_lists=4096, n_probe=4096)
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, ivf.collect()))


def test_large_k_partial_probe_recall(spark):
    """Realistic probe fraction at large k: n_probe = 256 of 4096 cells must
    still recover most true neighbors (sha-init quantizer, uniform synthetic
    data — recall well above the 256/4096 random-scan baseline)."""
    emb = _synth(spark, 6000)
    queries = emb.where("vec_id < 8")
    exact = {(r["query_id"], r["neighbor_id"]) for r in topk_cosine(queries, emb, k=5).collect()}
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(queries, emb, k=5, n_lists=4096, n_probe=256).collect()
    }
    recall = len(exact & got) / len(exact)
    assert recall >= 0.5, f"recall {recall} at 1/16 probe fraction"


def test_large_k_corpus_assignment_plan_has_no_exchange(spark):
    """The arrow assignment is a narrow map stage: no Exchange, no join —
    plan size independent of k (the property the literal path loses at
    large k)."""
    emb = _synth(spark, 200)
    cents = [(int(i), [float(i % 7) + 0.25 * d for d in range(8)])
             for i in range(LITERAL_ASSIGN_MAX_K + 10)]
    from data_ingestor_py_spark.functions.similarity import _arrow_cells_udf
    from pyspark.sql.types import LongType

    udf = _arrow_cells_udf(
        [{"cid": c, "cv": v} for c, v in cents], 1, "cosine", LongType()
    )
    assigned = emb.select("vec_id", F.explode(udf(F.col("embedding"))).alias("cell"))
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan or "PythonUDF" in plan.replace("ArrowEval", "")
    assert assigned.count() == 200


def test_kmeans_refine_auto_switches_to_arrow_at_large_k(spark):
    """kmeans_refine at k > LITERAL_ASSIGN_MAX_K must train without plan
    blowup and return k x dims centroid rows."""
    emb = _synth(spark, 2000)
    k = LITERAL_ASSIGN_MAX_K + 44  # 300
    out = kmeans_refine(emb, k=k, iters=1).collect()
    assert len(out) == k * 8
    cells = {r["cell"] for r in out}
    assert len(cells) == k


@pytest.mark.parametrize("path", ["literal", "arrow"])
def test_kmeans_assignment_paths_agree(spark, path):
    """Both assignment paths, same decimal-exact mean pipeline: identical
    centroids on tie-free data (one run per path; compared via the stored
    module-level stash to avoid recomputing the literal side twice)."""
    emb = _synth(spark, 800)
    rows = sorted(map(tuple, kmeans_refine(emb, k=8, iters=2, assignment=path).collect()))
    stash = test_kmeans_assignment_paths_agree.__dict__.setdefault("results", {})
    stash[path] = rows
    if len(stash) == 2:
        assert stash["literal"] == stash["arrow"]

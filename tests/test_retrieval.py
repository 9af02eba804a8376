"""BM25 retrieval + incrementally-maintained inverted index
(functions/retrieval.py, plans/mv.py row_transform).

Covers: hand-checked BM25 arithmetic on a tiny corpus, ln/sqrt flavor
ranking agreement, maintained df/totals == full recompute across
insert/update/delete batches (the row_transform retraction algebra),
index-backed scoring == corpus-scan scoring, and the broadcast/no-extra-
shuffle plan shape.
"""

import math

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.functions.retrieval import (
    IncrementalIndex,
    bm25_topk,
    corpus_totals,
    doc_postings,
    term_dfreq,
)


CORPUS = [
    (1, "spark merge table scan merge"),
    (2, "table scan fast index"),
    (3, "merge merge merge queue"),
    (4, "window sort order window"),
    (5, "spark window"),
]


def _docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_postings_and_stats(spark):
    docs = _docs(spark)
    post = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in doc_postings(docs).collect()
    }
    assert post[(1, "merge")] == (2, 5)
    assert post[(3, "merge")] == (3, 4)
    dfreq = {r["term"]: r["df"] for r in term_dfreq(docs).collect()}
    assert dfreq["merge"] == 2 and dfreq["spark"] == 2 and dfreq["queue"] == 1
    assert corpus_totals(docs) == (5, 5 + 4 + 4 + 4 + 2)


def test_bm25_ln_matches_hand_formula(spark):
    docs = _docs(spark)
    got = {
        (r["query_id"], r["doc_id"]): r
        for r in bm25_topk(docs, {"q": ["merge"]}, k=5).collect()
    }
    N, L = 5, 19
    avgdl = L / N

    def score(tf, dl, df):
        idf = math.log(1.0 + (N - df + 0.5) / (df + 0.5))
        return idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    # doc 3: tf=3 dl=4; doc 1: tf=2 dl=5; df(merge)=2
    assert got[("q", 3)]["rank"] == 1
    assert got[("q", 1)]["rank"] == 2
    assert got[("q", 3)]["score"] == pytest.approx(score(3, 4, 2), rel=1e-12)
    assert got[("q", 1)]["score"] == pytest.approx(score(2, 5, 2), rel=1e-12)
    assert set(got) == {("q", 3), ("q", 1)}  # only docs containing the term


def test_sqrt_flavor_is_exact_integer_ratio_times_sqrt(spark):
    docs = _docs(spark)
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(docs, {"q": ["merge"]}, k=5, idf="sqrt").collect()
    }
    N, L = 5, 19

    def score(tf, dl, df):
        idf = math.sqrt((2 * N - 2 * df + 1) / (2 * df + 1))
        return idf * ((22 * tf * L) / (10 * tf * L + 3 * L + 9 * dl * N))

    assert got[3] == score(3, 4, 2)  # EXACT equality — the portable claim
    assert got[1] == score(2, 5, 2)
    with pytest.raises(ValueError):
        bm25_topk(docs, {"q": ["merge"]}, idf="sqrt", k1=2.0)
    with pytest.raises(ValueError):
        bm25_topk(docs, {"q": ["merge"]}, idf="nope")


def test_multi_term_fold_and_rank_determinism(spark):
    docs = _docs(spark)
    out1 = bm25_topk(docs, {"q": ["spark", "window"]}, k=5).collect()
    out2 = bm25_topk(docs, {"q": ["window", "spark", "spark"]}, k=5).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))  # dedup/sort of query terms
    by_doc = {r["doc_id"]: r for r in out1}
    assert by_doc[5]["n_terms_hit"] == 2  # spark + window
    assert by_doc[4]["n_terms_hit"] == 1


def _mk_doc_table(spark, tmp_path):
    from data_ingestor_py_spark.plans.target import TargetTable

    return TargetTable.create(
        spark, str(tmp_path / "docs"),
        key_cols=["doc_id"], columns=[("text", "string")], num_buckets=4,
    )


def _batch(spark, rows, seq0):
    return spark.createDataFrame(
        [
            (str(i), t, seq0 + j, "D" if t is None else "U", None)
            for j, (i, t) in enumerate(rows)
        ],
        "doc_id string, text string, _seq long, _op string, _ts timestamp",
    )


def test_incremental_index_tracks_updates_and_deletes(spark, tmp_path):
    t = _mk_doc_table(spark, tmp_path)
    idx = IncrementalIndex.create(spark, str(tmp_path / "idx"), t)

    t.merge_apply(_batch(spark, CORPUS, 0), stats="light")
    idx.refresh()
    assert idx.totals() == (5, 19)

    # update doc 1 (drops a 'merge', adds 'btree'), delete doc 4
    t.merge_apply(
        _batch(spark, [(1, "spark merge table scan btree"), (4, None)], 100),
        stats="light",
    )
    idx.refresh()

    live = t.read().select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    want_df = {r["term"]: r["df"] for r in term_dfreq(live).collect()}
    got_df = {r["term"]: r["df"] for r in idx.dfreq().collect()}
    assert got_df == want_df
    assert got_df["btree"] == 1
    assert got_df["window"] == 1  # doc 4 deleted; doc 5 still has it
    assert idx.totals() == corpus_totals(live)


def test_index_backed_scoring_equals_corpus_scan(spark, tmp_path):
    t = _mk_doc_table(spark, tmp_path)
    idx = IncrementalIndex.create(spark, str(tmp_path / "idx"), t)
    t.merge_apply(_batch(spark, CORPUS, 0), stats="light")
    t.merge_apply(_batch(spark, [(2, "fast index scan probe"), (3, None)], 50), stats="light")
    idx.refresh()
    live = t.read().select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    queries = {"a": ["scan", "merge"], "b": ["spark", "index"]}
    direct = sorted(map(tuple, bm25_topk(live, queries, k=5).collect()))
    via_idx = sorted(map(tuple, idx.bm25_topk(queries, k=5).collect()))
    assert direct == via_idx


def test_refresh_schedule_independence(spark, tmp_path):
    """Folding per batch vs once at the end lands on identical stats."""
    t1 = _mk_doc_table(spark, tmp_path / "a")
    i1 = IncrementalIndex.create(spark, str(tmp_path / "ia"), t1)
    t2 = _mk_doc_table(spark, tmp_path / "b")
    i2 = IncrementalIndex.create(spark, str(tmp_path / "ib"), t2)
    batches = [
        _batch(spark, CORPUS, 0),
        _batch(spark, [(1, "alpha beta"), (5, None)], 100),
        _batch(spark, [(6, "beta gamma beta")], 200),
    ]
    for b in batches:
        t1.merge_apply(b, stats="light")
        i1.refresh()  # per batch
        t2.merge_apply(b, stats="light")
    i2.refresh()  # once
    a = sorted(map(tuple, i1.dfreq().collect()))
    b = sorted(map(tuple, i2.dfreq().collect()))
    assert a == b
    assert i1.totals() == i2.totals()


def test_plan_shape_broadcast_and_no_python(spark):
    docs = _docs(spark)
    plan = (
        bm25_topk(docs, {"q": ["merge", "scan"]}, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "WindowGroupLimit" in plan  # top-k pushdown, no global sort

"""Round-6 ADVICE regression tests.

1. (medium) analyze() over a dir whose written schema yields an EMPTY
   stats name map must leave the bucket readable — covered in
   tests/test_metadata_plane.py::test_empty_stats_name_map_dir_is_read_not_pruned.
2. (low) IncrementalTopK: a retracted member whose TIEBREAK identity is
   NULL must trigger group re-aggregation, not ghost in the view.
3. (low) minhash_near_duplicates defaults to the all-pairs contract
   (max_band_size=None) — the hot-band cap is opt-in at the verified-
   pair surface.
4. (low) ExpectationSet.quality() on a batch whose clean frame never ran
   an action (empty-batch short-circuit) returns a zeroed report instead
   of blocking forever.
"""

import inspect
import threading

from pyspark.sql import functions as F

import data_ingestor_py_spark.functions.similarity as S
from data_ingestor_py_spark.plans.expectations import Expectation, ExpectationSet
from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.plans.topk_mv import IncrementalTopK


def test_topk_null_tiebreak_member_deletion_reaggregates(spark, tmp_path):
    """A stored member with a NULL tiebreak key (legal: TargetTable allows
    NULL keys, and tiebreak defaults to the source keys) is deleted while
    TYING the stored boundary value: _ties_or_beats alone yields NULL
    (filtered as false) and the member would ghost. The NULL-item guard
    must force re-aggregation and promote the outsider."""
    src = TargetTable.create(
        spark, str(tmp_path / "src"),
        key_cols=["id"],
        columns=[("grp", "string"), ("score", "double")],
        num_buckets=4,
    )
    tk = IncrementalTopK.create(
        spark, str(tmp_path / "topk"), src,
        group_cols=["grp"], order_col="score", k=3,
        tiebreak_cols=[("id", "string")],
    )
    ddl = "id string, grp string, score double, _seq long, _op string, _ts timestamp"
    src.merge_apply(
        spark.createDataFrame(
            [
                ("9", "a", 9.0, 0, "U", None),
                ("8", "a", 8.0, 1, "U", None),
                # NULL-id member TIES the outsider's value; ASC NULLS FIRST
                # puts it at rank 3 — the stored boundary row
                (None, "a", 4.0, 2, "U", None),
                ("5", "a", 4.0, 3, "U", None),
            ],
            ddl,
        ),
        stats="light",
    )
    tk.refresh()
    got = sorted(map(tuple, tk.read().collect()))
    assert [(r[1], r[2]) for r in got] == [(1, "9"), (2, "8"), (3, None)]
    # delete the NULL-keyed member
    src.merge_apply(
        spark.createDataFrame([(None, None, None, 100, "D", None)], ddl),
        stats="light",
    )
    tk.refresh()
    got = sorted(map(tuple, tk.read().collect()))
    want = sorted(map(tuple, tk.recompute().collect()))
    assert got == want
    assert [(r[1], r[2]) for r in got] == [(1, "9"), (2, "8"), (3, "5")]


def test_minhash_near_duplicates_defaults_to_all_pairs(spark):
    sig = inspect.signature(S.minhash_near_duplicates)
    assert sig.parameters["max_band_size"].default is None
    # 30 identical docs form one hot band per band id; the default must
    # verify every pair (the all-pairs contract), not just star edges
    docs = spark.createDataFrame(
        [(f"doc_{i:02d}", "the same boilerplate text repeated here") for i in range(30)],
        "doc_id string, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in S.minhash_near_duplicates(docs, threshold=0.9).collect()
    }
    assert len(pairs) == 30 * 29 // 2
    assert ("doc_10", "doc_11") in pairs  # a non-hub pair a star would drop
    # the candidate surface keeps the cap default-on (star edges preserve
    # components for the clustering consumer)
    csig = inspect.signature(S.minhash_lsh_candidates)
    assert csig.parameters["max_band_size"].default == 10_000


def test_expectations_quality_on_unconsumed_empty_batch(spark):
    exps = ExpectationSet(
        [
            Expectation("val_pos", "val > 0", "warn"),
            Expectation("id_set", "id IS NOT NULL", "drop"),
        ]
    )
    empty = spark.createDataFrame([], "id string, val long")
    # case A: clean frame consumed (action ran over zero rows)
    clean, obs = exps.apply(empty, batch_id=1)
    n = clean.count()
    q = exps.quality(obs, rows_retained=n)
    assert q.rows_in == 0 and q.violations == {"val_pos": 0, "id_set": 0}
    # case B: caller short-circuited — no action ever ran on clean; the
    # report must come back zeroed promptly, never block
    _, obs2 = exps.apply(empty, batch_id=2)
    out = {}

    def run():
        out["q"] = exps.quality(obs2, rows_retained=0)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(30)
    assert not t.is_alive(), "quality() blocked on an unfilled observation"
    assert out["q"].rows_in == 0 and out["q"].quarantined == 0
    assert out["q"].violations == {"val_pos": 0, "id_set": 0}


def test_expectations_still_exact_on_nonempty_after_guard(spark):
    """The non-blocking guard must not skew real counts."""
    exps = ExpectationSet([Expectation("val_pos", "val > 0", "drop")])
    df = spark.createDataFrame(
        [("a", 1), ("b", -1), ("c", None)], "id string, val long"
    )
    clean, obs = exps.apply(df, batch_id=3)
    n = clean.count()
    q = exps.quality(obs, rows_retained=n)
    assert (q.rows_in, q.rows_retained, q.violations["val_pos"]) == (3, 1, 2)

"""Incremental per-group TOP-K views (plans/topk_mv.py).

The invariant everywhere: after any fold schedule, read() ==
recompute() exactly — membership, ranks, values, and vacated-rank
tombstones. Covers insert-only fast path, boundary-rule retractions
(member deletion, member value drop, group shrink below k), group
migration, tie handling via tiebreak, schedule independence, the
fold/checkpoint crash gap, and reseed.
"""

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.plans.topk_mv import IncrementalTopK


def _mk_source(spark, tmp_path):
    return TargetTable.create(
        spark, str(tmp_path / "src"),
        key_cols=["id"],
        columns=[("grp", "string"), ("score", "double")],
        num_buckets=4,
    )


def _mk_topk(spark, tmp_path, src, k=3):
    return IncrementalTopK.create(
        spark, str(tmp_path / "topk"), src,
        group_cols=["grp"], order_col="score", k=k,
        tiebreak_cols=[("id", "string")],
    )


def _apply(spark, t, rows, seq0):
    df = spark.createDataFrame(
        [
            (str(i), g, v, seq0 + j, "D" if g is None else "U", None)
            for j, (i, g, v) in enumerate(rows)
        ],
        "id string, grp string, score double, _seq long, _op string, _ts timestamp",
    )
    t.merge_apply(df, stats="light")


def _check(tk):
    got = sorted(map(tuple, tk.read().collect()))
    want = sorted(map(tuple, tk.recompute().collect()))
    assert got == want
    return got


def test_insert_only_fast_path(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    tk = _mk_topk(spark, tmp_path, src)
    _apply(spark, src, [(i, "a", float(i)) for i in range(1, 6)], 0)
    tk.refresh()
    got = _check(tk)
    assert [r[1:3] for r in got] == [(1, "5"), (2, "4"), (3, "3")]
    # new leader splices in without touching the source
    _apply(spark, src, [(9, "a", 100.0)], 100)
    tk.refresh()
    got = _check(tk)
    assert got[0][1:4] == (1, "9", 100.0)
    assert len(got) == 3


def test_retraction_of_member_promotes_outsider(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    tk = _mk_topk(spark, tmp_path, src)
    _apply(spark, src, [(i, "a", float(i)) for i in range(1, 7)], 0)  # 1..6
    tk.refresh()
    _apply(spark, src, [(6, None, None)], 100)  # delete the leader
    tk.refresh()
    got = _check(tk)
    # 5,4,3 now — 3 was OUTSIDE the stored top-k before the fold
    assert [r[2] for r in got] == ["5", "4", "3"]


def test_member_value_drop_reorders(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    tk = _mk_topk(spark, tmp_path, src)
    _apply(spark, src, [(i, "a", float(i)) for i in range(1, 6)], 0)
    tk.refresh()
    _apply(spark, src, [(5, "a", 0.5)], 100)  # leader crashes to the bottom
    tk.refresh()
    got = _check(tk)
    assert [r[2] for r in got] == ["4", "3", "2"]


def test_group_shrinks_below_k_tombstones_ranks(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    tk = _mk_topk(spark, tmp_path, src)
    _apply(spark, src, [(1, "a", 1.0), (2, "a", 2.0), (3, "a", 3.0)], 0)
    tk.refresh()
    _apply(spark, src, [(2, None, None), (3, None, None)], 100)
    tk.refresh()
    got = _check(tk)
    assert len(got) == 1 and got[0][1:4] == (1, "1", 1.0)
    # group disappears entirely
    _apply(spark, src, [(1, None, None)], 200)
    tk.refresh()
    assert _check(tk) == []


def test_group_migration_retracts_and_inserts(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    tk = _mk_topk(spark, tmp_path, src, k=2)
    _apply(spark, src, [(1, "a", 9.0), (2, "a", 8.0), (3, "b", 7.0)], 0)
    tk.refresh()
    _apply(spark, src, [(1, "b", 9.0)], 100)  # leader hops a->b
    tk.refresh()
    got = _check(tk)
    by_grp = {}
    for g, rank, i, v in got:
        by_grp.setdefault(g, []).append(i)
    assert by_grp == {"a": ["2"], "b": ["1", "3"]}


def test_ties_break_on_id_deterministically(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    tk = _mk_topk(spark, tmp_path, src, k=2)
    _apply(spark, src, [(7, "a", 5.0), (3, "a", 5.0), (9, "a", 5.0)], 0)
    tk.refresh()
    got = _check(tk)
    assert [r[2] for r in got] == ["3", "7"]  # ASC id among equal scores


def test_schedule_independence(spark, tmp_path):
    batches = [
        [(i, "g" + str(i % 3), float(i * 7 % 23)) for i in range(30)],
        [(i, "g" + str(i % 4), float(i * 11 % 19)) for i in range(0, 30, 2)],
        [(i, None, None) for i in range(0, 30, 5)],
        [(i, "g1", float(i)) for i in range(40, 50)],
    ]
    a_src = _mk_source(spark, tmp_path / "a")
    a = _mk_topk(spark, tmp_path / "a", a_src)
    b_src = _mk_source(spark, tmp_path / "b")
    b = _mk_topk(spark, tmp_path / "b", b_src)
    for n, rows in enumerate(batches):
        _apply(spark, a_src, rows, n * 1000)
        a.refresh()  # per batch
        _apply(spark, b_src, rows, n * 1000)
    b.refresh()  # once at the end
    assert _check(a) == _check(b)


def test_crash_between_fold_and_checkpoint_rolls_forward(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    tk = _mk_topk(spark, tmp_path, src)
    _apply(spark, src, [(i, "a", float(i)) for i in range(1, 6)], 0)
    tk.refresh()
    _apply(spark, src, [(9, "a", 50.0), (5, None, None)], 100)

    # crash INSIDE refresh: fold merge committed, checkpoint not
    real_commit = tk.cp.commit
    calls = {"n": 0}

    def boom(rec):
        calls["n"] += 1
        raise OSError("injected crash before checkpoint commit")

    tk.cp.commit = boom
    with pytest.raises(OSError):
        tk.refresh()
    tk.cp.commit = real_commit
    assert calls["n"] == 1

    # resume: roll-forward must NOT re-fold (a re-fold would duplicate
    # the inserted member via the fast path) — state equals recompute
    rec = tk.refresh()
    got = _check(tk)
    assert got[0][1:4] == (1, "9", 50.0)
    assert tk.synced_version() == src._load()["version"]
    assert rec is None or rec.src_offset_start >= 0


def test_reseed_bootstrap_and_gap_recovery(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    _apply(spark, src, [(i, "a", float(i)) for i in range(10)], 0)
    _apply(spark, src, [(i, "b", float(i)) for i in range(5)], 100)
    tk = _mk_topk(spark, tmp_path, src)
    tk.reseed()  # attach to an already-populated table
    _check(tk)
    _apply(spark, src, [(99, "b", 77.0)], 200)
    tk.refresh()  # incremental resumes after reseed
    got = _check(tk)
    assert ("b", 1, "99", 77.0) in got


def test_null_value_member_retraction_no_ghost(spark, tmp_path):
    """A stored member with NULL order value (group below k, NULLs fill
    trailing ranks) must disappear when its source row is deleted — the
    boundary comparator alone would yield NULL and skip the reagg
    (review finding)."""
    src = _mk_source(spark, tmp_path)
    tk = _mk_topk(spark, tmp_path, src)  # k=3
    _apply(spark, src, [(1, "a", 5.0), (2, "a", None), (3, "a", 1.0)], 0)
    tk.refresh()
    got = _check(tk)
    assert len(got) == 3  # NULL-val row holds the last rank
    _apply(spark, src, [(2, None, None)], 100)  # delete the NULL-val member
    tk.refresh()
    got = _check(tk)
    assert [r[2] for r in got] == ["1", "3"]
    # NULL stored boundary + non-null retraction also reaggs
    _apply(spark, src, [(4, "a", None)], 200)
    tk.refresh()
    _check(tk)
    _apply(spark, src, [(1, None, None)], 300)
    tk.refresh()
    got = _check(tk)
    assert [r[2] for r in got] == ["3", "4"]

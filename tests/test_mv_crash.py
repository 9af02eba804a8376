"""Crash-idempotence of the MV refresh across its two durable writes
(ADVICE r4, high): the aggregate-table merge and the checkpoint commit are
separate objects, and MV deltas are RELATIVE — so a crash between them must
not let the next refresh re-fold the same delta (double-count). The fix
records fold intent in the manifest's app_meta ATOMICALLY with the merge;
refresh() rolls the checkpoint forward on resume instead of re-folding."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.mv import IncrementalAggregate
from data_ingestor_py_spark.plans.replay import replay, split_batches
from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.sources import change_events


def _mkroot(prefix):
    d = tempfile.mkdtemp(prefix=prefix)
    os.rmdir(d)
    return d


def _rows(df):
    return sorted(
        (tuple(r) for r in df.select("lang", "n_rows", "sum_seq").collect()),
        key=lambda t: (t[0] is None, t),
    )


PREP = lambda df, i: df.select("repo", "path", "lang", "content", "_seq", "_op", "_ts")  # noqa: E731


def _mk(spark, n=3000, seed=11):
    t = TargetTable.create(
        spark, _mkroot("mvc-src-"), key_cols=["repo", "path"],
        columns=[("lang", "string"), ("content", "string")], num_buckets=8,
    )
    ev = change_events(spark, n, n_repos=12, paths_per_repo=12, seed=seed)
    mv = IncrementalAggregate.create(
        spark, _mkroot("mvc-agg-"), t,
        group_cols=["lang"], sum_cols=[("sum_seq", "_seq")],
    )
    return t, ev, mv


class _Boom(RuntimeError):
    pass


def _crash_next_cp_commit(mv):
    """Make the NEXT checkpoint commit die AFTER the fold's table merge has
    committed — the exact window ADVICE r4 flagged."""
    real = mv.cp.commit

    def dying(rec):
        mv.cp.commit = real
        raise _Boom("crashed between fold commit and checkpoint commit")

    mv.cp.commit = dying


def test_crash_between_fold_and_checkpoint_does_not_double_count(spark):
    t, ev, mv = _mk(spark)
    batches = split_batches(ev, 3)
    replay(t, batches[:2], prepare=PREP)
    mv.refresh()
    assert _rows(mv.read()) == _rows(mv.recompute())

    replay(t, batches, prepare=PREP)  # applies batch 2
    _crash_next_cp_commit(mv)
    with pytest.raises(_Boom):
        mv.refresh()
    # the fold IS in the aggregate table, but the checkpoint lags
    assert mv.synced_version() < t._load()["version"]

    # resume path: a fresh handle (process restart) must detect the pending
    # fold via app_meta, roll the checkpoint forward, and NOT re-fold
    mv2 = IncrementalAggregate(
        spark, mv.table.root, t, group_cols=["lang"],
        sum_cols=[("sum_seq", "_seq")],
    )
    rec = mv2.refresh()
    assert rec is None  # nothing new to fold — roll-forward only
    assert mv2.synced_version() == t._load()["version"]
    assert _rows(mv2.read()) == _rows(mv2.recompute())


def test_crash_then_more_source_batches_folds_exactly_once(spark):
    """Crash mid-refresh, then MORE source batches land before recovery:
    the recovered refresh must fold only the NEW delta on top of the
    already-applied (pending) one."""
    t, ev, mv = _mk(spark, seed=23)
    batches = split_batches(ev, 4)
    replay(t, batches[:2], prepare=PREP)
    _crash_next_cp_commit(mv)
    with pytest.raises(_Boom):
        mv.refresh()

    replay(t, batches, prepare=PREP)  # batches 2,3 land while MV is wedged
    rec = mv.refresh()
    assert rec is not None and rec.batch_id == t._load()["version"]
    assert _rows(mv.read()) == _rows(mv.recompute())
    # and the state equals an independently-maintained clean MV
    clean = IncrementalAggregate.create(
        spark, _mkroot("mvc-clean-"), t,
        group_cols=["lang"], sum_cols=[("sum_seq", "_seq")],
    )
    clean.refresh()
    assert _rows(mv.read()) == _rows(clean.read())


def test_crash_after_reseed_merge_does_not_refold_old_delta(spark):
    """reseed()'s merge is absolute, but a crash before ITS checkpoint
    commit must not let a later refresh() fold a pre-reseed delta on top."""
    t, ev, mv = _mk(spark, seed=31)
    batches = split_batches(ev, 3)
    replay(t, batches[:1], prepare=PREP)
    mv.refresh()
    replay(t, batches, prepare=PREP)  # MV now lags by 2 versions
    _crash_next_cp_commit(mv)
    with pytest.raises(_Boom):
        mv.reseed()
    # checkpoint still points at the old version; state is already reseeded
    assert mv.synced_version() < t._load()["version"]
    assert mv.refresh() is None  # roll-forward, no re-fold
    assert mv.synced_version() == t._load()["version"]
    assert _rows(mv.read()) == _rows(mv.recompute())


def test_double_crash_in_recovery_window(spark):
    """Crash during the ORIGINAL fold's checkpoint AND during the recovery
    roll-forward's checkpoint: the roll-forward itself must be idempotent."""
    t, ev, mv = _mk(spark, seed=41)
    replay(t, split_batches(ev, 2), prepare=PREP)
    _crash_next_cp_commit(mv)
    with pytest.raises(_Boom):
        mv.refresh()
    _crash_next_cp_commit(mv)  # second crash: during roll-forward commit
    with pytest.raises(_Boom):
        mv.refresh()
    assert mv.refresh() is None
    assert mv.synced_version() == t._load()["version"]
    assert _rows(mv.read()) == _rows(mv.recompute())

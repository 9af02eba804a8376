"""IncrementalDistinct (plans/distinct_mv.py): exact COUNT(DISTINCT x)
maintenance via the aux-multiplicity counting algorithm. Every incremental
state must equal the O(source) recompute exactly, including under deletes
that remove a value's LAST occurrence (the case no self-maintainable
aggregate can handle) and under crashes in any of the three commit gaps."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.distinct_mv import IncrementalDistinct
from data_ingestor_py_spark.plans.replay import replay, split_batches
from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.sources import change_events


def _mkroot(prefix):
    d = tempfile.mkdtemp(prefix=prefix)
    os.rmdir(d)
    return d


PREP = lambda df, i: df.select("repo", "path", "lang", "content", "_seq", "_op", "_ts")  # noqa: E731


def _rows(df):
    return sorted(
        (tuple(r) for r in df.select("lang", "n_distinct").collect()),
        key=lambda t: (t[0] is None, t),
    )


def _mk(spark, n=3000, seed=11):
    t = TargetTable.create(
        spark, _mkroot("dx-src-"), key_cols=["repo", "path"],
        columns=[("lang", "string"), ("content", "string")], num_buckets=8,
    )
    ev = change_events(spark, n, n_repos=12, paths_per_repo=12, seed=seed)
    dx = IncrementalDistinct.create(
        spark, _mkroot("dx-"), t, group_cols=["lang"], value_col="repo",
    )
    return t, ev, dx


class _Boom(RuntimeError):
    pass


def test_per_batch_refresh_equals_recompute(spark):
    t, ev, dx = _mk(spark)
    for b in split_batches(ev, 4):
        t.merge_apply(PREP(b, 0))
        dx.refresh()
        assert _rows(dx.read()) == _rows(dx.recompute())
    assert dx.read().count() > 0


def test_delete_of_last_occurrence_decrements(spark, tmp_path):
    t = TargetTable.create(
        spark, str(tmp_path / "s"), key_cols=["k"],
        columns=[("grp", "string"), ("v", "string")], num_buckets=2,
    )
    dx = IncrementalDistinct.create(
        spark, str(tmp_path / "d"), t, group_cols=["grp"], value_col="v",
    )
    sch = "k string, grp string, v string, _seq long, _op string, _ts timestamp"
    import datetime
    ts = datetime.datetime(2026, 1, 1)
    # two rows share value 'a'; one holds the only 'b'
    t.merge_apply(spark.createDataFrame(
        [("1", "g", "a", 1, "U", ts), ("2", "g", "a", 2, "U", ts),
         ("3", "g", "b", 3, "U", ts)], sch))
    dx.refresh()
    assert _rows_kv(dx) == [("g", 2)]
    # delete one 'a' holder: distinct count unchanged (mult 2 -> 1)
    t.merge_apply(spark.createDataFrame([("1", None, None, 4, "D", ts)], sch))
    dx.refresh()
    assert _rows_kv(dx) == [("g", 2)]
    # delete the LAST 'b' holder: distinct count drops
    t.merge_apply(spark.createDataFrame([("3", None, None, 5, "D", ts)], sch))
    dx.refresh()
    assert _rows_kv(dx) == [("g", 1)]
    # update the remaining 'a' to 'c': a vanishes, c appears
    t.merge_apply(spark.createDataFrame([("2", "g", "c", 6, "U", ts)], sch))
    dx.refresh()
    assert _rows_kv(dx) == [("g", 1)]
    assert sorted(map(tuple, dx.recompute().collect())) == [("g", 1)]
    # group migration: key 2 moves to group h
    t.merge_apply(spark.createDataFrame([("2", "h", "c", 7, "U", ts)], sch))
    dx.refresh()
    assert _rows_kv(dx) == [("h", 1)]
    # delete everything: aggregate drains to zero rows
    t.merge_apply(spark.createDataFrame([("2", None, None, 8, "D", ts)], sch))
    dx.refresh()
    assert dx.read().count() == 0


def _rows_kv(dx):
    return sorted(tuple(r) for r in dx.read().collect())


def test_refresh_schedule_independence(spark):
    t1, ev, dx1 = _mk(spark, seed=7)
    batches = split_batches(ev, 4)
    for b in batches:
        t1.merge_apply(PREP(b, 0))
        dx1.refresh()  # per-batch
    t2 = TargetTable.create(
        spark, _mkroot("dx-src2-"), key_cols=["repo", "path"],
        columns=[("lang", "string"), ("content", "string")], num_buckets=8,
    )
    dx2 = IncrementalDistinct.create(
        spark, _mkroot("dx2-"), t2, group_cols=["lang"], value_col="repo",
    )
    for b in batches:
        t2.merge_apply(PREP(b, 0))
    dx2.refresh()  # one fold over all four batches
    assert _rows(dx1.read()) == _rows(dx2.read()) == _rows(dx2.recompute())


def test_crash_between_agg_commit_and_checkpoint(spark):
    t, ev, dx = _mk(spark)
    batches = split_batches(ev, 3)
    replay(t, batches[:2], prepare=PREP)
    dx.refresh()
    want_mid = _rows(dx.recompute())
    assert _rows(dx.read()) == want_mid

    replay(t, batches, prepare=PREP)
    real = dx.cp.commit

    def dying(rec):
        dx.cp.commit = real
        raise _Boom("agg committed, checkpoint lost")

    dx.cp.commit = dying
    with pytest.raises(_Boom):
        dx.refresh()
    assert dx.synced_version() < t._load()["version"]

    # fresh handle = process restart; must roll forward, never re-fold
    dx2 = IncrementalDistinct(
        spark, os.path.dirname(dx.table.root), t,
        group_cols=["lang"], value_col="repo",
    )
    dx2.refresh()
    assert dx2.synced_version() == t._load()["version"]
    assert _rows(dx2.read()) == _rows(dx2.recompute())
    assert dx2.refresh() is None  # idempotent once synced


def test_crash_between_aux_commit_and_agg_fold(spark):
    t, ev, dx = _mk(spark, seed=3)
    batches = split_batches(ev, 3)
    replay(t, batches[:2], prepare=PREP)
    dx.refresh()

    replay(t, batches, prepare=PREP)
    real = dx._fold_agg

    def dying(*a, **k):
        dx._fold_agg = real
        raise _Boom("aux committed, agg fold lost")

    dx._fold_agg = dying
    with pytest.raises(_Boom):
        dx.refresh()
    # aux is ahead of the checkpoint — the dangerous window: a naive
    # re-fold of the source delta would double-count multiplicities
    assert int(dx.aux.read_app_meta()["src_upto"]) > dx.synced_version()

    dx2 = IncrementalDistinct(
        spark, os.path.dirname(dx.table.root), t,
        group_cols=["lang"], value_col="repo",
    )
    dx2.refresh()
    assert _rows(dx2.read()) == _rows(dx2.recompute())
    assert dx2.synced_version() == t._load()["version"]


def test_reseed_bootstrap_and_gap_recovery(spark):
    t, ev, dx = _mk(spark, seed=5)
    batches = split_batches(ev, 3)
    replay(t, batches, prepare=PREP)
    # bootstrap onto an already-populated source
    dx.reseed()
    assert _rows(dx.read()) == _rows(dx.recompute())
    # incremental refresh continues from the reseed point
    more = change_events(spark, 500, n_repos=12, paths_per_repo=12, seed=99)
    t.merge_apply(PREP(more.withColumn("_seq", F.col("_seq") + 10_000_000), 0))
    dx.refresh()
    assert _rows(dx.read()) == _rows(dx.recompute())
    # reseed is idempotent
    dx.reseed()
    assert _rows(dx.read()) == _rows(dx.recompute())

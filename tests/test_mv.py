"""Incremental materialized-aggregate maintenance (plans/mv.py): the
delta-folded aggregate must equal a full recompute at EVERY refresh point,
under inserts, updates (including group-migrating ones), deletes, NULL
group keys, and any refresh schedule."""

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


def _mk_source(spark, n=6000, seed=7):
    t = TargetTable.create(
        spark, _mkroot("mv-src-"), key_cols=["repo", "path"],
        columns=[("lang", "string"), ("content", "string")], num_buckets=8,
    )
    ev = change_events(spark, n, n_repos=15, paths_per_repo=15, seed=seed)
    return t, ev


PREP = lambda df, i: df.select("repo", "path", "lang", "content", "_seq", "_op", "_ts")  # noqa: E731


def _mk_mv(spark, t):
    return IncrementalAggregate.create(
        spark, _mkroot("mv-agg-"), t,
        group_cols=["lang"], sum_cols=[("sum_seq", "_seq")],
    )


def test_per_batch_refresh_equals_recompute(spark):
    t, ev = _mk_source(spark)
    mv = _mk_mv(spark, t)
    checked = []

    def on_end(i, table, rec):
        mv.refresh()
        checked.append(_rows(mv.read()) == _rows(mv.recompute()))

    replay(t, split_batches(ev, 4), prepare=PREP, on_batch_end=on_end)
    assert len(checked) == 4 and all(checked)
    # refresh with nothing new is a no-op
    assert mv.refresh() is None


def test_refresh_schedule_independence(spark):
    """One catch-up fold over N batches == N per-batch folds."""
    t, ev = _mk_source(spark, seed=13)
    per_batch = _mk_mv(spark, t)
    replay(t, split_batches(ev, 3), prepare=PREP,
           on_batch_end=lambda i, tb, r: per_batch.refresh())
    catch_up = _mk_mv(spark, t)
    catch_up.refresh()
    assert _rows(per_batch.read()) == _rows(catch_up.read()) == _rows(catch_up.recompute())
    assert per_batch.synced_version() == catch_up.synced_version()


def test_deletes_drop_groups_and_updates_migrate(spark):
    t = TargetTable.create(
        spark, _mkroot("mv-src-"), key_cols=["repo", "path"],
        columns=[("lang", "string"), ("content", "string")], num_buckets=4,
    )
    mv = _mk_mv(spark, t)
    ddl = "repo string, path string, lang string, content string, _seq long, _op string, _ts timestamp"

    def batch(rows):
        df = spark.createDataFrame(rows, ddl).withColumn(
            "_ts", F.current_timestamp()
        )
        t.merge_apply(df)
        mv.refresh()
        assert _rows(mv.read()) == _rows(mv.recompute())

    now = None
    # inserts across two groups + a NULL group
    batch([("r1", "a", "py", "x", 1, "U", now), ("r1", "b", "py", "y", 2, "U", now),
           ("r2", "a", "go", "z", 3, "U", now), ("r2", "b", None, "w", 4, "U", now)])
    assert dict((g, n) for g, n, _ in _rows(mv.read())) == {"py": 2, "go": 1, None: 1}
    # group-migrating update: (r1,a) moves py -> go
    batch([("r1", "a", "go", "x2", 5, "U", now)])
    assert dict((g, n) for g, n, _ in _rows(mv.read())) == {"py": 1, "go": 2, None: 1}
    # delete the whole go group + the NULL-group row
    batch([("r1", "a", None, None, 6, "D", now), ("r2", "a", None, None, 7, "D", now),
           ("r2", "b", None, None, 8, "D", now)])
    assert dict((g, n) for g, n, _ in _rows(mv.read())) == {"py": 1}


def test_mv_inherits_table_semantics(spark):
    """The MV is a TargetTable: it has snapshots and survives re-opening."""
    t, ev = _mk_source(spark, n=3000, seed=21)
    mv = _mk_mv(spark, t)
    replay(t, split_batches(ev, 2), prepare=PREP)
    mv.refresh()
    reopened = IncrementalAggregate(
        spark, mv.table.root, t, group_cols=["lang"], sum_cols=[("sum_seq", "_seq")]
    )
    assert _rows(reopened.read()) == _rows(mv.recompute())
    assert reopened.synced_version() == mv.synced_version() > 0


def test_refresh_failure_does_not_lose_source_batch(spark):
    """A failing on_batch_end hook surfaces AFTER the batch checkpoint is
    durable: the source batch is never re-applied, and a later refresh
    catches the MV up."""
    t, ev = _mk_source(spark, n=2000, seed=5)
    mv = _mk_mv(spark, t)
    calls = []

    def bad_hook(i, table, rec):
        calls.append(i)
        if i == 1:
            raise RuntimeError("mv store down")

    batches = split_batches(ev, 3)
    with pytest.raises(RuntimeError):
        replay(t, batches, prepare=PREP,
               on_batch_end=lambda i, tb, r: (bad_hook(i, tb, r), mv.refresh()))
    # resume: batches 0,1 are checkpointed, only 2 runs; hook sees it
    replay(t, batches, prepare=PREP)
    mv.refresh()
    assert _rows(mv.read()) == _rows(mv.recompute())

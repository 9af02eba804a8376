"""Regression tests for the round-1 advisor findings (ADVICE.md r1):

1. merge_apply dedup must be NULL-safe on key columns (high).
2. snapshot_hash must distinguish NULL position / NULL-vs-empty (medium).
3. stateful sessionize must not move session_end backwards on late events
   (medium).
4. checkpoint compaction crash window must not double-count metrics (low).
5. stream_replay watermark columns are parameters, validated early (low).
"""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import make_table
from tests.test_merge import _mk_events, _prep


# ---------------------------------------------------------------- 1. NULL keys


def test_null_key_tombstone_blocks_late_upsert(spark, tmp_path):
    """A delete at _seq=10 on a NULL-path key must suppress a later-arriving
    upsert at _seq=7 for the same NULL key (the r1 lag-based group detection
    treated every NULL-predecessor row as a group start, so NULL keys never
    deduplicated)."""
    t = make_table(spark, tmp_path / "t")
    t.merge_apply(_prep(_mk_events(spark, [("r1", None, 10, "D", None)])))
    t.merge_apply(_prep(_mk_events(spark, [("r1", None, 7, "U", "zombie")])))
    assert t.read().count() == 0
    # raw state holds exactly ONE row for the NULL key (the tombstone)
    raw = t.read_raw().collect()
    assert len(raw) == 1 and raw[0]["_op"] == "D" and raw[0]["_seq"] == 10


def test_null_key_rows_deduplicate(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    batch = _mk_events(
        spark,
        [("r1", None, 1, "U", "v1"), ("r1", None, 2, "U", "v2"), ("r1", None, 3, "U", "v3")],
    )
    stats = t.merge_apply(_prep(batch))
    rows = t.read().collect()
    assert len(rows) == 1 and rows[0]["content"] == "v3"
    assert stats.rows_after_dedup == 1


def test_null_and_nonnull_keys_stay_distinct(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    t.merge_apply(
        _prep(
            _mk_events(
                spark,
                [("r1", None, 1, "U", "nullkey"), ("r1", "a", 2, "U", "akey")],
            )
        )
    )
    state = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    assert state == {("r1", None): "nullkey", ("r1", "a"): "akey"}


# ---------------------------------------------------------------- 2. hash NULLs


def test_snapshot_hash_distinguishes_null_position(spark, tmp_path):
    """(commit='x', lang=NULL) vs (commit=NULL, lang='x') must hash
    differently (concat_ws silently drops NULL inputs)."""
    rows_a = [("r1", "a", "x", None, None, 1, "U")]
    rows_b = [("r1", "a", None, "x", None, 1, "U")]
    ddl = ("repo string, path string, commit string, lang string, "
           "content string, _seq long, _op string")
    ta = make_table(spark, tmp_path / "a")
    tb = make_table(spark, tmp_path / "b")
    for t, rows in ((ta, rows_a), (tb, rows_b)):
        df = spark.createDataFrame(rows, ddl).withColumn(
            "_ts", F.timestamp_seconds(F.col("_seq"))
        )
        t.merge_apply(_prep(df))
    assert ta.snapshot_hash() != tb.snapshot_hash()


def test_snapshot_hash_distinguishes_null_vs_empty(spark, tmp_path):
    ddl = ("repo string, path string, commit string, lang string, "
           "content string, _seq long, _op string")
    ta = make_table(spark, tmp_path / "a")
    tb = make_table(spark, tmp_path / "b")
    for t, commit in ((ta, None), (tb, "")):
        df = spark.createDataFrame([("r1", "a", commit, "py", None, 1, "U")], ddl).withColumn(
            "_ts", F.timestamp_seconds(F.col("_seq"))
        )
        t.merge_apply(_prep(df))
    assert ta.snapshot_hash() != tb.snapshot_hash()


# ---------------------------------------------------------------- 3. sessionize


class _FakeState:
    """Minimal GroupState stand-in for unit-testing the sessionize kernel."""

    def __init__(self, value=None):
        self._v = value
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def setTimeoutDuration(self, ms):
        pass

    def remove(self):
        self._v = None


def _run_batch(state, ts_list, gap_s=1800):
    import pandas as pd

    from data_ingestor_py_spark.streaming.stateful import _sessionize

    pdf = pd.DataFrame({"ts": pd.to_datetime(ts_list, unit="s")})
    return list(_sessionize((7,), iter([pdf]), state, gap_s=gap_s))


def test_late_event_does_not_regress_session_end():
    state = _FakeState()
    _run_batch(state, [100, 200])
    # late event (150 < stored last=200) then a far-future event: the closed
    # session must end at 200 with all 3 events, not regress to 150
    out = _run_batch(state, [150, 10_000])
    assert len(out) == 1
    closed = out[0].iloc[0]
    assert int(closed["session_end"].timestamp()) == 200
    assert int(closed["session_start"].timestamp()) == 100
    assert closed["n_events"] == 3
    # new open session started at 10_000
    start, last, n = state.get
    assert (start, last, n) == (10_000, 10_000, 1)


def test_late_event_within_gap_is_absorbed():
    state = _FakeState()
    _run_batch(state, [100, 200])
    out = _run_batch(state, [150])  # pure late arrival, no boundary move
    assert out == []
    start, last, n = state.get
    assert (start, last, n) == (100, 200, 3)


def test_late_event_before_session_start_extends_start():
    state = _FakeState()
    _run_batch(state, [100, 200])
    _run_batch(state, [50])
    start, last, n = state.get
    assert (start, last, n) == (50, 200, 3)


# ---------------------------------------------------------------- 4. compaction


def test_compaction_crash_duplicates_do_not_double_count(spark, tmp_path):
    import shutil

    from data_ingestor_py_spark.plans.replay import replay, split_batches
    from data_ingestor_py_spark.plans.checkpoint import Checkpoint
    from data_ingestor_py_spark.sources.generator import change_events

    t = make_table(spark, tmp_path / "t")
    ev = change_events(spark, 400, n_repos=10, paths_per_repo=5, seed=9)
    replay(t, split_batches(ev, 2), prepare=lambda df, i: _prep(df))
    cp = Checkpoint(spark, t.root)
    before = t.metrics_summary()
    cp.compact()
    # simulate a crash between the compacted-file rename and the original
    # deletions: duplicate the compacted file (rows become duplicated)
    files = [f for f in os.listdir(cp.dir) if f.endswith(".parquet")]
    assert len(files) == 1
    shutil.copy(
        os.path.join(cp.dir, files[0]), os.path.join(cp.dir, "dup-" + files[0])
    )
    after = t.metrics_summary()
    assert after["records_read"] == before["records_read"]
    assert after["batches_committed"] == before["batches_committed"]
    assert cp.read().count() == 2
    assert cp.committed_batches() == {0, 1}


def test_compaction_staging_sweep_is_grace_period_guarded(spark, tmp_path):
    """r2 advisory (low): the staging-orphan sweep must only remove files
    older than the grace period — an unconditional sweep would delete a
    LIVE concurrent compactor's in-flight staging file. Old orphans go,
    fresh ones stay, and neither is ever read as data."""
    import time

    from data_ingestor_py_spark.plans.checkpoint import Checkpoint
    from data_ingestor_py_spark.plans.replay import replay, split_batches
    from data_ingestor_py_spark.sources.generator import change_events

    t = make_table(spark, tmp_path / "t")
    ev = change_events(spark, 300, n_repos=5, paths_per_repo=5, seed=2)
    replay(t, split_batches(ev, 3), prepare=lambda df, i: _prep(df))
    cp = Checkpoint(spark, t.root)
    old_orphan = os.path.join(cp.dir, "part-dead.parquet.tmp-cafe")
    fresh_orphan = os.path.join(cp.dir, "part-beef.parquet.tmp-f00d")
    for p in (old_orphan, fresh_orphan):
        with open(p, "wb") as f:
            f.write(b"garbage")
    stale = time.time() - 60
    os.utime(old_orphan, (stale, stale))
    n = cp.compact()
    assert n == 3
    assert not os.path.exists(old_orphan)  # crashed writer's orphan swept
    assert os.path.exists(fresh_orphan)  # possibly-live writer left alone
    assert cp.committed_batches() == {0, 1, 2}


def test_concurrent_compactions_lose_no_rows(spark, tmp_path):
    """Two compactors racing (r2 advisory scenario): idempotent deletes and
    atomic puts mean both runs succeed, and the logical table (deduped
    reads) is unchanged whatever the interleaving."""
    from data_ingestor_py_spark.plans.checkpoint import Checkpoint
    from data_ingestor_py_spark.plans.replay import replay, split_batches
    from data_ingestor_py_spark.sources.generator import change_events

    t = make_table(spark, tmp_path / "t")
    ev = change_events(spark, 300, n_repos=5, paths_per_repo=5, seed=2)
    replay(t, split_batches(ev, 3), prepare=lambda df, i: _prep(df))
    cp1 = Checkpoint(spark, t.root)
    cp2 = Checkpoint(spark, t.root)
    import threading

    errs = []

    def run(c):
        try:
            c.compact()
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ths = [threading.Thread(target=run, args=(c,)) for c in (cp1, cp2)]
    for th in ths:
        th.start()
    for th in ths:
        th.join()
    assert not errs, errs
    assert cp1.committed_batches() == {0, 1, 2}
    assert cp1.read().count() == 3  # duplicates (if any) dedupe away


# ---------------------------------------------------------------- 5. watermark


def test_stream_replay_validates_watermark_columns(spark, tmp_path):
    from data_ingestor_py_spark.streaming.stream_replay import stream_replay

    events_dir = tmp_path / "events"
    events_dir.mkdir()
    t = make_table(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="watermark_delay requires columns"):
        stream_replay(
            spark,
            str(events_dir),
            "user_id long, ts timestamp, val double",  # no _ts / repo / path / _seq
            t,
            watermark_delay="10 minutes",
        )


# ---------------------------------------------------------------- purge pruning


def test_purge_rewrites_only_tombstone_buckets(spark, tmp_path):
    from data_ingestor_py_spark.plans.target import _bucket_expr
    from data_ingestor_py_spark.sources.generator import change_events

    t = make_table(spark, tmp_path / "t", num_buckets=8)
    ev = change_events(spark, 1200, n_repos=20, paths_per_repo=10, seed=4, delete_rate=0.0)
    t.merge_apply(_prep(ev))
    # deletes concentrated on two keys -> only their buckets bear tombstones
    t.merge_apply(
        _prep(_mk_events(spark, [("repo-0001", "za", 10**6, "D", None),
                                 ("repo-0002", "zb", 10**6 + 1, "D", None)]))
    )
    m1 = t._load()
    tomb_buckets = {
        r["bkt"]
        for r in t.read_raw()
        .where("_op = 'D'")
        .select(_bucket_expr(["repo", "path"], 8).alias("bkt"))
        .distinct()
        .collect()
    }
    assert 0 < len(tomb_buckets) < 8, "fixture must leave some buckets tombstone-free"
    visible_before = t.snapshot_hash()
    purged = t.purge_tombstones(older_than_seq=10**9)
    assert purged > 0
    m2 = t._load()
    for b, info in m1["buckets"].items():
        if int(b) not in tomb_buckets:
            assert m2["buckets"][b] == info, "untouched bucket was rewritten"
        else:
            assert m2["buckets"].get(b) != info
    assert t.snapshot_hash() == visible_before
    assert t.read_raw().where("_op = 'D'").count() == 0


# ---------------------------------------------------------------- prometheus


def test_prometheus_text_export(spark, tmp_path):
    from data_ingestor_py_spark.plans.replay import replay, split_batches
    from data_ingestor_py_spark.sources.generator import change_events

    t = make_table(spark, tmp_path / "t")
    ev = change_events(spark, 300, n_repos=5, paths_per_repo=5, seed=1)
    replay(t, split_batches(ev, 2), prepare=lambda df, i: _prep(df))
    out = tmp_path / "metrics_output.txt"
    text = t.export_prometheus(str(out))
    assert out.read_text() == text
    assert "# TYPE ingestor_records_read counter" in text
    assert "ingestor_records_read 300" in text
    assert "ingestor_batches_committed 2" in text
    assert "# TYPE ingestor_processing_time_seconds summary" in text
    assert "ingestor_processing_time_seconds_count 2" in text
    assert "ingestor_snapshot_version 2" in text
    assert text.endswith("\n")

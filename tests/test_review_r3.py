"""Regression tests for the round-3 self-review findings: batch/stream
checkpoint aliasing, auto-salt single-bucket flood, missing-manifest error
clarity, fallback-log deep rotation, broadcast-hint placement."""

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.checkpoint import Checkpoint
from data_ingestor_py_spark.plans.replay import replay, split_batches
from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.sources.generator import change_events
from tests.conftest import make_table
from tests.test_merge import _mk_events, _prep


def test_batch_replay_ignores_stream_epoch_records(spark, tmp_path):
    """A stream's committed epochs share the batch_id space in the same
    _checkpoint table; the batch driver must not skip batches it never ran
    because a stream committed epoch rows with the same numbers."""
    from data_ingestor_py_spark.streaming.stream_replay import stream_replay
    from tests.test_streaming import SCHEMA
    from tests.test_streaming import _prep as sprep

    full = change_events(spark, 1200, n_repos=12, paths_per_repo=8, seed=33)
    t = make_table(spark, tmp_path / "t")
    src = str(tmp_path / "events")
    full.where("event_id < 600").coalesce(1).write.parquet(src)
    q = stream_replay(spark, src, SCHEMA, t, prepare=sprep,
                      checkpoint_dir=str(tmp_path / "cp"))
    q.awaitTermination(120)  # stream committed epoch 0

    # now replay the SECOND half through the batch driver as batches 0..2 —
    # batch 0 must NOT be skipped because stream epoch 0 exists
    rest = full.where("event_id >= 600")
    out = replay(t, split_batches(rest, 3), prepare=lambda df, i: sprep(df))
    assert len(out) == 3

    ref = make_table(spark, tmp_path / "ref")
    ref.merge_apply(sprep(full))
    assert t.snapshot_hash() == ref.snapshot_hash()


def test_auto_salt_fires_on_single_bucket_flood(spark, tmp_path):
    """ALL events on one key land in ONE bucket — a median-of-touched-bucket
    ratio reads 1.0 there; the density signal must still fire."""
    rows = [("hot-repo", "hot/path.txt", i + 1, "U", f"v{i}") for i in range(4000)]
    ev = _prep(_mk_events(spark, rows))
    t = make_table(spark, tmp_path / "t")
    st = t.merge_apply(ev, salt_buckets="auto", auto_salt_min_rows=1000)
    assert st.touched_buckets == 1
    assert st.salt_used >= 16
    assert t.read().count() == 1  # reduced to the winning row


def test_missing_manifest_raises_filenotfound(spark, tmp_path):
    t = TargetTable(spark, str(tmp_path / "never-created"))
    with pytest.raises(FileNotFoundError, match="no manifest object"):
        t._load()
    t2 = make_table(spark, tmp_path / "t")
    with pytest.raises(FileNotFoundError, match="never committed"):
        t2.read_version(99)


def test_stream_ident_is_path_normalized(spark, tmp_path):
    """Same checkpoint dir under different spellings must produce the same
    stream identity (else a restart under an alternate spelling re-applies
    epochs and duplicates lineage rows). Drives the REAL stream with a
    denormalized spelling and asserts the committed record carries the
    canonical identity."""
    import os

    from data_ingestor_py_spark.streaming.stream_replay import stream_replay
    from tests.test_streaming import SCHEMA, _prep

    ev = change_events(spark, 300, n_repos=5, paths_per_repo=5, seed=44)
    src = str(tmp_path / "events")
    ev.coalesce(1).write.parquet(src)
    t = make_table(spark, tmp_path / "t")
    canonical = str(tmp_path / "cp")
    weird = str(tmp_path / "sub" / ".." / "cp") + os.sep  # ../ + trailing slash
    q = stream_replay(spark, src, SCHEMA, t, prepare=_prep, checkpoint_dir=weird)
    q.awaitTermination(120)
    rows = Checkpoint(spark, t.root).read().collect()
    assert rows and all(r["checksum"] == f"stream:{canonical}" for r in rows)


def test_fallback_read_handles_deep_rotation(tmp_path):
    from data_ingestor_py_spark.plans.fallback_log import FallbackLogger

    fb = FallbackLogger(str(tmp_path / "fb.json"), max_bytes=400, backup_count=12)
    for i in range(120):
        fb.log("X", "m" * 30, i=i)
    entries = fb.read()
    assert entries[-1]["i"] == 119  # newest present
    idx = [e["i"] for e in entries]
    assert idx == sorted(idx)  # numeric rotation order, .10+ not misordered
    assert len(entries) > 12  # backups beyond .9 are actually read


def test_boilerplate_and_decontaminate_plans_have_no_cartesian(spark, sf_dir):
    """The 1-row set side must be broadcast (hint above the aggregate);
    a CartesianProduct here would shuffle the whole corpus."""
    from data_ingestor_py_spark.functions.similarity import decontaminate
    from data_ingestor_py_spark.functions.text import remove_high_df_tokens

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.where("doc_id % 25 = 0")
    for df in (
        remove_high_df_tokens(docs, max_df=0.75),
        decontaminate(docs, bench, n=8, broadcast_set=True),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" in plan, plan

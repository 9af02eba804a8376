"""Exactly-once / resume suites (BASELINE.json: test_idempotency).

The reference is at-least-once: a tenacity retry around a partially
committed batch double-inserts (msgbroker/sql_consumer.py:155-156 +
db/connection_manager.py:88). The engine's merge is idempotent, so every
failure mode here must converge to the same snapshot hash.
"""

from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.checkpoint import Checkpoint
from data_ingestor_py_spark.plans.replay import replay, split_batches
from data_ingestor_py_spark.sources.generator import change_events
from tests.conftest import make_table

GEN = dict(n_repos=25, paths_per_repo=15, seed=5, dup_rate=0.15)


def _prep(df, i=0):
    return df.withColumn("_content_sha256", F.sha2(F.col("content"), 256)).select(
        "repo", "path", "commit", "lang", "content", "_content_sha256", "_seq", "_op", "_ts"
    )


def _events(spark):
    return change_events(spark, 2000, **GEN)


def test_crash_and_resume_from_checkpoint(spark, tmp_path):
    batches = split_batches(_events(spark), 5)
    ref = make_table(spark, tmp_path / "ref")
    replay(ref, batches, prepare=_prep)

    t = make_table(spark, tmp_path / "t")
    replay(t, batches[:3], prepare=_prep)  # crash after 3 of 5
    assert Checkpoint(spark, t.root).committed_batches() == {0, 1, 2}
    ran = replay(t, batches, prepare=_prep)  # resume
    assert [r.batch_id for r in ran] == [3, 4]
    assert t.snapshot_hash() == ref.snapshot_hash()


def test_reapply_every_batch_twice(spark, tmp_path):
    """At-least-once delivery (each batch applied twice, checkpoint ignored)
    must still converge — the MERGE itself is the idempotency layer."""
    batches = split_batches(_events(spark), 4)
    ref = make_table(spark, tmp_path / "ref")
    replay(ref, batches, prepare=_prep)

    t = make_table(spark, tmp_path / "t")
    for b in batches:
        t.merge_apply(_prep(b))
        t.merge_apply(_prep(b))  # duplicate delivery
    assert t.snapshot_hash() == ref.snapshot_hash()


def test_crash_between_commit_and_checkpoint(spark, tmp_path):
    """Snapshot committed but checkpoint write lost (the classic gap):
    resume re-applies the batch; merge idempotency makes it harmless."""
    import shutil

    batches = split_batches(_events(spark), 3)
    ref = make_table(spark, tmp_path / "ref")
    replay(ref, batches, prepare=_prep)

    t = make_table(spark, tmp_path / "t")
    replay(t, batches[:2], prepare=_prep)
    # simulate the gap: batch 2's merge commits, but the checkpoint row is lost
    t.merge_apply(_prep(batches[2]))
    shutil.rmtree(t.root + "/_checkpoint")
    ran = replay(t, batches, prepare=_prep)  # re-applies everything
    assert [r.batch_id for r in ran] == [0, 1, 2]
    assert t.snapshot_hash() == ref.snapshot_hash()


def test_injected_duplicate_events_collapse(spark, tmp_path):
    """The generator injects exact (commit,_seq) duplicates at 15%; final
    state must equal that of the deduplicated stream."""
    ev = _prep(_events(spark))
    t1 = make_table(spark, tmp_path / "dup")
    t1.merge_apply(ev)
    t2 = make_table(spark, tmp_path / "nodup")
    t2.merge_apply(ev.dropDuplicates(["repo", "path", "_seq"]))
    assert t1.snapshot_hash() == t2.snapshot_hash()
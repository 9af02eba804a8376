"""Structured Streaming replay: file-source micro-batches through
foreachBatch merge-apply must converge to the same state as batch replay,
and a second availableNow pass (new files arriving) must keep exactly-once
semantics."""

import shutil

from pyspark.sql import functions as F

from data_ingestor_py_spark.sources.generator import change_events
from data_ingestor_py_spark.streaming.stream_replay import stream_replay
from tests.conftest import make_table

SCHEMA = (
    "event_id long, repo string, path string, commit string, _seq long, "
    "_op string, _ts timestamp, lang string, content string, _schema_version int"
)


def _prep(df, _epoch=0):
    return df.withColumn("_content_sha256", F.sha2(F.col("content"), 256)).select(
        "repo", "path", "commit", "lang", "content", "_content_sha256", "_seq", "_op", "_ts"
    )


def test_stream_replay_matches_batch_replay(spark, tmp_path):
    ev = change_events(spark, 1500, n_repos=15, paths_per_repo=10, seed=9)
    src = str(tmp_path / "events")
    ev.repartition(3).write.parquet(src)

    ref = make_table(spark, tmp_path / "ref")
    ref.merge_apply(_prep(ev))

    t = make_table(spark, tmp_path / "t")
    q = stream_replay(
        spark, src, SCHEMA, t, prepare=_prep,
        checkpoint_dir=str(tmp_path / "cp"), max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    assert t.snapshot_hash() == ref.snapshot_hash()


def test_stream_picks_up_new_files_exactly_once(spark, tmp_path):
    ev1 = change_events(spark, 800, n_repos=15, paths_per_repo=10, seed=9)
    ev2 = change_events(spark, 1500, n_repos=15, paths_per_repo=10, seed=9).where(
        F.col("event_id") >= 800
    )
    src = str(tmp_path / "events")
    ev1.coalesce(1).write.parquet(src)

    t = make_table(spark, tmp_path / "t")
    cp = str(tmp_path / "cp")
    q = stream_replay(spark, src, SCHEMA, t, prepare=_prep, checkpoint_dir=cp)
    q.awaitTermination(120)
    h1 = t.snapshot_hash()

    # second pass with no new files: stream checkpoint -> zero re-processing
    q = stream_replay(spark, src, SCHEMA, t, prepare=_prep, checkpoint_dir=cp)
    q.awaitTermination(120)
    assert t.snapshot_hash() == h1

    # new files arrive -> only they are applied; final state == full replay
    ev2.coalesce(1).write.mode("append").parquet(src)
    q = stream_replay(spark, src, SCHEMA, t, prepare=_prep, checkpoint_dir=cp)
    q.awaitTermination(120)

    ref = make_table(spark, tmp_path / "ref")
    full = change_events(spark, 1500, n_repos=15, paths_per_repo=10, seed=9)
    ref.merge_apply(_prep(full))
    assert t.snapshot_hash() == ref.snapshot_hash()


def test_stream_crash_recovery_via_engine_checkpoint(spark, tmp_path):
    """Losing the STREAM checkpoint (worst case: full re-read) still
    converges because merge-apply is idempotent."""
    ev = change_events(spark, 1000, n_repos=10, paths_per_repo=10, seed=4)
    src = str(tmp_path / "events")
    ev.repartition(2).write.parquet(src)

    t = make_table(spark, tmp_path / "t")
    q = stream_replay(spark, src, SCHEMA, t, prepare=_prep, checkpoint_dir=str(tmp_path / "cp1"))
    q.awaitTermination(120)
    h = t.snapshot_hash()
    shutil.rmtree(tmp_path / "cp1")
    q = stream_replay(spark, src, SCHEMA, t, prepare=_prep, checkpoint_dir=str(tmp_path / "cp2"))
    q.awaitTermination(120)
    assert t.snapshot_hash() == h

def test_stream_with_watermark_dedup(spark, tmp_path):
    """Watermark-bounded pre-merge dedup: duplicate-heavy stream converges
    to the same state, with streaming dedup state bounded by the watermark."""
    ev = change_events(spark, 1200, n_repos=12, paths_per_repo=8, seed=2, dup_rate=0.3)
    src = str(tmp_path / "events")
    ev.repartition(3).write.parquet(src)

    ref = make_table(spark, tmp_path / "ref")
    ref.merge_apply(_prep(ev))

    # the delay must cover the stream's max event-time disorder across
    # micro-batches (here: random file split over a ~1h ts range) — rows
    # older than the watermark are treated as late and dropped
    t = make_table(spark, tmp_path / "t")
    q = stream_replay(
        spark, src, SCHEMA, t, prepare=_prep,
        checkpoint_dir=str(tmp_path / "cp"), max_files_per_trigger=1,
        watermark_delay="2 hours",
    )
    q.awaitTermination(120)
    assert t.snapshot_hash() == ref.snapshot_hash()


def test_stream_schema_evolution_hook(spark, tmp_path):
    """on_epoch_start evolves the table before the first micro-batch."""
    ev = change_events(spark, 300, n_repos=5, paths_per_repo=5, seed=3)
    src = str(tmp_path / "events")
    ev.coalesce(1).write.parquet(src)

    t = make_table(spark, tmp_path / "t")

    def on_epoch(epoch_id, tbl):
        if all(f["name"] != "epoch_tag" for f in tbl.schema_fields()):
            tbl.evolve(add=[("epoch_tag", "long")])

    def prep2(df, e):
        return _prep(df).withColumn("epoch_tag", F.lit(7).cast("long"))

    q = stream_replay(spark, src, SCHEMA, t, prepare=prep2,
                      checkpoint_dir=str(tmp_path / "cp"), on_epoch_start=on_epoch)
    q.awaitTermination(120)
    out = t.read()
    assert "epoch_tag" in out.columns
    assert out.where("epoch_tag <> 7").count() == 0

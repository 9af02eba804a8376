"""Round-4 review fixes (VERDICT r3 'Next round' + ADVICE items):

- metrics_summary must count a stream epoch and a batch of the same id as
  DISTINCT commits (dedupe key now includes the checksum stream identity);
- a checkpoint-less stream must still write 'stream:'-prefixed checkpoint
  rows so a later batch replay never skips batches it never ran;
- the L2 fallback guard catches STORAGE errors only (real bugs surface) and
  distinguishes checkpoint-failed from lineage-failed;
- PosixStorage.reclaim_stale_token must not delete a token that was
  replaced (re-claimed with a valid manifest) between inspect and remove;
- snapshot GC runs through the storage adapter (list_dirs/delete_prefix),
  so the maintenance path works over the object-store contract adapter;
- FallbackLogger dedupes handlers across path spellings (abspath key);
- kmeans_refine supports the same orderable id types as ivf_topk (string
  ids included), so the trained-IVF pipeline composes for any corpus.
"""

import os
import time

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.checkpoint import Checkpoint, Lineage
from data_ingestor_py_spark.plans.fallback_log import FallbackLogger
from data_ingestor_py_spark.plans.replay import replay, split_batches
from data_ingestor_py_spark.sources.generator import change_events
from data_ingestor_py_spark.storage import ConditionalPutStorage, PosixStorage
from data_ingestor_py_spark.streaming.stream_replay import stream_replay
from tests.conftest import make_table
from tests.test_merge import _prep

STREAM_SCHEMA = (
    "event_id long, repo string, path string, commit string, _seq long, "
    "_op string, _ts timestamp, lang string, content string, _schema_version int"
)


def _prep_stream(df, _epoch=0):
    return _prep(df)


# ---------------- metrics_summary batch/stream aliasing ----------------


def test_metrics_summary_counts_batch_and_stream_epochs(spark, tmp_path):
    """A batch replay (batch_ids 0,1) and a stream (epochs 0,1) into ONE
    table: batches_committed must count all four commits — the old
    (batch_id, status) dedupe key collapsed epoch 0 with batch 0."""
    t = make_table(spark, tmp_path / "t")
    ev = change_events(spark, 800, n_repos=10, paths_per_repo=8, seed=21)
    replay(t, split_batches(ev.where("event_id < 400"), 2),
           prepare=lambda df, i: _prep(df))
    src = str(tmp_path / "events")
    late = ev.where("event_id >= 400")
    late.where("event_id < 600").coalesce(1).write.parquet(src)
    late.where("event_id >= 600").coalesce(1).write.mode("append").parquet(src)
    q = stream_replay(
        spark, src, STREAM_SCHEMA, t, prepare=_prep_stream,
        checkpoint_dir=str(tmp_path / "cp"), max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    m = t.metrics_summary()
    assert m["batches_committed"] == 4  # 2 batch + 2 stream, no aliasing
    assert m["records_read"] == 800


def test_checkpointless_stream_never_aliases_batch_ids(spark, tmp_path):
    """A stream WITHOUT a checkpoint dir writes rows under a fresh
    'stream:ephemeral:' identity; a later batch replay on the same table
    must run every batch (checksum='' used to alias epoch 0..N as batch
    ids, silently skipping real batches)."""
    t = make_table(spark, tmp_path / "t")
    ev = change_events(spark, 600, n_repos=8, paths_per_repo=8, seed=22)
    src = str(tmp_path / "events")
    ev.where("event_id < 300").coalesce(1).write.parquet(src)
    q = stream_replay(spark, src, STREAM_SCHEMA, t, prepare=_prep_stream,
                      checkpoint_dir=None)
    q.awaitTermination(120)
    cp = Checkpoint(spark, t.root)
    rows = cp.read().collect()
    assert rows and all(r["checksum"].startswith("stream:") for r in rows)
    assert cp.committed_batches(exclude_streams=True) == set()
    # batch replay now runs ALL its batches (none skipped by stream rows)
    recs = replay(t, split_batches(ev, 3), prepare=lambda df, i: _prep(df))
    assert [r.batch_id for r in recs] == [0, 1, 2]
    ref = make_table(spark, tmp_path / "ref")
    ref.merge_apply(_prep(ev))
    assert t.snapshot_hash() == ref.snapshot_hash()


# ---------------- L2 fallback guard: narrow + staged ----------------


def test_lineage_failure_logged_as_lineage_symbol(spark, tmp_path, monkeypatch):
    t = make_table(spark, tmp_path / "t")
    ev = change_events(spark, 400, n_repos=6, paths_per_repo=6, seed=23)

    def broken(self, batch_id, bucket_rows):
        raise OSError("lineage store unavailable")

    monkeypatch.setattr(Lineage, "append", broken)
    out = replay(t, split_batches(ev, 2), prepare=lambda df, i: _prep(df))
    assert len(out) == 2  # replay not interrupted
    entries = FallbackLogger(str(tmp_path / "t" / "_fallback_logs.json")).read()
    assert {e["symbol"] for e in entries} == {"LINEAGE_WRITE_FAILED"}
    # the checkpoints themselves COMMITTED — not misreported as failed
    assert Checkpoint(spark, t.root).committed_batches() == {0, 1}


def test_non_storage_bug_in_checkpoint_surfaces(spark, tmp_path, monkeypatch):
    """A programming error (not OSError) in the metadata path must raise,
    not be downgraded to a fallback-log line forever."""
    t = make_table(spark, tmp_path / "t")
    ev = change_events(spark, 200, n_repos=5, paths_per_repo=5, seed=24)

    def buggy(self, rec):
        raise TypeError("serialization bug")

    monkeypatch.setattr(Checkpoint, "commit", buggy)
    with pytest.raises(TypeError):
        replay(t, split_batches(ev, 1), prepare=lambda df, i: _prep(df))


# ---------------- reclaim_stale_token TOCTOU ----------------


def test_reclaim_refuses_replaced_token(tmp_path):
    """Garbage token judged stale, then REPLACED by a retrying writer's
    valid committed manifest before the delete: the conditional delete must
    leave the new token alone (the old unconditional delete dropped it)."""
    st_io = PosixStorage()
    key = str(tmp_path / "manifest-v7.json")
    with open(key, "w") as f:
        f.write("{corrupt")
    old = time.time() - 60
    os.utime(key, (old, old))
    st0 = os.stat(key)
    # simulate the race: replacement lands between inspect and delete
    assert st_io.put_if_absent(key, b"x") is False  # key still occupied
    os.remove(key)
    assert st_io.put_if_absent(key, b'{"version": 7}')  # fresh valid token
    assert st_io._delete_if_unchanged(key, st0) is False
    assert st_io.get(key) == b'{"version": 7}'
    # and the normal stale-garbage path still reclaims
    with open(key, "wb") as f:
        f.write(b"")
    os.utime(key, (old, old))
    assert st_io.reclaim_stale_token(key) is True
    assert st_io.get(key) is None


# ---------------- GC through the storage adapter ----------------


@pytest.mark.parametrize("adapter", [PosixStorage, ConditionalPutStorage])
def test_expire_snapshots_via_adapter(spark, tmp_path, adapter):
    """Snapshot GC (delimiter listing + prefix delete) rides the adapter:
    over the object-store contract adapter, old snapshot dirs disappear and
    the current snapshot stays fully readable."""
    t = make_table(spark, tmp_path / "t", storage=adapter())
    ev = change_events(spark, 400, n_repos=5, paths_per_repo=5, seed=25)
    for i in range(3):
        t.merge_apply(_prep(ev.where(f"event_id % 3 = {i}")))
    h = t.snapshot_hash()
    snaps_before = [d for d in os.listdir(t.root) if d.startswith("snap-")]
    t.expire_snapshots(keep_last=0)
    snaps_after = [d for d in os.listdir(t.root) if d.startswith("snap-")]
    assert len(snaps_after) < len(snaps_before)
    assert t.snapshot_hash() == h


# ---------------- FallbackLogger handler dedup across spellings ----------


def test_fallback_logger_single_handler_across_path_spellings(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rel = FallbackLogger("fb.json")
    ab = FallbackLogger(str(tmp_path / "fb.json"))
    assert rel._logger is ab._logger
    assert len(ab._logger.handlers) == 1
    rel.log("X", "once")
    assert len(ab.read()) == 1  # not duplicated by a second handler


# ---------------- kmeans_refine id-type parity with ivf_topk ----------


def test_kmeans_refine_string_ids_compose_with_ivf(spark, sf_dir):
    from data_ingestor_py_spark.functions.similarity import (
        centroid_rows_to_model,
        ivf_topk,
        kmeans_refine,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.concat(F.lit("doc-"), F.col("vec_id").cast("string")).alias("vec_id"),
        "embedding",
    )
    cents = kmeans_refine(emb, k=4, iters=1)
    assert dict(cents.dtypes)["cell"] == "string"
    model = centroid_rows_to_model(cents)
    out = ivf_topk(emb.limit(3), emb, k=3, n_probe=2, centroids=model)
    assert out.count() > 0
    assert dict(out.dtypes)["neighbor_id"] == "string"

"""Regression tests for the round-2 advisor/judge findings (ADVICE.md r2):

1. connected_components must not silently return unconverged labels, and
   pointer jumping must make long chains converge in O(log d) rounds (low).
2. ivf_topk must work for non-numeric id columns (the r2 tie-break built
   ``F.lit(-int(cid))``, failing at plan-build time for string ids) (low).
3. build_vocab must shrink to top_k distributively BEFORE the global
   ranking window (plan pin lives in test_plans.py) (low).
4. stream_replay must skip epochs already committed in OUR checkpoint when
   Spark re-delivers them after a crash in the window between our
   checkpoint write and Spark's offset commit — one _checkpoint/_lineage
   row set per epoch, scoped to the stream's identity so a REBUILT stream
   checkpoint (fresh epoch numbering over new data) is never skipped.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.operators.graph import (
    ComponentsNotConverged,
    connected_components,
)
from tests.conftest import make_table

# ------------------------------------------------- 1. components convergence


def _chain(spark, n: int):
    verts = spark.range(n).select(F.col("id"))
    edges = (
        spark.range(n - 1)
        .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    )
    return verts, edges


def test_components_long_chain_converges_via_pointer_jumping(spark):
    """A 200-node path has diameter 199; plain 1-hop min propagation needs
    199 rounds. Pointer jumping (label <- label(label)) must close it well
    inside the default 25-round budget."""
    verts, edges = _chain(spark, 200)
    out = connected_components(verts, edges, max_iter=25).collect()
    assert len(out) == 200
    assert {r["component"] for r in out} == {0}


def test_components_raise_on_nonconvergence(spark):
    """With an iteration budget that cannot cover the diameter, partial
    labels must not be returned silently."""
    verts, edges = _chain(spark, 200)
    with pytest.raises(ComponentsNotConverged):
        connected_components(verts, edges, max_iter=2)


def test_components_warn_mode_returns_partial(spark):
    verts, edges = _chain(spark, 64)
    with pytest.warns(UserWarning, match="did not converge"):
        out = connected_components(verts, edges, max_iter=1, on_nonconverged="warn")
    assert out.count() == 64


# ------------------------------------------------------- 2. ivf string ids


def test_ivf_topk_accepts_string_ids(spark):
    """The r2 tie-break built ``F.lit(-int(cid))``, which raised ValueError
    at plan-build time for string vec_ids. The comparator sort must handle
    them: the query runs, every query gets contiguous ranks, no self-match."""
    from data_ingestor_py_spark.functions.similarity import ivf_topk

    base = spark.range(24).select(
        F.format_string("v%02d", F.col("id")).alias("vec_id"),
        F.array(
            (F.col("id") % 5 + 1).cast("double"),
            (F.col("id") % 7 + 1).cast("double"),
            (F.col("id") % 3 + 1).cast("double"),
        ).alias("embedding"),
    )
    out = ivf_topk(base.limit(4), base, k=3, n_lists=4, n_probe=2).collect()
    by_q = {}
    for r in out:
        assert r["query_id"] != r["neighbor_id"]
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert len(by_q) == 4
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


# ------------------------------------------- 4. stream restart checkpoint skip


def test_stream_epoch_replay_writes_single_checkpoint_row(spark, tmp_path):
    """Simulate the crash window: Spark wrote offsets/0 and ran the epoch
    (our checkpoint row landed), but died before commits/0. On restart Spark
    re-delivers epoch 0 — the merge must be skipped and the _checkpoint/
    _lineage tables must hold exactly ONE row set for batch 0."""
    from data_ingestor_py_spark.plans.checkpoint import Checkpoint, Lineage
    from data_ingestor_py_spark.sources.generator import change_events
    from data_ingestor_py_spark.streaming.stream_replay import stream_replay
    from tests.test_streaming import SCHEMA, _prep

    ev = change_events(spark, 600, n_repos=10, paths_per_repo=8, seed=21)
    src = str(tmp_path / "events")
    ev.coalesce(1).write.parquet(src)

    t = make_table(spark, tmp_path / "t")
    cp_dir = str(tmp_path / "cp")
    q = stream_replay(spark, src, SCHEMA, t, prepare=_prep, checkpoint_dir=cp_dir)
    q.awaitTermination(120)
    h = t.snapshot_hash()
    v = t._load()["version"]

    # crash between our checkpoint write and Spark's offset commit
    os.remove(os.path.join(cp_dir, "commits", "0"))
    crc = os.path.join(cp_dir, "commits", ".0.crc")  # Hadoop ChecksumFs sidecar
    if os.path.exists(crc):
        os.remove(crc)
    q = stream_replay(spark, src, SCHEMA, t, prepare=_prep, checkpoint_dir=cp_dir)
    q.awaitTermination(120)

    assert t.snapshot_hash() == h
    assert t._load()["version"] == v  # merge was skipped, not re-applied
    cp_rows = Checkpoint(spark, t.root).read().where("batch_id = 0").collect()
    assert len(cp_rows) == 1
    lin = Lineage(spark, t.root).read().groupBy("batch_id", "bucket").count()
    assert lin.where("count > 1").count() == 0


def test_stream_fresh_checkpoint_epochs_are_not_skipped(spark, tmp_path):
    """A REBUILT stream checkpoint restarts epoch numbering over possibly
    NEW data — those epochs must re-merge (idempotently), never be skipped
    by the old stream's committed set."""
    from data_ingestor_py_spark.sources.generator import change_events
    from data_ingestor_py_spark.streaming.stream_replay import stream_replay
    from tests.test_streaming import SCHEMA, _prep

    full = change_events(spark, 1000, n_repos=10, paths_per_repo=8, seed=22)
    src = str(tmp_path / "events")
    full.where("event_id < 500").coalesce(1).write.parquet(src)

    t = make_table(spark, tmp_path / "t")
    q = stream_replay(spark, src, SCHEMA, t, prepare=_prep,
                      checkpoint_dir=str(tmp_path / "cp1"))
    q.awaitTermination(120)

    # stream checkpoint lost; new files arrive; fresh checkpoint sees ALL
    # files in its OWN epoch 0 — skipping it would lose the new half
    shutil.rmtree(tmp_path / "cp1")
    full.where("event_id >= 500").coalesce(1).write.mode("append").parquet(src)
    q = stream_replay(spark, src, SCHEMA, t, prepare=_prep,
                      checkpoint_dir=str(tmp_path / "cp2"))
    q.awaitTermination(120)

    ref = make_table(spark, tmp_path / "ref")
    ref.merge_apply(_prep(full))
    assert t.snapshot_hash() == ref.snapshot_hash()

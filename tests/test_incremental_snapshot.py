"""DBLog-style incremental snapshot (streaming/incremental_snapshot.py).

Ground truth throughout: the final table state of a chunked bootstrap
interleaved with live binlog epochs must equal a plain full replay of the
COMPLETE event history — chunking, interleave schedule, crashes, and
re-deliveries are never allowed to show through.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.replay import replay, split_batches
from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.sources.generator import change_events
from data_ingestor_py_spark.streaming.incremental_snapshot import (
    ChunkedSnapshot,
    incremental_snapshot_replay,
)

COLS = dict(
    key_cols=["repo", "path"],
    columns=[("commit", "string"), ("lang", "string"), ("content", "string")],
    num_buckets=8,
)
PAYLOAD = ["repo", "path", "commit", "lang", "content"]


def _events(spark, n=6000):
    return change_events(
        spark, n, n_repos=25, paths_per_repo=12, seed=23, delete_rate=0.15
    ).cache()


def _state_at(ev, lsn):
    """Consistent full-row source read at ``lsn``: the deterministic
    stand-in for a database's 'SELECT chunk AS OF <lsn>'. Ties in _seq
    are duplicate-injection clones (identical payload), so the
    row_number pick is value-deterministic."""
    w = Window.partitionBy("repo", "path").orderBy(
        F.desc("_seq"), F.desc("commit")
    )
    return (
        ev.where(F.col("_seq") <= lsn)
        .withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1")
        .where(F.col("_op") != "D")
        .select(*PAYLOAD)
    )


def _payload_state(t):
    """The content contract: snapshot-bootstrapped rows carry the chunk
    watermark as their _seq (standard CDC snapshot semantics — exactly
    like handoff.bootstrap_snapshot), so state equality is over the
    PAYLOAD; the _seq invariant is asserted separately."""
    return sorted(map(tuple, t.read().select(*PAYLOAD).collect()))


def _truth(spark, ev, tmp_path, name="truth"):
    root = str(tmp_path / name)
    shutil.rmtree(root, ignore_errors=True)
    t = TargetTable.create(spark, root, **COLS)
    prep = lambda df, i: df.select(*PAYLOAD, "_seq", "_op", "_ts")  # noqa: E731
    replay(t, split_batches(ev, 3), prepare=prep)
    return t


def _epochize(ev, start_lsn, n_epochs):
    """Post-start events cut into contiguous LSN ranges + their high
    watermarks (what a real source hands its consumer per poll)."""
    max_lsn = ev.agg(F.max("_seq")).collect()[0][0]
    span = max_lsn - start_lsn
    bounds = [start_lsn + (span * (i + 1)) // n_epochs for i in range(n_epochs)]
    lo = start_lsn
    batches = []
    for hi in bounds:
        batches.append(
            ev.where((F.col("_seq") > lo) & (F.col("_seq") <= hi)).select(
                *PAYLOAD, "_seq", "_op", "_ts"
            )
        )
        lo = hi
    return batches, bounds


def _run(spark, ev, tmp_path, name, n_chunks=5, n_epochs=4, start_frac=0.5,
         redeliver_pre_start=False):
    max_lsn = ev.agg(F.max("_seq")).collect()[0][0]
    start_lsn = int(max_lsn * start_frac)
    batches, lsns = _epochize(ev, start_lsn, n_epochs)
    if redeliver_pre_start:
        # at-least-once wire: epoch 0 re-delivers a slab of pre-snapshot
        # history (inserts for keys since deleted included) — the LSN
        # floor must drop all of it
        stale = ev.where(F.col("_seq") <= start_lsn).select(
            *PAYLOAD, "_seq", "_op", "_ts"
        )
        batches[0] = batches[0].unionByName(stale)
    root = str(tmp_path / name)
    shutil.rmtree(root, ignore_errors=True)
    t = TargetTable.create(spark, root, **COLS)
    res = incremental_snapshot_replay(
        t, batches, lsns, lambda lsn: _state_at(ev, lsn),
        start_lsn=start_lsn, n_chunks=n_chunks,
    )
    return t, res, start_lsn


def test_final_state_equals_full_replay(spark, tmp_path):
    ev = _events(spark)
    truth = _truth(spark, ev, tmp_path)
    t, res, _ = _run(spark, ev, tmp_path, "inc")
    assert _payload_state(t) == _payload_state(truth)
    assert set(res["chunks"]) == set(range(5))
    # _seq invariant: stored seq = max(key's true last seq, its chunk's
    # watermark) — never below the truth (a below-truth seq would let a
    # re-delivered old event overwrite newer state)
    joined = (
        t.read().select("repo", "path", F.col("_seq").alias("got"))
        .join(
            truth.read().select("repo", "path", F.col("_seq").alias("want")),
            ["repo", "path"],
        )
    )
    assert joined.where(F.col("got") < F.col("want")).count() == 0


def test_pre_start_redelivery_never_resurrects(spark, tmp_path):
    """Keys deleted before the snapshot began are in no chunk; epoch 0
    re-delivering their pre-start inserts (at-least-once wire) must not
    resurrect them — the global LSN floor drops sub-start events."""
    # sparse keyspace: plenty of keys whose pre-start delete is final
    ev = change_events(
        spark, 6000, n_repos=60, paths_per_repo=40, seed=23, delete_rate=0.15
    ).cache()
    truth = _truth(spark, ev, tmp_path)
    t, _, start_lsn = _run(
        spark, ev, tmp_path, "inc-redeliver", redeliver_pre_start=True
    )
    assert _payload_state(t) == _payload_state(truth)
    # the scenario is real: some key's last pre-start event is a delete
    # and it never reappears post-start
    w = Window.partitionBy("repo", "path").orderBy(F.desc("_seq"))
    dead = (
        ev.where(F.col("_seq") <= start_lsn)
        .withColumn("_rn", F.row_number().over(w)).where("_rn = 1")
        .where(F.col("_op") == "D")
        .join(
            ev.where(F.col("_seq") > start_lsn).select("repo", "path").distinct(),
            ["repo", "path"], "left_anti",
        )
        .count()
    )
    assert dead > 0, "fixture lost its pre-start-deleted keys"


def test_crash_mid_snapshot_resumes_from_ledger(spark, tmp_path):
    """Kill the run after the first chunk lands; the resumed run must
    skip completed epochs AND completed chunks, and still converge."""
    ev = _events(spark)
    truth = _truth(spark, ev, tmp_path)
    max_lsn = ev.agg(F.max("_seq")).collect()[0][0]
    start_lsn = int(max_lsn * 0.5)
    batches, lsns = _epochize(ev, start_lsn, 4)
    root = str(tmp_path / "inc-crash")
    t = TargetTable.create(spark, root, **COLS)

    calls = {"n": 0}

    def crashy_source(lsn):
        calls["n"] += 1
        if calls["n"] == 2:  # first epoch's chunk read succeeded; die next
            raise RuntimeError("simulated crash mid-snapshot")
        return _state_at(ev, lsn)

    with pytest.raises(RuntimeError, match="simulated crash"):
        incremental_snapshot_replay(
            t, batches, lsns, crashy_source, start_lsn=start_lsn, n_chunks=5
        )
    snap = ChunkedSnapshot(t, 5)
    done_before = snap.completed_chunks()
    assert done_before and done_before != set(range(5))
    # resume: same inputs, healthy source
    res = incremental_snapshot_replay(
        t, batches, lsns, lambda lsn: _state_at(ev, lsn),
        start_lsn=start_lsn, n_chunks=5,
    )
    assert _payload_state(t) == _payload_state(truth)
    # completed chunks were NOT re-merged (resumed run only reports the rest)
    assert set(res["chunks"]) == set(range(5)) - done_before
    assert ChunkedSnapshot(t, 5).done()


def test_chunk_ledger_does_not_alias_epoch_checkpoints(spark, tmp_path):
    """Chunk ids live in the stream-identity checksum channel: the batch
    replay driver's committed-epoch view must contain exactly the epoch
    ids, and re-running the whole interleave must be a complete no-op."""
    ev = _events(spark, n=3000)
    t, _, start_lsn = _run(spark, ev, tmp_path, "inc-alias", n_chunks=3,
                           n_epochs=2)
    from data_ingestor_py_spark.plans.checkpoint import Checkpoint

    cp = Checkpoint(spark, t.root, storage=t.io)
    assert cp.committed_batches(exclude_streams=True) == {0, 1}
    v = t._load()["version"]
    batches, lsns = _epochize(ev, start_lsn, 2)
    res = incremental_snapshot_replay(
        t, batches, lsns, lambda lsn: _state_at(ev, lsn),
        start_lsn=start_lsn, n_chunks=3,
    )
    assert res["epochs"] == [] and res["chunks"] == {}
    assert t._load()["version"] == v


def test_chunks_partition_the_keyspace(spark, tmp_path):
    ev = _events(spark, n=2000)
    root = str(tmp_path / "inc-part")
    t = TargetTable.create(spark, root, **COLS)
    snap = ChunkedSnapshot(t, 4)
    state = _state_at(ev, 10**9)
    total = state.count()
    sizes = [state.where(snap.chunk_member(i)).count() for i in range(4)]
    assert sum(sizes) == total
    assert all(s > 0 for s in sizes), f"degenerate chunking: {sizes}"


def test_overstamping_is_the_unsound_direction(spark, tmp_path):
    """The stamping contract, demonstrated: merging chunk rows consistent
    only as of v but stamped w > v suppresses binlog events in (v, w] and
    ghosts stale values — while stamping at the true read LSN converges.
    This is WHY apply_chunk takes (rows, read_lsn) as one unit."""
    ev = _events(spark)
    truth = _truth(spark, ev, tmp_path)
    max_lsn = ev.agg(F.max("_seq")).collect()[0][0]
    start_lsn = int(max_lsn * 0.5)
    batches, lsns = _epochize(ev, start_lsn, 2)
    prep = lambda df, i: df  # noqa: E731

    def run(stamp_of):
        root = str(tmp_path / f"inc-stamp-{stamp_of}")
        shutil.rmtree(root, ignore_errors=True)
        t = TargetTable.create(spark, root, **COLS)
        replay(t, batches, prepare=lambda df, i: df.where(F.col("_seq") > start_lsn))
        snap = ChunkedSnapshot(t, 1)
        # chunk content consistent as of start_lsn (v) ...
        state = _state_at(ev, start_lsn)
        # ... stamped either truthfully (v) or over-stamped (w = max_lsn)
        snap.apply_chunk(0, state, start_lsn if stamp_of == "true" else max_lsn)
        return t

    assert _payload_state(run("true")) == _payload_state(truth)
    assert _payload_state(run("over")) != _payload_state(truth)


def test_streaming_chunks_ride_real_epochs(spark, tmp_path):
    """The streaming embodiment: chunk reads fire from the file tail's
    own epochs (on_epoch_end, after each epoch's merge is durable), read
    LSN = the epoch's delivered high watermark; a stale pre-start slab
    on the wire exercises the floor. Final payload state == full-replay
    truth, and the ledger shows every chunk done."""
    from data_ingestor_py_spark.sources.debezium import to_debezium_json
    from data_ingestor_py_spark.streaming.incremental_snapshot import (
        drain_chunks,
        stream_incremental_snapshot,
    )

    ev = _events(spark)
    truth = _truth(spark, ev, tmp_path, name="truth-stream")
    max_lsn = ev.agg(F.max("_seq")).collect()[0][0]
    start_lsn = int(max_lsn * 0.5)

    wire_rows = ev.where(F.col("_seq") > start_lsn).unionByName(
        # at-least-once wire: re-deliver a pre-start slab (incl. inserts
        # for keys whose pre-start delete was final)
        ev.where(F.col("_seq") <= start_lsn // 2)
    )
    env = wire_rows.select(
        to_debezium_json(
            F.struct("repo", "path", "commit", "lang", "content"),
            F.when(F.col("_op") == "D", "d").otherwise("u"),
            F.unix_millis(F.col("_ts").cast("timestamp")),
            F.col("_seq"),
        ).alias("value")
    )
    src = str(tmp_path / "env")
    env.repartition(4).write.mode("overwrite").text(src)

    root = str(tmp_path / "t-stream")
    t = TargetTable.create(spark, root, **COLS)
    row_fields = [("repo", "string"), ("path", "string"),
                  ("commit", "string"), ("lang", "string"),
                  ("content", "string")]
    q = stream_incremental_snapshot(
        spark, src, row_fields, t,
        source_state_at=lambda lsn: _state_at(ev, lsn),
        start_lsn=start_lsn, n_chunks=4, chunks_per_epoch=1,
        checkpoint_dir=str(tmp_path / "cp"), max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    drain_chunks(t, lambda lsn: _state_at(ev, lsn), max_lsn, 4)
    assert ChunkedSnapshot(t, 4).done()
    assert _payload_state(t) == _payload_state(truth)

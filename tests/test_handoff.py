"""Snapshot -> binlog handoff (streaming/handoff.py).

The scenario every test builds: a key history that spans the snapshot
LSN, including the resurrection trap — a key inserted and DELETED before
the snapshot (absent from it), whose pre-LSN insert re-appears in the
delivered binlog. Without the LSN floor that insert has no stored seq to
lose against and resurrects the key.
"""

from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.sources.debezium import to_debezium_json
from data_ingestor_py_spark.streaming.handoff import (
    bootstrap_snapshot,
    replay_after_snapshot,
    stream_after_snapshot,
)

FIELDS = [("id", "string"), ("v", "double")]
LSN = 100

# full history: (id, v, seq, op) — snapshot taken at LSN=100
HISTORY = [
    ("a", 1.0, 10, "c"),
    ("b", 2.0, 20, "c"),
    ("zombie", 9.0, 30, "c"),   # born...
    ("zombie", None, 40, "d"),  # ...and deleted before the snapshot
    ("a", 1.5, 50, "u"),
    ("c", 3.0, 150, "c"),       # post-snapshot
    ("a", 1.9, 160, "u"),
    ("b", None, 170, "d"),
]


def _snapshot(spark):
    """Consistent state at LSN: a=1.5, b=2.0 (zombie already gone)."""
    return spark.createDataFrame(
        [("a", 1.5), ("b", 2.0)], "id string, v double"
    )


def _wire(spark, events):
    rows = spark.createDataFrame(
        [(i, v, s, o) for i, v, s, o in events],
        "id string, v double, _seq long, _op_c string",
    )
    return rows.select(
        to_debezium_json(
            F.struct(F.col("id"), F.col("v")),
            F.col("_op_c"),
            F.col("_seq") * 1000,
            F.col("_seq"),
        ).alias("value")
    )


def _mk(spark, tmp_path, name="t"):
    return TargetTable.create(
        spark, str(tmp_path / name),
        key_cols=["id"], columns=[("v", "double")], num_buckets=4,
    )


def _want():
    return sorted([("a", 1.9, 160), ("c", 3.0, 150)])


def _state(t):
    return sorted(
        (r["id"], r["v"], r["_seq"])
        for r in t.read().select("id", "v", "_seq").collect()
    )


def test_batch_handoff_with_full_overlap(spark, tmp_path):
    """Binlog retention delivers EVERYTHING (max overlap): floored replay
    still lands exactly the post-LSN suffix on top of the snapshot."""
    t = _mk(spark, tmp_path)
    st = bootstrap_snapshot(t, _snapshot(spark), LSN)
    assert st.rows_in == 2
    replay_after_snapshot(_wire(spark, HISTORY), FIELDS, t, LSN)
    assert _state(t) == _want()


def test_without_floor_the_zombie_resurrects(spark, tmp_path):
    """Demonstrates the hole the floor closes. When insert and delete
    arrive in ONE batch, in-batch max-seq dedup kills the zombie anyway;
    the hole opens when the pre-LSN insert is (re)delivered WITHOUT its
    delete — partial binlog redelivery — and the key is absent from the
    table (no stored seq to lose against)."""
    from data_ingestor_py_spark.sources.debezium import parse_debezium

    partial = [("zombie", 9.0, 30, "c")]  # the delete (seq 40) is not redelivered
    t = _mk(spark, tmp_path)
    bootstrap_snapshot(t, _snapshot(spark), LSN)
    ev = parse_debezium(_wire(spark, partial), FIELDS).drop("src_op")
    t.merge_apply(ev, stats="light")
    ids = {r["id"] for r in t.read().collect()}
    assert "zombie" in ids  # resurrected — the unguarded cutover is wrong

    # the floored path drops it
    t2 = _mk(spark, tmp_path, "guarded")
    bootstrap_snapshot(t2, _snapshot(spark), LSN)
    replay_after_snapshot(_wire(spark, partial), FIELDS, t2, LSN)
    assert "zombie" not in {r["id"] for r in t2.read().collect()}


def test_streaming_handoff_and_restart(spark, tmp_path):
    t = _mk(spark, tmp_path)
    bootstrap_snapshot(t, _snapshot(spark), LSN)
    in_dir = str(tmp_path / "wire")
    _wire(spark, HISTORY).coalesce(1).write.text(in_dir)
    cp = str(tmp_path / "cp")
    q = stream_after_snapshot(
        spark, in_dir, FIELDS, t, LSN, checkpoint_dir=cp
    )
    q.awaitTermination(300)
    assert _state(t) == _want()
    h = t.snapshot_hash()
    # restart: no new files -> no-op; lost checkpoint -> re-delivery converges
    q = stream_after_snapshot(spark, in_dir, FIELDS, t, LSN, checkpoint_dir=cp)
    q.awaitTermination(300)
    assert t.snapshot_hash() == h
    q = stream_after_snapshot(
        spark, in_dir, FIELDS, t, LSN, checkpoint_dir=str(tmp_path / "cp2")
    )
    q.awaitTermination(300)
    assert t.snapshot_hash() == h


def test_bootstrap_idempotent_and_crash_window(spark, tmp_path):
    """Crash between bootstrap and first stream epoch: re-running the
    bootstrap then streaming lands the same state."""
    t1 = _mk(spark, tmp_path, "a")
    bootstrap_snapshot(t1, _snapshot(spark), LSN)
    bootstrap_snapshot(t1, _snapshot(spark), LSN)  # re-run (crash recovery)
    replay_after_snapshot(_wire(spark, HISTORY), FIELDS, t1, LSN)
    t2 = _mk(spark, tmp_path, "b")
    bootstrap_snapshot(t2, _snapshot(spark), LSN)
    replay_after_snapshot(_wire(spark, HISTORY), FIELDS, t2, LSN)
    assert t1.snapshot_hash() == t2.snapshot_hash()
    assert _state(t1) == _want()

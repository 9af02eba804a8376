"""Kill-mid-epoch crash tests for the streaming consumers (VERDICT r4 #7):
a crash BETWEEN the durable apply (merge / scd2_apply) and Spark's epoch
commit re-delivers the epoch on restart — the dead-letter dir and the
history must converge to the clean-run state, not double-apply.

Same discipline as test_idempotency.py's three crash modes, lifted to the
Structured-Streaming foreachBatch surface where the crash window is real:
Spark commits the offset AFTER foreachBatch returns, so any failure in
that gap replays the whole epoch."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.errors.exceptions.captured import StreamingQueryException

from data_ingestor_py_spark.plans.scd import create_history_table, scd2_transform
from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.sources.debezium import parse_debezium, to_debezium_json
from data_ingestor_py_spark.streaming.stream_debezium import stream_debezium_replay
from data_ingestor_py_spark.streaming.stream_scd2 import stream_scd2
from tests.test_scd2 import KEYS, PAY, _events, _hist_rows, _ns

ROW_FIELDS = [("repo", "string"), ("path", "string"), ("value", "double")]


def _mkroot(prefix):
    d = tempfile.mkdtemp(prefix=prefix)
    os.rmdir(d)
    return d


def _write_envelopes(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src_rows = ev.select(
        F.col("user_id").cast("string").alias("repo"),
        F.regexp_extract("props", r'"k":\s*([0-9]+)', 1).cast("long").cast("string").alias("path"),
        F.col("value"),
        F.when(F.col("event_type") == "error", "d").otherwise("u").alias("op"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.col("event_id").alias("lsn"),
    )
    env = src_rows.select(
        to_debezium_json(
            F.struct("repo", "path", "value"), F.col("op"), F.col("ts_ms"), F.col("lsn")
        ).alias("value")
    )
    src = str(tmp_path / "envelopes")
    env.coalesce(3).write.mode("overwrite").text(src)
    spark.createDataFrame(
        [("not json at all",), ('{"op":"t","ts_ms":7}',)], "value string"
    ).coalesce(1).write.mode("append").text(src)
    return src


def test_stream_debezium_crash_between_merge_and_epoch_commit(spark, tmp_path):
    """Crash AFTER merge_apply committed but BEFORE the epoch offset commit:
    restart re-delivers the epoch; the idempotent merge and the overwrite
    dead-letter write both converge to the clean-run state."""
    cols = dict(key_cols=["repo", "path"],
                columns=[("value", "double")], num_buckets=4)
    t = TargetTable.create(spark, _mkroot("crash-dbz-"), **cols)
    ref = TargetTable.create(spark, _mkroot("crash-dbz-ref-"), **cols)
    src = _write_envelopes(spark, tmp_path)
    dl = str(tmp_path / "dead")
    cp = str(tmp_path / "cp")

    real_merge = t.merge_apply
    fired = []

    def crashing_merge(batch, **kw):
        r = real_merge(batch, **kw)          # the merge COMMITS...
        if not fired:
            fired.append(True)
            raise RuntimeError("injected crash after merge commit")  # ...then we die
        return r

    t.merge_apply = crashing_merge
    q = stream_debezium_replay(
        spark, src, ROW_FIELDS, t, dead_letter_dir=dl,
        checkpoint_dir=cp, max_files_per_trigger=1,
    )
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination(120)
    assert fired  # the crash epoch's merge really did commit first

    # restart: the crashed epoch is re-delivered and re-applied
    t.merge_apply = real_merge
    q = stream_debezium_replay(
        spark, src, ROW_FIELDS, t, dead_letter_dir=dl,
        checkpoint_dir=cp, max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    ref.merge_apply(parse_debezium(spark.read.text(src), ROW_FIELDS).drop("src_op"))
    assert t.snapshot_hash() == ref.snapshot_hash()
    # dead letters: exact complement, no duplicates from the replayed epoch
    dead = sorted(r["raw"] for r in spark.read.json(dl).collect())
    assert dead == ["not json at all", '{"op":"t","ts_ms":7}']


def test_stream_scd2_crash_between_apply_and_epoch_commit(spark, tmp_path):
    """Crash AFTER scd2_apply folded the epoch (open table + closed segment
    durable) but BEFORE the epoch offset commit: on restart the re-delivered
    epoch is skipped by the applied-seq-range idempotence and the history
    equals the one-pass transform — no duplicate segments, no double fold."""
    ev = _events(spark, n=1500, seed=77)
    src = str(tmp_path / "events")
    mx = ev.agg(F.max("_seq")).collect()[0][0]
    for i in range(3):
        ev.where((F.col("_seq") * 3 / (mx + 1)).cast("int") == i).coalesce(1)\
          .write.mode("append").parquet(src)
    h = create_history_table(
        spark, _mkroot("crash-scd2-"), KEYS,
        [("lang", "string"), ("content", "string")], num_buckets=4,
    )
    schema = ("repo string, path string, lang string, content string, "
              "_seq long, _op string, _ts timestamp")
    cp = str(tmp_path / "cp")
    fired = []

    def crash_once(epoch, st):
        # on_epoch runs after the fold is durable, before the epoch commit
        if epoch == 1 and not fired:
            fired.append(True)
            raise RuntimeError("injected crash after scd2 fold")

    q = stream_scd2(spark, src, schema, h, KEYS, PAY,
                    checkpoint_dir=cp, max_files_per_trigger=1,
                    on_epoch=crash_once)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination(120)
    assert fired

    epochs = []
    q = stream_scd2(spark, src, schema, h, KEYS, PAY,
                    checkpoint_dir=cp, max_files_per_trigger=1,
                    on_epoch=lambda e, s: epochs.append(e))
    q.awaitTermination(120)
    assert 1 in epochs  # the crashed epoch WAS re-delivered (and no-op'd)

    full = _ns(tuple(r) for r in scd2_transform(ev, KEYS, PAY).collect())
    assert _hist_rows(h) == full
    # no duplicate closed segments from the replayed epoch: one live
    # segment per applied seq range
    assert len(h.closed_segments()) == len(h.applied_ranges())

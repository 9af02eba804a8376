"""L2 fallback logging: a failing checkpoint/lineage store must never lose
a batch outcome NOR stop the replay (reference: logger/sqllogger.py:20-45,
191-245 — DB log failure falls back to a rotating local JSON file)."""

import json
import os

from data_ingestor_py_spark.plans.checkpoint import Checkpoint
from data_ingestor_py_spark.plans.fallback_log import FallbackLogger
from data_ingestor_py_spark.plans.replay import replay, split_batches
from data_ingestor_py_spark.sources.generator import change_events
from tests.conftest import make_table
from tests.test_merge import _prep


def test_checkpoint_failure_falls_back_and_resume_converges(spark, tmp_path, monkeypatch):
    t = make_table(spark, tmp_path / "t")
    ev = change_events(spark, 900, n_repos=10, paths_per_repo=8, seed=41)
    batches = split_batches(ev, 3)

    real_commit = Checkpoint.commit

    def flaky(self, rec):
        if rec.batch_id == 1:
            raise OSError("metadata store unavailable")
        return real_commit(self, rec)

    monkeypatch.setattr(Checkpoint, "commit", flaky)
    out = replay(t, batches, prepare=lambda df, i: _prep(df))
    assert len(out) == 3  # the replay was NOT interrupted
    h = t.snapshot_hash()

    entries = FallbackLogger(str(tmp_path / "t" / "_fallback_logs.json")).read()
    assert len(entries) == 1
    e = entries[0]
    assert e["symbol"] == "CHECKPOINT_WRITE_FAILED" and e["batch_id"] == 1
    assert e["record"]["rows_in"] > 0 and e["record"]["status"] == "COMMITTED"
    assert "timestamp" in e and "host" in e and e["context"]["table"] == t.root

    # resume with a healthy store: batch 1 is unrecorded, re-applies
    # idempotently, and the checkpoint becomes complete
    monkeypatch.setattr(Checkpoint, "commit", real_commit)
    replay(t, batches, prepare=lambda df, i: _prep(df))
    assert t.snapshot_hash() == h
    assert Checkpoint(spark, t.root).committed_batches() == {0, 1, 2}


def test_rotation_bounds_total_size(tmp_path):
    path = str(tmp_path / "fb.json")
    fb = FallbackLogger(path, max_bytes=2000, backup_count=2)
    for i in range(200):
        fb.log("X", "m" * 50, i=i)
    files = [f for f in os.listdir(tmp_path) if f.startswith("fb.json")]
    assert len(files) <= 3  # current + 2 backups, reference's cap shape
    assert sum(os.path.getsize(tmp_path / f) for f in files) <= 3 * 2100
    entries = fb.read()
    assert entries and entries[-1]["i"] == 199  # newest survives rotation
    for e in entries:
        json.dumps(e)  # every surviving line is valid JSON


def test_entry_shape_matches_reference_format(tmp_path):
    fb = FallbackLogger(str(tmp_path / "fb.json"), context={"table": "/x"})
    line = fb.log("JOB_LOG_FAILED", "boom", batch_id=7, extra={"a": 1})
    e = json.loads(line)
    assert set(e) >= {"timestamp", "host", "symbol", "message", "context",
                      "batch_id", "extra"}
    assert e["context"]["table"] == "/x" and e["batch_id"] == 7

"""Guards on the driver contract itself: every oracle key must have a
query, names must be valid, and the checkpoint metadata compaction must be
lossless."""

import __spark_entry__ as entrymod


def test_every_oracle_has_a_query():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    missing = set(os_) - set(qs)
    assert not missing, f"oracle entries without queries: {missing}"


def test_gate_size():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert len(qs) >= 25
    assert len(os_) >= 20  # exact-oracle coverage stays high


def test_checkpoint_compaction_lossless(spark, tmp_path):
    from data_ingestor_py_spark.plans.checkpoint import BatchRecord, Checkpoint

    cp = Checkpoint(spark, str(tmp_path))
    for i in range(5):
        cp.commit(BatchRecord(i, 0, 9, 10, 8, 2, i + 1, "", "COMMITTED", 0.0, 1.0, 1.0))
    before = {r["batch_id"] for r in cp.read().collect()}
    n = cp.compact()
    assert n == 5
    assert {r["batch_id"] for r in cp.read().collect()} == before
    assert cp.committed_batches() == before
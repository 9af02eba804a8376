"""Guards on the driver contract itself: every oracle key must have a
query, names must be valid, and the checkpoint metadata compaction must be
lossless."""

import __spark_entry__ as entrymod


def test_every_oracle_has_a_query():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    missing = set(os_) - set(qs)
    assert not missing, f"oracle entries without queries: {missing}"


REGISTRY_SIZE = 85  # r6: 79 r5 gates + interval-join-outer, approx-distinct,
# bpe, incremental-snapshot-cutover, exact-substring-dedup, toast-carry-forward


def test_gate_size_exact():
    """The old `>= 25` floor stopped guarding anything at 79 gates
    (VERDICT r5): an accidental registry truncation must fail LOUDLY.
    Growing the registry means updating this pin AND COVERAGE.md."""
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert len(qs) == REGISTRY_SIZE, (
        f"queries() holds {len(qs)} entries, expected {REGISTRY_SIZE} — "
        "dropped gates fail here, added gates update the pin"
    )
    assert set(qs) == set(os_), (
        "every gate carries a value-exact oracle; divergence: "
        f"{sorted(set(qs) ^ set(os_))}"
    )


def test_every_gate_documented_in_coverage():
    import os

    cov_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "COVERAGE.md")
    cov = open(cov_path).read()
    undocumented = sorted(k for k in entrymod.queries() if k not in cov)
    assert not undocumented, (
        f"gates missing from COVERAGE.md: {undocumented}"
    )


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
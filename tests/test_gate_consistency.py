"""Guards on the driver contract itself: every oracle key must have a
query, names must be valid, and the checkpoint metadata compaction must be
lossless."""

import __spark_entry__ as entrymod


def test_every_oracle_has_a_query():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    missing = set(os_) - set(qs)
    assert not missing, f"oracle entries without queries: {missing}"


REGISTRY_SIZE = 86  # r6: 79 r5 gates + interval-join-outer, approx-distinct,
# bpe, incremental-snapshot-cutover, exact-substring-dedup,
# toast-carry-forward, time-travel-read


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

# Round-7 window policy (COVERAGE.md): gates REQUIRED inside the driver's
# first-50 window — the FULL r6 tail (no r6 driver row -> must get an r7
# one, so r6∪r7 covers all 86) plus every gate whose implementation this
# round's optimization work touches. An accidental dict reorder silently
# drops driver coverage; this pins it structurally.
R7_MUST_BE_IN_WINDOW = [
    # touched by r7 optimizations / fixes
    "cdc_merge_full_replay", "cdc_merge_mor_replay",
    "schema_evolution_replay", "checkpoint_lineage_counts",
    "exact_substring_dedup", "minhash_lsh_neardup", "neardup_clusters",
    "embedding_cosine_neardup", "stream_interval_join_outer",
    "sessionize_stream_closed", "incremental_snapshot_cutover",
    "toast_carry_forward", "incremental_topk_leaderboard",
    "approx_distinct_mv",
    # the full r6 tail (36)
    "exact_dedup_documents", "minhash_signatures", "simhash_fingerprints",
    "doc_fingerprint_rolling", "quality_metrics", "language_id",
    "token_count_regex", "stratified_sample_langs",
    "strip_boilerplate_highdf", "repetition_gopher", "redact_pii",
    "mixture_sample", "bigram_lm_fluency", "debezium_roundtrip",
    "debezium_schema_evolution", "bm25_topk", "bm25_incremental_index",
    "stream_interval_join", "stream_windowed_rollup",
    "incremental_mv_minmax", "topk_orders_by_value",
    "running_revenue_window", "pipeline_training_prep",
    "excel_roundtrip_scan", "pipe_csv_roundtrip", "json_roundtrip_scan",
    "xml_roundtrip_scan", "rollup_pricing", "pivot_events_by_type",
    "percentiles_order_value", "semi_anti_joins", "set_ops_active_users",
    "incremental_join_enrich", "scd2_history", "snapshot_stream_handoff",
    "incremental_mv_count_distinct",
]


def test_round7_window_composition():
    window = list(entrymod.queries())[:50]
    missing = [k for k in R7_MUST_BE_IN_WINDOW if k not in window]
    assert not missing, (
        f"gates required in the driver's first-50 window are outside it: "
        f"{missing}"
    )
    assert len(R7_MUST_BE_IN_WINDOW) == 50

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

# Round-6 window policy (COVERAGE.md): gates REQUIRED inside the driver's
# first-50 window — every gate new this round, plus the full r5 tail
# (no r5 driver row -> must get an r6 one). An accidental dict reorder
# silently drops driver coverage; this pins it structurally.
R6_MUST_BE_IN_WINDOW = [
    # new this round
    "stream_interval_join_outer", "approx_distinct_mv", "token_count_bpe",
    "incremental_snapshot_cutover", "exact_substring_dedup",
    "toast_carry_forward", "time_travel_read",
    # the full r5 tail (29)
    "dedup_latest_by_key", "join_revenue_by_nation", "neardup_clusters",
    "dedup_salted_latest", "mapping_projection", "flatten_explode_tokens",
    "broadcast_dict_join", "vectorized_normalize", "vocab_top100",
    "groupby_argmax_mode", "agg_pricing_summary", "session_window_native",
    "ngram_jaccard_pairs", "sessionize_events", "multimodal_decode_features",
    "multimodal_resize", "multimodal_frame_sample", "ann_topk_cosine",
    "ann_lsh_bucketed", "ann_ivf_topk", "ivf_trained_topk",
    "embedding_cosine_neardup", "asof_join_purchase_value",
    "range_join_event_bursts", "train_val_test_split", "pack_sequences",
    "decontaminate_benchmark", "kmeans_centroids", "sessionize_stream_closed",
]


def test_round6_window_composition():
    window = list(entrymod.queries())[:50]
    missing = [k for k in R6_MUST_BE_IN_WINDOW if k not in window]
    assert not missing, (
        f"gates required in the driver's first-50 window are outside it: "
        f"{missing}"
    )

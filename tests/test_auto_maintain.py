"""Policy-driven auto-maintenance (plans/maintenance.py).

Invariant: a maintenance pass NEVER changes visible state; it runs only
the actions the manifest says are needed and is a no-op immediately
re-run.
"""

from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.maintenance import auto_maintain
from data_ingestor_py_spark.plans.target import TargetTable


def _batch(spark, n, seq0):
    return spark.range(n).select(
        F.col("id").cast("string").alias("id"),
        F.sha2(F.col("id").cast("string"), 256).alias("commit"),
        (F.col("id") % 100).alias("x"),
        (F.col("id") + seq0).alias("_seq"),
        F.lit("U").alias("_op"),
        F.lit(None).cast("timestamp").alias("_ts"),
    )


def test_auto_maintain_runs_needed_actions_and_preserves_state(spark, tmp_path):
    t = TargetTable.create(
        spark, str(tmp_path / "t"), key_cols=["id"],
        columns=[("commit", "string"), ("x", "long")],
        num_buckets=4, merge_mode="mor", mor_max_deltas=8,
        stats_cols=["x"],
    )
    for i in range(5):
        t.merge_apply(_batch(spark, 300, i * 1000), stats="light")
    t.build_bloom("commit")
    t.merge_apply(_batch(spark, 100, 9000), stats="light")  # uncovered dirs
    h0 = t.snapshot_hash()

    rep = auto_maintain(t, expire_keep=2, stale_after=2)
    # MoR with 6 batches at threshold 4 -> compaction ran; blooms refreshed
    assert "compact_deltas" in rep or "rewrite" in rep
    assert "bloom" in rep and rep["bloom"]["commit"]["dirs_built"] > 0
    assert rep["expired_keep"] == 2
    assert t.snapshot_hash() == h0

    # immediately again: nothing left to do (no compaction/bloom/rewrite)
    rep2 = auto_maintain(t, expire_keep=2, stale_after=2)
    assert "bloom" not in rep2 and "compact_deltas" not in rep2
    assert t.snapshot_hash() == h0


def test_auto_maintain_cow_plain_noop(spark, tmp_path):
    t = TargetTable.create(
        spark, str(tmp_path / "c"), key_cols=["id"],
        columns=[("commit", "string"), ("x", "long")], num_buckets=2,
    )
    t.merge_apply(_batch(spark, 100, 0), stats="light")
    h0 = t.snapshot_hash()
    rep = auto_maintain(t)
    assert rep == {}  # fresh COW table, no stats configured, no blooms
    assert t.snapshot_hash() == h0


def test_bloom_refresh_survives_column_rename(spark, tmp_path):
    """The sidecar is keyed by field id; auto_maintain inverts it to the
    CURRENT name after a rename and keeps refreshing incrementally."""
    t = TargetTable.create(
        spark, str(tmp_path / "r"), key_cols=["id"],
        columns=[("commit", "string")], num_buckets=2,
    )
    t.merge_apply(_batch(spark, 100, 0).select("id", "commit", "_seq", "_op", "_ts"), stats="light")
    t.build_bloom("commit")
    t.evolve(rename={"commit": "sha"})
    t.merge_apply(
        _batch(spark, 150, 1000).select(
            "id", F.col("commit").alias("sha"), "_seq", "_op", "_ts"
        ),
        stats="light",
    )
    rep = auto_maintain(t)
    assert rep["bloom"]["sha"]["dirs_built"] > 0
    # probe by the NEW name over both old- and new-name files
    probe = spark.range(1).select(F.sha2(F.lit("120"), 256).alias("c")).first()["c"]
    rows = t.read_where([("sha", "=", probe)]).collect()
    assert len(rows) == 1 and rows[0]["id"] == "120"
    assert t.scan_plan([("sha", "=", "ghost")])["files_read"] == 0

"""End-to-end replay suites (BASELINE.json: replay correctness).

Invariant: the final table state is a pure function of the event set —
independent of batch count, batch assignment, parallelism, or salting —
verified by the order-insensitive snapshot hash over per-row sha256 (M7).
"""

from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.replay import replay, split_batches
from data_ingestor_py_spark.sources.generator import change_events
from tests.conftest import make_table

N_EVENTS = 3000
GEN = dict(n_repos=30, paths_per_repo=20, seed=17, skew=2.5)


def _prep(df, i=0):
    return df.withColumn("_content_sha256", F.sha2(F.col("content"), 256)).select(
        "repo", "path", "commit", "lang", "content", "_content_sha256", "_seq", "_op", "_ts"
    )


def _replay(spark, tmp, n_batches, salt=0, assign=None):
    t = make_table(spark, tmp)
    ev = change_events(spark, N_EVENTS, **GEN)
    recs = replay(t, split_batches(ev, n_batches, assign=assign), prepare=_prep, salt_buckets=salt)
    return t, recs


def test_final_state_independent_of_batch_count(spark, tmp_path):
    h = {}
    for k in (1, 3, 7):
        t, _ = _replay(spark, tmp_path / f"b{k}", k)
        h[k] = t.snapshot_hash()
    assert len(set(h.values())) == 1, h


def test_final_state_independent_of_batch_assignment(spark, tmp_path):
    t1, _ = _replay(spark, tmp_path / "hash4", 4)  # xxhash64 interleave
    t2, _ = _replay(spark, tmp_path / "mod4", 4, assign=F.pmod(F.col("event_id"), F.lit(4)))
    t3, _ = _replay(
        spark, tmp_path / "range4", 4,
        assign=F.floor(F.col("event_id") / F.lit(N_EVENTS / 4)),
    )
    assert t1.snapshot_hash() == t2.snapshot_hash() == t3.snapshot_hash()


def test_final_state_independent_of_salting(spark, tmp_path):
    t1, _ = _replay(spark, tmp_path / "plain", 3)
    t2, _ = _replay(spark, tmp_path / "salted", 3, salt=8)
    assert t1.snapshot_hash() == t2.snapshot_hash()


def test_final_state_matches_reference_semantics(spark, tmp_path):
    """Last-writer-wins per key, deletes hide: recompute expected state
    directly from the event stream and compare hashes row-by-row."""
    t, _ = _replay(spark, tmp_path / "t", 5)
    ev = _prep(change_events(spark, N_EVENTS, **GEN))
    w_expected = (
        ev.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window
                .partitionBy("repo", "path")
                .orderBy(F.desc("_seq"))
            ),
        )
        .where("rn = 1 AND _op <> 'D'")
        .drop("rn")
    )
    got = t.read()
    cols = sorted(got.columns)
    lhs = {tuple(r) for r in got.select(*cols).collect()}
    rhs = {tuple(r) for r in w_expected.select(*cols).collect()}
    assert lhs == rhs


def test_content_sha_invariant(spark, tmp_path):
    """input_hint invariant: stored _content_sha256 == sha2(content, 256)
    for every surviving row."""
    t, _ = _replay(spark, tmp_path / "t", 3)
    bad = t.read().where(
        (F.col("content").isNotNull())
        & (F.col("_content_sha256") != F.sha2(F.col("content"), 256))
    )
    assert bad.count() == 0


def test_lineage_counts_match(spark, tmp_path):
    from data_ingestor_py_spark.plans.checkpoint import Checkpoint, Lineage

    t, recs = _replay(spark, tmp_path / "t", 4)
    cp = Checkpoint(spark, t.root).read().collect()
    assert sorted(r["batch_id"] for r in cp) == [0, 1, 2, 3]
    assert all(r["status"] == "COMMITTED" for r in cp)
    lin = Lineage(spark, t.root).read()
    per_batch = {
        r["batch_id"]: r["s"]
        for r in lin.groupBy("batch_id").agg(F.sum("rows").alias("s")).collect()
    }
    for r in cp:
        assert per_batch[r["batch_id"]] == r["rows_applied"]
"""Merge-apply core semantics (M1/M2/M9): upsert, delete, late events,
idempotent re-apply. Reference behaviour generalized: INSERT
(db/postgres_query_builder.py:16-41) + UPDATE (:43-45) + at-least-once retry
(msgbroker/sql_consumer.py:155-156) -> exactly-once MERGE."""

from pyspark.sql import functions as F

from data_ingestor_py_spark.sources.generator import change_events
from tests.conftest import make_table

EVENT_COLS = ["repo", "path", "commit", "lang", "content", "_seq", "_op", "_ts"]


def _prep(df):
    return df.withColumn("_content_sha256", F.sha2(F.col("content"), 256)).select(
        "repo", "path", "commit", "lang", "content", "_content_sha256", "_seq", "_op", "_ts"
    )


def _mk_events(spark, rows):
    """rows: (repo, path, seq, op, content)"""
    df = spark.createDataFrame(
        [(r, p, f"c{s}", "py", c, s, o) for (r, p, s, o, c) in rows],
        "repo string, path string, commit string, lang string, content string, _seq long, _op string",
    )
    return df.withColumn("_ts", F.timestamp_seconds(F.col("_seq")))


def test_upsert_insert_update_delete(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    b1 = _mk_events(
        spark,
        [
            ("r1", "a", 1, "I", "v1"),
            ("r1", "b", 2, "I", "v1"),
            ("r2", "a", 3, "I", "v1"),
        ],
    )
    t.merge_apply(_prep(b1))
    assert t.read().count() == 3

    b2 = _mk_events(
        spark,
        [
            ("r1", "a", 4, "U", "v2"),  # update wins
            ("r1", "b", 5, "D", None),  # delete
            ("r3", "x", 6, "I", "v1"),  # new key
        ],
    )
    t.merge_apply(_prep(b2))
    state = {(r["repo"], r["path"]): r["content"] for r in t.read().collect()}
    assert state == {("r1", "a"): "v2", ("r2", "a"): "v1", ("r3", "x"): "v1"}


def test_late_event_loses(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    t.merge_apply(_prep(_mk_events(spark, [("r1", "a", 10, "U", "new")])))
    # late event with lower _seq must NOT overwrite (M9)
    t.merge_apply(_prep(_mk_events(spark, [("r1", "a", 5, "U", "old")])))
    assert t.read().collect()[0]["content"] == "new"


def test_delete_tombstone_blocks_late_upsert(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    t.merge_apply(_prep(_mk_events(spark, [("r1", "a", 10, "D", None)])))
    t.merge_apply(_prep(_mk_events(spark, [("r1", "a", 3, "U", "zombie")])))
    assert t.read().count() == 0  # tombstone wins over older upsert
    # but a NEWER insert resurrects the key
    t.merge_apply(_prep(_mk_events(spark, [("r1", "a", 11, "I", "alive")])))
    assert t.read().collect()[0]["content"] == "alive"


def test_reapply_batch_is_idempotent(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    ev = change_events(spark, 500, n_repos=20, paths_per_repo=10, seed=7)
    batch = _prep(ev)
    t.merge_apply(batch)
    h1 = t.snapshot_hash()
    t.merge_apply(batch)  # full replay of the same batch
    assert t.snapshot_hash() == h1


def test_exact_duplicates_collapse(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    dup = _mk_events(spark, [("r1", "a", 1, "I", "v1"), ("r1", "a", 1, "I", "v1")])
    stats = t.merge_apply(_prep(dup))
    assert stats.rows_after_dedup == 1
    assert t.read().count() == 1


def test_salted_merge_equals_plain(spark, tmp_path):
    ev = change_events(spark, 2000, n_repos=5, paths_per_repo=5, seed=3, skew=4.0)
    t1 = make_table(spark, tmp_path / "plain")
    t2 = make_table(spark, tmp_path / "salted")
    t1.merge_apply(_prep(ev))
    t2.merge_apply(_prep(ev), salt_buckets=16)
    assert t1.snapshot_hash() == t2.snapshot_hash()


def test_copy_on_write_reuses_untouched_buckets(spark, tmp_path):
    t = make_table(spark, tmp_path / "t", num_buckets=8)
    ev = change_events(spark, 1000, n_repos=50, paths_per_repo=20, seed=1)
    t.merge_apply(_prep(ev))
    m1 = t._load()
    # second batch touches exactly one key -> exactly one bucket rewritten
    one = _mk_events(spark, [("r1", "only", 10**9, "I", "x")])
    t.merge_apply(_prep(one))
    m2 = t._load()
    changed = [b for b in m1["buckets"] if m1["buckets"][b] != m2["buckets"][b]]
    assert len(changed) == 1
    unchanged = [b for b in m1["buckets"] if b not in changed]
    assert all(m2["buckets"][b]["path"].startswith("snap-000001") for b in unchanged)


def test_bulk_load_then_incremental(spark, tmp_path):
    """Initial snapshot via the bulk-load fast path, then incremental
    merges — equivalent to replaying everything through merge_apply."""
    from data_ingestor_py_spark.sources.generator import repo_files_seed

    seed = _prep(repo_files_seed(spark, 800, n_repos=20, paths_per_repo=10, seed=21))
    from data_ingestor_py_spark.operators.dedup import latest_by_key

    snapshot = latest_by_key(seed, ["repo", "path"])  # one row per key
    inc = _prep(change_events(spark, 1200, n_repos=20, paths_per_repo=10, seed=21)).where(
        "_seq >= 800"
    )

    t1 = make_table(spark, tmp_path / "bulk")
    t1.bulk_load(snapshot.select(*snapshot.columns))
    t1.merge_apply(inc)

    t2 = make_table(spark, tmp_path / "merge")
    t2.merge_apply(seed)
    t2.merge_apply(inc)
    assert t1.snapshot_hash() == t2.snapshot_hash()


def test_repo_bucketing_prunes_repo_local_batches(spark, tmp_path):
    """Partition-spec choice: bucketing on repo alone co-locates a repo's
    files, so a repo-local batch touches exactly one bucket (vs scattering
    across all buckets under full-key hashing)."""
    from data_ingestor_py_spark.plans.target import TargetTable

    t = TargetTable.create(
        spark, str(tmp_path / "t"), key_cols=["repo", "path"],
        columns=[("commit", "string"), ("lang", "string"), ("content", "string"),
                 ("_content_sha256", "string")],
        num_buckets=16, bucket_cols=["repo"],
    )
    ev = _prep(change_events(spark, 2000, n_repos=30, paths_per_repo=10, seed=6))
    t.merge_apply(ev)
    one_repo = _prep(
        change_events(spark, 4000, n_repos=30, paths_per_repo=10, seed=6)
    ).where("repo = 'repo-0003' AND _seq >= 2000")
    st = t.merge_apply(one_repo)
    assert st.touched_buckets == 1
    # per-key dedup semantics unaffected by the partition spec
    ref = make_table(spark, tmp_path / "ref", num_buckets=16)
    ref.merge_apply(ev)
    ref.merge_apply(one_repo)
    assert t.snapshot_hash() == ref.snapshot_hash()


def test_purge_tombstones_and_metrics(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    from data_ingestor_py_spark.plans.replay import replay, split_batches

    ev = change_events(spark, 1500, n_repos=10, paths_per_repo=10, seed=4, delete_rate=0.4)
    replay(t, split_batches(ev, 3), prepare=lambda df, i: _prep(df))
    visible_before = t.snapshot_hash()
    raw_before = t.read_raw().count()
    n_tomb = t.read_raw().where("_op = 'D'").count()
    assert n_tomb > 0
    purged = t.purge_tombstones(older_than_seq=10**9)  # watermark beyond all
    assert purged == n_tomb
    assert t.read_raw().count() == raw_before - n_tomb
    assert t.snapshot_hash() == visible_before  # visible state unchanged

    m = t.metrics_summary()
    assert m["batches_committed"] == 3 and m["errors"] == 0
    assert m["records_read"] == 1500
    assert m["processing_time_seconds_sum"] > 0


def test_diff_versions_changelog(spark, tmp_path):
    """Incremental changelog read: I/U/D between two snapshots' visible
    states, NULL-safe on keys."""
    t = make_table(spark, tmp_path / "t")
    t.merge_apply(_prep(_mk_events(spark, [
        ("r1", "a", 1, "I", "v1"),       # stays unchanged -> absent from diff
        ("r1", "b", 2, "I", "v1"),       # updated later -> U
        ("r1", "c", 3, "I", "v1"),       # deleted later -> D
        ("r1", None, 4, "I", "null1"),   # NULL key updated later -> U
    ])))
    v_old = t._load()["version"]
    t.merge_apply(_prep(_mk_events(spark, [
        ("r1", "b", 10, "U", "v2"),
        ("r1", "c", 11, "D", None),
        ("r1", None, 12, "U", "null2"),
        ("r2", "x", 13, "I", "new"),     # inserted -> I
    ])))
    v_new = t._load()["version"]
    d = {(r["repo"], r["path"]): (r["_change_type"], r["content"])
         for r in t.diff_versions(v_old, v_new).collect()}
    assert d == {
        ("r1", "b"): ("U", "v2"),
        ("r1", "c"): ("D", "v1"),  # delete carries the last old image
        ("r1", None): ("U", "null2"),
        ("r2", "x"): ("I", "new"),
    }

"""rewrite_data_files (Iceberg data-file compaction analogue): state is
byte-identical before/after, old-schema buckets are retired to the current
schema, consolidated snapshots become expirable, and time travel across
the rewrite still works."""

import os
import tempfile

from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.replay import replay, split_batches
from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.sources import change_events


def _mkroot():
    d = tempfile.mkdtemp(prefix="rwf-")
    os.rmdir(d)
    return d


def _build(spark, n_batches=4):
    t = TargetTable.create(
        spark, _mkroot(), key_cols=["repo", "path"],
        columns=[("lang", "string"), ("content", "string")], num_buckets=8,
    )
    ev = change_events(spark, 5000, n_repos=12, paths_per_repo=12, seed=17)
    prep = lambda df, i: df.select(  # noqa: E731
        "repo", "path", "lang", "content", "_seq", "_op", "_ts"
    )
    replay(t, split_batches(ev, n_batches), prepare=prep)
    return t


def _snap_dirs(t):
    return sorted(d for d in os.listdir(t.root) if d.startswith("snap-"))


def test_full_rewrite_preserves_state_and_consolidates(spark):
    t = _build(spark)
    h0 = t.snapshot_hash()
    m0 = t._load()
    all_buckets = sorted(int(b) for b in m0["buckets"])
    assert len(_snap_dirs(t)) > 1  # COW left live files in several dirs
    v = t.rewrite_data_files(bucket_ids=all_buckets)
    assert v == m0["version"] + 1
    m1 = t._load()
    rels = {e["path"].split("/")[0] for e in m1["buckets"].values()}
    assert len(rels) == 1  # everything lives in ONE fresh snapshot dir
    assert t.snapshot_hash() == h0
    # time travel to the pre-rewrite version still reads the old files
    assert t.read_version(m0["version"]).count() == t.read().count()
    # after expiry the old dirs are deletable (keep_last=1 keeps current)
    t.expire_snapshots(keep_last=1)
    assert _snap_dirs(t) == sorted(rels)


def test_rewrite_retires_old_schema_files(spark):
    t = _build(spark)
    # metadata-only evolution AFTER the replay: every bucket's files are
    # now written under a non-current schema and pay _align on every read
    t.evolve(add=[("stars", "long")])
    m0 = t._load()
    cur = m0["current_schema"]
    stale = [int(b) for b, e in m0["buckets"].items() if e["schema"] != cur]
    assert stale, "evolution should have left old-schema buckets"
    h0 = t.snapshot_hash()
    v = t.rewrite_data_files()  # auto-selection: old-schema buckets qualify
    assert v is not None
    m1 = t._load()
    assert all(e["schema"] == cur for e in m1["buckets"].values())
    assert t.snapshot_hash() == h0
    # evolved column materialized with NULLs for pre-evolution rows
    assert t.read().where(F.col("stars").isNull()).count() == t.read().count()


def test_rewrite_noop_when_fresh(spark):
    t = _build(spark, n_batches=2)
    # nothing is older than stale_after=8 versions and schemas are current
    assert t.rewrite_data_files() is None


def test_rewrite_then_merge_continues(spark):
    t = _build(spark)
    t.rewrite_data_files(bucket_ids=sorted(int(b) for b in t._load()["buckets"]))
    ev2 = change_events(spark, 1500, n_repos=12, paths_per_repo=12, seed=99)
    prep = lambda df, i: df.select(  # noqa: E731
        "repo", "path", "lang", "content", "_seq", "_op", "_ts"
    )
    t.merge_apply(prep(ev2, 0))  # not via replay: t's checkpoint has ids 0-3
    # merged state equals replaying everything into a fresh table
    t2 = TargetTable.create(
        spark, _mkroot(), key_cols=["repo", "path"],
        columns=[("lang", "string"), ("content", "string")], num_buckets=8,
    )
    ev = change_events(spark, 5000, n_repos=12, paths_per_repo=12, seed=17)
    t2.merge_apply(prep(ev, 0))
    t2.merge_apply(prep(ev2, 0))
    assert t.snapshot_hash() == t2.snapshot_hash()

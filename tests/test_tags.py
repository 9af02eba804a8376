"""Snapshot tags (Iceberg refs): named time travel, retention anchoring
through expire_snapshots, and tag lifecycle under the CAS protocol."""

import os
import tempfile

import pytest

from data_ingestor_py_spark.plans.replay import replay, split_batches
from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.sources import change_events

PREP = lambda df, i: df.select(  # noqa: E731
    "repo", "path", "lang", "content", "_seq", "_op", "_ts"
)


def _build(spark, n_batches=3):
    root = tempfile.mkdtemp(prefix="tags-")
    os.rmdir(root)
    t = TargetTable.create(
        spark, root, key_cols=["repo", "path"],
        columns=[("lang", "string"), ("content", "string")], num_buckets=4,
    )
    ev = change_events(spark, 3000, n_repos=10, paths_per_repo=10, seed=19)
    replay(t, split_batches(ev, n_batches), prepare=PREP)
    return t


def test_tag_read_and_expiry_anchor(spark):
    t = _build(spark)
    v_mid = t._load()["version"] - 1
    mid_count = t.read_version(v_mid).count()
    t.tag_snapshot("training-v1", v_mid)
    # advance the table, then expire aggressively
    ev2 = change_events(spark, 1000, n_repos=10, paths_per_repo=10, seed=20)
    t.merge_apply(PREP(ev2, 0))
    t.expire_snapshots(keep_last=1)
    # the tagged snapshot still reads in full; its count is frozen
    assert t.read_tag("training-v1").count() == mid_count
    # and diffing FROM the tagged version to the live head still works
    # (the tag pinned its dirs; intermediate untagged snapshots may not be
    # diffable after expiry — that is the retention contract)
    assert t.diff_versions(v_mid, t._load()["version"]).count() >= 0


def test_drop_tag_releases_dirs(spark):
    t = _build(spark)
    v_mid = t._load()["version"] - 1
    t.tag_snapshot("tmp", v_mid)
    ev2 = change_events(spark, 800, n_repos=10, paths_per_repo=10, seed=21)
    t.merge_apply(PREP(ev2, 0))
    t.expire_snapshots(keep_last=1)
    before = {d for d in os.listdir(t.root) if d.startswith("snap-")}
    t.drop_tag("tmp")
    t.expire_snapshots(keep_last=1)
    after = {d for d in os.listdir(t.root) if d.startswith("snap-")}
    assert after < before  # the tag was the only thing keeping dirs alive
    with pytest.raises(KeyError):
        t.read_tag("tmp")


def test_tag_unknown_version_rejected(spark):
    t = _build(spark, n_batches=1)
    with pytest.raises(FileNotFoundError):
        t.tag_snapshot("bad", 999)

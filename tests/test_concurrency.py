"""Multi-writer safety (optimistic commit protocol) + partition-spec
rewrite (the bucket-growth maintenance op).

The manifest commit is a CAS: O_EXCL creation of the per-version manifest
file claims the snapshot number; losers get CommitConflict and merge_apply
recomputes against the winner's snapshot. A crash between claim and main-
pointer swap is rolled forward by the next _load().
"""

import json
import threading

from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.target import CommitConflict, TargetTable
from data_ingestor_py_spark.sources.generator import change_events
from tests.conftest import make_table
from tests.test_merge import _mk_events, _prep


def test_concurrent_merges_both_commit(spark, tmp_path):
    """Two writers merging different batches concurrently: both commits must
    land (one wins the race, the other retries) and the final state must
    equal sequential application."""
    root = tmp_path / "t"
    t = make_table(spark, root)
    ev = change_events(spark, 2000, n_repos=20, paths_per_repo=10, seed=13)
    b1 = _prep(ev.where("event_id % 2 = 0"))
    b2 = _prep(ev.where("event_id % 2 = 1"))

    errs = []

    def work(batch):
        try:
            # each thread is its own writer instance (separate process in
            # real deployments; the manifest protocol is file-level)
            TargetTable(spark, str(root)).merge_apply(batch)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th1 = threading.Thread(target=work, args=(b1,))
    th2 = threading.Thread(target=work, args=(b2,))
    th1.start(); th2.start(); th1.join(); th2.join()
    assert not errs, errs
    assert t._load()["version"] == 2  # both snapshots landed

    ref = make_table(spark, tmp_path / "ref")
    ref.merge_apply(b1)
    ref.merge_apply(b2)
    assert t.snapshot_hash() == ref.snapshot_hash()


def test_stale_commit_conflicts_and_retry_succeeds(spark, tmp_path):
    """The CAS itself: two manifests built on the same base racing for the
    same version number — the second claim must raise CommitConflict (and
    the public merge path, which reloads + retries, must still succeed)."""
    import copy

    import pytest

    t = make_table(spark, tmp_path / "t")
    t.merge_apply(_prep(_mk_events(spark, [("r1", "a", 1, "I", "v1")])))
    base = t._load()
    winner = copy.deepcopy(base)
    winner["version"] += 1
    t._commit_manifest(winner)  # writer A lands v2
    loser = copy.deepcopy(base)
    loser["version"] += 1  # writer B, built on the SAME base, races for v2
    with pytest.raises(CommitConflict):
        t._commit_manifest(loser)
    # the retrying public path reloads and lands on v3
    t.merge_apply(_prep(_mk_events(spark, [("r1", "b", 2, "I", "v2")])))
    assert t._load()["version"] == 3
    assert t.read().count() == 2


def test_crashed_commit_rolls_forward(spark, tmp_path):
    """Crash between the version-file claim and the main-pointer swap: the
    next reader promotes the claimed manifest (data files are complete
    before the claim), so the committed merge is never lost."""
    t = make_table(spark, tmp_path / "t")
    t.merge_apply(_prep(_mk_events(spark, [("r1", "a", 1, "I", "v1")])))
    with open(t._manifest_path) as f:
        old_pointer = f.read()
    t.merge_apply(_prep(_mk_events(spark, [("r1", "a", 2, "U", "v2")])))
    h_after = t.snapshot_hash()
    # simulate the crash: rewind the main pointer, leave the v2 token
    with open(t._manifest_path, "w") as f:
        f.write(old_pointer)
    t2 = TargetTable(spark, t.root)
    m = t2._load()
    assert m["version"] == 2  # rolled forward
    assert t2.snapshot_hash() == h_after
    with open(t2._manifest_path) as f:
        assert json.load(f)["version"] == 2  # pointer repaired on disk


def test_rewrite_partition_spec_grows_buckets(spark, tmp_path):
    """Grow B=8 -> B=64: visible state (snapshot_hash) unchanged, manifest
    reflects the new spec, and subsequent merges use the new layout (merge
    window parallelism now tracks 64 buckets)."""
    t = make_table(spark, tmp_path / "t", num_buckets=8)
    ev = change_events(spark, 3000, n_repos=40, paths_per_repo=20, seed=17,
                       delete_rate=0.1)
    t.merge_apply(_prep(ev.where("event_id < 2000")))
    h_before = t.snapshot_hash()
    raw_before = t.read_raw().count()  # tombstones must survive the rewrite

    v = t.rewrite_partition_spec(64)
    m = t._load()
    assert m["version"] == v and m["num_buckets"] == 64
    assert t.snapshot_hash() == h_before
    assert t.read_raw().count() == raw_before
    assert all(info["path"].startswith(f"snap-{v:06d}") for info in m["buckets"].values())
    assert len(m["buckets"]) > 8  # parallelism actually grew

    # incremental merge on the new layout stays correct vs a from-scratch
    # table at B=64
    inc = _prep(ev.where("event_id >= 2000"))
    st = t.merge_apply(inc)
    assert st.touched_buckets > 8
    ref = make_table(spark, tmp_path / "ref", num_buckets=64)
    ref.merge_apply(_prep(ev.where("event_id < 2000")))
    ref.merge_apply(inc)
    assert t.snapshot_hash() == ref.snapshot_hash()


def test_rewrite_partition_spec_new_bucket_cols(spark, tmp_path):
    """Re-bucket from full-key to repo-only: repo-local batches then touch
    exactly one bucket (partition-spec evolution, Iceberg-style)."""
    t = make_table(spark, tmp_path / "t", num_buckets=16)
    ev = change_events(spark, 2000, n_repos=30, paths_per_repo=10, seed=6)
    t.merge_apply(_prep(ev))
    h = t.snapshot_hash()
    t.rewrite_partition_spec(16, new_bucket_cols=["repo"])
    assert t.snapshot_hash() == h
    one_repo = _prep(
        change_events(spark, 4000, n_repos=30, paths_per_repo=10, seed=6)
    ).where("repo = 'repo-0003' AND _seq >= 2000")
    st = t.merge_apply(one_repo)
    assert st.touched_buckets == 1


def test_rewrite_partition_spec_on_empty_table(spark, tmp_path):
    t = make_table(spark, tmp_path / "t", num_buckets=4)
    v = t.rewrite_partition_spec(32)
    m = t._load()
    assert m["num_buckets"] == 32 and m["version"] == v and m["buckets"] == {}
    # table remains fully usable under the new spec
    t.merge_apply(_prep(_mk_events(spark, [("r1", "a", 1, "I", "v1")])))
    assert t.read().count() == 1


def test_merge_raises_after_retry_exhaustion(spark, tmp_path):
    import pytest as _pytest

    t = make_table(spark, tmp_path / "t")
    t.merge_apply(_prep(_mk_events(spark, [("r1", "a", 1, "I", "v1")])))

    real_commit = TargetTable._commit_manifest

    def sabotage(self, m):
        # another writer always steals the version first
        import copy
        winner = copy.deepcopy(m)
        real_commit(self, winner)
        raise CommitConflict("stolen")

    orig = TargetTable._commit_manifest
    TargetTable._commit_manifest = sabotage
    try:
        with _pytest.raises(CommitConflict):
            t.merge_apply(
                _prep(_mk_events(spark, [("r1", "b", 2, "I", "v2")])),
                max_commit_retries=2,
            )
    finally:
        TargetTable._commit_manifest = orig

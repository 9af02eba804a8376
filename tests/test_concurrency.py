"""Multi-writer safety (optimistic commit protocol) + partition-spec
rewrite (the bucket-growth maintenance op).

The manifest commit is a CAS over a pluggable StorageAdapter: put_if_absent
of the per-version manifest object claims the snapshot number; losers get
CommitConflict and merge_apply recomputes against the winner's snapshot. A
crash between claim and main-pointer put is rolled forward by the next
_load(). Every test here runs against BOTH adapters — the POSIX one and the
conditional-PUT (S3/GCS object-store contract) one — pinning the claim that
only the adapter changes between a laptop and an object-store deployment.
"""

import json
import threading

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.target import CommitConflict, TargetTable
from data_ingestor_py_spark.sources.generator import change_events
from data_ingestor_py_spark.storage import ConditionalPutStorage, PosixStorage
from tests.conftest import make_table
from tests.test_merge import _mk_events, _prep


@pytest.fixture(params=["posix", "conditional_put"])
def storage(request):
    return PosixStorage() if request.param == "posix" else ConditionalPutStorage()


def test_concurrent_merges_both_commit(spark, tmp_path, storage):
    """Two writers merging different batches concurrently: both commits must
    land (one wins the race, the other retries) and the final state must
    equal sequential application."""
    root = tmp_path / "t"
    t = make_table(spark, root, storage=storage)
    ev = change_events(spark, 2000, n_repos=20, paths_per_repo=10, seed=13)
    b1 = _prep(ev.where("event_id % 2 = 0"))
    b2 = _prep(ev.where("event_id % 2 = 1"))

    errs = []

    def work(batch):
        try:
            # each thread is its own writer instance (separate process in
            # real deployments; the commit protocol is object-level)
            TargetTable(spark, str(root), storage=storage).merge_apply(batch)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    th1 = threading.Thread(target=work, args=(b1,))
    th2 = threading.Thread(target=work, args=(b2,))
    th1.start(); th2.start(); th1.join(); th2.join()
    assert not errs, errs
    assert t._load()["version"] == 2  # both snapshots landed

    ref = make_table(spark, tmp_path / "ref", storage=storage)
    ref.merge_apply(b1)
    ref.merge_apply(b2)
    assert t.snapshot_hash() == ref.snapshot_hash()


def test_stale_commit_conflicts_and_retry_succeeds(spark, tmp_path, storage):
    """The CAS itself: two manifests built on the same base racing for the
    same version number — the second claim must raise CommitConflict (and
    the public merge path, which reloads + retries, must still succeed)."""
    import copy

    t = make_table(spark, tmp_path / "t", storage=storage)
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


def test_crashed_commit_rolls_forward(spark, tmp_path, storage):
    """Crash between the version-object claim and the main-pointer put: the
    next reader promotes the claimed manifest (data files are complete
    before the claim), so the committed merge is never lost."""
    t = make_table(spark, tmp_path / "t", storage=storage)
    t.merge_apply(_prep(_mk_events(spark, [("r1", "a", 1, "I", "v1")])))
    old_pointer = storage.get(t._manifest_path)
    t.merge_apply(_prep(_mk_events(spark, [("r1", "a", 2, "U", "v2")])))
    h_after = t.snapshot_hash()
    # simulate the crash: rewind the main pointer, leave the v2 token
    storage.put(t._manifest_path, old_pointer)
    t2 = TargetTable(spark, t.root, storage=storage)
    m = t2._load()
    assert m["version"] == 2  # rolled forward
    assert t2.snapshot_hash() == h_after
    assert json.loads(storage.get(t2._manifest_path))["version"] == 2  # repaired


def test_wedged_version_token_is_reclaimed(spark, tmp_path):
    """r2 advisory (medium): a dead pre-seam writer's partial token (non-
    empty, invalid JSON) must not wedge the version number forever. The
    POSIX adapter reclaims empty/unparseable tokens older than the grace
    period, so the retrying merge eventually claims the version. (Adapter-
    written tokens are all-or-nothing hardlink publishes, so only legacy/
    corrupt tokens can ever qualify.)"""
    import os
    import time

    storage = PosixStorage()
    t = make_table(spark, tmp_path / "t", storage=storage)
    t.merge_apply(_prep(_mk_events(spark, [("r1", "a", 1, "I", "v1")])))
    # a dead writer's torn token for v2: non-empty, invalid JSON, old
    vpath = t._version_path(2)
    os.makedirs(os.path.dirname(vpath), exist_ok=True)
    with open(vpath, "w") as f:
        f.write('{"version": 2, "buckets": {"0": {"pa')  # torn mid-write
    old = time.time() - 60
    os.utime(vpath, (old, old))
    # _load must NOT roll forward onto the garbage token
    assert t._load()["version"] == 1
    # the public retrying path reclaims the token and lands v2
    t.merge_apply(_prep(_mk_events(spark, [("r1", "b", 2, "I", "v2")])))
    assert t._load()["version"] == 2
    assert t.read().count() == 2


def test_fresh_wedged_token_is_left_alone(spark, tmp_path):
    """Within the grace period the same torn token must NOT be reclaimed
    (it could be a live pre-seam writer mid-write): the merge exhausts its
    retries with CommitConflict instead of clobbering it."""
    import os

    storage = PosixStorage()
    t = make_table(spark, tmp_path / "t", storage=storage)
    t.merge_apply(_prep(_mk_events(spark, [("r1", "a", 1, "I", "v1")])))
    vpath = t._version_path(2)
    os.makedirs(os.path.dirname(vpath), exist_ok=True)
    with open(vpath, "w") as f:
        f.write('{"version": 2, "buckets": {"0": {"pa')  # torn, mtime = now
    with pytest.raises(CommitConflict):
        t.merge_apply(
            _prep(_mk_events(spark, [("r1", "b", 2, "I", "v2")])),
            max_commit_retries=1,
        )


def test_rewrite_partition_spec_grows_buckets(spark, tmp_path, storage):
    """Grow B=8 -> B=64: visible state (snapshot_hash) unchanged, manifest
    reflects the new spec, and subsequent merges use the new layout (merge
    window parallelism now tracks 64 buckets)."""
    t = make_table(spark, tmp_path / "t", num_buckets=8, storage=storage)
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
    ref = make_table(spark, tmp_path / "ref", num_buckets=64, storage=storage)
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
        with pytest.raises(CommitConflict):
            t.merge_apply(
                _prep(_mk_events(spark, [("r1", "b", 2, "I", "v2")])),
                max_commit_retries=2,
            )
    finally:
        TargetTable._commit_manifest = orig


def test_checkpoint_lineage_writes_through_object_api(spark, tmp_path):
    """A full replay (merges + checkpoint + lineage + compaction) must work
    when EVERY driver-side write goes through the conditional-PUT adapter —
    and the result must byte-match the POSIX-adapter run."""
    from data_ingestor_py_spark.plans.checkpoint import Checkpoint, Lineage
    from data_ingestor_py_spark.plans.replay import replay, split_batches

    ev = change_events(spark, 1200, n_repos=12, paths_per_repo=8, seed=31)
    results = {}
    for name, st in (("posix", PosixStorage()), ("condput", ConditionalPutStorage())):
        t = make_table(spark, tmp_path / name, storage=st)
        replay(t, split_batches(ev, 3), prepare=lambda df, i: _prep(df))
        cp = Checkpoint(spark, t.root, storage=st)
        lin = Lineage(spark, t.root, storage=st)
        assert cp.committed_batches() == {0, 1, 2}
        assert cp.compact() == 3  # three per-batch files folded into one
        assert cp.committed_batches() == {0, 1, 2}  # readable post-compaction
        assert lin.read().count() > 0
        results[name] = (t.snapshot_hash(), t.metrics_summary()["records_read"])
    assert results["posix"] == results["condput"]

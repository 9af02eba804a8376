"""Round-3 scale-maintenance behaviors:

- diff_versions prunes to buckets whose manifest entries differ (immutable
  COW files: identical path => identical content), falling back to a full
  scan across a partition-spec rewrite;
- merge commits maintain per-bucket tombstone upper bounds; purge pass 1
  scans only buckets with a nonzero/unknown bound and tightens bounds to
  exact counts;
- salt_buckets="auto" derives salting from the discovery stats: skewed
  batches get spread, uniform batches pay nothing, hashes never change.
"""

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.sources.generator import change_events
from tests.conftest import make_table
from tests.test_merge import _mk_events, _prep


def _capture_state_df(monkeypatch):
    """Record the bucket_ids every _state_df call requests."""
    calls = []
    real = TargetTable._state_df

    def spy(self, m, bucket_ids=None):
        calls.append(bucket_ids)
        return real(self, m, bucket_ids)

    monkeypatch.setattr(TargetTable, "_state_df", spy)
    return calls


# ------------------------------------------------------ diff_versions pruning


def test_diff_versions_reads_only_changed_buckets(spark, tmp_path, monkeypatch):
    t = make_table(spark, tmp_path / "t", num_buckets=16)
    ev = change_events(spark, 2000, n_repos=20, paths_per_repo=10, seed=5)
    t.merge_apply(_prep(ev))  # v1: many buckets
    st2 = t.merge_apply(
        _prep(_mk_events(spark, [("repo-0001", "one/key.txt", 99999, "U", "vX")]))
    )  # v2: exactly one bucket
    assert st2.touched_buckets == 1
    changed_bucket = st2.bucket_rows[0][0]

    calls = _capture_state_df(monkeypatch)
    out = t.diff_versions(1, 2).collect()
    assert calls == [[changed_bucket], [changed_bucket]]  # old side + new side
    assert len(out) == 1
    assert out[0]["_change_type"] in ("I", "U")
    assert (out[0]["repo"], out[0]["path"]) == ("repo-0001", "one/key.txt")


def test_diff_versions_prune_matches_full_scan(spark, tmp_path):
    """The pruned diff must equal the brute diff of the two visible states."""
    t = make_table(spark, tmp_path / "t", num_buckets=8)
    ev = change_events(spark, 3000, n_repos=15, paths_per_repo=10, seed=7,
                       delete_rate=0.15)
    t.merge_apply(_prep(ev.where("event_id < 2000")))
    t.merge_apply(_prep(ev.where("event_id >= 2000")))

    diff = t.diff_versions(1, 2)
    old = t.read_version(1).select("repo", "path", "_seq")
    new = t.read_version(2).select("repo", "path", "_seq")
    j = old.alias("o").join(
        new.alias("n"),
        (F.col("o.repo") == F.col("n.repo")) & (F.col("o.path") == F.col("n.path")),
        "full_outer",
    )
    expected = j.where(
        F.col("o._seq").isNull() | F.col("n._seq").isNull()
        | (F.col("o._seq") != F.col("n._seq"))
    ).count()
    assert diff.count() == expected > 0


def test_diff_versions_full_scan_after_spec_rewrite(spark, tmp_path, monkeypatch):
    """Bucket ids are not comparable across a partition-spec rewrite: the
    diff must fall back to the full scan (bucket_ids=None) and, since a
    rewrite does not change visible state, report zero changes."""
    t = make_table(spark, tmp_path / "t", num_buckets=4)
    ev = change_events(spark, 800, n_repos=8, paths_per_repo=6, seed=3)
    t.merge_apply(_prep(ev))  # v1
    t.rewrite_partition_spec(16)  # v2
    calls = _capture_state_df(monkeypatch)
    assert t.diff_versions(1, 2).count() == 0
    assert calls == [None, None]


# --------------------------------------------------- tombstone bounds + purge


def test_merge_maintains_tombstone_upper_bounds(spark, tmp_path):
    t = make_table(spark, tmp_path / "t", num_buckets=8)
    ev = change_events(spark, 2000, n_repos=10, paths_per_repo=10, seed=11,
                       delete_rate=0.2)
    t.merge_apply(_prep(ev))
    m = t._load()
    deletes = _prep(ev).where("_op = 'D'")
    from data_ingestor_py_spark.plans.target import _bucket_expr

    per_bucket_d = {
        r["bkt"]: r["n"]
        for r in deletes.groupBy(_bucket_expr(["repo", "path"], 8).alias("bkt"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for b, info in m["buckets"].items():
        assert info["ts_ub"] == per_bucket_d.get(int(b), 0)


def test_purge_pass1_scans_only_tombstone_bearing_buckets(spark, tmp_path, monkeypatch):
    t = make_table(spark, tmp_path / "t", num_buckets=16)
    # deletes concentrated on two keys -> at most two tombstone buckets
    rows = [(f"r{i}", f"p{i}", i + 1, "I", f"v{i}") for i in range(40)]
    rows += [("r1", "p1", 100, "D", None), ("r2", "p2", 101, "D", None)]
    t.merge_apply(_prep(_mk_events(spark, rows)))
    m = t._load()
    ts_buckets = {int(b) for b, info in m["buckets"].items() if info["ts_ub"] > 0}
    assert 1 <= len(ts_buckets) <= 2
    assert len(m["buckets"]) > len(ts_buckets)  # there IS something to prune

    calls = _capture_state_df(monkeypatch)
    n = t.purge_tombstones(older_than_seq=1000)
    assert n == 2
    # pass 1 (candidates) and pass 2 (rewrite) both restricted to the
    # tombstone-bearing buckets — never the full bucket list
    assert calls[0] == sorted(ts_buckets)
    assert set(calls[1]) <= ts_buckets
    # bounds now exact zero -> a second purge scans nothing at all
    calls.clear()
    assert t.purge_tombstones(older_than_seq=1000) == 0
    assert calls == []


def test_purge_keeps_young_tombstones_with_exact_bound(spark, tmp_path):
    t = make_table(spark, tmp_path / "t", num_buckets=4)
    rows = [("r1", "p1", 1, "I", "a"), ("r1", "p1", 10, "D", None),
            ("r2", "p2", 2, "I", "b"), ("r2", "p2", 500, "D", None)]
    t.merge_apply(_prep(_mk_events(spark, rows)))
    assert t.purge_tombstones(older_than_seq=100) == 1  # only the _seq=10 one
    m = t._load()
    remaining = sum(info.get("ts_ub", 0) for info in m["buckets"].values())
    assert remaining == 1  # the _seq=500 tombstone, exactly counted
    assert t.read_raw().where("_op = 'D'").count() == 1


# -------------------------------------------------------------- auto-salting


def test_auto_salt_triggers_on_skew_and_preserves_hash(spark, tmp_path):
    from tests.test_skew import _prep as skew_prep
    from tests.test_skew import _skewed

    ev = skew_prep(_skewed(spark, 8000))
    plain = make_table(spark, tmp_path / "plain")
    auto = make_table(spark, tmp_path / "auto")
    st_plain = plain.merge_apply(ev)
    st_auto = auto.merge_apply(ev, salt_buckets="auto", auto_salt_min_rows=1000)
    assert st_plain.salt_used == 0
    assert st_auto.salt_used >= 16  # skew ratio is huge -> capped spread
    assert plain.snapshot_hash() == auto.snapshot_hash()


def test_auto_salt_stays_off_for_uniform_batches(spark, tmp_path):
    ev = _prep(change_events(spark, 5000, n_repos=40, paths_per_repo=20, seed=19))
    t = make_table(spark, tmp_path / "t")
    st = t.merge_apply(ev, salt_buckets="auto", auto_salt_min_rows=10)
    assert st.salt_used == 0


def test_auto_salt_fires_on_flood_beside_bigger_uniform_bucket(spark, tmp_path):
    """The skew signal must be evaluated per bucket: a single-key flood
    (bucket 29, repo-hot) must trigger salting even when a BIGGER but
    perfectly uniform bucket (bucket 42, repo-uniform) holds the most
    events — a max-events-bucket-only check would read density ~1 there
    and skip."""
    uniform = [("repo-uniform", f"p{i}", i + 1, "I", f"v{i}") for i in range(6000)]
    flood = [("repo-hot", "one/path", 10000 + i, "U", f"f{i}") for i in range(3000)]
    ev = _prep(_mk_events(spark, uniform + flood))
    t = make_table(spark, tmp_path / "t", num_buckets=64, bucket_cols=["repo"])
    st = t.merge_apply(ev, salt_buckets="auto", auto_salt_min_rows=1000)
    assert st.salt_used >= 16
    assert t.read().count() == 6001  # 6000 uniform keys + the 1 hot key


def test_auto_salt_light_mode_repo_local_uniform_stays_off(spark, tmp_path):
    """Light stats + coarse repo bucketing: a repo-local batch of all
    DISTINCT keys concentrates in one bucket but has no key skew — the HLL
    density estimate must keep salting off (a hot-bucket-vs-uniform-share
    proxy would read ratio=B and add a pointless pre-reduce shuffle)."""
    rows = [("one-repo", f"p{i}", i + 1, "I", f"v{i}") for i in range(3000)]
    ev = _prep(_mk_events(spark, rows))
    t = make_table(spark, tmp_path / "t", num_buckets=64, bucket_cols=["repo"])
    st = t.merge_apply(ev, salt_buckets="auto", auto_salt_min_rows=1000,
                       stats="light")
    assert st.touched_buckets == 1
    assert st.salt_used == 0

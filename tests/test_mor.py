"""Merge-on-read (MoR) mode: delta-layer merges, read-path resolution,
auto/manual compaction, GC safety, and byte-identical equality with the
copy-on-write merge (plans/target.py merge_mode='mor').

The reference engine always writes through (INSERT/UPDATE per record,
db/postgres_query_builder.py:16-45); COW vs MoR is the lake-side
generalization of that tradeoff at 10^10-event scale — the final-state
contract (per-key max-_seq winner, content sha256 invariant) is identical
in both modes, which every test here pins via snapshot_hash equality.
"""

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.replay import replay, split_batches
from data_ingestor_py_spark.sources.generator import change_events
from tests.conftest import make_table


def _prep(df):
    return df.withColumn("_content_sha256", F.sha2(F.col("content"), 256)).select(
        "repo", "path", "commit", "lang", "content", "_content_sha256",
        "_seq", "_op", "_ts",
    )


def _mk_events(spark, rows):
    """rows: (repo, path, seq, op, content)"""
    df = spark.createDataFrame(
        [(r, p, f"c{s}", "py", c, s, o) for (r, p, s, o, c) in rows],
        "repo string, path string, commit string, lang string, content string, "
        "_seq long, _op string",
    )
    return df.withColumn("_ts", F.timestamp_seconds(F.col("_seq")))


def _pair(spark, tmp_path, **mor_kw):
    cow = make_table(spark, tmp_path / "cow")
    mor = make_table(spark, tmp_path / "mor", merge_mode="mor", **mor_kw)
    return cow, mor


def test_mor_equals_cow_full_replay(spark, tmp_path):
    """Same event stream through both modes -> identical state hash and
    identical visible rows (inserts, updates, deletes, late events — the
    generator produces all four)."""
    cow, mor = _pair(spark, tmp_path, mor_max_deltas=0)  # no auto-compaction
    ev = change_events(spark, 4000, n_repos=30, paths_per_repo=20, seed=13)
    batches = split_batches(ev, 5)
    replay(cow, batches, prepare=lambda d, i: _prep(d))
    replay(mor, batches, prepare=lambda d, i: _prep(d))
    assert mor.snapshot_hash() == cow.snapshot_hash()
    a = sorted(map(tuple, cow.read().collect()))
    b = sorted(map(tuple, mor.read().select(*cow.read().columns).collect()))
    assert a == b
    # and the deltas really accumulated (no silent compaction)
    m = mor._load()
    assert any(e.get("deltas") for e in m["buckets"].values())


def test_mor_tombstone_blocks_late_upsert_across_layers(spark, tmp_path):
    """The late-event guard must hold when the tombstone and the zombie
    upsert live in DIFFERENT delta layers, both before and after
    compaction."""
    t = make_table(spark, tmp_path / "t", merge_mode="mor", mor_max_deltas=0)
    t.merge_apply(_prep(_mk_events(spark, [("r1", "a", 10, "D", None)])))
    t.merge_apply(_prep(_mk_events(spark, [("r1", "a", 3, "U", "zombie")])))
    assert t.read().count() == 0
    t.merge_apply(_prep(_mk_events(spark, [("r1", "a", 11, "I", "alive")])))
    assert t.read().collect()[0]["content"] == "alive"
    h = t.snapshot_hash()
    t.compact_bucket_deltas()
    assert t.snapshot_hash() == h
    assert t.read().collect()[0]["content"] == "alive"


def test_mor_redelivery_idempotent(spark, tmp_path):
    t = make_table(spark, tmp_path / "t", merge_mode="mor", mor_max_deltas=0)
    ev = change_events(spark, 800, n_repos=20, paths_per_repo=10, seed=3)
    batch = _prep(ev)
    t.merge_apply(batch)
    h1 = t.snapshot_hash()
    t.merge_apply(batch)  # re-delivered layer resolves to the same winners
    assert t.snapshot_hash() == h1


def test_mor_auto_compaction_bounds_layers(spark, tmp_path):
    """With mor_max_deltas=2, no bucket may end a merge_apply with more
    than 2 delta layers; state is invariant across the compactions."""
    cow, mor = _pair(spark, tmp_path, mor_max_deltas=2)
    ev = change_events(spark, 3000, n_repos=20, paths_per_repo=15, seed=5)
    batches = split_batches(ev, 6)
    replay(cow, batches, prepare=lambda d, i: _prep(d))
    replay(mor, batches, prepare=lambda d, i: _prep(d))
    m = mor._load()
    assert all(len(e.get("deltas", [])) < 2 + 1 for e in m["buckets"].values())
    assert any(h["op"] == "compact_deltas" for h in m["history"])
    assert mor.snapshot_hash() == cow.snapshot_hash()


def test_mor_schema_evolution_across_layers(spark, tmp_path):
    """Delta layers written under different schema versions align on read
    (field-id add), matching the COW table fed the same evolving stream."""
    cow, mor = _pair(spark, tmp_path, mor_max_deltas=0)
    b1 = _mk_events(spark, [("r1", "a", 1, "I", "v1"), ("r2", "b", 2, "I", "v1")])
    for t in (cow, mor):
        t.merge_apply(_prep(b1))
        t.evolve(add=[("stars", "int")])
    b2 = (
        _mk_events(spark, [("r1", "a", 3, "U", "v2"), ("r3", "c", 4, "I", "v1")])
        .withColumn("stars", F.lit(7))
    )
    prep2 = lambda df: df.withColumn(  # noqa: E731
        "_content_sha256", F.sha2(F.col("content"), 256)
    ).select(
        "repo", "path", "commit", "lang", "content", "_content_sha256",
        "stars", "_seq", "_op", "_ts",
    )
    for t in (cow, mor):
        t.merge_apply(prep2(b2))
    assert mor.snapshot_hash() == cow.snapshot_hash()
    got = {
        (r["repo"], r["path"]): r["stars"] for r in mor.read().collect()
    }
    assert got == {("r1", "a"): 7, ("r2", "b"): None, ("r3", "c"): 7}
    # compaction rewrites the LAYERED buckets at the CURRENT schema
    # (untouched single-layer buckets legitimately keep their old version)
    layered = {b for b, e in mor._load()["buckets"].items() if e.get("deltas")}
    mor.compact_bucket_deltas()
    m = mor._load()
    assert layered and all(
        m["buckets"][b]["schema"] == m["current_schema"]
        and not m["buckets"][b].get("deltas")
        for b in layered
        if b in m["buckets"]
    )
    assert mor.snapshot_hash() == cow.snapshot_hash()


def test_mor_diff_versions_matches_cow(spark, tmp_path):
    """Changelog reads across delta commits equal the COW changelog for the
    same batches — including the pruning predicate, which must treat a
    bucket as changed when only its delta LIST changed."""
    cow, mor = _pair(spark, tmp_path, mor_max_deltas=0)
    ev = change_events(spark, 2000, n_repos=15, paths_per_repo=10, seed=11)
    batches = split_batches(ev, 4)
    replay(cow, batches, prepare=lambda d, i: _prep(d))
    replay(mor, batches, prepare=lambda d, i: _prep(d))
    cols = None
    for v0, v1 in [(1, 2), (2, 4), (0, 4)]:
        dc = cow.diff_versions(v0, v1)
        dm = mor.diff_versions(v0, v1)
        cols = cols or sorted(dc.columns)
        a = sorted(map(tuple, dc.select(*cols).collect()))
        b = sorted(map(tuple, dm.select(*cols).collect()))
        assert a == b, (v0, v1)


def test_mor_expire_keeps_referenced_layers(spark, tmp_path):
    """expire_snapshots must never collect a delta layer the current
    manifest still reads; after compaction the layers become collectable
    and are actually removed."""
    t = make_table(spark, tmp_path / "t", merge_mode="mor", mor_max_deltas=0)
    ev = change_events(spark, 1500, n_repos=10, paths_per_repo=10, seed=9)
    batches = split_batches(ev, 3)
    replay(t, batches, prepare=lambda d, i: _prep(d))
    h = t.snapshot_hash()
    t.expire_snapshots(keep_last=1)
    assert t.snapshot_hash() == h  # layers survived (all referenced)
    n_dirs_before = len([d for d in t.io.list_dirs(t.root) if d.startswith("snap-")])
    t.compact_bucket_deltas()
    t.expire_snapshots(keep_last=1)
    n_dirs_after = len([d for d in t.io.list_dirs(t.root) if d.startswith("snap-")])
    assert t.snapshot_hash() == h
    assert n_dirs_after < n_dirs_before  # old layers actually collected
    m = t._load()
    assert not any(e.get("deltas") for e in m["buckets"].values())


def test_mor_purge_tombstones_resolves_and_clears_deltas(spark, tmp_path):
    t = make_table(spark, tmp_path / "t", merge_mode="mor", mor_max_deltas=0)
    t.merge_apply(_prep(_mk_events(spark, [
        ("r1", "a", 1, "I", "v1"), ("r1", "b", 2, "I", "v1"),
    ])))
    t.merge_apply(_prep(_mk_events(spark, [("r1", "a", 3, "D", None)])))
    assert t.read().count() == 1
    purged = t.purge_tombstones(older_than_seq=10)
    assert purged == 1
    assert t.read().count() == 1
    m = t._load()
    # the rewritten (tombstone-bearing) bucket lost its delta layers
    assert not any(
        e.get("deltas") for b, e in m["buckets"].items()
    ) or t.read().count() == 1


def test_mor_lookup_resolves_layers(spark, tmp_path):
    t = make_table(spark, tmp_path / "t", merge_mode="mor", mor_max_deltas=0)
    t.merge_apply(_prep(_mk_events(spark, [("r1", "a", 1, "I", "old")])))
    t.merge_apply(_prep(_mk_events(spark, [("r1", "a", 5, "U", "new")])))
    rows = t.lookup([{"repo": "r1", "path": "a"}]).collect()
    assert len(rows) == 1 and rows[0]["content"] == "new"


def test_mor_merge_single_exchange(spark, tmp_path):
    """The delta merge must stay one shuffle: the batch reduce groups on
    (key, bucket) and the partitionBy(bkt) write rides that partitioning —
    no state read, no second Exchange."""
    t = make_table(spark, tmp_path / "t", merge_mode="mor", mor_max_deltas=0)
    ev = _prep(change_events(spark, 500, n_repos=10, paths_per_repo=5, seed=1))
    m = t._load()
    from data_ingestor_py_spark.plans.target import _bucket_expr
    from data_ingestor_py_spark.operators.dedup import latest_by_key

    cols = t.current_columns(m)
    with_bkt = ev.withColumn("bkt", _bucket_expr(m["bucket_cols"], m["num_buckets"]))
    reduced = latest_by_key(
        with_bkt.select(*cols, "bkt"), m["key_cols"] + ["bkt"], m["seq_col"]
    ).select(*cols, "bkt")
    plan = reduced._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_mor_mode_validation(spark, tmp_path):
    with pytest.raises(ValueError, match="merge_mode"):
        make_table(spark, tmp_path / "t", merge_mode="bogus")

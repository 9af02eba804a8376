"""Round-6 metadata-plane sharding: the root manifest must stay
O(buckets + bounded history tail) — NOT O(live files) and NOT O(commits).

Per-file statistics live in per-snapshot-dir ``_stats.json`` shards
(written once, GC'd with their dir), bloom word data is cluster-written
parquet shards under ``_bloom/<col>/data/top=<dir>/`` with per-dir meta
JSONs, and manifest history beyond HISTORY_TAIL rolls into immutable
``_history/`` segments at commit time. These tests pin the scaling claims
byte-for-byte and the correctness invariants (full history readable,
pruning still sound, ADVICE-medium empty-name-map dirs still read).
"""

import json
import os

from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.target import HISTORY_TAIL, TargetTable


def _batch(spark, n, seq0, salt=""):
    return spark.range(n).select(
        F.col("id").cast("string").alias("id"),
        F.sha2(F.concat(F.col("id").cast("string"), F.lit(salt)), 256).alias("commit"),
        (F.col("id") * 7).alias("val"),
        (F.col("id") + seq0).alias("_seq"),
        F.lit("U").alias("_op"),
        F.lit(None).cast("timestamp").alias("_ts"),
    )


def _mk(spark, tmp_path, name="t", **kw):
    defaults = dict(
        key_cols=["id"],
        columns=[("commit", "string"), ("val", "long")],
        num_buckets=4,
        stats_cols=["val"],
    )
    defaults.update(kw)
    return TargetTable.create(spark, str(tmp_path / name), **defaults)


def test_manifest_bytes_flat_while_commits_and_files_grow(spark, tmp_path):
    t = _mk(spark, tmp_path)
    sizes = []
    n = 2 * HISTORY_TAIL + 12  # run well past the first overflow roll
    for i in range(n):
        t.merge_apply(_batch(spark, 60, i * 1000), stats="light")
        sizes.append(os.path.getsize(t._manifest_path))
    m = t._load()
    assert "stats" not in m  # no per-file statistics in the root manifest
    # the tail oscillates in [TAIL, 2*TAIL): overflow rolls in TAIL-sized
    # batches (one segment PUT per TAIL commits), never one entry per
    # commit (r6 self-review finding)
    assert len(m["history"]) < 2 * HISTORY_TAIL
    assert m["history"][-1]["snapshot"] == m["version"]  # MV progress reads
    # bounded, not monotone: after the first roll the manifest never
    # exceeds its pre-roll peak (the old design grew it by one history
    # entry + refreshed stats per commit, forever)
    assert max(sizes[2 * HISTORY_TAIL:]) <= max(sizes[: 2 * HISTORY_TAIL])
    # segment count amortizes: ~1 per HISTORY_TAIL commits, not per commit
    segs = t.io.list(os.path.join(t.root, "_history"))
    assert 1 <= len(segs) <= 1 + n // HISTORY_TAIL
    # now explode the live FILE count ~10x via a clustering rewrite with
    # tiny files: per-file stats volume grows 10x, the manifest must not
    before = os.path.getsize(t._manifest_path)
    t.rewrite_data_files(sort_by=["val"], max_rows_per_file=3)
    plan = t.scan_plan([("val", ">=", 0)])
    # the file explosion really happened: ~5x one-file-per-bucket
    assert plan["files_total"] >= 4 * plan["buckets_total"]
    assert os.path.getsize(t._manifest_path) <= before * 1.05
    # pruning still works off the sharded stats, value-exact
    got = sorted(r["id"] for r in t.read_where([("val", ">=", 300)]).collect())
    want = sorted(
        r["id"] for r in t.read().where(F.col("val") >= 300).collect()
    )
    assert got == want and len(got) > 0
    assert t.scan_plan([("val", ">", 10**9)])["files_read"] == 0


def test_read_history_complete_across_segments(spark, tmp_path):
    t = _mk(spark, tmp_path, name="h", stats_cols=None)
    n = 2 * HISTORY_TAIL + 12  # past the (batched) first overflow roll
    for i in range(n):
        t.merge_apply(_batch(spark, 20, i * 1000), stats="light")
    m = t._load()
    assert len(m["history"]) < 2 * HISTORY_TAIL
    segs = t.io.list(os.path.join(t.root, "_history"))
    assert segs  # overflow really rolled out
    hist = t.read_history()
    merges = [h for h in hist if h["op"] == "merge"]
    assert [h["snapshot"] for h in merges] == list(range(1, n + 1))
    # entries are unique (a lost-CAS re-roll would duplicate; read dedupes)
    keys = [json.dumps(h, sort_keys=True) for h in hist]
    assert len(keys) == len(set(keys))


def test_stats_shards_live_inside_snap_dirs_and_expire_with_them(spark, tmp_path):
    t = _mk(spark, tmp_path, name="gc")
    for i in range(6):
        t.merge_apply(_batch(spark, 40, i * 1000), stats="light")
    shards = [
        d for d in t.io.list_dirs(t.root)
        if d.startswith("snap-") and t.io.exists(os.path.join(t.root, d, "_stats.json"))
    ]
    assert len(shards) == 6  # one shard per written snapshot dir
    t.rewrite_data_files(stale_after=0)
    t.expire_snapshots(keep_last=0)
    left = [d for d in t.io.list_dirs(t.root) if d.startswith("snap-")]
    assert len(left) == 1  # old dirs (and their shards) reclaimed together
    assert t.io.exists(os.path.join(t.root, left[0], "_stats.json"))
    # pruning over the surviving shard is still exact
    got = sorted(r["id"] for r in t.read_where([("val", "=", 77)]).collect())
    assert got == ["11"]


def test_bloom_incremental_build_adds_shards_never_rewrites(spark, tmp_path):
    t = _mk(spark, tmp_path, name="b", stats_cols=None)
    t.merge_apply(_batch(spark, 100, 0), stats="light")
    t.build_bloom("commit")
    base = t._bloom_base(t._bloom_key(t._load(), "commit"))
    meta_dir = os.path.join(base, "meta")
    first = {p: os.path.getmtime(p) for p in t.io.list(meta_dir)}
    assert first  # per-dir shards exist
    data_tops = t.io.list_dirs(os.path.join(base, "data"))
    assert data_tops and all(d.startswith("top=") for d in data_tops)
    # a one-key batch: only its bucket's dir is rewritten, the other
    # buckets keep their snap-000001 leaves (and their shard) live
    t.merge_apply(
        _batch(spark, 8, 5000, salt="x").where(F.col("id") == "7"),
        stats="light",
    )
    r = t.build_bloom("commit")
    assert r["dirs_built"] > 0
    second = {p: os.path.getmtime(p) for p in t.io.list(meta_dir)}
    assert set(first) < set(second)  # new shards appeared...
    for p, mt in first.items():
        assert second[p] == mt  # ...existing shards untouched
    # and probes stay exact through the incremental coverage
    c = spark.range(1).select(F.sha2(F.lit("7x"), 256).alias("c")).first()["c"]
    rows = t.read_where([("commit", "=", c)]).collect()
    assert len(rows) == 1 and rows[0]["id"] == "7"
    assert t.scan_plan([("commit", "=", "ghost")])["files_read"] == 0


def test_bloom_gc_drops_shards_of_expired_dirs(spark, tmp_path):
    t = _mk(spark, tmp_path, name="bgc", stats_cols=None)
    t.merge_apply(_batch(spark, 50, 0), stats="light")
    for i, key in enumerate(("3", "5")):  # single-bucket touches: the base
        t.merge_apply(                    # dir stays live for other buckets
            _batch(spark, 50, (i + 1) * 1000, salt="x").where(F.col("id") == key),
            stats="light",
        )
    t.build_bloom("commit")
    base = t._bloom_base(t._bloom_key(t._load(), "commit"))
    assert len(t.io.list(os.path.join(base, "meta"))) >= 2
    t.rewrite_data_files(stale_after=0)
    t.expire_snapshots(keep_last=0)
    t.build_bloom("commit")  # covers the new dir, GCs the dead shards
    metas = t.io.list(os.path.join(base, "meta"))
    live = {e["path"].split("/")[0] for e in t._load()["buckets"].values()}
    assert {os.path.basename(p)[:-5] for p in metas} == live
    tops = t.io.list_dirs(os.path.join(base, "data"))
    assert {d[4:] for d in tops} <= live
    assert t.scan_plan([("commit", "=", "ghost")])["files_read"] == 0


def test_empty_stats_name_map_dir_is_read_not_pruned(spark, tmp_path):
    """ADVICE r5 medium: a dir whose written schema yields an EMPTY stats
    name map (stats tracks only a column added later by evolve) must stay
    readable — the old code stored [] and scan_plan silently excluded the
    bucket from read_where/delete_where."""
    t = TargetTable.create(
        spark, str(tmp_path / "adv"),
        key_cols=["id"], columns=[("lang", "string")], num_buckets=2,
    )
    batch = spark.range(40).select(
        F.col("id").cast("string").alias("id"),
        F.when(F.col("id") % 2 == 0, "py").otherwise("go").alias("lang"),
        F.col("id").alias("_seq"),
        F.lit("U").alias("_op"),
        F.lit(None).cast("timestamp").alias("_ts"),
    )
    t.merge_apply(batch, stats="light")  # dirs written under schema 1
    t.evolve(add=[("score", "long")])
    t.set_stats_cols(["score"])  # tracks ONLY the new column (f2)
    assert t.analyze() is not None  # backfills shards with an empty map
    # rows must still be visible through the pruned read path
    got = sorted(r["id"] for r in t.read_where([("lang", "=", "py")]).collect())
    want = sorted(
        r["id"] for r in t.read().where(F.col("lang") == "py").collect()
    )
    assert got == want and len(got) == 20
    # and retention/GDPR deletes must not skip them
    st = t.delete_where([("lang", "=", "py")])
    assert st.rows_in == 20
    assert t.read().count() == 20
    assert t.read().where(F.col("lang") == "py").count() == 0


def test_analyze_reharvests_when_stats_keys_grow(spark, tmp_path):
    t = _mk(spark, tmp_path, name="grow", stats_cols=["val"])
    t.merge_apply(_batch(spark, 50, 0), stats="light")
    assert t.analyze() is None  # current keys fully covered
    t.set_stats_cols(["val", "_seq"])
    assert t.analyze() is not None  # shard re-harvested for the new key
    assert t.analyze() is None
    assert t.scan_plan([("_seq", ">", 10**9)])["files_read"] == 0
    got = t.read_where([("_seq", "<", 10)]).count()
    assert got == t.read().where(F.col("_seq") < 10).count() > 0


def test_distributed_harvest_equals_driver_harvest(spark, tmp_path):
    """Above the file threshold the footer harvest rides a Spark job
    (filestats.harvest_dirs_distributed); the shard it writes must be
    IDENTICAL to the driver harvest's — switching paths can never change
    pruning — and pruned reads stay exact."""
    import json as _json

    from data_ingestor_py_spark.plans import filestats

    # force many files per commit so the distributed path engages
    t = _mk(spark, tmp_path, name="dist")
    t.DISTRIBUTED_HARVEST_MIN_FILES = 1
    calls = {"n": 0}
    orig = filestats.harvest_dirs_distributed

    def counting(spark_, dirs, nmap):
        calls["n"] += 1
        return orig(spark_, dirs, nmap)

    filestats.harvest_dirs_distributed = counting
    try:
        t.merge_apply(_batch(spark, 200, 0), stats="light")
    finally:
        filestats.harvest_dirs_distributed = orig
    assert calls["n"] == 1, "distributed harvest did not engage"

    m = t._load()
    # recompute every live shard with the DRIVER path and compare
    import os as _os

    shards = [
        d for d in t.io.list_dirs(t.root)
        if d.startswith("snap-")
        and t.io.exists(_os.path.join(t.root, d, "_stats.json"))
    ]
    assert shards
    for rel in shards:
        shard = _json.loads(t.io.get(_os.path.join(t.root, rel, "_stats.json")))
        nmap = t._stats_name_map(m, shard["schema"])
        for d, entries in shard["dirs"].items():
            drv = filestats.harvest_dir(_os.path.join(t.root, rel, d), nmap)
            assert entries == drv, f"shard mismatch in {rel}/{d}"
    # pruned read correctness through the distributed-harvested shard
    got = sorted(r["id"] for r in t.read_where([("val", "=", 91)]).collect())
    assert got == ["13"]


def test_legacy_inline_stats_blob_is_stripped_on_next_commit(spark, tmp_path):
    """Pre-r6 manifests carried per-file stats inline under m['stats'];
    the r6 plane never reads it. The first commit on an upgraded table
    must strip the dead blob instead of re-serializing it forever."""
    import json as _json

    t = _mk(spark, tmp_path, name="legacy")
    t.merge_apply(_batch(spark, 30, 0), stats="light")
    # simulate the pre-r6 layout: inject the inline blob into the live
    # manifest object (pointer only; the version token stays clean)
    raw = _json.loads(t.io.get(t._manifest_path))
    raw["stats"] = {"snap-000001-dead": [{"f": "x.parquet", "rows": 1, "st": {}}]}
    t.io.put(t._manifest_path, _json.dumps(raw).encode())
    assert "stats" in t._load()
    t.merge_apply(_batch(spark, 30, 1000), stats="light")
    assert "stats" not in t._load()
    assert "stats" not in _json.loads(t.io.get(t._manifest_path))

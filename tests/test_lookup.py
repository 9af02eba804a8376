"""TargetTable.lookup: bucket-pruned point reads."""
import pytest
from pyspark.sql import functions as F
from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.sources import change_events
from data_ingestor_py_spark.plans.replay import replay, split_batches
import os, tempfile

def _mkroot():
    d = tempfile.mkdtemp(prefix="lookup-")
    os.rmdir(d)
    return d

def test_lookup_prunes_buckets_and_matches_filter(spark):
    t = TargetTable.create(
        spark, _mkroot(), key_cols=["repo", "path"],
        columns=[("lang", "string"), ("content", "string")], num_buckets=16,
    )
    ev = change_events(spark, 8000, n_repos=30, paths_per_repo=20, seed=5)
    prep = lambda df, i: df.select("repo", "path", "lang", "content", "_seq", "_op", "_ts")
    replay(t, split_batches(ev, 2), prepare=prep)

    probes = [{"repo": "repo-3", "path": "f3.py"}, {"repo": "repo-7", "path": "f11.py"}]
    got = t.lookup(probes)
    # correctness: equals the naive full-scan filter
    want = t.read().where(
        ((F.col("repo") == "repo-3") & (F.col("path") == "f3.py"))
        | ((F.col("repo") == "repo-7") & (F.col("path") == "f11.py"))
    )
    assert sorted(map(tuple, got.select("repo","path","lang").collect())) == \
           sorted(map(tuple, want.select("repo","path","lang").collect()))
    # pruning: the lookup scan touches at most 2 of 16 bucket dirs
    full_dirs = {os.path.dirname(f) for f in t.read().inputFiles()}
    probe_dirs = {os.path.dirname(f) for f in got.inputFiles()}
    assert len(probe_dirs) <= 2 < len(full_dirs)

def test_lookup_validates_probes(spark):
    t = TargetTable.create(
        spark, _mkroot(), key_cols=["repo", "path"],
        columns=[("lang", "string")], num_buckets=4,
    )
    with pytest.raises(ValueError, match="at least one"):
        t.lookup([])
    with pytest.raises(ValueError, match="bucket column"):
        t.lookup([{"repo": "r"}])  # path (bucket col) unbound
    with pytest.raises(ValueError, match="same column set"):
        t.lookup([{"repo": "a", "path": "b"}, {"repo": "a"}])
    with pytest.raises(ValueError, match="key columns"):
        t.lookup([{"repo": "a", "path": "b", "lang": "x"}])

def test_lookup_large_probe_set_semijoin(spark):
    t = TargetTable.create(
        spark, _mkroot(), key_cols=["repo", "path"],
        columns=[("lang", "string"), ("content", "string")], num_buckets=8,
    )
    ev = change_events(spark, 6000, n_repos=20, paths_per_repo=25, seed=9)
    prep = lambda df, i: df.select("repo", "path", "lang", "content", "_seq", "_op", "_ts")
    replay(t, split_batches(ev, 2), prepare=prep)
    keys = [r for r in t.read().select("repo", "path").limit(100).collect()]
    probes = [{"repo": r["repo"], "path": r["path"]} for r in keys]
    got = t.lookup(probes).select("repo", "path").collect()
    assert sorted(map(tuple, got)) == sorted({(r["repo"], r["path"]) for r in keys})

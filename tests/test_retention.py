"""Engine-generated retention deletes (`TargetTable.delete_where`):
TTL / GDPR erasure as first-class lake maintenance. The contract under
test: victims come from the stats-pruned scan, tombstones carry NULL
payloads (no re-persisted content), the delete rides the NORMAL merge
path — so changelog old-images and downstream incremental consumers
(here: the COUNT/SUM MV) stay exact with no special-casing — and
logical + physical erasure compose (`delete_where` + `expire_snapshots`
leaves the erased content in no live data file).

Reference parity: the reference sink is INSERT/UPDATE only
(db/postgres_query_builder.py) — no delete path exists there; this is
from-scratch lake-maintenance surface.
"""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.mv import IncrementalAggregate
from data_ingestor_py_spark.plans.replay import replay, split_batches
from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.sources import change_events

PREP = lambda df, i: df.select("repo", "path", "lang", "content", "_seq", "_op", "_ts")  # noqa: E731


def _mkroot(prefix):
    d = tempfile.mkdtemp(prefix=prefix)
    os.rmdir(d)
    return d


def _mk(spark, n=4000, seed=23, **kw):
    t = TargetTable.create(
        spark, _mkroot("ret-"), key_cols=["repo", "path"],
        columns=[("lang", "string"), ("content", "string")], num_buckets=8,
        **kw,
    )
    ev = change_events(spark, n, n_repos=15, paths_per_repo=15, seed=seed)
    replay(t, split_batches(ev, 3), prepare=PREP)
    return t


def test_delete_where_matches_filter(spark):
    t = _mk(spark)
    before = t.read()
    expect = sorted(
        tuple(r) for r in
        before.where(~(F.col("lang") == "go")).select("repo", "path", "lang").collect()
    )
    assert before.where(F.col("lang") == "go").count() > 0
    st = t.delete_where([("lang", "=", "go")])
    assert st.rows_in > 0
    got = sorted(tuple(r) for r in t.read().select("repo", "path", "lang").collect())
    assert got == expect


def test_tombstones_carry_no_payload(spark):
    t = _mk(spark)
    st = t.delete_where([("lang", "=", "go")])
    dead = t.read_raw().where(
        (F.col("_op") == "D") & (F.col("_seq") == st.seq_max)
    )
    n = dead.count()
    assert n == st.rows_in
    # erasure: the delete record itself must not re-persist the content
    assert dead.where(
        F.col("lang").isNotNull() | F.col("content").isNotNull()
    ).count() == 0


def test_redelivery_is_noop(spark):
    t = _mk(spark)
    t.delete_where([("lang", "=", "go")])
    v = t._load()["version"]
    h = t.snapshot_hash()
    st2 = t.delete_where([("lang", "=", "go")])
    assert st2.rows_in == 0
    assert t._load()["version"] == v
    assert t.snapshot_hash() == h


def test_stale_seq_raises_and_applies_nothing(spark):
    t = _mk(spark)
    h = t.snapshot_hash()
    with pytest.raises(ValueError, match="winner rule"):
        t.delete_where([("lang", "=", "go")], seq=1)
    assert t.snapshot_hash() == h


def test_changelog_emits_deletes_with_old_image(spark):
    t = _mk(spark)
    v0 = t._load()["version"]
    doomed = {
        tuple(r) for r in
        t.read().where(F.col("lang") == "go").select("repo", "path").collect()
    }
    t.delete_where([("lang", "=", "go")])
    d = t.diff_versions(v0, t._load()["version"], old_image=True)
    rows = d.collect()
    assert {(r["repo"], r["path"]) for r in rows} == doomed
    assert all(r["_change_type"] == "D" for r in rows)
    # the old image is the pre-delete payload (what a downstream aggregate
    # needs to retract) even though the tombstone itself is NULL-payload
    assert all(r["_old_lang"] == "go" for r in rows)


def test_downstream_mv_stays_exact_across_delete(spark):
    t = _mk(spark)
    mv = IncrementalAggregate.create(
        spark, _mkroot("ret-mv-"), t,
        group_cols=["lang"], sum_cols=[("sum_seq", "_seq")],
    )
    mv.refresh()
    t.delete_where([("lang", "=", "go")])
    mv.refresh()
    got = sorted(
        (tuple(r) for r in mv.read().select("lang", "n_rows", "sum_seq").collect()),
        key=lambda x: (x[0] is None, x),
    )
    expect = sorted(
        (
            tuple(r) for r in
            t.read().groupBy("lang").agg(
                F.count(F.lit(1)).alias("n_rows"), F.sum("_seq").alias("sum_seq")
            ).collect()
        ),
        key=lambda x: (x[0] is None, x),
    )
    assert got == expect
    assert not any(g[0] == "go" for g in got)


def test_later_source_event_resurrects(spark):
    t = _mk(spark)
    st = t.delete_where([("lang", "=", "go")])
    key = t.read_raw().where(
        (F.col("_op") == "D") & (F.col("_seq") == st.seq_max)
    ).select("repo", "path").first()
    resurrect = spark.createDataFrame(
        [(key["repo"], key["path"], "go", "body-v2", st.seq_max + 1, "U")],
        "repo string, path string, lang string, content string, _seq long, _op string",
    ).withColumn("_ts", F.current_timestamp())
    t.merge_apply(resurrect)
    back = t.read().where(
        (F.col("repo") == key["repo"]) & (F.col("path") == key["path"])
    ).collect()
    assert len(back) == 1 and back[0]["content"] == "body-v2"


def test_physical_erasure_after_expire(spark):
    t = _mk(spark)
    marker = "ERASE-ME-7f3a"
    victim = t.read().first()
    t.merge_apply(
        spark.createDataFrame(
            [(victim["repo"], victim["path"], "go", marker, 10**9, "U")],
            "repo string, path string, lang string, content string, _seq long, _op string",
        ).withColumn("_ts", F.current_timestamp())
    )
    assert t.read().where(F.col("content") == marker).count() == 1
    t.delete_where([("content", "=", marker)])
    t.expire_snapshots(keep_last=1)
    # the erased content must survive in NO live data file: scan every
    # remaining parquet byte-for-byte via the raw reader
    live = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(t.root)
        for f in fs
        if f.endswith(".parquet")
        and os.path.relpath(dp, t.root).startswith("snap-")
    ]
    assert live
    raw = spark.read.parquet(*live)
    assert raw.where(F.col("content") == marker).count() == 0


def test_mor_delete_equals_cow_delete(spark):
    cow = _mk(spark, seed=31)
    mor = _mk(spark, seed=31, merge_mode="mor")
    for t in (cow, mor):
        t.delete_where([("lang", "=", "go")])
    assert cow.snapshot_hash() == mor.snapshot_hash()

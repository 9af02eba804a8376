"""IncrementalJoin (plans/join_mv.py): delta-maintained left-join
enrichment view — incremental folds must equal the full recompute exactly
under fact changes, dim changes, fk migration, deletes on both sides, and
any refresh schedule."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.join_mv import IncrementalJoin
from data_ingestor_py_spark.plans.target import TargetTable


def _mkroot(prefix="joinmv-"):
    d = tempfile.mkdtemp(prefix=prefix)
    os.rmdir(d)
    return d


def _batch(spark, schema, rows):
    return spark.createDataFrame(rows, schema).withColumn(
        "_ts", F.current_timestamp()
    )

FACT_DDL = "id string, dept string, val long, _seq long, _op string"
DIM_DDL = "dept string, dname string, _seq long, _op string"


def _mk_tables(spark):
    fact = TargetTable.create(
        spark, _mkroot("joinmv-f-"), key_cols=["id"],
        columns=[("dept", "string"), ("val", "long")], num_buckets=4,
    )
    dim = TargetTable.create(
        spark, _mkroot("joinmv-d-"), key_cols=["dept"],
        columns=[("dname", "string")], num_buckets=2,
    )
    return fact, dim


def _mk_view(spark, fact, dim):
    return IncrementalJoin.create(
        spark, _mkroot(), fact, dim, fk_cols=["dept"],
        fact_cols=[("dept", "dept", "string"), ("val", "val", "long")],
        dim_cols=[("dname", "dname", "string")],
    )


def _rows(view):
    return sorted(
        tuple(r) for r in view.read().select("id", "dept", "val", "dname").collect()
    )


def _check(view):
    got = _rows(view)
    want = sorted(
        tuple(r)
        for r in view.recompute().select("id", "dept", "val", "dname").collect()
    )
    assert got == want
    return got


def test_incremental_matches_recompute_through_both_deltas(spark):
    fact, dim = _mk_tables(spark)
    v = _mk_view(spark, fact, dim)

    fact.merge_apply(_batch(spark, FACT_DDL, [
        ("1", "a", 10, 1, "U"), ("2", "a", 20, 2, "U"),
        ("3", "b", 30, 3, "U"), ("4", "c", 40, 4, "U"),
    ]))
    dim.merge_apply(_batch(spark, DIM_DDL, [
        ("a", "alpha", 1, "U"), ("b", "beta", 2, "U"),   # c missing -> NULL
    ]))
    assert v.refresh() is not None
    got = _check(v)
    assert ("4", "c", 40, None) in got  # left-join miss

    # fact delta: update id2 migrating fk a->c, delete id3, insert id5
    fact.merge_apply(_batch(spark, FACT_DDL, [
        ("2", "c", 21, 5, "U"), ("3", None, None, 6, "D"),
        ("5", "b", 50, 7, "U"),
    ]))
    # dim delta: rename a, DELETE b (must NULL id5's fresh enrichment and
    # any existing b row), insert c (heals the v1 miss)
    dim.merge_apply(_batch(spark, DIM_DDL, [
        ("a", "ALPHA", 3, "U"), ("b", None, 4, "D"), ("c", "gamma", 5, "U"),
    ]))
    assert v.refresh() is not None
    got = _check(v)
    assert got == [
        ("1", "a", 10, "ALPHA"),
        ("2", "c", 21, "gamma"),   # fk migration re-enriched
        ("4", "c", 40, "gamma"),   # dim insert healed the miss
        ("5", "b", 50, None),      # dim delete -> NULL enrichment
    ]
    # idempotent: nothing new -> no-op
    assert v.refresh() is None


def test_schedule_independence(spark):
    """Step-by-step refreshes and one catch-up refresh land on the same
    state (the changelogs compose)."""
    fact, dim = _mk_tables(spark)
    stepped = _mk_view(spark, fact, dim)
    lazy = _mk_view(spark, fact, dim)

    for i, (frows, drows) in enumerate([
        ([("1", "a", 1, 1, "U"), ("2", "b", 2, 2, "U")],
         [("a", "A0", 1, "U")]),
        ([("3", "a", 3, 3, "U"), ("1", "b", 4, 4, "U")],
         [("b", "B0", 2, "U"), ("a", "A1", 3, "U")]),
        ([("2", None, None, 5, "D"), ("4", "c", 6, 6, "U")],
         [("a", None, 4, "D")]),
    ]):
        fact.merge_apply(_batch(spark, FACT_DDL, frows))
        dim.merge_apply(_batch(spark, DIM_DDL, drows))
        stepped.refresh()
    lazy.refresh()
    assert _rows(stepped) == _rows(lazy) == _check(stepped)


def test_fact_only_and_dim_only_refreshes(spark):
    fact, dim = _mk_tables(spark)
    v = _mk_view(spark, fact, dim)
    fact.merge_apply(_batch(spark, FACT_DDL, [("1", "a", 1, 1, "U")]))
    dim.merge_apply(_batch(spark, DIM_DDL, [("a", "A", 1, "U")]))
    v.refresh()
    # dim-only change
    dim.merge_apply(_batch(spark, DIM_DDL, [("a", "A2", 2, "U")]))
    assert v.refresh() is not None
    assert _check(v) == [("1", "a", 1, "A2")]
    # fact-only change
    fact.merge_apply(_batch(spark, FACT_DDL, [("2", "a", 2, 2, "U")]))
    assert v.refresh() is not None
    assert _check(v) == [("1", "a", 1, "A2"), ("2", "a", 2, "A2")]


def test_crash_between_fold_and_lineage_record(spark):
    """The fold commit carries its own progress (app_meta): a crash before
    the lineage record must not re-fold — recovery just backfills the
    record."""
    fact, dim = _mk_tables(spark)
    v = _mk_view(spark, fact, dim)
    fact.merge_apply(_batch(spark, FACT_DDL, [("1", "a", 1, 1, "U")]))
    dim.merge_apply(_batch(spark, DIM_DDL, [("a", "A", 1, "U")]))

    real_commit = v.cp.commit
    v.cp.commit = lambda rec: (_ for _ in ()).throw(OSError("crash"))
    with pytest.raises(OSError):
        v.refresh()
    v.cp.commit = real_commit

    ver_after_fold = v.table._load()["version"]
    assert v.synced_versions() == (1, 1)  # progress survived the crash
    assert v.refresh() is None            # nothing to fold again
    assert v.table._load()["version"] == ver_after_fold  # no extra commit
    # the missing lineage record was backfilled on entry
    assert v.cp.committed_batches() == {1 * (1 << 31) + 1}
    assert _check(v) == [("1", "a", 1, "A")]


def test_reseed_bootstrap_and_equivalence(spark):
    """reseed() attaches a view to already-populated tables; a later
    incremental refresh continues from there."""
    fact, dim = _mk_tables(spark)
    fact.merge_apply(_batch(spark, FACT_DDL, [
        ("1", "a", 1, 1, "U"), ("2", "b", 2, 2, "U"),
    ]))
    dim.merge_apply(_batch(spark, DIM_DDL, [("a", "A", 1, "U")]))
    v = _mk_view(spark, fact, dim)
    v.reseed()
    assert _check(v) == [("1", "a", 1, "A"), ("2", "b", 2, None)]
    fact.merge_apply(_batch(spark, FACT_DDL, [("1", None, None, 3, "D")]))
    dim.merge_apply(_batch(spark, DIM_DDL, [("b", "B", 2, "U")]))
    assert v.refresh() is not None
    assert _check(v) == [("2", "b", 2, "B")]


def test_join_view_over_streamed_fact(spark, tmp_path):
    """Per-epoch join-view maintenance over a live stream (the on_epoch_end
    hook, same contract as the MV): every intermediate snapshot enriches
    exactly, while the dim churns between epochs."""
    from data_ingestor_py_spark.sources import change_events
    from data_ingestor_py_spark.streaming.stream_replay import stream_replay

    ev = change_events(spark, 1500, n_repos=8, paths_per_repo=8, seed=63)
    src = str(tmp_path / "events")
    ev.repartition(2).write.parquet(src)
    fact = TargetTable.create(
        spark, str(tmp_path / "t"), key_cols=["repo", "path"],
        columns=[("lang", "string"), ("content", "string")], num_buckets=4,
    )
    dim = TargetTable.create(
        spark, str(tmp_path / "d"), key_cols=["repo"],
        columns=[("region", "string")], num_buckets=2,
    )
    dim.merge_apply(ev.select("repo").distinct().select(
        "repo", F.concat(F.lit("r0:"), F.col("repo")).alias("region"),
        F.lit(1).cast("long").alias("_seq"), F.lit("U").alias("_op"),
        F.current_timestamp().alias("_ts"),
    ))
    v = IncrementalJoin.create(
        spark, str(tmp_path / "v"), fact, dim, fk_cols=["repo"],
        fact_cols=[("lang", "lang", "string")],
        dim_cols=[("region", "region", "string")],
    )
    schema = (
        "event_id long, repo string, path string, commit string, _seq long, "
        "_op string, _ts timestamp, lang string, content string, _schema_version int"
    )
    prep = lambda df, _e=0: df.select(  # noqa: E731
        "repo", "path", "lang", "content", "_seq", "_op", "_ts")
    checks = []

    def on_end(epoch, table, rec):
        # churn one dim key per epoch, then refresh: exercises BOTH delta
        # paths at every epoch
        dim.merge_apply(dim.read().limit(1).select(
            "repo", F.concat(F.lit(f"r{epoch+1}:"), F.col("repo")).alias("region"),
            F.lit(epoch + 2).cast("long").alias("_seq"), F.lit("U").alias("_op"),
            F.current_timestamp().alias("_ts"),
        ))
        v.refresh()
        got = sorted(tuple(r) for r in v.read().collect())
        want = sorted(tuple(r) for r in v.recompute().collect())
        checks.append(got == want)

    q = stream_replay(spark, src, schema, fact, prepare=prep,
                      checkpoint_dir=str(tmp_path / "cp"),
                      max_files_per_trigger=1, on_epoch_end=on_end)
    q.awaitTermination(120)
    assert len(checks) >= 2 and all(checks)
    assert v.synced_versions()[0] == fact._load()["version"]


def test_empty_delta_still_advances_progress(spark):
    """A fact version bump with NO visible row change (meta-only commit,
    all-late merge, compaction) yields an empty refresh delta;
    merge_apply early-returns without committing app_meta, so the
    progress must be made durable separately — otherwise the view
    re-diffs the same gap on every refresh forever and fails permanently
    once retention expires the base snapshot."""
    fact, dim = _mk_tables(spark)
    v = _mk_view(spark, fact, dim)
    fact.merge_apply(_batch(spark, FACT_DDL, [("1", "a", 1, 1, "U")]))
    dim.merge_apply(_batch(spark, DIM_DDL, [("a", "A", 1, "U")]))
    v.refresh()
    assert v.synced_versions() == (1, 1)
    # version bump with no data change
    fact.commit_app_meta({"note": "maintenance"})
    assert fact._load()["version"] == 2
    assert v.refresh() is not None
    assert v.synced_versions() == (2, 1)   # progress advanced
    assert v.refresh() is None             # and stays advanced
    assert _check(v) == [("1", "a", 1, "A")]

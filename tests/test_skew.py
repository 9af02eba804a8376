"""Hot-key skew handling (M3): correctness under extreme skew + the salted
path's plan shape. The reference has no concept of skew (single consumer
thread); at 10^10 events one hot repo would stall a reducer for hours."""

from pyspark.sql import functions as F

from data_ingestor_py_spark.operators.dedup import latest_by_key, salted_latest_by_key
from data_ingestor_py_spark.sources.generator import change_events
from tests.conftest import make_table


def _skewed(spark, n=20000):
    """~90% of events hit ONE key."""
    ev = change_events(spark, n, n_repos=50, paths_per_repo=20, seed=13)
    hot = F.pmod(F.xxhash64("event_id"), F.lit(10)) < 9
    return ev.withColumn("repo", F.when(hot, F.lit("repo-hot")).otherwise(F.col("repo"))).withColumn(
        "path", F.when(hot, F.lit("src/hot.txt")).otherwise(F.col("path"))
    )


def _prep(df):
    return df.withColumn("_content_sha256", F.sha2(F.col("content"), 256)).select(
        "repo", "path", "commit", "lang", "content", "_content_sha256", "_seq", "_op", "_ts"
    )


def test_salted_reduce_correct_under_extreme_skew(spark):
    ev = _prep(_skewed(spark))
    a = latest_by_key(ev, ["repo", "path"])
    b = salted_latest_by_key(ev, ["repo", "path"], salt_buckets=32)
    from data_ingestor_py_spark.functions.content import table_state_hash

    assert table_state_hash(a) == table_state_hash(b)
    # the hot key survives as exactly one row
    assert b.where("repo = 'repo-hot'").count() == 1


def test_salted_merge_apply_under_skew(spark, tmp_path):
    ev = _prep(_skewed(spark, 10000))
    t1 = make_table(spark, tmp_path / "plain")
    t2 = make_table(spark, tmp_path / "salted")
    t1.merge_apply(ev)
    t2.merge_apply(ev, salt_buckets=16)
    assert t1.snapshot_hash() == t2.snapshot_hash()


def test_salt_spreads_hot_key_in_phase_one(spark):
    """Phase 1 of the salted reduce must emit multiple rows for the hot key
    (i.e. the work actually spread across reducers)."""
    ev = _prep(_skewed(spark, 5000))
    # reproduce phase 1 only
    from data_ingestor_py_spark.operators.dedup import _ordered_struct

    salt = F.pmod(F.xxhash64("_seq"), F.lit(16))
    phase1 = (
        ev.withColumn("_salt", salt)
        .groupBy("repo", "path", "_salt")
        .agg(F.max(_ordered_struct(ev, "_seq", ["repo", "path"])).alias("_top"))
    )
    hot_partials = phase1.where("repo = 'repo-hot'").count()
    assert hot_partials > 4  # hot key split across many salt reducers
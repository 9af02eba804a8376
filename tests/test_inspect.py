"""Metadata inspection tables (plans/inspect.py)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.inspect import (
    files_df,
    history_df,
    snapshots_df,
)
from data_ingestor_py_spark.plans.target import TargetTable


def _batch(spark, n, seq0):
    return spark.range(n).select(
        F.col("id").cast("string").alias("id"),
        (F.col("id") * 3).alias("val"),
        (F.col("id") + seq0).alias("_seq"),
        F.lit("U").alias("_op"),
        F.lit(None).cast("timestamp").alias("_ts"),
    )


def _mk(spark, tmp_path, **kw):
    defaults = dict(
        key_cols=["id"],
        columns=[("val", "long")],
        num_buckets=4,
        stats_cols=["val"],
    )
    defaults.update(kw)
    return TargetTable.create(spark, str(tmp_path / "t"), **defaults)


def test_history_df_matches_read_history(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for i in range(3):
        t.merge_apply(_batch(spark, 50, i * 100), stats="light")
    hist = t.read_history()
    df = history_df(t).orderBy("snapshot").collect()
    assert len(df) == len(hist)
    merges = [r for r in df if r["op"] == "merge"]
    assert len(merges) == 3
    assert all(r["rows_in"] == 50 for r in merges)
    assert [r["snapshot"] for r in df] == sorted(
        e["snapshot"] for e in hist
    )


def test_files_df_accounts_every_live_row(spark, tmp_path):
    """sum(rows) over files_df == table row count (stats shards carry
    exact per-file counts), and stats bounds parse back as JSON."""
    t = _mk(spark, tmp_path)
    t.merge_apply(_batch(spark, 200, 0), stats="light")
    t.merge_apply(_batch(spark, 100, 1000), stats="light")
    f = files_df(t)
    assert f.where("rows < 0").count() == 0  # everything harvested
    assert f.agg(F.sum("rows")).first()[0] == t.read().count()
    assert f.where("layer = 'base'").count() == f.count()
    st = json.loads(f.where("stats IS NOT NULL").first()["stats"])
    assert any(k for k in st), "per-column bounds missing from shard"


def test_files_df_lists_mor_delta_layers(spark, tmp_path):
    t = _mk(spark, tmp_path, merge_mode="mor", mor_max_deltas=0)
    t.merge_apply(_batch(spark, 80, 0), stats="light")
    t.merge_apply(_batch(spark, 80, 500), stats="light")  # delta layer
    f = files_df(t)
    assert f.where(F.col("layer").startswith("delta:")).count() > 0


def test_snapshots_df_versions_and_current_flag(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for i in range(3):
        t.merge_apply(_batch(spark, 30, i * 100), stats="light")
    s = snapshots_df(t).orderBy("version").collect()
    assert [r["version"] for r in s] == [0, 1, 2, 3]  # create + 3 merges
    assert [r["is_current"] for r in s] == [False, False, False, True]
    assert s[-1]["op"] == "merge" and s[-1]["n_buckets"] > 0

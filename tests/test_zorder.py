"""Z-order clustering rewrite (TargetTable.rewrite_data_files zorder_by).

The claim under test: after a z-order rewrite on (x, y), per-file
statistics prune selective range predicates on EITHER column, where a
linear sort_by=["x"] only ever serves x. State is untouched (clustering
moves rows between files, never changes them).
"""

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.target import TargetTable


def _mk(spark, tmp_path, name):
    t = TargetTable.create(
        spark, str(tmp_path / name),
        key_cols=["id"],
        columns=[("x", "long"), ("y", "long"), ("pad", "string")],
        num_buckets=2,
        stats_cols=["x", "y"],
    )
    # x and y independent and uniform: the adversarial case for linear sort
    batch = spark.range(4000).select(
        F.col("id").cast("string").alias("id"),
        (F.xxhash64("id", F.lit(1)) % 1000).alias("x"),
        (F.xxhash64("id", F.lit(2)) % 1000).alias("y"),
        F.lit("p").alias("pad"),
        F.col("id").alias("_seq"),
        F.lit("U").alias("_op"),
        F.lit(None).cast("timestamp").alias("_ts"),
    ).withColumn("x", F.abs("x")).withColumn("y", F.abs("y"))
    t.merge_apply(batch, stats="light")
    return t


def _files_read(t, preds):
    p = t.scan_plan(preds, use_bloom=False)
    return p["files_read"], p["files_total"]


def test_zorder_prunes_both_dimensions_linear_only_one(spark, tmp_path):
    tz = _mk(spark, tmp_path, "z")
    h0 = tz.snapshot_hash()
    tz.rewrite_data_files(zorder_by=["x", "y"], max_rows_per_file=250)
    assert tz.snapshot_hash() == h0  # clustering never changes state

    tl = _mk(spark, tmp_path, "lin")
    tl.rewrite_data_files(sort_by=["x"], max_rows_per_file=250)

    for col in ("x", "y"):
        preds = [(col, ">=", 100), (col, "<", 160)]  # ~6% selectivity
        zr, zt = _files_read(tz, preds)
        assert zr < zt * 0.7, f"zorder failed to prune on {col}: {zr}/{zt}"
    lr_x, lt = _files_read(tl, [("x", ">=", 100), ("x", "<", 160)])
    lr_y, _ = _files_read(tl, [("y", ">=", 100), ("y", "<", 160)])
    assert lr_x < lt * 0.3          # linear sort serves its own column well
    assert lr_y == lt               # ...and the other column not at all
    # combined 2-D probe: z-order reads a small corner
    zr2, zt2 = _files_read(
        tz, [("x", ">=", 100), ("x", "<", 300), ("y", ">=", 100), ("y", "<", 300)]
    )
    assert zr2 < zt2 * 0.6


def test_zorder_results_equal_filter(spark, tmp_path):
    t = _mk(spark, tmp_path, "t")
    t.rewrite_data_files(zorder_by=["x", "y"], max_rows_per_file=300)
    preds = [("x", ">=", 50), ("x", "<", 200), ("y", ">=", 700)]
    got = sorted(map(tuple, t.read_where(preds).collect()))
    want = sorted(
        map(
            tuple,
            t.read()
            .where((F.col("x") >= 50) & (F.col("x") < 200) & (F.col("y") >= 700))
            .collect(),
        )
    )
    assert got == want and len(got) > 0


def test_zorder_validation(spark, tmp_path):
    t = _mk(spark, tmp_path, "v")
    with pytest.raises(ValueError):
        t.rewrite_data_files(zorder_by=["x"])
    with pytest.raises(ValueError):
        t.rewrite_data_files(zorder_by=["x", "nope"])
    with pytest.raises(ValueError):
        t.rewrite_data_files(sort_by=["x"], zorder_by=["x", "y"])
    with pytest.raises(ValueError):
        t.rewrite_data_files(zorder_by=["x", "pad"])  # string rejected


def test_constant_and_null_columns_degrade_gracefully(spark, tmp_path):
    t = TargetTable.create(
        spark, str(tmp_path / "c"),
        key_cols=["id"], columns=[("x", "long"), ("y", "long")],
        num_buckets=2, stats_cols=["x", "y"],
    )
    batch = spark.range(200).select(
        F.col("id").cast("string").alias("id"),
        F.lit(7).cast("long").alias("x"),  # constant
        F.when(F.col("id") % 3 == 0, None).otherwise(F.col("id")).alias("y"),
        F.col("id").alias("_seq"),
        F.lit("U").alias("_op"),
        F.lit(None).cast("timestamp").alias("_ts"),
    )
    t.merge_apply(batch, stats="light")
    h0 = t.snapshot_hash()
    t.rewrite_data_files(zorder_by=["x", "y"], max_rows_per_file=50)
    assert t.snapshot_hash() == h0
    got = t.read_where([("y", ">=", 100)]).count()
    want = t.read().where(F.col("y") >= 100).count()
    assert got == want

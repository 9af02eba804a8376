"""Watermarked stream-stream interval join (streaming/stream_join.py).

An inner interval join's result set is epoch-independent (a pair emits
once both halves arrived), so the batch run of the same plan is the
exact groundtruth; restart and lost-checkpoint runs must converge
through the keyed idempotent merge.
"""

from pyspark.sql import functions as F

from data_ingestor_py_spark.streaming.stream_join import (
    create_join_table,
    interval_join,
    stream_interval_join_to_table,
)

H = 3600
L_SCHEMA = "user_id long, view_id long, ts timestamp"
R_SCHEMA = "user_id long, purchase_id long, ts timestamp"

VIEWS = [(1, 100, 1 * H), (1, 101, 5 * H), (2, 200, 2 * H), (3, 300, 1 * H)]
BUYS = [(1, 900, 3 * H), (1, 901, 30 * H), (2, 910, 2 * H), (4, 940, 2 * H)]
# within 6h: (100,900) lag 2h; (101,900)? 3h < 5h -> no (right before left);
# (910 at 2h vs 200 at 2h) lag 0; user 3 no purchase; user 4 no view;
# (101,901): 30h-5h=25h > 6h -> no; (100,901): 29h > 6h -> no


def _df(spark, rows, schema):
    return spark.createDataFrame(
        [(a, b, float(t)) for a, b, t in rows],
        schema.replace("timestamp", "double").replace("ts ", "_t "),
    ).select(
        *[c.split()[0] for c in schema.split(", ")[:-1]],
        F.timestamp_seconds("_t").alias("ts"),
    )


def _want():
    return sorted([(1, 100, 900, 2 * H), (2, 200, 910, 0)])


def test_batch_join_groundtruth(spark):
    got = sorted(
        map(
            tuple,
            interval_join(
                _df(spark, VIEWS, L_SCHEMA), _df(spark, BUYS, R_SCHEMA),
                ["user_id"], "view_id", "purchase_id", within="6 hours",
            ).collect(),
        )
    )
    assert got == _want()


def test_stream_join_lands_and_converges(spark, tmp_path):
    l_dir, r_dir = str(tmp_path / "l"), str(tmp_path / "r")
    _df(spark, VIEWS, L_SCHEMA).coalesce(1).write.parquet(l_dir)
    _df(spark, BUYS, R_SCHEMA).coalesce(1).write.parquet(r_dir)
    t = create_join_table(
        spark, str(tmp_path / "t"), ["user_id"], "view_id", "purchase_id"
    )
    cp = str(tmp_path / "cp")

    def run(cpd):
        q = stream_interval_join_to_table(
            spark, l_dir, L_SCHEMA, r_dir, R_SCHEMA, t,
            ["user_id"], "view_id", "purchase_id",
            within="6 hours", checkpoint_dir=cpd,
        )
        q.awaitTermination(300)

    run(cp)
    got = sorted(
        (int(r["user_id"]), int(r["view_id"]), int(r["purchase_id"]), r["lag_s"])
        for r in t.read().collect()
    )
    assert got == _want()
    h = t.snapshot_hash()
    run(cp)  # restart: no new data -> no-op
    assert t.snapshot_hash() == h
    run(str(tmp_path / "cp2"))  # lost checkpoint: re-delivery converges
    assert t.snapshot_hash() == h


def _stage_two(spark, tmp_path):
    """Both dirs get their main file + a far-future sentinel in a LATER
    epoch (mtime trick) — outer emission needs the min-across-sources
    watermark to pass every real row's eviction horizon."""
    import glob
    import os
    import shutil

    dirs = {}
    specs = {
        "l": (_df(spark, VIEWS, L_SCHEMA),
              _df(spark, [(999998, 0, 1000 * H * 24)], L_SCHEMA)),
        "r": (_df(spark, BUYS, R_SCHEMA),
              _df(spark, [(999999, 0, 1000 * H * 24)], R_SCHEMA)),
    }
    base = 1_700_000_000
    for name, (main, sent) in specs.items():
        d = str(tmp_path / f"{name}_in")
        os.makedirs(d)
        for i, df in enumerate([main, sent]):
            tmp = str(tmp_path / f"{name}_s{i}")
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(d, f"f{i:03d}.parquet")
            shutil.copy(src, dst)
            os.utime(dst, (base + i * 60, base + i * 60))
        dirs[name] = d
    return dirs["l"], dirs["r"]


def test_left_outer_emits_unmatched_after_eviction(spark, tmp_path):
    l_dir, r_dir = _stage_two(spark, tmp_path)
    t = create_join_table(
        spark, str(tmp_path / "t"), ["user_id"], "view_id", "purchase_id"
    )
    q = stream_interval_join_to_table(
        spark, l_dir, L_SCHEMA, r_dir, R_SCHEMA, t,
        ["user_id"], "view_id", "purchase_id",
        within="6 hours", how="left_outer", max_files_per_trigger=1,
        checkpoint_dir=str(tmp_path / "cp"),
    )
    q.awaitTermination(300)
    got = sorted(
        (int(r["user_id"]), int(r["view_id"]),
         None if r["purchase_id"] is None else int(r["purchase_id"]),
         r["lag_s"])
        for r in t.read().collect()
        if int(r["user_id"]) < 999000  # sentinels never emit
    )
    want = sorted(
        map(
            tuple,
            interval_join(
                _df(spark, VIEWS, L_SCHEMA), _df(spark, BUYS, R_SCHEMA),
                ["user_id"], "view_id", "purchase_id",
                within="6 hours", how="left_outer",
            ).collect(),
        )
    )
    assert got == want
    # the unmatched views are really there, null-padded
    assert (1, 101, None, None) in got and (3, 300, None, None) in got


def test_batch_join_accepts_ntz_timestamps(spark, tmp_path):
    """The raw parquet events table reads as TIMESTAMP_NTZ; the batch
    twin must accept it (lag epoch goes through an intermediate
    timestamp cast)."""
    p = str(tmp_path / "ntz")
    _df(spark, VIEWS, L_SCHEMA).select(
        "user_id", "view_id", F.col("ts").cast("timestamp_ntz").alias("ts")
    ).write.parquet(p + "/l")
    _df(spark, BUYS, R_SCHEMA).select(
        "user_id", "purchase_id", F.col("ts").cast("timestamp_ntz").alias("ts")
    ).write.parquet(p + "/r")
    got = sorted(
        map(
            tuple,
            interval_join(
                spark.read.parquet(p + "/l"), spark.read.parquet(p + "/r"),
                ["user_id"], "view_id", "purchase_id", within="6 hours",
            ).collect(),
        )
    )
    assert got == _want()

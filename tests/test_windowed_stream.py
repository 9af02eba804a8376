"""Watermarked windowed streaming aggregation (streaming/windowed.py).

Determinism comes from the file-source mtime trick (sessionize gate
idiom): epoch 1 = real events, epoch 2 = a far-future sentinel that
drives the watermark past every real window, closing them all. Covers:
closed windows == batch groundtruth, bounded-lateness drop of
beyond-watermark events, restart no-op, and crash-mid-epoch convergence.
"""

import glob
import os
import shutil

from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.streaming.windowed import (
    create_window_table,
    stream_windowed_to_table,
    windowed_agg,
)

SCHEMA = "user_id long, event_id long, ts timestamp"
DAY = 86400


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, e, float(t)) for u, e, t in rows], "user_id long, event_id long, _t double"
    ).select("user_id", "event_id", F.timestamp_seconds("_t").alias("ts"))


def _stage(spark, tmp_path, *file_dfs):
    """Write each df as one parquet file into the stream dir with strictly
    increasing mtimes (file source orders by mtime -> one epoch each)."""
    d = str(tmp_path / "in")
    os.makedirs(d, exist_ok=True)
    base = 1_700_000_000
    for i, df in enumerate(file_dfs):
        tmp = str(tmp_path / f"stage{i}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(d, f"f{i:03d}.parquet")
        shutil.copy(src, dst)
        os.utime(dst, (base + i * 60, base + i * 60))
    return d


def _run(spark, tmp_path, in_dir, table, checkpoint=None, **kw):
    q = stream_windowed_to_table(
        spark, in_dir, SCHEMA, table,
        group_cols=["user_id"], sum_cols=[("sum_id", "event_id")],
        window="1 day", watermark="1 hour",
        checkpoint_dir=checkpoint, max_files_per_trigger=1, **kw,
    )
    q.awaitTermination(300)
    return table.read().select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("window_start").cast("long").alias("window_start"),
        "n_events", "sum_id",
    )


def _sentinel(spark):
    return _events(spark, [(999, 0, 100 * DAY)])


def test_closed_windows_equal_batch_groundtruth(spark, tmp_path):
    rows = [
        (1, 10, 0.5 * DAY), (1, 11, 0.6 * DAY),           # day 0
        (1, 12, 1.5 * DAY),                                # day 1
        (2, 20, 0.9 * DAY), (2, 21, 2.2 * DAY),            # days 0, 2
    ]
    in_dir = _stage(spark, tmp_path, _events(spark, rows), _sentinel(spark))
    t = create_window_table(
        spark, str(tmp_path / "t"), ["user_id"], [("sum_id", "event_id")]
    )
    got = sorted(map(tuple, _run(spark, tmp_path, in_dir, t).collect()))
    want = sorted(
        map(
            tuple,
            windowed_agg(
                _events(spark, rows), group_cols=["user_id"],
                sum_cols=[("sum_id", "event_id")],
            ).collect(),
        )
    )
    assert got == want
    assert (1, 0, 2, 21) in got  # day-0 window of user 1: events 10+11


def test_late_event_after_window_finalized_is_dropped(spark, tmp_path):
    """Spark's actual lateness boundary: a below-watermark event is
    dropped iff its window was ALREADY emitted (exactly-once emission);
    the emitted row never changes."""
    on_time = _events(spark, [(1, 10, 0.5 * DAY), (1, 11, 9.5 * DAY)])
    bump = _events(spark, [(2, 20, 9.6 * DAY)])  # epoch that finalizes day 0
    late = _events(spark, [(1, 99, 0.7 * DAY)])  # day-0 already emitted
    in_dir = _stage(spark, tmp_path, on_time, bump, late, _sentinel(spark))
    t = create_window_table(
        spark, str(tmp_path / "t"), ["user_id"], [("sum_id", "event_id")]
    )
    got = {
        r["window_start"]: r
        for r in _run(spark, tmp_path, in_dir, t).collect()
        if r["user_id"] == 1
    }
    assert set(got) == {0, 9 * DAY}
    # the finalized day-0 row holds only the on-time event; 99 was dropped
    assert got[0]["n_events"] == 1 and got[0]["sum_id"] == 10


def test_restart_is_noop_and_crash_converges(spark, tmp_path):
    rows = [(1, 10, 0.2 * DAY), (2, 20, 0.8 * DAY), (1, 11, 1.3 * DAY)]
    in_dir = _stage(spark, tmp_path, _events(spark, rows), _sentinel(spark))
    cp = str(tmp_path / "cp")
    t = create_window_table(
        spark, str(tmp_path / "t"), ["user_id"], [("sum_id", "event_id")]
    )
    _run(spark, tmp_path, in_dir, t, checkpoint=cp)
    h1 = t.snapshot_hash()
    # restart with same checkpoint: no new epochs, state unchanged
    _run(spark, tmp_path, in_dir, t, checkpoint=cp)
    assert t.snapshot_hash() == h1
    # fresh checkpoint (simulates losing the stream checkpoint after the
    # merges landed): every window re-merges identical rows at the same
    # _seq -> table converges to the same state
    _run(spark, tmp_path, in_dir, t, checkpoint=str(tmp_path / "cp2"))
    assert t.snapshot_hash() == h1


def test_sliding_windows_batch_semantics(spark):
    """slide < window: each event lands in window/slide windows; the
    batch run of windowed_agg IS the oracle semantics for the stream."""
    rows = [(1, 10, 0.25 * DAY), (1, 11, 0.75 * DAY)]
    got = {
        (r["window_start"], r["n_events"], r["sum_id"])
        for r in windowed_agg(
            _events(spark, rows), window="1 day", slide="12 hours",
            group_cols=["user_id"], sum_cols=[("sum_id", "event_id")],
        ).collect()
    }
    # event at 6h: windows starting -12h and 0h; event at 18h: 0h and 12h
    assert got == {
        (-12 * 3600, 1, 10),
        (0, 2, 21),
        (12 * 3600, 1, 11),
    }

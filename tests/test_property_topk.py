"""Property-based randomized check for the incremental TOP-K view: for
ANY seeded random I/U/D event stream (values include NULLs and exact
ties) and ANY sequential batch split with per-batch folds,

    topk.read() == topk.recompute() == a pure-Python model,

exercising the boundary rule, the insert fast path, tombstoned ranks,
NULL order values, and group migration in random combination."""

import os
import tempfile
from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.plans.topk_mv import IncrementalTopK

IDS = ["i1", "i2", "i3", "i4", "i5", "i6"]
GRPS = ["a", "b"]
VALS = [1.0, 2.0, 2.0, 5.0, None]  # duplicate 2.0 forces tie-breaks
K = 2

event_st = st.tuples(
    st.integers(0, len(IDS) - 1),
    st.sampled_from(["U", "U", "U", "D"]),
    st.integers(0, len(GRPS) - 1),
    st.integers(0, len(VALS) - 1),
)
stream_st = st.lists(event_st, min_size=1, max_size=20)
splits_st = st.integers(1, 3)


def _mkroot(prefix):
    d = tempfile.mkdtemp(prefix=prefix)
    os.rmdir(d)
    return d


def _df(spark, events):
    rows = [
        (
            IDS[ii],
            GRPS[gi] if op != "D" else None,
            (VALS[vi] if op != "D" else None),
            seq,
            op,
        )
        for seq, (ii, op, gi, vi) in enumerate(events)
    ]
    return spark.createDataFrame(
        rows, "id string, grp string, score double, _seq long, _op string"
    ).withColumn("_ts", F.timestamp_seconds(F.col("_seq")))


def _model_topk(events):
    last = {}
    for seq, (ii, op, gi, vi) in enumerate(events):
        last[IDS[ii]] = (op, GRPS[gi], VALS[vi])
    groups = defaultdict(list)
    for iid, (op, grp, val) in last.items():
        if op != "D":
            groups[grp].append((val, iid))
    out = []
    for grp, rows in groups.items():
        # (DESC val with NULLs last, ASC id) — Spark's desc() default
        rows.sort(key=lambda t: (t[0] is None, -(t[0] or 0), t[1]))
        for rank, (val, iid) in enumerate(rows[:K], start=1):
            out.append((grp, rank, iid, val))
    return sorted(out, key=lambda x: [(v is None, v) for v in x])


@settings(max_examples=6, deadline=None)
@given(stream_st, splits_st)
def test_topk_matches_model_and_recompute(spark_global, events, n_splits):
    spark = spark_global
    t = TargetTable.create(
        spark, _mkroot("ptk-src-"), key_cols=["id"],
        columns=[("grp", "string"), ("score", "double")], num_buckets=2,
    )
    tk = IncrementalTopK.create(
        spark, _mkroot("ptk-view-"), t,
        group_cols=["grp"], order_col="score", k=K,
        tiebreak_cols=[("id", "string")], num_buckets=2,
    )
    per = -(-len(events) // n_splits)
    for i in range(n_splits):
        b = _df(spark, events).where(
            (F.col("_seq") >= i * per) & (F.col("_seq") < (i + 1) * per)
        )
        if b.count():
            t.merge_apply(b, stats="light")
            tk.refresh()
    got = sorted(
        (tuple(r) for r in tk.read().collect()),
        key=lambda x: [(v is None, v) for v in x],
    )
    rec = sorted(
        (tuple(r) for r in tk.recompute().collect()),
        key=lambda x: [(v is None, v) for v in x],
    )
    assert got == rec
    assert got == _model_topk(events)

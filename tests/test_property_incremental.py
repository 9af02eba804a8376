"""Property-based randomized checks for the two incremental consumers:
for ANY seeded random I/U/D event stream and ANY sequential batch split,

- the delta-maintained aggregate == a full recompute, and
- the incrementally-folded SCD2 history == the one-pass transform,

with a pure-Python model double-checking both Spark sides."""

import os
import tempfile
from collections import defaultdict

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.mv import IncrementalAggregate
from data_ingestor_py_spark.plans.scd import (
    create_history_table,
    read_history,
    scd2_apply,
    scd2_transform,
)
from data_ingestor_py_spark.plans.target import TargetTable

KEYS = [("r1", "a"), ("r1", "b"), ("r2", "a"), ("r2", "b")]
LANGS = ["py", "go", None]

event_st = st.tuples(
    st.integers(0, len(KEYS) - 1),
    st.sampled_from(["U", "U", "U", "D"]),  # deletes at ~25%
    st.integers(0, len(LANGS) - 1),
)
stream_st = st.lists(event_st, min_size=1, max_size=24)
splits_st = st.integers(1, 3)


def _mkroot(prefix):
    d = tempfile.mkdtemp(prefix=prefix)
    os.rmdir(d)
    return d


def _df(spark, events):
    rows = [
        (KEYS[ki][0], KEYS[ki][1], LANGS[li] if op != "D" else None, seq, op)
        for seq, (ki, op, li) in enumerate(events)
    ]
    return spark.createDataFrame(
        rows, "repo string, path string, lang string, _seq long, _op string"
    ).withColumn("_ts", F.timestamp_seconds(F.col("_seq")))


def _batches(spark, events, n):
    per = -(-len(events) // n)
    return [
        _df(spark, events).where(
            (F.col("_seq") >= i * per) & (F.col("_seq") < (i + 1) * per)
        )
        for i in range(n)
    ]


def _model_state(events):
    last = {}
    for seq, (ki, op, li) in enumerate(events):
        last[KEYS[ki]] = (op, LANGS[li] if op != "D" else None, seq)
    return {k: v for k, v in last.items() if v[0] != "D"}


@settings(max_examples=5, deadline=None)
@given(stream_st, splits_st)
def test_mv_matches_model_and_recompute(spark_global, events, n_splits):
    spark = spark_global
    t = TargetTable.create(
        spark, _mkroot("pmv-src-"), key_cols=["repo", "path"],
        columns=[("lang", "string")], num_buckets=2,
    )
    mv = IncrementalAggregate.create(
        spark, _mkroot("pmv-agg-"), t, group_cols=["lang"], sum_cols=[("sum_seq", "_seq")]
    )
    for b in _batches(spark, events, n_splits):
        if b.count():
            t.merge_apply(b)
            mv.refresh()
    got = sorted(
        (tuple(r) for r in mv.read().collect()),
        key=lambda x: [(v is None, v) for v in x],
    )
    want_rows = defaultdict(lambda: [0, 0])
    for (r, p), (op, lang, seq) in _model_state(events).items():
        want_rows[lang][0] += 1
        want_rows[lang][1] += seq
    want = sorted(
        ((lang, n, s) for lang, (n, s) in want_rows.items()),
        key=lambda x: [(v is None, v) for v in x],
    )
    assert got == want
    rec = sorted(
        (tuple(r) for r in mv.recompute().collect()),
        key=lambda x: [(v is None, v) for v in x],
    )
    assert got == rec


@settings(max_examples=5, deadline=None)
@given(stream_st, splits_st)
def test_scd2_incremental_matches_transform(spark_global, events, n_splits):
    spark = spark_global
    h = create_history_table(
        spark, _mkroot("pscd-"), ["repo", "path"], [("lang", "string")], num_buckets=2
    )
    total_late = 0
    for b in _batches(spark, events, n_splits):
        if b.count():
            st_ = scd2_apply(h, b, ["repo", "path"], ["lang"])
            total_late += st_.n_late
    assert total_late == 0  # sequential splits are ordered by construction
    got = sorted(
        (
            tuple(r)
            for r in read_history(h)
            .select("repo", "path", "lang", "valid_from", "valid_to")
            .collect()
        ),
        key=lambda x: [(v is None, v) for v in x],
    )
    want = sorted(
        (
            tuple(r)
            for r in scd2_transform(_df(spark, events), ["repo", "path"], ["lang"]).collect()
        ),
        key=lambda x: [(v is None, v) for v in x],
    )
    assert got == want

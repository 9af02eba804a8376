"""Closed-log segment-protocol hazards (ADVICE r4, medium): the old
range-containment retirement rule could destroy live history. The fixed
protocol keys apply-idempotence on the batch's exact seq range, retires
compaction inputs by an explicit _COMMIT name list, and tie-breaks
equal-range twins deterministically. These tests pin each failure mode."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.scd import (
    Scd2History,
    create_history_table,
    read_history,
    scd2_apply,
    scd2_transform,
)
from data_ingestor_py_spark.sources import change_events

KEYS = ["repo", "path"]
PAY = ["lang", "content"]


def _mkroot():
    d = tempfile.mkdtemp(prefix="scd2seg-")
    os.rmdir(d)
    return d


def _events(spark, n=800, seed=7):
    return change_events(spark, n, n_repos=8, paths_per_repo=8, seed=seed)


def _range_batches(ev, k):
    mx = ev.agg(F.max("_seq")).collect()[0][0]
    return [
        ev.where((F.col("_seq") * k / (mx + 1)).cast("int") == i)
        for i in range(k)
    ]


def _rows(h):
    cols = read_history(h).columns
    pay = [c for c in cols if c not in (*KEYS, "valid_from", "valid_to", "is_current")]
    return sorted(
        (tuple("\0" if v is None else v for v in r)
         for r in read_history(h).select(*KEYS, *pay, "valid_from", "valid_to").collect()),
    )


def test_redelivery_after_evolve_is_skipped_not_twinned(spark):
    """ADVICE (a): a re-delivered batch after open.evolve() gets a
    different -s<v> name suffix. It must be SKIPPED by seq-range identity
    — under the old name-keyed skip it wrote an equal-range twin segment,
    and the containment rule then retired (and deleted) BOTH."""
    h = create_history_table(
        spark, _mkroot(), KEYS, [("lang", "string"), ("content", "string")],
        num_buckets=4,
    )
    ev = _events(spark, seed=51)
    b1, b2 = _range_batches(ev, 2)
    scd2_apply(h, b1, KEYS, PAY)
    scd2_apply(h, b2, KEYS, PAY)
    before = _rows(h)
    n_seg = len(h.closed_segments())
    h.open.evolve(rename={"lang": "language"})
    # at-least-once driver re-delivers batch 2 under the NEW schema
    st = scd2_apply(
        h, b2.withColumnRenamed("lang", "language"), KEYS, ["language", "content"]
    )
    assert st.segment is None  # skipped, not twinned
    assert len(h.closed_segments()) == n_seg
    assert _rows(h) == before  # nothing duplicated, nothing destroyed


def test_gap_batch_after_compaction_survives(spark):
    """ADVICE (b): compaction's union range covers gaps between its
    inputs; a later batch landing in such a gap (legal — the contract
    requires non-overlapping ranges only) must become a LIVE segment, not
    be misread as a compaction leftover and deleted."""
    h = create_history_table(
        spark, _mkroot(), KEYS, [("lang", "string"), ("content", "string")],
        num_buckets=4,
    )
    ev = _events(spark, n=1200, seed=52)
    b = _range_batches(ev, 4)
    # apply batches 0, 1 and 3 — leaving a seq-range GAP at batch 2 —
    # then compact: merged union range covers the gap
    for part in (b[0], b[1], b[3]):
        scd2_apply(h, part, KEYS, PAY)
    merged = h.compact_segments(max_live_segments=2)
    assert merged is not None
    # keys in batch 2 whose open interval is already past are late by the
    # ordering contract; restrict to keys NOT seen in batch 3 so the gap
    # batch is genuinely appendable history
    seen_later = b[3].select(*KEYS).distinct()
    gap = b[2].join(seen_later, KEYS, "left_anti")
    if gap.count() == 0:  # extremely unlikely at this size; regenerate
        raise AssertionError("fixture degenerate: no gap keys")
    before_segments = set(h.closed_segments())
    st = scd2_apply(h, gap, KEYS, PAY)
    assert st.segment is not None
    seg_path = os.path.join(h.closed_dir, st.segment)
    # the gap segment is live now...
    assert seg_path in h.closed_segments()
    # ...and STAYS live (old containment rule deleted it right here)
    h.compact_segments(max_live_segments=99)  # hygiene pass only
    assert os.path.exists(seg_path)
    assert set(h.closed_segments()) == before_segments | {seg_path}


def test_crashed_compactor_invisible_and_retryable(spark):
    """A compactor that crashed after the parquet job but BEFORE its
    _COMMIT put leaves the merged dir invisible (inputs stay live, no
    double-count), sweepable after the grace period, and a retry
    completes the compaction."""
    h = create_history_table(
        spark, _mkroot(), KEYS, [("lang", "string"), ("content", "string")],
        num_buckets=4,
    )
    ev = _events(spark, seed=53)
    for part in _range_batches(ev, 4):
        scd2_apply(h, part, KEYS, PAY)
    before = _rows(h)
    inputs = set(h.closed_segments())

    class _Boom(RuntimeError):
        pass

    real_put = h.io.put

    def dying_put(path, data):
        if path.endswith("_COMMIT"):
            raise _Boom("crashed before _COMMIT")
        return real_put(path, data)

    h.io.put = dying_put
    try:
        try:
            h.compact_segments(max_live_segments=2)
            raise AssertionError("expected crash")
        except _Boom:
            pass
    finally:
        h.io.put = real_put
    # merged -c dir exists but is invisible; inputs all still live
    assert any(d.endswith("-c") for d in os.listdir(h.closed_dir))
    assert set(h.closed_segments()) == inputs
    assert _rows(h) == before  # no double-count
    # the partial merged dir is a sweep candidate once stale
    assert any(s.endswith("-c") for s in h.sweep_partial_segments(grace_s=0))
    # retry completes the compaction
    m = h.compact_segments(max_live_segments=2)
    assert m is not None and m.endswith("-c")
    assert [os.path.basename(s) for s in h.closed_segments()] == [m]
    assert _rows(h) == before


def test_equal_range_twins_tie_broken_not_destroyed(spark):
    """Defense in depth: if equal-range twin segments DO exist (pre-fix
    artifact or a concurrent-applier race), exactly one is read — the
    deterministic winner — instead of both being retired."""
    h = create_history_table(
        spark, _mkroot(), KEYS, [("lang", "string"), ("content", "string")],
        num_buckets=4,
    )
    ev = _events(spark, seed=54)
    b1, b2 = _range_batches(ev, 2)
    scd2_apply(h, b1, KEYS, PAY)
    scd2_apply(h, b2, KEYS, PAY)
    before = _rows(h)
    segs = sorted(os.listdir(h.closed_dir))
    twin_src = os.path.join(h.closed_dir, segs[-1])
    # forge an equal-range twin with an OLDER schema suffix (tables start
    # at schema 1, so s0 is the deterministic loser)
    parts = segs[-1].split("-")
    assert parts[-1] == "s1"
    parts[-1] = "s0"
    loser_name = "-".join(parts)
    shutil.copytree(twin_src, os.path.join(h.closed_dir, loser_name))
    done, live = h._complete_segments()
    assert os.path.basename(twin_src) in live
    assert loser_name in done and loser_name not in live
    assert _rows(h) == before  # history intact, no duplicates


def test_legacy_merged_segment_leftover_is_not_resurrected(spark):
    """Upgrade path: a merged segment written by the PRE-_COMMIT protocol
    (no -c suffix, no inputs list) whose crashed delete left an input on
    disk. Name-based supersession alone would bring the input back LIVE —
    doubling its intervals. The scoped legacy containment rule (container
    without -c strictly containing another segment) must retire it."""
    h = create_history_table(
        spark, _mkroot(), KEYS, [("lang", "string"), ("content", "string")],
        num_buckets=4,
    )
    ev = _events(spark, n=900, seed=91)
    for part in _range_batches(ev, 3):
        scd2_apply(h, part, KEYS, PAY)
    segs = [os.path.basename(p) for p in h.closed_segments()]
    assert len(segs) == 3
    ranges = sorted(Scd2History._seg_range(s) for s in segs)
    count = sum(Scd2History._seg_count(s) for s in segs)
    sv = Scd2History._seg_schema(segs[0])
    # fabricate the r4-style merged segment: union range, NO -c, NO
    # _COMMIT, parquet = concatenation of the inputs, plus _SUCCESS
    legacy = f"seg-{ranges[0][0]}-{ranges[-1][1]}-{count}-s{sv}"
    ldir = os.path.join(h.closed_dir, legacy)
    os.makedirs(ldir)
    for s in segs:
        for f in os.listdir(os.path.join(h.closed_dir, s)):
            if f.endswith(".parquet"):
                shutil.copy(
                    os.path.join(h.closed_dir, s, f),
                    os.path.join(ldir, f"{s}-{f}"),
                )
    open(os.path.join(ldir, "_SUCCESS"), "w").close()
    # crashed mid-delete: inputs 0 and 2 gone, input 1 (middle) survives
    mid = sorted(segs, key=Scd2History._seg_range)[1]
    for s in segs:
        if s != mid:
            shutil.rmtree(os.path.join(h.closed_dir, s))

    live = {os.path.basename(p) for p in h.closed_segments()}
    assert live == {legacy}  # the leftover input is retired, not live
    # and the history reads every interval exactly ONCE
    want = sorted(
        (tuple("\0" if v is None else v for v in r)
         for r in scd2_transform(ev, KEYS, PAY)
         .select(*KEYS, *PAY, "valid_from", "valid_to").collect())
    )
    assert _rows(h) == want

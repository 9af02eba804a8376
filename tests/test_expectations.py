"""Declarative data-quality expectations (plans/expectations.py).

Covers: NULL-is-violation semantics, per-action routing (warn keeps,
drop removes, quarantine removes+persists with full violation lists,
fail aborts before apply), observation-riding counts, replay
integration via wrap_prepare (quarantine write idempotent under batch
re-application), and the no-Python / single-pass plan shape.
"""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.expectations import (
    BatchQuality,
    Expectation,
    ExpectationFailed,
    ExpectationSet,
)


def _df(spark):
    rows = [
        # (id, value, lang)
        (1, 10.0, "py"),
        (2, -3.0, "go"),      # violates nonneg (drop)
        (3, None, "py"),      # NULL value -> violates nonneg (drop)
        (4, 5.0, "??"),       # violates known_lang (quarantine)
        (5, -1.0, "zz"),      # violates BOTH nonneg and known_lang
        (6, 2.0, None),       # NULL lang -> violates known_lang
        (7, 1e9, "py"),       # violates plausible (warn) -> retained
    ]
    return spark.createDataFrame(rows, "id long, value double, lang string")


def _rules():
    return ExpectationSet(
        [
            Expectation("nonneg", "value >= 0", "drop"),
            Expectation("known_lang", "lang in ('py','go','rs')", "quarantine"),
            Expectation("plausible", "value is null or value < 1e6", "warn"),
        ]
    )


def test_null_is_violation_and_action_routing(spark, tmp_path):
    qdir = str(tmp_path / "q")
    clean, obs = _rules().apply(_df(spark), quarantine_dir=qdir, batch_id=0)
    got = {r.id for r in clean.collect()}
    # retained: 1 (clean), 7 (warn only); removed: 2,3 (drop), 4,5,6 (quarantine)
    assert got == {1, 7}
    q = _rules().quality(obs, rows_retained=len(got))
    assert isinstance(q, BatchQuality)
    assert q.rows_in == 7
    assert q.violations == {"nonneg": 3, "known_lang": 3, "plausible": 1}


def test_quarantine_rows_carry_complete_violation_list(spark, tmp_path):
    qdir = str(tmp_path / "q")
    clean, _ = _rules().apply(_df(spark), quarantine_dir=qdir, batch_id=3)
    clean.count()
    out = {}
    for p in glob.glob(os.path.join(qdir, "batch=3", "*.json")):
        with open(p) as f:
            for line in f:
                r = json.loads(line)
                out[r["id"]] = set(json.loads(r["_violations"]))
    # only quarantine-rule violators are persisted, with EVERY violated rule
    assert set(out) == {4, 5, 6}
    assert out[5] == {"nonneg", "known_lang"}
    assert out[4] == {"known_lang"}


def test_fail_aborts_before_apply(spark):
    rules = ExpectationSet(
        [Expectation("id_present", "id is not null", "fail")]
    )
    ok, _ = rules.apply(_df(spark))
    assert ok.count() == 7  # all ids present -> passes untouched
    bad = _df(spark).withColumn(
        "id", F.when(F.col("id") == 4, None).otherwise(F.col("id"))
    )
    with pytest.raises(ExpectationFailed) as ei:
        rules.apply(bad)
    assert ei.value.counts == {"id_present": 1}


def test_warn_only_set_adds_no_job_and_no_python(spark):
    rules = ExpectationSet([Expectation("w", "value >= 0", "warn")])
    clean, _ = rules.apply(_df(spark))
    plan = clean._jdf.queryExecution().executedPlan().toString()
    assert "CollectMetrics" in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "Exchange"):
        assert bad not in plan


def test_replay_integration_idempotent_quarantine(spark, tmp_path):
    from data_ingestor_py_spark.plans.replay import replay, split_batches
    from data_ingestor_py_spark.plans.target import TargetTable
    from data_ingestor_py_spark.sources import change_events

    ev = change_events(spark, 4000, n_repos=20, paths_per_repo=20, seed=7)
    rules = ExpectationSet(
        [
            # engine-generated values are never negative -> drops nothing,
            # proves the pass-through; the lang rule quarantines a real slice
            Expectation("nonneg", "_seq >= 0", "drop"),
            Expectation("known_lang", "lang <> 'go'", "quarantine"),
        ]
    )
    qdir = str(tmp_path / "quar")
    prep = rules.wrap_prepare(
        lambda df, i: df.select(
            "repo", "path", "commit", "lang", "content", "_seq", "_op", "_ts"
        ),
        quarantine_dir=qdir,
    )
    cols = dict(
        key_cols=["repo", "path"],
        columns=[("commit", "string"), ("lang", "string"), ("content", "string")],
        num_buckets=8,
    )
    batches = split_batches(ev, 3)

    t1 = TargetTable.create(spark, str(tmp_path / "A"), **cols)
    replay(t1, batches, prepare=prep)
    # crash after batch 1 then full resume: same state, quarantine not doubled
    t2 = TargetTable.create(spark, str(tmp_path / "B"), **cols)
    replay(t2, batches[:2], prepare=prep)
    replay(t2, batches, prepare=prep)
    assert t1.snapshot_hash() == t2.snapshot_hash()
    assert t1.read().where(F.col("lang") == "go").count() == 0

    # quarantine dirs are batch-keyed overwrites: re-applying batch 1 by
    # hand leaves the same rows
    before = spark.read.json(os.path.join(qdir, "batch=1")).count()
    clean, _ = rules.apply(batches[1], quarantine_dir=qdir, batch_id=1)
    clean.count()
    assert spark.read.json(os.path.join(qdir, "batch=1")).count() == before


def test_validation_errors(spark):
    with pytest.raises(ValueError):
        Expectation("x", "value >= 0", "explode")
    with pytest.raises(ValueError):
        ExpectationSet(
            [Expectation("a", "1=1"), Expectation("a", "2=2")]
        )

"""HLL approximate COUNT DISTINCT maintenance (plans/approx_distinct.py).

Invariants: maintained estimates == recompute() EXACTLY under any fold
schedule (union-normalized sketches estimate from registers, a pure
function of the value set); retractions re-aggregate their groups; the
estimate stays within the HLL error bound of the exact count; a crash
between the MV merge and the checkpoint converges by re-folding (HLL
union is idempotent over sets)."""

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.approx_distinct import ApproxDistinct
from data_ingestor_py_spark.plans.target import TargetTable


def _mk_source(spark, tmp_path, name="src"):
    return TargetTable.create(
        spark, str(tmp_path / name),
        key_cols=["id"],
        columns=[("grp", "string"), ("val", "string")],
        num_buckets=4,
    )


def _apply(spark, t, rows, seq0):
    df = spark.createDataFrame(
        [
            (str(i), g, v, seq0 + j, "D" if g is None else "U", None)
            for j, (i, g, v) in enumerate(rows)
        ],
        "id string, grp string, val string, _seq long, _op string, _ts timestamp",
    )
    t.merge_apply(df, stats="light")


def _est(ad):
    return sorted(map(tuple, ad.read().collect()))


def _check(ad):
    got = _est(ad)
    want = sorted(map(tuple, ad.recompute().collect()))
    assert got == want
    return got


def test_insert_only_fold_equals_recompute_any_schedule(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    ad = ApproxDistinct.create(spark, str(tmp_path / "hll"), src, ["grp"], "val")
    twin = ApproxDistinct.create(spark, str(tmp_path / "hll2"), src, ["grp"], "val")
    _apply(spark, src, [(i, "a", f"v{i % 7}") for i in range(30)], 0)
    ad.refresh()
    _apply(spark, src, [(i, "b", f"w{i}") for i in range(30, 60)], 100)
    ad.refresh()
    _apply(spark, src, [(i, "a", f"v{i}") for i in range(60, 70)], 200)
    ad.refresh()
    got = _check(ad)  # 3 folds
    twin.refresh()    # 1 fold over the same history
    assert _est(twin) == got  # schedule independence, exact
    # and the small-cardinality estimates are exact outright
    assert dict((g, n) for g, n in got) == {"a": 17, "b": 30}


def test_retraction_reaggregates_group(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    ad = ApproxDistinct.create(spark, str(tmp_path / "hll"), src, ["grp"], "val")
    _apply(spark, src, [(1, "a", "x"), (2, "a", "y"), (3, "a", "y"), (4, "b", "z")], 0)
    ad.refresh()
    assert dict((g, n) for g, n in _est(ad)) == {"a": 2, "b": 1}
    # delete the LAST occurrence of 'x' -> a drops to 1 distinct
    _apply(spark, src, [(1, None, None)], 100)
    ad.refresh()
    assert dict((g, n) for g, n in _check(ad)) == {"a": 1, "b": 1}
    # delete one of two 'y' holders -> still 1 distinct
    _apply(spark, src, [(2, None, None)], 200)
    ad.refresh()
    assert dict((g, n) for g, n in _check(ad)) == {"a": 1, "b": 1}
    # group vanishes entirely -> tombstoned out of the view
    _apply(spark, src, [(3, None, None)], 300)
    ad.refresh()
    assert dict((g, n) for g, n in _check(ad)) == {"b": 1}


def test_update_changing_value_and_noop_update(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    ad = ApproxDistinct.create(spark, str(tmp_path / "hll"), src, ["grp"], "val")
    _apply(spark, src, [(1, "a", "x"), (2, "a", "y")], 0)
    ad.refresh()
    _apply(spark, src, [(1, "a", "z")], 100)  # x -> z: still 2 distinct
    ad.refresh()
    assert dict((g, n) for g, n in _check(ad)) == {"a": 2}
    _apply(spark, src, [(2, "a", "y")], 200)  # no-op value update
    ad.refresh()
    assert dict((g, n) for g, n in _check(ad)) == {"a": 2}


def test_error_bound_at_scale(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    ad = ApproxDistinct.create(spark, str(tmp_path / "hll"), src, ["grp"], "val")
    n = 4000
    df = spark.range(n).select(
        F.col("id").cast("string").alias("id"),
        F.lit("big").alias("grp"),
        F.concat(F.lit("u"), F.col("id")).alias("val"),
        F.col("id").alias("_seq"),
        F.lit("U").alias("_op"),
        F.lit(None).cast("timestamp").alias("_ts"),
    )
    src.merge_apply(df, stats="light")
    ad.refresh()
    got = dict((g, x) for g, x in _check(ad))
    assert abs(got["big"] - n) / n < 0.05  # lgk=12: ~1.6% std error


def test_crash_between_merge_and_checkpoint_converges(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    ad = ApproxDistinct.create(spark, str(tmp_path / "hll"), src, ["grp"], "val")
    _apply(spark, src, [(i, "a", f"v{i}") for i in range(10)], 0)
    ad.refresh()
    _apply(spark, src, [(i, "a", f"v{i}") for i in range(10, 20)], 100)
    orig = ad.cp.commit
    ad.cp.commit = lambda rec: (_ for _ in ()).throw(RuntimeError("crash"))
    with pytest.raises(RuntimeError):
        ad.refresh()
    ad.cp.commit = orig
    ad.refresh()  # re-fold: HLL union is idempotent over the same set
    assert dict((g, n) for g, n in _check(ad)) == {"a": 20}


def test_null_values_ignored(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    ad = ApproxDistinct.create(spark, str(tmp_path / "hll"), src, ["grp"], "val")
    _apply(spark, src, [(1, "a", "x"), (2, "a", None), (3, "b", None)], 0)
    ad.refresh()
    # group b holds only NULLs -> no sketch row at all (COUNT DISTINCT = 0)
    assert dict((g, n) for g, n in _check(ad)) == {"a": 1}


def test_reseed_bootstraps_populated_source(spark, tmp_path):
    src = _mk_source(spark, tmp_path)
    _apply(spark, src, [(i, "a" if i % 2 else "b", f"v{i % 9}") for i in range(40)], 0)
    ad = ApproxDistinct.create(spark, str(tmp_path / "hll"), src, ["grp"], "val")
    ad.reseed()
    assert dict((g, n) for g, n in _check(ad)) == {"a": 9, "b": 9}
    # subsequent incremental folds continue from the reseed point
    _apply(spark, src, [(100, "a", "brand-new")], 500)
    ad.refresh()
    assert dict((g, n) for g, n in _check(ad)) == {"a": 10, "b": 9}

"""Round-5 advisory fixes (ADVICE r4, low): eager dtype validation on the
Debezium changelog export, and tag-time liveness validation against
expired snapshot data."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.sources import change_events
from data_ingestor_py_spark.sources.debezium import write_debezium_changelog


def _mkroot():
    d = tempfile.mkdtemp(prefix="advr5-")
    os.rmdir(d)
    return d


def _loaded_table(spark, columns, n=400):
    t = TargetTable.create(
        spark, _mkroot(), key_cols=["repo", "path"], columns=columns,
        num_buckets=4,
    )
    ev = change_events(spark, n, n_repos=6, paths_per_repo=6, seed=3)
    batch = ev.select(
        "repo", "path",
        *[F.lit(None).cast(typ).alias(name) for name, typ in columns],
        "_seq", "_op", "_ts",
    )
    t.merge_apply(batch)
    return t


def test_changelog_export_rejects_unsupported_dtype_before_writing(spark):
    """A column dtype outside the envelope spec vocabulary must raise a
    TYPED error NAMING the column BEFORE the changelog hits disk — not a
    bare KeyError after the write."""
    t = _loaded_table(spark, [("value", "double"), ("vec", "array<float>")])
    out = os.path.join(_mkroot(), "changelog")
    with pytest.raises(TypeError, match="vec.*array<float>|array<float>.*vec"):
        write_debezium_changelog(t, 0, t._load()["version"], out)
    assert not os.path.exists(out)  # validated before any write


def test_changelog_export_still_works_for_supported_dtypes(spark):
    t = _loaded_table(spark, [("value", "double")])
    out = os.path.join(_mkroot(), "changelog")
    spec = write_debezium_changelog(t, 0, t._load()["version"], out)
    assert ("value", "double") in spec
    assert spark.read.text(out).count() > 0


def test_tag_snapshot_of_expired_version_fails_at_tag_time(spark):
    """Tagging a snapshot whose data dirs were already removed by
    expire_snapshots must fail eagerly with a typed error, not let
    read_tag die lazily deep in the scan."""
    t = TargetTable.create(
        spark, _mkroot(), key_cols=["repo", "path"],
        columns=[("lang", "string"), ("content", "string")], num_buckets=4,
    )
    ev = change_events(spark, 600, n_repos=6, paths_per_repo=6, seed=5)
    prep = ev.select("repo", "path", "lang", "content", "_seq", "_op", "_ts")
    mx = ev.agg(F.max("_seq")).collect()[0][0]
    for i in range(3):
        t.merge_apply(prep.where((F.col("_seq") * 3 / (mx + 1)).cast("int") == i))
    t.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError, match="expired"):
        t.tag_snapshot("audit-v1", version=1)
    # tagging the live head still works
    assert t.tag_snapshot("head") == t._load()["version"] - 1
    assert t.read_tag("head").count() > 0

"""Debezium unchanged-TOAST semantics: merge_apply(unavailable_sentinel)
carries previous column values through updates that ship the
__debezium_unavailable_value placeholder."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.sources.debezium import UNAVAILABLE_VALUE

S = UNAVAILABLE_VALUE


def _mk(spark, tmp_path, **kw):
    defaults = dict(
        key_cols=["id"],
        columns=[("big", "string"), ("small", "long")],
        num_buckets=4,
    )
    defaults.update(kw)
    return TargetTable.create(spark, str(tmp_path / "t"), **defaults)


def _batch(spark, rows):
    """rows: (id, big, small, seq, op)"""
    return spark.createDataFrame(
        rows, "id string, big string, small long, _seq long, _op string"
    ).withColumn("_ts", F.lit(None).cast("timestamp"))


def _state(t):
    return {
        r["id"]: (r["big"], r["small"], r["_seq"])
        for r in t.read().collect()
    }


def test_sentinel_carries_stored_value_across_batches(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge_apply(_batch(spark, [("a", "BLOB-A", 1, 1, "U"),
                                 ("b", "BLOB-B", 1, 2, "U")]),
                  unavailable_sentinel=S)
    # update images that did NOT re-send the TOASTed column
    t.merge_apply(_batch(spark, [("a", S, 2, 10, "U"),
                                 ("b", "BLOB-B2", 2, 11, "U")]),
                  unavailable_sentinel=S)
    assert _state(t) == {"a": ("BLOB-A", 2, 10), "b": ("BLOB-B2", 2, 11)}


def test_sentinel_chain_within_one_batch(spark, tmp_path):
    """Several updates in one batch, all carrying the placeholder, chain
    back to the last real image — including one sent mid-batch."""
    t = _mk(spark, tmp_path)
    t.merge_apply(
        _batch(spark, [
            ("a", "V1", 1, 1, "U"),
            ("a", S, 2, 2, "U"),
            ("a", "V3", 3, 3, "U"),
            ("a", S, 4, 4, "U"),
            ("a", S, 5, 5, "U"),
        ]),
        unavailable_sentinel=S,
    )
    assert _state(t) == {"a": ("V3", 5, 5)}


def test_tombstone_breaks_the_carry_chain(spark, tmp_path):
    """Delete then re-insert with a placeholder: the pre-delete value
    must NOT resurrect — the sentinel resolves to NULL (unknown)."""
    t = _mk(spark, tmp_path)
    t.merge_apply(_batch(spark, [("a", "SECRET", 1, 1, "U")]),
                  unavailable_sentinel=S)
    t.merge_apply(_batch(spark, [("a", None, None, 2, "D"),
                                 ("a", S, 3, 3, "U")]),
                  unavailable_sentinel=S)
    assert _state(t) == {"a": (None, 3, 3)}


def test_first_image_sentinel_resolves_null(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge_apply(_batch(spark, [("x", S, 7, 1, "U")]),
                  unavailable_sentinel=S)
    assert _state(t) == {"x": (None, 7, 1)}


def test_carry_never_crosses_keys(spark, tmp_path):
    """Key b's placeholder must not pick up key a's value even when a's
    rows sort immediately before b's in the same bucket partition."""
    t = _mk(spark, tmp_path, num_buckets=1)  # force one partition
    t.merge_apply(
        _batch(spark, [("a", "A-VALUE", 1, 1, "U"),
                       ("b", S, 2, 2, "U")]),
        unavailable_sentinel=S,
    )
    assert _state(t)["b"] == (None, 2, 2)


def test_plain_merge_result_unchanged_when_off(spark, tmp_path):
    """Without the option the sentinel is just a string value (exact
    current behavior — the fast path is untouched)."""
    t = _mk(spark, tmp_path)
    t.merge_apply(_batch(spark, [("a", "V1", 1, 1, "U"),
                                 ("a", S, 2, 2, "U")]))
    assert _state(t) == {"a": (S, 2, 2)}


def test_guards(spark, tmp_path):
    t = TargetTable.create(
        spark, str(tmp_path / "m"), key_cols=["id"],
        columns=[("big", "string")], num_buckets=2, merge_mode="mor",
    )
    with pytest.raises(ValueError, match="COW merge"):
        t.merge_apply(_batch(spark, [("a", "x", 1, 1, "U")]).drop("small"),
                      unavailable_sentinel=S)
    t2 = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="salt_buckets"):
        t2.merge_apply(_batch(spark, [("a", "x", 1, 1, "U")]),
                       salt_buckets=4, unavailable_sentinel=S)


def test_mixed_sentinel_and_late_events(spark, tmp_path):
    """Late (lower-seq) real images arriving after the carry was applied
    still lose to the resolved winner; re-applying the same batch is a
    no-op (idempotency holds through the carry path)."""
    t = _mk(spark, tmp_path)
    b1 = _batch(spark, [("a", "V1", 1, 5, "U"), ("a", S, 2, 8, "U")])
    t.merge_apply(b1, unavailable_sentinel=S)
    assert _state(t) == {"a": ("V1", 2, 8)}
    # late real image (seq 3) loses; duplicate of seq 8 re-resolves against
    # the STORED (already-resolved) value
    t.merge_apply(_batch(spark, [("a", "LATE", 9, 3, "U"),
                                 ("a", S, 2, 8, "U")]),
                  unavailable_sentinel=S)
    assert _state(t) == {"a": ("V1", 2, 8)}
    v = t._load()["version"]
    t.merge_apply(b1, unavailable_sentinel=S)
    assert _state(t) == {"a": ("V1", 2, 8)}


def test_streaming_path_resolves_sentinels(spark, tmp_path):
    """The placeholder resolves through the real streaming tail too
    (stream_debezium_replay passthrough)."""
    from data_ingestor_py_spark.sources.debezium import to_debezium_json
    from data_ingestor_py_spark.streaming.stream_debezium import (
        stream_debezium_replay,
    )

    t = _mk(spark, tmp_path)
    rows = spark.createDataFrame(
        [("a", "BLOB", 1, 1, "u"), ("a", S, 2, 2, "u")],
        "id string, big string, small long, lsn long, op string",
    )
    env = rows.select(
        to_debezium_json(
            F.struct("id", "big", "small"), F.col("op"),
            F.col("lsn") * 1000, F.col("lsn"),
        ).alias("value")
    )
    src = str(tmp_path / "env")
    env.coalesce(1).write.mode("overwrite").text(src)
    q = stream_debezium_replay(
        spark, src,
        [("id", "string"), ("big", "string"), ("small", "long")],
        t, checkpoint_dir=str(tmp_path / "cp"),
        unavailable_sentinel=S,
    )
    q.awaitTermination(120)
    assert _state(t) == {"a": ("BLOB", 2, 2)}

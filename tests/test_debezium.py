"""Debezium-envelope CDC in/out (sources/debezium.py): serialize -> parse
identity, tombstone/malformed handling, and the full changelog round-trip
(table A's diff published as envelopes, replayed into table B, equal
state)."""

import os
import tempfile

from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.replay import replay, split_batches
from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.sources import change_events
from data_ingestor_py_spark.sources.debezium import (
    parse_debezium,
    read_debezium_json,
    to_debezium_json,
    write_debezium_changelog,
)

ROW_FIELDS = [("repo", "string"), ("path", "string"), ("value", "double")]


def _mkroot(prefix):
    d = tempfile.mkdtemp(prefix=prefix)
    os.rmdir(d)
    return d


def test_serialize_parse_identity(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = ev.select(
        F.col("user_id").cast("string").alias("repo"),
        F.regexp_extract("props", r'"k":\s*([0-9]+)', 1).cast("long").cast("string").alias("path"),
        F.col("value"),
        F.when(F.col("event_type") == "error", "d").otherwise("u").alias("op"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.col("event_id").alias("lsn"),
    )
    env = src.select(
        to_debezium_json(
            F.struct("repo", "path", "value"), F.col("op"), F.col("ts_ms"), F.col("lsn")
        ).alias("value")
    )
    parsed = parse_debezium(env, ROW_FIELDS)
    got = {r["_seq"]: r for r in parsed.collect()}
    want = {r["lsn"]: r for r in src.collect()}
    assert set(got) == set(want)
    for lsn, w in want.items():
        g = got[lsn]
        assert (g["repo"], g["path"], g["value"]) == (w["repo"], w["path"], w["value"])
        assert g["_op"] == ("D" if w["op"] == "d" else "U")
        assert g["src_op"] == w["op"]


def test_tombstones_and_malformed_dropped(spark):
    lines = [
        ('{"op":"c","after":{"repo":"r1","path":"a","value":1.5},"ts_ms":1000,'
         '"source":{"lsn":1,"table":"t"}}',),
        ("",),  # kafka tombstone (empty value)
        ("not json at all",),
        ('{"unrelated": true}',),  # no op field
        ('{"op":"d","before":{"repo":"r1","path":"a","value":1.5},"ts_ms":2000,'
         '"source":{"lsn":2,"table":"t"}}',),
    ]
    df = spark.createDataFrame(lines, "value string")
    out = parse_debezium(df, ROW_FIELDS).orderBy("_seq").collect()
    assert [(r["_op"], r["_seq"], r["repo"]) for r in out] == [
        ("U", 1, "r1"), ("D", 2, "r1")
    ]


def test_lsn_fallback_to_ts_ms(spark):
    df = spark.createDataFrame(
        [('{"op":"u","after":{"repo":"r","path":"p","value":2.0},"ts_ms":777}',)],
        "value string",
    )
    r = parse_debezium(df, ROW_FIELDS).collect()[0]
    assert r["_seq"] == 777


def test_changelog_roundtrip_between_tables(spark):
    """Engine-to-engine CDC: table A's changelog published as Debezium
    JSON, consumed by read_debezium_json, merged into table B -> B's
    visible state equals A's (modulo _ts, which is ms-truncated on the
    wire)."""
    cols = dict(key_cols=["repo", "path"],
                columns=[("lang", "string"), ("value_str", "string")],
                num_buckets=4)
    a = TargetTable.create(spark, _mkroot("dbz-a-"), **cols)
    ev = change_events(spark, 4000, n_repos=12, paths_per_repo=12, seed=31)
    prep = lambda df, i: df.select(  # noqa: E731
        "repo", "path", "lang", F.col("content").alias("value_str"), "_seq", "_op", "_ts"
    )
    replay(a, split_batches(ev, 3), prepare=prep)

    out = _mkroot("dbz-log-")
    fields = write_debezium_changelog(a, 0, a._load()["version"], out, table_name="a")
    assert ("repo", "string") in fields and ("lang", "string") in fields
    assert all(n not in ("_seq", "_op", "_ts") for n, _ in fields)

    b = TargetTable.create(spark, _mkroot("dbz-b-"), **cols)
    parsed = read_debezium_json(spark, out, fields)
    # engine bookkeeping (_op/_seq/_ts) comes back from the ENVELOPE level
    b.merge_apply(
        parsed.select("repo", "path", "lang", "value_str", "_seq", "_op", "_ts")
    )
    pick = lambda t: sorted(  # noqa: E731
        tuple(r) for r in t.read().select("repo", "path", "lang", "value_str", "_seq").collect()
    )
    assert pick(b) == pick(a)


def test_stream_debezium_replay(spark, tmp_path):
    """Tail envelope JSON-lines into a table: merged state equals a batch
    replay of the same events; malformed lines land in the dead-letter
    dir with their epoch; a checkpointed restart is a no-op."""
    from data_ingestor_py_spark.streaming.stream_debezium import (
        stream_debezium_replay,
    )

    cols = dict(key_cols=["repo", "path"],
                columns=[("value", "double")], num_buckets=4)
    ref = TargetTable.create(spark, _mkroot("sdbz-ref-"), **cols)
    t = TargetTable.create(spark, _mkroot("sdbz-t-"), **cols)

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src_rows = ev.select(
        F.col("user_id").cast("string").alias("repo"),
        F.regexp_extract("props", r'"k":\s*([0-9]+)', 1).cast("long").cast("string").alias("path"),
        F.col("value"),
        F.when(F.col("event_type") == "error", "d").otherwise("u").alias("op"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.col("event_id").alias("lsn"),
    )
    env = src_rows.select(
        to_debezium_json(
            F.struct("repo", "path", "value"), F.col("op"), F.col("ts_ms"), F.col("lsn")
        ).alias("value")
    )
    src = str(tmp_path / "envelopes")
    env.coalesce(2).write.mode("overwrite").text(src)
    # inject malformed lines as an extra file
    spark.createDataFrame(
        [("garbage {{{",), ('{"op":"t","ts_ms":1}',)], "value string"
    ).coalesce(1).write.mode("append").text(src)

    dl = str(tmp_path / "dead")
    q = stream_debezium_replay(
        spark, src, ROW_FIELDS, t, dead_letter_dir=dl,
        checkpoint_dir=str(tmp_path / "cp"), max_files_per_trigger=2,
    )
    q.awaitTermination(120)

    # reference: batch replay of the same normalized events
    ref.merge_apply(
        parse_debezium(spark.read.text(src), ROW_FIELDS).drop("src_op")
    )
    assert t.snapshot_hash() == ref.snapshot_hash()
    # the operator-forensics read: partition discovery supplies `epoch`
    dead = spark.read.json(dl)
    assert set(dead.columns) == {"raw", "epoch"}
    assert sorted(r["raw"] for r in dead.collect()) == [
        "garbage {{{", '{"op":"t","ts_ms":1}'
    ]
    h = t.snapshot_hash()
    q = stream_debezium_replay(
        spark, src, ROW_FIELDS, t, dead_letter_dir=dl,
        checkpoint_dir=str(tmp_path / "cp"),
    )
    q.awaitTermination(120)
    assert t.snapshot_hash() == h  # restart: no new files, no change

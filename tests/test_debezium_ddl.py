"""Debezium schema-change events driving TargetTable.evolve() (VERDICT r4
next-round #3): a mixed stream of row envelopes and schema-change messages
replays with flush-then-switch semantics — rows before the change merge
under the old schema, the table evolves from the wire format's
tableChanges block (never the DDL text), rows after merge under the new
schema."""

import json
import os
import tempfile

import pytest

from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.sources.debezium import (
    parse_schema_changes,
    replay_debezium_with_ddl,
    table_change_to_evolution,
)


def _mkroot():
    d = tempfile.mkdtemp(prefix="dbzddl-")
    os.rmdir(d)
    return d


def _row(op, image, lsn, ts_ms=None):
    e = {"op": op, "ts_ms": ts_ms or (1700000000000 + lsn),
         "source": {"lsn": lsn, "table": "t"}}
    e["before" if op == "d" else "after"] = image
    return json.dumps(e)


def _ddl(lsn, columns, key_cols=("repo", "path"), change_type="ALTER",
         ddl_text="ALTER TABLE t ..."):
    return json.dumps({
        "ts_ms": 1700000000000 + lsn,
        "databaseName": "db",
        "ddl": ddl_text,
        "source": {"lsn": lsn},
        "tableChanges": [{
            "type": change_type,
            "id": '"db"."t"',
            "table": {
                "primaryKeyColumnNames": list(key_cols),
                "columns": [
                    {"name": n, "typeName": t, "position": i + 1,
                     "optional": True}
                    for i, (n, t) in enumerate(columns)
                ],
            },
        }],
    })


BASE_COLS = [("repo", "VARCHAR(64)"), ("path", "VARCHAR(64)"),
             ("value", "DOUBLE")]
WIDE_COLS = BASE_COLS + [("lang", "VARCHAR(32)")]


def _mk_table(spark):
    return TargetTable.create(
        spark, _mkroot(), key_cols=["repo", "path"],
        columns=[("value", "double")], num_buckets=4,
    )


def _state(t):
    return {
        (r["repo"], r["path"]): (r["value"], r.asDict().get("lang"))
        for r in t.read().collect()
    }


def test_mid_stream_add_column(spark):
    t = _mk_table(spark)
    lines = [
        _row("c", {"repo": "r1", "path": "a", "value": 1.0}, 1),
        _row("c", {"repo": "r1", "path": "b", "value": 2.0}, 2),
        _row("u", {"repo": "r1", "path": "a", "value": 3.0}, 3),
        _ddl(3, WIDE_COLS),
        _row("u", {"repo": "r1", "path": "b", "value": 4.0, "lang": "py"}, 4),
        _row("c", {"repo": "r2", "path": "c", "value": 5.0, "lang": "go"}, 5),
        _row("d", {"repo": "r1", "path": "a", "value": 3.0, "lang": None}, 6),
    ]
    df = spark.createDataFrame([(x,) for x in lines], "value string")
    fields = replay_debezium_with_ddl(t, df)
    assert ("lang", "string") in fields
    st = _state(t)
    # (r1,a) deleted; (r1,b) updated post-change with lang; (r2,c) new
    assert st == {("r1", "b"): (4.0, "py"), ("r2", "c"): (5.0, "go")}
    # schema history: v1 (create) then v2 (wire-driven add)
    assert t._load()["current_schema"] == 2
    # re-running the same stream is a no-op (idempotent merge + no-op diff)
    replay_debezium_with_ddl(t, df)
    assert _state(t) == st
    assert t._load()["current_schema"] == 2


def test_pre_change_rows_nullfilled_after_evolve(spark):
    """A key last touched BEFORE the change reads back with the added
    column NULL (metadata-only evolution — no rewrite)."""
    t = _mk_table(spark)
    lines = [
        _row("c", {"repo": "r1", "path": "old", "value": 9.0}, 1),
        _ddl(1, WIDE_COLS),
        _row("c", {"repo": "r1", "path": "new", "value": 1.0, "lang": "rs"}, 2),
    ]
    df = spark.createDataFrame([(x,) for x in lines], "value string")
    replay_debezium_with_ddl(t, df)
    assert _state(t) == {("r1", "old"): (9.0, None), ("r1", "new"): (1.0, "rs")}


def test_retype_and_source_side_drop(spark):
    """A widened wire type becomes a metadata-only retype; a column the
    wire no longer carries is KEPT (new rows stop populating it)."""
    t = TargetTable.create(
        spark, _mkroot(), key_cols=["repo", "path"],
        columns=[("value", "int"), ("note", "string")], num_buckets=4,
    )
    lines = [
        _row("c", {"repo": "r1", "path": "a", "value": 7, "note": "n1"}, 1),
        # wire widens value INT->BIGINT and drops note
        _ddl(1, [("repo", "VARCHAR(64)"), ("path", "VARCHAR(64)"),
                 ("value", "BIGINT")]),
        _row("u", {"repo": "r1", "path": "a", "value": 4000000000}, 2),
        _row("c", {"repo": "r2", "path": "b", "value": 5}, 3),
    ]
    df = spark.createDataFrame([(x,) for x in lines], "value string")
    replay_debezium_with_ddl(t, df)
    rows = {(r["repo"], r["path"]): (r["value"], r["note"])
            for r in t.read().collect()}
    assert rows == {("r1", "a"): (4000000000, None), ("r2", "b"): (5, None)}
    types = {f["name"]: f["type"] for f in t.schema_fields()}
    assert types["value"] == "long" and types["note"] == "string"


def test_key_drop_and_unknown_type_rejected(spark):
    t = _mk_table(spark)
    no_key = parse_schema_changes(spark.createDataFrame(
        [(_ddl(1, [("repo", "VARCHAR(64)"), ("value", "DOUBLE")]),)],
        "value string",
    )).collect()[0]
    with pytest.raises(ValueError, match="primary-key"):
        table_change_to_evolution(t, no_key["columns"])
    weird = parse_schema_changes(spark.createDataFrame(
        [(_ddl(1, BASE_COLS + [("geo", "GEOMETRY")]),)], "value string",
    )).collect()[0]
    with pytest.raises(TypeError, match="GEOMETRY"):
        table_change_to_evolution(t, weird["columns"])


def test_multiple_changes_in_one_stream(spark):
    """Two schema changes -> three epochs, each merged under its own
    schema, both evolutions recorded."""
    t = _mk_table(spark)
    wider = WIDE_COLS + [("stars", "BIGINT")]
    lines = [
        _row("c", {"repo": "r1", "path": "a", "value": 1.0}, 1),
        _ddl(1, WIDE_COLS),
        _row("u", {"repo": "r1", "path": "a", "value": 2.0, "lang": "py"}, 2),
        _ddl(2, wider),
        _row("u", {"repo": "r1", "path": "a",
                   "value": 3.0, "lang": "py", "stars": 42}, 3),
    ]
    df = spark.createDataFrame([(x,) for x in lines], "value string")
    fields = replay_debezium_with_ddl(t, df)
    assert [n for n, _ in fields] == ["repo", "path", "value", "lang", "stars"]
    r = t.read().collect()[0]
    assert (r["value"], r["lang"], r["stars"]) == (3.0, "py", 42)
    assert t._load()["current_schema"] == 3


def test_drop_and_empty_tablechanges_skip_evolution(spark):
    """DROP TABLE / unparseable DDL arrive with a null table block or
    tableChanges: [] — they cut an epoch but apply no evolution (and must
    not crash the replay)."""
    t = _mk_table(spark)
    drop_msg = json.dumps({
        "ts_ms": 1700000000002, "databaseName": "db",
        "ddl": "DROP TABLE t", "source": {"lsn": 2},
        "tableChanges": [{"type": "DROP", "id": '"db"."t"', "table": None}],
    })
    empty_msg = json.dumps({
        "ts_ms": 1700000000003, "databaseName": "db",
        "ddl": "ANALYZE TABLE t", "source": {"lsn": 3},
        "tableChanges": [],
    })
    lines = [
        _row("c", {"repo": "r1", "path": "a", "value": 1.0}, 1),
        drop_msg, empty_msg,
        _row("c", {"repo": "r2", "path": "b", "value": 2.0}, 4),
    ]
    df = spark.createDataFrame([(x,) for x in lines], "value string")
    replay_debezium_with_ddl(t, df)
    assert {(r["repo"], r["path"]) for r in t.read().collect()} == {
        ("r1", "a"), ("r2", "b")
    }
    types = {f["name"]: f["type"] for f in t.schema_fields()}
    assert types == {"value": "double"}  # no spurious evolution


def test_other_tables_ddl_filtered_by_table_id(spark):
    """A shared (per-connector) schema-change stream carries other tables'
    DDL; with table_id set, only this table's changes apply."""
    t = _mk_table(spark)
    other = json.dumps({
        "ts_ms": 1700000000002, "databaseName": "db",
        "ddl": "ALTER TABLE other ADD COLUMN z INT", "source": {"lsn": 2},
        "tableChanges": [{
            "type": "ALTER", "id": '"db"."other"',
            "table": {
                "primaryKeyColumnNames": ["zid"],
                "columns": [{"name": "zid", "typeName": "INT",
                             "position": 1, "optional": False}],
            },
        }],
    })
    lines = [
        _row("c", {"repo": "r1", "path": "a", "value": 1.0}, 1),
        other,  # would raise 'drops primary-key' if applied to t
        _ddl(3, WIDE_COLS),
        _row("u", {"repo": "r1", "path": "a", "value": 2.0,
                   "lang": "py"}, 4),
    ]
    df = spark.createDataFrame([(x,) for x in lines], "value string")
    replay_debezium_with_ddl(t, df, table_id='"db"."t"')
    types = {f["name"]: f["type"] for f in t.schema_fields()}
    assert "lang" in types and "zid" not in types
    rows = {(r["repo"], r["path"]): r["lang"] for r in t.read().collect()}
    assert rows == {("r1", "a"): "py"}


def test_narrowing_retype_is_ignored(spark):
    """An unrelated ALTER re-listing an existing column with a NARROWER
    wire type (INT vs the lake's long) must not narrow the lake column."""
    t = TargetTable.create(
        spark, _mkroot(), key_cols=["repo", "path"],
        columns=[("value", "long")], num_buckets=4,
    )
    chg = parse_schema_changes(spark.createDataFrame(
        [(_ddl(1, [("repo", "VARCHAR(64)"), ("path", "VARCHAR(64)"),
                   ("value", "INT"), ("note", "VARCHAR(10)")]),)],
        "value string",
    )).collect()[0]
    spec = table_change_to_evolution(t, chg["columns"])
    assert spec == {"add": [("note", "string")], "retype": {}}


def test_incompatible_retype_raises(spark):
    t = TargetTable.create(
        spark, _mkroot(), key_cols=["repo", "path"],
        columns=[("value", "long")], num_buckets=4,
    )
    chg = parse_schema_changes(spark.createDataFrame(
        [(_ddl(1, [("repo", "VARCHAR(64)"), ("path", "VARCHAR(64)"),
                   ("value", "VARCHAR(9)")]),)],
        "value string",
    )).collect()[0]
    with pytest.raises(ValueError, match="incompatible retype"):
        table_change_to_evolution(t, chg["columns"])


def test_lsn_strict_rejects_seqless_schema_change(spark):
    t = _mk_table(spark)
    no_lsn = json.dumps({
        "ts_ms": 1700000000002, "databaseName": "db", "ddl": "ALTER ...",
        "tableChanges": [],
    })
    lines = [_row("c", {"repo": "r1", "path": "a", "value": 1.0}, 1), no_lsn]
    df = spark.createDataFrame([(x,) for x in lines], "value string")
    with pytest.raises(ValueError, match="no source.lsn"):
        replay_debezium_with_ddl(t, df, ts_ms_fallback=False)

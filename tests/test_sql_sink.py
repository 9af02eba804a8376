"""Warehouse sink (SqlUpsertSink): integration-tested against TWO real SQL
engines — DuckDB (columnar, parquet-staged like the production JDBC path)
and stdlib sqlite3 (row-store, executemany-staged) — with the same CDC
semantics suite as TargetTable (upsert/delete/late-event/idempotency),
plus reference-parity checks on the generated statements
(db/postgres_query_builder.py:16-45). Running the one builder family
against two unrelated engines pins that the statements are not shaped
around either."""

import sqlite3

import duckdb
import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.sinks import (
    SqlUpsertSink,
    build_create_table,
    build_insert_query,
    build_staging_upsert,
    build_update_query,
)
from data_ingestor_py_spark.sources.generator import change_events
from tests.conftest import make_table
from tests.test_merge import _mk_events, _prep

PAYLOAD = [("commit", "VARCHAR"), ("lang", "VARCHAR"), ("content", "VARCHAR"),
           ("_content_sha256", "VARCHAR")]


def _connect(dialect):
    if dialect == "sqlite":
        # check_same_thread=False: foreachBatch callbacks arrive on the
        # streaming microbatch thread
        return sqlite3.connect(":memory:", check_same_thread=False)
    return duckdb.connect()


@pytest.fixture(params=["duckdb", "sqlite"])
def sink(request):
    con = _connect(request.param)
    yield SqlUpsertSink(con, "repo_files", ["repo", "path"], PAYLOAD,
                        dialect=request.param)
    con.close()


def _visible_set(sink):
    rows = sink.visible().fetchall()
    cols = [d[0] for d in sink.visible().description]
    i_r, i_p, i_c = cols.index("repo"), cols.index("path"), cols.index("content")
    return {(r[i_r], r[i_p]): r[i_c] for r in rows}


def test_upsert_insert_update_delete(spark, sink):
    sink.apply_batch(_prep(_mk_events(spark, [
        ("r1", "a", 1, "I", "v1"), ("r1", "b", 2, "I", "v1"), ("r2", "a", 3, "I", "v1"),
    ])))
    assert len(_visible_set(sink)) == 3
    sink.apply_batch(_prep(_mk_events(spark, [
        ("r1", "a", 4, "U", "v2"), ("r1", "b", 5, "D", None), ("r3", "x", 6, "I", "v1"),
    ])))
    assert _visible_set(sink) == {("r1", "a"): "v2", ("r2", "a"): "v1", ("r3", "x"): "v1"}


def test_late_event_loses_and_tombstone_blocks(spark, sink):
    sink.apply_batch(_prep(_mk_events(spark, [("r1", "a", 10, "U", "new")])))
    sink.apply_batch(_prep(_mk_events(spark, [("r1", "a", 5, "U", "old")])))
    assert _visible_set(sink)[("r1", "a")] == "new"
    sink.apply_batch(_prep(_mk_events(spark, [("r1", "a", 20, "D", None)])))
    sink.apply_batch(_prep(_mk_events(spark, [("r1", "a", 15, "U", "zombie")])))
    assert ("r1", "a") not in _visible_set(sink)
    sink.apply_batch(_prep(_mk_events(spark, [("r1", "a", 21, "I", "alive")])))
    assert _visible_set(sink)[("r1", "a")] == "alive"


def test_reapply_batch_is_idempotent(spark, sink):
    ev = _prep(change_events(spark, 400, n_repos=10, paths_per_repo=5, seed=5))
    sink.apply_batch(ev)
    before = sorted(sink.con.execute("SELECT * FROM repo_files").fetchall())
    sink.apply_batch(ev)  # exactly-once under at-least-once delivery
    assert sorted(sink.con.execute("SELECT * FROM repo_files").fetchall()) == before


def test_sink_state_matches_lake_merge(spark, tmp_path, sink):
    """The warehouse sink and the lake TargetTable must agree on the final
    visible state for the same out-of-order batched replay."""
    from data_ingestor_py_spark.plans.replay import split_batches

    t = make_table(spark, tmp_path / "t")
    ev = change_events(spark, 1500, n_repos=15, paths_per_repo=8, seed=12,
                       delete_rate=0.2)
    for b in split_batches(ev, 3):
        pb = _prep(b)
        t.merge_apply(pb)
        sink.apply_batch(pb)
    lake = {(r["repo"], r["path"]): (r["content"], r["_seq"]) for r in t.read().collect()}
    wh_rel = sink.visible()
    cols = [d[0] for d in wh_rel.description]
    wh = {}
    for row in wh_rel.fetchall():
        d = dict(zip(cols, row))
        wh[(d["repo"], d["path"])] = (d["content"], d["_seq"])
    assert lake == wh


def test_streaming_foreach_batch_adapter(spark, tmp_path, sink):
    events_dir = tmp_path / "ev"
    ev = _prep(change_events(spark, 300, n_repos=5, paths_per_repo=5, seed=3))
    ev.write.parquet(str(events_dir))
    schema = spark.read.parquet(str(events_dir)).schema
    q = (
        spark.readStream.schema(schema).parquet(str(events_dir))
        .writeStream.foreachBatch(sink.foreach_batch())
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .start()
    )
    q.awaitTermination(120)
    n = sink.con.execute("SELECT count(*) FROM repo_files").fetchone()[0]
    assert n == ev.select("repo", "path").distinct().count()


# ------------------------------------------------------- statement parity


def test_insert_query_reference_parity():
    q = build_insert_query("sflw_recs", ["Ast_Name", "Status"], batch=True)
    assert q == 'INSERT INTO sflw_recs ("ast_name", "status") VALUES %s RETURNING id;'
    q1 = build_insert_query("t", ["A", "B"], batch=False)
    assert q1 == 'INSERT INTO t ("a", "b") VALUES (%s, %s) RETURNING id;'


def test_update_query_reference_parity():
    q = build_update_query("t", ["status", "job_id", "user"])
    # job_id excluded from SET, id condition default — postgres_query_builder.py:43-45
    assert q == 'UPDATE t SET "status" = %s, "user" = %s WHERE id = %s'


def test_staging_upsert_shapes():
    pg = build_staging_upsert("t", "s", ["repo"], ["content"], dialect="postgres")
    assert "ON CONFLICT" in pg and 'excluded."_seq" > t."_seq"' in pg
    sq = build_staging_upsert("t", "s", ["repo"], ["content"], dialect="sqlite")
    assert "WHERE true ON CONFLICT" in sq and 'excluded."_seq" > t."_seq"' in sq
    mg = build_staging_upsert("t", "s", ["repo"], ["content"], dialect="merge")
    assert mg.startswith("MERGE INTO t") and "WHEN MATCHED AND" in mg
    assert "WHEN NOT MATCHED THEN INSERT" in mg
    ddl = build_create_table("t", ["repo"], [("content", "VARCHAR")])
    assert "PRIMARY KEY" in ddl and '"repo" VARCHAR NOT NULL' in ddl


def test_empty_batch_is_noop(spark, sink):
    empty = _prep(_mk_events(spark, [("r1", "a", 1, "I", "v1")])).where("1 = 0")
    assert sink.apply_batch(empty) == 0
    assert sink.con.execute("SELECT count(*) FROM repo_files").fetchone()[0] == 0

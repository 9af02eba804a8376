"""Multi-table CDC fan-out (plans/router.py): one Debezium wire stream
carrying two tables routed to two TargetTables with a coordinated
checkpoint; accounting (routed + tombstone + quarantine = every line);
resume semantics; staged one-pass demultiplex; parallel table submission;
and the streaming driver's convergence under epoch re-delivery."""

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.router import DebeziumRouter, TableRoute
from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.sources.debezium import to_debezium_json
from data_ingestor_py_spark.streaming.stream_debezium import stream_debezium_router

A_FIELDS = [("id", "string"), ("amount", "double")]
B_FIELDS = [("id", "string"), ("name", "string"), ("tier", "long")]


def _mkroot(prefix):
    d = tempfile.mkdtemp(prefix=prefix)
    os.rmdir(d)
    return d


def _wire(spark):
    """Deterministic two-table wire batch + the expected per-table final
    states (latest op per key, deletes drop)."""
    a_rows = [
        # (id, amount, op, lsn)
        ("a1", 10.0, "c", 1),
        ("a2", 20.0, "c", 2),
        ("a1", 11.0, "u", 3),
        ("a2", None, "d", 4),
        ("a3", 30.0, "c", 5),
    ]
    b_rows = [
        ("b1", "alice", 1, "c", 1),
        ("b2", "bob", 2, "c", 2),
        ("b1", "alicia", 3, "u", 6),
    ]
    a = spark.createDataFrame(a_rows, "id string, amount double, op string, lsn long")
    b = spark.createDataFrame(
        b_rows, "id string, name string, tier long, op string, lsn long"
    )
    a_env = a.select(
        to_debezium_json(
            F.struct("id", "amount"), F.col("op"), F.col("lsn") * 1000, F.col("lsn"),
            table_name="orders",
        ).alias("value")
    )
    b_env = b.select(
        to_debezium_json(
            F.struct("id", "name", "tier"), F.col("op"), F.col("lsn") * 1000,
            F.col("lsn"), table_name="customers",
        ).alias("value")
    )
    junk = spark.createDataFrame(
        [
            ("",),  # kafka tombstone -> dropped by design
            ("not json",),  # -> quarantine (no table)
            ('{"op":"c","after":{"id":"z"},"ts_ms":1,"source":{"lsn":9,"table":"unknown_tbl"}}',),
            ('{"op":"t","ts_ms":1,"source":{"lsn":10,"table":"orders"}}',),  # truncate -> quarantine
        ],
        "value string",
    )
    wire = a_env.unionByName(b_env).unionByName(junk)
    want_a = {("a1", 11.0), ("a3", 30.0)}
    want_b = {("b1", "alicia", 3), ("b2", "bob", 2)}
    return wire, want_a, want_b


def _router(spark, **kw):
    ra = TargetTable.create(
        spark, _mkroot("rt-a-"), key_cols=["id"],
        columns=[("amount", "double")], num_buckets=4,
    )
    rb = TargetTable.create(
        spark, _mkroot("rt-b-"), key_cols=["id"],
        columns=[("name", "string"), ("tier", "long")], num_buckets=4,
    )
    routes = [
        TableRoute("orders", A_FIELDS, ra),
        TableRoute("customers", B_FIELDS, rb),
    ]
    return DebeziumRouter(spark, _mkroot("rt-cp-"), routes, **kw), ra, rb


def _state_a(ra):
    return {(r["id"], r["amount"]) for r in ra.read().collect()}


def _state_b(rb):
    return {(r["id"], r["name"], r["tier"]) for r in rb.read().collect()}


def test_fan_out_two_tables(spark):
    wire, want_a, want_b = _wire(spark)
    router, ra, rb = _router(spark)
    stats = router.apply_batch(wire, 0)
    assert _state_a(ra) == want_a
    assert _state_b(rb) == want_b
    assert stats["orders"].rows_in == 5
    assert stats["customers"].rows_in == 3
    # coordinated record carries both tables' snapshot versions
    rec = router.cp.read().collect()[0]
    assert json.loads(rec["checksum"]) == {
        "orders": stats["orders"].snapshot_version,
        "customers": stats["customers"].snapshot_version,
    }


def test_quarantine_is_exact_complement(spark):
    wire, _, _ = _wire(spark)
    router, ra, rb = _router(spark)
    routed = router.route(wire)
    q = router.quarantine(wire)
    n_routed = sum(df.count() for df in routed.values())
    n_q = q.count()
    n_tombstones = wire.where(
        F.col("value").isNull() | (F.length(F.trim("value")) == 0)
    ).count()
    assert n_routed + n_q + n_tombstones == wire.count()
    raws = {r["raw"] for r in q.collect()}
    assert "not json" in raws
    assert any("unknown_tbl" in r for r in raws)
    assert any('"op":"t"' in r or '"op": "t"' in r for r in raws)


def test_dead_letter_dir_written_per_batch(spark):
    wire, _, _ = _wire(spark)
    dl = tempfile.mkdtemp(prefix="rt-dl-")
    router, ra, rb = _router(spark, dead_letter_dir=dl)
    router.apply_batch(wire, 0)
    got = spark.read.json(dl)
    assert got.count() == 3
    assert set(got.columns) >= {"raw", "batch"}


def test_resume_skips_committed_batch(spark):
    wire, want_a, _ = _wire(spark)
    router, ra, rb = _router(spark)
    assert router.apply_batch(wire, 0) is not None
    v_a = ra._load()["version"]
    # same batch again: coordinated checkpoint says done -> no-op
    assert router.apply_batch(wire, 0) is None
    assert ra._load()["version"] == v_a
    assert _state_a(ra) == want_a


def test_crash_mid_fanout_reapplies_all_routes(spark):
    """A crash after table A merged but before the coordinated record:
    the batch is unrecorded, the retry re-applies BOTH tables, and the
    idempotent merges converge to the same state."""
    wire, want_a, want_b = _wire(spark)
    router, ra, rb = _router(spark)

    boom = RuntimeError("injected crash before coordinated commit")
    orig = router.cp.commit

    def failing_commit(rec):
        raise boom

    router.cp.commit = failing_commit
    with pytest.raises(RuntimeError, match="injected"):
        router.apply_batch(wire, 0)
    # both tables may already hold the merge; record is absent
    assert router.cp.committed_batches() == set()
    router.cp.commit = orig
    assert router.apply_batch(wire, 0) is not None
    assert _state_a(ra) == want_a
    assert _state_b(rb) == want_b


def test_staged_demultiplex_equals_persist_path(spark):
    wire, want_a, want_b = _wire(spark)
    stage = tempfile.mkdtemp(prefix="rt-stage-")
    dl = tempfile.mkdtemp(prefix="rt-dl2-")
    router, ra, rb = _router(spark, stage_dir=stage, dead_letter_dir=dl)
    router.apply_batch(wire, 0)
    assert _state_a(ra) == want_a
    assert _state_b(rb) == want_b
    # the staged batch is partitioned by table -> per-table dirs exist
    staged = os.listdir(os.path.join(stage, "batch-000000"))
    assert any(d.startswith("_table=orders") for d in staged)
    assert any(d.startswith("_table=customers") for d in staged)
    # quarantine accounting holds on the staged read too
    assert spark.read.json(dl).count() == 3


def test_parallel_table_submission(spark):
    wire, want_a, want_b = _wire(spark)
    router, ra, rb = _router(spark, max_parallel_tables=2)
    router.apply_batch(wire, 0)
    assert _state_a(ra) == want_a
    assert _state_b(rb) == want_b


def test_streaming_router_converges(spark):
    """Streaming driver over a 2-file directory; restart with the same
    checkpoint is a no-op; final states equal the batch fan-out's."""
    wire, want_a, want_b = _wire(spark)
    events_dir = tempfile.mkdtemp(prefix="rt-sdir-")
    # two part files -> with maxFilesPerTrigger=1, two epochs (file order
    # is irrelevant: the merge's max-seq rule absorbs any interleaving)
    wire.coalesce(1).write.mode("overwrite").text(events_dir)
    extra = spark.createDataFrame(
        [
            ('{"op":"u","after":{"id":"a3","amount":31.0},"ts_ms":7000,'
             '"source":{"lsn":7,"table":"orders"}}',),
            ('{"op":"c","after":{"id":"b3","name":"carol","tier":9},"ts_ms":8000,'
             '"source":{"lsn":8,"table":"customers"}}',),
        ],
        "value string",
    )
    extra.coalesce(1).write.mode("append").text(events_dir)
    router, ra, rb = _router(spark)
    cp = tempfile.mkdtemp(prefix="rt-scp-")
    q = stream_debezium_router(
        spark, events_dir, router, checkpoint_dir=cp,
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    assert _state_a(ra) == (want_a - {("a3", 30.0)}) | {("a3", 31.0)}
    assert _state_b(rb) == want_b | {("b3", "carol", 9)}
    v_a, v_b = ra._load()["version"], rb._load()["version"]
    # restart from the same checkpoint: no new epochs, no new versions
    q2 = stream_debezium_router(
        spark, events_dir, router, checkpoint_dir=cp,
        max_files_per_trigger=1,
    )
    q2.awaitTermination()
    assert (ra._load()["version"], rb._load()["version"]) == (v_a, v_b)


def test_expectations_compose_with_routes(spark, tmp_path):
    """Data-quality rules plug into a TableRoute via wrap_prepare: the
    orders route drops negative amounts and quarantines tier-less...
    here, drops amounts > 15 and quarantines nothing — proving the
    router's prepare seam takes the expectations' composed callable
    unchanged (the two features were built to compose, not integrate)."""
    from data_ingestor_py_spark.plans.expectations import (
        Expectation,
        ExpectationSet,
    )

    wire, want_a, want_b = _wire(spark)
    ra = TargetTable.create(
        spark, _mkroot("rt-ea-"), key_cols=["id"],
        columns=[("amount", "double")], num_buckets=4,
    )
    rb = TargetTable.create(
        spark, _mkroot("rt-eb-"), key_cols=["id"],
        columns=[("name", "string"), ("tier", "long")], num_buckets=4,
    )
    rules = ExpectationSet(
        [Expectation("amount_cap", "amount <= 15 or _op = 'D'", "drop")]
    )
    prep = rules.wrap_prepare(lambda df, i: df.drop("src_op"))
    router = DebeziumRouter(
        spark, _mkroot("rt-ecp-"),
        [
            TableRoute("orders", A_FIELDS, ra, prepare=prep),
            TableRoute("customers", B_FIELDS, rb),
        ],
    )
    router.replay([wire])
    # a3 (30.0) dropped by the rule; a1's final update 11.0 passes;
    # the delete for a2 rides through (rule keeps _op='D' rows)
    assert _state_a(ra) == {("a1", 11.0)}
    assert _state_b(rb) == want_b


def _skewed_wire(spark, n, tables, hot_frac=0.9, hot_keys=50):
    """One wire batch where table 0 carries ~hot_frac of all events over
    only ``hot_keys`` keys (events-per-key density — the skew that hurts
    BOTH the stage-dir partition write and the hot table's merge), and
    the other tables share the remainder uniformly."""
    n_cold = len(tables) - 1
    hot_cut = int(hot_frac * 100)
    t = F.when(
        F.pmod(F.col("id"), 100) < hot_cut, F.lit(tables[0])
    ).otherwise(
        F.element_at(
            F.array(*[F.lit(x) for x in tables[1:]]),
            (F.pmod(F.col("id"), n_cold) + 1).cast("int"),
        )
    )
    is_hot = F.pmod(F.col("id"), 100) < hot_cut
    key = F.when(is_hot, F.pmod(F.col("id"), hot_keys)).otherwise(F.col("id"))
    return spark.range(n).select(
        to_debezium_json(
            F.struct(
                F.concat(F.lit("k"), key).alias("k"),
                (F.col("id") * 1.5).alias("v"),
            ),
            F.lit("u"),
            F.col("id") * 1000,
            F.col("id"),
            table_name=t,
        ).alias("value")
    )


def test_skewed_fan_out_state_equals_serial_reference(spark, tmp_path):
    """Hot-table skew (90% of the wire on table 0, hammered onto 50
    keys): the staged demultiplex + parallel merges + hot-route auto
    salting must produce byte-identical per-table state to the plain
    serial, unstaged, unsalted reference — skew mitigation can never be
    a correctness knob. Stats must show the skew landed where expected."""
    fields = [("k", "string"), ("v", "double")]
    tables = ["t0", "t1", "t2", "t3"]
    wire = _skewed_wire(spark, 4000, tables)

    def mk(tag, **route_kw):
        tts = {
            x: TargetTable.create(
                spark, _mkroot(f"rt-skew-{tag}-{x}-"), key_cols=["k"],
                columns=[("v", "double")], num_buckets=4,
            )
            for x in tables
        }
        routes = [
            TableRoute(
                x, fields, tts[x],
                **(route_kw if x == tables[0] else {}),
            )
            for x in tables
        ]
        return tts, routes

    ref_tts, ref_routes = mk("ref")
    DebeziumRouter(spark, _mkroot("rt-skew-refcp-"), ref_routes).replay([wire])

    tts, routes = mk("stg", salt_buckets="auto", stats="full")
    router = DebeziumRouter(
        spark, _mkroot("rt-skew-cp-"), routes,
        stage_dir=str(tmp_path / "stage"), max_parallel_tables=4,
    )
    stats = router.apply_batch(wire, 0)
    assert stats["t0"].rows_in == 3600 and stats["t0"].rows_after_dedup == 50
    for x in tables:
        assert tts[x].snapshot_hash() == ref_tts[x].snapshot_hash()

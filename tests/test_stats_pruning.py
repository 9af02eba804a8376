"""Per-file column statistics + manifest-level scan pruning
(plans/filestats.py + TargetTable.scan_plan/read_where/analyze and the
clustering rewrite). Every pruning claim is pinned two ways: the result
must equal the unpruned read().where() bit-for-bit, AND the scan_plan
counters must show the skip actually happened."""

import datetime

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans import filestats
from data_ingestor_py_spark.plans.target import TargetTable

TS = datetime.datetime(2026, 1, 1)
SCHEMA = (
    "repo string, path string, lang string, value double, "
    "_seq long, _op string, _ts timestamp"
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(n, seq0=0, lang=None, op="U"):
    langs = ["py", "go", "rs", "c"]
    return [
        (
            str(i % 50),
            str(i),
            lang or langs[i % 4],
            float(i),
            seq0 + i,
            op,
            TS,
        )
        for i in range(n)
    ]


@pytest.fixture()
def table(spark, tmp_path):
    t = TargetTable.create(
        spark,
        str(tmp_path / "t"),
        key_cols=["repo", "path"],
        columns=[("lang", "string"), ("value", "double")],
        num_buckets=8,
        stats_cols=["lang", "value", "_seq"],
    )
    t.merge_apply(_mk(spark, _rows(2000)))
    return t


def _same(df_a, df_b):
    a = sorted(map(tuple, df_a.collect()))
    b = sorted(map(tuple, df_b.collect()))
    assert a == b
    return len(a)


def test_read_where_matches_full_filter(spark, table):
    preds = [
        [("lang", "=", "py")],
        [("value", ">=", 1500.0)],
        [("value", "<", 10.0), ("lang", "in", ["py", "go"])],
        [("_seq", ">", 1990)],
        [("repo", "=", "7")],  # key col, no stats tracked? repo untracked
    ]
    exprs = [
        F.col("lang") == "py",
        F.col("value") >= 1500.0,
        (F.col("value") < 10.0) & F.col("lang").isin("py", "go"),
        F.col("_seq") > 1990,
        F.col("repo") == "7",
    ]
    for p, e in zip(preds, exprs):
        n = _same(table.read_where(p), table.read().where(e))
        assert n > 0


def test_impossible_predicate_reads_zero_files(spark, table):
    plan = table.scan_plan([("lang", "=", "zz")])
    assert plan["files_total"] > 0 and plan["files_read"] == 0
    assert plan["buckets_read"] == 0
    assert table.read_where([("lang", "=", "zz")]).count() == 0
    plan = table.scan_plan([("value", ">", 1e9)])
    assert plan["files_read"] == 0


def test_every_write_path_harvests(spark, table):
    # merge already harvested (fixture); now purge + rewrite paths. Stats
    # live in per-snap-dir shards, never in the root manifest.
    m = table._load()
    assert "stats" not in m
    table.merge_apply(_mk(spark, _rows(50, seq0=10_000, op="D")))
    table.purge_tombstones(older_than_seq=20_000)
    table.rewrite_data_files(stale_after=0)
    m = table._load()
    assert "stats" not in m
    for e in m["buckets"].values():
        top, _, leaf = e["path"].partition("/")
        sh = table._load_stats_shard(top)
        assert sh is not None  # every write path published its shard
        fs = sh["dirs"].get(leaf)
        assert fs
        for f in fs:
            assert "f1" in f["st"] and "_seq" in f["st"]


def test_clustering_rewrite_tightens_file_pruning(spark, table):
    before = table.scan_plan([("value", ">=", 1900.0)])
    assert before["files_read"] == before["files_total"]  # 1 wide file/bucket
    table.rewrite_data_files(sort_by=["value"], max_rows_per_file=100)
    after = table.scan_plan([("value", ">=", 1900.0)])
    assert after["files_total"] > before["files_total"]
    assert after["files_read"] < after["files_total"] // 2
    _same(
        table.read_where([("value", ">=", 1900.0)]),
        table.read().where(F.col("value") >= 1900.0),
    )


def test_analyze_backfills_untracked_table(spark, tmp_path):
    t = TargetTable.create(
        spark,
        str(tmp_path / "bf"),
        key_cols=["repo", "path"],
        columns=[("lang", "string"), ("value", "double")],
        num_buckets=4,
    )
    t.merge_apply(_mk(spark, _rows(400)))
    plan = t.scan_plan([("lang", "=", "zz")])
    assert plan["buckets_read"] == plan["buckets_total"] > 0  # no stats yet
    t.set_stats_cols(["lang", "value"])
    assert t.analyze() is not None
    assert t.analyze() is None  # idempotent: nothing missing on second pass
    assert t.scan_plan([("lang", "=", "zz")])["files_read"] == 0
    _same(
        t.read_where([("lang", "=", "go")]),
        t.read().where(F.col("lang") == "go"),
    )


def test_mor_layered_buckets_prune_only_whole_buckets(spark, tmp_path):
    t = TargetTable.create(
        spark,
        str(tmp_path / "mor"),
        key_cols=["repo", "path"],
        columns=[("lang", "string"), ("value", "double")],
        num_buckets=4,
        merge_mode="mor",
        mor_max_deltas=0,
        stats_cols=["lang", "value"],
    )
    t.merge_apply(_mk(spark, _rows(800)))
    t.merge_apply(_mk(spark, _rows(100, seq0=10_000, lang="java")))
    m = t._load()
    assert any(e.get("deltas") for e in m["buckets"].values())
    # value range present only in base layer still must NOT prune the
    # delta away (winner resolution needs every layer)
    plan = t.scan_plan([("lang", "=", "java")])
    assert plan["buckets_read"] == plan["buckets_total"]
    _same(
        t.read_where([("lang", "=", "java")]),
        t.read().where(F.col("lang") == "java"),
    )
    # a range no layer can satisfy skips the whole bucket
    plan = t.scan_plan([("value", ">", 1e9)])
    assert plan["buckets_read"] == 0 and plan["files_read"] == 0
    # latest-layer-only values are found (the java rows override bases)
    n = t.read_where([("lang", "=", "java"), ("value", "<", 50.0)]).count()
    assert n == t.read().where((F.col("lang") == "java") & (F.col("value") < 50.0)).count()
    # compaction folds to single-layer; file pruning resumes and state holds
    t.compact_bucket_deltas()
    _same(
        t.read_where([("lang", "=", "java")]),
        t.read().where(F.col("lang") == "java"),
    )


def test_schema_evolution_keeps_stats_by_field_id(spark, table):
    # rename lang -> language: old files' stats (keyed f1) must still prune
    table.evolve(rename={"lang": "language"})
    plan = table.scan_plan([("language", "=", "zz")])
    assert plan["files_read"] == 0
    _same(
        table.read_where([("language", "=", "py")]),
        table.read().where(F.col("language") == "py"),
    )
    # widening retype keeps kind 'num': value -> still prunable, correct
    plan = table.scan_plan([("value", ">", 1e9)])
    assert plan["files_read"] == 0


def test_all_null_column_is_definitive_skip(spark, tmp_path):
    t = TargetTable.create(
        spark,
        str(tmp_path / "nulls"),
        key_cols=["repo", "path"],
        columns=[("lang", "string"), ("value", "double")],
        num_buckets=2,
        stats_cols=["lang", "value"],
    )
    rows = [(str(i), str(i), None, None, i, "U", TS) for i in range(100)]
    t.merge_apply(_mk(spark, rows))
    plan = t.scan_plan([("lang", "=", "py")])
    assert plan["files_read"] == 0  # SQL comparison with NULL never matches
    assert t.read_where([("lang", "=", "py")]).count() == 0
    assert t.read().count() == 100


def test_predicate_validation():
    with pytest.raises(ValueError):
        filestats.validate_preds([("c", "!=", 1)])
    with pytest.raises(ValueError):
        filestats.validate_preds([("c", "=", None)])
    with pytest.raises(ValueError):
        filestats.validate_preds([("c", "in", [1, None])])


def test_may_match_bounds_semantics():
    st = {"k": [10, 20, 0]}
    assert filestats.may_match(st, "k", "=", 15)
    assert not filestats.may_match(st, "k", "=", 21)
    assert not filestats.may_match(st, "k", ">", 20)
    assert filestats.may_match(st, "k", ">=", 20)
    assert not filestats.may_match(st, "k", "<", 10)
    assert filestats.may_match(st, "k", "<=", 10)
    assert filestats.may_match(st, "k", "in", [1, 12])
    assert not filestats.may_match(st, "k", "in", [1, 2])
    assert filestats.may_match(st, "missing", "=", 1)  # no stats -> read
    assert not filestats.may_match({"k": [None, None, 5]}, "k", "=", 1)
    # cross-type comparison degrades to unprunable, never throws
    assert filestats.may_match({"k": ["a", "z", 0]}, "k", ">", 5)

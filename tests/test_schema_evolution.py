"""Schema-evolution suites (BASELINE.json: test_schema_evolution).

Generalizes the reference's flush-then-switch mapping swap on the
``__NEW_FILE__`` marker (msgbroker/sql_consumer.py:61-71) into versioned,
metadata-only add/rename/retype (Iceberg UpdateSchema semantics): old data
files are never rewritten; the read path aligns them by field id.
"""

import pytest
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.replay import replay, split_batches
from data_ingestor_py_spark.sources.generator import change_events
from data_ingestor_py_spark.specs import ColumnMapping, MappingSpec
from tests.conftest import make_table


def _mk(spark, rows):
    df = spark.createDataFrame(
        [(r, p, f"c{s}", "py", c, s, o) for (r, p, s, o, c) in rows],
        "repo string, path string, commit string, lang string, content string, _seq long, _op string",
    )
    return df.withColumn("_ts", F.timestamp_seconds(F.col("_seq"))).withColumn(
        "_content_sha256", F.sha2(F.col("content"), 256)
    )


BASE_COLS = ["repo", "path", "commit", "lang", "content", "_content_sha256", "_seq", "_op", "_ts"]


def test_add_column_backfills_null(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    t.merge_apply(_mk(spark, [("r", "a", 1, "I", "v1")]).select(*BASE_COLS))
    t.evolve(add=[("stars", "long")])
    t.merge_apply(
        _mk(spark, [("r", "b", 2, "I", "v1")])
        .withColumn("stars", F.lit(7))
        .select(*BASE_COLS[:6], "stars", *BASE_COLS[6:])
    )
    rows = {r["path"]: r["stars"] for r in t.read().collect()}
    assert rows == {"a": None, "b": 7}


def test_rename_column_no_rewrite(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    t.merge_apply(_mk(spark, [("r", "a", 1, "I", "v1")]).select(*BASE_COLS))
    files_before = set(str(p) for p in (tmp_path / "t").rglob("*.parquet"))
    t.evolve(rename={"lang": "language"})
    assert "language" in t.read().columns and "lang" not in t.read().columns
    assert t.read().collect()[0]["language"] == "py"  # old file, new name
    files_after = set(str(p) for p in (tmp_path / "t").rglob("*.parquet"))
    assert files_before == files_after  # metadata-only


def test_retype_column_casts_on_read(spark, tmp_path):
    t = make_table(
        spark, tmp_path / "t",
        columns=[("commit", "string"), ("lang", "string"), ("content", "string"), ("n", "int")],
    )
    b = _mk(spark, [("r", "a", 1, "I", "v1")]).withColumn("n", F.lit(5).cast("int"))
    t.merge_apply(b.select("repo", "path", "commit", "lang", "content", "n", "_seq", "_op", "_ts"))
    t.evolve(retype={"n": "long"})
    [(dtype,)] = [(f.dataType.simpleString(),) for f in t.read().schema.fields if f.name == "n"]
    assert dtype == "bigint"
    assert t.read().collect()[0]["n"] == 5


def test_mid_stream_evolution_during_replay(spark, tmp_path):
    """The reference's per-file schema switch as a replay hook: evolve at
    batch 2, batches after carry the new column."""
    ev = change_events(spark, 1000, n_repos=10, paths_per_repo=10, seed=3)
    t = make_table(spark, tmp_path / "t")
    batches = split_batches(ev, 4, assign=F.floor(F.col("event_id") / 250))

    def prep(df, i):
        base = df.withColumn("_content_sha256", F.sha2(F.col("content"), 256)).select(*BASE_COLS)
        if i >= 2:
            base = base.withColumn("rev", F.col("_seq") * 10)
        return base

    def on_start(i, tbl):
        if i == 2 and all(f["name"] != "rev" for f in tbl.schema_fields()):
            tbl.evolve(add=[("rev", "long")])

    replay(t, batches, prepare=prep, on_batch_start=on_start)
    out = t.read()
    # keys whose last event was in the first half have NULL rev
    assert out.where("_seq < 500 AND rev IS NOT NULL").count() == 0
    assert out.where("_seq >= 500 AND (rev IS NULL OR rev <> _seq * 10)").count() == 0


def test_mapping_spec_versioning(spark):
    """Versioned specs: same source, two spec versions -> renamed + retyped
    projection without touching the source (control-file.json mapping dicts
    as MappingSpec objects)."""
    df = spark.createDataFrame([("a", "1"), ("b", "2")], "user string, dt string")
    v1 = MappingSpec(1, (ColumnMapping("user", "USER"), ColumnMapping("dt", "DT_CREATED")))
    v2 = MappingSpec(
        2,
        (
            ColumnMapping("user", "USER"),
            ColumnMapping("dt", "DT_CREATED", "long"),
            ColumnMapping("missing", "LEGACY", "string"),
        ),
        constants={"SRC": "mist"},
    )
    r1 = v1.apply(df)
    assert r1.columns == ["USER", "DT_CREATED"]
    r2 = v2.apply(df)
    assert r2.columns == ["USER", "DT_CREATED", "LEGACY", "SRC"]
    row = r2.orderBy("USER").first()
    assert row["DT_CREATED"] == 1 and row["LEGACY"] is None and row["SRC"] == "mist"


def test_evolve_rejects_nothing_silently(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    v = t.evolve(add=[("x", "string")])
    assert v == 2
    v = t.evolve(rename={"x": "y"}, retype={"y": "string"})
    assert v == 3
    names = [f["name"] for f in t.schema_fields()]
    assert "y" in names and "x" not in names


@pytest.mark.parametrize("with_table_name", [True, False])
def test_excel_positional_layout(spark, with_table_name):
    """S3/S4: positional-header interpretation (row 3 names, A4 table name,
    data rows 5+ / 4+), xlsx decode stubbed (no openpyxl in container)."""
    import pandas as pd

    from data_ingestor_py_spark.sources.excel import excel_to_dataframe

    rows = [
        ["User Name", "Created", "Status"],      # row 1: human titles
        ["required", "required", "optional"],    # row 2: flags
        ["user", "dt_created", "status"],        # row 3: column names
    ]
    if with_table_name:
        rows.append(["sflw_recs", None, None])   # row 4: A4 = table name
    rows += [["alice", 1, "Pending"], ["bob", 2, "Approved"]]
    raw = pd.DataFrame(rows)
    df, table_name = excel_to_dataframe(spark, raw, with_table_name=with_table_name)
    assert df.columns == ["user", "dt_created", "status"]
    assert df.count() == 2
    assert table_name == ("sflw_recs" if with_table_name else None)
    assert {r["user"] for r in df.collect()} == {"alice", "bob"}

def test_three_schema_versions_coexist(spark, tmp_path):
    """Buckets written under three schema versions align on read: rename
    chains resolve by field id, retypes cast, adds NULL-fill."""
    t = make_table(spark, tmp_path / "t")
    t.merge_apply(_mk(spark, [("r1", "v1row", 1, "I", "a")]).select(*BASE_COLS))
    t.evolve(add=[("stars", "int")])
    t.merge_apply(
        _mk(spark, [("r2", "v2row", 2, "I", "b")])
        .withColumn("stars", F.lit(3).cast("int"))
        .select(*BASE_COLS[:6], "stars", *BASE_COLS[6:])
    )
    t.evolve(rename={"lang": "language", "stars": "rating"}, retype={"stars": "long"})
    t.evolve(retype={"rating": "long"})
    t.merge_apply(
        _mk(spark, [("r3", "v3row", 3, "I", "c")])
        .withColumnRenamed("lang", "language")
        .withColumn("rating", F.lit(9).cast("long"))
        .select("repo", "path", "commit", "language", "content", "_content_sha256",
                "rating", "_seq", "_op", "_ts")
    )
    out = {r["repo"]: (r["language"], r["rating"]) for r in t.read().collect()}
    assert out == {"r1": ("py", None), "r2": ("py", 3), "r3": ("py", 9)}
    [(dtype,)] = [(f.dataType.simpleString(),) for f in t.read().schema.fields if f.name == "rating"]
    assert dtype == "bigint"


def test_drop_column_metadata_only(spark, tmp_path):
    """DROP removes the field from reads without rewriting files; merges
    after the drop take batches WITHOUT the column, and batches still
    carrying it (stale writers) are harmlessly projected."""
    t = make_table(spark, tmp_path / "t")
    t.merge_apply(_mk(spark, [("r", "a", 1, "I", "v1")]).select(*BASE_COLS))

    def _data_files():
        return sorted(
            k for d in t.io.list_dirs(t.root) if d.startswith("snap-")
            for k in t.io.list(str(tmp_path / "t" / d)) if k.endswith(".parquet")
        )

    before = _data_files()
    t.evolve(drop=["lang"])
    assert _data_files() == before  # metadata-only: zero files rewritten
    assert "lang" not in t.read().columns
    # new-schema batch (no lang column)
    slim = [c for c in BASE_COLS if c != "lang"]
    t.merge_apply(_mk(spark, [("r", "b", 2, "I", "v2")]).select(*slim))
    # stale writer still sending lang: extra column is ignored by the
    # current-schema projection
    t.merge_apply(_mk(spark, [("r", "c", 3, "I", "v3")]).select(*BASE_COLS))
    got = {r["path"]: r["content"] for r in t.read().collect()}
    assert got == {"a": "v1", "b": "v2", "c": "v3"}


def test_drop_then_readd_never_resurrects(spark, tmp_path):
    """The field-id contract: re-adding a dropped column's NAME allocates
    a FRESH id, so rows written before the re-add read NULL — never the
    dropped column's old bytes (Iceberg's resurrection trap)."""
    t = make_table(spark, tmp_path / "t")
    t.merge_apply(_mk(spark, [("r", "a", 1, "I", "v1")]).select(*BASE_COLS))
    m0 = t._load()
    old_id = next(f["id"] for f in t.schema_fields(m0) if f["name"] == "lang")
    t.evolve(drop=["lang"])
    t.evolve(add=[("lang", "string")])
    m1 = t._load()
    new_id = next(f["id"] for f in t.schema_fields(m1) if f["name"] == "lang")
    assert new_id != old_id, "dropped field id was reused"
    rows = {r["path"]: r["lang"] for r in t.read().collect()}
    assert rows == {"a": None}  # old file's 'py' bytes stay dead
    # and the reborn column works for new writes
    slim = [c for c in BASE_COLS if c != "lang"]
    t.merge_apply(
        _mk(spark, [("r", "b", 2, "I", "v2")])
        .withColumn("lang2", F.lit("go"))
        .select(*slim[:5], F.col("lang2").alias("lang"), *slim[5:])
    )
    rows = {r["path"]: r["lang"] for r in t.read().collect()}
    assert rows == {"a": None, "b": "go"}


def test_drop_guards(spark, tmp_path):
    t = make_table(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="structural"):
        t.evolve(drop=["repo"])
    with pytest.raises(ValueError, match="structural"):
        t.evolve(drop=["_seq"])
    with pytest.raises(ValueError, match="unknown column"):
        t.evolve(drop=["nope"])
    with pytest.raises(ValueError, match="no table"):
        t.evolve(drop=["commit", "lang", "content", "_content_sha256"])


def test_drop_strips_stats_key_and_pruning_survives(spark, tmp_path):
    t = make_table(spark, tmp_path / "t", stats_cols=["lang", "_seq"])
    t.merge_apply(_mk(spark, [("r", "a", 1, "I", "v1"),
                              ("r", "b", 2, "I", "v2")]).select(*BASE_COLS))
    keys_before = set(t._load()["stats_keys"])
    t.evolve(drop=["lang"])
    keys_after = set(t._load()["stats_keys"])
    assert keys_after < keys_before and "_seq" in keys_after
    # merges + pruned reads on the surviving key still work
    slim = [c for c in BASE_COLS if c != "lang"]
    t.merge_apply(_mk(spark, [("r", "c", 9, "I", "v3")]).select(*slim))
    got = sorted(r["path"] for r in t.read_where([("_seq", ">=", 2)]).collect())
    assert got == ["b", "c"]

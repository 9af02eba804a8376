"""File-source scans + flatten/explode semantics (S1/S2/S5-S8, W4).

Fixtures are synthesized in the reference's *shapes* (nested record with a
list-of-dicts ``fnumbers`` field, container key, repeated XML tags) — the
golden behaviour being replicated is one output row per list element with
scalar fields copied (reference golden CSV, output_files/output.csv;
flatten at msgbroker/file_producer.py:180-229)."""

import json

from pyspark.sql import functions as F

from data_ingestor_py_spark.operators.flatten import explode_tokens, flatten
from data_ingestor_py_spark.sources.readers import (
    detect_json_record_key,
    detect_xml_row_tag,
    list_source_files,
    read_json_records,
    read_xml_records,
    write_pipe_csv,
)

RECORDS = [
    {
        "user": "alice", "dt_created": 1700000001, "status": "Pending",
        "meta": {"location": "lab-1", "ast_name": None},
        "fnumbers": [
            {"fnumber": "F001", "scan_time": "2024-01-01T00:00:00"},
            {"fnumber": "F002", "scan_time": "2024-01-02T00:00:00"},
        ],
    },
    {
        "user": "bob", "dt_created": 1700000002, "status": "Approved",
        "meta": {"location": "lab-2", "ast_name": "x9"},
        "fnumbers": [{"fnumber": "F003", "scan_time": "2024-01-03T00:00:00"}],
    },
    {
        "user": "carol", "dt_created": 1700000003, "status": "Rejected",
        "meta": {"location": "lab-3", "ast_name": None},
        "fnumbers": [],
    },
]


def _write_fixtures(tmp_path):
    jd = tmp_path / "in"
    jd.mkdir(exist_ok=True)
    (jd / "data.json").write_text(json.dumps({"version": 1, "Records": RECORDS}))
    xml_recs = []
    for r in RECORDS:
        fns = "".join(
            f"<fnumbers><fnumber>{f['fnumber']}</fnumber><scan_time>{f['scan_time']}</scan_time></fnumbers>"
            for f in r["fnumbers"]
        )
        xml_recs.append(
            f"<Record><user>{r['user']}</user><dt_created>{r['dt_created']}</dt_created>"
            f"<status>{r['status']}</status>{fns}</Record>"
        )
    (jd / "data.xml").write_text(f"<Root><Header>h</Header>{''.join(xml_recs)}</Root>")
    (jd / "ignore.txt").write_text("nope")
    return str(jd)


def test_directory_enumeration_and_extension_filter(tmp_path, spark):
    d = _write_fixtures(tmp_path)
    files = list_source_files(d)
    assert [f.split("/")[-1] for f in files] == ["data.json", "data.xml"]
    assert list_source_files(d, (".json",))[0].endswith("data.json")
    assert list_source_files(d + "/ignore.txt") == []


def test_json_container_detection_and_scan(tmp_path, spark):
    d = _write_fixtures(tmp_path)
    assert detect_json_record_key(d + "/data.json") == "Records"
    df = read_json_records(spark, d + "/data.json")
    assert df.count() == 3
    assert {r["user"] for r in df.collect()} == {"alice", "bob", "carol"}


def test_xml_row_tag_detection_and_scan(tmp_path, spark):
    d = _write_fixtures(tmp_path)
    assert detect_xml_row_tag(d + "/data.xml") == "Record"
    df = read_xml_records(spark, d + "/data.xml")
    assert df.count() == 3
    assert set(df.columns) >= {"user", "dt_created", "status"}


def test_flatten_explode_matches_reference_golden_semantics(tmp_path, spark):
    """One output row per fnumbers element, scalars copied; empty list keeps
    the base row with NULLs (dict.get -> None)."""
    d = _write_fixtures(tmp_path)
    df = flatten(read_json_records(spark, d + "/data.json"))
    assert "meta_location" in df.columns and "fnumbers_fnumber" in df.columns
    rows = {(r["user"], r["fnumbers_fnumber"]) for r in df.collect()}
    assert rows == {
        ("alice", "F001"), ("alice", "F002"), ("bob", "F003"), ("carol", None),
    }
    alice = [r for r in df.collect() if r["user"] == "alice"]
    assert all(r["meta_location"] == "lab-1" for r in alice)  # scalars copied


def test_flatten_xml_repeated_elements(tmp_path, spark):
    d = _write_fixtures(tmp_path)
    df = flatten(read_xml_records(spark, d + "/data.xml"))
    got = {(r["user"], r["fnumbers_fnumber"]) for r in df.collect()}
    assert ("alice", "F001") in got and ("alice", "F002") in got


def test_pipe_csv_roundtrip(tmp_path, spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "user string, n int")
    out = str(tmp_path / "csv")
    write_pipe_csv(df, out)
    back = spark.read.option("sep", "|").option("header", "true").csv(out)
    assert {(r["user"], r["n"]) for r in back.collect()} == {("a", "1"), ("b", "2")}


def test_explode_tokens(spark):
    df = spark.createDataFrame([("a b  c",), ("",)], "text string")
    toks = explode_tokens(df, "text")
    assert [r["token"] for r in toks.orderBy("token").collect()] == ["a", "b", "c"]
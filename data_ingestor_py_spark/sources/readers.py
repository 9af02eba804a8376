"""File-source scans (S1/S2/S5/S6/S7/F2).

The reference parses files imperatively on one thread: whole-file
``json.load`` + first-list-valued-key detection
(msgbroker/file_producer.py:231-259, :144-158), ElementTree walk with
most-common-child-tag detection (:261-307), and a glob over the input dir
(:29-45). Here every scan is a distributed Spark reader: multiLine JSON,
Spark 4 native XML with ``rowTag``, path-glob filters instead of in-stream
extension predicates, and the auto-detection heuristics run on a driver-side
*sample* of one file only — the full read is always the parallel reader.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import xml.etree.ElementTree as ET
from collections import Counter

from pyspark.sql import DataFrame, SparkSession


def list_source_files(input_dir: str, extensions: tuple[str, ...] = (".json", ".xml")) -> list[str]:
    """Directory enumeration + extension predicate (S5/F2). Returns sorted
    paths; a single file path passes through if it matches."""
    if os.path.isfile(input_dir):
        return [input_dir] if input_dir.lower().endswith(extensions) else []
    out: list[str] = []
    for ext in extensions:
        out.extend(_glob.glob(os.path.join(input_dir, f"*{ext}")))
    return sorted(out)


def detect_json_record_key(sample_path: str) -> str | None:
    """S6: the record-array container is the first list-valued top-level key
    (reference heuristic, file_producer.py:144-158) — driver-side, one file."""
    with open(sample_path) as f:
        data = json.load(f)
    if isinstance(data, list):
        return None  # top-level array: records are the document itself
    for k, v in data.items():
        if isinstance(v, list):
            return k
    return None


def detect_xml_row_tag(sample_path: str) -> str | None:
    """S7: the record tag is the most common child of the root
    (file_producer.py:160-178); ties broken by first appearance."""
    root = ET.parse(sample_path).getroot()
    tags = [child.tag for child in root]
    if not tags:
        return None
    counts = Counter(tags)
    best = max(counts.items(), key=lambda kv: (kv[1], -tags.index(kv[0])))
    return best[0]


def read_json_records(
    spark: SparkSession,
    path: str,
    record_key: str | None = "auto",
    schema: str | None = None,
) -> DataFrame:
    """S1: JSON scan. Handles both top-level arrays and the reference's
    ``{"Records": [...]}`` container shape; nested structs/arrays survive
    for the flatten stage (operators/flatten.py)."""
    from pyspark.sql import functions as F

    files = list_source_files(path, (".json",))
    if record_key == "auto":
        record_key = detect_json_record_key(files[0]) if files else None
    reader = spark.read.option("multiLine", "true")
    if schema:
        reader = reader.schema(schema)
    df = reader.json(path if os.path.isdir(path) else files)
    if record_key and record_key in df.columns:
        df = df.select(F.explode(F.col(record_key)).alias("_rec")).select("_rec.*")
    return df


def read_xml_records(
    spark: SparkSession,
    path: str,
    row_tag: str | None = "auto",
    schema: str | None = None,
) -> DataFrame:
    """S2: XML scan via Spark 4's native XML source (no external jar)."""
    files = list_source_files(path, (".xml",))
    if row_tag == "auto":
        row_tag = detect_xml_row_tag(files[0]) if files else "Record"
    reader = spark.read.format("xml").option("rowTag", row_tag or "Record")
    if schema:
        reader = reader.schema(schema)
    return reader.load(path if os.path.isdir(path) else ",".join(files))


def write_pipe_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """W4: pipe-delimited CSV sink (reference golden outputs
    output_files/output.csv via helpers.py:20-46 and main-dms.py:54-68)."""
    df.write.option("sep", "|").option("header", str(header).lower()).mode(
        "overwrite"
    ).csv(path)

"""Pure-stdlib xlsx decode (S3/S4) — parity with the reference's actual
spreadsheets and golden output.

The reference reads dms-example.xlsx with ``pd.read_excel(header=None)``,
takes row 3 as headers and rows 4+ as data (main-dms.py:28-51), and the
committed golden is output_files/output-dms.csv. These tests run OUR
zipfile+ElementTree reader over the SAME reference files and require exact
value parity with that golden — no openpyxl anywhere.
"""

import pandas as pd
import pytest

from data_ingestor_py_spark.sources.excel import (
    excel_to_dataframe,
    parse_positional_layout,
    read_excel_raw,
    write_xlsx,
)

DMS_XLSX = "/root/reference/interfaces/dms/input-files/dms-example.xlsx"
MOCK_XLSX = "/root/reference/interfaces/dms/input-files/mock-A-example.xlsx"
GOLDEN = "/root/reference/output_files/output-dms.csv"


def test_dms_example_matches_reference_golden():
    raw = read_excel_raw(DMS_XLSX)
    headers = raw.iloc[2].tolist()  # header_row=3, 1-based (main-dms.py:40)
    data = raw.iloc[3:].reset_index(drop=True)
    data.columns = headers
    golden = pd.read_csv(GOLDEN, dtype=str)
    assert list(golden.columns) == [str(h) for h in headers]
    assert data.shape == golden.shape
    assert (data.astype(str).values == golden.values).all()


def test_mock_a_positional_layout_with_table_name():
    sheet = parse_positional_layout(read_excel_raw(MOCK_XLSX))
    # excel_producer.py:13-18 layout: A4 is the target table name
    assert sheet.table_name == "SFLW_RECS"
    assert sheet.columns[:4] == ["ast_name", "dt_submitted", "status", "json_hash"]
    assert len(sheet.data) == 16
    first = sheet.data.iloc[0]
    assert first["ast_name"] == "AssetD" and first["dt_submitted"] == 1698499500


def test_excel_to_spark_dataframe(spark):
    df, tname = excel_to_dataframe(spark, MOCK_XLSX, with_table_name=True)
    assert tname == "SFLW_RECS"
    assert df.count() == 16
    assert "ast_name" in df.columns and "dt_submitted" in df.columns
    assert df.where("ast_name = 'AssetD'").count() > 0


def test_write_read_roundtrip(tmp_path):
    p = str(tmp_path / "rt.xlsx")
    rows = [
        ["Title row", None, None],
        ["REQUIRED", "OPTIONAL", "OPTIONAL"],
        ["id", "name", "score"],
        [1, "alice & bob", 2.5],
        [2, "x|y<z>", None],
        [3, "", 7],
    ]
    write_xlsx(p, rows)
    back = read_excel_raw(p)
    assert back.iloc[3].tolist() == [1, "alice & bob", 2.5]
    assert back.iloc[4].tolist() == [2, "x|y<z>", None]
    # empty string cell is dropped like a blank (values-only read)
    assert back.iloc[5, 0] == 3 and back.iloc[5, 2] == 7


def test_reader_handles_shared_and_inline_strings(tmp_path):
    # our writer emits inline strings; the reference files use shared
    # strings — both paths must parse (dms read above covers shared)
    p = str(tmp_path / "i.xlsx")
    write_xlsx(p, [["only", "inline", 5]])
    raw = read_excel_raw(p)
    assert raw.iloc[0].tolist() == ["only", "inline", 5]


def test_read_bad_zip_raises(tmp_path):
    p = tmp_path / "bad.xlsx"
    p.write_bytes(b"not a zip")
    with pytest.raises(Exception):
        read_excel_raw(str(p))

"""Excel positional-header source (S3/S4).

The reference reads spreadsheets whose layout is positional
(msgbroker/excel_producer.py:13-18): row 1 human-readable titles (ignored),
row 2 required/optional flags (ignored), row 3 column names, cell A4 the
target table name, rows 5+ data; the simpler variant
(main-dms.py:28-51) is headers row 3, data row 4+.

Spark has no Excel reader and this container has no openpyxl, so the xlsx
decode is PURE STDLIB: an .xlsx file is a zip of XML parts, and a
values-only read needs exactly three of them — the workbook (sheet order),
the shared-string table, and the sheet's ``<row>/<c>/<v>`` grid. Numbers
come back as int/float and strings as str, matching what
``pd.read_excel(header=None)`` yields for the reference's files. Excel
files are inherently small driver-side artifacts; the distributed part is
everything after ``spark.createDataFrame`` (Arrow-batched).
"""

from __future__ import annotations

import re
import zipfile
from dataclasses import dataclass
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_RNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


@dataclass
class ExcelSheet:
    table_name: str | None
    columns: list[str]
    data: pd.DataFrame


def parse_positional_layout(raw: pd.DataFrame, with_table_name: bool = True) -> ExcelSheet:
    """Interpret the reference's positional layout from a header-less frame
    (as ``pd.read_excel(header=None)`` would return).

    ``with_table_name=True``: names row 3 (idx 2), table name A4 (idx 3,0),
    data rows 5+ (idx 4+). ``False`` (main-dms variant): names row 3,
    data rows 4+ (idx 3+), no table-name cell.
    """
    columns = [str(c) for c in raw.iloc[2].tolist()]
    if with_table_name:
        table_name = raw.iloc[3, 0]
        data = raw.iloc[4:].reset_index(drop=True)
    else:
        table_name = None
        data = raw.iloc[3:].reset_index(drop=True)
    data.columns = range(len(data.columns))
    data = data.set_axis(columns, axis=1)
    return ExcelSheet(
        table_name=str(table_name) if table_name is not None else None,
        columns=columns,
        data=data,
    )


def _col_index(ref: str) -> int:
    """'A1' -> 0, 'AB7' -> 27 (0-based column from an A1-style cell ref)."""
    n = 0
    for ch in ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def _cell_value(c, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        return "".join(e.text or "" for e in c.iter(f"{_NS}t")) or None
    v = c.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":  # cached formula result
        return v.text
    if t == "b":
        return bool(int(v.text))
    # number: int when whole, float otherwise — whole-valued floats collapse
    # to int even in scientific notation (sheets writes 1698499500 as
    # "1.6984995E9"; the reference golden output-dms.csv renders it as the
    # integer, which is the parity target)
    txt = v.text
    try:
        f = float(txt)
    except ValueError:
        return txt
    return int(f) if f.is_integer() else f


def _first_sheet_part(z: zipfile.ZipFile) -> str:
    """Resolve the workbook's first sheet to its zip part via the rels."""
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    first = wb.find(f"{_NS}sheets/{_NS}sheet")
    rid = first.get(f"{_RNS}id")
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    for rel in rels:
        if rel.get("Id") == rid:
            target = rel.get("Target").lstrip("/")
            return target if target.startswith("xl/") else f"xl/{target}"
    raise ValueError(f"sheet relationship {rid} not found")


def read_excel_raw(path: str) -> pd.DataFrame:
    """Values-only xlsx decode with the stdlib (zipfile + ElementTree) —
    returns the same header-less object frame ``pd.read_excel(path,
    header=None)`` would (NaN-free: blanks are None)."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sst.iter(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        sheet = ET.fromstring(z.read(_first_sheet_part(z)))
        rows: dict[int, dict[int, object]] = {}
        max_col = -1
        for row in sheet.iter(f"{_NS}row"):
            r = int(row.get("r")) - 1
            cells: dict[int, object] = {}
            for c in row.iter(f"{_NS}c"):
                val = _cell_value(c, shared)
                if val is not None:
                    ci = _col_index(c.get("r", "A"))
                    cells[ci] = val
                    max_col = max(max_col, ci)
            if cells:
                rows[r] = cells
    if not rows:
        return pd.DataFrame()
    n_rows, n_cols = max(rows) + 1, max_col + 1
    grid = [[rows.get(i, {}).get(j) for j in range(n_cols)] for i in range(n_rows)]
    return pd.DataFrame(grid, dtype=object)


# cell refs like "B12" for the minimal writer
_REF_RE = re.compile(r"^([A-Z]+)([0-9]+)$")


def write_xlsx(path: str, rows: list[list[object]]) -> None:
    """Minimal values-only xlsx WRITER (stdlib zipfile; inline strings, no
    shared-string table) — fixture/round-trip plumbing for the reader; the
    reference's own output side is pipe-CSV, not xlsx."""
    from xml.sax.saxutils import escape

    def ref(i: int, j: int) -> str:
        letters = ""
        j += 1
        while j:
            j, r = divmod(j - 1, 26)
            letters = chr(ord("A") + r) + letters
        return f"{letters}{i + 1}"

    body = []
    for i, row in enumerate(rows):
        cells = []
        for j, v in enumerate(row):
            if v is None:
                continue
            if isinstance(v, bool):
                cells.append(f'<c r="{ref(i, j)}" t="b"><v>{int(v)}</v></c>')
            elif isinstance(v, (int, float)):
                cells.append(f'<c r="{ref(i, j)}"><v>{v}</v></c>')
            else:
                cells.append(
                    f'<c r="{ref(i, j)}" t="inlineStr"><is><t>{escape(str(v))}</t></is></c>'
                )
        body.append(f'<row r="{i + 1}">{"".join(cells)}</row>')
    main_ns = _NS[1:-1]
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{main_ns}"><sheetData>{"".join(body)}</sheetData></worksheet>'
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{main_ns}" xmlns:r="{_RNS[1:-1]}">'
        '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def excel_to_dataframe(
    spark: SparkSession,
    source: str | pd.DataFrame,
    with_table_name: bool = True,
) -> tuple[DataFrame, str | None]:
    """Positional-layout sheet -> distributed DataFrame (Arrow hand-off).
    ``source`` may be a path (needs openpyxl) or an already-decoded raw
    frame (tests / parquet-rendered fixtures)."""
    raw = read_excel_raw(source) if isinstance(source, str) else source
    sheet = parse_positional_layout(raw, with_table_name=with_table_name)
    pdf = sheet.data.astype(object).where(pd.notna(sheet.data), None)
    return spark.createDataFrame(pdf), sheet.table_name

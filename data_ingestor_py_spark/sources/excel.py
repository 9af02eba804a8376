"""Excel positional-header source (S3/S4).

The reference reads spreadsheets whose layout is positional
(msgbroker/excel_producer.py:13-18): row 1 human-readable titles (ignored),
row 2 required/optional flags (ignored), row 3 column names, cell A4 the
target table name, rows 5+ data; the simpler variant
(main-dms.py:28-51) is headers row 3, data row 4+.

Spark has no Excel reader and this container has no openpyxl, so the xlsx
decode step is gated behind an import-try (NotImplementedError otherwise) —
the LAYOUT interpretation and the pandas->Arrow->DataFrame hand-off are real
and tested on synthesized frames. Excel files are inherently small,
driver-side artifacts; the distributed part is everything after
``spark.createDataFrame`` (Arrow-batched).
"""

from __future__ import annotations

from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


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


def read_excel_raw(path: str) -> pd.DataFrame:
    """xlsx decode (requires openpyxl — absent in this container)."""
    try:
        import openpyxl  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "xlsx decoding requires openpyxl, which is not installed; "
            "use parse_positional_layout on a raw frame instead"
        ) from e
    return pd.read_excel(path, header=None)


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

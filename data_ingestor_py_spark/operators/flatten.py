"""Flatten / explode nested records (S8).

The reference flattens parsed JSON/XML dicts imperatively
(msgbroker/file_producer.py:180-229): nested dicts merge into the parent row;
a list-of-dicts yields one output row per element with the scalar fields
copied onto each (proven by the golden CSV, output_files/output.csv — one row
per ``fnumbers`` element). Here the same semantics are a Catalyst
``select(struct.*)`` + ``explode`` — fully codegen'd, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StructType


def flatten(df: DataFrame, explode_arrays: bool = True, sep: str = "_", max_depth: int = 8) -> DataFrame:
    """Recursively flatten struct columns and explode array-of-struct columns.

    - struct col ``s`` with field ``f``  -> top-level column ``s{sep}f``
      (merge-into-parent, file_producer.py:205-210)
    - array<struct> col ``a`` -> one row per element via ``explode_outer``
      (empty/null arrays keep the base row with NULLs, matching dict.get
      semantics), then the element struct is flattened
      (file_producer.py:212-224)
    """
    for _ in range(max_depth):
        fields = df.schema.fields
        structs = [f.name for f in fields if isinstance(f.dataType, StructType)]
        arrays = [
            f.name
            for f in fields
            if explode_arrays and isinstance(f.dataType, ArrayType) and isinstance(f.dataType.elementType, StructType)
        ]
        if not structs and not arrays:
            return df
        for name in arrays:
            df = df.withColumn(name, F.explode_outer(F.col(name)))
        exprs = []
        for f in df.schema.fields:
            if isinstance(f.dataType, StructType):
                for sub in f.dataType.fieldNames():
                    exprs.append(F.col(f"`{f.name}`.`{sub}`").alias(f"{f.name}{sep}{sub}"))
            else:
                exprs.append(F.col(f"`{f.name}`"))
        df = df.select(*exprs)
    return df


def explode_tokens(df: DataFrame, text_col: str, out_col: str = "token", pattern: str = " ") -> DataFrame:
    """Split a text column and explode to one row per token (non-empty)."""
    return (
        df.withColumn(out_col, F.explode(F.split(F.col(text_col), pattern)))
        .where(F.col(out_col) != "")
    )

"""Checkpoint + lineage tables (M8 / L1).

Generalizes the reference's two durability mechanisms: the archive-move
"this file is done" marker (fileprocesser/file_processor.py:148-166) and the
insert-then-update SQL job log with start/end/status/duration
(logger/sqllogger.py:118-162, schema.sql:24-43). Here both are append-only
parquet tables next to the target:

- ``_checkpoint``: one row per committed batch — offsets, counts, checksum,
  the snapshot version the merge produced, status, timestamps. Resume =
  skip batch_ids with a committed row. Because merge-apply is idempotent,
  the checkpoint is *advisory*: a crash between snapshot commit and
  checkpoint write just re-applies the batch harmlessly (exactly-once
  end state either way).
- ``_lineage``: per-batch per-partition row counts for audit.

Appends are tiny (metadata-scale); each batch writes one small parquet file.
"""

from __future__ import annotations

import os
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession

CHECKPOINT_DDL = (
    "batch_id long, src_offset_start long, src_offset_end long, "
    "rows_in long, rows_applied long, touched_buckets int, "
    "snapshot_version long, checksum string, status string, "
    "started_at double, committed_at double, duration_s double"
)


@dataclass
class BatchRecord:
    batch_id: int
    src_offset_start: int
    src_offset_end: int
    rows_in: int
    rows_applied: int
    touched_buckets: int
    snapshot_version: int
    checksum: str
    status: str
    started_at: float
    committed_at: float
    duration_s: float


class Checkpoint:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.dir = os.path.join(root, "_checkpoint")

    def committed_batches(self) -> set[int]:
        if not os.path.isdir(self.dir):
            return set()
        df = self.spark.read.schema(CHECKPOINT_DDL).parquet(self.dir)
        return {r["batch_id"] for r in df.where("status = 'COMMITTED'").select("batch_id").collect()}

    def commit(self, rec: BatchRecord) -> None:
        df = self.spark.createDataFrame([tuple(asdict(rec).values())], CHECKPOINT_DDL)
        df.coalesce(1).write.mode("append").parquet(self.dir)

    def read(self) -> DataFrame:
        return self.spark.read.schema(CHECKPOINT_DDL).parquet(self.dir)


LINEAGE_DDL = "batch_id long, bucket int, rows long, committed_at double"


class Lineage:
    """Per-batch per-bucket applied-row counts (audit trail)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.dir = os.path.join(root, "_lineage")

    def append(self, batch_id: int, bucket_rows: list[tuple[int, int]]) -> None:
        now = time.time()
        rows = [(batch_id, b, n, now) for b, n in bucket_rows]
        if rows:
            self.spark.createDataFrame(rows, LINEAGE_DDL).coalesce(1).write.mode("append").parquet(self.dir)

    def read(self) -> DataFrame:
        return self.spark.read.schema(LINEAGE_DDL).parquet(self.dir)

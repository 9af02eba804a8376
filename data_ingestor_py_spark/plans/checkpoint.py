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
- ``_lineage``: per-batch per-bucket applied-row counts for audit.

These rows are metadata-scale, so they are written driver-side with pyarrow
(zero Spark jobs per batch — on a busy cluster the scheduler never sees
them) while remaining ordinary parquet readable by Spark/DuckDB. All writes
go through the same :class:`~data_ingestor_py_spark.storage.StorageAdapter`
as the manifest commit (serialize to an Arrow buffer, ``put`` a unique
key), so the checkpoint/lineage tables need nothing beyond the object API
either.
"""

from __future__ import annotations

import os
import time
import uuid
from dataclasses import asdict, dataclass

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession

from data_ingestor_py_spark.storage import PosixStorage, StorageAdapter

CHECKPOINT_DDL = (
    "batch_id long, src_offset_start long, src_offset_end long, "
    "rows_in long, rows_applied long, touched_buckets int, "
    "snapshot_version long, checksum string, status string, "
    "started_at double, committed_at double, duration_s double"
)

_CP_ARROW = pa.schema(
    [
        ("batch_id", pa.int64()),
        ("src_offset_start", pa.int64()),
        ("src_offset_end", pa.int64()),
        ("rows_in", pa.int64()),
        ("rows_applied", pa.int64()),
        ("touched_buckets", pa.int32()),
        ("snapshot_version", pa.int64()),
        ("checksum", pa.string()),
        ("status", pa.string()),
        ("started_at", pa.float64()),
        ("committed_at", pa.float64()),
        ("duration_s", pa.float64()),
    ]
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


def _serialize(table: pa.Table) -> bytes:
    sink = pa.BufferOutputStream()
    pq.write_table(table, sink)
    return sink.getvalue().to_pybytes()


def _append_arrow(io: StorageAdapter, dir_: str, table: pa.Table) -> None:
    io.put(os.path.join(dir_, f"part-{uuid.uuid4().hex}.parquet"), _serialize(table))


def _compact_dir(io: StorageAdapter, dir_: str, schema: pa.Schema) -> int:
    """Rewrite many per-batch metadata files into one (long replays append
    one tiny file per batch; compaction keeps the listing cheap). Returns
    the number of files compacted.

    Crash + concurrency safety over the object API: the compacted table is
    ``put`` atomically (readers never see a partial object), and only then
    are the originals deleted with idempotent deletes. A crash mid-sequence
    leaves the compacted file plus some originals — duplicate rows that
    readers dedupe (rows are byte-identical). Two CONCURRENT compactions
    both write a (byte-identical-rows) compact file and race the deletes:
    idempotent delete makes the loser's removals no-ops, and the adapter's
    grace-period staging sweep never touches a live writer's in-flight
    upload. No interleaving loses data."""
    io.sweep_staging(dir_)  # grace-period-guarded orphan cleanup
    files = [k for k in io.list(dir_) if k.endswith(".parquet")]
    if len(files) <= 1:
        return 0
    tables = []
    for k in files:
        raw = io.get(k)
        if raw is None:
            continue  # a concurrent compactor already removed it
        tables.append(pq.read_table(pa.BufferReader(raw)))
    if not tables:
        return 0
    t = pa.concat_tables(tables).cast(schema)
    io.put(os.path.join(dir_, f"compact-{uuid.uuid4().hex}.parquet"), _serialize(t))
    for k in files:
        io.delete(k)
    return len(files)


class Checkpoint:
    def __init__(
        self, spark: SparkSession, root: str, storage: StorageAdapter | None = None
    ):
        self.spark = spark
        self.dir = os.path.join(root, "_checkpoint")
        self.io = storage or PosixStorage()

    def committed_batches(
        self, checksum: str | None = None, exclude_streams: bool = False
    ) -> set[int]:
        """Driver-side metadata read — no Spark job. With ``checksum`` the
        set is restricted to rows carrying that checksum value (used by the
        streaming path, which stores a ``stream:``-prefixed identity there,
        so epoch numbering from a DIFFERENT stream checkpoint never
        aliases). ``exclude_streams`` drops all stream-identity rows — the
        BATCH replay driver's view, so stream epochs sharing batch_id
        numbers never alias batch ids either."""
        # retry the list->open window: a concurrent compactor may delete a
        # just-listed file (its rows live on in the compacted file we will
        # pick up on re-list)
        for attempt in range(5):
            files = [k for k in self.io.list(self.dir) if k.endswith(".parquet")]
            if not files:
                return set()
            try:
                ds = pads.dataset(files, format="parquet")
                t = ds.to_table(columns=["batch_id", "status", "checksum"])
                break
            except FileNotFoundError:
                if attempt == 4:
                    raise
        return {
            b for b, s, c in zip(
                t["batch_id"].to_pylist(), t["status"].to_pylist(),
                t["checksum"].to_pylist(),
            )
            if s == "COMMITTED"
            and (checksum is None or c == checksum)
            and not (exclude_streams and (c or "").startswith("stream:"))
        }

    def commit(self, rec: BatchRecord) -> None:
        d = asdict(rec)
        _append_arrow(self.io, self.dir, pa.Table.from_pylist([d], schema=_CP_ARROW))

    def read(self) -> DataFrame:
        # dropDuplicates: rows duplicated by a crash mid-compaction are
        # byte-identical, so exact-row dedup restores the logical table;
        # pathGlobFilter skips in-flight staging uploads; ignoreMissingFiles
        # tolerates a concurrent compactor deleting a listed original (its
        # rows live on in the compacted file, which IS in the listing)
        return (
            self.spark.read.schema(CHECKPOINT_DDL)
            .option("pathGlobFilter", "*.parquet")
            .option("ignoreMissingFiles", "true")
            .parquet(self.dir)
            .dropDuplicates()
        )

    def compact(self) -> int:
        return _compact_dir(self.io, self.dir, _CP_ARROW)


LINEAGE_DDL = "batch_id long, bucket int, rows long, committed_at double"

_LIN_ARROW = pa.schema(
    [
        ("batch_id", pa.int64()),
        ("bucket", pa.int32()),
        ("rows", pa.int64()),
        ("committed_at", pa.float64()),
    ]
)


class Lineage:
    """Per-batch per-bucket applied-row counts (audit trail)."""

    def __init__(
        self, spark: SparkSession, root: str, storage: StorageAdapter | None = None
    ):
        self.spark = spark
        self.dir = os.path.join(root, "_lineage")
        self.io = storage or PosixStorage()

    def append(self, batch_id: int, bucket_rows: list[tuple[int, int]]) -> None:
        now = time.time()
        rows = [
            {"batch_id": batch_id, "bucket": int(b), "rows": int(n), "committed_at": now}
            for b, n in bucket_rows
        ]
        if rows:
            _append_arrow(self.io, self.dir, pa.Table.from_pylist(rows, schema=_LIN_ARROW))

    def read(self) -> DataFrame:
        return (
            self.spark.read.schema(LINEAGE_DDL)
            .option("pathGlobFilter", "*.parquet")
            .option("ignoreMissingFiles", "true")
            .parquet(self.dir)
            .dropDuplicates()
        )

    def compact(self) -> int:
        return _compact_dir(self.io, self.dir, _LIN_ARROW)

"""Snapshot → binlog handoff: bootstrap a table from a consistent
snapshot, then tail the change stream — without gaps or resurrection.

A real Debezium deployment starts with an initial snapshot (op='r' reads
of every row, consistent as of some LSN) and then switches to streaming
the binlog. The engine's idempotent max-seq merge makes the OVERLAP side
of the cutover free — binlog events at seq <= snapshot LSN for keys the
snapshot carries simply lose to the snapshot rows — but it does NOT make
the cutover safe by itself, because of the absent-key hole:

    a key deleted BEFORE the snapshot is absent from it (no tombstone,
    no stored seq to beat), so a re-delivered pre-snapshot insert for
    that key has nothing to lose against and would RESURRECT it.

The fix every CDC pipeline ships is the LSN floor: binlog events at
``seq <= snapshot_lsn`` are provably reflected in (or superseded by) the
snapshot and are dropped BEFORE the merge. ``bootstrap_snapshot`` stamps
every snapshot row at ``_seq = snapshot_lsn``; the streaming side
filters on the floor inside the same codegen stage as the envelope
parse. Together: every event is applied exactly once — pre-LSN via the
snapshot, post-LSN via the stream — whatever overlap the binlog
retention happens to deliver.

The reference's analogue is the initial full-file load before the tail
loop (fileprocesser/file_processor.py walks the directory once, then the
watcher takes over) — with the at-least-once seam unguarded.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.target import MergeStats, TargetTable
from data_ingestor_py_spark.sources.debezium import parse_debezium
from data_ingestor_py_spark.streaming.stream_debezium import (
    stream_debezium_replay,
)


def bootstrap_snapshot(
    table: TargetTable,
    snapshot: DataFrame,
    snapshot_lsn: int,
    prepare: Callable[[DataFrame], DataFrame] | None = None,
) -> MergeStats:
    """Load a consistent-as-of-``snapshot_lsn`` full snapshot (op='r'
    semantics: one current row per key, no tombstones). Every row is
    stamped ``_seq = snapshot_lsn``, so post-LSN binlog events win and
    (floor-filtered) pre-LSN events never reach the merge. Idempotent —
    re-running the bootstrap re-merges identical rows."""
    rows = prepare(snapshot) if prepare is not None else snapshot
    batch = rows.select(
        "*",
        F.lit(snapshot_lsn).cast("long").alias("_seq"),
        F.lit("U").alias("_op"),
        F.lit(None).cast("timestamp").alias("_ts"),
    )
    return table.merge_apply(batch, stats="light")


def stream_after_snapshot(
    spark: SparkSession,
    events_dir: str,
    row_fields: list[tuple[str, str]],
    table: TargetTable,
    snapshot_lsn: int,
    prepare: Callable[[DataFrame, int], DataFrame] | None = None,
    **kw,
):
    """Tail the Debezium envelope stream applying the LSN floor: events
    at ``_seq <= snapshot_lsn`` are dropped before the merge (they are
    part of the snapshot's history — re-applying an upsert would be
    harmless, but re-applying an insert for a since-deleted absent key
    would resurrect it). The floor composes with any caller ``prepare``
    (floor first, caller's mapping second)."""

    def floored(df: DataFrame, epoch_id: int) -> DataFrame:
        live = df.where(F.col("_seq") > snapshot_lsn)
        return prepare(live, epoch_id) if prepare is not None else live.drop("src_op")

    return stream_debezium_replay(
        spark, events_dir, row_fields, table, prepare=floored, **kw
    )


def replay_after_snapshot(
    raw: DataFrame,
    row_fields: list[tuple[str, str]],
    table: TargetTable,
    snapshot_lsn: int,
    ts_ms_fallback: bool = True,
    salt_buckets: int | str = 0,
) -> MergeStats:
    """Batch flavor of the floored tail (one raw envelope frame)."""
    ev = parse_debezium(raw, row_fields, ts_ms_fallback=ts_ms_fallback)
    batch = ev.where(F.col("_seq") > snapshot_lsn).drop("src_op")
    # binlog-segment-sized, and its lineage re-parses every JSON envelope —
    # cache so the parse runs once across the merge's two actions
    return table.merge_apply(
        batch, salt_buckets=salt_buckets, stats="light", persist_batch=True
    )

"""Streaming Debezium ingestion: tail a directory of envelope JSON-lines
(the shape a Kafka-Connect S3 sink or a `debezium-server` file sink
produces) and merge each micro-batch into a :class:`TargetTable`, with
malformed/non-row records quarantined per epoch.

This is the reference's file-tail loop (fileprocesser/file_processor.py:
54-86) upgraded to the real binlog wire format: the text source is
splittable, the envelope parse is Catalyst-only, the merge is the
engine's idempotent max-seq upsert (re-delivered epochs converge), and —
WHEN ``dead_letter_dir`` is set (recommended) — every input line is
accounted for: change events merge, tombstones are dropped by design,
everything else lands in the dead-letter directory partitioned by epoch
for operator forensics (``spark.read.json(dead_letter_dir)`` recovers
raw line + epoch). The per-epoch quarantine write is ``overwrite``, so a
re-delivered epoch rewrites the same records instead of duplicating
them. Without ``dead_letter_dir`` non-change lines are dropped silently
— only acceptable for feeds already validated upstream.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.sources.debezium import dead_letters, parse_debezium
from data_ingestor_py_spark.streaming.stream_replay import start_foreach_stream


def stream_debezium_replay(
    spark: SparkSession,
    events_dir: str,
    row_fields: list[tuple[str, str]],
    table: TargetTable,
    prepare: Callable[[DataFrame, int], DataFrame] | None = None,
    dead_letter_dir: str | None = None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    ts_ms_fallback: bool = True,
    salt_buckets: int = 0,
    on_epoch_end: Callable[[int, DataFrame], None] | None = None,
    unavailable_sentinel: str | None = None,
):
    """Tail ``events_dir`` (JSON-lines Debezium envelopes) and merge each
    micro-batch. ``prepare(df, epoch)`` maps the normalized change events
    (row_fields + ``src_op``/``_op``/``_seq``/``_ts``) to the table's
    columns; by default the row fields ride through as-is.

    ``on_epoch_end(epoch_id, events)`` runs after the epoch's merge is
    durable (the streaming twin of ``plans.replay.replay``'s
    ``on_batch_end`` seam) — downstream consumers that must see each
    applied epoch (incremental snapshot chunks, MV refreshes) hook here;
    an exception aborts the query AFTER the merge committed, so a
    restart re-fires the hook for this epoch without re-applying it.

    Returns the StreamingQuery; with ``available_now`` the caller should
    ``awaitTermination()`` to drain."""
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.text(events_dir)

    def apply_epoch(df: DataFrame, epoch_id: int) -> None:
        if dead_letter_dir is not None:
            # unconditional overwrite into the epoch-keyed partition dir:
            # idempotent under re-delivery, no existence-probe scan (an
            # empty epoch dir is harmless), and the epoch itself comes back
            # through partition discovery — a data column named `epoch`
            # would collide with the partition column on read
            dead_letters(df, row_fields, ts_ms_fallback=ts_ms_fallback).write.mode(
                "overwrite"
            ).json(os.path.join(dead_letter_dir, f"epoch={epoch_id}"))
        ev = parse_debezium(df, row_fields, ts_ms_fallback=ts_ms_fallback)
        batch = prepare(ev, epoch_id) if prepare is not None else ev.drop("src_op")
        table.merge_apply(
            batch, salt_buckets=salt_buckets, stats="light",
            unavailable_sentinel=unavailable_sentinel,
            # epoch-sized, and its lineage re-parses every JSON envelope —
            # cache so the parse runs once per epoch, not per merge action
            persist_batch=True,
        )
        if on_epoch_end is not None:
            on_epoch_end(epoch_id, ev)

    return start_foreach_stream(stream, apply_epoch, checkpoint_dir, available_now)


def stream_debezium_router(
    spark: SparkSession,
    events_dir: str,
    router,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Tail ONE envelope directory carrying changes for MANY tables and fan
    each micro-batch out through a :class:`plans.router.DebeziumRouter` —
    the whole-database tail a real Debezium connector produces.

    Spark's stream checkpoint is the epoch coordinator here (the router's
    own coordinated checkpoint serves the batch driver); at-least-once
    epoch re-delivery converges because every per-table merge is an
    idempotent max-seq upsert and the router's quarantine write is a
    per-batch overwrite — the same argument as stream_debezium_replay,
    applied across N tables at once."""
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.text(events_dir)

    def apply_epoch(df: DataFrame, epoch_id: int) -> None:
        router.fan_out(df, epoch_id, persist=True)

    return start_foreach_stream(stream, apply_epoch, checkpoint_dir, available_now)

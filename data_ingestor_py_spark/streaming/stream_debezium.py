"""Streaming Debezium ingestion: tail a directory of envelope JSON-lines
(the shape a Kafka-Connect S3 sink or a `debezium-server` file sink
produces) and merge each micro-batch into a :class:`TargetTable`, with
malformed/non-row records quarantined per epoch.

This is the reference's file-tail loop (fileprocesser/file_processor.py:
54-86) upgraded to the real binlog wire format: the text source is
splittable, the envelope parse is Catalyst-only, the merge is the
engine's idempotent max-seq upsert (re-delivered epochs converge), and
every input line is accounted for — change events merge, tombstones are
dropped by design, everything else lands in the dead-letter directory
with its epoch for operator forensics.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.sources.debezium import dead_letters, parse_debezium


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
):
    """Tail ``events_dir`` (JSON-lines Debezium envelopes) and merge each
    micro-batch. ``prepare(df, epoch)`` maps the normalized change events
    (row_fields + ``src_op``/``_op``/``_seq``/``_ts``) to the table's
    columns; by default the row fields ride through as-is.

    Returns the StreamingQuery; with ``available_now`` the caller should
    ``awaitTermination()`` to drain."""
    reader = spark.readStream
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.text(events_dir)

    def apply_epoch(df: DataFrame, epoch_id: int) -> None:
        if dead_letter_dir is not None:
            dead = dead_letters(df, row_fields, ts_ms_fallback=ts_ms_fallback)
            if dead.limit(1).count():
                dead.withColumn("epoch", F.lit(epoch_id)).write.mode(
                    "append"
                ).json(os.path.join(dead_letter_dir, f"epoch={epoch_id}"))
        ev = parse_debezium(df, row_fields, ts_ms_fallback=ts_ms_fallback)
        batch = prepare(ev, epoch_id) if prepare is not None else ev.drop("src_op")
        table.merge_apply(batch, salt_buckets=salt_buckets, stats="light")

    writer = stream.writeStream.foreachBatch(apply_epoch).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Structured Streaming replay: binlog tail -> foreachBatch merge-apply.

The reference's "streaming" is a producer thread feeding a bounded queue of
dict records with in-band ``__NEW_FILE__`` markers and a ``None``
done-sentinel (msgbroker/file_producer.py:76-107, fileprocesser/
processor.py:10-66). The Spark-native equivalent is a file-source
``readStream`` whose micro-batches land in ``foreachBatch``:

- backpressure (the reference's Queue(maxsize=1000)) -> ``maxFilesPerTrigger``
- done-sentinel -> ``Trigger.AvailableNow`` (drain everything, then stop)
- epoch markers -> the micro-batch boundary itself
- exactly-once: Spark's checkpoint gives at-least-once batch delivery;
  merge-apply idempotency (max-_seq per key) upgrades it to exactly-once
  table state — the same two-layer story as the batch replay driver.
- late data: events with _seq <= the stored per-key max are rejected by the
  merge itself, so no watermark is required for correctness; a watermark +
  ``dropDuplicatesWithinWatermark`` can bound streaming state if a
  pre-merge streaming dedup is ever added.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_ingestor_py_spark.plans.checkpoint import BatchRecord, Checkpoint, Lineage
from data_ingestor_py_spark.plans.target import TargetTable


def start_foreach_stream(
    stream, apply_fn, checkpoint_dir, available_now, output_mode="update"
):
    """Shared writer plumbing for the engine's foreachBatch drivers
    (stream_replay / stream_scd2 / stream_debezium_replay / windowed):
    one place for outputMode, checkpointLocation, and the availableNow
    trigger. ``output_mode="append"`` is the watermarked-window case —
    each finalized row delivered once."""
    writer = stream.writeStream.foreachBatch(apply_fn).outputMode(output_mode)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_replay(
    spark: SparkSession,
    events_dir: str,
    events_schema: str,
    table: TargetTable,
    prepare: Callable[[DataFrame, int], DataFrame] | None = None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    salt_buckets: int = 0,
    stats: str = "full",
    watermark_delay: str | None = None,
    event_time_col: str = "_ts",
    dedup_id_cols: tuple[str, ...] = ("repo", "path", "_seq"),
    on_epoch_start=None,
    on_epoch_end=None,
):
    """Tail a directory of event files (parquet) and merge each micro-batch.

    Returns the StreamingQuery; with ``available_now`` the caller should
    ``awaitTermination()`` to drain. New files dropped into ``events_dir``
    on a live (non-available-now) query are picked up per trigger —
    the generalization of the reference's multi-file loop
    (fileprocesser/file_processor.py:54-86).
    """
    import time

    reader = spark.readStream.schema(events_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_dir)
    if watermark_delay:
        # bound streaming dedup state: exact replays of the dedup-id tuple
        # within the watermark are dropped before the merge ever sees them
        # (the merge stays idempotent for duplicates beyond the watermark).
        # Columns are caller-configurable so non-CDC streams can use the
        # same path; validate up front for a clear error instead of a deep
        # AnalysisException out of the watermark node.
        missing = [c for c in (event_time_col, *dedup_id_cols) if c not in stream.columns]
        if missing:
            raise ValueError(
                f"watermark_delay requires columns {missing} in the stream schema "
                f"({stream.columns}); pass event_time_col/dedup_id_cols to match"
            )
        stream = stream.withWatermark(event_time_col, watermark_delay).dropDuplicatesWithinWatermark(
            list(dedup_id_cols)
        )

    from data_ingestor_py_spark.plans.fallback_log import FallbackLogger

    cp = Checkpoint(spark, table.root, storage=table.io)
    lin = Lineage(spark, table.root, storage=table.io)
    fb = FallbackLogger(
        os.path.join(table.root, "_fallback_logs.json"),
        context={"table": table.root},
    )
    # Restart hygiene (mirrors plans/replay.py's committed-batch skip): if
    # Spark re-delivers an epoch after a crash between OUR checkpoint write
    # and SPARK's offset commit, the merge would be harmless (idempotent)
    # but the re-applied epoch would append a second _checkpoint/_lineage
    # row set with fresh timestamps, inflating lineage counts. Epoch ids are
    # only meaningful WITHIN one Spark checkpointLocation (a fresh location
    # restarts numbering at 0 over possibly-new data), so the committed set
    # is keyed by a stream identity stored in the record's checksum field —
    # epochs of a different/rebuilt stream checkpoint are never skipped,
    # they just re-merge idempotently. Read once at start: replayed epochs
    # are always from before the restart.
    # normalize the path so the same Spark checkpoint referenced by a
    # different spelling on restart (relative vs absolute, trailing slash)
    # still matches its own committed epochs. A checkpoint-less stream gets
    # a fresh per-run identity — its epochs can never be resumed anyway,
    # but its checkpoint rows must STILL carry a 'stream:' prefix so the
    # batch driver's exclude_streams filter sees them (checksum='' would
    # alias batch ids and make a later batch replay skip batches it never
    # ran).
    if checkpoint_dir:
        stream_ident = f"stream:{os.path.abspath(checkpoint_dir)}"
        already_committed = cp.committed_batches(checksum=stream_ident)
    else:
        import uuid

        stream_ident = f"stream:ephemeral:{uuid.uuid4().hex}"
        already_committed = set()

    def apply_batch(df: DataFrame, epoch_id: int) -> None:
        t0 = time.time()
        if epoch_id in already_committed:
            # re-delivered after a crash between our checkpoint and Spark's
            # offset commit: the merge/metadata are done, but the hook may
            # not have fired before the crash — fire it now (at-least-once;
            # consumers are idempotent per epoch)
            if on_epoch_end is not None:
                on_epoch_end(epoch_id, table, None)
            return
        if on_epoch_start is not None:
            # schema-evolution hook per micro-batch (the streaming analogue
            # of replay()'s on_batch_start)
            on_epoch_start(epoch_id, table)
        batch = prepare(df, epoch_id) if prepare is not None else df
        st = table.merge_apply(batch, salt_buckets=salt_buckets, stats=stats)
        t1 = time.time()
        rec = BatchRecord(
            batch_id=epoch_id,
            src_offset_start=st.seq_min,
            src_offset_end=st.seq_max,
            rows_in=st.rows_in,
            rows_applied=st.rows_after_dedup,
            touched_buckets=st.touched_buckets,
            snapshot_version=st.snapshot_version,
            checksum=stream_ident,
            status="COMMITTED",
            started_at=t0,
            committed_at=t1,
            duration_s=t1 - t0,
        )
        # OSError only + stage marker: same rationale as plans/replay.py —
        # storage outages go to the fallback file, real bugs surface, and a
        # committed checkpoint is never misreported as failed when only the
        # lineage append broke.
        stage = "checkpoint"
        try:
            cp.commit(rec)
            stage = "lineage"
            lin.append(epoch_id, st.bucket_rows)
        except OSError as e:  # metadata store down — L2 fallback path
            from dataclasses import asdict

            fb.log("CHECKPOINT_WRITE_FAILED" if stage == "checkpoint"
                   else "LINEAGE_WRITE_FAILED",
                   str(e), batch_id=epoch_id,
                   record=asdict(rec), bucket_rows=st.bucket_rows)
        # streaming hook contract differs from replay()'s on_batch_end:
        # what consumers (MV refresh) depend on is the TABLE SNAPSHOT,
        # which IS durable once merge_apply returned — and unlike batch
        # replay, a metadata-store fallback here has no later resume
        # re-application to re-fire the hook (Spark commits its offsets
        # regardless), so gating on our metadata row would silently starve
        # the consumer. Fire after the snapshot commit, at-least-once per
        # epoch (the already-committed branch above covers the
        # crash-before-hook case); consumers must be idempotent.
        if on_epoch_end is not None:
            on_epoch_end(epoch_id, table, rec)

    return start_foreach_stream(stream, apply_batch, checkpoint_dir, available_now)

"""Batch replay driver: the engine's main loop (X1/X2 analogue).

The reference's orchestration is two hand-rolled threads around a bounded
queue (fileprocesser/processor.py:10-66) looping over input files
(file_processor.py:54-86). Here the loop is over *micro-batches* of the
change stream; each iteration is: resolve schema version -> evolve table if
the batch's spec is newer -> merge-apply -> checkpoint + lineage. Batches
already recorded in the checkpoint are skipped on resume; re-applying a
batch is harmless anyway (idempotent merge), which closes the
crash-between-commit-and-checkpoint window.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.checkpoint import BatchRecord, Checkpoint, Lineage
from data_ingestor_py_spark.plans.fallback_log import FallbackLogger
from data_ingestor_py_spark.plans.target import TargetTable


def split_batches(events: DataFrame, n_batches: int, by: str = "event_id", assign=None) -> list[DataFrame]:
    """Deterministic batch assignment by hash of the event id — deliberately
    NOT range-based, so events arrive across batches out of ``_seq`` order
    and the late-event guard (M9) is genuinely exercised. ``assign`` overrides
    the assignment with an arbitrary int Column expression."""
    expr = assign if assign is not None else F.pmod(F.xxhash64(F.col(by)), F.lit(n_batches))
    with_b = events.withColumn("_batch", expr.cast("int"))
    return [with_b.where(F.col("_batch") == i).drop("_batch") for i in range(n_batches)]


def replay(
    table: TargetTable,
    batches: list[DataFrame],
    salt_buckets: int = 0,
    checkpoint: Checkpoint | None = None,
    lineage: Lineage | None = None,
    prepare: Callable[[DataFrame, int], DataFrame] | None = None,
    on_batch_start: Callable[[int, TargetTable], None] | None = None,
    on_batch_end: Callable[[int, TargetTable, BatchRecord], None] | None = None,
    checksum: bool = False,
    stats: str = "full",
    expire_keep: int = 0,
    fallback: "FallbackLogger | None" = None,
    phase_times: list | None = None,
) -> list[BatchRecord]:
    """Replay a list of event micro-batches into ``table``.

    ``prepare(df, batch_id)`` maps raw events to the table's columns (the
    mapping-spec stage); ``on_batch_start`` is the schema-evolution hook;
    ``on_batch_end(i, table, record)`` runs after the batch's checkpoint
    commit — the seam for downstream delta consumers (e.g.
    :class:`plans.mv.IncrementalAggregate.refresh` per batch; an exception
    there must not roll back the already-committed batch, so hook failures
    propagate to the caller AFTER the checkpoint is durable).
    Returns the per-batch records that were committed this run.

    Checkpoint/lineage writes are guarded by the L2 fallback logger
    (reference: logger/sqllogger.py:191-213): if the metadata store fails
    AFTER the snapshot committed, the batch record goes to a rotating
    local JSON file and the replay continues — on resume the unrecorded
    batch re-applies idempotently, so nothing is lost either way.
    """
    spark = table.spark
    cp = checkpoint or Checkpoint(spark, table.root, storage=table.io)
    lin = lineage or Lineage(spark, table.root, storage=table.io)
    fb = fallback or FallbackLogger(
        os.path.join(table.root, "_fallback_logs.json"),
        context={"table": table.root},
    )
    # exclude stream-identity rows: a stream's epoch numbering shares the
    # batch_id space in the same _checkpoint table, and a stream epoch being
    # committed must never make the batch driver skip a batch it never ran
    done = cp.committed_batches(exclude_streams=True)
    out: list[BatchRecord] = []
    for i, batch in enumerate(batches):
        if i in done:
            continue
        t0 = time.time()
        if on_batch_start is not None:
            on_batch_start(i, table)
        df = prepare(batch, i) if prepare is not None else batch
        st = table.merge_apply(df, salt_buckets=salt_buckets, stats=stats)
        t_m = time.time()
        csum = table.snapshot_hash() if checksum else ""
        if expire_keep:
            table.expire_snapshots(keep_last=expire_keep)
        t1 = time.time()
        if phase_times is not None:
            # per-batch phase decomposition (diagnostics for the scaling
            # harness: which part of the batch is fixed-cost vs parallel)
            phase_times.append({
                "batch_id": i, "discover_s": st.discover_s,
                "merge_s": st.merge_s,
                "other_merge_s": round(t_m - t0 - st.discover_s - st.merge_s, 3),
                "expire_s": round(t1 - t_m, 3),
            })
        rec = BatchRecord(
            batch_id=i,
            src_offset_start=st.seq_min,
            src_offset_end=st.seq_max,
            rows_in=st.rows_in,
            rows_applied=st.rows_after_dedup,
            touched_buckets=st.touched_buckets,
            snapshot_version=st.snapshot_version,
            checksum=csum,
            status="COMMITTED",
            started_at=t0,
            committed_at=t1,
            duration_s=t1 - t0,
        )
        # L2 fallback guards STORAGE failures only (OSError covers local FS,
        # pyarrow IO, and adapter StorageError) — a schema/serialization bug
        # must raise, not silently downgrade to a log line forever. The
        # stage marker distinguishes a failed checkpoint write from a
        # checkpoint that COMMITTED whose lineage append then failed.
        stage = "checkpoint"
        checkpointed = False
        try:
            cp.commit(rec)
            checkpointed = True
            stage = "lineage"
            lin.append(i, st.bucket_rows)
        except OSError as e:  # metadata store down — L2 fallback path
            from dataclasses import asdict

            fb.log(
                "CHECKPOINT_WRITE_FAILED" if stage == "checkpoint"
                else "LINEAGE_WRITE_FAILED",
                str(e),
                batch_id=i,
                record=asdict(rec),
                bucket_rows=st.bucket_rows,
            )
        # hook contract: fires only once the checkpoint is DURABLE. When
        # the checkpoint write itself fell back, the batch will re-apply
        # on resume and the hook fires then — so consumers see the batch
        # exactly once provided they are idempotent per batch id (the
        # fallback-resume path re-fires like any crash-replay would).
        if on_batch_end is not None and checkpointed:
            on_batch_end(i, table, rec)
        out.append(rec)
    return out

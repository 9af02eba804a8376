"""DBLog-style incremental snapshot: chunked bootstrap interleaved with
the live binlog — no table lock, no stop-the-world initial load.

``streaming/handoff.py`` covers the classic cutover: one monolithic
snapshot, then the stream. At 100 TB the monolithic snapshot is the
problem — a consistent full-table SELECT holds a transaction open for
hours (or needs a storage-level snapshot), and a crash at 99% restarts
from zero. DBLog (Andreadis & Gharachorloo et al., Netflix, 2019-12,
arXiv:2010.12597) and Debezium's incremental-snapshot implementation of
it solve this by interleaving: the table is read in small KEY-RANGE
CHUNKS, each chunk consistent only as of its own read LSN, while binlog
events keep applying between chunks. The two write paths race on the
same keys; DBLog resolves the race with a low/high watermark window that
de-duplicates chunk rows against binlog events observed during the
chunk select.

This engine gets the window resolution for free from the idempotent
max-seq merge, PROVIDED the stamping rule holds:

    a chunk row is stamped ``_seq = read_lsn`` where ``read_lsn`` is an
    LSN at which the chunk read is consistent (the select's snapshot
    LSN). Stamping BELOW the true read LSN is safe (the row loses to
    binlog events it already reflects — re-applying them converges to
    the same values); stamping ABOVE it is the one unsound direction: a
    chunk row claiming LSN w while its content is only consistent as of
    v < w suppresses every binlog event in (v, w] and ghosts stale
    values into the final state. ``apply_chunk`` therefore takes the
    read LSN together with the rows and never invents one.

The other two holes and their guards (both shared with handoff.py):

- absent-key resurrection: a key deleted BEFORE the snapshot began is in
  no chunk, so a re-delivered pre-snapshot insert has nothing to lose
  against. Guard: the global LSN floor at ``start_lsn`` — binlog events
  at ``_seq <= start_lsn`` never reach the merge.
- crash mid-snapshot: completed chunks are recorded in the table's own
  checkpoint ledger (the ``checksum`` identity channel, ``stream:``
  -prefixed so the batch replay driver's ``exclude_streams`` filter can
  never alias a chunk id with an epoch id). The ledger row is written
  AFTER the chunk's merge is durable: a crash in between re-runs the
  chunk, and the re-read — at the CURRENT source LSN, re-stamped with
  that same LSN — is exactly as consistent as the first attempt.

Chunk partitioning uses the table's own bucket function
(``pmod(xxhash64(bucket_cols), n_chunks)``): with ``n_chunks`` a
multiple/divisor of ``num_buckets`` a chunk's merge touches only
``num_buckets / n_chunks`` buckets, so COW write amplification per chunk
stays proportional to the chunk, not the table.

Reference parity: the reference's initial load is the monolithic
directory walk before the watch loop (fileprocesser/file_processor.py);
it has no chunked bootstrap — this is the capability a 100-TB source
needs, built over the same merge/checkpoint primitives.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.checkpoint import BatchRecord, Checkpoint
from data_ingestor_py_spark.plans.replay import replay
from data_ingestor_py_spark.plans.target import MergeStats, TargetTable

__all__ = [
    "ChunkedSnapshot",
    "drain_chunks",
    "incremental_snapshot_replay",
    "stream_incremental_snapshot",
]


class ChunkedSnapshot:
    """Resumable chunk ledger + the stamping rule, over one TargetTable.

    The ledger lives in the table's checkpoint store under the identity
    ``stream:incsnap:<n_chunks>`` — chunk ids are batch ids in that
    channel only, invisible to both the batch replay driver
    (``exclude_streams``) and any streaming consumer (different
    identity). Changing ``n_chunks`` mid-snapshot is therefore an
    explicit restart (a different identity = an empty ledger), which is
    the only sound reading: chunk membership is a function of
    ``n_chunks``.
    """

    def __init__(self, table: TargetTable, n_chunks: int):
        if n_chunks < 1:
            raise ValueError(f"n_chunks must be >= 1, got {n_chunks}")
        self.table = table
        self.n_chunks = n_chunks
        m = table._load()
        self._bucket_cols = list(m["bucket_cols"])
        self._cp = Checkpoint(table.spark, table.root, storage=table.io)

    # ------------------------------------------------------------ ledger

    @property
    def identity(self) -> str:
        return f"stream:incsnap:{self.n_chunks}"

    def completed_chunks(self) -> set[int]:
        return self._cp.committed_batches(checksum=self.identity)

    def pending_chunks(self) -> list[int]:
        done = self.completed_chunks()
        return [i for i in range(self.n_chunks) if i not in done]

    def done(self) -> bool:
        return not self.pending_chunks()

    # ------------------------------------------------------------ chunks

    def chunk_member(self, chunk_id: int):
        """Boolean Column: does a source row belong to ``chunk_id``?
        Same hash family as the table's bucketing, so chunks align with
        bucket boundaries whenever n_chunks divides num_buckets."""
        return (
            F.pmod(
                F.xxhash64(*[F.col(c) for c in self._bucket_cols]),
                F.lit(self.n_chunks),
            ).cast("int")
            == F.lit(int(chunk_id))
        )

    def apply_chunk(
        self,
        chunk_id: int,
        snapshot_rows: DataFrame,
        read_lsn: int,
        prepare: Callable[[DataFrame], DataFrame] | None = None,
    ) -> MergeStats:
        """Merge one chunk of a consistent-as-of-``read_lsn`` source read
        and record it in the ledger.

        ``snapshot_rows`` may be the whole snapshot frame — membership is
        applied here, so the caller cannot accidentally merge rows into
        the wrong chunk's ledger entry. Rows are stamped
        ``_seq = read_lsn`` / ``_op = 'U'`` (op='r' semantics: current
        rows only, no tombstones). Re-running a crashed chunk is
        idempotent; running an already-ledgered chunk is a cheap no-op.
        """
        if not 0 <= chunk_id < self.n_chunks:
            raise ValueError(f"chunk_id {chunk_id} out of [0, {self.n_chunks})")
        if chunk_id in self.completed_chunks():
            return MergeStats(
                rows_in=0, rows_after_dedup=0, touched_buckets=0,
                snapshot_version=-1, bucket_rows=[],
            )
        rows = prepare(snapshot_rows) if prepare is not None else snapshot_rows
        t0 = time.time()
        batch = rows.where(self.chunk_member(chunk_id)).select(
            "*",
            F.lit(int(read_lsn)).cast("long").alias("_seq"),
            F.lit("U").alias("_op"),
            F.lit(None).cast("timestamp").alias("_ts"),
        )
        # chunk-sized batch, but its lineage is a consistent-as-of-LSN
        # source read (in tests/gates: a window over the whole stream) —
        # cache it so the read runs once across the merge's two actions
        stats = self.table.merge_apply(batch, stats="light", persist_batch=True)
        # ledger AFTER the durable merge: crash in between re-runs the chunk
        self._cp.commit(
            BatchRecord(
                batch_id=int(chunk_id),
                src_offset_start=int(read_lsn),
                src_offset_end=int(read_lsn),
                rows_in=stats.rows_in,
                rows_applied=stats.rows_after_dedup,
                touched_buckets=stats.touched_buckets,
                snapshot_version=stats.snapshot_version,
                checksum=self.identity,
                status="COMMITTED",
                started_at=t0,
                committed_at=time.time(),
                duration_s=time.time() - t0,
            )
        )
        return stats


def incremental_snapshot_replay(
    table: TargetTable,
    binlog_batches: list[DataFrame],
    epoch_lsns: list[int],
    source_state_at: Callable[[int], DataFrame],
    start_lsn: int,
    n_chunks: int,
    prepare: Callable[[DataFrame, int], DataFrame] | None = None,
    chunk_prepare: Callable[[DataFrame], DataFrame] | None = None,
) -> dict:
    """Drive a full incremental snapshot: binlog epochs and snapshot
    chunks interleaved round-robin, both resumable.

    ``binlog_batches[e]`` holds the change events of epoch ``e`` (table
    columns + ``_seq/_op/_ts``), every event's ``_seq`` in
    ``(epoch_lsns[e-1], epoch_lsns[e]]`` — ``epoch_lsns`` are the per-
    epoch high watermarks a real source hands its consumer. Epochs apply
    through :func:`plans.replay.replay` (its checkpoint skips completed
    epochs on resume) with the global LSN floor at ``start_lsn``
    composed in front of the caller's ``prepare``. After epoch ``e``,
    ``ceil(n_chunks / len(binlog_batches))`` pending chunks are read via
    ``source_state_at(epoch_lsns[e])`` — a consistent full-row read at
    that LSN, the deterministic stand-in for "SELECT chunk, note LSN" —
    and merged stamped at that LSN. Chunks still pending after the last
    epoch drain at the final watermark.

    Returns ``{"epochs": [...BatchRecord...], "chunks": {chunk_id:
    MergeStats}}``.
    """
    if len(binlog_batches) != len(epoch_lsns):
        raise ValueError(
            f"{len(binlog_batches)} binlog epochs but {len(epoch_lsns)} epoch LSNs"
        )
    snap = ChunkedSnapshot(table, n_chunks)
    floor = int(start_lsn)

    def floored(df: DataFrame, epoch_id: int) -> DataFrame:
        live = df.where(F.col("_seq") > floor)
        return prepare(live, epoch_id) if prepare is not None else live

    n_epochs = max(1, len(binlog_batches))
    per_epoch = -(-n_chunks // n_epochs)  # ceil
    chunk_stats: dict[int, MergeStats] = {}

    # chunk reads ride replay()'s on_batch_end hook — the documented seam
    # that fires AFTER the epoch's checkpoint commit, so epoch numbering
    # stays replay's own (one list, batch_id = epoch index) and a resumed
    # run re-fires chunk work only for epochs it actually applies; chunks
    # orphaned by skipped epochs drain at the final watermark below.
    def _after_epoch(e: int, _table: TargetTable, _rec: BatchRecord) -> None:
        watermark = int(epoch_lsns[e])
        pending = snap.pending_chunks()[:per_epoch]
        if pending:
            state = source_state_at(watermark)
            for cid in pending:
                chunk_stats[cid] = snap.apply_chunk(
                    cid, state, watermark, prepare=chunk_prepare
                )

    records = replay(
        table,
        binlog_batches,
        prepare=floored,
        stats="light",
        on_batch_end=_after_epoch,
    )
    # drain any remainder (also: resume runs that crashed in the tail)
    remaining = snap.pending_chunks()
    if remaining:
        watermark = int(epoch_lsns[-1]) if epoch_lsns else floor
        state = source_state_at(watermark)
        for cid in remaining:
            chunk_stats[cid] = snap.apply_chunk(
                cid, state, watermark, prepare=chunk_prepare
            )
    return {"epochs": records, "chunks": chunk_stats}


def stream_incremental_snapshot(
    spark,
    events_dir: str,
    row_fields: list[tuple[str, str]],
    table: TargetTable,
    source_state_at: Callable[[int], DataFrame],
    start_lsn: int,
    n_chunks: int,
    chunks_per_epoch: int = 1,
    prepare: Callable[[DataFrame, int], DataFrame] | None = None,
    chunk_prepare: Callable[[DataFrame], DataFrame] | None = None,
    **kw,
):
    """The streaming embodiment: chunk reads ride the REAL Debezium file
    tail's epochs (``stream_debezium_replay``'s ``on_epoch_end`` seam —
    fires after each epoch's merge is durable). The chunk read LSN is the
    epoch's own delivered high watermark (``max(_seq)`` of the epoch — a
    one-row job over the already-parsed frame, the streaming stand-in
    for "SELECT chunk, note LSN"); an out-of-order LATER epoch carrying
    seqs below a chunk's stamp is exactly the DBLog window race and
    resolves through the max-seq merge (the chunk content at the stamp
    already reflects those events).

    Returns the StreamingQuery. The caller drains it
    (``awaitTermination``) and then calls ``drain_chunks`` for any
    chunks the delivered epochs didn't cover (short streams, or a crash
    in the tail):

        q = stream_incremental_snapshot(...); q.awaitTermination()
        drain_chunks(table, source_state_at, current_lsn, n_chunks)
    """
    from data_ingestor_py_spark.streaming.stream_debezium import (
        stream_debezium_replay,
    )

    snap = ChunkedSnapshot(table, n_chunks)
    floor = int(start_lsn)

    def floored(df: DataFrame, epoch_id: int) -> DataFrame:
        live = df.where(F.col("_seq") > floor)
        return (
            prepare(live, epoch_id) if prepare is not None
            else live.drop("src_op")
        )

    def after(epoch_id: int, ev: DataFrame) -> None:
        pending = snap.pending_chunks()[:chunks_per_epoch]
        if not pending:
            return
        row = ev.agg(F.max("_seq")).first()
        if row is None or row[0] is None:
            return  # empty epoch delivers no watermark to read at
        watermark = int(row[0])
        if watermark <= floor:
            return  # epoch was pure re-delivery below the snapshot start
        state = source_state_at(watermark)
        for cid in pending:
            snap.apply_chunk(cid, state, watermark, prepare=chunk_prepare)

    return stream_debezium_replay(
        spark, events_dir, row_fields, table,
        prepare=floored, on_epoch_end=after, **kw,
    )


def drain_chunks(
    table: TargetTable,
    source_state_at: Callable[[int], DataFrame],
    read_lsn: int,
    n_chunks: int,
    chunk_prepare: Callable[[DataFrame], DataFrame] | None = None,
) -> dict[int, MergeStats]:
    """Complete any chunks still pending after the stream drained (or
    after a crash), reading them at ``read_lsn`` — the source's CURRENT
    LSN, which is always a valid (re-)stamp."""
    snap = ChunkedSnapshot(table, n_chunks)
    out: dict[int, MergeStats] = {}
    remaining = snap.pending_chunks()
    if remaining:
        state = source_state_at(int(read_lsn))
        for cid in remaining:
            out[cid] = snap.apply_chunk(
                cid, state, int(read_lsn), prepare=chunk_prepare
            )
    return out

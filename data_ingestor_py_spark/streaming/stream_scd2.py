"""Streaming SCD2: fold a tailed event directory into an Scd2History per
micro-batch (the Structured-Streaming analogue of ``plans/scd.scd2_apply``
driven by ``plans/replay``-style batches).

Exactly-once without extra machinery: ``scd2_apply`` is idempotent end to
end — the closed-log segment is written once per segment identity, and a
re-delivered epoch finds every key late in the open table — so a Spark
restart re-running an epoch after a crash between our apply and Spark's
offset commit converges to the same history. No engine-side checkpoint
rows are needed (contrast ``stream_replay``, whose lineage counts would
inflate on re-delivery).

Ordering contract (inherited from scd2_apply): epochs must arrive per-key
ordered — true when the event files are written in seq order (the file
source processes by modification time) or when a single upstream producer
appends them. Violating events are COUNTED AND DROPPED (``n_late`` — see
plans/scd.py; rebuild via ``scd2_transform`` to honor a late backfill);
attach an ``on_epoch`` callback to observe per-epoch stats.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_ingestor_py_spark.plans.scd import Scd2History, Scd2Stats, scd2_apply
from data_ingestor_py_spark.streaming.stream_replay import start_foreach_stream


def stream_scd2(
    spark: SparkSession,
    events_dir: str,
    events_schema: str,
    history: Scd2History,
    key_cols: list[str],
    payload_cols: list[str],
    prepare: Callable[[DataFrame, int], DataFrame] | None = None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    on_epoch: Callable[[int, Scd2Stats], None] | None = None,
):
    """Tail ``events_dir`` (parquet) and fold each micro-batch into the
    history. Returns the StreamingQuery; with ``available_now`` the caller
    should ``awaitTermination()`` to drain."""
    reader = spark.readStream.schema(events_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_dir)

    def apply_epoch(df: DataFrame, epoch_id: int) -> None:
        batch = prepare(df, epoch_id) if prepare is not None else df
        st = scd2_apply(history, batch, key_cols, payload_cols)
        if on_epoch is not None:
            on_epoch(epoch_id, st)

    return start_foreach_stream(stream, apply_epoch, checkpoint_dir, available_now)

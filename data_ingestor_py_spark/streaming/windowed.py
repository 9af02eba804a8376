"""Watermarked event-time windowed aggregation (append mode) landed in a
:class:`TargetTable`.

The missing piece between the engine's per-key CDC consumers (replay /
Debezium / SCD2) and its batch aggregates: a STREAMING rollup that
tolerates out-of-order events. Tumbling/sliding event-time windows with a
watermark; a window's row is emitted EXACTLY ONCE, when the watermark
passes its end (append semantics). The lateness contract, as Spark
actually implements it (pinned by test_windowed_stream): an out-of-order
event still counts as long as its window has not yet been finalized —
even if it arrives below the watermark and opens that window — and is
dropped once the window was emitted and its state evicted. So emitted
rows are immutable (no retraction traffic at the sink) and loss is
bounded by the watermark delay, the two properties the merge relies on.

Landing: ``foreachBatch`` merges each batch of FINALIZED windows into a
TargetTable keyed ``group_cols + [window_start]``. The merge ``_seq`` is
the window start epoch — deterministic, so an epoch re-delivered after a
crash re-merges the identical rows and the table converges (the same
idempotence argument as stream_replay; Spark's own checkpoint dedups the
source, the merge closes the sink side).

Scale shape: windowed aggregation with watermark is Spark's bread and
butter — partial aggregation map-side, state store keyed (group,
window), eviction at watermark. Only closed windows ever reach the sink,
so sink traffic is O(closed windows), not O(events); the aggregate
columns are COUNT + integer SUMs (BIGINT — float sums would make the
emitted row depend on summation order, which the oracle gate forbids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.streaming.stream_replay import start_foreach_stream


def windowed_agg(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 day",
    slide: str | None = None,
    watermark: str = "1 hour",
    group_cols: list[str] | None = None,
    sum_cols: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Watermarked windowed aggregation plan (works on batch AND stream
    frames — the batch run is the oracle's reference semantics).
    Output: group cols + ``window_start`` (epoch seconds, long) +
    ``n_events`` + one BIGINT sum per ``(out_name, src_col)``."""
    group_cols = list(group_cols or [])
    sum_cols = list(sum_cols or [])
    w = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    df = events.withWatermark(ts_col, watermark)
    return (
        df.groupBy(w.alias("_w"), *group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            *[
                F.sum(F.col(c).cast("long")).alias(n)
                for n, c in sum_cols
            ],
        )
        .select(
            *group_cols,
            # epoch seconds via timestamp->double cast — the session_window
            # gate's established idiom; the intermediate cast also accepts
            # TIMESTAMP_NTZ inputs (NTZ cannot cast straight to double)
            F.floor(
                F.col("_w.start").cast("timestamp").cast("double")
            ).cast("long").alias("window_start"),
            "n_events",
            *[n for n, _ in sum_cols],
        )
    )


def create_window_table(
    spark: SparkSession,
    root: str,
    group_cols: list[str],
    sum_cols: list[tuple[str, str]] | None = None,
    num_buckets: int = 8,
) -> TargetTable:
    cols = [("n_events", "long")] + [(n, "long") for n, _ in (sum_cols or [])]
    return TargetTable.create(
        spark, root,
        key_cols=list(group_cols) + ["window_start"],
        columns=cols, num_buckets=num_buckets,
    )


def stream_windowed_to_table(
    spark: SparkSession,
    events_dir: str,
    events_schema: str,
    table: TargetTable,
    ts_col: str = "ts",
    window: str = "1 day",
    slide: str | None = None,
    watermark: str = "1 hour",
    group_cols: list[str] | None = None,
    sum_cols: list[tuple[str, str]] | None = None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
):
    """Tail a parquet directory, aggregate into watermarked windows, and
    merge every FINALIZED window row into ``table`` (append mode: each
    window arrives once; crash re-delivery converges via the idempotent
    max-seq merge with ``_seq`` = window start)."""
    group_cols = list(group_cols or [])
    sum_names = [n for n, _ in (sum_cols or [])]
    reader = spark.readStream.schema(events_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = windowed_agg(
        reader.parquet(events_dir),
        ts_col=ts_col, window=window, slide=slide, watermark=watermark,
        group_cols=group_cols, sum_cols=sum_cols,
    )

    def apply_epoch(df: DataFrame, epoch_id: int) -> None:
        batch = df.select(
            *[F.col(g).cast("string").alias(g) for g in group_cols],
            F.col("window_start").cast("string").alias("window_start"),
            "n_events",
            *sum_names,
            F.col("window_start").alias("_seq"),
            F.lit("U").alias("_op"),
            F.lit(None).cast("timestamp").alias("_ts"),
        )
        # epoch-sized window rollup; cache across the merge's two actions
        # (foreachBatch frames re-execute the windowed agg per action)
        table.merge_apply(batch, stats="light", persist_batch=True)

    return start_foreach_stream(
        stream, apply_epoch, checkpoint_dir, available_now,
        output_mode="append",
    )

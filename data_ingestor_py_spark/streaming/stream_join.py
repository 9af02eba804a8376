"""Watermarked stream-stream interval join (attribution shape).

Two unbounded streams joined on a key plus an event-time interval —
"purchase within N of the view", the attribution query every event
pipeline ends up running. Spark's stream-stream inner join holds both
sides in state and emits a pair the moment both rows exist; the
watermarks plus the time-range condition bound that state (rows age out
once no future match is possible), which is what lets the join run
forever at 100 TB instead of accreting both streams.

Emission determinism: an INNER interval join's result set does not
depend on epoch boundaries — a pair is emitted exactly once whenever
both halves have arrived (late halves beyond the watermark lose their
state and the pair is dropped, the same bounded-lateness contract as
streaming/windowed.py). So the batch run of the same join IS the
oracle, and crash re-delivery converges through the idempotent merge:
the sink table is keyed by BOTH sides' ids and every re-delivered pair
carries the same payload and ``_seq``.

The reference has no streaming join at all (one pipeline per source,
fileprocesser/processor.py); this is the capability a whole-database
tail needs to correlate two of its tables in flight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.streaming.stream_replay import start_foreach_stream


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_id: str,
    right_id: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 day",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """The join plan, identical on batch and stream frames (the batch
    run is the oracle's semantics). Output: key cols + ``left_id`` /
    ``right_id`` + ``lag_s`` (right minus left, whole seconds).

    Condition: equal keys AND ``left_ts <= right_ts <= left_ts +
    within`` — the time bound is what lets the streaming state evict
    (a left row older than ``right watermark - within`` can never match
    again)."""
    l = left.withWatermark(left_ts, watermark).select(
        *[F.col(c).alias(f"_lk_{c}") for c in key_cols],
        F.col(left_id).alias("_lid"),
        F.col(left_ts).alias("_lts"),
    )
    r = right.withWatermark(right_ts, watermark).select(
        *[F.col(c).alias(f"_rk_{c}") for c in key_cols],
        F.col(right_id).alias("_rid"),
        F.col(right_ts).alias("_rts"),
    )
    cond = F.lit(True)
    for c in key_cols:
        cond = cond & (F.col(f"_lk_{c}") == F.col(f"_rk_{c}"))
    cond = (
        cond
        & (F.col("_rts") >= F.col("_lts"))
        & (F.col("_rts") <= F.col("_lts") + F.expr(f"INTERVAL {within}"))
    )
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how {how!r} not in ('inner', 'left_outer')")
    return l.join(r, cond, how).select(
        *[F.col(f"_lk_{c}").alias(c) for c in key_cols],
        F.col("_lid").alias(left_id),
        F.col("_rid").alias(right_id),
        # intermediate timestamp cast: NTZ columns cannot cast straight
        # to double (same idiom as streaming/windowed.py)
        F.floor(
            F.col("_rts").cast("timestamp").cast("double")
            - F.col("_lts").cast("timestamp").cast("double")
        ).cast("long").alias("lag_s"),
    )


def create_join_table(
    spark: SparkSession,
    root: str,
    key_cols: list[str],
    left_id: str,
    right_id: str,
    num_buckets: int = 8,
) -> TargetTable:
    return TargetTable.create(
        spark, root,
        key_cols=list(key_cols) + [left_id, right_id],
        columns=[("lag_s", "long")],
        num_buckets=num_buckets,
    )


def stream_interval_join_to_table(
    spark: SparkSession,
    left_dir: str,
    left_schema: str,
    right_dir: str,
    right_schema: str,
    table: TargetTable,
    key_cols: list[str],
    left_id: str,
    right_id: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "1 day",
    watermark: str = "1 hour",
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    how: str = "inner",
):
    """Tail two parquet directories, interval-join them, and merge every
    result row into ``table`` keyed (key, left_id, right_id). ``_seq``
    is constant — a row's payload is immutable, so any re-delivery
    merges the identical row (exactly-once landing).

    ``how="left_outer"``: matched pairs emit as they match; an UNMATCHED
    left row emits null-padded only after the watermark proves no match
    can still arrive (state eviction), so outer results trail by the
    watermark delay — drive a sentinel through BOTH streams to flush
    them in tests/batch-style runs (the global watermark is the MIN
    across sources). NULL ``right_id`` is a real key component in the
    sink table, so the null-padded row coexists with nothing and
    re-delivers idempotently."""

    def reader(schema):
        rd = spark.readStream.schema(schema)
        if max_files_per_trigger:
            rd = rd.option("maxFilesPerTrigger", max_files_per_trigger)
        return rd

    joined = interval_join(
        reader(left_schema).parquet(left_dir),
        reader(right_schema).parquet(right_dir),
        key_cols, left_id, right_id,
        left_ts=left_ts, right_ts=right_ts,
        within=within, watermark=watermark, how=how,
    )

    def apply_epoch(df: DataFrame, epoch_id: int) -> None:
        batch = df.select(
            *[F.col(c).cast("string").alias(c) for c in key_cols],
            F.col(left_id).cast("string").alias(left_id),
            F.col(right_id).cast("string").alias(right_id),
            "lag_s",
            F.lit(1).cast("long").alias("_seq"),
            F.lit("U").alias("_op"),
            F.lit(None).cast("timestamp").alias("_ts"),
        )
        # foreachBatch frames re-execute their lineage per action, and the
        # merge is two actions — cache the (epoch-sized) join output so the
        # stateful join stage runs once per epoch, not twice
        table.merge_apply(batch, stats="light", persist_batch=True)

    return start_foreach_stream(
        joined, apply_epoch, checkpoint_dir, available_now,
        output_mode="append",
    )

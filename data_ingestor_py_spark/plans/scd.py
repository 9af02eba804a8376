"""SCD Type-2 history maintenance from a CDC stream.

The other classic downstream of a binlog tail (beside the merged current
state and the delta-maintained aggregate): a slowly-changing-dimension
history table where every row version is an interval —
``(key, payload, valid_from, valid_to)`` with ``valid_to IS NULL`` marking
the current version. Updates close the previous interval and open a new
one; deletes close without opening.

Two forms:

- :func:`scd2_transform` — stateless: full history from a complete event
  set in ONE window pass (one shuffle on the key). Use for backfills and
  as the verification reference.
- :func:`scd2_apply` — incremental: maintain a history
  :class:`TargetTable` batch by batch. The trick that makes this a plain
  merge instead of a rewrite: a history row is keyed by
  ``(key..., valid_from)`` and merged with ``_seq = coalesce(valid_to,
  valid_from)`` — closing an interval re-emits the same keyed row with a
  strictly larger ``_seq`` (``valid_to > valid_from`` always), so the
  engine's max-seq dedup makes "close" win over "open" idempotently, and
  re-applying any batch is harmless (exactly-once without new machinery).

Scale shape of ``scd2_apply``: one window over the batch (shuffle on key),
one bucket-PRUNED read of currently-open rows (the history table is
bucketed by the key columns only, so a batch's keys map to a bounded
bucket set regardless of history depth), and one merge whose write
touches only those buckets. History grows without bound; the apply cost
tracks the batch, not the history.

Ordering contract: within a batch, any order (the window sorts). ACROSS
batches the feed must be per-key ordered (a real binlog tail is); a
cross-batch late event — older than its key's open interval — cannot be
spliced into already-written history and is counted + dropped
(``n_late``), mirroring how warehouse SCD2 loaders treat late feeds.
Rebuild via :func:`scd2_transform` when a late backfill must be honored.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.target import TargetTable, _bucket_expr


def _one_change_per_seq(events: DataFrame, key_cols, seq_col) -> DataFrame:
    """Duplicate deliveries of the same change (same key + seq — an
    at-least-once feed replaying) are ONE change: collapse them with the
    engine's deterministic winner rule (max payload struct — M9 parity)
    before any windowing, or `lead` would mint zero-width phantom
    intervals out of the replays. Max-struct groupBy: map-side combine
    shrinks replays before the shuffle (same shape as latest_by_key, which
    can't be reused verbatim here — seq doubles as part of the key)."""
    others = [c for c in events.columns if c not in (*key_cols, seq_col)]
    return (
        events.groupBy(*key_cols, seq_col)
        .agg(F.max(F.struct(*others)).alias("_w"))
        .select(
            *key_cols, seq_col, *[F.col("_w")[c].alias(c) for c in others]
        )
    )


def scd2_transform(
    events: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    seq_col: str = "_seq",
    op_col: str = "_op",
) -> DataFrame:
    """Full SCD2 history from a complete event set: one window pass.
    Every event closes its key's previous interval (``lead`` over seq);
    delete events close without opening (they emit no row)."""
    events = _one_change_per_seq(events, key_cols, seq_col)
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col))
    return (
        events.withColumn("valid_to", F.lead(seq_col).over(w))
        .where(F.col(op_col) != "D")
        .select(
            *key_cols,
            *payload_cols,
            F.col(seq_col).alias("valid_from"),
            "valid_to",
        )
    )


@dataclass
class Scd2Stats:
    rows_in: int  # history rows merged (opens + carry-over closes)
    n_late: int  # keys dropped for violating cross-batch ordering
    snapshot_version: int


def create_history_table(
    spark,
    root: str,
    key_cols: list[str],
    payload_cols: list[tuple[str, str]],
    num_buckets: int = 64,
    storage=None,
) -> TargetTable:
    """History TargetTable: keyed by (key..., valid_from), BUCKETED by the
    key columns only — all versions of a key co-locate, so the open-row
    lookup and the merge write stay bucket-pruned as history deepens."""
    return TargetTable.create(
        spark,
        root,
        key_cols=[*key_cols, "valid_from"],
        columns=[*payload_cols, ("valid_to", "long")],
        num_buckets=num_buckets,
        bucket_cols=key_cols,
        storage=storage,
    )


def scd2_apply(
    history: TargetTable,
    batch: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    seq_col: str = "_seq",
    op_col: str = "_op",
    ts_col: str = "_ts",
) -> Scd2Stats:
    """Fold one CDC batch into the history table (see module docstring for
    the merge trick and the ordering contract)."""
    m = history._load()
    B, bucket_cols = m["num_buckets"], m.get("bucket_cols")
    batch = _one_change_per_seq(batch, key_cols, seq_col)

    # 1) within-batch chaining: every event (incl. deletes) closes its
    #    predecessor; non-delete events open intervals
    w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col))
    chained = batch.withColumn("_next_seq", F.lead(seq_col).over(w))
    firsts = batch.groupBy(*key_cols).agg(F.min(seq_col).alias("_first_seq"))

    # 2) currently-open rows for the batch's keys, bucket-pruned: the
    #    batch's keys bound the bucket set (history depth is irrelevant)
    touched = sorted(
        r["bkt"]
        for r in batch.select(
            _bucket_expr(bucket_cols, B).alias("bkt")
        ).distinct().collect()
    )
    state = history._state_df(m, touched).where(F.col("_op") != "D")
    open_rows = state.where(F.col("valid_to").isNull()).select(
        *[F.col(c).alias(f"_k_{c}") for c in key_cols],
        F.col("valid_from").cast("long").alias("_open_from"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
        F.col(ts_col).alias("_open_ts"),
    )
    cond = F.lit(True)
    for c in key_cols:
        cond = cond & F.col(f"_k_{c}").eqNullSafe(F.col(c))
    # persisted: three consumers (late count, carry-over closes, the
    # anti-join) would otherwise each recompute the open-row join; the
    # frame is one row per batch-key-with-open-history — batch-bounded
    joined = firsts.join(open_rows, cond, "inner").persist()

    # late-feed guard: an open interval at-or-after the batch's first event
    # for that key means the feed violated cross-batch ordering; those
    # keys' events cannot splice into written history and are dropped
    # (counted). Note this also makes a direct RE-apply of an
    # already-applied batch a clean no-op: every key then looks late, the
    # delta is empty, and the table is untouched.
    late_keys = joined.where(F.col("_first_seq") <= F.col("_open_from")).select(
        *[F.col(f"_k_{c}").alias(c) for c in key_cols]
    )
    n_late = late_keys.count()
    closers = joined.where(F.col("_first_seq") > F.col("_open_from"))

    # 3) history deltas, all merged in one call:
    #    a) carried-over open rows get closed (same keyed row, larger _seq)
    closed_prev = closers.select(
        *[F.col(f"_k_{c}").alias(c) for c in key_cols],
        F.col("_open_from").cast("string").alias("valid_from"),
        *[F.col(f"_p_{c}").alias(c) for c in payload_cols],
        F.col("_first_seq").alias("valid_to"),
        F.col("_first_seq").alias(seq_col),
        F.lit("U").alias(op_col),
        F.col("_open_ts").alias(ts_col),
    )
    #    b) batch events open intervals (closed within-batch by _next_seq)
    opened = chained.where(F.col(op_col) != "D").select(
        *key_cols,
        F.col(seq_col).cast("string").alias("valid_from"),
        *payload_cols,
        F.col("_next_seq").cast("long").alias("valid_to"),
        F.coalesce(F.col("_next_seq"), F.col(seq_col)).alias(seq_col),
        F.lit("U").alias(op_col),
        F.col(ts_col),
    )
    if n_late:
        opened = opened.join(late_keys, key_cols, "left_anti")
    delta = closed_prev.unionByName(opened)
    try:
        st = history.merge_apply(delta, stats="light")
    finally:
        joined.unpersist()
    return Scd2Stats(
        rows_in=st.rows_in,
        n_late=n_late,
        snapshot_version=st.snapshot_version,
    )


def read_history(history: TargetTable) -> DataFrame:
    """Visible history intervals with the derived ``is_current`` flag."""
    df = history.read()
    return df.select(
        *[c for c in df.columns if not c.startswith("_")],
        F.col("valid_to").isNull().alias("is_current"),
    ).withColumn("valid_from", F.col("valid_from").cast("long"))
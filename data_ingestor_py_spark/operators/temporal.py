"""Temporal joins Spark lacks as built-ins: as-of join and bounded range
join, built as compositions of shuffle-friendly DataFrame ops (SURVEY §2.3
"operators the engine adds"; the reference has no temporal joins at all —
its lookups are exact-key dictionary joins, helpers.py load_json_mapping).

Both are written for the 100 TB shape:

- ``asof_join`` is the union/window carry-forward trick: ONE hash shuffle
  on the key, a single sort per partition, no per-row lookups and no range
  cross-join. This is how you join a 10^10-row event stream against a
  slowly-changing dimension's change log.
- ``range_self_join_counts`` buckets time into window-sized cells and joins
  only adjacent cells, so candidate pairs are O(n x density), never the
  O(n^2) a naive inequality join plans to.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """Annotate each left row with the value columns of the most recent
    right row at-or-before its timestamp, per key (backward as-of, inclusive
    — DuckDB/pandas ``ASOF JOIN`` semantics).

    Implementation: tag and union both sides, sort each key partition by
    ``(ts, right-first)``, carry the last non-null right-payload struct
    forward, keep left rows. At equal timestamps the right row sorts first,
    so a left row sees a same-instant right row (inclusive bound). If the
    right side can hold several rows per (key, ts), reduce it first — the
    carry-forward would otherwise pick the last in sort order.
    """
    lcols = [c for c in left.columns]
    payload = F.struct(*[F.col(c) for c in value_cols])
    r = right.select(
        *on,
        F.col(ts_col),
        payload.alias("_rpay"),
        F.lit(1).alias("_is_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on and c != ts_col],
    )
    l = left.select(
        *on,
        F.col(ts_col),
        F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
        F.lit(0).alias("_is_r"),
        *[F.col(c) for c in lcols if c not in on and c != ts_col],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc(ts_col), F.desc("_is_r"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = F.last("_rpay", ignorenulls=True).over(w)
    out = (
        r.unionByName(l.select(*r.columns))
        .withColumn("_carried", carried)
        .where(F.col("_is_r") == 0)
    )
    return out.select(
        *lcols, *[F.col("_carried")[c].alias(c) for c in value_cols]
    )


def range_self_join_counts(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    window_s: int,
) -> DataFrame:
    """For every row, count OTHER rows of the same key within ±``window_s``
    seconds — the bounded range self-join (near-duplicate burst detection,
    event-coincidence features).

    Scale shape: each row lands in one time cell of width ``window_s``; the
    probe side explodes to its cell ±1, so every qualifying pair meets in
    exactly one (key, cell) bucket. The equi-join on (key, cell) is an
    ordinary hash shuffle; the |dt| filter runs post-join on cell-local
    candidates. Timestamps compare as exact epoch doubles (microsecond
    resolution is representable: 1.7e15 < 2^53)."""
    # NTZ timestamps cannot cast to double directly; route through
    # timestamp_ltz (session tz is pinned to UTC in session.py, so the
    # epoch equals DuckDB's epoch() of the naive value, microsecond-exact)
    ep = F.col(ts_col).cast("timestamp").cast("double")
    cell_a = F.floor(F.col("_ta") / window_s).cast("long")
    probe = df.select(
        *key_cols, F.col(id_col).alias("_ida"), ep.alias("_ta")
    ).withColumn("_cell", F.explode(F.array(cell_a - 1, cell_a, cell_a + 1)))
    build = df.select(
        *key_cols, F.col(id_col).alias("_idb"), ep.alias("_tb")
    ).withColumn("_cell", F.floor(F.col("_tb") / window_s).cast("long"))
    pairs = (
        probe.join(build, [*key_cols, "_cell"])
        .where((F.col("_ida") != F.col("_idb")) & (F.abs(F.col("_ta") - F.col("_tb")) <= window_s))
        .groupBy("_ida")
        .agg(F.count(F.lit(1)).alias("n_neighbors"))
    )
    return (
        df.select(F.col(id_col).alias("_ida"))
        .join(pairs, "_ida", "left")
        .select(
            F.col("_ida").alias(id_col),
            F.coalesce(F.col("n_neighbors"), F.lit(0)).alias("n_neighbors"),
        )
    )

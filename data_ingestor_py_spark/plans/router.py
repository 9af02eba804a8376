"""Multi-table CDC fan-out: one Debezium connector stream -> N tables.

A real Debezium connector captures a whole database: its topic (or the
file a Kafka-Connect sink lands it in) interleaves change events for
MANY tables, distinguished by ``source.table``. The reference processes
one logical table per configured pipeline (fileprocesser/processor.py
wires exactly one producer to one consumer); a production binlog tail
needs the fan-out: route each envelope to its table's schema + target,
keep one *coordinated* source checkpoint so resume logic covers the
whole batch (not N independent per-table offsets that can diverge), and
account for every input line (routed, tombstone-dropped, or
quarantined — nothing silent).

Scale shape (100 TB / 1000-executor reading):
- The raw batch is scanned ONCE per routed table subset, but the common
  pre-parse (``op``/``ts_ms``/``source`` only — ``from_json`` with a
  partial schema skips the row images) and the table filter run inside
  the same codegen stage as the scan, so each table's full envelope
  parse touches only its own rows. With ``persist=True`` (default) the
  raw lines are cached across the fan-out so the text scan itself also
  runs once; beyond a couple of routes prefer ``stage_dir``: one job
  writes the batch partitioned by table (parquet, splittable), then
  every table's merge reads only its partition directory — the classic
  one-pass demultiplex. Measured (BENCH/BASELINE.md): 11x faster than
  the cached path at 1M events x 4 tables with identical final state —
  the cached path still re-parses EVERY line once per route.
- Per-table merges are independent jobs on disjoint TargetTables;
  ``max_parallel_tables > 1`` submits them concurrently from driver
  threads (Spark's scheduler interleaves the stages), which is how N
  small tables keep a big cluster busy instead of serializing N
  barriers.
- Crash contract: the coordinated BatchRecord commits only after EVERY
  route applied; a crash mid-fan-out leaves the batch unrecorded and
  the resume re-applies all routes — safe because the merge is
  idempotent (max-``_seq`` winner per key is insensitive to
  re-application), the same argument as plans/replay.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_ingestor_py_spark.plans.checkpoint import BatchRecord, Checkpoint
from data_ingestor_py_spark.plans.target import MergeStats, TargetTable
from data_ingestor_py_spark.sources.debezium import dead_letters, parse_debezium

# partial envelope schema for the routing pre-parse: from_json ignores
# fields absent from the schema, so the (potentially wide) row images are
# never materialized on the routing path
_ROUTE_SCHEMA = T.StructType(
    [
        T.StructField("op", T.StringType(), True),
        T.StructField(
            "source",
            T.StructType([T.StructField("table", T.StringType(), True)]),
            True,
        ),
    ]
)


@dataclass
class TableRoute:
    """One destination table of the fan-out.

    ``table_id`` matches the envelope's ``source.table``; ``row_fields``
    is the table's envelope row schema (spec vocabulary, as in
    sources/debezium.debezium_schema); ``prepare(df, batch_id)``
    optionally maps the normalized change events to the target's
    columns (defaults to dropping ``src_op``)."""

    table_id: str
    row_fields: list[tuple[str, str]]
    table: TargetTable
    prepare: Callable[[DataFrame, int], DataFrame] | None = None
    salt_buckets: int | str = 0
    stats: str = "light"


class DebeziumRouter:
    """Fan one Debezium envelope stream out to N :class:`TargetTable`\\ s
    with a single coordinated checkpoint under ``root``."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        routes: list[TableRoute],
        ts_ms_fallback: bool = True,
        dead_letter_dir: str | None = None,
        max_parallel_tables: int = 1,
        stage_dir: str | None = None,
    ):
        ids = [r.table_id for r in routes]
        if len(set(ids)) != len(ids):
            raise ValueError(f"duplicate table_id in routes: {sorted(ids)}")
        self.spark = spark
        self.root = root
        self.routes = list(routes)
        self.ts_ms_fallback = ts_ms_fallback
        self.dead_letter_dir = dead_letter_dir
        self.max_parallel_tables = max(1, int(max_parallel_tables))
        self.stage_dir = stage_dir
        self.cp = Checkpoint(spark, root)

    # ---------------- routing ----------------

    def _table_col(self):
        return F.from_json(F.col("value"), _ROUTE_SCHEMA)["source"]["table"]

    def _with_table(self, raw: DataFrame) -> DataFrame:
        """Ensure a ``_table`` routing column: derived by the partial
        pre-parse for wire frames, already present (as a partition
        column, so filters prune directories) for staged frames."""
        if "_table" in raw.columns:
            return raw
        return raw.withColumn("_table", self._table_col())

    def route(self, raw: DataFrame) -> dict[str, DataFrame]:
        """Per-table normalized change-event frames (lazy). The table
        filter and the full envelope parse fuse into one codegen stage
        over the subset, so table A's parse never touches table B's
        rows."""
        wt = self._with_table(raw)
        return {
            r.table_id: parse_debezium(
                wt.where(F.col("_table") == r.table_id),
                r.row_fields,
                ts_ms_fallback=self.ts_ms_fallback,
            )
            for r in self.routes
        }

    def quarantine(self, raw: DataFrame) -> DataFrame:
        """Every input line NOT accounted for by the fan-out: non-empty,
        non-tombstone lines whose table matches no route (or is absent),
        plus — per routed table — that table's dead letters (malformed
        JSON, non-row ops, imageless / seq-less records). The exact
        complement of the union of :meth:`route`'s outputs modulo Kafka
        tombstones, same accounting contract as
        sources/debezium.dead_letters."""
        wt = self._with_table(raw)
        t = F.col("_table")
        nonempty = F.col("value").isNotNull() & (
            F.length(F.trim(F.col("value"))) > 0
        )
        known = F.lit(False)
        for r in self.routes:
            known = known | (t == r.table_id)
        unknown = wt.where(nonempty & ~F.coalesce(known, F.lit(False))).select(
            F.col("value").alias("raw")
        )
        out = unknown
        for r in self.routes:
            out = out.unionByName(
                dead_letters(
                    wt.where(t == r.table_id),
                    r.row_fields,
                    ts_ms_fallback=self.ts_ms_fallback,
                )
            )
        return out

    # ---------------- batch application ----------------

    def _apply_route(
        self, r: TableRoute, events: DataFrame, batch_id: int
    ) -> MergeStats:
        batch = (
            r.prepare(events, batch_id)
            if r.prepare is not None
            else events.drop("src_op")
        )
        return r.table.merge_apply(
            batch, salt_buckets=r.salt_buckets, stats=r.stats
        )

    def apply_batch(
        self, raw: DataFrame, batch_id: int, persist: bool = True
    ) -> dict[str, MergeStats] | None:
        """Apply one raw envelope batch to every route; commit ONE
        coordinated checkpoint record when all routes are in. Returns
        per-table merge stats, or None if ``batch_id`` was already
        committed (resume skip)."""
        if batch_id in self.cp.committed_batches(exclude_streams=True):
            return None
        t0 = time.time()
        stats = self.fan_out(raw, batch_id, persist)
        t1 = time.time()
        seqs = [s for s in stats.values() if s.rows_in]
        rec = BatchRecord(
            batch_id=batch_id,
            src_offset_start=min((s.seq_min for s in seqs), default=0),
            src_offset_end=max((s.seq_max for s in seqs), default=0),
            rows_in=sum(s.rows_in for s in stats.values()),
            rows_applied=sum(s.rows_after_dedup for s in stats.values()),
            touched_buckets=sum(s.touched_buckets for s in stats.values()),
            snapshot_version=max(
                (s.snapshot_version for s in stats.values()), default=0
            ),
            # per-table snapshot versions ride the free-form checksum slot
            # so the coordinated record can answer "which snapshot of each
            # table does this source offset correspond to"
            checksum=json.dumps(
                {k: s.snapshot_version for k, s in sorted(stats.items())}
            ),
            status="COMMITTED",
            started_at=t0,
            committed_at=t1,
            duration_s=t1 - t0,
        )
        self.cp.commit(rec)
        return stats

    def fan_out(
        self, raw: DataFrame, batch_id: int, persist: bool
    ) -> dict[str, MergeStats]:
        """Quarantine + route + merge every table for one raw batch (no
        checkpoint bookkeeping — idempotent, so both the batch driver and
        the streaming driver can re-run it safely)."""
        if self.stage_dir is not None:
            # one-pass demultiplex: a single job writes the batch
            # partitioned by table (splittable parquet); every downstream
            # filter then prunes to its own partition directory instead of
            # re-scanning the whole wire batch. The cluster-scale
            # alternative to driver-local caching for very wide fan-outs.
            path = os.path.join(self.stage_dir, f"batch-{batch_id:06d}")
            self._with_table(raw).select("value", "_table").write.mode(
                "overwrite"
            ).partitionBy("_table").parquet(path)
            raw = self.spark.read.parquet(path)
            persist = False
        if persist:
            raw = raw.persist()
        try:
            if self.dead_letter_dir is not None:
                # overwrite into the batch-keyed partition dir: idempotent
                # under re-application (same discipline as
                # stream_debezium_replay's per-epoch quarantine)
                self.quarantine(raw).write.mode("overwrite").json(
                    os.path.join(self.dead_letter_dir, f"batch={batch_id}")
                )
            routed = self.route(raw)
            stats: dict[str, MergeStats] = {}
            if self.max_parallel_tables > 1:
                # disjoint tables -> independent Spark jobs; concurrent
                # submission lets the scheduler interleave their stages
                with ThreadPoolExecutor(self.max_parallel_tables) as ex:
                    futs = {
                        r.table_id: ex.submit(
                            self._apply_route, r, routed[r.table_id], batch_id
                        )
                        for r in self.routes
                    }
                    stats = {k: f.result() for k, f in futs.items()}
            else:
                for r in self.routes:
                    stats[r.table_id] = self._apply_route(
                        r, routed[r.table_id], batch_id
                    )
        finally:
            if persist:
                raw.unpersist()
        return stats

    def replay(
        self, raw_batches: list[DataFrame], persist: bool = True
    ) -> list[dict[str, MergeStats]]:
        """Drive a list of raw envelope batches through the fan-out,
        skipping batches the coordinated checkpoint already recorded
        (resume)."""
        out = []
        for i, raw in enumerate(raw_batches):
            st = self.apply_batch(raw, i, persist=persist)
            if st is not None:
                out.append(st)
        return out

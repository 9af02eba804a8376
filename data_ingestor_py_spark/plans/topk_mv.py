"""Delta-maintained per-group TOP-K views.

"Top k rows per group by a value" is the leaderboard / hottest-keys /
largest-files query every CDC downstream eventually wants, and the one
aggregate family plans/mv.py cannot express: the state is a SET of rows,
not a scalar. Recomputing it per batch is the usual 100 TB anti-pattern;
this module maintains it from the changelog with the same targeted-
recompute discipline the MIN/MAX columns use — MIN/MAX is exactly the
k = 1 case:

- **inserts fold for free**: a new image either beats the stored k-th
  (splice it into the stored k rows — a window over ≤ k + delta rows per
  group) or it is provably outside the top-k and is ignored;
- **retractions use the boundary rule**: a retracted old image matters
  iff it ties-or-beats the stored k-th (it may have BEEN a member), or
  the group stores fewer than k rows (every member is load-bearing);
  only those groups re-aggregate, from the source pinned at the fold's
  target version, filtered to exactly those groups with a broadcast
  semi-join. A typical batch touches no leaderboard rows, so the
  common-case refresh is O(delta); the worst case is one filtered source
  scan, never a recompute of untouched groups.

Ordering is (order_col DESC, tiebreak_cols ASC) — the tiebreak makes
ranks total and deterministic, which the oracle gate requires and equal
values would otherwise break.

State layout: a :class:`TargetTable` keyed ``group_cols + ["rank"]``
(rank 1..k as a string key, zero-padded so string order == numeric
order) holding the member's identity and value. Changed groups rewrite
at most k rows + tombstones for ranks the group no longer fills; the
table inherits snapshots, CAS commits and crash-safe merges.

Crash contract: a top-k fold is NOT re-foldable (the stored state the
membership checks read would already include the fold), so like
plans/mv.py every fold commits its target version as ``app_meta`` inside
the MV-table merge; a crash between fold and checkpoint rolls the
checkpoint forward instead of re-folding.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.checkpoint import BatchRecord, Checkpoint
from data_ingestor_py_spark.plans.mv import RefreshGapError, roll_forward_pending
from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.storage import StorageAdapter

_RANK_W = 6  # zero-pad width for the rank key (string order == numeric)


class IncrementalTopK:
    """Top-``k`` rows per group by ``order_col``, maintained from the
    source table's changelog. ``tiebreak_cols`` is ``[(col, dtype)]``
    (ascending, compared AFTER the descending value — defaults to the
    source key columns as strings); ``order_type`` is the stored dtype of
    the value column.

    Limitation: NULL group values are not supported — the maintenance
    joins here are name-based (null-unsafe), so a NULL group would
    silently stop being maintained. Normalize NULLs upstream (the
    ``n_stored IS NULL -> re-aggregate`` guard catches a lagging MV, not
    a NULL group)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        source: TargetTable,
        group_cols: list[str],
        order_col: str,
        k: int,
        order_type: str = "double",
        tiebreak_cols: list[tuple[str, str]] | None = None,
        storage: StorageAdapter | None = None,
    ):
        self.spark = spark
        self.source = source
        self.group_cols = list(group_cols)
        self.order_col = order_col
        self.k = int(k)
        self.order_type = order_type
        src_keys = source._load()["key_cols"]
        self.tiebreak_cols = list(
            tiebreak_cols
            if tiebreak_cols is not None
            else [(c, "string") for c in src_keys]
        )
        self.table = TargetTable(spark, root, storage=storage)
        self.cp = Checkpoint(spark, root, storage=self.table.io)

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        source: TargetTable,
        group_cols: list[str],
        order_col: str,
        k: int,
        order_type: str = "double",
        tiebreak_cols: list[tuple[str, str]] | None = None,
        num_buckets: int = 4,
        storage: StorageAdapter | None = None,
    ) -> "IncrementalTopK":
        src_keys = source._load()["key_cols"]
        tbs = list(
            tiebreak_cols
            if tiebreak_cols is not None
            else [(c, "string") for c in src_keys]
        )
        cols = [(f"i_{c}", t) for c, t in tbs] + [("val", order_type)]
        TargetTable.create(
            spark, root, key_cols=list(group_cols) + ["rank"],
            columns=cols, num_buckets=num_buckets, storage=storage,
        )
        return cls(
            spark, root, source, group_cols, order_col, k,
            order_type=order_type, tiebreak_cols=tbs, storage=storage,
        )

    # ---------------- state ----------------

    def read(self) -> DataFrame:
        """(group..., rank (long), tiebreak identity cols..., val)."""
        return self.table.read().select(
            *self.group_cols,
            F.col("rank").cast("long").alias("rank"),
            *[f"i_{c}" for c, _ in self.tiebreak_cols],
            "val",
        )

    def synced_version(self) -> int:
        done = self.cp.committed_batches()
        return max(done) if done else 0

    # ---------------- ordering helpers ----------------

    def _order_exprs(self, val, items: list):
        return [F.desc(val)] + [F.asc(c) for c in items]

    @staticmethod
    def _ties_or_beats(val_a, items_a: list, val_b, items_b: list):
        """(val_a, items_a) sorts at-or-before (val_b, items_b) under
        (DESC val, ASC items) — the boundary rule's comparator."""
        eq = F.lit(True)
        better = val_a > val_b
        eq = eq & (val_a == val_b)
        for a, b in zip(items_a, items_b):
            better = better | (eq & (a < b))
            eq = eq & (a == b)
        return better | eq

    # ---------------- refresh ----------------

    def _roll_forward_pending(self, v_from: int) -> BatchRecord | None:
        return roll_forward_pending(self.table, self.cp, "topk", v_from)

    def _source_rows(self, df: DataFrame) -> DataFrame:
        """(group..., item..., val) projection of source-shaped rows."""
        return df.select(
            *[F.col(g).cast("string").alias(g) for g in self.group_cols],
            *[
                F.col(c).cast(t).alias(f"i_{c}")
                for c, t in self.tiebreak_cols
            ],
            F.col(self.order_col).cast(self.order_type).alias("val"),
        )

    def _topk_of(self, rows: DataFrame) -> DataFrame:
        w = Window.partitionBy(*self.group_cols).orderBy(
            *self._order_exprs(
                F.col("val"), [f"i_{c}" for c, _ in self.tiebreak_cols]
            )
        )
        return (
            rows.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= self.k)
        )

    def refresh(
        self, upto_version: int | None = None, auto_reseed: bool = False
    ) -> BatchRecord | None:
        """Fold the source changelog ``(synced, upto]``. One manifest-
        pruned changelog scan; MV writes touch only changed groups."""
        v_from = self.synced_version()
        if self._roll_forward_pending(v_from) is not None:
            v_from = self.synced_version()
        v_to = (
            upto_version
            if upto_version is not None
            else self.source._load()["version"]
        )
        if v_to <= v_from:
            return None
        t0 = time.time()
        src_keys = self.source._load()["key_cols"]
        try:
            # persisted: inserts/retracts below are two separate
            # materializations over the same diff subtree — without the
            # cache the full-outer changelog join runs once per side
            delta = self.source.diff_versions(
                v_from, v_to, old_image=True
            ).persist()
        except FileNotFoundError as e:
            if auto_reseed:
                return self.reseed()
            raise RefreshGapError(
                f"cannot diff source versions {v_from}->{v_to}; call "
                "reseed() or refresh(auto_reseed=True)"
            ) from e

        def img(c: str, old: bool):
            if c in src_keys or not old:
                return F.col(c)
            return F.col(f"_old_{c}")

        def side(old: bool) -> DataFrame:
            keep = delta.where(F.col("_change_type") != ("I" if old else "D"))
            return self._source_rows(
                keep.select(
                    *[
                        img(c, old).alias(c)
                        for c in dict.fromkeys(
                            list(src_keys)
                            + self.group_cols
                            + [c for c, _ in self.tiebreak_cols]
                            + [self.order_col]
                        )
                    ]
                )
            )

        inserts = side(old=False).persist()
        retracts = side(old=True).persist()
        cleanup = [delta, inserts, retracts]
        try:
            items = [f"i_{c}" for c, _ in self.tiebreak_cols]
            cur = self.read().persist()
            cleanup.append(cur)
            # per-group stored boundary: member count + the WORST stored row
            bw = Window.partitionBy(*self.group_cols).orderBy(
                *self._order_exprs(F.col("val"), items)
            )
            bound = (
                cur.withColumn("_rn", F.row_number().over(bw))
                .withColumn(
                    "_n", F.count(F.lit(1)).over(
                        Window.partitionBy(*self.group_cols)
                    )
                )
                .where(F.col("_rn") == F.col("_n"))
                .select(
                    *self.group_cols,
                    F.col("_n").alias("n_stored"),
                    F.col("val").alias("kv"),
                    *[F.col(i).alias(f"k_{i}") for i in items],
                )
            )
            # boundary rule: groups needing source re-aggregation
            r = retracts.join(bound, self.group_cols, "left_outer")
            null_guard = F.lit(False)
            for i in items:
                # NULL TIEBREAK identity on either side (legal — NULL keys
                # are real keys here): _ties_or_beats compares item columns
                # with <, which yields NULL and filters as false, so a
                # deleted member whose tiebreak key is NULL could ghost in
                # the view — force re-aggregation for its group instead
                # (ADVICE r5 low)
                null_guard = (
                    null_guard | F.col(i).isNull() | F.col(f"k_{i}").isNull()
                )
            need = r.where(
                F.col("n_stored").isNull()  # MV lag edge: treat as reagg
                | (F.col("n_stored") < self.k)
                # NULL retracted value or NULL stored boundary: the
                # comparator would yield NULL (filtered as false) and a
                # deleted NULL-val member would ghost in the view — NULLs
                # sort last, so such rows sit exactly at the boundary;
                # re-aggregate their groups (review finding)
                | F.col("val").isNull()
                | F.col("kv").isNull()
                | null_guard
                | self._ties_or_beats(
                    F.col("val"), [F.col(i) for i in items],
                    F.col("kv"), [F.col(f"k_{i}") for i in items],
                )
            ).select(*self.group_cols).distinct()
            changed = (
                inserts.select(*self.group_cols)
                .unionByName(retracts.select(*self.group_cols))
                .distinct()
                .persist()
            )
            reagg_groups = need.persist()
            cleanup += [changed, reagg_groups]
            fast_groups = changed.join(
                reagg_groups, self.group_cols, "left_anti"
            )
            # fast path: stored members + inserted candidates, re-ranked
            fast_rows = (
                cur.join(F.broadcast(fast_groups), self.group_cols, "left_semi")
                .select(*self.group_cols, *items, "val")
                .unionByName(
                    inserts.join(
                        F.broadcast(fast_groups), self.group_cols, "left_semi"
                    )
                )
            )
            # reagg path: pinned source, only the affected groups
            parts = [self._topk_of(fast_rows)]
            if reagg_groups.limit(1).count() > 0:
                srcv = self._source_rows(self.source.read_version(v_to))
                parts.append(
                    self._topk_of(
                        srcv.join(
                            F.broadcast(reagg_groups),
                            self.group_cols,
                            "left_semi",
                        )
                    )
                )
            fresh = parts[0]
            for p in parts[1:]:
                fresh = fresh.unionByName(p)
            # old rank occupancy of changed groups -> tombstone shrunk ranks
            old_ranks = cur.join(
                F.broadcast(changed), self.group_cols, "left_semi"
            ).select(*self.group_cols, "rank")
            new_ranks = fresh.select(
                *self.group_cols, F.col("rnk").cast("long").alias("rank")
            )
            gone = old_ranks.join(
                new_ranks, self.group_cols + ["rank"], "left_anti"
            )
            rank_key = F.lpad(
                F.col("rnk").cast("string"), _RANK_W, "0"
            ).alias("rank")
            nil = F.lit(None)
            upserts = fresh.select(
                *self.group_cols, rank_key,
                *items, "val",
                F.lit("U").alias("_op"),
            ).unionByName(
                gone.select(
                    *self.group_cols,
                    F.lpad(F.col("rank").cast("string"), _RANK_W, "0").alias(
                        "rank"
                    ),
                    *[nil.cast(t).alias(f"i_{c}") for c, t in self.tiebreak_cols],
                    nil.cast(self.order_type).alias("val"),
                    F.lit("D").alias("_op"),
                )
            ).select(
                "*",
                F.lit(v_to).cast("long").alias("_seq"),
                F.current_timestamp().alias("_ts"),
            )
            st = self.table.merge_apply(
                upserts,
                stats="light",
                persist_batch=True,  # k-per-group output, diff+reagg lineage
                app_meta={
                    "consumer": "topk",
                    "mv_synced_from": v_from,
                    "mv_synced_upto": v_to,
                },
            )
        finally:
            for df in cleanup:
                df.unpersist()
        t1 = time.time()
        rec = BatchRecord(
            batch_id=v_to,
            src_offset_start=v_from,
            src_offset_end=v_to,
            rows_in=st.rows_in,
            rows_applied=st.rows_after_dedup,
            touched_buckets=st.touched_buckets,
            snapshot_version=st.snapshot_version,
            checksum="",
            status="COMMITTED",
            started_at=t0,
            committed_at=t1,
            duration_s=t1 - t0,
        )
        self.cp.commit(rec)
        return rec

    # ---------------- rebuild / verification ----------------

    def recompute(self, version: int | None = None) -> DataFrame:
        """O(source) reference the incremental path must equal exactly."""
        src = (
            self.source.read()
            if version is None
            else self.source.read_version(version)
        )
        return self._topk_of(self._source_rows(src)).select(
            *self.group_cols,
            F.col("rnk").cast("long").alias("rank"),
            *[f"i_{c}" for c, _ in self.tiebreak_cols],
            "val",
        )

    def reseed(self) -> BatchRecord:
        """Full rebuild at the source's current version (bootstrap /
        retention-gap recovery), pinned like plans/mv.reseed."""
        v_to = self.source._load()["version"]
        t0 = time.time()
        want = self.recompute(version=v_to).withColumn(
            "rank", F.lpad(F.col("rank").cast("string"), _RANK_W, "0")
        )
        cur = self.table.read().select(*self.group_cols, "rank")
        gone = cur.join(want, self.group_cols + ["rank"], "left_anti")
        nil = F.lit(None)
        upserts = want.select(
            *self.group_cols, "rank",
            *[f"i_{c}" for c, _ in self.tiebreak_cols], "val",
            F.lit("U").alias("_op"),
        ).unionByName(
            gone.select(
                *self.group_cols, "rank",
                *[nil.cast(t).alias(f"i_{c}") for c, t in self.tiebreak_cols],
                nil.cast(self.order_type).alias("val"),
                F.lit("D").alias("_op"),
            )
        ).select(
            "*",
            F.lit(v_to).cast("long").alias("_seq"),
            F.current_timestamp().alias("_ts"),
        )
        st = self.table.merge_apply(
            upserts, stats="light",
            persist_batch=True,  # k-per-group output, full-recompute lineage
            app_meta={
                "consumer": "topk",
                "mv_synced_from": -1,
                "mv_synced_upto": v_to,
            },
        )
        t1 = time.time()
        rec = BatchRecord(
            batch_id=v_to, src_offset_start=-1, src_offset_end=v_to,
            rows_in=st.rows_in, rows_applied=st.rows_after_dedup,
            touched_buckets=st.touched_buckets,
            snapshot_version=st.snapshot_version, checksum="",
            status="COMMITTED", started_at=t0, committed_at=t1,
            duration_s=t1 - t0,
        )
        self.cp.commit(rec)
        return rec

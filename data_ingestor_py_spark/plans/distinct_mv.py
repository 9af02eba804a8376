"""Exact COUNT(DISTINCT x) maintenance over a :class:`TargetTable` changelog.

COUNT DISTINCT is the classic NOT-self-maintainable aggregate: a delete
only decrements the group's distinct count if the deleted row held the
group's LAST occurrence of that value, which the aggregate row alone
cannot know. The standard IVM answer (Gupta/Mumick's counting algorithm,
the same structure Materialize/DBSP reduce to) is a two-level fold over an
auxiliary multiplicity relation:

- **aux** — a :class:`TargetTable` keyed by ``(group cols…, _dv)`` holding
  ``mult`` = how many source rows of the group currently carry that value.
  The changelog folds into it additively: new images +1, old images -1,
  per (group, value).
- **agg** — a :class:`TargetTable` keyed by the group cols holding
  ``n_distinct``; it receives only the 0↔positive TRANSITIONS of aux
  multiplicities (+1 when a value's mult rises from 0, -1 when it falls
  to 0).

Both folds are O(delta) — a batch touching k (group, value) pairs reads
and writes O(k) aux rows and O(groups-touched) agg rows, never the
source table; at 10^10 events this is the difference between an
incremental consumer and a nightly recompute.

Exactly-once across THREE durable writes (aux commit, agg commit,
checkpoint commit) without a cross-table transaction, by chaining each
table's own atomic commit:

1. the aux fold records ``(src_from, src_upto, aux_prev_version)`` as
   ``app_meta`` INSIDE its merge's manifest commit;
2. a crash before the agg fold is recovered by re-deriving the
   transitions from the AUX TABLE'S OWN CHANGELOG
   (``aux.diff_versions(aux_prev_version, …)`` — immutable, so the
   re-derivation is idempotent) instead of re-folding the source delta
   (which would double-count multiplicities);
3. the agg fold records its sync intent in ITS manifest commit, closing
   the agg/checkpoint gap exactly like
   :meth:`plans.mv.IncrementalAggregate` does.

Distinctness is evaluated on the value's STRING rendering (aux keys are
strings — TargetTable key semantics); for the id/category columns this
aggregate exists for, string rendering is injective. NULL values are
ignored, matching SQL ``COUNT(DISTINCT …)``.

Reference parity: the reference engine has no aggregate maintenance at
all — its sink is row-level INSERT/UPDATE (db/postgres_query_builder.py);
this module is part of the downstream-consumer surface a CDC engine needs
at the target scale.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.checkpoint import BatchRecord, Checkpoint
from data_ingestor_py_spark.plans.mv import RefreshGapError
from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.storage import StorageAdapter


class IncrementalDistinct:
    """Maintains ``group_cols -> n_distinct = COUNT(DISTINCT value_col)``
    from a source table's changelog. ``root`` holds two engine tables:
    ``root/aux`` (multiplicities) and ``root/agg`` (the visible MV)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        source: TargetTable,
        group_cols: list[str],
        value_col: str,
        storage: StorageAdapter | None = None,
    ):
        self.spark = spark
        self.source = source
        self.group_cols = list(group_cols)
        self.value_col = value_col
        self.aux = TargetTable(spark, f"{root}/aux", storage=storage)
        self.table = TargetTable(spark, f"{root}/agg", storage=storage)
        self.cp = Checkpoint(spark, f"{root}/agg", storage=self.table.io)

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        source: TargetTable,
        group_cols: list[str],
        value_col: str,
        num_buckets: int = 4,
        storage: StorageAdapter | None = None,
    ) -> "IncrementalDistinct":
        TargetTable.create(
            spark, f"{root}/aux",
            key_cols=list(group_cols) + ["_dv"],
            columns=[("mult", "long")],
            num_buckets=num_buckets, storage=storage,
        )
        TargetTable.create(
            spark, f"{root}/agg",
            key_cols=list(group_cols),
            columns=[("n_distinct", "long")],
            num_buckets=num_buckets, storage=storage,
        )
        return cls(spark, root, source, group_cols, value_col, storage=storage)

    # ---------------- state ----------------

    def read(self) -> DataFrame:
        return self.table.read().select(*self.group_cols, "n_distinct")

    def synced_version(self) -> int:
        done = self.cp.committed_batches()
        return max(done) if done else 0

    # ---------------- crash recovery ----------------

    def _roll_forward_agg(self, v_from: int) -> bool:
        """Close the agg-commit/checkpoint-commit gap (same protocol as
        IncrementalAggregate._roll_forward_pending): if the agg manifest's
        app_meta intent is ahead of the checkpoint, the fold landed —
        commit the missing checkpoint record instead of re-folding."""
        m = self.table._load()
        am = m.get("app_meta", {})
        if am.get("consumer") != "distinct" or int(am.get("synced_upto", 0)) <= v_from:
            return False
        now = time.time()
        self.cp.commit(BatchRecord(
            batch_id=int(am["synced_upto"]),
            src_offset_start=int(am.get("synced_from", v_from)),
            src_offset_end=int(am["synced_upto"]),
            rows_in=-1, rows_applied=-1, touched_buckets=-1,
            snapshot_version=int(m["version"]), checksum="",
            status="COMMITTED", started_at=now, committed_at=now,
            duration_s=0.0,
        ))
        return True

    def _roll_forward_aux(self, v_from: int) -> int:
        """If the aux fold committed but the agg fold didn't (crash in the
        gap), re-derive the agg delta from the AUX CHANGELOG — the source
        delta must NOT be re-folded into aux (additive, so re-application
        double-counts), but aux's own diff is immutable history and yields
        exactly the 0↔positive transitions the agg needs: 'I' rows are
        values appearing (+1), 'D' rows values vanishing (-1), 'U' rows
        multiplicity shifts within >0 (no-op)."""
        am = self.aux.read_app_meta()
        if am.get("consumer") != "distinct_aux" or int(am.get("src_upto", 0)) <= v_from:
            return v_from
        v_to = int(am["src_upto"])
        auxd = self.aux.diff_versions(
            int(am["aux_prev_version"]), self.aux._load()["version"]
        )
        trans = auxd.where(F.col("_change_type") != "U").select(
            *self.group_cols,
            F.when(F.col("_change_type") == "I", F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("_t"),
        )
        self._fold_agg(trans, int(am.get("src_from", v_from)), v_to, time.time())
        return v_to

    # ---------------- refresh ----------------

    def refresh(
        self, upto_version: int | None = None, auto_reseed: bool = False
    ) -> BatchRecord | None:
        """Fold the source changelog ``(synced, upto]`` through aux into
        the aggregate. Returns the committed record, or None if already up
        to date. Crash-idempotent at every gap (see module docstring)."""
        v_from = self.synced_version()
        if self._roll_forward_agg(v_from):
            v_from = self.synced_version()
        v_from = self._roll_forward_aux(v_from)
        v_to = (
            upto_version
            if upto_version is not None
            else self.source._load()["version"]
        )
        if v_to <= v_from:
            return None
        t0 = time.time()
        src_keys = set(self.source._load()["key_cols"])
        try:
            delta = self.source.diff_versions(v_from, v_to, old_image=True)
        except FileNotFoundError as e:
            if auto_reseed:
                return self.reseed()
            raise RefreshGapError(
                f"cannot diff source versions {v_from}->{v_to} (expired "
                "snapshot); call reseed()"
            ) from e

        c = self.value_col

        def img(col: str, old: bool):
            if col in src_keys or not old:
                return F.col(col)
            return F.col(f"_old_{col}")

        def side_struct(old: bool):
            # sign is NULL when this side does not apply to the row's
            # change type (old side of an I, new side of a D) — filtered
            # after the explode
            applies = F.col("_change_type") != ("I" if old else "D")
            return F.struct(
                *[img(g, old).cast("string").alias(g) for g in self.group_cols],
                img(c, old).cast("string").alias("_dv"),
                F.when(applies, F.lit(-1 if old else 1))
                .cast("long")
                .alias("_s"),
            )

        # both delta sides in ONE pass over the diff: a union of two
        # projections would carry the (un-deduped) diff subtree twice in
        # the plan, running the full-outer changelog join once per side
        d = (
            delta.select(
                F.explode(
                    F.array(side_struct(False), side_struct(True))
                ).alias("_e")
            )
            .select("_e.*")
            # COUNT DISTINCT ignores NULL values; NULL sign = side n/a
            .where(F.col("_s").isNotNull() & F.col("_dv").isNotNull())
            .groupBy(*self.group_cols, "_dv")
            .agg(F.sum("_s").alias("_dm"))
            .where(F.col("_dm") != 0)
        )
        cur = self.aux.read().select(*self.group_cols, "_dv", "mult")
        cond = F.lit(True)
        for g in self.group_cols + ["_dv"]:
            cond = cond & d[g].eqNullSafe(cur[g])
        old_mult = F.coalesce(cur["mult"], F.lit(0))
        new_mult = old_mult + d["_dm"]
        j = d.join(cur, cond, "left_outer").select(
            *[d[g].alias(g) for g in self.group_cols],
            d["_dv"].alias("_dv"),
            old_mult.alias("_old"),
            new_mult.alias("_new"),
        ).persist()
        try:
            aux_prev = self.aux._load()["version"]
            self.aux.merge_apply(
                j.select(
                    *self.group_cols,
                    "_dv",
                    F.col("_new").alias("mult"),
                    F.when(F.col("_new") <= 0, F.lit("D")).otherwise(F.lit("U")).alias("_op"),
                    F.lit(v_to).cast("long").alias("_seq"),
                    F.current_timestamp().alias("_ts"),
                ),
                stats="light",
                app_meta={
                    "consumer": "distinct_aux",
                    "src_from": v_from,
                    "src_upto": v_to,
                    "aux_prev_version": aux_prev,
                },
            )
            trans = j.select(
                *self.group_cols,
                F.when((F.col("_old") <= 0) & (F.col("_new") > 0), F.lit(1))
                .when((F.col("_old") > 0) & (F.col("_new") <= 0), F.lit(-1))
                .otherwise(F.lit(0))
                .cast("long")
                .alias("_t"),
            )
            return self._fold_agg(trans, v_from, v_to, t0)
        finally:
            j.unpersist()

    def _fold_agg(
        self, trans: DataFrame, v_from: int, v_to: int, t0: float
    ) -> BatchRecord:
        """Fold per-group transition sums into the agg table and commit
        the checkpoint (agg app_meta rides the merge commit)."""
        g = trans.groupBy(*self.group_cols).agg(F.sum("_t").alias("_d"))
        cur = self.table.read().select(*self.group_cols, "n_distinct")
        cond = F.lit(True)
        for gc in self.group_cols:
            cond = cond & g[gc].eqNullSafe(cur[gc])
        new_nd = F.coalesce(cur["n_distinct"], F.lit(0)) + g["_d"]
        upserts = g.join(cur, cond, "left_outer").where(g["_d"] != 0).select(
            *[g[gc].alias(gc) for gc in self.group_cols],
            new_nd.alias("n_distinct"),
            F.when(new_nd <= 0, F.lit("D")).otherwise(F.lit("U")).alias("_op"),
            F.lit(v_to).cast("long").alias("_seq"),
            F.current_timestamp().alias("_ts"),
        )
        st = self.table.merge_apply(
            upserts,
            stats="light",
            persist_batch=True,  # group-scale output, transition-fold lineage
            app_meta={
                "consumer": "distinct",
                "synced_from": v_from,
                "synced_upto": v_to,
            },
        )
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

    # ---------------- reseed / verification ----------------

    def reseed(self) -> BatchRecord:
        """Full rebuild at the source's current version: recompute aux
        multiplicities and agg counts absolutely (idempotent merges), then
        checkpoint. Recovery for expired changelog bases and the bootstrap
        for attaching to an already-populated source."""
        v_to = self.source._load()["version"]
        t0 = time.time()
        src = self.source.read_version(v_to).select(
            *[F.col(g).cast("string").alias(g) for g in self.group_cols],
            F.col(self.value_col).cast("string").alias("_dv"),
        ).where(F.col("_dv").isNotNull())
        # four downstream actions (two merges x two passes each) would
        # otherwise re-run the full source aggregation four times
        want = src.groupBy(*self.group_cols, "_dv").agg(
            F.count(F.lit(1)).alias("mult")
        ).persist()
        cur = self.aux.read().select(*self.group_cols, "_dv", "mult")
        cond = F.lit(True)
        for g in self.group_cols + ["_dv"]:
            cond = cond & want[g].eqNullSafe(cur[g])
        aux_prev = self.aux._load()["version"]
        merged = want.join(cur, cond, "full_outer").select(
            *[F.coalesce(want[g], cur[g]).alias(g) for g in self.group_cols],
            F.coalesce(want["_dv"], cur["_dv"]).alias("_dv"),
            F.coalesce(want["mult"], F.lit(0)).alias("mult"),
            F.when(want["mult"].isNull(), F.lit("D")).otherwise(F.lit("U")).alias("_op"),
            F.lit(v_to).cast("long").alias("_seq"),
            F.current_timestamp().alias("_ts"),
        )
        try:
            self.aux.merge_apply(
                merged, stats="light",
                app_meta={
                    "consumer": "distinct_aux",
                    "src_from": -1,
                    "src_upto": v_to,
                    "aux_prev_version": aux_prev,
                },
            )
            return self._reseed_agg(want, v_to, t0)
        finally:
            want.unpersist()

    def _reseed_agg(self, want, v_to: int, t0: float) -> BatchRecord:
        want_g = want.groupBy(*self.group_cols).agg(
            F.count(F.lit(1)).cast("long").alias("_want")
        )
        cur_g = self.table.read().select(*self.group_cols, "n_distinct")
        cond2 = F.lit(True)
        for g in self.group_cols:
            cond2 = cond2 & want_g[g].eqNullSafe(cur_g[g])
        upserts = want_g.join(cur_g, cond2, "full_outer").select(
            *[F.coalesce(want_g[g], cur_g[g]).alias(g) for g in self.group_cols],
            F.coalesce(want_g["_want"], F.lit(0)).alias("n_distinct"),
            F.when(want_g["_want"].isNull(), F.lit("D")).otherwise(F.lit("U")).alias("_op"),
            F.lit(v_to).cast("long").alias("_seq"),
            F.current_timestamp().alias("_ts"),
        )
        st = self.table.merge_apply(
            upserts, stats="light",
            app_meta={"consumer": "distinct", "synced_from": -1, "synced_upto": v_to},
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

    def recompute(self, version: int | None = None) -> DataFrame:
        """O(source) reference the incremental path must equal exactly."""
        src = (
            self.source.read()
            if version is None
            else self.source.read_version(version)
        )
        return src.groupBy(
            *[F.col(g).cast("string").alias(g) for g in self.group_cols]
        ).agg(
            F.count_distinct(F.col(self.value_col).cast("string")).alias("n_distinct")
        )

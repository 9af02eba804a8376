"""Delta-maintained materialized JOIN view over two :class:`TargetTable`s.

The second classic CDC downstream after aggregates (`plans/mv.py`): a
fact table continuously enriched with dimension attributes — ``SELECT
f.*, d.attrs FROM fact f LEFT JOIN dim d ON f.fk = d.key`` — kept fresh
as change batches land on EITHER side. Recomputing the join per batch is
the 100 TB anti-pattern; the standard answer (the delta-join rule Flink
and Materialize implement: Δ(A ⋈ B) = ΔA ⋈ B′ ∪ A′ ⋈ ΔB) maintains it
from the two changelogs:

- **fact delta**: changed fact rows re-join against the dim pinned at the
  fold's target version; fact deletes delete their view row.
- **dim delta**: only the CHANGED dim keys matter — the fact rows that
  reference them are found with a broadcast semi-join (the changed-key
  set is delta-sized) and re-joined; a dim delete re-enriches its fact
  rows to NULL (left-join semantics). When the dim didn't change — the
  common case for slowly-changing dimensions — this path costs one
  driver-side version compare and is skipped entirely.

Scale shape per refresh: O(|ΔA|) manifest-pruned changelog read + (only
when the dim changed) one projection-pruned fact scan filtered by the
broadcast changed-key set — no shuffle of the fact table, never a full
re-join. The dim side is read once, pre-filtered to the delta's foreign
keys by a broadcast semi-join before the equi-join, so a 100 TB dim
contributes a filtered scan, not a shuffle.

Consistency/crash model — STRONGER than the aggregate MV: view rows are
ABSOLUTE (a re-join produces the same row, unlike relative aggregate
deltas), and the synced source-version pair is committed as ``app_meta``
INSIDE the same manifest commit as the rows. One durable write carries
both data and progress, so there is no fold/checkpoint crash gap at all;
the checkpoint records are lineage, recovered on entry if a crash
separated them from the fold (see :meth:`_recover_lineage`).

No reference analogue (the reference's sink is a bare INSERT/UPDATE
executor, db/sql_consumer.py); this is engine-level downstream-view
maintenance in the same family as `plans/mv.py` and `plans/scd.py`.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_py_spark.plans.checkpoint import BatchRecord, Checkpoint
from data_ingestor_py_spark.plans.mv import RefreshGapError
from data_ingestor_py_spark.plans.target import TargetTable
from data_ingestor_py_spark.storage import StorageAdapter

# version-pair -> one monotone long for _seq / lineage batch ids: at least
# one component strictly grows per fold, so the encoding strictly grows
_VSHIFT = 1 << 31


class IncrementalJoin:
    """A left-join enrichment view ``fact ⟕ dim``, maintained from both
    changelogs. The view is itself a :class:`TargetTable` keyed by the
    fact's key columns (inheriting snapshots, time travel, CAS commits).

    ``fk_cols`` are fact columns equated positionally with the dim's key
    columns (compared as strings — TargetTable key semantics; a NULL fk
    never matches, standard SQL LEFT JOIN). ``fact_cols`` /
    ``dim_cols`` are ``[(out_name, source_col, spark_type)]`` payload
    projections; out names must be distinct across the two lists.
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        fact: TargetTable,
        dim: TargetTable,
        fk_cols: list[str],
        fact_cols: list[tuple[str, str, str]],
        dim_cols: list[tuple[str, str, str]],
        storage: StorageAdapter | None = None,
    ):
        self.spark = spark
        self.fact = fact
        self.dim = dim
        self.fk_cols = list(fk_cols)
        self.fact_cols = list(fact_cols)
        self.dim_cols = list(dim_cols)
        self.table = TargetTable(spark, root, storage=storage)
        self.cp = Checkpoint(spark, root, storage=self.table.io)

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        fact: TargetTable,
        dim: TargetTable,
        fk_cols: list[str],
        fact_cols: list[tuple[str, str, str]],
        dim_cols: list[tuple[str, str, str]],
        num_buckets: int = 8,
        storage: StorageAdapter | None = None,
    ) -> "IncrementalJoin":
        fkeys = fact._load()["key_cols"]
        cols = [(n, t) for n, _, t in fact_cols] + [(n, t) for n, _, t in dim_cols]
        overlap = {n for n, _, _ in fact_cols} & {n for n, _, _ in dim_cols}
        if overlap:
            raise ValueError(f"duplicate output columns: {sorted(overlap)}")
        TargetTable.create(
            spark, root, key_cols=list(fkeys), columns=cols,
            num_buckets=num_buckets, storage=storage,
        )
        return cls(spark, root, fact, dim, fk_cols, fact_cols, dim_cols,
                   storage=storage)

    # ---------------- state ----------------

    def read(self) -> DataFrame:
        keys = self.table._load()["key_cols"]
        out = [n for n, _, _ in self.fact_cols] + [n for n, _, _ in self.dim_cols]
        return self.table.read().select(*keys, *out)

    def synced_versions(self) -> tuple[int, int]:
        """(fact_version, dim_version) the view reflects — read from the
        view table's ``app_meta``, which is committed atomically with every
        fold (authoritative; no separate progress file to diverge)."""
        am = self.table.read_app_meta()
        if am.get("consumer") == "joinmv":
            return int(am["join_synced_a"]), int(am["join_synced_b"])
        return 0, 0

    # ---------------- refresh ----------------

    def _recover_lineage(self, va: int, vb: int) -> None:
        """If a crash separated the fold commit from its lineage record,
        write the missing record now (progress itself needs no recovery —
        it traveled inside the fold's manifest commit)."""
        seq = va * _VSHIFT + vb
        if seq == 0 or seq in self.cp.committed_batches():
            return
        m = self.table._load()
        now = time.time()
        hist = next(
            (h for h in reversed(m["history"]) if h["snapshot"] == m["version"]),
            {},
        )
        self.cp.commit(BatchRecord(
            batch_id=seq, src_offset_start=va, src_offset_end=vb,
            rows_in=int(hist.get("rows_in", -1)),
            rows_applied=int(hist.get("rows_applied", -1) or -1),
            touched_buckets=len(hist.get("buckets", [])),
            snapshot_version=int(m["version"]), checksum="join",
            status="COMMITTED", started_at=now, committed_at=now,
            duration_s=0.0,
        ))

    def _fact_projection(self, df: DataFrame):
        """Project a fact-shaped frame to view key + fk + fact payload."""
        keys = self.table._load()["key_cols"]
        return df.select(
            *[F.col(k).cast("string").alias(k) for k in keys],
            *[F.col(c).cast("string").alias(f"_fk_{i}")
              for i, c in enumerate(self.fk_cols)],
            *[F.col(c).cast(t).alias(n) for n, c, t in self.fact_cols],
        )

    def refresh(
        self,
        upto_fact: int | None = None,
        upto_dim: int | None = None,
        auto_reseed: bool = False,
    ) -> BatchRecord | None:
        """Advance the view to (fact@upto_fact, dim@upto_dim) — defaults:
        both sources' current versions. Returns the committed record, or
        None when already in sync. Any schedule converges to the same
        state (the changelogs compose); call it from ``replay``'s
        ``on_batch_end`` hook or on a timer."""
        va0, vb0 = self.synced_versions()
        self._recover_lineage(va0, vb0)
        va1 = upto_fact if upto_fact is not None else self.fact._load()["version"]
        vb1 = upto_dim if upto_dim is not None else self.dim._load()["version"]
        if va1 < va0 or vb1 < vb0:
            raise ValueError(
                f"refresh target ({va1},{vb1}) behind synced ({va0},{vb0})"
            )
        if (va1, vb1) == (va0, vb0):
            return None
        t0 = time.time()
        keys = self.table._load()["key_cols"]
        dim_keys = self.dim._load()["key_cols"]
        if len(dim_keys) != len(self.fk_cols):
            raise ValueError(
                f"fk_cols {self.fk_cols} vs dim keys {dim_keys}: arity mismatch"
            )
        try:
            d_fact = (
                self.fact.diff_versions(va0, va1) if va1 > va0 else None
            )
            d_dim = self.dim.diff_versions(vb0, vb1) if vb1 > vb0 else None
        except FileNotFoundError as e:
            if auto_reseed:
                return self.reseed()
            raise RefreshGapError(
                f"cannot diff source versions (fact {va0}->{va1}, dim "
                f"{vb0}->{vb1}): a base snapshot was expired from under the "
                "view. Call reseed() and resume incremental refreshes."
            ) from e

        # d_fact persisted AFTER both diffs resolved (a dim-side gap must
        # not leak the fact cache through the except paths above): it
        # feeds three places in the upsert plan (the re-join projection,
        # the delete branch, and the changed-dim anti-join) and Catalyst
        # does not dedupe the shared diff subtree — cache so the
        # full-outer changelog join runs once
        if d_fact is not None:
            d_fact = d_fact.persist()
        parts: list[DataFrame] = []
        deletes = None
        if d_fact is not None:
            parts.append(
                self._fact_projection(d_fact.where(F.col("_change_type") != "D"))
            )
            deletes = d_fact.where(F.col("_change_type") == "D").select(
                *[F.col(k).cast("string").alias(k) for k in keys]
            )
        if d_dim is not None:
            # delta-sized changed-key set (I/U/D alike — deletes must
            # re-enrich their fact rows to NULL)
            changed = d_dim.select(
                *[F.col(k).cast("string").alias(f"_fk_{i}")
                  for i, k in enumerate(dim_keys)]
            ).distinct()
            fact_now = self._fact_projection(self.fact.read_version(va1))
            aff = fact_now.join(
                F.broadcast(changed), [f"_fk_{i}" for i in range(len(dim_keys))],
                "left_semi",
            )
            if d_fact is not None:
                # fact-delta rows are already being re-joined; dropping
                # them here (by view key) avoids double work, not
                # correctness — both paths would produce the same row
                aff = aff.join(
                    d_fact.select(
                        *[F.col(k).cast("string").alias(k) for k in keys]
                    ),
                    keys, "left_anti",
                )
            parts.append(aff)

        ups = parts[0]
        for p in parts[1:]:
            ups = ups.unionByName(p)
        # the upsert set is delta-sized — persist it: it is consumed twice
        # (fk set for the dim prune, then the join itself)
        ups = ups.persist()
        try:
            fk_names = [f"_fk_{i}" for i in range(len(self.fk_cols))]
            need_fks = ups.select(*fk_names).distinct()
            dim_v = self.dim.read_version(vb1).select(
                *[F.col(k).cast("string").alias(f"_fk_{i}")
                  for i, k in enumerate(dim_keys)],
                *[F.col(c).cast(t).alias(n) for n, c, t in self.dim_cols],
            )
            # prune the dim scan to the delta's foreign keys (broadcast
            # semi-join: filtered scan, no dim shuffle), then broadcast
            # the surviving delta-sized slice into the equi-join
            dim_sub = dim_v.join(F.broadcast(need_fks), fk_names, "left_semi")
            joined = ups.join(F.broadcast(dim_sub), fk_names, "left_outer")

            seq = va1 * _VSHIFT + vb1
            upserts = joined.select(
                *keys,
                *[F.col(n) for n, _, _ in self.fact_cols],
                *[F.col(n) for n, _, _ in self.dim_cols],
                F.lit("U").alias("_op"),
                F.lit(seq).cast("long").alias("_seq"),
                F.current_timestamp().alias("_ts"),
            )
            batch = upserts
            if deletes is not None:
                nil = F.lit(None)
                batch = batch.unionByName(deletes.select(
                    *keys,
                    *[nil.cast(t).alias(n) for n, _, t in self.fact_cols],
                    *[nil.cast(t).alias(n) for n, _, t in self.dim_cols],
                    F.lit("D").alias("_op"),
                    F.lit(seq).cast("long").alias("_seq"),
                    F.current_timestamp().alias("_ts"),
                ))
            progress = {
                "consumer": "joinmv",
                "join_synced_a": va1,
                "join_synced_b": vb1,
            }
            st = self.table.merge_apply(
                batch,
                stats="light",
                # delta-sized batch whose lineage is the changelog diff +
                # dim join — cache it across the merge's two actions
                persist_batch=True,
                # progress rides the SAME manifest commit as the rows:
                # no fold/progress crash gap exists by construction
                app_meta=progress,
            )
            if self.synced_versions() != (va1, vb1):
                # the delta produced ZERO row changes (e.g. the source
                # version advanced via a no-visible-change merge, a tag, or
                # compaction): merge_apply early-returned without touching
                # the manifest, so make the progress durable on its own —
                # otherwise every future refresh re-diffs this gap and
                # fails permanently once retention expires the base
                self.table.commit_app_meta(progress)
        finally:
            ups.unpersist()
            if d_fact is not None:
                d_fact.unpersist()
        t1 = time.time()
        rec = BatchRecord(
            batch_id=seq, src_offset_start=va1, src_offset_end=vb1,
            rows_in=st.rows_in, rows_applied=st.rows_after_dedup,
            touched_buckets=st.touched_buckets,
            snapshot_version=st.snapshot_version, checksum="join",
            status="COMMITTED", started_at=t0, committed_at=t1,
            duration_s=t1 - t0,
        )
        self.cp.commit(rec)
        return rec

    def reseed(self) -> BatchRecord:
        """Rebuild the view from both sources' CURRENT versions (one full
        join — the O(fact) cost refresh normally avoids). Recovery for an
        expired changelog base; also the bootstrap for attaching a view to
        already-populated tables."""
        va = self.fact._load()["version"]
        vb = self.dim._load()["version"]
        t0 = time.time()
        keys = self.table._load()["key_cols"]
        # _present marks want-side rows through the full outer join (a key
        # column can't serve: NULL keys are legal in TargetTable)
        want = self.recompute(fact_version=va, dim_version=vb).withColumn(
            "_present", F.lit(True)
        )
        cur = self.read()
        cond = F.lit(True)
        for k in keys:
            cond = cond & want[k].eqNullSafe(cur[k])
        j = want.join(cur, cond, "full_outer")
        present = want["_present"].isNotNull()
        out_cols = self.fact_cols + self.dim_cols
        seq = va * _VSHIFT + vb
        upserts = j.select(
            *[F.coalesce(want[k], cur[k]).alias(k) for k in keys],
            *[want[n].alias(n) for n, _, _ in out_cols],
            F.when(present, F.lit("U")).otherwise(F.lit("D")).alias("_op"),
            F.lit(seq).cast("long").alias("_seq"),
            F.current_timestamp().alias("_ts"),
        )
        progress = {
            "consumer": "joinmv",
            "join_synced_a": va,
            "join_synced_b": vb,
        }
        st = self.table.merge_apply(
            upserts, stats="light", persist_batch=True, app_meta=progress
        )
        if self.synced_versions() != (va, vb):
            # empty rebuild (both sources empty): merge early-returned;
            # make the progress durable anyway (see refresh())
            self.table.commit_app_meta(progress)
        t1 = time.time()
        rec = BatchRecord(
            batch_id=seq, src_offset_start=va, src_offset_end=vb,
            rows_in=st.rows_in, rows_applied=st.rows_after_dedup,
            touched_buckets=st.touched_buckets,
            snapshot_version=st.snapshot_version, checksum="join-reseed",
            status="COMMITTED", started_at=t0, committed_at=t1,
            duration_s=t1 - t0,
        )
        self.cp.commit(rec)
        return rec

    # ---------------- verification ----------------

    def recompute(
        self, fact_version: int | None = None, dim_version: int | None = None
    ) -> DataFrame:
        """The full-join reference the incremental path must equal exactly
        (tests / audits / reseed, never the refresh loop)."""
        keys = self.table._load()["key_cols"]
        dim_keys = self.dim._load()["key_cols"]
        f = (
            self.fact.read() if fact_version is None
            else self.fact.read_version(fact_version)
        )
        d = (
            self.dim.read() if dim_version is None
            else self.dim.read_version(dim_version)
        )
        fp = self._fact_projection(f)
        dp = d.select(
            *[F.col(k).cast("string").alias(f"_fk_{i}")
              for i, k in enumerate(dim_keys)],
            *[F.col(c).cast(t).alias(n) for n, c, t in self.dim_cols],
        )
        fk_names = [f"_fk_{i}" for i in range(len(self.fk_cols))]
        return fp.join(dp, fk_names, "left_outer").select(
            *keys,
            *[n for n, _, _ in self.fact_cols],
            *[n for n, _, _ in self.dim_cols],
        )

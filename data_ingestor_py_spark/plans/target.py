"""TargetTable — bucketed copy-on-write table with snapshot isolation.

This is the engine's sink abstraction (SURVEY.md §7 step 1). The design is
Iceberg's: immutable data files + an atomically swapped manifest naming the
current snapshot. The sandbox has no Iceberg runtime jar (offline), so the
same semantics are implemented on plain parquet:

- Data lives in hash buckets: ``bucket = pmod(xxhash64(key_cols), B)`` —
  the Iceberg partition spec ``bucket(B, repo||path)``. A merge touches only
  the buckets its batch keys hash into; untouched buckets are carried into
  the new snapshot *by reference* (copy-on-write at bucket granularity).
- ``_manifest.json`` is swapped with ``os.replace`` (atomic on POSIX): a
  reader always sees a complete snapshot; an aborted merge leaves orphan
  files but no visible change — exactly the reference's
  commit-or-rollback finalize (msgbroker/sql_consumer.py:228-273) made
  atomic at table level.
- Schema evolution is by field id, like Iceberg: the manifest records every
  schema version; each bucket file remembers the version it was written
  under; the read path aligns old files to the current schema (rename =
  id match, retype = cast, add = NULL-fill) without rewriting data.

Merge semantics (M1 + M9): an upsert event wins iff its ``_seq`` exceeds the
stored row's; deletes are kept as tombstones (``_op = 'D'``) so a late,
lower-``_seq`` upsert cannot resurrect a deleted key; the public ``read()``
filters tombstones. The whole WHEN MATCHED/NOT MATCHED ladder reduces to
"union state + batch, keep per-key max-``_seq`` row", which is idempotent —
that is what makes task retries and batch replays exactly-once.

At 100 TB: B is sized so a bucket (~table_size/B) fits a task comfortably;
the merge shuffle is a hash partition on the key, AQE splits skewed
partitions, and only touched buckets are read/written — a batch touching 3%%
of keys reads ~3%% of the table, not all of it.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestor_py_spark.operators.dedup import latest_by_key, salted_latest_by_key

MANIFEST = "_manifest.json"
TOMBSTONE_COLS = ("_op",)


def _bucket_expr(key_cols: list[str], num_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(num_buckets)).cast("int")


@dataclass
class MergeStats:
    rows_in: int
    rows_after_dedup: int
    touched_buckets: int
    snapshot_version: int
    bucket_rows: list[tuple[int, int]]  # (bucket_id, applied rows) per bucket
    seq_min: int = 0
    seq_max: int = 0


class TargetTable:
    """A keyed, versioned, schema-evolving table of current row states."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # ---------------- manifest ----------------

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, MANIFEST)

    def exists(self) -> bool:
        return os.path.exists(self._manifest_path)

    def _load(self) -> dict:
        with open(self._manifest_path) as f:
            return json.load(f)

    def _commit_manifest(self, m: dict) -> None:
        tmp = self._manifest_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic snapshot swap

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        key_cols: list[str],
        columns: list[tuple[str, str]],
        num_buckets: int = 64,
        seq_col: str = "_seq",
    ) -> "TargetTable":
        """Create an empty table. ``columns`` = [(name, spark_type)] for the
        payload; engine columns (_seq, _op, _ts) are always present."""
        os.makedirs(root, exist_ok=True)
        t = cls(spark, root)
        fields = [{"id": i + 1, "name": n, "type": ty} for i, (n, ty) in enumerate(columns)]
        m = {
            "format_version": 1,
            "version": 0,
            "key_cols": key_cols,
            "seq_col": seq_col,
            "num_buckets": num_buckets,
            "current_schema": 1,
            "schemas": {"1": fields},
            "buckets": {},  # bucket_id -> {"path": rel_dir, "schema": v}
            "history": [],
        }
        t._commit_manifest(m)
        return t

    # ---------------- schema helpers ----------------

    def schema_fields(self, m: dict | None = None, version: int | None = None) -> list[dict]:
        m = m or self._load()
        v = version or m["current_schema"]
        return m["schemas"][str(v)]

    def current_columns(self, m: dict | None = None) -> list[str]:
        m = m or self._load()
        return (
            m["key_cols"]
            + [f["name"] for f in self.schema_fields(m)]
            + [m["seq_col"], "_op", "_ts"]
        )

    def _empty_state(self, m: dict) -> DataFrame:
        fields = self.schema_fields(m)
        ddl = ", ".join(
            [f"{k} string" for k in m["key_cols"]]
            + [f"`{f['name']}` {f['type']}" for f in fields]
            + [f"{m['seq_col']} long", "_op string", "_ts timestamp"]
        )
        return self.spark.createDataFrame([], ddl)

    def _align(self, df: DataFrame, m: dict, written_version: int) -> DataFrame:
        """Project a file written under ``written_version`` to the current
        schema: field-id rename + cast + NULL-fill (Iceberg read path)."""
        cur = self.schema_fields(m)
        old = {f["id"]: f for f in self.schema_fields(m, written_version)}
        exprs = [F.col(c) for c in m["key_cols"]]
        for f in cur:
            o = old.get(f["id"])
            if o is None:
                exprs.append(F.lit(None).cast(f["type"]).alias(f["name"]))
            else:
                exprs.append(F.col(o["name"]).cast(f["type"]).alias(f["name"]))
        exprs += [F.col(m["seq_col"]), F.col("_op"), F.col("_ts")]
        return df.select(*exprs)

    # ---------------- schema evolution (M5) ----------------

    def evolve(
        self,
        add: list[tuple[str, str]] | None = None,
        rename: dict[str, str] | None = None,
        retype: dict[str, str] | None = None,
    ) -> int:
        """Add/rename/retype payload columns; data files are not rewritten.
        Returns the new schema version. Mirrors the reference's
        flush-then-switch mapping swap (msgbroker/sql_consumer.py:61-71),
        but versioned and metadata-only like Iceberg UpdateSchema."""
        m = self._load()
        fields = [dict(f) for f in self.schema_fields(m)]
        max_id = max((f["id"] for f in fields), default=0)
        for old, new in (rename or {}).items():
            for f in fields:
                if f["name"] == old:
                    f["name"] = new
        for name, ty in (retype or {}).items():
            for f in fields:
                if f["name"] == name:
                    f["type"] = ty
        for name, ty in add or []:
            max_id += 1
            fields.append({"id": max_id, "name": name, "type": ty})
        new_v = m["current_schema"] + 1
        m["schemas"][str(new_v)] = fields
        m["current_schema"] = new_v
        m["history"].append({"at": time.time(), "schema": new_v, "op": "evolve"})
        self._commit_manifest(m)
        return new_v

    # ---------------- read paths ----------------

    def _state_df(self, m: dict, bucket_ids: list[int] | None = None) -> DataFrame:
        """Raw state incl. tombstones for the given buckets (None = all)."""
        groups: dict[int, list[str]] = {}
        for b, info in m["buckets"].items():
            if bucket_ids is not None and int(b) not in bucket_ids:
                continue
            groups.setdefault(info["schema"], []).append(os.path.join(self.root, info["path"]))
        if not groups:
            return self._empty_state(m)
        parts = []
        for schema_v, paths in groups.items():
            df = self.spark.read.parquet(*paths)
            parts.append(self._align(df, m, schema_v))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read(self) -> DataFrame:
        """Current visible rows (tombstones filtered)."""
        m = self._load()
        return self._state_df(m).where(F.col("_op") != "D")

    def read_raw(self) -> DataFrame:
        return self._state_df(self._load())

    # ---------------- merge-apply (M1/M2/M3/M9) ----------------

    def merge_apply(
        self,
        batch: DataFrame,
        salt_buckets: int = 0,
        dedup_ids: list[str] | None = None,
    ) -> MergeStats:
        """Apply one micro-batch of change events.

        Pipeline: drop replayed duplicates -> per-key max-_seq reduce
        (salted if requested) -> union with current state of touched buckets
        -> per-key max again (late events with _seq <= stored max lose) ->
        rewrite only touched buckets -> atomic manifest swap.
        """
        from pyspark.sql import Observation

        m = self._load()
        key_cols, seq_col, B = m["key_cols"], m["seq_col"], m["num_buckets"]
        cols = self.current_columns(m)

        # Input stats ride the reduce job via observe() — no extra count job.
        obs = Observation()
        batch = batch.select(*[F.col(c) for c in cols]).observe(
            obs,
            F.count(F.lit(1)).alias("rows_in"),
            F.min(seq_col).alias("seq_min"),
            F.max(seq_col).alias("seq_max"),
        )
        # NOTE: no separate dropDuplicates stage — the max-struct reduce below
        # already collapses replayed duplicates deterministically, saving a
        # full extra shuffle per batch.
        reduced = (
            salted_latest_by_key(batch, key_cols, seq_col, salt_buckets)
            if salt_buckets
            else latest_by_key(batch, key_cols, seq_col)
        )
        reduced = reduced.select(*cols).withColumn("bkt", _bucket_expr(key_cols, B))
        # Touched-bucket discovery: <= B small ints — metadata-scale collect,
        # the Iceberg equivalent is partition summaries in the manifest.
        reduced = reduced.persist()
        try:
            per_bucket = {
                r["bkt"]: r["n"]
                for r in reduced.groupBy("bkt").agg(F.count("*").alias("n")).collect()
            }
            ob = obs.get
            rows_in = int(ob["rows_in"])
            seq_min = int(ob["seq_min"] or 0)
            seq_max = int(ob["seq_max"] or 0)
            touched = sorted(per_bucket)
            rows_dedup = sum(per_bucket.values())
            if not touched:
                return MergeStats(rows_in, 0, 0, m["version"], [])

            state = self._state_df(m, touched).withColumn("bkt", _bucket_expr(key_cols, B))
            merged = latest_by_key(
                state.unionByName(reduced), key_cols + ["bkt"], seq_col
            ).select(*cols, "bkt")

            new_v = m["version"] + 1
            rel = f"snap-{new_v:06d}"
            out_dir = os.path.join(self.root, rel)
            (
                merged.repartition(max(len(touched), 1), F.col("bkt"))
                .write.partitionBy("bkt")
                .mode("overwrite")
                .parquet(out_dir)
            )
        finally:
            reduced.unpersist()

        for b in touched:
            m["buckets"][str(b)] = {
                "path": f"{rel}/bkt={b}",
                "schema": m["current_schema"],
            }
        m["version"] = new_v
        m["history"].append(
            {"at": time.time(), "snapshot": new_v, "op": "merge",
             "rows_in": rows_in, "rows_applied": rows_dedup, "buckets": touched}
        )
        self._commit_manifest(m)
        return MergeStats(
            rows_in, rows_dedup, len(touched), new_v, sorted(per_bucket.items()),
            seq_min, seq_max,
        )

    # ---------------- verification / maintenance ----------------

    def snapshot_hash(self) -> str:
        """Order-insensitive content hash of the visible state: per-row
        sha256 over the canonical row repr, folded with an order-independent
        sum. Used for byte-for-byte replay equality (M7)."""
        df = self.read()
        row_repr = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in sorted(df.columns)])
        row_hash = F.conv(F.substring(F.sha2(row_repr, 256), 1, 15), 16, 10).cast("decimal(38,0)")
        agg = df.agg(F.sum(row_hash).alias("s"), F.count("*").alias("n")).collect()[0]
        return f"{agg['n']}:{agg['s']}"

    def expire_snapshots(self, keep_last: int = 1) -> None:
        """Delete snapshot dirs no longer referenced by the manifest."""
        m = self._load()
        live = {info["path"].split("/")[0] for info in m["buckets"].values()}
        snaps = sorted(d for d in os.listdir(self.root) if d.startswith("snap-"))
        for d in snaps[:-keep_last] if keep_last else snaps:
            if d not in live:
                shutil.rmtree(os.path.join(self.root, d), ignore_errors=True)

"""SQL-database sink: staged idempotent upsert per micro-batch.

The reference's entire output surface is a SQL warehouse — psycopg2 batch
INSERT + UPDATE-by-id through per-dialect query builders and connection
managers (db/postgres_query_builder.py:16-45, db/oracle_query_builder.py,
db/connection_manager.py:55-89). The Spark-native generalization keeps the
dialect-parameterized statement builders but replaces row-at-a-time
execution with the shape that survives 10^10 events:

1. REDUCE the micro-batch to one row per key with the same max-``_seq``
   rule as the lake merge (both sinks agree on winners), distributed;
2. LAND the reduced batch in a staging table — in production
   ``df.write.jdbc`` from the executors (this container ships no JDBC
   driver jars, so the integration-tested backend is DuckDB via Arrow
   registration, an in-process but fully real SQL engine);
3. one ATOMIC set-based upsert from staging into the target, guarded by
   ``_seq`` so replays and late events are no-ops — the warehouse-side
   mirror of TargetTable's idempotent merge. Deletes land as tombstone
   rows (``_op = 'D'``) exactly like the lake table, so a late upsert can
   never resurrect a deleted key; ``visible`` filters them.

Exactly-once therefore needs no XA/2PC: Spark retries re-run step 2+3 and
the guard makes re-application idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from data_ingestor_py_spark.operators.dedup import latest_by_key

ENGINE_COLS = [("_seq", "BIGINT"), ("_op", "VARCHAR"), ("_ts", "TIMESTAMP")]


def _q(col: str) -> str:
    """Identifier quoting, reference-style: double quotes, lowered
    (postgres_query_builder.py:31)."""
    return f'"{col.lower()}"'


def build_insert_query(table: str, columns: list[str], batch: bool = True) -> str:
    """Reference-parity INSERT (postgres_query_builder.py:16-41): quoted
    lowered columns, one ``%s`` placeholder for execute_values batches or
    positional placeholders for single rows."""
    col_list = ", ".join(_q(c) for c in columns)
    values = "%s" if batch else f"({', '.join(['%s'] * len(columns))})"
    return f"INSERT INTO {table} ({col_list}) VALUES {values} RETURNING id;"


def build_update_query(table: str, columns: list[str], condition: str = "id = %s") -> str:
    """Reference-parity UPDATE-by-id (postgres_query_builder.py:43-45)."""
    assignments = ", ".join(f"{_q(c)} = %s" for c in columns if c != "job_id")
    return f"UPDATE {table} SET {assignments} WHERE {condition}"


def build_create_table(
    table: str, key_cols: list[str], payload: list[tuple[str, str]]
) -> str:
    """Target DDL: keys (PK for the conflict target) + payload + engine
    columns. SQL types are the caller's dialect's."""
    cols = (
        [f"{_q(k)} VARCHAR NOT NULL" for k in key_cols]
        + [f"{_q(n)} {t}" for n, t in payload]
        + [f"{_q(n)} {t}" for n, t in ENGINE_COLS]
    )
    pk = ", ".join(_q(k) for k in key_cols)
    return f"CREATE TABLE IF NOT EXISTS {table} ({', '.join(cols)}, PRIMARY KEY ({pk}))"


def build_staging_upsert(
    table: str,
    staging: str,
    key_cols: list[str],
    payload_cols: list[str],
    seq_col: str = "_seq",
    dialect: str = "postgres",
) -> str:
    """One set-based statement applying a (already per-key-reduced) staging
    table into the target with the max-``_seq`` idempotency guard.

    ``postgres``/``duckdb``: INSERT .. ON CONFLICT DO UPDATE .. WHERE
    excluded._seq > target._seq. ``merge`` (Oracle/ANSI): MERGE INTO with
    the same guard on WHEN MATCHED."""
    non_key = payload_cols + [c for c, _ in ENGINE_COLS]
    all_cols = key_cols + non_key
    col_list = ", ".join(_q(c) for c in all_cols)
    keys = ", ".join(_q(k) for k in key_cols)
    if dialect in ("postgres", "duckdb", "sqlite"):
        sets = ", ".join(f"{_q(c)} = excluded.{_q(c)}" for c in non_key)
        # sqlite requires a WHERE on a SELECT source feeding an upsert
        # (grammar ambiguity between join-ON and conflict-ON); harmless
        # elsewhere but kept dialect-scoped to preserve reference parity
        src_where = " WHERE true" if dialect == "sqlite" else ""
        return (
            f"INSERT INTO {table} ({col_list}) "
            f"SELECT {col_list} FROM {staging}{src_where} "
            f"ON CONFLICT ({keys}) DO UPDATE SET {sets} "
            f"WHERE excluded.{_q(seq_col)} > {table}.{_q(seq_col)}"
        )
    if dialect == "merge":
        on = " AND ".join(f"t.{_q(k)} = s.{_q(k)}" for k in key_cols)
        sets = ", ".join(f"t.{_q(c)} = s.{_q(c)}" for c in non_key)
        ins_vals = ", ".join(f"s.{_q(c)}" for c in all_cols)
        return (
            f"MERGE INTO {table} t USING {staging} s ON ({on}) "
            f"WHEN MATCHED AND s.{_q(seq_col)} > t.{_q(seq_col)} "
            f"THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({col_list}) VALUES ({ins_vals})"
        )
    raise ValueError(f"unknown dialect: {dialect}")


class SqlUpsertSink:
    """CDC sink into an in-process SQL database; the identical statements
    run against Postgres via a JDBC staging write — see module docstring.

    Two integration-tested dialects prove the builders are not shaped
    around one engine:

    - ``duckdb`` (default): the container's real columnar SQL engine;
      staging is ingested zero-copy from the executor-written parquet
      (``read_parquet``) — the same division of labor as production
      ``df.write.jdbc``.
    - ``sqlite``: the stdlib row-store; its upsert grammar
      (``ON CONFLICT .. DO UPDATE .. WHERE``) is the same family as
      Postgres. SQLite cannot read parquet, so the test harness transports
      the staged rows with batched ``executemany`` — a jar-free stand-in
      for the JDBC staging write that still proves STATEMENT portability;
      row transport is not the semantics under test."""

    def __init__(
        self,
        con,  # duckdb.DuckDBPyConnection | sqlite3.Connection
        table: str,
        key_cols: list[str],
        payload: list[tuple[str, str]],
        seq_col: str = "_seq",
        dialect: str = "duckdb",
    ):
        self.con = con
        self.table = table
        self.key_cols = key_cols
        self.payload = payload
        self.seq_col = seq_col
        self.dialect = dialect
        con.execute(build_create_table(table, key_cols, payload))

    def apply_batch(self, batch: DataFrame) -> int:
        """Distributed per-key reduce, then one set-based upsert. Returns
        the number of staged (applied-candidate) rows.

        Staging never round-trips through the driver: the EXECUTORS write
        the reduced batch as parquet and the database ingests the files
        directly (``read_parquet``) — the same division of labor as the
        production JDBC path, where ``df.write.jdbc`` lands the staging
        table from the executors. Driver memory stays O(1) regardless of
        batch width."""
        import shutil
        import tempfile

        cols = self.key_cols + [n for n, _ in self.payload] + [n for n, _ in ENGINE_COLS]
        reduced = latest_by_key(batch.select(*cols), self.key_cols, seq_col=self.seq_col)
        import glob

        stage_dir = tempfile.mkdtemp(prefix=f"sqlsink-{self.table}-")
        try:
            reduced.write.mode("overwrite").parquet(stage_dir)
            if not glob.glob(f"{stage_dir}/*.parquet"):
                return 0  # empty batch: Spark may emit no part files at all
            staging = f"_staging_{self.table}"
            if self.dialect == "sqlite":
                n = self._stage_sqlite(staging, stage_dir, cols)
            else:
                n = self._stage_duckdb(staging, stage_dir, cols)
            try:
                if n:
                    self.con.execute(
                        build_staging_upsert(
                            self.table, staging, self.key_cols,
                            [n_ for n_, _ in self.payload], self.seq_col,
                            dialect=self.dialect,
                        )
                    )
                    if self.dialect == "sqlite":
                        self.con.commit()
            finally:
                kind = "TABLE" if self.dialect == "sqlite" else "VIEW"
                self.con.execute(f"DROP {kind} IF EXISTS {staging}")
            return int(n)
        finally:
            shutil.rmtree(stage_dir, ignore_errors=True)

    def _stage_duckdb(self, staging: str, stage_dir: str, cols: list[str]) -> int:
        col_list = ", ".join(_q(c) for c in cols)
        self.con.execute(
            f"CREATE OR REPLACE TEMP VIEW {staging} AS "
            f"SELECT {col_list} FROM read_parquet('{stage_dir}/*.parquet')"
        )
        return self.con.execute(f"SELECT count(*) FROM {staging}").fetchone()[0]

    def _stage_sqlite(self, staging: str, stage_dir: str, cols: list[str]) -> int:
        """Batched-insert staging (the execute_values shape of the
        reference's psycopg2 path, db/connection_manager.py:55-89) — see
        class docstring for why transport differs from the duckdb path."""
        import datetime

        import pyarrow.dataset as pads

        rows = pads.dataset(stage_dir, format="parquet").to_table().to_pylist()
        types = dict(
            [(k, "VARCHAR") for k in self.key_cols] + self.payload + ENGINE_COLS
        )
        self.con.execute(f"DROP TABLE IF EXISTS {staging}")
        self.con.execute(
            f"CREATE TEMP TABLE {staging} "
            f"({', '.join(f'{_q(c)} {types[c]}' for c in cols)})"
        )

        def bind(v):
            return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v

        self.con.executemany(
            f"INSERT INTO {staging} ({', '.join(_q(c) for c in cols)}) "
            f"VALUES ({', '.join('?' for _ in cols)})",
            [[bind(r[c]) for c in cols] for r in rows],
        )
        return len(rows)

    def foreach_batch(self):
        """Adapter for ``writeStream.foreachBatch`` (streaming CDC tail into
        a warehouse)."""
        return lambda df, epoch_id: self.apply_batch(df)

    def visible(self):
        """Current rows (tombstones filtered); works on both engines
        (duckdb connections and sqlite cursors both expose
        ``fetchall``/``description`` after ``execute``)."""
        return self.con.execute(f"SELECT * FROM {self.table} WHERE \"_op\" <> 'D'")

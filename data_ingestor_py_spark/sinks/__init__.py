"""Warehouse/SQL sinks: the reference's Postgres/Oracle output surface
re-expressed as staged set-based upserts (never row-at-a-time statements).
"""

from data_ingestor_py_spark.sinks.sql_sink import (  # noqa: F401
    SqlUpsertSink,
    build_create_table,
    build_insert_query,
    build_staging_upsert,
    build_update_query,
)

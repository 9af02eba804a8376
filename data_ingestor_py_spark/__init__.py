"""data_ingestor_py_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of
``CS-PCockrill/data-ingestor-py`` (reference at /root/reference) as an
idiomatic Spark engine: ordered insert/update/delete change events keyed by
``(repo, path)`` are deduplicated by max event-sequence, MERGEd into a
bucketed copy-on-write table with snapshot isolation, schema evolution,
per-batch lineage and resume-from-checkpoint.

The reference is a two-thread queue pipeline (producer parses JSON/XML/Excel,
consumer batch-INSERTs into Postgres — see SURVEY.md). Here the queue is the
Spark DAG, batches are micro-batches, and the sink is an atomic snapshot
commit. Nothing is ported; semantics are re-derived (citations in
docstrings point at the reference behaviour being generalized).
"""

__version__ = "0.1.0"

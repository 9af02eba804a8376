"""Connected components for near-duplicate cluster canonicalization.

The dedup pipeline's last mile: MinHash/LSH (or embedding-cosine) emits
near-dup PAIRS; training-data dedup needs CLUSTERS with one canonical
document each. Components are computed by iterative min-label propagation
— the Pregel/GraphX pattern expressed as plain joins:

    label(v) <- min(label(v), min over neighbors u of label(u))

Each iteration is one shuffle join + one aggregate; near-dup clusters have
tiny diameters (pairs come from shared LSH buckets), so convergence takes
O(log(diameter)) rounds in practice. The driver loop only checks a
CHANGED-count scalar per round (metadata-scale) and ``localCheckpoint``
cuts the lineage so plans do not grow across iterations — at 10^10 edges
each round is an ordinary distributed join, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (id_col, component) where component = min vertex id reachable
    from the vertex (undirected). Vertices without edges form singleton
    components labeled by themselves."""
    und = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).distinct()
    labels = vertices.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        neighbor_labels = (
            und.join(labels, und["v"] == labels["node"])
            .select(und["u"].alias("node"), labels["label"].alias("label"))
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("component"))

"""Connected components for near-duplicate cluster canonicalization.

The dedup pipeline's last mile: MinHash/LSH (or embedding-cosine) emits
near-dup PAIRS; training-data dedup needs CLUSTERS with one canonical
document each. Components are computed by iterative min-label propagation
— the Pregel/GraphX pattern expressed as plain joins:

    label(v) <- min(label(v), min over neighbors u of label(u))

Each iteration is one shuffle join + one aggregate. Plain min-label
propagation moves a label ONE hop per round, so convergence takes
O(diameter) rounds — fine for near-dup clusters (pairs come from shared
LSH buckets, so components are dense and shallow), but chain-shaped graphs
need ``max_iter >= diameter``. The loop therefore tracks whether it
actually converged and raises by default if the budget runs out — silently
returning partially-propagated labels would split clusters with no signal.
(The O(log d) alternative is large-star/small-star contraction
[Kiveris et al., "Connected Components in MapReduce and Beyond"]; the
shortcutting ``label <- label(label)`` join below gets most of that win by
doubling the effective hop length each round.) The driver loop only checks
a CHANGED-count scalar per round (metadata-scale) and ``localCheckpoint``
cuts the lineage so plans do not grow across iterations — at 10^10 edges
each round is an ordinary distributed join, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ComponentsNotConverged(Exception):
    """Min-label propagation ran out of iterations before reaching a
    fixpoint — the returned labels would split real components."""


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    on_nonconverged: str = "raise",
) -> DataFrame:
    """Return (id_col, component) where component = min vertex id reachable
    from the vertex (undirected). Vertices without edges form singleton
    components labeled by themselves.

    Each round does (a) a 1-hop neighbor-min propagation and (b) a
    pointer-jumping shortcut ``label <- label(label)``, which doubles the
    effective propagation distance per round — a path of length L converges
    in ~log2(L) rounds, so ``max_iter=25`` covers diameters up to ~2^25.
    If the budget is still exhausted, ``on_nonconverged`` picks the failure
    mode: ``"raise"`` (default — wrong clusters must not pass silently) or
    ``"warn"`` (log and return the partial labels)."""
    # materialize the undirected edge list ONCE: it is joined every round,
    # and without cutting its lineage each round would re-run the entire
    # upstream pipeline that produced the edges (e.g. the LSH candidate
    # join) — at N rounds that is N extra full pipeline executions
    und = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    ).distinct().localCheckpoint(eager=True)
    labels = vertices.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")
    ).localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        ltype = labels.schema["label"].dataType
        neighbor_labels = (
            und.join(labels, und["v"] == labels["node"])
            .select(und["u"].alias("node"), labels["label"].alias("label"),
                    F.lit(None).cast(ltype).alias("_old"))
        )
        # carry each node's pre-round label through the aggregation (only
        # the self row has it; max() picks it up) so convergence detection
        # is a column compare on this round's OWN output — no extra
        # new-vs-old join per round
        stepped = (
            labels.select("node", "label", F.col("label").alias("_old"))
            .unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("label").alias("label"), F.max("_old").alias("_old"))
        )
        # pointer jumping: a label is itself a vertex id, and label(x) is
        # reachable from x, so label(label(v)) is a valid (and <=) label for
        # v — composing halves the remaining propagation depth each round.
        hop = stepped.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        new_labels = (
            stepped.join(hop, stepped["label"] == hop["pnode"], "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("plabel", "label")).alias("label"),
                "_old",
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.where(~F.col("label").eqNullSafe(F.col("_old"))).limit(1).count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            converged = True
            break
    if not converged:
        msg = (
            f"connected_components did not converge in {max_iter} rounds; "
            "labels would split real components — raise max_iter"
        )
        if on_nonconverged == "raise":
            raise ComponentsNotConverged(msg)
        import warnings

        warnings.warn(msg, stacklevel=2)
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("component"))

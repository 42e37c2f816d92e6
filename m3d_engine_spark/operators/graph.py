"""Connected components — the clustering stage of a dedup pipeline.

Beyond-reference capability. Pair generators (MinHash/LSH, SimHash,
Jaccard, embedding near-dup) emit EDGES; production dedup needs the
transitive closure: every document labeled with its duplicate-cluster
id so one canonical survivor per cluster can be kept. This is
min-label propagation to a fixpoint:

    label(v) <- min(label(v), min over neighbors(label(u)))

iterated until no label changes. Each iteration is ONE distributed
join + aggregation (shuffles keyed on vertex id); the driver only
checks a convergence count. Iterations needed = graph diameter in the
worst case — dedup-cluster diameters are tiny (most clusters are
cliques or short chains from banded LSH), so 2-4 rounds in practice.
For adversarial long-chain graphs, raise ``max_iterations`` or switch
the edge set to the large-star/small-star contraction (same primitive,
fewer rounds); checkpointing every few rounds keeps lineage bounded.

Determinism: the component id is min(vertex id) of the component —
engine-portable and oracle-checkable with a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iterations: int = 20,
    checkpoint_every: int = 1,
) -> DataFrame:
    """(id, component) with component = min id reachable from ``id``
    (including itself); nodes absent from ``edges`` form singleton
    components. ``edges`` is treated as undirected."""
    sym = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # The edge list is re-read EVERY round; left lazy, an expensive
        # upstream (an LSH pair pipeline) would be re-executed per
        # iteration. Unpersisted before returning — by then the labels
        # are checkpointed and carry no lineage into sym.
        .persist()
    )
    labels = nodes.select(
        F.col(id_col).alias("a"), F.col(id_col).alias("component")
    )
    for i in range(max_iterations):
        # Neighbor minimum: for each vertex, the smallest label among its
        # neighbors' current labels.
        neighbor_min = (
            sym.join(
                labels.select(
                    F.col("a").alias("b"), F.col("component").alias("nb_label")
                ),
                on="b",
            )
            .groupBy("a")
            .agg(F.min("nb_label").alias("nb_min"))
        )
        updated = (
            labels.join(neighbor_min, on="a", how="left")
            .select(
                "a",
                F.least(
                    F.col("component"), F.coalesce("nb_min", F.col("component"))
                ).alias("component"),
                (
                    F.col("nb_min").isNotNull()
                    & (F.col("nb_min") < F.col("component"))
                ).alias("_changed"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            # Materialize: the convergence count below is an action, and
            # without a checkpoint every later round would re-execute the
            # whole join chain from the start (quadratic in rounds); the
            # checkpoint also truncates the two-joins-per-round lineage.
            updated = updated.localCheckpoint(eager=True)
        changed = updated.filter(F.col("_changed")).limit(1).count()
        labels = updated.drop("_changed")
        if changed == 0:
            break
    if checkpoint_every != 1:
        # Cut any remaining lineage through sym before releasing it.
        labels = labels.localCheckpoint(eager=True)
    sym.unpersist()
    return labels.select(F.col("a").alias(id_col), "component")

"""Connected components over a pair/edge frame — the clustering step a
dedup pipeline needs AFTER candidate pairs: MinHash/LSH emits near-dup
PAIRS, but deleting duplicates requires grouping pairs into components
and electing one canonical document per component.

Algorithm: min-label propagation to a fixed point.  Every node starts
labeled with its own id; each round, a node adopts the smallest label in
its neighborhood; converged when no label changes.  Rounds needed equal
the graph diameter — near-dup components are small and dense (mutual
near-duplicates), so 3-5 rounds cover real corpora.

Scale shape per round: one shuffle (edge⋈label join + min-agg on dst) —
the classic iterative-join formulation.  Lineage is truncated with
``localCheckpoint`` each round so plans don't grow with iterations (on a
cluster, checkpoint to reliable storage instead).  The driver-side loop
is control flow only — per-round work is fully distributed; the single
``count()`` per round is the convergence test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Components of the undirected graph given by ``edges``.

    Returns ``(node, component)`` for every node that appears in an edge,
    where ``component`` is the minimum node id reachable from ``node``
    (a canonical, engine-independent representative).  Isolated nodes
    never enter the edge list, so they are their own implicit singleton
    components — union them in downstream if needed.

    Raises if ``max_iter`` rounds don't converge (pathologically long
    path graphs); near-dup graphs converge in a handful of rounds.
    """
    # undirected: propagate both ways.  Materialize the DIRECTED list
    # first — a union of two branches over a lazy upstream runs that
    # upstream (e.g. a 10s+ LSH candidate join) once PER BRANCH; after
    # the checkpoint, mirroring reads materialized rows.  The mirrored
    # union is checkpointed too so the per-round joins don't re-union.
    e0 = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).localCheckpoint()
    e = e0.union(
        e0.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()

    labels = (
        e.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint()
    )

    for _ in range(max_iter):
        neigh_min = (
            e.join(labels, e.u == labels.node)
            .groupBy(F.col("v").alias("node2"))
            .agg(F.min("component").alias("neigh_component"))
        )
        # checkpoint FIRST so the join+agg runs once per round; the
        # convergence count then reads the materialized result
        updated = (
            labels.join(neigh_min, labels.node == neigh_min.node2, "left")
            .select(
                "node",
                "component",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("neigh_component"), F.col("component")),
                ).alias("new_component"),
            )
            .localCheckpoint()
        )
        changed = updated.where(
            F.col("new_component") != F.col("component")
        ).count()
        labels = updated.select(
            "node", F.col("new_component").alias("component")
        )
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds max_iter)"
    )


def dedup_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """End-to-end near-dup removal: group ``pairs`` into components and
    keep, per component, only the row of ``df`` with the minimum id (the
    component label itself).  Rows never mentioned in a pair pass through
    untouched — singletons are implicitly canonical."""
    comps = connected_components(pairs, src=src, dst=dst)
    losers = comps.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")

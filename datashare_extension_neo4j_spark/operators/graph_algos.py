"""Iterative graph algorithms over edge DataFrames.

``connected_components`` — hash-min label propagation plus pointer
jumping (path halving), re-expressed as DataFrame joins: every node
starts as its own component; each round takes the min label over its
neighborhood (hash-min) and then replaces its label with its label's
label (pointer jump). The jump makes label trees collapse
geometrically, so convergence is O(log diameter) rounds — a 1000-hop
near-dup chain converges in ~10 rounds, the same shape as
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond"). Driver coordinates the loop (as GraphX/Pregel
drivers do); per-round cost is two key-partitioned joins, and
``localCheckpoint`` truncates the lineage so plans don't grow with
iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for the undirected graph of ``edges``;
    component = min node id in the component (deterministic)."""
    # materialize the symmetrized edge list ONCE: ``edges`` may be an
    # arbitrarily expensive upstream pipeline (dedup_minhash_clusters
    # feeds the whole shingle→minhash→band→verify LSH dedup here), and
    # every loop round below joins against ``sym`` twice plus a
    # convergence count — without this checkpoint each of the
    # O(log diameter) rounds would re-execute the full upstream plan.
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct().localCheckpoint()
    comp = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(comp, sym.b == comp.node)
            .groupBy("a")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = comp.join(nbr_min, comp.node == nbr_min.a, "left").select(
            "node",
            F.least(
                F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
            ).alias("comp"),
        )
        # pointer jump (path halving): label ← label's label. Collapses
        # label chains geometrically → O(log diameter) total rounds.
        lbl = stepped.select(
            F.col("node").alias("_lnode"), F.col("comp").alias("_lcomp")
        )
        new_comp = (
            stepped.join(lbl, stepped.comp == lbl._lnode, "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("_lcomp", F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()  # truncate lineage each round
        )
        changed = (
            new_comp.alias("n")
            .join(comp.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        comp = new_comp
        if changed == 0:
            return comp
    # exhausting the bound without convergence means labels are WRONG
    # (hash-min moves the min one hop per round; diameter > max_iter
    # leaves tail nodes mislabeled) — fail loudly, never return them
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds the bound); raise max_iter or use a "
        "round-doubling variant (large-star/small-star) for "
        "long-chain graphs"
    )

"""Iterative graph algorithms over edge DataFrames.

``connected_components`` — hash-min label propagation (the classic
Pregel/GraphX shape re-expressed as DataFrame joins): every node starts
as its own component; each round takes the min component id over its
neighborhood; converges in O(diameter) rounds. Driver coordinates the
loop (as GraphX/Pregel drivers do); per-round cost is one shuffle on
the edge key, and ``localCheckpoint`` truncates the lineage so plans
don't grow with iterations. At web scale the alternative with fewer
rounds is large-star/small-star (Kiveris et al.) — hash-min is chosen
here because near-dup clusters (its use case: minhash candidate pairs
→ duplicate clusters, alias graphs → canonical entities) have tiny
diameters, so 3-5 rounds typically converge.
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
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()
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
        new_comp = (
            comp.join(nbr_min, comp.node == nbr_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))
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

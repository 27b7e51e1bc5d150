"""Near-dup clustering: candidate pairs → connected components →
one representative per component.

The missing last step of a dedup pipeline: MinHash/SimHash/embedding
pair generators (operators/dedup.py) emit edges; curation needs the
transitive closure of those edges (components) and a policy pick per
component ("keep the best-quality document, drop the rest").

Components are computed by iterative min-label propagation — each
iteration is one distributed join + min-aggregate, the driver only
evaluates a scalar convergence count. Iterations needed = graph
diameter; near-dup graphs are piles of small dense clusters (diameter
2-3), so 5-10 rounds close virtually any real corpus, and the
``max_iters`` bound plus a raise-on-non-convergence keeps pathological
chains from looping silently. Lineage is truncated every iteration
(``localCheckpoint``) so the plan does not grow with the iteration
count — the standard Spark pattern for iterative graph algorithms
(same loop structure GraphX/GraphFrames use for their
connectedComponents under the hood).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    k1: str = "k1",
    k2: str = "k2",
    max_iters: int = 15,
) -> DataFrame:
    """(k1, k2) edge list → (node, comp) where ``comp`` is the MINIMUM
    node id reachable from ``node`` (deterministic component label).

    Only nodes that appear in at least one edge are returned — callers
    union isolated nodes back (they are their own component) if needed.
    """
    edges = (
        pairs.select(F.col(k1).alias("src"), F.col(k2).alias("dst"))
        .unionByName(pairs.select(F.col(k2).alias("src"), F.col(k1).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        # each node adopts the min label among itself and its neighbors
        msgs = edges.join(
            labels.withColumnRenamed("node", "dst"), "dst"
        ).select(F.col("src").alias("node"), "comp")
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} iterations "
        "(graph diameter exceeds the bound — raise max_iters)"
    )


def keep_best_per_cluster(
    df: DataFrame,
    pairs: DataFrame,
    key_col: str,
    quality_col: str | None = None,
    k1: str = "k1",
    k2: str = "k2",
) -> DataFrame:
    """Drop near-duplicates: one representative row of ``df`` survives
    per connected component of ``pairs``; rows in no pair pass through.

    Representative = highest ``quality_col`` (ties and the
    quality-less form broken by smallest key — fully deterministic)."""
    comp = connected_components(pairs, k1, k2)
    tagged = df.join(
        comp.withColumnRenamed("node", key_col), key_col, "left"
    ).withColumn("_comp", F.coalesce(F.col("comp"), F.col(key_col)))
    order = (
        [F.col(quality_col).desc(), F.col(key_col).asc()]
        if quality_col
        else [F.col(key_col).asc()]
    )
    w = W.partitionBy("_comp").orderBy(*order)
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_comp", "comp")
    )

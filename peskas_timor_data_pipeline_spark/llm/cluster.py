"""Duplicate-cluster resolution: connected components over near-dup pairs.

After MinHash-LSH (or embedding) pairing, duplicate GROUPS must be
resolved so each cluster keeps one canonical document. Pairs form a graph;
components are computed by iterative min-label propagation — each round
every node adopts the smallest id reachable within one hop, doubling the
propagation radius per round, so convergence takes O(log(diameter))
rounds. Near-dup clusters are shallow (diameter rarely >8), so the default
cap of 10 rounds covers diameters into the hundreds.

All rounds are shuffle-on-key joins — no driver-side graph, scales to
billions of edges. (GraphFrames does the same thing; this avoids the
dependency.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 10,
) -> DataFrame:
    """(node, component) for every node in ``pairs``; component = min node
    id in the component. Converges when a full round changes no label."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("nbr_min"))
        .select(
            F.col("src").alias("node"),
            F.least("src", "nbr_min").alias("component"),
        )
    )
    for _ in range(max_iter):
        # candidate = min over neighbors' current labels
        nbr = (
            edges.join(labels, edges.dst == labels.node)
            .select(edges.src.alias("node"), F.col("component"))
        )
        # the convergence flag rides along into the checkpointed frame, so
        # the per-round cost is ONE shuffle job (the eager checkpoint) plus
        # a near-free scan of checkpointed partitions for the flag
        new_labels = (
            labels.select(
                "node", "component", F.col("component").alias("__old__")
            )
            .unionByName(
                nbr.withColumn(
                    "__old__", F.lit(None).cast(nbr.schema["component"].dataType)
                )
            )
            .groupBy("node")
            .agg(
                F.min("component").alias("component"),
                F.min("__old__").alias("__old__"),
            )
            .withColumn("__changed__", F.col("component") != F.col("__old__"))
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("__changed__")).limit(1).count()
        labels = new_labels.select("node", "component")
        if changed == 0:
            break
    return labels


def resolve_duplicates(
    docs: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Keep one canonical doc per near-dup cluster (the min id), mark the
    rest. Docs in no pair are their own canonical. Adds ``canonical_id``
    and ``is_duplicate``."""
    comp = connected_components(pairs).withColumnRenamed("node", id_col)
    joined = docs.join(comp, id_col, "left")
    return joined.withColumn(
        "canonical_id", F.coalesce("component", F.col(id_col))
    ).withColumn(
        "is_duplicate", F.col("canonical_id") != F.col(id_col)
    ).drop("component")

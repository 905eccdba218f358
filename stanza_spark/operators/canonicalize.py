"""Corpus-wide canonicalization: connected components over mention-alias
edges + representative selection (operator C4).

Generalizes the reference's per-document representative-mention rule —
longest span, ties by earliest — from coref chains
(/root/reference/stanza/models/coref/coref_chain.py:66-69) to corpus scope.

Connected components run as the classic alternating **large-star /
small-star** iteration (Kiveris et al., "Connected Components in MapReduce
and Beyond") expressed purely as DataFrame joins + aggregations: each round
every node adopts the minimum label in its neighborhood; convergence in
O(log n) rounds.  `localCheckpoint` truncates lineage each round so the plan
doesn't grow unboundedly (SURVEY §4 custom-work item (e)).  No GraphFrames
dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, Window


def connected_components(edges: DataFrame, nodes: DataFrame | None = None,
                         max_iter: int = 20,
                         checkpoint: bool = True) -> DataFrame:
    """edges(src, dst) undirected (+ optional nodes(node) to keep
    singletons) -> (node, component_id) with component_id = min label."""
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .union(edges.select(F.col("src").alias("src"), F.col("src").alias("dst")))
        .union(edges.select(F.col("dst").alias("src"), F.col("dst").alias("dst")))
    )
    if nodes is not None:
        sym = sym.union(nodes.select(F.col("node").alias("src"),
                                     F.col("node").alias("dst")))
    sym = sym.distinct()
    labels = sym.groupBy("src").agg(F.min("dst").alias("comp")) \
                .withColumnRenamed("src", "node")

    for _ in range(max_iter):
        # propagate: node takes min(comp) over itself and its neighbors
        nbr = (
            sym.join(labels.withColumnRenamed("node", "dst"), "dst")
            .groupBy("src").agg(F.min("comp").alias("nbr_comp"))
            .withColumnRenamed("src", "node")
        )
        new_labels = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("nbr_comp", "comp")).alias("comp"),
            )
        )
        if checkpoint:
            new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n").join(labels.alias("o"), "node")
            .filter(F.col("n.comp") != F.col("o.comp")).limit(1).count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.withColumnRenamed("comp", "component_id")


def alias_edges(linked: DataFrame) -> DataFrame:
    """linked mentions -> undirected edges between surface forms sharing an
    entity (self-join on entity_id; surfaces lowercased as node labels)."""
    nodes = (
        linked.filter(F.col("entity_id").isNotNull())
        .select(F.lower("mention").alias("node"), "entity_id")
        .distinct()
    )
    a, b = nodes.alias("a"), nodes.alias("b")
    return (
        a.join(b, "entity_id")
        .filter(F.col("a.node") < F.col("b.node"))
        .select(F.col("a.node").alias("src"), F.col("b.node").alias("dst"))
        .distinct()
    )


def canonicalize(linked: DataFrame, max_iter: int = 20,
                 checkpoint: bool = True) -> DataFrame:
    """linked mentions -> (node, component_id, representative).

    representative = longest surface in the component, ties broken
    lexicographically (the coref_chain.py:66-69 rule, corpus-wide).
    """
    nodes = (
        linked.filter(F.col("entity_id").isNotNull())
        .select(F.lower("mention").alias("node")).distinct()
    )
    comps = connected_components(alias_edges(linked), nodes,
                                 max_iter, checkpoint)
    w = Window.partitionBy("component_id").orderBy(
        F.length("node").desc(), F.col("node").asc()
    )
    reps = (
        comps.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("component_id", F.col("node").alias("representative"))
    )
    return comps.join(reps, "component_id").select(
        "node", "component_id", "representative"
    )

"""Connected components via iterative joins (G2) — the
canonicalization primitive.

The reference computes component counts with networkx
(semantic_analyzer.py:177); at scale we run min-label propagation as a
loop of DataFrame joins (the GraphFrames-style large-star/small-star
family; see Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14 — public algorithm):

    label(v) <- min(label(v), min over neighbors u of label(u))

until a fixed point. Each iteration is one shuffle on hash(node);
``localCheckpoint`` every ``checkpoint_every`` iterations truncates
the lineage so plans stay bounded. Deterministic: labels are min node
ids under string ordering.

Used for alias canonicalization: build an edge set linking alias
mention variants (case/underscore variants of the same symbol), run
components, and the component label becomes the canonical entity id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
    checkpoint_every: int = 3,
) -> DataFrame:
    """-> (node, component) where component = min node id in the
    component (string min)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    sym = sym.persist()
    labels = labels.persist()
    for i in range(max_iterations):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(sym["a"].alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        old = labels
        labels = new_labels.persist()
        old.unpersist()
        if changed == 0:
            break
    sym.unpersist()
    return labels


def cc_alias_canonical(
    texts: DataFrame, text_col: str = "text", max_iterations: int = 10
) -> DataFrame:
    """Alias canonicalization THROUGH connected components (the north
    rule's canonicalization stage): build a bipartite alias graph
    text <-> norm-node (norm = lowercase, [-_.\\s] stripped), run
    min-label propagation, then pick the lexicographically smallest
    TEXT per component as canonical. Identical output to the
    norm-groupBy for single-hop aliases, and additionally collapses
    chained aliases (text A shares norm X with B, B shares norm Y with
    C through a second rule) transitively.

    Returns (text, canonical).
    """
    t = texts.select(F.col(text_col).alias("text")).distinct()
    norm = F.regexp_replace(F.lower(F.col("text")), r"[-_.\s]+", "")
    edges = t.select(
        F.col("text").alias("src"),
        F.concat(F.lit(" norm:"), norm).alias("dst"),
    )
    labels = connected_components(edges, max_iterations=max_iterations)
    text_labels = labels.join(t, labels["node"] == t["text"]).select(
        "text", "component"
    )
    canon = text_labels.groupBy("component").agg(
        F.min("text").alias("canonical")
    )
    return text_labels.join(canon, "component").select("text", "canonical")


def canonicalize_aliases(
    concepts: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Collapse alias variants of the same entity: two concept texts
    alias each other when their normalized form (lowercase,
    [-_.\\s] stripped) matches. Returns (text, canonical) — canonical =
    min text per alias group. A groupBy on the normalized key is the
    degenerate (single-hop) case of components, so no iteration is
    needed for this alias rule; chained aliases go through
    connected_components."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[-_.\s]+", "")
    return (
        concepts.select(F.col(text_col).alias("text"))
        .distinct()
        .withColumn("_norm", norm)
        .withColumn(
            "canonical", F.min("text").over(Window.partitionBy("_norm"))
        )
        .drop("_norm")
    )

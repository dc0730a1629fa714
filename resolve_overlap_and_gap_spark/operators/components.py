"""Distributed connected components over an edge list — the dedup-cluster
primitive: near-duplicate PAIRS (MinHash-LSH / SimHash / Jaccard output)
become CLUSTERS, each document labeled with its cluster's min doc id, so
keep-one-per-cluster is a groupBy away.

Two shapes, picked by graph structure:

* ``connected_components`` (here): min-label propagation with pointer
  jumping.  Near-dup graphs are near-cliques (every member pairs with
  most others), so the diameter is tiny and this converges in 2-4 rounds
  of two shuffles each.  NOT for long-chain graphs — a chain of k nodes
  needs ~log k rounds only thanks to pointer jumping, and the constant
  matters; for spatial piece graphs use the hierarchical union-find in
  operators/lines.polygonize_lines_grid, which exploits geometry to do
  ceil(res/4) data-independent rounds.

* the quadtree hierarchical union-find (lines.py) for geometric graphs.

Reference analog: the reference has no clustering (pairs only); this is a
graft addition for the training-data pipeline (SURVEY.md dedup section).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 20) -> DataFrame:
    """edges: two long columns (undirected; either orientation). Returns
    (id, label) for every node appearing in edges, label = min node id of
    its component.  Driver sees only per-round changed-counts.

    A CONTRACTION pass runs first: rep(u) = min(u, min neighbor) — one
    aggregation — then the iterative propagation runs on the contracted
    edge set (rep(u), rep(v)).  On near-clique dedup graphs every clique
    collapses to its min member immediately, so the heavy edge table is
    touched by exactly one aggregation + one projection join instead of
    once per round (measured ~2.5M simhash pairs at sf0.1: the contracted
    graph is ~10^2 edges).  Exact: u—rep(u) are adjacent (or equal), an
    edge (u,v) induces rep(u)~rep(v), and a component's global min node
    is always its own rep, so lifted labels equal the uncontracted fixed
    point."""
    e = edges.select(F.col(src).cast("long").alias("u"),
                     F.col(dst).cast("long").alias("v"))
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # NO distinct here: duplicate edges are harmless to the min-aggregation
    # and the contracted-graph distinct below runs on the tiny edge set —
    # skipping it saves a full shuffle of the heavy pair table
    sym = sym.localCheckpoint()
    rep = sym.groupBy("u").agg(F.min("v").alias("mn")).select(
        F.col("u").alias("id"), F.least(F.col("u"), F.col("mn")).alias("rep")
    ).localCheckpoint()
    ce = (
        sym.join(rep.select(F.col("id").alias("u"), F.col("rep").alias("ru")), "u")
        .join(rep.select(F.col("id").alias("v"), F.col("rep").alias("rv")), "v")
        .where(F.col("ru") != F.col("rv"))
        .select(F.col("ru").alias("u"), F.col("rv").alias("v"))
    )
    sym = ce.unionByName(ce.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.distinct().localCheckpoint()
    labels = sym.select(F.col("u").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    for _ in range(max_iter):
        nbr = (
            sym.join(labels.withColumnRenamed("id", "v")
                     .withColumnRenamed("label", "nl"), "v")
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("nl").alias("nbr_min"))
        )
        upd = labels.join(nbr, "id", "left").select(
            "id",
            F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
            F.col("label").alias("_old"),
        )
        # pointer jumping: label <- label's label (aliased self-join; the
        # un-aliased form silently degrades to a trivial condition)
        lmap = upd.select(F.col("id").alias("_lid"), F.col("label").alias("_ll"))
        upd = upd.join(lmap, upd["label"] == lmap["_lid"], "left").select(
            "id",
            F.least(F.col("label"), F.coalesce("_ll", "label")).alias("label"),
            "_old",
        ).localCheckpoint()
        changed = upd.where(F.col("label") != F.col("_old")).count()
        labels = upd.select("id", "label")
        if changed == 0:
            break
    # lift contracted labels back to every original node; reps whose whole
    # component collapsed in the contraction (no contracted edge) keep
    # their rep as the label
    return rep.join(labels.withColumnRenamed("id", "rep"), "rep", "left").select(
        "id", F.coalesce("label", "rep").alias("label")
    )


def dedup_clusters(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, cluster_id) for EVERY document: cluster_id = min doc id of
    its near-dup component; singletons cluster with themselves.  Keep-one
    = ``where doc_id == cluster_id``."""
    labels = connected_components(pairs)
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(labels.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select("doc_id", F.coalesce("label", "doc_id").alias("cluster_id"))
    )

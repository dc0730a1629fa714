"""Distributed connected components (dedup clustering primitive)."""

from __future__ import annotations

import pytest


@pytest.mark.spark
def test_components_cliques_and_chain(spark):
    from resolve_overlap_and_gap_spark.operators.components import (
        connected_components,
        dedup_clusters,
    )

    # two cliques {1,2,3}, {10,11} and a 6-node chain 20-21-...-25
    edges = [(1, 2), (2, 3), (1, 3), (10, 11),
             (20, 21), (21, 22), (22, 23), (23, 24), (24, 25)]
    e = spark.createDataFrame(edges, "id_a long, id_b long")
    lab = {r.id: r.label for r in connected_components(e).collect()}
    assert lab[1] == lab[2] == lab[3] == 1
    assert lab[10] == lab[11] == 10
    assert all(lab[k] == 20 for k in range(20, 26))

    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 99]],
                                 "doc_id long")
    cl = {r.doc_id: r.cluster_id
          for r in dedup_clusters(docs, e.where("id_a < 20")).collect()}
    assert cl == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}  # singleton kept


# ---------------------------------------------------------- PageRank
def test_pagerank_matches_integer_brute_force(spark):
    from resolve_overlap_and_gap_spark.operators.components import (
        PR_SCALE, pagerank)

    edges = [(0, 1), (1, 2), (2, 0), (3, 0), (3, 2), (4, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.rank_int for r in pagerank(df, n_iter=4).collect()}

    import collections
    deg = collections.Counter(s for s, _ in edges)
    nodes = sorted({n for e in edges for n in e})
    base = 15 * PR_SCALE // 100
    r = {n: PR_SCALE for n in nodes}
    for _ in range(4):
        inc = collections.Counter()
        for s, d in edges:
            inc[d] += r[s] // deg[s]
        r = {n: base + 85 * inc[n] // 100 for n in nodes}
    assert got == r


def test_pagerank_no_inlink_node_holds_base(spark):
    from resolve_overlap_and_gap_spark.operators.components import (
        PR_SCALE, pagerank)

    # 3 -> 0 -> 1: node 3 has no in-links
    df = spark.createDataFrame([(3, 0), (0, 1)], "src long, dst long")
    got = {r.id: r.rank_int for r in pagerank(df, n_iter=3).collect()}
    assert got[3] == 15 * PR_SCALE // 100
    assert got[0] > got[3]  # receives 3's contribution

"""KG-analytics layer: degree invariants and PageRank math.

The contract keys (``kg_entity_degree`` / ``kg_pagerank``) are
hash-checked against their DuckDB twins by test_entry_contract; these
tests pin the *algebraic* properties — degree conservation, rank-mass
conservation, dangling redistribution — on graphs small enough to
verify by hand, plus the hand-computed 3-node reference values.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ner_spark.plans.kg_analytics import (
    bfs_distances,
    comention_pmi,
    entity_degree,
    graph_components,
    hits,
    label_propagation,
    link_prediction,
    pagerank,
    related_topk,
    triangles,
)


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, evidence_count bigint"
    )


def test_degree_conserves_totals(spark):
    t = _triples(
        spark,
        [
            ("a", "P", "b", 3),
            ("a", "P", "c", 1),
            ("b", "Q", "c", 2),
            ("c", "P", "a", 5),
        ],
    )
    deg = entity_degree(t)
    rows = {r["node"]: r for r in deg.collect()}
    assert set(rows) == {"a", "b", "c"}
    tot = deg.agg(
        F.sum("out_degree").alias("o"), F.sum("in_degree").alias("i")
    ).first()
    assert tot["o"] == tot["i"] == t.count()
    assert rows["a"]["out_degree"] == 2 and rows["a"]["in_degree"] == 1
    assert rows["a"]["out_evidence"] == 4 and rows["a"]["in_evidence"] == 5
    # node that never appears as subj gets coalesced zeros
    only_obj = _triples(spark, [("x", "P", "y", 1)])
    y = {r["node"]: r for r in entity_degree(only_obj).collect()}["y"]
    assert y["out_degree"] == 0 and y["out_evidence"] == 0


def _rank_map(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_pagerank_mass_conserved_and_uniform_on_cycle(spark):
    # 3-cycle: symmetric, so rank stays exactly uniform every iteration
    t = _triples(
        spark, [("a", "P", "b", 1), ("b", "P", "c", 1), ("c", "P", "a", 1)]
    )
    for iters in (1, 3):
        r = _rank_map(pagerank(t, iterations=iters, checkpoint=False))
        assert all(abs(v - 1 / 3) < 1e-12 for v in r.values())
        assert abs(sum(r.values()) - 1.0) < 1e-9


def test_pagerank_hand_computed_chain(spark):
    # a -> b -> c, c dangling.  One iteration from uniform 1/3:
    #   contrib(b) = 1/3, contrib(c) = 1/3, dangling mass D = 1/3
    #   r(v) = 0.15/3 + 0.85*(contrib + (1/3)/3)
    t = _triples(spark, [("a", "P", "b", 1), ("b", "P", "c", 1)])
    r = _rank_map(pagerank(t, iterations=1, checkpoint=False))
    base = 0.15 / 3 + 0.85 * (1 / 9)
    assert r["a"] == pytest.approx(base, abs=1e-12)
    assert r["b"] == pytest.approx(base + 0.85 / 3, abs=1e-12)
    assert r["c"] == pytest.approx(base + 0.85 / 3, abs=1e-12)
    assert abs(sum(r.values()) - 1.0) < 1e-9


def test_pagerank_hub_attracts_rank(spark):
    # star: everyone points at h; h dangles back to all via dangling mass
    spokes = [chr(ord("a") + i) for i in range(6)]
    t = _triples(spark, [(s, "P", "h", 1) for s in spokes])
    r = _rank_map(pagerank(t, iterations=3, checkpoint=False))
    assert r["h"] > max(r[s] for s in spokes) * 3
    assert abs(sum(r.values()) - 1.0) < 1e-9
    # spokes are symmetric → identical ranks
    assert max(r[s] for s in spokes) - min(r[s] for s in spokes) < 1e-15


def test_components_two_islands(spark):
    # two disjoint chains → two components labelled by their min node,
    # direction ignored (c→b edge still merges b's chain)
    t = _triples(
        spark,
        [
            ("a", "P", "b", 1),
            ("c", "P", "b", 1),
            ("x", "P", "y", 1),
        ],
    )
    rows = {r["node"]: r for r in graph_components(t).collect()}
    assert {rows[n]["component"] for n in "abc"} == {"a"}
    assert {rows[n]["component"] for n in "xy"} == {"x"}
    assert all(rows[n]["component_size"] == 3 for n in "abc")
    assert all(rows[n]["component_size"] == 2 for n in "xy")
    # sizes partition the node set
    assert sum({r["component"]: r["component_size"]
                for r in rows.values()}.values()) == len(rows)


def test_components_parallel_predicates_collapse(spark):
    t = _triples(spark, [("a", "P", "b", 1), ("a", "Q", "b", 7)])
    rows = graph_components(t).collect()
    assert {(r["node"], r["component"], r["component_size"])
            for r in rows} == {("a", "a", 2), ("b", "a", 2)}


def test_comention_pmi_hand_computed(spark):
    # T=4, m(a)=4, m(b)=m(c)=2 → pmi(a,b) = ln(2·4 / (4·2)) = 0 exactly;
    # non-MENTIONED_WITH triples must not contribute to the mass
    t = _triples(
        spark,
        [
            ("a", "MENTIONED_WITH", "b", 2),
            ("a", "MENTIONED_WITH", "c", 2),
            ("a", "DECLARES", "b", 99),
        ],
    )
    rows = {(r["subj"], r["obj"]): r for r in comention_pmi(t).collect()}
    assert set(rows) == {("a", "b"), ("a", "c")}
    assert rows[("a", "b")]["pmi"] == pytest.approx(0.0, abs=1e-15)
    assert rows[("a", "c")]["evidence_count"] == 2
    # an exclusive pair scores higher than a promiscuous one:
    # b appears only with a; d spreads its mass over two partners
    t2 = _triples(
        spark,
        [
            ("a", "MENTIONED_WITH", "b", 3),
            ("a", "MENTIONED_WITH", "d", 1),
            ("c", "MENTIONED_WITH", "d", 1),
        ],
    )
    r2 = {(r["subj"], r["obj"]): r["pmi"] for r in comention_pmi(t2).collect()}
    assert r2[("a", "b")] > r2[("a", "d")]


def test_related_topk_symmetric_and_bounded(spark):
    # b is a's strongest partner and vice versa (symmetrized pairs);
    # k bounds every node's list; ties break on the partner id
    t = _triples(
        spark,
        [
            ("a", "MENTIONED_WITH", "b", 8),
            ("a", "MENTIONED_WITH", "c", 1),
            ("a", "MENTIONED_WITH", "d", 1),
            ("c", "MENTIONED_WITH", "d", 1),
        ],
    )
    rows = related_topk(t, k=2).collect()
    by_node = {}
    for r in rows:
        by_node.setdefault(r["node"], []).append(r)
    assert all(len(v) <= 2 for v in by_node.values())
    assert all(r["rnk"] <= 2 for r in rows)
    a_top = sorted(by_node["a"], key=lambda r: r["rnk"])
    assert a_top[0]["related"] == "b"  # exclusive heavy pair wins
    assert sorted(by_node["b"], key=lambda r: r["rnk"])[0]["related"] == "a"
    # c's partners a and d have equal pmi → tie breaks on the id
    c_top = sorted(by_node["c"], key=lambda r: r["rnk"])
    if abs(c_top[0]["pmi"] - c_top[1]["pmi"]) < 1e-15:
        assert [r["related"] for r in c_top] == sorted(
            r["related"] for r in c_top
        )


def test_triangles_complete_graph(spark):
    # K4: every node sits in C(3,2) = 3 triangles, coefficient exactly 1
    nodes = ["a", "b", "c", "d"]
    t = _triples(
        spark,
        [(x, "P", y, 1) for x in nodes for y in nodes if x < y],
    )
    rows = {r["node"]: r for r in triangles(t).collect()}
    assert set(rows) == set(nodes)
    for r in rows.values():
        assert r["degree"] == 3 and r["triangles"] == 3
        assert r["clustering_coeff"] == pytest.approx(1.0, abs=1e-15)


def test_triangles_chain_and_junk_edges(spark):
    # a-b-c chain has no triangle; self-loops and parallel predicate
    # edges must not fabricate one
    t = _triples(
        spark,
        [
            ("a", "P", "b", 1),
            ("b", "Q", "a", 9),   # parallel reverse edge, collapses
            ("b", "P", "c", 1),
            ("c", "P", "c", 1),   # self-loop, dropped
        ],
    )
    rows = {r["node"]: r for r in triangles(t).collect()}
    assert all(r["triangles"] == 0 for r in rows.values())
    assert all(r["clustering_coeff"] == 0.0 for r in rows.values())
    assert rows["b"]["degree"] == 2 and rows["a"]["degree"] == 1
    # close the cycle → exactly one triangle, every corner counted once
    t2 = _triples(
        spark,
        [("a", "P", "b", 1), ("b", "P", "c", 1), ("c", "P", "a", 1),
         ("c", "P", "d", 1)],
    )
    r2 = {r["node"]: r for r in triangles(t2).collect()}
    assert [r2[n]["triangles"] for n in "abcd"] == [1, 1, 1, 0]
    assert r2["c"]["degree"] == 3
    assert r2["c"]["clustering_coeff"] == pytest.approx(1 / 3, abs=1e-15)


def test_pagerank_parallel_edges_collapse(spark):
    # two predicates between the same pair count as one edge
    t1 = _triples(spark, [("a", "P", "b", 1), ("a", "Q", "b", 9)])
    t2 = _triples(spark, [("a", "P", "b", 1)])
    r1 = _rank_map(pagerank(t1, iterations=2, checkpoint=False))
    r2 = _rank_map(pagerank(t2, iterations=2, checkpoint=False))
    assert r1.keys() == r2.keys()
    for k in r1:
        assert math.isclose(r1[k], r2[k], rel_tol=0, abs_tol=1e-15)


def test_label_propagation_converges_to_min_label_in_a_clique(spark):
    # triangle {a,b,c}: round 1 is all 1-1 ties (min label wins), by
    # round 3 every node carries 'a' — the hand-traced synchronous
    # schedule (r1: a→'b', b→'a', c→'a'; r2: all 'a'; r3 stable)
    t = _triples(
        spark,
        [("a", "P", "b", 1), ("b", "P", "c", 1), ("c", "P", "a", 1)],
    )
    rows = {r["node"]: r for r in label_propagation(t, iterations=3).collect()}
    assert {r["community"] for r in rows.values()} == {"a"}
    assert all(r["community_size"] == 3 for r in rows.values())


def test_label_propagation_separates_components_and_keeps_isolates(spark):
    # two disjoint triangles end in two communities; a self-loop-only
    # node is a vertex with no neighbors and keeps its own label
    t = _triples(
        spark,
        [("a", "P", "b", 1), ("b", "P", "c", 1), ("c", "P", "a", 1),
         ("x", "P", "y", 1), ("y", "P", "z", 1), ("z", "P", "x", 1),
         ("s", "P", "s", 1)],
    )
    rows = {r["node"]: r for r in label_propagation(t, iterations=3).collect()}
    assert rows["a"]["community"] == rows["b"]["community"] == "a"
    assert rows["x"]["community"] == rows["y"]["community"] == "x"
    assert rows["s"]["community"] == "s"
    assert rows["s"]["community_size"] == 1
    assert rows["a"]["community_size"] == rows["z"]["community_size"] == 3


def test_hits_hand_computed_star(spark):
    # a→c, b→c: the fixpoint (reached after one iteration) is
    # authority = (0, 0, 1) and hub = (1/2, 1/2, 0) under L1
    t = _triples(spark, [("a", "P", "c", 1), ("b", "Q", "c", 1)])
    for iters in (1, 3):
        got = {r["node"]: (r["hub"], r["authority"])
               for r in hits(t, iterations=iters).collect()}
        assert got.keys() == {"a", "b", "c"}
        for node, (h, a) in {"a": (0.5, 0.0), "b": (0.5, 0.0),
                             "c": (0.0, 1.0)}.items():
            assert math.isclose(got[node][0], h, abs_tol=1e-12)
            assert math.isclose(got[node][1], a, abs_tol=1e-12)


def test_hits_l1_mass_and_parallel_edges_collapse(spark):
    # parallel predicates collapse to one edge (like pagerank); both
    # score vectors stay L1-normalized on an arbitrary digraph
    t = _triples(
        spark,
        [("a", "P", "b", 1), ("a", "Q", "b", 1), ("b", "P", "c", 1),
         ("c", "P", "a", 1), ("d", "P", "a", 1)],
    )
    rows = hits(t, iterations=4).collect()
    assert math.isclose(sum(r["hub"] for r in rows), 1.0, abs_tol=1e-9)
    assert math.isclose(sum(r["authority"] for r in rows), 1.0,
                        abs_tol=1e-9)
    t2 = _triples(spark, [("a", "P", "b", 1), ("b", "P", "c", 1),
                          ("c", "P", "a", 1), ("d", "P", "a", 1)])
    a = sorted(map(tuple, hits(t, iterations=4).collect()))
    b = sorted(map(tuple, hits(t2, iterations=4).collect()))
    assert a == b


def test_link_prediction_hand_computed_path(spark):
    # path a—z—b: (a, b) share the single neighbor z (deg 2) →
    # common=1, jaccard = 1/(1+1−1) = 1, adamic_adar = 1/ln 2; the
    # existing edges never appear as predictions
    t = _triples(spark, [("a", "M", "z", 1), ("z", "M", "b", 1)])
    rows = link_prediction(t, k=10).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["node_a"], r["node_b"], r["common_neighbors"]) == ("a", "b", 1)
    assert math.isclose(r["jaccard"], 1.0, abs_tol=0)
    assert math.isclose(r["adamic_adar"], 1.0 / math.log(2.0),
                        abs_tol=1e-12)


def test_link_prediction_ranking_and_hub_cap(spark):
    # clique-ish: x and y share TWO neighbors (higher jaccard) vs a
    # pair sharing one; max_degree excludes the hub intermediate
    t = _triples(
        spark,
        [("x", "M", "h1", 1), ("y", "M", "h1", 1),
         ("x", "M", "h2", 1), ("y", "M", "h2", 1),
         ("p", "M", "h1", 1)],
    )
    rows = link_prediction(t, k=10).collect()
    top = rows[0]
    assert (top["node_a"], top["node_b"]) == ("x", "y")
    assert top["common_neighbors"] == 2
    # h1 has degree 3 — capping at 2 removes it as an INTERMEDIATE
    # (the (x,y) pair keeps only its h2 wedge, the p-pairs vanish),
    # while pairs routed through the low-degree x/y survive
    capped = {(r["node_a"], r["node_b"]): r["common_neighbors"]
              for r in link_prediction(t, k=10, max_degree=2).collect()}
    assert capped == {("x", "y"): 1, ("h1", "h2"): 2}
    with pytest.raises(ValueError, match="k must be positive"):
        link_prediction(t, k=0)


def test_bfs_distances_multi_source_min(spark):
    # chain repo:r—e1—e2—e3—e4 plus a second seed repo:q—e4: e3 is
    # reached at hop 2 through the NEARER seed, e4 at hop 1; the
    # disconnected node never appears
    t = _triples(
        spark,
        [("repo:r", "D", "e1", 1), ("e1", "M", "e2", 1),
         ("e2", "M", "e3", 1), ("e3", "M", "e4", 1),
         ("repo:q", "D", "e4", 1), ("lone", "M", "lone2", 1)],
    )
    d = {r["node"]: r["dist"] for r in bfs_distances(t, max_hops=3).collect()}
    assert d == {"repo:r": 0, "repo:q": 0, "e1": 1, "e4": 1,
                 "e2": 2, "e3": 2}


def test_bfs_distances_hop_bound_cuts_the_tail(spark):
    t = _triples(
        spark,
        [("repo:r", "D", "e1", 1), ("e1", "M", "e2", 1),
         ("e2", "M", "e3", 1)],
    )
    d = {r["node"]: r["dist"] for r in bfs_distances(t, max_hops=2).collect()}
    assert d == {"repo:r": 0, "e1": 1, "e2": 2}  # e3 is 3 hops out

#!/usr/bin/env python3
"""Scale microbench for the KG analytics ops (BENCH/KG_ANALYTICS.md).

The contract keys exercise these operators on the fixture gold graph
(~100 nodes) — correctness, not scale.  This bench runs the SAME code
on a deterministic synthetic graph three orders of magnitude larger,
with a deliberately skewed degree distribution (one hub receives a
configurable share of all edges — the "mega-repo entity" shape that
breaks naive groupBy/join plans), and reports wall time per operator
plus the invariants that prove the run did real work:

- degree conservation (sum out == sum in == |E|)
- component count + giant-component size from the salted CC loop
- PageRank mass conservation and the hub's rank share
- PMI row count == |MENTIONED_WITH pairs|

Graph: |V| = nodes, |E| = edges.  src/dst are xxhash64-derived from
the row id (deterministic, no RNG state), hub_frac of all dsts are
rewired to node 0.  Every edge carries pred='MENTIONED_WITH' and an
evidence count in [1, 16] so the PMI path has non-trivial mass.

Usage:  python tools/kg_analytics_bench.py [--nodes N] [--edges N]
            [--hub-frac F] [--cpus N]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=500_000)
    ap.add_argument("--edges", type=int, default=2_000_000)
    ap.add_argument("--hub-frac", type=float, default=0.10,
                    help="share of all edges rewired to point at node 0")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--pagerank-iterations", type=int, default=3)
    ap.add_argument("--write-report", action="store_true",
                    help="rewrite BENCH/KG_ANALYTICS.md")
    args = ap.parse_args()

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
    from ner_spark.session import get_spark

    spark = get_spark("kg-analytics-bench", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus * 4)

    n, e = args.nodes, args.edges
    ids = spark.range(e)
    triples = ids.select(
        F.concat(F.lit("ent:"),
                 F.pmod(F.xxhash64(F.col("id") * 2 + 1), F.lit(n))
                 .cast("string")).alias("subj"),
        F.lit("MENTIONED_WITH").alias("pred"),
        F.when(
            F.pmod(F.xxhash64(F.col("id") * 2 + 7), F.lit(1000))
            < int(args.hub_frac * 1000),
            F.lit("ent:0"),
        ).otherwise(
            F.concat(F.lit("ent:"),
                     F.pmod(F.xxhash64(F.col("id") * 2 + 3), F.lit(n))
                     .cast("string"))
        ).alias("obj"),
        (F.pmod(F.xxhash64(F.col("id") * 2 + 5), F.lit(16)) + 1)
        .alias("evidence_count"),
    ).localCheckpoint(eager=True)
    n_edges = triples.count()

    results: dict[str, dict] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        sec = round(time.perf_counter() - t0, 2)
        results[name] = {"sec": sec, **out}
        print(f"{name}: {sec}s {out}", flush=True)

    def run_degree():
        deg = entity_degree(triples)
        tot = deg.agg(F.sum("out_degree").alias("o"),
                      F.sum("in_degree").alias("i"),
                      F.count(F.lit(1)).alias("nodes"),
                      F.max("in_degree").alias("hub_in")).first()
        assert tot["o"] == tot["i"] == n_edges, "degree conservation"
        return {"nodes": tot["nodes"], "hub_in_degree": tot["hub_in"]}

    def run_components():
        comp = graph_components(triples)
        agg = comp.agg(
            F.countDistinct("component").alias("n_comp"),
            F.max("component_size").alias("giant"),
            F.count(F.lit(1)).alias("nodes")).first()
        return {"components": agg["n_comp"], "giant": agg["giant"],
                "nodes": agg["nodes"]}

    def run_pagerank():
        pr = pagerank(triples, iterations=args.pagerank_iterations)
        agg = pr.agg(F.sum("rank").alias("mass"),
                     F.max("rank").alias("max_rank")).first()
        hub = pr.where(F.col("node") == "ent:0").first()["rank"]
        assert abs(agg["mass"] - 1.0) < 1e-6, "rank mass conservation"
        assert hub == agg["max_rank"], "hub holds the top rank"
        return {"hub_rank_pct": round(hub * 100, 2),
                "iterations": args.pagerank_iterations}

    def run_pmi():
        out = comention_pmi(triples)
        cnt = out.count()
        assert cnt == n_edges, "one PMI row per pair row"
        return {"rows": cnt}

    def run_related():
        out = related_topk(triples, k=3)
        agg = out.agg(F.count(F.lit(1)).alias("rows"),
                      F.max("rnk").alias("max_rnk")).first()
        assert agg["max_rnk"] <= 3
        return {"rows": agg["rows"]}

    def run_triangles():
        out = triangles(triples)
        agg = out.agg(F.sum("triangles").alias("corners"),
                      F.max("clustering_coeff").alias("max_cc")).first()
        assert agg["corners"] % 3 == 0, "every triangle has 3 corners"
        assert 0.0 <= agg["max_cc"] <= 1.0
        return {"total_triangles": agg["corners"] // 3}

    def run_communities():
        out = label_propagation(triples, iterations=3)
        agg = out.agg(F.count(F.lit(1)).alias("rows"),
                      F.countDistinct("community").alias("n_comm")).first()
        cover = (out.select("community", "community_size").distinct()
                 .agg(F.sum("community_size")).first()[0])
        assert cover == agg["rows"], "community sizes partition the nodes"
        return {"nodes": agg["rows"], "communities": agg["n_comm"]}

    def run_distances():
        # seed at the hub ("ent:0" is a full id — pmod emits no leading
        # zeros, so the prefix matches exactly one node): the frontier
        # covers most of the giant component by hop 2, the worst case
        # for the anti-join against the reached set
        out = bfs_distances(triples, max_hops=3, seed_prefix="ent:0")
        agg = out.agg(F.count(F.lit(1)).alias("reached"),
                      F.max("dist").alias("max_d"),
                      F.sum(F.when(F.col("dist") == 0, 1).otherwise(0))
                      .alias("seeds")).first()
        assert agg["seeds"] == 1 and agg["max_d"] <= 3
        return {"reached": agg["reached"], "max_dist": agg["max_d"]}

    def run_path_closure():
        # SPARQL property-path closure at scale: the UNBOUNDED closure
        # of a near-single-component 500k-node graph is O(V²) pairs —
        # never materialize it.  The two shapes that survive 100 TB are
        # benched instead: seeded BFS from one node (constant endpoint)
        # and the hop-bounded whole-graph closure.
        from ner_spark.plans.kg_query import path_closure

        seeded = path_closure(triples, "MENTIONED_WITH",
                              src="ent:0", max_hops=3)
        hub_reach = seeded.count()
        d1 = (triples.where(F.col("subj") == "ent:0")
              .select("obj").distinct().count())
        assert hub_reach >= d1, "closure contains the 1-hop neighbors"
        assert seeded.where(F.col("subj") != "ent:0").isEmpty(), \
            "seeded closure only binds the constant source"
        bounded = path_closure(triples, "MENTIONED_WITH", max_hops=2)
        pairs_2hop = bounded.count()
        assert pairs_2hop >= n_edges * 0.5, "2-hop ⊇ distinct 1-hop pairs"
        return {"hub_reach_3hop": hub_reach, "pairs_2hop": pairs_2hop}

    def run_hits():
        out = hits(triples, iterations=3)
        agg = out.agg(F.sum("hub").alias("hm"),
                      F.sum("authority").alias("am"),
                      F.max("authority").alias("max_a")).first()
        hub_a = out.where(F.col("node") == "ent:0").first()["authority"]
        assert abs(agg["hm"] - 1.0) < 1e-6, "hub mass conservation"
        assert abs(agg["am"] - 1.0) < 1e-6, "authority mass conservation"
        assert hub_a == agg["max_a"], "the hub holds the top authority"
        return {"hub_authority_pct": round(hub_a * 100, 2)}

    def run_link_prediction():
        # the wedge through an intermediate is quadratic in its degree
        # — uncapped, the ~200k-degree hub alone is ~4e10 candidate
        # pairs.  The DEFAULT call is therefore capped
        # (LINKPRED_DEFAULT_MAX_DEGREE = 1000): this run proves the
        # default survives the hub graph (the hub is excluded from
        # wedge mediation; Σ min(deg,1000)² stays ~Σ deg² of the
        # uniform remainder, linear-ish in |E|)
        from ner_spark.plans.kg_analytics import (
            LINKPRED_DEFAULT_MAX_DEGREE,
        )

        out = link_prediction(triples, k=10)
        rows = out.collect()
        assert len(rows) <= 10
        assert all(0.0 <= r["jaccard"] <= 1.0 for r in rows)
        assert all(r["node_a"] < r["node_b"] for r in rows)
        return {"rows": len(rows),
                "top_jaccard": round(rows[0]["jaccard"], 4)
                if rows else None,
                "max_degree_cap": LINKPRED_DEFAULT_MAX_DEGREE}

    def run_link_prediction_tight():
        # a tighter production cap for comparison — at 100 TB you tune
        # this down; 64 bounds the enumeration at Σ deg² ≈ 64·Σdeg
        out = link_prediction(triples, k=10, max_degree=64)
        rows = out.collect()
        assert len(rows) <= 10
        return {"rows": len(rows), "max_degree_cap": 64}

    timed("entity_degree", run_degree)
    timed("hits", run_hits)
    timed("link_prediction", run_link_prediction)
    timed("link_prediction_cap64", run_link_prediction_tight)
    timed("path_closure", run_path_closure)
    timed("triangles", run_triangles)
    timed("components", run_components)
    timed("pagerank", run_pagerank)
    timed("comention_pmi", run_pmi)
    timed("related_topk", run_related)
    timed("communities", run_communities)
    timed("hub_distances", run_distances)

    summary = {
        "nodes": n, "edges": n_edges, "hub_frac": args.hub_frac,
        "cpus": args.cpus, "results": results,
    }
    print(json.dumps(summary))

    if args.write_report:
        lines = [
            "# BENCH — KG analytics at scale", "",
            "`python tools/kg_analytics_bench.py --write-report` — the",
            "contract-key graph is ~100 nodes (correctness); this runs the",
            "SAME operators on a deterministic synthetic graph with a hot",
            f"hub ({int(args.hub_frac * 100)}% of all edges point at one "
            "node — the mega-repo-entity skew shape).", "",
            f"|V| = {n:,}, |E| = {n_edges:,}, local[{args.cpus}], "
            f"shuffle_partitions={args.cpus * 4}.", "",
            "| operator | wall sec | evidence |",
            "|---|---|---|",
        ]
        for k, v in results.items():
            ev = ", ".join(f"{a}={b}" for a, b in v.items() if a != "sec")
            lines.append(f"| {k} | {v['sec']} | {ev} |")
        lines += [
            "",
            "Invariants asserted in-run: degree conservation "
            "(Σout = Σin = |E|), PageRank mass = 1 ± 1e-6 with the hub "
            "holding the top rank, one PMI row per pair row, "
            "related_topk rank bound, label-propagation community sizes "
            "partitioning the node set, BFS hop bound from the hub seed.  "
            "The hub's in-edges "
            "partial-aggregate map-side before the shuffle (degree, "
            "pagerank contribution sum, PMI marginals), and the CC loop "
            "salts the frontier join — no operator has a single-task "
            "hot key.  path_closure benches the two property-path "
            "shapes that survive scale — seeded BFS from a constant "
            "endpoint and the hop-bounded whole-graph closure — because "
            "the unbounded closure of a near-single-component graph is "
            "O(V²) pairs by definition, a query-shape error no engine "
            "outruns (bound the hops or seed an endpoint).  HITS "
            "conserves L1 mass on both score vectors with the hub "
            "holding the top authority; link_prediction runs with its "
            "DEFAULT cap (LINKPRED_DEFAULT_MAX_DEGREE = 1000) — the "
            "wedge through an intermediate is quadratic in its degree, "
            "so the cap defaults ON and uncapped is the explicit "
            "opt-in (max_degree=None); the cap64 row shows the "
            "tighter production setting.",
        ]
        path = Path(__file__).resolve().parents[1] / "BENCH" / "KG_ANALYTICS.md"
        path.write_text("\n".join(lines) + "\n", encoding="utf-8")
        print(f"wrote {path}")

    spark.stop()


if __name__ == "__main__":
    main()

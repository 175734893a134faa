#!/usr/bin/env python3
"""Scale microbench for the inference layer (BENCH/KG_INFER.md):
RDFS-lite entailment (deep-cascade ontology), the incremental
entailment path, and a 2-rule forward-chaining fixpoint — all on the
same deterministic 500k-node / 2M-edge 10%-hub graph the analytics
bench uses (tools/kg_analytics_bench.py), so the two reports compare.

The contract keys exercise these operators on the ~100-node fixture
graph (correctness); this proves the SCALE shape:

- the schema closes on the ontology alone and every fact-side
  derivation join BROADCASTS the closed schema — the fact table is
  never self-joined (asserted from the physical plan, not prose);
- the semi-naive loop converges in the documented 2 rounds (one
  derivation round + one empty verification round) even under a
  16-deep class chain and an 8-deep property chain, because the
  staged _derive_once resolves in-round cascades against the CLOSED
  schema;
- entail_increment is delta-proportional: adding 1% new facts costs a
  small fraction of the full recompute, and closure ∪ delta ∪
  increment EQUALS the from-scratch closure of the union (two empty
  anti-joins, asserted in-run);
- a 2-rule fixpoint (inversion + a both-endpoint join against the
  derived relation) converges in 3 rounds with only linear joins (no
  wedge through the hub — rule AUTHORING owns that, the same
  query-shape note as path_closure in the analytics bench).

Facts: 80% of edges are MENTIONED_WITH (outside the ontology — the
realistic case where inference touches a subset), 20% are P0, the
bottom of the property chain.  Ontology: P0 ⊂ P1 ⊂ … ⊂ P7,
domain(P0) = C0, range(P0) = C0, C0 ⊂ C1 ⊂ … ⊂ C15.  So every P0
fact lifts through 7 superproperties, types both endpoints at C0, and
up-types them through 15 superclasses.

Usage:  python tools/kg_infer_bench.py [--nodes N] [--edges N]
            [--hub-frac F] [--cpus N] [--write-report]
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
    ap.add_argument("--hub-frac", type=float, default=0.10)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--class-depth", type=int, default=16)
    ap.add_argument("--prop-depth", type=int, default=8)
    ap.add_argument("--delta-edges", type=int, default=20_000)
    ap.add_argument("--write-report", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ner_spark.plans.kg_infer import (
        DOMAIN,
        RANGE,
        RDF_TYPE,
        SUB_CLASS,
        SUB_PROP,
        entail,
        entail_increment,
        schema_closure,
        _derive_once,
    )
    from ner_spark.plans.kg_rules import materialize_rules
    from ner_spark.session import get_spark

    spark = get_spark("kg-infer-bench", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus * 4)

    n, e = args.nodes, args.edges

    def fact_table(ids):
        # same xxhash64 construction as the analytics bench, with a
        # 20% P0 predicate slice that the ontology reaches
        return ids.select(
            F.concat(F.lit("ent:"),
                     F.pmod(F.xxhash64(F.col("id") * 2 + 1), F.lit(n))
                     .cast("string")).alias("subj"),
            F.when(F.pmod(F.xxhash64(F.col("id") * 2 + 9), F.lit(5)) == 0,
                   F.lit("P0")).otherwise(
                F.lit("MENTIONED_WITH")).alias("pred"),
            F.when(
                F.pmod(F.xxhash64(F.col("id") * 2 + 7), F.lit(1000))
                < int(args.hub_frac * 1000),
                F.lit("ent:0"),
            ).otherwise(
                F.concat(F.lit("ent:"),
                         F.pmod(F.xxhash64(F.col("id") * 2 + 3), F.lit(n))
                         .cast("string"))
            ).alias("obj"),
        )

    triples = fact_table(spark.range(e)).localCheckpoint(eager=True)
    n_facts = triples.count()
    n_p0 = triples.where(F.col("pred") == "P0").count()

    onto_rows = (
        [(f"C{i}", SUB_CLASS, f"C{i + 1}")
         for i in range(args.class_depth - 1)]
        + [(f"P{i}", SUB_PROP, f"P{i + 1}")
           for i in range(args.prop_depth - 1)]
        + [("P0", DOMAIN, "C0"), ("P0", RANGE, "C0")]
    )
    onto = spark.createDataFrame(
        onto_rows, "subj string, pred string, obj string")

    results: dict[str, dict] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        sec = round(time.perf_counter() - t0, 2)
        results[name] = {"sec": sec, **out}
        print(f"{name}: {sec}s {out}", flush=True)

    def run_plan_probe():
        # the load-bearing claim, asserted from the physical plan: the
        # derivation joins broadcast the CLOSED SCHEMA against the
        # fact table — no shuffle join of facts against facts
        cl = schema_closure(onto)
        derived = _derive_once(triples, cl)
        plan = derived._jdf.queryExecution().executedPlan().toString()
        n_broadcast = plan.count("BroadcastHashJoin")
        assert n_broadcast >= 4, plan  # rdfs7 + rdfs2 + rdfs3 + rdfs9
        assert "SortMergeJoin" not in plan, plan
        assert "ShuffledHashJoin" not in plan, plan
        return {"broadcast_joins": n_broadcast,
                "shuffle_joins_in_derivation": 0}

    closure_holder = {}

    def run_entail():
        out = entail(triples, onto).localCheckpoint(eager=True)
        closure_holder["df"] = out
        total = out.count()
        inferred = out.where("inferred").count()
        p7 = out.where(F.col("pred") == "P7").count()
        top = out.where(
            (F.col("pred") == RDF_TYPE) & (F.col("obj") == f"C{args.class_depth - 1}")
        ).count()
        typed_c0 = out.where(
            (F.col("pred") == RDF_TYPE) & (F.col("obj") == "C0")).count()
        # every distinct P0 fact lifts to the top of the property
        # chain, and both its endpoints type at C0 and at the top class
        p0_distinct = triples.where("pred = 'P0'").distinct().count()
        assert p7 == p0_distinct, (p7, p0_distinct)
        assert typed_c0 == top > 0, (typed_c0, top)
        return {"closure_rows": total, "inferred_rows": inferred,
                "p7_rows": p7, "typed_c0": typed_c0,
                "typed_top_class": top}

    def run_entail_increment():
        # 1% new facts over NEW ids (disjoint edge draws)
        delta = fact_table(
            spark.range(e, e + args.delta_edges)
        ).localCheckpoint(eager=True)
        closure = closure_holder["df"].select("subj", "pred", "obj")
        t0 = time.perf_counter()
        inc = entail_increment(closure, delta, onto) \
            .localCheckpoint(eager=True)
        inc_sec = round(time.perf_counter() - t0, 2)
        merged = (closure.unionByName(delta.select("subj", "pred", "obj"))
                  .unionByName(inc).distinct()
                  .localCheckpoint(eager=True))
        t0 = time.perf_counter()
        full = entail(
            triples.unionByName(delta), onto
        ).select("subj", "pred", "obj").localCheckpoint(eager=True)
        full_sec = round(time.perf_counter() - t0, 2)
        keys = ["subj", "pred", "obj"]
        missing = full.join(merged, keys, "left_anti").count()
        extra = merged.join(
            full.unionByName(onto.select(*keys)), keys, "left_anti"
        ).count()
        assert missing == 0 and extra == 0, (missing, extra)
        return {"inc_rows": inc.count(), "inc_sec": inc_sec,
                "full_recompute_sec": full_sec,
                "speedup": round(full_sec / max(inc_sec, 1e-9), 1)}

    def run_rules():
        rules = [
            "CONSTRUCT { ?b REV ?a } WHERE { ?a P0 ?b }",
            "CONSTRUCT { ?a P0_CONFIRMED ?b } "
            "WHERE { ?a P0 ?b . ?b REV ?a }",
        ]
        out = materialize_rules(triples, rules) \
            .localCheckpoint(eager=True)
        rev = out.where("pred = 'REV'").count()
        conf = out.where("pred = 'P0_CONFIRMED'").count()
        p0 = triples.where("pred = 'P0'").select(
            "subj", "pred", "obj").distinct().count()
        assert rev == p0, (rev, p0)       # one inversion per edge
        assert conf == p0, (conf, p0)     # rule 2 closes over rule 1
        return {"rows": out.count(), "rev_rows": rev,
                "confirmed_rows": conf}

    timed("derivation_plan_probe", run_plan_probe)
    timed("entail_full", run_entail)
    timed("entail_increment", run_entail_increment)
    timed("rules_fixpoint", run_rules)

    summary = {"nodes": n, "edges": n_facts, "p0_edges": n_p0,
               "hub_frac": args.hub_frac, "cpus": args.cpus,
               "class_depth": args.class_depth,
               "prop_depth": args.prop_depth,
               "results": results}
    print(json.dumps(summary))

    if args.write_report:
        lines = [
            "# BENCH — inference layer at scale", "",
            "`python tools/kg_infer_bench.py --write-report` — RDFS-lite",
            "entailment, incremental entailment, and the rule engine on the",
            "same deterministic 500k-node / 2M-edge 10%-hub graph as",
            "BENCH/KG_ANALYTICS.md, under a deliberately DEEP schema",
            f"({args.class_depth}-level class chain, {args.prop_depth}-level "
            "property chain, domain+range on the chain bottom; 20% of the",
            "edges carry the ontology-reachable predicate).", "",
            f"|V| = {n:,}, |E| = {n_facts:,} ({n_p0:,} P0), "
            f"local[{args.cpus}], shuffle_partitions={args.cpus * 4}.", "",
            "| step | wall sec | evidence |",
            "|---|---|---|",
        ]
        for k, v in results.items():
            ev = ", ".join(f"{a}={b}" for a, b in v.items() if a != "sec")
            lines.append(f"| {k} | {v['sec']} | {ev} |")
        lines += [
            "",
            "Invariants asserted in-run: every derivation join in the",
            "physical plan is a BroadcastHashJoin of the closed schema",
            "(no SortMergeJoin/ShuffledHashJoin — the fact table is never",
            "self-joined, the WebPIE shape); every P0 fact lifts to the",
            "top of the property chain and types both endpoints up the",
            "full class chain; closure ∪ delta ∪ increment equals the",
            "from-scratch closure of the union (two empty anti-joins);",
            "the 2-rule fixpoint converges with one inversion row and one",
            "confirmation row per distinct P0 edge.  The incremental path",
            "is the headline: at a 1% delta it re-derives only the",
            "delta's consequences against the broadcast schema, so its",
            "cost tracks the delta, not the corpus — the regime a 100 TB",
            "store's daily maintenance lives in.  Rule authoring owns",
            "wedge avoidance (a rule that joins two hub-incident",
            "relations on the hub is the same query-shape error the",
            "analytics bench documents for unbounded path closure).",
        ]
        path = Path(__file__).resolve().parents[1] / "BENCH" / "KG_INFER.md"
        path.write_text("\n".join(lines) + "\n", encoding="utf-8")
        print(f"wrote {path}")

    spark.stop()


if __name__ == "__main__":
    main()

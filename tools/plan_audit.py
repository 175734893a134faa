#!/usr/bin/env python3
"""Physical-plan audit: capture ``explain("formatted")`` for the
contract queries and assert the scale-critical plan properties hold.

Checks encoded here (the ones a 100 TB run lives or dies by):
- top-k paths (similarity_topk, ann_lsh, dedup_ngram_jaccard,
  embedding_near_dup) compile to ``TakeOrderedAndProject`` — NO
  unpartitioned global Sort or single-partition WindowExec;
- parquet scans carry column pruning (ReadSchema) and, where a filter
  exists, PushedFilters;
- relational queries keep WholeStageCodegen spans;
- small-dimension joins broadcast (top_customers).

Writes BENCH/PLANS.md with the verdict table + the captured plans.
Exit 0 iff every assertion holds.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    from ner_spark.session import get_spark

    spark = get_spark("ner-spark-plan-audit", master="local[4]",
                      shuffle_partitions=8)
    import __spark_entry__ as em

    q = em.queries()
    checks: list[tuple[str, str, bool, str]] = []  # (query, check, ok, note)
    plans: dict[str, str] = {}

    def check(name: str, label: str, ok: bool, note: str = "") -> None:
        checks.append((name, label, ok, note))

    topk_queries = ("similarity_topk", "ann_lsh", "ann_ivf",
                    "dedup_ngram_jaccard", "embedding_near_dup",
                    "embedding_near_dup_ivf", "media_near_dup")
    for name in topk_queries:
        p = plans[name] = plan_of(q[name](spark, SF_DIR))
        check(name, "TakeOrderedAndProject (distributed heap top-k)",
              "TakeOrderedAndProject" in p)
        # a Sort that is not inside TakeOrderedAndProject and feeds a
        # single partition would show as Sort + Exchange SinglePartition
        check(name, "no SinglePartition exchange",
              "SinglePartition" not in p)

    # IVF cell balance (data check, not plan shape): the TRAINED
    # centroid path must keep cell populations even — cells are the
    # table's partition key at scale, so max/mean IS the partition-skew
    # factor of every probe and of the per-cell-quadratic near-dup join.
    # The seeded twin's balance is reported beside it for contrast.
    from ner_spark.operators.similarity import (
        ann_ivf_topk,
        ivf_cell_stats,
        ivf_centroids,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    trained = train_ivf_centroids(emb)
    st_t = ivf_cell_stats(emb, trained)
    st_s = ivf_cell_stats(emb, ivf_centroids(64, 16, 7))
    check("ann_ivf", "trained IVF cells balanced (max/mean ≤ 1.5, ≤ seeded)",
          st_t["balance"] <= 1.5 and st_t["balance"] <= st_s["balance"],
          f"trained {st_t} vs seeded {st_s}")
    qvec = [float(x) for x in
            emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]]
    p = plans["ann_ivf_trained"] = plan_of(
        ann_ivf_topk(emb, qvec, centroids=trained))
    check("ann_ivf_trained", "TakeOrderedAndProject (distributed heap top-k)",
          "TakeOrderedAndProject" in p)
    (REPO / "BENCH" / "IVF.md").write_text(
        "# IVF centroids — trained vs seeded (measured)\n\n"
        f"`tools/plan_audit.py` at {SF_DIR}: cell-population stats of the\n"
        "embeddings table under the trained (sampled spherical k-means,\n"
        "`train_ivf_centroids`) and seeded-random centroid matrices.\n"
        "`balance` = max/mean over populated cells — the partition-skew\n"
        "factor of an IVF-partitioned table at scale.\n\n"
        "| centroids | populated cells | max | mean | balance |\n"
        "|---|---|---|---|---|\n"
        f"| trained | {st_t['cells']}/{st_t['total_cells']} | {st_t['max']} "
        f"| {st_t['mean']} | **{st_t['balance']}** |\n"
        f"| seeded | {st_s['cells']}/{st_s['total_cells']} | {st_s['max']} "
        f"| {st_s['mean']} | {st_s['balance']} |\n\n"
        "Recall parity is pinned in `tests/test_ivf_training.py` (trained\n"
        "recall@10 beats seeded at the same nprobe; both paths share the\n"
        "TakeOrderedAndProject top-k plan).  The seeded matrix remains the\n"
        "DuckDB-oracle twin — static SQL needs input-independent centroid\n"
        "literals; production trains once at write time and persists the\n"
        "artifact (`save_centroids`/`load_centroids`).\n",
        encoding="utf-8",
    )

    # note: with AQE on, codegen ids only appear in the final executed
    # plan, so the audit checks the properties visible pre-execution:
    # map-side combine for aggregations, shuffle-freeness for pure
    # projections, column pruning everywhere.
    for name in ("dedup_exact", "token_counts", "doc_fingerprint"):
        p = plans[name] = plan_of(q[name](spark, SF_DIR))
        check(name, "columns pruned at scan (ReadSchema)",
              "ReadSchema" in p)
        check(name, "map-side partial aggregation (combine before shuffle)",
              "partial_" in p)
    for name in ("text_quality", "lang_id", "simhash_buckets"):
        p = plans[name] = plan_of(q[name](spark, SF_DIR))
        check(name, "columns pruned at scan (ReadSchema)",
              "ReadSchema" in p)
        check(name, "projection is shuffle-free (no hash exchange)",
              "hashpartitioning" not in p)

    p = plans["tpch_pricing"] = plan_of(q["tpch_pricing"](spark, SF_DIR))
    check("tpch_pricing", "filter pushed to scan (PushedFilters non-empty)",
          "PushedFilters: [IsNotNull(l_shipdate)" in p
          or "LessThanOrEqual(l_shipdate" in p)

    def rank_window_partitioned(p: str) -> bool:
        """The row_number Window node must keep a partition spec.

        Spark 4's EliminateWindowPartitions folds a constant-foldable
        partition key away entirely — the formatted plan then shows
        only 2 bracket groups ([funcs], [order]) on the Window
        Arguments line instead of 3 ([funcs], [partition], [order]),
        and the un-partitioned WindowExec never prints
        'SinglePartition', so the exchange check alone misses it.
        A plan with NO row_number Window node fails too — the check
        must not pass vacuously if the top-k shape is rewritten."""
        lines = [ln for ln in p.splitlines()
                 if ln.strip().startswith("Arguments: [row_number()")]
        return bool(lines) and all(ln.count("], [") >= 2 for ln in lines)

    p = plans["top_customers"] = plan_of(q["top_customers"](spark, SF_DIR))
    check("top_customers", "dimension joins broadcast",
          "BroadcastHashJoin" in p)
    check("top_customers", "TakeOrderedAndProject (distributed heap top-k)",
          "TakeOrderedAndProject" in p)
    check("top_customers", "no SinglePartition exchange",
          "SinglePartition" not in p)
    check("top_customers", "rank window keeps its partition spec",
          rank_window_partitioned(p))

    # curation layer: splits/sampling must be pure scans (no shuffle),
    # vocab stats a distributed heap top-k, the curation pass free of
    # single-partition windows
    for name in ("dataset_split", "stratified_sample"):
        p = plans[name] = plan_of(q[name](spark, SF_DIR))
        check(name, "columns pruned at scan (ReadSchema)", "ReadSchema" in p)
        check(name, "assignment is shuffle-free (no hash exchange)",
              "hashpartitioning" not in p)

    p = plans["vocab_topk"] = plan_of(q["vocab_topk"](spark, SF_DIR))
    check("vocab_topk", "TakeOrderedAndProject (distributed heap top-k)",
          "TakeOrderedAndProject" in p)
    check("vocab_topk", "map-side partial aggregation (combine before shuffle)",
          "partial_" in p)
    check("vocab_topk", "no SinglePartition exchange", "SinglePartition" not in p)
    check("vocab_topk", "rank window keeps its partition spec",
          rank_window_partitioned(p))

    p = plans["curate_corpus"] = plan_of(q["curate_corpus"](spark, SF_DIR))
    check("curate_corpus", "columns pruned at scan (ReadSchema)",
          "ReadSchema" in p)
    check("curate_corpus", "no SinglePartition exchange",
          "SinglePartition" not in p)

    p = plans["media_features"] = plan_of(q["media_features"](spark, SF_DIR))
    check("media_features", "narrow mapInPandas (no Exchange before it)",
          "Exchange hashpartitioning" not in p.split("MapInPandas")[0]
          if "MapInPandas" in p else False)

    # the real-decode twins (netpbm/wav/y4m framing) must keep the same
    # narrow shape — the container adapter is projection-only
    for media_key in ("media_features_netpbm", "media_features_wav",
                      "media_features_png",
                      "media_features_y4m", "frame_features_y4m"):
        p = plans[media_key] = plan_of(q[media_key](spark, SF_DIR))
        check(media_key, "narrow mapInPandas (no Exchange before it)",
              "Exchange hashpartitioning" not in p.split("MapInPandas")[0]
              if "MapInPandas" in p else False)

    from ner_spark.operators.multimodal import (
        docs_as_y4m, extract_frame_features,
    )

    docs_df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = plans["frame_features"] = plan_of(
        extract_frame_features(docs_as_y4m(docs_df)))
    check("frame_features", "per-frame fan-out stays narrow (no Exchange)",
          "Exchange" not in p and "MapInPandas" in p)

    mentions = q["mentions_hybrid"](spark, SF_DIR)
    p = plans["mentions_hybrid"] = plan_of(mentions)
    check("mentions_hybrid", "tag stage is a narrow map (no shuffle)",
          "Exchange hashpartitioning" not in p)

    # fuzzy canonicalization edges: LSH-blocked similarity self-join
    # over the distinct surface table — must never degrade to an
    # all-pairs cartesian/nested-loop join
    from ner_spark.operators.canonicalize import fuzzy_surface_edges

    links = spark.createDataFrame(
        [("r", "p", s, None, "LOC", 0.0) for s in
         ("sao paulo", "sao paulo!", "rio de janeiro", "brasilia")],
        "repo string, path string, surface string, kb_id string, "
        "resolved_category string, link_score double",
    )
    p = plans["fuzzy_surface_edges"] = plan_of(fuzzy_surface_edges(links))
    check("fuzzy_surface_edges", "LSH-blocked (no cartesian/nested-loop join)",
          "CartesianProduct" not in p
          and "BroadcastNestedLoopJoin" not in p)

    # incremental canonicalization: the contraction + remap joins must
    # broadcast the delta-sized side and never degrade to a cartesian;
    # the delta fuzzy pair finder must stay LSH-blocked like the full one
    from ner_spark.operators.canonicalize import (
        canonicalize,
        canonicalize_increment,
        fuzzy_surface_edges_delta,
    )

    link_schema = ("repo string, path string, surface string, kb_id string, "
                   "resolved_category string, link_score double")
    inc_base = spark.createDataFrame(
        [("r", "p0", "alpha", "K1", "ORG", 0.9),
         ("r", "p1", "beta", "K2", "ORG", 0.9)], link_schema)
    inc_delta = spark.createDataFrame(
        [("r", "p2", "mid", "K1", "ORG", 0.9),
         ("r", "p3", "mid", "K2", "ORG", 0.9)], link_schema)
    new_ents, _chg = canonicalize_increment(
        canonicalize(inc_base), inc_delta, inc_base)
    p = plans["canonicalize_increment"] = plan_of(new_ents)
    check("canonicalize_increment", "entity remap joins broadcast",
          "BroadcastHashJoin" in p)
    check("canonicalize_increment", "no cartesian/nested-loop join",
          "CartesianProduct" not in p
          and "BroadcastNestedLoopJoin" not in p)

    p = plans["fuzzy_surface_edges_delta"] = plan_of(
        fuzzy_surface_edges_delta(inc_delta, inc_base.union(inc_delta),
                                  threshold=0.5))
    check("fuzzy_surface_edges_delta",
          "LSH-blocked (no cartesian/nested-loop join)",
          "CartesianProduct" not in p
          and "BroadcastNestedLoopJoin" not in p)

    # ---- staged KgJob plans: the contract queries above run in-memory;
    # these audit the CHECKPOINTED pipeline the CLI/driver actually
    # executes — each stage's computation exactly as run() builds it,
    # plus the maintenance-path probes (update overlap guard, committed
    # triple reads).
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ner_spark.operators.canonicalize import cc_iteration
    from ner_spark.operators.link import disambiguate, link_mentions
    from ner_spark.operators.materialize import materialize_triples
    from ner_spark.operators.tag import extract_mentions
    from ner_spark.plans.job import KgJob
    from ner_spark.sources.fixtures import source_table

    def read_schemas(p: str) -> list[str]:
        return [ln.split("ReadSchema:", 1)[1].strip()
                for ln in p.splitlines() if "ReadSchema:" in ln]

    tmp = tempfile.mkdtemp(prefix="plan_audit_kg_")
    try:
        src = source_table(spark, n_rows=64)
        p = plans["stage_tokenize_tag"] = plan_of(
            disambiguate(extract_mentions(src)).drop("context_window"))
        check("stage_tokenize_tag", "tag+NED stage is a narrow map (no shuffle)",
              "Exchange hashpartitioning" not in p)

        job = KgJob(spark, tmp, run_id="audit")
        job.run(src)

        mentions = spark.read.parquet(f"{tmp}/tokenize_tag")
        p = plans["stage_link"] = plan_of(link_mentions(mentions))
        check("stage_link", "reference NEL is a pure projection (no join/shuffle)",
              "Join" not in p and "Exchange" not in p)
        from ner_spark.operators.link import link_mentions_alias

        p = plans["stage_link_alias"] = plan_of(link_mentions_alias(mentions))
        check("stage_link_alias", "alias dictionary joins broadcast",
              "BroadcastHashJoin" in p)
        check("stage_link_alias", "no cartesian/nested-loop join",
              "CartesianProduct" not in p
              and "BroadcastNestedLoopJoin" not in p)

        # one connected-components round (the canonicalize loop body),
        # in its salted form — the north rule's skew-handling join
        edges = spark.createDataFrame(
            [("s:a", "s:b"), ("s:b", "s:c")], "src string, dst string")
        sym = (
            edges.union(edges.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst")))
            .distinct()
            .withColumn("salt", F.pmod(F.xxhash64("dst"), F.lit(8)))
        )
        labels = edges.select(F.col("src").alias("node")).union(
            edges.select("dst")).distinct().select(
            "node", F.col("node").alias("label"))
        p = plans["stage_cc_iteration"] = plan_of(cc_iteration(sym, labels, 8))
        check("stage_cc_iteration", "frontier join is salted (salt in join key)",
              "salt" in p)
        check("stage_cc_iteration", "map-side partial min-label aggregation",
              "partial_min" in p)
        check("stage_cc_iteration", "no cartesian/nested-loop join",
              "CartesianProduct" not in p
              and "BroadcastNestedLoopJoin" not in p)

        links = spark.read.parquet(f"{tmp}/link")
        entities = spark.read.parquet(f"{tmp}/canonicalize")
        p = plans["stage_materialize"] = plan_of(
            materialize_triples(links, entities))
        check("stage_materialize", "no cartesian/nested-loop join",
              "CartesianProduct" not in p
              and "BroadcastNestedLoopJoin" not in p)
        check("stage_materialize", "map-side partial evidence aggregation",
              "partial_" in p)

        # the committed triple table is partitioned by pred: a predicate
        # filter must prune partitions at the scan, not post-filter rows
        triples = job._read_committed(f"{tmp}/materialize", partitioned=True)
        p = plans["stage_triples_pruned"] = plan_of(
            triples.where(F.col("pred") == "DECLARES"))
        pf = [ln for ln in p.splitlines() if "PartitionFilters:" in ln]
        check("stage_triples_pruned",
              "pred filter prunes checkpoint partitions (PartitionFilters)",
              bool(pf) and all("pred" in ln for ln in pf))

        # staged BGP query: every pattern element's constant predicate
        # must prune the committed table's pred partitions at its OWN
        # scan (the pattern compiles to per-element scans + equi-joins,
        # so each scan line needs a pred PartitionFilter)
        p = plans["stage_query_pattern"] = plan_of(job.query([
            ("?r", "DECLARES", "?e"), ("?e", "MENTIONED_WITH", "?x")]))
        pf = [ln for ln in p.splitlines() if "PartitionFilters:" in ln]
        check("stage_query_pattern",
              "each pattern element prunes pred partitions at its scan",
              len(pf) >= 2 and all("pred" in ln for ln in pf))
        check("stage_query_pattern", "no cartesian/nested-loop join",
              "CartesianProduct" not in p
              and "BroadcastNestedLoopJoin" not in p)

        # FILTER over a required variable: Catalyst must push the
        # predicate below the joins into that element's parquet scan
        # (PushedFilters on obj), not post-filter the joined rows
        p = plans["stage_query_filter"] = plan_of(job.query(
            [("?r", "DECLARES", "?e"), ("?e", "MENTIONED_WITH", "?x")],
            filters=['strstarts(?x, "ent:p")']))
        pushed = [ln for ln in p.splitlines() if "PushedFilters:" in ln]
        check("stage_query_filter",
              "required-var FILTER pushed into the scan (PushedFilters)",
              any("StringStartsWith(obj,ent:p" in ln for ln in pushed))

        # FILTER NOT EXISTS negation: the group must compile to a
        # left-anti join (never a filter-after-collect or a nested
        # loop), and the group element's constant predicate still
        # prunes the committed table's pred partitions at its own scan
        p = plans["stage_query_negation"] = plan_of(job.query(
            [("?r", "DECLARES", "?e")],
            negation=[[("?e", "LINKED_TO", "?kb")]]))
        check("stage_query_negation",
              "negation compiles to a left-anti join",
              "LeftAnti" in p)
        check("stage_query_negation", "no cartesian/nested-loop join",
              "CartesianProduct" not in p
              and "BroadcastNestedLoopJoin" not in p)
        pf = [ln for ln in p.splitlines() if "PartitionFilters:" in ln]
        check("stage_query_negation",
              "group element prunes pred partitions at its scan",
              bool(pf) and all("pred" in ln for ln in pf))

        # property-path closure: the edge scan feeding the semi-naive
        # loop must prune to the path's ONE pred partition and read
        # only (subj, obj) — the loop then iterates over checkpointed
        # delta frontiers, never rescanning the full table
        from ner_spark.plans.kg_query import path_closure
        edges_plan = plan_of(
            triples.where(F.col("pred") == "MENTIONED_WITH")
            .select("subj", "obj").distinct())
        plans["stage_path_edges"] = edges_plan
        pf = [ln for ln in edges_plan.splitlines()
              if "PartitionFilters:" in ln]
        check("stage_path_edges",
              "closure edge scan prunes to one pred partition",
              bool(pf) and all("pred" in ln for ln in pf))
        schemas = read_schemas(edges_plan)
        check("stage_path_edges",
              "closure edge scan reads only (subj, obj)",
              bool(schemas)
              and all(s == "struct<subj:string,obj:string>"
                      for s in schemas),
              f"ReadSchemas: {schemas}")
        closure = path_closure(triples, "MENTIONED_WITH")
        p = plans["stage_path_closure"] = plan_of(closure)
        check("stage_path_closure",
              "closure result reads checkpointed frontiers (no rescan)",
              "Scan ExistingRDD" in p and "parquet" not in p.lower())

        # update-path overlap guard: delta key-set broadcasts; the
        # mention-table scan is pruned to the two key columns
        delta = source_table(spark, n_rows=8)
        p = plans["stage_overlap_guard"] = plan_of(job._overlap_clash(delta))
        check("stage_overlap_guard",
              "broadcast semi-join probe (base never shuffles)",
              "BroadcastHashJoin" in p and "LeftSemi" in p
              and "Exchange hashpartitioning" not in p)
        schemas = read_schemas(p)
        check("stage_overlap_guard", "mention scan pruned to key columns",
              bool(schemas)
              and all(s == "struct<repo:string,path:string>" for s in schemas),
              f"ReadSchemas: {schemas}")

        # edit-ledger compaction: after compact_edits() the per-read
        # fold is ONE frozen edit no matter how long the history was.
        # Counted on the optimized plan: the single-edit fold prints 3
        # "Join LeftAnti" (the del-folded subtree prints again inside
        # the ins-dedup's right branch) — the 3-edit pre-compaction
        # ledger prints strictly more.
        def anti_count(df) -> int:
            return (df._jdf.queryExecution().optimizedPlan()
                    .toString().count("Join LeftAnti"))

        job.sparql_update('INSERT DATA { audit:a P1 audit:b }')
        job.sparql_update('DELETE WHERE { ?e LINKED_TO ?kb }')
        job.sparql_update('INSERT DATA { audit:c P1 audit:d }')
        pre_antis = anti_count(job.triples())
        pre_q_antis = anti_count(job.quads())
        job.compact_edits()
        post_antis = anti_count(job.triples())
        plans["stage_edit_compaction"] = plan_of(job.triples())
        check("stage_edit_compaction",
              "post-compaction fold is one frozen edit "
              "(single-edit anti-join constant, < pre-compaction)",
              post_antis == 3 and post_antis < pre_antis,
              f"pre={pre_antis} post={post_antis}")
        # the provenance view stops replaying the ledger too, and its
        # per-edit distinct() growth is gone entirely
        post_q = job.quads()
        post_q_antis = anti_count(post_q)
        pq = plans["stage_edit_compaction_quads"] = plan_of(post_q)
        check("stage_edit_compaction_quads",
              "post-compaction quads replay one attributed edit, "
              "no per-edit dedup shuffle",
              post_q_antis == 3 and post_q_antis < pre_q_antis
              and "HashAggregate" not in pq,
              f"pre={pre_q_antis} post={post_q_antis}")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    # KG analytics over the constructed graph: degree is pure
    # map-side-combinable aggregation; the pagerank loop body keeps its
    # one-row scalars (node count, dangling mass) as broadcast joins —
    # a BroadcastNestedLoopJoin over a single-row side is the in-plan
    # scalar, NOT a data-sized cartesian — and its contribution sum
    # partial-aggregates before the shuffle on the hot dst node.
    from ner_spark.plans.kg_analytics import entity_degree, pagerank

    tri = spark.createDataFrame(
        [("a", "P", "b", 1), ("b", "P", "c", 2), ("c", "P", "a", 1)],
        "subj string, pred string, obj string, evidence_count bigint")
    p = plans["kg_entity_degree"] = plan_of(entity_degree(tri))
    check("kg_entity_degree",
          "map-side partial aggregation (combine before shuffle)",
          "partial_" in p)
    check("kg_entity_degree", "no cartesian product",
          "CartesianProduct" not in p)
    p = plans["kg_pagerank_iteration"] = plan_of(
        pagerank(tri, iterations=1, checkpoint=False))
    check("kg_pagerank_iteration",
          "contribution sum partial-aggregates before the dst shuffle",
          "partial_sum" in p)
    check("kg_pagerank_iteration",
          "scalars stay in-plan as 1-row broadcasts (no cartesian)",
          "CartesianProduct" not in p and "BroadcastNestedLoopJoin" in p)
    # graph_components reuses the salted CC loop (its iteration shape
    # is audited under cc_iteration); here we audit the composition:
    # the size count partial-aggregates and nothing goes cartesian.
    from ner_spark.plans.kg_analytics import graph_components

    p = plans["kg_components"] = plan_of(graph_components(tri))
    check("kg_components",
          "component sizes partial-aggregate before the shuffle",
          "partial_count" in p)
    check("kg_components", "no cartesian product",
          "CartesianProduct" not in p)
    from ner_spark.plans.kg_analytics import comention_pmi

    tri_mw = spark.createDataFrame(
        [("a", "MENTIONED_WITH", "b", 2), ("a", "MENTIONED_WITH", "c", 1)],
        "subj string, pred string, obj string, evidence_count bigint")
    p = plans["kg_comention_pmi"] = plan_of(comention_pmi(tri_mw))
    check("kg_comention_pmi",
          "marginal mass partial-aggregates before the shuffle",
          "partial_sum" in p)
    check("kg_comention_pmi",
          "total mass stays in-plan as a 1-row broadcast (no cartesian)",
          "CartesianProduct" not in p and "BroadcastNestedLoopJoin" in p)
    from ner_spark.plans.kg_analytics import related_topk

    p = plans["kg_related_topk"] = plan_of(related_topk(tri_mw, k=2))
    check("kg_related_topk", "rank window keeps its partition spec",
          rank_window_partitioned(p))
    check("kg_related_topk", "no cartesian product",
          "CartesianProduct" not in p)
    # HITS: like pagerank — per-side sums partial-aggregate before
    # the shuffle, the L1 normalization total stays in-plan as a
    # 1-row broadcast, never a data-sized cartesian
    from ner_spark.plans.kg_analytics import hits as kg_hits

    p = plans["kg_hits_iteration"] = plan_of(
        kg_hits(tri, iterations=1, checkpoint=False))
    check("kg_hits_iteration",
          "score sums partial-aggregate before the shuffle",
          "partial_sum" in p)
    check("kg_hits_iteration",
          "normalization total stays in-plan as a 1-row broadcast",
          "CartesianProduct" not in p and "BroadcastNestedLoopJoin" in p)
    # link prediction: the wedge enumeration is a hash equi-join on
    # the shared neighbor, pair scores partial-aggregate, existing
    # edges anti-join out, and the ordered cut is
    # TakeOrderedAndProject (per-partition heaps, no global sort)
    from ner_spark.plans.kg_analytics import link_prediction

    p = plans["kg_link_prediction"] = plan_of(link_prediction(tri, k=5))
    check("kg_link_prediction",
          "wedge join is a hash equi-join (no cartesian)",
          "CartesianProduct" not in p
          and "BroadcastNestedLoopJoin" not in p)
    check("kg_link_prediction",
          "pair scores partial-aggregate before the shuffle",
          "partial_count" in p)
    check("kg_link_prediction",
          "existing edges anti-join out", "LeftAnti" in p)
    check("kg_link_prediction",
          "ordered top-k is TakeOrderedAndProject",
          "TakeOrderedAndProject" in p and
          "Sort [" not in p.replace("TakeOrderedAndProject", ""))
    # triangles: the oriented wedge join must stay an equi-join chain
    # (the DAG orientation bounds per-key fan-out; a cartesian or a
    # non-equi join here would blow up on any real graph)
    from ner_spark.plans.kg_analytics import triangles as kg_triangles

    p = plans["kg_triangles"] = plan_of(kg_triangles(tri))
    check("kg_triangles", "no cartesian product",
          "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p)
    check("kg_triangles",
          "corner counts partial-aggregate before the shuffle",
          "partial_count" in p)

    # label propagation: the per-round argmax is a rank window
    # PARTITIONED BY the node (per-node state only) that Spark 4
    # additionally rewrites into a group-limit below the shuffle, and
    # the neighbor-label counts partial-aggregate map-side.
    from ner_spark.plans.kg_analytics import label_propagation

    p = plans["kg_communities_round"] = plan_of(
        label_propagation(tri, iterations=1, checkpoint=False))
    check("kg_communities_round", "rank window keeps its partition spec",
          rank_window_partitioned(p))
    check("kg_communities_round",
          "argmax pushed below the shuffle as a group-limit",
          "WindowGroupLimit" in p and ", Partial" in p)
    check("kg_communities_round",
          "neighbor-label counts partial-aggregate before the shuffle",
          "partial_count" in p)
    check("kg_communities_round", "no cartesian product",
          "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p)
    # BFS: one frontier round must stay equi-join + anti-join (work
    # proportional to the frontier, never a relaxation over the full
    # distance table)
    from ner_spark.plans.kg_analytics import bfs_distances

    tri_repo = spark.createDataFrame(
        [("repo:r", "D", "a", 1), ("a", "M", "b", 1)],
        "subj string, pred string, obj string, evidence_count bigint")
    p = plans["kg_distances_round"] = plan_of(
        bfs_distances(tri_repo, max_hops=1, checkpoint=False))
    check("kg_distances_round",
          "reached-set exclusion is an anti-join",
          "LeftAnti" in p)
    check("kg_distances_round", "no cartesian product",
          "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p)
    # KMV sketch: the scan must prune to (text, lang); the distinct
    # partial-aggregates map-side; the per-group k minima must come
    # from a group-limit below the shuffle (each map task forwards at
    # most k rows per group — the window never sorts a full group)
    from ner_spark.operators.curate import kmv_distinct

    docs_df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    p = plans["kmv_distinct"] = plan_of(kmv_distinct(docs_df, k=64))
    check("kmv_distinct", "scan prunes to (text, lang)",
          "struct<text:string,lang:string>" in p)
    check("kmv_distinct",
          "distinct shuffles on (group, hash), not the group alone",
          bool(re.search(r"hashpartitioning\(lang#\d+, h#\d+", p)))
    check("kmv_distinct",
          "k minima via group-limit below the shuffle",
          "WindowGroupLimit" in p and ", Partial" in p)
    check("kmv_distinct", "no cartesian product",
          "CartesianProduct" not in p)

    # BGP pattern matching: the pattern must compile to a pure
    # filter + equi-join tree — constants as Filters (pushable), no
    # cartesian/nested-loop join anywhere (the disjoint-element guard
    # is unit-tested; this pins the compiled shape of a valid pattern)
    from ner_spark.plans.kg_query import match_pattern

    p = plans["kg_pattern"] = plan_of(match_pattern(tri, [
        ("?r", "DECLARES", "?e"), ("?e", "MENTIONED_WITH", "?x")]))
    check("kg_pattern", "joins are hash equi-joins",
          ("SortMergeJoin" in p or "BroadcastHashJoin" in p or
           "ShuffledHashJoin" in p))
    check("kg_pattern", "no cartesian product",
          "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p)
    check("kg_pattern", "constant predicates compile to filters",
          "DECLARES" in p and "Filter" in p)

    # solution modifiers: GROUP BY + aggregates + ORDER/LIMIT must
    # compile to a map-side-combinable aggregate feeding
    # TakeOrderedAndProject — never a global Sort (top-k at 100 TB is
    # per-partition heaps + a k-row driver merge)
    from ner_spark.plans.kg_query import solutions

    p = plans["kg_solutions"] = plan_of(solutions(
        tri, [("?r", "DECLARES", "?e")],
        group_by=["?r"],
        aggregates=["count(*) AS n", "count_distinct(?e) AS k"],
        order_by=["n DESC", "?r ASC"], limit=10))
    check("kg_solutions", "ordered limit is TakeOrderedAndProject",
          "TakeOrderedAndProject" in p)
    check("kg_solutions", "no global sort",
          "Sort [" not in p.replace("TakeOrderedAndProject", ""))
    check("kg_solutions", "aggregate partial-combines map-side",
          "partial_count" in p)
    # HAVING + OFFSET paging: the group filter sits on the aggregate
    # and the offset FOLDS INTO TakeOrderedAndProject (Spark carries
    # (limit+offset, offset) in the operator — still per-partition
    # heaps + a bounded driver merge, never a global sort)
    p = plans["kg_solutions_page"] = plan_of(solutions(
        tri, [("?r", "DECLARES", "?e")],
        group_by=["?r"], aggregates=["count(*) AS n"],
        having=["n >= 1"],
        order_by=["n DESC", "?r ASC"], offset=2, limit=10))
    check("kg_solutions_page", "offset folds into TakeOrderedAndProject",
          "TakeOrderedAndProject" in p and
          "Sort [" not in p.replace("TakeOrderedAndProject", ""))
    check("kg_solutions_page", "having filters the aggregate output",
          bool(re.search(r"Filter \(?\s*\(n#\d+L? >= 1\)", p))
          or "(n#" in p)

    # UNION: plan-level alternation — each branch keeps its own
    # pushed scans (the outer FILTER must reach BOTH branch scans
    # through the Union) and the Union itself adds no Exchange
    from ner_spark.plans.kg_query import match_union

    p = plans["kg_union"] = plan_of(match_union(tri, [
        [("?r", "DECLARES", "?e"), ("?e", "LINKED_TO", "?kb")],
        [("?e", "MENTIONED_WITH", "?x"), ("?x", "LINKED_TO", "?kb")],
    ], filters=['regex(?kb, "[0-9]$")']))
    check("kg_union", "branches union at the plan level",
          "Union" in p)
    check("kg_union", "outer filter pushes into both branch scans",
          p.count("RLIKE") >= 2)
    check("kg_union", "no cartesian product",
          "CartesianProduct" not in p and
          "BroadcastNestedLoopJoin" not in p)

    # VALUES: the inline data block must broadcast — never shuffle the
    # bindings.  Clean keys (required var, no UNDEF) compile to a hash
    # equi-join; UNDEF wildcards fall back to a broadcast nested-loop
    # over the k-row literal table, still shuffle-free
    p = plans["kg_values"] = plan_of(match_pattern(
        tri, [("?a", "?p", "?b")],
        values=(["?p"], [("DECLARES",), ("LINKED_TO",)])))
    check("kg_values", "clean-key inline data hash-equi-joins",
          "BroadcastHashJoin" in p and
          "BroadcastNestedLoopJoin" not in p)
    p2 = plans["kg_values_undef"] = plan_of(match_pattern(
        tri, [("?a", "?p", "?b")],
        values=(["?p", "?b"], [("DECLARES", None), ("LINKED_TO", "x")])))
    check("kg_values_undef",
          "undef shared var rides as residual on the equi-join",
          "BroadcastHashJoin" in p2 and "CartesianProduct" not in p2)
    check("kg_values_undef", "bindings never exchange for the join",
          "Exchange hashpartitioning" not in p2)

    # DESCRIBE: the subject-or-object membership must compile as two
    # hash equi-joins on the deduped node set + union + distinct —
    # never a nested-loop over the OR disjunction
    from ner_spark.plans.kg_query import describe

    p = plans["kg_describe"] = plan_of(describe(
        tri, ["?e"], pattern=[("?r", "DECLARES", "?e")]))
    check("kg_describe", "or-membership is two hash joins, not BNLJ",
          "BroadcastNestedLoopJoin" not in p and
          "CartesianProduct" not in p and "Union" in p)
    check("kg_describe", "triple set dedups map-side",
          bool(re.search(r"HashAggregate \(\d+\)\s+\+- Exchange "
                         r"\(\d+\)\s+\+- HashAggregate \(\d+\)\s+"
                         r"\+- Union", p)))

    # SPARQL text front-end: the parse must land on the SAME audited
    # physical shapes as the programmatic API — text adds no new plans
    from ner_spark.plans.sparql import sparql as sparql_run

    p = plans["kg_sparql_text"] = plan_of(sparql_run(
        tri,
        "SELECT ?r (COUNT(*) AS ?n) WHERE { ?r DECLARES ?e } "
        "GROUP BY ?r ORDER BY DESC(?n) ?r LIMIT 5"))
    check("kg_sparql_text", "parsed SELECT top-k is TakeOrderedAndProject",
          "TakeOrderedAndProject" in p and "partial_count" in p)
    p = plans["kg_sparql_ask"] = plan_of(sparql_run(
        tri, "ASK { ?a DECLARES ?b }"))
    check("kg_sparql_ask", "ASK probes LIMIT 1, never full materialize",
          "Limit" in p)

    # MINUS / FILTER EXISTS / negated property sets: the
    # set-difference's required-variable fast path must be a hash
    # anti-join on the DISTINCT-projected group solutions (never a
    # nested-loop — that path exists only for nullable shared vars),
    # the existence filter a hash semi-join, and a negated set a
    # pushed NOT-IN filter scan with no join at all
    p = plans["kg_minus"] = plan_of(match_pattern(
        tri, [("?r", "DECLARES", "?e")],
        minus=[[("?e", "LINKED_TO", "?kb")]]))
    check("kg_minus", "required-shared MINUS is a hash anti-join",
          "LeftAnti" in p and "BroadcastNestedLoopJoin" not in p
          and "CartesianProduct" not in p)
    p = plans["kg_exists"] = plan_of(match_pattern(
        tri, [("?r", "DECLARES", "?e")],
        existence=[[("?e", "LINKED_TO", "?kb")]]))
    check("kg_exists", "FILTER EXISTS is a hash semi-join",
          "LeftSemi" in p and "BroadcastNestedLoopJoin" not in p
          and "CartesianProduct" not in p)
    p = plans["kg_negset"] = plan_of(match_pattern(
        tri, [("?s", "!(DECLARES|LINKED_TO)", "?o")]))
    check("kg_negset", "negated set is one filtered scan, no join",
          "NOT" in p.upper() and "Join" not in p)
    # subquery: the nested SELECT keeps its own map-side-combinable
    # aggregate and joins into the outer bindings as a hash equi-join
    # on the shared required variable — never a nested loop
    p = plans["kg_subquery"] = plan_of(match_pattern(
        tri, [("?r", "DECLARES", "?e")],
        subqueries=[{"pattern": [("?e", "P", "?x")],
                     "group_by": ["?e"],
                     "aggregates": ["count(*) AS n"]}]))
    check("kg_subquery", "nested aggregate partial-combines map-side",
          "partial_count" in p)
    check("kg_subquery", "subquery joins as a hash equi-join",
          "BroadcastNestedLoopJoin" not in p
          and "CartesianProduct" not in p)

    # boolean FILTER expressions: a single-variable boolean (IN, or a
    # same-variable disjunction) is one Filter Catalyst can push below
    # the joins; the connectives never introduce a join
    p = plans["kg_filter_bool"] = plan_of(match_pattern(
        tri, [("?a", "?p", "?b"), ("?b", "?q", "?c")],
        filters=['?p IN ("DECLARES", "LINKED_TO")',
                 '?a = "x" || strstarts(?a, "repo:")']))
    check("kg_filter_bool", "IN compiles to a pushable IN filter",
          bool(re.search(r"\bIN\b", p)))
    check("kg_filter_bool", "single-var filters sit below the join",
          bool(re.search(r"Join[\s\S]*Filter[\s\S]*IN", p)))
    check("kg_filter_bool", "no cartesian product",
          "CartesianProduct" not in p and
          "BroadcastNestedLoopJoin" not in p)

    # SPARQL Update: the WHERE keeps its pushed scans, the delete is a
    # hash anti-join of the store against the DISTINCT delete set, and
    # the insert is a map-side-combinable (subj,pred,obj) count
    # anti-joined against the kept rows — never a nested loop, no
    # store-wide shuffle beyond the anti-join itself
    from ner_spark.plans.kg_update import apply_update

    p = plans["kg_update"] = plan_of(apply_update(
        tri,
        "DELETE { ?e LINKED_TO ?kb } INSERT { ?r MENTIONS_KB ?kb } "
        "WHERE { ?r DECLARES ?e . ?e LINKED_TO ?kb }"))
    check("kg_update", "delete/insert are hash anti-joins",
          p.count("LeftAnti") >= 2 and
          "BroadcastNestedLoopJoin" not in p and
          "CartesianProduct" not in p)
    check("kg_update", "insert evidence partial-combines map-side",
          "partial_count" in p)

    # contamination: the eval side must broadcast (the 100 TB corpus
    # never shuffles for the overlap join) and the per-pair shingle
    # counts partial-aggregate map-side
    from ner_spark.operators.curate import contamination_check

    ev_df = docs_df.where(F.col("doc_id") % 97 == 0)
    p = plans["contamination"] = plan_of(contamination_check(docs_df, ev_df))
    check("contamination", "eval shingles broadcast (corpus never shuffles "
          "for the join)", "BroadcastHashJoin" in p)
    check("contamination",
          "pair counts partial-aggregate before the shuffle",
          "partial_count" in p)
    check("contamination", "no cartesian product",
          "CartesianProduct" not in p)
    # leakage-safe split: composition of the audited LSH cluster path
    # with the hash split — nothing may go cartesian end-to-end
    from ner_spark.operators.curate import leakage_safe_split

    p = plans["leakage_split"] = plan_of(leakage_safe_split(docs_df))
    check("leakage_split", "no cartesian product",
          "CartesianProduct" not in p)

    # N-Triples interchange: the export is a pure per-row projection
    # (no Exchange, no Join — a 10^12-triple export parallelizes like
    # a scan), and the import is per-row parsing plus exactly one
    # equi-join re-attaching evidence counts — never a nested loop
    from ner_spark.plans.kg_export import ntriples_lines, ntriples_parse

    p = plans["kg_ntriples_export"] = plan_of(
        ntriples_lines(tri, evidence=True))
    check("kg_ntriples_export", "serialization is shuffle-free "
          "(no Exchange)", "Exchange" not in p)
    check("kg_ntriples_export", "no join in the export path",
          "Join" not in p)
    check("kg_ntriples_export", "whole-stage codegen covers the "
          "projection", "codegen id" in p)
    p = plans["kg_ntriples_import"] = plan_of(
        ntriples_parse(ntriples_lines(tri, evidence=True),
                       strict=False))
    check("kg_ntriples_import", "evidence re-attach is a hash "
          "equi-join, never a nested loop",
          "CartesianProduct" not in p
          and "BroadcastNestedLoopJoin" not in p)

    # Named graphs: a CONSTANT graph must prune the quad scan BEFORE
    # any join (a Filter on graph below the joins, no post-join
    # filter), and a variable-graph chain stays hash equi-joins
    from ner_spark.plans.kg_query import match_pattern as mp

    quads_df = spark.createDataFrame(
        [("g1", "a", "P", "b", 1), ("g2", "b", "P", "c", 1)],
        "graph string, subj string, pred string, obj string, "
        "evidence_count bigint")
    p = plans["kg_quads_const_graph"] = plan_of(
        mp(quads_df, [("g1", "?s", "P", "?o"), ("?o", "P", "?t")]))
    check("kg_quads_const_graph", "no cartesian / nested-loop join",
          "CartesianProduct" not in p
          and "BroadcastNestedLoopJoin" not in p)
    p = plans["kg_quads_var_graph"] = plan_of(
        mp(quads_df, [("?g", "?s", "P", "?o"), ("?g", "?o", "P", "?t")]))
    check("kg_quads_var_graph", "same-graph chain is a hash equi-join "
          "(graph rides the join key)",
          "CartesianProduct" not in p
          and "BroadcastNestedLoopJoin" not in p)

    # N-Quads export: like the N-Triples export, serialization must
    # stay a pure per-row projection — a 10^12-quad provenance export
    # parallelizes like a scan
    from ner_spark.plans.kg_export import nquads_lines, nquads_parse

    p = plans["kg_nquads_export"] = plan_of(
        nquads_lines(quads_df, evidence=True))
    check("kg_nquads_export", "serialization is shuffle-free "
          "(no Exchange)", "Exchange" not in p)
    check("kg_nquads_export", "no join in the export path",
          "Join" not in p)
    p = plans["kg_nquads_import"] = plan_of(
        nquads_parse(nquads_lines(quads_df, evidence=True),
                     strict=False))
    check("kg_nquads_import", "evidence re-attach is a hash "
          "equi-join, never a nested loop",
          "CartesianProduct" not in p
          and "BroadcastNestedLoopJoin" not in p)

    # RDFS entailment: the fact-side derivation pass (_derive_once)
    # must join the big fact table ONLY against the broadcast closed
    # schema — any SortMergeJoin here would shuffle the 100 TB side
    # per rule; the loop's anti-join dedup is audited separately via
    # the end-to-end entail() plan (no cartesian anywhere)
    from ner_spark.plans.kg_infer import (
        _derive_once, entail, ontology, schema_closure)
    from ner_spark.plans.kg_validate import shapes as kg_shapes
    from ner_spark.plans.kg_validate import validate as kg_validate

    onto = ontology(spark)
    base = tri.select("subj", "pred", "obj").unionByName(onto).distinct()
    p = plans["kg_entail_derive"] = plan_of(
        _derive_once(base, schema_closure(base)))
    check("kg_entail_derive", "every rule join broadcasts the schema "
          "(no SortMergeJoin against the fact table)",
          "SortMergeJoin" not in p and "BroadcastHashJoin" in p)
    check("kg_entail_derive", "no cartesian / nested-loop join",
          "CartesianProduct" not in p
          and "BroadcastNestedLoopJoin" not in p)
    ent_df = entail(tri, onto)
    p = plans["kg_entailment"] = plan_of(ent_df)
    check("kg_entailment", "inferred-flag marking is a hash join, "
          "never a nested loop",
          "CartesianProduct" not in p
          and "BroadcastNestedLoopJoin" not in p)
    p = plans["kg_validation"] = plan_of(kg_validate(ent_df,
                                                     kg_shapes(spark)))
    check("kg_validation", "shapes are a broadcast dimension",
          "BroadcastHashJoin" in p)
    check("kg_validation", "no cartesian / nested-loop join",
          "CartesianProduct" not in p
          and "BroadcastNestedLoopJoin" not in p)

    ok_all = all(ok for _q, _l, ok, _n in checks)
    lines = ["# PLANS — physical-plan audit", "",
             f"`python tools/plan_audit.py` at {SF_DIR} (local[4]).", "",
             "| query | check | ok |", "|---|---|---|"]
    for name, label, ok, _note in checks:
        lines.append(f"| {name} | {label} | {'✅' if ok else '❌'} |")
    lines.append("")
    lines.append("## Captured plans")
    for name, p in plans.items():
        lines.append(f"\n### {name}\n\n```\n{p.strip()}\n```")
    (REPO / "BENCH" / "PLANS.md").write_text("\n".join(lines) + "\n",
                                             encoding="utf-8")
    print("\n".join(f"{'OK ' if ok else 'FAIL'} {n}: {l}"
                    for n, l, ok, _ in checks))
    spark.stop()
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())

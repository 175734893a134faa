"""Differential graph fuzz: the KG-analytics operators must match
their DuckDB twins on RANDOM triple graphs, not just the fixture gold
KG — self-loops, parallel predicate edges, multi-component topologies,
hubs, and dangling sinks are where min-label propagation, dangling
redistribution, and marginal mass accounting can silently diverge.

Exact-typed outputs (degree, components) compare as multisets through
the same canonicalization the grading driver uses; the float outputs
(pagerank ranks, PMI) run the oracles in ``quantized=False`` form and
compare per-key with a 1e-9 absolute tolerance — the engines execute
the same IEEE expression but are free to order their aggregation sums
differently.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402
from ner_spark.plans.kg_analytics import (  # noqa: E402
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
from tests.oracle_compare import assert_df_matches_duckdb  # noqa: E402

NODES = ["ent:a", "ent:b", "ent:c", "ent:d", "repo:r1", "kb:Q1"]
PREDS = ["MENTIONED_WITH", "DECLARES", "LINKED_TO", "INSTANCE_OF"]

TRIPLE_SCHEMA = "subj string, pred string, obj string, evidence_count bigint"


@st.composite
def graphs(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    rows = []
    for _ in range(n):
        rows.append(
            (
                draw(st.sampled_from(NODES)),
                draw(st.sampled_from(PREDS)),
                draw(st.sampled_from(NODES)),
                draw(st.integers(min_value=1, max_value=9)),
            )
        )
    # force a hub sometimes: everyone points at rows[0].subj
    if draw(st.booleans()):
        hub = rows[0][0]
        for node in draw(st.lists(st.sampled_from(NODES), max_size=4)):
            rows.append((node, "MENTIONED_WITH", hub, 1))
    return rows


def _values_cte(rows) -> str:
    vals = ", ".join(
        f"('{s}', '{p}', '{o}', {e})" for s, p, o, e in rows
    )
    return (
        f"SELECT * FROM (VALUES {vals}) "
        "AS t(subj, pred, obj, evidence_count)"
    )


def _float_map(rows, key_cols, val_col):
    return {tuple(r[k] for k in key_cols): r[val_col] for r in rows}


def _assert_close(spark_rows, duck_rows, key_cols, val_col, name):
    s = _float_map(spark_rows, key_cols, val_col)
    d = _float_map(duck_rows, key_cols, val_col)
    assert s.keys() == d.keys(), f"{name}: key sets differ"
    for k in s:
        assert math.isclose(s[k], d[k], rel_tol=0, abs_tol=1e-9), (
            f"{name}: {k}: {s[k]} vs {d[k]}"
        )


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(graphs())
def test_graph_ops_match_oracles_on_random_graphs(spark, rows):
    tri = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    kg_sql = _values_cte(rows)
    con = duckdb.connect()
    try:
        # exact-typed ops: the driver's multiset compare
        assert_df_matches_duckdb(
            entity_degree(tri), con,
            entrymod._kg_degree_oracle(kg_sql=kg_sql),
            name="kg_entity_degree",
        )
        assert_df_matches_duckdb(
            graph_components(tri, salt_buckets=2), con,
            entrymod._kg_components_oracle(kg_sql=kg_sql),
            name="kg_components",
        )
        # related_topk compares EXACTLY through the quantized oracle:
        # pmi's inputs are exact integer sums, so the ranking (and the
        # 1e-6 quantization) is engine-independent
        from pyspark.sql import functions as F
        assert_df_matches_duckdb(
            related_topk(tri, k=2).select(
                "node", "related",
                F.floor(F.col("pmi") * 1000000 + F.lit(0.5))
                .cast("bigint").alias("pmi_q"),
                "rnk",
            ),
            con,
            entrymod._kg_related_oracle(k=2, kg_sql=kg_sql),
            name="kg_related_topk",
        )
        # triangles compare exactly through the quantized oracle: the
        # degree-oriented wedge join must equal the plain ordered
        # 3-way self-join on every topology (hubs, ties, self-loops)
        assert_df_matches_duckdb(
            triangles(tri).select(
                "node",
                F.col("degree").cast("bigint").alias("degree"),
                "triangles",
                F.floor(F.col("clustering_coeff") * 1000000 + F.lit(0.5))
                .cast("bigint").alias("clustering_coeff_q"),
            ),
            con,
            entrymod._kg_triangles_oracle(kg_sql=kg_sql),
            name="kg_triangles",
        )
        # label propagation compares exactly: synchronous update +
        # (count DESC, label ASC) tie-break is a pure function of the
        # graph, so the chained-CTE unroll must match on every
        # topology (ties, isolated self-loop nodes, hubs)
        assert_df_matches_duckdb(
            label_propagation(tri, iterations=2, checkpoint=False), con,
            entrymod._kg_communities_oracle(iterations=2, kg_sql=kg_sql),
            name="kg_communities",
        )
        # BFS distances: the Spark frontier walk must equal the
        # oracle's full-relaxation min fixpoint (seeds = repo: nodes;
        # NODES includes repo:r1, so seeded and seedless graphs both
        # occur)
        assert_df_matches_duckdb(
            bfs_distances(tri, max_hops=2, checkpoint=False), con,
            entrymod._kg_distances_oracle(max_hops=2, kg_sql=kg_sql),
            name="kg_distances",
        )
        # BGP pattern matching: four shapes (single element, variable
        # predicates chained, a 2-cycle, self-loops via a repeated
        # variable) must reproduce the generated SQL twin's multiset —
        # random graphs have duplicate triple rows, so this also pins
        # the multiplicity semantics
        from ner_spark.plans.kg_query import match_pattern
        for pname, pat in (
            ("p_single", [("?s", "MENTIONED_WITH", "?o")]),
            ("p_chain", [("?a", "?p", "?b"), ("?b", "?q", "?c")]),
            ("p_cycle", [("?a", "MENTIONED_WITH", "?b"),
                         ("?b", "MENTIONED_WITH", "?a")]),
            ("p_selfloop", [("?a", "?p", "?a")]),
        ):
            assert_df_matches_duckdb(
                match_pattern(tri, pat), con,
                entrymod._kg_pattern_oracle(pat, kg_sql=kg_sql),
                name=f"kg_pattern:{pname}",
            )
        # OPTIONAL (left-join) semantics on random graphs: unmatched
        # optional elements must keep the required binding with nulls
        opt = [("?b", "LINKED_TO", "?k")]
        assert_df_matches_duckdb(
            match_pattern(tri, [("?a", "MENTIONED_WITH", "?b")],
                          optional=opt)
            .withColumn("k", F.coalesce("k", F.lit(""))),
            con,
            entrymod._kg_pattern_oracle(
                [("?a", "MENTIONED_WITH", "?b")], optional=opt,
                fill_null=("?k",), kg_sql=kg_sql),
            name="kg_pattern:optional",
        )
        # FILTER semantics on random graphs: every grammar form must
        # reproduce the generated WHERE twin, including the
        # error-eliminates-row drop of null OPTIONAL bindings
        for fname, pat, popt, flt in (
            ("f_varvar", [("?a", "?p", "?b")], (), ["?a != ?b"]),
            ("f_const", [("?a", "?p", "?b")], (), ['?b >= "ent:c"']),
            ("f_regex", [("?a", "?p", "?b")], (),
             ['regex(?p, "^(MENTIONED|LINKED)")']),
            ("f_strfns", [("?a", "?p", "?b")], (),
             ['strstarts(?a, "ent:")', 'contains(?b, ":")',
              'strends(?p, "WITH")']),
            ("f_optional_null_drop", [("?a", "MENTIONED_WITH", "?b")],
             [("?b", "LINKED_TO", "?k")], ['strstarts(?k, "kb:")']),
            # boolean expressions: SQL null logic = SPARQL error
            # algebra (TRUE||error keeps, !BOUND negation-as-failure,
            # null IN eliminates) — both engines, same truth table
            ("f_bool_or_and", [("?a", "?p", "?b")], (),
             ['?a != ?b && (strstarts(?b, "ent:") '
              '|| ?p IN ("DECLARES", "LINKED_TO"))']),
            ("f_bool_notbound", [("?a", "MENTIONED_WITH", "?b")],
             [("?b", "LINKED_TO", "?k")],
             ['!bound(?k) || strends(?k, "1")']),
            ("f_bool_or_null_rescue", [("?a", "MENTIONED_WITH", "?b")],
             [("?b", "LINKED_TO", "?k")],
             ['?k = "kb:Q1" || ?a = "ent:a"']),
            ("f_bool_notin_null", [("?a", "MENTIONED_WITH", "?b")],
             [("?b", "LINKED_TO", "?k")],
             ['?k NOT IN ("kb:Q1", "zzz")']),
            ("f_bool_not_over_and", [("?a", "?p", "?b")], (),
             ['!(?p = "DECLARES" && ?b = "ent:a")']),
        ):
            # optional cases may keep unmatched rows (null ?k — the
            # !BOUND and TRUE||error forms), so ?k sentinel-fills on
            # both sides for the sorted compare
            df = match_pattern(tri, pat, optional=popt, filters=flt)
            fill = ("?k",) if popt else ()
            if popt:
                df = df.withColumn("k", F.coalesce("k", F.lit("")))
            assert_df_matches_duckdb(
                df, con,
                entrymod._kg_pattern_oracle(pat, optional=popt,
                                            filters=flt, fill_null=fill,
                                            kg_sql=kg_sql),
                name=f"kg_pattern:{fname}",
            )
        # property paths on random graphs (cycles, self-loops, hubs):
        # the semi-naive closure — unbounded, hop-bounded, seeded at a
        # constant endpoint, starred — must reproduce the recursive-CTE
        # twin's SET semantics
        for hname, pat, hops in (
            ("h_plus", [("?a", "MENTIONED_WITH+", "?b")], None),
            ("h_star", [("?a", "MENTIONED_WITH*", "?b")], None),
            ("h_bounded", [("?a", "MENTIONED_WITH+", "?b")], 2),
            ("h_seed_src", [("ent:a", "MENTIONED_WITH+", "?b")], None),
            ("h_seed_dst", [("?a", "MENTIONED_WITH+", "ent:b")], None),
            ("h_chain", [("?r", "DECLARES", "?a"),
                         ("?a", "MENTIONED_WITH+", "?b")], None),
        ):
            assert_df_matches_duckdb(
                match_pattern(tri, pat, path_max_hops=hops), con,
                entrymod._kg_pattern_oracle(pat, path_max_hops=hops,
                                            kg_sql=kg_sql),
                name=f"kg_pattern:{hname}",
            )
        # FILTER NOT EXISTS on random graphs: the anti-join must
        # reproduce the correlated NOT EXISTS twin — single and
        # multi-element groups, constants, a path inside the group,
        # and the null-OPTIONAL correlation that never matches
        for nname, pat, popt, neg in (
            ("n_simple", [("?a", "?p", "?b")], (),
             [[("?b", "LINKED_TO", "?k")]]),
            ("n_two_groups", [("?a", "MENTIONED_WITH", "?b")], (),
             [[("?b", "DECLARES", "?c")], [("?a", "LINKED_TO", "?k")]]),
            ("n_chain_group", [("?a", "?p", "?b")], (),
             [[("?b", "DECLARES", "?c"), ("?c", "LINKED_TO", "?k")]]),
            ("n_path_group", [("?a", "?p", "?b")], (),
             [[("?b", "MENTIONED_WITH+", "?c")]]),
        ):
            assert_df_matches_duckdb(
                match_pattern(tri, pat, optional=list(popt),
                              negation=neg), con,
                entrymod._kg_pattern_oracle(pat, optional=popt,
                                            negation=neg, kg_sql=kg_sql),
                name=f"kg_pattern:{nname}",
            )
        assert_df_matches_duckdb(
            match_pattern(tri, [("?a", "MENTIONED_WITH", "?b")],
                          optional=[("?b", "LINKED_TO", "?k")],
                          negation=[[("?k", "DECLARES", "?z")]])
            .withColumn("k", F.coalesce("k", F.lit(""))),
            con,
            entrymod._kg_pattern_oracle(
                [("?a", "MENTIONED_WITH", "?b")],
                optional=[("?b", "LINKED_TO", "?k")],
                negation=[[("?k", "DECLARES", "?z")]],
                fill_null=("?k",), kg_sql=kg_sql),
            name="kg_pattern:n_null_optional",
        )
        # OPTIONAL GROUPS on random graphs: the group's local
        # filter/bind evaluates INSIDE (before the left join), so
        # outer rows always survive — with null group bindings where
        # the filtered group missed
        for gname, gpat, og, fills in (
            ("og_filtered", [("?a", "MENTIONED_WITH", "?b")],
             {"pattern": [("?b", "LINKED_TO", "?k")],
              "filters": ['strends(?k, "1")']}, ("?k",)),
            ("og_multi", [("?a", "?p", "?b")],
             {"pattern": [("?b", "DECLARES", "?c"),
                          ("?c", "LINKED_TO", "?k")]}, ("?c", "?k")),
            ("og_bind", [("?a", "MENTIONED_WITH", "?b")],
             {"pattern": [("?b", "LINKED_TO", "?k")],
              "binds": ['CONCAT("x:", ?k) AS ?t']}, ("?k", "?t")),
        ):
            df = match_pattern(tri, gpat, optional=[dict(og)])
            for v in fills:
                df = df.withColumn(v[1:],
                                   F.coalesce(v[1:], F.lit("")))
            assert_df_matches_duckdb(
                df, con,
                entrymod._kg_pattern_oracle(
                    gpat, optional=[dict(og)], fill_null=fills,
                    kg_sql=kg_sql),
                name=f"kg_pattern:{gname}",
            )
        # conditional/splitting/hashing BINDs on random graphs
        cf_binds = ['IF(contains(?b, "e"), "y", ?p) AS ?c',
                    "SHA256(?b) AS ?h",
                    'STRBEFORE(?b, ":") AS ?ns']
        assert_df_matches_duckdb(
            match_pattern(tri, [("?a", "?p", "?b")], binds=cf_binds),
            con,
            entrymod._kg_pattern_oracle([("?a", "?p", "?b")],
                                        binds=cf_binds, kg_sql=kg_sql),
            name="kg_pattern:condfns_binds",
        )
        # numeric aggregates / separator group_concat / numeric
        # HAVING on random graphs (sum/avg over STRLEN-bound terms —
        # exact decimal sums, so the DOUBLE surfaces compare equal)
        from ner_spark.plans.kg_query import solutions
        num_kw = dict(
            binds=["STRLEN(?b) AS ?len"],
            group_by=["?p"],
            aggregates=["sum(?len) AS s", "avg(?len) AS av",
                        "sum_distinct(?len) AS sd",
                        'group_concat(?b; separator="|") AS bs',
                        "count(*) AS n"],
            having=["n >= 1"], order_by=["?p ASC"],
        )
        assert_df_matches_duckdb(
            solutions(tri, [("?a", "?p", "?b")], **num_kw), con,
            entrymod._kg_solutions_oracle(
                [("?a", "?p", "?b")], **num_kw, kg_sql=kg_sql),
            name="kg_solutions:numagg",
        )
        # CONSTRUCT on random graphs: template projection (variables,
        # constants, multi-element), set collapse with evidence_count
        # multiplicity, and the null-OPTIONAL instantiation drop must
        # all reproduce the generated SQL twin
        from ner_spark.plans.kg_query import construct
        for cname, pat, popt, tpl in (
            ("c_reverse", [("?a", "?p", "?b")], (),
             [("?b", "REVERSE_OF", "?a")]),
            ("c_multi_const", [("?a", "MENTIONED_WITH", "?b")], (),
             [("?a", "CO_OCCURS", "?b"), ("?a", "rdf:type", "Node")]),
            ("c_optional_drop", [("?a", "MENTIONED_WITH", "?b")],
             [("?b", "LINKED_TO", "?k")],
             [("?a", "NEAR_KB", "?k"), ("?a", "TOUCHES", "?b")]),
        ):
            assert_df_matches_duckdb(
                construct(tri, pat, template=tpl, optional=popt), con,
                entrymod._kg_construct_oracle(pat, tpl, optional=popt,
                                              kg_sql=kg_sql),
                name=f"kg_construct:{cname}",
            )
        # solution modifiers on random graphs: grouped aggregates of
        # every portable kind (count(*) vs null-skipping count(?v)
        # over an OPTIONAL leg, count_distinct, min/max, the pinned
        # sorted-distinct group_concat), the global one-row aggregate,
        # projection+DISTINCT, and an ordered LIMIT whose (count, key)
        # order is total — all against the generated modifier twin
        from ner_spark.plans.kg_query import solutions
        for sname, skw in (
            ("s_grouped", dict(
                pattern=[("?a", "?p", "?b")],
                optional=[("?b", "LINKED_TO", "?k")],
                group_by=["?a"],
                aggregates=["count(*) AS n", "count(?k) AS k_n",
                            "count_distinct(?b) AS uniq",
                            "min(?b) AS lo", "max(?b) AS hi",
                            "group_concat(?p) AS preds"])),
            ("s_global", dict(
                pattern=[("?a", "MENTIONED_WITH", "?b")],
                aggregates=["count(*) AS n",
                            "count_distinct(?a) AS srcs"])),
            ("s_distinct_proj", dict(
                pattern=[("?a", "?p", "?b")],
                select=["?p"], distinct=True)),
            ("s_topk", dict(
                pattern=[("?a", "?p", "?b")],
                group_by=["?a"],
                aggregates=["count(*) AS n"],
                order_by=["n DESC", "?a ASC"], limit=3)),
            ("s_having_page", dict(
                pattern=[("?a", "?p", "?b")],
                group_by=["?a"],
                aggregates=["count(*) AS n"],
                having=["n >= 2"],
                order_by=["n DESC", "?a ASC"],
                offset=1, limit=3)),
        ):
            assert_df_matches_duckdb(
                solutions(tri, **skw), con,
                entrymod._kg_solutions_oracle(**skw, kg_sql=kg_sql),
                name=f"kg_solutions:{sname}",
            )
        # UNION on random graphs: branch-unbound nulls (sentinel-
        # filled on both sides), bag semantics when the branches
        # overlap, branch-local kwargs, an outer FILTER spanning the
        # union, and modifiers over the union'd binding set
        from ner_spark.plans.kg_query import match_union
        u_groups = [
            [("?a", "MENTIONED_WITH", "?b")],
            {"pattern": [("?a", "LINKED_TO", "?k")],
             "filters": ['?a != ?k']},
        ]
        assert_df_matches_duckdb(
            match_union(tri, u_groups,
                        filters=['strstarts(?a, "e")'])
            .fillna({"b": "", "k": ""}),
            con,
            entrymod._kg_union_oracle(
                u_groups, filters=['strstarts(?a, "e")'],
                fill_null=("?b", "?k"), kg_sql=kg_sql),
            name="kg_union:u_branches",
        )
        u_overlap = [[("?a", "?p", "?b")],
                     [("?a", "MENTIONED_WITH", "?b")]]
        assert_df_matches_duckdb(
            solutions(tri, union=u_overlap, group_by=["?a"],
                      aggregates=["count(*) AS n",
                                  "count_distinct(?b) AS uniq"],
                      order_by=["n DESC", "?a ASC"], limit=4),
            con,
            entrymod._kg_solutions_oracle(
                union=u_overlap, group_by=["?a"],
                aggregates=["count(*) AS n",
                            "count_distinct(?b) AS uniq"],
                order_by=["n DESC", "?a ASC"], limit=4,
                kg_sql=kg_sql),
            name="kg_union:u_solutions",
        )
        # path forms on random graphs: inverse ^P (endpoint swap),
        # predicate alternation P1|P2, and their closure composition
        for pname, ppat in (
            ("p_inverse", [("?b", "^MENTIONED_WITH", "?a")]),
            ("p_alt", [("?a", "MENTIONED_WITH|LINKED_TO", "?b")]),
            ("p_alt_plus", [("?a", "DECLARES", "?b"),
                            ("?b", "(MENTIONED_WITH|LINKED_TO)+", "?c")]),
            ("p_inv_plus", [("?a", "^MENTIONED_WITH+", "?b")]),
        ):
            assert_df_matches_duckdb(
                match_pattern(tri, ppat), con,
                entrymod._kg_pattern_oracle(ppat, kg_sql=kg_sql),
                name=f"kg_pathforms:{pname}",
            )
        # sequence paths + zero-or-one on random graphs: multiset
        # chain semantics, composed segments (alternation, closure,
        # inverse), and the P? bounded closure
        for sname, spat in (
            ("s_plain", [("?a", "DECLARES/MENTIONED_WITH", "?c")]),
            ("s_alt_seg",
             [("?a", "DECLARES/(MENTIONED_WITH|LINKED_TO)", "?c")]),
            ("s_closure_seg", [("?a", "DECLARES/MENTIONED_WITH+",
                                "?c")]),
            ("s_inverse", [("?a", "MENTIONED_WITH/^DECLARES", "?r")]),
            ("s_zoo", [("?a", "MENTIONED_WITH?", "?b")]),
            ("s_zoo_chain", [("?r", "DECLARES", "?a"),
                             ("?a", "LINKED_TO?", "?k")]),
        ):
            assert_df_matches_duckdb(
                match_pattern(tri, spat), con,
                entrymod._kg_pattern_oracle(spat, kg_sql=kg_sql),
                name=f"kg_seq:{sname}",
            )
        # BIND on random graphs: a chained bind (the second reads the
        # first) and a bind over a nullable OPTIONAL variable (null
        # propagates through || / concat in both engines)
        bnd = ['CONCAT(?a, "->", ?b) AS ?edge',
               'STRLEN(?edge) AS ?n']
        assert_df_matches_duckdb(
            match_pattern(tri, [("?a", "MENTIONED_WITH", "?b")],
                          binds=bnd),
            con,
            entrymod._kg_pattern_oracle(
                [("?a", "MENTIONED_WITH", "?b")], binds=bnd,
                kg_sql=kg_sql),
            name="kg_bind:b_chain",
        )
        bopt = ['CONCAT(?b, "/", ?k) AS ?pair']
        assert_df_matches_duckdb(
            match_pattern(tri, [("?a", "MENTIONED_WITH", "?b")],
                          optional=[("?b", "LINKED_TO", "?k")],
                          binds=bopt)
            .fillna({"k": "", "pair": ""}),
            con,
            entrymod._kg_pattern_oracle(
                [("?a", "MENTIONED_WITH", "?b")],
                optional=[("?b", "LINKED_TO", "?k")], binds=bopt,
                fill_null=("?k", "?pair"), kg_sql=kg_sql),
            name="kg_bind:b_null",
        )
        # negated sets, FILTER EXISTS and MINUS on random graphs:
        # NOT-IN scans (standalone + sequence-composed), the semi /
        # anti correlation rules, disjoint-domain MINUS, and the
        # nullable-shared compatibility path through OPTIONAL
        for nname, npat in (
            ("n_negset", [("?s", "!MENTIONED_WITH", "?o")]),
            ("n_negset_alt", [("?s", "!(DECLARES|LINKED_TO)", "?o")]),
            ("n_negset_seq", [("?s", "DECLARES/!LINKED_TO", "?o")]),
        ):
            assert_df_matches_duckdb(
                match_pattern(tri, npat), con,
                entrymod._kg_pattern_oracle(npat, kg_sql=kg_sql),
                name=f"kg_negset:{nname}",
            )
        sbase = [("?a", "MENTIONED_WITH", "?b")]
        sgrp = [[("?b", "LINKED_TO", "?k")]]
        for ename, ekw in (
            ("e_exists", {"existence": sgrp}),
            ("e_minus", {"minus": sgrp}),
            ("e_minus_disjoint", {"minus": [[("?x", "DECLARES",
                                              "?y")]]}),
        ):
            assert_df_matches_duckdb(
                match_pattern(tri, sbase, **ekw), con,
                entrymod._kg_pattern_oracle(sbase, **ekw,
                                            kg_sql=kg_sql),
                name=f"kg_setops:{ename}",
            )
        sopt = {"optional": [("?b", "LINKED_TO", "?k")]}
        sng = [[("?k", "?p2", "?z")]]
        assert_df_matches_duckdb(
            match_pattern(tri, sbase, **sopt, existence=sng)
            .fillna({"k": ""}),
            con,
            entrymod._kg_pattern_oracle(
                sbase, **sopt, existence=sng, fill_null=("?k",),
                kg_sql=kg_sql),
            name="kg_setops:e_exists_null",
        )
        assert_df_matches_duckdb(
            match_pattern(tri, sbase, **sopt, minus=sng)
            .fillna({"k": ""}),
            con,
            entrymod._kg_pattern_oracle(
                sbase, **sopt, minus=sng, fill_null=("?k",),
                kg_sql=kg_sql),
            name="kg_setops:e_minus_null",
        )
        # DESCRIBE on random graphs: constant nodes, pattern-bound
        # nodes, and the mixed form — all against the generated twin
        from ner_spark.plans.kg_query import describe
        for dname, dterms, dkw in (
            ("d_const", ["e1", "e2"], {}),
            ("d_var", ["?b"],
             {"pattern": [("?a", "MENTIONED_WITH", "?b")]}),
            ("d_mixed", ["e1", "?k"],
             {"pattern": [("?a", "LINKED_TO", "?k")]}),
        ):
            assert_df_matches_duckdb(
                describe(tri, dterms, **dkw), con,
                entrymod._kg_describe_oracle(dterms, **dkw,
                                             kg_sql=kg_sql),
                name=f"kg_describe:{dname}",
            )
        # VALUES on random graphs: required-var set constraint (equi
        # path), UNDEF wildcard + data-only annotation var (nullable
        # residual path), merged through filters and negation
        v_eq = (["?p"], [("MENTIONED_WITH",), ("LINKED_TO",)])
        assert_df_matches_duckdb(
            match_pattern(tri, [("?a", "?p", "?b")], values=v_eq),
            con,
            entrymod._kg_pattern_oracle([("?a", "?p", "?b")],
                                        values=v_eq, kg_sql=kg_sql),
            name="kg_values:v_eq",
        )
        v_mix = (["?p", "?tag"],
                 [("MENTIONED_WITH", "m"), ("DECLARES", None),
                  ("LINKED_TO", "l")])
        assert_df_matches_duckdb(
            match_pattern(tri, [("?a", "?p", "?b")], values=v_mix,
                          negation=[[("?b", "LINKED_TO", "?k")]])
            .fillna({"tag": ""}),
            con,
            entrymod._kg_pattern_oracle(
                [("?a", "?p", "?b")], values=v_mix,
                negation=[[("?b", "LINKED_TO", "?k")]],
                fill_null=("?tag",), kg_sql=kg_sql),
            name="kg_values:v_mix",
        )
        # SPARQL Update on random graphs: delete-then-insert from ONE
        # pre-update evaluation (re-homing edges), template-as-pattern
        # DELETE WHERE, duplicate ground data collapsing to one row
        # with multiplicity, and a closure-driven INSERT — kept rows
        # keep their evidence_count (dup (s,p,o) store rows survive as
        # a multiset), new rows enter with the derived binding count
        from ner_spark.plans.kg_update import apply_update
        for uname, text in (
            ("u_modify", "DELETE { ?a MENTIONED_WITH ?b } "
             "INSERT { ?a SEEN_WITH ?b } "
             "WHERE { ?a MENTIONED_WITH ?b }"),
            ("u_del_where", "DELETE WHERE { ?a LINKED_TO ?k }"),
            ("u_ins_data", "INSERT DATA { ent:a DECLARES ent:b . "
             "ent:a DECLARES ent:b }"),
            ("u_ins_path", "INSERT { ?a REACHES ?b } "
             "WHERE { ?a MENTIONED_WITH+ ?b }"),
        ):
            assert_df_matches_duckdb(
                apply_update(tri, text), con,
                entrymod._kg_update_oracle(text, kg_sql=kg_sql),
                name=f"kg_update:{uname}",
            )
        # link prediction: the jaccard ranking key is a ratio of
        # exact integers (engine-portable cut); both scores compare
        # through the 1e-6 quantized twin like related_topk
        assert_df_matches_duckdb(
            link_prediction(tri, k=5).select(
                "node_a", "node_b", "common_neighbors",
                F.floor(F.col("jaccard") * 1000000 + F.lit(0.5))
                .cast("bigint").alias("jaccard_q"),
                F.floor(F.col("adamic_adar") * 1000000 + F.lit(0.5))
                .cast("bigint").alias("adamic_adar_q"),
            ),
            con,
            entrymod._kg_linkpred_oracle(k=5, kg_sql=kg_sql),
            name="kg_link_prediction",
        )
        # HITS: float sums → raw doubles, per-key tolerance compare
        # (like pagerank below); L1 normalization must hold when any
        # edge exists
        ht = hits(tri, iterations=2, checkpoint=False).collect()
        ht_d = con.execute(entrymod._kg_hits_oracle(
            iterations=2, kg_sql=kg_sql, quantized=False)).fetchall()
        for col, j in (("hub", 1), ("authority", 2)):
            _assert_close(
                [{"node": r["node"], col: r[col]} for r in ht],
                [{"node": t[0], col: t[j]} for t in ht_d],
                ("node",), col, f"kg_hits:{col}",
            )
        if ht:
            assert math.isclose(sum(r["hub"] for r in ht), 1.0,
                                rel_tol=0, abs_tol=1e-9)
        # float ops: raw doubles, per-key tolerance compare
        pr = pagerank(tri, iterations=2, checkpoint=False).collect()
        pr_d = con.execute(entrymod._kg_pagerank_oracle(
            iterations=2, kg_sql=kg_sql, quantized=False)).fetchall()
        _assert_close(
            [{"node": r["node"], "rank": r["rank"]} for r in pr],
            [{"node": n, "rank": v} for n, v in pr_d],
            ("node",), "rank", "kg_pagerank",
        )
        assert math.isclose(sum(r["rank"] for r in pr), 1.0,
                            rel_tol=0, abs_tol=1e-9)
        pmi = comention_pmi(tri).collect()
        pmi_d = con.execute(entrymod._kg_pmi_oracle(
            kg_sql=kg_sql, quantized=False)).fetchall()
        _assert_close(
            [dict(r.asDict()) for r in pmi],
            [{"subj": s, "obj": o, "evidence_count": e, "pmi": v}
             for s, o, e, v in pmi_d],
            ("subj", "obj", "evidence_count"), "pmi", "kg_comention_pmi",
        )
    finally:
        con.close()

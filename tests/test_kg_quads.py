"""Named graphs (quads): GRAPH semantics in match_pattern and the
SPARQL text front-end, differentially fuzzed against the generated
DuckDB oracle on random quad graphs.

Semantics pinned here:

- a 4-tuple element ``(g, s, p, o)`` / ``GRAPH g { s p o }`` matches
  within named graphs; a variable graph binds the graph name and
  constrains every element carrying it to the SAME graph;
- a plain triple element over a quads relation matches the UNION
  DEFAULT GRAPH — the RDF merge (DISTINCT over graphs), so a triple
  asserted in two graphs binds once;
- property paths close WITHIN a constant graph; under a variable
  graph the closure runs PER GRAPH (the graph column rides the
  semi-naive frontier join key), so reachability never leaks across
  graphs; sequence paths under a variable graph raise.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402
from ner_spark.plans.kg_query import match_pattern  # noqa: E402
from ner_spark.plans.sparql import sparql  # noqa: E402
from tests.oracle_compare import assert_df_matches_duckdb  # noqa: E402

QUAD_SCHEMA = ("graph string, subj string, pred string, obj string, "
               "evidence_count int")


def _quads(spark, rows):
    return spark.createDataFrame(rows, QUAD_SCHEMA)


def _kg_sql(rows):
    vals = ", ".join(f"('{g}', '{s}', '{p}', '{o}', {e})"
                     for g, s, p, o, e in rows)
    return (f"SELECT * FROM (VALUES {vals}) "
            "AS t(graph, subj, pred, obj, evidence_count)")


FIXED = [
    ("g1", "a", "P", "b", 1), ("g1", "b", "P", "c", 1),
    ("g2", "a", "P", "b", 2), ("g2", "b", "Q", "c", 1),
    ("g2", "c", "P", "d", 1), ("g3", "d", "Q", "a", 1),
]


def test_variable_graph_binds_and_chains(spark):
    q = _quads(spark, FIXED)
    got = {tuple(r) for r in match_pattern(
        q, [("?g", "?s", "P", "?o"), ("?g", "?o", "P", "?t")]
    ).collect()}
    # only g1 chains a->b->c within ONE graph (g2's a->b, c->d do not
    # chain; chaining a cross-graph pair must NOT match)
    assert got == {("g1", "a", "b", "c")}


def test_union_default_graph_dedups(spark):
    q = _quads(spark, FIXED)
    got = sorted(tuple(r) for r in match_pattern(
        q, [("?s", "P", "?o")]).collect())
    # (a, b) asserted in g1 AND g2 binds once
    assert got == [("a", "b"), ("b", "c"), ("c", "d")]


def test_constant_graph_scopes_closure(spark):
    q = _quads(spark, FIXED)
    got = {r.x for r in match_pattern(
        q, [("g1", "a", "P+", "?x")]).collect()}
    assert got == {"b", "c"}  # g2's c->d must not leak in


def test_variable_graph_closure_is_per_graph(spark):
    q = _quads(spark, FIXED)
    got = {(r.g, r.x) for r in match_pattern(
        q, [("?g", "a", "P+", "?x")]).collect()}
    # g1: a->b->c within g1; g2: a->b only (b's next edge is Q);
    # cross-graph chaining (g2's a->b with g1's b->c) must NOT appear
    assert got == {("g1", "b"), ("g1", "c"), ("g2", "b")}
    # sequences under a variable graph stay unsupported
    with pytest.raises(ValueError, match="VARIABLE graph"):
        match_pattern(q, [("?g", "a", "P/Q", "?x")])


def test_quad_element_requires_graph_column(spark):
    tri = spark.createDataFrame(
        [("a", "P", "b")], "subj string, pred string, obj string")
    with pytest.raises(ValueError, match="graph"):
        match_pattern(tri, [("?g", "?s", "P", "?o")])


def test_sparql_graph_text_forms(spark):
    q = _quads(spark, FIXED)
    out = sparql(q, "SELECT ?g (COUNT(?s) AS ?n) WHERE "
                    "{ GRAPH ?g { ?s ?p ?o } } GROUP BY ?g ORDER BY ?g")
    assert [tuple(r) for r in out.collect()] == [
        ("g1", 2), ("g2", 3), ("g3", 1)]
    out = sparql(q, "ASK { GRAPH <g3> { d Q ?x } }")
    assert out.collect()[0][0] is True


def _random_quads(rnd):
    graphs = [f"g{i}" for i in range(rnd.randint(1, 4))]
    nodes = [f"n{i}" for i in range(rnd.randint(3, 8))]
    preds = ["P", "Q", "R"][: rnd.randint(2, 3)]
    rows = sorted({
        (rnd.choice(graphs), rnd.choice(nodes), rnd.choice(preds),
         rnd.choice(nodes))
        for _ in range(rnd.randint(4, 30))
    })
    return [(g, s, p, o, 1) for g, s, p, o in rows], graphs, nodes, preds


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_quad_patterns_vs_oracle(spark, seed):
    rnd = random.Random(3000 + seed)
    rows, graphs, nodes, preds = _random_quads(rnd)
    q = _quads(spark, rows)
    kg_sql = _kg_sql(rows)
    con = duckdb.connect()
    try:
        for trial in range(3):
            # one var-graph quad element, chained with either another
            # same-graph quad element or a default-graph element;
            # sometimes a constant graph / a filter
            p1 = rnd.choice(preds)
            p2 = rnd.choice(preds)
            pattern = [("?g", "?s", p1, "?o")]
            if rnd.random() < 0.5:
                pattern.append(("?g", "?o", p2, "?t"))
            else:
                pattern.append(("?o", p2, "?t"))
            if rnd.random() < 0.4:
                pattern[0] = (rnd.choice(graphs),) + pattern[0][1:]
            filters = (["?s != ?t"] if rnd.random() < 0.3 else [])
            got = match_pattern(q, pattern, filters=filters, plan=None)
            sql = entrymod._kg_pattern_oracle(
                pattern, filters=filters, kg_sql=kg_sql, quads=True)
            assert_df_matches_duckdb(
                got, con, sql, name=f"quads-{seed}-{trial}")
            # planned order must equal written order results
            got_planned = match_pattern(q, pattern, filters=filters,
                                        plan="static")
            assert_df_matches_duckdb(
                got_planned, con, sql,
                name=f"quads-planned-{seed}-{trial}")
    finally:
        con.close()


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_sparql_graph_text_vs_oracle(spark, seed):
    rnd = random.Random(4000 + seed)
    rows, graphs, nodes, preds = _random_quads(rnd)
    q = _quads(spark, rows)
    kg_sql = _kg_sql(rows)
    con = duckdb.connect()
    queries = [
        "SELECT ?g ?s ?o WHERE { GRAPH ?g { ?s P ?o } }",
        ("SELECT ?g (COUNT(?s) AS ?n) WHERE { GRAPH ?g { ?s ?p ?o } }"
         " GROUP BY ?g ORDER BY DESC(?n) ?g"),
        f"SELECT ?s ?o WHERE {{ GRAPH <{graphs[0]}> {{ ?s ?p ?o }} }}",
        f"SELECT ?x WHERE {{ GRAPH <{graphs[0]}> {{ {nodes[0]} P+ ?x }} }}",
        f"SELECT ?g ?x WHERE {{ GRAPH ?g {{ {nodes[0]} P+ ?x }} }}",
        "SELECT ?g ?s ?x WHERE { GRAPH ?g { ?s P* ?x } }",
        "SELECT ?s WHERE { ?s P ?o . GRAPH ?g { ?o Q ?t } }",
        "ASK { GRAPH ?g { ?s Q ?o } }",
    ]
    try:
        for text in queries:
            sdf = sparql(q, text)
            sql = entrymod._kg_sparql_oracle(text, kg_sql=kg_sql,
                                             quads=True)
            assert_df_matches_duckdb(sdf, con, sql, name=text)
    finally:
        con.close()


def test_dataset_clauses(spark):
    q = _quads(spark, FIXED)
    # FROM restricts the default graph to the named slices' merge
    got = sorted(tuple(r) for r in sparql(
        q, "SELECT ?s ?o FROM <g1> WHERE { ?s P ?o }").collect())
    assert got == [("a", "b"), ("b", "c")]
    # two FROMs merge (and dedup the shared a->b)
    got = sorted(tuple(r) for r in sparql(
        q, "SELECT ?s ?o FROM <g1> FROM <g2> WHERE { ?s P ?o }"
    ).collect())
    assert got == [("a", "b"), ("b", "c"), ("c", "d")]
    # FROM NAMED restricts GRAPH: a constant outside it matches nothing
    assert sparql(
        q, "SELECT ?s FROM NAMED <g2> WHERE { GRAPH <g1> { ?s P ?o } }"
    ).count() == 0
    got = {r.g for r in sparql(
        q, "SELECT ?g FROM NAMED <g2> FROM NAMED <g3> "
           "WHERE { GRAPH ?g { ?s ?p ?o } }").collect()}
    assert got == {"g2", "g3"}
    # a path closes within the FROM slice only
    got = {r.x for r in sparql(
        q, "SELECT ?x FROM <g2> WHERE { a P+ ?x }").collect()}
    assert got == {"b"}
    # a dataset clause over a graph-LESS relation is an error, not a
    # silently unrestricted result (mirrors the quad-element check)
    tri = q.select("subj", "pred", "obj")
    with pytest.raises(ValueError, match="FROM / FROM NAMED"):
        sparql(tri, "SELECT ?s FROM <g1> WHERE { ?s P ?o }").collect()
    with pytest.raises(ValueError, match="FROM / FROM NAMED"):
        sparql(tri, "SELECT ?s FROM NAMED <g1> "
                    "WHERE { GRAPH ?g { ?s P ?o } }").collect()


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_dataset_clauses_vs_oracle(spark, seed):
    rnd = random.Random(5000 + seed)
    rows, graphs, nodes, preds = _random_quads(rnd)
    q = _quads(spark, rows)
    kg_sql = _kg_sql(rows)
    con = duckdb.connect()
    g0 = graphs[0]
    sub = " ".join(f"FROM <{g}>" for g in graphs[:2])
    queries = [
        f"SELECT ?s ?o {sub} WHERE {{ ?s P ?o }}",
        f"SELECT ?g ?s FROM NAMED <{g0}> WHERE {{ GRAPH ?g {{ ?s P ?o }} }}",
        f"SELECT ?s FROM NAMED <{g0}> WHERE {{ GRAPH <{g0}> {{ ?s ?p ?o }} }}",
        f"SELECT ?x FROM <{g0}> WHERE {{ {nodes[0]} P+ ?x }}",
        f"ASK FROM <{g0}> {{ ?s Q ?o }}",
        (f"SELECT ?g (COUNT(?s) AS ?n) FROM NAMED <{g0}> "
         "WHERE { GRAPH ?g { ?s ?p ?o } } GROUP BY ?g"),
    ]
    try:
        for text in queries:
            sdf = sparql(q, text)
            sql = entrymod._kg_sparql_oracle(text, kg_sql=kg_sql,
                                             quads=True)
            assert_df_matches_duckdb(sdf, con, sql, name=text)
    finally:
        con.close()


def test_graph_block_with_filter(spark):
    q = _quads(spark, FIXED)
    out = sparql(q, 'SELECT ?g ?s ?o WHERE '
                    '{ GRAPH ?g { ?s P ?o FILTER(?s != a) } } '
                    'ORDER BY ?g ?s')
    assert [tuple(r) for r in out.collect()] == [
        ("g1", "b", "c"), ("g2", "c", "d")]
    # oracle parity for the hoisted form
    con = duckdb.connect()
    try:
        text = ('SELECT ?g ?s ?o WHERE '
                '{ GRAPH ?g { ?s P ?o FILTER(?s != a) } }')
        assert_df_matches_duckdb(
            sparql(q, text), con,
            entrymod._kg_sparql_oracle(text, kg_sql=_kg_sql(FIXED),
                                       quads=True),
            name="graph-filter")
    finally:
        con.close()
    with pytest.raises(ValueError, match="GRAPH"):
        sparql(q, 'SELECT ?s WHERE { GRAPH ?g { ?s P ?o '
                  'FILTER NOT EXISTS { ?o Q ?t } } }')


def test_quad_elements_in_group_operators(spark):
    """Quad elements inside NEGATION / EXISTENCE / MINUS / OPTIONAL
    correlate on the graph variable like any other — 'no Q edge from
    ?o IN THE SAME GRAPH' is expressible, and each form matches its
    generated oracle."""
    q = _quads(spark, FIXED)
    kg_sql = _kg_sql(FIXED)
    con = duckdb.connect()
    from pyspark.sql import functions as F

    cases = [
        dict(pattern=[("?g", "?s", "P", "?o")],
             negation=[[("?g", "?o", "Q", "?t")]]),
        dict(pattern=[("?g", "?s", "P", "?o")],
             existence=[[("?g", "?o", "Q", "?t")]]),
        dict(pattern=[("?g", "?s", "P", "?o")],
             minus=[[("?g", "?s", "P", "b")]]),
        dict(pattern=[("?g", "?s", "P", "?o")],
             optional=[("?g", "?o", "Q", "?t")]),
    ]
    try:
        for i, kw in enumerate(cases):
            got = match_pattern(q, **kw)
            sql = entrymod._kg_pattern_oracle(
                kw["pattern"], optional=kw.get("optional", ()),
                negation=kw.get("negation", ()),
                existence=kw.get("existence", ()),
                minus=kw.get("minus", ()), kg_sql=kg_sql, quads=True,
                fill_null=("?t",) if "optional" in kw else ())
            if "optional" in kw:
                got = got.withColumn("t", F.coalesce("t", F.lit("")))
            assert_df_matches_duckdb(got, con, sql, name=f"case{i}")
        # same-graph negation semantics, concretely: g2's b->Q->c
        # eliminates only g2's (a, b) binding
        neg = {tuple(r) for r in match_pattern(
            q, [("?g", "?s", "P", "?o")],
            negation=[[("?g", "?o", "Q", "?t")]]).collect()}
        assert neg == {("g1", "a", "b"), ("g1", "b", "c"),
                       ("g2", "c", "d")}
    finally:
        con.close()

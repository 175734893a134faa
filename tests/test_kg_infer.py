"""RDFS-lite entailment: unit semantics on a toy graph, differential
fuzz against a brute-force Python fixpoint on random graphs+ontologies,
and the fragment guard.

The brute-force oracle applies the five rho-df rules naively to a
fixpoint with no staging at all, so it is independent of the engine's
schema-closure-then-broadcast-pass decomposition — the exact property
the staging could get wrong (a rule cascade the staged round misses
would show up here as an under-entailment).
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ner_spark.plans.kg_infer import (  # noqa: E402
    DOMAIN,
    RANGE,
    RDF_TYPE,
    SUB_CLASS,
    SUB_PROP,
    entail,
    ontology,
)


def brute_force_closure(triples: set[tuple]) -> set[tuple]:
    """Naive rho-df fixpoint: apply every rule to the whole set until
    nothing new appears.  O(n^2) per round — fine at test sizes."""
    out = set(triples)
    while True:
        new = set()
        sco = {(s, o) for s, p, o in out if p == SUB_CLASS}
        spo = {(s, o) for s, p, o in out if p == SUB_PROP}
        dom = {(s, o) for s, p, o in out if p == DOMAIN}
        rng = {(s, o) for s, p, o in out if p == RANGE}
        for a, b in sco:  # rdfs11
            for c, d in sco:
                if b == c:
                    new.add((a, SUB_CLASS, d))
        for a, b in spo:  # rdfs5
            for c, d in spo:
                if b == c:
                    new.add((a, SUB_PROP, d))
        for s, p, o in out:
            for pp, q in spo:  # rdfs7
                if p == pp:
                    new.add((s, q, o))
            for pp, c in dom:  # rdfs2
                if p == pp:
                    new.add((s, RDF_TYPE, c))
            for pp, c in rng:  # rdfs3
                if p == pp:
                    new.add((o, RDF_TYPE, c))
            if p == RDF_TYPE:  # rdfs9
                for a, b in sco:
                    if o == a:
                        new.add((s, RDF_TYPE, b))
        if new <= out:
            return out
        out |= new


def _run(spark, facts, onto_rows):
    fdf = spark.createDataFrame(
        list(facts), "subj string, pred string, obj string"
    )
    odf = spark.createDataFrame(
        list(onto_rows), "subj string, pred string, obj string"
    )
    got = {
        (r.subj, r.pred, r.obj, r.inferred)
        for r in entail(fdf, odf).collect()
    }
    base = set(facts) | set(onto_rows)
    want_full = brute_force_closure(base)
    want = {(s, p, o, (s, p, o) not in base) for s, p, o in want_full}
    return got, want


def test_toy_semantics(spark):
    facts = [
        ("e1", RDF_TYPE, "PER"),
        ("repo:r1", "DECLARES", "e1"),
        ("e1", "MENTIONED_WITH", "e2"),
    ]
    onto = [
        ("PER", SUB_CLASS, "class:Agent"),
        ("class:Agent", SUB_CLASS, "class:Thing"),
        ("DECLARES", SUB_PROP, "REFERS_TO"),
        ("DECLARES", DOMAIN, "class:Repository"),
        ("MENTIONED_WITH", SUB_PROP, "CO_OCCURS_WITH"),
        ("CO_OCCURS_WITH", RANGE, "class:Thing"),
    ]
    got, want = _run(spark, facts, onto)
    assert got == want
    # spot-checks: 2-hop class lift, spo copy, domain typing, and the
    # rdfs7 -> rdfs3 cascade (range of the SUPERproperty types e2)
    assert ("e1", RDF_TYPE, "class:Thing", True) in got
    assert ("repo:r1", "REFERS_TO", "e1", True) in got
    assert ("repo:r1", RDF_TYPE, "class:Repository", True) in got
    assert ("e2", RDF_TYPE, "class:Thing", True) in got
    # inputs are marked not-inferred
    assert ("e1", RDF_TYPE, "PER", False) in got


def test_type_first_derived_then_lifted(spark):
    """A subject whose FIRST type arrives via a domain rule must still
    be lifted through subClassOf — the classic staging bug."""
    facts = [("a", "P", "b")]
    onto = [
        ("P", DOMAIN, "C1"),
        ("C1", SUB_CLASS, "C2"),
        ("C2", SUB_CLASS, "C3"),
    ]
    got, want = _run(spark, facts, onto)
    assert got == want
    assert ("a", RDF_TYPE, "C3", True) in got


def test_spo_chain_through_derived_pred(spark):
    """rdfs7 composes: P sub Q sub R means (a P b) entails (a R b) —
    via the spo CLOSURE, and Q's domain also fires on the copy."""
    facts = [("a", "P", "b")]
    onto = [
        ("P", SUB_PROP, "Q"),
        ("Q", SUB_PROP, "R"),
        ("Q", DOMAIN, "CQ"),
        ("R", RANGE, "CR"),
    ]
    got, want = _run(spark, facts, onto)
    assert got == want
    assert ("a", "R", "b", True) in got
    assert ("a", RDF_TYPE, "CQ", True) in got
    assert ("b", RDF_TYPE, "CR", True) in got


def test_meta_schema_guard(spark):
    fdf = spark.createDataFrame(
        [("a", "P", "b")], "subj string, pred string, obj string"
    )
    odf = spark.createDataFrame(
        [("P", SUB_PROP, SUB_CLASS)], "subj string, pred string, obj string"
    )
    with pytest.raises(ValueError, match="rho-df"):
        entail(fdf, odf)


def test_fixture_ontology_on_gold_kg(spark):
    """Every repo node gets typed class:Repository, every entity that
    co-occurs gets class:Thing, and no base triple is lost."""
    from ner_spark.plans.kg_gold import kg_triples_gold

    gold = kg_triples_gold(spark)
    out = entail(gold, ontology(spark))
    rows = {(r.subj, r.pred, r.obj): r.inferred for r in out.collect()}
    base = {(r.subj, r.pred, r.obj) for r in gold.collect()}
    assert base <= set(rows)
    assert all(not rows[t] for t in base)
    repos = {s for s, p, o in base if p == "DECLARES"}
    for repo in repos:
        assert rows.get((repo, RDF_TYPE, "class:Repository")) is True
    ents = {s for s, p, o in base if p == "MENTIONED_WITH"}
    for e in list(ents)[:5]:
        assert rows.get((e, RDF_TYPE, "class:Thing")) is True


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_random_graph_random_ontology(spark, seed):
    rnd = random.Random(1000 + seed)
    nodes = [f"n{i}" for i in range(rnd.randint(4, 12))]
    props = [f"P{i}" for i in range(rnd.randint(2, 5))]
    classes = [f"C{i}" for i in range(rnd.randint(3, 7))]
    facts = set()
    for _ in range(rnd.randint(5, 40)):
        facts.add((rnd.choice(nodes), rnd.choice(props + [RDF_TYPE] * 2),
                   rnd.choice(nodes + classes)))
    onto = set()
    # random subClassOf edges (may contain cycles — closure handles
    # them as mutual subclasses)
    for _ in range(rnd.randint(0, 8)):
        onto.add((rnd.choice(classes), SUB_CLASS, rnd.choice(classes)))
    for _ in range(rnd.randint(0, 6)):
        onto.add((rnd.choice(props), SUB_PROP, rnd.choice(props)))
    for _ in range(rnd.randint(0, 4)):
        onto.add((rnd.choice(props), DOMAIN, rnd.choice(classes)))
    for _ in range(rnd.randint(0, 4)):
        onto.add((rnd.choice(props), RANGE, rnd.choice(classes)))
    got, want = _run(spark, facts, onto)
    assert got == want


def test_oracle_twin_on_random_graphs(spark):
    """The staged SQL oracle (`_kg_entail_oracle`) must equal the
    engine on RANDOM fact graphs under the COMMITTED ontology (the
    staging is only claimed complete for schema that satisfies the
    fragment guard, which the committed ontology does — so random
    facts, fixed schema)."""
    import duckdb

    import __spark_entry__ as entrymod
    from tests.oracle_compare import assert_df_matches_duckdb

    from ner_spark.plans.kg_infer import entail as entail_op

    rnd = random.Random(7)
    preds = ["DECLARES", "LINKED_TO", "MENTIONED_WITH", RDF_TYPE]
    nodes = [f"n{i}" for i in range(10)] + ["PER", "ORG", "class:Agent"]
    for trial in range(3):
        rows = sorted({
            (rnd.choice(nodes), rnd.choice(preds), rnd.choice(nodes), 1)
            for _ in range(rnd.randint(5, 30))
        })
        tri = spark.createDataFrame(
            rows, "subj string, pred string, obj string, evidence_count int"
        )
        vals = ", ".join(f"('{s}', '{p}', '{o}', {e})" for s, p, o, e in rows)
        kg_sql = (f"SELECT * FROM (VALUES {vals}) "
                  "AS t(subj, pred, obj, evidence_count)")
        con = duckdb.connect()
        try:
            assert_df_matches_duckdb(
                entail_op(tri, ontology(spark)), con,
                entrymod._kg_entail_oracle(kg_sql=kg_sql),
                name=f"entail-fuzz-{trial}",
            )
            from ner_spark.plans.kg_validate import shapes, validate

            assert_df_matches_duckdb(
                validate(entail_op(tri, ontology(spark)), shapes(spark)),
                con,
                entrymod._kg_validate_oracle(kg_sql=kg_sql),
                name=f"validate-fuzz-{trial}",
            )
        finally:
            con.close()


@pytest.mark.parametrize("seed", range(4))
def test_entail_increment_equals_full_rerun(spark, seed):
    """closure(base) + increment(delta) must equal entail(base+delta)
    triple-for-triple — the delta-proportional maintenance property,
    on random graphs under the committed ontology."""
    from ner_spark.plans.kg_infer import entail_increment

    rnd = random.Random(7000 + seed)
    nodes = [f"n{i}" for i in range(8)] + ["PER", "ORG"]
    preds = ["DECLARES", "LINKED_TO", "MENTIONED_WITH", RDF_TYPE]
    def rand_facts(n):
        return {(rnd.choice(nodes), rnd.choice(preds),
                 rnd.choice(nodes)) for _ in range(n)}

    base = rand_facts(rnd.randint(5, 20))
    delta = rand_facts(rnd.randint(1, 8))
    schema = "subj string, pred string, obj string"
    onto = ontology(spark)
    closure = entail(
        spark.createDataFrame(sorted(base), schema), onto
    ).select("subj", "pred", "obj").localCheckpoint(eager=True)
    inc = entail_increment(
        closure, spark.createDataFrame(sorted(delta), schema), onto)
    got = {tuple(r) for r in closure.collect()} | \
          {tuple(r) for r in inc.collect()}
    want = {
        (r.subj, r.pred, r.obj)
        for r in entail(
            spark.createDataFrame(sorted(base | delta), schema), onto
        ).collect()
    }
    assert got == want
    # the increment is disjoint from the closure (delta-proportional)
    assert not ({tuple(r) for r in inc.collect()}
                & {tuple(r) for r in closure.collect()})


def test_entail_increment_rejects_schema_delta(spark):
    from ner_spark.plans.kg_infer import entail_increment

    schema = "subj string, pred string, obj string"
    onto = ontology(spark)
    closure = entail(
        spark.createDataFrame([("a", RDF_TYPE, "PER")], schema), onto
    ).select("subj", "pred", "obj")
    with pytest.raises(ValueError, match="schema triples"):
        entail_increment(
            closure,
            spark.createDataFrame([("X", SUB_CLASS, "Y")], schema),
            onto)

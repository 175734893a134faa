"""Selectivity-ordered BGP join planning (kg_query.plan_pattern).

Three layers: the greedy order itself (pure unit tests — constant
endpoints seed, closures defer, connectivity beats cost, disconnected
raises the cartesian guard at plan time), the one-scan stats cost
model (exact counts for plain elements, documented multipliers for
closure/sequence forms), and plan INVARIANCE — the property that
makes reordering sound: required BGP elements are inner equi-joins on
never-null columns, so any connected join order yields the same
multiset.  The fuzz shuffles randomly-generated connected patterns
and compares written-order evaluation (plan=None) against the static
and stats planners on the shuffled listing.
"""

from __future__ import annotations

import random

import pytest

from ner_spark.plans.kg_query import (
    match_pattern,
    pattern_stats_costs,
    plan_pattern,
)


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, evidence_count bigint"
    )


# ------------------------------------------------- greedy order (pure)


def test_plan_pattern_seeds_constant_endpoint():
    # the constant-object element is degree-bounded: it must seed even
    # though it is written last
    order = plan_pattern([
        ("?a", "MENTIONED_WITH", "?b"),
        ("?b", "LINKED_TO", "?kb"),
        ("?b", "INSTANCE_OF", "kb:Q1"),
    ])
    assert order == [2, 0, 1]


def test_plan_pattern_defers_closures():
    # a closure is an eager fixpoint materialization — evaluate the
    # plain scan first so the closure joins into small bindings
    assert plan_pattern([
        ("?a", "MENTIONED_WITH+", "?b"),
        ("?a", "DECLARES", "?c"),
    ]) == [1, 0]
    # sequences defer the same way; inverse closures normalize first
    assert plan_pattern([
        ("?a", "DECLARES/MENTIONED_WITH", "?b"),
        ("?b", "^LINKED_TO", "?c"),
    ]) == [1, 0]


def test_plan_pattern_connectivity_beats_cost():
    # element 1 is as cheap as the seed but shares no variable with it
    # yet: the bridge (element 2) must run first
    assert plan_pattern([
        ("repo:r", "DECLARES", "?e"),
        ("?x", "LINKED_TO", "kb:Q1"),
        ("?e", "MENTIONED_WITH", "?x"),
    ]) == [0, 2, 1]


def test_plan_pattern_var_pred_and_negated_set_rank_late():
    # a variable predicate / negated set reads ~the whole edge table;
    # a constant-predicate scan goes first
    assert plan_pattern([
        ("?a", "?p", "?b"),
        ("?a", "DECLARES", "?c"),
    ]) == [1, 0]
    assert plan_pattern([
        ("?a", "!(DECLARES)", "?b"),
        ("?a", "DECLARES", "?c"),
    ]) == [1, 0]


def test_plan_pattern_disconnected_raises_cartesian():
    with pytest.raises(ValueError, match="cartesian"):
        plan_pattern([("?a", "P", "?b"), ("?c", "P", "?d")])
    # connected-overall patterns never raise, whatever the written
    # order (the evaluator used to reject bad orders; the planner
    # rescues them)
    assert plan_pattern([
        ("?c", "P", "?d"), ("?a", "P", "?b"), ("?b", "P", "?c"),
    ]) == [0, 2, 1]


def test_plan_pattern_costs_override():
    pat = [("?a", "P", "?b"), ("?a", "Q", "?c")]
    assert plan_pattern(pat, [5.0, 1.0]) == [1, 0]
    assert plan_pattern(pat, [1.0, 5.0]) == [0, 1]
    with pytest.raises(ValueError, match="costs for"):
        plan_pattern(pat, [1.0])


# ------------------------------------------------- stats cost scan


def test_pattern_stats_costs_exact_counts(spark):
    t = _triples(spark, [
        ("a", "P", "b", 1), ("a", "P", "c", 1),
        ("b", "P", "c", 1), ("b", "Q", "c", 1),
    ])
    costs = pattern_stats_costs(t, [
        ("?x", "P", "?y"),        # 3 P edges
        ("?x", "Q", "?y"),        # 1 Q edge
        ("a", "P", "?y"),         # 2 out of node a
        ("a", "P", "b"),          # 1 ground edge
        ("?x", "?p", "?y"),       # whole table
        ("?x", "!P", "?y"),       # complement of P
        ("?x", "P+", "?y"),       # closure: base mass x4
        ("?x", "P/Q", "?y"),      # sequence: union mass x (2*segs)
        ("?y", "^Q", "?x"),       # inverse normalizes to Q
    ])
    assert costs == [3.0, 1.0, 2.0, 1.0, 4.0, 1.0, 12.0, 16.0, 1.0]
    # the measured costs drive the greedy order: Q-scan before P-scan
    assert plan_pattern(
        [("?x", "P", "?y"), ("?x", "Q", "?y")],
        pattern_stats_costs(t, [("?x", "P", "?y"), ("?x", "Q", "?y")]),
    ) == [1, 0]


# ------------------------------------------------- evaluator wiring


def test_match_pattern_output_columns_stay_written_order(spark):
    # the planner changes the JOIN order (constant element first) but
    # the OUTPUT schema stays first-appearance in the written pattern
    t = _triples(spark, [
        ("repo:r", "DECLARES", "e1", 1),
        ("e1", "MENTIONED_WITH", "e2", 1),
        ("e2", "INSTANCE_OF", "kb:Q1", 1),
    ])
    pat = [
        ("?repo", "DECLARES", "?e"),
        ("?e", "MENTIONED_WITH", "?x"),
        ("?x", "INSTANCE_OF", "kb:Q1"),
    ]
    for mode in (None, "static", "stats"):
        out = match_pattern(t, pat, plan=mode)
        assert out.columns == ["repo", "e", "x"]
        assert [tuple(r) for r in out.collect()] == [
            ("repo:r", "e1", "e2")]


def test_match_pattern_rescues_badly_written_order(spark):
    # written disconnected-first (the evaluator's in-loop guard would
    # raise on this order); the planner finds the connected order and
    # the query runs
    t = _triples(spark, [
        ("repo:r", "DECLARES", "e1", 1),
        ("e1", "LINKED_TO", "kb:Q1", 1),
    ])
    pat = [
        ("?e", "LINKED_TO", "?kb"),
        ("?repo", "DECLARES", "?e"),
    ]
    bad = [("?x", "LINKED_TO", "?kb"), ("?repo", "DECLARES", "?e")]
    out = match_pattern(t, pat, plan="static")
    assert sorted(map(tuple, out.collect())) == [
        ("e1", "kb:Q1", "repo:r")]
    # a genuinely disconnected pattern still raises — at plan time
    with pytest.raises(ValueError, match="cartesian"):
        match_pattern(t, bad, plan="static")
    with pytest.raises(ValueError, match="cartesian"):
        match_pattern(t, bad, plan=None)
    with pytest.raises(ValueError, match="unknown plan mode"):
        match_pattern(t, pat, plan="cbo")


# ------------------------------------------------- plan invariance


NODES = ["ent:a", "ent:b", "ent:c", "ent:d", "repo:r1", "kb:Q1"]
PREDS = ["MENTIONED_WITH", "DECLARES", "LINKED_TO", "INSTANCE_OF"]


def _random_graph(rng: random.Random):
    rows = []
    for _ in range(rng.randint(3, 15)):
        rows.append((rng.choice(NODES), rng.choice(PREDS),
                     rng.choice(NODES), rng.randint(1, 9)))
    return rows


def _random_connected_pattern(rng: random.Random):
    """2-5 required elements, each chaining on an earlier variable;
    predicates mix plain names, variables, alternations, inverses and
    closures; endpoints mix new variables, reused variables and
    constants."""
    def pred(i):
        r = rng.random()
        if r < 0.55:
            return rng.choice(PREDS)
        if r < 0.65:
            return f"?p{i}"
        if r < 0.75:
            a, b = rng.sample(PREDS, 2)
            return f"({a}|{b})"
        if r < 0.85:
            return "^" + rng.choice(PREDS)
        return rng.choice(PREDS) + "+"

    vars_ = ["?v0", "?v1"]
    pattern = [("?v0", pred(0), "?v1")]
    for i in range(1, rng.randint(2, 5)):
        anchor = rng.choice(vars_)
        r = rng.random()
        if r < 0.6:
            other = f"?v{len(vars_)}"
            vars_.append(other)
        elif r < 0.8:
            other = rng.choice(vars_)
        else:
            other = rng.choice(NODES)
        el = ((anchor, pred(i), other) if rng.random() < 0.5
              else (other, pred(i), anchor))
        pattern.append(el)
    optional = []
    if rng.random() < 0.4:
        optional.append((rng.choice(vars_), rng.choice(PREDS),
                         f"?opt{rng.randint(0, 9)}"))
    return pattern, optional


def _canon(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_plan_mode_passes_through_solutions_and_sparql(spark):
    # the knob reaches the two public front doors: solutions() and
    # the SPARQL text surface agree across all three modes on a
    # pattern written in a deliberately bad (hub-first) order
    from ner_spark.plans.kg_query import solutions
    from ner_spark.plans.sparql import sparql

    t = _triples(spark, [
        ("repo:r1", "DECLARES", "ent:a", 1),
        ("repo:r1", "DECLARES", "ent:b", 1),
        ("ent:a", "MENTIONED_WITH", "ent:b", 2),
        ("ent:b", "LINKED_TO", "kb:Q1", 1),
        ("ent:b", "INSTANCE_OF", "kb:Q1", 1),
    ])
    kw = dict(
        pattern=[("?a", "MENTIONED_WITH", "?b"),
                 ("?b", "LINKED_TO", "?kb"),
                 ("?b", "INSTANCE_OF", "kb:Q1")],
        group_by=["?kb"], aggregates=["count(*) AS n"],
        order_by=["?kb ASC"],
    )
    base = [tuple(r) for r in
            solutions(t, plan=None, **kw).collect()]
    assert base == [("kb:Q1", 1)]
    for mode in ("static", "stats"):
        assert [tuple(r) for r in
                solutions(t, plan=mode, **kw).collect()] == base
    text = """
        SELECT ?kb (COUNT(*) AS ?n) WHERE {
          ?a MENTIONED_WITH ?b . ?b LINKED_TO ?kb .
          ?b INSTANCE_OF kb:Q1
        } GROUP BY ?kb ORDER BY ?kb
    """
    for mode in (None, "static", "stats"):
        assert [tuple(r) for r in
                sparql(t, text, plan=mode).collect()] == base
    with pytest.raises(ValueError, match="unknown plan mode"):
        solutions(t, plan="greedy", **kw)


def test_pattern_catalog_costs_estimates():
    from ner_spark.plans.kg_query import pattern_catalog_costs

    stats = {"M": (1000, 100, 50), "D": (10, 10, 2),
             "L": (40, 40, 4)}
    total = 1050

    def c(el):
        return pattern_catalog_costs([el], stats, total)[0]

    assert c(("?a", "M", "?b")) == 1000.0
    # constant endpoints divide by the side's distinct count
    assert c(("x", "M", "?b")) == 10.0       # 1000/100
    assert c(("?a", "M", "y")) == 20.0       # 1000/50
    assert c(("x", "M", "y")) == 0.2         # both sides
    # inverse swaps the sides before dividing
    assert c(("?a", "^M", "x")) == 10.0      # = c(("x","M","?a"))
    # alternation sums arms; negated set costs total - named
    assert c(("?a", "(D|L)", "?b")) == 50.0
    assert c(("?a", "!M", "?b")) == 50.0     # 1050 - 1000
    # closure ×4, zero-or-one ×1, sequences ×2·segments on max mass
    assert c(("?a", "D+", "?b")) == 40.0
    assert c(("?a", "D?", "?b")) == 10.0
    assert c(("?a", "D/L", "?b")) == 160.0   # max(10,40)·2·2
    # a variable predicate reads the whole edge table; an unknown
    # predicate is the empty relation — the best seed there is
    assert c(("?a", "?p", "?b")) == 1050.0
    assert c(("?a", "NOPE", "?b")) == 0.0
    # and the ranks drive plan_pattern through the explicit-costs path
    pat = [("?a", "M", "?b"), ("?b", "D", "?c"), ("?c", "L", "kb:q")]
    costs = pattern_catalog_costs(pat, stats, total)
    order = plan_pattern(pat, costs)
    assert order == [1, 2, 0] or order == [2, 1, 0]


def test_match_pattern_explicit_cost_plan(spark):
    t = _triples(spark, [
        ("r", "D", "e", 1), ("e", "L", "k", 1), ("e", "M", "x", 1),
    ])
    pat = [("?e", "M", "?x"), ("?r", "D", "?e"), ("?e", "L", "?k")]
    base = sorted(map(tuple, match_pattern(t, pat, plan=None)
                      .collect()))
    got = sorted(map(tuple, match_pattern(t, pat, plan=[9.0, 1.0, 3.0])
                     .collect()))
    assert got == base
    with pytest.raises(ValueError, match="1 costs for 3"):
        match_pattern(t, pat, plan=[1.0])


def test_job_stats_catalog_planning(spark, tmp_path):
    from ner_spark.plans.job import KgJob
    from ner_spark.sources.fixtures import source_table

    out = str(tmp_path / "kg")
    job = KgJob(spark, out, run_id="s1")
    job.run(source_table(spark, n_rows=24))
    stats = job.stats()
    # the catalog matches the exact per-pred counts and persists
    exact = {r["pred"]: r["n"] for r in
             job.triples().groupBy("pred").count()
             .withColumnRenamed("count", "n").collect()}
    assert {p: n for p, (n, _, _) in stats.items()} == exact
    import glob
    assert glob.glob(out + "/stats/_SUCCESS")
    assert job.stats() == stats          # second call: read-back
    # catalog-planned query returns the same rows as written order
    pat = [("?a", "MENTIONED_WITH", "?b"),
           ("?b", "INSTANCE_OF", "?t"),
           ("?b", "LINKED_TO", "?kb")]
    base = sorted(map(tuple, job.query(pat, plan=None).collect()))
    assert sorted(map(tuple,
                      job.query(pat, plan="catalog").collect())) == base
    costs = job.pattern_costs(pat)
    assert len(costs) == 3 and all(c >= 0 for c in costs)
    # an edit submit auto-refreshes an EXISTING catalog, so
    # plan="catalog" never plans on stale counts after maintenance
    job.sparql_update("INSERT DATA { a:x NEW_PRED b:y }")
    assert job.stats()["NEW_PRED"][0] == 1
    # a document update refreshes it too: the catalog equals a
    # from-scratch recompute afterwards
    from ner_spark.sources.fixtures import build_source_rows
    from ner_spark.schemas import SOURCE_SCHEMA

    delta = spark.createDataFrame(build_source_rows(30)[24:],
                                  SOURCE_SCHEMA)
    job.update(delta, update_id="u1")
    assert job.stats() == job.stats(refresh=True)
    # clearing the ledger refreshes as well (NEW_PRED came from it)
    job.clear_edits()
    assert "NEW_PRED" not in job.stats()
    # the TEXT surface plans from the catalog too (parse yields the
    # pattern); results are order-invariant vs the written order
    text = ("SELECT ?a ?b ?kb WHERE { ?a MENTIONED_WITH ?b . "
            "?b INSTANCE_OF ?t . ?b LINKED_TO ?kb }")
    base_rows = sorted(map(tuple, job.sparql(text, plan=None).collect()))
    got = sorted(map(tuple, job.sparql(text, plan="catalog").collect()))
    assert got == base_rows
    row = job.sparql("ASK { ?a MENTIONED_WITH ?b }",
                     plan="catalog").first()
    assert row["ask"] is True
    # a form without a top-level BGP falls back to the static rank
    assert job.sparql("DESCRIBE repo:", plan="catalog").count() >= 0


@pytest.mark.parametrize("seed", range(6))
def test_plan_invariance_on_random_patterns(spark, seed):
    rng = random.Random(seed)
    t = _triples(spark, _random_graph(rng))
    pattern, optional = _random_connected_pattern(rng)
    base = _canon(match_pattern(t, pattern, optional=optional,
                                plan=None))
    shuffled = pattern[:]
    rng.shuffle(shuffled)
    for mode in ("static", "stats"):
        got = _canon(match_pattern(t, shuffled, optional=optional,
                                   plan=mode))
        assert got == base, (
            f"seed {seed} mode {mode}: planned evaluation of "
            f"{shuffled} diverged from written-order {pattern}")

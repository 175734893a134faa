"""Triple-pattern (BGP) matching: binding semantics, constant
filters, repeated-variable equality, and the cartesian guard.  The
contract key (``kg_pattern``) hash-checks the 3-hop pattern against
its generated DuckDB twin; the graph fuzz
(test_kg_analytics_fuzz.py) runs four pattern shapes on random
graphs."""

from __future__ import annotations

import pytest

from ner_spark.plans.kg_query import match_pattern


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, evidence_count bigint"
    )


def test_match_pattern_three_hop_binding(spark):
    t = _triples(
        spark,
        [
            ("repo:r", "DECLARES", "e1", 2),
            ("repo:r", "DECLARES", "e2", 1),
            ("e1", "MENTIONED_WITH", "e2", 3),
            ("e2", "LINKED_TO", "kb:Q1", 1),
            ("e9", "LINKED_TO", "kb:Q2", 1),  # not co-mentioned: no row
        ],
    )
    out = match_pattern(t, [
        ("?repo", "DECLARES", "?e"),
        ("?e", "MENTIONED_WITH", "?x"),
        ("?x", "LINKED_TO", "?kb"),
    ])
    assert out.columns == ["repo", "e", "x", "kb"]
    assert [tuple(r) for r in out.collect()] == [
        ("repo:r", "e1", "e2", "kb:Q1")
    ]


def test_match_pattern_variable_predicate_and_constants(spark):
    t = _triples(
        spark,
        [("a", "P", "b", 1), ("a", "Q", "b", 1), ("a", "P", "c", 1)],
    )
    out = match_pattern(t, [("a", "?p", "b")])
    assert sorted(r["p"] for r in out.collect()) == ["P", "Q"]


def test_match_pattern_repeated_var_means_equality(spark):
    t = _triples(
        spark,
        [("a", "P", "a", 1), ("a", "P", "b", 1), ("c", "Q", "c", 1)],
    )
    out = match_pattern(t, [("?x", "?p", "?x")])
    assert sorted((r["x"], r["p"]) for r in out.collect()) == [
        ("a", "P"), ("c", "Q")
    ]


def test_match_pattern_rejects_disjoint_element(spark):
    t = _triples(spark, [("a", "P", "b", 1)])
    with pytest.raises(ValueError, match="cartesian"):
        match_pattern(t, [("?x", "P", "?y"), ("?u", "P", "?v")])
    with pytest.raises(ValueError, match="empty"):
        match_pattern(t, [])


def test_match_pattern_multiplicity_is_one_per_binding(spark):
    # unique triple rows → the join chain emits each binding once
    t = _triples(
        spark,
        [("r", "D", "e1", 1), ("r", "D", "e2", 1),
         ("e1", "M", "x", 1), ("e2", "M", "x", 1)],
    )
    out = match_pattern(t, [("?r", "D", "?e"), ("?e", "M", "?x")])
    rows = [tuple(r) for r in out.collect()]
    assert sorted(rows) == [("r", "e1", "x"), ("r", "e2", "x")]


def test_match_pattern_optional_left_join_semantics(spark):
    # e2 has a KB link, e3 does not: the (r, e3) binding survives with
    # kb null — the SPARQL OPTIONAL contract a plain join would drop
    t = _triples(
        spark,
        [("r", "D", "e2", 1), ("r", "D", "e3", 1),
         ("e2", "L", "kb:Q1", 1)],
    )
    out = match_pattern(
        t, [("?r", "D", "?e")], optional=[("?e", "L", "?kb")]
    )
    rows = {r["e"]: r["kb"] for r in out.collect()}
    assert rows == {"e2": "kb:Q1", "e3": None}
    assert out.columns == ["r", "e", "kb"]


def test_match_pattern_optional_constants_stay_in_on_clause(spark):
    # the optional element's constant predicate must filter the RIGHT
    # side only: a non-matching pred leaves kb null, never drops the
    # required binding
    t = _triples(
        spark,
        [("r", "D", "e2", 1), ("e2", "OTHER", "kb:Q1", 1)],
    )
    out = match_pattern(
        t, [("?r", "D", "?e")], optional=[("?e", "L", "?kb")]
    )
    assert [tuple(r) for r in out.collect()] == [("r", "e2", None)]


def test_match_pattern_optional_disjoint_still_rejected(spark):
    t = _triples(spark, [("a", "P", "b", 1)])
    with pytest.raises(ValueError, match="cartesian"):
        match_pattern(t, [("?x", "P", "?y")],
                      optional=[("?u", "P", "?v")])


def test_parse_pattern_cli_syntax():
    from ner_spark.plans.kg_query import parse_pattern

    assert parse_pattern(
        "?repo DECLARES ?e . ?e MENTIONED_WITH ?x"
    ) == [("?repo", "DECLARES", "?e"), ("?e", "MENTIONED_WITH", "?x")]
    with pytest.raises(ValueError, match="3 whitespace"):
        parse_pattern("?a DECLARES")
    with pytest.raises(ValueError, match="empty"):
        parse_pattern(" . ")


def test_job_query_over_committed_output(spark, tmp_path):
    from ner_spark.plans.job import KgJob
    from ner_spark.sources.fixtures import source_table

    out = str(tmp_path / "kg")
    job = KgJob(spark, out, run_id="q1")
    job.run(source_table(spark, n_rows=20))
    df = job.query([("?repo", "DECLARES", "?e"),
                    ("?e", "MENTIONED_WITH", "?x")])
    assert df.columns == ["repo", "e", "x"]
    n = df.count()
    assert n > 0
    # every binding's repo really declares e (spot-check through the
    # raw triple table)
    tri = spark.read.parquet(f"{out}/materialize")
    declared = {(r["subj"], r["obj"])
                for r in tri.where("pred = 'DECLARES'").collect()}
    assert all((r["repo"], r["e"]) in declared
               for r in df.limit(50).collect())


def test_query_cli_match(spark, tmp_path, capsys, monkeypatch):
    from ner_spark.plans import job as jobmod
    from ner_spark.plans.job import KgJob
    from ner_spark.sources.fixtures import source_table

    out = str(tmp_path / "kg")
    KgJob(spark, out, run_id="q1").run(source_table(spark, n_rows=20))
    monkeypatch.setattr("sys.argv", [
        "job", "--output", out,
        "--match", "?repo DECLARES ?e . ?e MENTIONED_WITH ?x",
        "--match-optional", "?x LINKED_TO ?kb",
        "--match-limit", "5",
    ])
    jobmod.main()
    outp = capsys.readouterr().out
    assert outp.splitlines()[0] == "repo\te\tx\tkb"
    assert "stage=query rows=" in outp


def test_parse_filter_grammar():
    from ner_spark.plans.kg_query import parse_filter

    assert parse_filter("?e != ?x") == ("cmp", "?e", "!=", ("var", "?x"))
    assert parse_filter('?kb = "kb:Q42"') == (
        "cmp", "?kb", "=", ("const", "kb:Q42"))
    assert parse_filter("?e < bare_const") == (
        "cmp", "?e", "<", ("const", "bare_const"))
    assert parse_filter('regex(?kb, "[0-9]$")') == (
        "regex", "?kb", "[0-9]$")
    assert parse_filter(' strstarts( ?e , "ent:" ) ') == (
        "strstarts", "?e", "ent:")
    # escaped quote inside the literal
    assert parse_filter(r'contains(?x, "a\"b")') == ("contains", "?x", 'a"b')
    # boolean expression forms (shared grammar with the text parser)
    assert parse_filter('!bound(?k) || strstarts(?k, "kb:")') == (
        "or", [("not", ("bound", "?k")), ("strstarts", "?k", "kb:")])
    assert parse_filter('?p IN ("A", "B") && ?a != ?b') == (
        "and", [("in", "?p", ["A", "B"]),
                ("cmp", "?a", "!=", ("var", "?b"))])
    assert parse_filter('?p NOT IN ("A")') == ("notin", "?p", ["A"])
    # precedence: && binds tighter than ||
    assert parse_filter('?a = "x" || ?b = "y" && ?c = "z"') == (
        "or", [("cmp", "?a", "=", ("const", "x")),
               ("and", [("cmp", "?b", "=", ("const", "y")),
                        ("cmp", "?c", "=", ("const", "z"))])])
    with pytest.raises(ValueError, match="unparseable FILTER"):
        parse_filter("?a ~ ?b")
    with pytest.raises(ValueError, match="unparseable FILTER"):
        parse_filter("lcase(?a) = ?b")
    with pytest.raises(ValueError, match="unparseable FILTER"):
        parse_filter('?a IN (?b)')
    with pytest.raises(ValueError, match="unparseable FILTER"):
        parse_filter('?a = "x" || ')


def test_match_pattern_filters(spark):
    t = _triples(
        spark,
        [
            ("a", "P", "a", 1), ("a", "P", "b", 1), ("a", "P", "cc", 1),
            ("b", "P", "cc", 1),
        ],
    )
    # var-var comparison drops the self-pair
    out = match_pattern(t, [("?x", "P", "?y")], filters=["?x != ?y"])
    assert sorted((r["x"], r["y"]) for r in out.collect()) == [
        ("a", "b"), ("a", "cc"), ("b", "cc")
    ]
    # function filters, string and pre-parsed forms mixed
    out = match_pattern(
        t, [("?x", "P", "?y")],
        filters=['regex(?y, "^c")', ("cmp", "?x", "=", ("const", "a"))],
    )
    assert [tuple(r) for r in out.collect()] == [("a", "cc")]
    with pytest.raises(ValueError, match="unbound variable"):
        match_pattern(t, [("?x", "P", "?y")], filters=["?z = ?x"])


def test_match_pattern_filter_eliminates_null_optional(spark):
    # SPARQL error-eliminates-row: a filter over an OPTIONAL variable
    # drops bindings where the optional element did not match
    t = _triples(
        spark,
        [
            ("a", "P", "b", 1), ("a", "P", "c", 1),
            ("b", "LINKED_TO", "kb:Q1", 1),
        ],
    )
    base = match_pattern(t, [("a", "P", "?x")],
                         optional=[("?x", "LINKED_TO", "?kb")])
    assert base.count() == 2  # c survives with kb null
    out = match_pattern(t, [("a", "P", "?x")],
                        optional=[("?x", "LINKED_TO", "?kb")],
                        filters=['strstarts(?kb, "kb:")'])
    assert [tuple(r) for r in out.collect()] == [("b", "kb:Q1")]


def test_match_pattern_boolean_filters(spark):
    # SPARQL's error algebra rides SQL null logic: TRUE || error =
    # TRUE keeps a row whose other arm is a null comparison, !BOUND
    # keeps the unmatched-OPTIONAL row (negation-as-failure), and a
    # null operand under && eliminates unless another conjunct is
    # FALSE first
    t = _triples(
        spark,
        [
            ("a", "P", "b", 1), ("a", "P", "c", 1),
            ("b", "LINKED_TO", "kb:Q1", 1),
        ],
    )
    base = ([("a", "P", "?x")], [("?x", "LINKED_TO", "?kb")])
    out = match_pattern(t, base[0], optional=base[1],
                        filters=['!bound(?kb) || strstarts(?kb, "kb:")'])
    assert sorted((r["x"], r["kb"]) for r in out.collect()) == [
        ("b", "kb:Q1"), ("c", None)]
    out = match_pattern(t, base[0], optional=base[1],
                        filters=['bound(?kb)'])
    assert [tuple(r) for r in out.collect()] == [("b", "kb:Q1")]
    # TRUE || error: the ?x arm rescues the null-?kb row
    out = match_pattern(t, base[0], optional=base[1],
                        filters=['?kb = "kb:Q1" || ?x = "c"'])
    assert sorted(r["x"] for r in out.collect()) == ["b", "c"]
    # IN / NOT IN membership; null lhs eliminates (error)
    out = match_pattern(t, base[0], optional=base[1],
                        filters=['?kb NOT IN ("zzz")'])
    assert [r["x"] for r in out.collect()] == ["b"]
    out = match_pattern(t, [("?a", "?p", "?b")],
                        filters=['?p IN ("LINKED_TO")'])
    assert [tuple(r) for r in out.collect()] == [("b", "LINKED_TO", "kb:Q1")]
    # unbound variables raise anywhere in the tree
    with pytest.raises(ValueError, match="unbound variable"):
        match_pattern(t, [("?a", "P", "?b")],
                      filters=['?a = "a" || bound(?zz)'])


def test_query_cli_match_filter(spark, tmp_path, capsys, monkeypatch):
    from ner_spark.plans import job as jobmod
    from ner_spark.plans.job import KgJob
    from ner_spark.sources.fixtures import source_table

    out = str(tmp_path / "kg")
    KgJob(spark, out, run_id="q1").run(source_table(spark, n_rows=20))
    monkeypatch.setattr("sys.argv", [
        "job", "--output", out,
        "--match", "?repo DECLARES ?e . ?e MENTIONED_WITH ?x",
        "--match-filter", "?e != ?x",
        "--match-filter", 'strstarts(?x, "ent:p")',
        "--match-limit", "5",
    ])
    jobmod.main()
    outp = capsys.readouterr().out
    assert outp.splitlines()[0] == "repo\te\tx"
    body = [ln.split("\t") for ln in outp.splitlines()[1:]
            if ln.startswith("repo:")]
    assert body and all(x.startswith("ent:p") and e != x
                        for _, e, x in body)


def test_construct_template_projection_and_set_semantics(spark):
    # two repos declare e1 → the CO_DECLARED template instantiates
    # twice per unordered binding but the constructed graph is a SET:
    # one row, evidence_count carries the collapsed multiplicity
    from ner_spark.plans.kg_query import construct

    t = _triples(
        spark,
        [
            ("repo:r1", "DECLARES", "e1", 1),
            ("repo:r2", "DECLARES", "e1", 1),
            ("e1", "MENTIONED_WITH", "e2", 3),
            ("e2", "LINKED_TO", "kb:Q1", 1),
        ],
    )
    out = construct(
        t,
        pattern=[("?r", "DECLARES", "?e"),
                 ("?e", "MENTIONED_WITH", "?x"),
                 ("?x", "LINKED_TO", "?kb")],
        template=[("?r", "MENTIONS_KB", "?kb")],
    )
    assert out.columns == ["subj", "pred", "obj", "evidence_count"]
    assert sorted(tuple(r) for r in out.collect()) == [
        ("repo:r1", "MENTIONS_KB", "kb:Q1", 1),
        ("repo:r2", "MENTIONS_KB", "kb:Q1", 1),
    ]


def test_construct_constant_terms_and_multi_element_template(spark):
    from ner_spark.plans.kg_query import construct

    t = _triples(spark, [("a", "P", "b", 1), ("a", "P", "c", 1)])
    out = construct(
        t, [("?x", "P", "?y")],
        template=[("?x", "HAS_OUT", "?y"),
                  ("?x", "rdf:type", "Subject")],
    )
    assert sorted(tuple(r) for r in out.collect()) == [
        ("a", "HAS_OUT", "b", 1),
        ("a", "HAS_OUT", "c", 1),
        ("a", "rdf:type", "Subject", 2),  # collapsed: 2 bindings
    ]


def test_construct_drops_null_optional_instantiations(spark):
    # SPARQL skips ill-formed template instantiations: a template
    # referencing an unmatched OPTIONAL variable drops that binding's
    # row but keeps the others
    from ner_spark.plans.kg_query import construct

    t = _triples(
        spark,
        [
            ("a", "P", "b", 1), ("a", "P", "c", 1),
            ("b", "LINKED_TO", "kb:Q1", 1),
        ],
    )
    out = construct(
        t, [("a", "P", "?x")],
        template=[("?x", "SEEN_AT", "?kb"), ("a", "TOUCHES", "?x")],
        optional=[("?x", "LINKED_TO", "?kb")],
    )
    assert sorted(tuple(r) for r in out.collect()) == [
        ("a", "TOUCHES", "b", 1),
        ("a", "TOUCHES", "c", 1),
        ("b", "SEEN_AT", "kb:Q1", 1),
    ]


def test_construct_validates_template(spark):
    from ner_spark.plans.kg_query import construct

    t = _triples(spark, [("a", "P", "b", 1)])
    with pytest.raises(ValueError, match="unbound"):
        construct(t, [("?x", "P", "?y")],
                  template=[("?x", "P2", "?nope")])
    with pytest.raises(ValueError, match="empty CONSTRUCT"):
        construct(t, [("?x", "P", "?y")], template=[])
    with pytest.raises(ValueError, match="not a triple"):
        construct(t, [("?x", "P", "?y")], template=[("?x", "P")])


def test_construct_respects_filters(spark):
    from ner_spark.plans.kg_query import construct

    t = _triples(spark, [("a", "P", "b", 1), ("a", "P", "a", 1)])
    out = construct(t, [("?x", "P", "?y")],
                    template=[("?y", "REV", "?x")],
                    filters=["?x != ?y"])
    assert [tuple(r) for r in out.collect()] == [("b", "REV", "a", 1)]


def test_path_closure_chain_and_set_semantics(spark):
    from ner_spark.plans.kg_query import path_closure

    # duplicate triple rows must not multiply closure pairs (SET
    # semantics — SPARQL paths never multiply bindings)
    t = _triples(
        spark,
        [("a", "P", "b", 1), ("a", "P", "b", 1), ("b", "P", "c", 1),
         ("c", "P", "d", 1), ("x", "Q", "y", 1)],
    )
    out = path_closure(t, "P")
    assert sorted(tuple(r) for r in out.collect()) == [
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
    ]


def test_path_closure_cycle_terminates(spark):
    from ner_spark.plans.kg_query import path_closure

    t = _triples(
        spark,
        [("a", "P", "b", 1), ("b", "P", "c", 1), ("c", "P", "a", 1)],
    )
    out = path_closure(t, "P")
    # full 3-cycle: every ordered pair incl. self-reachability
    assert out.count() == 9


def test_match_pattern_path_plus_and_star(spark):
    t = _triples(
        spark,
        [("a", "P", "b", 1), ("b", "P", "c", 1), ("x", "Q", "y", 1)],
    )
    out = match_pattern(t, [("?s", "P+", "?o")])
    assert sorted(tuple(r) for r in out.collect()) == [
        ("a", "b"), ("a", "c"), ("b", "c")
    ]
    # star adds the zero-length pairs for EVERY graph node (SPARQL's
    # zero-length path matches each term in the graph)
    out = match_pattern(t, [("?s", "P*", "?o")], filters=["?s = ?o"])
    assert sorted(r["s"] for r in out.collect()) == [
        "a", "b", "c", "x", "y"
    ]


def test_match_pattern_path_seeded_endpoints(spark):
    # a constant endpoint turns the closure into a seeded BFS — same
    # answers as filtering the full closure
    t = _triples(
        spark,
        [("a", "P", "b", 1), ("b", "P", "c", 1), ("c", "P", "d", 1),
         ("z", "P", "a", 1)],
    )
    out = match_pattern(t, [("a", "P+", "?o")])
    assert sorted(r["o"] for r in out.collect()) == ["b", "c", "d"]
    out = match_pattern(t, [("?s", "P+", "c")])
    assert sorted(r["s"] for r in out.collect()) == ["a", "b", "z"]


def test_match_pattern_path_max_hops_bounds_length(spark):
    t = _triples(
        spark,
        [("a", "P", "b", 1), ("b", "P", "c", 1), ("c", "P", "d", 1)],
    )
    out = match_pattern(t, [("?s", "P+", "?o")], path_max_hops=2)
    assert sorted(tuple(r) for r in out.collect()) == [
        ("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")
    ]


def test_match_pattern_path_chains_with_plain_elements(spark):
    t = _triples(
        spark,
        [("r", "D", "e1", 1), ("e1", "M", "e2", 1), ("e2", "M", "e3", 1)],
    )
    out = match_pattern(t, [("?r", "D", "?a"), ("?a", "M+", "?b")])
    assert sorted(tuple(r) for r in out.collect()) == [
        ("r", "e1", "e2"), ("r", "e1", "e3")
    ]


def test_match_pattern_negation_drops_matching_bindings(spark):
    t = _triples(
        spark,
        [("a", "P", "b", 1), ("b", "P", "c", 1), ("c", "P", "d", 1),
         ("b", "L", "kb:1", 1)],
    )
    out = match_pattern(t, [("?s", "P", "?o")],
                        negation=[[("?o", "L", "?kb")]])
    assert sorted(tuple(r) for r in out.collect()) == [
        ("b", "c"), ("c", "d")
    ]
    # string groups parse through parse_pattern
    out = match_pattern(t, [("?s", "P", "?o")], negation=["?o L ?kb"])
    assert out.count() == 2


def test_match_pattern_negation_null_optional_survives(spark):
    # an unmatched OPTIONAL variable is null; null never matches the
    # negation group (anti-join semantics = the oracle's NOT EXISTS
    # with a null correlation), so the binding survives
    t = _triples(
        spark,
        [("a", "P", "b", 1), ("b", "P", "c", 1),
         ("c", "L", "kb:1", 1), ("kb:1", "D", "z", 1)],
    )
    out = match_pattern(
        t, [("?s", "P", "?o")],
        optional=[("?o", "L", "?kb")],
        negation=[[("?kb", "D", "?z")]],
    )
    rows = {(r["s"], r["o"]): r["kb"] for r in out.collect()}
    # (b, c) bound kb:1 which HAS a D edge → dropped;
    # (a, b) left kb null → survives
    assert rows == {("a", "b"): None}


def test_match_pattern_negation_multi_element_group(spark):
    t = _triples(
        spark,
        [("a", "P", "b", 1), ("a", "P", "c", 1),
         ("b", "L", "k1", 1), ("k1", "D", "z", 1),
         ("c", "L", "k2", 1)],
    )
    # group: ?o L ?k . ?k D ?z — only b's chain completes
    out = match_pattern(
        t, [("a", "P", "?o")],
        negation=[[("?o", "L", "?k"), ("?k", "D", "?z")]],
    )
    assert [r["o"] for r in out.collect()] == ["c"]


def test_match_pattern_negation_guards(spark):
    t = _triples(spark, [("a", "P", "b", 1)])
    with pytest.raises(ValueError, match="whole-graph ASK"):
        match_pattern(t, [("?x", "P", "?y")],
                      negation=[[("?u", "Q", "?v")]])
    with pytest.raises(ValueError, match="shares no variable"):
        match_pattern(t, [("?x", "P", "?y")],
                      negation=[[("?x", "Q", "?u"), ("?w", "R", "?z")]])


def test_path_closure_in_negation_group(spark):
    # negate transitive reachability: keep pairs whose object cannot
    # reach 'd' through P+
    t = _triples(
        spark,
        [("a", "P", "b", 1), ("b", "P", "d", 1), ("x", "P", "y", 1)],
    )
    out = match_pattern(t, [("?s", "P", "?o")],
                        negation=[[("?o", "P+", "d")]])
    assert sorted(tuple(r) for r in out.collect()) == [
        ("b", "d"), ("x", "y")
    ]


def test_query_cli_match_negation_and_path(spark, tmp_path, capsys,
                                           monkeypatch):
    from ner_spark.plans import job as jobmod
    from ner_spark.plans.job import KgJob
    from ner_spark.sources.fixtures import source_table

    out = str(tmp_path / "kg")
    KgJob(spark, out, run_id="q1").run(source_table(spark, n_rows=20))
    monkeypatch.setattr("sys.argv", [
        "job", "--output", out,
        "--match", "?repo DECLARES ?e . ?e MENTIONED_WITH+ ?x",
        "--match-negation", "?x LINKED_TO ?kb",
        "--path-max-hops", "2",
        "--match-limit", "5",
    ])
    jobmod.main()
    outp = capsys.readouterr().out
    assert outp.splitlines()[0] == "repo\te\tx"
    assert "stage=query rows=" in outp


# --------------------------------------------- solution modifiers


def test_parse_aggregate_grammar():
    from ner_spark.plans.kg_query import parse_aggregate

    assert parse_aggregate("count(*) AS n") == ("count", "*", "n")
    assert parse_aggregate("COUNT_DISTINCT(?e) as k") == \
        ("count_distinct", "?e", "k")
    assert parse_aggregate("min(?kb) AS lo") == ("min", "?kb", "lo")
    assert parse_aggregate("group_concat( ?x ) AS xs") == \
        ("group_concat", "?x", "xs")
    assert parse_aggregate("sum(?len) AS s") == ("sum", "?len", "s")
    assert parse_aggregate("AVG(?len) AS a") == ("avg", "?len", "a")
    # parameterized GROUP_CONCAT → 4-tuple carrying the separator
    assert parse_aggregate('group_concat(?x; separator="|") AS xs') \
        == ("group_concat", "?x", "xs", "|")
    assert parse_aggregate(
        'group_concat(?x; SEPARATOR=", \\"q\\"") AS xs') \
        == ("group_concat", "?x", "xs", ', "q"')
    with pytest.raises(ValueError, match="only applies to"):
        parse_aggregate('sum(?x; separator=",") AS s')
    with pytest.raises(ValueError):
        parse_aggregate("min(*) AS m")        # only count(*) exists
    with pytest.raises(ValueError):
        parse_aggregate("count(?e)")          # alias required


def test_parse_order_grammar():
    from ner_spark.plans.kg_query import parse_order

    assert parse_order("?repo") == ("repo", True)
    assert parse_order("n DESC") == ("n", False)
    assert parse_order("?e asc") == ("e", True)
    with pytest.raises(ValueError):
        parse_order("n DESCENDING")
    with pytest.raises(ValueError):
        parse_order("?a ?b")


def _agg_graph(spark):
    return _triples(spark, [
        ("repo:a", "DECLARES", "e1", 1),
        ("repo:a", "DECLARES", "e2", 1),
        ("repo:a", "DECLARES", "e3", 1),
        ("repo:b", "DECLARES", "e1", 1),
        ("repo:b", "DECLARES", "e2", 1),
        ("repo:c", "DECLARES", "e9", 1),
        ("e1", "LINKED_TO", "kb:Q1", 1),
        ("e2", "LINKED_TO", "kb:Q2", 1),
    ])


def test_solutions_group_by_aggregates(spark):
    from ner_spark.plans.kg_query import solutions

    out = solutions(
        _agg_graph(spark),
        [("?r", "DECLARES", "?e")],
        group_by=["?r"],
        aggregates=["count(*) AS n", "count_distinct(?e) AS k",
                    "min(?e) AS lo", "max(?e) AS hi",
                    "group_concat(?e) AS es"],
    )
    assert out.columns == ["r", "n", "k", "lo", "hi", "es"]
    rows = {r["r"]: r for r in out.collect()}
    assert rows["repo:a"]["n"] == 3 and rows["repo:a"]["k"] == 3
    assert (rows["repo:a"]["lo"], rows["repo:a"]["hi"]) == ("e1", "e3")
    assert rows["repo:a"]["es"] == "e1,e2,e3"   # sorted distinct concat
    assert rows["repo:b"]["es"] == "e1,e2"
    assert rows["repo:c"]["n"] == 1


def test_solutions_numeric_aggregates_and_separator(spark):
    import duckdb

    import __spark_entry__ as em
    from ner_spark.plans.kg_query import solutions
    from tests.oracle_compare import assert_df_matches_duckdb

    # numeric-string terms via BIND(STRLEN); one junk term and one
    # unmatched OPTIONAL var pin the TRY_CAST-skips rule; the exact
    # decimal sum surfaces as DOUBLE, avg is sum/cast-count
    t = _triples(spark, [
        ("r", "D", "ee", 1), ("r", "D", "eeee", 1),
        ("r2", "D", "e", 1), ("r2", "V", "junk", 1),
    ])
    kw = dict(
        pattern=[("?r", "?p", "?e")],
        binds=['IF(?p = "D", ?len0, ?e) AS ?v'],
        optional=[("?e", "L", "?k")],
        group_by=["?r"],
        aggregates=["sum(?v) AS s", "avg(?v) AS a",
                    'group_concat(?e; separator="|") AS es',
                    "sum(?k) AS sk", "avg(?k) AS ak"],
        order_by=["?r ASC"],
    )
    out = solutions(
        t, kw["pattern"],
        binds=['STRLEN(?e) AS ?len0'] + kw["binds"],
        optional=kw["optional"], group_by=kw["group_by"],
        aggregates=kw["aggregates"], order_by=kw["order_by"])
    rows = {r["r"]: r for r in out.collect()}
    # r: lengths 2 + 4; r2: length 1 plus the junk term (skipped)
    assert rows["r"]["s"] == 6.0 and rows["r"]["a"] == 3.0
    assert rows["r2"]["s"] == 1.0 and rows["r2"]["a"] == 1.0
    assert rows["r"]["es"] == "ee|eeee"
    # all-null aggregate group (no L edges): sum/avg null, concat ""
    assert rows["r"]["sk"] is None and rows["r"]["ak"] is None
    # HAVING over a SUM/AVG alias takes decimal thresholds; a
    # non-numeric alias still raises
    from ner_spark.plans.kg_query import parse_having

    assert parse_having("a > 2.5") == ("a", ">", 2.5)
    assert parse_having("?n >= 3") == ("n", ">=", 3)
    filtered = solutions(
        t, kw["pattern"],
        binds=['STRLEN(?e) AS ?len0'] + kw["binds"],
        optional=kw["optional"], group_by=kw["group_by"],
        aggregates=["avg(?v) AS a", "min(?e) AS lo"],
        having=["a > 2.5"])
    assert [r["r"] for r in filtered.collect()] == ["r"]
    with pytest.raises(ValueError, match="numeric aggregate alias"):
        solutions(t, kw["pattern"], group_by=["?r"],
                  aggregates=["min(?e) AS lo"], having=["lo > 2"])
    # generated DuckDB twin computes the identical rows (incl. the
    # all-null-group coalesce on group_concat)
    sql = em._kg_solutions_oracle(
        kw["pattern"],
        binds=['STRLEN(?e) AS ?len0'] + kw["binds"],
        optional=kw["optional"], group_by=kw["group_by"],
        aggregates=kw["aggregates"] + [
            'group_concat(?k; separator="+") AS ks'],
        order_by=kw["order_by"],
        kg_sql="SELECT * FROM (VALUES ('r','D','ee',1), "
               "('r','D','eeee',1), ('r2','D','e',1), "
               "('r2','V','junk',1)) "
               "AS t(subj, pred, obj, evidence_count)",
    )
    out2 = solutions(
        t, kw["pattern"],
        binds=['STRLEN(?e) AS ?len0'] + kw["binds"],
        optional=kw["optional"], group_by=kw["group_by"],
        aggregates=kw["aggregates"] + [
            'group_concat(?k; separator="+") AS ks'],
        order_by=kw["order_by"])
    assert out2.collect()[0]["ks"] == ""   # all-null group → ""
    assert_df_matches_duckdb(out2, duckdb.connect(), sql,
                             "numagg_twin")


def test_solutions_count_star_vs_count_var_on_null_optional(spark):
    # count(?kb) skips unbound (null) OPTIONAL bindings; count(*)
    # counts the rows — the SPARQL distinction, same as SQL's
    from ner_spark.plans.kg_query import solutions

    out = solutions(
        _agg_graph(spark),
        [("?r", "DECLARES", "?e")],
        optional=[("?e", "LINKED_TO", "?kb")],
        group_by=["?r"],
        aggregates=["count(*) AS rows_n", "count(?kb) AS kb_n"],
    )
    rows = {r["r"]: r for r in out.collect()}
    assert (rows["repo:a"]["rows_n"], rows["repo:a"]["kb_n"]) == (3, 2)
    assert (rows["repo:c"]["rows_n"], rows["repo:c"]["kb_n"]) == (1, 0)


def test_solutions_global_aggregate_one_row(spark):
    from ner_spark.plans.kg_query import solutions

    out = solutions(
        _agg_graph(spark),
        [("?r", "DECLARES", "?e")],
        aggregates=["count(*) AS n", "count_distinct(?r) AS repos"],
    )
    assert [tuple(r) for r in out.collect()] == [(6, 3)]


def test_solutions_group_by_without_aggregates_is_distinct_keys(spark):
    from ner_spark.plans.kg_query import solutions

    out = solutions(
        _agg_graph(spark),
        [("?r", "DECLARES", "?e")],
        group_by=["?r"],
    )
    assert out.columns == ["r"]
    assert sorted(r["r"] for r in out.collect()) == \
        ["repo:a", "repo:b", "repo:c"]


def test_solutions_select_distinct_projection(spark):
    from ner_spark.plans.kg_query import solutions

    out = solutions(
        _agg_graph(spark),
        [("?r", "DECLARES", "?e"), ("?e", "LINKED_TO", "?kb")],
        select=["?r"],
        distinct=True,
    )
    assert out.columns == ["r"]
    assert sorted(r["r"] for r in out.collect()) == ["repo:a", "repo:b"]


def test_solutions_order_limit_topk(spark):
    from ner_spark.plans.kg_query import solutions

    out = solutions(
        _agg_graph(spark),
        [("?r", "DECLARES", "?e")],
        group_by=["?r"],
        aggregates=["count(*) AS n"],
        order_by=["n DESC", "?r ASC"],
        limit=2,
    )
    assert [tuple(r) for r in out.collect()] == \
        [("repo:a", 3), ("repo:b", 2)]


def test_solutions_order_limit_plan_is_take_ordered(spark):
    # orderBy().limit(k) must compile to TakeOrderedAndProject —
    # never a global sort — same shape the top_customers audit pins
    from ner_spark.plans.kg_query import solutions

    out = solutions(
        _agg_graph(spark),
        [("?r", "DECLARES", "?e")],
        group_by=["?r"],
        aggregates=["count(*) AS n"],
        order_by=["n DESC", "?r ASC"],
        limit=2,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Sort [" not in plan.replace("TakeOrderedAndProject", "")


def test_solutions_validation_errors(spark):
    from ner_spark.plans.kg_query import solutions

    g = _agg_graph(spark)
    pat = [("?r", "DECLARES", "?e")]
    with pytest.raises(ValueError, match="unbound variable"):
        solutions(g, pat, group_by=["?zzz"])
    with pytest.raises(ValueError, match="unbound variable"):
        solutions(g, pat, group_by=["?r"],
                  aggregates=["count(?zzz) AS n"])
    with pytest.raises(ValueError, match="collides"):
        solutions(g, pat, group_by=["?r"],
                  aggregates=["count(*) AS r"])
    with pytest.raises(ValueError, match="SELECT references"):
        solutions(g, pat, group_by=["?r"],
                  aggregates=["count(*) AS n"], select=["?e"])
    with pytest.raises(ValueError, match="ORDER BY references"):
        solutions(g, pat, order_by=["nope DESC"])
    with pytest.raises(ValueError, match="non-negative"):
        solutions(g, pat, limit=-1)


def test_solutions_matches_duckdb_twin(spark):
    # the full modifier stack against a hand-rolled DuckDB twin on
    # the same literal graph (the contract key covers the generated
    # oracle; this pins the semantics on a graph with nulls)
    import duckdb

    from ner_spark.plans.kg_query import solutions
    from tests.oracle_compare import assert_df_matches_duckdb

    out = solutions(
        _agg_graph(spark),
        [("?r", "DECLARES", "?e")],
        optional=[("?e", "LINKED_TO", "?kb")],
        group_by=["?r"],
        aggregates=["count(*) AS n", "count(?kb) AS kb_n",
                    "count_distinct(?e) AS k", "max(?kb) AS hi_kb",
                    "group_concat(?e) AS es"],
        order_by=["n DESC", "?r ASC"],
        limit=2,
    )
    out = out.fillna({"hi_kb": ""})
    con = duckdb.connect()
    sql = """
WITH t(subj, pred, obj) AS (VALUES
  ('repo:a','DECLARES','e1'), ('repo:a','DECLARES','e2'),
  ('repo:a','DECLARES','e3'), ('repo:b','DECLARES','e1'),
  ('repo:b','DECLARES','e2'), ('repo:c','DECLARES','e9'),
  ('e1','LINKED_TO','kb:Q1'), ('e2','LINKED_TO','kb:Q2')),
b AS (
  SELECT t0.subj AS r, t0.obj AS e, t1.obj AS kb
  FROM t t0
  LEFT JOIN t t1 ON t1.pred = 'LINKED_TO' AND t1.subj = t0.obj
  WHERE t0.pred = 'DECLARES')
SELECT r, count(*) AS n, count(kb) AS kb_n, count(DISTINCT e) AS k,
       coalesce(max(kb), '') AS hi_kb,
       array_to_string(list_sort(list(DISTINCT e)), ',') AS es
FROM b GROUP BY r ORDER BY n DESC, r ASC LIMIT 2
"""
    assert_df_matches_duckdb(out, con, sql, "solutions_twin")


def test_query_cli_match_modifiers(spark, tmp_path, capsys, monkeypatch):
    from ner_spark.plans import job as jobmod
    from ner_spark.plans.job import KgJob
    from ner_spark.sources.fixtures import source_table

    out = str(tmp_path / "kg")
    KgJob(spark, out, run_id="q2").run(source_table(spark, n_rows=20))
    monkeypatch.setattr("sys.argv", [
        "job", "--output", out,
        "--match", "?repo DECLARES ?e",
        "--match-group-by", "?repo",
        "--match-agg", "count_distinct(?e) AS n",
        "--match-order-by", "n DESC",
        "--match-order-by", "?repo ASC",
        "--match-top", "3",
    ])
    jobmod.main()
    outp = capsys.readouterr().out
    assert outp.splitlines()[0] == "repo\tn"
    assert "stage=query rows=3 " in outp


# ------------------------------------------------------------- UNION


def _union_graph(spark):
    return _triples(spark, [
        ("repo:a", "DECLARES", "e1", 1),
        ("repo:b", "DECLARES", "e2", 1),
        ("e1", "MENTIONED_WITH", "e2", 1),
        ("e1", "LINKED_TO", "kb:Q1", 1),
        ("e2", "LINKED_TO", "kb:Q2", 1),
        ("e3", "LINKED_TO", "kb:Q3", 1),  # neither declared nor mentioned
    ])


def test_match_union_branch_unbound_is_null(spark):
    # SPARQL UNION: a variable a branch does not bind is unbound
    # (null) in that branch's rows; the schema is the union of the
    # branch variable sets in first-appearance order
    from ner_spark.plans.kg_query import match_union

    out = match_union(_union_graph(spark), [
        [("?r", "DECLARES", "?e"), ("?e", "LINKED_TO", "?kb")],
        [("?e", "MENTIONED_WITH", "?x"), ("?x", "LINKED_TO", "?kb")],
    ])
    assert out.columns == ["r", "e", "kb", "x"]
    rows = sorted(((r["r"], r["e"], r["kb"], r["x"])
                   for r in out.collect()),
                  key=lambda t: tuple(v or "" for v in t))
    assert rows == [
        (None, "e1", "kb:Q2", "e2"),          # branch 2: ?r unbound
        ("repo:a", "e1", "kb:Q1", None),      # branch 1: ?x unbound
        ("repo:b", "e2", "kb:Q2", None),
    ]


def test_match_union_bag_semantics(spark):
    # UNION is multiset union: a binding produced by both branches
    # appears twice (SPARQL algebra; DISTINCT is a separate modifier)
    from ner_spark.plans.kg_query import match_union

    t = _triples(spark, [("a", "P", "b", 1), ("a", "Q", "b", 1)])
    out = match_union(t, [[("?x", "P", "?y")], [("?x", "?p", "?y")]])
    rows = [(r["x"], r["y"]) for r in out.collect()]
    assert sorted(rows) == [("a", "b"), ("a", "b"), ("a", "b")]


def test_match_union_outer_filter_eliminates_branch_unbound(spark):
    # an outer FILTER on a variable one branch never binds errors on
    # that branch's rows (null operand) and eliminates them — SPARQL's
    # error-eliminates-row across the union
    from ner_spark.plans.kg_query import match_union

    out = match_union(_union_graph(spark), [
        [("?r", "DECLARES", "?e"), ("?e", "LINKED_TO", "?kb")],
        [("?e", "MENTIONED_WITH", "?x"), ("?x", "LINKED_TO", "?kb")],
    ], filters=['strstarts(?r, "repo:")'])
    rows = sorted((r["r"], r["e"]) for r in out.collect())
    assert rows == [("repo:a", "e1"), ("repo:b", "e2")]


def test_match_union_branch_local_kwargs(spark):
    # group dicts carry branch-local OPTIONAL / FILTER / negation;
    # each branch sees only its own modifiers
    from ner_spark.plans.kg_query import match_union

    out = match_union(_union_graph(spark), [
        {"pattern": [("?r", "DECLARES", "?e")],
         "filters": ['?e != "e2"'],
         "optional": [("?e", "LINKED_TO", "?kb")]},
        {"pattern": [("?e", "LINKED_TO", "?kb")],
         "negation": [[("?z", "MENTIONED_WITH", "?e")]]},
    ])
    assert out.columns == ["r", "e", "kb"]
    rows = sorted(((r["r"], r["e"], r["kb"]) for r in out.collect()),
                  key=lambda t: tuple(v or "" for v in t))
    assert rows == [
        (None, "e1", "kb:Q1"),   # e2 excluded: e1 MENTIONED_WITH e2
        (None, "e3", "kb:Q3"),
        ("repo:a", "e1", "kb:Q1"),
    ]


def test_match_union_guards(spark):
    from ner_spark.plans.kg_query import match_union, solutions

    t = _union_graph(spark)
    with pytest.raises(ValueError, match="at least two"):
        match_union(t, [[("?a", "P", "?b")]])
    with pytest.raises(ValueError, match="unknown keys"):
        match_union(t, [{"pattern": [("?a", "P", "?b")], "limit": 3},
                        [("?a", "P", "?b")]])
    with pytest.raises(ValueError, match="EITHER"):
        solutions(t, [("?a", "P", "?b")],
                  union=[[("?a", "P", "?b")], [("?a", "Q", "?b")]])


def test_solutions_over_union(spark):
    # modifiers apply to the union'd binding set: count per entity
    # across both relationship kinds, count(?r) skipping the rows of
    # the branch that never binds ?r
    from ner_spark.plans.kg_query import solutions

    out = solutions(
        _union_graph(spark),
        union=[
            [("?r", "DECLARES", "?e"), ("?e", "LINKED_TO", "?kb")],
            [("?e", "MENTIONED_WITH", "?x"), ("?x", "LINKED_TO", "?kb")],
        ],
        group_by=["?e"],
        aggregates=["count(*) AS n", "count(?r) AS declared_n"],
        order_by=["n DESC", "?e ASC"],
    )
    assert [tuple(r) for r in out.collect()] == [
        ("e1", 2, 1), ("e2", 1, 1),
    ]


def test_match_union_matches_duckdb_twin(spark):
    # hand-rolled DuckDB twin on the literal graph (the contract key
    # covers the generated _kg_union_oracle; this pins the semantics)
    import duckdb

    from ner_spark.plans.kg_query import match_union
    from tests.oracle_compare import assert_df_matches_duckdb

    out = match_union(_union_graph(spark), [
        [("?r", "DECLARES", "?e"), ("?e", "LINKED_TO", "?kb")],
        [("?e", "MENTIONED_WITH", "?x"), ("?x", "LINKED_TO", "?kb")],
    ]).fillna({"r": "", "x": ""})
    con = duckdb.connect()
    sql = """
WITH t(subj, pred, obj) AS (VALUES
  ('repo:a','DECLARES','e1'), ('repo:b','DECLARES','e2'),
  ('e1','MENTIONED_WITH','e2'),
  ('e1','LINKED_TO','kb:Q1'), ('e2','LINKED_TO','kb:Q2'),
  ('e3','LINKED_TO','kb:Q3'))
SELECT coalesce(r, '') AS r, e, kb, coalesce(x, '') AS x FROM (
  SELECT t0.subj AS r, t0.obj AS e, t1.obj AS kb, NULL AS x
  FROM t t0 JOIN t t1 ON t1.pred = 'LINKED_TO' AND t1.subj = t0.obj
  WHERE t0.pred = 'DECLARES'
  UNION ALL
  SELECT NULL AS r, t0.subj AS e, t1.obj AS kb, t0.obj AS x
  FROM t t0 JOIN t t1 ON t1.pred = 'LINKED_TO' AND t1.subj = t0.obj
  WHERE t0.pred = 'MENTIONED_WITH')
"""
    assert_df_matches_duckdb(out, con, sql, "union_twin")


# ------------------------------------------------------------ VALUES


def test_parse_values_grammar():
    from ner_spark.plans.kg_query import parse_values

    assert parse_values("?p ?kb = DECLARES UNDEF | LINKED_TO kb:Q1") == (
        ["?p", "?kb"],
        [("DECLARES", None), ("LINKED_TO", "kb:Q1")],
    )
    assert parse_values("?p = A") == (["?p"], [("A",)])
    with pytest.raises(ValueError, match="no '='"):
        parse_values("?p A B")
    with pytest.raises(ValueError, match="no data rows"):
        parse_values("?p = ")


def test_match_pattern_values_constrains_required_var(spark):
    # the common shape: VALUES pins a required variable to a literal
    # set — compiles to a broadcast hash equi-join on the inline table
    t = _union_graph(spark)
    out = match_pattern(t, [("?a", "?p", "?b")],
                        values=(["?p"], [("DECLARES",)]))
    assert out.columns == ["a", "p", "b"]
    assert sorted((r["a"], r["b"]) for r in out.collect()) == [
        ("repo:a", "e1"), ("repo:b", "e2")]


def test_match_pattern_values_undef_is_wildcard(spark):
    # UNDEF is compatible with anything: the (MENTIONED_WITH, UNDEF)
    # row matches every object, the (LINKED_TO, kb:Q1) row only one
    t = _union_graph(spark)
    out = match_pattern(
        t, [("?a", "?p", "?b")],
        values=(["?p", "?b"],
                [("MENTIONED_WITH", None), ("LINKED_TO", "kb:Q1")]))
    assert sorted((r["p"], r["b"]) for r in out.collect()) == [
        ("LINKED_TO", "kb:Q1"), ("MENTIONED_WITH", "e2")]


def test_match_pattern_values_new_var_extends_bindings(spark):
    # a variable only the data block binds annotates the solutions
    # (lookup-table join); FILTERs may reference it — group scope
    t = _union_graph(spark)
    out = match_pattern(
        t, [("?a", "?p", "?b")],
        values=(["?p", "?tag"],
                [("DECLARES", "decl"), ("LINKED_TO", None)]),
        filters=['strstarts(?tag, "d")'])
    assert out.columns == ["a", "p", "b", "tag"]
    # the UNDEF tag rows error in the filter and are eliminated
    assert sorted(r["a"] for r in out.collect()) == ["repo:a", "repo:b"]


def test_match_pattern_values_merges_unbound_optional(spark):
    # SPARQL join compatibility: a binding whose OPTIONAL var is
    # unbound (null) is compatible with any data value, and the merged
    # solution takes the data block's value; a CONFLICTING bound value
    # is incompatible and drops
    t = _union_graph(spark)   # e3 LINKED_TO kb:Q3; repos declare e1,e2
    out = match_pattern(
        t, [("?r", "DECLARES", "?e")],
        optional=[("?e", "INSTANCE_OF", "?cls")],  # never matches here
        values=(["?cls"], [("Entity",)]))
    rows = sorted((r["r"], r["e"], r["cls"]) for r in out.collect())
    assert rows == [("repo:a", "e1", "Entity"), ("repo:b", "e2", "Entity")]


def test_match_pattern_values_validation(spark):
    t = _union_graph(spark)
    with pytest.raises(ValueError, match="at least one variable"):
        match_pattern(t, [("?a", "?p", "?b")], values=([], [()]))
    with pytest.raises(ValueError, match="not a .name"):
        match_pattern(t, [("?a", "?p", "?b")], values=(["p"], [("A",)]))
    with pytest.raises(ValueError, match="twice"):
        match_pattern(t, [("?a", "?p", "?b")],
                      values=(["?p", "?p"], [("A", "B")]))
    with pytest.raises(ValueError, match="terms for"):
        match_pattern(t, [("?a", "?p", "?b")], values=(["?p"], [("A", "B")]))
    with pytest.raises(ValueError, match="neither a string"):
        match_pattern(t, [("?a", "?p", "?b")], values=(["?p"], [(3,)]))
    from ner_spark.plans.kg_query import solutions
    with pytest.raises(ValueError, match="EITHER"):
        solutions(t, union=[[("?a", "P", "?b")], [("?a", "Q", "?b")]],
                  values=(["?p"], [("A",)]))


def test_match_pattern_values_matches_duckdb_twin(spark):
    import duckdb

    from tests.oracle_compare import assert_df_matches_duckdb

    out = match_pattern(
        _union_graph(spark), [("?a", "?p", "?b")],
        values=(["?p", "?tag"],
                [("DECLARES", "decl"), ("LINKED_TO", None)]),
    ).fillna({"tag": ""})
    con = duckdb.connect()
    sql = """
WITH t(subj, pred, obj) AS (VALUES
  ('repo:a','DECLARES','e1'), ('repo:b','DECLARES','e2'),
  ('e1','MENTIONED_WITH','e2'),
  ('e1','LINKED_TO','kb:Q1'), ('e2','LINKED_TO','kb:Q2'),
  ('e3','LINKED_TO','kb:Q3'))
SELECT t0.subj AS a, t0.pred AS p, t0.obj AS b,
       coalesce(vv.tag, '') AS tag
FROM t t0
JOIN (VALUES ('DECLARES', 'decl'),
             ('LINKED_TO', CAST(NULL AS VARCHAR))) vv(p, tag)
  ON vv.p = t0.pred
"""
    assert_df_matches_duckdb(out, con, sql, "values_twin")


def test_query_cli_match_values(spark, tmp_path, capsys, monkeypatch):
    from ner_spark.plans import job as jobmod
    from ner_spark.plans.job import KgJob
    from ner_spark.sources.fixtures import source_table

    out = str(tmp_path / "kg")
    KgJob(spark, out, run_id="qv").run(source_table(spark, n_rows=20))
    monkeypatch.setattr("sys.argv", [
        "job", "--output", out,
        "--match", "?s ?p ?o",
        "--match-values", "?p = DECLARES | LINKED_TO",
        "--match-group-by", "?p",
        "--match-agg", "count(*) AS n",
        "--match-order-by", "?p ASC",
    ])
    jobmod.main()
    outp = capsys.readouterr().out
    assert outp.splitlines()[0] == "p\tn"
    assert "stage=query rows=2 " in outp


# ----------------------------------------------- path forms ^P, P1|P2


def test_match_pattern_inverse_predicate(spark):
    # ^P swaps the endpoints: the object position binds the subject
    t = _union_graph(spark)
    out = match_pattern(t, [("?e", "^DECLARES", "?r")])
    assert sorted(out.columns) == ["e", "r"]
    assert sorted((r["r"], r["e"]) for r in out.collect()) == [
        ("repo:a", "e1"), ("repo:b", "e2")]
    with pytest.raises(ValueError, match="bare inverse"):
        match_pattern(t, [("?a", "^", "?b")])


def test_match_pattern_predicate_alternation(spark):
    # P1|P2 is one element matching either predicate (pred IN ...)
    t = _union_graph(spark)
    out = match_pattern(t, [("e1", "MENTIONED_WITH|LINKED_TO", "?b")])
    assert sorted(r["b"] for r in out.collect()) == ["e2", "kb:Q1"]
    with pytest.raises(ValueError, match="malformed predicate"):
        match_pattern(t, [("?a", "P|", "?b")])


def test_match_pattern_alternation_closure_and_inverse_path(spark):
    # (P1|P2)+ closes over the union of both edge sets; ^(P+) walks
    # the closure backwards (inversion commutes with closure)
    t = _triples(spark, [
        ("a", "P", "b", 1), ("b", "Q", "c", 1), ("c", "P", "d", 1),
    ])
    out = match_pattern(t, [("a", "(P|Q)+", "?x")])
    assert sorted(r["x"] for r in out.collect()) == ["b", "c", "d"]
    out = match_pattern(t, [("d", "^(P|Q)+", "?x")])
    assert sorted(r["x"] for r in out.collect()) == ["a", "b", "c"]
    # bare P|Q+ is ambiguous under SPARQL precedence (P | (Q+)) and
    # raises instead of silently closing over the alternation; arms
    # with embedded markers raise too
    with pytest.raises(ValueError, match="ambiguous path"):
        match_pattern(t, [("a", "P|Q+", "?x")])
    with pytest.raises(ValueError, match="malformed predicate"):
        match_pattern(t, [("?a", "P+|Q", "?b")])
    with pytest.raises(ValueError, match="malformed predicate"):
        match_pattern(t, [("?a", "P|^Q", "?b")])


# ----------------------------------------------- HAVING and OFFSET


def test_parse_having_grammar():
    from ner_spark.plans.kg_query import parse_having

    assert parse_having("n >= 2") == ("n", ">=", 2)
    assert parse_having("?n != 0") == ("n", "!=", 0)
    with pytest.raises(ValueError, match="unparseable HAVING"):
        parse_having("n >= ?m")
    with pytest.raises(ValueError, match="unparseable HAVING"):
        parse_having('n >= "2"')


def test_solutions_having_filters_groups(spark):
    from ner_spark.plans.kg_query import solutions

    out = solutions(
        _agg_graph(spark), [("?r", "DECLARES", "?e")],
        group_by=["?r"], aggregates=["count(*) AS n"],
        having=["n >= 2"], order_by=["n DESC", "?r ASC"])
    assert [tuple(r) for r in out.collect()] == [
        ("repo:a", 3), ("repo:b", 2)]


def test_solutions_offset_pages_ordered_solutions(spark):
    from ner_spark.plans.kg_query import solutions

    base = dict(group_by=["?r"], aggregates=["count(*) AS n"],
                order_by=["n DESC", "?r ASC"])
    t = _agg_graph(spark)
    full = [tuple(r) for r in
            solutions(t, [("?r", "DECLARES", "?e")], **base).collect()]
    page = [tuple(r) for r in
            solutions(t, [("?r", "DECLARES", "?e")], **base,
                      offset=1, limit=2).collect()]
    assert page == full[1:3]


def test_solutions_having_offset_validation(spark):
    from ner_spark.plans.kg_query import solutions

    t = _agg_graph(spark)
    with pytest.raises(ValueError, match="HAVING requires"):
        solutions(t, [("?r", "DECLARES", "?e")], having=["n >= 2"])
    with pytest.raises(ValueError, match="not a numeric"):
        solutions(t, [("?r", "DECLARES", "?e")], group_by=["?r"],
                  aggregates=["min(?e) AS lo"], having=["lo >= 2"])
    with pytest.raises(ValueError, match="nondeterministic"):
        solutions(t, [("?r", "DECLARES", "?e")], offset=2)
    with pytest.raises(ValueError, match="OFFSET must be"):
        solutions(t, [("?r", "DECLARES", "?e")],
                  order_by=["?r ASC"], offset=-1)


# ---------------------------------------------------------------- #
# sequence paths (P1/P2) and zero-or-one (P?)                      #
# ---------------------------------------------------------------- #

def test_sequence_segments_parser():
    from ner_spark.plans.kg_query import _sequence_segments

    assert _sequence_segments("A/B") == ["A", "B"]
    assert _sequence_segments("A/B/C") == ["A", "B", "C"]
    # segments keep their own single-step forms
    assert _sequence_segments("^A/B+") == ["^A", "B+"]
    assert _sequence_segments("(A|B)/C?") == ["(A|B)", "C?"]
    # full-width parens unwrap (the ^(P1/P2) rewrite path)
    assert _sequence_segments("(A/B)") == ["A", "B"]
    # nested parenthesized sequence stays one segment (recursion
    # unpacks it at compile time)
    assert _sequence_segments("A/(B/C)") == ["A", "(B/C)"]
    # not sequences
    assert _sequence_segments("A") is None
    assert _sequence_segments("?p") is None
    assert _sequence_segments("A|B") is None
    with pytest.raises(ValueError, match="alternation of sequences"):
        _sequence_segments("A|B/C")
    with pytest.raises(ValueError, match="empty segment"):
        _sequence_segments("A//B")
    with pytest.raises(ValueError, match="variable segment"):
        _sequence_segments("A/?p")
    with pytest.raises(ValueError, match="unbalanced"):
        _sequence_segments("A/(B/C")


def test_path_pred_zero_or_one_and_seq_closure_guard():
    from ner_spark.plans.kg_query import _path_pred

    assert _path_pred("P+") == ("P", "+")
    assert _path_pred("P*") == ("P", "*")
    assert _path_pred("P?") == ("P", "?")
    assert _path_pred("(A|B)?") == ("(A|B)", "?")
    assert _path_pred("P") is None
    with pytest.raises(ValueError, match="closure over a sequence"):
        _path_pred("(A/B)+")


def test_match_pattern_sequence_path_basic(spark):
    t = _triples(
        spark,
        [("r", "D", "e1", 1), ("e1", "M", "x", 1), ("x", "L", "k", 1),
         ("r2", "D", "e9", 1)],
    )
    out = match_pattern(t, [("?r", "D/M", "?x")])
    assert sorted(tuple(r) for r in out.collect()) == [("r", "x")]
    # 3-segment chain in one element
    out = match_pattern(t, [("?r", "D/M/L", "?k")])
    assert sorted(tuple(r) for r in out.collect()) == [("r", "k")]


def test_match_pattern_sequence_multiset_semantics(spark):
    # two distinct intermediates connecting the same endpoints → TWO
    # rows (SPARQL's fresh-variable translation keeps the multiset;
    # closure paths would dedup)
    t = _triples(
        spark,
        [("r", "D", "e1", 1), ("r", "D", "e2", 1),
         ("e1", "M", "x", 1), ("e2", "M", "x", 1)],
    )
    out = match_pattern(t, [("?r", "D/M", "?x")])
    assert sorted(tuple(r) for r in out.collect()) == [
        ("r", "x"), ("r", "x")]


def test_match_pattern_sequence_composed_segments(spark):
    t = _triples(
        spark,
        [("r", "D", "e1", 1), ("e1", "M", "e2", 1), ("e2", "M", "e3", 1),
         ("k", "L", "e3", 1)],
    )
    # closure segment inside a sequence
    out = match_pattern(t, [("?r", "D/M+", "?b")])
    assert sorted(tuple(r) for r in out.collect()) == [
        ("r", "e2"), ("r", "e3")]
    # inverse segment inside a sequence (reach the L-subject from e2)
    out = match_pattern(t, [("?a", "M/^L", "?w")])
    assert sorted(tuple(r) for r in out.collect()) == [("e2", "k")]
    # inverse over a whole parenthesized sequence: ^(D/M) = endpoints
    # swapped (and the swap binds ?r first, like ^P does)
    out = match_pattern(t, [("?x", "^(D/M)", "?r")])
    assert [(r["x"], r["r"]) for r in out.collect()] == [("e2", "r")]
    # nested parenthesized sequence
    out = match_pattern(t, [("?r", "D/(M/M)", "?b")])
    assert sorted(tuple(r) for r in out.collect()) == [("r", "e3")]


def test_match_pattern_sequence_constant_endpoints(spark):
    t = _triples(
        spark,
        [("r", "D", "e1", 1), ("e1", "M", "x", 1),
         ("r2", "D", "e2", 1), ("e2", "M", "y", 1)],
    )
    out = match_pattern(t, [("r", "D/M", "?x")])
    assert sorted(r["x"] for r in out.collect()) == ["x"]
    out = match_pattern(t, [("?r", "D/M", "y")])
    assert sorted(r["r"] for r in out.collect()) == ["r2"]
    # same variable at both endpoints = equality constraint
    t2 = _triples(spark, [("a", "P", "b", 1), ("b", "Q", "a", 1),
                          ("a", "P", "c", 1)])
    out = match_pattern(t2, [("?s", "P/Q", "?s")])
    assert sorted(r["s"] for r in out.collect()) == ["a"]


def test_match_pattern_sequence_in_optional_and_negation(spark):
    t = _triples(
        spark,
        [("r", "D", "e1", 1), ("r2", "D", "e2", 1),
         ("e1", "M", "x", 1), ("x", "L", "k", 1)],
    )
    # OPTIONAL sequence: r2's chain has no match → null, survives
    out = match_pattern(
        t, [("?r", "D", "?e")], optional=[("?e", "M/L", "?k")])
    rows = {(r["r"], r["e"]): r["k"] for r in out.collect()}
    assert rows == {("r", "e1"): "k", ("r2", "e2"): None}
    # NOT EXISTS with a sequence group element
    out = match_pattern(
        t, [("?r", "D", "?e")], negation=[[("?e", "M/L", "?k")]])
    assert sorted(r["r"] for r in out.collect()) == ["r2"]


def test_match_pattern_zero_or_one(spark):
    t = _triples(
        spark,
        [("a", "P", "b", 1), ("b", "P", "c", 1), ("x", "Q", "y", 1)],
    )
    out = match_pattern(t, [("?s", "P?", "?o")])
    got = sorted(tuple(r) for r in out.collect())
    # one hop: (a,b),(b,c); zero-length: every graph node with itself
    assert got == [
        ("a", "a"), ("a", "b"), ("b", "b"), ("b", "c"),
        ("c", "c"), ("x", "x"), ("y", "y"),
    ]
    # P? never reaches two hops even with a generous path_max_hops
    out = match_pattern(t, [("a", "P?", "?o")], path_max_hops=5)
    assert sorted(r["o"] for r in out.collect()) == ["a", "b"]


# ---------------------------------------------------------------- #
# BIND (expression assignment)                                      #
# ---------------------------------------------------------------- #

def test_parse_bind_grammar():
    from ner_spark.plans.kg_query import parse_bind

    assert parse_bind('?x AS ?y') == ("?y", ("var", "?x"))
    assert parse_bind('"lit" AS ?y') == ("?y", ("const", "lit"))
    assert parse_bind('CONCAT(?a, "-", ?b) AS ?v') == (
        "?v", ("concat", [("var", "?a"), ("const", "-"),
                          ("var", "?b")]))
    assert parse_bind('ucase(?a) AS ?u') == ("?u", ("ucase",
                                                    ("var", "?a")))
    assert parse_bind('STRLEN(?a) AS ?n') == ("?n", ("strlen",
                                                     ("var", "?a")))
    # literals keep commas and escapes
    assert parse_bind('CONCAT(?a, "x,\\"y") AS ?v') == (
        "?v", ("concat", [("var", "?a"), ("const", 'x,"y')]))
    with pytest.raises(ValueError, match="unknown BIND function"):
        parse_bind("NOSUCHFN(?a) AS ?v")
    with pytest.raises(ValueError, match="quoted regex pattern"):
        parse_bind("REPLACE(?a) AS ?v")
    with pytest.raises(ValueError, match="at least two"):
        parse_bind("CONCAT(?a) AS ?v")
    with pytest.raises(ValueError, match="exactly one"):
        parse_bind("UCASE(?a, ?b) AS ?v")
    with pytest.raises(ValueError, match="nested function"):
        parse_bind("CONCAT(UCASE(?a), ?b) AS ?v")
    with pytest.raises(ValueError, match="unparseable BIND"):
        parse_bind("?x ?y")


def test_match_pattern_bind_semantics(spark):
    t = _triples(
        spark,
        [("r", "D", "e1", 1), ("r2", "D", "e2", 1),
         ("e1", "L", "k", 1)],
    )
    # chained binds + a filter over a bind variable
    out = match_pattern(
        t, [("?r", "D", "?e")],
        binds=['UCASE(?e) AS ?u', 'CONCAT(?u, "@", ?r) AS ?tag',
               'STRLEN(?e) AS ?n'],
        filters=['strends(?tag, "r")'],
    )
    rows = [(r["r"], r["e"], r["u"], r["tag"], r["n"])
            for r in out.collect()]
    assert rows == [("r", "e1", "E1", "E1@r", "2")]
    # a null operand (unmatched OPTIONAL) → null binding, row kept
    out = match_pattern(
        t, [("?r", "D", "?e")], optional=[("?e", "L", "?k")],
        binds=['CONCAT(?e, "/", ?k) AS ?pair'],
    )
    rows = {r["r"]: r["pair"] for r in out.collect()}
    assert rows == {"r": "e1/k", "r2": None}
    # rebinding and unbound references raise
    with pytest.raises(ValueError, match="already bound"):
        match_pattern(t, [("?r", "D", "?e")], binds=["?e AS ?r"])
    with pytest.raises(ValueError, match="unbound variable"):
        match_pattern(t, [("?r", "D", "?e")], binds=["?zz AS ?v"])


def test_parse_bind_condfns_grammar():
    from ner_spark.plans.kg_query import parse_bind

    assert parse_bind('STRBEFORE(?g, ":") AS ?ns') == (
        "?ns", ("strbefore", ("var", "?g"), ":"))
    assert parse_bind('strafter("a:b", ":") AS ?t') == (
        "?t", ("strafter", ("const", "a:b"), ":"))
    assert parse_bind("SHA256(?e) AS ?k") == (
        "?k", ("sha256", ("var", "?e")))
    assert parse_bind("MD5(?e) AS ?k") == ("?k", ("md5", ("var", "?e")))
    # IF: the condition is a full FILTER expression — boolean
    # connectives and function calls (with their own commas) included
    assert parse_bind('IF(BOUND(?kb) && STRENDS(?kb, "2"), "a", ?e) '
                      "AS ?s") == (
        "?s", ("if", ("and", [("bound", "?kb"),
                              ("strends", "?kb", "2")]),
               ("const", "a"), ("var", "?e")))
    assert parse_bind('IF(contains(?a, "x,y"), "hit", "miss") AS ?v') \
        == ("?v", ("if", ("contains", "?a", "x,y"),
                   ("const", "hit"), ("const", "miss")))
    with pytest.raises(ValueError, match="quoted separator"):
        parse_bind("STRBEFORE(?a) AS ?v")
    with pytest.raises(ValueError, match="quoted separator"):
        parse_bind("STRAFTER(?a, ?b) AS ?v")
    with pytest.raises(ValueError, match="non-empty"):
        parse_bind('STRAFTER(?a, "") AS ?v')
    with pytest.raises(ValueError, match="exactly one"):
        parse_bind("MD5(?a, ?b) AS ?v")
    with pytest.raises(ValueError, match="condition, then, else"):
        parse_bind("IF(?x) AS ?v")
    with pytest.raises(ValueError, match="quoted literals"):
        parse_bind('IF(BOUND(?x), 3, "a") AS ?v')
    with pytest.raises(ValueError, match="unbalanced"):
        parse_bind('IF(BOUND(?x)), "a", "b") AS ?v')


def test_match_pattern_condfns_semantics(spark):
    import duckdb

    from tests.oracle_compare import assert_df_matches_duckdb

    t = _triples(
        spark,
        [("r", "D", "kb:Q42", 1), ("r", "D", "plain", 1),
         ("r2", "D", "kb:Q7", 1)],
    )
    out = match_pattern(
        t, [("?r", "D", "?e")], optional=[("?e", "L", "?k")],
        binds=['STRBEFORE(?e, ":") AS ?ns',
               'STRAFTER(?e, ":") AS ?qid',
               'IF(STRSTARTS(?e, "kb:") && STRENDS(?e, "2"), '
               '"q2", "other") AS ?cls',
               "SHA256(?e) AS ?h", "MD5(?e) AS ?m"],
    )
    rows = {(r["r"], r["e"]): (r["ns"], r["qid"], r["cls"])
            for r in out.collect()}
    # separator present → split at FIRST occurrence; absent → ""
    assert rows[("r", "kb:Q42")] == ("kb", "Q42", "q2")
    assert rows[("r", "plain")] == ("", "", "other")
    assert rows[("r2", "kb:Q7")] == ("kb", "Q7", "other")
    # null input (unmatched OPTIONAL var) stays null through
    # STRBEFORE/STRAFTER/hashes; IF's null condition takes ELSE
    out2 = match_pattern(
        t, [("?r", "D", "?e")], optional=[("?e", "L", "?k")],
        binds=['STRBEFORE(?k, ":") AS ?nb',
               "SHA256(?k) AS ?hk",
               'IF(STRENDS(?k, "x"), "y", "n") AS ?c'],
    )
    r0 = out2.collect()[0]
    assert r0["nb"] is None and r0["hk"] is None and r0["c"] == "n"
    # DuckDB twin: the generated oracle SQL computes the same rows
    import __spark_entry__ as em

    sql = em._kg_pattern_oracle(
        [("?r", "D", "?e")],
        binds=['STRBEFORE(?e, ":") AS ?ns',
               'STRAFTER(?e, ":") AS ?qid',
               'IF(STRSTARTS(?e, "kb:") && STRENDS(?e, "2"), '
               '"q2", "other") AS ?cls',
               "SHA256(?e) AS ?h"],
        kg_sql="SELECT * FROM (VALUES ('r','D','kb:Q42',1), "
               "('r','D','plain',1), ('r2','D','kb:Q7',1)) "
               "AS t(subj, pred, obj, evidence_count)",
    )
    out3 = match_pattern(
        t, [("?r", "D", "?e")],
        binds=['STRBEFORE(?e, ":") AS ?ns',
               'STRAFTER(?e, ":") AS ?qid',
               'IF(STRSTARTS(?e, "kb:") && STRENDS(?e, "2"), '
               '"q2", "other") AS ?cls',
               "SHA256(?e) AS ?h"],
    )
    assert_df_matches_duckdb(out3, duckdb.connect(), sql,
                             "condfns_twin")


# --------------------------------- negated sets, EXISTS and MINUS


def test_negated_set_parser():
    from ner_spark.plans.kg_query import _negated_set

    assert _negated_set("P") is None
    assert _negated_set("?p") is None
    assert _negated_set("!P") == ["P"]
    assert _negated_set("!(P|Q)") == ["P", "Q"]
    with pytest.raises(ValueError, match="bare negation"):
        _negated_set("!")
    with pytest.raises(ValueError, match="inverse arms"):
        _negated_set("!^P")
    with pytest.raises(ValueError, match="closure over a negated"):
        _negated_set("!P+")
    with pytest.raises(ValueError, match="not a sequence"):
        _negated_set("!(P/Q)")
    with pytest.raises(ValueError, match="ambiguous path"):
        _negated_set("!P|Q")
    # the alternation arm guard now also rejects nested '!' arms
    with pytest.raises(ValueError, match="malformed predicate"):
        _negated_set("!(P|!Q)")


def test_match_pattern_negated_property_set(spark):
    t = _triples(spark, [
        ("a", "P", "b", 1), ("b", "Q", "c", 1),
        ("a", "R", "c", 1), ("c", "P", "a", 1),
    ])
    out = match_pattern(t, [("?s", "!P", "?o")])
    assert sorted((r["s"], r["o"]) for r in out.collect()) == [
        ("a", "c"), ("b", "c")]
    out = match_pattern(t, [("?s", "!(P|Q)", "?o")])
    assert [tuple(r) for r in out.collect()] == [("a", "c")]
    # ^!P: the inverse of the negated set (rewrites to !P with the
    # endpoints swapped before the set compiles)
    out = match_pattern(t, [("?o", "^!(P|R)", "?s")])
    assert sorted((r["s"], r["o"]) for r in out.collect()) == [("b", "c")]
    # a negated set composes as a sequence segment
    out = match_pattern(t, [("?s", "!Q/!P", "?o")])
    assert sorted((r["s"], r["o"]) for r in out.collect()) == [
        ("a", "c"), ("c", "c")]


def test_match_pattern_filter_exists(spark):
    t = _triples(spark, [
        ("a", "P", "b", 1), ("b", "Q", "c", 1), ("c", "P", "d", 1),
    ])
    # keep bindings whose ?o has an outgoing Q edge — left-semi join
    out = match_pattern(t, [("?s", "P", "?o")],
                        existence=[[("?o", "Q", "?z")]])
    assert [tuple(r) for r in out.collect()] == [("a", "b")]
    # a null shared variable (unmatched OPTIONAL) never matches: the
    # binding DROPS under EXISTS (complement of the NOT EXISTS rule)
    out = match_pattern(t, [("?s", "P", "?o")],
                        optional=[("?o", "Q", "?k")],
                        existence=[[("?k", "P", "?z")]])
    assert [tuple(r) for r in out.collect()] == [("a", "b", "c")]
    # uncorrelated groups raise (whole-graph ASK, not a filter)
    with pytest.raises(ValueError, match="existence group 0"):
        match_pattern(t, [("?s", "P", "?o")],
                      existence=[[("?x", "Q", "?y")]])


def test_match_pattern_minus_semantics(spark):
    t = _triples(spark, [
        ("a", "P", "b", 1), ("b", "Q", "c", 1),
        ("a", "R", "c", 1), ("c", "P", "a", 1),
    ])
    base = [("?s", "P", "?o")]
    # set difference on the shared ?o
    out = match_pattern(t, base, minus=[[("?o", "Q", "?z")]])
    assert [tuple(r) for r in out.collect()] == [("c", "a")]
    # disjoint domains: MINUS removes NOTHING (where NOT EXISTS with
    # the same uncorrelated group would raise here / drop everything
    # in SPARQL)
    out = match_pattern(t, base, minus=[[("?x", "Q", "?y")]])
    assert sorted((r["s"], r["o"]) for r in out.collect()) == [
        ("a", "b"), ("c", "a")]
    # EXISTS and MINUS with the same group partition the base bindings
    ex = match_pattern(t, base, existence=[[("?o", "Q", "?z")]]).count()
    mi = match_pattern(t, base, minus=[[("?o", "Q", "?z")]]).count()
    assert ex + mi == match_pattern(t, base).count()
    # nullable shared variable: compatibility is null-or-equal with a
    # domain-overlap guard, so an unbound (null) ?k never removes
    out = match_pattern(t, base, optional=[("?o", "Q", "?k")],
                        minus=[[("?k", "P", "?z")]])
    assert [tuple(r) for r in out.collect()] == [("c", "a", None)]
    # the MINUS group is an independent pattern: a non-chaining group
    # hits the cartesian guard of its own match_pattern
    with pytest.raises(ValueError, match="shares no variable"):
        match_pattern(t, base,
                      minus=[[("?o", "Q", "?z"), ("?v", "R", "?w")]])


def test_minus_required_path_is_hash_anti_join(spark):
    # every shared variable required → the fast path: a hash
    # (broadcast or shuffled) anti-join, never a nested-loop join
    t = _triples(spark, [("a", "P", "b", 1), ("b", "Q", "c", 1)])
    out = match_pattern(t, [("?s", "P", "?o")],
                        minus=[[("?o", "Q", "?z")]])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # nullable shared variable → the general compatibility join is
    # necessarily non-equi (nested-loop against the DISTINCT-projected
    # group solutions)
    out = match_pattern(t, [("?s", "P", "?o")],
                        optional=[("?o", "Q", "?k")],
                        minus=[[("?k", "Q", "?z")]])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan and "LeftAnti" in plan


# ------------------------------------------------- SPARQL subqueries


def test_match_pattern_subquery_semantics(spark):
    t = _triples(spark, [
        ("r1", "DECLARES", "e1", 1), ("r1", "DECLARES", "e2", 1),
        ("r2", "DECLARES", "e2", 1),
        ("e1", "MENTIONED_WITH", "e2", 1),
        ("e2", "MENTIONED_WITH", "e1", 1),
        ("e2", "MENTIONED_WITH", "e3", 1),
    ])
    sub = {"pattern": [("?e", "MENTIONED_WITH", "?x")],
           "group_by": ["?e"], "aggregates": ["count(*) AS n"]}
    out = match_pattern(t, [("?repo", "DECLARES", "?e")],
                        subqueries=[sub])
    # subquery vars append after the outer pattern's, aliases join in
    assert out.columns == ["repo", "e", "n"]
    assert sorted(map(tuple, out.collect())) == [
        ("r1", "e1", 1), ("r1", "e2", 2), ("r2", "e2", 2)]
    # inner join: an outer binding with no subquery solution drops
    t2 = _triples(spark, [
        ("r1", "DECLARES", "e9", 1),
        ("e1", "MENTIONED_WITH", "e2", 1),
    ])
    assert match_pattern(t2, [("?repo", "DECLARES", "?e")],
                         subqueries=[sub]).count() == 0
    # no shared REQUIRED variable → the cartesian guard raises
    with pytest.raises(ValueError, match="shares no REQUIRED"):
        match_pattern(t, [("?repo", "DECLARES", "?e")],
                      subqueries=[{"pattern":
                                   [("?a", "MENTIONED_WITH", "?b")]}])
    # projecting over an outer OPTIONAL-bound variable raises (the
    # join would need null-aware semantics the spec does not define)
    with pytest.raises(ValueError, match="binds optionally"):
        match_pattern(t, [("?repo", "DECLARES", "?e")],
                      optional=[("?e", "MENTIONED_WITH", "?x")],
                      subqueries=[{"pattern":
                                   [("?e", "MENTIONED_WITH", "?x")]}])


def test_subquery_join_is_hash_equi(spark):
    t = _triples(spark, [
        ("r1", "DECLARES", "e1", 1), ("e1", "MENTIONED_WITH", "e2", 1),
    ])
    sub = {"pattern": [("?e", "MENTIONED_WITH", "?x")],
           "group_by": ["?e"], "aggregates": ["count(*) AS n"]}
    out = match_pattern(t, [("?repo", "DECLARES", "?e")],
                        subqueries=[sub])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

"""The SPARQL text front-end: tokenizer, parser (text → the exact
solutions()/construct() kwargs), execution of all three query forms,
and the parse-shared DuckDB twin.  The three kg_sparql* contract keys
hash-check the forms against _kg_sparql_oracle at sf0.01; these tests
pin the grammar and its error surface."""

from __future__ import annotations

import pytest

from ner_spark.plans.sparql import parse_sparql, sparql, tokenize


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, evidence_count bigint"
    )


def _graph(spark):
    return _triples(spark, [
        ("repo:a", "DECLARES", "e1", 1),
        ("repo:a", "DECLARES", "e3", 1),
        ("repo:b", "DECLARES", "e2", 1),
        ("e1", "MENTIONED_WITH", "e2", 1),
        ("e1", "LINKED_TO", "kb:Q1", 1),
        ("e2", "LINKED_TO", "kb:Q2", 1),
    ])


# ------------------------------------------------------------ parsing


def test_tokenize_strings_iris_punct():
    assert tokenize('?a <http://x/y> "lit \\" q" . { } ( ) != <= *') == [
        "?a", "<http://x/y>", '"lit \\" q"', ".", "{", "}", "(", ")",
        "!=", "<=", "*"]
    with pytest.raises(ValueError, match="cannot tokenize"):
        tokenize('?a "unterminated')


def test_parse_select_full_form():
    kw = parse_sparql("""
        SELECT ?r (COUNT(DISTINCT ?e) AS ?n) (MIN(?e) AS ?lo)
        WHERE { ?r DECLARES ?e . ?e LINKED_TO ?kb
                FILTER STRSTARTS(?kb, "kb:") }
        GROUP BY ?r ORDER BY DESC(?n) ?r LIMIT 10
    """)
    assert kw == {
        "form": "select",
        "pattern": [("?r", "DECLARES", "?e"), ("?e", "LINKED_TO", "?kb")],
        "filters": [("strstarts", "?kb", "kb:")],
        "group_by": ["?r"],
        "aggregates": ["count_distinct(?e) AS n", "min(?e) AS lo"],
        "select": ["?r", "n", "lo"],
        "order_by": [("n", False), ("r", True)],
        "limit": 10,
    }


def test_parse_term_forms():
    kw = parse_sparql('SELECT * WHERE { <http://kb/Q1> ?p "two words" }')
    assert kw["pattern"] == [("http://kb/Q1", "?p", "two words")]


def test_parse_optional_negation_values_union():
    kw = parse_sparql("""
        SELECT * WHERE { ?r DECLARES ?e
            OPTIONAL { ?e LINKED_TO ?kb }
            FILTER NOT EXISTS { ?e MENTIONED_WITH ?z }
            VALUES ?r { "repo:a" UNDEF } }
    """)
    assert kw["optional"] == [("?e", "LINKED_TO", "?kb")]
    assert kw["negation"] == [[("?e", "MENTIONED_WITH", "?z")]]
    assert kw["values"] == (["?r"], [("repo:a",), (None,)])
    kw = parse_sparql("""
        ASK { { ?a DECLARES ?b } UNION { ?a LINKED_TO ?b }
              UNION { ?a MENTIONED_WITH ?b } }
    """)
    assert kw == {"form": "ask", "union": [
        {"pattern": [("?a", "DECLARES", "?b")]},
        {"pattern": [("?a", "LINKED_TO", "?b")]},
        {"pattern": [("?a", "MENTIONED_WITH", "?b")]},
    ]}


def test_parse_multi_var_values():
    kw = parse_sparql("""
        SELECT * WHERE { ?s ?p ?o
            VALUES (?p ?tag) { (DECLARES d) (LINKED_TO UNDEF) } }
    """)
    assert kw["values"] == (
        ["?p", "?tag"], [("DECLARES", "d"), ("LINKED_TO", None)])


def test_parse_filter_comparison_forms():
    kw = parse_sparql(
        'SELECT * WHERE { ?a ?p ?b FILTER(?a != ?b) '
        'FILTER(?b >= "e") FILTER REGEX(?p, "^L") }')
    assert kw["filters"] == [
        ("cmp", "?a", "!=", ("var", "?b")),
        ("cmp", "?b", ">=", ("const", "e")),
        ("regex", "?p", "^L"),
    ]


def test_sparql_bind_string_builders(spark):
    # COALESCE is the OPTIONAL default-value idiom; SUBSTR is the
    # 1-based 3-arg form; REPLACE is a global regex replace
    tri = _triples(spark, [
        ("repo:a", "DECLARES", "e1", 1), ("repo:b", "DECLARES", "e2", 1),
        ("e1", "LINKED_TO", "kb:Q1", 1)])
    out = sparql(tri, '''
        SELECT ?r ?d ?s ?x WHERE {
          ?r DECLARES ?e OPTIONAL { ?e LINKED_TO ?kb }
          BIND(COALESCE(?kb, "kb:none") AS ?d)
          BIND(SUBSTR(?e, 2, 1) AS ?s)
          BIND(REPLACE(?r, "o", "0") AS ?x)
        }''')
    assert sorted(map(tuple, out.collect())) == [
        ("repo:a", "kb:Q1", "1", "rep0:a"),
        ("repo:b", "kb:none", "2", "rep0:b")]
    for bad, msg in (
        ('SELECT * WHERE { ?a ?p ?b BIND(SUBSTR(?a, 0, 2) AS ?x) }',
         "1-based"),
        ('SELECT * WHERE { ?a ?p ?b BIND(REPLACE(?a, "x", "$1") AS ?x) }',
         "backreferences"),
        ('SELECT * WHERE { ?a ?p ?b BIND(UCASE(2) AS ?x) }',
         "bare integers"),
    ):
        with pytest.raises(ValueError, match=msg):
            parse_sparql(bad)


def test_sparql_bind_condfns(spark):
    # IF's condition is a full FILTER boolean expression (parsed by
    # the same grammar FILTER uses), STRBEFORE/STRAFTER split at the
    # FIRST separator ('' when absent), SHA256/MD5 are lowercase hex
    tri = _triples(spark, [
        ("repo:a", "DECLARES", "e1", 1), ("repo:b", "DECLARES", "e2", 1),
        ("e1", "LINKED_TO", "kb:Q2", 1)])
    out = sparql(tri, '''
        SELECT ?r ?ns ?qid ?cls WHERE {
          ?r DECLARES ?e OPTIONAL { ?e LINKED_TO ?kb }
          BIND(COALESCE(?kb, "none:floating") AS ?g)
          BIND(STRBEFORE(?g, ":") AS ?ns)
          BIND(STRAFTER(?g, ":") AS ?qid)
          BIND(IF(BOUND(?kb) && STRENDS(?kb, "2"), "q2", "other") AS ?cls)
        }''')
    assert sorted(map(tuple, out.collect())) == [
        ("repo:a", "kb", "Q2", "q2"),
        ("repo:b", "none", "floating", "other")]
    out = sparql(tri, """
        SELECT ?h WHERE { ?r DECLARES ?e
                          BIND(SHA256("x") AS ?h) } LIMIT 1""")
    import hashlib
    assert out.collect()[0]["h"] == hashlib.sha256(b"x").hexdigest()
    for bad, msg in (
        ('SELECT * WHERE { ?a ?p ?b BIND(IF(?a, "y") AS ?x) }',
         "unsupported FILTER operator"),
        ('SELECT * WHERE { ?a ?p ?b BIND(STRAFTER(?a, "") AS ?x) }',
         "non-empty"),
    ):
        with pytest.raises(ValueError, match=msg):
            parse_sparql(bad)


def test_sparql_construct_where_shorthand(spark):
    # CONSTRUCT WHERE { BGP }: the pattern doubles as the template —
    # the matched subgraph comes back as a set with evidence counts
    g = _graph(spark)
    out = sparql(g, "CONSTRUCT WHERE { ?r DECLARES ?e }")
    assert sorted((r["subj"], r["pred"], r["obj"], r["evidence_count"])
                  for r in out.collect()) == [
        ("repo:a", "DECLARES", "e1", 1), ("repo:a", "DECLARES", "e3", 1),
        ("repo:b", "DECLARES", "e2", 1)]
    kw = parse_sparql("CONSTRUCT WHERE { ?r DECLARES ?e . ?e ?p ?x }")
    assert kw["template"] == kw["pattern"]
    with pytest.raises(ValueError, match="property path"):
        parse_sparql("CONSTRUCT WHERE { ?a MENTIONED_WITH+ ?b }")
    with pytest.raises(ValueError, match="expected"):
        parse_sparql('CONSTRUCT WHERE { ?a ?p ?b FILTER(?a != ?b) }')


def test_sparql_sample_aggregate(spark):
    # SAMPLE is pinned to MIN (deterministic engines cannot hash an
    # arbitrary pick); twin-checked through the generated oracle
    g = _graph(spark)
    out = sparql(g, """
        SELECT ?r (SAMPLE(?e) AS ?pick) WHERE { ?r DECLARES ?e }
        GROUP BY ?r ORDER BY ?r
    """)
    assert [(r["r"], r["pick"]) for r in out.collect()] == [
        ("repo:a", "e1"), ("repo:b", "e2")]


def test_parse_boolean_filter_expressions():
    # precedence: ! > && > ||, parens override; BOUND / IN / NOT IN
    kw = parse_sparql(
        'SELECT * WHERE { ?a ?p ?b OPTIONAL { ?b LINKED_TO ?k } '
        'FILTER(!BOUND(?k) || STRSTARTS(?k, "kb:") && ?a != ?b) '
        'FILTER(?p IN ("DECLARES", "LINKED_TO")) '
        'FILTER((?a = "x" || ?b = "y") && ?p NOT IN ("Q")) }')
    assert kw["filters"] == [
        ("or", [("not", ("bound", "?k")),
                ("and", [("strstarts", "?k", "kb:"),
                         ("cmp", "?a", "!=", ("var", "?b"))])]),
        ("in", "?p", ["DECLARES", "LINKED_TO"]),
        ("and", [("or", [("cmp", "?a", "=", ("const", "x")),
                         ("cmp", "?b", "=", ("const", "y"))]),
                 ("notin", "?p", ["Q"])]),
    ]
    # a bare built-in call still parses without brackets
    kw = parse_sparql('SELECT * WHERE { ?a ?p ?b FILTER BOUND(?a) }')
    assert kw["filters"] == [("bound", "?a")]


def test_sparql_boolean_filters_from_text(spark):
    tri = spark.createDataFrame(
        [("a", "P", "b"), ("a", "P", "c"), ("b", "LINKED_TO", "kb:Q1"),
         ("c", "Q", "a")],
        "subj string, pred string, obj string")
    # !BOUND keeps the unmatched-OPTIONAL row; the IN arm keeps kb:Q1
    out = sparql(tri, '''
        SELECT ?x ?k WHERE {
          a P ?x OPTIONAL { ?x LINKED_TO ?k }
          FILTER(!BOUND(?k) || ?k IN ("kb:Q1"))
        }''')
    assert sorted((r["x"], r["k"]) for r in out.collect()) == [
        ("b", "kb:Q1"), ("c", None)]
    # && with a null operand is FALSE-dominated only when a conjunct
    # is FALSE; here ?k != "z" is error (null) for c → row eliminated
    out = sparql(tri, '''
        SELECT ?x WHERE {
          a P ?x OPTIONAL { ?x LINKED_TO ?k }
          FILTER(?k != "z" && STRSTARTS(?x, "b"))
        }''')
    assert [r["x"] for r in out.collect()] == ["b"]


def test_parse_errors():
    cases = [
        ("SELECT WHERE { ?a ?p ?b }", "empty SELECT"),
        ("SELECT (MEDIAN(?x) AS ?s) WHERE { ?a ?p ?x }",
         "unknown aggregate"),
        ('SELECT (SUM(?x; SEPARATOR=",") AS ?s) WHERE { ?a ?p ?x }',
         "only applies to GROUP_CONCAT"),
        ('SELECT (GROUP_CONCAT(?x; SEPARATOR=y) AS ?s) '
         "WHERE { ?a ?p ?x }", "quoted literal"),
        ("SELECT (COUNT(*) AS n) WHERE { ?a ?p ?x }", "alias must be"),
        ("SELECT * WHERE { ?a ?p ?b . { ?a DECLARES ?c } "
         "UNION { ?a LINKED_TO ?c } }", "must be a subquery"),
        ("SELECT * WHERE { { ?a DECLARES ?c } }", "part of a UNION"),
        ("SELECT * WHERE { { ?a DECLARES ?c } UNION "
         "{ ?a LINKED_TO ?c } ?x ?y ?z }", "cannot join a UNION"),
        ("SELECT * WHERE { ?a ?p ?b } GROUP BY", "at least one"),
        ("SELECT * WHERE { ?a ?p ?b } LIMIT ten", "needs an integer"),
        ("SELECT * WHERE { ?a ?p ?b } BOGUS", "trailing token"),
        ("EXPLAIN ?x", "must start with"),
        ("CONSTRUCT { ?a X ?b } WHERE { { ?a P ?b } UNION { ?a Q ?b } }",
         "single BGP group"),
        ("SELECT * WHERE { ?a ?p ?b FILTER LCASE(?a) }",
         "bracketed expression or a built-in"),
        ("SELECT * WHERE { ?a ?p ?b FILTER ?a != ?b }",
         "bracketed expression or a built-in"),
        ("SELECT * WHERE { ?a ?p ?b FILTER(?a IN ()) }",
         "at least one term"),
        ("SELECT * WHERE { ?a ?p ?b FILTER(?a IN (?b)) }",
         "must be a constant"),
        ("SELECT * WHERE { ?a ?p ?b FILTER(BOUND(x)) }",
         "BOUND needs a .variable"),
    ]
    for text, msg in cases:
        with pytest.raises(ValueError, match=msg.split("|")[0]):
            parse_sparql(text)


def test_parse_nested_union_flattens():
    kw = parse_sparql("""
        ASK { { { ?a P ?b } UNION { ?a Q ?b } } UNION { ?a R ?b } }
    """)
    assert [g["pattern"][0][1] for g in kw["union"]] == ["P", "Q", "R"]


# ---------------------------------------------------------- execution


def test_sparql_select_aggregates(spark):
    out = sparql(_graph(spark), """
        SELECT ?r (COUNT(DISTINCT ?e) AS ?n) WHERE { ?r DECLARES ?e }
        GROUP BY ?r ORDER BY DESC(?n) ?r LIMIT 5
    """)
    assert out.columns == ["r", "n"]
    assert [tuple(r) for r in out.collect()] == [
        ("repo:a", 2), ("repo:b", 1)]


def test_sparql_numeric_aggregates_separator_reduced(spark):
    # SUM/AVG over a STRLEN-bound numeric-string term (exact decimal
    # sum surfacing as DOUBLE), GROUP_CONCAT's SEPARATOR parameter,
    # and SELECT REDUCED pinned to DISTINCT
    out = sparql(_graph(spark), """
        SELECT ?r (SUM(?len) AS ?s) (AVG(?len) AS ?a)
               (GROUP_CONCAT(?e; SEPARATOR="|") AS ?es)
        WHERE { ?r DECLARES ?e BIND(STRLEN(?e) AS ?len) }
        GROUP BY ?r ORDER BY ?r
    """)
    assert out.columns == ["r", "s", "a", "es"]
    rows = [tuple(r) for r in out.collect()]
    assert rows == [("repo:a", 4.0, 2.0, "e1|e3"),
                    ("repo:b", 2.0, 2.0, "e2")]
    red = sparql(_graph(spark),
                 "SELECT REDUCED ?p WHERE { ?s ?p ?o }")
    assert sorted(r["p"] for r in red.collect()) == [
        "DECLARES", "LINKED_TO", "MENTIONED_WITH"]
    # SUM(DISTINCT) + HAVING over a SUM alias: repo:a has distinct
    # lengths {2}, repo:b {2} — the distinct sum collapses repo:a's
    # two length-2 entities to one contribution
    out = sparql(_graph(spark), """
        SELECT ?r (SUM(DISTINCT ?len) AS ?sd) WHERE {
          ?r DECLARES ?e BIND(STRLEN(?e) AS ?len) }
        GROUP BY ?r HAVING(?sd >= 2) ORDER BY ?r
    """)
    assert [tuple(r) for r in out.collect()] == [
        ("repo:a", 2.0), ("repo:b", 2.0)]


def test_sparql_optional_group_semantics(spark):
    # FILTER inside OPTIONAL applies BEFORE the left join: outer rows
    # survive with null group bindings (left-join-with-condition);
    # the same filter OUTSIDE eliminates rows — both pinned here
    tri = _triples(spark, [
        ("r", "D", "e1", 1), ("r", "D", "e2", 1),
        ("e1", "L", "kb:Q1", 1), ("e2", "L", "kb:Q2", 1),
        ("e1", "M", "e2", 1)])
    inside = sparql(tri, '''
        SELECT ?e ?kb WHERE {
          ?r D ?e OPTIONAL { ?e L ?kb FILTER STRENDS(?kb, "2") } }''')
    assert sorted(map(tuple, inside.collect())) == [
        ("e1", None), ("e2", "kb:Q2")]
    outside = sparql(tri, '''
        SELECT ?e ?kb WHERE {
          ?r D ?e OPTIONAL { ?e L ?kb } FILTER STRENDS(?kb, "2") }''')
    assert sorted(map(tuple, outside.collect())) == [("e2", "kb:Q2")]
    # multi-triple OPTIONAL is atomic (group, not per-element joins)
    atomic = sparql(tri, '''
        SELECT ?e ?x ?kb WHERE {
          ?r D ?e OPTIONAL { ?e M ?x . ?x L ?kb } }''')
    assert sorted(map(tuple, atomic.collect())) == [
        ("e1", "e2", "kb:Q2"), ("e2", None, None)]
    # BIND inside the group projects before the join (null outside)
    bnd = sparql(tri, '''
        SELECT ?e ?g WHERE {
          ?r D ?e OPTIONAL { ?e M ?x BIND(UCASE(?x) AS ?g) } }''')
    assert sorted(map(tuple, bnd.collect())) == [
        ("e1", "E2"), ("e2", None)]
    with pytest.raises(ValueError, match="no triples"):
        parse_sparql('SELECT * WHERE { ?a ?p ?b '
                     'OPTIONAL { FILTER BOUND(?a) } }')
    with pytest.raises(ValueError, match="not supported"):
        parse_sparql('SELECT * WHERE { ?a ?p ?b OPTIONAL '
                     '{ ?b L ?k . ?k L ?j FILTER NOT EXISTS '
                     "{ ?k M ?z } } }")


def test_optional_group_validation(spark):
    from ner_spark.plans.kg_query import match_pattern

    tri = _triples(spark, [("r", "D", "e1", 1), ("x", "L", "y", 1)])
    with pytest.raises(ValueError, match="unknown keys"):
        match_pattern(tri, [("?r", "D", "?e")],
                      optional=[{"pattern": [("?e", "L", "?k")],
                                 "negation": []}])
    with pytest.raises(ValueError, match="REQUIRED variable"):
        match_pattern(tri, [("?r", "D", "?e")],
                      optional=[{"pattern": [("?a", "L", "?b")]}])
    # sharing only an optional variable raises (needs null-aware keys)
    with pytest.raises(ValueError, match="REQUIRED variable"):
        match_pattern(
            tri, [("?r", "D", "?e")],
            optional=[("?e", "L", "?k"),
                      {"pattern": [("?k", "L", "?j")]}])
    # sharing a required var but REBINDING an outer optional raises
    with pytest.raises(ValueError, match="rebinds"):
        match_pattern(
            tri, [("?r", "D", "?e")],
            optional=[("?e", "L", "?k"),
                      {"pattern": [("?e", "M", "?k")]}])


def test_sparql_select_star_optional(spark):
    out = sparql(_graph(spark), """
        SELECT * WHERE { ?r DECLARES ?e OPTIONAL { ?e LINKED_TO ?kb } }
    """)
    rows = {r["e"]: r["kb"] for r in out.collect()}
    assert rows == {"e1": "kb:Q1", "e2": "kb:Q2", "e3": None}


def test_sparql_select_distinct_projection(spark):
    out = sparql(_graph(spark),
                 "SELECT DISTINCT ?p WHERE { ?s ?p ?o }")
    assert sorted(r["p"] for r in out.collect()) == [
        "DECLARES", "LINKED_TO", "MENTIONED_WITH"]


def test_sparql_ask(spark):
    t = _graph(spark)
    assert sparql(t, 'ASK { ?x LINKED_TO "kb:Q1" }').collect()[0][0] is True
    assert sparql(t, 'ASK { ?x LINKED_TO "kb:Q9" }').collect()[0][0] is False
    # union'd ASK
    assert sparql(t, 'ASK { { ?x NOPE ?y } UNION { ?x DECLARES ?y } }') \
        .collect()[0][0] is True


def test_sparql_construct(spark):
    out = sparql(_graph(spark), """
        CONSTRUCT { ?r MENTIONS_KB ?kb } WHERE {
            ?r DECLARES ?e . ?e LINKED_TO ?kb }
    """)
    assert sorted(map(tuple, out.collect())) == [
        ("repo:a", "MENTIONS_KB", "kb:Q1", 1),
        ("repo:b", "MENTIONS_KB", "kb:Q2", 1)]


def test_sparql_union_values_paths(spark):
    t = _graph(spark)
    out = sparql(t, """
        SELECT ?e ?kb WHERE {
          { ?r DECLARES ?e . ?e LINKED_TO ?kb }
          UNION { ?e MENTIONED_WITH ?x . ?x LINKED_TO ?kb } }
    """)
    assert sorted(map(tuple, out.collect())) == [
        ("e1", "kb:Q1"), ("e1", "kb:Q2"), ("e2", "kb:Q2")]
    out = sparql(t, """
        SELECT ?a ?b WHERE { ?a MENTIONED_WITH+ ?b FILTER(?a != ?b) }
    """)
    assert [tuple(r) for r in out.collect()] == [("e1", "e2")]
    out = sparql(t, """
        SELECT ?s ?o WHERE { ?s ?p ?o
            VALUES ?p { DECLARES } } ORDER BY ?s ?o
    """)
    assert [tuple(r) for r in out.collect()] == [
        ("repo:a", "e1"), ("repo:a", "e3"), ("repo:b", "e2")]


def test_sparql_matches_generated_twin(spark):
    # text → kwargs feeds BOTH engines (solutions and the oracle
    # generator); this pins the full chain on a literal graph
    import duckdb

    import __spark_entry__ as entrymod
    from tests.oracle_compare import assert_df_matches_duckdb

    kg_sql = """SELECT * FROM (VALUES
        ('repo:a','DECLARES','e1'), ('repo:a','DECLARES','e3'),
        ('repo:b','DECLARES','e2'), ('e1','MENTIONED_WITH','e2'),
        ('e1','LINKED_TO','kb:Q1'), ('e2','LINKED_TO','kb:Q2')
        ) t(subj, pred, obj)"""
    con = duckdb.connect()
    for text in (
        """SELECT ?r (COUNT(*) AS ?n) (GROUP_CONCAT(?e) AS ?es)
           WHERE { ?r DECLARES ?e } GROUP BY ?r ORDER BY ?r""",
        'ASK { ?a MENTIONED_WITH ?b }',
        """CONSTRUCT { ?kb BACKED_BY ?r } WHERE {
           ?r DECLARES ?e . ?e LINKED_TO ?kb }""",
        """SELECT DISTINCT ?p WHERE {
           { ?a ?p ?b . FILTER(?a != ?b) } UNION
           { ?a ?p ?b . VALUES ?p { MENTIONED_WITH } } } ORDER BY ?p""",
    ):
        assert_df_matches_duckdb(
            sparql(_graph(spark), text), con,
            entrymod._kg_sparql_oracle(text, kg_sql=kg_sql),
            name=f"sparql:{text[:30]}")


def test_job_sparql_and_cli(spark, tmp_path, capsys, monkeypatch):
    from ner_spark.plans import job as jobmod
    from ner_spark.plans.job import KgJob
    from ner_spark.sources.fixtures import source_table

    out = str(tmp_path / "kg")
    job = KgJob(spark, out, run_id="sq")
    job.run(source_table(spark, n_rows=20))
    df = job.sparql(
        "SELECT ?repo (COUNT(DISTINCT ?e) AS ?n) WHERE "
        "{ ?repo DECLARES ?e } GROUP BY ?repo ORDER BY DESC(?n) ?repo "
        "LIMIT 3")
    assert df.columns == ["repo", "n"]
    assert df.count() == 3
    monkeypatch.setattr("sys.argv", [
        "job", "--output", out,
        "--sparql", 'ASK { ?e LINKED_TO ?kb }',
    ])
    jobmod.main()
    outp = capsys.readouterr().out
    assert outp.splitlines()[0] == "ask"
    assert "True" in outp
    assert "stage=sparql rows=1 " in outp


def test_parse_having_offset():
    kw = parse_sparql("""
        SELECT ?r (COUNT(*) AS ?n) WHERE { ?r DECLARES ?e }
        GROUP BY ?r HAVING(?n >= 2) HAVING(?n < 9)
        ORDER BY DESC(?n) ?r LIMIT 4 OFFSET 2
    """)
    assert kw["having"] == [("n", ">=", 2), ("n", "<", 9)]
    assert kw["limit"] == 4 and kw["offset"] == 2
    with pytest.raises(ValueError, match="duplicate LIMIT"):
        parse_sparql("SELECT * WHERE { ?a ?p ?b } LIMIT 2 LIMIT 3")
    with pytest.raises(ValueError, match="number"):
        parse_sparql("SELECT (COUNT(*) AS ?n) WHERE { ?a ?p ?b } "
                     "GROUP BY ?a HAVING(?n > x)")
    # decimal thresholds tokenize as one literal and parse to float
    kw = parse_sparql("""
        SELECT ?r (AVG(?n) AS ?avg) WHERE { ?r HAS ?n }
        GROUP BY ?r HAVING(?avg >= 1.5)
    """)
    assert kw["having"] == [("avg", ">=", 1.5)]
    # and a '.' right after a bare-integer OBJECT still separates
    # triples (the number token needs digits on both sides)
    kw = parse_sparql('ASK { s P "5" . s Q ?x }')
    assert len(kw["pattern"]) == 2


def test_sparql_decimal_having_matches_twin(spark):
    import duckdb

    import __spark_entry__ as entrymod
    from tests.oracle_compare import assert_df_matches_duckdb

    kg_sql = """SELECT * FROM (VALUES
        ('repo:a','HAS','1'), ('repo:a','HAS','2'),
        ('repo:b','HAS','1'), ('repo:b','HAS','1'),
        ('repo:c','HAS','3')
        ) t(subj, pred, obj)"""
    text = """
        SELECT ?r (AVG(?n) AS ?avg) WHERE { ?r HAS ?n }
        GROUP BY ?r HAVING(?avg >= 1.5) ORDER BY ?r
    """
    t = _triples(spark, [
        ("repo:a", "HAS", "1", 1), ("repo:a", "HAS", "2", 1),
        ("repo:b", "HAS", "1", 1), ("repo:b", "HAS", "1", 1),
        ("repo:c", "HAS", "3", 1),
    ])
    out = sparql(t, text)
    got = [(r["r"], r["avg"]) for r in out.collect()]
    assert got == [("repo:a", 1.5), ("repo:c", 3.0)]
    assert_df_matches_duckdb(
        out, duckdb.connect(),
        entrymod._kg_sparql_oracle(text, kg_sql=kg_sql),
        "decimal_having")


def test_sparql_having_offset_matches_twin(spark):
    import duckdb

    import __spark_entry__ as entrymod
    from tests.oracle_compare import assert_df_matches_duckdb

    kg_sql = """SELECT * FROM (VALUES
        ('repo:a','DECLARES','e1'), ('repo:a','DECLARES','e3'),
        ('repo:b','DECLARES','e2'), ('repo:b','DECLARES','e4'),
        ('repo:c','DECLARES','e5'), ('e1','MENTIONED_WITH','e2')
        ) t(subj, pred, obj)"""
    text = """
        SELECT ?r (COUNT(?e) AS ?n) WHERE { ?r DECLARES ?e }
        GROUP BY ?r HAVING(?n >= 2) ORDER BY DESC(?n) ?r
        LIMIT 3 OFFSET 1
    """
    t = _triples(spark, [
        ("repo:a", "DECLARES", "e1", 1), ("repo:a", "DECLARES", "e3", 1),
        ("repo:b", "DECLARES", "e2", 1), ("repo:b", "DECLARES", "e4", 1),
        ("repo:c", "DECLARES", "e5", 1), ("e1", "MENTIONED_WITH", "e2", 1),
    ])
    out = sparql(t, text)
    assert [tuple(r) for r in out.collect()] == [("repo:b", 2)]
    assert_df_matches_duckdb(
        out, duckdb.connect(),
        entrymod._kg_sparql_oracle(text, kg_sql=kg_sql), "having_page")


def test_sparql_describe(spark):
    t = _graph(spark)
    # constant: every triple touching e1
    out = sparql(t, "DESCRIBE e1")
    assert out.columns == ["subj", "pred", "obj"]
    assert sorted(map(tuple, out.collect())) == [
        ("e1", "LINKED_TO", "kb:Q1"),
        ("e1", "MENTIONED_WITH", "e2"),
        ("repo:a", "DECLARES", "e1")]
    # variable: nodes bound by the WHERE pattern; set semantics
    out = sparql(t, "DESCRIBE ?kb WHERE { ?e LINKED_TO ?kb }")
    assert sorted(map(tuple, out.collect())) == [
        ("e1", "LINKED_TO", "kb:Q1"), ("e2", "LINKED_TO", "kb:Q2")]
    # mixed constants and variables accumulate
    out = sparql(t, 'DESCRIBE e3 ?kb WHERE { ?e LINKED_TO ?kb }')
    assert ("repo:a", "DECLARES", "e3") in set(map(tuple, out.collect()))


def test_sparql_describe_matches_twin(spark):
    import duckdb

    import __spark_entry__ as entrymod
    from tests.oracle_compare import assert_df_matches_duckdb

    kg_sql = """SELECT * FROM (VALUES
        ('repo:a','DECLARES','e1'), ('repo:a','DECLARES','e3'),
        ('repo:b','DECLARES','e2'), ('e1','MENTIONED_WITH','e2'),
        ('e1','LINKED_TO','kb:Q1'), ('e2','LINKED_TO','kb:Q2')
        ) t(subj, pred, obj)"""
    con = duckdb.connect()
    for text in ("DESCRIBE e1 e3",
                 "DESCRIBE ?e WHERE { ?r DECLARES ?e "
                 "FILTER NOT EXISTS { ?e LINKED_TO ?kb } }"):
        assert_df_matches_duckdb(
            sparql(_graph(spark), text), con,
            entrymod._kg_sparql_oracle(text, kg_sql=kg_sql),
            name=text)


def test_sparql_describe_errors(spark):
    t = _graph(spark)
    with pytest.raises(ValueError, match="at least one term"):
        sparql(t, "DESCRIBE")
    with pytest.raises(ValueError, match="needs a WHERE pattern"):
        sparql(t, "DESCRIBE ?e")
    with pytest.raises(ValueError, match="not bound by the pattern"):
        sparql(t, "DESCRIBE ?e WHERE { ?x ?p ?y }")
    with pytest.raises(ValueError, match="single BGP group"):
        sparql(t, "DESCRIBE ?a WHERE { { ?a P ?b } UNION { ?a Q ?b } }")


def test_parse_path_alternation_token_and_empty_group():
    # (P1|P2)+ is one token (the tokenizer's altpath class), so the
    # parenthesized-closure form works from text; a group without
    # triple patterns raises the promised parse error instead of a
    # downstream TypeError
    assert tokenize("?a ^(P|Q)+ ?b") == ["?a", "^(P|Q)+", "?b"]
    kw = parse_sparql("SELECT * WHERE { ?a (P|Q)+ ?b }")
    assert kw["pattern"] == [("?a", "(P|Q)+", "?b")]
    for bad in ('ASK { VALUES ?x { "a" } }',
                "CONSTRUCT { ?a P ?b } WHERE { OPTIONAL { ?a P ?b } }"):
        with pytest.raises(ValueError, match="at least one triple"):
            parse_sparql(bad)


def test_sparql_alternation_closure_from_text(spark):
    t = _triples(spark, [
        ("a", "P", "b", 1), ("b", "Q", "c", 1), ("c", "P", "d", 1),
    ])
    out = sparql(t, "SELECT ?x WHERE { a (P|Q)+ ?x }")
    assert sorted(r["x"] for r in out.collect()) == ["b", "c", "d"]
    out = sparql(t, "SELECT ?x WHERE { d ^(P|Q)+ ?x }")
    assert sorted(r["x"] for r in out.collect()) == ["a", "b", "c"]


def test_tokenize_sequence_paths():
    # plain sequences are single word tokens already; the seqpath
    # class covers paren-alternation segments and keeps modifiers
    assert tokenize("?a D/M ?b") == ["?a", "D/M", "?b"]
    assert tokenize("?a ^D/M+ ?b") == ["?a", "^D/M+", "?b"]
    assert tokenize("?a D/(M|L)/X? ?b") == ["?a", "D/(M|L)/X?", "?b"]
    assert tokenize("?a (M|L)?/D ?b") == ["?a", "(M|L)?/D", "?b"]
    # zero-or-one on a plain pred and on an alternation
    assert tokenize("?a P? ?b") == ["?a", "P?", "?b"]
    assert tokenize("?a (P|Q)? ?b") == ["?a", "(P|Q)?", "?b"]


def test_sparql_sequence_path_from_text(spark):
    out = sparql(_graph(spark),
                 "SELECT ?r ?kb WHERE { ?r DECLARES/LINKED_TO ?kb }")
    assert sorted(tuple(r) for r in out.collect()) == [
        ("repo:a", "kb:Q1"), ("repo:b", "kb:Q2")]
    # paren-alternation segment + trailing plain segment
    out = sparql(
        _graph(spark),
        "SELECT ?r ?kb WHERE { "
        "?r DECLARES/(MENTIONED_WITH|LINKED_TO) ?kb }")
    assert sorted(tuple(r) for r in out.collect()) == [
        ("repo:a", "e2"), ("repo:a", "kb:Q1"), ("repo:b", "kb:Q2")]


def test_sparql_zero_or_one_from_text(spark):
    out = sparql(
        _graph(spark),
        'SELECT ?x WHERE { e1 MENTIONED_WITH? ?x }')
    assert sorted(r["x"] for r in out.collect()) == ["e1", "e2"]


def test_sparql_sequence_error_surface(spark):
    t = _graph(spark)
    with pytest.raises(ValueError, match="alternation of sequences"):
        sparql(t, "SELECT * WHERE { ?a P|Q/R ?b }")
    with pytest.raises(ValueError, match="closure over a sequence"):
        sparql(t, "SELECT * WHERE { ?a (P/Q)+ ?b }")
    with pytest.raises(ValueError, match="empty segment"):
        sparql(t, "SELECT * WHERE { ?a P//Q ?b }")


def test_sparql_minus_exists_negset_from_text(spark):
    t = _graph(spark)
    # MINUS: declared entities that are not KB-linked
    out = sparql(t, """
        SELECT ?r ?e WHERE { ?r DECLARES ?e MINUS { ?e LINKED_TO ?kb } }
    """)
    assert sorted(map(tuple, out.collect())) == [("repo:a", "e3")]
    # FILTER EXISTS: declared entities WITH a co-mention partner
    out = sparql(t, """
        SELECT ?e WHERE { ?r DECLARES ?e
                          FILTER EXISTS { ?e MENTIONED_WITH ?x } }
    """)
    assert sorted(map(tuple, out.collect())) == [("e1",)]
    # negated property set: every edge that is not a DECLARES
    out = sparql(t, 'SELECT ?s ?o WHERE { ?s !DECLARES ?o } ORDER BY ?s ?o')
    assert [tuple(r) for r in out.collect()] == [
        ("e1", "e2"), ("e1", "kb:Q1"), ("e2", "kb:Q2")]
    out = sparql(t, 'SELECT ?s ?o WHERE { ?s !(DECLARES|LINKED_TO) ?o }')
    assert [tuple(r) for r in out.collect()] == [("e1", "e2")]


def test_sparql_minus_exists_negset_match_twin(spark):
    import duckdb

    import __spark_entry__ as entrymod
    from tests.oracle_compare import assert_df_matches_duckdb

    kg_sql = """SELECT * FROM (VALUES
        ('repo:a','DECLARES','e1'), ('repo:a','DECLARES','e3'),
        ('repo:b','DECLARES','e2'), ('e1','MENTIONED_WITH','e2'),
        ('e1','LINKED_TO','kb:Q1'), ('e2','LINKED_TO','kb:Q2')
        ) t(subj, pred, obj)"""
    con = duckdb.connect()
    for text in (
        'SELECT ?r ?e WHERE { ?r DECLARES ?e MINUS { ?e LINKED_TO ?kb } }',
        """SELECT ?e WHERE { ?r DECLARES ?e
           FILTER EXISTS { ?e MENTIONED_WITH ?x } }""",
        """SELECT ?s (COUNT(*) AS ?n) WHERE { ?s !(DECLARES) ?o }
           GROUP BY ?s ORDER BY DESC(?n) ?s""",
        # MINUS whose group shares nothing: removes nothing
        'SELECT ?a ?b WHERE { ?a MENTIONED_WITH ?b MINUS { ?x LINKED_TO ?y } }',
        # both forms composed in one group
        """SELECT ?r ?e WHERE { ?r DECLARES ?e
           FILTER EXISTS { ?e !(MENTIONED_WITH) ?kb }
           MINUS { ?e MENTIONED_WITH ?x } }""",
    ):
        assert_df_matches_duckdb(
            sparql(_graph(spark), text), con,
            entrymod._kg_sparql_oracle(text, kg_sql=kg_sql),
            name=f"sparql:{text[:30]}")


def test_sparql_negset_tokenizer_and_errors(spark):
    # '!=' still tokenizes as the comparison operator, never a negset
    assert tokenize("FILTER (?a != ?b)") == [
        "FILTER", "(", "?a", "!=", "?b", ")"]
    assert tokenize("?s !(P|Q) ?o") == ["?s", "!(P|Q)", "?o"]
    assert tokenize("?s !P/Q ?o") == ["?s", "!P/Q", "?o"]
    t = _graph(spark)
    # the path layer's own errors surface through the text front-end
    with pytest.raises(ValueError, match="closure over a negated"):
        sparql(t, "SELECT ?s WHERE { ?s !P+ ?o }")
    with pytest.raises(ValueError, match="inverse arms"):
        sparql(t, "SELECT ?s WHERE { ?s !^P ?o }")
    # MINUS needs a braced group
    with pytest.raises(ValueError, match="expected"):
        sparql(t, "SELECT ?s WHERE { ?s DECLARES ?o MINUS ?o P ?x }")


def test_sparql_subquery_from_text(spark):
    t = _graph(spark)
    out = sparql(t, """
        SELECT ?r ?e ?n WHERE {
          ?r DECLARES ?e
          { SELECT ?e (COUNT(*) AS ?n) WHERE { ?e LINKED_TO ?kb }
            GROUP BY ?e }
        }""")
    assert out.columns == ["r", "e", "n"]
    assert sorted(map(tuple, out.collect())) == [
        ("repo:a", "e1", 1), ("repo:b", "e2", 1)]
    # outer modifiers compose over the joined solutions; the subquery
    # may come first in the group (triples follow it)
    out = sparql(t, """
        SELECT ?r (COUNT(*) AS ?m) WHERE {
          { SELECT ?e (COUNT(*) AS ?n) WHERE { ?e LINKED_TO ?kb }
            GROUP BY ?e }
          ?r DECLARES ?e . FILTER(?n >= "1")
        } GROUP BY ?r ORDER BY ?r""")
    assert [tuple(r) for r in out.collect()] == [
        ("repo:a", 1), ("repo:b", 1)]
    # a non-SELECT nested group inside a triple-bearing group raises
    with pytest.raises(ValueError, match="must be a subquery"):
        sparql(t, "SELECT ?a WHERE { ?a DECLARES ?b { ?a ?p ?c } }")


def test_sparql_subquery_matches_twin(spark):
    import duckdb

    import __spark_entry__ as entrymod
    from tests.oracle_compare import assert_df_matches_duckdb

    kg_sql = """SELECT * FROM (VALUES
        ('repo:a','DECLARES','e1'), ('repo:a','DECLARES','e3'),
        ('repo:b','DECLARES','e2'), ('e1','MENTIONED_WITH','e2'),
        ('e1','LINKED_TO','kb:Q1'), ('e2','LINKED_TO','kb:Q2')
        ) t(subj, pred, obj)"""
    con = duckdb.connect()
    for text in (
        # group-by subquery joined on the shared required var
        """SELECT ?r ?e ?n WHERE { ?r DECLARES ?e
           { SELECT ?e (COUNT(*) AS ?n)
             WHERE { ?e MENTIONED_WITH ?x } GROUP BY ?e } }""",
        # subquery with a closure path inside + outer path element
        # (prefixed recursive CTEs must not collide with the outer's)
        """SELECT ?a ?b ?n WHERE { ?a MENTIONED_WITH+ ?b
           { SELECT ?a (COUNT(*) AS ?n)
             WHERE { ?a MENTIONED_WITH+ ?z } GROUP BY ?a } }""",
        # subquery nested inside a subquery (two prefix levels)
        """SELECT ?r ?n WHERE { ?r DECLARES ?e
           { SELECT ?e (COUNT(*) AS ?n) WHERE { ?e MENTIONED_WITH ?x
             { SELECT ?x (COUNT(*) AS ?k)
               WHERE { ?x LINKED_TO ?q } GROUP BY ?x } }
             GROUP BY ?e } }""",
        # subqueries inside BOTH union branches
        """SELECT ?e ?n WHERE {
           { ?e LINKED_TO ?kb
             { SELECT ?e (COUNT(*) AS ?n)
               WHERE { ?e MENTIONED_WITH ?x } GROUP BY ?e } }
           UNION { ?e MENTIONED_WITH ?x
             { SELECT ?e (COUNT(*) AS ?n)
               WHERE { ?e LINKED_TO ?k } GROUP BY ?e } } }""",
    ):
        assert_df_matches_duckdb(
            sparql(_graph(spark), text), con,
            entrymod._kg_sparql_oracle(text, kg_sql=kg_sql),
            name=f"sparql:{text[:30]}")

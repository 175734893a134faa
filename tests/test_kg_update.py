"""SPARQL 1.1 Update (plans/kg_update.py): parser grammar + error
surface, the delete-then-insert-from-one-evaluation semantics, the
evidence_count discipline (kept rows keep theirs, new rows enter with
the derived binding count), and the generated DuckDB twin.  The
kg_sparql_update contract key hash-checks the modify form against
_kg_update_oracle at sf0.01; the graph fuzz
(test_kg_analytics_fuzz.py) runs the forms on random graphs."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ner_spark.plans.kg_update import apply_update, parse_update


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, evidence_count bigint"
    )


def _store(spark):
    return _triples(spark, [
        ("repo:r1", "DECLARES", "e1", 2),
        ("repo:r1", "DECLARES", "e2", 1),
        ("e1", "LINKED_TO", "kb:Q1", 3),
        ("e2", "LINKED_TO", "kb:Q2", 1),
        ("e1", "MENTIONED_WITH", "e2", 1),
    ])


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


# ------------------------------------------------------------ parsing


def test_parse_update_forms():
    assert parse_update("INSERT DATA { a P b . c Q d }") == {
        "form": "insert_data",
        "ins_template": [("a", "P", "b"), ("c", "Q", "d")],
    }
    assert parse_update('DELETE DATA { a P "x y" }') == {
        "form": "delete_data", "del_template": [("a", "P", "x y")],
    }
    assert parse_update("DELETE WHERE { ?e LINKED_TO ?kb }") == {
        "form": "delete_where",
        "del_template": [("?e", "LINKED_TO", "?kb")],
    }
    kw = parse_update(
        "DELETE { ?e LINKED_TO ?kb } INSERT { ?r MENTIONS_KB ?kb } "
        "WHERE { ?r DECLARES ?e . ?e LINKED_TO ?kb }")
    assert kw["form"] == "modify"
    assert kw["del_template"] == [("?e", "LINKED_TO", "?kb")]
    assert kw["ins_template"] == [("?r", "MENTIONS_KB", "?kb")]
    assert kw["where"]["pattern"] == [
        ("?r", "DECLARES", "?e"), ("?e", "LINKED_TO", "?kb")]
    # DELETE-only and INSERT-only modify forms
    assert parse_update(
        "DELETE { ?e ?p ?o } WHERE { ?e ?p ?o "
        'FILTER STRSTARTS(?e, "tmp:") }')["ins_template"] is None
    assert parse_update(
        "INSERT { ?r X ?e } WHERE { ?r DECLARES ?e }")["del_template"] \
        is None


def test_parse_update_errors():
    cases = [
        ("SELECT * WHERE { ?a ?p ?b }", "must start with INSERT or"),
        ("INSERT DATA { ?a P b }", "ground triples only"),
        ("DELETE DATA { a P ?b }", "ground triples only"),
        ("INSERT DATA { }", "empty template"),
        ("DELETE { ?a P+ ?b } WHERE { ?a P ?b }", "property path"),
        ("DELETE WHERE { ?a P/Q ?b }", "property path"),
        ("DELETE WHERE { ?a P ?b OPTIONAL { ?b Q ?c } }", "expected '}'"),
        ("INSERT { ?a P ?b } WHERE { ?a P ?b } TRAILING", "trailing"),
        ("DELETE { ?a P ?b }", "unexpected end|expected"),
    ]
    for text, msg in cases:
        with pytest.raises(ValueError, match=msg.split("|")[0]):
            parse_update(text)


# ---------------------------------------------------------- semantics


def test_insert_data_and_set_semantics(spark):
    out = apply_update(_store(spark),
                       "INSERT DATA { x P y . x P y . e1 LINKED_TO kb:Q1 }")
    rows = _rows(out)
    # the duplicate ground triple enters once, with multiplicity 2
    assert ("x", "P", "y", 2) in rows
    # inserting a present triple is a no-op (keeps its evidence)
    assert ("e1", "LINKED_TO", "kb:Q1", 3) in rows
    assert len(rows) == 6


def test_delete_data_absent_is_noop(spark):
    out = apply_update(_store(spark),
                       "DELETE DATA { e1 LINKED_TO kb:Q1 . zz P qq }")
    rows = _rows(out)
    assert ("e1", "LINKED_TO", "kb:Q1", 3) not in rows
    assert len(rows) == 4


def test_delete_where_pattern_is_template(spark):
    out = apply_update(_store(spark), "DELETE WHERE { ?e LINKED_TO ?kb }")
    assert all(r[1] != "LINKED_TO" for r in _rows(out))
    assert out.count() == 3


def test_modify_delete_then_insert_one_evaluation(spark):
    # the WHERE evaluates ONCE against the pre-update store: deleting
    # the LINKED_TO edges does not starve the INSERT template
    out = apply_update(_store(spark), """
        DELETE { ?e LINKED_TO ?kb }
        INSERT { ?r MENTIONS_KB ?kb }
        WHERE  { ?r DECLARES ?e . ?e LINKED_TO ?kb }
    """)
    rows = _rows(out)
    assert ("repo:r1", "MENTIONS_KB", "kb:Q1", 1) in rows
    assert ("repo:r1", "MENTIONS_KB", "kb:Q2", 1) in rows
    assert all(r[1] != "LINKED_TO" for r in rows)
    # untouched rows keep their evidence
    assert ("repo:r1", "DECLARES", "e1", 2) in rows


def test_modify_reinsert_survives_and_evidence_discipline(spark):
    # a triple both deleted and re-inserted survives, entering with
    # the DERIVED count (one binding here), not its old evidence
    out = apply_update(_store(spark), """
        DELETE { e1 LINKED_TO ?kb } INSERT { e1 LINKED_TO ?kb }
        WHERE { e1 LINKED_TO ?kb }
    """)
    rows = _rows(out)
    assert ("e1", "LINKED_TO", "kb:Q1", 1) in rows
    assert len(rows) == 5


def test_insert_evidence_is_binding_multiplicity(spark):
    # two declared entities share kb-link targets? here: each (r, e)
    # binding derives one (r, CO) triple — multiplicity 2 collapses
    out = apply_update(_store(spark),
                       "INSERT { ?r HAS_ENTITY ?r } "
                       "WHERE { ?r DECLARES ?e }")
    rows = _rows(out)
    assert ("repo:r1", "HAS_ENTITY", "repo:r1", 2) in rows


def test_update_null_template_instantiation_skipped(spark):
    # an unmatched OPTIONAL variable in the INSERT template skips the
    # instantiation (SPARQL's ill-formed-triple rule), not a null row
    out = apply_update(_store(spark), """
        INSERT { ?e GROUNDED ?kb }
        WHERE { ?e MENTIONED_WITH ?x OPTIONAL { ?e NO_SUCH ?kb } }
    """)
    assert all(None not in tuple(r) for r in out.collect())
    assert out.count() == 5


def test_update_where_union_and_path(spark):
    # the WHERE group is the full query grammar: union-of-groups and
    # property paths both drive templates
    out = apply_update(_store(spark), """
        INSERT { ?a REACHES ?b }
        WHERE { { ?a MENTIONED_WITH+ ?b } UNION { ?a DECLARES ?b } }
    """)
    rows = _rows(out)
    assert ("e1", "REACHES", "e2", 1) in rows
    assert ("repo:r1", "REACHES", "e1", 1) in rows


def test_update_validation_errors(spark):
    with pytest.raises(ValueError, match="does not bind"):
        apply_update(_store(spark),
                     "INSERT { ?zz P ?e } WHERE { ?r DECLARES ?e }")
    with pytest.raises(ValueError, match="unbound variable"):
        apply_update(_store(spark),
                     "DELETE { ?e ?p ?o } WHERE { ?e ?p ?o "
                     "FILTER(?nope = \"x\") }")


def test_chained_request_each_op_sees_predecessor(spark):
    from ner_spark.plans.kg_update import parse_update_request

    ops = parse_update_request(
        "INSERT DATA { a P b } ; DELETE WHERE { ?x P ?y } ; "
        "INSERT { ?r X ?e } WHERE { ?r DECLARES ?e }")
    assert [o["form"] for o in ops] == [
        "insert_data", "delete_where", "modify"]
    # op2's WHERE matches the triple op1 inserted (and the original
    # P edges are long gone by the time op3 runs)
    out = apply_update(_store(spark), """
        INSERT DATA { tmp:a MARK tmp:b } ;
        DELETE { ?x LINKED_TO ?k } INSERT { ?x WAS ?k }
        WHERE { ?x LINKED_TO ?k } ;
        DELETE WHERE { ?x WAS ?k }
    """)
    rows = _rows(out)
    assert ("tmp:a", "MARK", "tmp:b", 1) in rows
    assert not [r for r in rows if r[1] in ("LINKED_TO", "WAS")]
    # parse_update stays single-op
    with pytest.raises(ValueError, match="chains 2 operations"):
        parse_update("INSERT DATA { a P b } ; DELETE DATA { a P b }")
    # a ';' inside a template brace never splits
    with pytest.raises(ValueError, match="expected a triple term|term"):
        parse_update_request("INSERT DATA { a P b ; c Q d }")


def test_update_defaults_missing_evidence_to_one(spark):
    tri = spark.createDataFrame([("a", "P", "b")],
                                "subj string, pred string, obj string")
    out = apply_update(tri, "INSERT DATA { c Q d }")
    assert _rows(out) == [("a", "P", "b", 1), ("c", "Q", "d", 1)]


def test_update_matches_generated_twin(spark):
    import duckdb

    import __spark_entry__ as entrymod
    from tests.oracle_compare import assert_df_matches_duckdb

    rows = [("repo:r1", "DECLARES", "e1", 2),
            ("repo:r1", "DECLARES", "e2", 1),
            ("e1", "LINKED_TO", "kb:Q1", 3),
            ("e1", "MENTIONED_WITH", "e2", 1),
            ("e2", "LINKED_TO", "kb:Q2", 1)]
    tri = _triples(spark, rows)
    kg_sql = ("SELECT * FROM (VALUES " + ", ".join(
        f"('{s}','{p}','{o}',{e})" for s, p, o, e in rows)
        + ") AS t(subj, pred, obj, evidence_count)")
    con = duckdb.connect()
    for name, text in (
        ("modify", "DELETE { ?e LINKED_TO ?kb } "
         "INSERT { ?r MENTIONS_KB ?kb } "
         "WHERE { ?r DECLARES ?e . ?e LINKED_TO ?kb }"),
        ("ins_data", "INSERT DATA { x P y . x P y }"),
        ("del_where", "DELETE WHERE { ?e LINKED_TO ?kb }"),
        ("ins_path", "INSERT { ?a R ?b } "
         "WHERE { ?a MENTIONED_WITH* ?b }"),
    ):
        assert_df_matches_duckdb(
            apply_update(tri, text), con,
            entrymod._kg_update_oracle(text, kg_sql=kg_sql),
            name=f"kg_update:{name}")

"""The provenance-quads view of the staged job: graph = the origin
(base / edit:NNNNNN) of every CURRENT triple, exactly consistent with
the folded triple view, and queryable with SPARQL GRAPH blocks."""

from __future__ import annotations

import shutil

import pytest

from ner_spark.plans.job import KgJob
from ner_spark.sources.fixtures import source_table


@pytest.fixture()
def out_dir(tmp_path):
    d = str(tmp_path / "kg")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _spo(df):
    return {(r.subj, r.pred, r.obj) for r in df.collect()}


def test_quads_match_triples_and_attribute_edits(spark, out_dir):
    src = source_table(spark, n_rows=30)
    job = KgJob(spark, out_dir, run_id="r1")
    job.run(src)

    # pre-edit: everything is base
    q0 = job.quads()
    assert q0.where("graph != 'base'").count() == 0
    assert _spo(q0) == _spo(job.triples())

    # an insert edit, then a delete edit
    victim = job.triples().where("pred = 'DECLARES'").first()
    job.sparql_update('INSERT DATA { "x:new" "REL" "x:other" }')
    job.sparql_update(
        'DELETE DATA { "%s" "%s" "%s" }'
        % (victim.subj, victim.pred, victim.obj))

    q1 = job.quads()
    rows = {(r.subj, r.pred, r.obj): r.graph for r in q1.collect()}
    # quads view == folded triple view, row for row
    assert set(rows) == _spo(job.triples())
    # the insert is attributed to its edit, the delete is gone
    assert rows[("x:new", "REL", "x:other")].startswith("edit:")
    assert (victim.subj, victim.pred, victim.obj) not in rows
    # untouched triples stay attributed to base
    assert sum(1 for g in rows.values() if g == "base") == len(rows) - 1

    # evidence survives attribution (same totals as the fold)
    t_ev = {(r.subj, r.pred, r.obj): r.evidence_count
            for r in job.triples().collect()}
    q_ev = {(r.subj, r.pred, r.obj): r.evidence_count
            for r in q1.collect()}
    assert t_ev == q_ev


def test_reinsert_attributes_to_reinserting_edit(spark, out_dir):
    src = source_table(spark, n_rows=30)
    job = KgJob(spark, out_dir, run_id="r1")
    job.run(src)
    victim = job.triples().where("pred = 'LINKED_TO'").first()
    t = (victim.subj, victim.pred, victim.obj)
    job.sparql_update('DELETE DATA { "%s" "%s" "%s" }' % t)
    job.sparql_update('INSERT DATA { "%s" "%s" "%s" }' % t)
    rows = {(r.subj, r.pred, r.obj): r.graph
            for r in job.quads().collect()}
    assert rows[t].startswith("edit:")
    # inserting an ALREADY-PRESENT triple leaves attribution standing
    other = next(k for k in rows if k != t and rows[k] == "base")
    job.sparql_update('INSERT DATA { "%s" "%s" "%s" }' % other)
    rows2 = {(r.subj, r.pred, r.obj): r.graph
             for r in job.quads().collect()}
    assert rows2[other] == "base"


def test_sparql_provenance_regime(spark, out_dir):
    src = source_table(spark, n_rows=30)
    job = KgJob(spark, out_dir, run_id="r1")
    job.run(src)
    job.sparql_update('INSERT DATA { "x:a" "REL" "x:b" . '
                      '"x:b" "REL" "x:c" }')

    out = job.sparql(
        "SELECT ?g (COUNT(?s) AS ?n) WHERE { GRAPH ?g { ?s REL ?o } } "
        "GROUP BY ?g", provenance=True)
    rows = {r.g: r.n for r in out.collect()}
    assert list(rows.values()) == [2]
    assert next(iter(rows)).startswith("edit:")

    # plain --sparql still works (no graph column in the triple view)
    assert job.sparql(
        "ASK { x:a REL ?o }", provenance=True).collect()[0][0] is True
    with pytest.raises(ValueError, match="mutually exclusive"):
        job.sparql("ASK { ?s REL ?o }", entailed=True, provenance=True)


def test_provenance_var_graph_closure(spark, out_dir):
    """Property-path closure under a VARIABLE graph over the COMMITTED
    provenance view — the parquet-backed relation carries origin-plan
    constraints (partition filters, the lit('base') projection) that
    the in-memory fuzz never has; pins the Spark 4.1 Union
    constraint-rewrite scrub inside path_closure's loop."""
    from ner_spark.sources.fixtures import source_table

    job = KgJob(spark, out_dir, run_id="r1")
    job.run(source_table(spark, n_rows=30))
    job.sparql_update('INSERT DATA { "x:a" "HOP" "x:b" . '
                      '"x:b" "HOP" "x:c" }')
    out = job.sparql(
        "SELECT ?g ?a ?b WHERE { GRAPH ?g { ?a HOP+ ?b } }",
        provenance=True)
    got = {tuple(r) for r in out.collect()}
    assert got == {
        ("edit:000001", "x:a", "x:b"),
        ("edit:000001", "x:b", "x:c"),
        ("edit:000001", "x:a", "x:c"),
    }

"""N-Triples export (plans/kg_export.py): escape round-trip, line
shapes (data + reified evidence), the byte-stable single-file form,
and the staged-job surface (KgJob.export_ntriples reads the committed
table with SPARQL-Update edits folded in)."""

from __future__ import annotations

import glob

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ner_spark.plans.kg_export import (
    _EDGE_ESCAPES,
    escape_term,
    ntriples_lines,
    ntriples_save,
    unescape_term,
)


def _triples(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, pred string, obj string, evidence_count bigint"
    )


@given(st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_escape_roundtrip(s):
    e = escape_term(s)
    assert unescape_term(e) == s
    # escaped output never contains a forbidden IRIREF character
    assert not (set(e) & set(' <>"\\'))


def test_escape_is_injective_on_the_tricky_cases():
    # '%' escapes first, so pre-escaped-looking input stays distinct
    assert escape_term("%20") != escape_term(" ")
    assert unescape_term(escape_term("%20")) == "%20"
    # the edge-id chain also escapes '/'
    chain = "a/b"
    for raw, esc in _EDGE_ESCAPES:
        chain = chain.replace(raw, esc)
    assert chain == "a%2Fb"


def test_ntriples_lines_shapes(spark):
    t = _triples(spark, [("repo:a b", "DEC<L>%S", 'e"1\\x/y', 3)])
    data = [r["line"] for r in ntriples_lines(t).collect()]
    assert data == [
        "<urn:ner:repo:a%20b> <urn:ner:DEC%3CL%3E%25S> "
        "<urn:ner:e%221%5Cx/y> ."]
    both = sorted(
        r["line"] for r in ntriples_lines(t, evidence=True).collect())
    assert len(both) == 2
    # the reified evidence subject escapes '/' inside terms, so the
    # edge id splits unambiguously on '/'
    assert both[0] == (
        "<urn:ner:edge:repo:a%20b/DEC%3CL%3E%25S/e%221%5Cx%2Fy> "
        '<urn:ner:evidence_count> '
        '"3"^^<http://www.w3.org/2001/XMLSchema#integer> .')
    # custom base; bad bases raise
    alt = ntriples_lines(t, base="http://x.test/kg#").collect()
    assert alt[0]["line"].startswith("<http://x.test/kg#repo")
    with pytest.raises(ValueError, match="forbids"):
        ntriples_lines(t, base="bad base")


def test_ntriples_single_file_is_byte_stable(spark, tmp_path):
    t = _triples(spark, [
        ("b", "P", "c", 1), ("a", "P", "b", 2), ("c", "Q", "a", 1),
    ]).repartition(4)
    p1, p2 = str(tmp_path / "x1"), str(tmp_path / "x2")
    ntriples_save(t, p1, evidence=True, single_file=True)
    ntriples_save(t, p2, evidence=True, single_file=True)

    def read(p):
        parts = sorted(glob.glob(p + "/part-*"))
        assert len(parts) == 1
        return open(parts[0], "rb").read()

    assert read(p1) == read(p2)
    assert read(p1).decode().splitlines() == sorted(
        read(p1).decode().splitlines())


def test_ntriples_parse_roundtrip(spark):
    from ner_spark.plans.kg_export import ntriples_parse

    t = _triples(spark, [
        ("repo:a b", "DEC<L>%S", 'e"1\\x/y', 3),
        ("a", "P", "b", 1), ("x/y", "Q/R", "z", 7),
    ])
    # evidence=True round-trips counts exactly (solidus terms incl.)
    back = ntriples_parse(ntriples_lines(t, evidence=True))
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, t.collect()))
    # evidence=False round-trips edges with count defaulting to 1
    b2 = ntriples_parse(ntriples_lines(t))
    assert sorted(r["evidence_count"] for r in b2.collect()) == [1, 1, 1]
    # comments and blank lines are permitted
    extra = spark.createDataFrame([("# c",), ("",)], "line string")
    assert ntriples_parse(
        ntriples_lines(t).unionAll(extra)).count() == 3


def test_ntriples_parse_strictness(spark):
    from ner_spark.plans.kg_export import ntriples_parse

    t = _triples(spark, [("a", "P", "b", 1)])
    foreign = spark.createDataFrame(
        [("<http://other/a> <http://other/b> <http://other/c> .",),
         ("not a triple at all",)], "line string")
    mixed = ntriples_lines(t).unionAll(foreign)
    # strict: one validation pass, raises listing offenders
    with pytest.raises(ValueError, match="foreign N-Triples"):
        ntriples_parse(mixed)
    # non-strict ingests what it can
    out = ntriples_parse(mixed, strict=False)
    assert [tuple(r) for r in out.collect()] == [("a", "P", "b", 1)]
    # a different base accepts its own lines and rejects urn:ner ones
    alt = ntriples_parse(
        ntriples_lines(t, base="urn:x:"), base="urn:x:")
    assert [tuple(r) for r in alt.collect()] == [("a", "P", "b", 1)]
    with pytest.raises(ValueError, match="foreign"):
        ntriples_parse(ntriples_lines(t), base="urn:x:")


def test_job_export_folds_committed_edits(spark, tmp_path):
    from ner_spark.plans.job import KgJob
    from ner_spark.sources.fixtures import source_table

    out = str(tmp_path / "kg")
    job = KgJob(spark, out, run_id="r1")
    job.run(source_table(spark, n_rows=24))
    n0 = job.triples().count()
    exp = str(tmp_path / "nt")
    job.export_ntriples(exp)
    lines = spark.read.text(exp)
    assert lines.count() == n0
    # every line is a well-formed data line under the default base
    bad = lines.where(
        ~lines["value"].rlike(r"^<urn:ner:[^ ]+> <urn:ner:[^ ]+> "
                              r"<urn:ner:[^ ]+> \.$")).count()
    assert bad == 0
    # a committed SPARQL-Update edit is visible in a fresh export
    job.sparql_update('INSERT DATA { x:new P:edge y:new }')
    exp2 = str(tmp_path / "nt2")
    job.export_ntriples(exp2, evidence=True)
    lines2 = [r["value"] for r in spark.read.text(exp2).collect()]
    assert ("<urn:ner:x:new> <urn:ner:P:edge> <urn:ner:y:new> ."
            in lines2)
    assert len(lines2) == 2 * (n0 + 1)


def test_job_import_adopts_external_graph(spark, tmp_path):
    from ner_spark.plans.job import KgJob
    from ner_spark.sources.fixtures import source_table

    # build → export (with evidence) → import into a FRESH output:
    # the adopted table is identical, and the whole query stack works
    src_out = str(tmp_path / "src")
    job = KgJob(spark, src_out, run_id="r1")
    built = job.run(source_table(spark, n_rows=24))
    nt = str(tmp_path / "nt")
    job.export_ntriples(nt, evidence=True)

    imp_out = str(tmp_path / "imp")
    job2 = KgJob(spark, imp_out, run_id="r2")
    adopted = job2.import_ntriples(nt)
    assert sorted(map(tuple, adopted.collect())) == \
        sorted(map(tuple, built.collect()))
    # SPARQL + analytics run over the imported table
    n = job2.sparql(
        "SELECT (COUNT(*) AS ?n) WHERE { ?s ?p ?o }").collect()[0]["n"]
    assert n == built.count()
    assert job2.analytics()["entity_degree"] > 0
    # the edit ledger applies; document-delta maintenance refuses
    job2.sparql_update("INSERT DATA { a:x P:y b:z }")
    assert job2.triples().count() == n + 1
    with pytest.raises(ValueError, match="IMPORTED graph"):
        job2.update(source_table(spark, n_rows=30))
    assert job2.compact() == 0  # nothing to fold; safe no-op
    # a second import refuses without force, proceeds with it
    with pytest.raises(ValueError, match="already holds"):
        KgJob(spark, imp_out, run_id="r3").import_ntriples(nt)
    forced = KgJob(spark, imp_out, run_id="r4",
                   force=True).import_ntriples(nt)
    assert forced.count() == built.count()


def test_job_import_collapses_duplicate_lines(spark, tmp_path):
    from ner_spark.plans.job import KgJob

    t = _triples(spark, [("a", "P", "b", 3)])
    lines = ntriples_lines(t, evidence=True)
    doubled = lines.unionAll(lines)  # hand-edited file repeats lines
    job = KgJob(spark, str(tmp_path / "kg"), run_id="d1")
    out = job.import_ntriples(doubled)
    assert [tuple(r) for r in
            out.select("subj", "pred", "obj",
                       "evidence_count").collect()] == [("a", "P", "b", 3)]


# --------------------------------------------------------------- N-Quads

NASTY_QUADS = [
    ("g one", "a/b", "P%2F", "x y", 2),   # space, solidus, literal %2F
    ("g<>", 'q"uote', "\\back", "<угол>", 1),  # forbidden chars, unicode
    ("g1", "plain", "P", "obj", 7),
]


def test_nquads_roundtrip_nasty_terms(spark):
    from ner_spark.plans.kg_export import nquads_lines, nquads_parse

    q = spark.createDataFrame(
        NASTY_QUADS, "graph string, subj string, pred string, "
                     "obj string, evidence_count long")
    back = nquads_parse(nquads_lines(q, evidence=True))
    assert sorted(map(tuple, back.collect())) == sorted(NASTY_QUADS)
    # without evidence lines every count defaults to 1
    back1 = nquads_parse(nquads_lines(q, evidence=False))
    assert {r.evidence_count for r in back1.collect()} == {1}


def test_nquads_strictness(spark):
    from ner_spark.plans.kg_export import nquads_lines, nquads_parse

    q = spark.createDataFrame(
        [("g1", "a", "P", "b", 1)],
        "graph string, subj string, pred string, obj string, "
        "evidence_count long")
    lines = nquads_lines(q).unionAll(spark.createDataFrame(
        [("<http://foreign> <p> <o> <g> .",),
         ("# a comment",), ("",), ("garbage",)], "line string"))
    with pytest.raises(ValueError, match="N-Quads"):
        nquads_parse(lines).collect()
    kept = nquads_parse(lines, strict=False)
    assert [tuple(r) for r in kept.collect()] == [("g1", "a", "P", "b", 1)]


def test_nquads_single_file_byte_stable(spark, tmp_path):
    from ner_spark.plans.kg_export import nquads_parse, nquads_save

    q = spark.createDataFrame(
        NASTY_QUADS, "graph string, subj string, pred string, "
                     "obj string, evidence_count long")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    nquads_save(q, p1, evidence=True, single_file=True)
    nquads_save(q, p2, evidence=True, single_file=True)
    t1 = spark.read.text(p1).orderBy("value").collect()
    t2 = spark.read.text(p2).orderBy("value").collect()
    assert t1 == t2 and len(t1) == 6
    back = nquads_parse(spark.read.text(p1))
    assert sorted(map(tuple, back.collect())) == sorted(NASTY_QUADS)


def test_job_quads_export_roundtrip(spark, tmp_path):
    from ner_spark.plans.job import KgJob
    from ner_spark.plans.kg_export import nquads_parse, nquads_save
    from ner_spark.sources.fixtures import source_table

    job = KgJob(spark, str(tmp_path / "kg"), run_id="r1")
    job.run(source_table(spark, n_rows=30))
    job.sparql_update('INSERT DATA { "x:a" "REL" "x:b" }')
    quads = job.quads()
    path = str(tmp_path / "nq")
    nquads_save(quads, path, evidence=True)
    back = nquads_parse(spark.read.text(path))
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, quads.collect()))

"""The --entail layer of the staged job: the materialized RDFS
closure + SHACL validation views, their state-token staleness guard
(an edit after materialization must not serve the stale closure), and
the entailment-regime SPARQL surface."""

from __future__ import annotations

import shutil

import pytest

from ner_spark.plans.job import KgJob
from ner_spark.plans.kg_infer import RDF_TYPE, entail, ontology
from ner_spark.plans.kg_validate import shapes, validate
from ner_spark.sources.fixtures import source_table


@pytest.fixture()
def out_dir(tmp_path):
    d = str(tmp_path / "kg")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_entailment_requires_committed_materialize(spark, out_dir):
    job = KgJob(spark, out_dir, run_id="r1")
    with pytest.raises(ValueError, match="materialize"):
        job.entailment()


def test_entailment_views_match_operators(spark, out_dir):
    src = source_table(spark, n_rows=40)
    job = KgJob(spark, out_dir, run_id="r1")
    triples = job.run(src)

    counts = job.entailment()
    assert set(counts) == {"ontology", "triples", "violations"}
    ent_view = spark.read.parquet(f"{out_dir}/entailment/triples")
    vio_view = spark.read.parquet(f"{out_dir}/entailment/violations")
    want_ent = entail(triples, ontology(spark))
    assert _rows(ent_view) == _rows(want_ent)
    assert _rows(vio_view) == _rows(validate(want_ent, shapes(spark)))
    assert counts["triples"] == want_ent.count()
    # base triples all present and un-inferred; closure strictly grows
    n_base = triples.count()
    assert ent_view.where("NOT inferred").count() > n_base  # + ontology
    assert ent_view.count() > n_base

    # lineage rows landed
    m = spark.read.parquet(f"{out_dir}/metrics")
    stages = {r.stage for r in m.select("stage").distinct().collect()}
    assert {"entailment_triples", "entailment_violations"} <= stages


def test_entailed_triples_serves_fresh_view_then_detects_edits(
    spark, out_dir
):
    src = source_table(spark, n_rows=30)
    job = KgJob(spark, out_dir, run_id="r1")
    job.run(src)
    job.entailment()

    # fresh: the committed view backs the read
    ent0 = job.entailed_triples()
    assert _rows(ent0) == _rows(
        spark.read.parquet(f"{out_dir}/entailment/triples")
        .select("subj", "pred", "obj"))

    # an edit lands AFTER materialization: the stale view must NOT be
    # served — the new entity's inferred type has to appear
    job.sparql_update(
        'INSERT DATA { "ent:zz_new" "INSTANCE_OF" "PER" }')
    ent1 = _rows(job.entailed_triples())
    assert ("ent:zz_new", RDF_TYPE, "PER") in ent1
    assert ("ent:zz_new", RDF_TYPE, "class:Agent") in ent1  # inferred
    assert ("ent:zz_new", RDF_TYPE, "class:Thing") in ent1  # 2-hop

    # re-materializing refreshes the token; the view serves again and
    # contains the edit's consequences
    job.entailment()
    ent2 = spark.read.parquet(f"{out_dir}/entailment/triples")
    assert ("ent:zz_new", RDF_TYPE, "class:Agent") in {
        (r.subj, r.pred, r.obj) for r in ent2.collect()
    }


def test_sparql_entailment_regime(spark, out_dir):
    src = source_table(spark, n_rows=30)
    job = KgJob(spark, out_dir, run_id="r1")
    job.run(src)

    q = ("SELECT ?e WHERE { ?e INSTANCE_OF class:Agent } "
         "ORDER BY ?e LIMIT 5")
    # plain regime: class:Agent has no asserted members
    assert job.sparql(q).count() == 0
    # entailment regime (on the fly — no materialized view yet)
    got_fly = job.sparql(q, entailed=True)
    assert got_fly.count() == 5
    # and identical through the materialized view
    job.entailment()
    assert _rows(job.sparql(q, entailed=True)) == _rows(got_fly)


def test_custom_ontology_path_and_fallback(spark, out_dir, tmp_path):
    """--entail-ontology: an N-Triples schema file drives the closure,
    the ontology persists with the views, and the staleness fallback
    recomputes with the PERSISTED ontology, not the demo one."""

    src = source_table(spark, n_rows=30)
    job = KgJob(spark, out_dir, run_id="r1")
    job.run(src)

    # write a custom schema as N-Triples
    from ner_spark.plans.kg_export import ntriples_save

    onto_df = spark.createDataFrame(
        [("PER", "subClassOf", "k:Being"),
         ("DECLARES", "domain", "k:Repo")],
        "subj string, pred string, obj string")
    opath = str(tmp_path / "onto")
    ntriples_save(onto_df, opath)

    job.entailment(onto=opath)
    ent = spark.read.parquet(f"{out_dir}/entailment/triples")
    preds = {(r.pred, r.obj) for r in ent.where("inferred").collect()}
    assert (RDF_TYPE, "k:Repo") in preds      # custom domain rule
    assert not any(o == "class:Repository" for _, o in preds)  # no demo

    # staleness: an edit lands; the fallback must use the PERSISTED
    # custom ontology
    job.sparql_update('INSERT DATA { "x:n" "INSTANCE_OF" "PER" }')
    fresh = {(r.subj, r.pred, r.obj)
             for r in job.entailed_triples().collect()}
    assert ("x:n", RDF_TYPE, "k:Being") in fresh
    assert not any(o == "class:Agent" for _, _, o in fresh)


def test_incremental_entailment_matches_full(spark, out_dir):
    """After additive edits the incremental refresh must write views
    identical to the full recompute; a delete edit (retraction) must
    fall back to the full path and still agree."""
    src = source_table(spark, n_rows=30)
    job = KgJob(spark, out_dir, run_id="r1")
    job.run(src)
    job.entailment()  # initial full materialization

    # additive change: the increment path applies
    job.sparql_update('INSERT DATA { "ent:zz_inc" "INSTANCE_OF" "ORG" . '
                      '"repo:rX" "DECLARES" "ent:zz_inc" }')
    assert job._entail_incremental(
        __import__("ner_spark.plans.kg_infer",
                   fromlist=["ontology"]).ontology(spark)) is not None
    job.entailment(incremental=True)
    inc_view = _rows(spark.read.parquet(f"{out_dir}/entailment/triples"))
    job.entailment(incremental=False)
    full_view = _rows(spark.read.parquet(f"{out_dir}/entailment/triples"))
    assert inc_view == full_view
    assert ("ent:zz_inc", RDF_TYPE, "class:Agent", True) in inc_view
    assert ("repo:rX", RDF_TYPE, "class:Repository", True) in inc_view

    # retraction: the increment refuses, entailment() still succeeds
    victim = job.triples().where("pred = 'DECLARES'").first()
    job.sparql_update('DELETE DATA { "%s" "%s" "%s" }'
                      % (victim.subj, victim.pred, victim.obj))
    from ner_spark.plans.kg_infer import ontology as _onto

    assert job._entail_incremental(_onto(spark)) is None
    job.entailment(incremental=True)  # falls back to full internally
    after = _rows(spark.read.parquet(f"{out_dir}/entailment/triples"))
    job.entailment(incremental=False)
    assert after == _rows(
        spark.read.parquet(f"{out_dir}/entailment/triples"))

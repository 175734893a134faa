"""The --analytics layer of the staged job: derived graph-analytics
tables over the committed triples — install semantics, staleness after
an update, invariants vs the triples they derive from, and the CLI
surface."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from ner_spark.plans.job import KgJob
from ner_spark.sources.fixtures import source_table


@pytest.fixture()
def out_dir(tmp_path):
    d = str(tmp_path / "kg")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_analytics_requires_committed_materialize(spark, out_dir):
    job = KgJob(spark, out_dir, run_id="r1")
    with pytest.raises(ValueError, match="materialize"):
        job.analytics()


def test_analytics_tables_match_triples(spark, out_dir):
    src = source_table(spark, n_rows=40)
    job = KgJob(spark, out_dir, run_id="r1")
    triples = job.run(src)
    n_triples = triples.count()

    counts = job.analytics()
    assert set(counts) == {
        "entity_degree", "components", "pagerank", "comention_pmi",
        "related_topk", "triangles", "communities", "repo_distances",
        "hits", "link_prediction",
    }
    # HITS: same node universe as the degree table, L1-normalized
    ht = spark.read.parquet(f"{out_dir}/analytics/hits")
    assert ht.count() == counts["entity_degree"]
    assert abs(ht.agg(F.sum("hub")).first()[0] - 1.0) < 1e-9
    assert abs(ht.agg(F.sum("authority")).first()[0] - 1.0) < 1e-9
    # link prediction never proposes an existing edge
    lp = spark.read.parquet(f"{out_dir}/analytics/link_prediction")
    mat0 = spark.read.parquet(f"{out_dir}/materialize")
    existing = {
        (min(r.subj, r.obj), max(r.subj, r.obj)) for r in mat0.collect()
    }
    assert all((r.node_a, r.node_b) not in existing
               for r in lp.collect())

    deg = spark.read.parquet(f"{out_dir}/analytics/entity_degree")
    # degree conservation: both degree sums equal the triple count
    tot = deg.agg(F.sum("out_degree").alias("o"),
                  F.sum("in_degree").alias("i")).first()
    assert tot["o"] == tot["i"] == n_triples
    n_nodes = deg.count()
    assert counts["entity_degree"] == n_nodes

    comp = spark.read.parquet(f"{out_dir}/analytics/components")
    assert comp.count() == n_nodes  # same node universe
    # sizes partition the node set
    sizes = {r["component"]: r["component_size"]
             for r in comp.select("component", "component_size")
             .distinct().collect()}
    assert sum(sizes.values()) == n_nodes

    pr = spark.read.parquet(f"{out_dir}/analytics/pagerank")
    assert pr.count() == n_nodes
    assert abs(pr.agg(F.sum("rank")).first()[0] - 1.0) < 1e-9

    pmi = spark.read.parquet(f"{out_dir}/analytics/comention_pmi")
    n_mw = triples.where(F.col("pred") == "MENTIONED_WITH").count()
    assert pmi.count() == n_mw == counts["comention_pmi"]

    comm = spark.read.parquet(f"{out_dir}/analytics/communities")
    assert comm.count() == n_nodes  # same node universe
    assert comm.agg(F.sum("community_size")).first()[0] >= n_nodes

    dist = spark.read.parquet(f"{out_dir}/analytics/repo_distances")
    # every repo: vertex is a seed at hop 0; every reached node is a
    # real graph node within the hop bound
    n_repo = (triples.select("subj").where(F.col("subj").startswith("repo:"))
              .union(triples.select("obj")
                     .where(F.col("obj").startswith("repo:")))
              .distinct().count())
    assert dist.where(F.col("dist") == 0).count() == n_repo
    assert dist.count() <= n_nodes
    assert dist.agg(F.max("dist")).first()[0] <= 3

    # one lineage row per table
    stages = {r.stage for r in job.metrics().collect()}
    assert {"analytics_entity_degree", "analytics_components",
            "analytics_pagerank", "analytics_comention_pmi",
            "analytics_related_topk"} <= stages


def test_analytics_recomputes_after_update(spark, out_dir):
    # analytics are derived views: after an update() changed the
    # triples, a re-invocation must reflect the new graph, not a stale
    # marker-skipped one
    src = source_table(spark, n_rows=30)
    job = KgJob(spark, out_dir, run_id="r1")
    job.run(src)
    c1 = job.analytics()

    delta = source_table(spark, n_rows=45).where(F.col("path") > "")
    delta = delta.subtract(src)
    job.update(delta, update_id="u1")
    c2 = job.analytics()

    deg = spark.read.parquet(f"{out_dir}/analytics/entity_degree")
    tot = deg.agg(F.sum("out_degree").alias("o")).first()["o"]
    mat = spark.read.parquet(f"{out_dir}/materialize")
    assert tot == mat.count()
    # the corpus grew, so the graph did too
    assert c2["entity_degree"] >= c1["entity_degree"]


def test_stream_drain_refreshes_analytics(spark, tmp_path):
    # refresh_analytics=True rebuilds the derived views after a drain
    # that folded something — and leaves them untouched (no key in
    # stats) on an empty drain
    from ner_spark.sources.fixtures import build_source_rows
    from ner_spark.schemas import SOURCE_SCHEMA
    from ner_spark.streaming.ingest import drain_kg_updates

    kg, land, chk = (str(tmp_path / d) for d in ("kg", "land", "chk"))
    rows = build_source_rows(40)
    job = KgJob(spark, kg, run_id="base")
    job.run(spark.createDataFrame(rows[:25], SOURCE_SCHEMA))

    spark.createDataFrame(rows[25:], SOURCE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    stats = drain_kg_updates(spark, land, job, chk,
                             refresh_analytics=True, timeout_sec=300)
    assert stats["folded"] == 1 and "analytics" in stats

    # the refreshed views track the post-fold triples
    deg = spark.read.parquet(f"{kg}/analytics/entity_degree")
    mat = spark.read.parquet(f"{kg}/materialize")
    assert deg.agg(F.sum("out_degree")).first()[0] == mat.count()

    # nothing new landed: drain again, analytics untouched
    stats2 = drain_kg_updates(spark, land, job, chk,
                              refresh_analytics=True, timeout_sec=300)
    assert not stats2.get("folded") and "analytics" not in stats2


def test_analytics_cli_standalone(spark, out_dir, capsys, monkeypatch):
    # `--analytics` with no --input/--fixture-rows runs over an
    # already-committed output dir
    src = source_table(spark, n_rows=20)
    KgJob(spark, out_dir, run_id="r1").run(src)

    import ner_spark.plans.job as jobmod

    monkeypatch.setattr(
        "sys.argv",
        ["job", "--output", out_dir, "--analytics", "--run-id", "cli1"],
    )
    jobmod.main()
    outp = capsys.readouterr().out
    assert "stage=analytics" in outp and "pagerank=" in outp
    assert spark.read.parquet(
        f"{out_dir}/analytics/pagerank").count() > 0

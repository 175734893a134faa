"""KgJob's SPARQL-Update edit ledger: submits freeze crash-safely
under {out}/edits, every triple read folds them in order, a torn
submit is invisible, frozen deletes act as tombstones across document
maintenance, and the CLI surface works end-to-end."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ner_spark.plans.job import KgJob
from ner_spark.sources.fixtures import (
    SOURCE_SCHEMA,
    build_source_rows,
    source_table,
)

_N_BASE = 20


@pytest.fixture(scope="module")
def base_out(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg_edit") / "kg")
    KgJob(spark, out, run_id="e0").run(source_table(spark, n_rows=_N_BASE))
    return out


def _spo(df):
    return {(r["subj"], r["pred"], r["obj"]) for r in
            df.select("subj", "pred", "obj").collect()}


def test_sparql_update_folds_into_every_read(spark, base_out):
    job = KgJob(spark, base_out, run_id="e1")
    before = _spo(job.triples())
    linked = [t for t in before if t[1] == "LINKED_TO"]
    assert linked, "fixture KG should have KB links"
    seq = job.sparql_update("""
        DELETE { ?e LINKED_TO ?kb }
        INSERT { ?e WAS_LINKED ?kb . sentinel:edit1 MARKER "yes" }
        WHERE  { ?e LINKED_TO ?kb }
    """)
    assert seq == 1
    after = _spo(job.triples())
    assert not [t for t in after if t[1] == "LINKED_TO"]
    assert ("sentinel:edit1", "MARKER", "yes") in after
    assert {(s, "WAS_LINKED", o) for s, _, o in linked} <= after
    # the query/sparql surfaces read the same folded view
    assert job.query([("?e", "WAS_LINKED", "?kb")]).count() == len(linked)
    row = job.sparql(
        'ASK { sentinel:edit1 MARKER ?v }').first()
    assert bool(row["ask"]) is True
    meta = job.edits()[-1]
    assert meta["seq"] == 1 and meta["del_rows"] == len(linked)
    # evidence discipline: untouched rows keep their original counts
    base = job._read_committed(job._path("materialize"), partitioned=True)
    kept_ec = {tuple(r) for r in base.where("pred = 'DECLARES'")
               .select("subj", "pred", "obj", "evidence_count").collect()}
    now_ec = {tuple(r) for r in job.triples().where("pred = 'DECLARES'")
              .select("subj", "pred", "obj", "evidence_count").collect()}
    assert kept_ec == now_ec


def test_second_edit_sees_first_edits_store(spark, base_out):
    # SPARQL's store-chaining: edit 2's WHERE evaluates over the
    # edit-1-folded view, so it can match triples edit 1 inserted
    job = KgJob(spark, base_out, run_id="e2")
    seq = job.sparql_update("""
        DELETE { ?e WAS_LINKED ?kb } INSERT { ?e RELINKED ?kb }
        WHERE  { ?e WAS_LINKED ?kb }
    """)
    assert seq == 2
    after = _spo(job.triples())
    assert not [t for t in after if t[1] == "WAS_LINKED"]
    assert [t for t in after if t[1] == "RELINKED"]
    assert job.edit_ids() == [1, 2]


def test_torn_edit_is_invisible_and_seq_reused(spark, base_out):
    job = KgJob(spark, base_out, run_id="e3")
    torn = f"{base_out}/edits/000003"
    # simulate a crash between the frozen sides and the meta commit
    spark.createDataFrame([("x", "P", "y")],
                          "subj string, pred string, obj string") \
        .write.mode("overwrite").parquet(f"{torn}/del")
    assert job.edit_ids() == [1, 2]  # the torn edit is invisible
    n_before = job.triples().count()  # and the fold skips it cleanly
    seq = job.sparql_update('INSERT DATA { sentinel:edit3 MARKER "t" }')
    assert job.triples().count() == n_before + 1
    assert seq == 3  # the torn directory was overwritten, not skipped
    assert ("sentinel:edit3", "MARKER", "t") in _spo(job.triples())


def test_tombstone_survives_document_update(spark, base_out):
    # a frozen delete suppresses its (s,p,o) rows even after a
    # document update re-derives the base around them
    job = KgJob(spark, base_out, run_id="e4")
    assert not [t for t in _spo(job.triples()) if t[1] == "LINKED_TO"]
    rows = build_source_rows(_N_BASE + 6)[_N_BASE:]  # disjoint keys
    delta = spark.createDataFrame(rows, SOURCE_SCHEMA)
    job.update(delta, update_id="upd1")
    after = _spo(job.triples())
    # the delta's documents re-derive LINKED_TO rows in the BASE view…
    base = _spo(job._read_committed(job._path("materialize"),
                                    partitioned=True))
    new_links = {t for t in base if t[1] == "LINKED_TO"}
    assert new_links, "the update should re-derive KB links"
    # …but the folded view still suppresses the tombstoned subset and
    # keeps the sentinel inserts
    old_links = {t for t in new_links if t in after}
    assert ("sentinel:edit1", "MARKER", "yes") in after
    # every link present in the folded view must be NEW evidence the
    # frozen delete set never saw
    del_set = {(r["subj"], r["pred"], r["obj"])
               for r in job._read_edit_side(
                   f"{base_out}/edits/000001", "del").collect()}
    assert not (old_links & del_set)


def test_clear_edits_restores_base_derivation(spark, base_out):
    job = KgJob(spark, base_out, run_id="e5")
    n = job.clear_edits()
    assert n == 3
    assert job.edit_ids() == []
    spo = _spo(job.triples())
    assert [t for t in spo if t[1] == "LINKED_TO"]
    assert not [t for t in spo if t[0] == "sentinel:edit1"]


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_compact_edits_collapses_ledger(spark, base_out):
    # runs after clear_edits: the ledger restarts at seq 1
    job = KgJob(spark, base_out, run_id="c1")
    job.sparql_update("""
        DELETE { ?e LINKED_TO ?kb }
        INSERT { ?e WAS_LINKED ?kb . sentinel:c1 MARKER "a" }
        WHERE  { ?e LINKED_TO ?kb }
    """)
    job.sparql_update('INSERT DATA { sentinel:c2 MARKER "b" }')
    job.sparql_update("""
        DELETE { sentinel:c1 MARKER "a" } INSERT { sentinel:c1 MARKER "z" }
        WHERE  { sentinel:c1 MARKER "a" }
    """)
    assert job.edit_ids() == [1, 2, 3]
    before = sorted(map(tuple, job.triples().collect()))
    quads_before = sorted(map(tuple, job.quads().collect()))
    pre_antis = _plan(job.triples()).count("Join LeftAnti")
    n = job.compact_edits()
    assert n == 3
    assert job.edit_ids() == [4]
    # value-identical view, evidence included
    assert sorted(map(tuple, job.triples().collect())) == before
    # provenance survives: every surviving insert still attributes to
    # its ORIGIN edit, and base rows stay base
    assert sorted(map(tuple, job.quads().collect())) == quads_before
    # the whole point: the per-read fold is now ONE del anti-join +
    # one ins-dedup anti-join no matter how long the history was.
    # The plan STRING shows 3 LeftAnti because the del-folded `kept`
    # subtree prints again inside the ins-dedup's right branch — the
    # single-edit constant, while the 3-edit ledger printed more.
    plan = _plan(job.triples())
    assert plan.count("Join LeftAnti") == 3
    assert plan.count("Join LeftAnti") < pre_antis
    meta = job.edits()[-1]
    assert meta["op"] == "compact_edits" and meta["folded"] == [1, 2, 3]
    # idempotent: a second call is a no-op
    assert job.compact_edits() == 0


def test_compact_edits_crash_windows(spark, base_out):
    import shutil

    job = KgJob(spark, base_out, run_id="c2")
    # a leftover tmp dir (crash before rename) is invisible to the
    # ledger and swept by the next maintenance call
    tmp = f"{base_out}/edits/_compact_tmp"
    spark.createDataFrame([("j", "P", "k")],
                          "subj string, pred string, obj string") \
        .write.mode("overwrite").parquet(f"{tmp}/del")
    assert job.edit_ids() == [4]
    view = sorted(map(tuple, job.triples().collect()))
    job.sparql_update('INSERT DATA { sentinel:c3 MARKER "c" }')
    assert not job._exists(tmp)
    # crash AFTER the rename but BEFORE old-dir deletion: replaying
    # old edits then the compacted edit is value-identical (the
    # compacted edit re-applies the history idempotently)
    saved = f"{base_out}/edits_saved"
    shutil.copytree(f"{base_out}/edits/000004", f"{saved}/000004")
    shutil.copytree(f"{base_out}/edits/000005", f"{saved}/000005")
    n = job.compact_edits()
    assert n == 2 and job.edit_ids() == [6]
    after = sorted(map(tuple, job.triples().collect()))
    shutil.copytree(f"{saved}/000004", f"{base_out}/edits/000004")
    shutil.copytree(f"{saved}/000005", f"{base_out}/edits/000005")
    shutil.rmtree(saved)
    assert job.edit_ids() == [4, 5, 6]
    assert sorted(map(tuple, job.triples().collect())) == after
    # the next maintenance entry point finishes the cleanup
    job._maybe_finish_edit_compact()
    assert job.edit_ids() == [6]
    assert sorted(map(tuple, job.triples().collect())) == after


def test_recompaction_preserves_attribution(spark, base_out):
    # compacting a ledger that already contains a compacted edit keeps
    # the ORIGINAL per-edit attribution through the coalesce
    job = KgJob(spark, base_out, run_id="c3")
    job.sparql_update('INSERT DATA { sentinel:c4 MARKER "d" }')
    attribution_before = {
        (r["subj"], r["pred"], r["obj"]): r["graph"]
        for r in job.quads().where("graph != 'base'").collect()
    }
    assert job.compact_edits() == 2
    attribution_after = {
        (r["subj"], r["pred"], r["obj"]): r["graph"]
        for r in job.quads().where("graph != 'base'").collect()
    }
    assert attribution_after == attribution_before
    # distinct origin edits survive inside the single compacted dir
    assert len(set(attribution_after.values())) >= 2
    job.clear_edits()


def test_sparql_update_requires_committed_run(spark, tmp_path):
    job = KgJob(spark, str(tmp_path / "none"), run_id="e6")
    with pytest.raises(ValueError, match="no committed materialize"):
        job.sparql_update('INSERT DATA { a P b }')
    # grammar errors surface before any IO, even without a run
    with pytest.raises(ValueError, match="ground triples only"):
        job.sparql_update('INSERT DATA { ?a P b }')


def test_cli_sparql_update(spark, tmp_path, capsys, monkeypatch):
    from ner_spark.plans import job as jobmod

    out = str(tmp_path / "kg")
    KgJob(spark, out, run_id="c1").run(source_table(spark, n_rows=10))
    monkeypatch.setattr("sys.argv", [
        "job", "--output", out,
        "--sparql-update",
        'DELETE { ?e LINKED_TO ?kb } WHERE { ?e LINKED_TO ?kb }',
    ])
    jobmod.main()
    line = capsys.readouterr().out.splitlines()[-1]
    assert line.startswith("stage=sparql_update seq=1 deleted=")
    monkeypatch.setattr("sys.argv", [
        "job", "--output", out,
        "--sparql", "ASK { ?e LINKED_TO ?kb }",
    ])
    jobmod.main()
    outp = capsys.readouterr().out
    assert "false" in outp.lower()
    # --compact-edits collapses the ledger from the CLI; the folded
    # view is unchanged afterwards
    monkeypatch.setattr("sys.argv", [
        "job", "--output", out, "--sparql-update",
        'INSERT DATA { sentinel:cli MARKER "x" }',
    ])
    jobmod.main()
    capsys.readouterr()
    monkeypatch.setattr("sys.argv",
                        ["job", "--output", out, "--compact-edits"])
    jobmod.main()
    line = capsys.readouterr().out.splitlines()[-1]
    assert line.startswith("stage=compact_edits folded=2")
    job = KgJob(spark, out, run_id="cli2")
    assert job.edit_ids() == [3]
    spo = _spo(job.triples())
    assert not [t for t in spo if t[1] == "LINKED_TO"]
    assert ("sentinel:cli", "MARKER", "x") in spo

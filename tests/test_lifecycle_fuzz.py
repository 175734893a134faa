"""Randomized maintenance-lifecycle differential: any interleaving of
incremental updates (random flag combinations), derived-stage crash
injections, compactions, SPARQL edits, and plain-run recoveries must
end with exactly the triples of one fresh run over every document
whose delta committed (the base), plus an edit-folded view equal to
an independent python fold of the frozen edit deltas.  This is the whole-lifecycle analogue of the per-path pins
in test_job_update.py / test_job_compact.py: those check each branch
in isolation, this checks that the branches COMPOSE — sidecar
coverage, marker drops, folded deltas, and the resume coverage check
never disagree after an arbitrary history."""

from __future__ import annotations

import random
import shutil

import pytest

from ner_spark.plans.job import KgJob
from ner_spark.schemas import SOURCE_SCHEMA
from ner_spark.sources.fixtures import build_source_rows


@pytest.fixture()
def out_dir(tmp_path):
    d = str(tmp_path / "kg")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _triples_set(df):
    return sorted(map(tuple, df.collect()))


# 47 fires edit → update → edit → compact_edits → edit (a real ledger
# collapse with maintenance on both sides); 81 fires compact_edits →
# edit → edit → compact_edits → update (a DOUBLE collapse — the second
# folds a ledger already containing a compacted edit, exercising the
# attribution-preserving coalesce); 19 fires two plain edits
@pytest.mark.parametrize("seed", [11, 47, 19, 81])
def test_lifecycle_fuzz(spark, out_dir, seed):
    rng = random.Random(seed)
    rows = build_source_rows(96)
    base_n = 36
    base = spark.createDataFrame(rows[:base_n], SOURCE_SCHEMA)

    job = KgJob(spark, out_dir, run_id="b")
    job.run(base)
    applied_rows = list(rows[:base_n])

    lo = base_n
    last_update = None  # (update_id, chunk) — for idempotent retries
    for step in range(5):
        op = rng.choice(["update", "update", "compact", "crash_resume",
                         "retry", "edit", "edit", "compact_edits"])
        if op == "update" and lo < len(rows):
            n = rng.choice([8, 12, 16])
            chunk = rows[lo:lo + n]
            lo += n
            delta = spark.createDataFrame(chunk, SOURCE_SCHEMA)
            KgJob(spark, out_dir, run_id=f"u{step}").update(
                delta, update_id=f"d{step}",
                incremental=rng.random() < 0.75,
                merge_materialize=rng.random() < 0.75,
            )
            applied_rows.extend(chunk)
            last_update = (f"d{step}", chunk)
        elif op == "retry" and last_update is not None:
            # re-invoking a completed update must be a no-op whether
            # its delta still sits under updates/ or a compaction has
            # already folded it into the base (the ledger path)
            uid, chunk = last_update
            KgJob(spark, out_dir, run_id=f"rt{step}").update(
                spark.createDataFrame(chunk, SOURCE_SCHEMA), update_id=uid,
            )
        elif op == "edit":
            # a SPARQL edit anywhere in the history: frozen against
            # the view at submit time, folded into every later read
            txt = rng.choice([
                'DELETE { ?e LINKED_TO ?kb } '
                'WHERE { ?e LINKED_TO ?kb FILTER STRENDS(?kb, "1") }',
                f'INSERT DATA {{ sentinel:s{step} MARKER "m" }}',
                'DELETE { ?e INSTANCE_OF ?c } INSERT { ?e TYPED ?c } '
                'WHERE { ?e INSTANCE_OF ?c }',
            ])
            KgJob(spark, out_dir, run_id=f"e{step}").sparql_update(txt)
        elif op == "compact_edits":
            # ledger collapse anywhere in the history: the python
            # fold below replays whatever ledger remains, so this
            # holds only if the collapse is exactly equivalent
            KgJob(spark, out_dir, run_id=f"ce{step}").compact_edits()
        elif op == "compact":
            KgJob(spark, out_dir, run_id=f"c{step}").compact()
        else:
            # crash injection: lose a random derived commit marker,
            # then recover with the documented plain run()
            stage = rng.choice(["canonicalize", "materialize"])
            marker = f"{out_dir}/{stage}/_SUCCESS"
            if job._exists(marker):
                job._delete(marker)
            KgJob(spark, out_dir, run_id=f"r{step}").run(base)

    final = KgJob(spark, out_dir, run_id="final").run(base)
    fresh = KgJob(spark, out_dir + "_fresh", run_id="f").run(
        spark.createDataFrame(applied_rows, SOURCE_SCHEMA)
    )
    # edits never perturb the document-derived BASE…
    assert _triples_set(final) == _triples_set(fresh)
    # …and the edit-folded VIEW equals an independent python fold of
    # the frozen delete/insert sets over whatever base the history
    # ended with (tombstones re-suppress triples any compaction or
    # update re-derived; kept rows keep their evidence_count)
    job_v = KgJob(spark, out_dir, run_id="vf")
    state = {
        (r.subj, r.pred, r.obj): r.evidence_count
        for r in job_v._read_committed(job_v._path("materialize"),
                                       partitioned=True).collect()
    }
    for seq in job_v.edit_ids():
        b = f"{out_dir}/edits/{seq:06d}"
        dels = {(r.subj, r.pred, r.obj)
                for r in job_v._read_edit_side(b, "del").collect()}
        ins = {(r.subj, r.pred, r.obj): r.evidence_count
               for r in job_v._read_edit_side(b, "ins").collect()}
        state = {k: v for k, v in state.items() if k not in dels}
        for k, v in ins.items():
            state.setdefault(k, v)
    expected = sorted((s, p, o, c) for (s, p, o), c in state.items())
    got = sorted(map(tuple, job_v.triples().select(
        "subj", "pred", "obj", "evidence_count").collect()))
    assert got == expected

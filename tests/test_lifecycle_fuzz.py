"""Randomized maintenance-lifecycle differential: any interleaving of
incremental updates (random flag combinations), derived-stage crash
injections, compactions, and plain-run recoveries must end with
exactly the triples of one fresh run over every document whose delta
committed.  This is the whole-lifecycle analogue of the per-path pins
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


@pytest.mark.parametrize("seed", [11, 23])
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
                         "retry"])
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
    assert _triples_set(final) == _triples_set(fresh)

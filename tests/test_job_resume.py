"""Resumability tests (north rule): kill after stage k, relaunch,
final tables identical; metrics show skipped stages."""

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


def _triples_set(df):
    return sorted(map(tuple, df.collect()))


def test_full_run_then_resume_is_identical(spark, out_dir):
    src = source_table(spark, n_rows=51)
    job1 = KgJob(spark, out_dir, run_id="run1")
    t1 = _triples_set(job1.run(src))

    # simulate loss after stage 2: wipe canonicalize + materialize outputs
    shutil.rmtree(f"{out_dir}/canonicalize")
    shutil.rmtree(f"{out_dir}/materialize")

    job2 = KgJob(spark, out_dir, run_id="run2")
    t2 = _triples_set(job2.run(src))
    assert t1 == t2

    m = job2.metrics()
    # run2 skipped tokenize_tag and link (partition_id == -1 marker rows)
    skipped = {
        r.stage
        for r in m.where((F.col("run_id") == "run2") & (F.col("partition_id") == -1)).collect()
    } - {"source_integrity", "mentioned_with_truncation"}  # informational rows
    assert skipped == {"tokenize_tag", "link"}
    recomputed = {
        r.stage
        for r in m.where((F.col("run_id") == "run2") & (F.col("partition_id") >= 0)).collect()
    }
    assert recomputed == {"canonicalize", "materialize"}


def test_resume_preserves_column_order(spark, out_dir):
    # the materialize checkpoint is partitioned by pred; an inferred
    # resume read would move pred to the last column — the sidecar
    # schema read must pin the fresh-run order
    src = source_table(spark, n_rows=20)
    t1 = KgJob(spark, out_dir, run_id="r1").run(src)
    t2 = KgJob(spark, out_dir, run_id="r2").run(src)  # all stages skipped
    assert t2.columns == t1.columns
    assert _triples_set(t1) == _triples_set(t2)


def test_metrics_records_sha_ok(spark, out_dir):
    src = source_table(spark, n_rows=20)
    job = KgJob(spark, out_dir)
    job.run(src, last_stage="tokenize_tag")
    m = job.metrics().where(F.col("stage") == "tokenize_tag")
    assert m.count() >= 1
    assert all(r.content_sha_ok for r in m.collect())


def test_stage_partial_run(spark, out_dir):
    src = source_table(spark, n_rows=20)
    job = KgJob(spark, out_dir)
    mentions = job.run(src, last_stage="tokenize_tag")
    assert mentions.count() > 0
    # downstream stages not produced yet
    assert not job._committed("link")


def test_midstage_partial_write_is_recomputed(spark, out_dir):
    """Executor loss MID-stage: the stage dir has partial part-files but
    no _SUCCESS commit marker — the relaunch must recompute the stage
    from its input, never trust partial output."""
    import glob
    import os

    src = source_table(spark, n_rows=30)
    t1 = _triples_set(KgJob(spark, out_dir, run_id="a").run(src))

    os.remove(f"{out_dir}/link/_SUCCESS")
    parts = glob.glob(f"{out_dir}/link/part-*")
    assert parts
    os.remove(parts[0])  # partial data left behind
    shutil.rmtree(f"{out_dir}/canonicalize")
    shutil.rmtree(f"{out_dir}/materialize")

    job2 = KgJob(spark, out_dir, run_id="b")
    t2 = _triples_set(job2.run(src))
    assert t1 == t2

    m = job2.metrics()
    skipped = {
        r.stage
        for r in m.where((F.col("run_id") == "b") & (F.col("partition_id") == -1)).collect()
    }
    assert "tokenize_tag" in skipped and "link" not in skipped


def test_source_integrity_covers_zero_mention_docs(spark, out_dir):
    """A corrupted doc that yields no mentions must still fail the
    source-level integrity metric (the mentions-derived sha_ok cannot
    see it)."""
    src = source_table(spark, n_rows=12)
    corrupted = src.withColumn(
        "content",
        F.when(F.col("path").endswith("/0.txt"), F.lit("zzz qqq"))  # no entities
        .otherwise(F.col("content")),
    )
    job = KgJob(spark, out_dir, run_id="integ")
    job.run(corrupted, last_stage="tokenize_tag")
    m = job.metrics().where(F.col("stage") == "source_integrity").collect()
    assert len(m) == 1
    row = m[0]
    assert row.rows_in == 12 and row.rows_out == 11
    assert row.content_sha_ok is False


def test_resume_with_different_mode_refuses(spark, out_dir):
    src = source_table(spark, n_rows=12)
    KgJob(spark, out_dir, run_id="m1", mode="hybrid").run(src, last_stage="tokenize_tag")
    with pytest.raises(ValueError, match="checkpoints for"):
        KgJob(spark, out_dir, run_id="m2", mode="rules_only").run(
            src, last_stage="tokenize_tag"
        )
    # same params resume fine; --force with new params recomputes
    KgJob(spark, out_dir, run_id="m3", mode="hybrid").run(src, last_stage="tokenize_tag")
    KgJob(spark, out_dir, run_id="m4", mode="rules_only", force=True).run(
        src, last_stage="tokenize_tag"
    )


def test_force_param_change_invalidates_stale_checkpoints(spark, out_dir):
    """A forced run with different params that stops early must not
    leave downstream checkpoints from the OLD params committed under
    the NEW manifest (they would be silently reused on resume)."""
    src = source_table(spark, n_rows=24)
    KgJob(spark, out_dir, run_id="f1", mode="hybrid").run(src)  # full run

    job2 = KgJob(spark, out_dir, run_id="f2", mode="rules_only", force=True)
    job2.run(src, last_stage="tokenize_tag")  # stops before link
    # stale hybrid-mode downstream checkpoints were invalidated
    assert not job2._committed("link")
    assert not job2._committed("canonicalize")
    assert not job2._committed("materialize")

    # the resume (no force, new params in manifest) recomputes
    # downstream from the rules_only mentions — byte-identical to a
    # fresh rules_only run
    resumed = KgJob(spark, out_dir, run_id="f3", mode="rules_only").run(src)
    fresh = KgJob(spark, out_dir + "_fresh", run_id="ff", mode="rules_only").run(src)
    assert _triples_set(resumed) == _triples_set(fresh)


def test_force_param_change_refuses_with_committed_deltas(spark, out_dir):
    """force + different params with COMMITTED update deltas must
    refuse: dropping only the base markers would recompute the base
    with the new params while all_links() still unions delta
    checkpoints tagged with the OLD params — silently mixing outputs
    from two parameter sets.  After the deltas are deleted (the
    explicit operator decision), the forced recompute proceeds."""
    import shutil

    from ner_spark.schemas import SOURCE_SCHEMA
    from ner_spark.sources.fixtures import build_source_rows

    rows = build_source_rows(24)
    base = spark.createDataFrame(rows[:12], SOURCE_SCHEMA)
    delta = spark.createDataFrame(rows[12:], SOURCE_SCHEMA)
    KgJob(spark, out_dir, run_id="d1", mode="hybrid").run(base)
    KgJob(spark, out_dir, run_id="d2", mode="hybrid").update(
        delta, update_id="u1"
    )
    with pytest.raises(ValueError, match="update delta"):
        KgJob(spark, out_dir, run_id="d3", mode="rules_only",
              force=True).run(base)
    # manifest untouched by the refusal: the original params still resume
    KgJob(spark, out_dir, run_id="d4", mode="hybrid").run(base)

    shutil.rmtree(f"{out_dir}/updates")
    forced = KgJob(spark, out_dir, run_id="d5", mode="rules_only",
                   force=True).run(base)
    fresh = KgJob(spark, out_dir + "_fresh", run_id="d6",
                  mode="rules_only").run(base)
    assert _triples_set(forced) == _triples_set(fresh)


def test_prewarm_cleans_up_and_noops_on_resume(spark, out_dir):
    import os

    job = KgJob(spark, out_dir, run_id="pw")
    job.prewarm()
    # the warmup slice's parquet output must not survive
    assert not os.path.exists(f"{out_dir}/_prewarm")

    job.run(source_table(spark, n_rows=32), last_stage="tokenize_tag")
    # with stage 1 committed, prewarm is a no-op (resume skips the
    # stage, so there is nothing to warm) — it must not write anything
    job2 = KgJob(spark, out_dir, run_id="pw")
    job2.prewarm()
    assert not os.path.exists(f"{out_dir}/_prewarm")


def test_prewarm_fails_fast_on_manifest_mismatch(spark, out_dir):
    """An invalid resume (different mode, no force) must be rejected
    BEFORE the warmup slice runs, not ~26 s later in run()."""
    import os

    src = source_table(spark, n_rows=12)
    KgJob(spark, out_dir, run_id="pm1", mode="hybrid").run(
        src, last_stage="tokenize_tag"
    )
    with pytest.raises(ValueError, match="checkpoints for"):
        KgJob(spark, out_dir, run_id="pm2", mode="rules_only").prewarm()
    assert not os.path.exists(f"{out_dir}/_prewarm")


def test_fuzzy_canon_is_manifest_gated(spark, out_dir):
    """Flipping fuzzy canonicalization on a resume must not silently
    reuse checkpoints computed under the other identity semantics —
    and pre-fuzzy manifests (without the key) resume as fuzzy=False."""
    src = source_table(spark, n_rows=12)
    KgJob(spark, out_dir, run_id="fz1").run(src, last_stage="tokenize_tag")
    with pytest.raises(ValueError, match="checkpoints for"):
        KgJob(spark, out_dir, run_id="fz2", fuzzy_canon=True).run(
            src, last_stage="tokenize_tag"
        )
    # legacy manifest without the fuzzy keys: rewrite it the old way
    import json as _json

    spark.createDataFrame(
        [(_json.dumps({"mode": "hybrid", "tokenizer_mode": "standard"}),)],
        "params string",
    ).write.mode("overwrite").parquet(f"{out_dir}/manifest")
    # default (fuzzy=False) resumes; fuzzy=True still refuses
    KgJob(spark, out_dir, run_id="fz3").run(src, last_stage="tokenize_tag")
    with pytest.raises(ValueError, match="checkpoints for"):
        KgJob(spark, out_dir, run_id="fz4", fuzzy_canon=True).run(
            src, last_stage="tokenize_tag"
        )


def test_prewarm_does_not_stamp_a_fresh_output_dir(spark, out_dir):
    """prewarm validates the manifest but must not WRITE one into a
    dir no stage has run in — that would force --force on the first
    real run if it uses different params."""
    KgJob(spark, out_dir, run_id="pf1", mode="hybrid").prewarm()
    # different params into the still-stageless dir: no refusal
    KgJob(spark, out_dir, run_id="pf2", mode="rules_only").run(
        source_table(spark, n_rows=12), last_stage="tokenize_tag"
    )

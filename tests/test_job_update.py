"""Incremental KG maintenance: KgJob.update(delta) folds new documents
into a completed run — tag/link over the delta only, derived stages
recomputed over base ∪ deltas — and must equal a fresh run over the
union (the property a daily-crawl pipeline at corpus scale relies on)."""

from __future__ import annotations

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


def _slices(spark, n_base=60, n_delta=24):
    """(base, delta, full) source tables with disjoint (repo, path)
    keys — build_source_rows paths are indexed, so row slices of one
    build are disjoint documents."""
    rows = build_source_rows(n_base + n_delta)
    base = spark.createDataFrame(rows[:n_base], SOURCE_SCHEMA)
    delta = spark.createDataFrame(rows[n_base:], SOURCE_SCHEMA)
    full = spark.createDataFrame(rows, SOURCE_SCHEMA)
    return base, delta, full


def test_update_equals_fresh_full_run(spark, out_dir):
    base, delta, full = _slices(spark)
    KgJob(spark, out_dir, run_id="b1").run(base)
    updated = KgJob(spark, out_dir, run_id="u1").update(delta, update_id="d1")

    fresh = KgJob(spark, out_dir + "_full", run_id="f1").run(full)
    assert _triples_set(updated) == _triples_set(fresh)

    # a later plain resume reads the recomputed derived stages
    resumed = KgJob(spark, out_dir, run_id="r1").run(base)
    assert _triples_set(resumed) == _triples_set(fresh)


def test_two_updates_accumulate(spark, out_dir):
    rows = build_source_rows(84)
    base = spark.createDataFrame(rows[:36], SOURCE_SCHEMA)
    d1 = spark.createDataFrame(rows[36:60], SOURCE_SCHEMA)
    d2 = spark.createDataFrame(rows[60:], SOURCE_SCHEMA)
    full = spark.createDataFrame(rows, SOURCE_SCHEMA)

    job = KgJob(spark, out_dir, run_id="b2")
    job.run(base)
    job.update(d1, update_id="d1")
    updated = job.update(d2, update_id="d2")

    fresh = KgJob(spark, out_dir + "_full", run_id="f2").run(full)
    assert _triples_set(updated) == _triples_set(fresh)


def test_update_requires_completed_base(spark, out_dir):
    base, delta, _ = _slices(spark, n_base=12, n_delta=6)
    with pytest.raises(ValueError, match="completed base run"):
        KgJob(spark, out_dir, run_id="u0").update(delta)
    # a base stopped before link is also not updatable
    KgJob(spark, out_dir, run_id="b0").run(base, last_stage="tokenize_tag")
    with pytest.raises(ValueError, match="completed base run"):
        KgJob(spark, out_dir, run_id="u0b").update(delta)


def test_update_rejects_overlapping_documents(spark, out_dir):
    base, delta, _ = _slices(spark, n_base=24, n_delta=12)
    KgJob(spark, out_dir, run_id="b3").run(base)
    with pytest.raises(ValueError, match="append-only"):
        KgJob(spark, out_dir, run_id="u3").update(base, update_id="dup")
    # and the rejected update leaves no committed delta behind
    assert KgJob(spark, out_dir, run_id="chk")._update_ids() == []


def test_update_resume_is_idempotent(spark, out_dir):
    base, delta, full = _slices(spark, n_base=36, n_delta=12)
    KgJob(spark, out_dir, run_id="b4").run(base)
    job = KgJob(spark, out_dir, run_id="u4")
    first = _triples_set(job.update(delta, update_id="d4"))
    # same update re-launched (crash-recovery path): the committed
    # delta checkpoints are reused, nothing is double-appended
    again = _triples_set(
        KgJob(spark, out_dir, run_id="u4b").update(delta, update_id="d4")
    )
    assert first == again
    fresh = KgJob(spark, out_dir + "_full", run_id="f4").run(full)
    assert again == _triples_set(fresh)


def test_overlap_guard_sees_half_finished_update(spark, out_dir):
    """A crashed update (tag delta committed, link not) must still make
    its documents visible to the overlap guard — starting a NEW update
    with the same delta instead of resuming would otherwise duplicate
    mentions once the crashed one is resumed."""
    base, delta, _ = _slices(spark, n_base=24, n_delta=12)
    KgJob(spark, out_dir, run_id="b5").run(base)
    job = KgJob(spark, out_dir, run_id="u5")
    job.update(delta, update_id="d5")
    # simulate the crash: d5's link stage never committed
    job._delete(f"{out_dir}/updates/d5/link/_SUCCESS")
    with pytest.raises(ValueError, match="append-only"):
        KgJob(spark, out_dir, run_id="u5b").update(delta, update_id="d5-retry")
    # resuming under the original id remains the supported path
    resumed = KgJob(spark, out_dir, run_id="u5c").update(delta, update_id="d5")
    assert len(_triples_set(resumed)) > 0


def test_merge_fast_path_taken_and_correct(spark, out_dir):
    """With stable entity assignments the update merges delta triples
    into the committed table (materialize_merge metrics row) and the
    result still equals a fresh run over the union."""
    from pyspark.sql import functions as F

    base, delta, full = _slices(spark, n_base=48, n_delta=18)
    KgJob(spark, out_dir, run_id="mb").run(base)
    job = KgJob(spark, out_dir, run_id="mu")
    merged = _triples_set(job.update(delta, update_id="dm"))

    m = job.metrics()
    assert m.where(
        (F.col("run_id") == "mu") & (F.col("stage") == "materialize_merge")
    ).count() == 1

    fresh = KgJob(spark, out_dir + "_full", run_id="mf").run(full)
    assert merged == _triples_set(fresh)


def test_merge_disabled_recomputes_and_matches(spark, out_dir):
    from pyspark.sql import functions as F

    base, delta, full = _slices(spark, n_base=48, n_delta=18)
    KgJob(spark, out_dir, run_id="nb").run(base)
    job = KgJob(spark, out_dir, run_id="nu")
    out = _triples_set(job.update(delta, update_id="dn", merge_materialize=False))
    assert job.metrics().where(F.col("stage") == "materialize_merge").count() == 0
    fresh = KgJob(spark, out_dir + "_full", run_id="nf").run(full)
    assert out == _triples_set(fresh)


def test_merge_falls_back_when_assignments_changed(spark, out_dir):
    """With incremental=False, the legacy stability check must see a
    reassigned surface and take the full-recompute path — and still
    produce the fresh-union result (the check uses the OLD checkpoint,
    so tampering it simulates a delta that merged two components; the
    incremental path instead TRUSTS committed checkpoints as inputs,
    like any resume, so it is exercised with real reassigning deltas in
    the tests below)."""
    from pyspark.sql import functions as F

    base, delta, full = _slices(spark, n_base=48, n_delta=18)
    KgJob(spark, out_dir, run_id="tb").run(base)

    # tamper one surface's entity assignment in the committed
    # canonicalize checkpoint (collect → modify → overwrite)
    path = f"{out_dir}/canonicalize"
    rows = [(r.surface, r.entity_id) for r in spark.read.parquet(path).collect()]
    rows[0] = (rows[0][0], "ent:__tampered__")
    spark.createDataFrame(rows, "surface string, entity_id string").write.mode(
        "overwrite"
    ).parquet(path)

    job = KgJob(spark, out_dir, run_id="tu")
    out = _triples_set(job.update(delta, update_id="dt", incremental=False))
    assert job.metrics().where(
        (F.col("run_id") == "tu") & (F.col("stage") == "materialize_merge")
    ).count() == 0
    fresh = KgJob(spark, out_dir + "_full", run_id="tf").run(full)
    assert out == _triples_set(fresh)


def _reassigning_slices(spark, n_base=48):
    """(base, delta, full) where the delta document REASSIGNS existing
    surfaces: the mention "B" links to Q155 (substring score 0.5) and
    "b" sorts before the base Q155 component's canonical surface
    ("banco central do brasil"), renaming every surface in it."""
    import hashlib

    base_rows = build_source_rows(n_base)
    text = "O presidente visitou B."
    extra = ("repoX", "docs/delta/0.txt", "c" * 40, "pt", text,
             hashlib.sha256(text.encode()).hexdigest())
    base = spark.createDataFrame(base_rows, SOURCE_SCHEMA)
    delta = spark.createDataFrame([extra], SOURCE_SCHEMA)
    full = spark.createDataFrame(base_rows + [extra], SOURCE_SCHEMA)
    return base, delta, full


def test_differential_materialize_on_reassignment(spark, out_dir):
    """A delta that renames an existing component must take the
    differential path (patch only affected documents' triples) and
    still equal the fresh-union run."""
    from pyspark.sql import functions as F

    base, delta, full = _reassigning_slices(spark)
    KgJob(spark, out_dir, run_id="rb").run(base)
    job = KgJob(spark, out_dir, run_id="ru")
    # the fixture corpus is KB-dense, so the rename's blast radius is a
    # large corpus fraction — lift the cost guard to pin the path itself
    out = _triples_set(job.update(delta, update_id="dr",
                                  differential_threshold=float("inf")))

    m = job.metrics()
    assert m.where((F.col("run_id") == "ru")
                   & (F.col("stage") == "materialize_differential")).count() == 1
    assert m.where((F.col("run_id") == "ru")
                   & (F.col("stage") == "materialize_merge")).count() == 0
    # the increment reported the reassigned surfaces
    incr = m.where((F.col("run_id") == "ru")
                   & (F.col("stage") == "canonicalize_increment")).collect()
    assert len(incr) == 1 and incr[0].rows_out > 0
    # and the renamed entity is real
    renamed = {r.new_entity_id for r in
               spark.read.parquet(f"{out_dir}/updates/dr/canon_changes").collect()}
    assert renamed == {"ent:b"}

    fresh = KgJob(spark, out_dir + "_full", run_id="rf").run(full)
    assert out == _triples_set(fresh)


def test_incremental_stable_delta_still_merges(spark, out_dir):
    """A purely-additive delta under incremental=True must use the
    canon increment AND the merge fast path (empty change table)."""
    from pyspark.sql import functions as F

    base, delta, full = _slices(spark, n_base=48, n_delta=18)
    KgJob(spark, out_dir, run_id="sb").run(base)
    job = KgJob(spark, out_dir, run_id="su")
    out = _triples_set(job.update(delta, update_id="ds"))
    m = job.metrics()
    assert m.where((F.col("run_id") == "su")
                   & (F.col("stage") == "canonicalize_increment")).count() == 1
    assert m.where((F.col("run_id") == "su")
                   & (F.col("stage") == "materialize_merge")).count() == 1
    fresh = KgJob(spark, out_dir + "_full", run_id="sf").run(full)
    assert out == _triples_set(fresh)


def test_differential_resumes_after_materialize_crash(spark, out_dir):
    """Crash window: the update's canonicalize committed (covering the
    delta) but materialize did not.  The re-invocation must reuse the
    persisted canon_changes table and still produce the fresh-union
    result via the differential path."""
    from pyspark.sql import functions as F

    base, delta, full = _reassigning_slices(spark)
    KgJob(spark, out_dir, run_id="cb").run(base)
    KgJob(spark, out_dir, run_id="cu").update(
        delta, update_id="dc", differential_threshold=float("inf"))
    # simulate the crash: materialize never committed, canonicalize did
    job = KgJob(spark, out_dir, run_id="cv")
    job._delete(f"{out_dir}/materialize/_SUCCESS")
    out = _triples_set(job.update(delta, update_id="dc",
                                  differential_threshold=float("inf")))
    # mat was uncommitted, so its coverage meta is unusable → the
    # resume recomputes materialize; correctness is what matters here
    fresh = KgJob(spark, out_dir + "_full", run_id="cf").run(full)
    assert out == _triples_set(fresh)
    assert job.metrics().where((F.col("run_id") == "cv")
                               & (F.col("stage") == "materialize")).count() > 0


def test_reassigning_update_with_merge_disabled(spark, out_dir):
    """incremental canon + merge_materialize=False: full materialize
    over base ∪ delta with the incrementally-built entity table."""
    from pyspark.sql import functions as F

    base, delta, full = _reassigning_slices(spark)
    KgJob(spark, out_dir, run_id="xb").run(base)
    job = KgJob(spark, out_dir, run_id="xu")
    out = _triples_set(job.update(delta, update_id="dx",
                                  merge_materialize=False))
    m = job.metrics()
    assert m.where((F.col("run_id") == "xu")
                   & (F.col("stage") == "canonicalize_increment")).count() == 1
    assert m.where(F.col("stage").isin(
        "materialize_merge", "materialize_differential")).count() == 0
    fresh = KgJob(spark, out_dir + "_full", run_id="xf").run(full)
    assert out == _triples_set(fresh)


def test_differential_cost_guard_falls_back_to_full(spark, out_dir):
    """When the blast radius exceeds the threshold fraction of a full
    recompute's scan volume, the guard must take the full path — and
    the result still equals the fresh-union run."""
    from pyspark.sql import functions as F

    base, delta, full = _reassigning_slices(spark)
    KgJob(spark, out_dir, run_id="gb").run(base)
    job = KgJob(spark, out_dir, run_id="gu")
    out = _triples_set(job.update(delta, update_id="dg",
                                  differential_threshold=0.0))
    m = job.metrics()
    assert m.where((F.col("run_id") == "gu")
                   & (F.col("stage") == "differential_guard_full")).count() == 1
    assert m.where((F.col("run_id") == "gu")
                   & (F.col("stage") == "materialize_differential")).count() == 0
    fresh = KgJob(spark, out_dir + "_full", run_id="gf").run(full)
    assert out == _triples_set(fresh)


def test_two_updates_second_differential(spark, out_dir):
    """Update sequence mixing paths: an additive delta (merge) followed
    by a reassigning delta (differential) — both against sidecar metas
    that now track multi-delta coverage."""
    base, delta_r, _ = _reassigning_slices(spark, n_base=36)
    rows = build_source_rows(60)
    add = spark.createDataFrame(rows[36:], SOURCE_SCHEMA)
    job = KgJob(spark, out_dir, run_id="m2")
    job.run(base)
    job.update(add, update_id="d-add")
    out = _triples_set(job.update(delta_r, update_id="d-re",
                                  differential_threshold=float("inf")))

    full_rows = [tuple(r) for r in base.collect()] + rows[36:] + \
        [tuple(r) for r in delta_r.collect()]
    full = spark.createDataFrame(full_rows, SOURCE_SCHEMA)
    fresh = KgJob(spark, out_dir + "_full", run_id="m2f").run(full)
    assert out == _triples_set(fresh)


def test_plain_run_resume_preserves_committed_deltas(spark, out_dir):
    """The documented recovery command after ANY crash is the plain
    run() relaunch — if an update's delta committed but the derived
    stages did not, that relaunch must still fold the delta in."""
    base, delta, full = _slices(spark)
    KgJob(spark, out_dir, run_id="b6").run(base)
    KgJob(spark, out_dir, run_id="u6").update(delta, update_id="d6")
    # crash window: delta committed, derived-stage markers lost
    job = KgJob(spark, out_dir, run_id="r6")
    job._delete(f"{out_dir}/canonicalize/_SUCCESS")
    job._delete(f"{out_dir}/materialize/_SUCCESS")
    resumed = job.run(base)
    fresh = KgJob(spark, out_dir + "_full", run_id="f6").run(full)
    assert _triples_set(resumed) == _triples_set(fresh)


def test_update_id_reuse_with_different_delta_fails(spark, out_dir):
    """A resumed update id must carry the SAME documents: a recreated
    streaming checkpoint restarting batch ids at 0 must fail loudly
    instead of silently serving the old delta's checkpoint."""
    rows = build_source_rows(72)
    base = spark.createDataFrame(rows[:36], SOURCE_SCHEMA)
    d1 = spark.createDataFrame(rows[36:54], SOURCE_SCHEMA)
    d2 = spark.createDataFrame(rows[54:], SOURCE_SCHEMA)

    job = KgJob(spark, out_dir, run_id="b")
    job.run(base)
    job.update(d1, update_id="stream-00000000")
    with pytest.raises(ValueError, match="different document set"):
        job.update(d2, update_id="stream-00000000")
    # the SAME delta under the same id stays the documented no-op
    again = job.update(d1, update_id="stream-00000000")
    fresh = KgJob(spark, out_dir + "_f", run_id="f").run(
        spark.createDataFrame(rows[:54], SOURCE_SCHEMA)
    )
    assert _triples_set(again) == _triples_set(fresh)

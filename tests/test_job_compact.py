"""Delta compaction: KgJob.compact() folds completed update deltas
back into the base tokenize_tag/link checkpoints — output-identical,
crash-safe via a prepare/commit/install protocol, and it must keep the
follow-up update() on the incremental fast paths (the property that
makes a long-running daily-crawl pipeline sustainable: union fan-in
stays O(1) instead of O(#updates))."""

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


def _slices(spark, *sizes):
    rows = build_source_rows(sum(sizes))
    out, lo = [], 0
    for n in sizes:
        out.append(spark.createDataFrame(rows[lo:lo + n], SOURCE_SCHEMA))
        lo += n
    out.append(spark.createDataFrame(rows, SOURCE_SCHEMA))
    return out


def _metric_stages(job, run_id):
    return {
        r["stage"]
        for r in job.metrics().where(f"run_id = '{run_id}'")
        .select("stage").distinct().collect()
    }


def test_compact_folds_deltas_output_identical(spark, out_dir):
    base, d1, d2, full = _slices(spark, 40, 16, 16)
    job = KgJob(spark, out_dir, run_id="b")
    job.run(base)
    job.update(d1, update_id="u1")
    triples_before = _triples_set(job.update(d2, update_id="u2"))
    links_before = job.all_links().count()

    cjob = KgJob(spark, out_dir, run_id="c")
    assert cjob.compact() == 2

    # deltas are gone, the base now carries their rows
    assert cjob._update_ids() == []
    assert not cjob._exists(f"{out_dir}/updates/u1")
    assert not cjob._exists(f"{out_dir}/_compact")
    assert cjob.all_links().count() == links_before
    assert "compact" in _metric_stages(cjob, "c")

    # committed triples unchanged; a plain resume still returns them
    resumed = KgJob(spark, out_dir, run_id="r").run(base)
    assert _triples_set(resumed) == triples_before
    fresh = KgJob(spark, out_dir + "_f", run_id="f").run(full)
    assert _triples_set(fresh) == triples_before

    # derived coverage was rewritten to []: the tables cover exactly
    # the (new) base
    meta = cjob._sidecar_meta(cjob._path("materialize"))
    assert meta["applied_updates"] == []


def test_update_after_compact_stays_incremental(spark, out_dir):
    base, d1, d2, full = _slices(spark, 40, 16, 16)
    job = KgJob(spark, out_dir, run_id="b")
    job.run(base)
    job.update(d1, update_id="u1")
    KgJob(spark, out_dir, run_id="c").compact()

    ujob = KgJob(spark, out_dir, run_id="u2")
    updated = ujob.update(d2, update_id="u2")
    stages = _metric_stages(ujob, "u2")
    assert "canonicalize_increment" in stages
    assert "materialize_merge" in stages or "materialize_differential" in stages

    fresh = KgJob(spark, out_dir + "_f", run_id="f").run(full)
    assert _triples_set(updated) == _triples_set(fresh)


def test_compact_noop_cases(spark, out_dir):
    base, full = _slices(spark, 30)
    job = KgJob(spark, out_dir, run_id="b")
    job.run(base)
    assert job.compact() == 0  # no deltas
    # idempotent: second compaction after one update folds, third no-ops
    rows = build_source_rows(40)
    delta = spark.createDataFrame(rows[30:], SOURCE_SCHEMA)
    job.update(delta, update_id="u1")
    assert job.compact() == 1
    assert job.compact() == 0


def test_compact_requires_completed_base(spark, out_dir):
    with pytest.raises(ValueError, match="completed base"):
        # fake a committed delta without a base
        job = KgJob(spark, out_dir, run_id="x")
        spark.createDataFrame([("r", "p")], "repo string, path string") \
            .write.parquet(f"{out_dir}/updates/u1/link")
        job.compact()


def test_compact_skips_half_finished_update(spark, out_dir):
    """A crashed update (tagged, not linked) must survive compaction
    untouched and still resume afterwards."""
    base, d1, d2, full = _slices(spark, 40, 16, 16)
    job = KgJob(spark, out_dir, run_id="b")
    job.run(base)
    job.update(d1, update_id="u1")
    job.update(d2, update_id="u2")
    # simulate u2's crash between its stage 1 and stage 2 commits
    job._delete(f"{out_dir}/updates/u2/link/_SUCCESS")

    assert KgJob(spark, out_dir, run_id="c").compact() == 1  # only u1
    assert job._exists(f"{out_dir}/updates/u2/tokenize_tag/_SUCCESS")

    resumed = KgJob(spark, out_dir, run_id="u2b").update(d2, update_id="u2")
    fresh = KgJob(spark, out_dir + "_f", run_id="f").run(full)
    assert _triples_set(resumed) == _triples_set(fresh)


def test_crash_before_commit_rolls_back(spark, out_dir):
    """tmp tables without a _COMMIT are discarded; nothing changed."""
    base, d1, full = _slices(spark, 40, 16)
    job = KgJob(spark, out_dir, run_id="b")
    job.run(base)
    triples = _triples_set(job.update(d1, update_id="u1"))

    job._prepare_compact(["u1"])
    job._delete(job._compact_commit_path())  # crash before commit

    rjob = KgJob(spark, out_dir, run_id="r")
    assert _triples_set(rjob.run(base)) == triples
    assert not rjob._exists(f"{out_dir}/_compact")
    assert rjob._update_ids() == ["u1"]  # delta still in place


def test_crash_after_commit_rolls_forward(spark, out_dir):
    """_COMMIT present ⇒ the next run()/update() installs the
    compaction before reading anything (even from the nastiest window:
    base table deleted, rename not yet done)."""
    base, d1, d2, full = _slices(spark, 40, 16, 16)
    job = KgJob(spark, out_dir, run_id="b")
    job.run(base)
    triples = _triples_set(job.update(d1, update_id="u1"))

    job._prepare_compact(["u1"])
    # crash mid-install: base stage-1 dir already deleted
    job._delete(job._path("tokenize_tag"))

    rjob = KgJob(spark, out_dir, run_id="r")
    assert _triples_set(rjob.run(base)) == triples
    assert rjob._update_ids() == []
    assert not rjob._exists(f"{out_dir}/_compact")

    # and the pipeline is fully functional after the roll-forward
    ujob = KgJob(spark, out_dir, run_id="u2")
    updated = ujob.update(d2, update_id="u2")
    fresh = KgJob(spark, out_dir + "_f", run_id="f").run(full)
    assert _triples_set(updated) == _triples_set(fresh)


def test_compact_uncommits_mismatched_coverage(spark, out_dir):
    """If the committed derived stages do not cover exactly the folded
    set (here: a second delta committed its link but crashed before the
    derived stages), compaction UNCOMMITS them — leaving their stale
    coverage in place would name deleted update ids that a recycled id
    could falsely match — and the next plain run recomputes."""
    base, d1, d2, full = _slices(spark, 40, 16, 16)
    job = KgJob(spark, out_dir, run_id="b")
    job.run(base)
    job.update(d1, update_id="u1")

    # u2: stages 1-2 committed, derived stages crashed
    from ner_spark.operators.link import disambiguate, link_mentions
    from ner_spark.operators.tag import extract_mentions

    m = job._run_stage(
        "tokenize_tag", d2,
        lambda: disambiguate(extract_mentions(d2)).drop("context_window"),
        path=f"{out_dir}/updates/u2/tokenize_tag",
    )
    job._run_stage("link", m, lambda: link_mentions(m),
                   path=f"{out_dir}/updates/u2/link")

    cjob = KgJob(spark, out_dir, run_id="c")
    assert cjob.compact() == 2  # folds both links
    # derived stages covered {u1} ≠ folded {u1, u2}: uncommitted
    assert not cjob._committed("materialize")
    assert not cjob._committed("canonicalize")

    resumed = KgJob(spark, out_dir, run_id="r").run(base)
    fresh = KgJob(spark, out_dir + "_f", run_id="f").run(full)
    assert _triples_set(resumed) == _triples_set(fresh)


def test_retry_of_folded_update_id_is_noop(spark, out_dir):
    """An orchestrator retrying update(id) AFTER a compaction folded
    that id must get the documented no-op (correct committed triples),
    not the overlap guard's key-clash error."""
    base, d1, full = _slices(spark, 40, 16)
    job = KgJob(spark, out_dir, run_id="b")
    job.run(base)
    triples = _triples_set(job.update(d1, update_id="u1"))
    job.compact()

    retried = KgJob(spark, out_dir, run_id="rt").update(d1, update_id="u1")
    assert _triples_set(retried) == triples


def test_new_delta_reusing_folded_id_fails_loudly(spark, out_dir):
    base, d1, d2, full = _slices(spark, 40, 16, 16)
    job = KgJob(spark, out_dir, run_id="b")
    job.run(base)
    job.update(d1, update_id="u1")
    job.compact()
    with pytest.raises(ValueError, match="fresh update_id"):
        KgJob(spark, out_dir, run_id="x").update(d2, update_id="u1")


def test_overlap_guard_sees_folded_documents(spark, out_dir):
    base, d1, full = _slices(spark, 40, 16)
    job = KgJob(spark, out_dir, run_id="b")
    job.run(base)
    job.update(d1, update_id="u1")
    job.compact()
    with pytest.raises(ValueError, match="append-only"):
        KgJob(spark, out_dir, run_id="u2").update(d1, update_id="u2")

"""Continuous KG construction: Structured Streaming micro-batches fold
into a committed run via the incremental update path
(`streaming.ingest.stream_kg_updates`) and the result equals a fresh
batch run over the union — including across stream restarts."""

from __future__ import annotations

import shutil

import pytest

from ner_spark.plans.job import KgJob
from ner_spark.schemas import SOURCE_SCHEMA
from ner_spark.sources.fixtures import build_source_rows
from ner_spark.streaming.ingest import drain_kg_updates


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "kg": str(tmp_path / "kg"),
        "land": str(tmp_path / "landing"),
        "chk": str(tmp_path / "chk"),
        "full": str(tmp_path / "kg_full"),
    }
    yield d
    for p in d.values():
        shutil.rmtree(p, ignore_errors=True)


def _triples_set(df):
    return sorted(map(tuple, df.collect()))


def _land(spark, rows, path):
    """One parquet file of source rows into the landing zone."""
    spark.createDataFrame(rows, SOURCE_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _drain(spark, land, job, chk, compact_every=None, stats=None):
    return drain_kg_updates(
        spark, land, job, chk, max_files_per_trigger=1,
        compact_every=compact_every, stats=stats, timeout_sec=300,
    )


def test_stream_folds_microbatches_and_equals_fresh_run(spark, dirs):
    rows = build_source_rows(80)
    job = KgJob(spark, dirs["kg"], run_id="base")
    job.run(spark.createDataFrame(rows[:40], SOURCE_SCHEMA))

    # two landed files + maxFilesPerTrigger=1 → two micro-batch deltas
    _land(spark, rows[40:60], dirs["land"])
    _land(spark, rows[60:80], dirs["land"])
    _drain(spark, dirs["land"], job, dirs["chk"])

    fresh = KgJob(spark, dirs["full"], run_id="f").run(
        spark.createDataFrame(rows, SOURCE_SCHEMA)
    )
    streamed = KgJob(spark, dirs["kg"], run_id="read").run(
        spark.createDataFrame(rows[:40], SOURCE_SCHEMA)
    )
    assert _triples_set(streamed) == _triples_set(fresh)
    # both micro-batches are recorded as stream update deltas
    ids = KgJob(spark, dirs["kg"], run_id="ids")._update_ids()
    assert len(ids) == 2 and all(i.startswith("stream-") for i in ids)


def test_stream_with_auto_compaction(spark, dirs):
    """compact_every bounds the delta fan-in of a perpetual stream:
    after three micro-batches with compact_every=2, the post-drain
    maintenance folds every completed delta into the base and the
    triples still equal a fresh batch run over the union.  The
    compaction runs strictly AFTER the last fold (off the trigger
    path) — folds never pay the rewrite."""
    rows = build_source_rows(84)
    job = KgJob(spark, dirs["kg"], run_id="base")
    job.run(spark.createDataFrame(rows[:36], SOURCE_SCHEMA))

    events: list[str] = []
    real_update, real_compact = job.update, job.compact

    def traced_update(*a, **kw):
        events.append("fold")
        return real_update(*a, **kw)

    def traced_compact(*a, **kw):
        events.append("compact")
        return real_compact(*a, **kw)

    job.update, job.compact = traced_update, traced_compact

    for lo, hi in ((36, 52), (52, 68), (68, 84)):
        _land(spark, rows[lo:hi], dirs["land"])
    stats = _drain(spark, dirs["land"], job, dirs["chk"], compact_every=2,
                   stats={})

    # maintenance ran once, after the final fold — never inside a trigger
    assert events == ["fold", "fold", "fold", "compact"]
    assert stats["folded"] == 3 and stats["compactions"] == 1
    assert stats["compacted_deltas"] == 3
    ids = KgJob(spark, dirs["kg"], run_id="ids")._update_ids()
    assert ids == []  # all three deltas folded into the base
    fresh = KgJob(spark, dirs["full"], run_id="f").run(
        spark.createDataFrame(rows, SOURCE_SCHEMA)
    )
    got = _triples_set(
        KgJob(spark, dirs["kg"], run_id="r").run(
            spark.createDataFrame(rows[:36], SOURCE_SCHEMA)
        )
    )
    assert got == _triples_set(fresh)


def test_stream_replays_completed_fold_as_noop(spark, dirs):
    """Crash window: the fold committed but the streaming checkpoint
    didn't.  The replayed micro-batch carries the same batch_id → same
    update_id → update() serves the already-applied delta instead of
    double-counting it (the at-least-once → exactly-once argument)."""
    rows = build_source_rows(60)
    job = KgJob(spark, dirs["kg"], run_id="base")
    job.run(spark.createDataFrame(rows[:36], SOURCE_SCHEMA))

    delta = rows[36:]
    _land(spark, delta, dirs["land"])
    # simulate the first attempt: the fold of batch 0 fully committed,
    # then the process died before the sink checkpoint recorded it
    job.update(
        spark.createDataFrame(delta, SOURCE_SCHEMA),
        update_id="stream-00000000",
    )
    # restart: batch 0 replays over the same file set
    stats = _drain(spark, dirs["land"], job, dirs["chk"], stats={})
    # the replayed batch was already fully applied → served as a no-op
    # and NOT counted as a fold (the 'folded=N' CLI summary stays honest
    # across crash/replay)
    assert stats.get("folded", 0) == 0

    fresh = KgJob(spark, dirs["full"], run_id="f").run(
        spark.createDataFrame(rows, SOURCE_SCHEMA)
    )
    got = _triples_set(
        KgJob(spark, dirs["kg"], run_id="r").run(
            spark.createDataFrame(rows[:36], SOURCE_SCHEMA)
        )
    )
    assert got == _triples_set(fresh)
    assert KgJob(spark, dirs["kg"], run_id="ids")._update_ids() == [
        "stream-00000000"
    ]


def test_stream_restart_is_noop_then_incremental(spark, dirs):
    rows = build_source_rows(72)
    job = KgJob(spark, dirs["kg"], run_id="base")
    job.run(spark.createDataFrame(rows[:36], SOURCE_SCHEMA))

    _land(spark, rows[36:54], dirs["land"])
    _drain(spark, dirs["land"], job, dirs["chk"])
    first = _triples_set(
        KgJob(spark, dirs["kg"], run_id="r1").run(
            spark.createDataFrame(rows[:36], SOURCE_SCHEMA)
        )
    )

    # restart with no new files: offsets are committed → nothing refolds
    _drain(spark, dirs["land"], job, dirs["chk"])
    again = _triples_set(
        KgJob(spark, dirs["kg"], run_id="r2").run(
            spark.createDataFrame(rows[:36], SOURCE_SCHEMA)
        )
    )
    assert again == first
    assert len(KgJob(spark, dirs["kg"], run_id="ids")._update_ids()) == 1

    # a later landing folds incrementally on the next restart
    _land(spark, rows[54:], dirs["land"])
    _drain(spark, dirs["land"], job, dirs["chk"])
    fresh = KgJob(spark, dirs["full"], run_id="f").run(
        spark.createDataFrame(rows, SOURCE_SCHEMA)
    )
    final = _triples_set(
        KgJob(spark, dirs["kg"], run_id="r3").run(
            spark.createDataFrame(rows[:36], SOURCE_SCHEMA)
        )
    )
    assert final == _triples_set(fresh)
    assert len(KgJob(spark, dirs["kg"], run_id="ids2")._update_ids()) == 2

"""Structured Streaming ingest for the tag stage.

The reference's only "streaming" is UI event replay
(reference: ner-web/src/main.rs:326-397) — re-expressed in this engine
as the metrics/lineage tables (SURVEY §2.9 O3).  This module adds the
engine-side streaming surface a production corpus would use: new
source-table files (e.g. an Iceberg/parquet landing zone) are picked up
incrementally, run through the batched NER kernel, and appended to the
mentions table exactly-once via the streaming checkpoint.

Design:
- file-source ``readStream`` with ``maxFilesPerTrigger`` back-pressure;
- the tag stage (:func:`extract_mentions`) is stateless/narrow, so it
  applies directly to the streaming DataFrame — no duplicate logic;
- sink is the NATIVE parquet file sink: its ``_spark_metadata``
  transaction log makes batch commits atomic, so the file source +
  file sink pair is exactly-once end-to-end (a ``foreachBatch`` +
  plain append would only be at-least-once: a crash between the
  append and the checkpoint commit would replay the batch);
- ``trigger(availableNow=True)`` drains the backlog and stops — the
  batch-job twin used by tests; omit it for a long-running stream.

No watermarks/event-time windows are needed: tagging is stateless per
document (SURVEY §2.10 — the reference has no late-data semantics).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ner_spark.schemas import SOURCE_SCHEMA


def stream_mentions(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    mode: str = "hybrid",
    tokenizer_mode: str = "standard",
    max_files_per_trigger: int = 64,
    available_now: bool = True,
) -> StreamingQuery:
    """Incrementally tag new source files landing in ``input_dir``."""
    from ner_spark.operators.tag import extract_mentions

    stream = (
        spark.readStream.schema(SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    mentions = extract_mentions(stream, mode=mode, tokenizer_mode=tokenizer_mode)

    writer = (
        mentions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_kg_updates(
    spark: SparkSession,
    input_dir: str,
    job,
    checkpoint_dir: str,
    max_files_per_trigger: int = 64,
    available_now: bool = True,
    update_kwargs: dict | None = None,
    stats: dict | None = None,
) -> StreamingQuery:
    """Continuous KG construction: fold newly landed source files into a
    committed KG run via the delta-proportional incremental update path.

    Each micro-batch becomes one :meth:`KgJob.update` delta with
    ``update_id = stream-{batch_id}``.  ``foreachBatch`` alone is only
    at-least-once, but the composition is effectively exactly-once:

    - the file source's offset log replays an UNCOMMITTED batch with the
      same batch_id over the same files, so a crashed fold resumes the
      identical delta;
    - ``update()`` is idempotent per update_id — committed delta stages
      are skipped on re-entry, and a fully-applied id returns the
      committed triples without touching anything (the same guarantees
      ``tests/test_job_update.py`` / ``test_lifecycle_fuzz.py`` pin for
      CLI-driven retries).

    So a replayed batch re-lands in the exact crash window its first
    attempt reached and completes from there.  Cost per trigger is
    proportional to the batch (tag/link over the delta, contracted-CC
    canonicalize, merge-or-differential materialize), which is what a
    long-running 100 TB ingest needs — the committed base is never
    re-tagged.  ``job`` must hold a completed base ``run()``.

    Compaction deliberately does NOT run inside ``_fold``: a major
    compaction rewrites the full mention/link tables (seconds to
    minutes), and paying that inside a trigger stalls the stream's
    ingest latency for every co-landing batch.  Use
    :func:`drain_kg_updates` (or the ``--compact`` CLI maintenance
    entry) to run it BETWEEN trigger drains on the same single-writer
    driver — never concurrently with a fold, which would race the
    checkpoint renames.

    ``update_kwargs`` forwards tuning to every :meth:`KgJob.update`
    call (e.g. ``incremental=False``, ``differential_threshold``);
    ``stats`` (a caller-owned dict) receives a ``folded`` counter and a
    ``fold_secs`` list for THIS run.  ``folded`` counts REAL folds
    only: a replayed batch whose update id is already fully applied
    (crash between the fold commit and the offset commit) is served as
    a no-op by :meth:`KgJob.update` and not counted —
    ``job._update_ids()`` after the drain is the post-compaction
    residue, not the ingest count.
    """
    import time

    stream = (
        spark.readStream.schema(SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def _fold(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        uid = f"stream-{batch_id:08d}"
        # checked BEFORE the update: a replayed already-applied id is a
        # no-op inside update() and must not inflate the fold counter
        applied_before = job.is_applied(uid)
        t0 = time.perf_counter()
        job.update(batch_df, update_id=uid, **(update_kwargs or {}))
        if stats is not None:
            stats.setdefault("fold_secs", []).append(
                round(time.perf_counter() - t0, 3))
            if not applied_before:
                stats["folded"] = stats.get("folded", 0) + 1

    writer = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drain_kg_updates(
    spark: SparkSession,
    input_dir: str,
    job,
    checkpoint_dir: str,
    max_files_per_trigger: int = 64,
    compact_every: int | None = None,
    update_kwargs: dict | None = None,
    stats: dict | None = None,
    timeout_sec: float | None = None,
    refresh_analytics: bool = False,
) -> dict:
    """One ingest *slice*: drain the landing-zone backlog
    (``availableNow``), then — with the stream fully stopped — run the
    LSM compaction if ``compact_every`` completed deltas accumulated,
    and (``refresh_analytics=True``) rebuild the derived analytics
    views so they track the freshly folded graph.

    This is the maintenance cadence the round-3 inline design got
    wrong: compaction is a full mention/link rewrite, so running it
    inside ``foreachBatch`` stalled that trigger (and every queued
    batch behind it) for the rewrite's duration.  Here each fold stays
    delta-proportional and the rewrite happens between drains, where
    the single-writer invariant is free (the query has terminated) and
    ingest latency is untouched.  A perpetual pipeline loops this
    function (land → drain → maintain → sleep); crash-safety is
    unchanged — a compaction killed mid-install is rolled forward by
    the next run/update/compact via ``_maybe_finish_compact``.

    Returns the stats dict (``folded``, ``fold_secs``,
    ``compactions``, ``compacted_deltas``).
    """
    stats = stats if stats is not None else {}
    q = stream_kg_updates(
        spark, input_dir, job, checkpoint_dir,
        max_files_per_trigger=max_files_per_trigger,
        available_now=True, update_kwargs=update_kwargs, stats=stats,
    )
    q.awaitTermination(timeout_sec)
    if q.isActive:  # timed out: stop before any maintenance runs
        q.stop()
        q.awaitTermination(30)
    if compact_every and len(job._update_ids()) >= compact_every:
        n = job.compact()
        stats["compactions"] = stats.get("compactions", 0) + 1
        stats["compacted_deltas"] = stats.get("compacted_deltas", 0) + n
    if refresh_analytics and stats.get("folded"):
        # maintenance window too (stream stopped): the analytics views
        # are always-recompute derived tables, so refreshing them here
        # keeps "related entities"/rank consumers in step with the
        # folds this slice landed — skipped when nothing folded
        stats["analytics"] = job.analytics()
    return stats

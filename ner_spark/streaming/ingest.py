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
    compact_every: int | None = None,
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

    ``compact_every=N`` runs :meth:`KgJob.compact` whenever N completed
    deltas have accumulated — the LSM cadence that keeps a perpetual
    stream's union fan-in (and the per-trigger overlap-guard scan)
    bounded.  Compaction is crash-safe and rolled forward by the next
    fold, and a replayed batch whose id was already folded is detected
    via the compaction ledger, so the exactly-once argument above
    survives compaction interleavings (fuzz-pinned at the job level in
    ``tests/test_lifecycle_fuzz.py``).

    ``update_kwargs`` forwards tuning to every :meth:`KgJob.update`
    call (e.g. ``incremental=False``, ``differential_threshold``);
    ``stats`` (a caller-owned dict) receives ``folded``/``compactions``
    counters for THIS run — ``job._update_ids()`` after the drain is
    the post-compaction residue, not the ingest count.
    """

    stream = (
        spark.readStream.schema(SOURCE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def _fold(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        job.update(batch_df, update_id=f"stream-{batch_id:08d}",
                   **(update_kwargs or {}))
        if stats is not None:
            stats["folded"] = stats.get("folded", 0) + 1
        if compact_every and len(job._update_ids()) >= compact_every:
            job.compact()
            if stats is not None:
                stats["compactions"] = stats.get("compactions", 0) + 1

    writer = (
        stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

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
- the per-microbatch work reuses :func:`extract_mentions` via
  ``foreachBatch`` (same narrow mapInPandas plan — no duplicate logic);
- sink is an append-mode parquet table; the checkpoint directory gives
  at-least-once file tracking + idempotent commits (exactly-once for
  the file source + parquet sink pair);
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

    def process(batch_df, batch_id: int) -> None:
        (
            extract_mentions(batch_df, mode=mode, tokenizer_mode=tokenizer_mode)
            .write.mode("append")
            .parquet(output_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

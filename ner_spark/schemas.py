"""Fixed StructType schemas for every engine table (SURVEY.md §1.3).

The reference's tag/category spaces are closed enums; we declare every
table schema once here so stages, checkpoints, and tests agree.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Pipeline input (BASELINE.json input_hint): Iceberg-style source table.
SOURCE_SCHEMA = StructType([
    StructField("repo", StringType()),
    StructField("path", StringType()),
    StructField("commit", StringType()),
    StructField("lang", StringType()),
    StructField("content", StringType()),
    StructField("content_sha256", StringType()),
])

# Stage 1 output: one row per entity mention (EntitySpan shape,
# reference tagger.rs:201-219, + doc keys and NED context window).
MENTIONS_SCHEMA = StructType([
    StructField("repo", StringType()),
    StructField("path", StringType()),
    StructField("commit", StringType()),
    StructField("content_sha256", StringType()),
    StructField("sha_ok", BooleanType()),
    StructField("mention_text", StringType()),
    StructField("category", StringType()),
    StructField("start_token", IntegerType()),
    StructField("end_token", IntegerType()),
    StructField("start", IntegerType()),
    StructField("end", IntegerType()),
    StructField("confidence", DoubleType()),
    StructField("source", StringType()),
    StructField("context_window", ArrayType(StringType())),
])

# Per-token tagging output (TaggedToken shape) — optional debug surface.
TAGGED_TOKENS_SCHEMA = StructType([
    StructField("repo", StringType()),
    StructField("path", StringType()),
    StructField("token_index", IntegerType()),
    StructField("token_text", StringType()),
    StructField("start", IntegerType()),
    StructField("end", IntegerType()),
    StructField("tag", StringType()),
    StructField("confidence", DoubleType()),
])

# Stage 2 output: mentions + NED resolution + NEL link.
LINKS_SCHEMA = StructType(
    MENTIONS_SCHEMA.fields
    + [
        StructField("resolved_category", StringType()),
        StructField("ned_confidence", DoubleType()),
        StructField("kb_id", StringType()),
        StructField("kb_name", StringType()),
        StructField("link_score", DoubleType()),
        StructField("surface", StringType()),  # normalized mention text
    ]
)

# Stage 3 output: surface → canonical entity id.
ENTITIES_SCHEMA = StructType([
    StructField("surface", StringType()),
    StructField("entity_id", StringType()),
])

# Stage 4 output: knowledge-graph triples (FIXTURES.md §7).
TRIPLES_SCHEMA = StructType([
    StructField("subj", StringType()),
    StructField("pred", StringType()),
    StructField("obj", StringType()),
    StructField("evidence_count", LongType()),
])

# Metrics / lineage table (FIXTURES.md §8) — the north rule's
# per-partition lineage + counters; one row per (stage, partition).
METRICS_SCHEMA = StructType([
    StructField("run_id", StringType()),
    StructField("stage", StringType()),
    StructField("partition_id", IntegerType()),
    StructField("rows_in", LongType()),
    StructField("rows_out", LongType()),
    StructField("content_sha_ok", BooleanType()),
    StructField("started_at", TimestampType()),
    StructField("finished_at", TimestampType()),
    StructField("checkpoint_path", StringType()),
])

"""Deterministic synthetic source-table generator (FIXTURES.md §1).

Builds the Iceberg-style input table ``(repo, path, commit, lang,
content, content_sha256)`` by replicating the 51 fixture texts across
synthetic repos.  Seeded and order-deterministic; one repo holds ~50%
of rows to exercise skew handling (salting / AQE skew join).

Scale is controlled by ``n_rows``; the driver testdata ``documents``
table can also be adapted via :func:`source_from_documents`.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ner_spark.data.corpus import CORPUS, DEMO_TEXTS
from ner_spark.schemas import SOURCE_SCHEMA

N_REPOS = 20
SKEW_REPO = "repo0"  # receives every even row → ~50% of the table


def fixture_texts() -> list[tuple[str, str]]:
    """(domain, text) for corpus sentences then demo texts."""
    out = [(domain, text) for text, domain, _ann in CORPUS]
    out += [(f"demo-{dom.lower()}", text) for dom, text in DEMO_TEXTS]
    return out


def _sha256(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def _sha1(s: str) -> str:
    return hashlib.sha1(s.encode("utf-8")).hexdigest()


def build_source_rows(n_rows: int) -> list[tuple[str, str, str, str, str, str]]:
    texts = fixture_texts()
    rows = []
    for i in range(n_rows):
        domain, text = texts[i % len(texts)]
        # skew fixture: even rows pile onto one repo
        repo = SKEW_REPO if i % 2 == 0 else f"repo{1 + (i % (N_REPOS - 1))}"
        path = f"docs/{domain}/{i}.txt"
        commit = _sha1(f"{repo}/{path}")
        rows.append((repo, path, commit, "pt", text, _sha256(text)))
    return rows


def source_table(spark: SparkSession, n_rows: int = 510, n_partitions: int | None = None) -> DataFrame:
    df = spark.createDataFrame(build_source_rows(n_rows), SOURCE_SCHEMA)
    if n_partitions:
        df = df.repartition(n_partitions)
    return df


def bench_source(spark: SparkSession, sf_dir: str, mult: int = 1) -> DataFrame:
    """Benchmark corpus: sf documents ∪ fixture corpus, each replicated
    ``mult``× with a unique per-replica token appended to ``content``
    (sha recomputed) so every row is a *distinct* document.

    Rationale: web-scale corpora are mostly unique documents; without
    uniquification the tag stage's exact-dup memo turns the benchmark
    into a dictionary-lookup measurement.  Generation is fully
    distributed (crossJoin with a range — no driver-side row list).
    """
    base = source_from_documents(spark, sf_dir).unionByName(
        source_table(spark, n_rows=510)
    )
    if mult <= 1:
        return base
    reps = spark.range(mult).select(F.col("id").alias("rep"))
    return (
        base.crossJoin(reps)
        # F.concat (unlike concat_ws) propagates NULL, so a null source
        # document stays null in every replica instead of becoming the
        # non-null string "docN"
        .withColumn(
            "content",
            F.concat("content", F.lit(" doc"), F.col("rep").cast("string")),
        )
        .withColumn("path", F.concat("path", F.lit("#"), F.col("rep").cast("string")))
        .withColumn("content_sha256", F.sha2("content", 256))
        .drop("rep")
        .repartition(spark.sparkContext.defaultParallelism)
    )


def source_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapt the driver's ``documents.parquet`` (doc_id, text, lang,
    source, n_chars) to the source-table shape."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )
    return docs.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("docs/"), F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        F.sha1(F.concat_ws("/", "source", "doc_id")).alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        F.sha2(F.col("text"), 256).alias("content_sha256"),
    )

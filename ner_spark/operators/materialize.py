"""Stage 4 — graph materialization: (subj, pred, obj) triples.

Emits the four predicates of FIXTURES.md §7 from the linked +
canonicalized mentions:

- ``(repo:<repo>, DECLARES, <entity_id>)``       evidence = #mentions
- ``(<ent_a>, MENTIONED_WITH, <ent_b>)`` a<b     evidence = #docs co-occurring
- ``(<entity_id>, LINKED_TO, <kb_id>)``          evidence = #linked mentions
- ``(<entity_id>, INSTANCE_OF, <category>)``     evidence = #mentions

Scale design: the fat mentions table is scanned and shuffled exactly
once into :func:`mention_counts` (a map-side-combinable pre-agg over a
narrow column slice); all four predicate branches aggregate that far
smaller table.  MENTIONED_WITH is a per-document self-pairing done
*without* a self-join: distinct entities per doc are collected (capped,
sorted) and pairs generated with array transforms — no quadratic join.
Docs with more than ``max_entities_per_doc`` distinct entities are
truncated to bound the pair blow-up; :func:`truncation_stats` reports
which docs were affected (the KG job logs its count to the metrics
table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_entities(links: DataFrame, entities: DataFrame) -> DataFrame:
    """Attach canonical entity_id to each linked mention (broadcast-able
    dimension in most corpora; Spark will pick broadcast vs SMJ by
    stats/AQE)."""
    return links.join(entities, "surface", "left").withColumn(
        "entity_id", F.coalesce("entity_id", F.concat(F.lit("ent:"), "surface"))
    )


def mention_counts(mentions_ent: DataFrame) -> DataFrame:
    """One map-side-combinable pre-aggregation all four triple branches
    consume: the fat mentions table is scanned and shuffled ONCE; the
    branches then aggregate this (far smaller) count table."""
    return mentions_ent.groupBy(
        "repo", "path", "entity_id", "kb_id", "resolved_category",
        (F.col("kb_id").isNotNull() & (F.col("link_score") >= 0.5)).alias("kb_linked"),
    ).agg(F.count("*").alias("c"))


def declares_triples(base: DataFrame) -> DataFrame:
    return (
        base.groupBy("repo", "entity_id")
        .agg(F.sum("c").alias("evidence_count"))
        .select(
            F.concat(F.lit("repo:"), "repo").alias("subj"),
            F.lit("DECLARES").alias("pred"),
            F.col("entity_id").alias("obj"),
            "evidence_count",
        )
    )


def mentioned_with_triples(
    base: DataFrame, max_entities_per_doc: int = 64
) -> DataFrame:
    per_doc = (
        base.groupBy("repo", "path")
        .agg(F.slice(F.sort_array(F.collect_set("entity_id")), 1, max_entities_per_doc).alias("ents"))
        .where(F.size("ents") >= 2)
    )
    pairs = per_doc.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ents"),
                    lambda a, i: F.transform(
                        F.slice(F.col("ents"), i + 2, F.size("ents")),
                        lambda b: F.struct(a.alias("a"), b.alias("b")),
                    ),
                )
            )
        ).alias("p")
    )
    return (
        pairs.groupBy("p.a", "p.b")
        .count()
        .select(
            F.col("a").alias("subj"),
            F.lit("MENTIONED_WITH").alias("pred"),
            F.col("b").alias("obj"),
            F.col("count").alias("evidence_count"),
        )
    )


def truncation_stats(
    links: DataFrame, entities: DataFrame, max_entities_per_doc: int = 64
) -> DataFrame:
    """Docs whose distinct-entity count exceeds the MENTIONED_WITH cap
    (their co-occurrence evidence is undercounted): (repo, path,
    n_entities)."""
    m = with_entities(
        links.select("repo", "path", "surface", "kb_id", "resolved_category", "link_score"),
        entities,
    )
    return (
        m.groupBy("repo", "path")
        .agg(F.countDistinct("entity_id").alias("n_entities"))
        .where(F.col("n_entities") > max_entities_per_doc)
    )


def linked_to_triples(base: DataFrame) -> DataFrame:
    return (
        base.where(F.col("kb_linked"))
        .groupBy("entity_id", "kb_id")
        .agg(F.sum("c").alias("evidence_count"))
        .select(
            F.col("entity_id").alias("subj"),
            F.lit("LINKED_TO").alias("pred"),
            F.col("kb_id").alias("obj"),
            "evidence_count",
        )
    )


def instance_of_triples(base: DataFrame) -> DataFrame:
    return (
        base.groupBy("entity_id", "resolved_category")
        .agg(F.sum("c").alias("evidence_count"))
        .select(
            F.col("entity_id").alias("subj"),
            F.lit("INSTANCE_OF").alias("pred"),
            F.col("resolved_category").alias("obj"),
            "evidence_count",
        )
    )


def materialize_triples(
    links: DataFrame, entities: DataFrame, max_entities_per_doc: int = 64
) -> DataFrame:
    # only the columns the branches need — keeps the scan narrow even
    # when ``links`` is a row-oriented in-memory checkpoint
    slim = links.select(
        "repo", "path", "surface", "kb_id", "resolved_category", "link_score"
    )
    base = mention_counts(with_entities(slim, entities)).localCheckpoint(eager=True)
    return (
        declares_triples(base)
        .unionByName(mentioned_with_triples(base, max_entities_per_doc))
        .unionByName(linked_to_triples(base))
        .unionByName(instance_of_triples(base))
    )

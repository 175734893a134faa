"""RDFS-lite entailment over the constructed KG — materialized
forward-chaining inference in the rho-df fragment.

The reference emits a flat triple store (``INSTANCE_OF`` plays
``rdf:type`` — reference ner-web renders category badges per entity,
main.rs htmx fragments); a KG consumer layering an ontology on top
expects the standard RDFS closure: class/property hierarchies plus
domain/range typing.  This module materializes that closure with the
schema-vs-facts split every scalable RDFS reasoner uses (WebPIE's
observation): the ONTOLOGY is tiny and closes first, then ONE
broadcast-join pass over the fact table derives the instance-level
consequences — the 100 TB fact table is never self-joined and never
iterated except in the (rare, schema-pathological) cascade case, which
the semi-naive loop covers and the round counter exposes.

Rules (rho-df):

- rdfs5/11   transitivity of ``subPropertyOf`` / ``subClassOf``
             (schema-side: :func:`ner_spark.plans.kg_query.path_closure`
             over the ontology relation only)
- rdfs7      (s P o), (P subPropertyOf* Q)  ->  (s Q o)
- rdfs2      (s P o), (P domain C)          ->  (s INSTANCE_OF C)
- rdfs3      (s P o), (P range  C)          ->  (o INSTANCE_OF C)
- rdfs9      (s INSTANCE_OF A), (A subClassOf+ B) -> (s INSTANCE_OF B)

Fragment guard: a ``subPropertyOf`` chain that maps a fact predicate
onto one of the SCHEMA predicates themselves (meta-level entailment —
new ``subClassOf`` edges appearing at fact-derivation time, which
would invalidate the precomputed schema closure) raises instead of
silently under-entailing.

Scale design: the schema closure is computed on the ontology relation
alone (semi-naive frontier iteration, already lineage-checkpointed);
the fact pass is broadcast hash joins of the fact table against the
closed schema — no shuffle of the facts except the final distinct.
Each loop round localCheckpoints its delta; with a cascade-free schema
(the normal case, including :func:`ontology`) the loop converges after
one derivation round plus one empty verification round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ner_spark.plans.kg_query import path_closure

RDF_TYPE = "INSTANCE_OF"
SUB_CLASS = "subClassOf"
SUB_PROP = "subPropertyOf"
DOMAIN = "domain"
RANGE = "range"
SCHEMA_PREDS = (SUB_CLASS, SUB_PROP, DOMAIN, RANGE)

# Deterministic demo ontology over the fixture KG's vocabulary
# (categories from core/tags.py CATEGORIES, predicates from
# operators/materialize.py).  Chosen so every rule fires on the gold
# graph, including the rdfs7 -> rdfs3 cascade (MENTIONED_WITH lifts to
# CO_OCCURS_WITH whose range then types the object) and a 2-hop
# subClassOf lift (PER -> class:Agent -> class:Thing).
ONTOLOGY_ROWS = [
    ("PER", SUB_CLASS, "class:Agent"),
    ("ORG", SUB_CLASS, "class:Agent"),
    ("LOC", SUB_CLASS, "class:Place"),
    ("MISC", SUB_CLASS, "class:Thing"),
    ("class:Agent", SUB_CLASS, "class:Thing"),
    ("class:Place", SUB_CLASS, "class:Thing"),
    ("DECLARES", SUB_PROP, "REFERS_TO"),
    ("LINKED_TO", SUB_PROP, "REFERS_TO"),
    ("REFERS_TO", SUB_PROP, "RELATED_TO"),
    ("MENTIONED_WITH", SUB_PROP, "CO_OCCURS_WITH"),
    ("CO_OCCURS_WITH", SUB_PROP, "RELATED_TO"),
    ("DECLARES", DOMAIN, "class:Repository"),
    ("LINKED_TO", RANGE, "class:KbRecord"),
    ("CO_OCCURS_WITH", RANGE, "class:Thing"),
]


def ontology(spark: SparkSession) -> DataFrame:
    """The committed demo ontology as a (subj, pred, obj) relation."""
    return spark.createDataFrame(ONTOLOGY_ROWS, "subj string, pred string, obj string")


def schema_closure(onto: DataFrame) -> dict[str, DataFrame]:
    """Close the (small) schema: transitive ``subClassOf`` /
    ``subPropertyOf`` plus the raw domain/range maps.  Returns
    ``{"sco": (subj, obj), "spo": (subj, obj), "domain": (p, c),
    "range": (p, c)}`` — all distinct, all intended for broadcast."""
    out = {}
    for key, pred in (("sco", SUB_CLASS), ("spo", SUB_PROP)):
        has = onto.where(F.col("pred") == pred).limit(1).count() > 0
        out[key] = (
            path_closure(onto, pred)
            if has
            else onto.sparkSession.createDataFrame([], "subj string, obj string")
        )
    for key, pred in (("domain", DOMAIN), ("range", RANGE)):
        out[key] = (
            onto.where(F.col("pred") == pred)
            .select(F.col("subj").alias("p"), F.col("obj").alias("c"))
            .distinct()
        )
    return out


def _derive_once(delta: DataFrame, cl: dict[str, DataFrame]) -> DataFrame:
    """All instance-level consequences of ``delta`` under the closed
    schema, staged so the common cascades resolve inside one call:
    rdfs7 first (superproperty copies), then rdfs2/rdfs3 over the
    rdfs7-extended facts, then rdfs9 over every type triple in scope.
    Pure broadcast joins; output may contain duplicates (the caller
    dedups against the accumulated closure)."""
    spo = F.broadcast(cl["spo"].withColumnRenamed("subj", "p").withColumnRenamed("obj", "q"))
    sco = F.broadcast(cl["sco"].withColumnRenamed("subj", "a").withColumnRenamed("obj", "b"))

    lifted = delta.join(spo, delta["pred"] == F.col("p")).select(
        "subj", F.col("q").alias("pred"), "obj"
    )
    facts = delta.unionByName(lifted)
    typed_dom = facts.join(F.broadcast(cl["domain"]), facts["pred"] == F.col("p")).select(
        "subj", F.lit(RDF_TYPE).alias("pred"), F.col("c").alias("obj")
    )
    typed_rng = facts.join(F.broadcast(cl["range"]), facts["pred"] == F.col("p")).select(
        F.col("obj").alias("subj"), F.lit(RDF_TYPE).alias("pred"), F.col("c").alias("obj")
    )
    types = (
        facts.where(F.col("pred") == RDF_TYPE)
        .unionByName(typed_dom)
        .unionByName(typed_rng)
    )
    uptyped = types.join(sco, types["obj"] == F.col("a")).select(
        "subj", F.lit(RDF_TYPE).alias("pred"), F.col("b").alias("obj")
    )
    return lifted.unionByName(typed_dom).unionByName(typed_rng).unionByName(uptyped)


def entail(
    triples: DataFrame, onto: DataFrame, max_rounds: int = 16
) -> DataFrame:
    """Materialize the RDFS closure of ``triples`` + ``onto``.

    Returns one row per DISTINCT entailed triple — (subj, pred, obj,
    inferred) with ``inferred`` false exactly for the input triples
    (facts and ontology) and true for every derived one, including the
    multi-hop schema-closure triples themselves (rdfs5/rdfs11).

    Semi-naive: round N derives only from round N-1's new triples (the
    schema is closed up front, so derivation never has to revisit old
    facts), each delta is lineage-checkpointed, and a loud guard
    raises at ``max_rounds`` rather than returning a partial closure.
    """
    facts = triples.select("subj", "pred", "obj")
    base = facts.unionByName(onto.select("subj", "pred", "obj")).distinct()
    cl = schema_closure(base)

    meta = cl["spo"].where(F.col("obj").isin(*SCHEMA_PREDS)).limit(1).count()
    if meta:
        raise ValueError(
            "subPropertyOf chain maps a predicate onto a schema "
            f"predicate {SCHEMA_PREDS} — meta-level entailment is "
            "outside the supported rho-df fragment (the schema closure "
            "would be stale the moment facts derive new schema triples)"
        )

    closure_triples = (
        cl["sco"].select("subj", F.lit(SUB_CLASS).alias("pred"), "obj")
        .unionByName(cl["spo"].select("subj", F.lit(SUB_PROP).alias("pred"), "obj"))
    )
    all_triples = base.unionByName(closure_triples).distinct().localCheckpoint(eager=True)
    delta = all_triples
    for _ in range(max_rounds):
        new = (
            _derive_once(delta, cl)
            .distinct()
            .join(all_triples, ["subj", "pred", "obj"], "left_anti")
            .localCheckpoint(eager=True)
        )
        if new.limit(1).count() == 0:
            break
        all_triples = all_triples.unionByName(new).localCheckpoint(eager=True)
        delta = new
    else:
        raise RuntimeError(
            f"entailment did not converge in {max_rounds} rounds — "
            "raise max_rounds or check the ontology for unexpected "
            "cascade depth"
        )

    marked = all_triples.join(
        base.withColumn("__base", F.lit(True)), ["subj", "pred", "obj"], "left"
    )
    return marked.select(
        "subj", "pred", "obj",
        (~F.coalesce(F.col("__base"), F.lit(False))).alias("inferred"),
    )


def entail_increment(
    closure: DataFrame,
    delta: DataFrame,
    onto: DataFrame,
    max_rounds: int = 16,
) -> DataFrame:
    """Consequences of ADDING ``delta`` to an already-entailed graph:
    returns the NEW entailed triples only — ``(subj, pred, obj)``
    distinct, disjoint from ``closure`` — so
    ``closure ∪ delta ∪ result`` equals ``entail(base ∪ delta)``'s
    triple set whenever ``closure`` is the closure of ``base ∪ onto``.

    This is the delta-proportional path the incremental KG
    maintenance layer needs: RDFS is monotone, so an ADDED fact can
    only add consequences, and the semi-naive loop seeded with the
    delta alone derives exactly them — each round is broadcast joins
    of the (small) frontier against the closed schema plus a
    BROADCAST anti-join against the closure slice whose subjects are
    delta endpoints (rho-df consequences never escape that set, so
    the slice is a complete dedup witness — one pruned scan of the
    closure, no full-closure shuffle per round).  The 100 TB closure
    is never re-derived and never joined against itself; measured
    4.1x over the full recompute at a 1% delta on the 500k-node
    bench graph (BENCH/KG_INFER.md).

    DELETIONS are out of scope by design (retracting a fact can
    strand derived triples, which needs over-delete/re-derive
    bookkeeping — DRed — or a full re-run); callers handling deletes
    recompute via :func:`entail`, exactly like the maintenance
    layer's differential-vs-full materialize decision.

    Fragment guard: ``delta`` must not add SCHEMA triples (they would
    invalidate the precomputed closure) — raises if it does.
    """
    has_schema = delta.where(
        F.col("pred").isin(*SCHEMA_PREDS)).limit(1).count()
    if has_schema:
        raise ValueError(
            "delta adds schema triples (subClassOf/subPropertyOf/"
            "domain/range) — the precomputed schema closure would be "
            "stale; re-run entail() over the union instead")
    keys = ["subj", "pred", "obj"]
    base_all = closure.select(*keys).unionByName(onto.select(*keys))
    cl = schema_closure(base_all)
    # Dedup locality: every rho-df consequence of the delta has its
    # SUBJECT inside the delta's endpoint set — rdfs7 keeps the
    # subject, rdfs2 types the subject, rdfs3 types the OBJECT (which
    # becomes the new subject), and rdfs9 re-types an existing
    # subject; inductively no round escapes {subj(Δ)} ∪ {obj(Δ)}.  So
    # the "already known?" anti-join never needs the whole closure —
    # only its rows whose subj is a delta endpoint: ONE pruned scan of
    # the closure materializes that slice (endpoint-out-degree-sized),
    # and every round's dedup is then a BROADCAST anti-join against
    # it, not a full-closure shuffle.  This is what makes the path
    # delta-proportional in shuffle volume, not just in derivation.
    endpoints = (delta.select(F.col("subj").alias("node"))
                 .unionByName(delta.select(F.col("obj").alias("node")))
                 .distinct())
    known_rel = (base_all.join(
        F.broadcast(endpoints.withColumnRenamed("node", "subj")),
        "subj", "left_semi").localCheckpoint(eager=True))
    new_delta = (delta.select(*keys).distinct()
                 .join(known_rel, keys, "left_anti")
                 .localCheckpoint(eager=True))
    acc = new_delta
    frontier = new_delta
    for _ in range(max_rounds):
        new = (
            _derive_once(frontier, cl)
            .distinct()
            .join(known_rel, keys, "left_anti")
            .join(acc, keys, "left_anti")
            .localCheckpoint(eager=True)
        )
        if new.limit(1).count() == 0:
            break
        acc = acc.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    else:
        raise RuntimeError(
            f"incremental entailment did not converge in {max_rounds} "
            "rounds")
    # result = delta + its consequences, minus what was already known
    # (already excluded per-round via known_rel; the return is already
    # disjoint from the closure, kept as a final distinct for the
    # documented contract)
    return acc.distinct()

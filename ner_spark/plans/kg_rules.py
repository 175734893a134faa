"""Rule-based KG materialization: CONSTRUCT queries as forward-
chaining inference rules, iterated to a fixpoint.

SPIN / SHACL-rules style enrichment for the constructed KG — each
rule is a SPARQL CONSTRUCT (a string, or pre-parsed
:func:`~ner_spark.plans.kg_query.construct` kwargs); a rule's
template instantiations join the graph and can trigger OTHER rules,
so "repos sharing an entity are RELATED_REPO" plus "RELATED_REPO is
transitive through CONNECTED" composes without the engine knowing
either predicate::

    materialize_rules(triples, [
        'CONSTRUCT { ?a RELATED_REPO ?b } '
        'WHERE { ?a DECLARES ?e . ?b DECLARES ?e FILTER(?a != ?b) }',
        'CONSTRUCT { ?a CONNECTED ?b } WHERE { ?a RELATED_REPO ?b }',
        'CONSTRUCT { ?a CONNECTED ?c } '
        'WHERE { ?a CONNECTED ?b . ?b RELATED_REPO ?c }',
    ])

The rho-df RDFS rules are the schema-optimized special case of this
(:mod:`ner_spark.plans.kg_infer` closes the schema once and touches
the fact table in one broadcast pass); this module is the GENERAL
engine for arbitrary conjunctive rules, evaluated naively: every
round re-runs each rule's CONSTRUCT against the accumulated graph,
dedups, anti-joins against what is already known, and stops when a
round derives nothing new.  Naive re-evaluation is the right
cost/complexity point at derived-predicate scale (rule heads are
usually far smaller than the base graph, convergence is typically
2-3 rounds, and every round's matching still gets the BGP planner's
selectivity order + pruned scans); the production extension at
10^12 facts is semi-naive delta-restricted matching, which the
round counter in the return value makes an observable drop-in.

Termination: conjunctive rules over a finite term universe are
monotone, so the fixpoint exists and is finite — but it can be large
(a transitive rule closes a graph), so ``max_rounds`` bounds the
loop and the overrun raises loudly instead of returning a prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_FIELDS = ("subj", "pred", "obj")


def parse_rule(rule) -> dict:
    """Normalize one rule to :func:`construct` kwargs: a CONSTRUCT
    query string parses through the SPARQL front-end (so rules and
    interactive queries share one grammar); a dict passes through
    after a key check."""
    if isinstance(rule, str):
        from ner_spark.plans.sparql import parse_sparql

        kw = parse_sparql(rule)
        if kw.pop("form") != "construct":
            raise ValueError(
                f"a rule must be a CONSTRUCT query, got: {rule!r}")
        return kw
    kw = dict(rule)
    if "pattern" not in kw or "template" not in kw:
        raise ValueError(
            f"a rule dict needs 'pattern' and 'template', got "
            f"{sorted(kw)}")
    return kw


def materialize_rules(
    triples: DataFrame,
    rules: list,
    max_rounds: int = 16,
) -> DataFrame:
    """Fixpoint of ``rules`` over ``triples``; see the module doc.

    Returns DISTINCT ``(subj, pred, obj, inferred)`` — ``inferred``
    false exactly for the input triples, true for every derived one
    (the same contract as :func:`ner_spark.plans.kg_infer.entail`).
    """
    from ner_spark.plans.kg_query import construct

    parsed = [parse_rule(r) for r in rules]
    base = triples.select(*_FIELDS).distinct().localCheckpoint(eager=True)
    all_triples = base
    for _ in range(max_rounds):
        derived = None
        for kw in parsed:
            kw = dict(kw)
            out = construct(all_triples, kw.pop("pattern"),
                            kw.pop("template"), **kw).select(*_FIELDS)
            derived = out if derived is None \
                else derived.unionByName(out)
        new = (
            derived.distinct()
            .join(all_triples, list(_FIELDS), "left_anti")
            .localCheckpoint(eager=True)
        )
        if new.isEmpty():
            break
        all_triples = all_triples.unionByName(new) \
                                 .localCheckpoint(eager=True)
    else:
        raise RuntimeError(
            f"rule materialization did not converge in {max_rounds} "
            "rounds — a transitive rule on a long chain? raise "
            "max_rounds or bound the rule with constants")
    marked = all_triples.join(
        base.withColumn("__base", F.lit(True)), list(_FIELDS), "left")
    return marked.select(
        *_FIELDS,
        (~F.coalesce(F.col("__base"), F.lit(False))).alias("inferred"),
    )

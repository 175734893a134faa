"""Declarative triple-pattern queries over the constructed KG.

The analytics layer (:mod:`ner_spark.plans.kg_analytics`) answers
whole-graph questions; this module answers *pointed* ones — the
SPARQL-style basic graph pattern (BGP) a KG consumer actually writes:

    match_pattern(triples, [
        ("?repo", "DECLARES",       "?e"),
        ("?e",    "MENTIONED_WITH", "?x"),
        ("?x",    "LINKED_TO",      "?kb"),
    ])

→ one row per binding of the variables (strings starting with ``?``),
one column per variable.  Constants compile to filters, shared
variables compile to equi-joins — i.e. the pattern IS the logical
plan, and Catalyst gets a plain filter/join tree it can reorder,
push down (a constant ``pred`` prunes the committed triple table's
``pred`` partitions) and broadcast where one leg is small.

Scale rules encoded here rather than hoped for:

- every pattern element after the first MUST share at least one
  variable with the elements before it — a disjoint element would be
  a cartesian product over the whole graph, so it raises instead of
  silently exploding;
- each element scans the triple table once with its constants pushed
  into the scan; the join chain is equi-joins on the shared variable
  ids only.

Output multiplicity: the triple table is unique per (subj, pred, obj)
— the materialize stage aggregates evidence — so the join of distinct
relations on the full variable set yields one row per distinct
binding with no ``distinct()`` needed (and the DuckDB twin
``__spark_entry__._kg_pattern_oracle`` reproduces the exact
multiset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FIELDS = ("subj", "pred", "obj")


def parse_pattern(text: str) -> list[tuple[str, str, str]]:
    """Parse the CLI pattern syntax — dot-separated triples of
    whitespace-separated terms, ``?``-prefixed terms are variables:

        "?repo DECLARES ?e . ?e MENTIONED_WITH ?x"

    Constants must not contain whitespace or ``.``, so multi-word
    entity ids (``ent:allan kardec``) are not expressible here — use
    the Python API (:func:`match_pattern`) for those; the CLI syntax
    covers the predicate constants and single-token node ids.
    """
    out: list[tuple[str, str, str]] = []
    for part in text.split("."):
        part = part.strip()
        if not part:
            continue
        terms = part.split()
        if len(terms) != 3:
            raise ValueError(
                f"pattern element {part!r} must have exactly 3 "
                "whitespace-separated terms"
            )
        out.append((terms[0], terms[1], terms[2]))
    if not out:
        raise ValueError("empty pattern")
    return out


def _is_var(term: str) -> bool:
    return term.startswith("?")


def match_pattern(
    triples: DataFrame,
    pattern: list[tuple[str, str, str]],
    optional: list[tuple[str, str, str]] = (),
) -> DataFrame:
    """Match a basic graph pattern; see the module docstring.

    ``optional`` elements have SPARQL OPTIONAL (left-join) semantics:
    a binding of the required pattern survives even when the optional
    element matches nothing, with the optional element's new variables
    null.  Filtering the optional element by its constants BEFORE the
    left join is exactly the ON-clause placement SPARQL specifies (a
    WHERE after the join would silently turn OPTIONAL back into a
    required match).

    Returns a DataFrame with one column per distinct ``?variable`` (in
    first-appearance order, ``?`` stripped).
    """
    if not pattern:
        raise ValueError("empty pattern")
    bound: DataFrame | None = None
    bound_vars: set[str] = set()
    var_order: list[str] = []  # first-appearance output column order
    elements = [(el, False) for el in pattern] + [
        (el, True) for el in optional
    ]
    for i, (element, is_optional) in enumerate(elements):
        if len(element) != 3:
            raise ValueError(f"pattern element {i} is not a triple")
        t = triples.select(*_FIELDS)
        cols: dict[str, str] = {}  # ?var -> first field carrying it
        for field, term in zip(_FIELDS, element):
            if _is_var(term):
                if term in cols:  # same var twice within one element
                    t = t.where(F.col(field) == F.col(cols[term]))
                else:
                    cols[term] = field
            else:
                t = t.where(F.col(field) == F.lit(term))
        t = t.select(
            *[F.col(f).alias(v[1:]) for v, f in cols.items()]
        )
        if bound is None:
            bound = t
        else:
            shared = bound_vars & set(cols)
            if not shared:
                raise ValueError(
                    f"pattern element {i} {element} shares no variable "
                    "with the preceding elements — joining it would be "
                    "a cartesian product over the whole graph; reorder "
                    "the pattern or bind a shared variable"
                )
            bound = bound.join(
                t, [v[1:] for v in sorted(shared)],
                "left" if is_optional else "inner",
            )
        bound_vars |= set(cols)
        var_order.extend(v for v in cols if v not in var_order)
    # Spark's equi-join hoists the join-key columns to the front;
    # restore first-appearance order for a stable, readable schema
    return bound.select(*[v[1:] for v in var_order])

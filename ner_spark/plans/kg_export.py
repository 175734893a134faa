"""N-Triples export for the materialized KG: serialize the triple
table to the line-oriented W3C interchange format, so the graph this
engine builds can load into any RDF store (Jena, Virtuoso, Oxigraph,
rdflib) without a custom reader.

The reference engine keeps its KG as an in-process map and answers
over HTTP (``ner-web/src/main.rs``); interchange is the missing
"hand the graph to someone else's tooling" surface, and N-Triples is
its lowest common denominator: one triple per line,

    <urn:ner:repo:r1> <urn:ner:DECLARES> <urn:ner:ent:x> .

Scale shape: the serialization is a pure per-row projection (concat +
a bounded replace chain) — no shuffle, no UDF, whole-stage codegen —
and the writer is ``df.write.text`` with one line column, so a 10^12
-triple export parallelizes like any scan and never touches the
driver.  Determinism: the LINE SET is deterministic (same triples →
same lines); line ORDER follows partition layout like every other
unordered relation, and the one-file convenience path
(:func:`ntriples_save`'s ``single_file``) sorts before coalescing so
small exports are byte-stable.

Term encoding — the engine's terms are opaque strings, not IRIs, so
they embed under a base prefix with a minimal percent-escape of the
characters N-Triples forbids inside ``<...>`` (space, the angle
brackets, double quote, backslash, and ``%`` itself as the escape
introducer).  The escape set is closed under composition order
(% first), making :func:`unescape_term` an exact inverse; everything
else (unicode included) passes through, which canonical N-Triples
permits.  Evidence counts ride as a literal-object line per edge
(``<...s> <urn:ner:evidence_count> "3" .``) when ``evidence=True`` —
N-Triples has no edge attributes, and reification would triple the
line count for a number most consumers drop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: characters N-Triples forbids inside an IRIREF, escaped as %XX.
#: '%' MUST come first: it is the escape introducer, and escaping it
#: first makes the chain injective (and unescaping, applied in
#: reverse, an exact inverse).
_ESCAPES = [("%", "%25"), (" ", "%20"), ("<", "%3C"),
            (">", "%3E"), ('"', "%22"), ("\\", "%5C")]

DEFAULT_BASE = "urn:ner:"


def escape_term(term: str) -> str:
    """Driver-side twin of the column escape (used by tests and
    small-data callers)."""
    for raw, esc in _ESCAPES:
        term = term.replace(raw, esc)
    return term


def unescape_term(term: str) -> str:
    """Exact inverse of :func:`escape_term`."""
    for raw, esc in reversed(_ESCAPES):
        term = term.replace(esc, raw)
    return term


#: edge-id components additionally escape the solidus, making the
#: ``edge:S/P/O`` reified id splittable on ``/``
_EDGE_ESCAPES = _ESCAPES + [("/", "%2F")]


def _esc_col(c: Column, escapes=tuple(_ESCAPES)) -> Column:
    for raw, esc in escapes:
        c = F.replace(c, F.lit(raw), F.lit(esc))
    return c


def _iri(c: Column, base: str) -> Column:
    return F.concat(F.lit("<" + base), _esc_col(c), F.lit(">"))


def ntriples_lines(
    triples: DataFrame,
    base: str = DEFAULT_BASE,
    evidence: bool = False,
) -> DataFrame:
    """Serialize ``(subj, pred, obj[, evidence_count])`` to one
    N-Triples ``line`` column.

    With ``evidence=True`` each edge adds a second line carrying its
    count as an xsd:integer literal on an ``evidence_count``
    predicate IRI; the subject of that line is the edge's reified id
    ``<base>edge:S/P/O`` where S, P, O are the terms escaped with
    ``/`` ADDED to the escape set (→ ``%2F``) — so splitting the
    edge id on ``/`` is unambiguous even for terms that contain a
    solidus.
    """
    if base != DEFAULT_BASE:
        # any base goes into the IRI verbatim; forbid the characters
        # that would break the IRIREF lexical form itself
        if any(ch in base for ch in ' <>"\\'):
            raise ValueError(
                f"base {base!r} contains characters N-Triples forbids "
                "inside an IRI")
    data = triples.select(
        F.concat(
            _iri(F.col("subj"), base), F.lit(" "),
            _iri(F.col("pred"), base), F.lit(" "),
            _iri(F.col("obj"), base), F.lit(" ."),
        ).alias("line"))
    if not evidence:
        return data
    ee = tuple(_EDGE_ESCAPES)
    edge = F.concat(
        F.lit("<" + base + "edge:"), _esc_col(F.col("subj"), ee),
        F.lit("/"), _esc_col(F.col("pred"), ee),
        F.lit("/"), _esc_col(F.col("obj"), ee), F.lit(">"))
    ev = triples.select(
        F.concat(
            edge, F.lit(" <" + base + "evidence_count> \""),
            F.col("evidence_count").cast("string"),
            F.lit('"^^<http://www.w3.org/2001/XMLSchema#integer> .'),
        ).alias("line"))
    return data.unionAll(ev)


def ntriples_save(
    triples: DataFrame,
    path: str,
    base: str = DEFAULT_BASE,
    evidence: bool = False,
    single_file: bool = False,
) -> None:
    """Write the serialization as text.  ``single_file`` sorts the
    lines and coalesces to one partition — byte-stable output for
    small graphs and fixtures; leave it False at scale (the sort is a
    global shuffle and one partition is one writer)."""
    lines = ntriples_lines(triples, base=base, evidence=evidence)
    if single_file:
        lines = lines.orderBy("line").coalesce(1)
    lines.write.mode("overwrite").text(path)

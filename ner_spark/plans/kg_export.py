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


def _unesc_col(c: Column, escapes=tuple(_ESCAPES)) -> Column:
    for raw, esc in reversed(escapes):
        c = F.replace(c, F.lit(esc), F.lit(raw))
    return c


#: data line: three IRIREFs and a dot.  IRIREF content = anything but
#: the forbidden set (space, <>, ", \) — exactly what escape_term
#: guarantees never survives inside a term
_NT_TERM = r'<([^ <>"\\]*)>'
_NT_DATA_RE = f"^{_NT_TERM} {_NT_TERM} {_NT_TERM} \\.$"
_NT_EV_RE = (f"^{_NT_TERM} {_NT_TERM} "
             '"(\\d+)"\\^\\^<http://www\\.w3\\.org/2001/'
             "XMLSchema#integer> \\.$")


def ntriples_parse(
    lines: DataFrame,
    base: str = DEFAULT_BASE,
    strict: bool = True,
) -> DataFrame:
    """Parse N-Triples text (the ``line``/``value`` string column a
    :func:`ntriples_save` directory reads back as) into the engine's
    ``(subj, pred, obj, evidence_count)`` relation — the import half
    of the interchange surface, so a graph can round-trip through any
    RDF tooling and come back queryable.

    Data lines under ``base`` become edges (terms unescaped with the
    exact inverse of the export chain); ``evidence_count`` literal
    lines re-attach their count to the edge they reify (left join on
    the parsed edge id — an edge with no evidence line defaults to
    count 1, which is what an export with ``evidence=False``
    round-trips through).  Blank lines and ``#`` comments are
    allowed, as the format permits.

    ``strict=True`` (default) runs ONE validation aggregate first and
    raises with up to 5 offending lines if anything else appears —
    IRIs under a different base included (silently dropping foreign
    triples would corrupt a round-trip); ``strict=False`` skips the
    action and drops unparseable/foreign lines, the
    ingest-what-you-can mode for third-party exports.

    Scale shape: parsing is per-row regexp_extract + replace chains
    (codegen, no shuffle); the evidence re-attach is one equi-join on
    the edge id, broadcastable when the evidence side is small and
    AQE-planned otherwise; ``strict`` adds one full-scan aggregate.
    """
    col = "line" if "line" in lines.columns else "value"
    raw = lines.select(F.col(col).alias("line"))
    ignorable = (F.trim(F.col("line")) == "") | \
        F.col("line").startswith("#")
    data_m = F.regexp_extract("line", _NT_DATA_RE, 0) != ""
    ev_m = F.regexp_extract("line", _NT_EV_RE, 0) != ""

    def under_base(i: int, pat: str) -> Column:
        return F.regexp_extract("line", pat, i).startswith(base)

    eb = base + "edge:"
    data_ok = data_m & under_base(1, _NT_DATA_RE) \
        & under_base(2, _NT_DATA_RE) & under_base(3, _NT_DATA_RE)
    ev_ok = ev_m \
        & F.regexp_extract("line", _NT_EV_RE, 1).startswith(eb) \
        & (F.regexp_extract("line", _NT_EV_RE, 2)
           == base + "evidence_count")
    if strict:
        bad = (raw.where(~(ignorable | data_ok | ev_ok))
               .limit(5).collect())
        if bad:
            raise ValueError(
                "unparseable or foreign N-Triples line(s) under base "
                f"{base!r} (strict=False drops them): "
                + "; ".join(repr(r["line"]) for r in bad))

    def term(i: int) -> Column:
        return _unesc_col(F.regexp_extract(
            "line", _NT_DATA_RE, i).substr(F.lit(len(base) + 1),
                                           F.length("line")))

    edges = raw.where(data_ok).select(
        term(1).alias("subj"), term(2).alias("pred"),
        term(3).alias("obj"))
    ev_id = F.regexp_extract("line", _NT_EV_RE, 1)
    ev = raw.where(ev_ok).select(
        ev_id.substr(F.lit(len(eb) + 1), F.length("line"))
        .alias("edge_id"),
        F.regexp_extract("line", _NT_EV_RE, 3).cast("bigint")
        .alias("evidence_count"))
    ee = tuple(_EDGE_ESCAPES)
    parts = F.split(F.col("edge_id"), "/")
    ev = ev.where(F.size(parts) == 3).select(
        _unesc_col(parts[0], ee).alias("subj"),
        _unesc_col(parts[1], ee).alias("pred"),
        _unesc_col(parts[2], ee).alias("obj"),
        "evidence_count")
    out = edges.join(ev, ["subj", "pred", "obj"], "left")
    return out.select(
        "subj", "pred", "obj",
        F.coalesce("evidence_count", F.lit(1).cast("bigint"))
        .alias("evidence_count"))


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


# --------------------------------------------------------------- N-Quads

#: data line: four IRIREFs (graph label LAST, per W3C N-Quads) + dot
_NQ_DATA_RE = f"^{_NT_TERM} {_NT_TERM} {_NT_TERM} {_NT_TERM} \\.$"
_NQ_EV_RE = _NT_EV_RE  # evidence lines are default-graph N-Triples


def nquads_lines(
    quads: DataFrame,
    base: str = DEFAULT_BASE,
    evidence: bool = False,
) -> DataFrame:
    """Serialize ``(graph, subj, pred, obj[, evidence_count])`` to one
    W3C N-Quads ``line`` column — the named-graph twin of
    :func:`ntriples_lines`, with the graph label as the fourth term:

        <urn:ner:repo:r1> <urn:ner:DECLARES> <urn:ner:ent:x> <urn:ner:g:r1> .

    Same scale shape (pure per-row projection, no shuffle, codegen)
    and the same escape chain, so any N-Quads consumer (Jena,
    Oxigraph, rdflib) loads the provenance graphs as-is.  With
    ``evidence=True`` each quad adds a DEFAULT-GRAPH line carrying
    its count on the reified edge id ``<base>edge:G/S/P/O`` (graph
    FIRST, ``/``-escaped like the N-Triples edge ids) — quads are
    unique per (graph, s, p, o), so the id is unambiguous."""
    if base != DEFAULT_BASE:
        if any(ch in base for ch in ' <>"\\'):
            raise ValueError(
                f"base {base!r} contains characters N-Quads forbids "
                "inside an IRI")
    data = quads.select(
        F.concat(
            _iri(F.col("subj"), base), F.lit(" "),
            _iri(F.col("pred"), base), F.lit(" "),
            _iri(F.col("obj"), base), F.lit(" "),
            _iri(F.col("graph"), base), F.lit(" ."),
        ).alias("line"))
    if not evidence:
        return data
    ee = tuple(_EDGE_ESCAPES)
    edge = F.concat(
        F.lit("<" + base + "edge:"), _esc_col(F.col("graph"), ee),
        F.lit("/"), _esc_col(F.col("subj"), ee),
        F.lit("/"), _esc_col(F.col("pred"), ee),
        F.lit("/"), _esc_col(F.col("obj"), ee), F.lit(">"))
    ev = quads.select(
        F.concat(
            edge, F.lit(" <" + base + "evidence_count> \""),
            F.col("evidence_count").cast("string"),
            F.lit('"^^<http://www.w3.org/2001/XMLSchema#integer> .'),
        ).alias("line"))
    return data.unionAll(ev)


def nquads_parse(
    lines: DataFrame,
    base: str = DEFAULT_BASE,
    strict: bool = True,
) -> DataFrame:
    """Parse N-Quads text back into ``(graph, subj, pred, obj,
    evidence_count)`` — the exact inverse of :func:`nquads_lines`,
    with the same strict/lenient contract and scale shape as
    :func:`ntriples_parse` (per-row regexes, one equi-join to
    re-attach evidence, one validation aggregate under strict)."""
    col = "line" if "line" in lines.columns else "value"
    raw = lines.select(F.col(col).alias("line"))
    ignorable = (F.trim(F.col("line")) == "") | \
        F.col("line").startswith("#")
    data_m = F.regexp_extract("line", _NQ_DATA_RE, 0) != ""
    ev_m = F.regexp_extract("line", _NQ_EV_RE, 0) != ""

    def under_base(i: int) -> Column:
        return F.regexp_extract("line", _NQ_DATA_RE, i).startswith(base)

    eb = base + "edge:"
    data_ok = data_m & under_base(1) & under_base(2) \
        & under_base(3) & under_base(4)
    ev_ok = ev_m \
        & F.regexp_extract("line", _NQ_EV_RE, 1).startswith(eb) \
        & (F.regexp_extract("line", _NQ_EV_RE, 2)
           == base + "evidence_count")
    if strict:
        bad = (raw.where(~(ignorable | data_ok | ev_ok))
               .limit(5).collect())
        if bad:
            raise ValueError(
                "unparseable or foreign N-Quads line(s) under base "
                f"{base!r} (strict=False drops them): "
                + "; ".join(repr(r["line"]) for r in bad))

    def term(i: int) -> Column:
        return _unesc_col(F.regexp_extract(
            "line", _NQ_DATA_RE, i).substr(F.lit(len(base) + 1),
                                           F.length("line")))

    edges = raw.where(data_ok).select(
        term(4).alias("graph"), term(1).alias("subj"),
        term(2).alias("pred"), term(3).alias("obj"))
    ev_id = F.regexp_extract("line", _NQ_EV_RE, 1)
    ev = raw.where(ev_ok).select(
        ev_id.substr(F.lit(len(eb) + 1), F.length("line"))
        .alias("edge_id"),
        F.regexp_extract("line", _NQ_EV_RE, 3).cast("bigint")
        .alias("evidence_count"))
    ee = tuple(_EDGE_ESCAPES)
    parts = F.split(F.col("edge_id"), "/")
    ev = ev.where(F.size(parts) == 4).select(
        _unesc_col(parts[0], ee).alias("graph"),
        _unesc_col(parts[1], ee).alias("subj"),
        _unesc_col(parts[2], ee).alias("pred"),
        _unesc_col(parts[3], ee).alias("obj"),
        "evidence_count")
    out = edges.join(ev, ["graph", "subj", "pred", "obj"], "left")
    return out.select(
        "graph", "subj", "pred", "obj",
        F.coalesce("evidence_count", F.lit(1).cast("bigint"))
        .alias("evidence_count"))


def nquads_save(
    quads: DataFrame,
    path: str,
    base: str = DEFAULT_BASE,
    evidence: bool = False,
    single_file: bool = False,
) -> None:
    """Write the N-Quads serialization as text; ``single_file`` sorts
    + coalesces for byte-stable small exports, same contract as
    :func:`ntriples_save`."""
    lines = nquads_lines(quads, base=base, evidence=evidence)
    if single_file:
        lines = lines.orderBy("line").coalesce(1)
    lines.write.mode("overwrite").text(path)

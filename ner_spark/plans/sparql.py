"""A SPARQL 1.1 text front-end for the KG query layer: parse a
SELECT / ASK / CONSTRUCT query string into the exact keyword arguments
:func:`ner_spark.plans.kg_query.solutions` (and
:func:`~ner_spark.plans.kg_query.construct`) consume, so the whole
surface that module implements — BGPs, OPTIONAL, FILTER (comparisons,
REGEX/STRSTARTS/STRENDS/CONTAINS), FILTER NOT EXISTS / FILTER EXISTS,
MINUS, property paths ``P+``/``P*``/``P?``, sequence paths ``P1/P2``,
inverse ``^P``, alternation ``(P1|P2)``, negated property sets
``!P``/``!(P1|P2)``, UNION, VALUES with UNDEF, GROUP BY + aggregates,
SELECT projection, DISTINCT, ORDER BY, LIMIT — is
reachable from one query string::

    sparql(triples, '''
        SELECT ?repo (COUNT(DISTINCT ?e) AS ?n)
        WHERE { ?repo DECLARES ?e . ?e LINKED_TO ?kb
                FILTER STRSTARTS(?kb, "kb:") }
        GROUP BY ?repo ORDER BY DESC(?n) ?repo LIMIT 10
    ''')

The reference engine answers entity queries over HTTP
(``ner-web/src/main.rs:100-116``); this module is the equivalent
"ask the graph" surface for the KG this repo materializes, expressed
as a compiler onto the Spark relational layer rather than a bespoke
executor: the TEXT is parsed here, but every operator it denotes is
the already-plan-audited DataFrame composition in ``kg_query`` —
parsing adds zero runtime cost and no new physical shapes.

Supported grammar (a strict subset of SPARQL 1.1; anything outside it
raises with the offending token rather than mis-parsing):

.. code-block:: text

    Query     := Select | Ask | Construct | Describe
    Select    := 'SELECT' 'DISTINCT'? ('*' | Proj+) Dataset*
                 'WHERE'? Group
                 ('GROUP' 'BY' Var+)? ('HAVING' '(' Var Op NUM ')')*
                 ('ORDER' 'BY' Ord+)?
                 ('LIMIT' INT | 'OFFSET' INT)*
    Proj      := Var | '(' Agg '(' ('DISTINCT'? Var | '*')
                 (';' 'SEPARATOR' '=' String)? ')' 'AS' Var ')'
    Agg       := 'COUNT' | 'MIN' | 'MAX' | 'GROUP_CONCAT' | 'SAMPLE'
               | 'SUM' | 'AVG'
    Ask       := 'ASK' Dataset* 'WHERE'? Group
    Dataset   := 'FROM' 'NAMED'? Term
                 (FROM graphs merge into the default graph plain
                  triples match; FROM NAMED restricts which graphs
                  GRAPH blocks may bind — a constant outside the set
                  matches nothing)
    Construct := 'CONSTRUCT' '{' Triple+ '}' Dataset* 'WHERE' Group
               | 'CONSTRUCT' 'WHERE' '{' Triple+ '}'
    Describe  := 'DESCRIBE' Term+ ('WHERE'? Group)?
    Group     := '{' GroupBody '}'
    GroupBody := Union | (Triple | Optional | Filter | Values | Bind
                 | Minus | SubSelect | GraphBlock)*
    GraphBlock:= 'GRAPH' (Var | Term) '{' Triple+ Filter* '}' '.'?
                 (needs a QUADS relation — a 'graph' column; a
                  variable binds the graph name and constrains the
                  block's triples to the SAME graph, a constant
                  prunes to that graph; plain triples outside GRAPH
                  match the union default graph, i.e. the RDF merge;
                  block-local boolean FILTERs hoist to group scope —
                  equivalent for a conjunctive block)
    SubSelect := '{' 'SELECT' ... '}'   (a nested Select, same form)
    Bind      := 'BIND' '(' (Term | Fn '(' Term (',' Term)* ')'
                 | 'IF' '(' Expr ',' Term ',' Term ')') 'AS' Var ')'
    Fn        := 'CONCAT' | 'UCASE' | 'LCASE' | 'STR' | 'STRLEN'
               | 'COALESCE' | 'SUBSTR' | 'REPLACE'
               | 'STRBEFORE' | 'STRAFTER' | 'SHA256' | 'MD5'
    Union     := Group ('UNION' Group)+
    Optional  := 'OPTIONAL' '{' Triple+ (Filter | Bind)* '}'
                 (group semantics: local FILTER/BIND evaluate INSIDE,
                  before the left join; multi-triple groups atomic)
    Minus     := 'MINUS' '{' Triple+ '}'
    Filter    := 'FILTER' ('NOT'? 'EXISTS' '{' Triple+ '}'
                 | '(' Expr ')' | Func | Bound)
    Expr      := AndExpr ('||' AndExpr)*
    AndExpr   := Unary ('&&' Unary)*
    Unary     := '!' Unary | Atom
    Atom      := '(' Expr ')' | Func | Bound
                 | Var ('='|'!='|'<'|'<='|'>'|'>=') Term
                 | Var 'NOT'? 'IN' '(' Datum (',' Datum)* ')'
    Func      := ('REGEX'|'STRSTARTS'|'STRENDS'|'CONTAINS')
                 '(' Var ',' String ')'
    Bound     := 'BOUND' '(' Var ')'
    Values    := 'VALUES' (Var '{' Datum+ '}'
                 | '(' Var+ ')' '{' ('(' Datum+ ')')+ '}')
    Datum     := String | Word | 'UNDEF'
    Triple    := Term Path Term '.'?
    Path      := Seg ('/' Seg)*
    Seg       := '!'? '^'? (Word | '(' Word ('|' Word)+ ')') [+*?]?
    Term      := Var | String | '<' IRI '>' | Word

Deliberate restrictions, matching the engine's semantics:

- Terms are strings (the triple table is string-typed); numeric
  literals go in quotes and compare lexicographically, like the rest
  of the engine and its DuckDB twins.
- A group mixes triples with OPTIONAL/FILTER/VALUES **or** is a
  UNION of sub-groups — SPARQL's join-of-union-with-BGP inside one
  group is not expressible in :func:`~ner_spark.plans.kg_query.
  match_union` and raises here instead of silently reassociating.
- Aggregates are the engine's portable set (COUNT / COUNT DISTINCT /
  MIN / MAX / GROUP_CONCAT [with SEPARATOR] / SAMPLE / SUM / AVG —
  the numeric pair TRY_CASTs terms to an exact decimal, skipping
  junk/unbound, and surfaces as DOUBLE).
- SELECT REDUCED is pinned to DISTINCT (the spec's "may deduplicate"
  cannot hash-match an oracle).
- HAVING compares a numeric aggregate's ALIAS (COUNT / COUNT
  DISTINCT / SUM / AVG) to a number — integer or decimal
  (``HAVING(?n >= 2)``, ``HAVING(?avg >= 1.5)``; the tokenizer
  emits ``\\d+.\\d+`` as one literal, so a triple-separator ``.``
  after a bare integer object still splits).  SPARQL's
  inline-aggregate HAVING form is not re-parsed.
- OFFSET requires ORDER BY (an unordered OFFSET is nondeterministic).
- Keywords are case-insensitive; bare constants that collide with a
  keyword (a predicate literally named ``FILTER``) need quotes.
- ``&&`` / ``||`` must be whitespace-separated from a preceding bare
  word (``?a = ?b || ?c = ?d``): predicates may legally contain ``|``
  (path alternation) and the tokenizer keeps word runs whole, so an
  unspaced ``?a||?b`` reads as one malformed term and raises.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<string>"(?:[^"\\]|\\.)*")   # quoted literal
      | (?P<iri><[^<>\s]*>)             # <iri>
      | (?P<seqpath>                    # sequence path with >=1 '/'
            (?:!?\^?\([^\s()|/]+(?:\|[^\s()|/]+)+\)[+*?]?
              |!?[^\s{}().,"<>=!/]+)    #   segment: [!](P1|P2)[mod]|word
            (?:/
            (?:!?\^?\([^\s()|/]+(?:\|[^\s()|/]+)+\)[+*?]?
              |!?[^\s{}().,"<>=!/]+))+)
      | (?P<negset>                     # negated property set !P /
            !\^?\([^\s()|]+(?:\|[^\s()|]+)*\)[+*?]?
          | !\^?[^\s{}().,"<>=!/|]+)    # !(P1|P2); trailing mod / ^
                                        # kept so the path layer can
                                        # reject them with its own
                                        # clear error ('!=' never
                                        # matches: '=' is excluded)
      | (?P<altpath>\^?\([^\s()|]+(?:\|[^\s()|]+)+\)[+*?]?)
                                        # (P1|P2)[+*?] path alternation
      | (?P<parenpath>\^?\((?=[^)]*[/|])[\w:|/^+*.-]+\)[+*?]?)
                                        # other paren path forms — e.g.
                                        # (P/Q)+ — kept whole so the
                                        # path layer can reject them
                                        # with its own clear error; the
                                        # lookahead requires a path
                                        # operator inside, so (*) and
                                        # bare (CONST) stay punct+word
      | (?P<number>\d+\.\d+)            # decimal literal (digits on
                                        # BOTH sides, so a triple
                                        # separator '.' after a bare
                                        # integer object still splits)
      | (?P<punct>[{}().,;]|!=|<=|>=|=|<|>|\*|\|\||&&|!)
      | (?P<word>[^\s{}().,"<>=!;]+)    # vars, keywords, constants
                                        # (';' excluded: it separates
                                        # chained update operations)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {
    "SELECT", "DISTINCT", "WHERE", "OPTIONAL", "FILTER", "NOT",
    "EXISTS", "MINUS", "UNION", "VALUES", "UNDEF", "GROUP", "BY", "ORDER",
    "ASC", "DESC", "LIMIT", "OFFSET", "HAVING", "ASK", "CONSTRUCT",
    "DESCRIBE", "AS", "BIND", "REDUCED", "SEPARATOR", "GRAPH",
}
_AGG_FNS = {"COUNT", "MIN", "MAX", "GROUP_CONCAT", "SAMPLE",
            "SUM", "AVG"}
_FILTER_FNS = {"REGEX": "regex", "STRSTARTS": "strstarts",
               "STRENDS": "strends", "CONTAINS": "contains"}
_CMP_OPS = {"=", "!=", "<", "<=", ">", ">="}


def tokenize(text: str) -> list[str]:
    """Split a query into tokens; quoted strings keep their quotes so
    later stages can tell a literal from a keyword."""
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            rest = text[pos:].lstrip()
            if not rest:
                break
            raise ValueError(f"cannot tokenize at: {rest[:40]!r}")
        pos = m.end()
        out.append(m.group().strip())
    return out


class _Cursor:
    """Token stream with one-token lookahead and keyword-aware eats."""

    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def peek_kw(self) -> str | None:
        t = self.peek()
        return t.upper() if t is not None and t.upper() in _KEYWORDS \
            else None

    def next(self) -> str:
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of query")
        self.i += 1
        return t

    def eat(self, tok: str) -> None:
        t = self.next()
        if t.upper() != tok.upper():
            raise ValueError(f"expected {tok!r}, got {t!r}")

    def at(self, tok: str) -> bool:
        t = self.peek()
        return t is not None and t.upper() == tok.upper()

    def done(self) -> bool:
        return self.i >= len(self.toks)


def _unquote(tok: str) -> str:
    if tok.startswith('"'):
        return re.sub(r"\\(.)", r"\1", tok[1:-1])
    if tok.startswith("<"):
        return tok[1:-1]
    return tok


def _term(tok: str) -> str:
    """A triple/VALUES term: variables pass through, quoted strings
    and <iris> unquote, bare words are constants."""
    if tok.startswith("?"):
        return tok
    return _unquote(tok)


def _parse_triples(cur: _Cursor) -> list[tuple[str, str, str]]:
    """Dot-separated triples up to the closing brace (not consumed)."""
    def term() -> str:
        t = cur.next()
        if t in "{}().,;":
            raise ValueError(
                f"expected a triple term, got {t!r} — a sub-group "
                "cannot join with triples in the same group (only a "
                "pure UNION alternation), and ';' separates whole "
                "update operations, not triples")
        return _term(t)

    out = []
    while not cur.at("}"):
        if cur.peek_kw() in ("OPTIONAL", "FILTER", "VALUES", "UNION",
                             "BIND", "MINUS", "GRAPH"):
            break
        if cur.at("{"):  # a subquery starts — group loop handles it
            break
        out.append((term(), term(), term()))
        if cur.at("."):
            cur.next()
    return out


def _parse_filter_expr(cur: _Cursor) -> tuple:
    """One FILTER body → a kg_query parsed-filter tuple.  Per the
    SPARQL grammar a constraint is either a bracketed expression or a
    bare built-in call — ``FILTER(?a = ?b || !BOUND(?k))`` or
    ``FILTER STRSTARTS(?e, "ent:")``; a bare unbracketed comparison
    or connective raises."""
    t = cur.peek()
    if cur.at("("):
        cur.next()
        inner = _parse_filter_or(cur)
        cur.eat(")")
        return inner
    if t is not None and (t.upper() in _FILTER_FNS
                          or t.upper() == "BOUND"):
        return _parse_filter_atom(cur)
    raise ValueError(
        f"FILTER constraint must be a bracketed expression or a "
        f"built-in call, got {t!r}")


def _parse_filter_or(cur: _Cursor) -> tuple:
    """``Expr := AndExpr ('||' AndExpr)*`` — SPARQL's logical-or, the
    lowest-precedence connective."""
    terms = [_parse_filter_and(cur)]
    while cur.peek() == "||":
        cur.next()
        terms.append(_parse_filter_and(cur))
    return terms[0] if len(terms) == 1 else ("or", terms)


def _parse_filter_and(cur: _Cursor) -> tuple:
    """``AndExpr := Unary ('&&' Unary)*``."""
    terms = [_parse_filter_unary(cur)]
    while cur.peek() == "&&":
        cur.next()
        terms.append(_parse_filter_unary(cur))
    return terms[0] if len(terms) == 1 else ("and", terms)


def _parse_filter_unary(cur: _Cursor) -> tuple:
    """``Unary := '!' Unary | Atom``.  The tokenizer glues ``!`` onto
    a following bare word (``!BOUND`` arrives as one negated-set
    token, a triple-context form), so a leading ``!`` is stripped and
    the remainder pushed back for atom parsing."""
    t = cur.peek()
    if t is not None and t != "!=" and t.startswith("!"):
        cur.next()
        if len(t) > 1:
            cur.toks.insert(cur.i, t[1:])
        return ("not", _parse_filter_unary(cur))
    return _parse_filter_atom(cur)


def _parse_filter_atom(cur: _Cursor) -> tuple:
    """``Atom`` — parenthesized sub-expression, string function,
    BOUND, IN / NOT IN membership, or a comparison."""
    t = cur.peek()
    if cur.at("("):
        cur.next()
        inner = _parse_filter_or(cur)
        cur.eat(")")
        return inner
    if t is not None and t.upper() in _FILTER_FNS:
        fn = _FILTER_FNS[cur.next().upper()]
        cur.eat("(")
        var = cur.next()
        if not var.startswith("?"):
            raise ValueError(f"FILTER {fn} needs a ?variable, got {var!r}")
        cur.eat(",")
        lit = cur.next()
        if not lit.startswith('"'):
            raise ValueError(f"FILTER {fn} needs a quoted literal")
        cur.eat(")")
        return (fn, var, _unquote(lit))
    if t is not None and t.upper() == "BOUND":
        cur.next()
        cur.eat("(")
        var = cur.next()
        if not var.startswith("?"):
            raise ValueError(f"BOUND needs a ?variable, got {var!r}")
        cur.eat(")")
        return ("bound", var)
    lhs = cur.next()
    if not lhs.startswith("?"):
        raise ValueError(
            f"FILTER comparison must start with a ?variable, got {lhs!r}")
    if cur.at("IN") or cur.at("NOT"):
        neg = False
        if cur.at("NOT"):
            cur.next()
            neg = True
        cur.eat("IN")
        cur.eat("(")
        vals: list[str] = []
        while not cur.at(")"):
            v = cur.next()
            if v.startswith("?"):
                raise ValueError(
                    f"IN list term {v!r} must be a constant (quote "
                    "literals; variable terms are not supported)")
            if v in "{}().,":
                raise ValueError(f"expected an IN list term, got {v!r}")
            vals.append(_unquote(v))
            if cur.at(","):
                cur.next()
        cur.next()  # )
        if not vals:
            raise ValueError("IN needs at least one term")
        return ("notin" if neg else "in", lhs, vals)
    op = cur.next()
    if op not in _CMP_OPS:
        raise ValueError(f"unsupported FILTER operator {op!r}")
    rhs = cur.next()
    rv = ("var", rhs) if rhs.startswith("?") else ("const", _unquote(rhs))
    return ("cmp", lhs, op, rv)


def _parse_bind(cur: _Cursor) -> tuple[str, tuple]:
    """``BIND ( expr AS ?v )`` body (BIND already consumed) → the
    kg_query parsed-bind tuple.  Expressions are one function level
    over ?vars / quoted literals, same as :func:`ner_spark.plans.
    kg_query.parse_bind`."""
    from ner_spark.plans.kg_query import _make_bind_expr

    def term() -> tuple:
        t = cur.next()
        if t.startswith("?"):
            return ("var", t)
        if t.startswith('"'):
            return ("const", _unquote(t))
        if t.isdigit():
            return ("int", int(t))  # SUBSTR positions only
        raise ValueError(
            f"BIND argument {t!r} must be a ?variable, a quoted "
            "literal or an unsigned integer (nested function calls "
            "are not supported)")

    cur.eat("(")
    t = cur.peek()
    if t is not None and (t.startswith("?") or t.startswith('"')):
        expr = term()
    elif t is not None and t.upper() == "IF":
        # IF(condition, then, else): the condition is a full FILTER
        # boolean expression, parsed by the same grammar FILTER uses
        from ner_spark.plans.kg_query import _make_if_expr
        cur.next()
        cur.eat("(")
        cond = _parse_filter_or(cur)
        cur.eat(",")
        then = term()
        cur.eat(",")
        alt = term()
        cur.eat(")")
        expr = _make_if_expr(cond, then, alt)
    else:
        fn = cur.next()
        cur.eat("(")
        args = [term()]
        while cur.at(","):
            cur.next()
            args.append(term())
        cur.eat(")")
        expr = _make_bind_expr(fn, args)
    cur.eat("AS")
    var = cur.next()
    if not var.startswith("?"):
        raise ValueError(f"BIND target must be a ?variable, got {var!r}")
    cur.eat(")")
    return var, expr


def _parse_values(cur: _Cursor) -> tuple[list[str], list[tuple]]:
    """VALUES ?v { d... }  or  VALUES (?v1 ?v2) { (d d)... }"""
    if cur.at("("):
        cur.next()
        vars_ = []
        while not cur.at(")"):
            vars_.append(cur.next())
        cur.next()
        cur.eat("{")
        rows = []
        while not cur.at("}"):
            cur.eat("(")
            row = []
            while not cur.at(")"):
                t = cur.next()
                row.append(None if t.upper() == "UNDEF" else _term(t))
            cur.next()
            rows.append(tuple(row))
        cur.next()
        return vars_, rows
    var = cur.next()
    cur.eat("{")
    rows = []
    while not cur.at("}"):
        t = cur.next()
        rows.append((None if t.upper() == "UNDEF" else _term(t),))
    cur.next()
    return [var], rows


def _parse_group_body(cur: _Cursor) -> dict:
    """The body of a ``{ ... }`` group → match_pattern kwargs (or a
    ``{"union": [...]}`` wrapper when the group is an alternation)."""
    if cur.at("{") and (cur.toks[cur.i + 1].upper() != "SELECT"
                        if cur.i + 1 < len(cur.toks) else True):
        # alternation: { {g1} UNION {g2} ... } — a brace followed by
        # SELECT is a subquery instead, handled by the kwargs loop
        groups = []
        for g in [_parse_group(cur)]:
            groups.extend(g["union"] if set(g) == {"union"} else [g])
        while cur.at("UNION"):
            cur.next()
            g = _parse_group(cur)
            # nested unions flatten (SPARQL alternation associates)
            groups.extend(g["union"] if set(g) == {"union"} else [g])
        if len(groups) < 2:
            raise ValueError(
                "a nested group must be part of a UNION alternation")
        if not cur.at("}"):
            raise ValueError(
                "cannot join a UNION with further patterns in the same "
                "group; wrap the query so the UNION is the whole group")
        return {"union": groups}
    kwargs: dict = {"pattern": [], "optional": [], "filters": [],
                    "negation": [], "existence": [], "minus": [],
                    "binds": []}
    while not cur.at("}"):
        kw = cur.peek_kw()
        if cur.at("{"):
            # a braced element inside a triple-bearing group must be
            # a subquery ({ SELECT ... } — SPARQL 1.1 sub-SELECT);
            # UNION alternations are whole-group only (checked above)
            nxt = cur.toks[cur.i + 1] if cur.i + 1 < len(cur.toks) \
                else ""
            if nxt.upper() != "SELECT":
                raise ValueError(
                    "a nested group inside a triple-bearing group "
                    "must be a subquery ({ SELECT ... }); UNION "
                    "alternations must be the whole group")
            cur.next()  # {
            cur.next()  # SELECT
            kwargs.setdefault("subqueries", []).append(
                _parse_select(cur, nested=True))
            cur.eat("}")
        elif kw == "BIND":
            cur.next()
            kwargs["binds"].append(_parse_bind(cur))
        elif kw == "OPTIONAL":
            cur.next()
            cur.eat("{")
            tris = _parse_triples(cur)
            ofilts: list = []
            obinds: list = []
            while cur.peek_kw() in ("FILTER", "BIND"):
                fk = cur.next().upper()
                if fk == "BIND":
                    obinds.append(_parse_bind(cur))
                    continue
                if cur.peek_kw() in ("NOT", "EXISTS"):
                    raise ValueError(
                        "FILTER [NOT] EXISTS inside OPTIONAL is not "
                        "supported — only boolean FILTER expressions")
                ofilts.append(_parse_filter_expr(cur))
            cur.eat("}")
            if not tris:
                raise ValueError("OPTIONAL group has no triples")
            if len(tris) == 1 and not ofilts and not obinds:
                # single bare triple: the per-element fast form
                kwargs["optional"].extend(tris)
            else:
                # SPARQL group semantics: triples + local FILTER/BIND
                # evaluate as a unit before the left join
                g: dict = {"pattern": tris}
                if ofilts:
                    g["filters"] = ofilts
                if obinds:
                    g["binds"] = obinds
                kwargs["optional"].append(g)
        elif kw == "GRAPH":
            # GRAPH term { triples } — each contained triple becomes
            # a QUAD element (term, s, p, o); a variable term binds
            # the graph name (and constrains every triple in the
            # block to the SAME graph), a constant prunes to it.
            # Needs a quads relation (a 'graph' column) at run time.
            cur.next()
            gterm = _term(cur.next())
            cur.eat("{")
            tris = _parse_triples(cur)
            # FILTERs inside the block hoist to group scope — for a
            # conjunctive block (triples + filters, which is all this
            # grammar allows inside GRAPH) the inner-scope evaluation
            # equals the hoisted one, because every block solution
            # inner-joins into the group's
            while cur.peek_kw() == "FILTER":
                cur.next()
                if cur.peek_kw() in ("NOT", "EXISTS"):
                    raise ValueError(
                        "FILTER [NOT] EXISTS inside GRAPH is not "
                        "supported — put it at group scope")
                kwargs["filters"].append(_parse_filter_expr(cur))
            cur.eat("}")
            if not tris:
                raise ValueError("GRAPH block has no triples")
            kwargs["pattern"].extend(
                (gterm,) + tuple(t) for t in tris)
            if cur.at("."):  # optional separator after the block
                cur.next()
        elif kw == "MINUS":
            cur.next()
            cur.eat("{")
            kwargs["minus"].append(_parse_triples(cur))
            cur.eat("}")
        elif kw == "FILTER":
            cur.next()
            if cur.at("NOT"):
                cur.next()
                cur.eat("EXISTS")
                cur.eat("{")
                kwargs["negation"].append(_parse_triples(cur))
                cur.eat("}")
            elif cur.at("EXISTS"):
                cur.next()
                cur.eat("{")
                kwargs["existence"].append(_parse_triples(cur))
                cur.eat("}")
            else:
                kwargs["filters"].append(_parse_filter_expr(cur))
        elif kw == "VALUES":
            cur.next()
            if "values" in kwargs:
                raise ValueError("one VALUES block per group")
            kwargs["values"] = _parse_values(cur)
        elif kw == "UNION":
            raise ValueError(
                "UNION branches must each be braced: "
                "{ { ... } UNION { ... } }")
        else:
            kwargs["pattern"].extend(_parse_triples(cur))
    if not kwargs["pattern"]:
        raise ValueError(
            "a group needs at least one triple pattern (a pattern-less "
            "VALUES/OPTIONAL/FILTER group is not supported)")
    return {k: v for k, v in kwargs.items() if v}


def _parse_group(cur: _Cursor) -> dict:
    cur.eat("{")
    body = _parse_group_body(cur)
    cur.eat("}")
    return body


def _parse_projection(cur: _Cursor) -> tuple[list[str], list[str]]:
    """SELECT list → (select terms, aggregate specs)."""
    select: list[str] = []
    aggregates: list[str] = []
    while True:
        t = cur.peek()
        if t is None:
            raise ValueError("SELECT list ends without a WHERE group")
        if t == "*":
            cur.next()
            if select or aggregates:
                raise ValueError("SELECT * cannot mix with projections")
            return None, []
        if t.startswith("?"):
            select.append(cur.next())
            continue
        if t == "(":
            cur.next()
            fn = cur.next().upper()
            if fn not in _AGG_FNS:
                raise ValueError(f"unknown aggregate {fn!r}")
            cur.eat("(")
            distinct = False
            if cur.at("DISTINCT"):
                cur.next()
                distinct = True
            term = cur.next()  # ?var or *
            sep = None
            if cur.at(";"):
                # GROUP_CONCAT(?v; SEPARATOR="..") — the only
                # parameterized aggregate in SPARQL 1.1
                cur.next()
                cur.eat("SEPARATOR")
                cur.eat("=")
                lit = cur.next()
                if not lit.startswith('"'):
                    raise ValueError(
                        "SEPARATOR needs a quoted literal")
                if fn != "GROUP_CONCAT":
                    raise ValueError(
                        f"SEPARATOR only applies to GROUP_CONCAT, "
                        f"not {fn}")
                sep = _unquote(lit)
            cur.eat(")")
            cur.eat("AS")
            alias = cur.next()
            if not alias.startswith("?"):
                raise ValueError(
                    f"aggregate alias must be a ?variable, got {alias!r}")
            cur.eat(")")
            if distinct and fn == "COUNT":
                name = "count_distinct"
            elif distinct and fn == "SUM":
                name = "sum_distinct"
            elif distinct:
                raise ValueError(f"DISTINCT inside {fn} is not supported")
            else:
                name = fn.lower()
            if sep is not None:
                # pre-parsed 4-tuple (escaping a separator back into
                # the string grammar would just re-parse it)
                aggregates.append((name, term, alias[1:], sep))
            else:
                aggregates.append(f"{name}({term}) AS {alias[1:]}")
            select.append(alias[1:])
            continue
        break
    if not select and not aggregates:
        raise ValueError("empty SELECT list (use SELECT * for all)")
    return select, aggregates


def _parse_dataset(cur: _Cursor) -> dict | None:
    """Zero or more ``FROM <g>`` / ``FROM NAMED <g>`` dataset clauses
    (between the projection and WHERE) → ``{"default": [...],
    "named": [...]}`` with absent keys unrestricted, or None when no
    clause was given.  Per SPARQL: FROM graphs merge into the default
    graph plain triples match; FROM NAMED restricts which graphs
    GRAPH blocks may match.  Giving only FROM leaves GRAPH
    unrestricted here (this engine has no outer dataset to empty out),
    and vice versa — the restriction applied is exactly what was
    written."""
    default: list[str] = []
    named: list[str] = []
    while cur.at("FROM"):
        cur.next()
        if cur.at("NAMED"):
            cur.next()
            named.append(_term(cur.next()))
        else:
            default.append(_term(cur.next()))
    if not default and not named:
        return None
    out: dict = {}
    if default:
        out["default"] = default
    if named:
        out["named"] = named
    return out


def _parse_select(cur: _Cursor, nested: bool = False) -> dict:
    """The body of a SELECT query (the ``SELECT`` token already
    consumed): projection, WHERE group, trailing modifiers — used by
    the top-level form and by ``{ SELECT ... }`` subqueries, which
    stop at the enclosing brace instead of end-of-input."""
    distinct = False
    if cur.at("DISTINCT"):
        cur.next()
        distinct = True
    elif cur.at("REDUCED"):
        # SPARQL permits (but does not require) REDUCED to eliminate
        # duplicates; a deterministic engine pins it to DISTINCT —
        # "maybe deduplicated" output cannot hash-match any oracle
        cur.next()
        distinct = True
    select, aggregates = _parse_projection(cur)
    dataset = None if nested else _parse_dataset(cur)
    if cur.at("WHERE"):
        cur.next()
    kwargs = _parse_group(cur)
    if dataset is not None:
        kwargs["dataset"] = dataset
    kwargs.update(_parse_modifiers(cur, nested=nested))
    if aggregates:
        kwargs["aggregates"] = aggregates
    if select:
        kwargs["select"] = select
    if distinct:
        kwargs["distinct"] = True
    return kwargs


def _parse_modifiers(cur: _Cursor, nested: bool = False) -> dict:
    """Trailing GROUP BY / ORDER BY / LIMIT.  ``nested`` (subquery)
    modifiers end at the enclosing ``}`` instead of end-of-input."""
    out: dict = {}
    if cur.at("GROUP"):
        cur.next()
        cur.eat("BY")
        keys = []
        while (t := cur.peek()) is not None and t.startswith("?"):
            keys.append(cur.next())
        if not keys:
            raise ValueError("GROUP BY needs at least one ?variable")
        out["group_by"] = keys
    while cur.at("HAVING"):
        cur.next()
        cur.eat("(")
        alias = cur.next()
        op = cur.next()
        if op not in _CMP_OPS:
            raise ValueError(f"unsupported HAVING operator {op!r}")
        n = cur.next()
        if n.isdigit():
            val = int(n)
        elif re.fullmatch(r"\d+\.\d+", n):
            val = float(n)  # e.g. HAVING(?avg >= 1.5)
        else:
            raise ValueError(
                "HAVING compares a numeric-aggregate alias to a "
                f"number, got {n!r}")
        cur.eat(")")
        out.setdefault("having", []).append(
            (alias.lstrip("?"), op, val))
    if cur.at("ORDER"):
        cur.next()
        cur.eat("BY")
        terms = []
        while (t := cur.peek()) is not None:
            if t.upper() in ("ASC", "DESC"):
                asc = cur.next().upper() == "ASC"
                cur.eat("(")
                name = cur.next()
                cur.eat(")")
                terms.append((name.lstrip("?"), asc))
            elif t.startswith("?"):
                terms.append((cur.next().lstrip("?"), True))
            else:
                break
        if not terms:
            raise ValueError("ORDER BY needs at least one term")
        out["order_by"] = terms
    while cur.at("LIMIT") or cur.at("OFFSET"):
        kw = cur.next().upper()
        key = kw.lower()
        if key in out:
            raise ValueError(f"duplicate {kw} clause")
        n = cur.next()
        if not n.isdigit():
            raise ValueError(f"{kw} needs an integer, got {n!r}")
        out[key] = int(n)
    if nested:
        if not cur.at("}"):
            raise ValueError(
                f"unexpected token {cur.peek()!r} in subquery "
                "modifiers (expected the closing brace)")
    elif not cur.done():
        raise ValueError(f"unexpected trailing token {cur.peek()!r}")
    return out


def parse_sparql(text: str) -> dict:
    """Parse a query string into ``{"form": "select"|"ask"|
    "construct", ...kwargs}`` — the kwargs being exactly what
    :func:`~ner_spark.plans.kg_query.solutions` (plus ``template``
    for CONSTRUCT) accepts, so callers (and the DuckDB oracle
    generator) share one parse."""
    cur = _Cursor(tokenize(text))
    form = cur.next().upper()
    if form == "SELECT":
        kwargs = _parse_select(cur)
        kwargs["form"] = "select"
        return kwargs
    if form == "ASK":
        dataset = _parse_dataset(cur)
        if cur.at("WHERE"):
            cur.next()
        kwargs = _parse_group(cur)
        if dataset is not None:
            kwargs["dataset"] = dataset
        if not cur.done():
            raise ValueError(f"unexpected trailing token {cur.peek()!r}")
        kwargs["form"] = "ask"
        return kwargs
    if form == "CONSTRUCT":
        if cur.at("WHERE"):
            # CONSTRUCT WHERE { ... } shorthand: the pattern doubles
            # as the template, so it must be template-legal — plain
            # triples only (the spec restricts the shorthand to a
            # bare BGP: no FILTER/OPTIONAL, and paths are illegal in
            # templates; _parse_triples stops at anything else and
            # the closing-brace eat raises)
            from ner_spark.plans.kg_update import _check_template

            cur.next()
            cur.eat("{")
            pattern = _parse_triples(cur)
            cur.eat("}")
            if not cur.done():
                raise ValueError(
                    f"unexpected trailing token {cur.peek()!r}")
            if not pattern:
                raise ValueError("empty CONSTRUCT WHERE pattern")
            _check_template(pattern, "CONSTRUCT WHERE")
            return {"form": "construct", "pattern": pattern,
                    "template": list(pattern)}
        cur.eat("{")
        template = _parse_triples(cur)
        cur.eat("}")
        dataset = _parse_dataset(cur)
        cur.eat("WHERE")
        kwargs = _parse_group(cur)
        if dataset is not None:
            kwargs["dataset"] = dataset
        if not cur.done():
            raise ValueError(f"unexpected trailing token {cur.peek()!r}")
        if "union" in kwargs or "values" in kwargs:
            raise ValueError(
                "CONSTRUCT supports a single BGP group (no UNION/VALUES)")
        kwargs["template"] = template
        kwargs["form"] = "construct"
        return kwargs
    if form == "DESCRIBE":
        terms = []
        while (t := cur.peek()) is not None and not cur.at("WHERE") \
                and t != "{":
            terms.append(_term(cur.next()))
        if not terms:
            raise ValueError("DESCRIBE needs at least one term")
        kwargs = {}
        if not cur.done():
            if cur.at("WHERE"):
                cur.next()
            kwargs = _parse_group(cur)
            if not cur.done():
                raise ValueError(
                    f"unexpected trailing token {cur.peek()!r}")
            if "union" in kwargs:
                raise ValueError(
                    "DESCRIBE supports a single BGP group (no UNION)")
        kwargs["terms"] = terms
        kwargs["form"] = "describe"
        return kwargs
    raise ValueError(
        "query must start with SELECT, ASK, CONSTRUCT or DESCRIBE, "
        f"got {form!r}")


def sparql(triples: DataFrame, text: str,
           plan: str | None = "static") -> DataFrame:
    """Run a SPARQL query string over a triple table.

    SELECT compiles to :func:`~ner_spark.plans.kg_query.solutions`,
    CONSTRUCT to :func:`~ner_spark.plans.kg_query.construct`, and ASK
    to a one-row boolean (``ask``) computed as ``LIMIT 1`` over the
    bindings — the existence probe stops at the first match per
    partition, never materializing the full solution set.

    ``plan`` is the BGP join-order mode (see
    :func:`~ner_spark.plans.kg_query.match_pattern`): ``"static"``
    selectivity-first by default, ``"stats"`` spends one costing
    scan, ``None`` keeps the written order.
    """
    from ner_spark.plans.kg_query import construct, describe, \
        match_pattern, solutions

    kwargs = parse_sparql(text)
    form = kwargs.pop("form")
    if form == "select":
        return solutions(triples, plan=plan, **kwargs)
    if form == "describe":
        return describe(triples, kwargs.pop("terms"), **kwargs)
    if form == "ask":
        bound = (match_pattern(triples, plan=plan, **kwargs)
                 if "union" not in kwargs else
                 solutions(triples, union=kwargs["union"],
                           filters=kwargs.get("filters", ()),
                           dataset=kwargs.get("dataset")))
        return (bound.limit(1)
                .agg((F.count(F.lit(1)) > 0).alias("ask")))
    template = kwargs.pop("template")
    return construct(triples, kwargs.pop("pattern"), template, **kwargs)

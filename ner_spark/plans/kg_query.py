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

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FIELDS = ("subj", "pred", "obj")

# FILTER grammar (SPARQL's workhorse subset):
#   comparison:  ?x != ?y      ?e < ?x       ?kb = "kb:Q42"
#   functions:   regex(?kb, "[02468]$")   strstarts(?e, "ent:")
#                strends(?e, "_io")       contains(?x, "kardec")
# String comparison is binary/codepoint order in BOTH engines this
# repo targets (Spark UTF8Binary, DuckDB default collation), so </>=
# on the ASCII node ids are engine-portable.
_CMP_RE = re.compile(
    r'^(\?\w+)\s*(!=|<=|>=|=|<|>)\s*(\?\w+|"(?:[^"\\]|\\.)*"|[^\s"]+)$'
)
_FN_RE = re.compile(
    r'^(regex|strstarts|strends|contains)\s*\(\s*(\?\w+)\s*,\s*'
    r'"((?:[^"\\]|\\.)*)"\s*\)$'
)


def _unescape(lit: str) -> str:
    return lit.replace('\\"', '"').replace("\\\\", "\\")


def parse_filter(text: str) -> tuple:
    """Parse one FILTER expression into the normalized tuple form
    :func:`match_pattern` consumes:

        ("cmp", "?a", op, ("var", "?b") | ("const", value))
        ("regex" | "strstarts" | "strends" | "contains", "?a", value)
        ("bound", "?a")
        ("in" | "notin", "?a", [value, ...])
        ("and" | "or", [sub, ...])        ("not", sub)

    The atomic comparison / string-function forms parse directly; the
    boolean-expression forms (``?a = ?b || !BOUND(?k)``,
    ``?p IN ("DECLARES", "LINKED_TO")``) parse through the SPARQL text
    tokenizer with the same precedence (``!`` > ``&&`` > ``||``) as
    the text front-end, so the CLI ``--match-filter`` grammar and
    ``FILTER(...)`` in a query string are one grammar.  Raises
    ``ValueError`` on anything outside it — a filter that silently
    parsed to TRUE would un-filter the query.
    """
    text = text.strip()
    m = _FN_RE.match(text)
    if m:
        return (m.group(1), m.group(2), _unescape(m.group(3)))
    m = _CMP_RE.match(text)
    if m:
        var, op, rhs = m.groups()
        if rhs.startswith("?"):
            return ("cmp", var, op, ("var", rhs))
        if rhs.startswith('"'):
            return ("cmp", var, op, ("const", _unescape(rhs[1:-1])))
        return ("cmp", var, op, ("const", rhs))
    from ner_spark.plans.sparql import _Cursor, _parse_filter_or, tokenize

    try:
        cur = _Cursor(tokenize(text))
        out = _parse_filter_or(cur)
        if not cur.done():
            raise ValueError(f"trailing tokens at {cur.peek()!r}")
    except ValueError as e:
        raise ValueError(
            f"unparseable FILTER {text!r}: expected '?var OP term' with "
            "OP in (= != < <= > >=), regex/strstarts/strends/contains"
            '(?var, "literal"), BOUND(?var), ?var [NOT] IN (...), or a '
            f"boolean combination with && || ! — {e}"
        ) from None
    return out


def _filter_column(filt: tuple, bound: set[str]) -> Column:
    """Compile one parsed filter to a Catalyst boolean Column over the
    output variable columns.  Unbound variables raise — SPARQL would
    evaluate them to an error (eliminating every row), which is never
    what the caller meant.

    Boolean connectives get SPARQL's three-valued error algebra for
    free from SQL null logic (both engines): a null operand (an
    unmatched OPTIONAL variable) makes an atom null ("error"),
    ``TRUE || error = TRUE``, ``FALSE && error = FALSE``, ``!error =
    error``, and a null top-level result eliminates the row.  BOUND
    never errors — ``!BOUND(?k) || strstarts(?k, "kb:")`` is the
    negation-as-failure idiom OPTIONAL enables."""
    kind = filt[0]
    if kind in ("and", "or"):
        col = None
        for sub in filt[1]:
            c = _filter_column(sub, bound)
            col = c if col is None else (
                (col & c) if kind == "and" else (col | c))
        if col is None:
            raise ValueError(f"empty {kind!r} filter")
        return col
    if kind == "not":
        return ~_filter_column(filt[1], bound)
    var = filt[1]
    if var not in bound:
        raise ValueError(f"FILTER references unbound variable {var}")
    col = F.col(var[1:])
    if kind == "bound":
        return col.isNotNull()
    if kind in ("in", "notin"):
        vals = list(filt[2])
        if not vals:
            raise ValueError("IN needs at least one term")
        # NULL IN (...) is null in both engines → row eliminated,
        # SPARQL's unbound-operand error; same for NOT IN
        return col.isin(vals) if kind == "in" else ~col.isin(vals)
    if kind == "cmp":
        _, _, op, (rkind, rval) = filt
        if rkind == "var":
            if rval not in bound:
                raise ValueError(
                    f"FILTER references unbound variable {rval}")
            rhs: Column = F.col(rval[1:])
        else:
            rhs = F.lit(rval)
        return {
            "=": col == rhs, "!=": col != rhs,
            "<": col < rhs, "<=": col <= rhs,
            ">": col > rhs, ">=": col >= rhs,
        }[op]
    if kind == "regex":
        return col.rlike(filt[2])
    if kind == "strstarts":
        return col.startswith(filt[2])
    if kind == "strends":
        return col.endswith(filt[2])
    if kind == "contains":
        return col.contains(filt[2])
    raise ValueError(f"unknown filter kind {kind!r}")


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


def parse_values(text: str) -> tuple[list[str], list[tuple]]:
    """Parse the CLI VALUES syntax — variables, ``=``, then
    ``|``-separated rows of whitespace-separated terms, with the
    keyword ``UNDEF`` for an unbound term:

        "?p ?kb = DECLARES UNDEF | LINKED_TO kb:Q1"

    Terms must not contain whitespace, ``|`` or ``=``; use the Python
    API for literal values that do.
    """
    head, sep, tail = text.partition("=")
    if not sep:
        raise ValueError(
            f"VALUES {text!r} has no '=' separating variables from rows")
    vars_ = head.split()
    rows: list[tuple] = []
    for part in tail.split("|"):
        terms = part.split()
        if not terms:
            continue
        rows.append(tuple(None if t == "UNDEF" else t for t in terms))
    if not rows:
        raise ValueError(f"VALUES {text!r} has no data rows")
    return vars_, rows


def _is_var(term: str) -> bool:
    return term.startswith("?")


# BIND expression grammar (SPARQL 1.1's string builders, restricted
# to the engine's string-typed terms; one function level — nested
# calls raise rather than mis-parse):
#   ?var                      "literal"
#   CONCAT(t1, t2, ...)       UCASE(?v)   LCASE(?v)
#   STR(?v)                   STRLEN(?v)   [length, cast to string]
#   COALESCE(t1, t2, ...)     [first bound argument — the OPTIONAL
#                              default-value idiom]
#   SUBSTR(t, start, len)     [1-based positive ints, 3-arg form]
#   REPLACE(t, "pat", "rep")  [regex, ALL occurrences in both engines]
#   STRBEFORE(t, "sep")       [prefix before the FIRST occurrence,
#   STRAFTER(t, "sep")         "" when absent — SPARQL 17.4.3.x]
#   SHA256(t)   MD5(t)        [lowercase hex digest — stable keys]
#   IF(filter, t1, t2)        [condition is one FILTER expression;
#                              an error (null) condition takes the
#                              ELSE branch in BOTH engines, diverging
#                              from SPARQL's error-propagates rule]
_BIND_FNS = {"concat", "ucase", "lcase", "str", "strlen",
             "coalesce", "substr", "replace",
             "strbefore", "strafter", "sha256", "md5", "if"}
_BIND_RE = re.compile(
    r"^\s*(?:(?P<fn>[A-Za-z_][A-Za-z0-9_]*)\s*\((?P<args>.*)\)|(?P<term>\?\w+|"
    r'"(?:[^"\\]|\\.)*"))\s+AS\s+(?P<var>\?\w+)\s*$',
    re.IGNORECASE | re.DOTALL,
)
_BIND_TERM_RE = re.compile(r'^(\?\w+|"(?:[^"\\]|\\.)*"|\d+)$')


def _bind_term(tok: str) -> tuple:
    tok = tok.strip()
    if not _BIND_TERM_RE.match(tok):
        raise ValueError(
            f"BIND argument {tok!r} must be a ?variable, a quoted "
            "literal or an unsigned integer (nested function calls "
            "are not supported)")
    if tok.startswith("?"):
        return ("var", tok)
    if tok.isdigit():
        # bare integers exist only for SUBSTR positions; every other
        # function rejects them in _make_bind_expr
        return ("int", int(tok))
    return ("const", _unescape(tok[1:-1]))


def _split_args(text: str) -> list[str]:
    """Split a function argument list on top-level commas — outside
    quotes and outside nested parentheses (``IF``'s condition may be
    a function call like ``contains(?a, "x")``)."""
    out, cur, inq, esc, depth = [], [], False, False, 0
    for ch in text:
        if esc:
            cur.append(ch)
            esc = False
            continue
        if ch == "\\" and inq:
            cur.append(ch)
            esc = True
            continue
        if ch == '"':
            inq = not inq
        elif not inq and ch == "(":
            depth += 1
        elif not inq and ch == ")":
            depth -= 1
            if depth < 0:
                raise ValueError(
                    f"unbalanced ')' in arguments {text!r}")
        if ch == "," and not inq and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if inq:
        raise ValueError(f"unterminated string in arguments {text!r}")
    if depth:
        raise ValueError(f"unbalanced '(' in arguments {text!r}")
    out.append("".join(cur))
    return out


def parse_bind(text: str) -> tuple[str, tuple]:
    """Parse one BIND expression — ``expr AS ?var`` — into the
    normalized ``(?var, expr_tuple)`` form :func:`match_pattern`
    consumes, where expr_tuple is ``("var", "?x")``, ``("const", s)``,
    ``("concat", [term, ...])`` or ``("ucase"|"lcase"|"str"|"strlen",
    term)``.  Raises on anything outside the grammar — a BIND that
    silently parsed wrong would bind garbage."""
    m = _BIND_RE.match(text)
    if not m:
        raise ValueError(
            f"unparseable BIND {text!r}: expected 'expr AS ?var' with "
            "expr a ?variable, a quoted literal, or one of "
            "CONCAT/UCASE/LCASE/STR/STRLEN(...)")
    var = m.group("var")
    if m.group("term"):
        return var, _bind_term(m.group("term"))
    raw = _split_args(m.group("args"))
    if m.group("fn").lower() == "if":
        if len(raw) != 3:
            raise ValueError(
                "IF takes (condition, then, else) — a FILTER "
                "expression and two terms")
        return var, _make_if_expr(parse_filter(raw[0]),
                                  _bind_term(raw[1]),
                                  _bind_term(raw[2]))
    args = [_bind_term(a) for a in raw]
    return var, _make_bind_expr(m.group("fn"), args)


def _make_if_expr(cond: tuple, then: tuple, alt: tuple) -> tuple:
    """Validate an ``IF(condition, then, else)`` form (shared by
    :func:`parse_bind` and the SPARQL text parser): the condition is
    a parsed FILTER tuple, the branches are ?variables or quoted
    literals."""
    for t in (then, alt):
        if t[0] == "int":
            raise ValueError(
                "IF branches must be ?variables or quoted literals "
                "(bare integers exist only for SUBSTR positions)")
    return ("if", cond, then, alt)


def _make_bind_expr(fn: str, args: list[tuple]) -> tuple:
    """Arity-check a BIND function call and return its normalized
    expression tuple (shared by :func:`parse_bind` and the SPARQL
    text parser)."""
    fn = fn.lower()
    if fn not in _BIND_FNS:
        raise ValueError(
            f"unknown BIND function {fn.upper()!r}: supported are "
            "CONCAT, UCASE, LCASE, STR, STRLEN, COALESCE, SUBSTR, "
            "REPLACE, STRBEFORE, STRAFTER, SHA256, MD5, IF")
    if fn == "if":
        raise ValueError(
            "IF(condition, then, else) takes a FILTER expression "
            "condition — parse it through parse_bind / the SPARQL "
            "text parser, not the plain-term argument path")
    ints = [a for a in args if a[0] == "int"]
    if fn == "substr":
        if (len(args) != 3 or args[0][0] == "int"
                or not all(a[0] == "int" for a in args[1:])):
            raise ValueError(
                "SUBSTR takes (term, start, length) with positive "
                "integer positions (the 3-argument SPARQL form)")
        if args[1][1] < 1 or args[2][1] < 0:
            raise ValueError(
                "SUBSTR positions are 1-based and non-negative "
                "(negative positions behave differently across "
                "engines, so they raise)")
        return ("substr", args[0], args[1][1], args[2][1])
    if ints:
        raise ValueError(
            f"{fn.upper()} takes ?variables or quoted literals "
            "(bare integers exist only for SUBSTR positions)")
    if fn == "replace":
        if len(args) != 3 or not all(a[0] == "const" for a in args[1:]):
            raise ValueError(
                'REPLACE takes (term, "pattern", "replacement") with '
                "quoted regex pattern and replacement literals")
        if set(args[2][1]) & {"$", "\\"}:
            raise ValueError(
                "REPLACE backreferences are not supported: the "
                "engines disagree on the syntax (Java $1 vs RE2 \\1), "
                "so a replacement containing '$' or '\\' raises")
        return ("replace", args[0], args[1][1], args[2][1])
    if fn in ("strbefore", "strafter"):
        if len(args) != 2 or args[1][0] != "const":
            raise ValueError(
                f'{fn.upper()} takes (term, "separator") with a '
                "quoted separator literal")
        if not args[1][1]:
            raise ValueError(
                f"{fn.upper()} separator must be non-empty (the "
                "empty-separator edge case differs across engines, "
                "so it raises)")
        return (fn, args[0], args[1][1])
    if fn in ("concat", "coalesce"):
        if len(args) < 2:
            raise ValueError(
                f"{fn.upper()} needs at least two arguments")
        return (fn, args)
    if len(args) != 1:
        raise ValueError(f"{fn.upper()} takes exactly one argument")
    return (fn, args[0])


def _bind_column(expr: tuple, bound: set[str]) -> Column:
    """Compile one parsed BIND expression to a Catalyst Column.
    Unbound variable references raise (like FILTER's rule); a null
    operand (unmatched OPTIONAL variable) propagates to a null
    binding — SPARQL's error-→-unbound rule, matched by the oracle's
    null-propagating ``||`` / scalar functions."""
    def term_col(t: tuple) -> Column:
        kind, val = t
        if kind == "const":
            return F.lit(val)
        if val not in bound:
            raise ValueError(f"BIND references unbound variable {val}")
        return F.col(val[1:])

    kind = expr[0]
    if kind in ("var", "const"):
        return term_col(expr)
    if kind == "concat":
        return F.concat(*[term_col(t) for t in expr[1]])
    if kind == "coalesce":
        # SPARQL COALESCE: the first non-error (non-null) argument —
        # exactly SQL coalesce; the OPTIONAL default-value idiom
        return F.coalesce(*[term_col(t) for t in expr[1]])
    if kind == "substr":
        # 1-based, positive positions only (validated at parse) —
        # identical in Spark substring and DuckDB substr; a null
        # input propagates (error-→-unbound)
        return F.substring(term_col(expr[1]), expr[2], expr[3])
    if kind == "replace":
        # regex replace of ALL occurrences (Spark regexp_replace is
        # global; the twin passes DuckDB the 'g' flag)
        return F.regexp_replace(term_col(expr[1]),
                                F.lit(expr[2]), F.lit(expr[3]))
    if kind in ("strbefore", "strafter"):
        # FIRST occurrence of the (non-empty, validated at parse)
        # separator; "" when absent, null input stays null (neither
        # when-branch matches a null instr) — engine-identical
        col, sep = term_col(expr[1]), expr[2]
        pos = F.instr(col, sep)
        hit = (F.substring(col, F.lit(1), pos - 1)
               if kind == "strbefore"
               else F.substring(col, pos + len(sep), F.length(col)))
        return F.when(pos > 0, hit).when(pos == 0, F.lit(""))
    if kind == "if":
        # the condition compiles through the FILTER algebra; a null
        # (error) condition takes the ELSE branch in Spark and the
        # DuckDB twin alike (CASE semantics) — documented divergence
        # from SPARQL's error-propagates rule, pinned by the twin
        return F.when(_filter_column(expr[1], bound),
                      term_col(expr[2])).otherwise(term_col(expr[3]))
    col = term_col(expr[1])
    if kind == "ucase":
        return F.upper(col)
    if kind == "lcase":
        return F.lower(col)
    if kind == "str":
        return col
    if kind == "strlen":
        # the engine's terms are strings, so the length binds as its
        # decimal string form (comparisons stay lexicographic, like
        # every other term; both engines count codepoints)
        return F.length(col).cast("string")
    if kind == "sha256":
        # lowercase hex in both engines — the stable-surrogate-key
        # idiom (entity ids from surface forms)
        return F.sha2(col, 256)
    if kind == "md5":
        return F.md5(col)
    raise ValueError(f"unknown BIND expression kind {kind!r}")


_ALT_ARM_BAD = set("?^|+*()/! \t")


def _pred_alternatives(pred: str) -> list[str]:
    """A constant predicate may be a SPARQL path alternation —
    ``P1|P2`` or the parenthesized ``(P1|P2)`` — one edge relation,
    ``pred IN (...)``.  Every arm must be a plain predicate name:
    per-arm closure, inversion or sequencing (``P+|Q``, ``P|^Q``,
    ``P/Q|R``) would need path union, which this engine does not
    implement, so it raises loudly instead of matching the marker
    characters as literal predicate text."""
    if pred.startswith("(") and pred.endswith(")"):
        pred = pred[1:-1]
    parts = pred.split("|")
    if not all(parts) or any(
            c in _ALT_ARM_BAD for p in parts for c in p):
        raise ValueError(
            f"malformed predicate alternation {pred!r}: arms must be "
            "plain predicate names (close over the whole alternation "
            "with (P1|P2)+ — per-arm closure/inversion like P+|Q is "
            "not supported)")
    return parts


def _negated_set(pred: str) -> list[str] | None:
    """A constant predicate starting with ``!`` is a SPARQL negated
    property set — ``!P`` / ``!(P1|P2)`` matches any edge whose
    predicate is NOT one of the named predicates (one pruned edge
    scan with ``pred NOT IN (...)``).  Returns the excluded predicate
    names, or None when the term is not a negated set.

    Restrictions, each raising loudly instead of mis-matching:
    inverse arms (``!^P`` / ``!(P|^Q)``) would partition the set into
    a forward and a reverse match (unimplemented); closure over a
    negated set (``!P+``) is path union over an open predicate
    alphabet; and an unparenthesized ``!P1|P2`` is SPARQL's
    ``(!P1)|P2`` (path union), so it must be written ``!(P1|P2)``.
    The INVERSE of a whole negated set needs no special case:
    ``^!P`` rewrites to ``!P`` with swapped endpoints upstream."""
    if _is_var(pred) or not pred.startswith("!"):
        return None
    body = pred[1:]
    if not body:
        raise ValueError("bare negation marker '!' is not a predicate")
    if "^" in body:
        raise ValueError(
            f"unsupported negated property set {pred!r}: inverse arms "
            "(!^P) split the set into forward and reverse matches, "
            "which this engine does not implement — negate forward "
            "predicates only (invert the whole set with ^!P instead)")
    if body[-1] in "+*?":
        raise ValueError(
            f"unsupported path {pred!r}: closure over a negated "
            "property set is not implemented (the frontier would be "
            "every predicate but the named ones — name the closed "
            "predicates positively with (P1|P2)+ instead)")
    if "/" in body:
        raise ValueError(
            f"unsupported path {pred!r}: '!' negates a property SET, "
            "not a sequence — negate per segment (!P1/!P2) if that "
            "is what the query means")
    if "|" in body and not (body.startswith("(") and body.endswith(")")):
        raise ValueError(
            f"ambiguous path {pred!r}: SPARQL reads !P1|P2 as "
            "(!P1)|P2 (path union, not supported); write !(P1|P2) "
            "to negate the whole set")
    return _pred_alternatives(body)


def _path_pred(term: str) -> tuple[str, str] | None:
    """A constant predicate ending in ``+``, ``*`` or ``?`` is a
    SPARQL property path: ``P+`` = one-or-more hops, ``P*`` =
    zero-or-more, ``P?`` = zero-or-one.  Returns (base predicate,
    modifier char) or None for plain terms.

    A closure over an alternation must be parenthesized —
    ``(P1|P2)+``.  Bare ``P1|P2+`` raises: SPARQL 1.1 precedence
    reads it as ``P1 | (P2+)`` (per-arm closure, which this engine
    does not implement), so silently closing over the whole
    alternation would mis-evaluate valid SPARQL.  A closure over a
    sequence (``(P1/P2)+``) raises too: the fixpoint of a composite
    step is path union, not a single-predicate frontier loop."""
    if _is_var(term) or len(term) < 2 or term[-1] not in "+*?":
        return None
    base = term[:-1]
    if "/" in base:
        raise ValueError(
            f"unsupported path {term!r}: closure over a sequence "
            "((P1/P2)+) is not implemented — close each step "
            "separately (P1+/P2+) if that is what the query means")
    if "|" in base and not (base.startswith("(") and base.endswith(")")):
        raise ValueError(
            f"ambiguous path {term!r}: SPARQL reads P1|P2+ as "
            "P1 | (P2+); write (P1|P2)+ to close over the whole "
            "alternation (per-arm closure is not supported)")
    return base, term[-1]


def _sequence_segments(pred: str) -> list[str] | None:
    """A constant predicate containing a top-level ``/`` is a SPARQL
    sequence path — ``P1/P2`` matches endpoints connected by a P1 edge
    into a P2 edge through an existential intermediate.  Returns the
    segment strings (each itself any supported single-step form:
    ``P``, ``^P``, ``P+``/``P*``/``P?``, ``(P1|P2)`` and their
    compositions, or a parenthesized nested sequence) or None when the
    predicate is not a sequence.

    ``/`` binds tighter than ``|`` in SPARQL 1.1 (PathAlternative :=
    PathSequence ('|' PathSequence)*), so a predicate with BOTH
    operators at top level (``A|B/C`` = A | (B/C)) is path union —
    unimplemented, raises loudly.  A fully-parenthesized sequence
    (``(P1/P2)``, e.g. from inverse rewriting ``^(P1/P2)``) unwraps.
    """
    if _is_var(pred) or "/" not in pred:
        return None
    core = pred
    # unwrap one full-width paren layer: "(A/B)" → "A/B" (the wrap is
    # full-width only if the opening paren's match is the last char)
    if core.startswith("(") and core.endswith(")"):
        depth = 0
        for i, ch in enumerate(core):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if depth == 0:
                if i == len(core) - 1:
                    core = core[1:-1]
                break
    depth, parts, cur = 0, [], []
    top_alt = False
    for ch in core:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                raise ValueError(f"unbalanced parentheses in {pred!r}")
        if ch == "/" and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            if ch == "|" and depth == 0:
                top_alt = True
            cur.append(ch)
    if depth != 0:
        raise ValueError(f"unbalanced parentheses in {pred!r}")
    parts.append("".join(cur))
    if len(parts) == 1:
        return None  # '/' only inside parens — the closure guard in
        # _path_pred / the alternation arm check reject those forms
    if top_alt:
        raise ValueError(
            f"unsupported path {pred!r}: SPARQL reads A|B/C as "
            "A | (B/C) — alternation of sequences is path union, "
            "which this engine does not implement; parenthesize "
            "per-segment alternations like (A|B)/C instead")
    for p in parts:
        if not p:
            raise ValueError(f"empty segment in sequence path {pred!r}")
        if _is_var(p):
            raise ValueError(
                f"variable segment {p!r} in sequence path {pred!r}: "
                "SPARQL property paths are predicate expressions, "
                "not variables")
        if p.startswith("__seq"):
            raise ValueError(
                f"segment {p!r} uses the reserved __seq prefix")
    return parts


def _scrub_constraints(df: DataFrame) -> DataFrame:
    """Constraint scrub (canonicalize.py idiom), GATED: a checkpointed
    LogicalRDD keeps the ORIGIN plan's constraints (a committed
    table's partition filters, a provenance view's ``lit("base")``
    equality), and the closure loop's union + re-checkpoint trips
    Spark 4.1's ``Union.rewriteConstraints`` (AttributeMap miss) on
    any such retained constraint.  The crash therefore has an exact,
    cheap precondition — the checkpointed plan retains a non-empty
    constraint set — so the JVM→Python RDD round-trip that rebuilds a
    constraint-free plan is paid ONLY then; a plain triple-relation
    closure (retained constraints = ``Set()``, the common case) is
    returned untouched.  ``df`` must already be checkpointed (the
    probe reads its LogicalRDD; the rebuild re-checkpoints)."""
    try:
        clean = df._jdf.queryExecution().analyzed().constraints() \
            .isEmpty()
    except Exception:
        clean = False  # private API drifted: pay the safe path
    if clean:
        return df
    return df.sparkSession.createDataFrame(df.rdd, df.schema) \
        .localCheckpoint(eager=True)


def path_closure(
    triples: DataFrame,
    pred: str,
    zero: bool = False,
    max_hops: int | None = None,
    src: str | None = None,
    dst: str | None = None,
    group_col: str | None = None,
) -> DataFrame:
    """Distinct ``(subj, obj)`` pairs connected by 1..n hops of
    ``pred`` edges (SPARQL ``pred+``); with ``zero=True`` also every
    graph node paired with itself (``pred*`` — SPARQL's zero-length
    path matches each term in the graph).

    Semi-naive iteration: the frontier holds only pairs first reached
    at the current hop, so each round joins frontier × edges (never
    closure × edges), dedups against the accumulated closure with an
    anti-join, and ``localCheckpoint``s to truncate lineage — the same
    discipline as the canonicalize CC loop.  Rounds = the graph's
    longest shortest path, bounded by ``max_hops`` when given
    (semantic bound: paths of length ≤ max_hops) or by a loud
    64-round non-convergence guard when not.

    ``src``/``dst`` are seeding hints for constant endpoints: closure
    from one node is a plain BFS over its reachable set, not the full
    O(V·E) closure — the difference between a pointed query and a
    whole-graph materialization at 100 TB.  A ``dst`` seed walks the
    reversed edges and flips the output.  Results are identical to
    filtering the full closure (the oracle twin does exactly that).

    Output is a SET (one row per pair) — path elements have SPARQL's
    set semantics even where the underlying triple table carries
    duplicates, and the recursive-CTE oracle's UNION matches.
    """
    g = [group_col] if group_col else []
    edges = _scrub_constraints(
        triples.where(F.col("pred").isin(_pred_alternatives(pred)))
        .select(*g, "subj", "obj").distinct()
        .localCheckpoint(eager=True)
    )
    flip = False
    if src is None and dst is not None:
        # BFS backwards from the constant object, flip at the end
        edges = edges.select(*g, F.col("obj").alias("subj"),
                             F.col("subj").alias("obj"))
        src, dst, flip = dst, None, True
    if src is not None:
        # the seed filter's constraint (subj = src) survives into the
        # LogicalRDD on a column the closure unions over, so the scrub
        # always fires here — the seed frontier is one node's
        # out-edges, so the Python round-trip is tiny
        closure = _scrub_constraints(
            edges.where(F.col("subj") == src).localCheckpoint(eager=True))
    else:
        closure = edges
    frontier = closure
    rounds = max_hops if max_hops is not None else 64
    converged = False
    keys = g + ["subj", "obj"]
    step_on = ((F.col("f.obj") == F.col("e.subj"))
               if not group_col else
               (F.col("f.obj") == F.col("e.subj"))
               & (F.col(f"f.{group_col}") == F.col(f"e.{group_col}")))
    for _ in range(1, rounds):
        step = (
            frontier.alias("f")
            .join(edges.alias("e"), step_on)
            .select(*[F.col(f"f.{c}") for c in g],
                    F.col("f.subj").alias("subj"),
                    F.col("e.obj").alias("obj"))
            .distinct()
        )
        new = step.join(closure, keys, "left_anti") \
                  .localCheckpoint(eager=True)
        if group_col:
            # second scrub: the anti-join's derived constraint keeps a
            # stale group-column exprId (the same Spark 4.1 rewrite
            # bug), so the union below would crash at checkpoint; the
            # roundtrip touches only the frontier's new pairs
            new = _scrub_constraints(new)
        if new.isEmpty():
            converged = True
            break
        closure = closure.unionByName(new).localCheckpoint(eager=True)
        frontier = new
    if max_hops is None and not converged:
        # the 64-round guard cut the loop — probe one more round and
        # raise if the closure was still growing, instead of returning
        # a silent prefix of the fixpoint
        probe = (
            frontier.alias("f")
            .join(edges.alias("e"), step_on)
            .select(*[F.col(f"f.{c}") for c in g],
                    F.col("f.subj").alias("subj"),
                    F.col("e.obj").alias("obj"))
            .join(closure, keys, "left_anti")
        )
        if not probe.isEmpty():
            raise RuntimeError(
                f"path closure over pred={pred!r} did not converge in "
                "64 rounds; pass max_hops to bound the path length "
                "explicitly"
            )
    if zero:
        # explode, not a self-union under renames (the latter trips the
        # same Union constraint rewrite — see operators/dedup.py)
        z = (
            triples.select(*g, F.explode(F.array("subj", "obj"))
                           .alias("n"))
            .distinct()
            .select(*g, F.col("n").alias("subj"),
                    F.col("n").alias("obj"))
        )
        if src is not None:
            z = z.where(F.col("subj") == src)
        closure = closure.unionByName(z).distinct()
    if flip:
        closure = closure.select(*g, F.col("obj").alias("subj"),
                                 F.col("subj").alias("obj"))
    return closure


def _sequence_relation(
    triples: DataFrame,
    element: tuple[str, str, str],
    segs: list[str],
    path_max_hops: int | None = None,
) -> DataFrame:
    """Compile a sequence path element (``?a P1/P2 ?b``) to one
    ``(subj, obj)`` relation: each segment compiles through
    :func:`_element_relation` (so every single-step form — inverse,
    closure, alternation, nested parenthesized sequences — composes),
    chained by equi-joins on fresh ``__seq{i}`` intermediate columns
    that are projected away at the end.

    Semantics follow SPARQL 1.1's sequence translation (``?a P1 ?v .
    ?v P2 ?b`` with ``?v`` fresh and unprojected): the intermediates
    are existential and the result is a MULTISET — two distinct
    intermediates connecting the same endpoints yield two rows, unlike
    the closure forms' set semantics.  The DuckDB twin joins the same
    chain without DISTINCT.

    Scale shape: constants at the element's own endpoints are pushed
    into the first/last segment compile (so a closure segment with a
    constant endpoint still gets :func:`path_closure`'s seeded BFS,
    and plain segments get scan-level pushdown) and re-attached as
    literal columns, keeping the relation's uniform (subj, obj) shape
    for the generic endpoint handling in the caller.  The chain is
    equi-joins only — never a cartesian — and each segment is one
    pruned scan of the triple table (or one closure)."""
    subj, _, obj = element
    n = len(segs)
    rel: DataFrame | None = None
    for i, seg in enumerate(segs):
        lt_const = i == 0 and not _is_var(subj)
        rt_const = i == n - 1 and not _is_var(obj)
        lt = subj if lt_const else f"?__seq{i}"
        rt = obj if rt_const else f"?__seq{i + 1}"
        r, _ = _element_relation(triples, (lt, seg, rt), path_max_hops)
        if lt_const:
            r = r.withColumn(f"__seq{i}", F.lit(subj))
        if rt_const:
            r = r.withColumn(f"__seq{i + 1}", F.lit(obj))
        rel = r if rel is None else rel.join(r, f"__seq{i}")
    return rel.select(F.col("__seq0").alias("subj"),
                      F.col(f"__seq{n}").alias("obj"))


def _split_graph(element: tuple) -> tuple:
    """Normalize a pattern element to ``(graph_term_or_None,
    (s, p, o))`` — a 4-tuple is a QUAD element ``(g, s, p, o)``
    (SPARQL ``GRAPH g { s p o }``), a 3-tuple is a plain triple
    element."""
    if len(element) == 4:
        return element[0], tuple(element[1:])
    if len(element) == 3:
        return None, tuple(element)
    raise ValueError(
        f"pattern element {element!r} is neither a triple (s, p, o) "
        "nor a quad (graph, s, p, o)")


def _element_relation(
    triples: DataFrame,
    element: tuple,
    path_max_hops: int | None = None,
    dataset: dict | None = None,
) -> tuple[DataFrame, dict[str, str]]:
    """Compile one pattern element to (relation, {?var: field}) — the
    scan (or path closure) with constants and repeated-variable
    equalities applied, projected to the variable columns.

    Quad elements ``(g, s, p, o)`` match against a relation carrying a
    ``graph`` column: a CONSTANT graph prunes the scan to that graph
    up front (so a closure under it iterates within the graph — the
    SPARQL per-named-graph path semantics); a VARIABLE graph binds the
    column like any other field.  Plain triple elements over a
    graph-bearing relation match the UNION DEFAULT GRAPH — the RDF
    merge of every named graph, i.e. the DISTINCT (s, p, o)
    projection (the dedup is semantically required: the merge is a
    set, and a triple asserted in two graphs must not double
    bindings).

    ``dataset`` is the SPARQL dataset clause — ``{"default": [g...],
    "named": [g...]}`` (either key may be absent = unrestricted):
    plain elements see only the ``default`` graphs' merge (FROM),
    GRAPH elements only the ``named`` graphs (FROM NAMED) — a GRAPH
    constant outside the named set matches nothing, per spec."""
    gterm, element = _split_graph(element)
    has_graph = "graph" in triples.columns
    if dataset:
        if not has_graph:
            # mirror the quad-element check below: silently ignoring a
            # FROM / FROM NAMED clause would return UNRESTRICTED
            # results for a query that asked for a dataset slice
            raise ValueError(
                "FROM / FROM NAMED dataset clause needs a relation "
                "with a 'graph' column (quads — e.g. sparql(..., "
                f"provenance=True)); this relation has {triples.columns}")
        allowed = dataset.get("named" if gterm is not None
                              else "default")
        if allowed is not None:
            triples = triples.where(F.col("graph").isin(list(allowed)))
    if gterm is not None:
        if not has_graph:
            raise ValueError(
                f"quad element ({gterm}, {', '.join(element)}) needs a "
                "relation with a 'graph' column (quads); this relation "
                f"has {triples.columns}")
        if not _is_var(gterm):
            # constant graph: prune FIRST, then compile the inner
            # element (incl. paths/closures) inside that graph only —
            # the graph column is projected away so the one-graph
            # slice behaves exactly like a triple relation (unique per
            # (s, p, o) because quads are unique per (g, s, p, o))
            triples = triples.where(
                F.col("graph") == F.lit(gterm)).select(*_FIELDS)
            gterm = None
    elif has_graph:
        # plain element over quads: union default graph (RDF merge)
        triples = triples.select(*_FIELDS).distinct()
    if element[1].startswith("^"):
        # SPARQL inverse path: ^P is P with the endpoints swapped —
        # and inversion commutes with closure and alternation
        # (^(P+) = (^P)+, ^(P1|P2) = ^P1|^P2), so one swap covers
        # every composed form
        if element[1] == "^":
            raise ValueError(f"bare inverse marker in {element!r}")
        element = (element[2], element[1][1:], element[0])
    segs = _sequence_segments(element[1])
    # negated sets parse after sequences (so !A/B is a sequence whose
    # first segment is the set) and before closures (so !P+ raises the
    # negated-set closure error, not a silent literal-"!P" closure)
    negset = None if segs is not None else _negated_set(element[1])
    path = None if segs is not None or negset is not None \
        else _path_pred(element[1])
    if gterm is not None and segs is not None:
        raise ValueError(
            f"sequence path {element[1]!r} under a VARIABLE graph "
            f"{gterm} is unsupported — bind the graph to a constant "
            "(GRAPH <g> { ... }) or chain single-step elements")
    if gterm is not None and path is not None:
        # variable-graph closure: the fixpoint iterates PER GRAPH —
        # the graph column rides the frontier join key, so one
        # semi-naive loop closes every named graph at once
        base, mod = path
        rel = path_closure(
            triples, base, zero=mod in "*?",
            max_hops=1 if mod == "?" else path_max_hops,
            src=None if _is_var(element[0]) else element[0],
            dst=None if _is_var(element[2]) else element[2],
            group_col="graph",
        )
        fields = ("graph", "subj", "obj")
        terms = (gterm, element[0], element[2])
        segs = path = None
        gterm = None  # handled; skip the plain-quad branch below
    elif segs is not None:
        rel = _sequence_relation(triples, element, segs, path_max_hops)
        fields: tuple[str, ...] = ("subj", "obj")
        terms: tuple[str, ...] = (element[0], element[2])
    elif path is not None:
        base, mod = path
        rel = path_closure(
            triples, base, zero=mod in "*?",
            max_hops=1 if mod == "?" else path_max_hops,
            src=None if _is_var(element[0]) else element[0],
            dst=None if _is_var(element[2]) else element[2],
        )
        fields = ("subj", "obj")
        terms = (element[0], element[2])
    elif gterm is not None:
        rel = triples.select("graph", *_FIELDS)
        fields, terms = ("graph",) + _FIELDS, (gterm,) + element
    else:
        rel = triples.select(*_FIELDS)
        fields, terms = _FIELDS, element
    cols: dict[str, str] = {}  # ?var -> first field carrying it
    for field, term in zip(fields, terms):
        if _is_var(term):
            if term in cols:  # same var twice within one element
                rel = rel.where(F.col(field) == F.col(cols[term]))
            else:
                cols[term] = field
        elif field == "pred":
            # constant predicate: a negated set !P / !(P1|P2) becomes
            # NOT IN, an alternation P1|P2 becomes IN — both one
            # pruned edge scan, both pushed to the triple source
            rel = rel.where(
                ~F.col(field).isin(negset) if negset is not None
                else F.col(field).isin(_pred_alternatives(term)))
        else:
            rel = rel.where(F.col(field) == F.lit(term))
    rel = rel.select(*[F.col(f).alias(v[1:]) for v, f in cols.items()])
    return rel, cols


def _join_values(
    bound: DataFrame,
    bound_vars: set[str],
    var_order: list[str],
    required_vars: set[str],
    values: tuple,
) -> tuple[DataFrame, set[str], list[str]]:
    """SPARQL VALUES (inline data): join the pattern bindings with a
    literal table ``(["?v", ...], [(row, ...), ...])`` where ``None``
    is UNDEF.  SPARQL join compatibility: a shared variable matches
    when either side is unbound (UNDEF / an unmatched OPTIONAL null)
    or the values agree; the merged binding prefers the pattern's
    value.  Variables only the data block binds extend the solution.

    Scale shape: the data block is inline literals — always tiny, so
    it is explicitly broadcast.  Shared variables that can be null on
    neither side (required pattern vars, no UNDEF in the column) join
    as hash equi-keys; only genuinely nullable ones fall back to the
    compatibility OR-condition, and with no clean key at all the join
    is a broadcast nested-loop over the k-row literal table — O(k)
    compares per binding, never a shuffle of the bindings.
    """
    vars_, rows = values
    if not vars_:
        raise ValueError("VALUES needs at least one variable")
    seen: set[str] = set()
    for v in vars_:
        if not _is_var(v):
            raise ValueError(f"VALUES variable {v!r} is not a ?name")
        if v in seen:
            raise ValueError(f"VALUES binds {v} twice")
        seen.add(v)
    for i, row in enumerate(rows):
        if len(row) != len(vars_):
            raise ValueError(
                f"VALUES row {i} has {len(row)} terms for "
                f"{len(vars_)} variables")
        for t in row:
            if t is not None and not isinstance(t, str):
                raise ValueError(
                    f"VALUES row {i} term {t!r} is neither a string "
                    "nor UNDEF (None)")
    spark = bound.sparkSession
    data = spark.createDataFrame(
        [tuple(row) for row in rows],
        ", ".join(f"__v_{v[1:]} string" for v in vars_))
    shared = [v for v in vars_ if v in bound_vars]
    new = [v for v in vars_ if v not in bound_vars]
    undef_cols = {
        v for j, v in enumerate(vars_)
        if any(row[j] is None for row in rows)
    }
    eq_keys, residual = [], []
    for v in shared:
        c, vc = F.col(v[1:]), F.col(f"__v_{v[1:]}")
        if v in required_vars and v not in undef_cols:
            eq_keys.append((c, vc))
        else:
            residual.append(vc.isNull() | c.isNull() | (vc == c))
    cond = None
    for lhs, rhs in eq_keys:
        term = lhs == rhs
        cond = term if cond is None else cond & term
    for term in residual:
        cond = term if cond is None else cond & term
    joined = (bound.join(F.broadcast(data), cond)
              if cond is not None
              else bound.crossJoin(F.broadcast(data)))
    sel = [
        (F.coalesce(F.col(v), F.col(f"__v_{v}")).alias(v)
         if "?" + v in shared and "?" + v not in required_vars
         else F.col(v))
        for v in (v2[1:] for v2 in var_order)
    ] + [F.col(f"__v_{v[1:]}").alias(v[1:]) for v in new]
    bound = joined.select(*sel)
    bound_vars = bound_vars | set(new)
    var_order = var_order + new
    return bound, bound_vars, var_order


def _element_vars(element: tuple) -> set[str]:
    """The ``?variables`` one pattern element binds (inverse marker
    stripped — ``^P`` swaps endpoints but binds the same set; a quad
    element's graph term counts — a variable graph joins like any
    other variable)."""
    gterm, element = _split_graph(element)
    p = element[1]
    if p.startswith("^") and len(p) > 1:
        p = p[1:]
    out = {t for t in (element[0], p, element[2]) if _is_var(t)}
    if gterm is not None and _is_var(gterm):
        out.add(gterm)
    return out


def _element_static_cost(element: tuple) -> tuple:
    """Scan-free selectivity rank of one element, ascending = evaluate
    first.  The ordering encodes what the triple-store statistics say
    before any statistics exist: a constant endpoint bounds the scan
    by a node's degree (smallest), a constant predicate prunes to one
    predicate's edge partition (middle), a variable predicate or a
    negated set reads ~the whole edge table (large), and closure /
    sequence paths are eager materializations whose output exceeds
    their base-edge scan (largest — defer them until the bindings
    that seed them are small)."""
    gterm, element = _split_graph(element)
    s, p, o = element
    if p.startswith("^") and len(p) > 1:
        s, p, o = o, p[1:], s
    endpoint_consts = sum(1 for t in (s, o) if not _is_var(t))
    if gterm is not None and not _is_var(gterm):
        # a constant graph prunes like a constant endpoint (one
        # named graph's slice of the quad relation)
        endpoint_consts += 1
    if _is_var(p):
        closure, pred_class = 0, 2
    else:
        segs = _sequence_segments(p)
        neg = None if segs is not None else _negated_set(p)
        path = (None if segs is not None or neg is not None
                else _path_pred(p))
        closure = 1 if segs is not None or path is not None else 0
        pred_class = 2 if neg is not None else 0
    return (closure, -endpoint_consts, pred_class)


def _pred_mass_cond(p: str) -> tuple[Column | None, float]:
    """(predicate condition, work multiplier) for one constant
    predicate form — the condition selects the element's base edges
    in a single shared scan, the multiplier scales that edge mass for
    forms whose output the scan cannot see: ×4 per closure (``P+`` /
    ``P*`` expand beyond their base edges), ×2·segments per sequence
    (each hop joins through an existential intermediate)."""
    if p.startswith("^") and len(p) > 1:
        p = p[1:]
    segs = _sequence_segments(p)
    if segs is not None:
        conds, mult = [], 2.0 * len(segs)
        for seg in segs:
            c, m = _pred_mass_cond(seg)
            mult = max(mult, m * 2.0 * len(segs))
            if c is not None:
                conds.append(c)
        if not conds:
            return None, mult
        cond = conds[0]
        for c in conds[1:]:
            cond = cond | c
        return cond, mult
    neg = _negated_set(p)
    if neg is not None:
        return ~F.col("pred").isin(neg), 1.0
    path = _path_pred(p)
    if path is not None:
        base, mod = path
        c, m = _pred_mass_cond(base)
        return c, m * (1.0 if mod == "?" else 4.0)
    return F.col("pred").isin(_pred_alternatives(p)), 1.0


def pattern_stats_costs(
    triples: DataFrame, pattern: list[tuple[str, str, str]],
) -> list[float]:
    """Measured per-element costs for :func:`plan_pattern` — ONE
    conditional-aggregate scan of the triple relation computes every
    element's matched-edge count exactly (constants applied as
    ``sum(when(cond, 1))`` conditions, so k elements cost one pass,
    not k).  Closure and sequence elements report base-edge mass ×
    the :func:`_pred_mass_cond` multiplier: their true output size is
    the fixpoint the planner is trying not to seed too early, so an
    upper-leaning estimate keeps them late.  Use when the triple
    relation is cheap to scan (a committed table) and the pattern is
    long enough that one extra scan buys a better join tree; the
    static rank costs nothing and is the default."""
    aggs, mults = [], []
    has_graph = "graph" in triples.columns
    for i, element in enumerate(pattern):
        gterm, element = _split_graph(element)
        s, p, o = element
        if p.startswith("^") and len(p) > 1:
            s, p, o = o, p[1:], s
        cond = F.lit(True)
        mult = 1.0
        if gterm is not None and has_graph and not _is_var(gterm):
            cond = cond & (F.col("graph") == F.lit(gterm))
        if not _is_var(s):
            cond = cond & (F.col("subj") == F.lit(s))
        if not _is_var(o):
            cond = cond & (F.col("obj") == F.lit(o))
        if not _is_var(p):
            pc, mult = _pred_mass_cond(p)
            if pc is not None:
                cond = cond & pc
        aggs.append(F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0)))
                    .alias(f"c{i}"))
        mults.append(mult)
    row = triples.agg(*aggs).first()
    return [float(row[f"c{i}"] or 0) * mults[i]
            for i in range(len(pattern))]


def pattern_catalog_costs(
    pattern: list[tuple[str, str, str]],
    pred_stats: dict,
    total_edges: int,
) -> list[float]:
    """Scan-FREE measured costs for :func:`plan_pattern` from a
    per-predicate statistics catalog — the RDF-3X-style middle ground
    between the static rank (no data at all) and
    :func:`pattern_stats_costs` (one scan per query): a triple store
    persists ``{pred: (edge_count, distinct_subjects,
    distinct_objects)}`` once at write time (:meth:`KgJob.stats`) and
    every query plans from the dict.

    Estimates per element: a constant predicate costs its edge count;
    a constant endpoint divides by the predicate's distinct count on
    that side (the classical uniform-degree estimate — count/distinct
    = average degree); alternations sum their arms; negated sets cost
    ``total - named``; closures and sequences apply the same
    deferral multipliers as :func:`pattern_stats_costs` (×4 per
    closure, ×2·segments per sequence); a variable predicate costs
    the whole edge table.  An unlisted predicate costs 0 — an empty
    relation is the BEST possible seed.  Estimates only steer the
    join ORDER; results are order-invariant (the fuzz-pinned
    property), so stale statistics can cost speed, never correctness.
    """
    def mass(p: str) -> tuple[float, float, float, float]:
        # (edges, distinct_subj, distinct_obj, work multiplier)
        if p.startswith("^") and len(p) > 1:
            n, ns, no, m = mass(p[1:])
            return n, no, ns, m
        segs = _sequence_segments(p)
        if segs is not None:
            parts = [mass(seg) for seg in segs]
            n = max((pn * pm for pn, _, _, pm in parts), default=0.0)
            return (n, parts[0][1], parts[-1][2],
                    2.0 * len(segs))
        neg = _negated_set(p)
        if neg is not None:
            named = sum(pred_stats.get(a, (0, 0, 0))[0] for a in neg)
            n = max(float(total_edges) - named, 0.0)
            return n, n, n, 1.0
        path = _path_pred(p)
        if path is not None:
            base, mod = path
            n, ns, no, m = mass(base)
            return n, ns, no, m * (1.0 if mod == "?" else 4.0)
        arms = _pred_alternatives(p)
        n = sum(pred_stats.get(a, (0, 0, 0))[0] for a in arms)
        ns = max((pred_stats.get(a, (0, 1, 1))[1] for a in arms),
                 default=1)
        no = max((pred_stats.get(a, (0, 1, 1))[2] for a in arms),
                 default=1)
        return float(n), float(ns), float(no), 1.0

    costs: list[float] = []
    for element in pattern:
        # graph term carries no catalog statistics — a quad element
        # costs like its inner triple (a constant graph only shrinks
        # it, so the estimate stays upper-leaning)
        _g, element = _split_graph(element)
        s, p, o = element
        if p.startswith("^") and len(p) > 1:
            s, p, o = o, p[1:], s
        if _is_var(p):
            n, ns, no, mult = (float(total_edges), float(total_edges),
                               float(total_edges), 1.0)
        else:
            n, ns, no, mult = mass(p)
        cost = n
        if not _is_var(s):
            cost /= max(ns, 1.0)
        if not _is_var(o):
            cost /= max(no, 1.0)
        costs.append(cost * mult)
    return costs


def plan_pattern(
    pattern: list[tuple[str, str, str]],
    costs: list | None = None,
) -> list[int]:
    """Selectivity-ordered join plan for a BGP's required elements:
    the evaluation order (indices into ``pattern``) that starts from
    the cheapest element and greedily appends the cheapest element
    CONNECTED to the variables bound so far — smallest-relation-first
    with the connectivity constraint, the classic System-R greedy cut
    down to what triple stores need.

    Why here and not Catalyst: the committed triple relation carries
    no CBO statistics (and mid-pipeline relations never do), so Spark
    keeps whatever join order the query author wrote; a pattern
    written hub-scan-first materializes the hub's full edge fan-out
    before the selective constant ever prunes it — at 10^12 triples
    that is the difference between a pointed lookup and a whole-graph
    shuffle.  Reordering is sound because required BGP elements are
    inner equi-joins on never-null variable columns (fully
    commutative; the multiset result is order-invariant, which the
    plan-invariance fuzz pins).

    ``costs`` overrides the per-element cost (any ascending-comparable
    values, e.g. :func:`pattern_stats_costs`); default is the
    scan-free :func:`_element_static_cost` rank.  A pattern whose
    elements cannot all connect under ANY order raises the cartesian
    guard — same contract as evaluation, caught at plan time."""
    n = len(pattern)
    evars = [_element_vars(el) for el in pattern]
    if costs is None:
        costs = [_element_static_cost(el) for el in pattern]
    if len(costs) != n:
        raise ValueError(f"{len(costs)} costs for {n} pattern elements")
    if n <= 1:
        return list(range(n))
    remaining = set(range(n))
    seed = min(remaining, key=lambda i: (costs[i], i))
    order, bound = [seed], set(evars[seed])
    remaining.discard(seed)
    while remaining:
        conn = [i for i in remaining if evars[i] & bound]
        if not conn:
            bad = [pattern[i] for i in sorted(remaining)]
            raise ValueError(
                f"each of the pattern elements {bad} shares no "
                "variable with the rest of the pattern under any join "
                "order — evaluating them would be a cartesian product "
                "over the whole graph; bind a shared variable"
            )
        nxt = min(conn, key=lambda i: (costs[i], i))
        order.append(nxt)
        remaining.discard(nxt)
        bound |= evars[nxt]
    return order


def match_pattern(
    triples: DataFrame,
    pattern: list[tuple[str, str, str]],
    optional: list[tuple[str, str, str]] = (),
    filters: list = (),
    negation: list = (),
    existence: list = (),
    minus: list = (),
    subqueries: list = (),
    values: tuple | None = None,
    binds: list = (),
    path_max_hops: int | None = None,
    plan: str | None = "static",
    dataset: dict | None = None,
) -> DataFrame:
    """Match a basic graph pattern; see the module docstring.

    ``plan`` picks the join order for the REQUIRED elements:
    ``"static"`` (default) evaluates them selectivity-first via
    :func:`plan_pattern`'s scan-free rank, ``"stats"`` spends one
    conditional-aggregate scan on exact per-element counts first
    (:func:`pattern_stats_costs` — worth it when the triple relation
    is a committed table and the pattern is long), and ``None`` keeps
    the author's written order (the fuzz baseline).  Reordering never
    changes results — required elements are inner equi-joins on
    never-null columns — and never changes the OUTPUT column order,
    which stays first-appearance in the WRITTEN pattern.  OPTIONAL
    elements are not reordered (left joins are order-sensitive).

    An ``optional`` entry may also be a GROUP dict
    ``{"pattern": [...], "filters": [...], "binds": [...]}`` — SPARQL's
    full OPTIONAL group: the sub-pattern evaluates as a unit (its
    local FILTERs/BINDs apply INSIDE, before the left join, so a
    group filter can only null the group's bindings, never eliminate
    an outer row — the classic left-join-with-condition semantics a
    per-element filter cannot express), then left-joins on its shared
    REQUIRED outer variables (sharing only optional variables
    raises — that compatibility form needs null-aware join keys).

    ``optional`` elements have SPARQL OPTIONAL (left-join) semantics:
    a binding of the required pattern survives even when the optional
    element matches nothing, with the optional element's new variables
    null.  Filtering the optional element by its constants BEFORE the
    left join is exactly the ON-clause placement SPARQL specifies (a
    WHERE after the join would silently turn OPTIONAL back into a
    required match).

    ``filters`` are FILTER expressions — strings in the
    :func:`parse_filter` grammar or already-parsed tuples — evaluated
    over the final bindings (SPARQL group scope).  A comparison whose
    operand is null (an unmatched OPTIONAL variable) evaluates to null
    and the row is dropped — exactly SPARQL's error-eliminates-row
    rule, and Catalyst still pushes the predicate below the joins when
    the variable is required.  Filters over variables the pattern
    never binds raise.

    ``values`` is SPARQL VALUES inline data — ``(["?v", ...],
    [(term, ...), ...])`` with ``None`` for UNDEF — joined into the
    bindings with SPARQL compatibility semantics before the FILTERs
    (which may therefore reference data-only variables); see
    :func:`_join_values` for the join shape and
    :func:`parse_values` for the CLI syntax.

    ``binds`` are SPARQL BIND assignments — ``"expr AS ?v"`` strings
    in the :func:`parse_bind` grammar (or pre-parsed tuples) —
    evaluated in order after the pattern/VALUES bindings and before
    the FILTERs (which may reference BIND variables, as may later
    binds).  The target variable must be new (SPARQL forbids
    rebinding); a null operand (unmatched OPTIONAL) makes the binding
    null — SPARQL's error-→-unbound.  Each bind is a pure projection:
    no join, no shuffle.

    A constant predicate ending in ``+``, ``*`` or ``?`` is a
    **property path** (``?a MENTIONED_WITH+ ?b``): the element matches
    pairs connected by 1..n (``+``), 0..n (``*``) or 0..1 (``?``) hops
    of that predicate, with SET semantics (one row per distinct pair —
    SPARQL closure paths never multiply bindings).  The closure is
    computed by :func:`path_closure` (semi-naive frontier iteration,
    seeded BFS when an endpoint is constant), so a path element makes
    the query eager up to the closure; ``path_max_hops`` bounds the
    path length (and hence the rounds) for graphs whose full fixpoint
    is unaffordable (``?`` is always exactly one round).

    A constant predicate with a top-level ``/`` is a **sequence path**
    (``?repo DECLARES/MENTIONED_WITH ?x``): the element matches
    endpoints connected through existential intermediates, one segment
    per step, where each segment may itself be any single-step form
    (``^P``, ``P+``, ``(P1|P2)``, a nested parenthesized sequence).
    Sequences keep SPARQL's MULTISET semantics — the intermediate is
    projected away without dedup, exactly the spec's fresh-variable
    translation — see :func:`_sequence_relation`.

    ``negation`` is a list of FILTER NOT EXISTS groups, each itself a
    list of pattern elements: a binding survives only if the group
    matches NOTHING for that binding's shared-variable values.
    Variables the group shares with the pattern correlate; its other
    variables are existential.  A null shared variable (unmatched
    OPTIONAL) never matches, so the binding survives — SQL anti-join
    semantics, identical in the DuckDB twin's NOT EXISTS.  Groups
    must share ≥1 variable with the pattern (an uncorrelated group
    would be an ASK over the whole graph, not a per-binding filter),
    and each group element must chain on a variable already seen
    (shared or earlier-in-group) — the same cartesian guard as the
    main pattern.

    ``existence`` is the positive twin — FILTER EXISTS groups with
    the same shape and guards as ``negation``: a binding survives only
    if the group matches SOMETHING for its shared-variable values,
    compiled to a left-semi join.  A null shared variable (unmatched
    OPTIONAL) never matches, so the binding is DROPPED — the exact
    complement of the NOT EXISTS null rule, and SQL semi-join
    semantics in both engines.

    ``minus`` is SPARQL MINUS — groups with *set-difference*
    semantics, which differ from FILTER NOT EXISTS in two observable
    ways.  (1) The group is an INDEPENDENT pattern (its elements chain
    among themselves, uncorrelated with the outer bindings); a group
    sharing NO variable with the pattern removes nothing (SPARQL's
    disjoint-domain rule — the same group under NOT EXISTS would drop
    every binding when the group matches anywhere, which is why
    ``negation`` raises there instead).  (2) Removal is by binding
    COMPATIBILITY: a binding is removed iff some group solution agrees
    with it on every shared variable the binding actually binds, and
    they overlap on at least one.  When every shared variable is
    required (bound by a non-OPTIONAL element) this is a plain
    distinct-build hash anti-join; when a shared variable is nullable
    (OPTIONAL / VALUES / BIND-over-OPTIONAL) the compatibility
    condition is non-equi (``null-or-equal`` per variable plus an
    any-non-null domain-overlap guard), which Spark executes as a
    nested-loop anti-join against the distinct-projected group
    solutions — fine for the small solution sets MINUS groups
    produce in practice, and the required-variable fast path is taken
    whenever the query allows it.

    ``subqueries`` are SPARQL 1.1 sub-SELECTs — each entry a dict of
    :func:`solutions` keyword arguments (what ``{ SELECT ... }``
    inside a group parses to).  A subquery evaluates bottom-up as its
    own solution set and inner-joins into the outer bindings on its
    projected variables.  Each subquery must share at least one
    REQUIRED outer variable (the cartesian guard; sharing only an
    OPTIONAL-bound variable would need null-aware join semantics the
    spec does not give subqueries, so it raises) — which also makes
    the join order immaterial: the equi-join keys are never-null, so
    joining after the OPTIONAL left-joins (as both engines do, in
    matching column order) equals the spec's bottom-up group join.
    A subquery's other
    projected variables must be new to the group (aggregate aliases
    typically).  Scale shape: the subquery is an independent audited
    plan (its own pushed scans, its own group-by), and the join is a
    plain hash equi-join on the shared variables.

    Returns a DataFrame with one column per distinct ``?variable`` (in
    first-appearance order, ``?`` stripped).
    """
    if not pattern:
        raise ValueError("empty pattern")
    explicit_costs = isinstance(plan, (list, tuple))
    if not explicit_costs and plan not in (None, "static", "stats"):
        raise ValueError(
            f"unknown plan mode {plan!r}: None (written order), "
            "'static', 'stats', or an explicit per-element cost list")
    if plan is None or (not explicit_costs and len(pattern) <= 1):
        order = list(range(len(pattern)))
    elif explicit_costs:
        # caller-supplied costs (e.g. a persisted statistics catalog
        # — KgJob.pattern_costs) — no scan, planned like "stats"
        order = plan_pattern(pattern, list(plan))
    else:
        order = plan_pattern(
            pattern,
            pattern_stats_costs(triples, pattern)
            if plan == "stats" else None,
        )
    bound: DataFrame | None = None
    bound_vars: set[str] = set()
    required_vars: set[str] = set()  # bound by a non-OPTIONAL element
    # output column order stays first-appearance in the WRITTEN
    # pattern regardless of the planned JOIN order: required elements
    # record (written index, their vars) and assemble after the loop
    req_cols: list[tuple[int, list[str]]] = []
    post_vars: list[str] = []  # optional/subquery first-appearance
    steps = ([("element", pattern[i], False, i) for i in order]
             + [("optgroup" if isinstance(el, dict) else "element",
                 el, True, -1) for el in optional]
             + [("subquery", sq, False, -1) for sq in subqueries])
    for i, (kind, item, is_optional, written_idx) in enumerate(steps):
        if kind == "optgroup":
            # an OPTIONAL GROUP — SPARQL's left join of a whole
            # sub-pattern (its triples AND its local FILTERs/BINDs
            # evaluate INSIDE the group, before the left join; a
            # group-local filter can therefore never eliminate an
            # outer row, only turn the group's bindings null)
            unknown = set(item) - {"pattern", "filters", "binds"}
            if unknown:
                raise ValueError(
                    f"OPTIONAL group has unknown keys {sorted(unknown)}"
                    " (supported: pattern, filters, binds)")
            sub = match_pattern(triples, item["pattern"],
                                filters=item.get("filters", ()),
                                binds=item.get("binds", ()),
                                path_max_hops=path_max_hops,
                                plan=plan, dataset=dataset)
            cols = {"?" + c for c in sub.columns}
            shared = required_vars & cols
            if not shared:
                raise ValueError(
                    f"OPTIONAL group {item.get('pattern')} shares no "
                    "REQUIRED variable with the outer pattern — the "
                    "left join would be a cartesian product; bind a "
                    "shared required variable")
            clash = (bound_vars - required_vars) & cols - shared
            if clash:
                raise ValueError(
                    f"OPTIONAL group rebinds {sorted(clash)} which the"
                    " outer group binds optionally — rename the "
                    "group's variables or make the outer binding "
                    "required")
            bound = bound.join(sub, [v[1:] for v in sorted(shared)],
                               "left")
            bound_vars |= cols
            post_vars.extend("?" + c for c in sub.columns)
            continue
        if kind == "subquery":
            sub = solutions(triples, path_max_hops=path_max_hops,
                            **item)
            cols = {"?" + c for c in sub.columns}
            shared = required_vars & cols
            if not shared:
                raise ValueError(
                    f"subquery {item} shares no REQUIRED variable "
                    "with the outer pattern — joining it would be a "
                    "cartesian product (or need null-aware OPTIONAL "
                    "join semantics); project a shared variable"
                )
            clash = (bound_vars - required_vars) & cols
            if clash:
                raise ValueError(
                    f"subquery projects {sorted(clash)} which the "
                    "outer group binds optionally — rename the "
                    "subquery's aliases or make the outer binding "
                    "required")
            bound = bound.join(sub, [v[1:] for v in sorted(shared)])
            bound_vars |= cols
            post_vars.extend("?" + c for c in sub.columns)
            # conservatively nullable: a UNION/OPTIONAL inside the
            # subquery may project nulls, so downstream MINUS /
            # VALUES treat these as nullable
            continue
        element = item
        t, cols = _element_relation(triples, element, path_max_hops,
                                    dataset=dataset)
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
        if is_optional:
            post_vars.extend(cols)
        else:
            req_cols.append((written_idx, list(cols)))
            required_vars |= set(cols)
    var_order: list[str] = []  # first-appearance output column order
    for _, cols_w in sorted(req_cols):
        var_order.extend(v for v in cols_w if v not in var_order)
    for v in post_vars:
        if v not in var_order:
            var_order.append(v)
    if values is not None:
        bound, bound_vars, var_order = _join_values(
            bound, bound_vars, var_order, required_vars, values)
    for b in binds:
        if isinstance(b, str):
            b = parse_bind(b)
        var, expr = b
        if var in bound_vars:
            raise ValueError(
                f"BIND target {var} is already bound — SPARQL forbids "
                "rebinding a variable in scope")
        # a pure projection: one new column per binding row, no
        # shuffle; later binds may reference earlier bind variables
        bound = bound.withColumn(var[1:], _bind_column(expr, bound_vars))
        bound_vars.add(var)
        var_order.append(var)
    for filt in filters:
        if isinstance(filt, str):
            filt = parse_filter(filt)
        bound = bound.where(_filter_column(filt, bound_vars))
    for kind, groups in (("negation", negation), ("existence", existence)):
        for g, group in enumerate(groups):
            if isinstance(group, str):
                group = parse_pattern(group)
            group_vars = {t for el in group for t in el if _is_var(t)}
            shared = bound_vars & group_vars
            if not shared:
                raise ValueError(
                    f"{kind} group {g} {group} shares no variable with "
                    "the pattern — it would be a whole-graph ASK, not a "
                    f"per-binding {'NOT ' if kind == 'negation' else ''}"
                    "EXISTS filter"
                )
            seed_cols = [v[1:] for v in sorted(shared)]
            # correlated semi-match: seed with the bindings' shared-var
            # values (distinct — the anti/semi join only needs the key
            # set), chain the group elements on variables already in
            # scope
            matched = bound.select(*seed_cols).distinct()
            seen = set(shared)
            for j, element in enumerate(group):
                t, cols = _element_relation(triples, element,
                                            path_max_hops,
                                            dataset=dataset)
                s = seen & set(cols)
                if not s:
                    raise ValueError(
                        f"{kind} group {g} element {j} {element} shares "
                        "no variable with the group's scope so far — "
                        "reorder the group or bind a shared variable"
                    )
                matched = matched.join(t, [v[1:] for v in sorted(s)])
                seen |= set(cols)
            bound = bound.join(
                matched.select(*seed_cols).distinct(), seed_cols,
                "left_anti" if kind == "negation" else "left_semi",
            )
    for g, group in enumerate(minus):
        if isinstance(group, str):
            group = parse_pattern(group)
        # the MINUS group is an independent pattern — its own chain
        # guard, its own scans; SPARQL evaluates it without the outer
        # bindings in scope
        msol = match_pattern(triples, group, path_max_hops=path_max_hops,
                             dataset=dataset)
        shared = sorted(
            v[1:] for v in bound_vars & {"?" + c for c in msol.columns})
        if not shared:
            continue  # disjoint domains: MINUS removes nothing
        if any(c.startswith("__minus_") for c in bound.columns):
            raise ValueError(
                "variable names with the reserved __minus_ prefix "
                "cannot combine with MINUS groups")
        if all("?" + v in required_vars for v in shared):
            # every shared variable is never-null: compatibility is
            # plain equality — a distinct-build hash anti-join
            bound = bound.join(msol.select(*shared).distinct(), shared,
                               "left_anti")
        else:
            # nullable shared variables: SPARQL compatibility is
            # null-or-equal per variable, plus the domains must
            # actually overlap (some shared variable non-null) — a
            # non-equi condition, so a nested-loop anti-join against
            # the distinct-projected group solutions
            m = msol.select(
                *[F.col(v).alias(f"__minus_{v}") for v in shared]
            ).distinct()
            compat = F.lit(True)
            overlap = F.lit(False)
            for v in shared:
                compat = compat & (
                    F.col(v).isNull()
                    | (F.col(v) == F.col(f"__minus_{v}")))
                overlap = overlap | F.col(v).isNotNull()
            bound = bound.join(m, compat & overlap, "left_anti")
    # Spark's equi-join hoists the join-key columns to the front;
    # restore first-appearance order for a stable, readable schema
    return bound.select(*[v[1:] for v in var_order])


def construct(
    triples: DataFrame,
    pattern: list[tuple[str, str, str]],
    template: list[tuple[str, str, str]],
    optional: list[tuple[str, str, str]] = (),
    filters: list = (),
    negation: list = (),
    existence: list = (),
    minus: list = (),
    subqueries: list = (),
    values: tuple | None = None,
    binds: list = (),
    path_max_hops: int | None = None,
    dataset: dict | None = None,
) -> DataFrame:
    """SPARQL CONSTRUCT: derive NEW triples from the bindings of a
    basic graph pattern — the rule-based enrichment surface ("repos
    sharing a KB entity are RELATED_REPO") whose output feeds straight
    back into the triple table::

        construct(triples,
                  pattern=[("?r", "DECLARES", "?e"),
                           ("?e", "LINKED_TO", "?kb")],
                  template=[("?r", "MENTIONS_KB", "?kb")])

    Template terms are variables (bound by the pattern — unbound
    raises) or constants.  Per the SPARQL spec the constructed graph
    is a SET of triples: bindings project through the template, rows
    with a null term (an unmatched OPTIONAL variable) are dropped
    (SPARQL skips ill-formed template instantiations), and duplicates
    collapse.  ``evidence_count`` carries the collapsed multiplicity —
    how many bindings derived each triple — so downstream ranking can
    weight derived edges exactly like :mod:`materialize` does.

    Scale shape: the projection is narrow, the dedup is one
    map-side-combinable groupBy on (subj, pred, obj) — no wider than
    the materialize stage's own evidence aggregation.
    """
    if not template:
        raise ValueError("empty CONSTRUCT template")
    bound = match_pattern(triples, pattern, optional=optional,
                          filters=filters, negation=negation,
                          existence=existence, minus=minus,
                          subqueries=subqueries,
                          values=values, binds=binds,
                          path_max_hops=path_max_hops,
                          dataset=dataset)
    bound_vars = {"?" + c for c in bound.columns}
    outs = []
    for i, element in enumerate(template):
        if len(element) != 3:
            raise ValueError(f"template element {i} is not a triple")
        cols = []
        for field, term in zip(_FIELDS, element):
            if _is_var(term):
                if term not in bound_vars:
                    raise ValueError(
                        f"CONSTRUCT template references unbound "
                        f"variable {term}")
                cols.append(F.col(term[1:]).alias(field))
            else:
                cols.append(F.lit(term).alias(field))
        outs.append(bound.select(*cols))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return (
        out.where(F.col("subj").isNotNull()
                  & F.col("pred").isNotNull()
                  & F.col("obj").isNotNull())
        .groupBy("subj", "pred", "obj")
        .agg(F.count(F.lit(1)).alias("evidence_count"))
    )


def describe(
    triples: DataFrame,
    terms: list[str],
    pattern: list[tuple[str, str, str]] = (),
    optional: list[tuple[str, str, str]] = (),
    filters: list = (),
    negation: list = (),
    existence: list = (),
    minus: list = (),
    subqueries: list = (),
    values: tuple | None = None,
    binds: list = (),
    path_max_hops: int | None = None,
    dataset: dict | None = None,
) -> DataFrame:
    """SPARQL DESCRIBE: the set of triples touching the described
    nodes — constants name nodes directly, ``?variables`` describe
    every node they bind in the WHERE pattern::

        describe(triples, ["?e"], pattern=[("repo:a", "DECLARES", "?e")])

    The description is this engine's (implementation-defined per the
    SPARQL spec): all triples whose subject OR object is a described
    node, as a SET of ``(subj, pred, obj)`` rows.

    Scale shape: the OR-membership compiles as two equi-joins on the
    deduped node set (subject side, object side) union'd and
    distinct'd — hash joins both, never a nested-loop over the
    disjunction; the node set is the only shuffled side when it is
    small enough to broadcast.
    """
    if not terms:
        raise ValueError("DESCRIBE needs at least one term")
    var_terms = [t for t in terms if _is_var(t)]
    consts = [t for t in terms if not _is_var(t)]
    parts = []
    if var_terms:
        if not pattern:
            raise ValueError(
                "DESCRIBE with ?variables needs a WHERE pattern that "
                "binds them")
        bound = match_pattern(triples, pattern, optional=optional,
                              filters=filters, negation=negation,
                              existence=existence, minus=minus,
                              subqueries=subqueries,
                              values=values, binds=binds,
                              path_max_hops=path_max_hops,
                              dataset=dataset)
        for v in var_terms:
            if v[1:] not in bound.columns:
                raise ValueError(
                    f"DESCRIBE term {v} is not bound by the pattern")
            parts.append(bound.select(F.col(v[1:]).alias("node")))
    if consts:
        parts.append(triples.sparkSession.createDataFrame(
            [(c,) for c in consts], "node string"))
    nodes = parts[0]
    for p in parts[1:]:
        nodes = nodes.unionByName(p)
    nodes = nodes.where(F.col("node").isNotNull()).distinct()
    tri = triples.select(*_FIELDS)
    return (
        tri.join(nodes, tri["subj"] == nodes["node"]).select(*_FIELDS)
        .unionByName(
            tri.join(nodes, tri["obj"] == nodes["node"]).select(*_FIELDS))
        .distinct()
    )


def match_union(
    triples: DataFrame,
    groups: list,
    filters: list = (),
    path_max_hops: int | None = None,
    dataset: dict | None = None,
) -> DataFrame:
    """SPARQL UNION: alternation of group graph patterns —
    ``{ G1 } UNION { G2 }``.  Each group is either a bare pattern
    (list of triple elements) or a dict of :func:`match_pattern`
    kwargs (``pattern`` / ``optional`` / ``filters`` / ``negation``),
    evaluated independently; the result is the bag union of the
    branch binding sets.  Per the SPARQL algebra a variable a branch
    does not bind is **unbound (null)** in that branch's rows — the
    output schema is the union of the branch variable sets in
    first-appearance order.

    ``filters`` at this level are SPARQL group-scope FILTERs over the
    union: a comparison on a variable that is null in a branch's row
    (unbound there) errors and eliminates the row, exactly the
    OPTIONAL-null rule in :func:`match_pattern`.  Branch-local
    FILTERs go inside the group dict and see only that branch.

    Scale shape: a UNION is plan-level alternation, not a join — each
    branch keeps its own pushed scans and join order, and Spark's
    Union is a no-shuffle concatenation of the branch partitions, so
    the union of two selective BGPs costs exactly the two BGPs.
    """
    if len(groups) < 2:
        raise ValueError("UNION needs at least two groups")
    bound: DataFrame | None = None
    bound_vars: set[str] = set()
    for i, group in enumerate(groups):
        kwargs = dict(group) if isinstance(group, dict) else {
            "pattern": group}
        unknown = set(kwargs) - {"pattern", "optional", "filters",
                                 "negation", "existence", "minus",
                                 "subqueries", "values", "binds"}
        if unknown:
            raise ValueError(
                f"UNION group {i} has unknown keys {sorted(unknown)}")
        branch = match_pattern(triples, path_max_hops=path_max_hops,
                               dataset=dataset,
                               **kwargs)
        bound_vars |= {"?" + c for c in branch.columns}
        bound = branch if bound is None else bound.unionByName(
            branch, allowMissingColumns=True)
    for filt in filters:
        if isinstance(filt, str):
            filt = parse_filter(filt)
        bound = bound.where(_filter_column(filt, bound_vars))
    return bound


# --------------------------------------------- solution modifiers

# aggregate grammar (SPARQL 1.1's set applicable to string terms):
#   count(*)             count(?v)        count_distinct(?v)
#   min(?v)  max(?v)     group_concat(?v)  sample(?v)
#   group_concat(?v; separator="..")  sum(?v)  avg(?v)
# SUM/AVG parse terms through TRY_CAST(DECIMAL(38,9)) — non-numeric
# and unbound terms are skipped (null), the sum is EXACT (decimal,
# order-independent — a float sum would be partition-order
# nondeterministic) and surfaces as DOUBLE; AVG is that sum over the
# cast-count, null for a group with no numeric terms.  SAMPLE (spec:
# an arbitrary group value) is pinned to MIN — a nondeterministic
# aggregate cannot hash-match any oracle.
_AGG_RE = re.compile(
    r"^(count|count_distinct|min|max|group_concat|sample|sum|avg"
    r"|sum_distinct)\s*"
    r"\(\s*(\*|\?\w+)\s*"
    r'(?:;\s*separator\s*=\s*"(?P<sep>(?:[^"\\]|\\.)*)"\s*)?'
    r"\)\s+AS\s+(\w+)$",
    re.IGNORECASE,
)
_ORDER_RE = re.compile(r"^(\?\w+|\w+)(?:\s+(asc|desc))?$", re.IGNORECASE)


def parse_aggregate(text: str) -> tuple:
    """Parse ``fn(?var) AS alias`` / ``count(*) AS alias`` into the
    normalized ``(fn, term, alias)`` tuple :func:`solutions` consumes
    — or the 4-tuple ``("group_concat", term, alias, separator)``
    for ``group_concat(?v; separator="..") AS alias``.  Raises on
    anything outside the grammar — an aggregate that silently parsed
    wrong would mis-summarize the query."""
    m = _AGG_RE.match(text.strip())
    if not m:
        raise ValueError(
            f"unparseable aggregate {text!r}: expected "
            "'fn(?var) AS alias' with fn in (count, count_distinct, "
            "min, max, group_concat, sample, sum, avg), 'count(*) AS "
            'alias\', or \'group_concat(?v; separator="..") AS alias\''
        )
    fn, term, alias = m.group(1).lower(), m.group(2), m.group(4)
    if term == "*" and fn != "count":
        raise ValueError(f"{fn}(*) is not a thing; only count(*)")
    sep = m.group("sep")
    if sep is not None:
        if fn != "group_concat":
            raise ValueError(
                f"SEPARATOR only applies to GROUP_CONCAT, not "
                f"{fn.upper()}")
        return fn, term, alias, _unescape(sep)
    return fn, term, alias


_HAVING_RE = re.compile(
    r"^(\?\w+|\w+)\s*(=|!=|<=|>=|<|>)\s*(\d+(?:\.\d+)?)$")


def parse_having(text: str) -> tuple[str, str, int | float]:
    """Parse one HAVING term — ``alias op NUMBER`` over a numeric
    aggregate's alias (COUNT/COUNT DISTINCT are bigint, SUM/AVG
    double — the engine's only numeric values) — into
    ``(column_name, op, n)``.  An integer literal stays int, a
    decimal literal becomes float."""
    m = _HAVING_RE.match(text.strip())
    if not m:
        raise ValueError(
            f"unparseable HAVING term {text!r}: expected "
            "'alias op NUMBER' with op in (=, !=, <, <=, >, >=)")
    name = m.group(1)
    lit = m.group(3)
    return (name[1:] if name.startswith("?") else name,
            m.group(2), float(lit) if "." in lit else int(lit))


def parse_order(text: str) -> tuple[str, bool]:
    """Parse one ORDER BY term — ``?var`` / ``alias`` with an optional
    trailing ``ASC``/``DESC`` — into ``(column_name, ascending)``."""
    m = _ORDER_RE.match(text.strip())
    if not m:
        raise ValueError(
            f"unparseable ORDER BY term {text!r}: expected "
            "'?var|alias [ASC|DESC]'"
        )
    name = m.group(1)
    return (name[1:] if name.startswith("?") else name,
            (m.group(2) or "asc").lower() == "asc")


def solutions(
    triples: DataFrame,
    pattern: list[tuple[str, str, str]] = (),
    optional: list[tuple[str, str, str]] = (),
    filters: list = (),
    negation: list = (),
    existence: list = (),
    minus: list = (),
    subqueries: list = (),
    union: list | None = None,
    values: tuple | None = None,
    binds: list = (),
    path_max_hops: int | None = None,
    group_by: list[str] = (),
    aggregates: list = (),
    having: list = (),
    select: list[str] | None = None,
    distinct: bool = False,
    order_by: list = (),
    offset: int | None = None,
    limit: int | None = None,
    plan: str | None = "static",
    dataset: dict | None = None,
) -> DataFrame:
    """SPARQL solution modifiers over a basic graph pattern: GROUP BY
    + aggregates, SELECT projection, DISTINCT, ORDER BY and LIMIT —
    the "top declaring repos by entity count" shape every KG consumer
    eventually writes::

        solutions(triples,
                  [("?r", "DECLARES", "?e")],
                  group_by=["?r"],
                  aggregates=["count_distinct(?e) AS n"],
                  order_by=["n DESC", "?r ASC"], limit=10)

    Modifier semantics (SPARQL 1.1, restricted to string terms):

    - ``group_by`` — ``?var`` names; with ``aggregates`` empty it
      degenerates to DISTINCT over the keys (exactly SPARQL's
      implicit-sample-free projection of group keys).
    - ``aggregates`` — ``fn(?var) AS alias`` strings (or pre-parsed
      tuples from :func:`parse_aggregate`).  ``count(?v)`` counts
      bound (non-null) values, ``count(*)`` counts rows — both per
      the SPARQL spec, and identical in the SQL twin.
      ``group_concat`` diverges from SPARQL deliberately: SPARQL
      leaves element order unspecified, which is useless for a
      deterministic engine, so it is pinned to *sorted distinct*
      values joined by ``,`` (portable: binary collation in both
      Spark and DuckDB); ``group_concat(?v; separator="..") AS a``
      overrides the joiner.  ``sum``/``avg`` TRY_CAST terms to an
      exact decimal (junk/unbound skipped) and surface as DOUBLE —
      see the grammar note above ``_AGG_RE``.  With ``aggregates``
      and no ``group_by`` the whole binding set is one group (global
      aggregate, one row).
    - ``select`` — projection list (``?var`` or aggregate alias);
      under grouping only group keys and aliases are in scope
      (SPARQL's projection restriction — anything else raises).
    - ``distinct`` — SELECT DISTINCT over the projected columns.
    - ``order_by`` — ``'?var DESC'`` / ``'alias ASC'`` strings (or
      :func:`parse_order` tuples).  String comparison is binary in
      both engines, so the order is portable.
    - ``limit`` — row cap.  ``orderBy().limit(k)`` compiles to
      TakeOrderedAndProject (per-partition top-k + driver merge of k
      rows per partition — no global sort materializes), the same
      shape the top_customers plan audit pins.  A LIMIT without a
      *total* order is nondeterministic in any engine; callers that
      need stable output (every contract key here) must make
      ``order_by`` a total order, e.g. by appending the group keys.

    Scale shape: the aggregation is one map-side-combinable groupBy
    on the group keys (count_distinct adds the standard two-phase
    expand Spark plans for it), and ORDER+LIMIT never global-sorts.

    ``union`` replaces ``pattern`` with :func:`match_union` groups
    (alternation); the modifiers then apply to the union'd binding
    set — null (branch-unbound) values behave as SPARQL unbound terms
    everywhere (aggregates skip them, GROUP BY treats null as a key).

    ``having`` filters groups by COUNT-aggregate aliases (``"n >= 2"``
    — the engine's only numeric values; a group filter over MIN/MAX
    strings would be a lexicographic trap, so it raises).  ``offset``
    skips the first n ordered solutions (requires ``order_by`` — an
    unordered OFFSET is nondeterministic in any engine); with
    ``limit`` it pages: rows [offset, offset+limit).

    ``plan`` is :func:`match_pattern`'s join-order mode for the
    required elements (``"static"`` selectivity rank by default,
    ``"stats"`` for one measured costing scan, ``None`` for the
    written order); UNION branches keep their written order.
    """
    if union is not None:
        if pattern or optional or negation or existence or minus \
                or subqueries or binds or values is not None:
            raise ValueError(
                "give the query as EITHER a single pattern (+optional/"
                "negation/values/binds) OR a union of groups, not "
                "both; branch-local pattern kwargs go inside the "
                "group dicts")
        bound = match_union(triples, union, filters=filters,
                            path_max_hops=path_max_hops,
                            dataset=dataset)
    else:
        bound = match_pattern(triples, pattern, optional=optional,
                              filters=filters, negation=negation,
                              existence=existence, minus=minus,
                              subqueries=subqueries,
                              values=values, binds=binds,
                              path_max_hops=path_max_hops,
                              plan=plan, dataset=dataset)
    bound_vars = {"?" + c for c in bound.columns}
    aggs = [parse_aggregate(a) if isinstance(a, str) else a
            for a in aggregates]
    keys: list[str] = []
    for v in group_by:
        if v not in bound_vars:
            raise ValueError(f"GROUP BY references unbound variable {v}")
        keys.append(v[1:])
    grouped = bool(keys or aggs)
    if grouped:
        names = set(keys)
        exprs = []
        for agg in aggs:
            fn, term, alias = agg[0], agg[1], agg[2]
            sep = agg[3] if len(agg) > 3 else ","
            if alias in names:
                raise ValueError(
                    f"aggregate alias {alias!r} collides with a group "
                    "key or another alias")
            names.add(alias)
            if term == "*":
                col = F.count(F.lit(1))
            else:
                if term not in bound_vars:
                    raise ValueError(
                        f"aggregate references unbound variable {term}")
                c = F.col(term[1:])
                # numeric terms for SUM/AVG: TRY_CAST to an exact
                # decimal (null on junk/unbound → skipped, like every
                # SPARQL aggregate) — decimal addition is
                # order-independent where a float sum would vary with
                # partition order; surfaces as DOUBLE
                d = c.try_cast("decimal(38,9)")
                col = {
                    "count": lambda: F.count(c),
                    "count_distinct": lambda: F.count_distinct(c),
                    "min": lambda: F.min(c),
                    "max": lambda: F.max(c),
                    # sorted-distinct concat: collect_set drops nulls
                    # (SPARQL aggregates skip error/unbound terms)
                    "group_concat": lambda: F.array_join(
                        F.array_sort(F.collect_set(c)), sep),
                    # SPARQL leaves SAMPLE's pick arbitrary; a
                    # deterministic engine pins it to MIN (portable:
                    # binary collation in both engines)
                    "sample": lambda: F.min(c),
                    "sum": lambda: F.sum(d).cast("double"),
                    "sum_distinct":
                        lambda: F.sum_distinct(d).cast("double"),
                    # guarded: all-null group → null, not a 0/0
                    "avg": lambda: F.when(
                        F.count(d) > 0,
                        F.sum(d).cast("double") / F.count(d)),
                }[fn]()
            exprs.append(col.alias(alias))
        if exprs:
            bound = (bound.groupBy(*keys).agg(*exprs)
                     if keys else bound.agg(*exprs))
        else:
            bound = bound.select(*keys).distinct()
        out_scope = list(bound.columns)
    else:
        out_scope = list(bound.columns)
    if having and not grouped:
        raise ValueError("HAVING requires GROUP BY or aggregates")
    numeric_aliases = {a[2] for a in aggs
                       if a[0] in ("count", "count_distinct",
                                   "sum", "sum_distinct", "avg")}
    for h in having:
        name, op, rhs = parse_having(h) if isinstance(h, str) else h
        if name not in numeric_aliases:
            raise ValueError(
                f"HAVING references {name!r}, which is not a numeric "
                "aggregate alias (COUNT/COUNT DISTINCT/SUM/AVG — "
                "every other term in the engine is a string)")
        c = F.col(name)
        bound = bound.where({
            "=": c == rhs, "!=": c != rhs, "<": c < rhs,
            "<=": c <= rhs, ">": c > rhs, ">=": c >= rhs,
        }[op])
    if select is not None:
        proj = []
        for s in select:
            name = s[1:] if s.startswith("?") else s
            if name not in out_scope:
                raise ValueError(
                    f"SELECT references {s!r} which is not "
                    + ("a group key or aggregate alias" if grouped
                       else "a bound variable"))
            proj.append(name)
        if not proj:
            raise ValueError("empty SELECT projection")
        bound = bound.select(*proj)
    if distinct:
        bound = bound.distinct()
    if order_by:
        cols = []
        for o in order_by:
            name, asc = parse_order(o) if isinstance(o, str) else o
            if name not in bound.columns:
                raise ValueError(
                    f"ORDER BY references {name!r} which is not an "
                    "output column")
            cols.append(F.col(name).asc() if asc else F.col(name).desc())
        bound = bound.orderBy(*cols)
    if offset is not None:
        if offset < 0:
            raise ValueError("OFFSET must be non-negative")
        if not order_by:
            raise ValueError(
                "OFFSET without a total ORDER BY is nondeterministic; "
                "order the solutions first")
        bound = bound.offset(offset)
    if limit is not None:
        if limit < 0:
            raise ValueError("LIMIT must be non-negative")
        bound = bound.limit(limit)
    return bound

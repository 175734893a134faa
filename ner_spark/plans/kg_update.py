"""SPARQL 1.1 Update over the KG triple store — the write twin of
:mod:`ner_spark.plans.sparql`.

The reference engine's store is rebuilt per analyze call
(``ner-web/src/main.rs:100-116`` runs the pipeline per request); this
repo maintains a PERSISTENT triple table (``plans/job.py``), so the
natural missing surface is the standard way to edit one::

    apply_update(triples, '''
        DELETE { ?e LINKED_TO ?kb }
        INSERT { ?repo MENTIONS_KB ?kb }
        WHERE  { ?repo DECLARES ?e . ?e LINKED_TO ?kb }
    ''')

Supported operations (a request chains any number with top-level
``;``; each operation sees its predecessor's result, per the spec):

.. code-block:: text

    Request    := Update (';' Update)*
    Update     := InsertData | DeleteData | DeleteWhere | Modify
    InsertData := 'INSERT' 'DATA' '{' GroundTriple+ '}'
    DeleteData := 'DELETE' 'DATA' '{' GroundTriple+ '}'
    DeleteWhere:= 'DELETE' 'WHERE' '{' Triple+ '}'
    Modify     := ('DELETE' '{' Triple+ '}')?
                  ('INSERT' '{' Triple+ '}')?  'WHERE' Group

``Group`` is the full query-layer group grammar (OPTIONAL, FILTER,
MINUS, EXISTS, property paths, VALUES, BIND, UNION-as-whole-group,
subqueries); templates are plain triples — variables or constants,
no paths (per the SPARQL grammar, a path in a template is illegal).

Semantics (SPARQL 1.1 Update §3.1, on this engine's SET store):

- The WHERE pattern evaluates once against the ORIGINAL store; the
  DELETE template instantiates the triples to remove and the INSERT
  template the triples to add — deletes apply first, then inserts,
  both derived from the same pre-update bindings, so a triple both
  deleted and re-inserted survives.
- Template rows with an unbound (null) term are skipped — SPARQL's
  ill-formed-instantiation rule, same as CONSTRUCT.
- Deleting an absent triple and inserting a present one are no-ops
  (set semantics).

``evidence_count`` discipline: surviving rows keep their count;
genuinely NEW rows (not present after the delete) enter with the
number of bindings that derived them — exactly
:func:`~ner_spark.plans.kg_query.construct`'s collapsed multiplicity,
so derived edges rank like materialized ones downstream.

Scale shape: the delete is one hash anti-join of the store against
the distinct-projected delete set (a constant predicate in the
template still prunes nothing on the store side — the store scan is
full by definition of a rewrite — but the WHERE scans keep their
pushed constants); the insert set is a map-side-combinable groupBy
on (subj, pred, obj) followed by an anti-join against the kept rows.
No shuffle is wider than the store itself, and nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_FIELDS = ("subj", "pred", "obj")

# characters that mark a property-path (or negated-set) form — illegal
# in a template's predicate position per the SPARQL Update grammar
_PATH_MARKS = set("+*?/^|!()")


def _is_var(term: str) -> bool:
    return term.startswith("?")


def _check_template(template: list[tuple[str, str, str]],
                    clause: str) -> None:
    if not template:
        raise ValueError(f"empty {clause} template")
    for el in template:
        if len(el) != 3:
            raise ValueError(
                f"{clause} template element {el!r} is not a triple")
        pred = el[1]
        if not _is_var(pred) and _PATH_MARKS & set(pred):
            raise ValueError(
                f"{clause} template predicate {pred!r} looks like a "
                "property path — templates name concrete triples "
                "(paths are a QUERY form; SPARQL forbids them here)")


def _check_ground(template: list[tuple[str, str, str]],
                  clause: str) -> None:
    for el in template:
        for t in el:
            if _is_var(t):
                raise ValueError(
                    f"{clause} DATA takes ground triples only, got "
                    f"variable {t!r} — use the WHERE form "
                    f"({clause} {{...}} WHERE {{...}}) to bind it")


def parse_update(text: str) -> dict:
    """Parse one SPARQL Update operation into ``{"form": ...}`` kwargs
    for :func:`apply_update`.  Raises on anything outside the grammar
    in the module docstring — an update that silently mis-parsed
    would corrupt the store — and on a multi-operation request
    (use :func:`parse_update_request` for ``;``-chained ones)."""
    ops = parse_update_request(text)
    if len(ops) != 1:
        raise ValueError(
            f"request chains {len(ops)} operations; parse_update "
            "handles exactly one (apply_update and the job surface "
            "accept ';'-chained requests directly)")
    return ops[0]


def parse_update_request(text: str) -> list[dict]:
    """Parse a SPARQL Update REQUEST — one or more operations chained
    with top-level ``;`` — into a list of operation dicts, in
    execution order."""
    from ner_spark.plans.sparql import _Cursor, tokenize

    toks = tokenize(text)
    chunks: list[list[str]] = []
    cur_toks: list[str] = []
    depth = 0
    for t in toks:
        if t == "{":
            depth += 1
        elif t == "}":
            depth -= 1
        if t == ";" and depth == 0:
            if cur_toks:
                chunks.append(cur_toks)
            cur_toks = []
        else:
            cur_toks.append(t)
    if cur_toks:
        chunks.append(cur_toks)
    if not chunks:
        raise ValueError("empty update request")
    out = []
    for chunk in chunks:
        cur = _Cursor(chunk)
        out.append(_parse_op(cur))
        if not cur.done():
            raise ValueError(f"unexpected trailing token {cur.peek()!r}")
    return out


def _parse_op(cur) -> dict:
    """One update operation off the cursor (the grammar in the module
    docstring, minus the ``;`` chaining handled by the caller)."""
    from ner_spark.plans.sparql import _parse_group, _parse_triples

    head = cur.next().upper()

    def braced_triples() -> list:
        cur.eat("{")
        out = _parse_triples(cur)
        cur.eat("}")
        if not out:
            raise ValueError("empty template group")
        return out

    if head == "INSERT":
        if cur.at("DATA"):
            cur.next()
            tmpl = braced_triples()
            _check_template(tmpl, "INSERT")
            _check_ground(tmpl, "INSERT")
            if not cur.done():
                raise ValueError(
                    f"unexpected trailing token {cur.peek()!r}")
            return {"form": "insert_data", "ins_template": tmpl}
        ins = braced_triples()
        _check_template(ins, "INSERT")
        cur.eat("WHERE")
        where = _parse_group(cur)
        if not cur.done():
            raise ValueError(f"unexpected trailing token {cur.peek()!r}")
        return {"form": "modify", "del_template": None,
                "ins_template": ins, "where": where}
    if head != "DELETE":
        raise ValueError(
            "update must start with INSERT or DELETE (queries go "
            f"through plans.sparql), got {head!r}")
    if cur.at("DATA"):
        cur.next()
        tmpl = braced_triples()
        _check_template(tmpl, "DELETE")
        _check_ground(tmpl, "DELETE")
        if not cur.done():
            raise ValueError(f"unexpected trailing token {cur.peek()!r}")
        return {"form": "delete_data", "del_template": tmpl}
    if cur.at("WHERE"):
        # DELETE WHERE { pattern }: the pattern doubles as the delete
        # template, so it must be template-legal (no paths, no
        # OPTIONAL/FILTER — _parse_triples already stops at those and
        # the closing-brace eat raises on leftovers)
        cur.next()
        cur.eat("{")
        pat = _parse_triples(cur)
        cur.eat("}")
        if not pat:
            raise ValueError("empty DELETE WHERE pattern")
        _check_template(pat, "DELETE WHERE")
        if not cur.done():
            raise ValueError(f"unexpected trailing token {cur.peek()!r}")
        return {"form": "delete_where", "del_template": pat}
    dele = braced_triples()
    _check_template(dele, "DELETE")
    ins = None
    if cur.at("INSERT"):
        cur.next()
        ins = braced_triples()
        _check_template(ins, "INSERT")
    cur.eat("WHERE")
    where = _parse_group(cur)
    if not cur.done():
        raise ValueError(f"unexpected trailing token {cur.peek()!r}")
    return {"form": "modify", "del_template": dele,
            "ins_template": ins, "where": where}


def _instantiate(bound: DataFrame, template: list, bound_vars: set,
                 clause: str) -> DataFrame:
    """Project the bindings through a template — one arm per element,
    null (unbound-term) rows dropped — as a raw (subj, pred, obj)
    multiset; callers dedup or count as their semantics need."""
    outs = []
    for element in template:
        cols = []
        for field, term in zip(_FIELDS, element):
            if _is_var(term):
                if term not in bound_vars:
                    raise ValueError(
                        f"{clause} template references {term}, which "
                        "the WHERE pattern does not bind")
                cols.append(F.col(term[1:]).alias(field))
            else:
                cols.append(F.lit(term).alias(field))
        outs.append(bound.select(*cols))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.where(F.col("subj").isNotNull()
                     & F.col("pred").isNotNull()
                     & F.col("obj").isNotNull())


def _ground_df(spark, template: list) -> DataFrame:
    return spark.createDataFrame(
        [tuple(el) for el in template],
        "subj string, pred string, obj string")


def build_delta(
    triples: DataFrame,
    update: str | dict,
    path_max_hops: int | None = None,
) -> tuple[DataFrame | None, DataFrame | None]:
    """Evaluate one update's WHERE against ``triples`` (the SPARQL
    "once, against the pre-update store" evaluation) and return
    ``(delete_set, insert_set)`` — the delete a DISTINCT
    (subj, pred, obj) set, the insert carrying its derived
    ``evidence_count``; either side None when the form lacks that
    clause.  The delta is a frozen VALUE: persisting it (the edit
    ledger in :meth:`ner_spark.plans.job.KgJob.sparql_update`) and
    re-folding later gives the same result even after the base store
    is re-derived, which replaying the TEXT would not."""
    update = parse_update(update) if isinstance(update, str) else update
    form = update["form"]
    spark = triples.sparkSession

    del_df: DataFrame | None = None
    ins_df: DataFrame | None = None  # with a derived `evidence_count`
    if form == "insert_data":
        ins_df = (_ground_df(spark, update["ins_template"])
                  .groupBy(*_FIELDS)
                  .agg(F.count(F.lit(1)).alias("evidence_count")))
    elif form == "delete_data":
        del_df = _ground_df(spark, update["del_template"]).distinct()
    elif form == "delete_where":
        pat = update["del_template"]
        tmpl_vars = {t for el in pat for t in el if _is_var(t)}
        if not tmpl_vars:
            # a ground DELETE WHERE degenerates to DELETE DATA
            del_df = _ground_df(spark, pat).distinct()
        else:
            from ner_spark.plans.kg_query import match_pattern

            bound = match_pattern(triples, pat,
                                  path_max_hops=path_max_hops)
            del_df = _instantiate(bound, pat, tmpl_vars,
                                  "DELETE WHERE").distinct()
    elif form == "modify":
        kw = dict(update["where"])
        if "union" in kw:
            from ner_spark.plans.kg_query import match_union

            bound = match_union(triples, kw["union"],
                                filters=kw.get("filters", ()),
                                path_max_hops=path_max_hops)
        else:
            from ner_spark.plans.kg_query import match_pattern

            bound = match_pattern(triples, path_max_hops=path_max_hops,
                                  **kw)
        bound_vars = {"?" + c for c in bound.columns}
        if update["del_template"] is None and update["ins_template"] \
                is None:
            raise ValueError("modify needs a DELETE or INSERT clause")
        if update["del_template"] is not None:
            del_df = _instantiate(bound, update["del_template"],
                                  bound_vars, "DELETE").distinct()
        if update["ins_template"] is not None:
            ins_df = (_instantiate(bound, update["ins_template"],
                                   bound_vars, "INSERT")
                      .groupBy(*_FIELDS)
                      .agg(F.count(F.lit(1)).alias("evidence_count")))
    else:
        raise ValueError(f"unknown update form {form!r}")
    return del_df, ins_df


def fold_delta(
    triples: DataFrame,
    del_df: DataFrame | None,
    ins_df: DataFrame | None,
) -> DataFrame:
    """Fold one built delta into a triple table: delete first (hash
    anti-join on the distinct delete set), then insert the rows not
    already present (anti-join against the kept rows) with their
    derived ``evidence_count`` — kept rows keep theirs.  Pure; shared
    by :func:`apply_update` and the job's edit-ledger read path, so
    the two can never drift."""
    ec = (F.col("evidence_count").cast("bigint")
          if "evidence_count" in triples.columns else F.lit(1))
    store = triples.select(*_FIELDS, ec.alias("evidence_count"))
    kept = store
    if del_df is not None:
        kept = store.join(del_df.select(*_FIELDS), list(_FIELDS),
                          "left_anti")
    if ins_df is None:
        return kept
    # anti-join semantics ignore right-side duplicates, so the kept
    # store needs NO distinct here — a dedup would be a full shuffle
    # of the store on every fold of every read
    new = ins_df.join(kept.select(*_FIELDS), list(_FIELDS),
                      "left_anti")
    return kept.unionByName(new.select(*kept.columns))


def apply_update(
    triples: DataFrame,
    update: str | dict | list,
    path_max_hops: int | None = None,
) -> DataFrame:
    """Apply one parsed (or textual) SPARQL Update to a triple table
    and return the updated table — a PURE transform: the caller owns
    persistence (:meth:`ner_spark.plans.job.KgJob.sparql_update`
    freezes the built delta into the committed store's edit ledger).

    Input needs (subj, pred, obj) and may carry ``evidence_count``
    (defaulted to 1 otherwise); output is exactly
    (subj, pred, obj, evidence_count) under the semantics in the
    module docstring.  A textual REQUEST may chain operations with
    ``;`` — each evaluates against its predecessor's result; a dict
    (or a list of dicts) applies pre-parsed operations the same way.
    """
    if isinstance(update, str):
        ops: list = parse_update_request(update)
    elif isinstance(update, dict):
        ops = [update]
    else:
        ops = list(update)
    out = triples
    for op in ops:
        del_df, ins_df = build_delta(out, op,
                                     path_max_hops=path_max_hops)
        out = fold_delta(out, del_df, ins_df)
    return out

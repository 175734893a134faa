"""CONSTRUCT-rule forward chaining: unit semantics (composition,
recursion, inferred flags), differential fuzz against a brute-force
Python evaluator on random graphs + random conjunctive rules, and the
non-convergence guard."""

from __future__ import annotations

import random
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ner_spark.plans.kg_rules import materialize_rules, parse_rule  # noqa: E402

TRIPLE_SCHEMA = "subj string, pred string, obj string"


def brute_force_rules(triples, rules):
    """Naive Python fixpoint: each rule is (pattern, template,
    filters) with patterns of (s, p, o) terms (?vars or constants)
    and filters limited to ("neq", ?a, ?b).  Enumerate bindings by
    nested loops — fine at test sizes."""
    out = set(triples)
    while True:
        new = set()
        for pattern, template, neqs in rules:
            bindings = [{}]
            for el in pattern:
                nxt = []
                for b in bindings:
                    for t in out:
                        bb = dict(b)
                        ok = True
                        for term, val in zip(el, t):
                            if term.startswith("?"):
                                if bb.get(term, val) != val:
                                    ok = False
                                    break
                                bb[term] = val
                            elif term != val:
                                ok = False
                                break
                        if ok:
                            nxt.append(bb)
                bindings = nxt
            for b in bindings:
                if any(b.get(x) == b.get(y) for x, y in neqs):
                    continue
                for s, p, o in template:
                    new.add(tuple(b.get(t, t) for t in (s, p, o)))
        if new <= out:
            return out
        out |= new


def _run(spark, triples, rule_strs, brute_rules):
    df = spark.createDataFrame(list(triples), TRIPLE_SCHEMA)
    got = {
        (r.subj, r.pred, r.obj, r.inferred)
        for r in materialize_rules(df, rule_strs).collect()
    }
    full = brute_force_rules(set(triples), brute_rules)
    want = {(s, p, o, (s, p, o) not in set(triples))
            for s, p, o in full}
    return got, want


def test_rule_composition_and_recursion(spark):
    triples = [
        ("r1", "DECLARES", "e1"), ("r2", "DECLARES", "e1"),
        ("r2", "DECLARES", "e2"), ("r3", "DECLARES", "e2"),
    ]
    rule_strs = [
        'CONSTRUCT { ?a RELATED ?b } '
        'WHERE { ?a DECLARES ?e . ?b DECLARES ?e FILTER(?a != ?b) }',
        'CONSTRUCT { ?a REACH ?b } WHERE { ?a RELATED ?b }',
        'CONSTRUCT { ?a REACH ?c } '
        'WHERE { ?a REACH ?b . ?b RELATED ?c }',
    ]
    brute = [
        ([("?a", "DECLARES", "?e"), ("?b", "DECLARES", "?e")],
         [("?a", "RELATED", "?b")], [("?a", "?b")]),
        ([("?a", "RELATED", "?b")], [("?a", "REACH", "?b")], []),
        ([("?a", "REACH", "?b"), ("?b", "RELATED", "?c")],
         [("?a", "REACH", "?c")], []),
    ]
    got, want = _run(spark, triples, rule_strs, brute)
    assert got == want
    # recursion actually composed: r1 reaches r3 through r2
    assert ("r1", "REACH", "r3", True) in got
    assert ("r1", "DECLARES", "e1", False) in got


def test_non_convergence_guard(spark):
    df = spark.createDataFrame(
        [(f"n{i}", "E", f"n{i+1}") for i in range(12)], TRIPLE_SCHEMA)
    rules = ['CONSTRUCT { ?a E ?c } WHERE { ?a E ?b . ?b E ?c }']
    with pytest.raises(RuntimeError, match="converge"):
        materialize_rules(df, rules, max_rounds=2)
    # enough rounds: the squaring closure converges fast (log2 depth)
    out = materialize_rules(df, rules, max_rounds=6)
    n = 12 + 1
    assert out.count() == n * (n - 1) // 2  # all i<j chain pairs


def test_parse_rule_rejects_non_construct():
    with pytest.raises(ValueError, match="CONSTRUCT"):
        parse_rule("SELECT ?s WHERE { ?s P ?o }")
    with pytest.raises(ValueError, match="pattern"):
        parse_rule({"template": [("a", "P", "b")]})


@pytest.mark.parametrize("seed", range(5))
def test_fuzz_random_rules(spark, seed):
    rnd = random.Random(6000 + seed)
    nodes = [f"n{i}" for i in range(rnd.randint(3, 6))]
    preds = ["P", "Q", "R", "S"][: rnd.randint(2, 4)]
    triples = sorted({
        (rnd.choice(nodes), rnd.choice(preds), rnd.choice(nodes))
        for _ in range(rnd.randint(4, 15))
    })
    rule_strs, brute = [], []
    for _ in range(rnd.randint(1, 3)):
        p1, p2 = rnd.choice(preds), rnd.choice(preds)
        head = rnd.choice(preds + ["T"])
        if rnd.random() < 0.5:
            # chain rule: ?a p1 ?b . ?b p2 ?c -> ?a head ?c
            rule_strs.append(
                f'CONSTRUCT {{ ?a {head} ?c }} '
                f'WHERE {{ ?a {p1} ?b . ?b {p2} ?c }}')
            brute.append((
                [("?a", p1, "?b"), ("?b", p2, "?c")],
                [("?a", head, "?c")], []))
        else:
            # inversion rule: ?a p1 ?b -> ?b head ?a
            rule_strs.append(
                f'CONSTRUCT {{ ?b {head} ?a }} WHERE {{ ?a {p1} ?b }}')
            brute.append((
                [("?a", p1, "?b")], [("?b", head, "?a")], []))
    got, want = _run(spark, triples, rule_strs, brute)
    assert got == want


def test_job_rules_view(spark, tmp_path):
    import shutil

    from ner_spark.plans.job import KgJob
    from ner_spark.sources.fixtures import source_table

    out = str(tmp_path / "kg")
    try:
        job = KgJob(spark, out, run_id="r1")
        job.run(source_table(spark, n_rows=30))
        counts = job.rules_view([
            'CONSTRUCT { ?a RELATED_REPO ?b } WHERE '
            '{ ?a DECLARES ?e . ?b DECLARES ?e FILTER(?a != ?b) }'])
        view = spark.read.parquet(f"{out}/rules/triples")
        assert counts["triples"] == view.count()
        assert view.where(
            "pred = 'RELATED_REPO' AND inferred").count() > 0
        base = {(r.subj, r.pred, r.obj) for r in job.triples().collect()}
        got = {(r.subj, r.pred, r.obj) for r in
               view.where("NOT inferred").collect()}
        assert got == base
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_cli_rule_with_source_run(spark, tmp_path, capsys, monkeypatch):
    # --rule combined with --fixture-rows must materialize the rules
    # view after the run (it used to be silently ignored whenever a
    # source was given, because only the standalone branch handled it)
    import shutil

    from ner_spark.plans import job as jobmod

    out = str(tmp_path / "kg_cli")
    try:
        monkeypatch.setattr("sys.argv", [
            "job", "--output", out, "--fixture-rows", "10",
            "--no-prewarm",
            "--rule",
            'CONSTRUCT { ?a RELATED_REPO ?b } WHERE '
            '{ ?a DECLARES ?e . ?b DECLARES ?e FILTER(?a != ?b) }',
        ])
        jobmod.main()
        outp = capsys.readouterr().out
        assert "stage=rules triples=" in outp
        view = spark.read.parquet(f"{out}/rules/triples")
        assert view.where("pred = 'RELATED_REPO' AND inferred").count() > 0
    finally:
        shutil.rmtree(out, ignore_errors=True)

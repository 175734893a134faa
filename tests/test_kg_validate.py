"""SHACL-lite validator: unit semantics, differential fuzz against a
brute-force Python checker on random graphs + random shapes, and the
gold-KG integration (the fixture shapes must actually fire)."""

from __future__ import annotations

import random
import re
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ner_spark.plans.kg_infer import RDF_TYPE, entail, ontology  # noqa: E402
from ner_spark.plans.kg_validate import (  # noqa: E402
    SHAPES_SCHEMA,
    shapes,
    validate,
)


def brute_force_validate(triples, shape_rows):
    """Naive reference checker, rule-by-rule over Python sets."""
    triples = set(triples)
    types = {(s, o) for s, p, o in triples if p == RDF_TYPE}
    out = set()
    for sid, tc, pred, mn, mx, pat, ocls in shape_rows:
        foci = {s for s, c in types if c == tc}
        for f in foci:
            objs = [o for s, p, o in triples if s == f and p == pred]
            n = len(objs)
            if mn is not None and n < mn:
                out.add((sid, f, "minCount", str(n)))
            if mx is not None and n > mx:
                out.add((sid, f, "maxCount", str(n)))
            for o in objs:
                if pat is not None and not re.search(pat, o):
                    out.add((sid, f, "pattern", o))
                if ocls is not None and (o, ocls) not in types:
                    out.add((sid, f, "class", o))
    return out


def _run(spark, triples, shape_rows):
    tdf = spark.createDataFrame(
        list(triples), "subj string, pred string, obj string"
    )
    sdf = spark.createDataFrame([tuple(r) for r in shape_rows], SHAPES_SCHEMA)
    got = {
        (r.shape_id, r.focus, r.constraint, r.value)
        for r in validate(tdf, sdf).collect()
    }
    return got, brute_force_validate(triples, shape_rows)


def test_toy_all_constraints(spark):
    triples = [
        ("r1", RDF_TYPE, "Repo"),
        ("r2", RDF_TYPE, "Repo"),
        ("r1", "DECL", "ent:a"),
        ("r1", "DECL", "bad-id"),
        ("ent:a", RDF_TYPE, "Ent"),
    ]
    shape_rows = [
        ("s1", "Repo", "DECL", 1, 1, "^ent:", "Ent"),
    ]
    got, want = _run(spark, triples, shape_rows)
    assert got == want
    assert ("s1", "r2", "minCount", "0") in got  # no edges at all
    assert ("s1", "r1", "maxCount", "2") in got
    assert ("s1", "r1", "pattern", "bad-id") in got
    assert ("s1", "r1", "class", "bad-id") in got
    # conforming object produces no rows
    assert ("s1", "r1", "pattern", "ent:a") not in got


def test_conforming_graph_is_empty(spark):
    triples = [
        ("r1", RDF_TYPE, "Repo"),
        ("r1", "DECL", "ent:a"),
        ("ent:a", RDF_TYPE, "Ent"),
    ]
    shape_rows = [("s1", "Repo", "DECL", 1, 2, "^ent:", "Ent")]
    got, want = _run(spark, triples, shape_rows)
    assert got == want == set()


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_random_graph_random_shapes(spark, seed):
    rnd = random.Random(2000 + seed)
    nodes = [f"n{i}" for i in range(rnd.randint(4, 10))]
    props = [f"P{i}" for i in range(rnd.randint(2, 4))]
    classes = [f"C{i}" for i in range(rnd.randint(2, 5))]
    triples = set()
    for _ in range(rnd.randint(5, 40)):
        triples.add(
            (rnd.choice(nodes), rnd.choice(props), rnd.choice(nodes))
        )
    for _ in range(rnd.randint(2, 12)):
        triples.add((rnd.choice(nodes), RDF_TYPE, rnd.choice(classes)))
    shape_rows = []
    for i in range(rnd.randint(1, 5)):
        shape_rows.append((
            f"s{i}",
            rnd.choice(classes),
            rnd.choice(props),
            rnd.choice([None, 0, 1, 2]),
            rnd.choice([None, 0, 1, 2]),
            rnd.choice([None, "^n[0-3]$", "[02468]$"]),
            rnd.choice([None] + classes),
        ))
    got, want = _run(spark, triples, shape_rows)
    assert got == want


def test_gold_kg_fixture_shapes(spark):
    """The committed shapes over the entailed gold KG: the pattern and
    class constraints conform (positive control: range-rule typing),
    at least one cardinality shape fires (the validator is exercised),
    and the result matches the brute-force checker exactly."""
    from ner_spark.plans.kg_gold import kg_triples_gold
    from ner_spark.plans.kg_validate import SHAPES_ROWS

    ent = entail(kg_triples_gold(spark), ontology(spark))
    out = validate(ent, shapes(spark))
    got = {
        (r.shape_id, r.focus, r.constraint, r.value) for r in out.collect()
    }
    triples = [(r.subj, r.pred, r.obj) for r in ent.collect()]
    assert got == brute_force_validate(triples, SHAPES_ROWS)
    assert not any(c == "pattern" for _, _, c, _ in got)
    assert not any(
        (s, c) == ("entity_kb_link", "class")
        for s, _, c, _ in got
    )
    assert any(c in ("minCount", "maxCount") for _, _, c, _ in got)

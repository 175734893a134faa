"""canonicalize_increment: folding an append-only delta into a
committed entity table must equal a full canonicalize over the union —
including component merges, canonical-surface renames, and fuzzy
edges — while touching only delta-proportional state.

These are the operator-level exactness pins for the KG job's
incremental maintenance (KgJob.update); job-level wiring is tested in
tests/test_job_update.py."""

from __future__ import annotations

import random

import pytest

from ner_spark.operators.canonicalize import canonicalize, canonicalize_increment

LINK_SCHEMA = (
    "repo string, path string, surface string, kb_id string, "
    "resolved_category string, link_score double"
)


def _links(spark, rows):
    """rows: (doc, surface, kb_id | None)"""
    return spark.createDataFrame(
        [("r", f"docs/{doc}.txt", s, kb, "ORG", 0.9 if kb else 0.0)
         for doc, s, kb in rows],
        LINK_SCHEMA,
    )


def _ents(df):
    return sorted(map(tuple, df.collect()))


def _run_increment(spark, base_rows, delta_rows, **kw):
    base, delta = _links(spark, base_rows), _links(spark, delta_rows)
    full = _links(spark, base_rows + delta_rows)
    old = canonicalize(base, **{k: v for k, v in kw.items()
                                if k in ("fuzzy", "fuzzy_threshold")})
    new, changes = canonicalize_increment(old, delta, base, **kw)
    fresh = canonicalize(full, **{k: v for k, v in kw.items()
                                  if k in ("fuzzy", "fuzzy_threshold")})
    return old, new, changes, fresh


def test_purely_additive_delta(spark):
    base = [(0, "alpha", "K1"), (0, "beta", "K1"), (1, "gamma", None)]
    delta = [(2, "zeta", "K2"), (2, "omega", None)]
    old, new, changes, fresh = _run_increment(spark, base, delta)
    assert _ents(new) == _ents(fresh)
    assert changes.isEmpty()


def test_delta_merges_two_components(spark):
    # base: {alpha, K1} and {beta, K2} are separate components;
    # the delta surface bridges them through both KB ids
    base = [(0, "alpha", "K1"), (1, "beta", "K2")]
    delta = [(2, "mid", "K1"), (3, "mid", "K2")]
    old, new, changes, fresh = _run_increment(spark, base, delta)
    assert _ents(new) == _ents(fresh)
    got = {(r.surface, r.old_entity_id, r.new_entity_id)
           for r in changes.collect()}
    # beta's component is renamed to the merged min (alpha); alpha's
    # own id is already the min, so only beta appears
    assert got == {("beta", "ent:beta", "ent:alpha")}


def test_new_surface_becomes_canonical_minimum(spark):
    base = [(0, "beta", "K1"), (0, "gamma", "K1")]  # ent:beta
    delta = [(1, "alpha", "K1")]  # alpha < beta: renames the component
    old, new, changes, fresh = _run_increment(spark, base, delta)
    assert _ents(new) == _ents(fresh)
    got = {(r.surface, r.old_entity_id, r.new_entity_id)
           for r in changes.collect()}
    assert got == {("beta", "ent:beta", "ent:alpha"),
                   ("gamma", "ent:beta", "ent:alpha")}


def test_old_surface_with_new_kb_edge(spark):
    # the delta re-mentions an OLD surface with a kb id unseen so far:
    # the new KB node joins beta's component, nothing else changes
    base = [(0, "beta", "K1"), (1, "zeta", "K2")]
    delta = [(2, "beta", "K3")]
    old, new, changes, fresh = _run_increment(spark, base, delta)
    assert _ents(new) == _ents(fresh)
    assert changes.isEmpty()


def test_chain_merge_through_multiple_components(spark):
    # three disjoint base components merged by one delta doc whose
    # surfaces link all three KB ids pairwise
    base = [(0, "aa", "K1"), (1, "mm", "K2"), (2, "zz", "K3")]
    delta = [(3, "bridge1", "K1"), (3, "bridge1", "K2"),
             (4, "bridge2", "K2"), (4, "bridge2", "K3")]
    old, new, changes, fresh = _run_increment(spark, base, delta)
    assert _ents(new) == _ents(fresh)
    got = {(r.old_entity_id, r.new_entity_id) for r in changes.collect()}
    assert got == {("ent:mm", "ent:aa"), ("ent:zz", "ent:aa")}


def test_fuzzy_delta_edges_match_full_recompute(spark):
    # "sao paulo" / "são paulo" share no KB id; the delta introduces
    # the accented variant and fuzzy must merge it with the old one
    base = [(0, "sao paulo", None), (0, "rio", "K1")]
    delta = [(1, "são paulo", None)]
    old, new, changes, fresh = _run_increment(
        spark, base, delta, fuzzy=True, fuzzy_threshold=0.5
    )
    assert _ents(new) == _ents(fresh)
    # the new surface joined the old one's component; whether the old
    # surface is renamed depends on lexicographic order — pin it
    merged = dict(_ents(new))
    assert merged["sao paulo"] == merged["são paulo"]
    got = {(r.surface, r.new_entity_id) for r in changes.collect()}
    assert got == {("sao paulo", "ent:sao paulo")} or got == set()


def test_fuzzy_new_surface_bridges_two_old_components(spark):
    # two dissimilar old surfaces, one delta surface similar to both
    base = [(0, "abcdefghij", None), (1, "qrstuvwxyz", None)]
    delta = [(2, "abcdefghijqrstuvwxyz", None)]
    old, new, changes, fresh = _run_increment(
        spark, base, delta, fuzzy=True, fuzzy_threshold=0.4
    )
    assert _ents(new) == _ents(fresh)
    merged = dict(_ents(new))
    assert (merged["abcdefghij"] == merged["qrstuvwxyz"]
            == merged["abcdefghijqrstuvwxyz"])


def test_distributed_path_matches_local(spark):
    base = [(0, "alpha", "K1"), (1, "beta", "K2"), (2, "kappa", "K3")]
    delta = [(3, "mid", "K1"), (3, "mid", "K2"), (4, "aaa", "K3")]
    b, d = _links(spark, base), _links(spark, delta)
    old = canonicalize(b)
    new_loc, ch_loc = canonicalize_increment(old, d, b)
    new_dist, ch_dist = canonicalize_increment(old, d, b, local_threshold=0)
    assert _ents(new_loc) == _ents(new_dist)
    assert (sorted(map(tuple, ch_loc.collect()))
            == sorted(map(tuple, ch_dist.collect())))


def test_empty_delta_is_identity(spark):
    base = [(0, "alpha", "K1"), (1, "beta", None)]
    b = _links(spark, base)
    d = _links(spark, [])
    old = canonicalize(b)
    new, changes = canonicalize_increment(old, d, b)
    assert _ents(new) == _ents(old)
    assert changes.isEmpty()


@pytest.mark.parametrize("seed", [7, 23, 41])
def test_randomized_split_equivalence(spark, seed):
    """Random link tables, random base/delta split: the increment must
    equal the full recompute (the property the KG job's update path
    relies on at every delta shape)."""
    rng = random.Random(seed)
    surfaces = [f"s{i:02d}" for i in range(24)]
    kbs = [f"K{i}" for i in range(8)]
    rows = []
    for doc in range(30):
        for _ in range(rng.randint(1, 4)):
            s = rng.choice(surfaces)
            kb = rng.choice(kbs) if rng.random() < 0.6 else None
            rows.append((doc, s, kb))
    cut = rng.randint(5, 25)
    base = [r for r in rows if r[0] < cut]
    delta = [r for r in rows if r[0] >= cut]
    old, new, changes, fresh = _run_increment(spark, base, delta)
    assert _ents(new) == _ents(fresh)
    # changes must be exactly the old-surface rows that differ
    old_map = dict(_ents(old))
    new_map = dict(_ents(new))
    expect = {(s, old_map[s], new_map[s])
              for s in old_map if old_map[s] != new_map[s]}
    assert {(r.surface, r.old_entity_id, r.new_entity_id)
            for r in changes.collect()} == expect

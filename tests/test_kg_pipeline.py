"""End-to-end KG pipeline tests on the fixture source table:
tag → disambiguate → link → canonicalize → materialize."""

from __future__ import annotations

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from ner_spark.operators.canonicalize import canonicalize
from ner_spark.operators.link import disambiguate, link_mentions, link_mentions_alias
from ner_spark.operators.materialize import materialize_triples, with_entities
from ner_spark.operators.tag import extract_mentions
from ner_spark.sources.fixtures import fixture_texts, source_table

GOLDENS = json.loads(
    (Path(__file__).parent / "goldens" / "goldens.json").read_text()
)


@pytest.fixture(scope="module")
def links_df(spark):
    src = source_table(spark, n_rows=102)  # each fixture text exactly twice
    mentions = extract_mentions(src, mode="hybrid")
    return link_mentions(disambiguate(mentions)).cache()


def test_mentions_match_goldens(spark):
    """Spark-extracted mentions == frozen kernel goldens for every text."""
    src = source_table(spark, n_rows=51)  # one row per fixture text
    mentions = extract_mentions(src, mode="hybrid")
    got = mentions.select(
        "path", "mention_text", "category", "start_token", "end_token",
        "start", "end", "confidence", "source",
    ).collect()

    texts = [t for _d, t in fixture_texts()]
    by_text: dict[str, list] = {}
    for r in got:
        i = int(r.path.split("/")[-1].removesuffix(".txt"))
        by_text.setdefault(texts[i % len(texts)], []).append(r)

    for rec in GOLDENS:
        want = sorted(
            (s[0], s[1], s[2], s[3], s[4], s[5], round(s[6], 9), s[7])
            for s in rec["modes"]["hybrid"]["spans"]
        )
        have = sorted(
            (r.mention_text, r.category, r.start_token, r.end_token,
             r.start, r.end, round(r.confidence, 9), r.source)
            for r in by_text.get(rec["text"], [])
        )
        assert have == want, f"mention drift for text_id={rec['text_id']}"


def test_sha_integrity(spark):
    src = source_table(spark, n_rows=51)
    mentions = extract_mentions(src)
    assert mentions.where(~F.col("sha_ok")).isEmpty()


def test_ned_disambiguates_paris(links_df):
    paris = links_df.where(F.col("surface") == "paris").select(
        "resolved_category", "ned_confidence", "context_window"
    ).collect()
    assert paris
    for r in paris:
        if any(w in ("hilton", "socialite", "atriz") for w in r.context_window):
            assert r.resolved_category == "PER" and r.ned_confidence == pytest.approx(0.95)
        else:
            assert r.resolved_category == "LOC"


def test_nel_links_brasil(links_df):
    rows = links_df.where(F.col("surface") == "brasil").select("kb_id", "link_score").distinct().collect()
    assert rows
    for r in rows:
        assert r.kb_id == "Q155"
        # exact match 0.8 + LOC bonus 0.15 when NED resolved LOC
        assert r.link_score in (pytest.approx(0.8), pytest.approx(0.95))


def test_nel_tie_breaking_paris(links_df):
    """'paris' matches both Q47454 (contains) and Q90 (exact): exact 0.8
    beats substring 0.5; PER-resolved mentions get Q47454 bonus 0.65 < 0.8
    so Q90 still wins on score — mirrors reference strict-> semantics."""
    rows = links_df.where(F.col("surface") == "paris").select("kb_id").distinct().collect()
    assert {r.kb_id for r in rows} == {"Q90"}


def test_alias_linking(links_df):
    aliased = link_mentions_alias(links_df.drop("kb_id", "kb_name", "link_score", "surface"))
    rows = aliased.where(F.col("surface") == "brasil").select("kb_id").distinct().collect()
    assert rows and rows[0].kb_id == "Q155"


def test_canonicalize_merges_kb_linked_surfaces(links_df):
    entities = canonicalize(links_df)
    ids = dict(entities.collect())
    # 'paris' (Q90) and every surface only-linked to Q90 share a component
    assert ids["paris"].startswith("ent:")
    # surfaces are all covered
    n_surfaces = links_df.select("surface").distinct().count()
    assert len(ids) == n_surfaces


def test_canonicalize_local_matches_distributed(links_df):
    # small-graph union-find fast path vs salted label-propagation loop
    local = sorted(map(tuple, canonicalize(links_df).collect()))
    dist = sorted(map(tuple, canonicalize(links_df, local_threshold=0).collect()))
    assert local == dist


def test_triples_shape(links_df):
    entities = canonicalize(links_df)
    triples = materialize_triples(links_df, entities).cache()
    preds = {r.pred for r in triples.select("pred").distinct().collect()}
    assert preds == {"DECLARES", "MENTIONED_WITH", "LINKED_TO", "INSTANCE_OF"}
    assert triples.where(F.col("evidence_count") < 1).isEmpty()
    # MENTIONED_WITH pairs are ordered a < b and never self-paired
    mw = triples.where(F.col("pred") == "MENTIONED_WITH")
    assert mw.where(F.col("subj") >= F.col("obj")).isEmpty()
    # DECLARES subjects are repos
    assert triples.where(
        (F.col("pred") == "DECLARES") & ~F.col("subj").startswith("repo:")
    ).isEmpty()


def test_triples_deterministic(spark, links_df):
    entities = canonicalize(links_df)
    t1 = sorted(map(tuple, materialize_triples(links_df, entities).collect()))
    t2 = sorted(map(tuple, materialize_triples(links_df, entities).collect()))
    assert t1 == t2


def test_mentions_with_entity_coalesce(links_df):
    entities = canonicalize(links_df)
    m = with_entities(links_df, entities)
    assert m.where(F.col("entity_id").isNull()).isEmpty()


def test_canonicalize_kb_like_surface_is_structural(spark):
    """A surface whose text literally starts with 'k:'/'kb:' is still a
    surface (node kinds are namespace-prefixed, not sniffed), and the
    local and distributed paths agree on it."""
    rows = [
        ("r", "p", "kb:weird", "Q90", "LOC", 0.95),
        ("r", "p", "paris", "Q90", "LOC", 0.95),
        ("r", "q", "k: thing", None, "ORG", 0.0),
    ]
    schema = ("repo string, path string, surface string, kb_id string, "
              "resolved_category string, link_score double")
    links = spark.createDataFrame(rows, schema)
    local = sorted(map(tuple, canonicalize(links).collect()))
    dist = sorted(map(tuple, canonicalize(links, local_threshold=0).collect()))
    assert local == dist
    ids = dict(local)
    # kb:weird and paris share Q90 → one component; canonical = min surface
    assert ids["kb:weird"] == "ent:kb:weird"
    assert ids["paris"] == "ent:kb:weird"
    # unlinked surface stays a singleton mapped to itself
    assert ids["k: thing"] == "ent:k: thing"


def test_tag_tokens_debug_features(spark):
    """debug_features=True surfaces the reference's per-token top-10
    feature attributions (pipeline.rs:236-242), matching the oracle
    feature extractor exactly (ties broken by name — the reference's
    HashMap tie order is nondeterministic)."""
    from ner_spark.core.features import extract_features
    from ner_spark.core.tokenizer import tokenize
    from ner_spark.data.gazetteers import default_rule_config
    from ner_spark.operators.tag import tag_tokens

    src = source_table(spark, n_rows=3)
    rows = (
        tag_tokens(src, debug_features=True)
        .where(F.col("path").endswith("/0.txt"))
        .orderBy("token_index")
        .collect()
    )
    text = [t for _d, t in fixture_texts()][0]
    words = [t[0] for t in tokenize(text)]
    fvs = extract_features(words, default_rule_config())
    assert len(rows) == len(words)
    for r in rows:
        top = sorted(fvs[r.token_index].items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert list(r.top_features) == [f"{k}={v:g}" for k, v in top]


def test_frame_sample_plan(spark):
    """Video frame-sampling plumbing: one row per sampled timestamp,
    only for media with positive duration, repartitioned for decode
    parallelism."""
    from ner_spark.operators.multimodal import MEDIA_SCHEMA, frame_sample_plan

    rows = [
        (1, "video", "video/mp4", bytearray(b"x"), 320, 240, 2500),
        (2, "image", "image/png", bytearray(b"y"), 64, 64, 0),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = sorted(
        (r.media_id, r.frame_no, r.ts_ms)
        for r in frame_sample_plan(media, every_ms=1000).collect()
    )
    # 0, 1000, 2000 ms for the 2.5 s video; nothing for the image
    assert got == [(1, 0, 0), (1, 1, 1000), (1, 2, 2000)]


def test_empty_source_pipeline(spark, tmp_path):
    """Zero input documents flow through every stage (tag → link →
    canonicalize → materialize) without errors and produce zero
    triples — executor-loss recovery can land on empty partitions."""
    from ner_spark.plans.job import KgJob
    from ner_spark.schemas import SOURCE_SCHEMA

    empty = spark.createDataFrame([], SOURCE_SCHEMA)
    job = KgJob(spark, str(tmp_path / "kg_empty"), run_id="e1")
    out = job.run(empty)
    assert out.count() == 0
    # resume over the empty (partitioned) checkpoint: the schema
    # sidecar lets the skipped-stage read succeed with zero data files
    out2 = KgJob(spark, str(tmp_path / "kg_empty"), run_id="e2").run(empty)
    assert out2.count() == 0
    assert out2.schema == out.schema


def test_fuzzy_alias_linking(spark):
    """MinHashLSH candidate blocking (north-star scale path): a surface
    that misses the alias dictionary exactly still links via char
    3-gram Jaccard similarity; dissimilar surfaces stay unlinked."""
    rows = [
        ("r", "a", "Paris Hiltonn", "PER"),   # typo → fuzzy match
        ("r", "b", "paris hilton", "PER"),    # exact dictionary hit
        ("r", "c", "zzqqxxyyww", "ORG"),      # no candidate at all
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, mention_text string, resolved_category string"
    )
    linked = link_mentions_alias(df, fuzzy=True, fuzzy_threshold=0.4)
    got = {r.surface: (r.kb_id, r.link_score) for r in linked.collect()}
    assert got["paris hilton"] == ("Q47454", 0.95)
    kb, score = got["paris hiltonn"]
    assert kb == "Q47454" and 0.4 <= score < 0.95
    assert got["zzqqxxyyww"][0] is None


def test_canonicalize_deep_chain_converges(spark):
    """A 60-link surface–KB chain has graph diameter ≈ 120; plain
    min-label propagation needs ~diameter iterations, but the
    pointer-jumping (path-doubling) step converges in O(log d) — so
    max_iter=15 must suffice and every node must take the chain-min
    label."""
    rows = []
    for i in range(60):
        rows.append(("r", "p", f"s{i:03d}", f"Q{i:03d}", "LOC", 0.95))
        rows.append(("r", "p", f"s{i + 1:03d}", f"Q{i:03d}", "LOC", 0.95))
    schema = ("repo string, path string, surface string, kb_id string, "
              "resolved_category string, link_score double")
    links = spark.createDataFrame(rows, schema)
    ents = dict(
        map(tuple, canonicalize(links, local_threshold=0, max_iter=15).collect())
    )
    assert len(ents) == 61
    assert set(ents.values()) == {"ent:s000"}


def test_canonicalize_hot_hub_star(spark):
    """Repo-level skew shape: one KB id linked from 5,000 distinct
    surfaces concentrates a single join key (the salted-join case the
    north rule calls out). The star has diameter 2, so convergence must
    be immediate, every spoke must land in the hub's component, and an
    unrelated pair must stay its own entity."""
    rows = [("r", "p", f"spoke{i:05d}", "QHUB", "ORG", 0.95)
            for i in range(5000)]
    rows.append(("r", "p", "loner", "QX", "LOC", 0.95))
    schema = ("repo string, path string, surface string, kb_id string, "
              "resolved_category string, link_score double")
    links = spark.createDataFrame(rows, schema).repartition(8)
    ents = dict(
        map(tuple, canonicalize(links, local_threshold=0, max_iter=6).collect())
    )
    assert len(ents) == 5001
    star = {v for k, v in ents.items() if k != "loner"}
    assert len(star) == 1
    assert ents["loner"] not in star


def test_pipeline_partition_invariance(spark):
    """Distributed-correctness property: the triple set must not depend
    on how the input is partitioned or how many shuffle partitions the
    relational stages use — per-partition kernels (tag memo, Arrow
    batching) and the salted CC loop may see arbitrary row groupings
    at scale."""

    def run(src, shuffle_parts):
        with_conf = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
        try:
            links = link_mentions(disambiguate(extract_mentions(src)))
            slim = links.select(
                "repo", "path", "surface", "kb_id",
                "resolved_category", "link_score",
            )
            return sorted(
                map(tuple, materialize_triples(slim, canonicalize(slim)).collect())
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", with_conf)

    src = source_table(spark, n_rows=60)
    base = run(src.coalesce(1), 4)
    assert run(src.repartition(7), 13) == base
    assert run(src.repartition(32), 32) == base


def test_pipeline_extreme_skew_invariance(spark):
    """North-rule skew clause: a corpus where ~95% of documents pile
    onto ONE repo (one hot DECLARES subject, one hot doc-locality key)
    must yield the identical triple set under any partitioning — the
    hot groupBy keys survive via map-side partial aggregation and the
    salted CC, not by luck of the layout."""
    from ner_spark.schemas import SOURCE_SCHEMA
    from ner_spark.sources.fixtures import build_source_rows

    rows = [
        (("hotrepo" if i % 20 else r[0]),) + tuple(r[1:])
        for i, r in enumerate(build_source_rows(80))
    ]
    src = spark.createDataFrame(rows, SOURCE_SCHEMA)

    def run(s):
        links = link_mentions(disambiguate(extract_mentions(s)))
        slim = links.select("repo", "path", "surface", "kb_id",
                            "resolved_category", "link_score")
        return sorted(
            map(tuple, materialize_triples(slim, canonicalize(slim)).collect())
        )

    base = run(src.coalesce(1))
    assert run(src.repartition(16)) == base
    hot = [t for t in base if t[0] == "repo:hotrepo" and t[1] == "DECLARES"]
    assert hot  # the hot subject actually dominates the corpus


def test_fuzzy_canonicalize_merges_similar_surfaces(spark):
    rows = [
        ("r1", "p1", "sao paulo", None, "LOC", 0.0),
        ("r1", "p2", "sao paulo!", None, "LOC", 0.0),
        ("r1", "p3", "rio de janeiro", None, "LOC", 0.0),
    ]
    schema = ("repo string, path string, surface string, kb_id string, "
              "resolved_category string, link_score double")
    links = spark.createDataFrame(rows, schema)

    # default semantics unchanged: no KB links → all singletons
    off = {r.surface: r.entity_id for r in canonicalize(links).collect()}
    assert len(set(off.values())) == 3

    on = {
        r.surface: r.entity_id
        for r in canonicalize(links, fuzzy=True, fuzzy_threshold=0.8).collect()
    }
    # char-3-gram Jaccard("sao paulo", "sao paulo!") = 7/8
    assert on["sao paulo"] == on["sao paulo!"] == "ent:sao paulo"
    assert on["rio de janeiro"] != on["sao paulo"]

    # local union-find and distributed label propagation agree on the
    # fuzzy edge set too
    dist = {
        r.surface: r.entity_id
        for r in canonicalize(
            links, fuzzy=True, fuzzy_threshold=0.8, local_threshold=0
        ).collect()
    }
    assert dist == on


def test_fuzzy_canonicalize_handles_short_surfaces(spark):
    """Regression: surfaces under 3 chars produce EMPTY shingle sets,
    and Catalyst may evaluate the LSH hash UDF before the size()>0
    filter — the fixture corpus crashed the first fuzzy implementation
    with 'Must have at least 1 non zero entry'."""
    rows = [
        ("r1", "p1", "xp", None, "ORG", 0.0),       # 2 chars: no shingles
        ("r1", "p2", "b3", None, "ORG", 0.0),       # 2 chars: no shingles
        ("r1", "p3", "sao paulo", None, "LOC", 0.0),
        ("r1", "p4", "sao paulo!", None, "LOC", 0.0),
    ]
    schema = ("repo string, path string, surface string, kb_id string, "
              "resolved_category string, link_score double")
    links = spark.createDataFrame(rows, schema)
    on = {
        r.surface: r.entity_id
        for r in canonicalize(links, fuzzy=True, fuzzy_threshold=0.8).collect()
    }
    # short surfaces stay singletons; the similar pair still merges
    assert on["xp"] == "ent:xp" and on["b3"] == "ent:b3"
    assert on["sao paulo"] == on["sao paulo!"]


def test_fuzzy_lsh_matches_exact_on_gold(spark):
    """The MinHashLSH scale path must find the same ≥-threshold pairs
    as the exhaustive shingle-join on the gold surface set (LSH output
    is always a SUBSET of exact — candidates share ≥1 hash band, then
    filter by true distance — so equality means zero missed pairs
    here; deterministic under seed=42)."""
    from ner_spark.operators.canonicalize import (
        fuzzy_surface_edges,
        fuzzy_surface_edges_exact,
    )
    from ner_spark.plans.kg_gold import gold_mentions

    links = link_mentions(disambiguate(gold_mentions(spark)))
    exact = sorted(map(tuple, fuzzy_surface_edges_exact(links, 0.5).collect()))
    lsh = sorted(map(tuple, fuzzy_surface_edges(links, 0.5).collect()))
    assert exact == lsh
    assert ("s:estado do rio de janeiro", "s:rio de janeiro") in exact


def test_fuzzy_threshold_boundary_is_inclusive(spark):
    """J exactly at the threshold must merge on BOTH pair finders:
    approxSimilarityJoin alone is strict-<, so the LSH path joins
    marginally looser and re-filters inclusively.  'abcde'/'bcdef'
    share 2 of 4 distinct 3-grams → J = 0.5 exactly."""
    from ner_spark.operators.canonicalize import (
        fuzzy_surface_edges,
        fuzzy_surface_edges_exact,
    )

    rows = [("r", "p1", "abcde", None, "ORG", 0.0),
            ("r", "p2", "bcdef", None, "ORG", 0.0)]
    schema = ("repo string, path string, surface string, kb_id string, "
              "resolved_category string, link_score double")
    links = spark.createDataFrame(rows, schema)
    exact = sorted(map(tuple, fuzzy_surface_edges_exact(links, 0.5).collect()))
    lsh = sorted(map(tuple, fuzzy_surface_edges(links, 0.5).collect()))
    assert exact == [("s:abcde", "s:bcdef")]
    assert lsh == exact

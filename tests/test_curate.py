"""Semantics of the dataset-curation operators (ner_spark.operators.curate):
the properties a 100 TB training-data pipeline relies on — append-stable
split/sample assignment, curation rule precedence, and NER-driven
redaction over the gold corpus."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from ner_spark.operators import curate
from ner_spark.plans import analytics as A

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_dataset_split_stable_under_append(spark):
    """Appending new rows must never reassign existing rows — the
    property randomSplit does NOT have."""
    d = _docs(spark)
    half = d.where(F.col("doc_id") < 250)
    full_assign = {r.doc_id: r.split
                   for r in curate.dataset_split(d).collect()}
    half_assign = {r.doc_id: r.split
                   for r in curate.dataset_split(half).collect()}
    assert half_assign == {k: v for k, v in full_assign.items() if k < 250}


def test_dataset_split_proportions_and_total(spark):
    d = _docs(spark)
    counts = {r.split: r.n for r in
              curate.dataset_split(d).groupBy("split")
              .agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    assert total == d.count()
    # 500 uniform hashes: train ~400, val ~50, test ~50 (loose bounds)
    assert counts["train"] > 0.7 * total
    assert 0 < counts["val"] < 0.2 * total
    assert 0 < counts["test"] < 0.2 * total


def test_stratified_sample_stable_and_per_stratum(spark):
    d = _docs(spark)
    kept = curate.stratified_sample(
        d, fractions={"en": 0.25}, default_frac=0.6
    )
    rows = kept.collect()
    # deterministic: a second evaluation returns the identical set
    assert {r.doc_id for r in rows} == {r.doc_id for r in kept.collect()}
    by_lang = {}
    for r in rows:
        by_lang[r.lang] = by_lang.get(r.lang, 0) + 1
    totals = {r.lang: r.n for r in
              d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # en downsampled to ~1/4, everything else ~0.6 (loose bounds on
    # 500-row strata)
    assert by_lang["en"] / totals["en"] < 0.45
    for lang, n in by_lang.items():
        if lang != "en":
            assert 0.35 < n / totals[lang] < 0.85


def test_stratified_sample_keeps_everything_at_fraction_one(spark):
    d = _docs(spark)
    kept = curate.stratified_sample(d, fractions={}, default_frac=1.0)
    assert kept.count() == d.count()


def test_curate_corpus_rule_precedence(spark):
    """duplicate > lang_filtered > low_quality > kept; the duplicate
    rule keeps the LOWEST doc_id of each content group."""
    good = " ".join([f"w{i}" for i in range(90)]
                    + ["the", "of", "and", "to", "in",
                       "is", "on", "for", "with", "a"])
    rows = [
        (1, "en", good),
        (2, "en", good),
        (3, "zh", good),
        (4, "zh", "unique doc in a filtered language " * 5),
        (5, "en", "tiny"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.doc_id: (r.reason, r.keep)
           for r in curate.curate_corpus(docs).collect()}
    assert got[1][0] == "kept" and got[1][1]
    assert got[2] == ("duplicate", False)
    # doc 3 duplicates 1/2's content: duplicate outranks lang_filtered
    assert got[3] == ("duplicate", False)
    assert got[4] == ("lang_filtered", False)
    assert got[5] == ("low_quality", False)


def test_curate_corpus_zero_token_doc_is_low_quality(spark):
    """0/0 token ratios must not NULL-propagate into 'kept'."""
    docs = spark.createDataFrame(
        [(1, "en", "!!! ??? ...")], "doc_id long, lang string, text string"
    )
    row = curate.curate_corpus(docs).collect()[0]
    assert row.reason == "low_quality" and not row.keep
    assert row.quality_score == 0.0


def test_hex_threshold_boundaries():
    from fractions import Fraction

    assert curate.hex_threshold(0) == "00000000"
    assert curate.hex_threshold(1.0) == "g"      # sorts above any hex
    assert curate.hex_threshold(Fraction(2)) == "g"
    assert curate.hex_threshold(0.5) == "80000000"
    # exact vs float cumulative boundary agree for the shipped weights
    assert curate.hex_threshold(Fraction("0.8") + Fraction("0.1")) == \
        curate.hex_threshold(0.9)


def test_redact_mentions_collapses_entities(spark):
    corpus = A.corpus_tokens_df(spark)
    red = {r.sent_id: r.redacted
           for r in A.redact_mentions(corpus).collect()}
    toks = corpus.orderBy("sent_id", "idx").collect()
    by_sent: dict[int, list] = {}
    for t in toks:
        by_sent.setdefault(t.sent_id, []).append(t)
    assert set(red) == set(by_sent)
    for sid, seq in by_sent.items():
        out = red[sid]
        # every B- entity shows up as its [CATEGORY] placeholder
        for t in seq:
            if t.tag.startswith("B-"):
                assert f"[{t.tag[2:]}]" in out
        # no word of a B-started run leaks through
        in_entity = False
        for t in seq:
            if t.tag.startswith("B-"):
                in_entity = True
                assert t.word not in out.split() or any(
                    u.tag == "O" and u.word == t.word for u in seq
                )
            elif t.tag.startswith("I-") and in_entity:
                pass
            else:
                in_entity = False
        # O tokens are preserved in order
        o_words = [t.word for t in seq if t.tag == "O"]
        stream = out.split()
        it = iter(stream)
        assert all(w in it for w in o_words)


def test_kmv_distinct_exact_below_k(spark):
    # fewer than k distinct contents → the sketch degrades to the
    # exact count; duplicate rows collapse through the hash distinct
    rows = [(1, "en", "alpha"), (2, "en", "beta"), (3, "en", "alpha"),
            (4, "de", "gamma")]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["lang"]: r for r in curate.kmv_distinct(docs, k=64).collect()}
    assert out["en"]["n_sketch"] == 2 and out["en"]["kmv_est_q"] == 2
    assert out["de"]["n_sketch"] == 1 and out["de"]["kmv_est_q"] == 1


def test_kmv_distinct_estimator_matches_hand_computation(spark):
    # ≥ k distinct contents → est = (k−1)·2^60 / h_k with h_k the k-th
    # smallest 60-bit md5 prefix, recomputed here with hashlib; the
    # estimate must also land within a loose band of the truth and be
    # invariant under row duplication
    import hashlib

    k, n = 16, 300
    texts = [f"document body {i}" for i in range(n)]
    rows = [(i, "en", t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = curate.kmv_distinct(docs, k=k).collect()[0]
    hs = sorted(int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                for t in texts)
    expect = int((k - 1) * float(16 ** 15) / float(hs[k - 1]) + 0.5)
    assert got["n_sketch"] == k
    assert got["kmv_est_q"] == expect
    assert n / 3 <= got["kmv_est_q"] <= n * 3
    doubled = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(10_000)))
    again = curate.kmv_distinct(doubled, k=k).collect()[0]
    assert again["kmv_est_q"] == expect


def test_leakage_safe_split_moves_clusters_together(spark):
    # two near-identical docs (one token differs out of 12) that plain
    # dataset_split would assign independently must land in the SAME
    # split; the unrelated singleton keeps its plain-split assignment
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    rows = [(1, "en", base + " mu"),
            (2, "en", base + " nu"),
            (3, "en", "completely different text about other things")]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["doc_id"]: r for r in curate.leakage_safe_split(docs).collect()}
    assert out[1]["cluster_id"] == out[2]["cluster_id"] == 1
    assert out[1]["split"] == out[2]["split"]
    plain = {r["doc_id"]: r["split"]
             for r in curate.dataset_split(docs).collect()}
    assert out[3]["cluster_id"] == 3
    assert out[3]["split"] == plain[3]
    # the cluster's split is the canonical doc's plain assignment
    assert out[1]["split"] == plain[1]


def test_materialize_clusters_staged_view(spark, tmp_path):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    rows = [(1, "en", base + " mu"),
            (2, "en", base + " nu"),
            (3, "en", "completely different text about other things")]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    path = str(tmp_path / "clusters")
    live = curate.leakage_safe_split(docs)
    staged = curate.materialize_clusters(docs, path)
    expected = sorted(map(tuple, staged.collect()))
    # the committed view IS the cluster relation the live path builds
    from ner_spark.operators.dedup import dedup_clusters
    assert expected == sorted(map(tuple, dedup_clusters(docs).collect()))
    # a second call is a pure scan: no LSH pipeline in the plan
    again = curate.materialize_clusters(docs, path)
    plan = again._jdf.queryExecution().optimizedPlan().toString()
    assert "Relation" in plan and "Generate" not in plan \
        and "Join" not in plan
    # splitting from the committed clusters equals the live recompute
    from_staged = curate.leakage_safe_split(docs, clusters=again)
    assert sorted(map(tuple, from_staged.collect())) == \
        sorted(map(tuple, live.collect()))
    # crash windows: a leftover tmp never shadows the committed view;
    # a torn main dir (no _SUCCESS) is recomputed, never served
    spark.createDataFrame([(9,)], "x long").write.mode(
        "overwrite").parquet(path + ".tmp")
    ok = curate.materialize_clusters(docs, path)
    assert sorted(map(tuple, ok.collect())) == expected
    import shutil
    shutil.rmtree(path)
    (tmp_path / "clusters").mkdir()
    rebuilt = curate.materialize_clusters(docs, path)
    assert sorted(map(tuple, rebuilt.collect())) == expected


def test_contamination_check_flags_shared_ngrams_only(spark):
    # doc 10 quotes 4 consecutive tokens of eval doc 0 (= two distinct
    # 3-gram shingles); doc 11 shares nothing; the eval doc never
    # matches itself
    ev_text = "the quick brown fox jumps over the lazy dog"
    rows = [(0, "en", ev_text),
            (10, "en", "intro words then quick brown fox jumps closing"),
            (11, "en", "entirely unrelated content with no overlap here")]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    ev = docs.where(F.col("doc_id") == 0)
    got = {(r["doc_id"], r["eval_id"]): r["shared_ngrams"]
           for r in curate.contamination_check(docs, ev, min_shared=2)
           .collect()}
    assert got == {(10, 0): 2}
    # raising the threshold above the overlap empties the result
    assert curate.contamination_check(docs, ev, min_shared=3).count() == 0

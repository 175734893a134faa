"""Differential fuzz: the curation operators must match their DuckDB
oracle twins on RANDOM corpora, not just the fixed testdata — empty
texts, punctuation-only docs, cross-language exact duplicates, and
adversarial doc_id orderings are where the rule precedence and the
NULL/zero-token handling can silently diverge."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod  # noqa: E402
from ner_spark.operators import curate  # noqa: E402
from tests.oracle_compare import assert_df_matches_duckdb as _compare  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

LANGS = ("en", "de", "fr", "es", "zh")
WORDS = ("the", "a", "of", "fast", "table", "spark", "x0", "!!", "de", "em")


@st.composite
def corpora(draw):
    n = draw(st.integers(min_value=1, max_value=14))
    docs = []
    for i in range(n):
        lang = draw(st.sampled_from(LANGS))
        text = " ".join(
            draw(st.lists(st.sampled_from(WORDS), min_size=0, max_size=12))
        )
        # sometimes punctuation-only / empty (zero-token path)
        if draw(st.booleans()) and draw(st.booleans()):
            text = draw(st.sampled_from(["", "!!! ???", "...", "  "]))
        docs.append((i, lang, text))
    # force exact duplicates across rows (and possibly across langs)
    for _ in range(draw(st.integers(min_value=0, max_value=3))):
        src = draw(st.integers(min_value=0, max_value=n - 1))
        dst = draw(st.integers(min_value=0, max_value=n - 1))
        if src != dst:
            docs[dst] = (docs[dst][0], docs[dst][1], docs[src][2])
    return docs


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(corpora())
def test_curation_ops_match_oracles_on_random_corpora(spark, docs):
    pdf = pd.DataFrame(docs, columns=["doc_id", "lang", "text"])
    sdf = spark.createDataFrame(pdf.assign(doc_id=pdf.doc_id.astype("int64")))
    con = duckdb.connect()
    try:
        con.register("documents", pdf)
        osql = entrymod.oracle_sql()
        _compare(curate.dataset_split(sdf), con, osql["dataset_split"])
        _compare(
            curate.stratified_sample(
                sdf, fractions={"en": 0.25}, default_frac=0.6
            ),
            con, osql["stratified_sample"],
        )
        dups = sdf.where(F.col("doc_id") % 10 == 0).withColumn(
            "doc_id", F.col("doc_id") + F.lit(1000000)
        )
        _compare(
            curate.curate_corpus(sdf.unionByName(dups)), con,
            osql["curate_corpus"],
        )
        # near-dup-aware split: the MinHash closure + cluster-id hash
        # must agree with the recursive-CTE twin on random corpora
        # (forced exact duplicates above cluster for sure; empty texts
        # exercise the singleton fallback)
        _compare(curate.leakage_safe_split(sdf), con,
                 entrymod._leakage_split_oracle())
        # contamination scan against the doc_id % 97 eval slice (row 0
        # is always eval, so shared-shingle pairs occur whenever a
        # duplicate of it exists); min_shared=1 maximizes pairs
        _compare(
            curate.contamination_check(
                sdf, sdf.where(F.col("doc_id") % 97 == 0), min_shared=1),
            con, entrymod._contamination_oracle(min_shared=1),
        )
        # k=4 so random corpora hit BOTH branches: groups under k
        # distinct hashes (exact fallback) and groups at/over k (the
        # (k−1)·2^60/h_k estimator, FP-identical cross-engine)
        _compare(
            curate.kmv_distinct(sdf, k=4), con,
            entrymod._kmv_oracle(k=4),
        )
    finally:
        con.close()


TAGS = ("O", "B-PER", "I-PER", "B-ORG", "I-ORG", "B-LOC", "I-LOC")


@st.composite
def bio_corpora(draw):
    n_sents = draw(st.integers(min_value=1, max_value=5))
    rows = []
    for sid in range(n_sents):
        n_tok = draw(st.integers(min_value=1, max_value=10))
        for i in range(n_tok):
            # unconstrained tag draws produce orphan I- runs at sentence
            # start / after O and category switches mid-run — exactly
            # the convention edge cases
            rows.append((sid, i, draw(st.sampled_from(WORDS)),
                         draw(st.sampled_from(TAGS))))
    return rows


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(bio_corpora())
def test_redact_mentions_matches_oracle_on_random_bio(spark, rows):
    """Redaction over arbitrary BIO sequences (orphan I-runs, runs at
    sentence boundaries, all-O sentences) must match the SQL twin —
    the same run-start convention gold_bio_spans relies on."""
    from ner_spark.plans.analytics import redact_mentions

    pdf = pd.DataFrame(rows, columns=["sent_id", "idx", "word", "tag"])
    sdf = spark.createDataFrame(
        rows, "sent_id int, idx int, word string, tag string"
    )
    con = duckdb.connect()
    try:
        con.register("bio_fuzz", pdf)
        sql = entrymod._runs_cte("bio_fuzz") + entrymod._REDACT_TAIL
        _compare(redact_mentions(sdf), con, sql)
    finally:
        con.close()

"""Batched kernel ⇔ per-document oracle parity.

The batched cross-document kernel (core/batch.py) must be *exactly*
equal — tags, spans, byte offsets, and float confidences bitwise — to
the per-document kernel (core/pipeline.py) that the goldens pin down.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ner_spark.core.batch import BATCH_MODES, analyze_batch  # noqa: E402
from ner_spark.core.pipeline import analyze  # noqa: E402
from ner_spark.sources.fixtures import fixture_texts  # noqa: E402

TEXTS = [t for _d, t in fixture_texts()]

EDGE_TEXTS = [
    "",
    "   ",
    ".",
    "a",
    "É",
    "São Paulo é linda.",
    "presidente Lula visitou Brasília-DF em 12.345.678/0001-90 hoje",
    "PETROBRAS S.A. anunciou; Dra. Áurea chegou à capital.",
    "word " * 300,  # long doc crossing sub-batch padding
    # length-changing lowercase: "İ".lower() == "i̇" (2 codepoints), so
    # slice-then-lower vs lower-then-slice produce different prefix keys
    "İstanbul İİgür Lula İx",
]


@pytest.mark.parametrize("mode", BATCH_MODES)
def test_fixture_corpus_parity(mode):
    expected = [analyze(t, mode=mode) for t in TEXTS]
    got = analyze_batch(TEXTS, mode=mode)
    assert got == expected


@pytest.mark.parametrize("mode", ("hybrid", "crf_only"))
@pytest.mark.parametrize("tokenizer_mode", ("standard", "aggressive", "conservative", "bpe_lite"))
def test_tokenizer_modes_parity(mode, tokenizer_mode):
    texts = TEXTS[:12] + EDGE_TEXTS
    expected = [analyze(t, mode=mode, tokenizer_mode=tokenizer_mode) for t in texts]
    got = analyze_batch(texts, mode=mode, tokenizer_mode=tokenizer_mode)
    assert got == expected


@pytest.mark.parametrize("mode", BATCH_MODES)
def test_edge_cases_parity(mode):
    expected = [analyze(t, mode=mode) for t in EDGE_TEXTS]
    got = analyze_batch(EDGE_TEXTS, mode=mode)
    assert got == expected


def test_uniquified_docs_parity():
    # the bench corpus shape: fixture texts with unique suffixes
    texts = [f"{t} doc{i}" for i, t in enumerate(TEXTS)]
    expected = [analyze(t) for t in texts]
    assert analyze_batch(texts) == expected


def test_ml_modes_fall_back():
    texts = TEXTS[:3]
    for mode in ("hmm", "max_ent", "perceptron", "span_based"):
        expected = [analyze(t, mode=mode) for t in texts]
        assert analyze_batch(texts, mode=mode) == expected


def test_hypothesis_random_parity():
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    alphabet = st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs"),
        whitelist_characters="ãáéíóúçÃÁÉ-./",
    )

    @given(st.lists(st.text(alphabet=alphabet, max_size=120), max_size=8))
    @settings(max_examples=60, deadline=None)
    def check(texts):
        for mode in ("hybrid", "crf_only"):
            expected = [analyze(t, mode=mode) for t in texts]
            assert analyze_batch(texts, mode=mode) == expected

    check()


def test_rules_batch_parity_edge_cases():
    """apply_rules_batch == per-doc apply_rules on cascade-quirk cases:
    person B/I chains, n-gram inside-overwrites blocking later starts,
    consecutive org indicators, titles at doc edges, CNPJ, and doc
    boundaries between every pair."""
    from ner_spark.core.rules import apply_rules, apply_rules_batch
    from ner_spark.data.gazetteers import default_rule_config

    cfg = default_rule_config()
    docs = [
        [],
        ["Lula"],
        ["Lula", "Silva", "Lula"],                      # B/I person chain
        ["presidente"],                                  # title at doc end
        ["presidente", "Lula"],                          # title + person overlap
        ["presidente", "lula"],                          # title, lowercase next
        ["Banco", "do", "Brasil", "S.A."],               # ngram + org indicator
        ["Acme", "S.A.", "Ltda"],                        # consecutive indicators
        ["12.345.678/0001-95"],                          # CNPJ
        ["Copa", "do", "Mundo", "Copa", "do", "Mundo"],  # back-to-back ngrams
        ["São", "Paulo", "e", "Rio", "de", "Janeiro"],
        ["supremo", "tribunal", "federal"],
    ]
    # every doc also split across boundaries with its neighbor
    want = [apply_rules(ws, cfg) for ws in docs]
    got = apply_rules_batch(docs, cfg)
    assert got == want


def test_rules_batch_parity_fixture_corpus():
    from ner_spark.core.rules import apply_rules, apply_rules_batch
    from ner_spark.core.tokenizer import tokenize
    from ner_spark.data.gazetteers import default_rule_config

    cfg = default_rule_config()
    docs = [[t[0] for t in tokenize(text)] for _d, text in fixture_texts()]
    assert apply_rules_batch(docs, cfg) == [apply_rules(ws, cfg) for ws in docs]


def test_rules_batch_parity_hypothesis():
    pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st

    from ner_spark.core.rules import apply_rules, apply_rules_batch
    from ner_spark.data.gazetteers import default_rule_config

    cfg = default_rule_config()
    pool = [
        "Lula", "lula", "Silva", "Brasil", "São", "Paulo", "presidente",
        "Presidente", "S.A.", "Ltda", "Banco", "do", "Copa", "Mundo",
        "12.345.678/0001-95", "casa", "x", "-", ".", "dr.", "STF",
        "Supremo", "Tribunal", "Federal", "ministra", "Apple",
    ]

    @settings(max_examples=150, deadline=None)
    @given(st.lists(st.lists(st.sampled_from(pool), max_size=12), max_size=5))
    def check(docs):
        assert apply_rules_batch(docs, cfg) == [apply_rules(ws, cfg) for ws in docs]

    check()

"""Per-document NER pipeline: the correctness kernel.

Mirrors the reference orchestration (reference:
ner-core/src/pipeline.rs:194-513) for all 8 algorithm modes × 5
tokenizer modes.  This module is *single-document*; the Spark stage in
:mod:`ner_spark.operators.tag` batches it over Arrow record batches
(memoizing per unique content) and the vectorized fast path in
:mod:`ner_spark.core.crf` does the heavy math in numpy.

Quirks kept:
- rules win over CRF per token in hybrid (pipeline.rs:341-356);
- per-token CRF confidence = softmax over the *accumulated* Viterbi
  scores at that step (pipeline.rs:320-323) — not a true marginal;
- span ``source`` is rewritten to the rule name only in hybrid and only
  if the B- token was rule-tagged (pipeline.rs:373-381); the rules-only
  path leaves ``source="crf"`` (pipeline.rs:298);
- span-based path: span text is the raw byte slice, NOT trimmed
  (pipeline.rs:495), confidence 1.0, overlapping spans allowed.
"""

from __future__ import annotations

import numpy as np

from ner_spark.core import crf
from ner_spark.core.features import extract_features
from ner_spark.core.models import default_models
from ner_spark.core.rules import apply_rules
from ner_spark.core.spans import EntitySpan, tokens_to_spans
from ner_spark.core.tags import TAG_LABELS
from ner_spark.core.tokenizer import Token, tokenize
from ner_spark.data.gazetteers import RuleConfig, default_rule_config

MODES = (
    "hybrid", "rules_only", "crf_only", "features_only",
    "hmm", "max_ent", "perceptron", "span_based",
)

VALID_CATEGORIES = {"PER", "ORG", "LOC", "MISC"}

TaggedToken = tuple[Token, str, float]  # (token, tag_label, confidence)


def analyze(
    text: str,
    mode: str = "hybrid",
    tokenizer_mode: str = "standard",
    cfg: RuleConfig | None = None,
) -> tuple[list[TaggedToken], list[EntitySpan]]:
    if mode not in MODES:
        raise ValueError(f"unknown mode {mode!r}")
    cfg = cfg or default_rule_config()
    tokens = tokenize(text, tokenizer_mode)
    if not tokens:
        return [], []

    if mode in ("hybrid", "rules_only", "crf_only", "features_only"):
        return _analyze_standard(text, tokens, mode, cfg)
    if mode in ("hmm", "max_ent", "perceptron"):
        return _analyze_ml(text, tokens, mode)
    return _analyze_span(text, tokens)


def _analyze_standard(text, tokens, mode, cfg):
    words = [t[0] for t in tokens]

    rule_tags = [None] * len(tokens)
    if mode not in ("crf_only", "features_only"):
        rule_tags = apply_rules(words, cfg)

    if mode in ("rules_only", "features_only"):
        tagged = [
            (tok, rm[0], rm[2]) if rm is not None else (tok, "O", 1.0)
            for tok, rm in zip(tokens, rule_tags)
        ]
        entities = tokens_to_spans(tokens, [t[1] for t in tagged], [t[2] for t in tagged], text)
        return tagged, entities

    fvs = extract_features(words, cfg)
    E = crf.emission_matrix(fvs)
    seq, _best_score, score_table = crf.viterbi_decode(E)
    probs = crf.scores_to_probs(score_table)
    return merge_hybrid(text, tokens, rule_tags, seq, probs, mode)


def merge_hybrid(text, tokens, rule_tags, seq, probs, mode):
    """Fuse rule matches over CRF decode into (tagged, entities) —
    rules win per token in hybrid (pipeline.rs:341-356), and the span
    ``source`` is rewritten to the rule name iff the B- token was
    rule-tagged (pipeline.rs:373-381).  Shared by the per-doc and
    batched kernels so the precedence quirks cannot drift apart."""
    # resolve numpy scalars to Python values in two vectorized calls
    # (per-element ndarray indexing dominates this loop otherwise)
    n = len(tokens)
    seq_l = seq.tolist() if hasattr(seq, "tolist") else list(seq)
    conf_l = probs[np.arange(n), seq_l].tolist() if n else []

    labels = TAG_LABELS
    if mode == "hybrid":
        tagged: list[TaggedToken] = [
            (tok, rt[0], rt[2]) if rt is not None else (tok, labels[s], c)
            for tok, rt, s, c in zip(tokens, rule_tags, seq_l, conf_l)
        ]
    else:
        tagged = [(tok, labels[s], c) for tok, s, c in zip(tokens, seq_l, conf_l)]

    entities = tokens_to_spans(tokens, [t[1] for t in tagged], [t[2] for t in tagged], text)
    if mode == "hybrid":
        entities = [
            span if rule_tags[span[2]] is None
            else span[:7] + (rule_tags[span[2]][1],)
            for span in entities
        ]
    return tagged, entities


def _analyze_ml(text, tokens, mode):
    models = default_models()
    model = {"hmm": "hmm", "max_ent": "maxent", "perceptron": "perceptron"}[mode]
    pred = models[model].predict([t[0] for t in tokens])  # type: ignore[attr-defined]
    tagged = [
        (tok, tag if tag in TAG_LABELS else "O", 1.0)
        for tok, tag in zip(tokens, pred)
    ]
    entities = tokens_to_spans(tokens, [t[1] for t in tagged], [t[2] for t in tagged], text)
    return tagged, entities


def _analyze_span(text, tokens):
    span_model = default_models()["span"]
    spans = span_model.predict([t[0] for t in tokens])  # type: ignore[attr-defined]
    n = len(tokens)
    tb = text.encode("utf-8")

    # First non-overlapping layer projected back to BIO (pipeline.rs:446-473).
    tags = ["O"] * n
    occupied = [False] * n
    for start, end, label in spans:
        if any(occupied[i] for i in range(start, min(end, n))):
            continue
        if label in VALID_CATEGORIES and start < n:
            tags[start] = f"B-{label}"
            occupied[start] = True
            for i in range(start + 1, min(end, n)):
                tags[i] = f"I-{label}"
                occupied[i] = True
    tagged = [(tok, tags[i], 1.0) for i, tok in enumerate(tokens)]

    entities: list[EntitySpan] = []
    for start, end, label in spans:
        if start < n and end <= n:
            start_byte = tokens[start][1]
            end_byte = tokens[end - 1][2]
            cat = label if label in VALID_CATEGORIES else "MISC"
            entities.append(
                (tb[start_byte:end_byte].decode("utf-8"), cat, start, end - 1,
                 start_byte, end_byte, 1.0, "span_model")
            )
    return tagged, entities

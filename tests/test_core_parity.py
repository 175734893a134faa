"""Unit parity tests mirroring the reference's own unit tests
(SURVEY.md §5 inventory; file:line references point to the reference
tests being mirrored)."""

from __future__ import annotations

import numpy as np
import pytest

from ner_spark.core import crf
from ner_spark.core.features import extract_features
from ner_spark.core.models import HmmModel, MaxEntModel, PerceptronModel, SpanModel
from ner_spark.core.pipeline import analyze
from ner_spark.core.rules import apply_rules
from ner_spark.core.spans import bio_to_spans
from ner_spark.core.tags import TAG_INDEX, TAG_LABELS, is_valid_transition
from ner_spark.core.tokenizer import tokenize
from ner_spark.data.gazetteers import RuleConfig, default_rule_config


# --- tokenizer (tokenizer.rs:405-455) --------------------------------------

def test_tokenize_standard_basic():
    assert len(tokenize("Lula ganhou 2022.")) == 4


def test_tokenize_char_level():
    tokens = tokenize("Oi", "char_level")
    assert [t[0] for t in tokens] == ["O", "i"]


def test_tokenize_aggressive():
    texts = [t[0] for t in tokenize("curou-se rapidamente", "aggressive")]
    for expected in ("curou", "-", "se", "rapida", "mente"):
        assert expected in texts


def test_tokenize_conservative():
    texts = [t[0] for t in tokenize("Visitei São Paulo ontem.", "conservative")]
    assert "São Paulo" in texts


def test_tokenize_bpe_lite():
    assert len(tokenize("quem", "bpe_lite")) < 4


def test_tokenize_utf8_byte_offsets():
    text = "São Paulo é ótima"
    tokens = tokenize(text)
    tb = text.encode("utf-8")
    for tok_text, start, end in tokens:
        assert tb[start:end].decode("utf-8") == tok_text
    # "São" is 4 bytes (3 codepoints): next token starts after byte-4 space
    assert tokens[0] == ("São", 0, 4)
    assert tokens[1][1] == 5


def test_tokenize_abbreviation_dot_kept():
    texts = [t[0] for t in tokenize("Dr. Silva chegou.")]
    assert texts[0] == "Dr."


def test_tokenize_number_dot():
    assert [t[0] for t in tokenize("valor 1.234 reais")] == ["valor", "1.234", "reais"]
    # second dot is NOT absorbed (the all-numeric test fails after "1.234")
    assert [t[0] for t in tokenize("1.234.567")] == ["1.234", ".", "567"]


def test_tokenize_leading_hyphen_is_punct():
    # '-' cannot start a token (precedence quirk, tokenizer.rs:327)
    assert [t[0] for t in tokenize("-se foi")] == ["-", "se", "foi"]


# --- features (features.rs:281-332) -----------------------------------------

def test_capitalization_feature():
    words = [t[0] for t in tokenize("Lula é presidente")]
    feats = extract_features(words, None)
    assert feats[0].get("is_capitalized") == 1.0
    assert "is_capitalized" not in feats[1]


def test_prefix_suffix_features():
    feats = extract_features(["Petrobras"], None)
    assert "prefix2=pe" in feats[0]
    assert "suffix3=ras" in feats[0]


def test_context_features():
    words = [t[0] for t in tokenize("o presidente Lula anunciou")]
    feats = extract_features(words, None)
    assert "prev_word=presidente" in feats[2]
    assert "next_word=anunciou" in feats[2]


def test_gazetteer_feature():
    cfg = RuleConfig(gaz_locations=frozenset({"brasília"}))
    feats = extract_features(["Brasília", "é", "bonita"], cfg)
    assert feats[0].get("in_location_gazetteer") == 1.0


# --- tags (tagger.rs:284-332) -----------------------------------------------

def test_tag_labels_and_indices():
    assert TAG_LABELS[0] == "O"
    assert TAG_INDEX["B-PER"] == 1
    assert TAG_INDEX["I-MISC"] == 8
    assert len(set(TAG_INDEX.values())) == 9


def test_valid_transitions():
    assert is_valid_transition(TAG_INDEX["B-PER"], TAG_INDEX["I-PER"])
    assert not is_valid_transition(TAG_INDEX["O"], TAG_INDEX["I-PER"])
    assert not is_valid_transition(TAG_INDEX["B-ORG"], TAG_INDEX["I-PER"])


# --- crf + viterbi (crf.rs:177-206, viterbi.rs:238-297) ---------------------

def test_emission_score_uses_weight():
    # is_capitalized → B-PER carries 2.8 in the hand-tuned model
    E = crf.emission_matrix([{"is_capitalized": 1.0}])
    assert E[0, TAG_INDEX["B-PER"]] == pytest.approx(2.8)


def test_viterbi_prefers_capitalized_as_per():
    # custom weights as in the reference test (viterbi.rs:254-281)
    E = np.zeros((2, 9))
    E[0, TAG_INDEX["B-PER"]] = 5.0
    E[0, TAG_INDEX["O"]] = -3.0
    T = np.zeros((9, 9))
    T[TAG_INDEX["B-PER"], TAG_INDEX["I-PER"]] = 3.0
    seq, _score, _table = crf.viterbi_decode(E, T)
    assert seq[0] == TAG_INDEX["B-PER"]
    assert len(seq) == 2


def test_viterbi_empty():
    seq, score, _ = crf.viterbi_decode(np.zeros((0, 9)))
    assert len(seq) == 0 and score == 0.0


def test_softmax_sums_to_one():
    probs = crf.scores_to_probs(np.array([1.0, 2.0, 3.0, 0.5, -1.0]))
    assert probs.sum() == pytest.approx(1.0)


# --- rules (rule_based.rs:310-363) -------------------------------------------

def test_person_gazetteer_rule():
    cfg = RuleConfig(rule_persons=frozenset({"lula"}))
    words = [t[0] for t in tokenize("Lula ganhou as eleições")]
    matches = apply_rules(words, cfg)
    assert matches[0] is not None and matches[0][0] == "B-PER"


def test_title_pattern_rule():
    cfg = RuleConfig()
    words = [t[0] for t in tokenize("o presidente Lula anunciou medidas")]
    matches = apply_rules(words, cfg)
    assert matches[2] is not None and matches[2][1] == "title_pattern"


def test_org_multiword_rule():
    cfg = RuleConfig(rule_orgs=(("são", "paulo"),))
    words = [t[0] for t in tokenize("o clube São Paulo venceu")]
    matches = apply_rules(words, cfg)
    assert matches[2] is not None and matches[2][0] == "B-ORG"
    assert matches[3] is not None and matches[3][0] == "I-ORG"


# --- models (hmm.rs:238-290, maxent.rs:224-252, perceptron.rs:219-241,
#             span.rs:293-327) ------------------------------------------------

TINY = [("Lula é presidente", "test", [("Lula", "B-PER"), ("é", "O"), ("presidente", "O")])]


def test_hmm_basic_training():
    model = HmmModel()
    model.train(TINY)
    assert "B-PER" in model.all_tags and "O" in model.all_tags
    assert model.predict(["Lula", "é", "presidente"]) == ["B-PER", "O", "O"]


def test_hmm_unknown_word():
    model = HmmModel()
    model.train([("Brasil é lindo", "test",
                  [("Brasil", "B-LOC"), ("é", "O"), ("lindo", "O")])])
    assert len(model.predict(["Japão", "é", "lindo"])) == 3


def test_maxent_simple_learning():
    model = MaxEntModel()
    model.train(
        TINY + [("Dilma foi presidente", "test",
                 [("Dilma", "B-PER"), ("foi", "O"), ("presidente", "O")])],
        20, 0.1, 0.001,
    )
    assert model.predict(["Lula", "foi"])[0] == "B-PER"


def test_perceptron_learning():
    model = PerceptronModel()
    model.train(TINY, 5)
    assert model.predict(["Lula", "é"])[0] == "B-PER"


def test_bio_to_spans():
    spans = bio_to_spans(["O", "B-PER", "I-PER", "O", "B-LOC"])
    assert spans == [(1, 3, "PER"), (4, 5, "LOC")]


def test_span_model_learning():
    model = SpanModel()
    model.train(TINY, 5)
    spans = model.predict(["Lula", "é"])
    assert (0, 1, "PER") in spans


# --- pipeline (pipeline.rs:522-567, doc example pipeline.rs:146-151) ---------

def test_pipeline_basic():
    tagged, entities = analyze(
        "Lula foi eleito presidente do Brasil em 2002 com apoio da Petrobras."
    )
    assert tagged and entities


def test_pipeline_empty():
    tagged, entities = analyze("")
    assert not tagged and not entities


def test_pipeline_rules_only_doc_example():
    # doc-test parity: RulesOnly on "o Brasil venceu." finds "Brasil"
    _tagged, entities = analyze("o Brasil venceu.", mode="rules_only")
    assert entities[0][0] == "Brasil"


def test_pipeline_all_modes_run():
    text = "Paris Hilton viajou para Paris na França."
    for mode in ("hybrid", "rules_only", "crf_only", "features_only",
                 "hmm", "max_ent", "perceptron", "span_based"):
        tagged, _entities = analyze(text, mode=mode)
        assert len(tagged) == len(tokenize(text))


def test_hybrid_finds_gazetteer_entities():
    _tagged, entities = analyze("São Paulo é a maior cidade do Brasil.")
    surfaces = {e[0] for e in entities}
    assert "Brasil" in surfaces


def test_default_config_smoke():
    cfg = default_rule_config()
    # "lula" is NOT in the reference gazetteers (only title_pattern finds it)
    assert "lula" not in cfg.rule_persons
    assert "pelé" in cfg.rule_persons  # manual list, model.rs:326
    assert "tiradentes" in cfg.rule_persons  # corpus-derived
    assert "brasília" in cfg.rule_locations
    assert ("banco", "do", "brasil") in cfg.rule_orgs


def test_tokenize_standard_chunk_fast_path_parity():
    """The space-chunked fast path inside tokenize_standard (alnum
    chunks, word+single-trailing-punct chunks, non-ASCII byte
    accounting) must equal a straight per-char transcription of the
    reference scanner (tokenizer.rs:140-379) — UTF-8 byte offsets —
    on adversarial + random inputs."""
    from ner_spark.core import tokenizer as TK
    from ner_spark.data.gazetteers import ABBREVIATIONS

    A, D, AP, SP, H, O = range(6)
    CLS = TK._ASCII_CLASS

    def ref(text):
        # byte position of each char boundary
        bp = [0]
        for ch in text:
            bp.append(bp[-1] + len(ch.encode("utf-8")))
        tokens, ci, cur, i, n = [], 0, 0, 0, len(text)
        while i < n:
            ch = text[i]
            o = ord(ch)
            c = CLS[o] if o < 128 else TK._char_class(ch)
            if c == A or (c == H and cur):
                if not cur:
                    ci = i
                cur += 1
            elif c == D and cur:
                curtext = text[ci:ci + cur]
                if curtext in ABBREVIATIONS or (
                    curtext.isnumeric() and i + 1 < n and text[i + 1].isnumeric()
                ):
                    cur += 1
                else:
                    tokens.append((curtext, bp[ci], bp[i]))
                    cur = 0
                    tokens.append((".", bp[i], bp[i] + 1))
            elif c == AP:
                if not cur:
                    ci = i
                cur += 1
            elif c == SP:
                if cur:
                    tokens.append((text[ci:ci + cur], bp[ci], bp[i]))
                    cur = 0
            else:
                if cur:
                    tokens.append((text[ci:ci + cur], bp[ci], bp[i]))
                    cur = 0
                tokens.append((ch, bp[i], bp[i + 1]))
            i += 1
        if cur:
            tokens.append((text[ci:ci + cur], bp[ci], bp[n]))
        return tokens

    cases = [
        "", " ", "a b", "Dr. Silva chegou", "3.14 e 1.234.567",
        "a-b -a a- ", "d'agua 'x'", "x  y", " lead", "trail ",
        "a,b c.", "12.345.678/0001-95 ok", "Sr. . ..", "a\tb c",
        "3. 14", "abc.", "A.B.C. fim", "e-mail: a-b@c.d",
        # non-ASCII: multi-byte words, punct tails, curly apostrophe,
        # NBSP tail, guillemets, chunk-interior multi-byte
        "São Paulo fim.", "Amazônia, é lá", "d’água x’ «a» b c",
        "José. Sr. Á celebração", "café-com-leite açaí…",
    ]
    for t in cases:
        assert TK.tokenize_standard(t) == ref(t), repr(t)

    import random

    rng = random.Random(7)
    chars = "abA1 .-'\t,/"
    for _ in range(3000):
        t = "".join(rng.choice(chars) for _ in range(rng.randrange(0, 40)))
        assert TK.tokenize_standard(t) == ref(t), repr(t)

    chars_na = "abA1é São .-'’ «,…"
    for _ in range(3000):
        t = "".join(rng.choice(chars_na) for _ in range(rng.randrange(0, 40)))
        assert TK.tokenize_standard(t) == ref(t), repr(t)

"""Hand-tuned CRF weights.

Data transcription of the reference's heuristic CRF model
(reference: ner-core/src/model.rs:116-276): ~95 emission entries keyed
``(feature_name, tag_label)`` and a 9×9 transition matrix.

The Spark engine never materializes sparse feature maps: only the
feature names that appear here carry nonzero emission weight, so the
tagger builds a dense boolean (tokens × F) presence matrix over exactly
these F feature names and computes emissions as one matmul.
"""

from __future__ import annotations

import numpy as np

from ner_spark.core.tags import N_TAGS, TAG_INDEX, VALID_TRANSITIONS

B_PER, I_PER = "B-PER", "I-PER"
B_ORG, I_ORG = "B-ORG", "I-ORG"
B_LOC, I_LOC = "B-LOC", "I-LOC"
B_MISC, I_MISC = "B-MISC", "I-MISC"
O = "O"

# (feature, tag, weight) — model.rs:125-237
EMISSION_ENTRIES: list[tuple[str, str, float]] = [
    ("is_capitalized", B_PER, 2.8),
    ("is_capitalized", B_ORG, 1.5),
    ("is_capitalized", B_LOC, 1.5),

    ("in_person_gazetteer", B_PER, 5.0),
    ("in_person_gazetteer", I_PER, 4.5),
    ("in_location_gazetteer", B_LOC, 5.0),
    ("in_location_gazetteer", I_LOC, 4.5),
    ("in_org_gazetteer", B_ORG, 5.0),
    ("in_org_gazetteer", I_ORG, 4.5),
    ("in_misc_gazetteer", B_MISC, 5.0),
    ("in_misc_gazetteer", I_MISC, 4.5),

    ("suffix3=nho", B_PER, 1.0),
    ("suffix3=nha", B_PER, 1.0),
    ("suffix2=ão", B_PER, 0.5),
    ("suffix2=ão", B_LOC, 0.5),

    ("prev_word=presidente", B_PER, 2.5),
    ("prev_word=governador", B_PER, 2.5),
    ("prev_word=deputado", B_PER, 2.0),
    ("prev_word=senador", B_PER, 2.0),
    ("prev_word=ministro", B_PER, 2.0),
    ("prev_word=ministra", B_PER, 2.0),
    ("prev_word=jogador", B_PER, 1.8),
    ("prev_word=atleta", B_PER, 1.8),
    ("prev_word=dr", B_PER, 1.8),
    ("prev_word=prof", B_PER, 1.8),
    ("prev_word=general", B_PER, 1.8),
    ("prev_word=escritor", B_PER, 1.5),
    ("prev_word=ator", B_PER, 1.5),
    ("prev_word=cantor", B_PER, 1.5),
    ("prev_word=dom", B_PER, 2.0),
]

# prefix2=lu/ma/jo/an/ca/fe/ro/pe/fa/ri → B-PER 0.3 (model.rs:165-171)
for _p in ("lu", "ma", "jo", "an", "ca", "fe", "ro", "pe", "fa", "ri"):
    EMISSION_ENTRIES.append((f"prefix2={_p}", B_PER, 0.3))

EMISSION_ENTRIES += [
    ("prev_word=ministério", B_ORG, 2.5),
    ("prev_word=instituto", B_ORG, 2.0),
    ("prev_word=tribunal", B_ORG, 2.0),
    ("prev_word=empresa", B_ORG, 1.5),
    ("prev_word=clube", B_ORG, 2.0),
    ("prev_word=equipe", B_ORG, 1.5),
    ("prev_word=banco", B_ORG, 2.0),
    ("prev_word=universidade", B_ORG, 2.0),
    ("prev_word=startup", B_ORG, 2.0),

    ("suffix3=ras", B_ORG, 1.8),
    ("suffix3=ech", B_ORG, 1.2),
    ("suffix4=bank", B_ORG, 2.0),

    ("is_all_caps", B_ORG, 1.5),
    ("is_all_caps", B_MISC, 1.0),

    ("prev_word=cidade", B_LOC, 1.8),
    ("prev_word=estado", B_LOC, 1.8),
    ("prev_word=rio", B_LOC, 2.0),
    ("prev_word=região", B_LOC, 1.5),
    ("prev_word=fronteira", B_LOC, 1.5),
    ("prev_word=município", B_LOC, 2.0),
    ("prev_word=país", B_LOC, 1.8),
    ("prev_word=floresta", B_LOC, 1.5),
    ("prev_word=estádio", B_LOC, 2.0),
    ("prev_word=palácio", B_LOC, 2.0),
    ("prev_word=aeroporto", B_LOC, 2.0),
    ("prev_word=em", B_LOC, 0.8),
    ("prev_word=no", B_LOC, 0.8),
    ("prev_word=na", B_LOC, 0.8),
    ("prev_word=do", B_LOC, 0.5),
    ("prev_word=da", B_LOC, 0.5),

    ("suffix3=lis", B_LOC, 1.2),
    ("suffix4=ília", B_LOC, 1.5),
    ("suffix2=as", B_LOC, 0.4),

    ("prev_word=copa", B_MISC, 2.0),
    ("prev_word=campeonato", B_MISC, 2.0),
    ("prev_word=taxa", B_MISC, 1.5),
    ("prev_word=lei", B_MISC, 1.5),
    ("prev_word=vírus", B_MISC, 1.8),
    ("prev_word=vacina", B_MISC, 1.0),
    ("prev_word=satélite", B_MISC, 1.8),
    ("prev_word=operação", B_MISC, 1.5),
    ("prev_word=fórmula", B_MISC, 2.0),

    ("BOS", O, 0.5),
    ("bias", O, 1.0),
    ("is_punctuation", O, 5.0),
    ("is_digit", O, 2.0),
]


def build_emission_matrix() -> tuple[list[str], np.ndarray]:
    """Return (feature_names, W) where W is (F × 9) float64.

    Feature order: first occurrence in ``EMISSION_ENTRIES`` (stable and
    deterministic); set-once semantics mirror ``CrfModel::set_emission``
    (crf.rs:132-135 — later set of the same key would overwrite; the
    reference never sets a key twice).
    """
    names: list[str] = []
    pos: dict[str, int] = {}
    for feat, _tag, _w in EMISSION_ENTRIES:
        if feat not in pos:
            pos[feat] = len(names)
            names.append(feat)
    W = np.zeros((len(names), N_TAGS), dtype=np.float64)
    for feat, tag, w in EMISSION_ENTRIES:
        W[pos[feat], TAG_INDEX[tag]] = w
    return names, W


def build_transition_matrix() -> np.ndarray:
    """9×9 transition weights T[prev, next] (model.rs:244-273)."""
    T = np.zeros((N_TAGS, N_TAGS), dtype=np.float64)
    # invalid transitions → -8.0
    T[~VALID_TRANSITIONS] = -8.0
    o = TAG_INDEX["O"]
    for cat in ("PER", "ORG", "LOC", "MISC"):
        b = TAG_INDEX[f"B-{cat}"]
        i = TAG_INDEX[f"I-{cat}"]
        T[b, i] = 4.0
        T[i, i] = 3.5
        T[b, o] = 2.0
        T[i, o] = 2.5
        T[o, b] = 1.5
    T[o, o] = 2.5
    return T


FEATURE_NAMES, W_EMIT = build_emission_matrix()
T_TRANS = build_transition_matrix()

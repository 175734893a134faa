"""BIO tag schema: labels, indices, transition validity.

Mirrors the closed 9-tag space of the reference
(reference: ner-core/src/tagger.rs:30-182).  The integer index mapping
must be preserved exactly for CRF weight-matrix compatibility.
"""

from __future__ import annotations

import numpy as np

CATEGORIES = ("PER", "ORG", "LOC", "MISC")

# Index order per reference tagger.rs:111-123.
TAG_LABELS = (
    "O",
    "B-PER", "I-PER",
    "B-ORG", "I-ORG",
    "B-LOC", "I-LOC",
    "B-MISC", "I-MISC",
)
TAG_INDEX = {label: i for i, label in enumerate(TAG_LABELS)}
N_TAGS = len(TAG_LABELS)  # 9

# category per tag index; None for "O"
TAG_CATEGORY = (None, "PER", "PER", "ORG", "ORG", "LOC", "LOC", "MISC", "MISC")
IS_BEGIN = np.array([lbl.startswith("B-") for lbl in TAG_LABELS])
IS_INSIDE = np.array([lbl.startswith("I-") for lbl in TAG_LABELS])


def is_valid_transition(prev_idx: int, next_idx: int) -> bool:
    """BIO validity: I-X only after B-X/I-X of the same category
    (reference: tagger.rs:157-165)."""
    nxt = TAG_LABELS[next_idx]
    if not nxt.startswith("I-"):
        return True
    prv = TAG_LABELS[prev_idx]
    return prv != "O" and TAG_CATEGORY[prev_idx] == TAG_CATEGORY[next_idx]


def valid_transition_matrix() -> np.ndarray:
    """9×9 boolean matrix V[prev, next]."""
    out = np.zeros((N_TAGS, N_TAGS), dtype=bool)
    for p in range(N_TAGS):
        for n in range(N_TAGS):
            out[p, n] = is_valid_transition(p, n)
    return out


VALID_TRANSITIONS = valid_transition_matrix()

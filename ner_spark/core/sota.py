"""GLiNER-style span×class simulator (SOTA 2024 path).

Exact-semantics port of ``simulate_gliner``
(reference: ner-core/src/sota_2024.rs:86-177): enumerate spans up to
``max_span_length`` tokens, embed span text by keyword triggers
(sota_2024.rs:54-70) and classes by name (sota_2024.rs:42-51), score
with the clamped dot product ``min(max(dot, 0)/1.5, 1)``
(sota_2024.rs:73-80) in float32 like the Rust ``f32`` math, keep
scores > threshold, then greedy token-occupancy NMS ordered by score
descending (stable — ties keep span-enumeration order, matching Rust's
stable ``sort_by``; sota_2024.rs:152-174).

Batch note: the per-doc span×class scoring is a (spans × 5) @ (5 ×
classes) matmul; the keyword trigger table is tiny, so span embeddings
are assigned via vectorized substring tests over the joined span texts.
"""

from __future__ import annotations

import numpy as np

from ner_spark.core.tokenizer import Token

_CLASS_EMB = {
    "PESSOA": (0.9, 0.1, 0.2, 0.0, -0.4),
    "PER": (0.9, 0.1, 0.2, 0.0, -0.4),
    "LOCAL": (0.1, 0.9, 0.0, 0.3, 0.1),
    "LOC": (0.1, 0.9, 0.0, 0.3, 0.1),
    "ORGANIZACAO": (0.2, 0.2, 0.8, -0.1, 0.5),
    "ORG": (0.2, 0.2, 0.8, -0.1, 0.5),
    "DATA": (0.0, 0.0, 0.1, 0.9, 0.0),
    "DATE": (0.0, 0.0, 0.1, 0.9, 0.0),
}
_ZERO = (0.0, 0.0, 0.0, 0.0, 0.0)

# (trigger keywords, embedding) in reference if/else priority order
_SPAN_TRIGGERS = (
    (("lula", "silva", "paris hilton"), (0.85, 0.15, 0.1, 0.0, -0.3)),
    (("brasil", "frança", "paris"), (0.15, 0.88, 0.05, 0.2, 0.1)),
    (("apple", "banco", "stf"), (0.1, 0.1, 0.9, 0.0, 0.6)),
    (("ontem", "2024", "março"), (0.05, 0.05, 0.05, 0.95, -0.1)),
)


def get_class_embedding(class_name: str) -> tuple[float, ...]:
    return _CLASS_EMB.get(class_name.upper(), _ZERO)


def get_span_embedding(span_text: str) -> tuple[float, ...]:
    lower = span_text.lower()
    for keywords, emb in _SPAN_TRIGGERS:
        if any(k in lower for k in keywords):
            return emb
    return _ZERO


# SotaPrediction row:
# (text, category, start_token, end_token, start, end, confidence)
SotaPrediction = tuple[str, str, int, int, int, int, float]


def simulate_gliner(
    tokens: list[Token],
    user_classes: list[str],
    threshold: float = 0.5,
    max_span_length: int = 4,
) -> list[SotaPrediction]:
    n = len(tokens)
    if n == 0 or not user_classes:
        return []

    C = np.array([get_class_embedding(c) for c in user_classes], dtype=np.float32)

    # span enumeration in reference order: (i, j) for j in i..min(i+L-1, n-1)
    spans: list[tuple[int, int]] = []
    for i in range(n):
        for j in range(i, min(i + max_span_length - 1, n - 1) + 1):
            spans.append((i, j))

    texts = [" ".join(t[0] for t in tokens[i:j + 1]) for i, j in spans]
    S = np.array([get_span_embedding(t) for t in texts], dtype=np.float32)

    nonzero = np.any(S != 0.0, axis=1)  # zero-embedding skip (sota_2024.rs:126)
    # Triggered spans are sparse, so the scoring loop below only visits
    # them; the dot accumulates in scalar f32 to match Rust's
    # sequential f32 loop rounding exactly.
    preds: list[tuple[float, SotaPrediction]] = []
    for s_idx in np.nonzero(nonzero)[0]:
        i, j = spans[s_idx]
        v1 = S[s_idx]
        for c_idx, cls in enumerate(user_classes):
            # scalar f32 sequential dot (Rust loop parity)
            dot = np.float32(0.0)
            v2 = C[c_idx]
            for k in range(5):
                dot = np.float32(dot + v1[k] * v2[k])
            score = min(max(dot, np.float32(0.0)) / np.float32(1.5), np.float32(1.0))
            if score > threshold:
                preds.append(
                    (float(score),
                     (texts[s_idx], cls, i, j, tokens[i][1], tokens[j][2],
                      float(score)))
                )

    # stable sort by score desc; ties keep enumeration order
    preds.sort(key=lambda p: -p[0])

    final: list[SotaPrediction] = []
    used = [False] * n
    for _score, pred in preds:
        i, j = pred[2], pred[3]
        if any(used[k] for k in range(i, j + 1)):
            continue
        final.append(pred)
        for k in range(i, j + 1):
            used[k] = True
    return final

"""CRF emission scoring + Viterbi decoding (numpy kernels).

The reference scores emissions as sparse dict dot-products and runs a
per-token DP (reference: ner-core/src/crf.rs:88-175,
ner-core/src/viterbi.rs:84-236).  Here the emission step is a dense
matmul over only the ~70 feature names that carry nonzero weight, and
the DP is vectorized over the 9-tag axis; per-doc sequential structure
is inherent to Viterbi.

Tie-breaking parity:
- the inner best-predecessor loop uses strict ``>`` (first max wins,
  viterbi.rs:142-149) → ``np.argmax`` (first max) matches;
- ``best_in_slice`` uses Rust ``max_by`` (LAST max wins on ties,
  viterbi.rs:208-215) → implemented as reversed argmax;
- the −10.0 BIO penalty applies when the *best* predecessor transition
  (chosen ignoring validity) is invalid (viterbi.rs:153-158) — a soft
  constraint, deliberately not a hard mask.
"""

from __future__ import annotations

import numpy as np

from ner_spark.data.crf_weights import FEATURE_NAMES, T_TRANS, W_EMIT
from ner_spark.core.tags import N_TAGS, VALID_TRANSITIONS

FEAT_POS = {name: i for i, name in enumerate(FEATURE_NAMES)}


def emission_matrix(feature_vectors: list[dict[str, float]]) -> np.ndarray:
    """(n_tokens × 9) emission scores (reference crf.rs:166-175)."""
    E = np.zeros((len(feature_vectors), N_TAGS), dtype=np.float64)
    for t, fv in enumerate(feature_vectors):
        for key, val in fv.items():
            j = FEAT_POS.get(key)
            if j is not None:
                E[t] += val * W_EMIT[j]
    return E


def _best_last(scores: np.ndarray) -> int:
    """Index of the max, LAST max winning ties (Rust max_by parity)."""
    return len(scores) - 1 - int(np.argmax(scores[::-1]))


def viterbi_decode(
    E: np.ndarray, T: np.ndarray | None = None
) -> tuple[np.ndarray, float, np.ndarray]:
    """Decode one document.

    Parameters: ``E`` (n_tokens × 9) emission scores; ``T`` optional
    9×9 transition override (defaults to the hand-tuned matrix).
    Returns ``(best_sequence, best_score, score_table)`` where
    ``score_table[i, t]`` is the accumulated Viterbi score at step *i*
    (the reference's ``ViterbiStep.scores``, used downstream for the
    softmax confidence — pipeline.rs:320-323 softmaxes these
    *accumulated* scores, a quirk we keep).
    """
    if T is None:
        T = T_TRANS
    n = E.shape[0]
    if n == 0:
        return np.zeros(0, dtype=np.int64), 0.0, np.zeros((0, N_TAGS))

    score_table = np.empty((n, N_TAGS), dtype=np.float64)
    backptr = np.zeros((n, N_TAGS), dtype=np.int64)

    v = E[0].copy()
    score_table[0] = v
    backptr[0] = np.arange(N_TAGS)

    for i in range(1, n):
        M = v[:, None] + T                 # (prev × next)
        best_prev = np.argmax(M, axis=0)   # first max wins (strict > parity)
        best_prev_score = M[best_prev, np.arange(N_TAGS)]
        invalid = ~VALID_TRANSITIONS[best_prev, np.arange(N_TAGS)]
        v = best_prev_score + E[i] - 10.0 * invalid
        score_table[i] = v
        backptr[i] = best_prev

    last = _best_last(v)
    best_score = float(v[last])
    seq = np.empty(n, dtype=np.int64)
    seq[n - 1] = last
    for i in range(n - 2, -1, -1):
        seq[i] = backptr[i + 1][seq[i + 1]]
    return seq, best_score, score_table


def scores_to_probs(scores: np.ndarray) -> np.ndarray:
    """Max-shifted softmax rows; uniform fallback on zero sum
    (reference viterbi.rs:225-236).  Accepts (…, 9) arrays.

    After the max shift every row contains exp(0) = 1, so ``sums`` is
    ≥ 1 for every non-empty row and the zero-sum fallback is
    unreachable on finite input — the hot path therefore skips the
    full-size ``uniform`` allocation and the double ``where`` pass
    (bitwise-identical division), keeping the reference fallback only
    behind a cheap guard."""
    if scores.size == 0:
        return scores
    shifted = scores - scores.max(axis=-1, keepdims=True)
    exps = np.exp(shifted, out=shifted)
    sums = exps.sum(axis=-1, keepdims=True)
    if sums.all():  # always true on finite input
        return np.divide(exps, sums, out=exps)
    uniform = np.full_like(exps, 1.0 / scores.shape[-1])
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.where(sums == 0.0, uniform, exps / np.where(sums == 0.0, 1.0, sums))

"""Secondary sequence models: HMM, MaxEnt, averaged perceptron, span model.

Trained driver-side on the 41-sentence fixture corpus (it is tiny; a
distributed trainer would be pure overhead) and applied at scale as
broadcast weight tables inside vectorized UDF batches.  The HMM counts
are *also* exposed as a genuine DataFrame training job in
:mod:`ner_spark.plans.analytics` (``hmm_transition_counts`` /
``hmm_emission_counts`` — groupBy counts on the exploded corpus,
DuckDB-oracled) matching these driver-side numbers.

Reference semantics:
- HMM: ner-core/src/hmm.rs:72-235 (add-1 smoothing, log-space, <UNK>).
- MaxEnt: ner-core/src/maxent.rs:60-221 (SGD + L2, weight pruning,
  greedy per-token argmax).
- Perceptron: ner-core/src/perceptron.rs:62-216 (mistake-driven, lazy
  averaging).
- Span model: ner-core/src/span.rs:76-244 (candidate enumeration ≤ 6,
  span features, perceptron-style updates; overlapping predictions
  allowed).

Determinism note: the reference iterates Rust ``HashMap``s whose order
is randomized per process, so its trained float weights are not
bit-reproducible run to run.  We freeze deterministic orders (sorted
tags, insertion-ordered feature dicts) so *our* goldens are stable.
"""

from __future__ import annotations

import math

import numpy as np

from ner_spark.core.features import extract_features
from ner_spark.core.spans import bio_to_spans
from ner_spark.data.corpus import CORPUS

Sentence = tuple[str, str, list[tuple[str, str]]]


# ---------------------------------------------------------------------------
# HMM
# ---------------------------------------------------------------------------

class HmmModel:
    def __init__(self) -> None:
        self.transition_probs: dict[tuple[str, str], float] = {}
        self.emission_probs: dict[tuple[str, str], float] = {}
        self.start_probs: dict[str, float] = {}
        self.all_tags: list[str] = []
        self.vocab: set[str] = set()

    def train(self, corpus: list[Sentence]) -> None:
        transition_counts: dict[tuple[str, str], int] = {}
        emission_counts: dict[tuple[str, str], int] = {}
        start_counts: dict[str, int] = {}
        tag_counts: dict[str, int] = {}
        vocab: set[str] = set()
        all_tags: set[str] = set()

        for _text, _domain, annotations in corpus:
            prev_tag: str | None = None
            for i, (word, tag) in enumerate(annotations):
                vocab.add(word)
                all_tags.add(tag)
                tag_counts[tag] = tag_counts.get(tag, 0) + 1
                emission_counts[(tag, word)] = emission_counts.get((tag, word), 0) + 1
                if i == 0:
                    start_counts[tag] = start_counts.get(tag, 0) + 1
                elif prev_tag is not None:
                    key = (prev_tag, tag)
                    transition_counts[key] = transition_counts.get(key, 0) + 1
                prev_tag = tag

        self.vocab = vocab
        self.all_tags = sorted(all_tags)
        vocab_size = float(len(vocab))
        num_tags = float(len(self.all_tags))
        total_starts = float(len(corpus))

        for tag in self.all_tags:
            count = float(start_counts.get(tag, 0))
            self.start_probs[tag] = math.log((count + 1.0) / (total_starts + num_tags))

        for prev in self.all_tags:
            prev_count = float(tag_counts.get(prev, 0))
            for curr in self.all_tags:
                count = float(transition_counts.get((prev, curr), 0))
                self.transition_probs[(prev, curr)] = math.log(
                    (count + 1.0) / (prev_count + num_tags)
                )

        for tag in self.all_tags:
            tag_count = float(tag_counts.get(tag, 0))
            denom = tag_count + vocab_size + 1.0
            for word in self.vocab:
                count = float(emission_counts.get((tag, word), 0))
                self.emission_probs[(tag, word)] = math.log((count + 1.0) / denom)
            self.emission_probs[(tag, "<UNK>")] = math.log(1.0 / denom)

    def to_arrays(self) -> tuple[dict[str, int], np.ndarray, np.ndarray, np.ndarray]:
        """(word→col index incl. <UNK> at -1, start (T,), trans (T×T),
        emit (T×V+1)) for batched numpy decoding."""
        words = sorted(self.vocab)
        word_idx = {w: i for i, w in enumerate(words)}
        T = len(self.all_tags)
        start = np.array([self.start_probs[t] for t in self.all_tags])
        trans = np.array(
            [[self.transition_probs[(p, c)] for c in self.all_tags] for p in self.all_tags]
        )
        emit = np.empty((T, len(words) + 1))
        for ti, tag in enumerate(self.all_tags):
            for w, wi in word_idx.items():
                emit[ti, wi] = self.emission_probs[(tag, w)]
            emit[ti, len(words)] = self.emission_probs[(tag, "<UNK>")]
        return word_idx, start, trans, emit

    def predict(self, tokens: list[str]) -> list[str]:
        """Viterbi decode (hmm.rs:165-235); strict ``>`` tie-breaking
        (first max in sorted-tag order wins)."""
        if not tokens:
            return []
        word_idx, start, trans, emit = self._arrays()
        unk = emit.shape[1] - 1
        cols = np.array([word_idx.get(t, unk) for t in tokens])
        n, T = len(tokens), len(self.all_tags)

        v = start + emit[:, cols[0]]
        backptr = np.zeros((n, T), dtype=np.int64)
        for i in range(1, n):
            M = v[:, None] + trans
            best_prev = np.argmax(M, axis=0)
            v = M[best_prev, np.arange(T)] + emit[:, cols[i]]
            backptr[i] = best_prev

        idx = int(np.argmax(v))
        out = [""] * n
        out[n - 1] = self.all_tags[idx]
        for i in range(n - 1, 0, -1):
            idx = int(backptr[i][idx])
            out[i - 1] = self.all_tags[idx]
        return out

    _cached_arrays = None

    def _arrays(self):
        if self._cached_arrays is None:
            self._cached_arrays = self.to_arrays()
        return self._cached_arrays


# ---------------------------------------------------------------------------
# Shared linear-model helpers
# ---------------------------------------------------------------------------

def _score(weights: dict[tuple[str, str], float], fv: dict[str, float], tag: str) -> float:
    s = 0.0
    for fname, fval in fv.items():
        w = weights.get((fname, tag))
        if w is not None:
            s += w * fval
    return s


def _predict_best(weights, fv, tags: list[str], default: str) -> str:
    best_tag, best = default, -math.inf
    for tag in tags:
        s = _score(weights, fv, tag)
        if s > best:
            best, best_tag = s, tag
    return best_tag


# ---------------------------------------------------------------------------
# MaxEnt
# ---------------------------------------------------------------------------

class MaxEntModel:
    def __init__(self) -> None:
        self.weights: dict[tuple[str, str], float] = {}
        self.tags: list[str] = []

    def train(self, corpus: list[Sentence], iterations: int, learning_rate: float,
              lambda_: float) -> None:
        tag_set = {tag for _t, _d, ann in corpus for _w, tag in ann}
        self.tags = sorted(tag_set)

        # features are deterministic per sentence — extract once, not
        # once per epoch
        per_sentence = [
            (ann, extract_features([w for w, _t in ann], None))
            for _text, _domain, ann in corpus
        ]
        for _epoch in range(iterations):
            for annotations, fvs in per_sentence:
                for i, fv in enumerate(fvs):
                    true_tag = annotations[i][1]
                    scores = {t: _score(self.weights, fv, t) for t in self.tags}
                    probs = self._softmax(scores)
                    for tag_idx, tag in enumerate(self.tags):
                        error = (1.0 if tag == true_tag else 0.0) - probs[tag_idx]
                        if abs(error) > 1e-6:
                            for fname, fval in fv.items():
                                key = (fname, tag)
                                cur = self.weights.get(key, 0.0)
                                new_w = cur + learning_rate * (error * fval - lambda_ * cur)
                                if abs(new_w) > 1e-9:
                                    self.weights[key] = new_w
                                else:
                                    self.weights.pop(key, None)

    def _softmax(self, scores: dict[str, float]) -> list[float]:
        mx = max(scores.values()) if scores else -math.inf
        exps = [math.exp(scores.get(t, 0.0) - mx) for t in self.tags]
        total = sum(exps)
        return [e / total for e in exps]

    def predict(self, tokens: list[str]) -> list[str]:
        fvs = extract_features(list(tokens), None)
        return [_predict_best(self.weights, fv, self.tags, self.tags[0]) for fv in fvs]


# ---------------------------------------------------------------------------
# Averaged Perceptron
# ---------------------------------------------------------------------------

class PerceptronModel:
    def __init__(self) -> None:
        self.weights: dict[tuple[str, str], float] = {}
        self.total_weights: dict[tuple[str, str], float] = {}
        self.last_update: dict[tuple[str, str], int] = {}
        self.steps = 0
        self.tags: list[str] = []

    def train(self, corpus: list[Sentence], iterations: int) -> None:
        tag_set = {tag for _t, _d, ann in corpus for _w, tag in ann}
        self.tags = sorted(tag_set)

        per_sentence = [
            (ann, extract_features([w for w, _t in ann], None))
            for _text, _domain, ann in corpus
        ]
        for _ in range(iterations):
            for annotations, fvs in per_sentence:
                for i, fv in enumerate(fvs):
                    true_tag = annotations[i][1]
                    pred_tag = _predict_best(self.weights, fv, self.tags, self.tags[0])
                    if pred_tag != true_tag:
                        for fname in fv:
                            self._update_feature(fname, true_tag, 1.0)
                            self._update_feature(fname, pred_tag, -1.0)
                    self.steps += 1
        self._finalize()

    def _update_feature(self, fname: str, tag: str, delta: float) -> None:
        key = (fname, tag)
        current = self.weights.get(key, 0.0)
        since = float(self.steps - self.last_update.get(key, 0))
        self.total_weights[key] = self.total_weights.get(key, 0.0) + since * current
        self.last_update[key] = self.steps
        self.weights[key] = current + delta

    def _finalize(self) -> None:
        for key in list(self.weights):
            current = self.weights[key]
            since = float(self.steps - self.last_update.get(key, 0))
            self.total_weights[key] = self.total_weights.get(key, 0.0) + since * current
        if self.steps:
            for key, total in self.total_weights.items():
                self.weights[key] = total / self.steps
        self.total_weights.clear()
        self.last_update.clear()

    def predict(self, tokens: list[str]) -> list[str]:
        fvs = extract_features(list(tokens), None)
        return [_predict_best(self.weights, fv, self.tags, self.tags[0]) for fv in fvs]


# ---------------------------------------------------------------------------
# Span model
# ---------------------------------------------------------------------------

class SpanModel:
    def __init__(self) -> None:
        self.weights: dict[tuple[str, str], float] = {}
        self.tags: list[str] = []
        self.max_span_len = 6

    def _candidates(self, n_tokens: int) -> list[tuple[int, int]]:
        return [
            (start, start + ln)
            for ln in range(1, self.max_span_len + 1)
            for start in range(n_tokens)
            if start + ln <= n_tokens
        ]

    @staticmethod
    def span_features(words: list[str], start: int, end: int) -> dict[str, float]:
        """(span.rs:176-212); gazetteers are empty on this path."""
        fv: dict[str, float] = {
            f"span_first={words[start].lower()}": 1.0,
            f"span_last={words[end - 1].lower()}": 1.0,
        }
        if start > 0:
            fv[f"ctx_prev={words[start - 1].lower()}"] = 1.0
        if end < len(words):
            fv[f"ctx_next={words[end].lower()}"] = 1.0
        fv[f"span_len={end - start}"] = 1.0
        for i in range(start, end):
            fv[f"in_span={words[i].lower()}"] = 1.0
            if words[i] and words[i][0].isupper():
                fv["span_has_cap"] = 1.0
        return fv

    def train(self, corpus: list[Sentence], iterations: int) -> None:
        tag_set = {"O"}
        for _t, _d, annotations in corpus:
            for _w, tag in annotations:
                if tag != "O":
                    tag_set.add(tag[2:] if tag[:2] in ("B-", "I-") else tag)
        self.tags = sorted(tag_set)

        per_sentence = []
        for _text, _domain, annotations in corpus:
            words = [w for w, _t in annotations]
            bio_tags = [t for _w, t in annotations]
            gold = {(s, e): lbl for s, e, lbl in bio_to_spans(bio_tags)}
            cands = [
                (start, end, self.span_features(words, start, end))
                for start, end in self._candidates(len(words))
            ]
            per_sentence.append((gold, cands))

        for _ in range(iterations):
            for gold, cands in per_sentence:
                for start, end, fv in cands:
                    true_label = gold.get((start, end), "O")
                    pred_label = self._predict_single(fv)
                    if pred_label != true_label:
                        for fname in fv:
                            k_t = (fname, true_label)
                            k_p = (fname, pred_label)
                            self.weights[k_t] = self.weights.get(k_t, 0.0) + 1.0
                            self.weights[k_p] = self.weights.get(k_p, 0.0) - 1.0

    def _predict_single(self, fv: dict[str, float]) -> str:
        return _predict_best(self.weights, fv, self.tags, "O")

    def predict(self, tokens: list[str]) -> list[tuple[int, int, str]]:
        """All non-"O" spans, overlaps allowed (span.rs:136-161)."""
        words = list(tokens)
        out = []
        for start, end in self._candidates(len(words)):
            label = self._predict_single(self.span_features(words, start, end))
            if label != "O":
                out.append((start, end, label))
        return out


# ---------------------------------------------------------------------------
# Default trained models (process-cached; training is deterministic)
# ---------------------------------------------------------------------------

_MODELS: dict[str, object] = {}


def default_models() -> dict[str, object]:
    """Train all secondary models on the fixture corpus with the
    reference hyper-parameters (model.rs:66-77): HMM, MaxEnt(10, 0.1,
    0.01), Perceptron(5), SpanModel(5)."""
    if not _MODELS:
        hmm = HmmModel()
        hmm.train(CORPUS)
        maxent = MaxEntModel()
        maxent.train(CORPUS, 10, 0.1, 0.01)
        perceptron = PerceptronModel()
        perceptron.train(CORPUS, 5)
        span = SpanModel()
        span.train(CORPUS, 5)
        _MODELS.update(hmm=hmm, maxent=maxent, perceptron=perceptron, span=span)
    return _MODELS

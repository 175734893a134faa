"""Cross-document batched NER kernel (the Arrow-batch hot path).

The per-document kernel in :mod:`ner_spark.core.pipeline` is the
correctness oracle; this module recomputes the standard modes (hybrid /
crf_only / rules_only / features_only) for a whole Arrow batch of
documents at once, bit-identically:

- feature → emission scoring never materializes feature dicts: only the
  ~78 feature names carrying nonzero CRF weight (data/crf_weights.py)
  are tested, one vectorized pass per feature *kind*, executed in the
  exact insertion order of ``features.extract_for_token`` so the float
  accumulation order — and therefore every emission score — is
  bitwise equal to the per-doc oracle (argmax tie-breaks depend on it);
- Viterbi runs as a padded (batch × len × 9) tensor DP, vectorized over
  the batch axis (reference: ner-core/src/viterbi.rs:84-203; SURVEY
  §2.5 C4 batch plan), sub-batched under a cell budget with docs
  sorted by length so padding waste stays bounded;
- the 7-pass rule cascade runs batched with vocab dedup + sparse
  candidate loops (:func:`ner_spark.core.rules.apply_rules_batch`);
- tokenization and span assembly remain per-document (inherently
  sequential).

The north rule's "no per-row Python" holds at the Spark layer: one
``mapInPandas`` call per Arrow batch lands here, and the math runs as
numpy over the whole batch.
"""

from __future__ import annotations

import numpy as np

from ner_spark.core import crf
from ner_spark.core.pipeline import TaggedToken, analyze, merge_hybrid
from ner_spark.core.rules import apply_rules_batch
from ner_spark.core.spans import EntitySpan, tokens_to_spans
from ner_spark.core.tags import N_TAGS, TAG_LABELS, VALID_TRANSITIONS
from ner_spark.data.crf_weights import FEATURE_NAMES, T_TRANS, W_EMIT
from ner_spark.data.gazetteers import RuleConfig, default_rule_config

BATCH_MODES = ("hybrid", "crf_only", "rules_only", "features_only")

# --------------------------------------------------------------- feature plan
#
# Pass order = dict-insertion order of features.extract_for_token
# (reference: ner-core/src/features.rs:140-279).  Each pass fires at
# most one weighted feature per token, so running passes in this order
# reproduces the oracle's per-token accumulation order exactly.

_PASS_ORDER = (
    "word", "bias", "is_capitalized", "is_all_caps", "is_mixed_case",
    "prefix2", "suffix2", "prefix3", "suffix3", "prefix4", "suffix4",
    "is_digit", "has_hyphen", "has_period", "is_punctuation",
    "is_first", "is_last",
    "prev_word", "prev_is_capitalized", "BOS", "prev2_word",
    "next_word", "next_is_capitalized", "EOS", "next2_word",
    "bigram",
    "in_person_gazetteer", "in_location_gazetteer",
    "in_org_gazetteer", "in_misc_gazetteer",
)

_MAP_KINDS = {
    "word", "prefix2", "suffix2", "prefix3", "suffix3", "prefix4",
    "suffix4", "prev_word", "prev2_word", "next_word", "next2_word",
    "bigram",
}


def _build_plan():
    """(kind → {arg: weight_row}) for map kinds, (flag → weight_row)
    for boolean kinds, in checked pass order."""
    maps: dict[str, dict[str, int]] = {}
    flags: dict[str, int] = {}
    for row, name in enumerate(FEATURE_NAMES):
        if "=" in name:
            kind, arg = name.split("=", 1)
            if kind not in _MAP_KINDS:
                raise ValueError(f"unknown weighted feature kind {kind!r}")
            maps.setdefault(kind, {})[arg] = row
        else:
            if name not in _PASS_ORDER:
                raise ValueError(f"unknown weighted flag {name!r}")
            flags[name] = row
    return maps, flags


_MAPS, _FLAGS = _build_plan()


# the parity-sensitive predicates come from the oracle module itself so
# the two kernels can never drift apart
from ner_spark.core.features import _blen, _first_upper  # noqa: E402


# word-level passes, in oracle order, up to the last pre-positional one
_WORD_PASSES = (
    "word", "bias", "is_capitalized", "is_all_caps", "is_mixed_case",
    "prefix2", "suffix2", "prefix3", "suffix3", "prefix4", "suffix4",
    "is_digit", "has_hyphen", "has_period", "is_punctuation",
)
_GAZ_PASSES = (
    "in_person_gazetteer", "in_location_gazetteer",
    "in_org_gazetteer", "in_misc_gazetteer",
)


def _word_level(vlist: list[str], cfg: RuleConfig | None):
    """Per-unique-word precomputation.

    Returns ``(A, cap, map_rows, gaz_fire)`` where ``A`` (V×9) is the
    running emission sum after the word-level passes — accumulated in
    the oracle's exact pass order so downstream positional adds keep
    the float sequence bitwise identical; ``cap[v]`` = first-char
    uppercase; ``map_rows[kind][v]`` = weight row fired by contextual
    map kind for this word (−1 if none); ``gaz_fire[name][v]`` = bool.
    """
    V = len(vlist)
    lowers = [w.lower() for w in vlist]
    A = np.zeros((V, N_TAGS), dtype=np.float64)

    def add_map(kind: str, keys) -> None:
        table = _MAPS.get(kind)
        if not table:
            return
        get = table.get
        for v, key in enumerate(keys):
            if key is not None:
                r = get(key)
                if r is not None:
                    A[v] += W_EMIT[r]

    def add_flag(name: str, pred) -> None:
        row = _FLAGS.get(name)
        if row is None:
            return
        w_row = W_EMIT[row]
        for v in range(V):
            if pred(v):
                A[v] += w_row

    for kind in _WORD_PASSES:
        if kind == "word":
            add_map("word", lowers)
        elif kind == "bias":
            add_flag("bias", lambda v: True)
        elif kind == "is_capitalized":
            add_flag("is_capitalized", lambda v: _first_upper(vlist[v]))
        elif kind == "is_all_caps":
            add_flag(
                "is_all_caps",
                lambda v: _blen(vlist[v]) > 1
                and all(c.isupper() or not c.isalpha() for c in vlist[v]),
            )
        elif kind == "is_mixed_case":
            add_flag("is_mixed_case", lambda v: any(c.isupper() for c in vlist[v][1:]))
        elif kind in ("prefix2", "prefix3", "prefix4"):
            # slice THEN lowercase (oracle features.py order): for words
            # whose lowercasing changes length ("İ" → "i̇") the two
            # orders produce different keys
            nn = int(kind[-1])
            add_map(kind, [
                vlist[v][:nn].lower() if len(vlist[v]) >= nn else None
                for v in range(V)
            ])
        elif kind in ("suffix2", "suffix3", "suffix4"):
            nn = int(kind[-1])
            add_map(kind, [
                vlist[v][len(vlist[v]) - nn:].lower() if len(vlist[v]) >= nn else None
                for v in range(V)
            ])
        elif kind == "is_digit":
            add_flag("is_digit", lambda v: vlist[v].isnumeric())
        elif kind == "has_hyphen":
            add_flag("has_hyphen", lambda v: "-" in vlist[v])
        elif kind == "has_period":
            add_flag("has_period", lambda v: "." in vlist[v])
        elif kind == "is_punctuation":
            add_flag(
                "is_punctuation",
                lambda v: _blen(vlist[v]) == 1 and not vlist[v][0].isalnum(),
            )

    cap = np.fromiter((_first_upper(w) for w in vlist), dtype=bool, count=V)

    map_rows: dict[str, np.ndarray] = {}
    for kind in ("prev_word", "prev2_word", "next_word", "next2_word"):
        table = _MAPS.get(kind)
        if table:
            get = table.get
            map_rows[kind] = np.fromiter(
                (get(lw, -1) for lw in lowers), dtype=np.int64, count=V
            )

    gaz_fire: dict[str, np.ndarray] = {}
    if cfg is not None:
        for name, gaz in (
            ("in_person_gazetteer", cfg.gaz_persons),
            ("in_location_gazetteer", cfg.gaz_locations),
            ("in_org_gazetteer", cfg.gaz_orgs),
            ("in_misc_gazetteer", cfg.gaz_misc),
        ):
            if name in _FLAGS:
                gaz_fire[name] = np.fromiter(
                    (lowers[v] in gaz or vlist[v] in gaz for v in range(V)),
                    dtype=bool, count=V,
                )
    return A, cap, map_rows, gaz_fire


def _emission_flat(
    doc_words: list[list[str]], cfg: RuleConfig | None
) -> np.ndarray:
    """(total_tokens × 9) emissions for all docs, flattened in doc order.

    Bitwise-identical to stacking ``crf.emission_matrix(
    extract_features(words, cfg))`` per doc: word-level passes are
    precomputed once per unique word (vocab dedup), positional passes
    applied as vectorized masked adds, all in oracle pass order.
    """
    words: list[str] = [w for ws in doc_words for w in ws]
    N = len(words)
    if N == 0:
        return np.zeros((0, N_TAGS), dtype=np.float64)

    # batch vocabulary
    vocab: dict[str, int] = {}
    vlist: list[str] = []
    vid = np.empty(N, dtype=np.int64)
    for t, w in enumerate(words):
        i = vocab.get(w)
        if i is None:
            i = len(vlist)
            vocab[w] = i
            vlist.append(w)
        vid[t] = i

    A, cap, map_rows, gaz_fire = _word_level(vlist, cfg)

    # doc-relative position and doc-length arrays
    lens = np.fromiter((len(ws) for ws in doc_words), dtype=np.int64,
                       count=len(doc_words))
    pos = np.concatenate([np.arange(n) for n in lens]) if len(lens) else np.zeros(0, np.int64)
    last = np.repeat(lens - 1, lens)

    E = A[vid]  # (N × 9) gather; running sums after the word-level passes

    has_prev = pos > 0
    has_prev2 = pos > 1
    has_next = pos < last
    has_next2 = pos < last - 1

    def add_shift_map(kind: str, valid: np.ndarray, shift: int) -> None:
        rows_v = map_rows.get(kind)
        if rows_v is None:
            return
        rows = np.full(N, -1, dtype=np.int64)
        rows[valid] = rows_v[vid[np.nonzero(valid)[0] + shift]]
        hit = rows >= 0
        if hit.any():
            E[hit] += W_EMIT[rows[hit]]

    def add_shift_flag(name: str, valid: np.ndarray, shift: int) -> None:
        row = _FLAGS.get(name)
        if row is None:
            return
        mask = np.zeros(N, dtype=bool)
        idx = np.nonzero(valid)[0]
        mask[idx] = cap[vid[idx + shift]]
        if mask.any():
            E[mask] += W_EMIT[row]

    def add_mask_flag(name: str, mask: np.ndarray) -> None:
        row = _FLAGS.get(name)
        if row is not None and mask.any():
            E[mask] += W_EMIT[row]

    for kind in _PASS_ORDER:
        if kind in _WORD_PASSES:
            continue  # folded into A
        if kind == "is_first":
            add_mask_flag("is_first", pos == 0)
        elif kind == "is_last":
            add_mask_flag("is_last", pos == last)
        elif kind == "prev_word":
            add_shift_map("prev_word", has_prev, -1)
        elif kind == "prev_is_capitalized":
            add_shift_flag("prev_is_capitalized", has_prev, -1)
        elif kind == "BOS":
            add_mask_flag("BOS", pos == 0)
        elif kind == "prev2_word":
            add_shift_map("prev2_word", has_prev2, -2)
        elif kind == "next_word":
            add_shift_map("next_word", has_next, 1)
        elif kind == "next_is_capitalized":
            add_shift_flag("next_is_capitalized", has_next, 1)
        elif kind == "EOS":
            add_mask_flag("EOS", pos == last)
        elif kind == "next2_word":
            add_shift_map("next2_word", has_next2, 2)
        elif kind == "bigram":
            table = _MAPS.get("bigram")
            if table:
                get = table.get
                mid = has_prev & has_next
                idx, rows = [], []
                lowers_tok = None
                lowers_v = [w.lower() for w in vlist]
                for t in np.nonzero(mid)[0]:
                    if lowers_tok is None:
                        lowers_tok = [lowers_v[v] for v in vid]
                    r = get(f"{lowers_tok[t - 1]}_{lowers_tok[t + 1]}")
                    if r is not None:
                        idx.append(t)
                        rows.append(r)
                if idx:
                    np.add.at(E, np.asarray(idx), W_EMIT[np.asarray(rows)])
        elif kind in _GAZ_PASSES:
            fire = gaz_fire.get(kind)
            if fire is not None:
                add_mask_flag(kind, fire[vid])
    return E


# --------------------------------------------------------------- batched DP

def _viterbi_batch(
    E_list: list[np.ndarray], cell_budget: int = 2_000_000
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Per doc: (best_sequence, accumulated score_table).

    Pads docs to the sub-batch max length and runs the DP once per
    sub-batch, vectorized over the batch axis; identical elementwise
    math to :func:`ner_spark.core.crf.viterbi_decode`.
    """
    out: list[tuple[np.ndarray, np.ndarray] | None] = [None] * len(E_list)
    order = sorted(range(len(E_list)), key=lambda d: E_list[d].shape[0])
    T = T_TRANS
    tags = np.arange(N_TAGS)

    start = 0
    while start < len(order):
        # grow the sub-batch while the padded area stays in budget
        end = start + 1
        while end < len(order):
            L = E_list[order[end]].shape[0]
            if (end + 1 - start) * L * N_TAGS > cell_budget:
                break
            end += 1
        sub = order[start:end]
        L = max(E_list[d].shape[0] for d in sub)
        B = len(sub)
        if L == 0:
            for d in sub:
                out[d] = (np.zeros(0, dtype=np.int64), np.zeros((0, N_TAGS)))
            start = end
            continue

        Epad = np.zeros((B, L, N_TAGS), dtype=np.float64)
        lens = np.empty(B, dtype=np.int64)
        for b, d in enumerate(sub):
            n = E_list[d].shape[0]
            lens[b] = n
            Epad[b, :n] = E_list[d]

        score = np.empty((B, L, N_TAGS), dtype=np.float64)
        backptr = np.empty((B, L, N_TAGS), dtype=np.int64)
        v = Epad[:, 0].copy()
        score[:, 0] = v
        backptr[:, 0] = tags

        # (next, prev) layout so the per-step argmax runs over the
        # contiguous last axis; M[b, j, i] = v[b, i] + T[i, j] — same
        # values, same first-max tie rule, ~2× less strided traffic
        Tt = np.ascontiguousarray(T.T)
        bidx = np.arange(B)[:, None]
        for i in range(1, L):
            M = v[:, None, :] + Tt                   # (B, next, prev)
            best_prev = M.argmax(axis=2)             # first max wins
            best_prev_score = M[bidx, tags, best_prev]
            invalid = ~VALID_TRANSITIONS[best_prev, tags]
            v = best_prev_score + Epad[:, i] - 10.0 * invalid
            score[:, i] = v
            backptr[:, i] = best_prev

        # batch backtrack: one (B,) gather per timestep instead of a
        # per-doc per-token Python loop.  Docs shorter than L hold their
        # own last tag until their active range begins (the where-mask
        # keeps cur frozen at lastt while i+1 > n-1), so each doc's
        # slice is exactly its sequential backtrack.
        ar = np.arange(B)
        final_rows = score[ar, np.maximum(lens - 1, 0)]       # (B, 9)
        lastt = N_TAGS - 1 - np.argmax(final_rows[:, ::-1], axis=1)  # last max wins
        seq_full = np.empty((B, L), dtype=np.int64)
        seq_full[ar, np.maximum(lens - 1, 0)] = lastt
        cur = lastt.copy()
        for i in range(L - 2, -1, -1):
            stepped = backptr[ar, i + 1, cur]
            cur = np.where(i + 1 <= lens - 1, stepped, cur)
            seq_full[:, i] = cur

        for b, d in enumerate(sub):
            n = int(lens[b])
            if n == 0:
                out[d] = (np.zeros(0, dtype=np.int64), np.zeros((0, N_TAGS)))
                continue
            out[d] = (seq_full[b, :n], score[b, :n])
        start = end

    return out  # type: ignore[return-value]


# --------------------------------------------------------------- entry point

def analyze_batch(
    texts: list[str],
    mode: str = "hybrid",
    tokenizer_mode: str = "standard",
    cfg: RuleConfig | None = None,
) -> list[tuple[list[TaggedToken], list[EntitySpan]]]:
    """Batched equivalent of ``[analyze(t, mode, tokenizer_mode) for t
    in texts]`` for the standard modes; falls back to the per-doc
    kernel for the ml/span modes."""
    if mode not in BATCH_MODES:
        return [analyze(t, mode=mode, tokenizer_mode=tokenizer_mode) for t in texts]
    cfg = cfg or default_rule_config()

    from ner_spark.core.tokenizer import tokenize

    # NOTE: tokenization stays per-doc scalar deliberately — a
    # vectorized run-based batch scanner was measured 1.0-2.0× SLOWER
    # than this tight per-char loop (numpy per-call overhead on short
    # docs, run-tuple overhead on long ones)
    doc_tokens = [tokenize(t, tokenizer_mode) for t in texts]
    doc_words = [[tok[0] for tok in toks] for toks in doc_tokens]

    doc_rules: list[list] = [[None] * len(ws) for ws in doc_words]
    if mode not in ("crf_only", "features_only"):
        doc_rules = apply_rules_batch(doc_words, cfg)

    results: list[tuple[list[TaggedToken], list[EntitySpan]]] = []

    if mode in ("rules_only", "features_only"):
        for text, tokens, rules in zip(texts, doc_tokens, doc_rules):
            if not tokens:
                results.append(([], []))
                continue
            tagged = [
                (tok, rm[0], rm[2]) if rm is not None else (tok, "O", 1.0)
                for tok, rm in zip(tokens, rules)
            ]
            entities = tokens_to_spans(
                tokens, [t[1] for t in tagged], [t[2] for t in tagged], text
            )
            results.append((tagged, entities))
        return results

    # hybrid / crf_only
    E_flat = _emission_flat(doc_words, cfg)
    E_list: list[np.ndarray] = []
    k = 0
    for ws in doc_words:
        E_list.append(E_flat[k:k + len(ws)])
        k += len(ws)

    decoded = _viterbi_batch(E_list)

    # one softmax over every doc's score table (row-wise math, so
    # batching is exact) instead of one numpy call per doc
    tables = [st for _seq, st in decoded]
    probs_flat = crf.scores_to_probs(
        np.concatenate(tables) if tables else np.zeros((0, N_TAGS))
    )

    k = 0
    for text, tokens, rules, (seq, score_table) in zip(
        texts, doc_tokens, doc_rules, decoded
    ):
        n = score_table.shape[0]
        probs = probs_flat[k:k + n]
        k += n
        if not tokens:
            results.append(([], []))
            continue
        results.append(merge_hybrid(text, tokens, rules, seq, probs, mode))
    return results

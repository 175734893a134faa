"""Rule engine: gazetteer + pattern cascade over one token sequence.

Exact-semantics port of ``RuleEngine::apply``
(reference: ner-core/src/rule_based.rs:108-281), seven ordered passes.
Precedence quirks kept:

- pass 1 (person unigram) marks ``I-PER`` iff the *previous* result is
  already a PER rule match (rule_based.rs:117-125);
- passes 2–4 skip positions already matched, but the n-gram passes
  overwrite the *inside* positions unconditionally (rule_based.rs:166-175);
- pass 6 (org suffix) checks only ``result[i-1]`` and overwrites
  ``result[i]`` even if set by an earlier pass (rule_based.rs:241-266);
- pass 5 guards ``result[i+1]``, pass 7 guards ``result[i]``.

Returns per-token ``None`` or ``(tag_label, rule_name, confidence)``.
"""

from __future__ import annotations

from ner_spark.data.gazetteers import ORG_INDICATORS, PERSON_TITLES, RuleConfig

RuleMatch = tuple[str, str, float]


def _first_upper(s: str) -> bool:
    return bool(s) and s[0].isupper()


def is_cnpj(s: str) -> bool:
    """14 digits plus '.', '/' and '-' present (rule_based.rs:295-301).
    Punctuation membership checked first — same result, skips the
    digit count for the overwhelming majority of tokens."""
    if "/" not in s or "." not in s or "-" not in s:
        return False
    return sum(c.isnumeric() for c in s) == 14


def is_cpf(s: str) -> bool:
    """11 digits plus '.' and '-' (rule_based.rs:305-308; unused by the
    reference's apply pass — kept for API parity)."""
    digits = sum(c.isnumeric() for c in s)
    return digits == 11 and "." in s and "-" in s


def _build_ngram_index(entries: tuple[tuple[str, ...], ...]) -> dict[str, list[tuple[str, ...]]]:
    """first-token → candidate n-grams, preserving priority order."""
    idx: dict[str, list[tuple[str, ...]]] = {}
    for parts in entries:
        idx.setdefault(parts[0], []).append(parts)
    return idx


# keyed on the entry tuples themselves (hashable, content-identity):
# an id(cfg) key would serve a stale index when a new config reuses a
# garbage-collected config's address
_NGRAM_CACHE: dict[tuple, tuple[dict, dict]] = {}


def _ngram_indexes(cfg: RuleConfig) -> tuple[dict, dict]:
    key = (cfg.rule_orgs, cfg.rule_misc)
    if key not in _NGRAM_CACHE:
        if len(_NGRAM_CACHE) > 64:
            _NGRAM_CACHE.clear()
        _NGRAM_CACHE[key] = (_build_ngram_index(cfg.rule_orgs), _build_ngram_index(cfg.rule_misc))
    return _NGRAM_CACHE[key]


# shared result tuples for the batched kernel (code 0 = no match)
_RULE_TUPLES: tuple[RuleMatch | None, ...] = (
    None,
    ("B-PER", "person_gazetteer", 0.92),     # 1
    ("I-PER", "person_gazetteer", 0.92),     # 2
    ("B-LOC", "location_gazetteer", 0.90),   # 3
    ("B-ORG", "org_gazetteer", 0.93),        # 4
    ("I-ORG", "org_gazetteer", 0.93),        # 5
    ("B-MISC", "misc_gazetteer", 0.88),      # 6
    ("I-MISC", "misc_gazetteer", 0.88),      # 7
    ("B-PER", "title_pattern", 0.80),        # 8
    ("B-ORG", "org_suffix_pattern", 0.85),   # 9
    ("I-ORG", "org_suffix_pattern", 0.85),   # 10
    ("B-ORG", "cnpj_pattern", 0.99),         # 11
)


def apply_rules_batch(
    doc_words: list[list[str]], cfg: RuleConfig
) -> list[list[RuleMatch | None]]:
    """Batched rule cascade: identical output to
    ``[apply_rules(ws, cfg) for ws in doc_words]``.

    The per-token work (lowercase + 6 set probes + CNPJ predicate) runs
    once per UNIQUE word in the batch (vocab dedup — the same trick the
    emission kernel uses); the flat token stream then resolves through
    numpy gathers and masks.  The cascade's sequential quirks are
    preserved exactly:

    - pass 1's B/I chain depends only on whether the previous token is
      also a person hit → a shifted mask;
    - passes 3/4 (n-gram) and 6 (org suffix) have in-pass write→read
      dependencies, so they run as ascending Python loops — but ONLY
      over the sparse candidate positions (gazetteer first-tokens /
      org indicators), not over every token;
    - pass 5's iterations are independent (each reads/writes disjoint
      positions).
    """
    import numpy as np

    n_docs = len(doc_words)
    words = [w for ws in doc_words for w in ws]
    N = len(words)
    if N == 0:
        return [[] for _ in doc_words]

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
    V = len(vlist)
    lowers_v = [w.lower() for w in vlist]
    org_index, misc_index = _ngram_indexes(cfg)

    in_person = np.fromiter((lw in cfg.rule_persons for lw in lowers_v), bool, V)
    in_loc = np.fromiter((lw in cfg.rule_locations for lw in lowers_v), bool, V)
    cand_org = np.fromiter((lw in org_index for lw in lowers_v), bool, V)
    cand_misc = np.fromiter((lw in misc_index for lw in lowers_v), bool, V)
    in_title = np.fromiter((lw in PERSON_TITLES for lw in lowers_v), bool, V)
    in_orgind = np.fromiter((lw in ORG_INDICATORS for lw in lowers_v), bool, V)
    cap_v = np.fromiter((_first_upper(w) for w in vlist), bool, V)
    cnpj_v = np.fromiter((is_cnpj(w) for w in vlist), bool, V)

    lens = np.fromiter((len(ws) for ws in doc_words), np.int64, n_docs)
    pos = np.concatenate([np.arange(x) for x in lens])
    last = np.repeat(lens - 1, lens)

    code = np.zeros(N, dtype=np.int8)

    # pass 1: person unigram; I-PER iff the previous token (same doc)
    # is also a person hit — pass 1 runs first, so that is the only way
    # result[i-1] can hold a PER tag at check time
    pf = in_person[vid]
    prev_pf = np.zeros(N, dtype=bool)
    idx = np.nonzero(pos > 0)[0]
    prev_pf[idx] = pf[idx - 1]
    code[pf & ~prev_pf] = 1
    code[pf & prev_pf] = 2

    # pass 2: location unigram on still-unmatched positions
    code[in_loc[vid] & (code == 0)] = 3

    # passes 3/4: n-gram gazetteers — ascending sparse loop so an
    # earlier match's inside-overwrites block later starts, exactly as
    # the oracle's left-to-right scan does
    for index, b_code, i_code, cand_v in (
        (org_index, 4, 5, cand_org),
        (misc_index, 6, 7, cand_misc),
    ):
        for t in np.nonzero(cand_v[vid])[0]:
            if code[t] != 0:
                continue
            room = int(last[t] - pos[t])  # tokens after t in this doc
            for parts in index[lowers_v[vid[t]]]:
                ln = len(parts)
                if ln - 1 <= room and all(
                    lowers_v[vid[t + j]] == parts[j] for j in range(1, ln)
                ):
                    code[t] = b_code
                    code[t + 1:t + ln] = i_code
                    break

    # pass 5: "title X" → X = B-PER (iterations read/write disjoint
    # positions, so order is irrelevant)
    for t in np.nonzero(in_title[vid] & (pos < last))[0]:
        if code[t + 1] == 0 and cap_v[vid[t + 1]]:
            code[t + 1] = 8

    # pass 6: "X <org-indicator>" — ascending sparse loop (an earlier
    # fire's I-ORG write blocks the next indicator's result[i-1] check)
    for t in np.nonzero(in_orgind[vid] & (pos > 0))[0]:
        if code[t - 1] == 0 and cap_v[vid[t - 1]]:
            code[t - 1] = 9
            code[t] = 10

    # pass 7: CNPJ predicate on still-unmatched positions
    code[cnpj_v[vid] & (code == 0)] = 11

    out: list[list[RuleMatch | None]] = []
    k = 0
    for ws in doc_words:
        n = len(ws)
        seg = code[k:k + n]
        res: list[RuleMatch | None] = [None] * n
        for j in np.nonzero(seg)[0]:
            res[j] = _RULE_TUPLES[seg[j]]
        out.append(res)
        k += n
    return out


def apply_rules(words: list[str], cfg: RuleConfig) -> list[RuleMatch | None]:
    n = len(words)
    lowers = [w.lower() for w in words]
    result: list[RuleMatch | None] = [None] * n
    org_index, misc_index = _ngram_indexes(cfg)

    # 1. person gazetteer (unigram), sequential B/I dependency
    for i in range(n):
        if lowers[i] in cfg.rule_persons:
            prev = result[i - 1] if i > 0 else None
            tag = "I-PER" if prev is not None and prev[0] in ("B-PER", "I-PER") else "B-PER"
            result[i] = (tag, "person_gazetteer", 0.92)

    # 2. location gazetteer (unigram)
    for i in range(n):
        if result[i] is None and lowers[i] in cfg.rule_locations:
            result[i] = ("B-LOC", "location_gazetteer", 0.90)

    # 3/4. org + misc n-gram gazetteers (first match in priority order wins)
    for index, cat, rule_name, conf in (
        (org_index, "ORG", "org_gazetteer", 0.93),
        (misc_index, "MISC", "misc_gazetteer", 0.88),
    ):
        for i in range(n):
            if result[i] is not None:
                continue
            for parts in index.get(lowers[i], ()):
                ln = len(parts)
                if i + ln <= n and all(lowers[i + j] == parts[j] for j in range(1, ln)):
                    result[i] = (f"B-{cat}", rule_name, conf)
                    for j in range(1, ln):
                        result[i + j] = (f"I-{cat}", rule_name, conf)
                    break

    # 5. title pattern: "presidente X" → X = B-PER
    for i in range(n - 1):
        if result[i + 1] is None and lowers[i] in PERSON_TITLES and _first_upper(words[i + 1]):
            result[i + 1] = ("B-PER", "title_pattern", 0.80)

    # 6. org indicator: "X S.A." → X = B-ORG, indicator = I-ORG
    for i in range(1, n):
        if lowers[i] in ORG_INDICATORS and result[i - 1] is None and _first_upper(words[i - 1]):
            result[i - 1] = ("B-ORG", "org_suffix_pattern", 0.85)
            result[i] = ("I-ORG", "org_suffix_pattern", 0.85)

    # 7. CNPJ regex-style predicate
    for i in range(n):
        if result[i] is None and is_cnpj(words[i]):
            result[i] = ("B-ORG", "cnpj_pattern", 0.99)

    return result

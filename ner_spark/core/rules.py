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

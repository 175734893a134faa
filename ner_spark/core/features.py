"""Per-token sparse feature extraction.

Exact-semantics port of the reference feature engineering
(reference: ner-core/src/features.rs:140-279).  Used directly for the
driver-side model training (tiny corpus) and as the correctness oracle
for the vectorized batch path in :mod:`ner_spark.core.crf`.

Quirks kept (Rust byte-length checks):
- ``is_all_caps`` requires byte length > 1 (so "É", 2 bytes, qualifies);
- ``is_punctuation`` requires byte length == 1 (ASCII punctuation only);
- prefix/suffix use *char* counts (``chars.len()``), not bytes.
"""

from __future__ import annotations

from ner_spark.data.gazetteers import RuleConfig


def _blen(s: str) -> int:
    return len(s.encode("utf-8"))


def _first_upper(s: str) -> bool:
    return bool(s) and s[0].isupper()


def extract_for_token(words: list[str], i: int, cfg: RuleConfig | None) -> dict[str, float]:
    """Feature dict for token ``i`` of a sentence given as token texts.

    ``cfg=None`` means empty gazetteers (the reference trains/predicts
    its MaxEnt/Perceptron/Span models with ``Gazetteers::new()``;
    maxent.rs:71, perceptron.rs:73, span.rs:92).
    """
    word = words[i]
    lower = word.lower()
    fv: dict[str, float] = {f"word={lower}": 1.0, "bias": 1.0}

    if _first_upper(word):
        fv["is_capitalized"] = 1.0
    if _blen(word) > 1 and all(c.isupper() or not c.isalpha() for c in word):
        fv["is_all_caps"] = 1.0
    if any(c.isupper() for c in word[1:]):
        fv["is_mixed_case"] = 1.0

    n_chars = len(word)
    for n in (2, 3, 4):
        if n_chars >= n:
            fv[f"prefix{n}={word[:n].lower()}"] = 1.0
            fv[f"suffix{n}={word[n_chars - n:].lower()}"] = 1.0

    if word.isnumeric():
        fv["is_digit"] = 1.0
    if "-" in word:
        fv["has_hyphen"] = 1.0
    if "." in word:
        fv["has_period"] = 1.0
    if _blen(word) == 1 and not word[0].isalnum():
        fv["is_punctuation"] = 1.0

    if i == 0:
        fv["is_first"] = 1.0
    if i == len(words) - 1:
        fv["is_last"] = 1.0

    if i > 0:
        prev = words[i - 1]
        fv[f"prev_word={prev.lower()}"] = 1.0
        if _first_upper(prev):
            fv["prev_is_capitalized"] = 1.0
    else:
        fv["BOS"] = 1.0

    if i > 1:
        fv[f"prev2_word={words[i - 2].lower()}"] = 1.0

    if i + 1 < len(words):
        nxt = words[i + 1]
        fv[f"next_word={nxt.lower()}"] = 1.0
        if _first_upper(nxt):
            fv["next_is_capitalized"] = 1.0
    else:
        fv["EOS"] = 1.0

    if i + 2 < len(words):
        fv[f"next2_word={words[i + 2].lower()}"] = 1.0

    if 0 < i < len(words) - 1:
        fv[f"bigram={words[i - 1].lower()}_{words[i + 1].lower()}"] = 1.0

    if cfg is not None:
        if lower in cfg.gaz_persons or word in cfg.gaz_persons:
            fv["in_person_gazetteer"] = 1.0
        if lower in cfg.gaz_locations or word in cfg.gaz_locations:
            fv["in_location_gazetteer"] = 1.0
        if lower in cfg.gaz_orgs or word in cfg.gaz_orgs:
            fv["in_org_gazetteer"] = 1.0
        if lower in cfg.gaz_misc or word in cfg.gaz_misc:
            fv["in_misc_gazetteer"] = 1.0

    return fv


def extract_features(words: list[str], cfg: RuleConfig | None) -> list[dict[str, float]]:
    """Feature dicts for every token (reference features.rs:123-131;
    rayon's data-parallel fan-out is Spark partition parallelism here)."""
    return [extract_for_token(words, i, cfg) for i in range(len(words))]

"""Tokenizers with UTF-8 byte offsets.

Five strategies matching the reference semantics exactly
(reference: ner-core/src/tokenizer.rs:100-379):

- ``standard``      — whitespace/punct split, abbreviation dots kept,
                      ``1.234``-style number dots kept, hyphens kept
                      inside words, apostrophes absorbed.
- ``char_level``    — one token per char (whitespace included).
- ``aggressive``    — standard + clitic/suffix splitting.
- ``conservative``  — standard + compound merging (longest match ≤ 5).
- ``bpe_lite``      — char tokens + 3 passes of fixed pair merges.

All offsets are UTF-8 *byte* offsets into the original text (Rust
``usize`` parity; "São" is 4 bytes / 3 codepoints).  Quirks kept:
a ``-`` cannot start a token (operator precedence in tokenizer.rs:327);
``1.234.567`` splits after the first dotted group (the all-numeric test
fails once a dot is absorbed); the ``is_abbrev && next_is_upper``
branch (tokenizer.rs:350-353) is dead code and intentionally omitted.

Tokens are plain tuples ``(text, start, end)``; the sequential index is
implicit (list position, re-indexed after post-passes like the
reference's ``tokenize_with_mode`` at tokenizer.rs:120-123).
"""

from __future__ import annotations

from ner_spark.data.gazetteers import ABBREVIATIONS, BPE_MERGES, CLITICS, COMPOUNDS, SUFFIXES

Token = tuple[str, int, int]

MODES = ("standard", "char_level", "aggressive", "conservative", "bpe_lite")


def _blen(s: str) -> int:
    return len(s.encode("utf-8"))


def tokenize_standard(text: str) -> list[Token]:
    tokens: list[Token] = []
    cur: list[str] = []
    cur_start = 0

    # (byte_pos, char) pairs, like Rust char_indices over UTF-8.
    positions: list[int] = []
    bpos = 0
    for ch in text:
        positions.append(bpos)
        bpos += len(ch.encode("utf-8"))
    total_bytes = bpos

    def flush(end: int) -> None:
        if cur:
            tokens.append(("".join(cur), cur_start, end))
            cur.clear()

    n = len(text)
    i = 0
    while i < n:
        ch = text[i]
        byte_pos = positions[i]
        if ch.isalnum() or (ch == "-" and cur):
            if not cur:
                cur_start = byte_pos
            cur.append(ch)
        elif ch == "." and cur:
            curtext = "".join(cur)
            is_abbrev = curtext in ABBREVIATIONS
            current_is_num = curtext.isnumeric()
            next_is_num = i + 1 < n and text[i + 1].isnumeric()
            if is_abbrev or (current_is_num and next_is_num):
                cur.append(".")
            else:
                flush(byte_pos)
                tokens.append((".", byte_pos, byte_pos + 1))
        elif ch == "'" or ch == "’":
            if not cur:
                cur_start = byte_pos
            cur.append(ch)
        elif ch.isspace():
            flush(byte_pos)
        else:
            flush(byte_pos)
            ch_len = len(ch.encode("utf-8"))
            tokens.append((ch, byte_pos, byte_pos + ch_len))
        i += 1

    flush(total_bytes)
    return tokens


def tokenize_char_level(text: str) -> list[Token]:
    tokens: list[Token] = []
    bpos = 0
    for ch in text:
        ch_len = len(ch.encode("utf-8"))
        tokens.append((ch, bpos, bpos + ch_len))
        bpos += ch_len
    return tokens


def tokenize_aggressive(text: str) -> list[Token]:
    expanded: list[Token] = []
    for tok_text, start, end in tokenize_standard(text):
        handled = False
        base, sep, clitic = tok_text.rpartition("-")
        if sep and base and ("-" + clitic) in CLITICS:
            base_len = _blen(base)
            expanded.append((base, start, start + base_len))
            expanded.append(("-", start + base_len, start + base_len + 1))
            expanded.append((clitic, start + base_len + 1, end))
            handled = True
        if not handled:
            suffix_handled = False
            if _blen(tok_text) > 6 and tok_text.isalpha():
                for suffix in SUFFIXES:
                    if tok_text.endswith(suffix):
                        stem = tok_text[: len(tok_text) - len(suffix)]
                        stem_blen = _blen(stem)
                        expanded.append((stem, start, start + stem_blen))
                        expanded.append((suffix, start + stem_blen, end))
                        suffix_handled = True
                        break
            if not suffix_handled:
                expanded.append((tok_text, start, end))
    return expanded


def tokenize_conservative(text: str) -> list[Token]:
    standard = tokenize_standard(text)
    if not standard:
        return standard

    tb = text.encode("utf-8")
    merged: list[Token] = []
    i = 0
    n = len(standard)
    while i < n:
        best_match_len = 0
        for window in range(2, 6):
            if i + window > n:
                break
            cand = standard[i : i + window]
            adjacent = all(
                nxt[1] == prv[2]
                or (nxt[1] > prv[2] and not tb[prv[2] : nxt[1]].decode("utf-8").strip())
                for prv, nxt in zip(cand, cand[1:])
            )
            if adjacent:
                combined = " ".join(t[0] for t in cand).lower()
                if combined in COMPOUNDS:
                    best_match_len = window
        if best_match_len > 0:
            first = standard[i]
            last = standard[i + best_match_len - 1]
            merged.append((tb[first[1] : last[2]].decode("utf-8"), first[1], last[2]))
            i += best_match_len
        else:
            merged.append(standard[i])
            i += 1
    return merged


def tokenize_bpe_lite(text: str) -> list[Token]:
    tokens = tokenize_char_level(text)
    for _ in range(3):
        new_tokens: list[Token] = []
        i = 0
        n = len(tokens)
        while i < n:
            if i + 1 < n:
                t1 = tokens[i]
                t2 = tokens[i + 1]
                if t1[2] == t2[1] and (t1[0], t2[0]) in BPE_MERGES:
                    new_tokens.append((t1[0] + t2[0], t1[1], t2[2]))
                    i += 2
                    continue
            new_tokens.append(tokens[i])
            i += 1
        tokens = new_tokens
    return tokens


_DISPATCH = {
    "standard": tokenize_standard,
    "char_level": tokenize_char_level,
    "aggressive": tokenize_aggressive,
    "conservative": tokenize_conservative,
    "bpe_lite": tokenize_bpe_lite,
}


def tokenize(text: str, mode: str = "standard") -> list[Token]:
    """Tokenize with the given mode; token index = list position."""
    try:
        fn = _DISPATCH[mode]
    except KeyError:
        raise ValueError(f"unknown tokenizer mode: {mode!r} (expected one of {MODES})") from None
    return fn(text)

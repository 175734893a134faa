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


# char-class table (ASCII); the scanner below branches on these
_ALNUM, _DOT, _APOS, _SPACE, _HYPHEN, _OTHER = range(6)
_ASCII_CLASS = tuple(
    _ALNUM if chr(c).isalnum()
    else _DOT if c == 0x2E
    else _APOS if c == 0x27
    else _SPACE if chr(c).isspace()
    else _HYPHEN if c == 0x2D
    else _OTHER
    for c in range(128)
)


def _char_class(ch: str) -> int:
    o = ord(ch)
    if o < 128:
        return _ASCII_CLASS[o]
    if ch.isalnum():
        return _ALNUM
    if ch == "’":
        return _APOS
    if ch.isspace():
        return _SPACE
    return _OTHER


def tokenize_standard(text: str) -> list[Token]:
    # Fast path: the scanner's token state NEVER crosses a space (space
    # always flushes), so ANY text — non-ASCII included — decomposes
    # exactly into its space-separated chunks, with the running byte
    # position advanced by each chunk's UTF-8 length.  Pure-alphanumeric
    # chunks — the overwhelming majority of words in natural text — are
    # each one token and emit at C speed (str.isalnum + slice); a chunk
    # that is a word plus ONE trailing punctuation mark ("Paris,",
    # "Inc.", "fim.") short-circuits likewise; only chunks with interior
    # punctuation recurse into the per-char scanner (the dot lookahead
    # agrees — past the chunk end the full text has a space, which is
    # not numeric either way).  Fuzz-tested identical to the scalar
    # scanner below (test_core_parity, ASCII and non-ASCII).
    if " " in text:
        ascii_all = text.isascii()
        tokens: list[Token] = []
        append = tokens.append
        base = 0
        for chunk in text.split(" "):
            if not chunk:
                base += 1
                continue
            clen = len(chunk) if ascii_all else _blen(chunk)
            if chunk.isalnum():
                append((chunk, base, base + clen))
            else:
                head = chunk[:-1]
                last = chunk[-1]
                o = ord(last)
                c = _ASCII_CLASS[o] if o < 128 else _char_class(last)
                if head and c != _ALNUM and head.isalnum():
                    lb = 1 if o < 128 else len(last.encode("utf-8"))
                    if c == _OTHER:
                        append((head, base, base + clen - lb))
                        append((last, base + clen - lb, base + clen))
                    elif c == _DOT:
                        if head in ABBREVIATIONS:
                            append((chunk, base, base + clen))
                        else:
                            append((head, base, base + clen - 1))
                            append((".", base + clen - 1, base + clen))
                    elif c == _SPACE:
                        # a non-" " whitespace char just flushes
                        append((head, base, base + clen - lb))
                    else:
                        # trailing hyphen/apostrophe absorbs
                        append((chunk, base, base + clen))
                else:
                    for t, s, e in tokenize_standard(chunk):
                        append((t, base + s, base + e))
            base += clen + 1
        return tokens
    if text.isascii():
        positions = None
        total_bytes = len(text)
    else:
        import numpy as np

        cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
        lens = 1 + (cp > 0x7F).astype(np.int64) + (cp > 0x7FF) + (cp > 0xFFFF)
        ends = np.cumsum(lens)
        total_bytes = int(ends[-1]) if len(ends) else 0
        positions = np.concatenate(([0], ends[:-1]))

    tokens: list[Token] = []
    append = tokens.append
    cls_ascii = _ASCII_CLASS
    n = len(text)
    ci = 0          # char index where the current token starts
    cur_len = 0     # chars in the current token
    i = 0
    while i < n:
        ch = text[i]
        o = ord(ch)
        c = cls_ascii[o] if o < 128 else _char_class(ch)
        if c == _ALNUM or (c == _HYPHEN and cur_len):
            if not cur_len:
                ci = i
            cur_len += 1
        elif c == _DOT and cur_len:
            curtext = text[ci:ci + cur_len]
            if curtext in ABBREVIATIONS or (
                curtext.isnumeric() and i + 1 < n and text[i + 1].isnumeric()
            ):
                cur_len += 1
            else:
                bp = i if positions is None else int(positions[i])
                append((curtext, ci if positions is None else int(positions[ci]), bp))
                cur_len = 0
                append((".", bp, bp + 1))
        elif c == _APOS:
            if not cur_len:
                ci = i
            cur_len += 1
        elif c == _SPACE:
            if cur_len:
                bp = i if positions is None else int(positions[i])
                append((text[ci:ci + cur_len],
                        ci if positions is None else int(positions[ci]), bp))
                cur_len = 0
        else:
            bp = i if positions is None else int(positions[i])
            if cur_len:
                append((text[ci:ci + cur_len],
                        ci if positions is None else int(positions[ci]), bp))
                cur_len = 0
            ch_blen = 1 if o < 128 else len(ch.encode("utf-8"))
            append((ch, bp, bp + ch_blen))
        i += 1

    if cur_len:
        append((text[ci:ci + cur_len],
                ci if positions is None else int(positions[ci]), total_bytes))
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

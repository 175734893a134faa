"""Text-analysis column expressions for large-scale corpus curation.

All functions build *pure Catalyst expressions* (no Python UDFs) so they
stay inside whole-stage codegen and scale linearly with input: language
ID, quality scoring, token counting and document fingerprinting over the
``documents`` table — the curation layer a 100 TB training-data pipeline
needs in front of the KG stages.

Every expression here has an exact ANSI/DuckDB-SQL twin in
``__spark_entry__.py:oracle_sql`` — keep the two in lockstep (the driver
hash-compares them at sf0.01).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword lists for the language-ID heuristic and
# the stopword-ratio quality feature (order matters only for docs).
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]
PT_STOPWORDS = ["de", "da", "do", "em", "para", "com", "o", "a", "e", "que", "um", "uma"]

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def stable_round(col, scale: int):
    """round(x + 1e-9, scale): the epsilon pushes decimal .5 boundary
    cases (where Spark's HALF_UP-on-binary-double and DuckDB's scaled
    rounding disagree) consistently upward in both engines."""
    return F.round(col + F.lit(1e-9), scale)



def tokens_col(col: Column | str) -> Column:
    """Lowercased word tokens of a text column (regex split, no empties).

    This is the curation-layer tokenizer (throughput-oriented, pure
    Catalyst) — NOT the reference-parity NER tokenizer, which lives in
    :mod:`ner_spark.core.tokenizer` with exact byte-offset semantics.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_SPLIT_RE), lambda x: x != F.lit(""))


def shingles_col(tokens: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a token-array column.

    Guarded against short docs: Spark's ``sequence(1, 0)`` counts *down*,
    so the window index list is only built when ``size(tokens) >= n``.
    """
    size = F.size(tokens)
    idx = F.sequence(F.lit(1), size - (n - 1))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + k) for k in range(n)]
        ),
    )
    return F.when(size >= n, F.array_distinct(gram)).otherwise(
        F.array().cast("array<string>")
    )


def shingle_rows(
    docs,
    n: int = 3,
    id_col: str = "doc_id",
    carry: tuple[str, ...] = (),
    distinct: bool = True,
):
    """Exploded word n-gram shingles: one row per (doc, shingle).

    Tokenizes each doc exactly ONCE (``posexplode`` of the token array)
    and assembles shingles with window ``lead`` — unlike
    :func:`shingles_col`, whose lambda-bound ``element_at`` references
    re-evaluate the tokenize expression per shingle element (higher-
    order functions are interpreted, no codegen CSE: ~3n regex splits
    per doc).  One shuffle on ``id_col``; at 100 TB that partition key
    is the natural doc-locality key, so the window is cheap.

    Returns columns (id_col, *carry, g).
    """
    from pyspark.sql import Window

    ex = docs.select(
        id_col, *carry, F.posexplode(tokens_col("text")).alias("idx", "tok")
    )
    w = Window.partitionBy(id_col).orderBy("idx")
    leads = [F.col("tok").alias("t0")] + [
        F.lead("tok", k).over(w).alias(f"t{k}") for k in range(1, n)
    ]
    sh = ex.select(id_col, *carry, *leads).where(F.col(f"t{n-1}").isNotNull())
    out = sh.select(
        id_col, *carry,
        F.concat_ws(" ", *[f"t{k}" for k in range(n)]).alias("g"),
    )
    if distinct:
        out = out.dropDuplicates([id_col, "g"])
    return out


def stopword_hits(tokens: Column, words: list[str]) -> Column:
    """Number of token occurrences that are in ``words`` (with repeats)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def lang_id_col(tokens: Column) -> Column:
    """Stopword-vote language ID: 'en' / 'pt' / 'und'."""
    en = stopword_hits(tokens, EN_STOPWORDS)
    pt = stopword_hits(tokens, PT_STOPWORDS)
    return (
        F.when(en > pt, F.lit("en"))
        .when(pt > en, F.lit("pt"))
        .otherwise(F.lit("und"))
    )


def quality_score(n_tokens: Column, distinct_ratio: Column, stop_ratio: Column) -> Column:
    """Deterministic doc-quality score in [0, 1]: length saturation +
    lexical diversity + stopword naturalness, rounded for hash parity."""
    length_part = F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0))
    return stable_round(0.4 * length_part + 0.3 * distinct_ratio + 0.3 * stop_ratio, 4)


def minhash_cols(shingles: Column, salts: list[str]) -> list[Column]:
    """MinHash-style fingerprint: per salt, the min md5 of salted
    shingles. One aggregate-free expression per salt (array min)."""
    out = []
    for s in salts:
        hashed = F.transform(shingles, lambda g: F.md5(F.concat(F.lit(s + "|"), g)))
        out.append(F.array_min(hashed).alias(f"mh_{s}"))
    return out

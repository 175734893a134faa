"""Stage 1 — tokenize + tag + span assembly: source table → mentions.

Spark mapping of the reference's per-document pipeline
(reference: ner-core/src/pipeline.rs:194-391) as a ``mapInPandas``
stage: Arrow batches of ``content`` strings are processed with the
numpy kernels from :mod:`ner_spark.core`; one output row per entity
mention.

Scale design:
- *No shuffle*: the stage is a pure narrow map over the source scan;
  Catalyst prunes the scan to the 4 referenced columns.
- *Batch dedup + worker-local memo*: identical ``content`` values are
  analyzed once per worker (exact-dup content is common in web/code
  corpora; the fixture table replicates 51 texts).  Bounded cache.
- *Integrity*: recomputes sha256(content) per row and compares against
  ``content_sha256`` (north-rule per-row invariant), emitted as
  ``sha_ok`` and aggregated into the metrics table.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ner_spark.schemas import MENTIONS_SCHEMA, TAGGED_TOKENS_SCHEMA

_MEMO_MAX = 200_000

# _BatchMemo sizing: the cached analysis payload (token tuples + tags +
# spans) is ≈60 bytes per content character, so capping the cached
# *content* characters at 4M bounds the worker cache near 256 MB.
_MEMO_MAX_CHARS = 4_000_000
_MEMO_WARMUP_ROWS = 5_000
_MEMO_MIN_RATIO = 1.05


class _BatchMemo:
    """Worker-local analysis cache keyed by content sha256.

    Bounded by total cached content characters (a stable proxy for the
    result payload — see ``_MEMO_MAX_CHARS``) instead of entry count:
    an entry-count cap over unique ~KB documents could grow to
    multiple GB per worker.  The memo also disables itself when the
    stream turns out to be mostly unique (observed rows/analyzed ratio
    below ``min_ratio`` after ``warmup_rows``): caching then buys
    nothing and only costs memory.  Batch-level dedup stays on always.
    """

    def __init__(self, enabled: bool = True, max_chars: int = _MEMO_MAX_CHARS,
                 warmup_rows: int = _MEMO_WARMUP_ROWS,
                 min_ratio: float = _MEMO_MIN_RATIO) -> None:
        self.enabled = enabled
        self.max_chars = max_chars
        self.warmup_rows = warmup_rows
        self.min_ratio = min_ratio
        self.rows = 0
        self.analyzed = 0
        self._memo: dict[str, Any] = {}
        self._chars = 0

    @property
    def cached_chars(self) -> int:
        return self._chars

    @property
    def cached_entries(self) -> int:
        return len(self._memo)

    def process(self, keys: list[str], contents: list[str], analyze_fn):
        """Analyze the batch's unseen unique contents; return a dict
        covering every key in ``keys`` (aligned with ``contents``)."""
        use = self.enabled and (
            self.rows < self.warmup_rows
            or self.rows >= self.min_ratio * max(self.analyzed, 1)
        )
        if not use and self._memo:
            self._memo.clear()
            self._chars = 0
        seen: set[str] = set()
        todo_k: list[str] = []
        todo_c: list[str] = []
        for k, c in zip(keys, contents):
            if k in self._memo or k in seen:
                continue
            seen.add(k)
            todo_k.append(k)
            todo_c.append(c)
        out = dict(zip(todo_k, analyze_fn(todo_c)))
        self.rows += len(keys)
        self.analyzed += len(todo_k)
        if not use:
            return out
        self._memo.update(out)
        self._chars += sum(len(c) for c in todo_c)
        if self._chars > self.max_chars:
            # serve this batch from a (shallow) copy, then evict
            lookup = dict(self._memo)
            self._memo.clear()
            self._chars = 0
            return lookup
        return self._memo


def _analyze_cached(memo: dict, text: str, mode: str, tokenizer_mode: str):
    key = (text, mode, tokenizer_mode)
    hit = memo.get(key)
    if hit is None:
        # imports inside the task so the driver process stays light
        from ner_spark.core.pipeline import analyze

        if len(memo) >= _MEMO_MAX:
            memo.clear()
        hit = analyze(text, mode=mode, tokenizer_mode=tokenizer_mode)
        memo[key] = hit
    return hit


def extract_mentions(
    source: DataFrame,
    mode: str = "hybrid",
    tokenizer_mode: str = "standard",
    memoize: bool = True,
) -> DataFrame:
    """source(repo, path, commit, lang, content[, content_sha256]) → mentions."""
    has_sha = "content_sha256" in source.columns
    cols = ["repo", "path", "commit", "content"] + (["content_sha256"] if has_sha else [])
    narrow = source.select(*cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ner_spark.core.batch import analyze_batch

        # batched kernel over each batch's UNIQUE contents (exact-dup
        # content is common in web/code corpora) + a byte-bounded,
        # adaptively-disabled worker memo for cross-batch repeats.
        # Keys are the RECOMPUTED sha256 (needed for sha_ok anyway):
        # small fixed-size keys instead of full document texts, and no
        # aliasing through a corrupted content_sha256 column.
        memo = _BatchMemo(enabled=memoize)
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in MENTIONS_SCHEMA.fields}
            contents = pdf["content"].tolist()
            shas = pdf["content_sha256"].tolist() if has_sha else [None] * len(pdf)
            repos = pdf["repo"].tolist()
            paths = pdf["path"].tolist()
            commits = pdf["commit"].tolist()

            real_shas = [
                None if c is None
                else hashlib.sha256(c.encode("utf-8")).hexdigest()
                for c in contents
            ]
            keys = [k for k in real_shas if k is not None]
            nonnull = [c for c in contents if c is not None]
            lookup = memo.process(
                keys, nonnull,
                lambda cs: analyze_batch(cs, mode=mode, tokenizer_mode=tokenizer_mode),
            )

            for repo, path, commit, content, sha, real in zip(
                repos, paths, commits, contents, shas, real_shas
            ):
                if content is None:
                    continue
                tagged, entities = lookup[real]
                sha_ok = None if sha is None else real == sha
                n = len(tagged)
                for text, cat, st, et, sb, eb, conf, src in entities:
                    out["repo"].append(repo)
                    out["path"].append(path)
                    out["commit"].append(commit)
                    out["content_sha256"].append(sha)
                    out["sha_ok"].append(sha_ok)
                    out["mention_text"].append(text)
                    out["category"].append(cat)
                    out["start_token"].append(st)
                    out["end_token"].append(et)
                    out["start"].append(sb)
                    out["end"].append(eb)
                    out["confidence"].append(conf)
                    out["source"].append(src)
                    # ±3-token lowercased context (reference ned.rs:49-51)
                    lo = max(st - 3, 0)
                    hi = min(et + 3, n - 1)
                    out["context_window"].append(
                        [tagged[i][0][0].lower() for i in range(lo, hi + 1)]
                    )
            # skip all-empty batches: an empty pandas frame gets float64
            # dtypes that Arrow cannot convert to list<string>
            if out["repo"]:
                yield pd.DataFrame(out)

    return narrow.mapInPandas(run, schema=MENTIONS_SCHEMA)


def tag_tokens(
    source: DataFrame,
    mode: str = "hybrid",
    tokenizer_mode: str = "standard",
    debug_features: bool = False,
    top_k_features: int = 10,
) -> DataFrame:
    """Per-token tagging output (debug/inspection surface).

    ``debug_features=True`` adds a ``top_features`` column — the top-k
    feature attributions per token as "name=value" strings (parity with
    the reference's FeaturesComputed event, ner-core/src/pipeline.rs:
    236-242).  The reference sorts a HashMap by value, so its tie order
    is nondeterministic; here ties break on feature name for a stable
    output.  Debug path only — it runs the per-doc oracle feature
    extractor, not the vectorized kernel.
    """
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    schema = TAGGED_TOKENS_SCHEMA
    if debug_features:
        schema = StructType(
            list(TAGGED_TOKENS_SCHEMA.fields)
            + [StructField("top_features", ArrayType(StringType()))]
        )
    narrow = source.select("repo", "path", "content")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if debug_features:
            from ner_spark.core.features import extract_features
            from ner_spark.data.gazetteers import default_rule_config

            cfg = default_rule_config()
        memo: dict[Any, Any] = {}
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in schema.fields}
            for repo, path, content in zip(pdf["repo"], pdf["path"], pdf["content"]):
                if content is None:
                    continue
                tagged, _entities = _analyze_cached(memo, content, mode, tokenizer_mode)
                if debug_features:
                    fvs = extract_features([t[0][0] for t in tagged], cfg)
                for i, ((text, start, end), tag, conf) in enumerate(tagged):
                    out["repo"].append(repo)
                    out["path"].append(path)
                    out["token_index"].append(i)
                    out["token_text"].append(text)
                    out["start"].append(start)
                    out["end"].append(end)
                    out["tag"].append(tag)
                    out["confidence"].append(conf)
                    if debug_features:
                        top = sorted(
                            fvs[i].items(), key=lambda kv: (-kv[1], kv[0])
                        )[:top_k_features]
                        out["top_features"].append(
                            [f"{k}={v:g}" for k, v in top]
                        )
            yield pd.DataFrame(out)

    return narrow.mapInPandas(run, schema=schema)


def sha_integrity(mentions: DataFrame) -> DataFrame:
    """Aggregate per-row sha256 equality to one boolean per (repo, path).

    Only covers files that produced at least one mention — use
    :func:`sha_check` on the SOURCE table for the full per-row
    invariant (a corrupted file with zero entities has no mentions
    row)."""
    return mentions.groupBy("repo", "path").agg(
        F.min(F.coalesce(F.col("sha_ok"), F.lit(True))).alias("content_sha_ok")
    )


def sha_check(source: DataFrame) -> DataFrame:
    """Per-row integrity over the FULL source table (north-rule
    invariant: sha256(content) equality for every row, including
    documents that yield no mentions).  Pure Catalyst — one narrow
    scan, no Python."""
    return source.select(
        "repo", "path",
        (F.sha2("content", 256) == F.col("content_sha256")).alias("sha_ok"),
    )

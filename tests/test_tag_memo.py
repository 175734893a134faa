"""Bounds tests for the tag-stage worker memo (operators.tag._BatchMemo):
cached bytes stay under the cap on large unique documents, the memo
disables itself on mostly-unique streams, and repeats still hit."""

from __future__ import annotations

from ner_spark.operators.tag import _BatchMemo


def _analyze_stub(calls):
    def fn(contents):
        calls.append(list(contents))
        return [("tagged", c[:8]) for c in contents]

    return fn


def test_memo_bounded_on_large_unique_docs():
    calls: list = []
    memo = _BatchMemo(enabled=True, max_chars=100_000, warmup_rows=10**9)
    big = "x" * 10_000
    for b in range(50):  # 50 batches × 4 unique 10KB docs = 2 MB of content
        contents = [f"{big}-{b}-{i}" for i in range(4)]
        keys = [f"sha-{b}-{i}" for i in range(4)]
        lookup = memo.process(keys, contents, _analyze_stub(calls))
        assert all(k in lookup for k in keys)
        # the cache never holds more than the cap (+ one batch of slack)
        assert memo.cached_chars <= 100_000 + 4 * 10_010
    # entry-count stays bounded too (old cap was 200k ENTRIES — unbounded bytes)
    assert memo.cached_entries <= 100_000 // 10_000 + 4


def test_memo_disables_on_unique_stream():
    calls: list = []
    memo = _BatchMemo(enabled=True, max_chars=10**9, warmup_rows=100,
                      min_ratio=1.05)
    # past warmup with every row unique → ratio 1.0 < 1.05 → memo off
    for b in range(30):
        contents = [f"doc-{b}-{i}" for i in range(10)]
        keys = [f"sha-{b}-{i}" for i in range(10)]
        memo.process(keys, contents, _analyze_stub(calls))
    assert memo.cached_entries == 0
    assert memo.cached_chars == 0


def test_memo_hits_on_repeats():
    calls: list = []
    memo = _BatchMemo(enabled=True)
    contents = [f"doc-{i % 3}" for i in range(12)]  # 3 unique, 4× each
    keys = [f"sha-{i % 3}" for i in range(12)]
    lookup = memo.process(keys, contents, _analyze_stub(calls))
    assert len(calls[0]) == 3  # batch-level dedup
    lookup2 = memo.process(keys, contents, _analyze_stub(calls))
    assert calls[1] == []  # cross-batch: everything served from cache
    assert lookup2["sha-0"] == lookup["sha-0"]


def test_memo_disabled_still_dedups_batch():
    calls: list = []
    memo = _BatchMemo(enabled=False)
    contents = ["a", "a", "b"]
    keys = ["sa", "sa", "sb"]
    lookup = memo.process(keys, contents, _analyze_stub(calls))
    assert len(calls[0]) == 2
    assert set(lookup) == {"sa", "sb"}
    assert memo.cached_entries == 0

"""Scale-guard tests for the dedup operators: the frequent-shingle
document-frequency cap keeps the (block, shingle) self-join from going
quadratic in a stop-shingle's posting list."""

from __future__ import annotations

from ner_spark.operators.dedup import ngram_jaccard_pairs


def test_frequent_shingle_cap(spark):
    # 120 docs in one block, ALL sharing one ubiquitous 3-gram
    # ("aaa bbb ccc"); each doc otherwise unique.  Without the DF cap
    # that single stop-shingle would materialize 120·119/2 = 7140
    # join pairs; with the cap (df 120 > 64) it contributes nothing,
    # and only the deliberate near-dup pair survives.
    rows = [
        (i, "blk", f"aaa bbb ccc unique{i} token{i} word{i}")
        for i in range(120)
    ]
    rows.append((200, "blk", "xxx yyy zzz shared tail phrase here"))
    rows.append((201, "blk", "xxx yyy zzz shared tail phrase there"))
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = ngram_jaccard_pairs(docs, n=3, top_k=50).collect()
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in out}
    # the rare-shingle near-dup pair survives with the exact filtered-set
    # jaccard: 4 shared of (5 + 5 - 4) shingles
    assert (200, 201) in pairs
    assert abs(pairs[(200, 201)] - 4 / 6) < 1e-5
    # no pair owes its existence to the capped stop-shingle
    assert all(not (a < 120 and b < 120) for (a, b) in pairs)

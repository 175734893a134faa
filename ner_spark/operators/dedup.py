"""Deduplication operators over the ``documents`` table.

Training-data curation front-end for the KG pipeline: exact dup groups,
n-gram Jaccard near-dup pairs, MinHash+LSH banding, SimHash bucketing
and embedding-cosine near-dup.  All hot paths are pure Catalyst
expressions or one bounded self-join inside a blocking key — no
per-row Python anywhere.

Scale notes (100 TB):
- exact dedup is one map-side-combinable groupBy on a 128-bit hash;
- Jaccard pairs are blocked (``source`` or LSH band) so the self-join
  is per-block quadratic, never global;
- MinHash/LSH: signatures are array expressions, banding is
  ``posexplode`` + groupBy — the classic shuffle-once band join;
- SimHash: 64-bit signature from per-token md5 bits, bucket by the
  4×16-bit bands (Hamming ≤ 3 candidates land in a shared band).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ner_spark.functions.text import (
    shingle_rows,
    shingles_col,
    stable_round,
    tokens_col,
)


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """Content-hash dup groups: (content_hash, dup_count, canonical_doc_id)."""
    return (
        docs.select(F.md5("text").alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("dup_count"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, top_k: int = 50, block_col: str = "source",
    df_cap: int = 64,
) -> DataFrame:
    """Top-k most-similar doc pairs by word n-gram Jaccard, blocked.

    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, ranked by
    (jaccard desc, doc_a, doc_b) — fully deterministic; jaccard is an
    exact int/int ratio so it hash-matches the DuckDB oracle.
    """
    # shingle-join intersection counting instead of a pairwise
    # array_intersect cross-join: explode distinct shingles, self-join
    # on (block, shingle), count shared shingles per pair — linear in
    # corpus size + per-shingle quadratic (bounded by shingle df), the
    # only shape that survives 100×.  Pairs with zero overlap never
    # materialize (jaccard 0 — excluded in the oracle too).
    sh = shingle_rows(
        docs.withColumnRenamed(block_col, "block") if block_col != "block" else docs,
        n=n, carry=("block",), distinct=True,
    )
    # frequent-shingle guard: a stop-shingle shared by f docs in one
    # block would contribute f² rows to the self-join (quadratic in its
    # posting list — the one unbounded term at 10⁶ docs/block).  Drop
    # (block, shingle) groups with document frequency > df_cap from the
    # shingle SETS (sizes and intersections both see the filtered set,
    # so jaccard stays a consistent exact ratio) — standard MinHash
    # stop-shingle practice; near-dup pairs share plenty of rare
    # shingles, so recall is unaffected.  The window shuffle partitions
    # by the same (block, g) key the self-join needs.
    df_w = Window.partitionBy("block", "g")
    sh = (
        sh.withColumn("_df", F.count("*").over(df_w))
        .where(F.col("_df") <= df_cap)
        .drop("_df")
    )
    # sh is consumed three times (sizes + both self-join sides) but is
    # deliberately NOT materialized: shingling is a cheap projection off
    # the pruned scan, so re-deriving it costs far less than writing a
    # ~10×-corpus shingle table to executor storage (an eager
    # localCheckpoint here measured 2-4× slower at sf0.1 and would be
    # the dominant disk write at 100 TB; Spark's exchange reuse also
    # dedupes the window shuffle when plans allow).
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    ex = sh.join(sizes, "doc_id")
    a, b = ex.alias("a"), ex.alias("b")
    shared = (
        a.join(b, (F.col("a.block") == F.col("b.block"))
               & (F.col("a.g") == F.col("b.g"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("na"), F.col("b.n").alias("nb"),
        )
        .agg(F.count("*").alias("inter"))
    )
    pairs = shared.select(
        "doc_a", "doc_b",
        stable_round(
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"), 6
        ).alias("jaccard"),
    )
    return _global_topk(pairs, "jaccard", top_k)


def _global_topk(pairs: DataFrame, score_col: str, top_k: int) -> DataFrame:
    """Deterministic global top-k: ``orderBy(...).limit(k)`` compiles to
    ``TakeOrderedAndProject`` — each task keeps a bounded k-row heap and
    the driver merges the per-partition heaps — so no shuffle and no
    single-task global sort/window ever materializes."""
    order = [F.desc(score_col)] + [F.col(c) for c in pairs.columns if c != score_col]
    return pairs.orderBy(*order).limit(top_k)


def minhash_signature(tokens, n: int = 3, num_hashes: int = 16) -> F.Column:
    """num_hashes-wide MinHash signature over word n-gram shingles —
    pure expressions (salted md5 min per hash function)."""
    sh = shingles_col(tokens, n)

    def lane(i: int) -> F.Column:
        # one-arg lambda only: a 2-arg lambda would bind the array index
        prefix = f"h{i}|"
        return F.array_min(F.transform(sh, lambda g: F.md5(F.concat(F.lit(prefix), g))))

    return F.array(*[lane(i) for i in range(num_hashes)])


def minhash_lsh_dup_pairs(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    min_jaccard_est: float = 0.5,
) -> DataFrame:
    """MinHash + LSH banding near-dup pairs.

    signature → split into ``bands`` bands of ``num_hashes/bands`` rows
    → band-hash groupBy join (only docs sharing a band collide) →
    estimate Jaccard as signature agreement.  One shuffle for banding,
    one bounded self-join per band bucket.
    """
    rows_per_band = num_hashes // bands
    # aggregation-form signature: explode shingles once, take the min
    # salted md5 per lane with a map-side-combinable groupBy.  (The
    # expression-form minhash_signature() is equivalent but Catalyst's
    # project-collapse re-evaluates the shingle expression per lane —
    # 16× the work.)  min over duplicate shingles == min over the
    # distinct set, so no shingle dedup is needed.
    ex = shingle_rows(docs, n=n, distinct=False)
    lanes = [
        F.min(F.md5(F.concat(F.lit(f"h{i}|"), F.col("g")))).alias(f"m{i}")
        for i in range(num_hashes)
    ]
    sig = (
        ex.groupBy("doc_id").agg(*lanes)
        .select("doc_id", F.array(*[f"m{i}" for i in range(num_hashes)]).alias("sig"))
    )

    banded = sig.select(
        "doc_id", "sig",
        F.posexplode(
            F.array(*[
                F.md5(F.concat_ws("|", F.lit(b), *[
                    F.element_at("sig", b * rows_per_band + r + 1)
                    for r in range(rows_per_band)
                ]))
                for b in range(bands)
            ])
        ).alias("band", "band_hash"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    agree = F.size(
        F.filter(
            F.zip_with(F.col("a.sig"), F.col("b.sig"), lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (agree.cast("double") / F.lit(float(num_hashes))).alias("jaccard_est"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return cand.where(F.col("jaccard_est") >= min_jaccard_est)


def dedup_clusters(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    min_jaccard_est: float = 0.5,
    max_iter: int = 30,
) -> DataFrame:
    """End of the dedup story: near-dup pairs → connected components →
    one canonical document per cluster.

    Output (doc_id, cluster_id, is_canonical): ``cluster_id`` is the
    min doc_id of the MinHash+LSH duplicate component (transitive —
    A≈B≈C clusters together even if A,C never collide directly);
    singletons are their own cluster.  A curation pipeline keeps
    ``is_canonical`` rows and drops the rest.

    Scale shape: the pair graph is tiny relative to the corpus (only
    near-dups), so the label-propagation loop runs on it alone and the
    full table joins the labels once at the end.
    """
    from ner_spark.operators.canonicalize import connected_components

    pairs = minhash_lsh_dup_pairs(
        docs, n=n, num_hashes=num_hashes, bands=bands,
        min_jaccard_est=min_jaccard_est,
    )
    # checkpoint the (small) pair-edge list: nodes and the CC loop both
    # derive from it, and truncating the shared MinHash lineage here
    # avoids re-evaluating it per iteration (and the attribute-reuse
    # conflicts a self-referencing un-checkpointed plan can hit)
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).localCheckpoint(eager=True)
    # explode instead of a self-union: two selects over the SAME parent
    # unioned under renamed columns trip Union constraint rewriting in
    # Spark's optimizer (key-not-found on the aliased attribute)
    nodes = edges.select(
        F.explode(F.array("src", "dst")).alias("node")
    ).distinct()
    labels = connected_components(nodes, edges, max_iter=max_iter)
    out = (
        docs.select("doc_id")
        .join(labels, docs["doc_id"] == labels["node"], "left")
        .select(
            "doc_id",
            F.coalesce("label", "doc_id").alias("cluster_id"),
        )
        .withColumn("is_canonical", F.col("doc_id") == F.col("cluster_id"))
    )
    return out


def simhash_buckets(docs: DataFrame, band_bits: int = 16) -> DataFrame:
    """64-bit SimHash per doc + 16-bit band keys for near-dup blocking.

    SimHash = sign of per-bit vote over token md5 hashes; computed with
    array expressions (conv of md5 prefix → bit tests).  Output:
    (doc_id, simhash, band, band_key).
    """
    toks = tokens_col("text")
    h64 = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10)
        .cast("decimal(20,0)").cast("long"),
    )
    pow2 = F.array(*[F.lit(1 << k).cast("long") for k in range(60)])
    # single pass: per-bit +1/-1 votes accumulated in one 60-wide array
    votes = F.aggregate(
        h64,
        F.array_repeat(F.lit(0), 60),
        lambda acc, h: F.zip_with(
            acc, pow2,
            lambda c, p: c + F.when(h.bitwiseAND(p) != F.lit(0).cast("long"), 1).otherwise(-1),
        ),
    )
    sim = F.aggregate(
        F.zip_with(votes, pow2,
                   lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sigs = docs.select("doc_id", sim.alias("simhash"))
    n_bands = 60 // band_bits + (1 if 60 % band_bits else 0)
    banded = sigs.select(
        "doc_id", "simhash",
        F.posexplode(F.array(*[
            F.shiftright("simhash", b * band_bits).bitwiseAND(F.lit((1 << band_bits) - 1))
            for b in range(n_bands)
        ])).alias("band", "band_key"),
    )
    return banded


def embedding_topk_pairs(
    emb: DataFrame, top_k: int = 20, block_col: str = "label"
) -> DataFrame:
    """Top-k most-cosine-similar embedding pairs within each block.

    Blocking on ``label`` keeps the self-join per-block quadratic; the
    content-derived scale path is :func:`embedding_topk_pairs_ivf`.
    Output (vec_a, vec_b, cos_sim) ranked by (cos desc, vec_a, vec_b),
    deterministic.
    """
    v = emb.select(
        "vec_id", F.col(block_col).alias("block"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    return _topk_cosine_pairs(v, top_k)


def embedding_topk_pairs_ivf(
    emb: DataFrame, top_k: int = 20, n_centroids: int = 16,
    seed: int = 7, dim: int = 64,
    centroids=None,
) -> DataFrame:
    """Near-dup pairs blocked by IVF cell instead of a metadata label:
    the block key is derived from the vector itself (nearest centroid,
    :func:`ner_spark.operators.similarity.ivf_cell_col`),
    so the self-join is per-cell quadratic — ~N²/n_centroids at uniform
    fill — with no reliance on any labeling.  At 100 TB the cell id is
    the stored table's partition key, so each block join is
    partition-local.

    ``centroids`` takes a trained matrix
    (:func:`~ner_spark.operators.similarity.train_ivf_centroids`) —
    the production path; per-cell quadratic cost makes BALANCE the
    whole game here, and trained cells are what keep the largest cell
    (and so the largest block join) bounded on clustered real-world
    embeddings.  ``None`` = seeded pseudo-centroids (the
    deterministic oracle twin)."""
    from ner_spark.operators.similarity import ivf_cell_col, ivf_centroids

    cents = centroids if centroids is not None else ivf_centroids(
        dim, n_centroids, seed)
    dv = F.transform("embedding", lambda x: x.cast("double"))
    v = emb.select(
        "vec_id", ivf_cell_col(dv, cents).alias("block"), dv.alias("v")
    )
    return _topk_cosine_pairs(v, top_k)


def _topk_cosine_pairs(v: DataFrame, top_k: int) -> DataFrame:
    """(vec_id, block, v) → top-k (vec_a, vec_b, cos_sim) pairs within
    each block, ranked globally (cos desc, vec_a, vec_b)."""
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x * x))
    v = v.withColumn("nrm", norm)
    a, b = v.alias("a"), v.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    pairs = (
        a.join(b, (F.col("a.block") == F.col("b.block"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            stable_round(dot / (F.col("a.nrm") * F.col("b.nrm")), 4).alias("cos_sim"),
        )
    )
    return _global_topk(pairs, "cos_sim", top_k)

"""Dataset-curation operators for training-data pipelines: deterministic
splits, stratified sampling, corpus vocabulary stats and a composed
keep/drop curation pass over the ``documents`` table.

Everything here is a pure Catalyst expression tree (no UDFs, no
``collect()``), so each operator stays inside whole-stage codegen and
scales linearly: at 100 TB the splits/sampling are shuffle-free row
filters, the vocab stats are one map-side-combinable aggregation plus a
``TakeOrderedAndProject`` top-k, and the curation pass shuffles once on
the content hash (the dedup key).

Determinism contract: split/sample assignment hashes ``md5(salt|key)``
and compares the first 8 hex chars against precomputed hex thresholds.
md5 of the same UTF-8 bytes is identical in every engine and the hex
alphabet is ordered in ASCII, so the assignment is reproducible
bit-for-bit across Spark, DuckDB (the contract oracles) and any future
backfill — and adding data never reassigns existing rows (the property
a 100 TB incremental pipeline needs from its split function).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ner_spark.functions.text import (
    EN_STOPWORDS,
    quality_score,
    shingle_rows,
    stopword_hits,
    tokens_col,
)

_HEX_SPACE = 16 ** 8  # first 8 hex chars of md5 = uniform draw in [0, 16^8)


def hex_threshold(frac) -> str:
    """``frac`` of the 8-hex-char hash space as a zero-padded hex literal
    (shared with the SQL oracles so both engines compare against the
    byte-identical boundary).  ``frac >= 1`` returns ``'g'``, which
    sorts above every hex string, so a keep-all fraction keeps the
    2^-32 tail row whose hash is exactly ``ffffffff`` (a strict ``<``
    against a clamped ``ffffffff`` would drop it).  Accepts
    ``fractions.Fraction`` for exact cumulative boundaries."""
    if frac >= 1:
        return "g"
    return format(max(0, int(frac * _HEX_SPACE)), "08x")


def _hash8(salt: str, *cols: Column) -> Column:
    """First 8 hex chars of ``md5(salt|col1|col2|…)``."""
    parts: list[Column] = [F.lit(salt)]
    for c in cols:
        parts.extend([F.lit("|"), c.cast("string")])
    return F.substring(F.md5(F.concat(*parts)), 1, 8)


DEFAULT_SPLITS: tuple[tuple[str, float], ...] = (
    ("train", 0.8), ("val", 0.1), ("test", 0.1),
)


def dataset_split(
    docs: DataFrame,
    weights: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    salt: str = "split-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment by hashed id.

    Returns (id_col, split).  Assignment depends only on (salt, id), so
    it is stable under re-runs, appends and repartitioning — rows never
    migrate between splits when the corpus grows (unlike
    ``randomSplit``, which reshuffles membership with the partition
    layout).  Pure projection: no shuffle, no UDF.
    """
    from fractions import Fraction

    h = _hash8(salt, F.col(id_col))
    expr = None
    # exact cumulative boundaries: a float running sum accumulates
    # binary error (0.8 + 0.1 = 0.9000000000000001) that can shift a
    # threshold by one hash unit vs an oracle/backfill re-deriving it
    # from the literal weights — Fraction(str(w)) keeps every partial
    # sum exact, so the boundary is a pure function of the weights
    cum = Fraction(0)
    for name, frac in weights[:-1]:
        cum += Fraction(str(frac))
        cond = h < F.lit(hex_threshold(cum))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = weights[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(last)
    return docs.select(id_col, split.alias("split"))


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    default_frac: float = 1.0,
    stratum_col: str = "lang",
    salt: str = "strat-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum downsampling (training-mix rebalance).

    Keeps a row iff ``md5(salt|stratum|id)`` falls under the stratum's
    fraction threshold — e.g. ``{"en": 0.25}`` downsamples a dominant
    language to a quarter while keeping the long tail intact.  Stable
    under appends (same property as :func:`dataset_split`); shuffle-free
    filter, so at 100 TB it is a single scan with the predicate pushed
    into codegen.
    """
    h = _hash8(salt, F.col(stratum_col), F.col(id_col))
    thr = None
    for stratum, frac in sorted(fractions.items()):
        cond = F.col(stratum_col) == stratum
        lit = F.lit(hex_threshold(frac))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    thr = F.lit(hex_threshold(default_frac)) if thr is None else thr.otherwise(
        hex_threshold(default_frac)
    )
    return docs.where(h < thr).select(id_col, stratum_col)


def vocab_topk(docs: DataFrame, n: int = 2, k: int = 50) -> DataFrame:
    """Corpus-level top-k word n-grams: (ngram, n_occurrences, n_docs,
    rank) — the vocabulary statistics a BPE/tokenizer-training pass
    reads off the corpus.

    One exploded aggregation (partial/map-side combinable) followed by
    the distributed top-k shape (``orderBy().limit(k)`` compiles to
    TakeOrderedAndProject; only the k survivors are ranked through the
    constant-key window, same pattern as ``analytics.top_customers``).
    """
    sh = shingle_rows(docs, n=n, distinct=False)
    counts = sh.groupBy("g").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    top = counts.orderBy(F.desc("n_occurrences"), "g").limit(k)
    # column-derived constant partition key: pmod(length, 1) ≡ 0 but is
    # NOT foldable (g is non-nullable, so the `col * 0` idiom used on
    # nullable keys elsewhere would be constant-folded and the partition
    # spec eliminated → single-partition WindowExec warning); the window
    # input is already capped at k rows by the limit above
    zero = F.pmod(F.length("g"), F.lit(1))
    w = Window.partitionBy(zero).orderBy(F.desc("n_occurrences"), "g")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select(F.col("g").alias("ngram"), "n_occurrences", "n_docs", "rank")
    )


def materialize_clusters(
    docs: DataFrame,
    path: str,
    force: bool = False,
    **cluster_kwargs,
) -> DataFrame:
    """Compute :func:`ner_spark.operators.dedup.dedup_clusters` ONCE
    and install it crash-safely under ``path`` (tmp write + atomic
    directory rename — the same protocol the KG job's derived views
    use); return the committed relation.

    The cluster pass (shingle → MinHash → LSH bands → pair graph →
    transitive CC) is the expensive half of every near-dup-aware
    curation call — :func:`leakage_safe_split` alone pays ~6 s at
    sf0.1 per invocation when it recomputes.  A pipeline that splits,
    re-splits with different weights, runs contamination reports, and
    audits cluster sizes should pay it once: every later call is a
    pure parquet scan (pass the committed relation via the
    ``clusters=`` parameter of :func:`leakage_safe_split`).

    A committed view (``_SUCCESS`` present after the rename) is
    reused as-is; ``force=True`` recomputes (after the corpus
    changed).  A crash mid-write leaves only the invisible ``.tmp``
    dir — the next call discards it and recomputes, never serving a
    torn table.
    """
    from ner_spark.operators.dedup import dedup_clusters

    spark = docs.sparkSession
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()

    def p(s):
        return jvm.org.apache.hadoop.fs.Path(s)

    fs = p(path).getFileSystem(conf)
    if force and fs.exists(p(path)):
        fs.delete(p(path), True)
    if not fs.exists(p(path + "/_SUCCESS")):
        tmp = path + ".tmp"
        if fs.exists(p(tmp)):
            fs.delete(p(tmp), True)
        dedup_clusters(docs, **cluster_kwargs).write.mode(
            "overwrite").parquet(tmp)
        if fs.exists(p(path)):
            fs.delete(p(path), True)  # torn earlier install
        if not fs.rename(p(tmp), p(path)):
            raise IOError(f"rename {tmp} -> {path} failed")
    return spark.read.parquet(path)


def leakage_safe_split(
    docs: DataFrame,
    weights: tuple[tuple[str, float], ...] = DEFAULT_SPLITS,
    salt: str = "split-v1",
    clusters: DataFrame | None = None,
    **cluster_kwargs,
) -> DataFrame:
    """Near-dup-aware train/val/test assignment: every document in a
    near-duplicate cluster lands in the SAME split.

    :func:`dataset_split` hashes each doc independently, so two
    near-identical documents can straddle train and test — the classic
    train/eval contamination leak.  This variant first clusters
    near-dups (:func:`ner_spark.operators.dedup.dedup_clusters`:
    MinHash+LSH pairs closed transitively), then hashes the CLUSTER id
    through the same salt/threshold machinery, so the whole cluster
    moves together.  Singleton documents are their own cluster
    (cluster_id = doc_id), which makes this a strict refinement of
    :func:`dataset_split`: any doc with no near-dups keeps exactly the
    assignment the plain split gives it.

    Scale shape: the cluster pass is the already-bucketed LSH pipeline
    (the pair graph and its CC loop touch only near-dups); the split
    itself adds one shuffle-free hash projection over the distinct
    cluster ids plus one equi-join on cluster_id.  Pass a committed
    :func:`materialize_clusters` relation via ``clusters=`` to make
    repeated splits (new weights, a re-salted fold assignment) pure
    scans instead of recomputing the whole LSH pipeline each time.

    Returns (doc_id, cluster_id, split).
    """
    from ner_spark.operators.dedup import dedup_clusters

    if clusters is None:
        clusters = dedup_clusters(docs, **cluster_kwargs)
    assigned = dataset_split(
        clusters.select(F.col("cluster_id").alias("doc_id")).distinct(),
        weights=weights, salt=salt, id_col="doc_id",
    ).select(F.col("doc_id").alias("cluster_id"), "split")
    return clusters.select("doc_id", "cluster_id").join(
        assigned, "cluster_id"
    ).select("doc_id", "cluster_id", "split")


def contamination_check(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    min_shared: int = 2,
) -> DataFrame:
    """Benchmark-contamination scan: which corpus documents share at
    least ``min_shared`` distinct word n-grams with a document of the
    evaluation set?  The standard pre-training hygiene pass — eval
    examples that leaked into the training corpus inflate benchmark
    scores, so curation drops (or at least flags) every hit.

    Scale shape: the corpus side explodes to (doc, shingle) rows once;
    the eval side is small by construction (a benchmark is thousands
    of examples, not billions), so its shingle table BROADCASTS and
    the overlap join is map-side — no shuffle of the 100 TB corpus at
    all; the per-pair count partial-aggregates.  Self-pairs (a doc
    that IS the eval doc) are excluded.

    Returns (doc_id, eval_id, shared_ngrams) for pairs at or above the
    threshold.
    """
    c = shingle_rows(docs, n=n)
    e = shingle_rows(eval_docs, n=n).select(
        F.col("doc_id").alias("eval_id"), "g"
    )
    return (
        c.join(F.broadcast(e), "g")
        .where(F.col("doc_id") != F.col("eval_id"))
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
        .where(F.col("shared_ngrams") >= min_shared)
    )


_KMV_SPACE = float(16 ** 15)  # 15 hex chars of md5 = uniform draw in [0, 2^60)


def kmv_distinct(
    docs: DataFrame, k: int = 64, group_col: str = "lang"
) -> DataFrame:
    """Per-group distinct-content cardinality estimate via a
    K-minimum-values sketch — the "how many unique documents does each
    slice hold?" statistic a 100 TB curation pass reads without paying
    an exact per-group ``count(distinct)`` at full width.

    The sketch: hash every document's content to a uniform 60-bit
    integer (first 15 hex chars of md5 — deterministic and
    engine-identical, same contract as the split/sample hashes above),
    keep each group's *k smallest distinct* hash values, and estimate

        D ≈ (k − 1) · 2^60 / h_k          (h_k = the k-th minimum)

    which is the classic KMV/bottom-k estimator: the k-th order
    statistic of D uniform draws sits at ≈ k/D of the hash space.  A
    group with fewer than k distinct hashes reports its exact count —
    the sketch degrades to exact, never to garbage.

    Scale shape: the distinct is a partial-aggregating shuffle on
    (group, hash); the per-group k minima come from a ``row_number``
    rank window that Spark 4 rewrites into a group-limit pushed BELOW
    the shuffle (``WindowGroupLimit(Partial)`` in the plan — each map
    task forwards at most k rows per group, so the window never sorts
    a full group; audited in tools/plan_audit.py).  The estimate is
    one division over exact-integer inputs, written in the same IEEE
    operation order as the DuckDB twin, so the quantized value is
    bitwise reproducible cross-engine.

    Returns (group_col, n_sketch, kmv_est_q) — the estimate rounded to
    the nearest integer document count.
    """
    h = docs.select(
        F.col(group_col),
        F.conv(F.substring(F.md5("text"), 1, 15), 16, 10)
        .cast("bigint")
        .alias("h"),
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    mink = h.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / F.col("hk").cast("double")
    )
    return (
        mink.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_sketch"), F.max("h").alias("hk"))
        .select(
            group_col,
            "n_sketch",
            F.floor(est + F.lit(0.5)).cast("bigint").alias("kmv_est_q"),
        )
    )


CURATE_ALLOWED_LANGS: tuple[str, ...] = ("en", "de", "fr")


def curate_corpus(
    docs: DataFrame,
    min_quality: float = 0.34,
    allowed_langs: tuple[str, ...] = CURATE_ALLOWED_LANGS,
) -> DataFrame:
    """Composed curation pass: every document gets a keep/drop verdict
    with the first failing rule as the reason.

    Rule order (highest precedence first):
      1. ``duplicate``    — exact-content dup, keeping the lowest doc_id
      2. ``lang_filtered``— metadata language outside the allowlist
      3. ``low_quality``  — composite quality score below threshold
      4. ``kept``

    One shuffle (on the md5 content hash, the dedup key); the quality
    and language rules are pure row expressions evaluated in the same
    stage.  Returns (doc_id, lang, quality_score, reason, keep).
    """
    t = docs.select(
        "doc_id", "lang",
        F.md5("text").alias("content_hash"),
        tokens_col("text").alias("toks"),
    )
    n = F.size("toks").cast("long")
    nd = F.size(F.array_distinct("toks")).cast("long")
    stop = stopword_hits(F.col("toks"), EN_STOPWORDS).cast("long")
    # zero-token docs: 0/0 would make the score NULL, and NULL < thr is
    # NULL, so the when-chain would fall through to 'kept' — the
    # junkiest possible documents must score 0.0 and be dropped
    q = F.when(n == 0, F.lit(0.0)).otherwise(
        quality_score(n, nd.cast("double") / n, stop.cast("double") / n)
    )
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    scored = t.select(
        "doc_id", "lang", q.alias("quality_score"),
        F.row_number().over(w).alias("dup_rank"),
    )
    reason = (
        F.when(F.col("dup_rank") > 1, "duplicate")
        .when(~F.col("lang").isin(*allowed_langs), "lang_filtered")
        .when(F.col("quality_score") < min_quality, "low_quality")
        .otherwise("kept")
    )
    return scored.select(
        "doc_id", "lang", "quality_score",
        reason.alias("reason"),
        (reason == "kept").alias("keep"),
    )

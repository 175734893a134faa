"""Declarative analytics queries: curation stats over ``documents``,
relational demos over the TPC-H-ish tables, and the SQL-expressible
reference operators (HMM counts H1, gazetteer compile S3, BIO→spans
M2) over the annotated corpus.

Everything here is DataFrame-API-only (no UDFs) so Catalyst gets full
predicate pushdown / column pruning / whole-stage codegen; each query
has a DuckDB oracle twin in ``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ner_spark.functions.text import (
    EN_STOPWORDS,
    stable_round,
    PT_STOPWORDS,
    lang_id_col,
    quality_score,
    shingle_rows,
    stopword_hits,
    tokens_col,
)

# ---------------------------------------------------------------- documents

def text_quality(docs: DataFrame) -> DataFrame:
    """Per-doc curation features: token counts, diversity, stopword
    ratio, composite quality score (all Catalyst expressions)."""
    t = docs.select("doc_id", tokens_col("text").alias("toks"))
    n = F.size("toks").cast("long")
    nd = F.size(F.array_distinct("toks")).cast("long")
    stop = stopword_hits(F.col("toks"), EN_STOPWORDS).cast("long")
    return t.select(
        "doc_id",
        n.alias("n_tokens"),
        nd.alias("n_distinct"),
        stable_round(nd.cast("double") / n, 4).alias("distinct_ratio"),
        stable_round(stop.cast("double") / n, 4).alias("stopword_ratio"),
        quality_score(n, nd.cast("double") / n, stop.cast("double") / n)
        .alias("quality_score"),
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Corpus-level token accounting per source (map-side combinable)."""
    t = docs.select("source", F.size(tokens_col("text")).cast("long").alias("n"))
    return (
        t.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n").alias("total_tokens"),
            stable_round(F.avg("n"), 4).alias("avg_tokens"),
        )
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-vote language ID per document."""
    t = docs.select("doc_id", tokens_col("text").alias("toks"))
    return t.select(
        "doc_id",
        stopword_hits(F.col("toks"), EN_STOPWORDS).cast("long").alias("en_hits"),
        stopword_hits(F.col("toks"), PT_STOPWORDS).cast("long").alias("pt_hits"),
        lang_id_col(F.col("toks")).alias("predicted_lang"),
    )


FINGERPRINT_SALTS = ("s0", "s1", "s2", "s3")


def doc_fingerprint(docs: DataFrame, n: int = 3) -> DataFrame:
    """MinHash-style 4-lane fingerprint per doc over word 3-shingles.

    Aggregation form (explode + min per salt, map-side combinable):
    tokenizes once per doc instead of once per lane reference, and min
    over duplicate shingles equals min over the distinct set.
    """
    ex = shingle_rows(docs, n=n, distinct=False)
    return ex.groupBy("doc_id").agg(*[
        F.min(F.md5(F.concat(F.lit(s + "|"), F.col("g")))).alias(f"mh_{s}")
        for s in FINGERPRINT_SALTS
    ])


# ---------------------------------------------------------------- relational

def tpch_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (filter pushdown + grouped aggs)."""
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            stable_round(F.sum("l_quantity"), 2).alias("sum_qty"),
            stable_round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            stable_round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("sum_disc_price"),
            stable_round(F.avg("l_quantity"), 4).alias("avg_qty"),
            stable_round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def top_customers(orders: DataFrame, customer: DataFrame,
                  nation: DataFrame, region: DataFrame, k: int = 20) -> DataFrame:
    """Revenue top-k with broadcast dims + deterministic window rank."""
    rev = orders.groupBy("o_custkey").agg(
        stable_round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )
    enriched = (
        rev.join(customer, rev.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    # distributed top-k: orderBy().limit(k) compiles to
    # TakeOrderedAndProject (per-partition bounded heap, driver merge) —
    # no single-task global sort/window.  Only the ≤ k survivors are
    # numbered; the column-derived constant partition key keeps
    # WindowExec's input to those k rows (same shape as
    # similarity._ranked_topk).
    top = (
        enriched.select("c_custkey", "c_name", F.col("r_name").alias("region_name"),
                        "revenue", "n_orders")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(k)
    )
    zero = F.coalesce(F.col("c_custkey") * 0, F.lit(0))
    w = Window.partitionBy(zero).orderBy(F.desc("revenue"), "c_custkey")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("c_custkey", "c_name", "region_name", "revenue", "n_orders", "rank")
    )


def events_hourly(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour aggregate per event type (streaming-shaped agg,
    runs identically under readStream + watermark)."""
    return (
        events.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"),
             stable_round(F.sum("value"), 2).alias("sum_value"))
    )


def events_sessions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: per-user gap>30min session split via lag window."""
    w = Window.partitionBy("user_id").orderBy("ts")
    # ts is TIMESTAMP_NTZ; route via timestamp (session tz = UTC) to get
    # epoch seconds matching DuckDB's floor(epoch(ts))
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w)
    marked = events.select(
        "user_id", "ts",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0).alias("new_s"),
    )
    return (
        marked.groupBy("user_id")
        .agg(F.sum("new_s").cast("long").alias("n_sessions"),
             F.count("*").alias("n_events"))
    )


# ------------------------------------------------------- corpus (reference ops)

def corpus_tokens_df(spark: SparkSession) -> DataFrame:
    """Annotated corpus as (sent_id, idx, word, tag) rows — the golden
    fixture table (reference corpus.rs:36-463)."""
    from ner_spark.data.corpus import CORPUS

    rows = []
    for sid, (_text, _domain, ann) in enumerate(CORPUS):
        for i, (word, tag) in enumerate(ann):
            rows.append((sid, i, word, tag))
    return spark.createDataFrame(rows, "sent_id int, idx int, word string, tag string")


def corpus_values_sql() -> str:
    """The same corpus rows as a SQL VALUES list (DuckDB oracle input)."""
    from ner_spark.data.corpus import CORPUS

    vals = []
    for sid, (_text, _domain, ann) in enumerate(CORPUS):
        for i, (word, tag) in enumerate(ann):
            w = word.replace("'", "''")
            vals.append(f"({sid},{i},'{w}','{tag}')")
    return ("(SELECT * FROM (VALUES " + ",".join(vals)
            + ") AS t(sent_id, idx, word, tag))")


def hmm_transition_counts(corpus: DataFrame) -> DataFrame:
    """H1: BIO tag-bigram counts (the HMM transition-count groupBy;
    reference hmm.rs:72-153).  '<S>' marks sentence start."""
    w = Window.partitionBy("sent_id").orderBy("idx")
    return (
        corpus.select("sent_id", "idx", "tag",
                      F.coalesce(F.lag("tag").over(w), F.lit("<S>")).alias("prev_tag"))
        .groupBy("prev_tag", "tag")
        .agg(F.count("*").alias("n"))
    )


def hmm_emission_counts(corpus: DataFrame) -> DataFrame:
    """H1: (tag, word) raw emission counts — the other half of the HMM
    training aggregation (reference hmm.rs:93-94 counts emissions per
    tag over raw, case-preserved words)."""
    return corpus.groupBy("tag", "word").agg(F.count("*").alias("n"))


def _tag_category(tag_col: F.Column) -> F.Column:
    """Category of a ``B-XXX``/``I-XXX`` BIO tag: UNBOUNDED suffix from
    position 3 — the one shared definition for every consumer.  The
    DuckDB oracles use unbounded ``substr(tag, 3)``; a bounded
    ``substring(tag, 3, 10)`` would silently diverge on a category
    longer than 10 chars (dormant with PER/LOC/ORG/MISC, but the
    invariant belongs in code, not in luck)."""
    return tag_col.substr(F.lit(3), F.length(tag_col))


def _run_ids(corpus: DataFrame) -> DataFrame:
    """Entity-run grouping over BIO tags: a run starts at B-* or at an
    orphan I-* (previous tag absent or 'O')."""
    w = Window.partitionBy("sent_id").orderBy("idx")
    prev = F.lag("tag").over(w)
    marked = corpus.select(
        "sent_id", "idx", "word", "tag",
        F.when(F.col("tag").startswith("B-"), 1)
        .when(F.col("tag").startswith("I-") & (prev.isNull() | (prev == "O")), 1)
        .otherwise(0)
        .alias("new_run"),
    )
    return marked.select(
        "sent_id", "idx", "word", "tag",
        F.sum("new_run").over(w).alias("run_id"),
    )


def gazetteer_surfaces(corpus: DataFrame) -> DataFrame:
    """S3: compile gazetteer surfaces from corpus annotations — distinct
    (category, surface) per contiguous B/I run (corpus.rs:473-574)."""
    runs = _run_ids(corpus).where(F.col("tag") != "O")
    return (
        runs.groupBy("sent_id", "run_id")
        .agg(
            _tag_category(F.min(F.struct("idx", "tag"))["tag"]).alias("category"),
            F.lower(_ordered_surface()).alias("surface"),
        )
        .select("category", "surface")
        .distinct()
    )


def _ordered_surface(col: str = "word") -> F.Column:
    """Order-safe surface assembly: collect (idx, col) structs, sort by
    idx, join — collect_list alone has no order guarantee under
    parallel aggregation."""
    return F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("idx", col))),
            lambda s: s[col],
        ),
        " ",
    )


def gold_bio_spans(corpus: DataFrame) -> DataFrame:
    """M2: BIO→span assembly over the gold tags (tagger.rs:233-282
    semantics: only B- starts a span; orphan I- runs are dropped)."""
    runs = _run_ids(corpus).where(F.col("tag") != "O")
    grouped = runs.groupBy("sent_id", "run_id").agg(
        F.min("idx").alias("start_idx"),
        F.max("idx").alias("end_idx"),
        F.min(F.struct("idx", "tag"))["tag"].alias("first_tag"),
        _ordered_surface().alias("surface"),
    )
    return (
        grouped.where(F.col("first_tag").startswith("B-"))
        .select("sent_id", "start_idx", "end_idx",
                _tag_category(F.col("first_tag")).alias("category"), "surface")
    )


def redact_mentions(corpus: DataFrame) -> DataFrame:
    """Entity redaction / anonymization over gold BIO tags: each B-run
    collapses to its ``[CATEGORY]`` placeholder, 'O' tokens pass
    through, and orphan I-runs (not entities per tagger.rs:233-282 —
    same convention as :func:`gold_bio_spans`) keep their raw words.

    The training-data op this models: scrubbing PII-like entity
    surfaces from a corpus before it feeds a model, driven by the NER
    layer itself.  Windows partition by sentence, so at scale the only
    shuffle is on the document key.  Returns (sent_id, redacted).
    """
    runs = _run_ids(corpus)  # shared run-start convention (B- / orphan I-)
    wr = Window.partitionBy("sent_id", "run_id").orderBy("idx")
    first_tag = F.first("tag").over(wr)
    piece = (
        F.when(F.col("tag") == "O", F.col("word"))
        .when(F.col("tag").startswith("B-"),
              F.concat(F.lit("["), _tag_category(F.col("tag")), F.lit("]")))
        .when(first_tag.startswith("B-"), F.lit(None).cast("string"))
        .otherwise(F.col("word"))
    )
    pieces = (
        runs.select("sent_id", "idx", piece.alias("piece"))
        .where(F.col("piece").isNotNull())
    )
    return pieces.groupBy("sent_id").agg(
        _ordered_surface("piece").alias("redacted")
    )

"""Stage 2 — NED context disambiguation + NEL knowledge-base linking.

Spark mapping of the reference's NED/NEL stages
(reference: ner-core/src/ned.rs:24-91, ner-core/src/nel.rs:71-129):

- NED is a pure column expression over the per-mention ±3-token
  ``context_window`` carried from stage 1 (the reference's range join
  token_index BETWEEN start-3 AND end+3 is pre-materialized there, so
  no join or shuffle happens here at all).
- NEL against the 5-record mock KB is a *projection*, not a join: the
  KB is folded into 5 scored struct expressions and ``greatest`` picks
  the argmax (score desc, KB order asc on ties — the reference's strict
  ``>`` first-wins).  Zero shuffle, whole-stage codegen friendly.
- :func:`link_mentions_alias` is the scale path of the north star: a
  broadcast hash join against an alias dictionary plus optional
  MinHashLSH candidate blocking for fuzzy surfaces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ner_spark.data.kb import KB_ALIASES, KB_LOC_IDS, KB_ORG_IDS, KB_PER_IDS, KB_RECORDS

_PERSON_CUES = ("hilton", "socialite", "atriz")
_LOC_CUES = ("frança", "cidade", "capital")


def _overlap(col, words) -> F.Column:
    return F.arrays_overlap(col, F.array(*[F.lit(w) for w in words]))


def disambiguate(mentions: DataFrame) -> DataFrame:
    """Add ``resolved_category`` + ``ned_confidence`` (ned.rs:44-91)."""
    text_lower = F.lower(F.col("mention_text"))
    has_paris = text_lower.contains("paris")
    is_person = _overlap(F.col("context_window"), _PERSON_CUES)
    is_loc = _overlap(F.col("context_window"), _LOC_CUES)

    resolved = (
        F.when(has_paris & is_person, F.lit("PER"))
        .when(has_paris, F.lit("LOC"))
        .otherwise(F.col("category"))
    )
    confidence = (
        F.when(has_paris & is_person, F.lit(0.95))
        .when(has_paris & (is_loc | F.col("category").contains("LOC")), F.lit(0.85))
        .when(has_paris, F.lit(0.60))
        .otherwise(F.lit(0.80))
    )
    return mentions.withColumn("resolved_category", resolved).withColumn(
        "ned_confidence", confidence
    )


def link_mentions(disambiguated: DataFrame) -> DataFrame:
    """Exact reference NEL scoring (nel.rs:71-129) as a projection.

    score = 0.8 exact-name match | 0.5 substring either way, then +0.15
    type-consistency bonus; linked iff best score ≥ 0.5.
    """
    query = F.lower(F.col("mention_text"))
    tag = F.col("resolved_category")

    # One small double expression per KB record, packed into an array;
    # argmax = array_position of the max, which returns the FIRST max
    # position — exactly the reference's first-record-wins strict '>'.
    # (Keeping the generated code tiny matters: a greatest() over five
    # struct/when chains compiled to a multi-second Janino unit that
    # every task raced to codegen.)
    scored = []
    for kb_id, name, _desc, _url in KB_RECORDS:
        name_lower = name.lower()
        base = (
            F.when(query == F.lit(name_lower), F.lit(0.8))
            .when(
                F.lit(name_lower).contains(query) | query.contains(F.lit(name_lower)),
                F.lit(0.5),
            )
            .otherwise(F.lit(0.0))
        )
        type_ok = (
            ((tag == "PER") & F.lit(kb_id in KB_PER_IDS))
            | ((tag == "LOC") & F.lit(kb_id in KB_LOC_IDS))
            | ((tag == "ORG") & F.lit(kb_id in KB_ORG_IDS))
        )
        scored.append(
            F.when(base > 0.0, base + F.when(type_ok, 0.15).otherwise(0.0))
            .otherwise(F.lit(0.0))
        )

    ids = F.array(*[F.lit(r[0]) for r in KB_RECORDS])
    names = F.array(*[F.lit(r[1]) for r in KB_RECORDS])
    scores = F.array(*scored)
    best_score = F.array_max(scores)
    best_idx = F.array_position(scores, best_score)  # 1-based, first max
    linked = best_score >= 0.5
    return (
        disambiguated.withColumn("kb_id", F.when(linked, F.element_at(ids, best_idx.cast("int"))))
        .withColumn("kb_name", F.when(linked, F.element_at(names, best_idx.cast("int"))))
        .withColumn("link_score", F.when(linked, best_score).otherwise(F.lit(0.0)))
        .withColumn("surface", F.lower(F.col("mention_text")))
    )


def alias_table(spark) -> DataFrame:
    return spark.createDataFrame(KB_ALIASES, "alias string, kb_id string")


def link_mentions_alias(
    disambiguated: DataFrame,
    aliases: DataFrame | None = None,
    fuzzy: bool = False,
    fuzzy_threshold: float = 0.6,
) -> DataFrame:
    """Scale-path linking: broadcast alias-dictionary join.

    ``aliases(alias, kb_id)`` may hold millions of rows upstream; in a
    real deployment it stays broadcastable after dictionary dedup, or
    becomes a shuffle hash join past ~1 GiB — either way the join key is
    the normalized surface so AQE handles skewed surfaces.

    ``fuzzy=True`` adds MinHashLSH candidate blocking on character
    3-gram shingles for surfaces that miss the dictionary (the north
    star's "MinHash/LSH candidate blocking").
    """
    spark = disambiguated.sparkSession
    aliases = aliases if aliases is not None else alias_table(spark)
    # disambiguate duplicate aliases deterministically: prefer the
    # type-consistent kb_id, then lexicographic.
    dedup = aliases.groupBy("alias").agg(F.sort_array(F.collect_list("kb_id")).alias("kb_ids"))

    df = disambiguated.withColumn("surface", F.lower(F.col("mention_text")))
    joined = df.join(F.broadcast(dedup), df["surface"] == dedup["alias"], "left")

    tag = F.col("resolved_category")
    per_ids = F.array(*[F.lit(x) for x in sorted(KB_PER_IDS)])
    loc_ids = F.array(*[F.lit(x) for x in sorted(KB_LOC_IDS)])
    org_ids = F.array(*[F.lit(x) for x in sorted(KB_ORG_IDS)])
    preferred = (
        F.when(tag == "PER", F.array_intersect("kb_ids", per_ids))
        .when(tag == "LOC", F.array_intersect("kb_ids", loc_ids))
        .when(tag == "ORG", F.array_intersect("kb_ids", org_ids))
        .otherwise(F.array().cast("array<string>"))
    )
    chosen = F.coalesce(
        F.element_at(preferred, 1),
        F.element_at(F.col("kb_ids"), 1),
    )
    out = (
        joined.withColumn("kb_id", chosen)
        .withColumn("kb_name", F.lit(None).cast("string"))
        .withColumn(
            "link_score",
            F.when(F.col("kb_id").isNotNull(), F.lit(0.95)).otherwise(F.lit(0.0)),
        )
        .drop("alias", "kb_ids")
    )
    if fuzzy:
        out = _fuzzy_fill(out, aliases, fuzzy_threshold)
    return out


def _fuzzy_fill(linked: DataFrame, aliases: DataFrame, threshold: float) -> DataFrame:
    """MinHashLSH blocking: fuzzy-match unlinked surfaces to aliases on
    character 3-gram Jaccard similarity (pyspark.ml MinHashLSH)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    spark = linked.sparkSession
    misses = (
        linked.where(F.col("kb_id").isNull())
        .select("surface")
        .distinct()
        .withColumn("shingles", _char_shingles("surface"))
        .where(F.size("shingles") > 0)
    )
    cands = aliases.select(F.col("alias").alias("surface"), "kb_id").withColumn(
        "shingles", _char_shingles("surface")
    ).where(F.size("shingles") > 0)

    if misses.isEmpty() or cands.isEmpty():
        return linked

    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18)
    # localCheckpoint pins the size()>0 filters before the LSH hash UDF
    # (Catalyst may reorder the two deterministic predicates, feeding
    # the hash an all-zero vector — same guard as fuzzy_surface_edges)
    a = tf.transform(misses).localCheckpoint(eager=True)
    b = tf.transform(cands).localCheckpoint(eager=True)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=4, seed=42)
    model = lsh.fit(a)
    pairs = (
        # inclusive ≥-threshold semantics (approxSimilarityJoin alone
        # is strict-<; same boundary fix as fuzzy_surface_edges)
        model.approxSimilarityJoin(
            a, b, min(1.0, 1.0 - threshold + 1e-9), distCol="dist"
        )
        .where((F.lit(1.0) - F.col("dist")) >= F.lit(threshold))
        .select(
            F.col("datasetA.surface").alias("surface"),
            F.col("datasetB.kb_id").alias("fuzzy_kb_id"),
            (1.0 - F.col("dist")).alias("fuzzy_score"),
        )
    )
    best = pairs.groupBy("surface").agg(
        F.max(F.struct("fuzzy_score", "fuzzy_kb_id")).alias("b")
    ).select("surface", F.col("b.fuzzy_kb_id"), F.col("b.fuzzy_score"))

    return (
        linked.join(F.broadcast(best), "surface", "left")
        .withColumn("kb_id", F.coalesce("kb_id", "fuzzy_kb_id"))
        .withColumn(
            "link_score",
            F.when(F.col("link_score") > 0, F.col("link_score")).otherwise(
                F.coalesce("fuzzy_score", F.lit(0.0))
            ),
        )
        .drop("fuzzy_kb_id", "fuzzy_score")
    )


def _char_shingles(col: str, n: int = 3) -> F.Column:
    """Distinct character n-grams of a string column (built-in only).

    Guarded for short strings: Spark's ``sequence(1, 0)`` counts DOWN
    (yielding [1, 0]), so without the ``length >= n`` guard a 1-char
    surface would produce spurious degenerate shingles that pass the
    emptiness filters."""
    s = F.col(col)
    idx = F.sequence(F.lit(1), F.length(s) - (n - 1))
    return F.when(
        F.length(s) >= n,
        F.array_distinct(F.transform(idx, lambda i: s.substr(i, F.lit(n)))),
    ).otherwise(F.array().cast("array<string>"))

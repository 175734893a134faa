"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship KG-construction pipeline; ``queries()``
exposes one callable per implemented operator family (SURVEY.md §2 plus
the training-data curation layer); ``oracle_sql()`` gives the DuckDB
twin for ALL 34 keys.  SQL-expressible queries get direct oracles —
including the full KG triple pipeline and the GLiNER simulator via
gold-span variants (``ner_spark.plans.kg_gold``) whose oracles fold the
KB / trigger tables in as literals and express connected components and
greedy NMS as recursive CTEs.  The 3 tagger-driven keys
(``mentions_hybrid``, ``mentions_crf``, ``kg_triples_tagged``) run the
vectorized NER kernel, which is not SQL-expressible — their oracles
instead fold ``tests/goldens/goldens.json`` in as VALUES: the goldens
are certified against the compiled Rust reference binary
(``tools/rust_diff``, P/R 1.0000 every mode), so the oracle's
provenance is the reference, not the engine under test.

Column names and rounding are kept in lockstep between each Spark query
and its oracle — the driver hash-compares values after sorting columns
by name.
"""

from __future__ import annotations

import os
import sys
import tempfile
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_DEFAULT = "/root/testdata/sf0.001"
FIXTURE_ROWS = 102  # 2× the 51 reference fixture texts

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))

# Sentinel for "argument not supplied" where None is itself meaningful
# (e.g. an explicit cap opt-out that must mirror the Spark operator).
_UNSET = object()
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

_PKG_ZIP: str | None = None


def _ensure_pkg(spark: SparkSession) -> None:
    """Ship ner_spark to executor Python workers (spark-submit
    --py-files equivalent) so the contract works however the driver
    built its SparkSession."""
    global _PKG_ZIP
    if _PKG_ZIP is None:
        path = os.path.join(tempfile.gettempdir(), "ner_spark_pyfiles.zip")
        with zipfile.ZipFile(path, "w") as z:
            pkg = os.path.join(_REPO_ROOT, "ner_spark")
            for dirpath, _dirs, files in os.walk(pkg):
                for f in sorted(files):
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        z.write(full, os.path.relpath(full, _REPO_ROOT))
        _PKG_ZIP = path
    try:
        spark.sparkContext.addPyFile(_PKG_ZIP)
    except Exception:
        pass  # already registered in this context


# --------------------------------------------------------------- helpers

def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the test parquet is one small file → one input split; spread it
    # across the cores (at real scale the table has many splits and
    # this repartition is dropped)
    return spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = _emb(spark, sf_dir).where("vec_id = 0").select("embedding").first()
    return [float(x) for x in row[0]]


def _fixture_source(spark: SparkSession) -> DataFrame:
    from ner_spark.sources.fixtures import source_table

    return source_table(spark, n_rows=FIXTURE_ROWS)


def _kg_triples(spark: SparkSession, source: DataFrame) -> DataFrame:
    """Full 4-stage KG pipeline, in-memory (checkpointed variant lives
    in ner_spark.plans.job.KgJob)."""
    from ner_spark.operators.canonicalize import canonicalize
    from ner_spark.operators.link import disambiguate, link_mentions
    from ner_spark.operators.materialize import materialize_triples
    from ner_spark.operators.tag import extract_mentions

    links = link_mentions(disambiguate(extract_mentions(source)))
    # checkpoint only the columns the downstream stages read: the
    # in-memory checkpoint is row-oriented (no column pruning), so
    # carrying mention_text/context_window/offsets through it would
    # multiply the bytes re-scanned by canonicalize + materialize
    slim = links.select(
        "repo", "path", "surface", "kb_id", "resolved_category", "link_score"
    ).localCheckpoint(eager=True)  # reused by 2 downstream stages
    return materialize_triples(slim, canonicalize(slim))


# --------------------------------------------------------------- contract

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: KG triples over sf0.001 documents + fixture corpus."""
    _ensure_pkg(spark)
    from ner_spark.sources.fixtures import source_from_documents

    source = source_from_documents(spark, SF_DEFAULT).unionByName(
        _fixture_source(spark)
    )
    return _kg_triples(spark, source)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ner_spark.operators import curate, dedup, multimodal, similarity
    from ner_spark.plans import analytics as A

    def q_dedup_exact(spark, sf):
        return dedup.exact_dup_groups(_docs(spark, sf))

    def q_dedup_ngram_jaccard(spark, sf):
        return dedup.ngram_jaccard_pairs(_docs(spark, sf), n=3, top_k=50)

    def q_minhash_lsh_dedup(spark, sf):
        return dedup.minhash_lsh_dup_pairs(_docs(spark, sf))

    def q_simhash_buckets(spark, sf):
        return dedup.simhash_buckets(_docs(spark, sf))

    def q_dedup_clusters(spark, sf):
        return dedup.dedup_clusters(_docs(spark, sf))

    def q_embedding_near_dup(spark, sf):
        return dedup.embedding_topk_pairs(_emb(spark, sf), top_k=20)

    def q_embedding_near_dup_ivf(spark, sf):
        return dedup.embedding_topk_pairs_ivf(_emb(spark, sf), top_k=20)

    def q_text_quality(spark, sf):
        return A.text_quality(_docs(spark, sf))

    def q_token_counts(spark, sf):
        return A.token_counts(_docs(spark, sf))

    def q_lang_id(spark, sf):
        return A.lang_id(_docs(spark, sf))

    def q_doc_fingerprint(spark, sf):
        return A.doc_fingerprint(_docs(spark, sf))

    def q_similarity_topk(spark, sf):
        return similarity.cosine_topk(
            _emb(spark, sf), _query_vec(spark, sf), k=10, exclude_vec_id=0
        )

    def q_ann_lsh(spark, sf):
        return similarity.ann_lsh_topk(
            _emb(spark, sf), _query_vec(spark, sf), k=10, exclude_vec_id=0
        )

    def q_ann_ivf(spark, sf):
        return similarity.ann_ivf_topk(
            _emb(spark, sf), _query_vec(spark, sf), k=10, exclude_vec_id=0
        )

    def _quant_features(mf):
        # serialize the 16-d feature vector for the contract surface:
        # the driver canonicalizer sorts columns, which raw arrays break.
        # Quantized to 1e-4 ints (floor(x·10⁴ + .5) — identical double
        # arithmetic on both engines since float32→double is exact).
        quant = F.transform(
            "features",
            lambda x: F.floor(x.cast("double") * 10000 + F.lit(0.5)).cast("string"),
        )
        return mf.select(
            "media_id", "modality", "n_bytes",
            F.concat_ws(",", quant).alias("features_q"),
        )

    def q_media_features(spark, sf):
        return _quant_features(multimodal.extract_media_features(
            multimodal.docs_as_media(_docs(spark, sf))
        ))

    def q_media_features_netpbm(spark, sf):
        # REAL decode path: text bytes wrapped as binary P5 PGM, decoded
        # by the actual netpbm decoder (no stand-in anywhere).
        return _quant_features(multimodal.extract_media_features(
            multimodal.docs_as_netpbm(_docs(spark, sf)), use_stub=False
        ))

    def q_media_features_wav(spark, sf):
        # REAL decode path: text bytes as 8-bit PCM RIFF/WAVE samples,
        # decoded by the actual WAV chunk walker (no stand-in anywhere).
        return _quant_features(multimodal.extract_media_features(
            multimodal.docs_as_wav(_docs(spark, sf)), use_stub=False
        ))

    def q_media_features_png(spark, sf):
        # REAL COMPRESSED decode path: text bytes zlib-deflated into a
        # 1-row grayscale PNG, decoded by the actual inflate + unfilter
        # decoder (no stand-in anywhere).  Gray luminance IS the raw
        # byte stream, so the histogram oracle equals the netpbm key's;
        # the container size is not SQL-expressible (deflate output
        # length), so this key projects the features only.
        return _quant_features(multimodal.extract_media_features(
            multimodal.docs_as_png(_docs(spark, sf)), use_stub=False
        )).drop("n_bytes")

    def q_frame_features_y4m(spark, sf):
        # REAL per-frame decode: text bytes chopped into fixed 8-byte
        # luma frames of one multi-frame y4m stream per doc; the y4m
        # parser yields every frame, extract_frame_features emits one
        # row per frame with that frame's real histogram.
        quant = F.transform(
            "features",
            lambda x: F.floor(x.cast("double") * 10000 + F.lit(0.5)).cast("string"),
        )
        return multimodal.extract_frame_features(
            multimodal.docs_as_y4m_frames(_docs(spark, sf))
        ).select(
            "media_id", "frame_no",
            F.concat_ws(",", quant).alias("features_q"),
        )

    def q_media_near_dup(spark, sf):
        # composed multimodal curation: REAL netpbm decode → histogram
        # features → dominant-bin-blocked cosine near-dup pairs
        return multimodal.media_topk_pairs(multimodal.extract_media_features(
            multimodal.docs_as_netpbm(_docs(spark, sf)), use_stub=False
        ))

    def q_media_features_y4m(spark, sf):
        # REAL decode path: text bytes as the luma plane of a
        # single-frame monochrome YUV4MPEG2 stream, decoded by the
        # actual y4m frame parser (no stand-in anywhere).
        return _quant_features(multimodal.extract_media_features(
            multimodal.docs_as_y4m(_docs(spark, sf)), use_stub=False
        ))

    def q_tpch_pricing(spark, sf):
        return A.tpch_pricing_summary(_tbl(spark, sf, "lineitem"))

    def q_top_customers(spark, sf):
        return A.top_customers(
            _tbl(spark, sf, "orders"), _tbl(spark, sf, "customer"),
            _tbl(spark, sf, "nation"), _tbl(spark, sf, "region"),
        )

    def q_events_hourly(spark, sf):
        return A.events_hourly(_tbl(spark, sf, "events"))

    def q_events_sessions(spark, sf):
        return A.events_sessions(_tbl(spark, sf, "events"))

    def q_hmm_transitions(spark, sf):
        return A.hmm_transition_counts(A.corpus_tokens_df(spark))

    def q_hmm_emissions(spark, sf):
        return A.hmm_emission_counts(A.corpus_tokens_df(spark))

    def q_gazetteer_compile(spark, sf):
        return A.gazetteer_surfaces(A.corpus_tokens_df(spark))

    def q_bio_gold_spans(spark, sf):
        return A.gold_bio_spans(A.corpus_tokens_df(spark))

    def _mentions(spark, mode):
        # context_window is array<string> inside the pipeline (NED
        # consumes it); the contract projection joins it to one string
        # so the driver canonicalizer can sort/hash the rows.
        # confidence goes through stable_round(·, 6) so the goldens
        # oracle (which quantizes with the identical BigDecimal-HALF_UP
        # arithmetic) hash-matches bit-for-bit.
        from ner_spark.functions.text import stable_round
        from ner_spark.operators.tag import extract_mentions

        return (
            extract_mentions(_fixture_source(spark), mode=mode)
            .withColumn("context_window", F.concat_ws(" ", "context_window"))
            .withColumn("confidence", stable_round(F.col("confidence"), 6))
        )

    def q_mentions_hybrid(spark, sf):
        return _mentions(spark, "hybrid")

    def q_mentions_crf(spark, sf):
        return _mentions(spark, "crf_only")

    def q_kg_triples(spark, sf):
        # gold-span-driven variant: real NED/NEL/canonicalize/
        # materialize operators, fully value-checked by the DuckDB twin
        from ner_spark.plans.kg_gold import kg_triples_gold

        return kg_triples_gold(spark)

    def q_kg_triples_tagged(spark, sf):
        # full pipeline from the vectorized NER tagger; value-checked
        # by _kg_tagged_oracle(), which feeds the Rust-certified golden
        # mentions through the same DuckDB kg chain
        return _kg_triples(spark, _fixture_source(spark))

    def q_sota_gliner(spark, sf):
        from ner_spark.plans.kg_gold import sota_gold

        return sota_gold(spark)

    def q_kg_entities_fuzzy(spark, sf):
        # fuzzy canonicalization over the gold link table: exact
        # Jaccard pair finder, so the oracle's shingle-join pair
        # enumeration is an exhaustive value check
        from ner_spark.plans.kg_gold import entities_fuzzy_gold

        return entities_fuzzy_gold(spark)

    def q_kg_entity_degree(spark, sf):
        # analytics over the constructed KG: per-node in/out triple
        # counts + evidence mass (two map-side-combinable groupBys)
        from ner_spark.plans.kg_analytics import entity_degree
        from ner_spark.plans.kg_gold import kg_triples_gold

        return entity_degree(kg_triples_gold(spark))

    def q_kg_pagerank(spark, sf):
        # fixed-3-iteration PageRank over the triple graph; rank
        # quantized to 1e-6 ints for the hash compare (float sums are
        # order-dependent across engines)
        from ner_spark.plans.kg_analytics import pagerank
        from ner_spark.plans.kg_gold import kg_triples_gold

        return pagerank(kg_triples_gold(spark), iterations=3).select(
            "node",
            F.floor(F.col("rank") * 1000000 + F.lit(0.5))
            .cast("bigint")
            .alias("rank_q"),
        )

    def q_kg_comention_pmi(spark, sf):
        # co-mention PMI over the MENTIONED_WITH pairs; pmi quantized
        # to 1e-6 ints for the hash compare (same convention as
        # kg_pagerank)
        from ner_spark.plans.kg_analytics import comention_pmi
        from ner_spark.plans.kg_gold import kg_triples_gold

        return comention_pmi(kg_triples_gold(spark)).select(
            "subj",
            "obj",
            "evidence_count",
            F.floor(F.col("pmi") * 1000000 + F.lit(0.5))
            .cast("bigint")
            .alias("pmi_q"),
        )

    def q_kg_related_topk(spark, sf):
        # top-3 related entities per node by PMI: partitioned rank
        # window (per-node state only, never a global sort)
        from ner_spark.plans.kg_analytics import related_topk
        from ner_spark.plans.kg_gold import kg_triples_gold

        return related_topk(kg_triples_gold(spark), k=3).select(
            "node",
            "related",
            F.floor(F.col("pmi") * 1000000 + F.lit(0.5))
            .cast("bigint")
            .alias("pmi_q"),
            "rnk",
        )

    def q_kg_hits(spark, sf):
        # fixed-iteration HITS hubs/authorities, L1-normalized
        # (quantized to 1e-6 like pagerank — float sums whose order
        # each engine picks independently)
        from ner_spark.plans.kg_analytics import hits
        from ner_spark.plans.kg_gold import kg_triples_gold

        return hits(kg_triples_gold(spark), iterations=3).select(
            "node",
            F.floor(F.col("hub") * 1000000 + F.lit(0.5))
            .cast("bigint").alias("hub_q"),
            F.floor(F.col("authority") * 1000000 + F.lit(0.5))
            .cast("bigint").alias("authority_q"),
        )

    def q_kg_link_prediction(spark, sf):
        # top-k predicted edges by neighborhood overlap — the ranking
        # key (jaccard) is a ratio of exact integers, so the cut is
        # engine-portable; both scores quantize for the hash compare
        from ner_spark.plans.kg_analytics import link_prediction
        from ner_spark.plans.kg_gold import kg_triples_gold

        return link_prediction(kg_triples_gold(spark), k=20).select(
            "node_a", "node_b", "common_neighbors",
            F.floor(F.col("jaccard") * 1000000 + F.lit(0.5))
            .cast("bigint").alias("jaccard_q"),
            F.floor(F.col("adamic_adar") * 1000000 + F.lit(0.5))
            .cast("bigint").alias("adamic_adar_q"),
        )

    def q_kg_triangles(spark, sf):
        # per-node triangle counts + clustering coefficient via the
        # degree-oriented wedge join; coefficient quantized at 1e-6
        from ner_spark.plans.kg_analytics import triangles
        from ner_spark.plans.kg_gold import kg_triples_gold

        return triangles(kg_triples_gold(spark)).select(
            "node",
            F.col("degree").cast("bigint").alias("degree"),
            "triangles",
            F.floor(F.col("clustering_coeff") * 1000000 + F.lit(0.5))
            .cast("bigint")
            .alias("clustering_coeff_q"),
        )

    def q_kg_components(spark, sf):
        # undirected CC over the triple graph through the same salted
        # min-label-propagation loop the canonicalize stage uses
        from ner_spark.plans.kg_analytics import graph_components
        from ner_spark.plans.kg_gold import kg_triples_gold

        return graph_components(kg_triples_gold(spark))

    def q_kg_communities(spark, sf):
        # synchronous 3-round label propagation; deterministic because
        # the update is simultaneous and ties break (count DESC, label
        # ASC) — value-checked against the chained-CTE DuckDB unroll
        from ner_spark.plans.kg_analytics import label_propagation
        from ner_spark.plans.kg_gold import kg_triples_gold

        return label_propagation(kg_triples_gold(spark), iterations=3)

    def q_kg_distances(spark, sf):
        # multi-source BFS from the repo: vertices, ≤3 hops; frontier
        # implementation vs the oracle's full-relaxation min — equal on
        # unweighted graphs
        from ner_spark.plans.kg_analytics import bfs_distances
        from ner_spark.plans.kg_gold import kg_triples_gold

        return bfs_distances(kg_triples_gold(spark), max_hops=3)

    def q_kmv_distinct(spark, sf):
        # per-language KMV distinct-content sketch; the k minima come
        # from a rank window Spark 4 rewrites into a pushed-down
        # group-limit, and the estimate division is exact-input IEEE in
        # both engines
        return curate.kmv_distinct(_docs(spark, sf), k=64)

    def q_kg_pattern(spark, sf):
        # SPARQL-style BGP over the gold KG: repos whose declared
        # entities co-mention a KB-linked entity — constants compile
        # to pushed filters, shared variables to equi-joins
        from ner_spark.plans.kg_gold import kg_triples_gold
        from ner_spark.plans.kg_query import match_pattern

        return match_pattern(kg_triples_gold(spark), _PATTERN)

    def q_kg_pattern_optional(spark, sf):
        # OPTIONAL (left-join) semantics: co-mention pairs keep their
        # binding even when the partner has no KB link (kb null)
        from ner_spark.plans.kg_gold import kg_triples_gold
        from ner_spark.plans.kg_query import match_pattern

        out = match_pattern(
            kg_triples_gold(spark), _PATTERN[:2],
            optional=[("?x", "LINKED_TO", "?kb")],
        )
        # sentinel-fill the nullable OPTIONAL column for the hash
        # compare (the oracle's fill_null does the same)
        return out.withColumn("kb", F.coalesce("kb", F.lit("")))

    def q_kg_pattern_filter(spark, sf):
        # SPARQL FILTER over the OPTIONAL binding: the regex on ?kb
        # drops the null (unmatched-OPTIONAL) rows — SPARQL's
        # error-eliminates-row rule — and the var-var / substring
        # filters exercise the comparison and function grammars
        from ner_spark.plans.kg_gold import kg_triples_gold
        from ner_spark.plans.kg_query import match_pattern

        return match_pattern(
            kg_triples_gold(spark), _PATTERN[:2],
            optional=[("?x", "LINKED_TO", "?kb")],
            filters=_PATTERN_FILTERS,
        )

    def q_kg_construct(spark, sf):
        # SPARQL CONSTRUCT: derive new triples from BGP bindings — the
        # rule-based enrichment surface.  The first template element
        # projects through the OPTIONAL ?kb (null bindings drop, per
        # SPARQL's ill-formed-triple rule); the second collapses the
        # co-declaration multiset, so evidence_count > 1 rows pin the
        # set semantics
        from ner_spark.plans.kg_gold import kg_triples_gold
        from ner_spark.plans.kg_query import construct

        return construct(
            kg_triples_gold(spark), _PATTERN[:2],
            template=_CONSTRUCT_TEMPLATE,
            optional=[("?x", "LINKED_TO", "?kb")],
        )

    def q_kg_pattern_path(spark, sf):
        # SPARQL property path: entities transitively co-mentioned with
        # a declared entity (MENTIONED_WITH+ = 1..n hops) — the closure
        # is a semi-naive frontier loop over ONE pred's edges, with SET
        # semantics matched by the oracle's recursive-CTE UNION
        from ner_spark.plans.kg_gold import kg_triples_gold
        from ner_spark.plans.kg_query import match_pattern

        return match_pattern(kg_triples_gold(spark), _PATTERN_PATH)

    def q_kg_pattern_seq(spark, sf):
        # SPARQL sequence path: repos reaching a KB-linked co-mention
        # partner through DECLARES/MENTIONED_WITH — ONE element whose
        # existential intermediate (?e) is projected away WITHOUT
        # dedup, SPARQL's multiset sequence semantics (two declared
        # entities co-mentioning the same partner → two rows).  The
        # chain compiles to equi-joins on fresh intermediate columns;
        # the oracle joins the same chain in a non-recursive CTE.
        from ner_spark.plans.kg_gold import kg_triples_gold
        from ner_spark.plans.kg_query import match_pattern

        return match_pattern(kg_triples_gold(spark), _PATTERN_SEQ)

    def q_kg_pattern_zero_or_one(spark, sf):
        # SPARQL zero-or-one path (P?): each declared entity paired
        # with itself (the zero-length path matches every graph term)
        # plus its direct co-mention partners — SET semantics like the
        # other closure forms, one bounded closure round (max_hops=1)
        from ner_spark.plans.kg_gold import kg_triples_gold
        from ner_spark.plans.kg_query import match_pattern

        return match_pattern(kg_triples_gold(spark), _PATTERN_ZOO)

    def q_kg_pattern_negation(spark, sf):
        # SPARQL FILTER NOT EXISTS: declared entities with NO KB link —
        # compiled to a left-anti join on the shared variable, the
        # oracle's correlated NOT EXISTS
        from ner_spark.plans.kg_gold import kg_triples_gold
        from ner_spark.plans.kg_query import match_pattern

        return match_pattern(kg_triples_gold(spark), _PATTERN_NEG,
                             negation=_PATTERN_NEG_GROUPS)

    def q_kg_pattern_exists(spark, sf):
        # SPARQL FILTER EXISTS: co-mention bindings whose partner HAS
        # a KB link — the positive twin of negation, compiled to a
        # left-semi join on the shared variable (the oracle's
        # correlated EXISTS).  Together with kg_pattern_minus this
        # partitions the base binding set: |exists| + |minus| = |base|
        from ner_spark.plans.kg_gold import kg_triples_gold
        from ner_spark.plans.kg_query import match_pattern

        return match_pattern(kg_triples_gold(spark), _PATTERN_EM_BASE,
                             existence=_PATTERN_EM_GROUPS)

    def q_kg_pattern_minus(spark, sf):
        # SPARQL MINUS: the same base minus bindings compatible with a
        # KB-linked partner — set-difference semantics (the group is
        # an INDEPENDENT pattern; a disjoint-domain group would remove
        # nothing, unlike NOT EXISTS), compiled to a distinct-build
        # hash anti-join on the shared required variable
        from ner_spark.plans.kg_gold import kg_triples_gold
        from ner_spark.plans.kg_query import match_pattern

        return match_pattern(kg_triples_gold(spark), _PATTERN_EM_BASE,
                             minus=_PATTERN_EM_GROUPS)

    def q_kg_pattern_agg(spark, sf):
        # SPARQL solution modifiers: GROUP BY + aggregates over the
        # 3-hop BGP, ordered and limited — (n_bindings DESC, repo ASC)
        # is a total order (repo is the group key), so the LIMIT cut
        # is deterministic and the hash compare is stable.  The plan
        # is one map-side-combinable groupBy + TakeOrderedAndProject.
        from ner_spark.plans.kg_gold import kg_triples_gold
        from ner_spark.plans.kg_query import solutions

        return solutions(
            kg_triples_gold(spark), _PATTERN,
            group_by=["?repo"],
            aggregates=_PATTERN_AGGS,
            order_by=["n_bindings DESC", "repo ASC"],
            limit=5,
        )

    def q_kg_pattern_union(spark, sf):
        # SPARQL UNION: every KB-grounded relationship an entity has —
        # via its declaring repo OR via a co-mention partner.  Branch 1
        # never binds ?x and branch 2 never binds ?repo (SPARQL
        # unbound → null; sentinel-filled for the hash compare like
        # the OPTIONAL key), and the outer FILTER spans both branches.
        from ner_spark.plans.kg_gold import kg_triples_gold
        from ner_spark.plans.kg_query import match_union

        out = match_union(kg_triples_gold(spark), _PATTERN_UNION,
                          filters=_PATTERN_UNION_FILTERS)
        return out.withColumn("repo", F.coalesce("repo", F.lit(""))) \
                  .withColumn("x", F.coalesce("x", F.lit("")))

    def q_kg_pattern_values(spark, sf):
        # SPARQL VALUES: the inline data block pins ?p to two
        # predicates (broadcast hash equi-join on the literal table)
        # and annotates each with a data-only ?tag variable — UNDEF
        # for LINKED_TO, so those rows carry an unbound (null) tag,
        # sentinel-filled for the hash compare
        from ner_spark.plans.kg_gold import kg_triples_gold
        from ner_spark.plans.kg_query import match_pattern

        out = match_pattern(kg_triples_gold(spark),
                            [("?s", "?p", "?o")],
                            values=_PATTERN_VALUES)
        return out.withColumn("tag", F.coalesce("tag", F.lit("")))

    def _sparql_gold(spark, text):
        from ner_spark.plans.kg_gold import kg_triples_gold
        from ner_spark.plans.sparql import sparql

        return sparql(kg_triples_gold(spark), text)

    def q_kg_sparql(spark, sf):
        # the SPARQL text front-end, SELECT form: parse → solutions()
        # — the same aggregate/order/limit machinery the kg_pattern_agg
        # key certifies, but entered as the query string a user types
        return _sparql_gold(spark, _SPARQL_SELECT)

    def q_kg_sparql_ask(spark, sf):
        # ASK form: existence probe compiled as LIMIT 1 over the
        # bindings (stops at the first match, never materializes all)
        return _sparql_gold(spark, _SPARQL_ASK)

    def q_kg_sparql_construct(spark, sf):
        # CONSTRUCT form: two-element template with evidence_count
        return _sparql_gold(spark, _SPARQL_CONSTRUCT)

    def q_kg_sparql_pathforms(spark, sf):
        # inverse + alternation path forms entered as text
        return _sparql_gold(spark, _SPARQL_PATHFORMS)

    def q_kg_sparql_seq(spark, sf):
        # sequence path with a parenthesized-alternation segment and a
        # closure segment, entered as text — exercises the seqpath
        # token class end-to-end (text → segments → chain join)
        return _sparql_gold(spark, _SPARQL_SEQ)

    def q_kg_sparql_bind(spark, sf):
        # BIND assignments: chained (the second references the
        # first), LCASE/STRLEN scalar builders, and a FILTER over a
        # BIND variable (binds evaluate before group-scope filters) —
        # pure projections, no new joins in either engine
        return _sparql_gold(spark, _SPARQL_BIND)

    def q_kg_sparql_describe(spark, sf):
        # DESCRIBE form: the triple set touching the described nodes
        # (two hash joins on the deduped node set + union + distinct)
        return _sparql_gold(spark, _SPARQL_DESCRIBE)

    def q_kg_sparql_having(spark, sf):
        # HAVING over a COUNT alias + ORDER/LIMIT/OFFSET paging (page
        # 2 of the deterministic (n DESC, repo) order)
        return _sparql_gold(spark, _SPARQL_HAVING)

    def q_kg_sparql_minus(spark, sf):
        # MINUS + FILTER EXISTS entered as text: both negation forms
        # in one group, parsed once and shared with the oracle
        return _sparql_gold(spark, _SPARQL_MINUS)

    def q_kg_sparql_negset(spark, sf):
        # negated property set !(P1|P2) entered as text: one pruned
        # NOT IN edge scan, aggregated per subject
        return _sparql_gold(spark, _SPARQL_NEGSET)

    def q_kg_sparql_subquery(spark, sf):
        # SPARQL 1.1 subquery: nested SELECT aggregates bottom-up,
        # equi-joins into the outer BGP on the shared required var
        return _sparql_gold(spark, _SPARQL_SUBQUERY)

    def q_kg_sparql_strfns(spark, sf):
        # COALESCE/SUBSTR/REPLACE builders — all outputs non-null by
        # construction (coalesce default), so no sentinel fill
        return _sparql_gold(spark, _SPARQL_STRFNS)

    def q_kg_ntriples(spark, sf):
        # N-Triples interchange serialization of the gold KG —
        # data + reified evidence lines, pure per-row projection
        from ner_spark.plans.kg_export import ntriples_lines
        from ner_spark.plans.kg_gold import kg_triples_gold

        return ntriples_lines(kg_triples_gold(spark), evidence=True)

    def q_kg_ntriples_roundtrip(spark, sf):
        # serialize → parse must be the identity on the gold KG
        # (evidence lines re-attach their counts); the oracle is the
        # gold triples oracle itself
        from ner_spark.plans.kg_export import (ntriples_lines,
                                               ntriples_parse)
        from ner_spark.plans.kg_gold import kg_triples_gold

        return ntriples_parse(
            ntriples_lines(kg_triples_gold(spark), evidence=True))

    def q_kg_sparql_optgroup(spark, sf):
        # OPTIONAL GROUP with a local FILTER and BIND: the filter
        # applies INSIDE the group (left-join-with-condition — outer
        # rows survive with null group bindings), the BIND projects
        # inside; nullable outputs sentinel-filled for the compare
        out = _sparql_gold(spark, _SPARQL_OPTGROUP)
        return (out.withColumn("kb", F.coalesce("kb", F.lit("")))
                   .withColumn("tag", F.coalesce("tag", F.lit(""))))

    def q_kg_sparql_numagg(spark, sf):
        # SUM/AVG (exact-decimal sums surfacing as DOUBLE),
        # GROUP_CONCAT with SEPARATOR, SELECT REDUCED
        return _sparql_gold(spark, _SPARQL_NUMAGG)

    def q_kg_sparql_condfns(spark, sf):
        # IF(compound condition)/STRBEFORE/STRAFTER/SHA256 builders —
        # pure projections over the OPTIONAL-extended BGP
        return _sparql_gold(spark, _SPARQL_CONDFNS)

    def q_kg_sparql_construct_where(spark, sf):
        # CONSTRUCT WHERE shorthand (pattern = template)
        return _sparql_gold(spark, _SPARQL_CONSTRUCT_WHERE)

    def q_kg_sparql_sample(spark, sf):
        # SAMPLE aggregate, pinned to MIN in both engines
        return _sparql_gold(spark, _SPARQL_SAMPLE)

    def q_kg_sparql_update(spark, sf):
        # SPARQL 1.1 Update as a pure transform over the gold store:
        # DELETE/INSERT templates instantiated from one pre-update
        # WHERE evaluation (kept rows keep evidence_count, new rows
        # enter with the derived binding count)
        from ner_spark.plans.kg_gold import kg_triples_gold
        from ner_spark.plans.kg_update import apply_update

        return apply_update(kg_triples_gold(spark), _SPARQL_UPDATE)

    def q_kg_sparql_boolexpr(spark, sf):
        # boolean FILTER expressions: ||/&&/! precedence, BOUND over
        # the OPTIONAL ?kb (negation-as-failure), IN / NOT IN — the
        # nullable ?kb column is sentinel-filled for the hash compare
        # (the oracle's fill_null does the same)
        out = _sparql_gold(spark, _SPARQL_BOOLEXPR)
        return out.withColumn("kb", F.coalesce("kb", F.lit("")))

    def q_dataset_split(spark, sf):
        return curate.dataset_split(_docs(spark, sf))

    def q_leakage_split(spark, sf):
        # near-dup-aware split: whole MinHash+LSH dup clusters move
        # together; singletons keep the plain dataset_split assignment
        return curate.leakage_safe_split(_docs(spark, sf))

    def q_contamination(spark, sf):
        # benchmark hygiene: flag corpus docs sharing ≥2 distinct
        # 3-gram shingles with the deterministic doc_id % 97 eval slice
        d = _docs(spark, sf)
        return curate.contamination_check(
            d, d.where(F.col("doc_id") % 97 == 0))

    def q_stratified_sample(spark, sf):
        # rebalance the training mix: downsample the dominant language
        return curate.stratified_sample(
            _docs(spark, sf), fractions={"en": 0.25}, default_frac=0.6
        )

    def q_vocab_topk(spark, sf):
        return curate.vocab_topk(_docs(spark, sf), n=2, k=50)

    def q_curate_corpus(spark, sf):
        # the sf corpora have no exact dups, so the contract variant
        # injects deterministic copies (doc_id + 1e6 for every 10th doc)
        # to exercise the duplicate rule; the oracle mirrors the union
        d = _docs(spark, sf)
        dups = d.where(F.col("doc_id") % 10 == 0).withColumn(
            "doc_id", F.col("doc_id") + F.lit(1000000)
        )
        return curate.curate_corpus(d.unionByName(dups))

    def q_redact_mentions(spark, sf):
        return A.redact_mentions(A.corpus_tokens_df(spark))

    def _gold_entailed(spark):
        # memoized per session: the entailment chain feeds two
        # contract keys (kg_entailment, kg_validation)
        cached = getattr(spark, "_ner_gold_entail_memo", None)
        if cached is not None:
            return cached
        from ner_spark.plans.kg_gold import kg_triples_gold
        from ner_spark.plans.kg_infer import entail, ontology

        out = entail(kg_triples_gold(spark), ontology(spark)).localCheckpoint(
            eager=True
        )
        spark._ner_gold_entail_memo = out
        return out

    def q_kg_quads(spark, sf):
        # the gold KG as named-graph quads (per-repo provenance for
        # DECLARES, shared graph for the rest) — plans/kg_gold.py
        from ner_spark.plans.kg_gold import kg_quads_gold

        return kg_quads_gold(spark)

    def q_kg_sparql_graph(spark, sf):
        # SPARQL GRAPH blocks over the quads: per-graph aggregate
        # (variable graph) — dataset semantics through the text
        # front-end
        from ner_spark.plans.kg_gold import kg_quads_gold
        from ner_spark.plans.sparql import sparql as run_sparql

        return run_sparql(kg_quads_gold(spark), _SPARQL_GRAPH)

    def q_kg_pattern_graph(spark, sf):
        # programmatic quad pattern: a variable-graph element chained
        # with a DEFAULT-graph element (the RDF-merge dedup path)
        from ner_spark.plans.kg_gold import kg_quads_gold
        from ner_spark.plans.kg_query import match_pattern

        return match_pattern(kg_quads_gold(spark), _PATTERN_GRAPH,
                             filters=_PATTERN_GRAPH_FILTERS)

    def q_kg_sparql_graph_path(spark, sf):
        # variable-graph property-path closure over the gold quads
        from ner_spark.plans.kg_gold import kg_quads_gold
        from ner_spark.plans.sparql import sparql as run_sparql

        return run_sparql(kg_quads_gold(spark), _SPARQL_GRAPH_PATH)

    def q_kg_rules(spark, sf):
        # CONSTRUCT-rule forward chaining to a fixpoint over the gold
        # KG: shared-entity RELATED_REPO, then a recursive CONNECTED
        # closure through it — plans/kg_rules.py
        from ner_spark.plans.kg_gold import kg_triples_gold
        from ner_spark.plans.kg_rules import materialize_rules

        return materialize_rules(kg_triples_gold(spark), _RULES)

    def q_kg_sparql_dataset(spark, sf):
        # FROM / FROM NAMED dataset clauses over the gold quads
        from ner_spark.plans.kg_gold import kg_quads_gold
        from ner_spark.plans.sparql import sparql as run_sparql

        return run_sparql(kg_quads_gold(spark), _SPARQL_DATASET)

    def q_kg_nquads(spark, sf):
        # N-Quads serialization of the provenance quads — graph label
        # as the fourth term, default-graph reified evidence lines
        from ner_spark.plans.kg_export import nquads_lines
        from ner_spark.plans.kg_gold import kg_quads_gold

        return nquads_lines(kg_quads_gold(spark), evidence=True)

    def q_kg_nquads_roundtrip(spark, sf):
        # serialize → parse must be the identity on the gold quads
        from ner_spark.plans.kg_export import nquads_lines, nquads_parse
        from ner_spark.plans.kg_gold import kg_quads_gold

        return nquads_parse(
            nquads_lines(kg_quads_gold(spark), evidence=True))

    def q_kg_entailment(spark, sf):
        # RDFS-lite forward chaining (rho-df rules) over the gold KG +
        # the committed demo ontology: schema closure then one
        # broadcast fact pass — plans/kg_infer.py
        return _gold_entailed(spark)

    def q_kg_validation(spark, sf):
        # SHACL-lite shape checking over the ENTAILED graph (class
        # targeting relies on the inferred INSTANCE_OF triples) —
        # plans/kg_validate.py
        from ner_spark.plans.kg_validate import shapes, validate

        return validate(_gold_entailed(spark), shapes(spark))

    def _with_pkg(fn):
        def wrapped(spark, sf):
            _ensure_pkg(spark)
            return fn(spark, sf)

        wrapped.__name__ = fn.__name__
        return wrapped

    return {k: _with_pkg(v) for k, v in {
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "minhash_lsh_dedup": q_minhash_lsh_dedup,
        "dedup_clusters": q_dedup_clusters,
        "simhash_buckets": q_simhash_buckets,
        "embedding_near_dup": q_embedding_near_dup,
        "embedding_near_dup_ivf": q_embedding_near_dup_ivf,
        "text_quality": q_text_quality,
        "token_counts": q_token_counts,
        "lang_id": q_lang_id,
        "doc_fingerprint": q_doc_fingerprint,
        "similarity_topk": q_similarity_topk,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "media_features": q_media_features,
        "media_features_netpbm": q_media_features_netpbm,
        "media_features_wav": q_media_features_wav,
        "media_features_png": q_media_features_png,
        "media_features_y4m": q_media_features_y4m,
        "frame_features_y4m": q_frame_features_y4m,
        "media_near_dup": q_media_near_dup,
        "tpch_pricing": q_tpch_pricing,
        "top_customers": q_top_customers,
        "events_hourly": q_events_hourly,
        "events_sessions": q_events_sessions,
        "hmm_transitions": q_hmm_transitions,
        "hmm_emissions": q_hmm_emissions,
        "gazetteer_compile": q_gazetteer_compile,
        "bio_gold_spans": q_bio_gold_spans,
        "mentions_hybrid": q_mentions_hybrid,
        "mentions_crf": q_mentions_crf,
        "kg_triples": q_kg_triples,
        "kg_triples_tagged": q_kg_triples_tagged,
        "kg_entities_fuzzy": q_kg_entities_fuzzy,
        "kg_entity_degree": q_kg_entity_degree,
        "kg_pagerank": q_kg_pagerank,
        "kg_components": q_kg_components,
        "kg_comention_pmi": q_kg_comention_pmi,
        "kg_related_topk": q_kg_related_topk,
        "kg_hits": q_kg_hits,
        "kg_link_prediction": q_kg_link_prediction,
        "kg_triangles": q_kg_triangles,
        "kg_communities": q_kg_communities,
        "kg_distances": q_kg_distances,
        "kmv_distinct": q_kmv_distinct,
        "kg_pattern": q_kg_pattern,
        "kg_pattern_optional": q_kg_pattern_optional,
        "kg_pattern_filter": q_kg_pattern_filter,
        "kg_construct": q_kg_construct,
        "kg_pattern_path": q_kg_pattern_path,
        "kg_pattern_seq": q_kg_pattern_seq,
        "kg_pattern_zero_or_one": q_kg_pattern_zero_or_one,
        "kg_pattern_negation": q_kg_pattern_negation,
        "kg_pattern_exists": q_kg_pattern_exists,
        "kg_pattern_minus": q_kg_pattern_minus,
        "kg_pattern_agg": q_kg_pattern_agg,
        "kg_pattern_union": q_kg_pattern_union,
        "kg_pattern_values": q_kg_pattern_values,
        "kg_sparql": q_kg_sparql,
        "kg_sparql_ask": q_kg_sparql_ask,
        "kg_sparql_construct": q_kg_sparql_construct,
        "kg_sparql_pathforms": q_kg_sparql_pathforms,
        "kg_sparql_seq": q_kg_sparql_seq,
        "kg_sparql_bind": q_kg_sparql_bind,
        "kg_sparql_having": q_kg_sparql_having,
        "kg_sparql_minus": q_kg_sparql_minus,
        "kg_sparql_negset": q_kg_sparql_negset,
        "kg_sparql_subquery": q_kg_sparql_subquery,
        "kg_sparql_boolexpr": q_kg_sparql_boolexpr,
        "kg_sparql_update": q_kg_sparql_update,
        "kg_sparql_construct_where": q_kg_sparql_construct_where,
        "kg_sparql_strfns": q_kg_sparql_strfns,
        "kg_sparql_condfns": q_kg_sparql_condfns,
        "kg_sparql_numagg": q_kg_sparql_numagg,
        "kg_sparql_optgroup": q_kg_sparql_optgroup,
        "kg_ntriples": q_kg_ntriples,
        "kg_ntriples_roundtrip": q_kg_ntriples_roundtrip,
        "kg_sparql_sample": q_kg_sparql_sample,
        "kg_sparql_describe": q_kg_sparql_describe,
        "sota_gliner": q_sota_gliner,
        "dataset_split": q_dataset_split,
        "leakage_split": q_leakage_split,
        "contamination": q_contamination,
        "stratified_sample": q_stratified_sample,
        "vocab_topk": q_vocab_topk,
        "curate_corpus": q_curate_corpus,
        "redact_mentions": q_redact_mentions,
        "kg_entailment": q_kg_entailment,
        "kg_validation": q_kg_validation,
        "kg_quads": q_kg_quads,
        "kg_sparql_graph": q_kg_sparql_graph,
        "kg_pattern_graph": q_kg_pattern_graph,
        "kg_sparql_dataset": q_kg_sparql_dataset,
        "kg_rules": q_kg_rules,
        "kg_sparql_graph_path": q_kg_sparql_graph_path,
        "kg_nquads": q_kg_nquads,
        "kg_nquads_roundtrip": q_kg_nquads_roundtrip,
    }.items()}


# ----------------------------------------------------------- oracle SQL

# the kg_pattern contract BGP: repos whose declared entities
# co-mention a KB-linked entity (3 hops across 3 predicates — a join
# chain no single-predicate query exercises)
_PATTERN = [
    ("?repo", "DECLARES", "?e"),
    ("?e", "MENTIONED_WITH", "?x"),
    ("?x", "LINKED_TO", "?kb"),
]

# the kg_sparql_graph contract query: per-named-graph DECLARES
# counts — GRAPH ?g with an aggregate over the graph variable
_SPARQL_GRAPH = (
    "SELECT ?g (COUNT(?e) AS ?n) WHERE "
    "{ GRAPH ?g { ?r DECLARES ?e } } "
    "GROUP BY ?g ORDER BY DESC(?n) ?g LIMIT 10")

# the kg_pattern_graph contract BGP: a variable-graph quad element
# (which repo-graph declares the entity) chained with a
# default-graph element (LINKED_TO lives in g:shared; the RDF-merge
# dedup path) plus a graph-variable FILTER
_PATTERN_GRAPH = [
    ("?g", "?r", "DECLARES", "?e"),
    ("?e", "LINKED_TO", "?kb"),
]
_PATTERN_GRAPH_FILTERS = ['strstarts(?g, "g:repo")']

# the kg_rules contract rule set: a join rule with a FILTER, a copy
# rule, and a RECURSIVE rule (left-linear closure) — the composition
# the rules engine exists for
_RULES = [
    'CONSTRUCT { ?a RELATED_REPO ?b } '
    'WHERE { ?a DECLARES ?e . ?b DECLARES ?e FILTER(?a != ?b) }',
    'CONSTRUCT { ?a CONNECTED ?b } WHERE { ?a RELATED_REPO ?b }',
    'CONSTRUCT { ?a CONNECTED ?c } '
    'WHERE { ?a CONNECTED ?b . ?b RELATED_REPO ?c }',
]

# the kg_sparql_graph_path contract query: a property-path CLOSURE
# under a VARIABLE graph — per-graph semi-naive fixpoint, graph term
# bound from the closure relation
_SPARQL_GRAPH_PATH = (
    "SELECT ?g ?e ?x WHERE { GRAPH ?g { ?e MENTIONED_WITH+ ?x } } "
    "ORDER BY ?e ?x LIMIT 40")

# the kg_sparql_dataset contract query: FROM merges two repo graphs
# into the default graph, FROM NAMED restricts which graphs GRAPH may
# bind — the full SPARQL dataset clause over the provenance quads
_SPARQL_DATASET = (
    "SELECT ?r ?e ?g FROM <g:repo0> FROM <g:repo1> "
    "FROM NAMED <g:shared> WHERE "
    "{ ?r DECLARES ?e . GRAPH ?g { ?e INSTANCE_OF ?c } } "
    "ORDER BY ?r ?e LIMIT 25")

# the kg_pattern_filter contract FILTERs: one of each grammar form —
# var-var comparison, substring, prefix, and a regex over the OPTIONAL
# variable (whose nulls it eliminates, per SPARQL error semantics)
_PATTERN_FILTERS = [
    "?e != ?x",
    'contains(?x, "pari")',
    'strstarts(?e, "ent:")',
    'regex(?kb, "[0-9]$")',
]

# the kg_pattern_path contract BGP: declared entities' transitive
# co-mention reachability (property path MENTIONED_WITH+)
_PATTERN_PATH = [
    ("?repo", "DECLARES", "?a"),
    ("?a", "MENTIONED_WITH+", "?b"),
]

# the kg_pattern_seq contract BGP: a 2-step sequence path (the
# intermediate declared entity is existential and unprojected —
# multiset semantics) into a plain element on the shared variable
_PATTERN_SEQ = [
    ("?repo", "DECLARES/MENTIONED_WITH", "?x"),
    ("?x", "LINKED_TO", "?kb"),
]

# the kg_pattern_zero_or_one contract BGP: P? = identity ∪ one hop,
# set semantics, one bounded closure round
_PATTERN_ZOO = [
    ("?repo", "DECLARES", "?e"),
    ("?e", "MENTIONED_WITH?", "?x"),
]

# the kg_pattern_negation contract BGP: declared entities with no KB
# link (FILTER NOT EXISTS correlated on ?e)
_PATTERN_NEG = [("?repo", "DECLARES", "?e")]
_PATTERN_NEG_GROUPS = [[("?e", "LINKED_TO", "?kb")]]

# the kg_pattern_exists / kg_pattern_minus contract base + group: the
# two keys partition the co-mention bindings by whether the partner
# has a KB link (FILTER EXISTS keeps, MINUS removes — the group
# shares the required ?x, so MINUS takes the hash anti-join path)
_PATTERN_EM_BASE = [
    ("?repo", "DECLARES", "?e"),
    ("?e", "MENTIONED_WITH", "?x"),
]
_PATTERN_EM_GROUPS = [[("?x", "LINKED_TO", "?kb")]]

# the kg_pattern_union contract groups: an entity's KB-grounded
# relationships via its declaring repo (branch 1, never binds ?x) OR
# via a co-mention partner (branch 2, never binds ?repo) — the
# branch-unbound variables are SPARQL unbound (null) and the outer
# FILTER applies across both branches
_PATTERN_UNION = [
    {"pattern": [("?repo", "DECLARES", "?e"),
                 ("?e", "LINKED_TO", "?kb")]},
    {"pattern": [("?e", "MENTIONED_WITH", "?x"),
                 ("?x", "LINKED_TO", "?kb")]},
]
_PATTERN_UNION_FILTERS = ['regex(?kb, "[0-9]$")']

# the kg_pattern_values contract data block: pin ?p to two predicates
# and annotate with a data-only ?tag (UNDEF = unbound for LINKED_TO)
_PATTERN_VALUES = (["?p", "?tag"],
                   [("DECLARES", "declared"), ("LINKED_TO", None)])

# the kg_sparql_* contract queries: one per query form, written as the
# TEXT a user would type — the Spark side and the oracle both consume
# the same parse (plans.sparql.parse_sparql), certifying text → plan
_SPARQL_SELECT = """
SELECT ?repo (COUNT(*) AS ?n) (COUNT(DISTINCT ?kb) AS ?kbs)
       (MIN(?kb) AS ?lo)
WHERE { ?repo DECLARES ?e . ?e MENTIONED_WITH ?x . ?x LINKED_TO ?kb
        FILTER STRSTARTS(?repo, "repo:") }
GROUP BY ?repo ORDER BY DESC(?n) ?repo LIMIT 6
"""
_SPARQL_ASK = 'ASK { ?e MENTIONED_WITH ?x . ?x LINKED_TO ?kb }'
# DESCRIBE: every triple touching a KB-linked declared entity
_SPARQL_DESCRIBE = """
DESCRIBE ?e WHERE { ?repo DECLARES ?e . ?e LINKED_TO ?kb }
"""
# HAVING (COUNT-alias group filter) + ORDER/LIMIT/OFFSET paging
_SPARQL_HAVING = """
SELECT ?repo (COUNT(*) AS ?n)
WHERE { ?repo DECLARES ?e . ?e MENTIONED_WITH ?x }
GROUP BY ?repo HAVING(?n >= 3) ORDER BY DESC(?n) ?repo
LIMIT 4 OFFSET 2
"""
# inverse path (^P = endpoint swap) + predicate alternation (P1|P2 =
# pred IN, one edge scan) through the text front-end
_SPARQL_PATHFORMS = """
SELECT ?repo ?t WHERE { ?e ^DECLARES ?repo .
                        ?e MENTIONED_WITH|LINKED_TO ?t }
"""
# sequence path through the text front-end: a parenthesized
# alternation segment composed with a closure segment — grouped so
# the aggregate pins the multiset multiplicity the sequence produces
_SPARQL_SEQ = """
SELECT ?repo (COUNT(*) AS ?n) (COUNT(DISTINCT ?kb) AS ?kbs)
WHERE { ?repo DECLARES/(MENTIONED_WITH|LINKED_TO)/LINKED_TO? ?kb }
GROUP BY ?repo ORDER BY DESC(?n) ?repo LIMIT 8
"""
# BIND: chained assignments (?tag references ?lkb) + a filter over a
# bound variable; LCASE/STRLEN keep to the ASCII KB ids so the scalar
# semantics are engine-portable byte-for-byte
_SPARQL_BIND = """
SELECT ?repo ?tag ?len WHERE {
  ?repo DECLARES ?e . ?e LINKED_TO ?kb
  BIND(LCASE(?kb) AS ?lkb)
  BIND(CONCAT(?lkb, "@", ?repo) AS ?tag)
  BIND(STRLEN(?e) AS ?len)
  FILTER STRENDS(?tag, "0")
}
"""
_SPARQL_CONSTRUCT = """
CONSTRUCT { ?r MENTIONS_KB ?kb . ?kb BACKED_BY ?r }
WHERE { ?r DECLARES ?e . ?e LINKED_TO ?kb }
"""
# CONSTRUCT WHERE shorthand: the BGP doubles as the template — the
# matched subgraph (KB-linked co-mentioning entities) comes back as a
# triple set whose evidence_count pins the binding multiplicity
_SPARQL_CONSTRUCT_WHERE = """
CONSTRUCT WHERE { ?e LINKED_TO ?kb . ?e MENTIONED_WITH ?x }
"""
# SAMPLE aggregate (pinned to MIN — deterministic engines cannot
# hash-match an arbitrary pick) alongside a COUNT per group
_SPARQL_SAMPLE = """
SELECT ?repo (SAMPLE(?kb) AS ?pick) (COUNT(*) AS ?n)
WHERE { ?repo DECLARES ?e . ?e LINKED_TO ?kb }
GROUP BY ?repo ORDER BY ?repo
"""
# MINUS (independent-group set difference) + FILTER EXISTS (positive
# correlated semi-join) in one group, entered as text: declared
# entities with a co-mention partner (EXISTS) that are NOT themselves
# KB-linked (MINUS) — the two forms compose conjunctively
_SPARQL_MINUS = """
SELECT ?repo ?e WHERE {
  ?repo DECLARES ?e
  FILTER EXISTS { ?e MENTIONED_WITH ?x }
  MINUS { ?e LINKED_TO ?kb }
}
"""
# SPARQL 1.1 subquery: a per-entity co-mention count aggregated
# bottom-up, joined into the outer declaration BGP on the shared
# required ?e — the nested SELECT keeps its own audited plan (one
# map-side-combinable group-by) and the join is a hash equi-join
_SPARQL_SUBQUERY = """
SELECT ?repo ?e ?n WHERE {
  ?repo DECLARES ?e
  { SELECT ?e (COUNT(*) AS ?n) WHERE { ?e MENTIONED_WITH ?x }
    GROUP BY ?e }
}
"""
# COALESCE / SUBSTR / REPLACE string builders in BIND: the OPTIONAL
# default-value idiom (coalesce never yields null, so no sentinel
# fill), 1-based 3-arg substring, and global regex replace ('g' flag
# on the DuckDB side — its default replaces only the first match)
_SPARQL_STRFNS = """
SELECT ?repo ?grounded ?prefix ?short WHERE {
  ?repo DECLARES ?e OPTIONAL { ?e LINKED_TO ?kb }
  BIND(COALESCE(?kb, "kb:none") AS ?grounded)
  BIND(SUBSTR(?e, 1, 6) AS ?prefix)
  BIND(REPLACE(?repo, "^repo:", "r/") AS ?short)
}
"""
# conditional + splitting + hashing builders: IF with a compound
# boolean condition over an OPTIONAL variable (error → ELSE in both
# engines), STRBEFORE/STRAFTER around the namespace colon (over a
# chained COALESCE bind, so they never see null here), and the
# SHA256 stable-surrogate-key idiom; every output is non-null by
# construction, so no sentinel fill
_SPARQL_CONDFNS = """
SELECT ?e ?ns ?qid ?status ?key WHERE {
  ?repo DECLARES ?e OPTIONAL { ?e LINKED_TO ?kb }
  BIND(COALESCE(?kb, "none:floating") AS ?g)
  BIND(STRBEFORE(?g, ":") AS ?ns)
  BIND(STRAFTER(?g, ":") AS ?qid)
  BIND(IF(BOUND(?kb) && STRENDS(?kb, "2"), "linked-2", "other") AS ?status)
  BIND(SHA256(?e) AS ?key)
}
"""
# numeric aggregates + parameterized GROUP_CONCAT + REDUCED: SUM/AVG
# over a STRLEN-bound numeric-string term (TRY_CAST decimal skips
# nothing here — every length is numeric — but the junk-skipping rule
# is pinned separately in pytest), a "|"-joined sorted-distinct
# entity list per repo, and SELECT REDUCED pinned to DISTINCT
_SPARQL_NUMAGG = """
SELECT REDUCED ?repo (SUM(?len) AS ?chars) (AVG(?len) AS ?avg_len)
       (GROUP_CONCAT(?e; SEPARATOR="|") AS ?ents)
WHERE { ?repo DECLARES ?e BIND(STRLEN(?e) AS ?len) }
GROUP BY ?repo ORDER BY ?repo
"""
# OPTIONAL group with a local FILTER + BIND: SPARQL's left-join-with-
# condition — the even-numbered-KB restriction applies inside the
# group, so unlinked (and odd-linked) entities keep their rows with
# null group bindings instead of vanishing
_SPARQL_OPTGROUP = """
SELECT ?repo ?e ?kb ?tag WHERE {
  ?repo DECLARES ?e
  OPTIONAL { ?e LINKED_TO ?kb FILTER regex(?kb, "[02468]$")
             BIND(CONCAT("ok:", ?kb) AS ?tag) }
}
"""
# SPARQL 1.1 Update: re-home each entity's KB link onto its declaring
# repo — the DELETE drops the entity-level edges, the INSERT derives
# repo-level ones (evidence = binding multiplicity) plus a grounding
# marker, surviving triples keep their evidence_count.  One hash
# anti-join + one counted groupBy; the WHERE bindings evaluate once
# against the pre-update store (SPARQL's delete-then-insert rule)
_SPARQL_UPDATE = """
DELETE { ?e LINKED_TO ?kb }
INSERT { ?repo MENTIONS_KB ?kb . ?e KB_GROUNDED "yes" }
WHERE  { ?repo DECLARES ?e . ?e LINKED_TO ?kb }
"""
# boolean FILTER expressions: || / && / ! with SPARQL precedence,
# BOUND over an OPTIONAL variable (negation-as-failure: keep the row
# when the left join missed OR the KB id passes), IN / NOT IN
# membership — all riding SQL three-valued null logic, which IS
# SPARQL's error algebra for the connectives (TRUE||error=TRUE,
# FALSE&&error=FALSE), so Spark and DuckDB agree row-for-row
_SPARQL_BOOLEXPR = """
SELECT ?repo ?e ?kb WHERE {
  ?repo DECLARES ?e
  OPTIONAL { ?e LINKED_TO ?kb }
  FILTER(!BOUND(?kb) || STRENDS(?kb, "0") || ?kb IN ("kb:Q1", "kb:Q2"))
  FILTER(STRSTARTS(?repo, "repo:") && ?e NOT IN ("ent:none"))
}
"""
# negated property set !(P1|P2): every edge that is neither a
# DECLARES nor an INSTANCE_OF, counted per subject — one pruned
# NOT IN edge scan, map-side-combinable aggregate
_SPARQL_NEGSET = """
SELECT ?s (COUNT(*) AS ?n) WHERE { ?s !(DECLARES|INSTANCE_OF) ?o }
GROUP BY ?s ORDER BY DESC(?n) ?s LIMIT 8
"""

# the kg_pattern_agg contract modifiers: one aggregate of each
# portable kind over the 3-hop bindings, grouped per repo —
# count(*) = binding multiplicity, count_distinct = partner set size,
# min/max = binary-collation extremes of the KB ids (never null here:
# the pattern requires the LINKED_TO leg), group_concat = the pinned
# sorted-distinct form
_PATTERN_AGGS = [
    "count(*) AS n_bindings",
    "count_distinct(?x) AS n_partners",
    "min(?kb) AS first_kb",
    "max(?kb) AS last_kb",
    "group_concat(?e) AS entities",
]

# the kg_construct contract templates: one element projecting through
# the OPTIONAL variable (nulls drop — SPARQL skips ill-formed template
# instantiations) and one with a constant predicate whose bindings
# collapse (evidence_count carries the multiplicity)
_CONSTRUCT_TEMPLATE = [
    ("?repo", "MENTIONS_KB", "?kb"),
    ("?e", "CO_DECLARED_WITH", "?x"),
]

_TOKS = ("list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
         "x -> x <> '')")

_EN = "['the','a','of','and','to','in','is','on','for','with']"
_PT = "['de','da','do','em','para','com','o','a','e','que','um','uma']"

_SHINGLES = ("list_distinct(list_transform(generate_series(1, len(t)-2), "
             "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))")

_COS = (
    "list_sum(list_transform(generate_series(1, len({a})), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)) / "
    "(sqrt(list_sum(list_transform(generate_series(1, len({a})), i -> {a}[i]::DOUBLE * {a}[i]::DOUBLE))) * "
    "sqrt(list_sum(list_transform(generate_series(1, len({b})), i -> {b}[i]::DOUBLE * {b}[i]::DOUBLE))))"
)


# MinHash+LSH candidate-pair CTE chain, shared by the pair oracle and
# the cluster oracle (kept in lockstep with dedup.minhash_lsh_dup_pairs)
_MINHASH_CAND_CTE = f"""toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
sh AS (
  SELECT doc_id, u.g
  FROM toks, UNNEST(list_transform(generate_series(1, len(t)-2),
                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS u(g)
  WHERE len(t) >= 3),
sig AS (
  SELECT doc_id,
    [{", ".join(f"min(md5('h{i}|' || g))" for i in range(16))}] AS s
  FROM sh GROUP BY doc_id),
banded AS (
  SELECT doc_id, s, b,
    md5(CAST(b AS VARCHAR) || '|' || s[4*b+1] || '|' || s[4*b+2]
        || '|' || s[4*b+3] || '|' || s[4*b+4]) AS band_hash
  FROM sig, UNNEST([0,1,2,3]) AS ub(b)),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
    CAST(len(list_filter(generate_series(1,16), i -> a.s[i] = b.s[i])) AS DOUBLE)
      / 16.0 AS jaccard_est
  FROM banded a JOIN banded b
    ON a.b = b.b AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id)"""


def _corpus_cte() -> str:
    from ner_spark.plans.analytics import corpus_values_sql

    return corpus_values_sql()


def _runs_cte(src_sql: str | None = None) -> str:
    """Shared BIO run-grouping CTE over the corpus VALUES (or any
    relation with (sent_id, idx, word, tag) — the fuzz tests pass a
    registered view here)."""
    return f"""
WITH c AS (SELECT * FROM {src_sql or _corpus_cte()}),
m AS (
  SELECT sent_id, idx, word, tag,
    CASE WHEN tag LIKE 'B-%' THEN 1
         WHEN tag LIKE 'I-%' AND coalesce(lag(tag) OVER (PARTITION BY sent_id ORDER BY idx), 'O') = 'O' THEN 1
         ELSE 0 END AS new_run
  FROM c),
r AS (
  SELECT sent_id, idx, word, tag,
    sum(new_run) OVER (PARTITION BY sent_id ORDER BY idx) AS run_id
  FROM m),
g AS (
  SELECT sent_id, run_id,
    CAST(min(idx) AS INT) AS start_idx,
    CAST(max(idx) AS INT) AS end_idx,
    min_by(tag, idx) AS first_tag,
    string_agg(word, ' ' ORDER BY idx) AS surface
  FROM r WHERE tag <> 'O'
  GROUP BY sent_id, run_id)
"""


def _plane_sql(row) -> str:
    return "[" + ", ".join(repr(float(x)) for x in row) + "]"


def _ann_lsh_oracle() -> str:
    """SQL twin of similarity.ann_lsh_topk: the deterministic seeded
    hyperplane matrix is folded in as literal arrays; the query bucket
    and Hamming-1 multiprobe set are computed in-query."""
    from ner_spark.operators.similarity import hyperplanes

    mat = hyperplanes(64, 4, seed=42)
    dot = ("list_sum(list_transform(generate_series(1, 64), "
           "i -> {v}[i]::DOUBLE * ({p}[i])))")
    bucket = " + ".join(
        f"(CASE WHEN {dot.format(v='{v}', p=_plane_sql(mat[b]))} > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(4)
    )
    cos = _COS.format(a="e.embedding", b="q.v")
    return f"""
WITH q AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
qb AS (SELECT ({bucket.format(v="q.v")}) AS b FROM q),
probes AS (SELECT unnest([b, xor(b,1), xor(b,2), xor(b,4), xor(b,8)]) AS p FROM qb),
cand AS (
  SELECT e.vec_id, round({cos} + 1e-9, 4) AS cos_sim
  FROM embeddings e, q
  WHERE e.vec_id <> 0
    AND ({bucket.format(v="e.embedding")}) IN (SELECT p FROM probes))
SELECT vec_id, cos_sim, CAST(rk AS INT) AS rank FROM (
  SELECT *, row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rk FROM cand)
WHERE rk <= 10
"""


# per-channel quantized feature string: the float32 histogram value is
# promoted to double (exact) and floor(x·10⁴ + .5)-quantized — the same
# arithmetic the Spark contract projection applies, so strings match.
def _embedding_ivf_pairs_oracle(n_centroids: int = 16, top_k: int = 20) -> str:
    """SQL twin of dedup.embedding_topk_pairs_ivf: per-row IVF cell
    assignment (centroid literals, quantize-then-first-max), pairs
    within a cell, global top-k."""
    from ner_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(64, n_centroids, seed=7)
    dot = ("round(list_sum(list_transform(generate_series(1, 64), "
           "i -> e.embedding[i]::DOUBLE * ({c}[i]))) + 1e-9, 6)")
    e_dots = ", ".join(
        f"({dot.format(c=_plane_sql(cents[ci]))}) AS s{ci}"
        for ci in range(n_centroids)
    )
    all_s = ", ".join(f"s{ci}" for ci in range(n_centroids))
    cell_case = "CASE " + " ".join(
        f"WHEN s{ci} = greatest({all_s}) THEN {ci}" for ci in range(n_centroids)
    ) + " END"
    return f"""
WITH ass AS (
  SELECT vec_id, embedding, {cell_case} AS cell
  FROM (SELECT vec_id, embedding, {e_dots} FROM embeddings e) t),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
    round({_COS.format(a="a.embedding", b="b.embedding")} + 1e-9, 4) AS cos_sim
  FROM ass a JOIN ass b ON a.cell = b.cell AND a.vec_id < b.vec_id)
SELECT vec_a, vec_b, cos_sim FROM (
  SELECT *, row_number() OVER (ORDER BY cos_sim DESC, vec_a, vec_b) AS rk
  FROM pairs)
WHERE rk <= {top_k}
"""


def _ann_ivf_oracle(n_centroids: int = 16, nprobe: int = 2, k: int = 10) -> str:
    """SQL twin of similarity.ann_ivf_topk: the seeded pseudo-centroid
    matrix is folded in as literals; per-row cell assignment uses the
    same quantize(6)-then-first-max rule; the query's nprobe best cells
    are ranked in-query (dot desc, cell index asc)."""
    from ner_spark.operators.similarity import ivf_centroids

    cents = ivf_centroids(64, n_centroids, seed=7)
    dot = ("round(list_sum(list_transform(generate_series(1, 64), "
           "i -> {v}[i]::DOUBLE * ({c}[i]))) + 1e-9, 6)")
    e_dots = ", ".join(
        f"({dot.format(v='e.embedding', c=_plane_sql(cents[ci]))}) AS s{ci}"
        for ci in range(n_centroids)
    )
    q_dots = ", ".join(
        f"({dot.format(v='q.v', c=_plane_sql(cents[ci]))}) AS s{ci}"
        for ci in range(n_centroids)
    )
    all_s = ", ".join(f"s{ci}" for ci in range(n_centroids))
    cell_case = "CASE " + " ".join(
        f"WHEN s{ci} = greatest({all_s}) THEN {ci}" for ci in range(n_centroids)
    ) + " END"
    q_structs = ", ".join(
        f"{{'ci': {ci}, 's': s{ci}}}" for ci in range(n_centroids)
    )
    cos = _COS.format(a="e.embedding", b="q.v")
    return f"""
WITH q AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
qs AS (SELECT {q_dots} FROM q),
qcells AS (
  SELECT u.c.ci AS ci FROM (
    SELECT c, row_number() OVER (ORDER BY c.s DESC, c.ci) AS rk
    FROM qs, UNNEST([{q_structs}]) AS u2(c)) u(c, rk)
  WHERE rk <= {nprobe}),
ass AS (
  SELECT e.vec_id, e.embedding, {cell_case} AS cell
  FROM (SELECT vec_id, embedding, {e_dots} FROM embeddings e) e),
cand AS (
  SELECT a.vec_id, round({_COS.format(a="a.embedding", b="q.v")} + 1e-9, 4) AS cos_sim
  FROM ass a, q
  WHERE a.vec_id <> 0 AND a.cell IN (SELECT ci FROM qcells))
SELECT vec_id, cos_sim, CAST(rk AS INT) AS rank FROM (
  SELECT *, row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rk FROM cand)
WHERE rk <= {k}
"""


_MEDIA_FEATS = ", ".join(
    "CAST(CAST(floor(CAST(CAST(CAST(len(list_filter(cs, c -> c = "
    f"'{ch}')) AS DOUBLE) / nb AS REAL) AS DOUBLE) * 10000 + 0.5) "
    "AS BIGINT) AS VARCHAR)"
    for ch in "0123456789abcdef"
)
_MEDIA_ZEROS = ",".join(["0"] * 16)


def _media_oracle(modality: str, n_bytes_expr: str | None) -> str:
    """Shared nibble-histogram oracle: the feature vector is the L1-normed
    16-bin histogram of the text's UTF-8 bytes' high nibbles — identical
    for the byte-histogram stand-in AND for the real netpbm/PNG/WAV
    decodes, whose rasters/samples ARE those bytes; only the container
    framing (and hence ``n_bytes``) differs per key.  ``None`` omits
    the n_bytes column (the PNG container's deflate length is not
    SQL-expressible, so that key projects features only)."""
    nb_col = ("" if n_bytes_expr is None
              else f"CAST({n_bytes_expr} AS BIGINT) AS n_bytes,")
    return f"""
WITH h AS (SELECT doc_id AS media_id, lower(hex(encode(text))) AS hx FROM documents),
n AS (SELECT media_id, hx, len(hx) // 2 AS nb FROM h),
nib AS (SELECT media_id, nb,
  list_transform(generate_series(1, nb), i -> hx[2*i-1]) AS cs FROM n)
SELECT media_id, '{modality}' AS modality, {nb_col}
  CASE WHEN nb = 0 THEN '{_MEDIA_ZEROS}'
       ELSE concat_ws(',', {_MEDIA_FEATS}) END AS features_q
FROM nib
"""


def _sql_esc(s: str) -> str:
    return s.replace("'", "''")


def _kg_nel_sql() -> str:
    """NED → NEL (KB folded in as literals); reads a preceding
    ``men(repo, path, mention_text, category, ctx)`` CTE and leaves a
    ``nel(repo, path, resolved_category, surface, kb_id, link_score)``
    CTE for the caller.  Shared by the triples chain
    (:func:`_kg_chain_sql`) and the fuzzy-entities oracle."""
    from ner_spark.data.kb import KB_LOC_IDS, KB_ORG_IDS, KB_PER_IDS, KB_RECORDS

    esc = _sql_esc
    s_selects, picks = [], []
    for i, (kb_id, name, _d, _u) in enumerate(KB_RECORDS):
        nl = esc(name.lower())
        base = (
            f"CASE WHEN q = '{nl}' THEN 0.8 "
            f"WHEN contains('{nl}', q) OR contains(q, '{nl}') THEN 0.5 "
            f"ELSE 0.0 END"
        )
        tok = []
        if kb_id in KB_PER_IDS:
            tok.append("rc = 'PER'")
        if kb_id in KB_LOC_IDS:
            tok.append("rc = 'LOC'")
        if kb_id in KB_ORG_IDS:
            tok.append("rc = 'ORG'")
        type_ok = " OR ".join(tok) if tok else "FALSE"
        s_selects.append(
            f"CASE WHEN ({base}) > 0.0 THEN ({base}) + "
            f"(CASE WHEN {type_ok} THEN 0.15 ELSE 0.0 END) ELSE 0.0 END AS s{i}"
        )
        picks.append(f"WHEN s{i} = best THEN '{esc(kb_id)}'")

    all_s = ", ".join(f"s{i}" for i in range(len(KB_RECORDS)))
    return f""",
ned AS (
  SELECT repo, path, mention_text,
    CASE WHEN contains(lower(mention_text), 'paris')
              AND len(list_intersect(ctx, ['hilton','socialite','atriz'])) > 0 THEN 'PER'
         WHEN contains(lower(mention_text), 'paris') THEN 'LOC'
         ELSE category END AS rc
  FROM men),
sc AS (
  SELECT repo, path, rc, lower(mention_text) AS q,
    {", ".join(s_selects)}
  FROM ned),
nel AS (
  SELECT repo, path, rc AS resolved_category, q AS surface,
    CASE WHEN best >= 0.5 THEN CASE {" ".join(picks)} END END AS kb_id,
    CASE WHEN best >= 0.5 THEN best ELSE 0.0 END AS link_score
  FROM (SELECT *, greatest({all_s}) AS best FROM sc))"""


def _kg_chain_sql() -> str:
    """:func:`_kg_nel_sql` + connected components (recursive closure
    over the surface–surface adjacency induced by shared KB ids) + the
    four triple branches.  Shared by the gold-span oracle
    (``kg_triples``) and the goldens-driven tagged oracle
    (``kg_triples_tagged``)."""
    return _kg_nel_sql() + """,
ed AS (SELECT DISTINCT surface AS s, kb_id AS k FROM nel WHERE kb_id IS NOT NULL),
adj AS (SELECT DISTINCT a.s AS x, b.s AS y FROM ed a JOIN ed b ON a.k = b.k),
reach AS (
  SELECT x, y FROM adj
  UNION
  SELECT r.x, a.y FROM reach r JOIN adj a ON r.y = a.x),
comp AS (SELECT x AS surface, 'ent:' || min(y) AS eid FROM reach GROUP BY x),
ent AS (
  SELECT n.surface, coalesce(comp.eid, 'ent:' || n.surface) AS entity_id
  FROM (SELECT DISTINCT surface FROM nel) n LEFT JOIN comp ON n.surface = comp.surface),
base AS (
  SELECT nel.repo, nel.path, ent.entity_id, nel.kb_id, nel.resolved_category,
         (nel.kb_id IS NOT NULL AND nel.link_score >= 0.5) AS kb_linked,
         count(*) AS cnt
  FROM nel JOIN ent ON nel.surface = ent.surface
  GROUP BY ALL),
dd AS (SELECT DISTINCT repo, path, entity_id FROM base),
tr AS (
  SELECT 'repo:' || repo AS subj, 'DECLARES' AS pred, entity_id AS obj, sum(cnt) AS ev
  FROM base GROUP BY repo, entity_id
  UNION ALL
  SELECT a.entity_id, 'MENTIONED_WITH', b.entity_id, count(*)
  FROM dd a JOIN dd b
    ON a.repo = b.repo AND a.path = b.path AND a.entity_id < b.entity_id
  GROUP BY a.entity_id, b.entity_id
  UNION ALL
  SELECT entity_id, 'LINKED_TO', kb_id, sum(cnt)
  FROM base WHERE kb_linked GROUP BY entity_id, kb_id
  UNION ALL
  SELECT entity_id, 'INSTANCE_OF', resolved_category, sum(cnt)
  FROM base GROUP BY entity_id, resolved_category)
SELECT subj, pred, obj, CAST(ev AS BIGINT) AS evidence_count FROM tr
"""


def _kg_gold_men_sql() -> str:
    """Gold-span ``men`` CTE prefix (annotated corpus → BIO spans →
    repo/path/ctx), shared by the gold triples and fuzzy-entities
    oracles."""
    runs = _runs_cte().replace("WITH ", "WITH RECURSIVE ", 1)
    return runs + """,
sp AS (
  SELECT sent_id, start_idx, end_idx, substr(first_tag, 3) AS category, surface
  FROM g WHERE first_tag LIKE 'B-%'),
sw AS (SELECT sent_id, array_agg(word ORDER BY idx) AS words FROM c GROUP BY sent_id),
men AS (
  SELECT
    CASE WHEN sp.sent_id % 2 = 0 THEN 'repo0'
         ELSE 'repo' || CAST(1 + sp.sent_id % 19 AS VARCHAR) END AS repo,
    'docs/' || CAST(sp.sent_id AS VARCHAR) || '.txt' AS path,
    sp.surface AS mention_text, sp.category,
    list_transform(
      list_slice(sw.words, greatest(sp.start_idx - 3, 0) + 1, sp.end_idx + 4),
      w -> lower(w)) AS ctx
  FROM sp JOIN sw ON sp.sent_id = sw.sent_id)"""


def _kg_gold_oracle() -> str:
    """SQL twin of plans.kg_gold.kg_triples_gold: gold spans → the
    shared NED/NEL/CC/triples chain (:func:`_kg_chain_sql`)."""
    return _kg_gold_men_sql() + _kg_chain_sql()


def _kg_quads_gold_sql() -> str:
    """SQL twin of plans.kg_gold.kg_quads_gold: the gold chain with
    the per-repo provenance graph column derived exactly as the Spark
    fixture derives it."""
    return f"""SELECT CASE WHEN pred = 'DECLARES'
            THEN 'g:' || substr(subj, 6) ELSE 'g:shared' END AS graph,
       subj, pred, obj, evidence_count
FROM ({_kg_gold_oracle()}) gq"""


def _kg_rules_oracle(kg_sql: str | None = None) -> str:
    """SQL twin of plans.kg_rules.materialize_rules under the
    committed contract rule set (_RULES): the join rule is one
    self-join of the base, the recursive rule is a left-linear
    recursive CTE over its head relation — valid because the rule
    set's dependency graph is stratified (RELATED_REPO depends only
    on base DECLARES, CONNECTED only on RELATED_REPO), which is also
    why the engine's naive fixpoint converges in closure-depth
    rounds."""
    return f"""WITH RECURSIVE kg AS MATERIALIZED ({kg_sql or _kg_gold_oracle()}),
rbase AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM kg),
rel AS MATERIALIZED (
  SELECT DISTINCT a.subj AS subj, 'RELATED_REPO' AS pred,
         b.subj AS obj
  FROM rbase a JOIN rbase b ON a.obj = b.obj
  WHERE a.pred = 'DECLARES' AND b.pred = 'DECLARES'
    AND a.subj != b.subj),
conn AS (SELECT subj, obj FROM rel
  UNION SELECT c.subj, r.obj FROM conn c JOIN rel r
    ON c.obj = r.subj),
rfull AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM (
  SELECT subj, pred, obj FROM rbase
  UNION ALL SELECT subj, pred, obj FROM rel
  UNION ALL SELECT subj, 'CONNECTED' AS pred, obj FROM conn))
SELECT f.subj, f.pred, f.obj, (b2.subj IS NULL) AS inferred
FROM rfull f LEFT JOIN rbase b2
  ON f.subj = b2.subj AND f.pred = b2.pred AND f.obj = b2.obj
"""


def _kg_entail_body(kg_sql: str | None = None) -> str:
    """Shared WITH-chain for the entailment oracles: gold kg + the
    committed ontology VALUES, recursive subClassOf/subPropertyOf
    closures, then the staged instance derivations f1 (rdfs7 over the
    closed property hierarchy) → f2 (rdfs2/rdfs3 over the
    rdfs7-extended facts) → f3 (rdfs9 over every type triple).  The
    staging is the standard rho-df stratification, complete when no
    schema predicate (incl. INSTANCE_OF) is itself the subject/object
    of subPropertyOf/domain/range — which plans/kg_infer.py's fragment
    guard enforces and the committed ontology satisfies; the Spark
    engine's semi-naive loop reaches the same fixpoint (differentially
    fuzzed against a naive Python fixpoint in tests/test_kg_infer.py).

    Non-recursive CTEs spell dedup as DISTINCT-over-UNION-ALL — under
    WITH RECURSIVE, DuckDB gives bare UNION bodies recursive
    union-table semantics (same caveat as :func:`_kg_closure_cte`)."""
    from ner_spark.plans.kg_infer import ONTOLOGY_ROWS

    vals = ", ".join(f"('{s}', '{p}', '{o}')" for s, p, o in ONTOLOGY_ROWS)
    return f"""WITH RECURSIVE kg AS MATERIALIZED ({kg_sql or _kg_gold_oracle()}),
onto(subj, pred, obj) AS (VALUES {vals}),
ebase AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM (
  SELECT subj, pred, obj FROM kg
  UNION ALL SELECT subj, pred, obj FROM onto)),
scoe AS MATERIALIZED (SELECT subj, obj FROM ebase WHERE pred = 'subClassOf'),
sco AS (SELECT subj, obj FROM scoe
  UNION SELECT s.subj, e.obj FROM sco s JOIN scoe e ON s.obj = e.subj),
spoe AS MATERIALIZED (SELECT subj, obj FROM ebase WHERE pred = 'subPropertyOf'),
spo AS (SELECT subj, obj FROM spoe
  UNION SELECT s.subj, e.obj FROM spo s JOIN spoe e ON s.obj = e.subj),
edom AS MATERIALIZED (SELECT subj AS p, obj AS c FROM ebase WHERE pred = 'domain'),
erng AS MATERIALIZED (SELECT subj AS p, obj AS c FROM ebase WHERE pred = 'range'),
ef1 AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM (
  SELECT subj, pred, obj FROM ebase
  UNION ALL SELECT subj, 'subClassOf', obj FROM sco
  UNION ALL SELECT subj, 'subPropertyOf', obj FROM spo
  UNION ALL SELECT f.subj, s.obj AS pred, f.obj
    FROM ebase f JOIN spo s ON f.pred = s.subj)),
ef2 AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM (
  SELECT subj, pred, obj FROM ef1
  UNION ALL SELECT f.subj, 'INSTANCE_OF' AS pred, d.c AS obj
    FROM ef1 f JOIN edom d ON f.pred = d.p
  UNION ALL SELECT f.obj AS subj, 'INSTANCE_OF' AS pred, r.c AS obj
    FROM ef1 f JOIN erng r ON f.pred = r.p)),
ef3 AS MATERIALIZED (SELECT DISTINCT subj, pred, obj FROM (
  SELECT subj, pred, obj FROM ef2
  UNION ALL SELECT f.subj, 'INSTANCE_OF' AS pred, c.obj
    FROM ef2 f JOIN sco c ON f.obj = c.subj
    WHERE f.pred = 'INSTANCE_OF'))"""


def _kg_entail_oracle(kg_sql: str | None = None) -> str:
    """SQL twin of plans.kg_infer.entail over the gold triples +
    committed ontology: the staged closure (:func:`_kg_entail_body`)
    with ``inferred`` = not-a-base-triple via LEFT JOIN IS NULL."""
    return f"""{_kg_entail_body(kg_sql)}
SELECT f.subj, f.pred, f.obj, (b.subj IS NULL) AS inferred
FROM ef3 f LEFT JOIN ebase b
  ON f.subj = b.subj AND f.pred = b.pred AND f.obj = b.obj
"""


def _kg_validate_oracle(kg_sql: str | None = None) -> str:
    """SQL twin of plans.kg_validate.validate over the ENTAILED gold
    graph and the committed shapes: focus selection by INSTANCE_OF
    membership, a LEFT JOIN for per-focus edges (so zero-edge foci
    still count), cardinality violations off one GROUP BY, pattern /
    class violations per offending object."""
    from ner_spark.plans.kg_validate import SHAPES_ROWS

    def _v(x, cast):
        if x is None:
            return f"CAST(NULL AS {cast})"
        return str(x) if cast == "INTEGER" else f"'{x}'"

    rows = ", ".join(
        "(" + ", ".join([
            _v(r[0], "VARCHAR"), _v(r[1], "VARCHAR"), _v(r[2], "VARCHAR"),
            _v(r[3], "INTEGER"), _v(r[4], "INTEGER"),
            _v(r[5], "VARCHAR"), _v(r[6], "VARCHAR"),
        ]) + ")"
        for r in SHAPES_ROWS
    )
    return f"""{_kg_entail_body(kg_sql)},
ent AS MATERIALIZED (SELECT subj, pred, obj FROM ef3),
shp(shape_id, target_class, s_pred, min_count, max_count, obj_pattern,
    obj_class) AS (VALUES {rows}),
typ AS MATERIALIZED (
  SELECT subj AS t_subj, obj AS t_cls FROM ent WHERE pred = 'INSTANCE_OF'),
foc AS MATERIALIZED (
  SELECT s.shape_id, t.t_subj AS focus, s.s_pred, s.min_count,
         s.max_count, s.obj_pattern, s.obj_class
  FROM typ t JOIN shp s ON t.t_cls = s.target_class),
m AS MATERIALIZED (
  SELECT foc.shape_id, foc.focus, foc.min_count, foc.max_count,
         foc.obj_pattern, foc.obj_class, e.obj AS e_obj
  FROM foc LEFT JOIN ent e
    ON e.subj = foc.focus AND e.pred = foc.s_pred),
cnt AS MATERIALIZED (
  SELECT shape_id, focus, min_count, max_count, count(e_obj) AS n
  FROM m GROUP BY shape_id, focus, min_count, max_count)
SELECT shape_id, focus, "constraint", value FROM (
  SELECT shape_id, focus, 'minCount' AS "constraint",
         CAST(n AS VARCHAR) AS value
    FROM cnt WHERE min_count IS NOT NULL AND n < min_count
  UNION ALL
  SELECT shape_id, focus, 'maxCount', CAST(n AS VARCHAR)
    FROM cnt WHERE max_count IS NOT NULL AND n > max_count
  UNION ALL
  SELECT shape_id, focus, 'pattern', e_obj FROM m
    WHERE obj_pattern IS NOT NULL AND e_obj IS NOT NULL
      AND NOT regexp_matches(e_obj, obj_pattern)
  UNION ALL
  SELECT shape_id, focus, 'class', e_obj FROM m
    WHERE obj_class IS NOT NULL AND e_obj IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM typ t
                      WHERE t.t_subj = m.e_obj AND t.t_cls = m.obj_class))
"""


def _kg_degree_oracle(kg_sql: str | None = None) -> str:
    """SQL twin of plans.kg_analytics.entity_degree over the gold
    triples: two GROUP BYs full-outer-joined on the node id.  The kg
    CTE is MATERIALIZED — DuckDB inlines plain CTEs per reference, and
    the expensive gold-KG chain is referenced twice here.

    ``kg_sql`` substitutes an arbitrary (subj, pred, obj,
    evidence_count) relation for the gold chain — the differential
    graph fuzz (tests/test_kg_analytics_fuzz.py) passes a VALUES CTE of
    random triples."""
    return f"""WITH kg AS MATERIALIZED ({kg_sql or _kg_gold_oracle()}),
o AS (SELECT subj AS node, count(*) AS out_degree,
             sum(evidence_count) AS out_evidence FROM kg GROUP BY subj),
i AS (SELECT obj AS node, count(*) AS in_degree,
             sum(evidence_count) AS in_evidence FROM kg GROUP BY obj)
SELECT coalesce(o.node, i.node) AS node,
  CAST(coalesce(out_degree, 0) AS BIGINT) AS out_degree,
  CAST(coalesce(in_degree, 0) AS BIGINT) AS in_degree,
  CAST(coalesce(out_evidence, 0) AS BIGINT) AS out_evidence,
  CAST(coalesce(in_evidence, 0) AS BIGINT) AS in_evidence
FROM o FULL OUTER JOIN i ON o.node = i.node
"""


def _kg_pagerank_oracle(iterations: int = 3, damping: float = 0.85,
                        kg_sql: str | None = None,
                        quantized: bool = True) -> str:
    """SQL twin of plans.kg_analytics.pagerank: the fixed iteration
    count unrolls into chained CTEs (contrib sum + dangling-mass scalar
    + rank update per round).  Damping goes through CAST(.. AS DOUBLE)
    so both engines run the identical IEEE expression; ranks quantize
    to 1e-6 ints for the hash compare.

    Every CTE in the chain is MATERIALIZED: DuckDB inlines plain CTEs
    once per reference, and r{{k}} is referenced by c{{k+1}}, d{{k+1}}
    (and r0's base by everything above it), so an inlined unroll
    re-evaluates the expensive gold-KG chain combinatorially — minutes
    instead of seconds at sf0.001.  ``kg_sql`` substitutes an arbitrary
    triple relation (used by the differential graph fuzz)."""
    d = f"CAST({damping} AS DOUBLE)"
    steps = []
    for k in range(1, iterations + 1):
        p = k - 1
        steps.append(f""",
c{k} AS MATERIALIZED (
  SELECT e.dst AS node, sum(r.rank / od.od) AS contrib
  FROM e JOIN r{p} r ON e.src = r.node JOIN od ON od.node = e.src
  GROUP BY e.dst),
d{k} AS MATERIALIZED (
  SELECT coalesce(sum(r.rank), 0.0) AS dang
  FROM r{p} r LEFT JOIN od ON od.node = r.node WHERE od.node IS NULL),
r{k} AS MATERIALIZED (
  SELECT v.node,
    (1.0 - {d}) / (SELECT n FROM nn)
      + {d} * (coalesce(c{k}.contrib, 0.0)
               + (SELECT dang FROM d{k}) / (SELECT n FROM nn)) AS rank
  FROM v LEFT JOIN c{k} ON v.node = c{k}.node)""")
    return f"""WITH kg AS MATERIALIZED ({kg_sql or _kg_gold_oracle()}),
e AS MATERIALIZED (SELECT DISTINCT subj AS src, obj AS dst FROM kg),
v AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e),
nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM v),
od AS MATERIALIZED (SELECT src AS node, CAST(count(*) AS DOUBLE) AS od FROM e GROUP BY src),
r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM v){''.join(steps)}
SELECT node, {"CAST(floor(rank * 1000000 + 0.5) AS BIGINT) AS rank_q"
              if quantized else "rank"}
FROM r{iterations}
"""


def _kg_components_oracle(kg_sql: str | None = None) -> str:
    """SQL twin of plans.kg_analytics.graph_components: undirected
    transitive closure as a recursive CTE (the same reach pattern the
    dedup-cluster oracle uses), component = least(node, min reachable
    node), sizes by a GROUP BY over the labels.  Non-recursive CTEs are
    MATERIALIZED so the gold-KG chain evaluates once.  ``kg_sql``
    substitutes an arbitrary triple relation (differential graph
    fuzz)."""
    return f"""WITH RECURSIVE kg AS MATERIALIZED ({kg_sql or _kg_gold_oracle()}),
e AS MATERIALIZED (SELECT DISTINCT subj AS src, obj AS dst FROM kg),
sym AS MATERIALIZED (
  SELECT src AS x, dst AS y FROM e UNION SELECT dst, src FROM e),
v AS MATERIALIZED (SELECT x AS node FROM sym UNION SELECT y FROM sym),
reach AS (
  SELECT x, y FROM sym
  UNION
  SELECT r.x, s.y FROM reach r JOIN sym s ON r.y = s.x),
lab AS MATERIALIZED (
  SELECT v.node, least(v.node, min(reach.y)) AS component
  FROM v LEFT JOIN reach ON v.node = reach.x
  GROUP BY v.node),
sz AS (SELECT component, count(*) AS component_size FROM lab GROUP BY component)
SELECT lab.node, lab.component,
       CAST(sz.component_size AS BIGINT) AS component_size
FROM lab JOIN sz USING (component)
"""


def _kg_hits_oracle(iterations: int = 3, kg_sql: str | None = None,
                    quantized: bool = True) -> str:
    """SQL twin of plans.kg_analytics.hits: chained CTEs unroll the
    fixed iterations — auth = Eᵀ·hub then L1-normalize, hub = E·(new
    auth) then L1-normalize — with nodes missing a side coalesced to 0
    and an all-zero guard instead of a division by zero, exactly the
    operator's update order.  Quantized to 1e-6 ints for the hash
    compare (the per-node sums are float additions whose order the
    engines pick independently, like pagerank's)."""
    # every intermediate is MATERIALIZED and each normalization total
    # is its own 1-row CTE: without this DuckDB inlines the chain at
    # every reference site (two scalar subqueries + a join per level
    # → exponential re-evaluation of the whole gold-KG derivation)
    ctes = [f"kg AS MATERIALIZED ({kg_sql or _kg_gold_oracle()})",
            "e AS MATERIALIZED (SELECT DISTINCT subj AS src, obj AS dst "
            "FROM kg)",
            "v AS MATERIALIZED (SELECT src AS node FROM e "
            "UNION SELECT dst FROM e)",
            "h0 AS MATERIALIZED (SELECT node, "
            "1.0 / (SELECT CAST(count(*) AS DOUBLE) FROM v) AS hub "
            "FROM v)"]
    for i in range(1, iterations + 1):
        ctes.append(
            f"a{i}r AS MATERIALIZED (SELECT v.node, "
            "coalesce(s.s, 0.0) AS authority "
            f"FROM v LEFT JOIN (SELECT e.dst AS node, sum(h.hub) AS s "
            f"FROM e JOIN h{i - 1} h ON h.node = e.src GROUP BY e.dst) s "
            "ON v.node = s.node)")
        ctes.append(
            f"a{i}t AS MATERIALIZED "
            f"(SELECT sum(authority) AS t FROM a{i}r)")
        ctes.append(
            f"a{i} AS MATERIALIZED (SELECT node, CASE WHEN "
            f"(SELECT t FROM a{i}t) > 0 THEN authority / "
            f"(SELECT t FROM a{i}t) ELSE 0.0 END "
            f"AS authority FROM a{i}r)")
        ctes.append(
            f"h{i}r AS MATERIALIZED (SELECT v.node, "
            "coalesce(s.s, 0.0) AS hub "
            f"FROM v LEFT JOIN (SELECT e.src AS node, sum(a.authority) "
            f"AS s FROM e JOIN a{i} a ON a.node = e.dst GROUP BY e.src) s "
            "ON v.node = s.node)")
        ctes.append(
            f"h{i}t AS MATERIALIZED (SELECT sum(hub) AS t FROM h{i}r)")
        ctes.append(
            f"h{i} AS MATERIALIZED (SELECT node, CASE WHEN "
            f"(SELECT t FROM h{i}t) > 0 THEN hub / "
            f"(SELECT t FROM h{i}t) ELSE 0.0 END AS hub "
            f"FROM h{i}r)")
    if quantized:
        sel = ("CAST(floor(h.hub * 1000000 + 0.5) AS BIGINT) AS hub_q, "
               "CAST(floor(a.authority * 1000000 + 0.5) AS BIGINT) "
               "AS authority_q")
    else:
        sel = "h.hub, a.authority"
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT h.node, {sel} "
            f"FROM h{iterations} h JOIN a{iterations} a "
            "ON a.node = h.node\n")


def _kg_linkpred_oracle(k: int = 20, max_degree: int | None = _UNSET,
                        kg_sql: str | None = None,
                        quantized: bool = True) -> str:
    """SQL twin of plans.kg_analytics.link_prediction: the wedge
    self-join on the shared neighbor (with its degree attached for
    the Adamic-Adar weight and the hub cap), pair counts, existing
    edges anti-joined out, jaccard from exact-integer inputs
    (engine-portable bit-for-bit — it is the ranking key), ordered by
    the total (jaccard DESC, node_a, node_b) and cut at k.  The
    default cap mirrors the Spark operator's
    LINKPRED_DEFAULT_MAX_DEGREE so the twins stay twins; pass
    ``max_degree=None`` only alongside the same opt-out on the
    Spark side."""
    if max_degree is _UNSET:
        from ner_spark.plans.kg_analytics import (
            LINKPRED_DEFAULT_MAX_DEGREE,
        )

        max_degree = LINKPRED_DEFAULT_MAX_DEGREE
    cap = (f"WHERE dz.deg <= {float(max_degree)!r}"
           if max_degree is not None else "")
    if quantized:
        sel = ("CAST(floor(jaccard * 1000000 + 0.5) AS BIGINT) "
               "AS jaccard_q, "
               "CAST(floor(adamic_adar * 1000000 + 0.5) AS BIGINT) "
               "AS adamic_adar_q")
    else:
        sel = "jaccard, adamic_adar"
    return f"""WITH kg AS MATERIALIZED ({kg_sql or _kg_gold_oracle()}),
e AS MATERIALIZED (
  SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
  FROM kg WHERE subj <> obj),
sym AS MATERIALIZED (SELECT a AS x, b AS y FROM e UNION SELECT b, a FROM e),
d AS MATERIALIZED (
  SELECT x AS node, CAST(count(*) AS DOUBLE) AS deg FROM sym GROUP BY x),
w AS (
  SELECT s1.x AS node_a, s2.x AS node_b, dz.deg AS zdeg
  FROM sym s1 JOIN sym s2 ON s1.y = s2.y AND s1.x < s2.x
  JOIN d dz ON dz.node = s1.y {cap}),
p AS (
  SELECT node_a, node_b, count(*) AS cn, sum(1.0 / ln(zdeg)) AS aa
  FROM w GROUP BY 1, 2),
np AS (
  SELECT p.* FROM p WHERE NOT EXISTS (
    SELECT 1 FROM e WHERE e.a = p.node_a AND e.b = p.node_b)),
r AS (
  SELECT node_a, node_b, CAST(cn AS BIGINT) AS common_neighbors,
    cn / (da.deg + db.deg - cn) AS jaccard, aa AS adamic_adar
  FROM np JOIN d da ON da.node = np.node_a
  JOIN d db ON db.node = np.node_b)
SELECT node_a, node_b, common_neighbors, {sel}
FROM r ORDER BY jaccard DESC, node_a ASC, node_b ASC LIMIT {k}
"""


def _kg_pmi_cte(kg_sql: str | None) -> str:
    """Shared WITH-prefix for the PMI-family oracles: the
    MENTIONED_WITH pair table, total evidence mass, per-entity marginal
    mass, and a ``pm`` CTE holding raw pmi = ln(ev·T / (m_a·m_b)) in
    the exact FP operation order the Spark expression uses.  All
    inputs to the ln are exact integer sums cast to double, so pmi is
    bitwise identical across engines (no sum-order dependence)."""
    return f"""WITH kg AS MATERIALIZED ({kg_sql or _kg_gold_oracle()}),
p AS MATERIALIZED (
  SELECT subj, obj, evidence_count FROM kg WHERE pred = 'MENTIONED_WITH'),
t AS (SELECT CAST(sum(evidence_count) AS DOUBLE) AS t_mass FROM p),
m AS MATERIALIZED (
  SELECT node, CAST(sum(evidence_count) AS DOUBLE) AS m FROM (
    SELECT subj AS node, evidence_count FROM p
    UNION ALL
    SELECT obj AS node, evidence_count FROM p)
  GROUP BY node),
pm AS MATERIALIZED (
  SELECT p.subj, p.obj, CAST(p.evidence_count AS BIGINT) AS evidence_count,
    ln((CAST(p.evidence_count AS DOUBLE) * (SELECT t_mass FROM t))
       / (ma.m * mb.m)) AS pmi
  FROM p JOIN m ma ON ma.node = p.subj JOIN m mb ON mb.node = p.obj)"""


def _kg_pmi_oracle(kg_sql: str | None = None,
                   quantized: bool = True) -> str:
    """SQL twin of plans.kg_analytics.comention_pmi: marginal evidence
    mass per entity over the MENTIONED_WITH pairs, total mass as a
    scalar subquery, pmi = ln(ev·T / (m_a·m_b)) written in the exact
    FP operation order the Spark expression uses; quantized to 1e-6
    ints for the hash compare."""
    q = ("CAST(floor(pmi * 1000000 + 0.5) AS BIGINT) AS pmi_q"
         if quantized else "pmi")
    return f"""{_kg_pmi_cte(kg_sql)}
SELECT subj, obj, evidence_count, {q} FROM pm
"""


def _kg_related_oracle(k: int = 3, kg_sql: str | None = None,
                       quantized: bool = True) -> str:
    """SQL twin of plans.kg_analytics.related_topk: the pm pair table
    symmetrized, then a per-node row_number window ordered by
    (pmi DESC, related ASC) — deterministic because pmi is bitwise
    identical across engines (exact-integer inputs to one ln) and ties
    break on the partner id."""
    q = ("CAST(floor(pmi * 1000000 + 0.5) AS BIGINT) AS pmi_q"
         if quantized else "pmi")
    return f"""{_kg_pmi_cte(kg_sql)},
sym AS (
  SELECT subj AS node, obj AS related, pmi FROM pm
  UNION ALL
  SELECT obj AS node, subj AS related, pmi FROM pm),
r AS (
  SELECT node, related, pmi,
    row_number() OVER (PARTITION BY node
                       ORDER BY pmi DESC, related ASC) AS rnk
  FROM sym)
SELECT node, related, {q}, CAST(rnk AS INT) AS rnk
FROM r WHERE rnk <= {k}
"""


def _kg_triangles_oracle(kg_sql: str | None = None,
                         quantized: bool = True) -> str:
    """SQL twin of plans.kg_analytics.triangles: the undirected simple
    graph's triangles enumerated by a plain ordered 3-way self-join
    (a < b < c once each — the exact-but-unoriented form the Spark
    side's degree-oriented join is equivalent to), corners unioned for
    the per-node counts, clustering coefficient from exact-integer
    inputs."""
    coeff = ("CASE WHEN degree > 1 THEN (2.0 * CAST(triangles AS DOUBLE))"
             " / CAST(degree * (degree - 1) AS DOUBLE) ELSE 0.0 END")
    q = (f"CAST(floor(({coeff}) * 1000000 + 0.5) AS BIGINT)"
         " AS clustering_coeff_q"
         if quantized else f"{coeff} AS clustering_coeff")
    return f"""WITH kg AS MATERIALIZED ({kg_sql or _kg_gold_oracle()}),
e AS MATERIALIZED (
  SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
  FROM kg WHERE subj <> obj),
d AS MATERIALIZED (
  SELECT node, count(*) AS degree FROM (
    SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY node),
t AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1 JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
c AS MATERIALIZED (
  SELECT node, count(*) AS triangles FROM (
    SELECT x AS node FROM t UNION ALL SELECT y FROM t
    UNION ALL SELECT z FROM t) GROUP BY node),
r AS (
  SELECT d.node, d.degree,
         CAST(coalesce(c.triangles, 0) AS BIGINT) AS triangles
  FROM d LEFT JOIN c ON d.node = c.node)
SELECT node, CAST(degree AS BIGINT) AS degree, triangles, {q}
FROM r
"""


def _kg_communities_oracle(iterations: int = 3,
                           kg_sql: str | None = None) -> str:
    """SQL twin of plans.kg_analytics.label_propagation: the fixed
    round count unrolls into chained CTEs — per round, the
    neighbor-label counts (c{k}), the per-node argmax with the
    (count DESC, label ASC) tie-break (p{k}), and the synchronous
    label update with isolated nodes coalescing to their own id
    (l{k}).  Every CTE is MATERIALIZED for the same reason as the
    pagerank unroll: l{k} is referenced twice by round k+1 and the
    final size join, so an inlined unroll re-evaluates the gold-KG
    chain combinatorially."""
    steps = []
    for k in range(1, iterations + 1):
        p = k - 1
        steps.append(f""",
c{k} AS MATERIALIZED (
  SELECT s.x AS node, l.label, count(*) AS c
  FROM sym s JOIN l{p} l ON s.y = l.node GROUP BY s.x, l.label),
p{k} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT node, label,
      row_number() OVER (PARTITION BY node
                         ORDER BY c DESC, label ASC) AS rn
    FROM c{k}) WHERE rn = 1),
l{k} AS MATERIALIZED (
  SELECT v.node, coalesce(p.label, v.node) AS label
  FROM v LEFT JOIN p{k} p USING (node))""")
    return f"""WITH kg AS MATERIALIZED ({kg_sql or _kg_gold_oracle()}),
e AS MATERIALIZED (
  SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
  FROM kg WHERE subj <> obj),
sym AS MATERIALIZED (
  SELECT a AS x, b AS y FROM e UNION ALL SELECT b, a FROM e),
v AS MATERIALIZED (SELECT subj AS node FROM kg UNION SELECT obj FROM kg),
l0 AS MATERIALIZED (SELECT node, node AS label FROM v){''.join(steps)},
sz AS (SELECT label, count(*) AS community_size
       FROM l{iterations} GROUP BY label)
SELECT l.node, l.label AS community,
       CAST(sz.community_size AS BIGINT) AS community_size
FROM l{iterations} l JOIN sz USING (label)
"""


def _kg_distances_oracle(max_hops: int = 3, seed_prefix: str = "repo:",
                         kg_sql: str | None = None) -> str:
    """SQL twin of plans.kg_analytics.bfs_distances, in full-relaxation
    form: d{k} = per-node min over d{k-1} plus every edge-propagated
    d{k-1}+1.  Equivalent to the Spark side's frontier BFS because an
    unweighted graph reaches every node first at its minimum hop
    count.  Unreached nodes never enter any d{k}, matching the Spark
    output's omission."""
    steps = []
    for k in range(1, max_hops + 1):
        p = k - 1
        steps.append(f""",
d{k} AS MATERIALIZED (
  SELECT node, min(dist) AS dist FROM (
    SELECT node, dist FROM d{p}
    UNION ALL
    SELECT s.y AS node, d.dist + 1 AS dist
    FROM sym s JOIN d{p} d ON s.x = d.node)
  GROUP BY node)""")
    return f"""WITH kg AS MATERIALIZED ({kg_sql or _kg_gold_oracle()}),
e AS MATERIALIZED (
  SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
  FROM kg WHERE subj <> obj),
sym AS MATERIALIZED (
  SELECT a AS x, b AS y FROM e UNION ALL SELECT b, a FROM e),
v AS MATERIALIZED (SELECT subj AS node FROM kg UNION SELECT obj FROM kg),
d0 AS MATERIALIZED (
  SELECT node, 0 AS dist FROM v
  WHERE node LIKE '{seed_prefix}%'){''.join(steps)}
SELECT node, CAST(dist AS INT) AS dist FROM d{max_hops}
"""


def _kmv_oracle(k: int = 64) -> str:
    """SQL twin of operators.curate.kmv_distinct: distinct 60-bit md5
    hashes per language, the k minima via the same rank window, and
    the (k−1)·2^60/h_k estimate in the identical IEEE operation order
    (2^60 is exactly representable, the product 63·2^60 needs 66 bits
    of magnitude but only 6 of mantissa, so both the multiply and the
    single divide are exact-input operations)."""
    space = f"{float(16 ** 15)!r}"
    return f"""WITH h AS MATERIALIZED (
  SELECT DISTINCT lang,
         CAST(('0x' || substr(md5(text), 1, 15)) AS UBIGINT) AS h
  FROM documents),
r AS (
  SELECT lang, h,
         row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
  FROM h),
m AS (
  SELECT lang, count(*) AS n_sketch, max(h) AS hk
  FROM r WHERE rn <= {k} GROUP BY lang)
SELECT lang, CAST(n_sketch AS BIGINT) AS n_sketch,
  CAST(floor(
    CASE WHEN n_sketch < {k} THEN CAST(n_sketch AS DOUBLE)
         ELSE CAST({float(k - 1)!r} AS DOUBLE) * {space}
              / CAST(hk AS DOUBLE) END + 0.5) AS BIGINT) AS kmv_est_q
FROM m
"""


def _sql_str(lit: str) -> str:
    return "'" + lit.replace("'", "''") + "'"


def _kg_filter_sql(filt, first: dict) -> str:
    """DuckDB twin of kg_query._filter_column: one parsed FILTER tuple
    → one WHERE conjunct over the variables' first binding sites.
    Both engines search (not anchor) the regex and compare strings by
    codepoint, and a null operand (unmatched OPTIONAL) fails the
    predicate in both — SPARQL's error-eliminates-row.  The boolean
    connectives recurse; SQL three-valued null logic IS SPARQL's error
    algebra for them (TRUE OR NULL, FALSE AND NULL, NOT NULL), so the
    twin is the literal AND/OR/NOT."""
    from ner_spark.plans.kg_query import parse_filter

    if isinstance(filt, str):
        filt = parse_filter(filt)
    kind = filt[0]
    if kind in ("and", "or"):
        glue = " AND " if kind == "and" else " OR "
        return ("(" + glue.join(_kg_filter_sql(f, first)
                                for f in filt[1]) + ")")
    if kind == "not":
        return f"NOT ({_kg_filter_sql(filt[1], first)})"
    var = filt[1]
    ref = first[var]
    if kind == "bound":
        return f"{ref} IS NOT NULL"
    if kind in ("in", "notin"):
        vals = ", ".join(_sql_str(v) for v in filt[2])
        return f"{ref} {'NOT IN' if kind == 'notin' else 'IN'} ({vals})"
    if kind == "cmp":
        _, _, op, (rkind, rval) = filt
        rhs = first[rval] if rkind == "var" else _sql_str(rval)
        return f"{ref} {'<>' if op == '!=' else op} {rhs}"
    fn = {"regex": "regexp_matches", "strstarts": "starts_with",
          "strends": "ends_with", "contains": "contains"}[kind]
    return f"{fn}({ref}, {_sql_str(filt[2])})"


def _kg_bind_sql(expr, refs: dict) -> str:
    """DuckDB twin of kg_query._bind_column: one parsed BIND
    expression → a SQL scalar over the variables' binding sites.
    ``||`` and the scalar functions null-propagate, matching Spark's
    concat/upper/lower/length — SPARQL's error-→-unbound."""
    def term(t):
        kind, val = t
        if kind == "const":
            return _sql_str(val)
        if val not in refs:
            raise ValueError(f"BIND references unbound variable {val}")
        return refs[val]

    kind = expr[0]
    if kind in ("var", "const"):
        return term(expr)
    if kind == "concat":
        return "(" + " || ".join(term(t) for t in expr[1]) + ")"
    if kind == "coalesce":
        return ("coalesce(" + ", ".join(term(t) for t in expr[1])
                + ")")
    if kind == "substr":
        return f"substr({term(expr[1])}, {expr[2]}, {expr[3]})"
    if kind == "replace":
        # 'g' flag: DuckDB replaces the FIRST match by default, Spark
        # regexp_replace is global
        return (f"regexp_replace({term(expr[1])}, "
                f"{_sql_str(expr[2])}, {_sql_str(expr[3])}, 'g')")
    if kind in ("strbefore", "strafter"):
        # FIRST-occurrence prefix/suffix, '' when absent, null stays
        # null (no CASE branch matches a null strpos) — the literal
        # twin of the Spark when-chain
        t, sep = term(expr[1]), _sql_str(expr[2])
        pos = f"strpos({t}, {sep})"
        hit = (f"substr({t}, 1, {pos} - 1)" if kind == "strbefore"
               else f"substr({t}, {pos} + {len(expr[2])})")
        return (f"(CASE WHEN {pos} > 0 THEN {hit} "
                f"WHEN {pos} = 0 THEN '' END)")
    if kind == "if":
        # null (error) condition falls to ELSE — CASE semantics in
        # both engines, the documented divergence from SPARQL
        return (f"(CASE WHEN {_kg_filter_sql(expr[1], refs)} "
                f"THEN {term(expr[2])} ELSE {term(expr[3])} END)")
    arg = term(expr[1])
    if kind == "ucase":
        return f"upper({arg})"
    if kind == "lcase":
        return f"lower({arg})"
    if kind == "str":
        return arg
    if kind == "strlen":
        return f"CAST(length({arg}) AS VARCHAR)"
    if kind == "sha256":
        return f"sha256({arg})"
    if kind == "md5":
        return f"md5({arg})"
    raise ValueError(f"unknown BIND expression kind {kind!r}")


def _kg_path_ctes(idx: int, pred: str, zero: bool,
                  max_hops: int | None, prefix: str = "",
                  graph: str | None = None,
                  graph_in: list | None = None,
                  with_graph: bool = False) -> tuple[str, str]:
    """Recursive-CTE twin of kg_query.path_closure: distinct pairs
    connected by 1..n (or with ``zero`` 0..n) hops of ``pred``.
    Returns (cte_sql, relation_name).  The recursive UNION dedups, so
    the relation has the same SET semantics as the Spark closure; the
    bounded form carries a hop counter and dedups at the end."""
    e = f"{prefix}pe{idx}"
    c = f"{prefix}pc{idx}"
    p = f"{prefix}pp{idx}"
    from ner_spark.plans.kg_query import _pred_alternatives

    alts = ", ".join(_sql_str(a) for a in _pred_alternatives(pred))
    gf = f" AND graph = {_sql_str(graph)}" if graph is not None else ""
    if graph_in is not None:
        gin = ", ".join(_sql_str(g) for g in graph_in)
        gf += f" AND graph IN ({gin})"
    gc = "graph, " if with_graph else ""
    gj = " AND c.graph = e.graph" if with_graph else ""
    gp = "c.graph, " if with_graph else ""
    ctes = [f"{e} AS (SELECT DISTINCT {gc}subj, obj FROM kg "
            f"WHERE pred IN ({alts}){gf})"]
    if max_hops is None:
        ctes.append(
            f"{c} AS (SELECT {gc}subj, obj FROM {e} "
            f"UNION SELECT {gp}c.subj, e.obj FROM {c} c "
            f"JOIN {e} e ON c.obj = e.subj{gj})"
        )
        body = f"SELECT {gc}subj, obj FROM {c}"
    else:
        ctes.append(
            f"{c} AS (SELECT {gc}subj, obj, 1 AS h FROM {e} "
            f"UNION SELECT {gp}c.subj, e.obj, c.h + 1 FROM {c} c "
            f"JOIN {e} e ON c.obj = e.subj{gj} "
            f"WHERE c.h < {int(max_hops)})"
        )
        body = f"SELECT DISTINCT {gc}subj, obj FROM {c}"
    if zero:
        # NOTE: under WITH RECURSIVE, DuckDB treats ANY cte whose body
        # is `base UNION step` as a recursive union-table (different
        # dedup semantics), so non-recursive CTEs here must spell the
        # dedup as DISTINCT over UNION ALL instead of a bare UNION
        gconds = ([f"graph = {_sql_str(graph)}"]
                  if graph is not None else [])
        if graph_in is not None:
            gconds.append("graph IN (" + ", ".join(
                _sql_str(g) for g in graph_in) + ")")
        gw = (" WHERE " + " AND ".join(gconds)) if gconds else ""
        if with_graph:
            body = (
                f"SELECT DISTINCT graph, subj, obj FROM ({body} "
                "UNION ALL SELECT graph, n, n FROM "
                f"(SELECT graph, subj AS n FROM kg{gw} "
                f"UNION ALL SELECT graph, obj FROM kg{gw}))"
            )
        else:
            body = (
                f"SELECT DISTINCT subj, obj FROM ({body} UNION ALL "
                f"SELECT n, n FROM (SELECT subj AS n FROM kg{gw} "
                f"UNION ALL SELECT obj FROM kg{gw}))"
            )
    ctes.append(f"{p} AS ({body})")
    return ",\n".join(ctes), p


def _kg_seq_cte(idx: int, segs: list, ctes: list,
                path_max_hops, prefix: str = "",
                graph: str | None = None,
                quads: bool = False,
                dataset: dict | None = None) -> tuple[str, str]:
    """Non-recursive-CTE twin of kg_query._sequence_relation: the
    sequence path's segments compile through :func:`_kg_element_sql`
    on fresh ``?__s{i}`` chain variables (so inverse / closure /
    alternation / nested-sequence segments all compose, closures
    appending their own recursive CTEs), comma-joined by the repeated
    chain variables' equality conds, projected to (subj, obj) WITHOUT
    DISTINCT — SPARQL's multiset sequence semantics, matching the
    Spark join chain.  Returns (cte_sql, relation_name)."""
    sfirst: dict[str, str] = {}
    froms: list[str] = []
    conds: list[str] = []
    for i, seg in enumerate(segs):
        # table aliases are scoped to this CTE's one SELECT, so the
        # entry idx is fine for them; the CTE NAME is derived from
        # len(ctes) AFTER the segments compiled — a nested sequence /
        # closure segment appends its own CTEs first, so naming at
        # entry would collide (two sq0's for a nested sequence)
        alias = f"sq{idx}_{i}"
        el = (f"?__s{i}", seg, f"?__s{i + 1}")
        if graph is not None:  # constant-graph sequence: every
            el = (graph,) + el  # segment stays inside the graph
        rel, ec = _kg_element_sql(
            alias, el, sfirst, ctes,
            path_max_hops, prefix=prefix, quads=quads,
            dataset=dataset)
        froms.append(f"{rel} {alias}")
        conds.extend(ec)
    where = " AND ".join(conds) if conds else "TRUE"
    name = f"{prefix}sq{len(ctes)}"
    return (f"{name} AS (SELECT {sfirst['?__s0']} AS subj, "
            f"{sfirst[f'?__s{len(segs)}']} AS obj "
            f"FROM {', '.join(froms)} WHERE {where})"), name


def _kg_element_sql(alias: str, element, first: dict, ctes: list,
                    path_max_hops, outer: dict | None = None,
                    prefix: str = "", quads: bool = False,
                    dataset: dict | None = None):
    """Shared per-element compile for the pattern oracle: returns
    (relation_name, conds).  Variable first-binding sites register in
    ``first``; with ``outer`` given (negation groups) outer-bound
    variables correlate instead.  Path elements append their recursive
    CTEs and bind (subj, obj) of the closure relation; sequence-path
    elements append a chain CTE (:func:`_kg_seq_cte`) the same way."""
    from ner_spark.plans.kg_query import _negated_set, _path_pred, \
        _sequence_segments, _split_graph

    gterm, element = _split_graph(element)
    gconst = gterm if gterm is not None and not gterm.startswith("?") \
        else None
    if element[1].startswith("^"):
        # inverse path: swap endpoints, same as the Spark compile
        element = (element[2], element[1][1:], element[0])
    segs = _sequence_segments(element[1])
    # same parse order as _element_relation: sequence, negated set,
    # closure — so !A/B is a sequence and !P+ raises the engine's own
    # closure error before any SQL is built
    negset = None if segs is not None else _negated_set(element[1])
    path = None if segs is not None or negset is not None \
        else _path_pred(element[1])
    if gterm is not None and gconst is None and segs is not None:
        # parity with _element_relation's variable-graph seq guard
        raise ValueError(
            f"sequence path {element[1]!r} under a VARIABLE graph "
            f"{gterm} is unsupported")
    named = (dataset or {}).get("named") if quads else None
    default = (dataset or {}).get("default") if quads else None
    if gterm is not None and gconst is None and path is not None:
        # variable-graph closure: per-graph recursive CTE (the graph
        # column rides the recursion), graph term binds from it
        base_p, mod = path
        cte, rel = _kg_path_ctes(len(ctes), base_p, mod in "*?",
                                 1 if mod == "?" else path_max_hops,
                                 prefix=prefix, graph_in=named,
                                 with_graph=True)
        ctes.append(cte)
        fields = ("graph", "subj", "obj")
        terms = (gterm, element[0], element[2])
        segs = path = None
        gterm = gconst = None
    elif segs is not None:
        cte, rel = _kg_seq_cte(len(ctes), segs, ctes, path_max_hops,
                               prefix=prefix, graph=gconst,
                               quads=quads,
                               dataset=None if gconst else dataset)
        ctes.append(cte)
        fields, terms = ("subj", "obj"), (element[0], element[2])
    elif path is not None:
        base, mod = path
        cte, rel = _kg_path_ctes(len(ctes), base, mod in "*?",
                                 1 if mod == "?" else path_max_hops,
                                 prefix=prefix, graph=gconst,
                                 graph_in=(default if gconst is None
                                           and gterm is None else None))
        ctes.append(cte)
        fields, terms = ("subj", "obj"), (element[0], element[2])
    elif gterm is not None and gconst is None:
        # variable graph: the graph column binds like any field
        rel = "kg"
        fields = ("graph", "subj", "pred", "obj")
        terms = (gterm,) + tuple(element)
    else:
        # plain element: over quads the default graph is the RDF
        # merge of the named graphs — the DISTINCT triple projection
        # (kgd); a CONSTANT graph scans kg with a graph equality
        rel = "kg" if gconst is not None else ("kgd" if quads else "kg")
        fields, terms = ("subj", "pred", "obj"), element
    conds0: list[str] = []
    if gconst is not None and segs is None and path is None:
        conds0.append(f"{alias}.graph = {_sql_str(gconst)}")
    if gterm is not None and named is not None:
        if gconst is not None:
            if gconst not in named:  # outside FROM NAMED: no match
                conds0.append("1 = 0")
        elif segs is None and path is None:
            gin = ", ".join(_sql_str(g) for g in named)
            conds0.append(f"{alias}.graph IN ({gin})")
    conds: list[str] = list(conds0)
    for field, term in zip(fields, terms):
        ref = f"{alias}.{field}"
        if term.startswith("?"):
            if outer is not None and term in outer:
                conds.append(f"{ref} = {outer[term]}")
            elif term in first:
                conds.append(f"{ref} = {first[term]}")
            else:
                first[term] = ref
        elif field == "pred" and negset is not None:
            alts = ", ".join(_sql_str(a) for a in negset)
            conds.append(f"{ref} NOT IN ({alts})")
        elif field == "pred" and "|" in term:
            from ner_spark.plans.kg_query import _pred_alternatives

            alts = ", ".join(_sql_str(a)
                             for a in _pred_alternatives(term))
            conds.append(f"{ref} IN ({alts})")
        else:
            conds.append(f"{ref} = {_sql_str(term)}")
    return rel, conds


def _kg_negation_sql(gidx: int, group, outer: dict, ctes: list,
                     path_max_hops, negated: bool = True,
                     prefix: str = "", quads: bool = False,
                     dataset: dict | None = None) -> str:
    """(NOT) EXISTS twin of match_pattern's negation anti-join /
    existence semi-join: group elements comma-join inside the
    subquery, variables bound in the outer pattern correlate to their
    first binding site (a null correlation fails the equality — which
    KEEPS the row under NOT EXISTS and DROPS it under EXISTS, the
    anti/semi join null rules), group-local variables are
    existential."""
    gfirst: dict[str, str] = {}
    froms: list[str] = []
    conds: list[str] = []
    for j, element in enumerate(group):
        alias = f"{'n' if negated else 'x'}{gidx}_{j}"
        rel, ec = _kg_element_sql(alias, element, gfirst, ctes,
                                  path_max_hops, outer=outer,
                                  prefix=prefix, quads=quads,
                                  dataset=dataset)
        froms.append(f"{rel} {alias}")
        conds.extend(ec)
    where = " AND ".join(conds) if conds else "TRUE"
    return (f"{'NOT ' if negated else ''}EXISTS "
            f"(SELECT 1 FROM {', '.join(froms)} WHERE {where})")


def _kg_minus_sql(gidx: int, group, outer: dict, ctes: list,
                  path_max_hops, prefix: str = "",
                  quads: bool = False,
                  dataset: dict | None = None) -> str | None:
    """SQL twin of match_pattern's MINUS set-difference: the group
    compiles UNCORRELATED (its elements chain among themselves via
    ``gfirst``), then the NOT EXISTS applies SPARQL compatibility —
    null-or-equal per shared variable plus an any-non-null
    domain-overlap guard — against the outer binding sites.  Returns
    None when the group shares no variable with the outer pattern
    (disjoint domains: MINUS removes nothing), mirroring the
    operator's ``continue``."""
    gfirst: dict[str, str] = {}
    froms: list[str] = []
    conds: list[str] = []
    for j, element in enumerate(group):
        alias = f"mi{gidx}_{j}"
        rel, ec = _kg_element_sql(alias, element, gfirst, ctes,
                                  path_max_hops, prefix=prefix,
                                  quads=quads, dataset=dataset)
        froms.append(f"{rel} {alias}")
        conds.extend(ec)
    shared = sorted(v for v in gfirst if v in outer)
    if not shared:
        return None
    for v in shared:
        conds.append(
            f"({outer[v]} IS NULL OR {outer[v]} = {gfirst[v]})")
    conds.append(
        "(" + " OR ".join(f"{outer[v]} IS NOT NULL" for v in shared)
        + ")")
    return (f"NOT EXISTS (SELECT 1 FROM {', '.join(froms)} "
            f"WHERE {' AND '.join(conds)})")


def _kg_values_sql(values, first: dict, required: set) -> tuple:
    """SQL twin of kg_query._join_values: the inline data block as a
    VALUES relation (UNDEF → NULL), joined with SPARQL compatibility —
    equi on never-null shared variables, either-side-null-or-equal on
    the rest — returning (join_clause, select_overrides) where the
    overrides merge shared nullable variables via coalesce and bind
    data-only variables from the relation."""
    vars_, rows = values
    cols = [f"c_{v[1:]}" for v in vars_]
    lits = ", ".join(
        "(" + ", ".join(
            "CAST(NULL AS VARCHAR)" if t is None else _sql_str(t)
            for t in row) + ")"
        for row in rows)
    undef = {v for j, v in enumerate(vars_)
             if any(row[j] is None for row in rows)}
    conds, overrides = [], {}
    for v, c in zip(vars_, cols):
        ref = f"vv.{c}"
        if v in first:
            old = first[v]
            if v in required and v not in undef:
                conds.append(f"{ref} = {old}")
            else:
                conds.append(
                    f"({ref} IS NULL OR {old} IS NULL OR {ref} = {old})")
                if v not in required:
                    overrides[v] = f"coalesce({old}, {ref})"
        else:
            first[v] = ref
    join = (f"JOIN (VALUES {lits}) vv({', '.join(cols)}) ON "
            + (" AND ".join(conds) if conds else "TRUE"))
    return join, overrides


def _kg_subquery_vars(sub) -> list[str]:
    """The output column names of a subquery's solutions() kwargs —
    the same scope rule the engine applies: an explicit SELECT list,
    else group keys + aggregate aliases when grouped, else every
    variable the (union of) pattern(s) binds."""
    from ner_spark.plans.kg_query import parse_aggregate

    if sub.get("select"):
        return [s[1:] if s.startswith("?") else s
                for s in sub["select"]]
    keys = [v[1:] for v in sub.get("group_by", ())]
    aliases = [(parse_aggregate(a) if isinstance(a, str) else a)[2]
               for a in sub.get("aggregates", ())]
    if keys or aliases:
        return keys + aliases
    if sub.get("union") is not None:
        out: list[str] = []
        for g in sub["union"]:
            g = dict(g) if isinstance(g, dict) else {"pattern": g}
            for v in _kg_branch_vars(g["pattern"],
                                     g.get("optional", ()),
                                     g.get("values"),
                                     g.get("binds", ())):
                if v[1:] not in out:
                    out.append(v[1:])
        return out
    return [v[1:] for v in _kg_branch_vars(
        sub.get("pattern", ()), sub.get("optional", ()),
        sub.get("values"), sub.get("binds", ()))]


def _kg_pattern_oracle(pattern, optional=(), fill_null=(), filters=(),
                       negation=(), existence=(), minus=(),
                       subqueries=(), values=None, binds=(),
                       path_max_hops=None,
                       kg_sql: str | None = None,
                       prefix: str = "",
                       quads: bool = False,
                       dataset: dict | None = None) -> str:
    """SQL twin of plans.kg_query.match_pattern: every pattern element
    becomes one alias of the triple relation; constants and repeated
    variables become equality predicates (first element → WHERE,
    later elements → their JOIN ON), ``optional`` elements LEFT JOIN
    with ALL their predicates in the ON clause (the SPARQL OPTIONAL
    placement — a WHERE would re-require the match), and the select
    list is each variable's FIRST binding site — the same
    first-appearance order and multiset semantics the Spark join
    chain produces.  Property-path elements (``P+``/``P*``) become
    recursive CTEs with the closure's SET semantics; ``negation``
    groups become correlated NOT EXISTS conjuncts."""
    first: dict[str, str] = {}
    where0: list[str] = []
    joins: list[str] = []
    ctes: list[str] = []
    opt_groups = [el for el in optional if isinstance(el, dict)]
    elements = [(el, False) for el in pattern] + [
        (el, True) for el in optional if not isinstance(el, dict)
    ]
    for i, (element, is_optional) in enumerate(elements):
        rel, conds = _kg_element_sql(f"t{i}", element, first, ctes,
                                     path_max_hops, prefix=prefix,
                                     quads=quads, dataset=dataset)
        if i == 0:
            from0 = f"{rel} t0"
            where0 = conds
        else:
            kind = "LEFT JOIN" if is_optional else "JOIN"
            joins.append(
                f"{kind} {rel} t{i} ON "
                + (" AND ".join(conds) if conds else "TRUE")
            )
    # subqueries join as derived tables on their shared (required)
    # variables, new projected variables binding from the sub alias —
    # the sub-SQL carries its own WITH (scoped: the inner kg shadows)
    for i, sub in enumerate(subqueries):
        sub_sql = _kg_solutions_oracle(**sub, kg_sql=kg_sql,
                                       prefix=f"{prefix}sub{i}_",
                                       quads=quads, dataset=dataset)
        alias = f"{prefix}sub{i}"
        conds = []
        for name in _kg_subquery_vars(sub):
            v, ref = "?" + name, f"{alias}.{name}"
            if v in first:
                conds.append(f"{ref} = {first[v]}")
            else:
                first[v] = ref
        joins.append(
            f"JOIN ({sub_sql.rstrip()}) {alias} ON "
            + (" AND ".join(conds) if conds else "TRUE"))
    # OPTIONAL GROUPS left-join a derived table of the group's own
    # pattern oracle (its local filters/binds INSIDE the subselect,
    # the SPARQL placement) on the shared required variables — the
    # engine raises when only optional variables are shared, so the
    # plain equality here is never exercised on a nullable site
    for i, g in enumerate(opt_groups):
        g_sql = _kg_pattern_oracle(
            g["pattern"], filters=g.get("filters", ()),
            binds=g.get("binds", ()), path_max_hops=path_max_hops,
            kg_sql=kg_sql, prefix=f"{prefix}og{i}_", quads=quads,
            dataset=dataset)
        alias = f"{prefix}og{i}"
        conds = []
        for v in _kg_branch_vars(g["pattern"],
                                 binds=g.get("binds", ())):
            ref = f"{alias}.{v[1:]}"
            if v in first:
                conds.append(f"{ref} = {first[v]}")
            else:
                first[v] = ref
        joins.append(
            f"LEFT JOIN ({g_sql.rstrip()}) {alias} ON "
            + (" AND ".join(conds) if conds else "TRUE"))
    overrides: dict = {}
    if values is not None:
        required = set(_kg_branch_vars(pattern))
        vjoin, overrides = _kg_values_sql(values, first, required)
        joins.append(vjoin)
    # BINDs inline their expression SQL at every reference site
    # (SELECT and later binds/filters/negation all see the same
    # scalar — SQL's no-alias-in-WHERE rule makes inlining the only
    # portable twin of Spark's withColumn)
    for b in binds:
        if isinstance(b, str):
            from ner_spark.plans.kg_query import parse_bind
            b = parse_bind(b)
        var, expr = b
        brefs = {**first, **overrides}
        if var in brefs:
            raise ValueError(
                f"BIND target {var} is already bound — SPARQL forbids "
                "rebinding a variable in scope")
        first[var] = f"({_kg_bind_sql(expr, brefs)})"
    # ``fill_null`` vars coalesce to '' — the contract keys (and the
    # fuzz) compare through a sort that cannot order None against str,
    # so the nullable OPTIONAL columns are sentinel-filled in BOTH
    # engines; the operator itself keeps true null semantics
    sel = ", ".join(
        (f"coalesce({overrides.get(var, ref)}, '') AS {var[1:]}"
         if var in fill_null
         else f"{overrides.get(var, ref)} AS {var[1:]}")
        for var, ref in first.items()
    )
    # FILTERs and negation correlate on the merged (values-coalesced)
    # bindings, matching the Spark evaluation order: values join, then
    # group-scope filters, then NOT EXISTS
    refs = {**first, **overrides}
    conds = where0 + [_kg_filter_sql(flt, refs) for flt in filters]
    for g, group in enumerate(negation):
        if isinstance(group, str):
            from ner_spark.plans.kg_query import parse_pattern
            group = parse_pattern(group)
        conds.append(_kg_negation_sql(g, group, refs, ctes,
                                      path_max_hops, prefix=prefix,
                                      quads=quads, dataset=dataset))
    for g, group in enumerate(existence):
        if isinstance(group, str):
            from ner_spark.plans.kg_query import parse_pattern
            group = parse_pattern(group)
        conds.append(_kg_negation_sql(g, group, refs, ctes,
                                      path_max_hops, negated=False,
                                      prefix=prefix, quads=quads,
                                      dataset=dataset))
    for g, group in enumerate(minus):
        if isinstance(group, str):
            from ner_spark.plans.kg_query import parse_pattern
            group = parse_pattern(group)
        c = _kg_minus_sql(g, group, refs, ctes, path_max_hops,
                          prefix=prefix, quads=quads, dataset=dataset)
        if c is not None:
            conds.append(c)
    where = " AND ".join(conds) if conds else "TRUE"
    rec = "RECURSIVE " if ctes else ""
    cte_sql = "".join(c + ",\n" for c in ctes)
    # nested (prefix) form: reference the ancestor's kg CTE instead of
    # shadowing it (DuckDB rejects duplicate CTE aliases across scopes)
    dflt = (dataset or {}).get("default")
    kgd_where = ("" if dflt is None else
                 " WHERE graph IN (" + ", ".join(
                     _sql_str(g) for g in dflt) + ")")
    kg_cte = ("" if prefix
              else f"kg AS MATERIALIZED ({kg_sql or _kg_gold_oracle()}),\n"
              + (f"kgd AS MATERIALIZED (SELECT DISTINCT subj, pred, obj "
                 f"FROM kg{kgd_where}),\n" if quads else ""))
    return f"""WITH {rec}{kg_cte}{cte_sql}{prefix}__one AS (SELECT 1)
SELECT {sel}
FROM {from0}
{chr(10).join(joins)}
WHERE {where}
"""


def _kg_branch_vars(pattern, optional=(), values=None,
                    binds=(), subqueries=()) -> list:
    """The ?variables a BGP branch binds, in the same first-appearance
    order match_pattern emits (fields order within an element; path
    and sequence elements bind only their endpoints; VALUES-only
    variables append after the pattern's)."""
    from ner_spark.plans.kg_query import (_path_pred,
                                          _sequence_segments,
                                          _split_graph)

    out: list[str] = []
    for el in list(pattern) + list(optional):
        if isinstance(el, dict):  # OPTIONAL group
            for v in _kg_branch_vars(el["pattern"],
                                     binds=el.get("binds", ())):
                if v not in out:
                    out.append(v)
            continue
        gterm, el = _split_graph(el)
        is_path = (_sequence_segments(el[1]) is not None
                   or _path_pred(el[1]) is not None)
        terms = (el[0], el[2]) if is_path else tuple(el)
        if gterm is not None:  # quad: the graph term binds FIRST
            terms = (gterm,) + terms
        for t in terms:
            if t.startswith("?") and t not in out:
                out.append(t)
    for sub in subqueries:
        out.extend("?" + n for n in _kg_subquery_vars(sub)
                   if "?" + n not in out)
    if values is not None:
        out.extend(v for v in values[0] if v not in out)
    for b in binds:
        if isinstance(b, str):
            from ner_spark.plans.kg_query import parse_bind
            b = parse_bind(b)
        if b[0] not in out:
            out.append(b[0])
    return out


def _kg_union_oracle(groups, filters=(), fill_null=(),
                     path_max_hops=None,
                     kg_sql: str | None = None,
                     prefix: str = "", quads: bool = False,
                     dataset: dict | None = None) -> str:
    """SQL twin of plans.kg_query.match_union: each group's BGP oracle
    becomes one UNION ALL arm, projected to the union of the branch
    variable sets with NULL for the variables a branch does not bind
    (SPARQL's unbound), outer FILTERs conjoin over the union'd columns
    (null operand → row eliminated, both engines), and ``fill_null``
    sentinel-fills nullable columns for the hash compare like the
    pattern oracle does."""
    norm = [dict(g) if isinstance(g, dict) else {"pattern": g}
            for g in groups]
    branch_vars = [_kg_branch_vars(g["pattern"], g.get("optional", ()),
                                   g.get("values"), g.get("binds", ()),
                                   g.get("subqueries", ()))
                   for g in norm]
    all_vars: list[str] = []
    for bv in branch_vars:
        for v in bv:
            if v not in all_vars:
                all_vars.append(v)
    arms = []
    for i, (g, bv) in enumerate(zip(norm, branch_vars)):
        inner = _kg_pattern_oracle(
            g["pattern"], optional=g.get("optional", ()),
            filters=g.get("filters", ()),
            negation=g.get("negation", ()),
            existence=g.get("existence", ()),
            minus=g.get("minus", ()),
            subqueries=g.get("subqueries", ()),
            values=g.get("values"),
            binds=g.get("binds", ()),
            path_max_hops=path_max_hops, kg_sql=kg_sql,
            prefix=f"{prefix}u{i}_", quads=quads, dataset=dataset)
        sel = ", ".join(
            v[1:] if v in bv else f"NULL AS {v[1:]}" for v in all_vars)
        arms.append(f"SELECT {sel} FROM (\n{inner}) u{i}")
    body = "\nUNION ALL\n".join(arms)
    refs = {v: v[1:] for v in all_vars}
    where = " AND ".join(_kg_filter_sql(flt, refs) for flt in filters)
    sel = ", ".join(
        (f"coalesce({v[1:]}, '') AS {v[1:]}"
         if v in fill_null else v[1:]) for v in all_vars)
    # the arms are prefixed (no kg of their own), so the union itself
    # declares kg once at top level — or, nested, uses the ancestor's
    udflt = (dataset or {}).get("default")
    ukgd_where = ("" if udflt is None else
                  " WHERE graph IN (" + ", ".join(
                      _sql_str(g) for g in udflt) + ")")
    head = ("" if prefix else
            f"WITH kg AS MATERIALIZED ({kg_sql or _kg_gold_oracle()})"
            + (f",\nkgd AS MATERIALIZED (SELECT DISTINCT subj, pred, "
               f"obj FROM kg{ukgd_where})" if quads else "") + "\n")
    return (f"{head}SELECT {sel} FROM (\n{body}\n) u"
            + (f"\nWHERE {where}" if where else "") + "\n")


def _kg_construct_oracle(pattern, template, optional=(), filters=(),
                         negation=(), existence=(), minus=(),
                         subqueries=(), values=None, binds=(),
                         kg_sql: str | None = None,
                         quads: bool = False,
                         dataset: dict | None = None) -> str:
    """SQL twin of plans.kg_query.construct: the BGP oracle as a CTE,
    one SELECT per template element (variables → the binding columns,
    constants → literals) UNION ALL'd, null terms dropped (SPARQL's
    ill-formed-instantiation skip covers unmatched OPTIONAL vars), and
    the collapsed multiplicity counted as evidence_count."""
    inner = _kg_pattern_oracle(pattern, optional=optional,
                               filters=filters, negation=negation,
                               existence=existence, minus=minus,
                               subqueries=subqueries,
                               values=values, binds=binds,
                               kg_sql=kg_sql, quads=quads,
                               dataset=dataset)
    arms = []
    for element in template:
        terms = []
        for field, term in zip(("subj", "pred", "obj"), element):
            src = term[1:] if term.startswith("?") else _sql_str(term)
            terms.append(f"{src} AS {field}")
        arms.append(f"SELECT {', '.join(terms)} FROM b")
    return f"""WITH b AS ({inner}),
c AS ({' UNION ALL '.join(arms)})
SELECT subj, pred, obj, count(*) AS evidence_count
FROM c
WHERE subj IS NOT NULL AND pred IS NOT NULL AND obj IS NOT NULL
GROUP BY 1, 2, 3
"""


def _kg_solutions_oracle(pattern=(), optional=(), filters=(),
                         negation=(), existence=(), minus=(),
                         subqueries=(), union=None, values=None,
                         binds=(), fill_null=(), path_max_hops=None,
                         group_by=(), aggregates=(), having=(),
                         select=None, distinct=False, order_by=(),
                         offset=None, limit=None,
                         kg_sql: str | None = None,
                         prefix: str = "",
                         quads: bool = False,
                         dataset: dict | None = None) -> str:
    """SQL twin of plans.kg_query.solutions: the BGP oracle as a CTE
    with GROUP BY / aggregates / projection / DISTINCT / ORDER BY /
    LIMIT layered on top, using the exact same modifier semantics —
    count(?v) skips nulls, count(*) counts rows, group_concat is the
    pinned sorted-distinct-joined form, string order is binary in
    both engines."""
    from ner_spark.plans.kg_query import parse_aggregate, parse_order

    if union is not None:
        inner = _kg_union_oracle(union, filters=filters,
                                 fill_null=fill_null,
                                 path_max_hops=path_max_hops,
                                 kg_sql=kg_sql, prefix=prefix,
                                 quads=quads, dataset=dataset)
    else:
        inner = _kg_pattern_oracle(pattern, optional=optional,
                                   filters=filters, negation=negation,
                                   existence=existence, minus=minus,
                                   subqueries=subqueries,
                                   values=values, binds=binds,
                                   fill_null=fill_null,
                                   path_max_hops=path_max_hops,
                                   kg_sql=kg_sql, prefix=prefix,
                                   quads=quads, dataset=dataset)
    keys = [v[1:] for v in group_by]
    aggs = [parse_aggregate(a) if isinstance(a, str) else a
            for a in aggregates]
    grouped = bool(keys or aggs)
    if grouped:
        terms = list(keys)
        for agg in aggs:
            fn, term, alias = agg[0], agg[1], agg[2]
            sep = _sql_str(agg[3] if len(agg) > 3 else ",")
            v = None if term == "*" else term[1:]
            # exact-decimal cast for SUM/AVG — the twin of Spark's
            # try_cast("decimal(38,9)") (junk/unbound → null, skipped)
            d = f"TRY_CAST({v} AS DECIMAL(38,9))"
            expr = {
                "count": f"count({v})" if v is not None else "count(*)",
                "count_distinct": f"count(DISTINCT {v})",
                "min": f"min({v})",
                "max": f"max({v})",
                # coalesce('') matches Spark's collect_set-of-nothing
                # → empty string on an all-null group
                "group_concat":
                    "coalesce(array_to_string("
                    f"list_sort(list(DISTINCT {v})), {sep}), '')",
                # SAMPLE is pinned to MIN (see kg_query.solutions)
                "sample": f"min({v})",
                "sum": f"CAST(sum({d}) AS DOUBLE)",
                "sum_distinct": f"CAST(sum(DISTINCT {d}) AS DOUBLE)",
                "avg": (f"CASE WHEN count({d}) > 0 THEN "
                        f"CAST(sum({d}) AS DOUBLE) / count({d}) END"),
            }[fn]
            terms.append(f"{expr} AS {alias}")
        sel = ", ".join(terms)
        group = (f"GROUP BY {', '.join(keys)}" if keys else "")
    else:
        sel, group = "*", ""
    if having:
        from ner_spark.plans.kg_query import parse_having

        hv = [parse_having(h) if isinstance(h, str) else h
              for h in having]
        group += " HAVING " + " AND ".join(
            f"{name} {'<>' if op == '!=' else op} {n}"
            for name, op, n in hv)
    if select is not None:
        proj = ", ".join(s[1:] if s.startswith("?") else s for s in select)
        body = (f"SELECT {proj} FROM "
                f"(SELECT {sel} FROM {prefix}b {group})")
    else:
        body = f"SELECT {sel} FROM {prefix}b {group}"
    if distinct:
        body = body.replace("SELECT ", "SELECT DISTINCT ", 1)
    order = ""
    if order_by:
        parts = []
        for o in order_by:
            name, asc = parse_order(o) if isinstance(o, str) else o
            # Spark's sort defaults: ASC NULLS FIRST / DESC NULLS LAST;
            # DuckDB defaults to NULLS LAST on ASC, so pin the null
            # order explicitly or a nullable ORDER BY under LIMIT
            # would page differently in the two engines
            parts.append(f"{name} "
                         + ("ASC NULLS FIRST" if asc
                            else "DESC NULLS LAST"))
        order = f"ORDER BY {', '.join(parts)}"
    lim = f"LIMIT {limit}" if limit is not None else ""
    off = f"OFFSET {offset}" if offset is not None else ""
    return f"""WITH {prefix}b AS ({inner})
{body}
{order} {lim} {off}
"""


def _kg_describe_oracle(terms, pattern=(), optional=(), filters=(),
                        negation=(), existence=(), minus=(),
                        subqueries=(), values=None, binds=(),
                        path_max_hops=None,
                        kg_sql: str | None = None) -> str:
    """SQL twin of plans.kg_query.describe: the described node set
    (constants + every value a DESCRIBE ?variable binds in the WHERE
    pattern) joined against the triple table on subject-or-object,
    as a DISTINCT triple set."""
    var_terms = [t for t in terms if t.startswith("?")]
    consts = [t for t in terms if not t.startswith("?")]
    # the triple relation is kg0 here: the nested pattern oracle
    # declares its own `kg` CTE, and DuckDB rejects duplicate aliases
    ctes = [f"kg0 AS MATERIALIZED ({kg_sql or _kg_gold_oracle()})"]
    arms = []
    if var_terms:
        inner = _kg_pattern_oracle(pattern, optional=optional,
                                   filters=filters, negation=negation,
                                   existence=existence, minus=minus,
                                   subqueries=subqueries,
                                   values=values, binds=binds,
                                   path_max_hops=path_max_hops,
                                   kg_sql=kg_sql)
        ctes.append(f"b AS ({inner})")
        arms += [f"SELECT {v[1:]} AS node FROM b" for v in var_terms]
    arms += [f"SELECT {_sql_str(c)} AS node" for c in consts]
    ctes.append(
        "n AS (SELECT DISTINCT node FROM ("
        + " UNION ALL ".join(arms)
        + ") WHERE node IS NOT NULL)")
    return ("WITH " + ",\n".join(ctes) + "\n"
            "SELECT DISTINCT kg0.subj, kg0.pred, kg0.obj\n"
            "FROM kg0 JOIN n ON kg0.subj = n.node OR kg0.obj = n.node\n")


def _kg_sparql_oracle(text: str, fill_null=(),
                      kg_sql: str | None = None,
                      quads: bool = False) -> str:
    """SQL twin of plans.sparql.sparql: the query TEXT parses once
    (plans.sparql.parse_sparql — no Spark dependency) and the same
    kwargs feed the form's existing oracle generator, so the text
    front-end and its DuckDB twin cannot drift apart."""
    from ner_spark.plans.sparql import parse_sparql

    kw = parse_sparql(text)
    form = kw.pop("form")
    if form == "select":
        return _kg_solutions_oracle(**kw, fill_null=fill_null,
                                    kg_sql=kg_sql, quads=quads)
    if form == "ask":
        if "union" in kw:
            inner = _kg_union_oracle(kw["union"], kg_sql=kg_sql,
                                     quads=quads)
        else:
            inner = _kg_pattern_oracle(**kw, kg_sql=kg_sql,
                                       quads=quads)
        return (f"SELECT count(*) > 0 AS ask FROM "
                f"(SELECT 1 FROM (\n{inner}) b LIMIT 1) c\n")
    if form == "describe":
        return _kg_describe_oracle(kw.pop("terms"), **kw, kg_sql=kg_sql)
    template = kw.pop("template")
    return _kg_construct_oracle(kw.pop("pattern"), template, **kw,
                                kg_sql=kg_sql, quads=quads)


def _kg_ntriples_oracle(kg_sql: str | None = None) -> str:
    """SQL twin of plans.kg_export.ntriples_lines(evidence=True):
    the same escape chains (imported — one source of truth) applied
    as nested replace(), concatenated into the data and reified
    evidence lines."""
    from ner_spark.plans.kg_export import (DEFAULT_BASE, _EDGE_ESCAPES,
                                           _ESCAPES)

    def esc(col, escapes):
        for raw, e in escapes:
            col = f"replace({col}, {_sql_str(raw)}, {_sql_str(e)})"
        return col

    b = DEFAULT_BASE

    def iri(col):
        return f"'<{b}' || {esc(col, _ESCAPES)} || '>'"

    edge = (f"'<{b}edge:' || {esc('subj', _EDGE_ESCAPES)} || '/' || "
            f"{esc('pred', _EDGE_ESCAPES)} || '/' || "
            f"{esc('obj', _EDGE_ESCAPES)} || '>'")
    return f"""WITH kg AS MATERIALIZED ({kg_sql or _kg_gold_oracle()})
SELECT {iri('subj')} || ' ' || {iri('pred')} || ' ' || {iri('obj')}
       || ' .' AS line FROM kg
UNION ALL
SELECT {edge} || ' <{b}evidence_count> "'
       || CAST(evidence_count AS VARCHAR)
       || '"^^<http://www.w3.org/2001/XMLSchema#integer> .' AS line
FROM kg
"""


def _kg_nquads_oracle(kg_sql: str | None = None) -> str:
    """SQL twin of plans.kg_export.nquads_lines(evidence=True): the
    N-Triples oracle's escape chains with the graph label as the
    fourth IRI and a graph-first reified edge id on the
    default-graph evidence lines."""
    from ner_spark.plans.kg_export import (DEFAULT_BASE, _EDGE_ESCAPES,
                                           _ESCAPES)

    def esc(col, escapes):
        for raw, e in escapes:
            col = f"replace({col}, {_sql_str(raw)}, {_sql_str(e)})"
        return col

    b = DEFAULT_BASE

    def iri(col):
        return f"'<{b}' || {esc(col, _ESCAPES)} || '>'"

    edge = (f"'<{b}edge:' || {esc('graph', _EDGE_ESCAPES)} || '/' || "
            f"{esc('subj', _EDGE_ESCAPES)} || '/' || "
            f"{esc('pred', _EDGE_ESCAPES)} || '/' || "
            f"{esc('obj', _EDGE_ESCAPES)} || '>'")
    return f"""WITH kg AS MATERIALIZED ({kg_sql or _kg_quads_gold_sql()})
SELECT {iri('subj')} || ' ' || {iri('pred')} || ' ' || {iri('obj')}
       || ' ' || {iri('graph')} || ' .' AS line FROM kg
UNION ALL
SELECT {edge} || ' <{b}evidence_count> "'
       || CAST(evidence_count AS VARCHAR)
       || '"^^<http://www.w3.org/2001/XMLSchema#integer> .' AS line
FROM kg
"""


def _kg_update_oracle(text: str, kg_sql: str | None = None) -> str:
    """SQL twin of plans.kg_update.apply_update: the update TEXT
    parses once (plans.kg_update.parse_update — shared with the Spark
    side), the WHERE bindings reuse the pattern/union oracle, and the
    delete/insert template arms project through them.  Deletes are a
    NOT EXISTS against the distinct delete set, inserts a counted
    GROUP BY anti-joined against the kept rows — the exact
    kept-keeps-its-evidence / new-enters-with-derived-count semantics
    of the operator."""
    from ner_spark.plans.kg_update import parse_update

    upd = parse_update(text)
    form = upd["form"]

    def ground_values(tmpl) -> str:
        rows = ", ".join(
            "(" + ", ".join(_sql_str(t) for t in el) + ")"
            for el in tmpl)
        return (f"SELECT * FROM (VALUES {rows}) "
                "AS g(subj, pred, obj)")

    def arms(tmpl, refs) -> str:
        parts = []
        for el in tmpl:
            terms = []
            for field, term in zip(("subj", "pred", "obj"), el):
                src = (refs["?" + term[1:]] if term.startswith("?")
                       else _sql_str(term))
                terms.append(f"{src} AS {field}")
            parts.append(f"SELECT {', '.join(terms)} FROM b")
        return (
            "SELECT subj, pred, obj FROM ("
            + " UNION ALL ".join(parts)
            + ") WHERE subj IS NOT NULL AND pred IS NOT NULL "
            "AND obj IS NOT NULL")

    ctes = [f"kg AS MATERIALIZED ({kg_sql or _kg_gold_oracle()})"]
    d_sql = i_sql = None
    if form == "insert_data":
        i_sql = (f"SELECT subj, pred, obj, count(*) AS evidence_count "
                 f"FROM ({ground_values(upd['ins_template'])}) "
                 "GROUP BY 1, 2, 3")
    elif form == "delete_data":
        d_sql = f"SELECT DISTINCT * FROM ({ground_values(upd['del_template'])})"
    else:
        if form == "delete_where":
            where_kw: dict = {"pattern": upd["del_template"]}
            del_t, ins_t = upd["del_template"], None
            if not any(t.startswith("?") for el in del_t for t in el):
                d_sql = f"SELECT DISTINCT * FROM ({ground_values(del_t)})"
                del_t = None
        else:
            where_kw = dict(upd["where"])
            del_t, ins_t = upd["del_template"], upd["ins_template"]
        if del_t is not None or ins_t is not None:
            if "union" in where_kw:
                inner = _kg_union_oracle(where_kw["union"],
                                         kg_sql=kg_sql, prefix="u_")
            else:
                inner = _kg_pattern_oracle(**where_kw, kg_sql=kg_sql,
                                           prefix="u_")
            ctes.append(f"b AS ({inner})")
            # the bindings CTE projects each variable as its bare name
            refs: dict = {}
            if "union" in where_kw:
                for g in where_kw["union"]:
                    g = dict(g) if isinstance(g, dict) else {"pattern": g}
                    for v in _kg_branch_vars(g["pattern"],
                                             g.get("optional", ()),
                                             g.get("values"),
                                             g.get("binds", ()),
                                             g.get("subqueries", ())):
                        refs.setdefault(v, v[1:])
            else:
                for v in _kg_branch_vars(where_kw.get("pattern", ()),
                                         where_kw.get("optional", ()),
                                         where_kw.get("values"),
                                         where_kw.get("binds", ()),
                                         where_kw.get("subqueries", ())):
                    refs.setdefault(v, v[1:])
            if del_t is not None:
                d_sql = f"SELECT DISTINCT * FROM ({arms(del_t, refs)})"
            if ins_t is not None:
                i_sql = ("SELECT subj, pred, obj, count(*) AS "
                         f"evidence_count FROM ({arms(ins_t, refs)}) "
                         "GROUP BY 1, 2, 3")
    if d_sql is not None:
        ctes.append(f"d AS ({d_sql})")
        kept = ("SELECT kg.subj, kg.pred, kg.obj, kg.evidence_count "
                "FROM kg WHERE NOT EXISTS (SELECT 1 FROM d WHERE "
                "d.subj = kg.subj AND d.pred = kg.pred "
                "AND d.obj = kg.obj)")
    else:
        kept = "SELECT subj, pred, obj, evidence_count FROM kg"
    ctes.append(f"kept AS ({kept})")
    if i_sql is None:
        body = "SELECT * FROM kept"
    else:
        ctes.append(f"i AS ({i_sql})")
        body = """SELECT * FROM kept
UNION ALL
SELECT i.subj, i.pred, i.obj, i.evidence_count FROM i
WHERE NOT EXISTS (SELECT 1 FROM kept k WHERE k.subj = i.subj
  AND k.pred = i.pred AND k.obj = i.obj)"""
    # a path in the WHERE group nests its recursive CTEs inside b's
    # own WITH, so the top level never needs RECURSIVE
    return "WITH " + ",\n".join(ctes) + "\n" + body + "\n"


def _kg_entities_fuzzy_oracle(threshold: float = 0.5) -> str:
    """SQL twin of plans.kg_gold.entities_fuzzy_gold: the gold NEL
    table's surfaces canonicalized over shared-KB-id edges PLUS exact
    char-3-gram-Jaccard ≥ threshold pairs (enumerated by the same
    shingle equi-join the Spark exact path uses), closed transitively
    by a recursive CTE."""
    return _kg_gold_men_sql() + _kg_nel_sql() + f""",
surf AS (SELECT DISTINCT surface FROM nel),
shg AS (
  SELECT DISTINCT s.surface, substr(s.surface, CAST(u.i AS INT), 3) AS g
  FROM surf s, UNNEST(generate_series(1, len(s.surface) - 2)) AS u(i)
  WHERE len(s.surface) >= 3),
sz AS (SELECT surface, count(*) AS n FROM shg GROUP BY surface),
it AS (
  SELECT a.surface AS sa, b.surface AS sb, count(*) AS i
  FROM shg a JOIN shg b ON a.g = b.g AND a.surface < b.surface
  GROUP BY 1, 2),
fz AS (
  SELECT it.sa AS x, it.sb AS y FROM it
  JOIN sz za ON za.surface = it.sa
  JOIN sz zb ON zb.surface = it.sb
  WHERE CAST(it.i AS DOUBLE) / (za.n + zb.n - it.i) >= {threshold!r}),
ed AS (SELECT DISTINCT surface AS s, kb_id AS k FROM nel WHERE kb_id IS NOT NULL),
adj AS (
  SELECT DISTINCT x, y FROM (
    SELECT a.s AS x, b.s AS y FROM ed a JOIN ed b ON a.k = b.k
    UNION SELECT x, y FROM fz
    UNION SELECT y, x FROM fz
    UNION SELECT surface AS x, surface AS y FROM surf)),
reach AS (
  SELECT x, y FROM adj
  UNION
  SELECT r.x, a.y FROM reach r JOIN adj a ON r.y = a.x),
comp AS (SELECT x AS surface, 'ent:' || min(y) AS eid FROM reach GROUP BY x)
SELECT surf.surface, coalesce(comp.eid, 'ent:' || surf.surface) AS entity_id
FROM surf LEFT JOIN comp USING (surface)
"""


# ------------------------------------------------- goldens-based oracles
#
# The tagger kernel (tokenize → features → rules → CRF → Viterbi) is not
# SQL-expressible, but its OUTPUTS over the deterministic fixture source
# are: tests/goldens/goldens.json pins tokens/tags/spans for all 51
# fixture texts, and the compiled Rust reference binary reproduces them
# exactly (BENCH/RUST_DIFF.md, P/R 1.0000 every mode).  Folding those
# goldens in as VALUES gives the three tagger-driven contract keys full
# rows+schema+hash oracles whose provenance is the reference binary,
# not the engine under test.

_GOLDENS_CACHE: list | None = None


def _goldens() -> list:
    global _GOLDENS_CACHE
    if _GOLDENS_CACHE is None:
        import json

        path = os.path.join(_REPO_ROOT, "tests", "goldens", "goldens.json")
        with open(path, encoding="utf-8") as f:
            _GOLDENS_CACHE = json.load(f)
    return _GOLDENS_CACHE


def _stable_round6(x: float) -> float:
    """Python twin of functions.text.stable_round(col, 6): Spark's
    Round is BigDecimal HALF_UP on the double — replicated with
    decimal so the oracle literal is bitwise the Spark output."""
    from decimal import ROUND_HALF_UP, Decimal

    # Decimal(repr(...)) mirrors BigDecimal.valueOf(d) (shortest
    # round-trip repr), NOT Decimal(float) (exact binary expansion) —
    # the two diverge for doubles within half an ULP of a 7th-decimal
    # .5 boundary, and Spark quantizes the repr.
    return float(
        Decimal(repr(x + 1e-9)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _golden_span_rows(mode: str) -> list[tuple]:
    """(text_id, mention_text, category, start_token, end_token, start,
    end, confidence_q6, source, ctx_words) per golden span — ctx is the
    ±3-token lowercased window exactly as operators.tag emits it."""
    rows = []
    for rec in _goldens():
        toks = rec["tokens"]["standard"]
        n = len(toks)
        for text, cat, st, et, sb, eb, conf, src in rec["modes"][mode]["spans"]:
            lo, hi = max(st - 3, 0), min(et + 3, n - 1)
            ctx = [toks[i][0].lower() for i in range(lo, hi + 1)]
            rows.append((rec["text_id"], text, cat, st, et, sb, eb,
                         _stable_round6(conf), src, ctx))
    return rows


def _fixture_src_values() -> str:
    """The 102-row fixture source as a VALUES CTE keyed by text_id —
    the same rows sources.fixtures.build_source_rows produces."""
    from ner_spark.sources.fixtures import build_source_rows, fixture_texts

    n_texts = len(fixture_texts())
    vals = []
    for i, (repo, path, commit, _lang, _text, sha) in enumerate(
        build_source_rows(FIXTURE_ROWS)
    ):
        vals.append(f"({i % n_texts},'{repo}','{_sql_esc(path)}','{commit}','{sha}')")
    return ("src(text_id, repo, path, commit, content_sha256) AS (VALUES "
            + ", ".join(vals) + ")")


def _mentions_oracle(mode: str) -> str:
    """SQL twin of the ``mentions_*`` contract queries: Rust-certified
    golden spans × the deterministic fixture replication."""
    sp_vals = []
    for tid, text, cat, st, et, sb, eb, conf, src, ctx in _golden_span_rows(mode):
        ctx_s = _sql_esc(" ".join(ctx))
        sp_vals.append(
            f"({tid},'{_sql_esc(text)}','{cat}',{st},{et},{sb},{eb},"
            f"{conf!r},'{_sql_esc(src)}','{ctx_s}')"
        )
    return f"""
WITH sp(text_id, mention_text, category, start_token, end_token, sb, eb,
        confidence, source, ctx) AS (VALUES {", ".join(sp_vals)}),
{_fixture_src_values()}
SELECT src.repo, src.path, src.commit, src.content_sha256, TRUE AS sha_ok,
  sp.mention_text, sp.category,
  CAST(sp.start_token AS INT) AS start_token,
  CAST(sp.end_token AS INT) AS end_token,
  CAST(sp.sb AS INT) AS start, CAST(sp.eb AS INT) AS "end",
  CAST(sp.confidence AS DOUBLE) AS confidence, sp.source,
  sp.ctx AS context_window
FROM src JOIN sp USING (text_id)
"""


def _kg_tagged_oracle() -> str:
    """SQL twin of ``kg_triples_tagged``: golden hybrid-mode spans over
    the fixture replication feed the shared NED/NEL/CC/triples chain —
    the same chain the value-checked ``kg_triples`` oracle uses."""
    sp_vals = []
    for tid, text, cat, _st, _et, _sb, _eb, _conf, _src, ctx in _golden_span_rows("hybrid"):
        ctx_sql = "[" + ",".join(f"'{_sql_esc(w)}'" for w in ctx) + "]"
        sp_vals.append(f"({tid},'{_sql_esc(text)}','{cat}',{ctx_sql})")
    return f"""
WITH RECURSIVE
sp(text_id, mention_text, category, ctx) AS (VALUES {", ".join(sp_vals)}),
{_fixture_src_values()},
men AS (
  SELECT src.repo, src.path, sp.mention_text, sp.category, sp.ctx
  FROM src JOIN sp USING (text_id))""" + _kg_chain_sql()


def _sota_gold_oracle(threshold: float = 0.5, max_span_length: int = 4) -> str:
    """SQL twin of plans.kg_gold.sota_gold: span enumeration over the
    corpus token stream, trigger-table membership, the 16 possible
    (trigger × class) f32 dot/clamp scores folded in as literals
    (computed with the same sequential-f32 loop as the kernel), and
    greedy score-ordered token-occupancy NMS as a recursive CTE."""
    import numpy as np

    from ner_spark.core.sota import _CLASS_EMB, _SPAN_TRIGGERS

    classes = ["Pessoa", "Local", "Organizacao", "Data"]
    score_rows = []
    for t_idx, (_kws, emb) in enumerate(_SPAN_TRIGGERS, start=1):
        v1 = np.asarray(emb, dtype=np.float32)
        for c_idx, cname in enumerate(classes, start=1):
            v2 = np.asarray(_CLASS_EMB[cname.upper()], dtype=np.float32)
            dot = np.float32(0.0)
            for k in range(5):
                dot = np.float32(dot + v1[k] * v2[k])
            score = min(max(dot, np.float32(0.0)) / np.float32(1.5), np.float32(1.0))
            if float(score) > threshold:
                score_rows.append((t_idx, c_idx, float(score)))
    score_vals = ", ".join(f"({t}, {c}, {s!r})" for t, c, s in score_rows)
    trig_case = "CASE " + " ".join(
        "WHEN " + " OR ".join(f"contains(lt, '{k}')" for k in kws) + f" THEN {i}"
        for i, (kws, _e) in enumerate(_SPAN_TRIGGERS, start=1)
    ) + " ELSE 0 END"
    cls_vals = ", ".join(f"({i}, '{c}')" for i, c in enumerate(classes, start=1))

    return f"""
WITH RECURSIVE
c AS (SELECT * FROM {_corpus_cte()}),
pos AS (
  SELECT sent_id, idx, word,
    CAST(coalesce(sum(len(word) + 1) OVER (PARTITION BY sent_id ORDER BY idx
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT) AS ts
  FROM c),
sw AS (
  SELECT sent_id,
    array_agg(word ORDER BY idx) AS words,
    array_agg(ts ORDER BY idx) AS starts,
    array_agg(ts + len(word) ORDER BY idx) AS ends,
    count(*) AS n
  FROM pos GROUP BY sent_id),
spans AS (
  SELECT sent_id, ui.i, uj.j,
    array_to_string(list_slice(words, ui.i, uj.j), ' ') AS txt,
    starts[ui.i] AS sb, ends[uj.j] AS eb
  FROM sw,
    UNNEST(generate_series(1, n)) AS ui(i),
    UNNEST(generate_series(1, n)) AS uj(j)
  WHERE uj.j >= ui.i AND uj.j <= least(ui.i + {max_span_length - 1}, n)),
trig AS (SELECT *, {trig_case} AS tg FROM (SELECT *, lower(txt) AS lt FROM spans)),
cand0 AS (
  SELECT t.sent_id, t.i, t.j, t.txt, t.sb, t.eb, cls.c_idx, cls.cname, s.score
  FROM trig t
  CROSS JOIN (VALUES {cls_vals}) AS cls(c_idx, cname)
  JOIN (VALUES {score_vals}) AS s(tg, c_idx, score)
    ON s.tg = t.tg AND s.c_idx = cls.c_idx),
cand AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY sent_id ORDER BY score DESC, i, j, c_idx) AS INT) AS rk
  FROM cand0),
ns AS (SELECT sent_id, max(rk) AS mx FROM cand GROUP BY sent_id),
nms(sent_id, rk, used, kept) AS (
  SELECT sent_id, 0, CAST([] AS BIGINT[]), CAST([] AS INTEGER[]) FROM ns
  UNION ALL
  SELECT n.sent_id, n.rk + 1,
    CASE WHEN len(list_intersect(n.used, generate_series(CAST(c.i AS BIGINT), CAST(c.j AS BIGINT)))) > 0
         THEN n.used
         ELSE list_concat(n.used, generate_series(CAST(c.i AS BIGINT), CAST(c.j AS BIGINT))) END,
    CASE WHEN len(list_intersect(n.used, generate_series(CAST(c.i AS BIGINT), CAST(c.j AS BIGINT)))) > 0
         THEN n.kept ELSE list_append(n.kept, c.rk) END
  FROM nms n JOIN cand c ON c.sent_id = n.sent_id AND c.rk = n.rk + 1),
fin AS (
  SELECT nms.sent_id, nms.kept FROM nms
  JOIN ns ON nms.sent_id = ns.sent_id AND nms.rk = ns.mx)
SELECT c.sent_id, c.txt AS mention_text, c.cname AS category,
  CAST(c.i - 1 AS INT) AS start_token, CAST(c.j - 1 AS INT) AS end_token,
  CAST(c.sb AS INT) AS start, CAST(c.eb AS INT) AS "end",
  CAST(c.score AS DOUBLE) AS confidence
FROM cand c JOIN fin f ON c.sent_id = f.sent_id AND list_contains(f.kept, c.rk)
"""


# redaction oracle tail over _runs_cte()'s r CTE (shared with the
# random-corpus fuzz, which swaps the corpus VALUES for a view)
_REDACT_TAIL = """
, f AS (
  SELECT sent_id, idx, word, tag,
    first_value(tag) OVER (PARTITION BY sent_id, run_id ORDER BY idx) AS ftag
  FROM r),
e AS (
  SELECT sent_id, idx,
    CASE WHEN tag = 'O' THEN word
         WHEN tag LIKE 'B-%' THEN '[' || substr(tag, 3) || ']'
         WHEN ftag LIKE 'B-%' THEN NULL
         ELSE word END AS piece
  FROM f)
SELECT sent_id, string_agg(piece, ' ' ORDER BY idx) AS redacted
FROM e WHERE piece IS NOT NULL GROUP BY sent_id
"""


def _dataset_split_oracle() -> str:
    """Twin of curate.dataset_split: same salt, same cumulative hex
    thresholds (computed by the shared helper, never re-derived)."""
    from fractions import Fraction

    from ner_spark.operators.curate import hex_threshold

    # same exact cumulative boundaries as dataset_split's Fraction sum
    t_train = hex_threshold(Fraction("0.8"))
    t_val = hex_threshold(Fraction("0.8") + Fraction("0.1"))
    return f"""
SELECT doc_id,
  CASE WHEN substr(md5('split-v1|' || doc_id::VARCHAR), 1, 8) < '{t_train}' THEN 'train'
       WHEN substr(md5('split-v1|' || doc_id::VARCHAR), 1, 8) < '{t_val}' THEN 'val'
       ELSE 'test' END AS split
FROM documents
"""


def _stratified_sample_oracle() -> str:
    from ner_spark.operators.curate import hex_threshold

    t_en, t_def = hex_threshold(0.25), hex_threshold(0.6)
    return f"""
SELECT doc_id, lang FROM documents
WHERE substr(md5('strat-v1|' || lang || '|' || doc_id::VARCHAR), 1, 8)
      < CASE WHEN lang = 'en' THEN '{t_en}' ELSE '{t_def}' END
"""


def _leakage_split_oracle() -> str:
    """Twin of curate.leakage_safe_split: the dedup_clusters closure
    (MinHash+LSH pairs → recursive-CTE components, cluster_id = min
    doc_id) with the dataset_split CASE applied to the CLUSTER id —
    same salt, same cumulative hex thresholds."""
    from fractions import Fraction

    from ner_spark.operators.curate import hex_threshold

    t_train = hex_threshold(Fraction("0.8"))
    t_val = hex_threshold(Fraction("0.8") + Fraction("0.1"))
    return (
        "WITH RECURSIVE " + _MINHASH_CAND_CTE + f""",
e AS (SELECT doc_a, doc_b FROM cand WHERE jaccard_est >= 0.5),
adj AS (
  SELECT doc_a AS x, doc_b AS y FROM e
  UNION SELECT doc_b, doc_a FROM e
  UNION SELECT doc_a, doc_a FROM e
  UNION SELECT doc_b, doc_b FROM e),
reach AS (
  SELECT x, y FROM adj
  UNION
  SELECT r.x, a.y FROM reach r JOIN adj a ON r.y = a.x),
comp AS (SELECT x AS doc_id, min(y) AS cluster_id FROM reach GROUP BY x),
cl AS (
  SELECT d.doc_id,
         CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
SELECT doc_id, cluster_id,
  CASE WHEN substr(md5('split-v1|' || cluster_id::VARCHAR), 1, 8) < '{t_train}' THEN 'train'
       WHEN substr(md5('split-v1|' || cluster_id::VARCHAR), 1, 8) < '{t_val}' THEN 'val'
       ELSE 'test' END AS split
FROM cl
"""
    )


def _contamination_oracle(min_shared: int = 2) -> str:
    """Twin of curate.contamination_check over the doc_id % 97 eval
    slice: distinct 3-gram shingles both sides, overlap counts per
    (corpus doc, eval doc), self-pairs excluded."""
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
sh AS (
  SELECT doc_id, u.g
  FROM toks, UNNEST({_SHINGLES}) AS u(g) WHERE len(t) >= 3),
ev AS (SELECT doc_id AS eval_id, g FROM sh WHERE doc_id % 97 = 0),
c AS (
  SELECT s.doc_id, e.eval_id, count(*) AS shared_ngrams
  FROM sh s JOIN ev e USING (g)
  WHERE s.doc_id <> e.eval_id GROUP BY 1, 2)
SELECT doc_id, eval_id, CAST(shared_ngrams AS BIGINT) AS shared_ngrams
FROM c WHERE shared_ngrams >= {min_shared}
"""


def oracle_sql() -> dict[str, str]:
    return {
        "dataset_split": _dataset_split_oracle(),
        "leakage_split": _leakage_split_oracle(),
        "contamination": _contamination_oracle(),
        "stratified_sample": _stratified_sample_oracle(),
        "vocab_topk": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
sh AS (
  SELECT doc_id, u.g
  FROM toks, UNNEST(list_transform(generate_series(1, len(t)-1),
                    i -> t[i] || ' ' || t[i+1])) AS u(g)
  WHERE len(t) >= 2),
counts AS (
  SELECT g AS ngram, count(*) AS n_occurrences,
         count(DISTINCT doc_id) AS n_docs
  FROM sh GROUP BY g)
SELECT ngram, n_occurrences, n_docs, CAST(rk AS INT) AS rank FROM (
  SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, ngram) AS rk
  FROM counts)
WHERE rk <= 50
""",
        "curate_corpus": f"""
WITH base AS (SELECT doc_id, lang, text FROM documents),
alldocs AS (
  SELECT * FROM base
  UNION ALL
  SELECT doc_id + 1000000, lang, text FROM base WHERE doc_id % 10 = 0),
toks AS (SELECT doc_id, lang, md5(text) AS content_hash, {_TOKS} AS t
         FROM alldocs),
scored AS (
  SELECT doc_id, lang,
    CASE WHEN len(t) = 0 THEN 0.0
         ELSE round(0.4 * least(CAST(len(t) AS DOUBLE) / 100.0, 1.0)
             + 0.3 * (CAST(len(list_distinct(t)) AS DOUBLE) / len(t))
             + 0.3 * (CAST(len(list_filter(t, x -> list_contains({_EN}, x))) AS DOUBLE) / len(t)) + 1e-9, 4)
    END AS quality_score,
    row_number() OVER (PARTITION BY content_hash ORDER BY doc_id) AS dup_rank
  FROM toks),
r AS (
  SELECT doc_id, lang, quality_score,
    CASE WHEN dup_rank > 1 THEN 'duplicate'
         WHEN lang NOT IN ('en', 'de', 'fr') THEN 'lang_filtered'
         WHEN quality_score < 0.34 THEN 'low_quality'
         ELSE 'kept' END AS reason
  FROM scored)
SELECT doc_id, lang, quality_score, reason, (reason = 'kept') AS keep FROM r
""",
        "redact_mentions": _runs_cte() + _REDACT_TAIL,
        "ann_lsh": _ann_lsh_oracle(),
        "ann_ivf": _ann_ivf_oracle(),
        "embedding_near_dup_ivf": _embedding_ivf_pairs_oracle(),
        "kg_triples": _kg_gold_oracle(),
        "kg_entailment": _kg_entail_oracle(),
        "kg_validation": _kg_validate_oracle(),
        "kg_quads": f"SELECT graph, subj, pred, obj, evidence_count "
                    f"FROM ({_kg_quads_gold_sql()}) q",
        "kg_sparql_graph": _kg_sparql_oracle(
            _SPARQL_GRAPH, kg_sql=_kg_quads_gold_sql(), quads=True),
        "kg_sparql_dataset": _kg_sparql_oracle(
            _SPARQL_DATASET, kg_sql=_kg_quads_gold_sql(), quads=True),
        "kg_rules": _kg_rules_oracle(),
        "kg_sparql_graph_path": _kg_sparql_oracle(
            _SPARQL_GRAPH_PATH, kg_sql=_kg_quads_gold_sql(),
            quads=True),
        "kg_pattern_graph": _kg_pattern_oracle(
            _PATTERN_GRAPH, filters=_PATTERN_GRAPH_FILTERS,
            kg_sql=_kg_quads_gold_sql(), quads=True),
        "kg_triples_tagged": _kg_tagged_oracle(),
        "kg_entities_fuzzy": _kg_entities_fuzzy_oracle(),
        "kg_entity_degree": _kg_degree_oracle(),
        "kg_pagerank": _kg_pagerank_oracle(),
        "kg_components": _kg_components_oracle(),
        "kg_comention_pmi": _kg_pmi_oracle(),
        "kg_related_topk": _kg_related_oracle(),
        "kg_hits": _kg_hits_oracle(),
        "kg_link_prediction": _kg_linkpred_oracle(),
        "kg_triangles": _kg_triangles_oracle(),
        "kg_communities": _kg_communities_oracle(),
        "kg_distances": _kg_distances_oracle(),
        "kmv_distinct": _kmv_oracle(),
        "kg_pattern": _kg_pattern_oracle(_PATTERN),
        "kg_pattern_optional": _kg_pattern_oracle(
            _PATTERN[:2], optional=[("?x", "LINKED_TO", "?kb")],
            fill_null=("?kb",)),
        "kg_pattern_filter": _kg_pattern_oracle(
            _PATTERN[:2], optional=[("?x", "LINKED_TO", "?kb")],
            filters=_PATTERN_FILTERS),
        "kg_construct": _kg_construct_oracle(
            _PATTERN[:2], _CONSTRUCT_TEMPLATE,
            optional=[("?x", "LINKED_TO", "?kb")]),
        "kg_pattern_path": _kg_pattern_oracle(_PATTERN_PATH),
        "kg_pattern_seq": _kg_pattern_oracle(_PATTERN_SEQ),
        "kg_pattern_zero_or_one": _kg_pattern_oracle(_PATTERN_ZOO),
        "kg_pattern_negation": _kg_pattern_oracle(
            _PATTERN_NEG, negation=_PATTERN_NEG_GROUPS),
        "kg_pattern_exists": _kg_pattern_oracle(
            _PATTERN_EM_BASE, existence=_PATTERN_EM_GROUPS),
        "kg_pattern_minus": _kg_pattern_oracle(
            _PATTERN_EM_BASE, minus=_PATTERN_EM_GROUPS),
        "kg_pattern_agg": _kg_solutions_oracle(
            _PATTERN, group_by=["?repo"], aggregates=_PATTERN_AGGS,
            order_by=["n_bindings DESC", "repo ASC"], limit=5),
        "kg_pattern_union": _kg_union_oracle(
            _PATTERN_UNION, filters=_PATTERN_UNION_FILTERS,
            fill_null=("?repo", "?x")),
        "kg_pattern_values": _kg_pattern_oracle(
            [("?s", "?p", "?o")], values=_PATTERN_VALUES,
            fill_null=("?tag",)),
        "kg_sparql": _kg_sparql_oracle(_SPARQL_SELECT),
        "kg_sparql_ask": _kg_sparql_oracle(_SPARQL_ASK),
        "kg_sparql_construct": _kg_sparql_oracle(_SPARQL_CONSTRUCT),
        "kg_sparql_pathforms": _kg_sparql_oracle(_SPARQL_PATHFORMS),
        "kg_sparql_seq": _kg_sparql_oracle(_SPARQL_SEQ),
        "kg_sparql_bind": _kg_sparql_oracle(_SPARQL_BIND),
        "kg_sparql_having": _kg_sparql_oracle(_SPARQL_HAVING),
        "kg_sparql_minus": _kg_sparql_oracle(_SPARQL_MINUS),
        "kg_sparql_negset": _kg_sparql_oracle(_SPARQL_NEGSET),
        "kg_sparql_subquery": _kg_sparql_oracle(_SPARQL_SUBQUERY),
        "kg_sparql_boolexpr": _kg_sparql_oracle(_SPARQL_BOOLEXPR,
                                                fill_null=("?kb",)),
        "kg_sparql_update": _kg_update_oracle(_SPARQL_UPDATE),
        "kg_sparql_construct_where":
            _kg_sparql_oracle(_SPARQL_CONSTRUCT_WHERE),
        "kg_sparql_sample": _kg_sparql_oracle(_SPARQL_SAMPLE),
        "kg_sparql_strfns": _kg_sparql_oracle(_SPARQL_STRFNS),
        "kg_sparql_condfns": _kg_sparql_oracle(_SPARQL_CONDFNS),
        "kg_sparql_numagg": _kg_sparql_oracle(_SPARQL_NUMAGG),
        "kg_sparql_optgroup": _kg_sparql_oracle(
            _SPARQL_OPTGROUP, fill_null=("?kb", "?tag")),
        "kg_ntriples": _kg_ntriples_oracle(),
        "kg_ntriples_roundtrip": _kg_gold_oracle(),
        "kg_nquads": _kg_nquads_oracle(),
        "kg_nquads_roundtrip": f"SELECT graph, subj, pred, obj, "
                               f"evidence_count FROM "
                               f"({_kg_quads_gold_sql()}) q",
        "kg_sparql_describe": _kg_sparql_oracle(_SPARQL_DESCRIBE),
        "mentions_hybrid": _mentions_oracle("hybrid"),
        "mentions_crf": _mentions_oracle("crf_only"),
        "sota_gliner": _sota_gold_oracle(),
        "media_features": _media_oracle("image", "nb"),
        # real-decode twins: same nibble histogram, container-framed n_bytes
        # (PGM header 'P5\\n{nb} 1\\n255\\n' = 10 + digits(nb); WAV = 44-byte
        # canonical RIFF/fmt/data header)
        "media_features_netpbm": _media_oracle(
            "image", "nb + 10 + len(CAST(nb AS VARCHAR))"),
        "media_features_wav": _media_oracle("audio", "nb + 44"),
        "media_features_png": _media_oracle("image", None),
        # y4m header 'YUV4MPEG2 W{nb} H1 F25:1 Ip A1:1 Cmono\n' (35 +
        # digits(nb)) + 'FRAME\n' (6)
        "media_features_y4m": _media_oracle(
            "video", "nb + 41 + len(CAST(nb AS VARCHAR))"),
        # composed multimodal near-dup: per-doc 16-bin histogram (REAL
        # float32 rounding, like _MEDIA_FEATS), dominant-bin blocking,
        # per-block cosine pairs, global top-20 — mirrors
        # media_topk_pairs over the real netpbm decode
        "media_near_dup": f"""
WITH h AS (SELECT doc_id AS media_id, lower(hex(encode(text))) AS hx FROM documents),
n AS (SELECT media_id, hx, len(hx) // 2 AS nb FROM h WHERE len(hx) > 0),
nib AS (SELECT media_id, nb,
  list_transform(generate_series(1, nb), i -> hx[2*i-1]) AS cs FROM n),
v AS (SELECT media_id, [{", ".join(
    "CAST(CAST(CAST(len(list_filter(cs, c -> c = '" + ch
    + "')) AS DOUBLE) / nb AS REAL) AS DOUBLE)" for ch in "0123456789abcdef")}]
  AS hv FROM nib),
bk AS (SELECT media_id, hv, list_position(hv, list_max(hv)) AS block FROM v),
pairs AS (
  SELECT a.media_id AS vec_a, b2.media_id AS vec_b,
    round({_COS.format(a="a.hv", b="b2.hv")} + 1e-9, 4) AS cos_sim
  FROM bk a JOIN bk b2 ON a.block = b2.block AND a.media_id < b2.media_id)
SELECT vec_a, vec_b, cos_sim FROM (
  SELECT *, row_number() OVER (ORDER BY cos_sim DESC, vec_a, vec_b) AS rk
  FROM pairs) WHERE rk <= 20
""",
        # per-frame twin: one row per full 8-byte frame, each frame's
        # nibble histogram over its own 8 bytes (nb = 8 in _MEDIA_FEATS)
        "frame_features_y4m": f"""
WITH h AS (SELECT doc_id AS media_id, lower(hex(encode(text))) AS hx FROM documents),
n AS (SELECT media_id, hx, len(hx) // 2 AS nbytes FROM h),
f AS (SELECT media_id, hx, CAST(u.k AS INT) AS frame_no
      FROM n, UNNEST(generate_series(0, nbytes // 8 - 1)) AS u(k)),
nib AS (SELECT media_id, frame_no, 8 AS nb,
  list_transform(generate_series(1, 8),
                 i -> hx[2 * (frame_no * 8 + i) - 1]) AS cs FROM f)
SELECT media_id, frame_no,
  concat_ws(',', {_MEDIA_FEATS}) AS features_q
FROM nib
""",
        "simhash_buckets": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
h AS (
  SELECT doc_id,
    list_transform(t, x -> CAST(('0x' || substr(md5(x), 1, 15)) AS UBIGINT)) AS hs
  FROM toks),
s AS (
  SELECT doc_id,
    list_sum(list_transform(generate_series(0, 59),
      k -> CASE WHEN 2 * len(list_filter(hs, v -> (v >> k) & 1 = 1)) > len(hs)
           THEN (CAST(1 AS BIGINT) << k) ELSE CAST(0 AS BIGINT) END))
    AS simhash
  FROM h)
SELECT doc_id, CAST(coalesce(simhash, 0) AS BIGINT) AS simhash,
  CAST(ub.b AS INT) AS band,
  CAST((coalesce(simhash, 0) >> (ub.b * 16)) & 65535 AS BIGINT) AS band_key
FROM s, UNNEST([0, 1, 2, 3]) AS ub(b)
""",
        "dedup_exact": """
SELECT md5(text) AS content_hash,
       count(*) AS dup_count,
       min(doc_id) AS canonical_doc_id
FROM documents GROUP BY md5(text)
""",
        "dedup_ngram_jaccard": f"""
WITH toks AS (SELECT doc_id, source, {_TOKS} AS t FROM documents),
shr AS (
  SELECT doc_id, source, u.g
  FROM toks, UNNEST({_SHINGLES}) AS u(g) WHERE len(t) >= 3),
flt AS (
  SELECT doc_id, source, g FROM (
    SELECT *, count(*) OVER (PARTITION BY source, g) AS df FROM shr)
  WHERE df <= 64),
sh AS (SELECT doc_id, source, list(g) AS s FROM flt GROUP BY doc_id, source),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) + 1e-9, 6) AS jaccard
  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s)) > 0)
SELECT doc_a, doc_b, jaccard FROM (
  SELECT *, row_number() OVER (ORDER BY jaccard DESC, doc_a, doc_b) AS rk
  FROM pairs) WHERE rk <= 50
""",
        "embedding_near_dup": f"""
WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
pairs AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
    round({_COS.format(a="a.embedding", b="b.embedding")} + 1e-9, 4) AS cos_sim
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
SELECT vec_a, vec_b, cos_sim FROM (
  SELECT *, row_number() OVER (ORDER BY cos_sim DESC, vec_a, vec_b) AS rk
  FROM pairs) WHERE rk <= 20
""",
        "minhash_lsh_dedup": (
            "WITH " + _MINHASH_CAND_CTE
            + "\nSELECT doc_a, doc_b, jaccard_est FROM cand WHERE jaccard_est >= 0.5\n"
        ),
        "dedup_clusters": (
            "WITH RECURSIVE " + _MINHASH_CAND_CTE + """,
e AS (SELECT doc_a, doc_b FROM cand WHERE jaccard_est >= 0.5),
adj AS (
  SELECT doc_a AS x, doc_b AS y FROM e
  UNION SELECT doc_b, doc_a FROM e
  UNION SELECT doc_a, doc_a FROM e
  UNION SELECT doc_b, doc_b FROM e),
reach AS (
  SELECT x, y FROM adj
  UNION
  SELECT r.x, a.y FROM reach r JOIN adj a ON r.y = a.x),
comp AS (SELECT x AS doc_id, min(y) AS cluster_id FROM reach GROUP BY x)
SELECT d.doc_id,
  CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
  (d.doc_id = coalesce(c.cluster_id, d.doc_id)) AS is_canonical
FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
"""
        ),
        "text_quality": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents)
SELECT doc_id,
  CAST(len(t) AS BIGINT) AS n_tokens,
  CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
  round(CAST(len(list_distinct(t)) AS DOUBLE) / len(t) + 1e-9, 4) AS distinct_ratio,
  round(CAST(len(list_filter(t, x -> list_contains({_EN}, x))) AS DOUBLE) / len(t) + 1e-9, 4) AS stopword_ratio,
  round(0.4 * least(CAST(len(t) AS DOUBLE) / 100.0, 1.0)
      + 0.3 * (CAST(len(list_distinct(t)) AS DOUBLE) / len(t))
      + 0.3 * (CAST(len(list_filter(t, x -> list_contains({_EN}, x))) AS DOUBLE) / len(t)) + 1e-9, 4)
    AS quality_score
FROM toks
""",
        "token_counts": f"""
WITH toks AS (SELECT source, len({_TOKS}) AS n FROM documents)
SELECT source, count(*) AS n_docs,
  CAST(sum(n) AS BIGINT) AS total_tokens,
  round(avg(n) + 1e-9, 4) AS avg_tokens
FROM toks GROUP BY source
""",
        "lang_id": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents)
SELECT doc_id,
  CAST(len(list_filter(t, x -> list_contains({_EN}, x))) AS BIGINT) AS en_hits,
  CAST(len(list_filter(t, x -> list_contains({_PT}, x))) AS BIGINT) AS pt_hits,
  CASE WHEN len(list_filter(t, x -> list_contains({_EN}, x))) > len(list_filter(t, x -> list_contains({_PT}, x))) THEN 'en'
       WHEN len(list_filter(t, x -> list_contains({_PT}, x))) > len(list_filter(t, x -> list_contains({_EN}, x))) THEN 'pt'
       ELSE 'und' END AS predicted_lang
FROM toks
""",
        "doc_fingerprint": f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
sh AS (SELECT doc_id, {_SHINGLES} AS s FROM toks WHERE len(t) >= 3)
SELECT doc_id,
  list_min(list_transform(s, g -> md5('s0|' || g))) AS mh_s0,
  list_min(list_transform(s, g -> md5('s1|' || g))) AS mh_s1,
  list_min(list_transform(s, g -> md5('s2|' || g))) AS mh_s2,
  list_min(list_transform(s, g -> md5('s3|' || g))) AS mh_s3
FROM sh WHERE len(s) > 0
""",
        "similarity_topk": f"""
WITH q AS (SELECT embedding AS v FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT e.vec_id, round({_COS.format(a="e.embedding", b="q.v")} + 1e-9, 4) AS cos_sim
  FROM embeddings e, q WHERE e.vec_id <> 0)
SELECT vec_id, cos_sim, CAST(rk AS INT) AS rank FROM (
  SELECT *, row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rk FROM s)
WHERE rk <= 10
""",
        "tpch_pricing": """
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity) + 1e-9, 2) AS sum_qty,
  round(sum(l_extendedprice) + 1e-9, 2) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 2) AS sum_disc_price,
  round(avg(l_quantity) + 1e-9, 4) AS avg_qty,
  round(avg(l_discount) + 1e-9, 4) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        "top_customers": """
WITH rev AS (
  SELECT o_custkey, round(sum(o_totalprice) + 1e-9, 2) AS revenue,
         count(*) AS n_orders
  FROM orders GROUP BY o_custkey)
SELECT c_custkey, c_name, region_name, revenue, n_orders, CAST(rk AS INT) AS rank
FROM (
  SELECT c.c_custkey, c.c_name, r.r_name AS region_name, rev.revenue, rev.n_orders,
    row_number() OVER (ORDER BY rev.revenue DESC, c.c_custkey) AS rk
  FROM rev
  JOIN customer c ON rev.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey)
WHERE rk <= 20
""",
        "events_hourly": """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
  event_type, count(*) AS n_events, round(sum(value) + 1e-9, 2) AS sum_value
FROM events GROUP BY 1, 2
""",
        "events_sessions": """
WITH g AS (
  SELECT user_id,
    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
           OR CAST(floor(epoch(ts)) AS BIGINT)
              - CAST(floor(epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts))) AS BIGINT) > 1800
         THEN 1 ELSE 0 END AS new_s
  FROM events)
SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM g GROUP BY user_id
""",
        "hmm_transitions": f"""
WITH c AS (SELECT * FROM {_corpus_cte()}),
p AS (
  SELECT tag,
    coalesce(lag(tag) OVER (PARTITION BY sent_id ORDER BY idx), '<S>') AS prev_tag
  FROM c)
SELECT prev_tag, tag, count(*) AS n FROM p GROUP BY prev_tag, tag
""",
        "hmm_emissions": f"""
WITH c AS (SELECT * FROM {_corpus_cte()})
SELECT tag, word, count(*) AS n FROM c GROUP BY tag, word
""",
        "gazetteer_compile": _runs_cte() + """
SELECT DISTINCT substr(first_tag, 3) AS category, lower(surface) AS surface FROM g
""",
        "bio_gold_spans": _runs_cte() + """
SELECT sent_id, start_idx, end_idx, substr(first_tag, 3) AS category, surface
FROM g WHERE first_tag LIKE 'B-%'
""",
    }

"""Analytics over the constructed knowledge graph.

The KG pipeline (tag → link → canonicalize → materialize, reference
ner-core/src/kg.rs pipeline stages) ends at a triples table
``(subj, pred, obj, evidence_count)``.  A KG is only useful if you can
*query* it, so this module adds the graph-analytics layer a consumer
of that table needs: per-node degree/evidence statistics and a
fixed-iteration distributed PageRank.

Scale shape: the triples table is the *derived* graph — orders of
magnitude smaller than the 100 TB corpus it was extracted from (the
entity vocabulary saturates long before the corpus does, see
BENCH/DATA_SCALING.md).  Still, both operators are written for a big
graph, not a small one:

- ``entity_degree`` is two map-side-combinable ``groupBy``s plus one
  full-outer join on the node id — no driver-side state at all.
- ``pagerank`` keeps every per-iteration scalar (node count, dangling
  mass) *in-plan* as a broadcast one-row DataFrame instead of
  ``.collect()``-ing it to the driver, truncates lineage with an eager
  ``localCheckpoint`` per iteration (same discipline as
  :func:`ner_spark.operators.canonicalize.connected_components`), and
  leaves the hot-node contribution ``groupBy`` to AQE skew handling —
  the contribution sum is map-side combinable, so a hub entity's
  in-edges partial-aggregate before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ner_spark.operators.canonicalize import connected_components


def entity_degree(triples: DataFrame) -> DataFrame:
    """Per graph node (entities plus repo:/kb:/category literals):
    out/in triple counts and out/in evidence mass.

    (node, out_degree, in_degree, out_evidence, in_evidence) — missing
    sides coalesced to 0, so ``sum(out_degree) == sum(in_degree) ==
    count(triples)`` holds as an invariant.
    """
    out = triples.groupBy(F.col("subj").alias("node")).agg(
        F.count(F.lit(1)).alias("out_degree"),
        F.sum("evidence_count").alias("out_evidence"),
    )
    inn = triples.groupBy(F.col("obj").alias("node")).agg(
        F.count(F.lit(1)).alias("in_degree"),
        F.sum("evidence_count").alias("in_evidence"),
    )
    zero = F.lit(0).cast("bigint")
    return out.join(inn, "node", "full_outer").select(
        "node",
        F.coalesce("out_degree", zero).alias("out_degree"),
        F.coalesce("in_degree", zero).alias("in_degree"),
        F.coalesce("out_evidence", zero).alias("out_evidence"),
        F.coalesce("in_evidence", zero).alias("in_evidence"),
    )


def comention_pmi(triples: DataFrame) -> DataFrame:
    """Pointwise mutual information of entity co-mention pairs.

    Over the MENTIONED_WITH triples (stored once per unordered pair
    with subj < obj), with the pair probability estimated from evidence
    counts:  pmi(a,b) = ln( ev(a,b) · T / (m(a) · m(b)) )  where T is
    the total evidence mass and m(x) the marginal mass of x over all
    its pairs.  Positive = the two entities co-occur more than their
    popularity predicts — the "related entities" signal a KG consumer
    ranks by.

    Scale shape: marginals are one explode + map-side-combinable
    groupBy over the pair table; T stays in-plan as a broadcast one-row
    aggregate; the two marginal joins are plain equi-joins on the
    entity id (shuffle bounded by the pair table, never all-pairs).

    The FP expression is written identically in the DuckDB twin —
    (ev · T) / (m(a) · m(b)) then ln — so both engines run the same
    IEEE operation order; the contract key quantizes to 1e-6.

    Returns (subj, obj, evidence_count, pmi).
    """
    pairs = triples.where(F.col("pred") == "MENTIONED_WITH").select(
        "subj", "obj", "evidence_count"
    )
    total = pairs.agg(
        F.sum("evidence_count").cast("double").alias("t_mass")
    )
    marg = (
        pairs.select(
            F.explode(F.array("subj", "obj")).alias("node"),
            "evidence_count",
        )
        .groupBy("node")
        .agg(F.sum("evidence_count").cast("double").alias("m"))
    )
    ma = marg.select(F.col("node").alias("subj"), F.col("m").alias("m_a"))
    mb = marg.select(F.col("node").alias("obj"), F.col("m").alias("m_b"))
    return (
        pairs.join(ma, "subj")
        .join(mb, "obj")
        .join(F.broadcast(total))
        .select(
            "subj",
            "obj",
            "evidence_count",
            F.log(
                (F.col("evidence_count").cast("double") * F.col("t_mass"))
                / (F.col("m_a") * F.col("m_b"))
            ).alias("pmi"),
        )
    )


def related_topk(triples: DataFrame, k: int = 3) -> DataFrame:
    """Per entity: its top-k most-related partners by co-mention PMI —
    the "related entities" panel a KG browser renders next to a node.

    Built on :func:`comention_pmi` with the pair table symmetrized
    (each undirected pair contributes a row in both directions), then a
    rank window PARTITIONED BY the entity — per-node state only, never
    a global sort, so the window is shuffle-bounded by the pair table
    and safe at any node count (the plan audit's
    rank-window-keeps-partition-spec check applies).  Ties break
    deterministically on the partner id.

    Returns (node, related, pmi, rnk) with rnk in [1, k].
    """
    from pyspark.sql import Window

    pmi = comention_pmi(triples)
    sym = pmi.select(
        F.col("subj").alias("node"),
        F.col("obj").alias("related"),
        "pmi",
    ).unionByName(
        pmi.select(
            F.col("obj").alias("node"),
            F.col("subj").alias("related"),
            "pmi",
        )
    )
    w = Window.partitionBy("node").orderBy(
        F.col("pmi").desc(), F.col("related").asc()
    )
    return (
        sym.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
    )


def triangles(triples: DataFrame) -> DataFrame:
    """Per-node triangle participation count and local clustering
    coefficient over the undirected simple graph induced by the
    triples (parallel predicate edges collapse, self-loops drop).

    Scale shape — the classic degree-orientation trick: every
    undirected edge is oriented from its lower-(degree, id) endpoint to
    the higher one, which turns the graph into a DAG whose max
    out-degree is O(√m).  Wedges are then enumerated by self-joining
    the oriented edges on their SOURCE (bounded fan-out per key, so no
    hub blow-up: a node with 10⁶ neighbors enumerates no wedges unless
    those neighbors out-rank it, and at most O(√m) of them can) and
    closed with one semi-join back against the oriented edge set.  Each
    triangle is found exactly once, at its minimum-order corner.

    clustering_coeff = 2·t / (d·(d−1)) with d the simple-graph degree
    (distinct neighbors), 0.0 for d ≤ 1 — exact-integer inputs to one
    division, so the value is bitwise identical across engines (the
    DuckDB twin quantizes at 1e-6 like the PMI family).

    Returns (node, degree, triangles, clustering_coeff).
    """
    e = (
        triples.select(
            F.least("subj", "obj").alias("a"),
            F.greatest("subj", "obj").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    # orient low → high by the (degree, node) total order
    ed = (
        e.join(deg.select(F.col("node").alias("a"),
                          F.col("degree").alias("da")), "a")
        .join(deg.select(F.col("node").alias("b"),
                         F.col("degree").alias("db")), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("ddst"),
    )
    # wedges at the minimum-order corner, ordered (dst1 < dst2 by the
    # same total order) so the closing edge is looked up in its stored
    # orientation
    o1 = o.select(F.col("src").alias("u"), F.col("dst").alias("v"),
                  F.col("ddst").alias("dv"))
    o2 = o.select(F.col("src").alias("u"), F.col("dst").alias("w"),
                  F.col("ddst").alias("dw"))
    wedges = o1.join(o2, "u").where(
        (F.col("dv") < F.col("dw"))
        | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
    )
    tri = wedges.join(
        o.select(F.col("src").alias("v"), F.col("dst").alias("w")),
        ["v", "w"],
    ).select("u", "v", "w")
    corners = (
        tri.select(F.col("u").alias("node"))
        .unionByName(tri.select(F.col("v").alias("node")))
        .unionByName(tri.select(F.col("w").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    zero = F.lit(0).cast("bigint")
    two_t = F.lit(2.0) * F.col("triangles").cast("double")
    denom = (F.col("degree") * (F.col("degree") - 1)).cast("double")
    return (
        deg.join(corners, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("triangles", zero).alias("triangles"),
        )
        .withColumn(
            "clustering_coeff",
            F.when(F.col("degree") > 1, two_t / denom).otherwise(F.lit(0.0)),
        )
    )


def _undirected_simple(triples: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(sym, v): the undirected simple graph induced by the triples —
    parallel predicate edges collapse, self-loops drop — as a
    symmetrized edge table ``(x, y)`` (each undirected edge stored in
    both directions), plus the full node set ``v`` (every distinct
    subj/obj, so a self-loop-only node is still a vertex).  Shared by
    :func:`label_propagation` and :func:`bfs_distances`; same edge
    derivation as :func:`triangles`.
    """
    e = (
        triples.select(
            F.least("subj", "obj").alias("a"),
            F.greatest("subj", "obj").alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    sym = e.select(F.col("a").alias("x"), F.col("b").alias("y")).unionByName(
        e.select(F.col("b").alias("x"), F.col("a").alias("y"))
    )
    v = (
        triples.select(F.col("subj").alias("node"))
        .unionByName(triples.select(F.col("obj").alias("node")))
        .distinct()
    )
    return sym, v


def label_propagation(
    triples: DataFrame,
    iterations: int = 3,
    checkpoint: bool = True,
) -> DataFrame:
    """Community detection by synchronous label propagation (fixed
    rounds) over the undirected simple graph induced by the triples.

    Every node starts labeled with its own id; each round, every node
    *simultaneously* adopts the most frequent label among its
    neighbors, ties broken by the lexicographically smallest label.
    The synchronous schedule plus the (count DESC, label ASC)
    tie-break makes the result a pure function of the graph — no
    visit-order dependence — which is what lets a chained-CTE DuckDB
    unroll serve as the value oracle
    (``__spark_entry__._kg_communities_oracle``), exactly like the
    fixed-iteration ``pagerank``.

    Scale shape: one round = an equi-join of the symmetrized edges on
    the neighbor id, a map-side-combinable ``groupBy(node, label)``
    count, and an argmax via a rank window PARTITIONED BY the node
    (per-node state only, never a global sort; Spark 4 additionally
    rewrites the ``rn = 1`` filter into a group-limit pushed below the
    window shuffle).  Lineage truncates with an eager
    ``localCheckpoint`` per round, same discipline as
    :func:`pagerank`.  Isolated nodes (self-loop-only) keep their own
    label through the left-join coalesce.

    Returns (node, community, community_size).
    """
    from pyspark.sql import Window

    sym, v = _undirected_simple(triples)
    if checkpoint:
        sym = sym.localCheckpoint(eager=True)
        v = v.localCheckpoint(eager=True)

    labels = v.select("node", F.col("node").alias("label"))
    w = Window.partitionBy("x").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(iterations):
        nb = sym.join(
            labels.select(F.col("node").alias("y"), "label"), "y"
        )
        cnt = nb.groupBy("x", "label").agg(F.count(F.lit(1)).alias("c"))
        pick = (
            cnt.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select(F.col("x").alias("node"), F.col("label").alias("new"))
        )
        labels = v.join(pick, "node", "left").select(
            "node", F.coalesce("new", "node").alias("label")
        )
        if checkpoint:
            labels = labels.localCheckpoint(eager=True)
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("community_size")
    )
    return labels.join(sizes, "label").select(
        "node", F.col("label").alias("community"), "community_size"
    )


def bfs_distances(
    triples: DataFrame,
    max_hops: int = 3,
    seed_prefix: str = "repo:",
    checkpoint: bool = True,
) -> DataFrame:
    """Multi-source BFS: hop distance from the seed node set (every
    node whose id starts with ``seed_prefix`` — by default the
    ``repo:`` vertices, so the result answers "how far is each entity
    from any repository?") over the undirected simple graph, bounded
    at ``max_hops``.  Unreached nodes are omitted.

    Scale shape — frontier-based, not full-relaxation: round *k* joins
    the edges against only the nodes FIRST reached at round *k−1*
    (the frontier), then anti-joins the already-reached set, so the
    per-round work is proportional to the frontier, not the graph.
    For an unweighted graph this is exactly the min-distance fixpoint
    the full-relaxation chained-CTE DuckDB twin computes
    (``__spark_entry__._kg_distances_oracle``), because BFS reaches
    every node first at its minimum hop count.  Each frontier
    localCheckpoints (lineage would otherwise double per round).

    Returns (node, dist) with dist in [0, max_hops].
    """
    sym, v = _undirected_simple(triples)
    if checkpoint:
        sym = sym.localCheckpoint(eager=True)

    seeds = v.where(F.col("node").startswith(seed_prefix)).select(
        "node", F.lit(0).cast("int").alias("dist")
    )
    if checkpoint:
        seeds = seeds.localCheckpoint(eager=True)
    dist = seeds
    frontier = seeds
    for k in range(1, max_hops + 1):
        nxt = (
            sym.join(frontier.select(F.col("node").alias("x")), "x")
            .select(F.col("y").alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .select("node", F.lit(k).cast("int").alias("dist"))
        )
        if checkpoint:
            nxt = nxt.localCheckpoint(eager=True)
        dist = dist.unionByName(nxt)
        frontier = nxt
    return dist


def graph_components(triples: DataFrame, salt_buckets: int = 8) -> DataFrame:
    """Undirected connected components over the triple graph, plus the
    size of each component.

    Reuses the salted min-label-propagation CC from the canonicalize
    stage (:func:`ner_spark.operators.canonicalize.connected_components`
    — hub entities fan out across ``salt_buckets`` tasks instead of
    concentrating one join key, and each iteration localCheckpoints),
    so the 100 TB scale shape is the one already audited there.  Edges
    are the distinct (subj, obj) pairs treated as undirected; the
    component label is the lexicographic min node id, which makes the
    output deterministic and lets a recursive-CTE DuckDB closure serve
    as the value oracle.

    Returns (node, component, component_size).
    """
    e = (
        triples.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .distinct()
    )
    v = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels = connected_components(v, e, salt_buckets=salt_buckets)
    sizes = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("component_size")
    )
    return labels.join(sizes, "label").select(
        "node",
        F.col("label").alias("component"),
        "component_size",
    )


def pagerank(
    triples: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank over the directed triple graph.

    Edges are the **distinct** (subj, obj) pairs (multi-predicate
    parallel edges collapse — a repo that both DECLARES and is
    MENTIONED_WITH an entity counts once).  Dangling nodes (no
    out-edges — e.g. ``kb:`` and category leaves) redistribute their
    rank uniformly, so total mass is conserved at every iteration:

        r'(v) = (1-d)/N + d * (Σ_{u→v} r(u)/outdeg(u) + D/N)

    with D = Σ rank over dangling nodes.  Exactly ``iterations`` rounds
    are run (no convergence test), which is what makes the computation
    expressible as a chained-CTE DuckDB oracle
    (``__spark_entry__._kg_pagerank_oracle``) — each round is pure
    relational algebra over the previous round's rank table.

    Returns (node, rank) with Σ rank = 1 (up to float error).
    """
    e = (
        triples.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .distinct()
    )
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    v = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if checkpoint:
        v = v.localCheckpoint(eager=True)

    # one-row scalars stay in-plan: broadcast-joined, never collected
    n_df = v.agg(F.count(F.lit(1)).cast("double").alias("n"))
    od = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("double").alias("od")
    )

    ranks = v.join(F.broadcast(n_df)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    teleport = F.lit(1.0) - F.lit(damping)  # same FP expr as the SQL twin

    for _ in range(iterations):
        with_od = ranks.join(od, "node", "left")
        contrib = (
            with_od.where(F.col("od").isNotNull())
            .join(e, F.col("node") == F.col("src"))
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") / F.col("od")).alias("contrib"))
        )
        dangling = with_od.where(F.col("od").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang")
        )
        ranks = (
            v.join(contrib, "node", "left")
            .join(F.broadcast(n_df))
            .join(F.broadcast(dangling))
            .select(
                "node",
                (
                    teleport / F.col("n")
                    + F.lit(damping)
                    * (
                        F.coalesce("contrib", F.lit(0.0))
                        + F.col("dang") / F.col("n")
                    )
                ).alias("rank"),
            )
        )
        if checkpoint:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def hits(
    triples: DataFrame,
    iterations: int = 3,
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration HITS (hubs and authorities) over the directed
    triple graph — "which entities AGGREGATE knowledge (hubs: point at
    good authorities) vs ANCHOR it (authorities: pointed at by good
    hubs)?", the complementary centrality to :func:`pagerank` for a
    KG whose repo→entity→kb edges are inherently bipartite-ish.

    Edges are the distinct (subj, obj) pairs, like pagerank.  Each
    iteration computes ``auth = Eᵀ·hub`` then normalizes, then
    ``hub = E·auth`` (the NEW auth) then normalizes — the classic
    update order.  Normalization is pinned to **L1** (divide by the
    sum): the conventional L2 needs a square root whose last-ulp
    behaviour differs across engines, while an L1 sum of exact
    products stays within one quantization epsilon of the chained-CTE
    DuckDB twin (``__spark_entry__._kg_hits_oracle``), exactly like
    the pagerank oracle.  Nodes with no in-edges (resp. out-edges)
    carry authority (resp. hub) 0; an edgeless graph yields all-zero
    scores rather than a division by zero.

    Scale shape: one iteration = two map-side-combinable groupBys
    over the edge join (a hub node's contributions partial-aggregate
    before the shuffle, AQE handles residual skew) with the
    normalization sum kept in-plan as a broadcast one-row DataFrame —
    no driver-side state; lineage truncates per iteration.

    Returns (node, hub, authority), every edge-touching node present.
    """
    e = (
        triples.select(F.col("subj").alias("src"), F.col("obj").alias("dst"))
        .distinct()
    )
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    v = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if checkpoint:
        v = v.localCheckpoint(eager=True)

    def _l1(scores: DataFrame, col: str) -> DataFrame:
        total = scores.agg(F.sum(col).alias("__t"))
        return scores.join(F.broadcast(total)).select(
            "node",
            F.when(F.col("__t") > 0, F.col(col) / F.col("__t"))
            .otherwise(F.lit(0.0)).alias(col),
        )

    n_df = v.agg(F.count(F.lit(1)).cast("double").alias("n"))
    hub = v.join(F.broadcast(n_df)).select(
        "node", (F.lit(1.0) / F.col("n")).alias("hub")
    )
    auth = None
    for _ in range(iterations):
        a = (
            e.join(hub.select(F.col("node").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("authority"))
        )
        auth = _l1(
            v.join(a, "node", "left").select(
                "node",
                F.coalesce("authority", F.lit(0.0)).alias("authority"),
            ),
            "authority",
        )
        h = (
            e.join(auth.select(F.col("node").alias("dst"), "authority"),
                   "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("authority").alias("hub"))
        )
        hub = _l1(
            v.join(h, "node", "left").select(
                "node", F.coalesce("hub", F.lit(0.0)).alias("hub")
            ),
            "hub",
        )
        if checkpoint:
            auth = auth.localCheckpoint(eager=True)
            hub = hub.localCheckpoint(eager=True)
    return hub.join(auth, "node").select("node", "hub", "authority")


# Default shared-neighbor degree cap for link_prediction.  The wedge
# enumeration costs Σ_z min(deg z, cap)² ≤ 2·|E|·cap rows, so an
# UNCAPPED hub (the 10%-hub scale-bench graph has deg ≈ 200k) alone is
# a ~4e10-row intermediate.  1000 keeps the bound at 2000·|E| — linear
# in the edge count with a moderate constant — while being far above
# any non-hub degree in a real entity graph; pass ``max_degree=None``
# to opt out explicitly (small graphs / exhaustive audits only).
LINKPRED_DEFAULT_MAX_DEGREE = 1000

# Sentinel distinguishing "caller said nothing" (use the default cap)
# from an explicit ``max_degree=None`` opt-out.
_UNSET = object()


def link_prediction(
    triples: DataFrame,
    k: int = 20,
    max_degree=_UNSET,
) -> DataFrame:
    """Top-k predicted (missing) edges by neighborhood overlap over
    the undirected simple graph — the classic link-prediction
    baselines a KG curator runs to propose new MENTIONED_WITH edges:

    - ``common_neighbors`` — |N(a) ∩ N(b)|;
    - ``jaccard`` — |N(a) ∩ N(b)| / |N(a) ∪ N(b)| (the ranking key:
      a ratio of exact integers, so the order is engine-portable
      bit-for-bit);
    - ``adamic_adar`` — Σ_{z ∈ N(a)∩N(b)} 1/ln(deg z), which weights
      rare shared neighbors above hub ones (float summation — output
      only, never the ranking key).

    Pairs already connected by an edge are excluded (they are not
    *predictions*); the output order is the total
    (jaccard DESC, node_a ASC, node_b ASC), compiled to
    TakeOrderedAndProject — per-partition heaps, never a global sort.

    Scale shape: the candidate enumeration is one wedge equi-join of
    the symmetrized edge table with itself on the shared neighbor —
    the same join class as :func:`triangles` — followed by a
    map-side-combinable pair count.  Its cost is Σ_z deg(z)², so a
    hub intermediate is quadratic: ``max_degree`` caps the shared
    neighbors considered (a standard similarity-join guard — the
    scores then ignore hubs above the cap, documented semantics, and
    the plan stays bounded).  The cap DEFAULTS ON at
    :data:`LINKPRED_DEFAULT_MAX_DEGREE` (1000) — an unguarded wedge
    join through a 200k-degree hub is a ~4e10-row intermediate, so
    uncapped is the opt-in (``max_degree=None``), never the default.
    Dropping hub-mediated wedges is also the semantics a curator
    wants: a shared neighbor of degree 10⁵ carries ~zero Adamic-Adar
    weight and no signal — "both entities co-occur with the mega-repo"
    predicts nothing.

    Returns (node_a, node_b, common_neighbors, jaccard, adamic_adar).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if max_degree is _UNSET:
        max_degree = LINKPRED_DEFAULT_MAX_DEGREE
    sym, _v = _undirected_simple(triples)
    deg = sym.groupBy(F.col("x").alias("node")).agg(
        F.count(F.lit(1)).cast("double").alias("deg")
    )
    thru = sym.join(deg.select(F.col("node").alias("y"), "deg"), "y")
    if max_degree is not None:
        thru = thru.where(F.col("deg") <= F.lit(float(max_degree)))
    a = thru.select(F.col("x").alias("node_a"), F.col("y").alias("z"),
                    F.col("deg").alias("zdeg"))
    b = sym.select(F.col("x").alias("node_b"), F.col("y").alias("z"))
    pairs = (
        a.join(b, "z")
        .where(F.col("node_a") < F.col("node_b"))
        .groupBy("node_a", "node_b")
        .agg(
            F.count(F.lit(1)).alias("common_neighbors"),
            F.sum(F.lit(1.0) / F.log(F.col("zdeg"))).alias("adamic_adar"),
        )
    )
    # drop pairs that are already edges (sym holds both directions;
    # the a<b orientation needs one)
    existing = sym.where(F.col("x") < F.col("y")).select(
        F.col("x").alias("node_a"), F.col("y").alias("node_b")
    )
    pairs = pairs.join(existing, ["node_a", "node_b"], "left_anti")
    da = deg.select(F.col("node").alias("node_a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("node_b"), F.col("deg").alias("db"))
    return (
        pairs.join(da, "node_a").join(db, "node_b")
        .select(
            "node_a", "node_b", "common_neighbors",
            (
                F.col("common_neighbors")
                / (F.col("da") + F.col("db") - F.col("common_neighbors"))
            ).alias("jaccard"),
            "adamic_adar",
        )
        .orderBy(F.desc("jaccard"), F.asc("node_a"), F.asc("node_b"))
        .limit(k)
    )

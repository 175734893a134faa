"""Stage 3 — canonicalization: connected components over mention-
similarity edges via iterative min-label propagation.

The reference has no canonicalization (it links each mention
independently); the north star requires merging mention surfaces that
co-refer — we connect surfaces through shared KB links (and optionally
fuzzy-similarity edges) and take the lexicographically-smallest surface
of each component as the canonical entity id.

Scale design:
- label propagation = repeated *hash join* of the edge list against the
  shrinking label frontier; ``groupBy(node).min(label)`` does map-side
  partial aggregation, so hub nodes (mega-entities, the repo-level skew
  of the north rule) cost one combiner row per task rather than a hot
  reducer; AQE skew-join splitting handles the join-side skew.
- ``localCheckpoint`` every iteration truncates the lineage (iterative
  plans otherwise grow exponentially).
- convergence = zero label changes (count on a join of old vs new).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_edges(links: DataFrame) -> DataFrame:
    """Similarity edges between distinct surfaces: src=s:<surface>,
    dst=k:<kb_id> for every linked mention (bipartite star per KB id).
    Exact-equal surfaces are already one node by construction.

    BOTH node kinds carry an engine-added namespace prefix ("s:" /
    "k:"), so node type is decided structurally — a mention surface
    whose text literally starts with "kb:" (or "k:") can never be
    mistaken for a KB node, keeping the local and distributed
    canonicalization paths label-identical on any input."""
    return (
        links.where(F.col("kb_id").isNotNull())
        .select(
            F.concat(F.lit("s:"), "surface").alias("src"),
            F.concat(F.lit("k:"), "kb_id").alias("dst"),
        )
        .distinct()
    )


def _prep_fuzzy_surfaces(df: DataFrame) -> DataFrame:
    """Distinct non-null surfaces with their char-3-gram shingle sets
    (empty-shingle surfaces dropped — LSH requires ≥1 nonzero entry)."""
    from ner_spark.operators.link import _char_shingles

    return (
        df.select("surface")
        .where(F.col("surface").isNotNull())
        .distinct()
        .withColumn("shingles", _char_shingles("surface"))
        .where(F.size("shingles") > 0)
    )


def _fuzzy_candidate_pairs(
    a: DataFrame, b: DataFrame, threshold: float
) -> DataFrame:
    """Shared MinHashLSH construction for BOTH fuzzy paths (full
    self-join and delta↔all).  The hash family is fully determined by
    (numFeatures, numHashTables, seed) — independent of the fitted
    data beyond dimensionality — so any pair of surfaces either
    collides in some band for every caller of this function or for
    none: the increment's bit-for-bit-equals-full-recompute contract
    depends on both paths going through THIS ONE configuration, which
    is why it must never be duplicated at a call site."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    tf = HashingTF(inputCol="shingles", outputCol="features",
                   numFeatures=1 << 18)
    # localCheckpoint pins the size()>0 filter BEFORE the LSH hash UDF:
    # both are deterministic predicates, so Catalyst may otherwise
    # evaluate the hash first and crash on the empty vectors of sub-3-
    # char surfaces ("Must have at least 1 non zero entry")
    fa = tf.transform(a).localCheckpoint(eager=True)
    fb = fa if b is a else tf.transform(b).localCheckpoint(eager=True)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=4, seed=42)
    model = lsh.fit(fa)
    # approxSimilarityJoin keeps dist STRICTLY below its cutoff, which
    # would drop pairs at exactly J = threshold (the exact path and the
    # oracle keep >=): join marginally looser, then filter inclusively
    # on the returned exact distance.  Caveat vs the exact path: dist
    # is Jaccard over HASHED gram sets (2^18 buckets), so a hash
    # collision can nudge J — inherent to the approximate path.
    return (
        model.approxSimilarityJoin(
            fa, fb, min(1.0, 1.0 - threshold + 1e-9), distCol="dist"
        )
        .where((F.lit(1.0) - F.col("dist")) >= F.lit(threshold))
    )


def fuzzy_surface_edges(links: DataFrame, threshold: float = 0.85) -> DataFrame:
    """Opt-in surface↔surface similarity edges: character 3-gram
    Jaccard ≥ ``threshold`` via MinHashLSH candidate blocking (never an
    all-pairs join), so near-identical spellings that share no KB link
    ("sao paulo" / "são paulo") land in one component.

    Runs on the DISTINCT surface table — orders of magnitude smaller
    than the mention table — and returns namespaced ("s:") edges in the
    same shape as :func:`build_edges`, so both canonicalization paths
    (local union-find and distributed label propagation) consume them
    identically."""
    surfaces = _prep_fuzzy_surfaces(links)
    if surfaces.isEmpty():
        return links.sparkSession.createDataFrame([], "src string, dst string")
    return (
        _fuzzy_candidate_pairs(surfaces, surfaces, threshold)
        # one direction only; connected_components symmetrizes
        .where(F.col("datasetA.surface") < F.col("datasetB.surface"))
        .select(
            F.concat(F.lit("s:"), "datasetA.surface").alias("src"),
            F.concat(F.lit("s:"), "datasetB.surface").alias("dst"),
        )
        .distinct()
    )


def fuzzy_surface_edges_delta(
    new_surfaces: DataFrame, all_surfaces: DataFrame, threshold: float = 0.85
) -> DataFrame:
    """Delta-proportional twin of :func:`fuzzy_surface_edges`: fuzzy
    edges between NEW surfaces and the full surface set (old ∪ new).

    MinHashLSH's hash family is seed-determined (independent of the
    fitted data beyond dimensionality), so with the same
    HashingTF/numHashTables/seed config this finds exactly the subset
    of the full path's pairs that touch a new surface — old↔old pairs
    are already folded into the entity table an incremental
    canonicalization starts from.  That makes
    increment(old) + delta ≡ full recompute over the union, bit-for-bit
    (both paths miss the same never-colliding pairs) — which is why
    the construction lives in the shared :func:`_fuzzy_candidate_pairs`
    rather than being repeated here."""
    spark = new_surfaces.sparkSession
    new_s = _prep_fuzzy_surfaces(new_surfaces)
    all_s = _prep_fuzzy_surfaces(all_surfaces)
    if new_s.isEmpty() or all_s.isEmpty():
        return spark.createDataFrame([], "src string, dst string")
    return (
        _fuzzy_candidate_pairs(new_s, all_s, threshold)
        # new-new pairs appear in both directions; connected_components
        # symmetrizes, and the local union-find ignores duplicates
        .where(F.col("datasetA.surface") != F.col("datasetB.surface"))
        .select(
            F.concat(F.lit("s:"), "datasetA.surface").alias("src"),
            F.concat(F.lit("s:"), "datasetB.surface").alias("dst"),
        )
        .distinct()
    )


def fuzzy_surface_edges_exact(links: DataFrame, threshold: float = 0.85) -> DataFrame:
    """EXACT char-3-gram Jaccard pairs via a shingle equi-join — the
    oracle-checkable twin of :func:`fuzzy_surface_edges` (which blocks
    candidates with MinHashLSH and may therefore miss a pair whose
    hashes never collide).  Same blocked-join shape as the dedup
    layer's ``ngram_jaccard_pairs``: explode distinct surfaces to
    (surface, gram), self-join on gram, count the intersection, and
    derive Jaccard from the per-surface gram counts — never an
    all-pairs comparison."""
    from ner_spark.operators.link import _char_shingles

    grams = (
        links.select("surface")
        .where(F.col("surface").isNotNull())
        .distinct()
        .select("surface", F.explode(_char_shingles("surface")).alias("g"))
    )
    sizes = grams.groupBy("surface").agg(F.count("*").alias("n"))
    inter = (
        grams.alias("a")
        .join(grams.alias("b"),
              (F.col("a.g") == F.col("b.g"))
              & (F.col("a.surface") < F.col("b.surface")))
        .groupBy(F.col("a.surface").alias("sa"), F.col("b.surface").alias("sb"))
        .agg(F.count("*").alias("i"))
    )
    return (
        inter.join(sizes.select(F.col("surface").alias("sa"),
                                F.col("n").alias("na")), "sa")
        .join(sizes.select(F.col("surface").alias("sb"),
                           F.col("n").alias("nb")), "sb")
        .where(F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
               >= F.lit(threshold))
        .select(
            F.concat(F.lit("s:"), "sa").alias("src"),
            F.concat(F.lit("s:"), "sb").alias("dst"),
        )
    )


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_iter: int = 50,
    checkpoint_every: int = 1,
    salt_buckets: int = 8,
) -> DataFrame:
    """nodes(node) + edges(src,dst) → (node, label) with label = min
    node id in the component (min-label propagation).

    ``salt_buckets > 1`` enables the north rule's *salted* iterative
    hash join: hub nodes (a mega-repo entity with 10⁶+ edges) would
    otherwise concentrate one join key on one task every iteration.
    Each edge is deterministically salted by ``hash(dst) % K`` and the
    label frontier is replicated ×K on ``(node, salt)``, so a hot
    ``src`` fans out across K tasks.  The label-side blow-up is K× the
    (small) frontier, not K× the edges.
    """
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.distinct()
    if salt_buckets > 1:
        sym = sym.withColumn("salt", F.pmod(F.xxhash64("dst"), F.lit(salt_buckets)))
    sym = sym.localCheckpoint(eager=True)

    labels = nodes.select(F.col("node"), F.col("node").alias("label"))

    for it in range(max_iter):
        new_labels = cc_iteration(sym, labels, salt_buckets)
        if checkpoint_every and it % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)

        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels

    # fail loudly rather than return silently-split components: a graph
    # whose diameter exceeds max_iter would otherwise canonicalize
    # differently from the (always-exact) local union-find path
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations; "
        "raise max_iter (component diameter exceeds it)"
    )


def cc_iteration(sym: DataFrame, labels: DataFrame,
                 salt_buckets: int) -> DataFrame:
    """One min-label-propagation round (the loop body of
    :func:`connected_components`, exposed so the plan audit can assert
    the salted-join shape without executing the loop).

    Frontier join: with salting, the label frontier is replicated ×K on
    ``(node, salt)`` and each edge carries its deterministic
    ``hash(dst) % K`` salt, so a hub ``src`` fans out across K tasks.
    Then pointer jumping (path doubling): each node also adopts its
    label's own label.  Labels only ever decrease and every label is a
    node id inside the same component, so correctness is unchanged —
    but a chain of diameter d converges in O(log d) rounds instead of
    O(d), which keeps deep KB-star chains from exhausting max_iter at
    scale."""
    if salt_buckets > 1:
        exploded = labels.select(
            "node", "label",
            F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("salt"),
        )
        neighbor_labels = (
            sym.join(
                exploded,
                (sym.src == exploded.node) & (sym.salt == exploded.salt),
            )
            .select(F.col("dst").alias("node"), F.col("label"))
        )
    else:
        neighbor_labels = (
            sym.join(labels, sym.src == labels.node)
            .select(F.col("dst").alias("node"), F.col("label"))
        )
    new_labels = (
        labels.unionByName(neighbor_labels)
        .groupBy("node")
        .agg(F.min("label").alias("label"))
    )
    jump = new_labels.select(
        F.col("node").alias("jn"), F.col("label").alias("jl")
    )
    return (
        new_labels.alias("a")
        .join(jump, F.col("a.label") == F.col("jn"), "left")
        .select(
            F.col("a.node").alias("node"),
            F.least(
                F.coalesce(F.col("jl"), F.col("a.label")), F.col("a.label")
            ).alias("label"),
        )
    )


def _local_components(edge_rows: list) -> list[tuple[str, str]]:
    """Driver-side union-find over a collected edge list (small-graph
    fast path).  Returns (node, label=min node in component)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for src, dst in edge_rows:
        ra, rb = find(src), find(dst)
        if ra != rb:
            # union by min so the root IS the min label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return [(n, find(n)) for n in parent]


def canonicalize(
    links: DataFrame,
    max_iter: int = 50,
    local_threshold: int = 100_000,
    fuzzy: bool = False,
    fuzzy_threshold: float = 0.85,
    fuzzy_method: str = "lsh",
) -> DataFrame:
    """links → entities(surface, entity_id).

    entity_id = ``ent:<min surface in component>`` (deterministic);
    surfaces with no KB link form singleton components.

    ``fuzzy=True`` additionally merges surfaces whose character-3-gram
    Jaccard similarity is ≥ ``fuzzy_threshold`` — off by default
    because it changes entity identity semantics: the KG pipeline keeps
    exact+KB-linked canonicalization unless the operator opts in.
    ``fuzzy_method`` picks the pair finder: ``"lsh"``
    (:func:`fuzzy_surface_edges`, MinHashLSH candidate blocking — the
    scale path) or ``"exact"`` (:func:`fuzzy_surface_edges_exact`,
    shingle equi-join — exhaustive above the threshold and
    SQL-oracle-checkable; both are blocked joins, never all-pairs).

    Components over at most ``local_threshold`` edges run as driver-side
    union-find on the collected (distinct, already-aggregated) edge list
    — the same small-side cutoff reasoning as a broadcast join.  The
    default (100k edges ≈ a few MB of Row objects) is sized so the
    probing ``take()`` can never strain driver memory; larger graphs run
    the distributed salted label-propagation loop
    (:func:`connected_components`).  Both paths produce identical
    labels; set ``local_threshold=0`` to force the distributed path.
    """
    surfaces = links.select("surface").where(F.col("surface").isNotNull()).distinct()
    edges = build_edges(links)
    if fuzzy:
        builder = (fuzzy_surface_edges_exact if fuzzy_method == "exact"
                   else fuzzy_surface_edges)
        edges = edges.unionByName(builder(links, fuzzy_threshold))

    # one job: take() both probes the threshold AND collects the edge
    # sample we need for the local path (bounded by local_threshold+1
    # rows — the threshold default keeps this a broadcast-sized pull)
    edge_rows = edges.take(local_threshold + 1) if local_threshold else None

    if edge_rows is not None and len(edge_rows) == 0:
        return surfaces.select(
            "surface", F.concat(F.lit("ent:"), "surface").alias("entity_id")
        )

    if edge_rows is not None and len(edge_rows) <= local_threshold:
        spark = links.sparkSession
        pairs = _local_components([(r["src"], r["dst"]) for r in edge_rows])
        # component → canonical surface (min over "s:" nodes; "k:" KB
        # nodes excluded structurally — both kinds are namespace-
        # prefixed by build_edges, so the startswith test cannot
        # misclassify a surface whose text begins with "k:").  The
        # shared "s:" prefix makes min-over-nodes == min-over-surfaces.
        # Only edge-connected surfaces need mapping rows — singletons
        # coalesce to themselves.
        roots: dict[str, str] = {}
        for node, label in pairs:
            if node.startswith("k:"):
                continue
            cur = roots.get(label)
            if cur is None or node < cur:
                roots[label] = node
        mapping = [
            (node[2:], "ent:" + roots[label][2:])
            for node, label in pairs
            if not node.startswith("k:")
        ]
        mapped = spark.createDataFrame(mapping, "surface string, mapped_id string")
        return surfaces.join(F.broadcast(mapped), "surface", "left").select(
            "surface",
            F.coalesce("mapped_id", F.concat(F.lit("ent:"), "surface")).alias("entity_id"),
        )

    # (edge_rows is None here — local_threshold=0 forced the distributed
    # path; when take() ran, emptiness was already decided above)
    if edge_rows is None and edges.isEmpty():
        return surfaces.select(
            "surface", F.concat(F.lit("ent:"), "surface").alias("entity_id")
        )

    kb_nodes = edges.select(F.col("dst").alias("node")).distinct()
    nodes = (
        surfaces.select(F.concat(F.lit("s:"), "surface").alias("node"))
        .union(kb_nodes)
        .distinct()
    )

    labels = connected_components(nodes, edges, max_iter=max_iter)

    # canonical surface per component = min *surface* ("k:" KB nodes
    # excluded by their structural namespace prefix)
    surface_labels = labels.where(F.col("node").startswith("s:")).select(
        F.expr("substring(node, 3)").alias("surface"), "label"
    )
    canon = surface_labels.groupBy("label").agg(F.min("surface").alias("canon_surface"))
    return surface_labels.join(canon, "label").select(
        "surface", F.concat(F.lit("ent:"), "canon_surface").alias("entity_id")
    )


def canonicalize_increment(
    old_entities: DataFrame,
    delta_links: DataFrame,
    prev_links: DataFrame,
    *,
    fuzzy: bool = False,
    fuzzy_threshold: float = 0.85,
    local_threshold: int = 100_000,
    max_iter: int = 50,
) -> tuple[DataFrame, DataFrame]:
    """Fold a DELTA link table into a committed entity table without
    re-running connected components over the full graph.

    Exactness argument: appended documents only ever ADD edges, and
    contracting each old component to a single representative node
    preserves connectivity (components can merge, never split), so CC
    over the tiny contracted graph — old reps touched by delta edges,
    plus genuinely-new surface/KB nodes — yields exactly the components
    of a full recompute over base ∪ delta.  The canonical surface of a
    merged group is the min over its members' canonical surfaces (each
    old ``entity_id`` IS ``ent:<min surface of its component>``) and any
    new surfaces in the group.  Everything here is delta-proportional
    except two single-pass scans: ``old_entities`` (semi-joined by the
    delta's surface set) and ``prev_links`` (semi-joined by the delta's
    KB ids to recover each KB node's old component) — at deploy scale
    both prune via partition/bloom metadata instead of a full read.

    Returns ``(new_entities, surface_changes)``:

    - ``new_entities(surface, entity_id)`` — covers every old surface
      (reassigned where components merged or gained a smaller canonical
      surface) plus every new delta surface.
    - ``surface_changes(surface, old_entity_id, new_entity_id)`` — one
      row per OLD surface whose assignment changed; empty ⇔ the delta
      was purely additive (the merge-fast-path stability condition).

    ``fuzzy=True`` must match the committed table's setting (the KG
    job's manifest enforces this): delta fuzzy edges are found by
    :func:`fuzzy_surface_edges_delta`, whose seed-determined LSH family
    makes the increment reproduce the full LSH path bit-for-bit.
    """
    spark = delta_links.sparkSession

    d_surfaces = (
        delta_links.select("surface").where(F.col("surface").isNotNull()).distinct()
    )
    new_surfaces = d_surfaces.join(
        old_entities, "surface", "left_anti"
    ).localCheckpoint(eager=True)

    dedges = build_edges(delta_links)
    if fuzzy:
        all_surfaces = old_entities.select("surface").union(
            new_surfaces.select("surface")
        )
        dedges = dedges.unionByName(
            fuzzy_surface_edges_delta(new_surfaces, all_surfaces, fuzzy_threshold)
        )
    dedges = dedges.localCheckpoint(eager=True)

    # old-graph representative of every delta-edge endpoint: surfaces →
    # their committed entity_id, KB nodes → the entity of any of their
    # old surfaces (all surfaces of one KB id share a component, so
    # min() is THE component).  Unmatched endpoints are genuinely new.
    d_nodes = (
        dedges.select(F.col("src").alias("node"))
        .union(dedges.select(F.col("dst").alias("node")))
        .distinct()
    )
    d_surf = d_nodes.where(F.col("node").startswith("s:")).select(
        F.expr("substring(node, 3)").alias("surface")
    )
    d_kb = d_nodes.where(F.col("node").startswith("k:")).select(
        F.expr("substring(node, 3)").alias("kb_id")
    )
    s_rep = (
        old_entities.join(F.broadcast(d_surf), "surface", "left_semi")
        .select(
            F.concat(F.lit("s:"), "surface").alias("node"),
            F.col("entity_id").alias("rep"),
        )
    )
    kb_rep = (
        prev_links.where(F.col("kb_id").isNotNull())
        .join(F.broadcast(d_kb), "kb_id", "left_semi")
        .select("kb_id", "surface")
        .distinct()
        .join(old_entities, "surface")
        .groupBy("kb_id")
        .agg(F.min("entity_id").alias("rep"))
        .select(F.concat(F.lit("k:"), "kb_id").alias("node"), "rep")
    )
    rep = s_rep.unionByName(kb_rep).localCheckpoint(eager=True)

    # contracted delta graph: node namespaces stay disjoint ("ent:" for
    # old component reps, "s:"/"k:" for new raw nodes), so membership is
    # decided structurally everywhere below
    ce = (
        dedges.join(
            F.broadcast(rep.select(F.col("node").alias("src"),
                                   F.col("rep").alias("src_rep"))),
            "src", "left",
        )
        .join(
            F.broadcast(rep.select(F.col("node").alias("dst"),
                                   F.col("rep").alias("dst_rep"))),
            "dst", "left",
        )
        .select(
            F.coalesce("src_rep", "src").alias("src"),
            F.coalesce("dst_rep", "dst").alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )

    changes_schema = "old_entity_id string, new_entity_id string"
    assigned_schema = "surface string, entity_id string"
    edge_rows = ce.take(local_threshold + 1) if local_threshold else None

    if edge_rows is not None and len(edge_rows) <= local_threshold:
        pairs = _local_components([(r["src"], r["dst"]) for r in edge_rows])
        # canonical surface per group = min over members' surfaces
        # (ent:X contributes X — its old component's min; s:Y contributes
        # Y; k:Z contributes nothing).  Every component has ≥1 surface-
        # bearing member: every delta edge has a surface-side endpoint.
        canon: dict[str, str] = {}
        for node, label in pairs:
            s = (node[4:] if node.startswith("ent:")
                 else node[2:] if node.startswith("s:") else None)
            if s is not None and (label not in canon or s < canon[label]):
                canon[label] = s
        ent_changes, new_assign = [], []
        for node, label in pairs:
            if node.startswith("ent:"):
                new_id = "ent:" + canon[label]
                if new_id != node:
                    ent_changes.append((node, new_id))
            elif node.startswith("s:"):
                new_assign.append((node[2:], "ent:" + canon[label]))
        changes_ent = spark.createDataFrame(ent_changes, changes_schema)
        assigned = spark.createDataFrame(new_assign, assigned_schema)
    else:
        # constraint scrub: localCheckpoint preserves the origin plan's
        # constraints in its LogicalRDD, and ce's double broadcast-join
        # constraints reference pruned attributes — Spark 4.1's
        # Union.rewriteConstraints throws an AttributeMap miss on any
        # such constraint, killing connected_components' edge
        # symmetrization union.  Rebuilding from the materialized RDD
        # yields a constraint-free plan; the second checkpoint pays the
        # one Python round-trip once (delta-sized rows, rare branch —
        # the local union-find path handles graphs under the threshold)
        ce = ce.localCheckpoint(eager=True)
        ce = spark.createDataFrame(ce.rdd, ce.schema).localCheckpoint(eager=True)
        nodes = (
            ce.select(F.col("src").alias("node"))
            .union(ce.select(F.col("dst").alias("node")))
            .distinct()
        )
        labels = connected_components(nodes, ce, max_iter=max_iter)
        member_surface = (
            F.when(F.col("node").startswith("ent:"), F.expr("substring(node, 5)"))
            .when(F.col("node").startswith("s:"), F.expr("substring(node, 3)"))
        )
        canon_df = (
            labels.withColumn("ms", member_surface)
            .where(F.col("ms").isNotNull())
            .groupBy("label")
            .agg(F.min("ms").alias("canon_surface"))
        )
        lab_canon = labels.join(canon_df, "label")
        changes_ent = (
            lab_canon.where(F.col("node").startswith("ent:"))
            .select(
                F.col("node").alias("old_entity_id"),
                F.concat(F.lit("ent:"), "canon_surface").alias("new_entity_id"),
            )
            .where(F.col("old_entity_id") != F.col("new_entity_id"))
        )
        assigned = lab_canon.where(F.col("node").startswith("s:")).select(
            F.expr("substring(node, 3)").alias("surface"),
            F.concat(F.lit("ent:"), "canon_surface").alias("entity_id"),
        )

    changes_ent = changes_ent.localCheckpoint(eager=True)
    surface_changes = (
        old_entities.alias("oe")
        .join(
            F.broadcast(changes_ent),
            F.col("oe.entity_id") == F.col("old_entity_id"),
        )
        .select("surface", "old_entity_id", "new_entity_id")
    )
    new_entities = (
        old_entities.alias("oe")
        .join(
            F.broadcast(changes_ent),
            F.col("oe.entity_id") == F.col("old_entity_id"),
            "left",
        )
        .select(
            "surface",
            F.coalesce("new_entity_id", F.col("oe.entity_id")).alias("entity_id"),
        )
        .unionByName(
            new_surfaces.join(F.broadcast(assigned), "surface", "left")
            .select(
                "surface",
                F.coalesce(
                    "entity_id", F.concat(F.lit("ent:"), "surface")
                ).alias("entity_id"),
            )
        )
    )
    return new_entities, surface_changes

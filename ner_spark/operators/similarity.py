"""Similarity search over the ``embeddings`` table (array<float>).

Two paths, per the training-data-pipeline brief:

- :func:`cosine_topk` — exact brute-force cosine top-k vs a query
  vector.  Pure Catalyst (``zip_with`` + ``aggregate`` dot product in
  double precision), one narrow scan + one top-k (``row_number``) —
  the correctness baseline and the right answer when the query set is
  small and the corpus scan is already needed.

- :func:`ann_lsh_topk` — random-hyperplane (sign) LSH bucketing: a
  deterministic seeded hyperplane matrix is broadcast, each vector is
  hashed to a ``2^planes``-bucket key, and the search runs only inside
  the query's bucket (multi-probe: optionally flip 1 bit).  At 100 TB
  this is the scale path: the bucket key is also the natural partition /
  Z-order key for the stored table, so a probe touches one partition.

Both return (vec_id, cos_sim) ranked deterministically.
"""

from __future__ import annotations

import math

import numpy as np

from ner_spark.functions.text import stable_round

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec``.

    The query is folded in as a literal array (broadcast-free); ranking
    is (cos desc, vec_id asc) so ties are deterministic.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = _as_double(F.col("embedding"))
    # query norm folded to a scalar driver-side: higher-order functions
    # are interpreted per row, so _norm(q) over a constant literal would
    # re-pay a dim-length fold on every row.  Python's left-assoc sum
    # matches aggregate()'s fold order, so the value is bitwise equal.
    q_norm = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    cos = _dot(v, q) / (_norm(v) * F.lit(q_norm))
    # rank on the ROUNDED similarity: double-precision sum-order noise
    # (~1e-16) must not flip ranks vs the SQL oracle; ties break on vec_id
    scored = emb.select("vec_id", stable_round(cos, 4).alias("cos_sim"))
    if exclude_vec_id is not None:
        scored = scored.where(F.col("vec_id") != exclude_vec_id)
    return _ranked_topk(scored, k)


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    """Distributed deterministic top-k with a rank column.

    ``orderBy(...).limit(k)`` compiles to ``TakeOrderedAndProject`` —
    a per-partition bounded heap merged at the driver — so no row
    outside the top k ever moves, and there is no single-task global
    sort/window (the scale-killer an unpartitioned ``row_number``
    window would be).  Only the ≤ k survivors are then numbered; the
    constant partition key keeps WindowExec's input to those k rows.
    """
    top = scored.orderBy(F.desc("cos_sim"), "vec_id").limit(k)
    # constant partition key for the k-row numbering; derived from a
    # column so Catalyst cannot constant-fold the partition spec away
    # (a folded spec re-triggers the global-window warning path)
    zero = F.coalesce(F.col("vec_id") * 0, F.lit(0))
    w = Window.partitionBy(zero).orderBy(F.desc("cos_sim"), "vec_id")
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("vec_id", "cos_sim", "rank")
    )


def hyperplanes(dim: int, planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplane matrix (planes × dim)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((planes, dim))


def lsh_bucket_col(vec_col, planes_mat: np.ndarray) -> F.Column:
    """Sign-LSH bucket id of a double-array column: bit b set iff
    dot(vec, plane_b) > 0.  Pure expressions — the plane matrix is
    folded in as literals (planes ≤ ~16 keeps the expr tree small)."""
    bucket = F.lit(0)
    for b, row in enumerate(planes_mat):
        plane = F.array(*[F.lit(float(x)) for x in row])
        bucket = bucket + F.when(_dot(vec_col, plane) > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bucket


def ivf_centroids(dim: int, n_centroids: int, seed: int = 7) -> np.ndarray:
    """Deterministic pseudo-centroid matrix (n_centroids × dim).

    Production IVF trains these with k-means and persists them next to
    the table; the fixed seeded matrix keeps the operator — and its
    SQL oracle — fully deterministic in this repo."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_centroids, dim))


def train_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    seed: int = 7,
    sample_size: int = 4096,
    max_iters: int = 25,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic sampled k-means for IVF centroids (the trained
    replacement for :func:`ivf_centroids`' seeded random matrix).

    Production IVF trains centroids ONCE at table-write time and
    persists them beside the table (:func:`save_centroids` /
    :func:`load_centroids`); random centroids assign real, clustered
    embedding distributions to a few hot cells, which at 100 TB means
    hot partitions and a useless nprobe fraction.

    Training is spherical Lloyd's on a BOUNDED sample, driver-side:

    - the sample is the ``sample_size`` lowest-``xxhash64(id)`` rows —
      layout-invariant (no dependence on partition order), unbiased,
      and one TakeOrderedAndProject over the corpus, so the collect is
      ~sample_size × dim floats no matter how large the table is;
    - rows are L2-normalized and k-means++-seeded with a fixed rng, so
      the result is a pure function of (data, params) — rerunning the
      trainer on the same table yields bitwise-identical centroids;
    - centroids stay unit-norm, so :func:`ivf_cell_col`'s argmax-dot
      assignment is exactly nearest-by-cosine — the training objective
      and the serving rule agree;
    - an emptied cluster is reseeded to the sample point worst-covered
      by the surviving centroids (deterministic ties by index).
    """
    rows = (
        emb.select(F.col(vec_col).alias("v"),
                   F.xxhash64(F.col(id_col)).alias("h"),
                   F.col(id_col).alias("i"))
        .orderBy("h", "i")
        .limit(sample_size)
        .collect()
    )
    x = np.asarray([r["v"] for r in rows], dtype=np.float64)
    if x.shape[0] < n_centroids:
        raise ValueError(
            f"sample of {x.shape[0]} vectors cannot seed {n_centroids} "
            "centroids; lower n_centroids or raise sample_size"
        )
    norms = np.linalg.norm(x, axis=1)
    x = x[norms > 0] / norms[norms > 0, None]

    rng = np.random.default_rng(seed)
    # k-means++ seeding on cosine distance (1 - dot of unit vectors)
    cents = np.empty((n_centroids, x.shape[1]))
    cents[0] = x[rng.integers(len(x))]
    d2 = np.maximum(1.0 - x @ cents[0], 0.0) ** 2
    for c in range(1, n_centroids):
        tot = d2.sum()
        probs = d2 / tot if tot > 0 else np.full(len(x), 1.0 / len(x))
        cents[c] = x[rng.choice(len(x), p=probs)]
        d2 = np.minimum(d2, np.maximum(1.0 - x @ cents[c], 0.0) ** 2)

    assign = np.full(len(x), -1)
    for _ in range(max_iters):
        sims = x @ cents.T
        new_assign = sims.argmax(axis=1)
        if (new_assign == assign).all():
            break
        assign = new_assign
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
                    continue
            # empty (or degenerate) cluster: reseed to the point the
            # other centroids cover worst
            cents[c] = x[np.argmin(sims.max(axis=1))]
    return cents


def save_centroids(path: str, cents: np.ndarray) -> None:
    """Persist a trained centroid matrix as the table-side artifact
    (``.npy`` — the same write-once role crf_weights plays for the
    tagger)."""
    with open(path, "wb") as f:
        np.save(f, cents)


def load_centroids(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return np.load(f)


def ivf_cell_stats(emb: DataFrame, cents: np.ndarray,
                   vec_col: str = "embedding") -> dict:
    """Cell-population balance of an IVF assignment: ``max`` / ``mean``
    over NON-EMPTY cells plus the populated-cell count.  ``balance``
    (max/mean) near 1.0 means even partitions; a large value means hot
    cells — the failure mode random centroids produce on clustered
    data."""
    v = _as_double(F.col(vec_col))
    counts = [
        int(r["n"]) for r in
        emb.select(ivf_cell_col(v, cents).alias("cell"))
        .groupBy("cell").agg(F.count("*").alias("n")).collect()
    ]
    mean = sum(counts) / len(counts)
    return {
        "cells": len(counts),
        "total_cells": int(cents.shape[0]),
        "max": max(counts),
        "mean": round(mean, 1),
        "balance": round(max(counts) / mean, 2),
    }


def ivf_cell_col(vec_col, cents: np.ndarray) -> F.Column:
    """IVF cell id of a double-array column: argmax over centroid dot
    products, first-max-wins, on dots quantized to 6 decimals (the
    quantization pins the Spark-vs-SQL float fold order so both
    engines assign identical cells)."""
    dots = F.array(*[
        stable_round(_dot(vec_col, F.array(*[F.lit(float(x)) for x in c])), 6)
        for c in cents
    ])
    return F.array_position(dots, F.array_max(dots)).cast("int") - 1


def ann_ivf_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    n_centroids: int = 16, nprobe: int = 2, seed: int = 7,
    exclude_vec_id: int | None = None,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) cells.

    Each vector is assigned to its nearest centroid (max dot); the
    query probes its ``nprobe`` best cells and ranks exact cosine only
    inside them.  At 100 TB the cell id is the table's partition /
    clustering key, so a probe reads nprobe/n_centroids of the data —
    the classic IVF pruning — and assignment happens once at write
    time, not per query.

    ``centroids`` takes a TRAINED matrix (:func:`train_ivf_centroids`,
    usually via :func:`load_centroids`) — the production path, whose
    cells track the real embedding distribution.  ``None`` falls back
    to the seeded pseudo-centroids: fully input-independent, which is
    what the DuckDB oracle twin (literal centroid matrix baked into
    static SQL) requires."""
    dim = len(query_vec)
    cents = centroids if centroids is not None else ivf_centroids(
        dim, n_centroids, seed)
    n_centroids = int(cents.shape[0])
    qv = np.asarray(query_vec, dtype=np.float64)
    # same quantize-then-first-max rule as the per-row assignment; the
    # SQL oracle ranks the query's cells with round(x+1e-9, 6) (half
    # away from zero), so emulate exactly that — np.round's banker's
    # rounding would disagree at .5e-6 boundaries
    raw = cents @ qv + 1e-9
    qdots = np.copysign(np.floor(np.abs(raw) * 1e6 + 0.5), raw) / 1e6
    order = sorted(range(n_centroids), key=lambda c: (-qdots[c], c))
    probes = [int(c) for c in order[:nprobe]]

    v = _as_double(F.col("embedding"))
    assigned = emb.select("vec_id", v.alias("v"), ivf_cell_col(v, cents).alias("cell"))
    cand = assigned.where(F.col("cell").isin(probes))
    if exclude_vec_id is not None:
        cand = cand.where(F.col("vec_id") != exclude_vec_id)

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    q_norm = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    cos = _dot(F.col("v"), q) / (_norm(F.col("v")) * F.lit(q_norm))
    scored = cand.select("vec_id", stable_round(cos, 4).alias("cos_sim"))
    return _ranked_topk(scored, k)


def ann_lsh_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10,
    planes: int = 4, seed: int = 42, multiprobe: bool = True,
    exclude_vec_id: int | None = None,
) -> DataFrame:
    """Approximate top-k: search only LSH bucket(s) near the query's.

    With ``multiprobe`` the query also probes every bucket at Hamming
    distance 1 (recall boost for vectors near a hyperplane).
    """
    dim = len(query_vec)
    mat = hyperplanes(dim, planes, seed)
    qv = np.asarray(query_vec, dtype=np.float64)
    q_bucket = int(sum((1 << b) for b in range(planes) if float(mat[b] @ qv) > 0))
    probe = [q_bucket] + ([q_bucket ^ (1 << b) for b in range(planes)] if multiprobe else [])

    v = _as_double(F.col("embedding"))
    bucketed = emb.select("vec_id", v.alias("v"), lsh_bucket_col(v, mat).alias("bucket"))
    cand = bucketed.where(F.col("bucket").isin(probe))
    if exclude_vec_id is not None:
        cand = cand.where(F.col("vec_id") != exclude_vec_id)

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    q_norm = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    cos = _dot(F.col("v"), q) / (_norm(F.col("v")) * F.lit(q_norm))
    scored = cand.select("vec_id", stable_round(cos, 4).alias("cos_sim"))
    return _ranked_topk(scored, k)

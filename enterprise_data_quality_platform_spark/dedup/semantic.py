"""SemDeDup-style semantic deduplication (SURVEY.md §2.6 X4 family).

Reference shape: Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication" (arXiv:2303.09540) — cluster the
embedding space with k-means, then search for near-duplicate pairs ONLY
within each cluster: the O(n²) all-pairs cosine collapses to
Σ |cluster|², and k is chosen so clusters stay small. This composes the
repo's existing primitives:

- ``similarity.ivf.train_centroids`` — seeded cosine k-means on a bounded
  sample (the coarse quantizer doubles as the dedup partitioner);
- ``similarity.ivf.assign_centroids`` — Arrow-batched centroid assignment
  (centroids ride in the UDF closure, the broadcast-small side);
- ``dedup.clusters.keep_one_per_cluster`` — min-id connected-component
  resolution + anti-join kill list.

100 TB posture: the only shuffle is the equi-join on ``list_id`` (skew
bounded by ``max_cluster_size`` — an oversized cluster means the quantizer
under-fit, the guard drops it from pair generation rather than letting one
hot key quadratically dominate, same policy as MinHash's
``max_bucket_size``); pair verification is an Arrow-vectorized cosine on
co-clustered candidates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_batch, to_double
from ..similarity.ivf import assign_centroids, train_centroids
from .clusters import keep_one_per_cluster


def semantic_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    num_centroids: int = 32,
    nprobe: int = 1,
    sample_size: int = 10_000,
    seed: int = 42,
    max_cluster_size: int | None = 50_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, cosine ≥ threshold) found within
    shared k-means clusters. ``nprobe > 1`` assigns each vector to its
    top-n clusters — catching near-dups that straddle a cluster boundary
    at the cost of n× assignment rows (pairs found in two shared clusters
    are deduplicated)."""
    cent = train_centroids(
        corpus,
        num_centroids=num_centroids,
        sample_size=sample_size,
        seed=seed,
        vec_col=vec_col,
    )
    assigned = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode(
            assign_centroids(to_double(F.col(vec_col)), cent, nprobe=nprobe)
        ).alias("list_id"),
    )
    if max_cluster_size is not None:
        sizes = assigned.groupBy("list_id").agg(
            F.count(F.lit(1)).alias("_csz")
        )
        assigned = assigned.join(
            F.broadcast(sizes.filter(F.col("_csz") <= max_cluster_size)),
            "list_id",
        ).drop("_csz")
    a = assigned.select(
        "list_id",
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
    )
    b = assigned.select(
        "list_id",
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
    )
    sim = cosine_batch(to_double(F.col("va")), to_double(F.col("vb")))
    return (
        a.join(b, on="list_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= F.lit(threshold))
        .dropDuplicates(["id_a", "id_b"])
    )


def greedy_drop(
    corpus: DataFrame,
    pairs: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup's own keep policy: drop every id that appears as the
    GREATER side of any near-dup pair — one distinct + one anti-join, no
    iteration. On a dup CHAIN (a~b, b~c but a≁c) this drops b AND c where
    exact component resolution keeps one per component (a) and would also
    keep c's information only via b — greedy over-drops on chains, which
    for dedup is the conservative direction (never keeps two near-dups).
    Survivors are pair-free WITH RESPECT TO THE DETECTED PAIR SET: any
    surviving y of a detected pair (x, y) would have been dropped.
    Re-running the full pipeline over survivors retrains the k-means
    centroids on the reduced corpus, so a near-dup pair missed in run 1
    (never co-clustered) can be co-clustered and detected in run 2 —
    idempotence holds only under an identical clustering (same centroids
    + assignments); raise ``nprobe`` to shrink the cross-cluster miss
    rate instead of chaining runs. The win here is avoiding the
    O(diameter) label-propagation loop (each iteration of which is a
    fixed multi-job cost that dominates small graphs)."""
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return corpus.join(losers, on=id_col, how="left_anti")


def semantic_dedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    num_centroids: int = 32,
    nprobe: int = 1,
    sample_size: int = 10_000,
    seed: int = 42,
    max_cluster_size: int | None = 50_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    policy: str = "components",
) -> DataFrame:
    """Drop semantic near-duplicates; vectors in no pair pass through
    untouched. ``policy="components"`` keeps the canonical (min-id)
    member of every CONNECTED near-dup group (exact, iterative —
    ``dedup.clusters``); ``policy="greedy"`` is SemDeDup's single-pass
    drop-the-greater-side rule (see ``greedy_drop``). Both leave
    survivors pair-free w.r.t. the pairs DETECTED under this run's
    clustering; a fresh re-run re-clusters and may surface pairs the
    first pass never co-clustered (see ``greedy_drop`` docstring)."""
    pairs = semantic_dup_pairs(
        corpus,
        threshold=threshold,
        num_centroids=num_centroids,
        nprobe=nprobe,
        sample_size=sample_size,
        seed=seed,
        max_cluster_size=max_cluster_size,
        id_col=id_col,
        vec_col=vec_col,
    )
    if policy == "greedy":
        return greedy_drop(corpus, pairs, id_col=id_col)
    return keep_one_per_cluster(corpus, pairs, id_col=id_col)

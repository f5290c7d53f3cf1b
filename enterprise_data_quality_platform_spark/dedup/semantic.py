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

100 TB posture: the only shuffle is the ``list_id`` groupBy — each vector
crosses the wire ONCE per probed cluster (r11; the previous self-join
carried both embeddings once per candidate PAIR). Skew is bounded by
``max_cluster_size`` — an oversized cluster means the quantizer under-fit,
the guard emits no pairs for it rather than letting one hot key
quadratically dominate (same policy as MinHash's ``max_bucket_size``), and
it also caps per-task memory for the blocked in-task GEMM that scores each
cluster.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import to_double
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
        to_double(F.col(vec_col)).alias("__vec"),
        F.explode(
            assign_centroids(to_double(F.col(vec_col)), cent, nprobe=nprobe)
        ).alias("list_id"),
    )

    # r11 (guide §2.3/§4.2): per-cluster Arrow all-pairs scoring replaces
    # the list_id SELF-JOIN. The join duplicated every vector ~|cluster|
    # times — each candidate pair carried BOTH full embeddings through the
    # shuffle and then row-by-row across the Arrow boundary (sf0.1:
    # ~900k joined rows x 2x64 doubles for 2k vectors). Grouping ships
    # each vector ONCE per probed cluster and scores the whole cluster in
    # blocked matrix products — the same normalized-GEMM formula the
    # recall test's numpy ground truth uses. The hot-cluster guard moves
    # INSIDE the group function (an oversized cluster emits no pairs —
    # identical semantics to the old drop-the-cluster join, minus its
    # sizes aggregate and broadcast join). In-session alternating A/B at
    # sf0.1 (full dedup_semantic_docs, medians of 5): 6.73 s -> 1.49 s,
    # identical pair sets at sf0.001/0.01/0.1 (OPTIMIZATION_r11.md).
    thr = float(threshold)
    cap = int(max_cluster_size) if max_cluster_size is not None else None
    # pair-id output type follows the corpus id column (ADVICE r11 #1: the
    # r11 rewrite hardcoded 'long', silently narrowing the type-generic
    # contract the old self-join path had — string or int32 ids failed at
    # Arrow conversion even though every in-repo caller uses long vec_id)
    id_type = corpus.schema[id_col].dataType.simpleString()
    pd_dtype = {
        "tinyint": "int8",
        "smallint": "int16",
        "int": "int32",
        "bigint": "int64",
        "float": "float32",
        "double": "float64",
    }.get(id_type, "object")
    empty = pd.DataFrame(
        {
            "id_a": pd.Series(dtype=pd_dtype),
            "id_b": pd.Series(dtype=pd_dtype),
            "cosine_sim": pd.Series(dtype="float64"),
        }
    )

    def _cluster_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2 or (cap is not None and n > cap):
            return empty
        order = np.argsort(pdf[id_col].to_numpy(), kind="stable")
        ids = pdf[id_col].to_numpy()[order]
        x = np.stack(pdf["__vec"].to_numpy())[order].astype(np.float64)
        norms = np.linalg.norm(x, axis=1)
        out: list[pd.DataFrame] = []
        # block the pair matrix (cap**2 pairs would not fit one task)
        step = max(1, 8_000_000 // n)
        with np.errstate(divide="ignore", invalid="ignore"):
            for s in range(0, n - 1, step):
                e = min(s + step, n)
                cos = (x[s:e] @ x.T) / (norms[s:e, None] * norms[None, :])
                # strict upper triangle only: id_a < id_b (ids ascending)
                cols = np.arange(n)[None, :]
                rows = np.arange(s, e)[:, None]
                hit = (cols > rows) & (cos >= thr)
                ii, jj = np.nonzero(hit)
                if len(ii):
                    out.append(
                        pd.DataFrame(
                            {
                                "id_a": ids[ii + s],
                                "id_b": ids[jj],
                                "cosine_sim": cos[ii, jj],
                            }
                        )
                    )
        return pd.concat(out, ignore_index=True) if out else empty

    return (
        assigned.groupBy("list_id")
        .applyInPandas(
            _cluster_pairs, f"id_a {id_type}, id_b {id_type}, cosine_sim double"
        )
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

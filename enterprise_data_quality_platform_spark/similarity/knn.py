"""Approximate-nearest-neighbor search over embedding columns
(SURVEY.md §2.6 X5-X6).

- ``brute_force_topk``: the exact baseline. Probes broadcast against the
  corpus; cosine is Arrow-vectorized (one numpy matrix op per batch —
  ~5x the JVM higher-order-function form, whose aggregate lambda
  interprets per element); per-probe top-k via the two-level window. At
  scale this is a full corpus scan per probe batch — correct, predictable,
  shuffle-light (only (probe, candidate-k) rows move).
- ``lsh_ann_topk``: the scale path. Random-hyperplane signs bucket the
  corpus (the coarse quantizer of an IVF-style index); probes search only
  their own bucket ± multiprobe neighbors (Hamming-1 flips), turning the
  scan into a bucket-join. Recall is tunable via num_planes/multiprobe —
  tests/test_dedup_similarity.py measures it against brute force.
- ``near_dup_embeddings``: cosine ≥ threshold pairs within shared buckets —
  embedding-space near-dup dedup for training pipelines.

Determinism: random hyperplanes come from a seeded ``numpy.default_rng`` —
same seed, same buckets, everywhere.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_batch, to_double


def _planes(dim: int, num_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim)).tolist()


def _bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    from ..functions.vectors import hyperplane_bucket_batch

    return hyperplane_bucket_batch(vec, planes)


def _topk_per_probe(
    sims: DataFrame, k: int, probe_id_col: str, id_col: str
) -> DataFrame:
    """Two-level top-k: a window partitioned by ONLY the probe id would
    co-locate every scored corpus row of a probe in one partition — with a
    handful of probes that serializes the corpus through a few tasks. Level
    1 ranks within (probe, physical-partition-id) groups, which spread
    evenly across the cluster and cut the survivors to k per input
    partition; the level-2 merge then ranks ≤ k×P rows per probe — a
    k-row-per-partition merge, not a corpus sort."""
    w_local = Window.partitionBy(probe_id_col, "__pid").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    local = (
        sims.withColumn("__pid", F.spark_partition_id())
        .withColumn("__local_rank", F.row_number().over(w_local))
        .filter(F.col("__local_rank") <= k)
        .drop("__pid", "__local_rank")
    )
    w = Window.partitionBy(probe_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col)
    )
    return local.withColumn("sim_rank", F.row_number().over(w)).filter(
        F.col("sim_rank") <= k
    )


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "pvec",
) -> DataFrame:
    """Exact top-k per probe: (probe_id, vec_id, cosine_sim, sim_rank)."""
    sims = corpus.crossJoin(F.broadcast(probes)).select(
        F.col(probe_id_col),
        F.col(id_col),
        cosine_batch(
            to_double(F.col(vec_col)), to_double(F.col(probe_vec_col))
        ).alias("cosine_sim"),
    )
    return _topk_per_probe(sims, k, probe_id_col, id_col)


def exact_rerank(
    corpus: DataFrame,
    candidates: DataFrame,
    probes: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "pvec",
) -> DataFrame:
    """Stage 2 of two-stage ANN (the FAISS ``refine`` pattern): re-score
    candidate (probe, id) pairs — from ANY stage 1: an ADC shortlist, LSH
    buckets, IVF probed lists — with FULL-precision cosine and keep the
    top-k. Only candidate ids travel back to the float corpus (an
    equi-join fetch on the id), so the exact scorer touches |candidates|
    vectors per probe, never the corpus: the exact-compute budget is the
    shortlist size, independent of corpus scale. Output schema matches
    ``brute_force_topk``: (probe_id, vec_id, cosine_sim, sim_rank)."""
    cand = candidates.select(probe_id_col, id_col).dropDuplicates(
        [probe_id_col, id_col]
    )
    fetched = cand.join(corpus.select(id_col, vec_col), id_col)
    sims = fetched.join(F.broadcast(probes), on=probe_id_col).select(
        F.col(probe_id_col),
        F.col(id_col),
        cosine_batch(
            to_double(F.col(vec_col)), to_double(F.col(probe_vec_col))
        ).alias("cosine_sim"),
    )
    return _topk_per_probe(sims, k, probe_id_col, id_col)


def _multiprobe_buckets(
    bucket: Column, num_planes: int, multiprobe: int, radius: int = 1
) -> Column:
    """Array of bucket ids to search: own bucket + all Hamming-1 flips of
    the first ``multiprobe`` planes, and (radius=2) pairwise flips too.
    Standard multiprobe LSH recall booster — radius trades searched corpus
    fraction for recall."""
    m = min(multiprobe, num_planes)
    masks = [0] + [1 << i for i in range(m)]
    if radius >= 2:
        masks += [(1 << i) | (1 << j) for i in range(m) for j in range(i + 1, m)]
    return F.array(*[bucket.bitwiseXOR(F.lit(mask).cast("long")) for mask in masks])


def lsh_ann_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    multiprobe: int = 4,
    radius: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "pvec",
) -> DataFrame:
    """Approximate top-k per probe via hyperplane-LSH bucket join.

    corpus side: one bucket per vector (partitionable, precomputable);
    probe side: own bucket + Hamming-1 neighbors. The join replaces the
    crossJoin — at 1000 executors the corpus bucketing is a one-time
    pass and each probe touches ~(1+multiprobe)/2^planes of the corpus.
    """
    dim = len(
        corpus.select(vec_col).first()[0]
    )  # schema probe only (1 row), not a data collect
    planes = _planes(dim, num_planes, seed)
    cvec = to_double(F.col(vec_col))
    c = corpus.select(
        F.col(id_col), F.col(vec_col), _bucket_expr(cvec, planes).alias("bucket")
    )
    pvec = to_double(F.col(probe_vec_col))
    p = probes.select(
        F.col(probe_id_col),
        F.col(probe_vec_col),
        F.explode(
            _multiprobe_buckets(
                _bucket_expr(pvec, planes), num_planes, multiprobe, radius
            )
        ).alias("bucket"),
    )
    sims = c.join(F.broadcast(p), on="bucket").select(
        F.col(probe_id_col),
        F.col(id_col),
        cosine_batch(
            to_double(F.col(vec_col)), to_double(F.col(probe_vec_col))
        ).alias("cosine_sim"),
    )
    return _topk_per_probe(
        sims.dropDuplicates([probe_id_col, id_col]), k, probe_id_col, id_col
    )


def near_dup_embeddings(
    corpus: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine ≥ threshold)
    within shared LSH buckets — the embedding twin of MinHash dedup."""
    dim = len(corpus.select(vec_col).first()[0])
    planes = _planes(dim, num_planes, seed)
    vec = to_double(F.col(vec_col))
    c = corpus.select(
        F.col(id_col), F.col(vec_col), _bucket_expr(vec, planes).alias("bucket")
    )
    a = c.select(
        F.col("bucket"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
    )
    b = c.select(
        F.col("bucket"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
    )
    sim = cosine_batch(to_double(F.col("va")), to_double(F.col("vb")))
    return (
        a.join(b, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(sim, 4).alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
        .distinct()
    )

"""MinHash + LSH near-duplicate detection (SURVEY.md §2.6 X4).

Pipeline (shingle → minhash → band → bucket-join), entirely with JVM-side
higher-order functions — no pyspark.ml Vector conversion, no Python UDFs:

1. signature: each shingle is hashed ONCE — multi-arg ``xxhash64`` over
   its n tokens, no gram string ever built (see ``shingle_hashes``) — then
   the ``num_perm`` permutations are universal hashes over that integer:
   ``(a_i * h + b_i) mod p`` with p = 2^31-1 and seeded random a/b — one
   hash + num_perm integer mul/adds per shingle instead of num_perm
   string hashes (the classic MinHash permutation family; ~3x cheaper at
   32 perms, same collision statistics). Constants stay < 2^31 so the
   products fit in a signed 64-bit long — no ANSI overflow.
2. banding: split the p-length signature into b bands of r rows
   (p = b*r); band key = xxhash64 over the band slice.
3. candidates: explode bands → self-join on (band_idx, band_hash) →
   distinct (a < b) pairs. This is the LSH prune: instead of the O(n²)
   crossJoin, only docs sharing a band bucket meet.
4. verify: exact shingle-set Jaccard on candidates only.

Scale posture: the band join shuffles on (band_idx, band_hash); a
degenerate hot bucket (e.g. empty-ish docs sharing one shingle) would skew
— ``max_bucket_size`` drops pathological buckets, the standard guard in
web-scale dedup. Probability a pair with Jaccard j collides:
1-(1-j^r)^b (with defaults r=4, b=8: j=0.8 → 0.97, j=0.3 → 0.063).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

DEFAULT_BANDS = 8
DEFAULT_ROWS = 4

#: Mersenne prime 2^31-1: permutation constants and hashed values stay
#: below 2^31, so a*h+b < 2^62 — safe under ANSI-mode overflow checking.
_PRIME = 2_147_483_647
_PERM_SEED = 0x5EED


def _perm_constants(num_perm: int) -> list[tuple[int, int]]:
    """Seeded (a, b) pairs for the universal-hash permutation family —
    deterministic across sessions/executors."""
    import random

    rng = random.Random(_PERM_SEED)
    return [
        (rng.randrange(1, _PRIME), rng.randrange(0, _PRIME))
        for _ in range(num_perm)
    ]


def _perm_hash(h: Column, a: int, b: int) -> Column:
    """(a * h + b) mod p over an already-reduced h in [0, p)."""
    return F.pmod(F.lit(a) * h + F.lit(b), F.lit(_PRIME))


def minhash_signature(
    text: Column, num_perm: int = DEFAULT_BANDS * DEFAULT_ROWS, n: int = 3
) -> Column:
    """array<bigint> MinHash signature of the text's shingle set — the
    column-expression form (nested higher-order functions). Correct and
    value-identical to ``signatures`` (same multi-arg token hashing,
    test-asserted), but nested HOF lambdas evaluate interpreted; for
    corpus-scale signature computation use ``signatures`` (explode + flat
    codegen aggregates)."""
    toks = tokens(F.lower(text))
    upper = F.array_size(toks) - n
    idx = F.when(upper >= 0, F.sequence(F.lit(0), upper)).otherwise(
        F.array().cast("array<int>")
    )
    sh = F.transform(
        idx,
        lambda i: F.pmod(
            F.xxhash64(*[F.element_at(toks, i + j + 1) for j in range(n)]),
            F.lit(_PRIME),
        ),
    )
    consts = _perm_constants(num_perm)
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda h: _perm_hash(h, a, b)))
            for a, b in consts
        ]
    )


def shingle_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    prime_mod: bool = True,
) -> DataFrame:
    """(id, h) stream of per-shingle hashes in [0, p) — the shared first
    stage of the MinHash pipeline, with NO shingle strings materialized:
    the n tokens of each gram are hashed directly with multi-arg
    ``xxhash64(tok_i, …, tok_{i+n-1})``. Building concat-string grams goes
    through an interpreted higher-order ``transform`` (CodegenFallback) and
    allocates ~20 bytes × corpus-grams (150M grams at our sf10); this path
    is whole-stage-codegen end to end — explode over an int sequence plus
    n ``element_at`` lookups (bounds-safe under ANSI: i ≤ size-n by
    construction). Multiset, not set: min() consumers are insensitive to
    duplicates, set consumers (Jaccard) collect_set downstream.
    The input is repartitioned first so hash computation parallelizes even
    from a single input file / row group."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    toks = tokens(F.lower(F.col(text_col)))
    upper = F.array_size(F.col("__toks")) - n
    _h = F.xxhash64(
        *[F.element_at(F.col("__toks"), F.col("__i") + j + 1) for j in range(n)]
    )
    return (
        df.repartition(parallelism, F.col(id_col))
        .select(F.col(id_col), toks.alias("__toks"))
        .select(
            F.col(id_col),
            F.col("__toks"),
            F.explode(
                F.when(upper >= 0, F.sequence(F.lit(0), upper)).otherwise(
                    F.array().cast("array<int>")
                )
            ).alias("__i"),
        )
        .select(
            F.col(id_col),
            # prime_mod folds into [0, p) for the universal-hash permutation
            # family; prime_mod=False keeps the full 64-bit hash (2^-64
            # collision odds) for consumers that compare distinct-gram
            # COUNTS against a string-gram oracle (repetition_stats,
            # decontaminate).
            (
                F.pmod(_h, F.lit(_PRIME)) if prime_mod else _h
            ).alias("h"),
        )
    )


def signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = DEFAULT_BANDS * DEFAULT_ROWS,
    n: int = 3,
) -> DataFrame:
    """(id, sig array<bigint>) for the corpus — the scale path.

    shingle-hash stream → num_perm flat ``min((a_i*h+b_i) mod p)``
    aggregates: every hash stays inside whole-stage codegen and the partial
    min happens map-side (the repartition in ``shingle_hashes`` already
    clusters by id, so the aggregation needs no further exchange), so the
    shuffle carries one num_perm-wide row per document."""
    ex = shingle_hashes(df, text_col, id_col, n)
    aggs = [
        F.min(_perm_hash(F.col("h"), a, b)).alias(f"m{i}")
        for i, (a, b) in enumerate(_perm_constants(num_perm))
    ]
    sig = ex.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col), F.array(*[f"m{i}" for i in range(num_perm)]).alias("sig")
    )


def _banded(df: DataFrame, id_col: str, sig_col: str, bands: int, rows: int) -> DataFrame:
    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    return (
        df.select(
            id_col,
            F.explode(
                F.transform(
                    band_idx,
                    # xxhash64 hashes the array slice natively — no
                    # string materialization per band
                    lambda b: F.struct(
                        b.alias("band_idx"),
                        F.xxhash64(
                            F.slice(F.col(sig_col), b * rows + 1, rows)
                        ).alias("band_hash"),
                    ),
                )
            ).alias("band"),
        )
        .select(id_col, "band.band_idx", "band.band_hash")
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = DEFAULT_BANDS,
    rows: int = DEFAULT_ROWS,
    n: int = 3,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Distinct candidate id pairs (id_a < id_b) sharing ≥1 LSH band."""
    sig = signatures(df, text_col, id_col, bands * rows, n)
    banded = _banded(sig, id_col, "sig", bands, rows)
    # guard against degenerate hot buckets (skew at scale)
    bucket_sizes = banded.groupBy("band_idx", "band_hash").count()
    banded = banded.join(
        bucket_sizes.filter(F.col("count") <= max_bucket_size).drop("count"),
        on=["band_idx", "band_hash"],
    )
    a = banded.select(
        F.col("band_idx"), F.col("band_hash"), F.col(id_col).alias("id_a")
    )
    b = banded.select(
        F.col("band_idx"), F.col("band_hash"), F.col(id_col).alias("id_b")
    )
    return (
        a.join(b, on=["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    bands: int = DEFAULT_BANDS,
    rows: int = DEFAULT_ROWS,
    n: int = 3,
) -> DataFrame:
    """Candidates verified by exact shingle-set Jaccard ≥ threshold.
    Output: (id_a, id_b, jaccard). Only candidate pairs pay the exact
    verification; everything else was pruned by LSH."""
    cands = minhash_candidate_pairs(df, text_col, id_col, bands, rows, n)
    # Exact Jaccard over HASHED shingle sets (collect_set of the same
    # codegen shingle-hash stream the signatures use): identical up to
    # 64-bit hash collisions (~1e-10 per pair) and ~2.5x cheaper than
    # string-gram arrays — no gram strings built, and the id_b shuffle
    # carries 8-byte longs. Two plan guards, both measured (61 s 2-task
    # stages at sf1 before): the stream repartitions to full parallelism
    # so array building never runs inside the file-split-limited scan
    # stage, and the genuinely-small candidates frame is broadcast
    # explicitly — Spark's own estimate of the gram frame (parquet stats,
    # pre-projection) tempts it to broadcast ~100 MB of built arrays. The
    # id_b join stays a shuffle join for the same reason.
    sh = (
        shingle_hashes(df, text_col, id_col, n)
        .groupBy(id_col)
        .agg(F.collect_set("h").alias("grams"))
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("grams").alias("grams_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("grams").alias("grams_b"))
    joined = a.join(F.broadcast(cands), "id_a").join(
        b.hint("shuffle_hash"), "id_b"
    )
    inter = F.size(F.array_intersect("grams_a", "grams_b"))
    union = F.size("grams_a") + F.size("grams_b") - inter
    jac = inter / F.greatest(union, F.lit(1))
    return (
        joined.select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )

"""MinHash + LSH near-duplicate detection (SURVEY.md §2.6 X4).

Pipeline (shingle → minhash → band → bucket-join), entirely with JVM-side
higher-order functions — no pyspark.ml Vector conversion, no Python UDFs:

1. signature: each shingle is hashed ONCE (``xxhash64``), then the
   ``num_perm`` permutations are universal hashes over that integer:
   ``(a_i * h + b_i) mod p`` with p = 2^31-1 and seeded random a/b — one
   string hash + num_perm integer mul/adds per shingle instead of num_perm
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

from ..functions.text import shingles

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
    column-expression form (nested higher-order functions). Correct, but
    nested HOF lambdas evaluate interpreted; for corpus-scale signature
    computation use ``signatures`` (explode + flat codegen aggregates),
    which computes identical values much faster."""
    sh = F.transform(
        shingles(text, n), lambda s: F.pmod(F.xxhash64(s), F.lit(_PRIME))
    )
    consts = _perm_constants(num_perm)
    return F.array(
        *[
            F.array_min(F.transform(sh, lambda h: _perm_hash(h, a, b)))
            for a, b in consts
        ]
    )


def signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = DEFAULT_BANDS * DEFAULT_ROWS,
    n: int = 3,
) -> DataFrame:
    """(id, sig array<bigint>) for the corpus — the scale path.

    explode(shingles) → one xxhash64 per gram → num_perm flat
    ``min((a_i*h+b_i) mod p)`` aggregates: every hash stays inside
    whole-stage codegen and the partial min happens map-side, so the
    shuffle carries one num_perm-wide row per document.
    The input is repartitioned first so signature computation parallelizes
    even from a single input file."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    ex = (
        df.repartition(parallelism, F.col(id_col))
        .select(F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("gram"))
        .select(
            F.col(id_col),
            F.pmod(F.xxhash64(F.col("gram")), F.lit(_PRIME)).alias("h"),
        )
    )
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
                    lambda b: F.struct(
                        b.alias("band_idx"),
                        F.xxhash64(
                            F.slice(F.col(sig_col), b * rows + 1, rows).cast(
                                "array<string>"
                            ).cast("string")
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
    # Build the shingle arrays at full parallelism: without the repartition
    # the arrays are computed inside the corpus SCAN stage (as few tasks as
    # file splits — measured 2 tasks × 61 s at sf1), and Spark's size
    # estimate of that frame (parquet stats, pre-projection) tempts it to
    # BROADCAST ~100 MB of built arrays. The candidates frame is the
    # genuinely small side (pairs of ids): broadcast it explicitly and keep
    # the second join a shuffle join on id_b (measured: verify 110 s ->
    # ~8 s at sf1, identical output).
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    sh = df.repartition(parallelism, F.col(id_col)).select(
        F.col(id_col), shingles(F.col(text_col), n).alias("grams")
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

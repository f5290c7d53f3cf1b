"""SimHash near-duplicate detection (SURVEY.md §2.6 X4 variant).

64-bit SimHash: each shingle hashes to 64 bits; bit position j of the
document signature is the sign of Σ over shingles of (±1 per shingle bit j).
Near-dups are pairs within Hamming distance k.

Implementation is pure aggregate SQL: explode shingles → one groupBy(doc)
with 64 conditional-sum expressions → pack bits. Candidate pairs via the
pigeonhole trick: split 64 bits into (k+1) bands of 16 bits — any pair with
Hamming ≤ k agrees exactly on ≥1 band — join on band value, verify with
bit_count(xor) ≤ k. Same bucket-join scale shape as MinHash-LSH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles

BITS = 64
BAND_BITS = 16
NUM_BANDS = BITS // BAND_BITS  # 4 bands → exact for Hamming ≤ 3


def simhash_column(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, simhash bigint) — one explode + one hash aggregate. Input is
    repartitioned so the 64 bit-sum aggregates parallelize from a single
    input file (partial aggregation keeps the shuffle at one row per doc)."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    ex = df.repartition(parallelism, F.col(id_col)).select(
        F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("gram")
    ).withColumn("h", F.xxhash64("gram"))

    def bit_mask(j: int) -> int:
        # two's-complement long: bit 63 is the sign bit
        return (1 << j) if j < 63 else -(1 << 63)

    bit_sums = [
        F.sum(
            F.when(
                F.col("h").bitwiseAND(F.lit(bit_mask(j)).cast("long")) != 0, 1
            ).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(BITS)
    ]
    agg = ex.groupBy(id_col).agg(*bit_sums)
    packed = None
    for j in range(BITS):
        bit = F.when(
            F.col(f"b{j}") > 0, F.lit(bit_mask(j)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        packed = bit if packed is None else packed.bitwiseOR(bit)
    return agg.select(F.col(id_col), packed.alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n: int = 3,
) -> DataFrame:
    """Pairs (id_a, id_b, hamming) with Hamming(simhash) ≤ max_hamming.
    Exact for max_hamming ≤ NUM_BANDS-1 by pigeonhole on 16-bit bands."""
    sims = simhash_column(df, text_col, id_col, n)
    mask = (1 << BAND_BITS) - 1
    banded = sims.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned("simhash", i * BAND_BITS)
                        .bitwiseAND(F.lit(mask).cast("long"))
                        .alias("band_val"),
                    )
                    for i in range(NUM_BANDS)
                ]
            )
        ).alias("band"),
    ).select(id_col, "simhash", "band.band_idx", "band.band_val")
    a = banded.select(
        "band_idx", "band_val",
        F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"),
    )
    b = banded.select(
        "band_idx", "band_val",
        F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"),
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, on=["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )

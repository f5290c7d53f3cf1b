"""Perceptual-hash near-duplicate detection for image payloads — the
multimodal sibling of the text MinHash/SimHash family (SURVEY.md §2.6 X4,
applied to X7's media columns).

aHash (average hash): decode → grayscale → block-mean to 8×8 → threshold
at the mean → 64-bit fingerprint. Near-duplicates differ in a few bits, so
candidate generation uses LSH-style BANDING of the 64-bit hash into four
16-bit bands — any identical band puts a pair in the same bucket (exact
for Hamming ≤ 3 by pigeonhole; radius-6 recall pinned by tests) — and the
verifier is ``bit_count(xor)`` on the JVM. The all-pairs crossJoin never
appears; the shape is identical to dedup/minhash.py's band-bucket join.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BANDS = 4
BAND_BITS = 16


def ahash64(pixels: np.ndarray) -> int:
    """64-bit average hash of an (H, W[, C]) uint8 image: grayscale,
    block-mean to 8x8, threshold at the global mean. Bit i (row-major) is
    set when cell i is >= the mean."""
    img = pixels.astype(np.float64)
    if img.ndim == 3:
        img = img.mean(axis=2)
    h, w = img.shape
    bh, bw = max(1, h // 8), max(1, w // 8)
    img = img[: bh * 8, : bw * 8]
    cells = img.reshape(8, bh, 8, bw).mean(axis=(1, 3))
    bits = (cells >= cells.mean()).astype(np.uint64).ravel()
    v = sum(int(b) << i for i, b in enumerate(bits))
    # present as SIGNED 64-bit (Spark LongType): bit 63 wraps negative —
    # band extraction uses shiftrightunsigned, so the bits stay intact
    return v - (1 << 64) if v >= (1 << 63) else v


def image_ahashes(media: DataFrame, fake: bool = False) -> DataFrame:
    """(media_id, ahash) for every decodable image payload — Arrow-batched
    mapInPandas over the binary column; non-image / undecodable rows are
    dropped (the DQ gate counts them upstream)."""
    from .codecs import png_decode
    from .pipeline import _fake_decode

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload, mtype in zip(
                pdf["media_id"], pdf["payload"], pdf["media_type"]
            ):
                if mtype != "image" or payload is None:
                    continue
                try:
                    if fake:
                        px = (
                            (_fake_decode(bytes(payload), dim=64) * 64 + 128)
                            .clip(0, 255)
                            .astype(np.uint8)
                            .reshape(8, 8)
                        )
                    else:
                        px = png_decode(bytes(payload))
                except Exception:  # undecodable payload -> skip (counted upstream)
                    continue
                out.append((int(mid), ahash64(px)))
            yield pd.DataFrame(out, columns=["media_id", "ahash"])

    return media.select("media_id", "payload", "media_type").mapInPandas(
        hash_batches, "media_id long, ahash long"
    )


def phash_neardup_pairs(
    hashes: DataFrame, max_hamming: int = 6, max_bucket_size: int = 1000
) -> DataFrame:
    """Near-dup image pairs via banded bucket join + Hamming verify.

    Candidates: explode each 64-bit hash into (band_idx, band_value)
    rows, equi-join on the band — only same-bucket pairs materialize
    (pigeonhole: any pair with Hamming < N_BANDS shares >= 1 band; up to
    radius 6 recall is high and pinned by tests). Verify: JVM
    ``bit_count(a XOR b)``. Dedup of multi-band collisions is a distinct
    on the (lo, hi) pair.

    ``max_bucket_size`` is the same hot-bucket guard as
    dedup/minhash.py:197 — a corpus with a boilerplate image repeated N
    times puts all N in one band bucket and the pair join goes O(N²);
    oversized buckets are dropped (their members are exact-dup territory:
    route them through hash-groupBy dedup instead of pairwise)."""
    bands = hashes.select(
        "media_id",
        "ahash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.shiftrightunsigned(F.col("ahash"), i * BAND_BITS)
                        .bitwiseAND(F.lit((1 << BAND_BITS) - 1))
                        .alias("band_val"),
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("b"),
    ).select("media_id", "ahash", "b.band_idx", "b.band_val")
    # hot-bucket guard (same shape as dedup/minhash.py): let Catalyst pick
    # the join strategy — the sizes frame is |buckets|-sized, not small
    sizes = bands.groupBy("band_idx", "band_val").count()
    bands = bands.join(
        sizes.filter(F.col("count") <= max_bucket_size).drop("count"),
        ["band_idx", "band_val"],
    )
    left = bands.select(
        F.col("media_id").alias("id_a"),
        F.col("ahash").alias("hash_a"),
        "band_idx",
        "band_val",
    )
    right = bands.select(
        F.col("media_id").alias("id_b"),
        F.col("ahash").alias("hash_b"),
        "band_idx",
        "band_val",
    )
    pairs = (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "hash_a", "hash_b")
        .distinct()
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.bit_count(
            F.col("hash_a").bitwiseXOR(F.col("hash_b"))
        ).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def attach_image_payloads(docs: DataFrame) -> DataFrame:
    """Full-entropy deterministic image twin of the documents table: a
    16×16 grayscale PNG per doc from a CHAINED sha256 stream (256
    independent bytes). The tiled-digest payloads in
    ``pipeline.attach_real_payloads`` repeat every 2 pixel rows, which
    collapses aHash to 8 bits of entropy and manufactures fake near-dup
    pairs — these chained payloads collide only for identical content."""
    import hashlib

    from .codecs import png_encode

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                block = hashlib.sha256((text or "").encode("utf-8")).digest()
                buf = b""
                while len(buf) < 256:
                    buf += block
                    block = hashlib.sha256(block).digest()
                px = np.frombuffer(buf[:256], dtype=np.uint8).reshape(16, 16)
                rows.append((int(doc_id), png_encode(px), "image"))
            yield pd.DataFrame(rows, columns=["media_id", "payload", "media_type"])

    # repartition ahead of the encode: the documents file's few scan
    # splits would otherwise bound the PNG-encode parallelism (the same
    # guard as the decode queries / minhash shingle stream)
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    return (
        docs.select("doc_id", "text")
        .repartition(parallelism, "doc_id")
        .mapInPandas(
            encode, "media_id long, payload binary, media_type string"
        )
    )

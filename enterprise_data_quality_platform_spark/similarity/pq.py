"""Product quantization (PQ) — the vector-database workhorse codec this
stack was missing next to scalar int8 (``quantize.py``) and the IVF/LSH
indexes: split each d-dim vector into ``m`` subvectors, k-means each
subspace to ``k`` centroids, store one byte per subvector. A 64-dim
float32 vector (256 B) becomes m=8 bytes — 32×; at 100 TB of embeddings
that is the difference between re-scanning floats and serving from ~3 TB
of codes.

Search is asymmetric (ADC): the float probe builds an (m × k)
lookup table of subspace dot products ONCE, and each corpus vector's
score is m table lookups + a sum — no float reconstruction per pair.

Scale shape (mirrors ivf.py / quantize.py, the established policy):
- codebooks train on a BOUNDED driver-side sample (numpy Lloyd's per
  subspace) and ride to executors inside the UDF closure — kilobytes;
- encoding is one Arrow-batched pandas_udf pass (matrix multiply per
  subspace per batch), output ``array<smallint>`` of length m;
- search broadcasts probes, scores Arrow-batched, and reduces through
  the same two-level top-k as knn.brute_force_topk (no probe serializes
  the corpus through one task);
- recall vs exact cosine is the documented trade, pinned by tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.vectors import to_double
from .knn import _topk_per_probe

__all__ = ["train_pq_codebooks", "pq_encode", "pq_adc_topk"]


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    k: int = 256,
    sample_size: int = 10_000,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Lloyd's k-means per subspace on a bounded sample; returns
    ``(m, k', sub_dim)`` float64 codebooks (k' = min(k, sample size)).
    Vectors are L2-normalized first (cosine regime, matching the rest of
    the similarity stack)."""
    rows = corpus.select(to_double(F.col(vec_col))).limit(sample_size).collect()
    x = np.stack([r[0] for r in rows]).astype(np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    kk = min(k, len(x))
    rng = np.random.default_rng(seed)
    books = np.empty((m, kk, sub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * sub : (j + 1) * sub]
        cent = xs[rng.choice(len(xs), size=kk, replace=False)]
        for _ in range(iters):
            # nearest by Euclidean in the subspace
            d2 = ((xs[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(kk):
                members = xs[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
                else:  # empty cell: reseed from the worst-covered point
                    cent[c] = xs[np.argmax(d2.min(axis=1))]
        books[j] = cent
    return books


def pq_encode(vec: Column, codebooks: np.ndarray) -> Column:
    """``array<smallint>`` of m codebook indices per vector. One
    (batch × sub_dim) @ (sub_dim × k) multiply per subspace per Arrow
    batch; vectors are normalized to match training."""
    books = np.ascontiguousarray(codebooks)
    m, kk, sub = books.shape

    @pandas_udf("array<smallint>")
    def _encode(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy()).astype(np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        codes = np.empty((len(x), m), dtype=np.int16)
        for j in range(m):
            xs = x[:, j * sub : (j + 1) * sub]
            # argmin ||xs - c||² == argmax (xs·c - ||c||²/2)
            scores = xs @ books[j].T - 0.5 * (books[j] ** 2).sum(axis=1)
            codes[:, j] = np.argmax(scores, axis=1).astype(np.int16)
        return pd.Series(list(codes))

    return _encode(vec)


def pq_adc_topk(
    corpus: DataFrame,
    probes: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "pvec",
) -> DataFrame:
    """Asymmetric top-k: float probes vs PQ codes. Each Arrow batch builds
    the probe's (m × k) dot-product lookup table once and scores every
    code row with m gathers + a sum — approximate cosine (both sides
    unit-normalized at train/encode time, so the summed subspace dots
    approximate the full dot product)."""
    books = np.ascontiguousarray(codebooks)
    m, kk, sub = books.shape

    coded = corpus.select(
        F.col(id_col), pq_encode(F.col(vec_col), books).alias("pq_codes")
    )

    @pandas_udf("double")
    def adc_score(codes: pd.Series, pvec: pd.Series) -> pd.Series:
        c = np.stack(codes.to_numpy()).astype(np.int64)  # (b, m)
        p = np.stack(pvec.to_numpy()).astype(np.float64)
        p /= np.maximum(np.linalg.norm(p, axis=1, keepdims=True), 1e-12)
        # per-row LUT gather; batches share probes rarely, so build LUT
        # per distinct probe row group via hashing the probe bytes
        out = np.empty(len(c), dtype=np.float64)
        luts: dict[bytes, np.ndarray] = {}
        for i in range(len(c)):
            key = p[i].tobytes()
            lut = luts.get(key)
            if lut is None:
                lut = np.einsum(
                    "msd,md->ms",
                    books.reshape(m, kk, sub),
                    p[i].reshape(m, sub),
                )
                luts[key] = lut
            out[i] = lut[np.arange(m), c[i]].sum()
        return pd.Series(out)

    sims = coded.crossJoin(F.broadcast(probes)).select(
        F.col(probe_id_col),
        F.col(id_col),
        adc_score(F.col("pq_codes"), F.col(probe_vec_col)).alias("cosine_sim"),
    )
    return _topk_per_probe(sims, k, probe_id_col, id_col)

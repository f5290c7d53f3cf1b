"""Distributed PCA over embedding columns — the dimensionality-reduction /
whitening step of an embedding pipeline (shrink vectors before ANN, or
decorrelate before quantization), as DataFrame ops + one driver-side
eigendecomposition of the d×d covariance (d = embedding dim, tiny).

Scale shape: the ONLY distributed work is accumulating the moment sums
(n, Σx, Σxxᵀ) — ONE mapInPandas pass emits a (1+d+d²)-long partial-sums
array per Arrow chunk, and a single posexplode + groupBy(position)
reduces them element-wise. Corpus size only changes how many partial rows
are summed; driver state is O(d²) regardless of corpus.

Determinism: float sums would make the model depend on partition order,
so values are quantized to integer units (1e-6 of a component); per-chunk
sums are exact int64 (chunks capped so Σq·q can't overflow) and the
cross-chunk reduce runs in DECIMAL(38,0) (the events_user_value_trend
overflow discipline) — the fitted model is bit-identical under any
layout (pinned by test). Eigenvector sign is normalized (largest-|c|
component positive) since eigh's sign is arbitrary.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

#: integer quantization unit for exact moment sums (1e-6 of a component)
_SCALE = 1_000_000

#: rows per exact-int64 partial: |q| ≤ B·_SCALE ⇒ Σ q_i·q_j ≤ rows·(B·1e6)²
#: — at B=100 (hugely conservative for embeddings) 50k rows stay < 2^63.
_CHUNK_ROWS = 50_000


def to_vec(vec: Column) -> Column:
    return vec.cast("array<double>")


def fit_pca(
    corpus: DataFrame, k: int = 8, vec_col: str = "embedding"
) -> dict:
    """Fit a k-component PCA. Returns {mean (d,), components (k, d) rows =
    sign-normalized eigenvectors, explained_variance (k,),
    explained_ratio (k,), n}."""
    from decimal import Decimal

    # NULL vectors are excluded HERE, before the moment-sum pass — the
    # dimension probe below shares the same frame, so np.stack in the
    # partials can never see a None row.
    vecs = corpus.select(vec_col).filter(F.col(vec_col).isNotNull())
    probe = vecs.first()
    if probe is None:
        raise ValueError(
            "fit_pca: corpus has no non-null embedding vectors"
        )
    d = len(probe[0])

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.stack(pdf.iloc[:, 0].to_numpy()).astype(np.float64)
            for lo in range(0, len(x), _CHUNK_ROWS):
                q = np.rint(x[lo : lo + _CHUNK_ROWS] * _SCALE).astype(
                    np.int64
                )
                vals = np.concatenate(
                    (
                        [np.int64(len(q))],
                        q.sum(axis=0),
                        (q.T @ q).reshape(-1),
                    )
                )
                yield pd.DataFrame(
                    {"vals": [[Decimal(int(v)) for v in vals]]}
                )

    partials = vecs.select(to_vec(F.col(vec_col))).mapInPandas(
        partial, "vals array<decimal(38,0)>"
    )
    # ONE element-wise exact reduce of the (1+d+d²)-long partial rows
    totals = (
        partials.select(F.posexplode("vals").alias("i", "v"))
        .groupBy("i")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    flat = np.zeros(1 + d + d * d)
    for r in totals:
        flat[r["i"]] = float(r["v"])
    n = int(flat[0])
    mean = flat[1 : 1 + d] / _SCALE / n
    second = flat[1 + d :].reshape(d, d) / (_SCALE * _SCALE) / n
    cov = second - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    for row in comps:  # sign normalization
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1
    var = np.maximum(evals[order], 0.0)
    total_var = max(float(np.trace(cov)), 1e-300)
    return {
        "mean": mean,
        "components": comps,
        "explained_variance": var,
        "explained_ratio": var / total_var,
        "n": n,
    }


def project_pca(
    df: DataFrame, model: dict, vec_col: str = "embedding", out_col: str = "pca"
) -> DataFrame:
    """Project vectors onto the fitted components (Arrow-batched matrix
    multiply; the O(k·d) model rides in the UDF closure — the
    broadcast-small-side of this design)."""
    mean = np.asarray(model["mean"], dtype=np.float64)
    comps = np.asarray(model["components"], dtype=np.float64)

    @pandas_udf("array<float>")
    def _proj(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy()).astype(np.float64) - mean
        y = x @ comps.T
        return pd.Series([row.astype(np.float32) for row in y])

    return df.withColumn(out_col, _proj(to_vec(F.col(vec_col))))

"""Scalar (per-dimension affine) int8 embedding quantization.

The storage/bandwidth half of an ANN stack: a 64-dim float32 vector is
256 bytes; its int8 codes are 64 — a 4× shrink that turns a 100 TB
embedding corpus into 25 TB before any index is built. Codes feed the
IVF/LSH index build (``similarity/ivf.py``) or ship to serving.

Design for parity and scale:

- **Every arithmetic step is IEEE-exact-rounded** (float→double widening,
  subtraction, one multiply, one division, ``floor``), so codes are
  bit-identical across engines — the DuckDB oracle reproduces them from
  the same parquet bytes (queries/embeddings.py ``embed_quantize_int8``).
  No transcendental functions, no accumulation-order-dependent floats.
- **One shuffle** computes per-dimension min/max (groupBy ``dim`` after
  ``posexplode``, map-side combined); the resulting stats frame is
  n_dims rows — genuinely constant-sized, so the join back is an explicit
  ``broadcast`` (the class AQE cannot discover only when stats sit behind
  a fresh aggregate; the hint is measured policy, see PERF.md).
- Re-assembly into ``array<smallint>`` codes is a second groupBy on the
  vector id — unavoidable if the caller wants vectors back; stats-only
  consumers (calibration reports) stop at ``quantize_codes`` and skip it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import to_double

__all__ = [
    "dim_stats",
    "quantize_codes",
    "quantize_vectors",
    "quantize_vectors_expr",
    "dequantize_expr",
    "quantized_knn_topk",
]


def _exploded(emb: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """(id, dim, v) rows; dim is 1-based; values widened float→double
    (exact) so all downstream arithmetic is double-precision on both
    engines."""
    return emb.select(
        F.col(id_col),
        F.posexplode(vec_col).alias("dim0", "val"),
    ).select(
        F.col(id_col),
        (F.col("dim0") + 1).alias("dim"),
        F.col("val").cast("double").alias("v"),
    )


def dim_stats(emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Per-dimension (dim, mn, mx) calibration frame — one map-combined
    shuffle keyed by dim. Constant dims with mx == mn are dropped (they
    carry no information and would divide by zero in the scale)."""
    return (
        _exploded(emb, vec_col, id_col)
        .groupBy("dim")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .filter(F.col("mx") > F.col("mn"))
    )


def quantize_codes(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    stats: DataFrame | None = None,
) -> DataFrame:
    """(id, dim, v, mn, mx, code) rows with code = clamp(floor(
    (v - mn) * (255.0 / (mx - mn))), 0, 255). Pass a precomputed
    ``stats`` frame to quantize a stream/new shard against a frozen
    calibration (the production pattern: calibrate once, apply many)."""
    if stats is None:
        stats = dim_stats(emb, vec_col, id_col)
    ex = _exploded(emb, vec_col, id_col)
    scale = F.lit(255.0) / (F.col("mx") - F.col("mn"))
    raw = F.floor((F.col("v") - F.col("mn")) * scale)
    return ex.join(F.broadcast(stats), "dim").withColumn(
        "code", F.least(F.lit(255), F.greatest(F.lit(0), raw))
    )


def quantize_vectors(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    stats: DataFrame | None = None,
) -> DataFrame:
    """(id, codes array<smallint>) — codes re-assembled in dimension order
    via sort_array over (dim, code) structs (no window, no Python)."""
    codes = quantize_codes(emb, vec_col, id_col, stats)
    return (
        codes.groupBy(id_col)
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("dim"), F.col("code")))
                ),
                lambda s: s["code"].cast("smallint"),
            ).alias("codes")
        )
    )


def dequantize_expr(code, mn, mx):
    """Reconstruction expression: mn + code * ((mx - mn) / 255.0).
    Max absolute error is one quantization step, (mx - mn) / 255."""
    return mn + code * ((mx - mn) / F.lit(255.0))


def quantize_vectors_expr(
    emb: DataFrame,
    srows,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, codes) via a pure ARRAY EXPRESSION against driver-held
    calibration rows — the shuffle-free twin of ``quantize_vectors`` for
    callers that already collected ``dim_stats`` (r11, guide §2.4).

    ``quantize_vectors`` re-assembles codes through posexplode →
    broadcast-join(stats) → groupBy(id)+sort_array: a full corpus shuffle
    of n_dims× exploded rows, paid only to get per-dim mn/mx next to each
    component. When the caller holds the stats on the driver anyway (the
    ADC search path collects them for the scoring UDF closure), the same
    codes fall out of one codegen `transform` over literal mn/scale
    arrays — zero exchanges, zero extra scans. The arithmetic is the SAME
    expression tree as ``quantize_codes`` (floor((v - mn) * (255.0 /
    (mx - mn))), clamped), so codes are bit-identical — pinned by
    tests/test_corpus_ops.py::test_quantize_vectors_expr_matches_join_path.

    ``srows`` must be ``dim_stats(...).orderBy("dim").collect()`` —
    constant dims already dropped, so ``codes`` skips them exactly like
    the join path (whose stats join drops those exploded rows). Fixed
    contract: vectors index 1..max(dim); a component missing from a
    ragged vector yields a NULL code (``F.get``) rather than the join
    path's silently shorter array — both are out of the fixed-width
    contract."""
    vecd = to_double(F.col(vec_col))
    idx = F.array(*[F.lit(int(r["dim"])) for r in srows])
    mns = F.array(*[F.lit(float(r["mn"])) for r in srows])
    mxs = F.array(*[F.lit(float(r["mx"])) for r in srows])
    one = F.lit(1)

    def _code(d, i):
        mn = F.element_at(mns, i + one)
        mx = F.element_at(mxs, i + one)
        raw = F.floor((F.get(vecd, d - one) - mn) * (F.lit(255.0) / (mx - mn)))
        return (
            F.least(F.lit(255), F.greatest(F.lit(0), raw)).cast("smallint")
        )

    return emb.select(
        F.col(id_col), F.transform(idx, _code).alias("codes")
    )


def quantized_knn_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "pvec",
) -> DataFrame:
    """Asymmetric (ADC) top-k: full-precision probes scored against the
    int8-coded corpus — the search half of a product/scalar-quantization
    index. The corpus crosses the wire as codes (4× smaller than float32);
    each Arrow batch dequantizes in-core with the driver-held calibration
    (two bounded n_dims arrays closed over by the UDF) and scores with one
    einsum. Ranking quality vs exact cosine is a recall test
    (tests/test_corpus_ops.py), the standard trade of quantized search.

    Plan shape mirrors ``knn.brute_force_topk``: broadcast probes, Arrow
    pandas_udf scoring (plan-asserted ArrowEvalPython class), then the
    two-level top-k so no probe serializes the corpus through one task.
    """
    from pyspark.sql.functions import pandas_udf

    from .knn import _topk_per_probe

    stats = dim_stats(corpus, vec_col, id_col)
    srows = stats.orderBy("dim").collect()  # n_dims rows — bounded driver state
    mn = np.array([r["mn"] for r in srows], dtype=np.float64)
    step = np.array([(r["mx"] - r["mn"]) / 255.0 for r in srows], dtype=np.float64)

    @pandas_udf("double")
    def adc_cosine(codes: pd.Series, pvec: pd.Series) -> pd.Series:
        c = np.stack(codes.to_numpy()).astype(np.float64)
        x = mn + c * step
        p = np.stack(pvec.to_numpy()).astype(np.float64)
        num = np.einsum("bd,bd->b", x, p)
        den = np.linalg.norm(x, axis=1) * np.linalg.norm(p, axis=1)
        return pd.Series(np.where(den > 0, num / den, 0.0))

    # r11 (guide §2.4): codes from the shuffle-free expression twin — the
    # stats are already on the driver for the UDF closure, so the
    # posexplode → join → regroup pass of quantize_vectors is pure
    # overhead here (A/B + bit-equality in OPTIMIZATION_r11.md).
    coded = quantize_vectors_expr(corpus, srows, vec_col, id_col)
    sims = coded.crossJoin(F.broadcast(probes)).select(
        F.col(probe_id_col),
        F.col(id_col),
        adc_cosine(F.col("codes"), F.col(probe_vec_col)).alias("cosine_sim"),
    )
    return _topk_per_probe(sims, k, probe_id_col, id_col)


def quantized_rerank_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    shortlist: int = 50,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_id_col: str = "probe_id",
    probe_vec_col: str = "pvec",
) -> DataFrame:
    """Two-stage search (ANN exact-rerank tier, VERDICT r1/r5 open item):
    stage 1 shortlists ``shortlist`` candidates per probe with the cheap
    ADC scan over int8 codes (corpus moves at 1/4 the bytes of float32);
    stage 2 (`knn.exact_rerank`) re-scores ONLY the shortlist with
    full-precision cosine and cuts to top-k. The exact-compute budget per
    probe is fixed at ``shortlist`` vectors regardless of corpus size;
    recall vs full brute force is ≥0.95 on the synthetic corpus at
    shortlist=5k (pinned in tests/test_corpus_ops.py) because stage-1
    coverage is complete — quantization error only perturbs ranks near
    the shortlist boundary, which the margin absorbs."""
    from .knn import exact_rerank

    cands = quantized_knn_topk(
        corpus,
        probes,
        k=shortlist,
        vec_col=vec_col,
        id_col=id_col,
        probe_id_col=probe_id_col,
        probe_vec_col=probe_vec_col,
    )
    return exact_rerank(
        corpus,
        cands,
        probes,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        probe_id_col=probe_id_col,
        probe_vec_col=probe_vec_col,
    )

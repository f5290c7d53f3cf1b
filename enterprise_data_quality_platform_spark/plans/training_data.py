"""Training-data curation pipeline (SURVEY.md §2.6 north star).

The composition the extension operators exist for: take a raw document
corpus and produce a deduplicated, quality-filtered, language-tagged,
token-budgeted training set — the standard LLM-corpus curation funnel, each
stage a first-class engine operator:

    raw documents
      → exact dedup            (normalized-fingerprint, deterministic winner)
      → near-dup removal       (MinHash-LSH verified pairs → connected
                                components → keep min-id per cluster)
      → quality filter         (length/punct/stopword composite ≥ threshold)
      → language ID            (marker-vote heuristic; keep allowed langs)
      → token accounting       (whitespace tokenizer; corpus budget stats)

Every stage is a DataFrame→DataFrame function; at 100TB the only shuffles
are the fingerprint groupBy and the MinHash band join — the quality/lang
stages are narrow (scan-fused)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup import fingerprint_dedup, keep_one_per_cluster, minhash_near_dup_pairs
from ..functions import text as TX


def curate_documents(
    docs: DataFrame,
    quality_threshold: float = 0.05,
    allowed_langs: tuple[str, ...] | None = None,
    near_dup_threshold: float = 0.7,
    with_near_dup: bool = True,
) -> DataFrame:
    """Full curation funnel; returns the curated frame with per-doc
    quality/lang/token columns attached (so downstream sampling can weight
    on them without recomputing)."""
    # 1. exact dedup (content fingerprint, lowest-id winner)
    deduped = fingerprint_dedup(docs)

    # 2. near-dup removal: resolve pair graph to clusters, keep the
    # canonical (min-id) member of each — per-pair dropping of id_b would
    # keep multiple members of a chained cluster (A~C, B~C drops only C)
    if with_near_dup:
        pairs = minhash_near_dup_pairs(deduped, threshold=near_dup_threshold)
        deduped = keep_one_per_cluster(deduped, pairs)

    # 3-5. narrow annotate + filter (single scan)
    t = F.col("text")
    annotated = deduped.withColumns(
        {
            "quality_score": TX.quality_score(t),
            "pred_lang": TX.lang_id(t),
            "n_tokens": TX.token_count(t).cast("bigint"),
        }
    )
    curated = annotated.filter(F.col("quality_score") >= quality_threshold)
    if allowed_langs is not None:
        curated = curated.filter(F.col("pred_lang").isin(list(allowed_langs)))
    return curated


def corpus_stats(curated: DataFrame) -> DataFrame:
    """Budget report: docs/tokens/quality per predicted language."""
    from ..functions.numeric import fx_avg

    return (
        curated.groupBy("pred_lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            fx_avg(F.col("quality_score"), "avg_quality"),
        )
        .orderBy("pred_lang")
    )


# ---------------------------------------------------------------------------
# Corpus → training-set mechanics: deterministic splits, benchmark
# decontamination, sequence packing, repetition signals. Each is a
# DataFrame→DataFrame operator; the queries/ twins carry DuckDB oracles.
# ---------------------------------------------------------------------------

# Knuth multiplicative hash: engine-portable (plain BIGINT arithmetic, no
# engine hash builtin), deterministic, and uncorrelated with doc_id order.
# doc_id < ~2^32 keeps the product < 2^62 (ANSI-safe, no overflow throw).
_SPLIT_HASH = 2654435761


def assign_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic hash-based train/val/test split — a narrow (shuffle-
    free) projection, so it composes with any downstream partitioning at
    100 TB. The same row lands in the same split on any cluster layout,
    which is what makes held-out sets reproducible."""
    bucket = (F.col(id_col) * F.lit(_SPLIT_HASH)) % F.lit(1000)
    return docs.withColumn(
        "split",
        F.when(bucket < train_pct * 10, F.lit("train"))
        .when(bucket < (train_pct + val_pct) * 10, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def word_ngrams(text: Column, n: int = 8) -> Column:
    """Array of word n-grams (literal strings) from whitespace-tokenized,
    lowercased text. Oracle-portable form — the hot dedup path hashes
    token windows directly (``dedup/minhash.py``) instead of building gram
    strings; use this one where cross-engine string parity matters
    (decontamination, repetition)."""
    toks = F.split(F.lower(F.trim(text)), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    # guard: sequence(1, 0) generates DESCENDING [1, 0] (Spark's sequence
    # auto-negates the step), which would slice from index 0 and throw
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    ngram: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing ≥1 word ``ngram``
    with any benchmark doc, with the shared-gram count per doc —
    the standard eval-leakage sweep before training. Grams are compared as
    full-width ``xxhash64`` over the token window (``shingle_hashes`` with
    ``prime_mod=False``) — whole-stage codegen, no gram strings built; at
    2^-64 collision odds the hashed counts equal the string-gram oracle's.
    The benchmark side is tiny by nature (an eval set), so its distinct
    gram hashes BROADCAST; the corpus side explodes hashes and inner-joins
    — no corpus-vs-corpus pairing ever forms. Returns (doc_id,
    shared_grams) for flagged docs."""
    from ..dedup.minhash import shingle_hashes

    bench_grams = (
        shingle_hashes(benchmark, text_col, id_col, n=ngram, prime_mod=False)
        .select("h")
        .distinct()
    )
    corpus_grams = shingle_hashes(
        corpus, text_col, id_col, n=ngram, prime_mod=False
    ).dropDuplicates([id_col, "h"])  # count each shared gram once per doc
    return (
        corpus_grams.join(F.broadcast(bench_grams), on="h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("shared_grams"))
    )


def pack_sequences(
    docs: DataFrame,
    budget: int = 2048,
    num_shards: int = 32,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Concat-and-chunk sequence packing — the standard LLM pretraining
    layout: within each shard, document token streams are concatenated (in
    id order) and cut into fixed ``budget``-token training sequences, so
    documents may straddle a sequence boundary. Per doc: the sequence its
    stream position STARTS in (``seq_id``), the offset inside it, and
    whether it straddles into the next one. The prefix-sum window
    partitions by shard, so it parallelizes across ``num_shards`` tasks
    instead of serializing the corpus through one partition. No document
    is ever dropped; chunk count per shard is exactly
    ``ceil(total_tokens / budget)``."""
    from pyspark.sql import Window

    shard = (F.col(id_col) % F.lit(num_shards)).alias("shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = F.col(tokens_col)
    start = F.sum(toks).over(w) - toks  # exclusive prefix sum
    return (
        docs.select(F.col(id_col), F.col(tokens_col), shard)
        .withColumn("seq_id", F.floor(start / F.lit(budget)))
        .withColumn("seq_offset", start % F.lit(budget))
        .withColumn(
            "straddles",
            (toks > 0)
            & (
                F.floor((start + toks - 1) / F.lit(budget))
                != F.col("seq_id")
            ),
        )
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken '03, the
    MOSS algorithm): hash each word ``k``-gram, slide a window of ``w``
    consecutive hashes, keep each window's minimum. Guarantee: any shared
    token run of length >= ``w + k - 1`` between two documents shares at
    least one fingerprint, at a fraction (~2/(w+1)) of the full gram-set
    size — the standard local fingerprinting scheme for plagiarism /
    boilerplate / near-dup detection.

    100 TB posture: explode gram POSITIONS, hash each gram with plain
    expressions (md5 over array_join(slice(...)) — whole-stage codegen),
    then a per-doc window MIN over the next ``w`` rows. The one shuffle
    partitions by doc (each partition is one document's grams — bounded
    and tiny), and the window is codegen'd WindowExec. The tempting
    all-in-row HOF form (``transform`` lambdas for hash + window-min) is
    CodegenFallback — interpreted per element, measured 44 s vs 1.5 s for
    500 docs — the same trap PERF.md documents for MinHash shingles.
    md5 hex (lexicographic order) keeps the min-selection ORACLE-PORTABLE
    (DuckDB md5 produces identical digests); a Spark-only deployment can
    swap xxhash64 longs for cheaper hashing with the identical plan.

    Docs with fewer than ``k + w - 1`` tokens have no full window and are
    omitted (deterministic on both engines). Returns the flat
    (id_col, fp) set — distinct fingerprints per doc, join-ready."""
    from pyspark.sql import Window

    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # repartition by doc FIRST: hashing parallelizes even from one input
    # file, and hashpartitioning(id) satisfies the window's required
    # distribution — one shuffle total for the whole operator.
    base = (
        docs.repartition(parallelism, F.col(id_col))
        .select(F.col(id_col), toks.alias("__t"))
        .where(F.size("__t") >= k + w - 1)
    )
    n_grams = F.size("__t") - (k - 1)
    # gram string via k element_at lookups (codegen) — same bytes as
    # array_to_string(slice(...)) without allocating the slice array
    gram_str = F.concat_ws(
        " ", *[F.element_at(F.col("__t"), F.col("__i") + j) for j in range(k)]
    )
    grams = base.select(
        F.col(id_col),
        n_grams.alias("__n"),
        F.explode(F.sequence(F.lit(1), n_grams)).alias("__i"),
        F.col("__t"),
    ).select(F.col(id_col), F.col("__n"), F.col("__i"), F.md5(gram_str).alias("__h"))
    win = Window.partitionBy(id_col).orderBy("__i").rowsBetween(0, w - 1)
    return (
        grams.select(
            F.col(id_col),
            F.col("__n"),
            F.col("__i"),
            F.min("__h").over(win).alias("fp"),
        )
        .where(F.col("__i") <= F.col("__n") - (w - 1))
        .select(F.col(id_col), "fp")
        .distinct()
    )


def winnow_pairs(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_bucket: int | None = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fingerprint-overlap candidate pairs: explode winnowing fingerprints
    and equi-join on the fingerprint — the same bucket-join shape as
    MinHash-LSH banding (dedup/minhash.py), never an all-pairs comparison.
    ``max_bucket`` drops degenerate boilerplate fingerprints shared by
    more than N docs (the skew guard; a fingerprint in 10k docs would emit
    ~10^8 pairs and says "template", not "copy"). Returns
    (id_a, id_b, shared_fps) with id_a < id_b, shared_fps >= min_shared."""
    flat = winnow_fingerprints(docs, k=k, w=w, id_col=id_col, text_col=text_col)
    if max_bucket is not None:
        ok = (
            flat.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") <= max_bucket)
            .select("fp")
        )
        flat = flat.join(ok, on="fp")
    a = flat.select(F.col(id_col).alias("id_a"), "fp")
    b = flat.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, on="fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )


def repetition_stats(
    docs: DataFrame,
    ngram: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher-style repetition signal: per-doc fraction of repeated word
    n-grams (1 - distinct/total). Grams flow as hashed token windows
    (``shingle_hashes``, full 64-bit — codegen end to end) through a
    two-level groupBy — (doc, gram-hash) counts, then per-doc totals — so
    no count_distinct Expand and no gram strings (the in-row
    ``transform``+``array_join``+``array_distinct`` form is interpreted
    per element: measured 8.8 s vs 0.6 s at sf0.1). Docs shorter than the
    gram width report 0 grams, ratio 0.0."""
    from ..dedup.minhash import shingle_hashes

    grams = shingle_hashes(docs, text_col, id_col, n=ngram, prime_mod=False)
    per = (
        grams.groupBy(id_col, "h")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_grams"),
            F.count(F.lit(1)).alias("distinct_grams"),
        )
    )
    n = F.coalesce(F.col("n_grams"), F.lit(0)).cast("bigint")
    d = F.coalesce(F.col("distinct_grams"), F.lit(0)).cast("bigint")
    return docs.select(F.col(id_col)).join(per, on=id_col, how="left").select(
        F.col(id_col),
        n.alias("n_grams"),
        d.alias("distinct_grams"),
        F.when(n > 0, (n - d) / n).otherwise(F.lit(0.0)).alias("rep_ratio"),
    )


#: Modulus applied to ids before the multiplicative hash so the product
#: stays < 2^51 for ANY 64-bit id (ANSI overflow-safe at 100 TB id ranges,
#: where raw ``id * hash`` would throw past id ~2^32).
_SAMPLE_ID_MOD = 1_000_003


def sample_balanced(
    docs: DataFrame,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    counts: DataFrame | None = None,
) -> DataFrame:
    """Deterministic stratified downsampling to a uniform per-stratum
    budget — the "flatten source skew" step of a training-data mix (e.g.
    cap every crawl/source at the size of the smallest one).

    Each stratum keeps rows where a per-row hash bucket clears a
    per-stratum threshold sized so the expected kept count equals the
    smallest stratum's size. The accept test is pure integer
    cross-multiplication (``bucket * n_stratum < 1000 * n_target``) — no
    float rates, so the decision is bit-identical on any engine and any
    cluster layout, and the same row set is kept on re-runs (reproducible
    mixes, the property that matters for training-data lineage).

    Scale posture: per-stratum counts are one shuffle on ``stratum_col``
    (map-side combined); the counts frame is stratum-cardinality-sized and
    explicitly broadcast; the accept filter is a narrow projection. No
    global sort, no window over raw rows, no second shuffle.
    """
    if counts is None:
        counts = docs.groupBy(stratum_col).agg(
            F.count(F.lit(1)).alias("n_stratum")
        )
    target = counts.agg(F.min("n_stratum").alias("n_target"))
    bucket = ((F.col(id_col) % F.lit(_SAMPLE_ID_MOD)) * F.lit(_SPLIT_HASH)) % F.lit(
        1000
    )
    return (
        docs.join(F.broadcast(counts), stratum_col)
        .crossJoin(F.broadcast(target))
        .filter(bucket * F.col("n_stratum") < F.lit(1000) * F.col("n_target"))
    )


def mixture_sample(
    docs: DataFrame,
    rate_pm: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic mixture sampling with OVERSAMPLING — the per-source
    epoch-weighting step of a training mix (web ×0.3, books ×2.5, …),
    expressed as a per-row rate in PER-MILLE (1000 = exactly one epoch).

    Every row emits ``rate_pm // 1000`` full replicas, plus one more iff
    its hash bucket clears ``rate_pm % 1000`` — so realized counts hit the
    target rate exactly in expectation, and the SAME rows get the extra
    replica on every engine/layout/re-run (the accept test is the
    ``sample_balanced`` multiplicative-hash bucket; pure BIGINT, no
    floats, no RNG state). Output carries a 1-based ``replica`` index for
    shard lineage ("this is copy 3 of doc 17").

    Scale posture: a narrow projection + row-local ``sequence`` explode —
    no shuffle at all; the blow-up per row is the epoch factor, which a
    sane mix bounds by ~30×. Emission order within a partition follows
    input order, so downstream ``pack_sequences`` stays deterministic.
    """
    bucket = ((F.col(id_col) % F.lit(_SAMPLE_ID_MOD)) * F.lit(_SPLIT_HASH)) % F.lit(
        1000
    )
    n_rep = F.floor(rate_pm / F.lit(1000)).cast("long") + F.when(
        bucket < rate_pm % F.lit(1000), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        docs.withColumn("__n_rep", n_rep)
        .filter(F.col("__n_rep") >= 1)
        .withColumn(
            "replica", F.explode(F.sequence(F.lit(1), F.col("__n_rep")))
        )
        .drop("__n_rep")
    )


def chunk_tokens(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token-window chunking — the retrieval/embedding prep
    step (RAG indexing, long-document embedding) between curation and
    vectorization: each document becomes ceil(n/stride) chunks of up to
    ``window`` whitespace tokens, consecutive chunks overlapping by
    ``window - stride`` tokens so no boundary-spanning passage is lost.

    Row-local end to end: split → explode(sequence of starts) → slice —
    no shuffle, no UDF; the chunk blow-up is bounded by tokens/stride per
    row, so the operator streams at scan speed at any scale. Output:
    (id, chunk_id, n_tokens, chunk_text); trailing chunks may be shorter
    than ``window`` (kept — dropping them silently loses document tails).
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(
        F.col(id_col),
        words.alias("_words"),
        F.greatest(F.size(words), F.lit(1)).alias("_n"),
    )
    exploded = base.select(
        id_col,
        "_words",
        "_n",
        F.explode(
            F.sequence(F.lit(1), F.col("_n"), F.lit(stride))
        ).alias("_start"),
    )
    return exploded.select(
        F.col(id_col),
        F.expr(f"CAST((_start - 1) div {stride} AS BIGINT)").alias("chunk_id"),
        F.least(
            F.lit(window), F.col("_n") - F.col("_start") + 1
        ).cast("bigint").alias("n_tokens"),
        F.concat_ws(
            " ", F.slice(F.col("_words"), F.col("_start"), F.lit(window))
        ).alias("chunk_text"),
    )

"""Text-analysis queries over ``documents`` (SURVEY.md §2.6 X1-X2 + the
training-data-pipeline text operators: language-ID, quality scoring, token
counting, fingerprinting).

Every Spark expression here has a byte-equivalent DuckDB twin (same regexes,
same tokenizer, same arithmetic order) so the driver's value-hash comparison
holds exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions import text as TX
from .registry import register


@register(
    "text_lang_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(CAST(SUM(CAST(n_chars AS DECIMAL(18,6))) AS DOUBLE) / COUNT(n_chars), 4) AS avg_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang
    """,
    tables=("documents",),
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: language/source distribution profile."""
    from pyspark.sql import types as T

    c = F.col("n_chars")
    return (
        table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(
                F.sum(c.cast(T.DecimalType(18, 6))).cast("double") / F.count(c), 4
            ).alias("avg_chars"),
            F.min(c).alias("min_chars"),
            F.max(c).alias("max_chars"),
        )
    )


@register(
    "text_token_topk",
    oracle=r"""
    WITH toks AS (
      SELECT UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents
    )
    SELECT token, COUNT(*) AS token_count
    FROM toks
    WHERE token <> ''
    GROUP BY token
    ORDER BY token_count DESC, token
    LIMIT 20
    """,
    tables=("documents",),
)
def text_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: tokenize + explode + count, top-20 with token tiebreak. The
    explode stays JVM-side; the shuffle carries (token, partial count)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(TX.tokens(F.lower(F.col("text")))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("token_count"))
        .orderBy(F.col("token_count").desc(), F.col("token"))
        .limit(20)
    )


@register(
    "text_token_counts",
    oracle=r"""
    SELECT doc_id,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
           length(text) AS n_chars_exact
    FROM documents
    """,
    tables=("documents",),
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per document (whitespace tokenizer) — the unit-economics
    column every training-data pipeline needs."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_exact"),
    )


@register(
    "text_quality_scores",
    oracle=r"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens,
             (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
               * 1.0 / greatest(length(text), 1) AS p_ratio,
             len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                             t -> t IN ('the','and','of','a','to','is','in','that')))
               * 1.0 / greatest(
                   len(string_split_regex(lower(trim(text)), '\s+')), 1) AS s_ratio
      FROM documents
    )
    SELECT doc_id,
           ROUND(p_ratio, 6) AS punct_ratio,
           ROUND(s_ratio, 6) AS stopword_ratio,
           ROUND(least(1.0, n_tokens / 200.0) * (1 - p_ratio) * (1 - s_ratio), 4) AS quality_score
    FROM base
    """,
    tables=("documents",),
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length/punctuation/stopword composite in [0,1]
    (functions.text.quality_score), linear arithmetic only for parity."""
    docs = table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.round(TX.punct_ratio(t), 6).alias("punct_ratio"),
        F.round(TX.stopword_ratio(t), 6).alias("stopword_ratio"),
        TX.quality_score(t).alias("quality_score"),
    )


_MARKER_SQL = {
    lang: ", ".join(f"'{w}'" for w in words)
    for lang, words in TX.LANG_MARKERS.items()
}

@register(
    "text_langid_agg",
    oracle=rf"""
    WITH scored AS (
      SELECT lang,
             length(regexp_replace(text, '[\x00-\x7F]', '', 'g'))
               * 1.0 / greatest(length(text), 1) AS na_ratio,
             len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                             t -> t IN ({_MARKER_SQL['en']}))) AS h_en,
             len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                             t -> t IN ({_MARKER_SQL['es']}))) AS h_es,
             len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                             t -> t IN ({_MARKER_SQL['de']}))) AS h_de,
             len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                             t -> t IN ({_MARKER_SQL['fr']}))) AS h_fr
      FROM documents
    ),
    predicted AS (
      SELECT lang,
             CASE WHEN na_ratio > 0.5 THEN 'cjk'
                  WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'und'
                  WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
                  WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
                  WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
                  ELSE 'fr' END AS predicted_lang
      FROM scored
    )
    SELECT lang, predicted_lang, COUNT(*) AS n_docs
    FROM predicted
    GROUP BY lang, predicted_lang
    """,
    tables=("documents",),
)
def text_langid_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (marker-word vote + CJK char-ratio,
    functions.text.lang_id) cross-tabulated against the labeled lang —
    a confusion-matrix profile of the classifier."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("lang", TX.lang_id(F.col("text")).alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "dedup_exact_docs",
    oracle=r"""
    WITH fp AS (
      SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
      FROM documents
    )
    SELECT COUNT(*) AS total_docs,
           COUNT(DISTINCT fingerprint) AS distinct_docs,
           COUNT(*) - COUNT(DISTINCT fingerprint) AS duplicate_docs
    FROM fp
    """,
    tables=("documents",),
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: exact content dedup via normalized md5 fingerprint
    (functions.text.fingerprint). The dedup itself is
    dropDuplicates(['fingerprint']); this reports its effect size. At scale
    the fingerprint groupBy shuffles only (hash, count) pairs."""
    docs = table(spark, sf_dir, "documents").select(
        TX.fingerprint(F.col("text")).alias("fingerprint")
    )
    return docs.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.count_distinct("fingerprint").alias("distinct_docs"),
        (F.count(F.lit(1)) - F.count_distinct("fingerprint")).alias("duplicate_docs"),
    )


@register(
    "text_tfidf_terms",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM toks WHERE token <> ''
      GROUP BY doc_id, token
    ),
    dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token)
    SELECT t.doc_id, t.token, t.tf, d.df, t.tf / d.df AS score
    FROM tf t JOIN dfreq d USING (token)
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY t.doc_id ORDER BY score DESC, t.token
    ) <= 3
    """,
    tables=("documents",),
)
def text_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document distinctive terms: top-3 by a tf·idf-family score.

    The score is tf/df (term frequency over document frequency) rather
    than tf·ln(N/df): for a fixed corpus N is constant, so the per-doc
    ranking is identical, and a single integer division is IEEE-exact —
    the oracle matches bit-for-bit where ``ln`` would drift in the last
    ulp between libm implementations. The ln variant is a trivial
    post-map (``tf * ln(N / df)``) for consumers who want calibrated
    magnitudes.

    Plan at scale: explode → two-level agg — (doc, token) tf, then token
    df from the tf frame (vocab-sized, no second pass over raw tokens) —
    join back (vocab ≪ corpus; AQE picks broadcast when it fits, per the
    hint policy in PERF.md), then per-doc top-3 via row_number, which
    Spark 4 executes with a partial WindowGroupLimit map-side — no doc's
    full term list crosses the shuffle."""
    docs = table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.explode(TX.tokens(F.lower(F.col("text")))).alias("token"),
        )
        .filter(F.col("token") != "")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # df must DEPEND on tf's value or Catalyst eliminates the inner count
    # from this branch (HashAggregate functions=[]), the two (doc, token)
    # exchanges stop being canonically equal, and the corpus explodes
    # TWICE. tf > 0 is always true (tf is a group count), so this IS
    # count(*) — but the optimizer can't prove it, the subtrees stay
    # identical, and the explode is exchange-reused (plan-asserted).
    dfreq = tf.groupBy("token").agg(
        F.count(F.when(F.col("tf") > 0, 1)).alias("df")
    )
    from pyspark.sql import Window

    scored = tf.join(dfreq, "token").withColumn(
        "score", F.col("tf") / F.col("df")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= 3)
        .select("doc_id", "token", "tf", "df", "score")
    )


@register(
    "text_vocab_coverage",
    oracle=r"""
    WITH toks AS (
      SELECT UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents
    ),
    counts AS (
      SELECT token, COUNT(*) AS token_count
      FROM toks WHERE token <> '' GROUP BY token
    ),
    total AS (SELECT CAST(SUM(token_count) AS BIGINT) AS total_tokens FROM counts),
    top AS (
      SELECT token, token_count FROM counts
      ORDER BY token_count DESC, token LIMIT 100
    )
    SELECT token,
           token_count,
           CAST(ROW_NUMBER() OVER (ORDER BY token_count DESC, token) AS BIGINT) AS token_id,
           CAST(SUM(token_count) OVER (
             ORDER BY token_count DESC, token ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) AS cum_count,
           CAST(SUM(token_count) OVER (
             ORDER BY token_count DESC, token ROWS UNBOUNDED PRECEDING
           ) AS BIGINT) / total_tokens AS coverage
    FROM top, total
    """,
    tables=("documents",),
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary builder with corpus-coverage curve: top-100 tokens get
    contiguous ids (frequency order, token tiebreak) plus the cumulative
    fraction of all token occurrences they cover — the tokenizer-design
    question ("how big a vocab covers 95% of the corpus?") as one query.

    Plan: token counts (one map-combined shuffle) → TakeOrderedAndProject
    top-100 (distributed partial top-k, never a global sort of the vocab)
    → ordered window over just those 100 rows for ids and the running sum.
    The single-partition window is over the *result*, not the data."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(TX.tokens(F.lower(F.col("text")))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("token_count"))
    )
    total = counts.agg(F.sum("token_count").alias("total_tokens"))
    top = counts.orderBy(F.col("token_count").desc(), F.col("token")).limit(100)
    order = [F.col("token_count").desc(), F.col("token")]
    w_rank = Window.orderBy(*order)
    w_cum = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return top.crossJoin(F.broadcast(total)).select(
        "token",
        "token_count",
        F.row_number().over(w_rank).cast("bigint").alias("token_id"),
        F.sum("token_count").over(w_cum).alias("cum_count"),
        (F.sum("token_count").over(w_cum) / F.col("total_tokens")).alias(
            "coverage"
        ),
    )


@register(
    "text_pii_scan",
    oracle=r"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(*) FILTER (WHERE regexp_matches(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS docs_with_email,
           CAST(COUNT(*) FILTER (WHERE regexp_matches(text, '\+?\d[\d\-\s().]{5,}\d')) AS BIGINT) AS docs_with_phone,
           CAST(COUNT(*) FILTER (WHERE regexp_matches(text, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS docs_with_ipv4,
           CAST(COUNT(*) FILTER (WHERE regexp_matches(text, '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS docs_with_ssn
    FROM documents
    GROUP BY source ORDER BY source
    """,
    tables=("documents",),
)
def text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII surface scan — per-source counts of documents containing
    email / phone / IPv4 / SSN-shaped strings, the compliance pre-flight
    every training corpus runs before release (paired with
    ``functions.text.redact_pii`` for the scrub itself; redaction
    semantics are pinned by crafted tests since this corpus is
    deliberately PII-free and the scan reports exact zeros).

    Plan: one scan, four rlike flags fused into a single map-combined
    conditional aggregate — adding a fifth pattern costs zero extra
    passes. Patterns live in the Java-regex ∩ RE2 common subset so the
    DuckDB twin runs the byte-identical pattern. Each backtracking rlike
    sits behind a cheap NECESSARY-condition guard (pure ``contains``
    substring probes — SIMD ``String.indexOf``, no regex, no allocation;
    the shared any-digit probe is projected once per row) — on prose
    corpora the guards prune ~everything and the scan cost collapses to
    a handful of memchr passes per document (measured 19.4× → ~4× vs the
    RE2 twin at sf10)."""
    from ..functions.text import PII_PATTERNS, any_digit

    docs = table(spark, sf_dir, "documents")
    t = F.col("text")
    guarded = docs.select(
        "source", "text", any_digit(t).alias("__has_digit")
    )
    d = F.col("__has_digit")
    flags = {
        "email": F.when(t.contains("@"), t.rlike(PII_PATTERNS["email"])),
        "phone": F.when(d, t.rlike(PII_PATTERNS["phone"])),
        "ipv4": F.when(
            t.contains(".") & d, t.rlike(PII_PATTERNS["ipv4"])
        ),
        "ssn": F.when(
            t.contains("-") & d, t.rlike(PII_PATTERNS["ssn"])
        ),
    }
    return (
        guarded.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[
                F.sum(
                    F.coalesce(flag, F.lit(False)).cast("int")
                ).alias(f"docs_with_{kind}")
                for kind, flag in flags.items()
            ],
        )
        .orderBy("source")
    )


@register(
    "text_pretoken_stats",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS BIGINT) AS n_pretokens,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) END AS n_words,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_number_runs,
           CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]+')) AS BIGINT) AS n_punct_runs
    FROM documents
    """,
    tables=("documents",),
)
def text_pretoken_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-token counts per document alongside whitespace word
    counts — the token-budget estimator a training pipeline bills by
    (digit and punctuation runs tokenize separately, like real subword
    vocabularies; the [pretokens]/[words] ratio flags code/TSV-ish docs
    whose subword cost far exceeds their word count). The oracle stays
    the RE2 ∩ Java-regex class-run pattern; the engine side counts the
    SAME runs without a regex engine at all:
    ``functions.text.pretoken_count_batches`` classifies UTF-8 bytes
    through a 256-entry table and counts class-transition boundaries in
    a few vectorized numpy passes (mapInPandas, Arrow batches) —
    equivalence with the regex form is pinned by tests incl. unicode/
    whitespace edges, and the cost drops 26 s → ~2 s at sf10 (the regex
    materialized every run as a string just to count them). Row-local,
    no shuffle; at 100 TB this is a pure map stage."""
    from ..functions.text import pretoken_count_batches

    docs = table(spark, sf_dir, "documents")
    return docs.select("doc_id", "text").mapInPandas(
        pretoken_count_batches,
        schema=(
            "doc_id long, n_pretokens long, n_words long,"
            " n_number_runs long, n_punct_runs long"
        ),
    )


@register(
    "dedup_cluster_sizes",
    # duplicate-cluster size histograms over TWO keys in one scan: the
    # exact-dedup fingerprint and a 64-char normalized-prefix fingerprint
    # (shared boilerplate openings — the cheap near-dup tier). md5 is
    # engine-portable so both carry a full value oracle.
    oracle=r"""
    WITH norm AS (
      SELECT regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
      FROM documents
    ),
    keys AS (
      SELECT 'exact' AS scope, md5(t) AS f FROM norm
      UNION ALL
      SELECT 'prefix64' AS scope, md5(substr(t, 1, 64)) AS f FROM norm
    ),
    cl AS (
      SELECT scope, f, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM keys GROUP BY scope, f
    )
    SELECT scope, cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
    FROM cl
    GROUP BY scope, cluster_size
    ORDER BY scope, cluster_size
    """,
    tables=("documents",),
)
def dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 companion: duplicate-cluster size histograms — how much of the
    corpus sits in 1-doc, 2-doc, N-doc clusters, under two keys: the exact
    content fingerprint (the dedup_exact_docs key) and a 64-char
    normalized-prefix fingerprint that catches shared boilerplate openings
    the full hash misses. The curation decision (keep one per cluster)
    removes sum(size-1) docs per scope; this shows where that mass lives.

    Plan: one documents scan; the normalized text feeds both keys via an
    inline 2-row explode (constant fan-out, no second scan); then the
    two-level aggregate — groupBy(scope, fingerprint) collapses map-side
    to (hash, count) pairs, and the histogram groupBy runs over |clusters|
    rows. Unlike the xxhash64 MinHash family, md5 is engine-portable, so
    this carries a full value oracle."""
    docs = table(spark, sf_dir, "documents").select(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ").alias("t")
    )
    keyed = docs.select(
        F.explode(
            F.create_map(
                F.lit("exact"), F.md5(F.col("t")),
                F.lit("prefix64"), F.md5(F.substring(F.col("t"), 1, 64)),
            )
        ).alias("scope", "f")
    )
    cl = keyed.groupBy("scope", "f").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cl.groupBy("scope", "cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "scope",
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
        )
        .orderBy("scope", "cluster_size")
    )


@register(
    "text_perplexity_proxy",
    # per-token surprisal is rounded to integer micro-nats AT THE VOCAB
    # LEVEL (one ln per token type — the dq_kl_divergence 6-dp precedent),
    # so every per-doc sum is exact BIGINT arithmetic and distributed
    # order can't perturb the compare; the one float division per doc is
    # the final reported mean.
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents
    ),
    tok AS (SELECT doc_id, token FROM toks WHERE token <> ''),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, token
    ),
    vocab AS (
      SELECT token, SUM(tf) AS n_tok FROM tf GROUP BY token
    ),
    scored AS (
      SELECT token,
             CAST(FLOOR(
               -LN(CAST(n_tok AS DOUBLE)
                   / (SELECT SUM(n_tok) FROM vocab)) * 1000000 + 0.5
             ) AS BIGINT) AS nll_micro
      FROM vocab
    )
    SELECT t.doc_id,
           CAST(SUM(t.tf) AS BIGINT) AS n_toks,
           FLOOR(CAST(SUM(t.tf * s.nll_micro) AS DOUBLE)
                 / SUM(t.tf) / 1000000 * 10000 + 0.5) / 10000.0 AS avg_nll
    FROM tf t JOIN scored s USING (token)
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
    tables=("documents",),
)
def text_perplexity_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity proxy: each document scored by the mean
    negative log-probability of its tokens under the corpus unigram model
    — the classic cheap quality/outlier signal in LLM data curation
    (gibberish and boilerplate both surface as tails; CCNet/Gopher use
    the same shape with a KenLM instead of the corpus itself).

    Plan at scale: explode → (doc, token) tf (map-combined) → vocab from
    the tf frame (never a second raw-token pass) → surprisal computed
    ONCE per token type with the corpus total attached as a broadcast
    1-row factor → join back on token (vocab ≪ corpus; AQE broadcasts
    when it fits) → per-doc exact BIGINT sums. At 100 TB the join key
    would be a hashed long rather than the token string (xxhash64 — same
    plan, narrower shuffle); the declared query keeps strings so the
    oracle can express the identical join."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(TX.tokens(F.lower(F.col("text")))).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    vocab = tf.groupBy("token").agg(F.sum("tf").alias("n_tok"))
    total = vocab.agg(F.sum("n_tok").alias("total"))
    scored = vocab.crossJoin(F.broadcast(total)).select(
        "token",
        F.floor(
            -F.ln(F.col("n_tok").cast("double") / F.col("total")) * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("nll_micro"),
    )
    return (
        tf.join(scored, "token")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_toks"),
            (
                F.floor(
                    F.sum(F.col("tf") * F.col("nll_micro")).cast("double")
                    / F.sum("tf")
                    / 1000000
                    * 10000
                    + F.lit(0.5)
                )
                / 10000.0
            ).alias("avg_nll"),
        )
        # no presentation orderBy: the per-doc score table is |docs|-sized
        # and the driver compares order-insensitively — a global sort here
        # is pure cosmetics (the events_scd2_episodes lesson)
    )


@register(
    "dedup_keep_best_quality",
    oracle=r"""
    WITH scored AS (
      SELECT doc_id,
             md5(substr(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), 1, 64)) AS cluster_fp,
             CAST(FLOOR(ROUND(
               least(1.0, (CASE WHEN length(trim(text)) = 0 THEN 0
                                ELSE len(string_split_regex(trim(text), '\s+')) END) / 200.0)
               * (1 - (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                     * 1.0 / greatest(length(text), 1))
               * (1 - len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                      t -> t IN ('the','and','of','a','to','is','in','that')))
                     * 1.0 / greatest(len(string_split_regex(lower(trim(text)), '\s+')), 1)),
             4) * 10000 + 0.5) AS BIGINT) AS score_e4
      FROM documents
    ),
    clusters AS (
      SELECT cluster_fp,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             MAX(score_e4 * 1000000000000 + (1000000000000 - doc_id)) AS packed
      FROM scored GROUP BY cluster_fp
    )
    SELECT cluster_fp, n_docs,
           CAST(1000000000000 - packed % 1000000000000 AS BIGINT) AS kept_doc_id,
           CAST(packed // 1000000000000 AS BIGINT) AS kept_score_e4
    FROM clusters
    WHERE n_docs >= 2
    ORDER BY n_docs DESC, cluster_fp
    LIMIT 100
    """,
    tables=("documents",),
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-BEST dedup resolution: within each near-dup cluster (64-char
    normalized-prefix fingerprint — the shared-boilerplate tier from
    ``dedup_cluster_sizes``), keep the HIGHEST-quality document rather
    than an arbitrary one — the curation policy real training pipelines
    want ("drop the duplicates, keep the cleanest copy").

    The keep decision is one packed-BIGINT ``max``:
    ``score_e4·10^12 + (10^12 − doc_id)`` selects max quality with
    min-doc_id tie-break in a single map-combined aggregate — no window,
    no self-join, deterministic and engine-exact (the quality score is
    the oracle-portable composite from ``text_quality_scores``, rounded
    to 4dp then scaled to an integer). Top-100 clusters by size."""
    docs = table(spark, sf_dir, "documents")
    t = F.col("text")
    fp = F.md5(
        F.substring(
            F.regexp_replace(F.lower(F.trim(t)), r"\s+", " "), 1, 64
        )
    )
    score_e4 = F.floor(
        TX.quality_score(t) * F.lit(10000) + F.lit(0.5)
    ).cast("long")
    B = F.lit(1000000000000)
    scored = docs.select(
        fp.alias("cluster_fp"),
        (score_e4 * B + (B - F.col("doc_id"))).alias("packed"),
    )
    return (
        scored.groupBy("cluster_fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("packed").alias("packed"),
        )
        .filter(F.col("n_docs") >= 2)
        .select(
            "cluster_fp",
            "n_docs",
            (F.lit(1000000000000) - F.col("packed") % F.lit(1000000000000))
            .cast("long")
            .alias("kept_doc_id"),
            # exact integer division: packed can exceed 2^53, where the
            # float quotient of `/` rounds differently than the oracle's
            # integer `//` (score 9999 + small doc_id would read as 10000)
            F.expr("packed div 1000000000000").alias("kept_score_e4"),
        )
        .orderBy(F.col("n_docs").desc(), "cluster_fp")
        .limit(100)
    )


BOILERPLATE_MIN_DF = 3  # a 3-gram in ≥3 distinct docs is shared phrasing,
# not content, at test scale; production corpora raise this with scale


@register(
    "text_boilerplate_ngrams",
    oracle=rf"""
    WITH docs AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(generate_series(1, len(toks) - 2),
               i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))) AS grams
      FROM docs WHERE len(toks) >= 3
    ),
    ex AS (SELECT doc_id, UNNEST(grams) AS gram FROM sh)
    SELECT gram, CAST(COUNT(*) AS BIGINT) AS doc_freq
    FROM ex GROUP BY gram
    HAVING COUNT(*) >= {BOILERPLATE_MIN_DF}
    ORDER BY doc_freq DESC, gram
    LIMIT 50
    """,
    tables=("documents",),
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection: the word 3-grams shared by the
    most documents — the corpus-level sibling of ``text_repetition_stats``
    (within-doc repetition). Shared headers/footers/licence blurbs surface
    here; the curation action is to strip or down-weight them before
    training (C4/RefinedWeb both ship this pass).

    Plan: grams are built FLAT — slice/arrays_zip/explode then one
    codegen concat per row — NOT via the ``shingles()`` higher-order
    transform: nested HOF lambdas evaluate interpreted (round-1 gotcha
    #8), and at sf10 the per-doc transform+array_distinct alone cost
    ~48 s of the query's 49 s (profiled; the aggregate was never the
    problem). Per-doc distinctness comes from a (doc_id, gram) groupBy
    that rides the doc_id repartition — clustering on a subset of the
    grouping keys satisfies the distribution, so the dedup adds NO
    exchange — then document frequency is ONE map-combined groupBy on
    the gram string and the top-50 is TakeOrderedAndProject with the
    gram as deterministic tiebreak. At 100 TB the same shape holds:
    doc-freq is a mergeable per-gram count; the known further knob is
    pre-aggregating on hashed grams and joining strings back for the
    survivors (kept string-keyed here so the DuckDB twin is
    byte-identical)."""
    docs = table(spark, sf_dir, "documents")
    # repartition BEFORE the gram build: the documents file is small
    # enough that the scan stage gets a handful of splits, and without
    # this the per-doc gram construction (the expensive part) runs in
    # those few tasks (the minhash/winnowing scan-stage lesson; measured
    # 8.8 → 1.3 s at sf0.1). It also co-locates each doc's grams for the
    # exchange-free dedup below.
    parallelism = spark.sparkContext.defaultParallelism
    toks = TX.tokens(F.lower(F.col("text")))
    k = F.array_size(F.col("toks")) - 2
    zipped = F.arrays_zip(
        F.slice(F.col("toks"), 1, k).alias("w0"),
        F.slice(F.col("toks"), 2, k).alias("w1"),
        F.slice(F.col("toks"), 3, k).alias("w2"),
    )
    per_doc = (
        docs.repartition(parallelism, "doc_id")
        .select("doc_id", toks.alias("toks"))
        .filter(F.array_size(F.col("toks")) >= 3)
        .select("doc_id", F.explode(zipped).alias("t"))
        .select(
            "doc_id",
            F.concat_ws(
                " ", F.col("t.w0"), F.col("t.w1"), F.col("t.w2")
            ).alias("gram"),
        )
        .groupBy("doc_id", "gram")
        .agg(F.lit(1).alias("__one"))
    )
    return (
        per_doc.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= BOILERPLATE_MIN_DF)
        .orderBy(F.col("doc_freq").desc(), "gram")
        .limit(50)
    )


@register(
    "text_perplexity_checksum",
    # same unigram-LM surprisal as text_perplexity_proxy, folded into 256
    # per-bucket checksums: the per-doc avg_nll is already an exact 4-dp
    # value (integer micro-nat sums), so bucket sums of avg_nll*10000 are
    # exact BIGINTs on both engines — any wrong per-doc score changes its
    # bucket row.
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents
    ),
    tok AS (SELECT doc_id, token FROM toks WHERE token <> ''),
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY doc_id, token
    ),
    vocab AS (
      SELECT token, SUM(tf) AS n_tok FROM tf GROUP BY token
    ),
    scored AS (
      SELECT token,
             CAST(FLOOR(
               -LN(CAST(n_tok AS DOUBLE)
                   / (SELECT SUM(n_tok) FROM vocab)) * 1000000 + 0.5
             ) AS BIGINT) AS nll_micro
      FROM vocab
    ),
    per_doc AS (
      SELECT t.doc_id,
             CAST(SUM(t.tf) AS BIGINT) AS n_toks,
             CAST(FLOOR(CAST(SUM(t.tf * s.nll_micro) AS DOUBLE)
                   / SUM(t.tf) / 1000000 * 10000 + 0.5) AS BIGINT)
               AS nll_4dp
      FROM tf t JOIN scored s USING (token)
      GROUP BY t.doc_id
    )
    -- pmod-equivalent of Spark's F.pmod (plain % follows dividend sign)
    SELECT ((doc_id % 256) + 256) % 256 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS sum_toks,
           CAST(SUM(nll_4dp) AS BIGINT) AS nll_checksum
    FROM per_doc
    GROUP BY bucket ORDER BY bucket
    """,
    tables=("documents",),
)
def text_perplexity_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BENCHED form of ``text_perplexity_proxy``: identical unigram
    surprisal pipeline, per-doc scores folded into 256 bucket checksums
    instead of shipping |docs| rows through the driver. Round-7
    decomposition at sf10: the per-doc form computes in 3.20 s but
    benched at 5.24 s — 2.0 s was driver collect of 500k rows (harness
    IPC; a real curation pipeline writes scores or filters on them, never
    collects them). The full-granularity twin stays registered for the
    driver gate. Plan identical through the vocab join; one extra 256-key
    aggregate at the end.

    Since no token string reaches the output, the tf/vocab keys here are
    ``xxhash64(token)`` — the 100 TB plan the per-doc twin's docstring
    describes (narrower shuffles: 8-byte longs instead of word strings;
    measured 3.57 → 3.23 s at sf10). Grouping by the hash is
    result-identical to grouping by the string unless two distinct
    vocabulary tokens collide in 64 bits (P ≈ |vocab|²/2⁶⁵ — for a 10M
    -type vocabulary ~3e-6; the string-keyed twin remains the exact
    reference), so the string-keyed DuckDB oracle checks it exactly."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(TX.tokens(F.lower(F.col("text")))).alias("token")
    ).filter(F.col("token") != "")
    toks = toks.select("doc_id", F.xxhash64("token").alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    vocab = tf.groupBy("token").agg(F.sum("tf").alias("n_tok"))
    total = vocab.agg(F.sum("n_tok").alias("total"))
    scored = vocab.crossJoin(F.broadcast(total)).select(
        "token",
        F.floor(
            -F.ln(F.col("n_tok").cast("double") / F.col("total")) * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("nll_micro"),
    )
    per_doc = (
        tf.join(scored, "token")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_toks"),
            F.floor(
                F.sum(F.col("tf") * F.col("nll_micro")).cast("double")
                / F.sum("tf")
                / 1000000
                * 10000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("nll_4dp"),
        )
    )
    return (
        per_doc.groupBy(F.pmod(F.col("doc_id"), F.lit(256)).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("sum_toks"),
            F.sum("nll_4dp").alias("nll_checksum"),
        )
        .orderBy("bucket")
    )


@register(
    "text_zipf_fit",
    oracle=r"""
    WITH toks AS (
      SELECT UNNEST(string_split_regex(lower(trim(text)), '\s+')) AS token
      FROM documents
    ),
    counts AS (
      SELECT token, COUNT(*) AS freq FROM toks WHERE token <> '' GROUP BY token
    ),
    ranked AS (
      SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, token) AS rk
      FROM counts
    ),
    top AS (
      SELECT CAST(FLOOR(ln(CAST(rk AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS xu,
             CAST(FLOOR(ln(CAST(freq AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS yu
      FROM ranked WHERE rk <= 100
    ),
    sums AS (
      SELECT COUNT(*) AS n, SUM(xu) AS sx, SUM(yu) AS sy,
             CAST(SUM(xu * yu) AS BIGINT) AS sxy,
             CAST(SUM(xu * xu) AS BIGINT) AS sxx
      FROM top
    )
    SELECT CAST(n AS BIGINT) AS n_ranks,
           FLOOR(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
                 * 1000000 + 0.5) / 1000000.0 AS zipf_slope
    FROM sums
    """,
    tables=("documents",),
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health Zipf fit: OLS slope of ln(freq) vs ln(rank) over the
    top-100 vocabulary ranks. Natural corpora slope ~ -1; a slope near 0
    (this synthetic vocab reads ~ -0.18) flags degenerate/templated text —
    the distribution check a training-data intake runs next to langid and
    perplexity.

    Float discipline: ln values quantize to integer micro-nats PER ROW
    (the perplexity precedent — per-row rounding is deterministic; summing
    raw doubles across engines is not), all OLS moments are exact BIGINT
    sums over the <=100-row frame, and the slope is formed in one fixed
    IEEE tree + one final fx round. NULLIF guards the n=1 degenerate
    denominator (ANSI div-by-zero throws).

    Scale shape: the vocabulary aggregate is the only corpus-wide work;
    the top-100 is TakeOrderedAndProject (no global sort of the vocab),
    and the rank window runs over the <=100 collected rows only."""
    docs = table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(TX.tokens(F.lower(F.col("text")))).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    top = counts.orderBy(F.col("freq").desc(), F.col("token")).limit(100)
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.orderBy(F.col("freq").desc(), F.col("token"))
    )
    units = lambda c: F.floor(F.log(c) * F.lit(1000000) + F.lit(0.5)).cast("long")  # noqa: E731
    quant = top.select(
        units(rk.cast("double")).alias("xu"),
        units(F.col("freq").cast("double")).alias("yu"),
    )
    sums = quant.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xu").alias("sx"),
        F.sum("yu").alias("sy"),
        F.sum(F.col("xu") * F.col("yu")).alias("sxy"),
        F.sum(F.col("xu") * F.col("xu")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    slope_raw = (
        nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / F.nullif(
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double"),
        F.lit(0.0),
    )
    return sums.select(
        F.col("n").alias("n_ranks"),
        (F.floor(slope_raw * F.lit(1000000) + F.lit(0.5)) / F.lit(1000000.0)).alias(
            "zipf_slope"
        ),
    )


@register(
    "text_ngram_entropy",
    oracle=r"""
    WITH toks AS (
      SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         x -> x <> '') AS ts
      FROM documents
    ),
    uni AS (
      SELECT u.token, COUNT(*) AS c
      FROM toks, UNNEST(ts) AS u(token)
      GROUP BY u.token
    ),
    usum AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(SUM(c) AS BIGINT) AS n_total,
             CAST(SUM(c * CAST(FLOOR(ln(CAST(c AS DOUBLE)) * 1000000 + 0.5)
                               AS BIGINT)) AS BIGINT) AS wsum
      FROM uni
    ),
    big AS (
      SELECT ts[g.i] || chr(31) || ts[g.i + 1] AS bg, COUNT(*) AS c
      FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS g(i)
      GROUP BY 1
    ),
    bsum AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n_total,
             CAST(COALESCE(SUM(c * CAST(FLOOR(ln(CAST(c AS DOUBLE)) * 1000000
                                              + 0.5) AS BIGINT)), 0)
                  AS BIGINT) AS wsum
      FROM big
    )
    SELECT u.n_total AS n_tokens,
           u.n_distinct AS n_unigrams,
           FLOOR((CAST(FLOOR(ln(CAST(u.n_total AS DOUBLE)) * 1000000 + 0.5)
                       AS DOUBLE)
                  - CAST(u.wsum AS DOUBLE) / CAST(u.n_total AS DOUBLE))
                 / 1000000.0 * 10000 + 0.5) / 10000.0 AS unigram_entropy,
           b.n_total AS n_bigrams,
           b.n_distinct AS n_bigrams_distinct,
           FLOOR((CAST(FLOOR(ln(CAST(NULLIF(b.n_total, 0) AS DOUBLE))
                             * 1000000 + 0.5) AS DOUBLE)
                  - CAST(b.wsum AS DOUBLE)
                    / CAST(NULLIF(b.n_total, 0) AS DOUBLE))
                 / 1000000.0 * 10000 + 0.5) / 10000.0 AS bigram_entropy
    FROM usum u, bsum b
    """,
    tables=("documents",),
)
def text_ngram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-diversity health: Shannon entropy (nats, 4dp) of the corpus
    unigram AND bigram distributions. Low unigram entropy = degenerate
    vocabulary; a bigram entropy barely above the unigram one = templated
    / boilerplate phrasing even when the vocabulary looks rich — the
    diversity axis a training-data intake reads next to the Zipf slope
    (a Zipf-plausible corpus can still be 90% one template).

    Exactness: H = ln(N) - sum(c_i * ln(c_i)) / N. Every ln quantizes to
    integer micro-nats PER ROW (the perplexity/zipf precedent), the
    weighted sum is an exact BIGINT, and the final combination is one
    fixed IEEE tree + one 4dp fx round, spelled identically in both
    engines. Empty tokens are filtered BEFORE pairing so unigram and
    bigram streams see the same token sequence.

    Scale shape: ONE corpus scan — each doc's tokens and in-row zipped
    bigrams (no self-join) explode together as tagged grams, so both
    distributions ride a single (tag, gram) hash aggregate with map-side
    partials (the text_token_topk shuffle class); the rollup to 3 exact
    moments per tag and the <=2-row pivot are constant-size. The oracle
    spells the same math as two UNION-free passes — values are identical,
    only the physical pass count differs."""
    docs = table(spark, sf_dir, "documents")
    ts = F.filter(TX.tokens(F.lower(F.col("text"))), lambda x: x != F.lit(""))
    toks = docs.select(ts.alias("ts"))
    sz = F.array_size("ts")
    pairs = F.when(
        sz >= 2,
        F.zip_with(
            F.slice("ts", 1, sz - 1),
            F.slice("ts", 2, sz - 1),
            lambda a, b: F.concat(a, F.lit("\x1f"), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tag = lambda arr, t: F.transform(  # noqa: E731
        arr, lambda g: F.struct(F.lit(t).alias("tag"), g.alias("gram"))
    )
    grams = toks.select(
        F.explode(F.concat(tag(F.col("ts"), 0), tag(pairs, 1))).alias("g")
    ).select(F.col("g.tag").alias("tag"), F.col("g.gram").alias("gram"))

    lnu = lambda c: F.floor(  # noqa: E731
        F.log(c.cast("double")) * F.lit(1000000) + F.lit(0.5)
    ).cast("long")
    counts = grams.groupBy("tag", "gram").agg(F.count(F.lit(1)).alias("c"))
    moments = counts.groupBy("tag").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("c").alias("n_total"),
        F.sum(F.col("c") * lnu(F.col("c"))).alias("wsum"),
    )

    def of_tag(t, col):
        return F.sum(F.when(F.col("tag") == t, F.col(col)))

    row = moments.agg(
        of_tag(0, "n_total").alias("u_total"),
        F.coalesce(of_tag(0, "n_distinct"), F.lit(0)).alias("u_distinct"),
        of_tag(0, "wsum").alias("u_wsum"),
        F.coalesce(of_tag(1, "n_total"), F.lit(0)).alias("b_total"),
        F.coalesce(of_tag(1, "n_distinct"), F.lit(0)).alias("b_distinct"),
        of_tag(1, "wsum").alias("b_wsum"),
    )

    def entropy(n_total, wsum):
        ln_n = F.floor(
            F.log(n_total.cast("double")) * F.lit(1000000) + F.lit(0.5)
        ).cast("long")
        raw = (
            ln_n.cast("double") - wsum.cast("double") / n_total.cast("double")
        ) / F.lit(1000000.0)
        return F.floor(raw * F.lit(10000) + F.lit(0.5)) / F.lit(10000.0)

    return row.select(
        F.col("u_total").alias("n_tokens"),
        F.col("u_distinct").alias("n_unigrams"),
        entropy(F.col("u_total"), F.col("u_wsum")).alias("unigram_entropy"),
        F.col("b_total").alias("n_bigrams"),
        F.col("b_distinct").alias("n_bigrams_distinct"),
        entropy(
            F.nullif(F.col("b_total"), F.lit(0)), F.col("b_wsum")
        ).alias("bigram_entropy"),
    )


@register(
    "dedup_rate_by_source",
    oracle=r"""
    WITH fp AS (
      SELECT source,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
      FROM documents
    ),
    spread AS (
      SELECT fingerprint, COUNT(DISTINCT source) AS n_sources
      FROM fp GROUP BY fingerprint
    )
    SELECT f.source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT f.fingerprint) AS distinct_docs,
           COUNT(*) - COUNT(DISTINCT f.fingerprint) AS duplicate_docs,
           FLOOR((CAST(COUNT(*) AS DOUBLE)
                  - CAST(COUNT(DISTINCT f.fingerprint) AS DOUBLE))
                 / CAST(COUNT(*) AS DOUBLE) * 1000000 + 0.5)
             / 1000000.0 AS dup_rate,
           CAST(COALESCE(SUM(CASE WHEN s.n_sources > 1 THEN 1 END), 0)
                AS BIGINT) AS cross_source_docs
    FROM fp f JOIN spread s USING (fingerprint)
    GROUP BY f.source
    ORDER BY f.source
    """,
    tables=("documents",),
)
def dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability for exact dedup: per-source document counts,
    within-source duplicate rate, and how many of the source's docs also
    appear (verbatim, after normalization) under ANOTHER source — the
    per-feed scorecard a crawl operator reads to decide which source to
    throttle, and the cross-source column that catches mirror/syndication
    feeds exact dedup would silently collapse.

    Same normalized-md5 fingerprint as dedup_exact_docs
    (functions.text.fingerprint), so the rates here decompose that
    query's corpus-level totals by source.

    Scale shape: ONE corpus scan. Docs collapse immediately to
    (source, fingerprint, cnt) — after that first hash aggregate every
    shuffle carries only (32-char hash, source, count) triples, never
    document text; n_sources per fingerprint is a COUNT window over that
    already-distinct frame (no count_distinct expand, and no self-join —
    a join back to the aggregate would re-derive it from a SECOND
    documents scan, the scan-audit catch), and the final rollup is
    |sources| rows. The oracle spells the same math over the raw rows —
    values are identical, only the collapse point differs."""
    from pyspark.sql import Window

    docs = table(spark, sf_dir, "documents")
    sf = (
        docs.select(
            "source", TX.fingerprint(F.col("text")).alias("fingerprint")
        )
        .groupBy("source", "fingerprint")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # sf is distinct per (source, fingerprint), so per-fingerprint source
    # spread is a plain COUNT over the fingerprint's window partition.
    joined = sf.withColumn(
        "n_sources",
        F.count(F.lit(1)).over(Window.partitionBy("fingerprint")),
    )
    n = F.sum("cnt")
    d = F.count(F.lit(1))
    return (
        joined.groupBy("source")
        .agg(
            n.alias("n_docs"),
            d.alias("distinct_docs"),
            (n - d).alias("duplicate_docs"),
            (
                F.floor(
                    (n.cast("double") - d.cast("double"))
                    / n.cast("double")
                    * F.lit(1000000)
                    + F.lit(0.5)
                )
                / F.lit(1000000.0)
            ).alias("dup_rate"),
            F.coalesce(
                F.sum(F.when(F.col("n_sources") > 1, F.col("cnt"))), F.lit(0)
            )
            .cast("bigint")
            .alias("cross_source_docs"),
        )
        .orderBy("source")
    )

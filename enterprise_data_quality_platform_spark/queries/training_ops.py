"""Training-data curation as a declared query (SURVEY.md §2.6 north star).

The oracle-checked entry runs the SQL-expressible funnel (exact dedup →
quality filter → language ID → token budget); the full pipeline including
MinHash near-dup removal is ``plans.training_data.curate_documents``
(rows-only query + recall-tested modules)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.numeric import fx_round, sql_avg, sql_round
from ..plans.training_data import corpus_stats, curate_documents
from .registry import register

_QUALITY_SQL = """
      CASE WHEN length(trim(text)) = 0 THEN 0
           ELSE len(string_split_regex(trim(text), '\\s+')) END"""

_ORACLE = rf"""
WITH fp AS (
  SELECT doc_id, text,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
  FROM documents
),
dedup AS (
  SELECT doc_id, text FROM fp
  QUALIFY ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) = 1
),
ann AS (
  SELECT doc_id,
         {_QUALITY_SQL} AS n_tokens,
         (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
           * 1.0 / greatest(length(text), 1) AS p_ratio,
         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t IN ('the','and','of','a','to','is','in','that')))
           * 1.0 / greatest(len(string_split_regex(lower(trim(text)), '\s+')), 1) AS s_ratio,
         length(regexp_replace(text, '[\x00-\x7F]', '', 'g'))
           * 1.0 / greatest(length(text), 1) AS na_ratio,
         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t IN ('the','and','of','a','to','is','in','that'))) AS h_en,
         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t IN ('el','la','de','que','y','los','las','una'))) AS h_es,
         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t IN ('der','die','das','und','ist','nicht','ein','mit'))) AS h_de,
         len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t IN ('le','la','les','des','est','une','dans','que'))) AS h_fr
  FROM dedup
),
scored AS (
  SELECT doc_id, n_tokens,
         ROUND(least(1.0, n_tokens / 200.0) * (1 - p_ratio) * (1 - s_ratio), 4) AS quality_score,
         CASE WHEN na_ratio > 0.5 THEN 'cjk'
              WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'und'
              WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
              WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
              WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
              ELSE 'fr' END AS pred_lang
  FROM ann
),
cur AS (SELECT * FROM scored WHERE quality_score >= 0.05)
SELECT pred_lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       {sql_avg("quality_score")} AS avg_quality
FROM cur
GROUP BY pred_lang
ORDER BY pred_lang
"""


@register(
    "training_data_curation",
    oracle=_ORACLE,
    tables=("documents",),
)
def training_data_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel, oracle-checkable subset (no MinHash stage):
    exact dedup → quality ≥ 0.05 → language ID → per-language token budget."""
    docs = table(spark, sf_dir, "documents")
    curated = curate_documents(
        docs, quality_threshold=0.05, with_near_dup=False
    )
    return corpus_stats(curated)


@register(
    "training_data_curation_full",
    oracle=None,  # MinHash stage is engine-hash-specific → rows-only
    tables=("documents",),
)
def training_data_curation_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full funnel including MinHash-LSH near-dup removal."""
    docs = table(spark, sf_dir, "documents")
    curated = curate_documents(
        docs, quality_threshold=0.05, near_dup_threshold=0.7, with_near_dup=True
    )
    return corpus_stats(curated)


_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"


def _gram_sql(n: int) -> str:
    """DuckDB word-n-gram list matching plans.training_data.word_ngrams."""
    return (
        f"[array_to_string(t[i:i+{n - 1}], ' ') "
        f"FOR i IN range(1, greatest(len(t) - {n - 2}, 1))]"
    )


@register(
    "training_split_stats",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             len({_TOKS}) AS n_tokens,
             (doc_id * 2654435761) % 1000 AS b
      FROM documents
    )
    SELECT CASE WHEN b < 800 THEN 'train'
                WHEN b < 900 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS min_doc,
           MAX(doc_id) AS max_doc
    FROM s GROUP BY 1 ORDER BY 1
    """,
    tables=("documents",),
)
def training_split_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split (80/10/10) + per-split
    budget stats. The split is a narrow projection (multiplicative hash on
    doc_id — no engine hash builtin, so the oracle computes the identical
    assignment); reproducible on any cluster layout."""
    from ..functions.text import token_count
    from ..plans.training_data import assign_split

    docs = assign_split(table(spark, sf_dir, "documents"))
    return (
        docs.withColumn("n_tokens", token_count(F.col("text")).cast("bigint"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("split")
    )


@register(
    "training_decontaminate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, unnest({_gram_sql(4)}) AS gram FROM toks
      WHERE len(t) >= 4
    ),
    bench AS (
      SELECT DISTINCT gram FROM grams WHERE doc_id % 101 = 0
    ),
    corpus AS (
      SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 101 <> 0
    )
    SELECT c.doc_id, COUNT(*) AS shared_grams
    FROM corpus c JOIN bench b USING (gram)
    GROUP BY c.doc_id
    ORDER BY c.doc_id
    """,
    tables=("documents",),
)
def training_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing any word 4-gram with
    the held-out 'benchmark' slice (doc_id % 101 == 0 stands in for an eval
    set). Benchmark grams broadcast; corpus grams explode + inner join —
    the eval-leakage sweep every pretraining run needs. 4-grams suit the
    short synthetic docs; real corpora run 8-13 (the operator's default
    is 8)."""
    from ..plans.training_data import decontaminate

    docs = table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 101 == 0)
    corpus = docs.filter(F.col("doc_id") % 101 != 0)
    return decontaminate(corpus, bench, ngram=4).orderBy("doc_id")


@register(
    "training_pack_sequences",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             len({_TOKS}) AS n_tokens,
             doc_id % 32 AS shard
      FROM documents
    ),
    placed AS (
      SELECT shard, n_tokens,
             SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) - n_tokens AS start
      FROM d
    )
    SELECT shard,
           CAST(CEIL(SUM(n_tokens) / 2048.0) AS BIGINT) AS n_seqs,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           COUNT(*) FILTER (
             WHERE n_tokens > 0
               AND FLOOR((start + n_tokens - 1) / 2048.0) <> FLOOR(start / 2048.0)
           ) AS straddling_docs
    FROM placed GROUP BY shard ORDER BY shard
    """,
    tables=("documents",),
)
def training_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing into 2048-token training sequences, 32-way
    sharded (the prefix-sum window parallelizes per shard). Reports chunk
    count and boundary-straddling docs per shard."""
    from ..functions.text import token_count
    from ..plans.training_data import pack_sequences

    docs = table(spark, sf_dir, "documents").withColumn(
        "n_tokens", token_count(F.col("text")).cast("bigint")
    )
    packed = pack_sequences(docs, budget=2048, num_shards=32)
    return (
        packed.groupBy("shard")
        .agg(
            F.ceil(F.sum("n_tokens") / F.lit(2048.0)).alias("n_seqs"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.count(F.when(F.col("straddles"), F.lit(1))).alias(
                "straddling_docs"
            ),
        )
        .orderBy("shard")
    )


@register(
    "text_repetition_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, {_TOKS} AS t FROM documents
    ),
    g AS (
      SELECT doc_id, lang,
             CASE WHEN len(t) >= 5 THEN {_gram_sql(5)} ELSE [] END AS grams
      FROM toks
    ),
    per AS (
      SELECT doc_id, lang, len(grams) AS n_grams,
             len(list_distinct(grams)) AS distinct_grams,
             CASE WHEN len(grams) > 0
                  THEN (len(grams) - len(list_distinct(grams))) * 1.0 / len(grams)
                  ELSE 0.0 END AS rep_ratio
      FROM g
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           {sql_round("AVG(rep_ratio)", 4)} AS avg_rep_ratio,
           COUNT(*) FILTER (WHERE rep_ratio > 0.2) AS high_rep_docs
    FROM per GROUP BY lang ORDER BY lang
    """,
    tables=("documents",),
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/boilerplate signal: per-doc repeated-5-gram
    fraction (array_distinct inside the row — no explode, no shuffle),
    aggregated per language."""
    from ..plans.training_data import repetition_stats

    docs = table(spark, sf_dir, "documents")
    per = repetition_stats(docs, ngram=5).join(
        docs.select("doc_id", "lang"), on="doc_id"
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            fx_round(F.avg("rep_ratio"), 4).alias("avg_rep_ratio"),
            F.count(F.when(F.col("rep_ratio") > 0.2, F.lit(1))).alias(
                "high_rep_docs"
            ),
        )
        .orderBy("lang")
    )


#: shared winnowing CTE (k=5 grams, w=4 windows) — fingerprint selection is
#: md5-hex min, portable across engines (Spark md5 == DuckDB md5).
_WINNOW_CTE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents
), idx AS (
  SELECT doc_id, t, UNNEST(generate_series(1, len(t) - 4)) AS i
  FROM toks WHERE len(t) >= 5
), grams AS (
  SELECT doc_id, i, md5(array_to_string(t[i : i + 4], ' ')) AS h FROM idx
), wins AS (
  SELECT doc_id, i,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
  FROM grams
), fps AS (
  SELECT DISTINCT doc_id, fp FROM wins WHERE i <= n_grams - 3
)
"""


@register(
    "text_fingerprint_winnow",
    oracle=_WINNOW_CTE
    + """
    SELECT doc_id,
           COUNT(*) AS n_fingerprints,
           MIN(fp) AS min_fp
    FROM fps
    GROUP BY doc_id
    """,
    tables=("documents",),
)
def text_fingerprint_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint profile (MOSS local fingerprinting): per doc,
    the distinct window-min fingerprint count and the lexicographic min
    fingerprint. Explode + codegen'd window-min + per-doc aggregate (one
    doc-partitioned shuffle). Docs with < k+w-1 tokens carry no full
    window and are omitted (same convention both engines)."""
    from ..plans.training_data import winnow_fingerprints

    fps = winnow_fingerprints(table(spark, sf_dir, "documents"), k=5, w=4)
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.min("fp").alias("min_fp"),
    )


@register(
    "dedup_winnow_pairs",
    oracle=_WINNOW_CTE
    + """
    , eligible AS (
      SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= 1000
    ), flat AS (
      SELECT f.doc_id, f.fp FROM fps f JOIN eligible USING (fp)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_fps
    FROM flat a JOIN flat b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= 2
    """,
    tables=("documents",),
)
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint-overlap near-dup pairs: winnowing fingerprints bucket-
    joined on the fingerprint (the LSH-banding join shape — no all-pairs),
    hot-fingerprint skew guard, >= 2 shared fingerprints. The third
    near-dup family next to MinHash-LSH (probabilistic Jaccard) and
    SimHash (Hamming): winnowing guarantees detection of any shared run
    of >= w+k-1 tokens."""
    from ..plans.training_data import winnow_pairs

    return winnow_pairs(
        table(spark, sf_dir, "documents"), k=5, w=4, min_shared=2,
        max_bucket=1000,
    )


@register(
    "training_sample_balanced",
    oracle="""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_total FROM documents GROUP BY source
    ),
    t AS (SELECT MIN(n_total) AS sample_target FROM counts),
    kept AS (
      SELECT d.source, COUNT(*) AS n_kept
      FROM documents d JOIN counts c USING (source) CROSS JOIN t
      WHERE (((d.doc_id % 1000003) * 2654435761) % 1000) * c.n_total
            < 1000 * t.sample_target
      GROUP BY d.source
    )
    SELECT c.source,
           c.n_total,
           COALESCE(k.n_kept, 0) AS n_kept,
           t.sample_target,
           COALESCE(k.n_kept, 0) / c.n_total AS keep_rate
    FROM counts c
    CROSS JOIN t
    LEFT JOIN kept k USING (source)
    ORDER BY c.source
    """,
    tables=("documents",),
)
def training_sample_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling audit: flatten per-source skew to the
    smallest source's size (``plans.training_data.sample_balanced``) and
    report per-stratum kept counts and realized rates. The accept test is
    integer cross-multiplication on a multiplicative-hash bucket — no
    float thresholds — so the kept row set is deterministic,
    engine-portable, and independent of cluster layout (training-mix
    lineage you can reproduce bit-for-bit).

    Plan: one groupBy(source) for counts (broadcast, stratum-cardinality
    rows), narrow filter, one groupBy(source) for the audit — two
    map-combined shuffles on a low-cardinality key, nothing keyed by row.
    """
    from ..plans.training_data import sample_balanced

    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    target = counts.agg(F.min("n_total").alias("sample_target"))
    kept = (
        sample_balanced(
            docs,
            stratum_col="source",
            id_col="doc_id",
            counts=counts.withColumnRenamed("n_total", "n_stratum"),
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        counts.join(kept, "source", "left")
        .crossJoin(F.broadcast(target))
        .select(
            "source",
            "n_total",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            "sample_target",
            (
                F.coalesce(F.col("n_kept"), F.lit(0)) / F.col("n_total")
            ).alias("keep_rate"),
        )
        .orderBy("source")
    )


@register(
    "training_mixture_sample",
    oracle="""
    WITH rated AS (
      SELECT doc_id, source,
             200 + CAST(SUBSTR(source, 4) AS BIGINT) * 150 AS rate_pm,
             ((doc_id % 1000003) * 2654435761) % 1000 AS bucket
      FROM documents
    ),
    reps AS (
      SELECT source, doc_id,
             (rate_pm // 1000)
             + CASE WHEN bucket < rate_pm % 1000 THEN 1 ELSE 0 END AS n_rep
      FROM rated
    ),
    emitted AS (
      SELECT source, doc_id, unnest(range(1, n_rep + 1)) AS replica
      FROM reps WHERE n_rep >= 1
    )
    SELECT source,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_source_docs,
           CAST(COUNT(*) AS BIGINT) AS n_emitted,
           CAST(MAX(replica) AS BIGINT) AS max_replica
    FROM emitted
    GROUP BY source ORDER BY source
    """,
    tables=("documents",),
)
def training_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture weighting audit: every source sampled at its own epoch
    rate — src0 at 0.20 epochs up to src19 at 3.05 (rate_pm = 200 +
    150·source_index, a stand-in for the web×0.3/books×2.5 weighting a
    real pretraining mix assigns) — via
    ``plans.training_data.mixture_sample`` (deterministic multiplicative-
    hash replication, engine-portable BIGINT accept test, 1-based replica
    lineage). The audit reports per-source surviving docs, emitted rows,
    and the deepest replica index.

    Plan: narrow projection + row-local sequence explode (no shuffle),
    then one map-combined groupBy on the 20-source key."""
    from ..plans.training_data import mixture_sample

    docs = table(spark, sf_dir, "documents")
    rate = F.lit(200) + F.substring(F.col("source"), 4, 10).cast("long") * F.lit(
        150
    )
    emitted = mixture_sample(docs.select("doc_id", "source"), rate)
    return (
        emitted.groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_source_docs"),
            F.count(F.lit(1)).alias("n_emitted"),
            F.max("replica").cast("long").alias("max_replica"),
        )
        .orderBy("source")
    )


@register(
    "training_chunk_overlap",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
      FROM documents
    ),
    s AS (
      SELECT doc_id, words,
             UNNEST(generate_series(1, GREATEST(len(words), 1), 48)) AS start
      FROM w
    )
    SELECT doc_id,
           CAST((start - 1) // 48 AS BIGINT) AS chunk_id,
           CAST(LEAST(64, len(words) - start + 1) AS BIGINT) AS n_tokens,
           md5(array_to_string(list_slice(words, start, start + 63), ' ')) AS chunk_md5
    FROM s
    ORDER BY doc_id, chunk_id
    """,
    tables=("documents",),
)
def training_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (window 64, stride 48 — 16-token
    overlap), the RAG/embedding prep step
    (``plans.training_data.chunk_tokens``). Fully oracle-checked: chunk
    boundaries are integer arithmetic, the chunk text itself crosses the
    compare as md5 (both engines hash the identical reassembled string —
    the split/trim tokenizer parity the text_* family already pins).
    Row-local plan: split → explode(sequence) → slice; no shuffle until
    the presentation sort."""
    from ..plans.training_data import chunk_tokens

    docs = table(spark, sf_dir, "documents")
    chunks = chunk_tokens(docs, window=64, stride=48)
    return chunks.select(
        "doc_id",
        "chunk_id",
        "n_tokens",
        F.md5(F.encode(F.col("chunk_text"), "UTF-8")).alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_id")


@register(
    "training_chunk_checksum",
    oracle=r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
      FROM documents
    ),
    s AS (
      SELECT doc_id, words,
             UNNEST(generate_series(1, GREATEST(len(words), 1), 48)) AS start
      FROM w
    ),
    c AS (
      SELECT doc_id,
             CAST(LEAST(64, len(words) - start + 1) AS BIGINT) AS n_tokens,
             md5(array_to_string(list_slice(words, start, start + 63), ' '))
               AS chunk_md5
      FROM s
    )
    -- pmod-equivalent of Spark's F.pmod (plain % follows dividend sign)
    SELECT ((doc_id % 256) + 256) % 256 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(SUM(CAST(('0x' || substr(chunk_md5, 1, 7)) AS BIGINT))
             AS BIGINT) AS md5_checksum
    FROM c
    GROUP BY bucket ORDER BY bucket
    """,
    tables=("documents",),
)
def training_chunk_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BENCHED form of ``training_chunk_overlap``: identical chunking
    (window 64 / stride 48, same md5-of-reassembled-chunk), but the
    per-chunk hashes fold into 256 per-bucket checksums instead of
    shipping every chunk row through the driver. Round-7 decomposition:
    the per-chunk form computes in 0.88 s at sf10 but benched at 4.17 s —
    3.3 s was driver-side collect of millions of rows, i.e. harness IPC,
    not engine work (a real pipeline WRITES chunks, never collects them).
    Sensitivity is preserved: any wrong chunk text/boundary changes its
    bucket's summed 28-bit md5 prefix (sums stay < 2^53, exact in BIGINT
    on both engines). The full-granularity twin stays registered for the
    driver's sf0.01 gate."""
    from ..plans.training_data import chunk_tokens

    docs = table(spark, sf_dir, "documents")
    chunks = chunk_tokens(docs, window=64, stride=48)
    h = F.md5(F.encode(F.col("chunk_text"), "UTF-8"))
    term = F.conv(F.substring(h, 1, 7), 16, 10).cast("long")
    return (
        chunks.select(
            F.pmod(F.col("doc_id"), F.lit(256)).alias("bucket"),
            F.col("n_tokens"),
            term.alias("term"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.sum("term").alias("md5_checksum"),
        )
        .orderBy("bucket")
    )

"""Stage decomposition + A/B for text_boilerplate_ngrams — VERDICT r11
item 3. Times successive prefixes of the pipeline through the noop sink
(guide §1.4) to locate the cost, then A/Bs candidate variants.

Usage: python tools/ab_r12_boilerplate.py <sf_dir> [runs]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from enterprise_data_quality_platform_spark.catalog import table  # noqa: E402
from enterprise_data_quality_platform_spark.queries.text import (  # noqa: E402
    BOILERPLATE_MIN_DF,
    text_boilerplate_ngrams,
)
from enterprise_data_quality_platform_spark.functions import text as TX  # noqa: E402
from enterprise_data_quality_platform_spark.session import get_spark  # noqa: E402


def _grams(spark, sf_dir, repartition=True):
    docs = table(spark, sf_dir, "documents")
    parallelism = spark.sparkContext.defaultParallelism
    toks = TX.tokens(F.lower(F.col("text")))
    k = F.array_size(F.col("toks")) - 2
    zipped = F.arrays_zip(
        F.slice(F.col("toks"), 1, k).alias("w0"),
        F.slice(F.col("toks"), 2, k).alias("w1"),
        F.slice(F.col("toks"), 3, k).alias("w2"),
    )
    base = docs.repartition(parallelism, "doc_id") if repartition else docs
    return (
        base.select("doc_id", toks.alias("toks"))
        .filter(F.array_size(F.col("toks")) >= 3)
        .select("doc_id", F.explode(zipped).alias("t"))
        .select(
            "doc_id",
            F.concat_ws(" ", F.col("t.w0"), F.col("t.w1"), F.col("t.w2")).alias(
                "gram"
            ),
        )
    )


def stage_explode(spark, sf_dir):
    return _grams(spark, sf_dir)


def stage_dedup(spark, sf_dir):
    return _grams(spark, sf_dir).groupBy("doc_id", "gram").agg(F.lit(1).alias("__one"))


def full(spark, sf_dir):
    return text_boilerplate_ngrams(spark, sf_dir)


def inrow(spark, sf_dir):
    """One scan, NO repartition, NO per-doc dedup agg: per-doc distinct
    grams computed in-row (arrays_zip is codegen; the concat transform is
    a single-level HOF — the text_ngram_entropy precedent), then one
    map-combined groupBy(gram) + top-50."""
    docs = table(spark, sf_dir, "documents")
    toks = TX.tokens(F.lower(F.col("text")))
    k = F.array_size(F.col("toks")) - 2
    zipped = F.arrays_zip(
        F.slice(F.col("toks"), 1, k).alias("w0"),
        F.slice(F.col("toks"), 2, k).alias("w1"),
        F.slice(F.col("toks"), 3, k).alias("w2"),
    )
    grams = F.array_distinct(
        F.transform(
            zipped,
            lambda t: F.concat_ws(" ", t["w0"], t["w1"], t["w2"]),
        )
    )
    return (
        docs.select(toks.alias("toks"))
        .filter(F.array_size(F.col("toks")) >= 3)
        .select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= BOILERPLATE_MIN_DF)
        .orderBy(F.col("doc_freq").desc(), "gram")
        .limit(50)
    )


def main() -> None:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab-boilerplate")
    arms = {
        "explode(noop)": stage_explode,
        "dedup(noop)": stage_dedup,
        "full": full,
        "inrow": inrow,
    }
    base = [tuple(r) for r in full(spark, sf_dir).collect()]
    assert [tuple(r) for r in inrow(spark, sf_dir).collect()] == base, "MISMATCH"
    print("inrow results identical:", len(base), "rows")

    def run(df, is_full):
        if is_full:
            df.collect()
        else:
            df.write.format("noop").mode("overwrite").save()

    for k, f in arms.items():
        run(f(spark, sf_dir), k in ("full", "inrow"))  # warm
    samples: dict[str, list[float]] = {k: [] for k in arms}
    for _ in range(runs):
        for k, f in arms.items():
            t0 = time.perf_counter()
            run(f(spark, sf_dir), k in ("full", "inrow"))
            samples[k].append(time.perf_counter() - t0)
    for k in arms:
        print(k, round(statistics.median(samples[k]), 4), [round(s, 3) for s in samples[k]])


if __name__ == "__main__":
    main()

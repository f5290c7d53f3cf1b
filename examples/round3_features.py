"""Round-3 feature tour: custom connectors, streaming joins + upsert sink,
vector codecs, layout tools, and the sketch family — each section is
independently runnable.

Run:  python examples/round3_features.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from enterprise_data_quality_platform_spark.catalog import table
from enterprise_data_quality_platform_spark.operators import zorder_by
from enterprise_data_quality_platform_spark.operators.graph import pagerank
from enterprise_data_quality_platform_spark.session import get_spark
from enterprise_data_quality_platform_spark.similarity.pq import (
    pq_adc_topk,
    train_pq_codebooks,
)
from enterprise_data_quality_platform_spark.sources import (
    register_duckdb_source,
    register_jsonl_stream_source,
)
from enterprise_data_quality_platform_spark.streaming import (
    events_stream,
    first_seen_dim,
    streaming_static_enrich,
    streaming_upsert_sink,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("round3-tour")

    print("== 1. warehouse connector (Python Data Source, range-partitioned)")
    register_duckdb_source(spark)
    orders = (
        spark.read.format("duckdb_table")
        .option("path", f"{sf_dir}/orders.parquet")
        .option("partitionColumn", "o_orderkey")
        .option("numPartitions", "4")
        .load()
    )
    print(f"   {orders.count()} orders over {orders.rdd.getNumPartitions()} range partitions")

    print("== 2. offset-tracked streaming source -> upsert-maintained state table")
    register_jsonl_stream_source(spark)
    work = tempfile.mkdtemp(prefix="edqp-tour-")
    feed = f"{work}/feed.jsonl"
    with open(feed, "w") as fh:
        for i in range(100):
            fh.write(json.dumps({"event_id": i, "user_id": i % 7,
                                 "event_type": "view", "value": float(i)}) + "\n")
    stream = (
        spark.readStream.format("jsonl_replay")
        .option("path", feed)
        .option("maxLinesPerBatch", "25")
        .load()
        .withColumn("ts", F.current_timestamp())
    )
    streaming_upsert_sink(stream, spark, f"{work}/state", keys=["user_id"],
                          checkpoint_dir=f"{work}/ckpt")
    print(f"   state table: {spark.read.parquet(f'{work}/state').count()} rows (one per user)")

    print("== 3. stream-static enrichment (finite run == batch join)")
    dim = first_seen_dim(table(spark, sf_dir, "events"))
    enriched = streaming_static_enrich(events_stream(spark, sf_dir), dim)
    q = (enriched.writeStream.format("memory").queryName("tour_enrich")
         .trigger(availableNow=True)
         .option("checkpointLocation", tempfile.mkdtemp()).start())
    q.awaitTermination()
    print(f"   enriched events: {spark.table('tour_enrich').count()}")

    print("== 4. product quantization: 32x codes + ADC search")
    emb = table(spark, sf_dir, "embeddings")
    books = train_pq_codebooks(emb, m=8, k=32, sample_size=1000)
    probes = emb.limit(2).select(
        F.col("vec_id").alias("probe_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("pvec"),
    )
    pq_adc_topk(emb, probes, books, k=3).show()

    print("== 5. Z-order layout: bounded rectangles on both axes")
    zeroed = zorder_by(
        table(spark, sf_dir, "events"),
        F.pmod(F.col("user_id"), F.lit(256)),
        F.pmod(F.expr("unix_micros(cast(ts as timestamp)) div 3600000000"), F.lit(256)),
        num_partitions=8,
    )
    spans = (zeroed.withColumn("pid", F.spark_partition_id())
             .groupBy("pid").agg(F.count(F.lit(1)).alias("n")))
    print(f"   {spans.count()} z-ordered partitions")

    print("== 6. co-purchase PageRank (iterative dataflow)")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    baskets = li.groupBy("l_orderkey").agg(F.collect_list("l_partkey").alias("ps"))
    edges = (baskets.select(F.explode("ps").alias("x"), "ps")
             .select(F.col("x").alias("src"),
                     F.explode(F.expr("filter(ps, y -> y > x)")).alias("dst"))
             .groupBy("src", "dst").agg(F.count(F.lit(1)).cast("double").alias("weight")))
    pagerank(edges, iterations=5).orderBy(F.col("rank").desc()).show(5)

    print("tour complete")


if __name__ == "__main__":
    main()

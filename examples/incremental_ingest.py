"""Incremental shard ingestion — the daily loop of a 100 TB training-data
pipeline, end to end on the synthetic tables:

  day 0: dedup + curate the existing corpus, persist the compact dedup
         state (content fingerprints + MinHash signatures, KBs per
         thousand docs — the corpus TEXT is never read again);
  day N: an incoming shard is deduped AGAINST THE STATE (exact
         fingerprint anti-join + LSH band join + signature-agreement
         verify), survivors run the curation funnel, get packed into
         fixed-budget training sequences, and the state is updated
         O(shard).

Run:  python examples/incremental_ingest.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from enterprise_data_quality_platform_spark import get_spark
from enterprise_data_quality_platform_spark.catalog import table
from enterprise_data_quality_platform_spark.dedup import (
    build_dedup_state,
    incremental_dedup,
    read_dedup_state,
    updated_state,
    write_dedup_state,
)
from enterprise_data_quality_platform_spark.plans.training_data import (
    curate_documents,
    pack_sequences,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("incremental-ingest")
    docs = table(spark, sf_dir, "documents")

    # pretend 6/7 of the corpus was ingested yesterday; today's shard is
    # the rest
    corpus = docs.filter(F.col("doc_id") % 7 != 3)
    shard = docs.filter(F.col("doc_id") % 7 == 3)

    state_dir = tempfile.mkdtemp(prefix="dedup-state-")

    # ---- day 0: persist the corpus dedup state (one-time cost)
    write_dedup_state(build_dedup_state(corpus), state_dir)
    print(f"state persisted to {state_dir}")

    # ---- day N: ingest the shard against the state
    state = read_dedup_state(spark, state_dir)
    kept, report = incremental_dedup(shard, state, threshold=0.5)
    print("ingest report:")
    report.groupBy("reason").count().show()

    # curation funnel on the survivors only (near-dup tier already ran
    # against the corpus, so the funnel's in-shard pass is all that's left)
    curated = curate_documents(kept, with_near_dup=False)
    print(f"shard: {shard.count()} in, {kept.count()} kept, "
          f"{curated.count()} curated")

    # fixed-budget sequence packing for the trainer
    packed = pack_sequences(curated, budget=2048, num_shards=8)
    packed.groupBy("shard").agg(
        F.countDistinct("seq_id").alias("n_sequences"),
        F.sum("n_tokens").alias("n_tokens"),
    ).orderBy("shard").show(8)

    # state update is O(shard): union fingerprints + signatures
    write_dedup_state(updated_state(state, kept), state_dir)
    print("state updated — tomorrow's shard dedups against it")


if __name__ == "__main__":
    main()

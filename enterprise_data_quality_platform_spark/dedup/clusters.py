"""Near-dup cluster resolution: pairs → connected components → keep-one.

``minhash_near_dup_pairs`` (and its SimHash/embedding twins) emit PAIRS;
a curation pipeline needs one survivor per duplicate *cluster*. Components
are computed by iterative min-label propagation over the pair graph — the
standard Spark-side connected-components shape (each round every vertex
adopts the min label in its neighborhood; converges in O(component
diameter) rounds). No driver-side union-find: per round the graph does one
join + one groupBy-min, all distributed, with ``localCheckpoint`` every few
rounds to truncate lineage. Near-dup clusters are small and tight
(diameter is typically 1-3), so convergence is fast.

The reference platform has no dedup operator at all (its engine is
BigQuery); this is north-star §2.6 X4 territory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: truncate lineage every N propagation rounds (iterative plans otherwise
#: grow unboundedly and re-execute from the source each round)
_CHECKPOINT_EVERY = 3


def resolve_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components of the pair graph.

    Input: edge list (id_a, id_b). Output: (id, cluster_id) for every id
    appearing in any pair, where cluster_id = min id reachable — a
    deterministic canonical representative.
    """
    edges = pairs.select(
        F.col(id_a).cast("long").alias("src"), F.col(id_b).cast("long").alias("dst")
    )
    # undirected: propagate both ways
    edges = (
        edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for i in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left")
            .select(
                F.col("id"),
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                    "new_label"
                ),
                F.col("label").alias("old_label"),
            )
        )
        changed = new_labels.filter(F.col("new_label") < F.col("old_label")).count()
        labels = new_labels.select(F.col("id"), F.col("new_label").alias("label"))
        if i % _CHECKPOINT_EVERY == _CHECKPOINT_EVERY - 1 or changed == 0:
            labels = labels.localCheckpoint(eager=True)
        if changed == 0:
            break

    return labels.select(F.col("id"), F.col("label").alias("cluster_id"))


def keep_one_per_cluster(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Drop all but the canonical (min-id) member of every near-dup
    cluster. Rows never mentioned in ``pairs`` are untouched — the pair
    graph is tiny next to the corpus, so the kill list is computed on the
    graph side and removed with one distributed anti-join on the corpus.

    Idempotent: dedup(dedup(x)) == dedup(x) (re-running finds no pairs
    among survivors above the same threshold... and an empty pair set is a
    no-op by construction).
    """
    clusters = resolve_clusters(pairs, id_a, id_b)
    losers = clusters.filter(F.col("id") != F.col("cluster_id")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")

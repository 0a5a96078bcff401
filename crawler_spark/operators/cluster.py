"""Near-duplicate cluster assignment: candidate pairs → connected
components → one canonical document per component.

LSH banding (dedup.minhash_lsh / embedding_lsh / simhash_banded)
produces PAIRS; an actual dedup pipeline must transitively close them —
if A~B and B~C, all three are one cluster and only one survives. This
module closes the pair graph and elects min(doc_id) per component as
the canonical document (the same first-wins rule the reference applies
to its MD5 image dedup, HZ.Crawler.DataSpider/BaseSpider.cs:275-287,
lifted from exact-key to similarity-graph equality).

Spark side: iterative min-label propagation over the undirected edge
relation. Each round every vertex takes the min label among itself and
its neighbors; convergence is detected with a changed-count aggregate.
Rounds needed = graph diameter; near-dup clusters are short chains
(diameter rarely exceeds a few hops), and each round is one shuffle on
doc_id. `localCheckpoint` truncates the growing lineage so round N's
plan does not replay rounds 1..N-1. At 10^10-doc scale the same loop
holds because state per round is one (doc_id, label) table hash-
partitioned on doc_id; the literature upgrade (alternating
large-star/small-star, Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) drops rounds from O(diameter) to
O(log n) with the same per-round shuffle shape — diameter bounds are
already tiny for near-dup graphs, so plain propagation is the honest
default and the star variant is a drop-in if a pathological chain
shows up.

DuckDB oracle: recursive transitive closure (UNION-deduped BFS from
every vertex), then min(reachable). Exponential in component size in
the worst case but exact — fine as a small-SF oracle, never the scale
path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import minhash_lsh_duck, minhash_lsh_spark

MAX_ROUNDS = 50  # diameter backstop; propagation converges long before


def connected_components(nodes: DataFrame, edges: DataFrame,
                         max_rounds: int = MAX_ROUNDS,
                         min_weight: int | None = None) -> DataFrame:
    """Min-label propagation. ``nodes``: (doc_id); ``edges``:
    (doc_a, doc_b) undirected pairs. Returns (doc_id, comp_id).

    ``min_weight``: optional edge-strength threshold — edges must then
    carry a ``weight`` column (e.g. link co-occurrence count) and only
    pairs with weight >= min_weight participate. This is the graph_wcc
    trawling rule (operators/graph.py): near-dup clustering (pairs are
    already similarity-gated, no weight) and strong-link clustering
    (threshold IS the operator) share this one entry point. The filter
    is a map-side predicate before the symmetrize shuffle — plan shape
    unchanged."""
    if min_weight is not None:
        edges = edges.filter(F.col("weight") >= min_weight)
    spark = nodes.sparkSession
    sym = (
        edges.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(
            edges.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .distinct()
        .persist()
    )
    labels = nodes.select(
        "doc_id", F.col("doc_id").alias("comp_id")
    ).localCheckpoint()
    for _ in range(max_rounds):
        nbr_min = (
            sym.join(labels, sym.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("comp_id").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    "comp_id", F.coalesce("nbr_comp", "comp_id")
                ).alias("comp_id"),
                (F.coalesce("nbr_comp", "comp_id") < F.col("comp_id")).cast(
                    "int"
                ).alias("chg"),
            )
        ).localCheckpoint()  # truncate lineage: round N must not replay 1..N-1
        n_changed = new_labels.agg(F.sum("chg")).collect()[0][0] or 0
        labels = new_labels.drop("chg")
        if n_changed == 0:
            break
    sym.unpersist()
    return labels


def near_dup_components_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline over `documents`: MinHash-LSH pairs → connected
    components → (doc_id, comp_id, is_canonical). Exact docs keep
    themselves (singleton components)."""
    spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).createOrReplaceTempView("documents")
    pairs = spark.sql(minhash_lsh_spark()).select("doc_a", "doc_b")
    nodes = spark.table("documents").select("doc_id")
    comps = connected_components(nodes, pairs)
    return comps.select(
        "doc_id",
        "comp_id",
        (F.col("doc_id") == F.col("comp_id")).cast("int").alias(
            "is_canonical"
        ),
    )


def near_dup_components_duck() -> str:
    """Recursive-CTE transitive closure over the SAME pair SQL — exact
    min-reachable-id per vertex."""
    return f"""
WITH RECURSIVE pairs AS ({minhash_lsh_duck()}),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
nodes AS (SELECT doc_id FROM documents),
reach(root, v) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT r.root, e.dst FROM reach r JOIN edges e ON e.src = r.v
)
SELECT root AS doc_id,
       min(v) AS comp_id,
       CASE WHEN root = min(v) THEN 1 ELSE 0 END AS is_canonical
FROM reach GROUP BY root
"""

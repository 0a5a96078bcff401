"""PageRank over a link graph: the iterative-fixpoint operator shape.

A production crawler orders its frontier by link authority — the
reference crawls a fixed config-ordered site list
(HZ.Crawler.DataSpider/Program.cs:20-38, the degenerate one-host case);
at Common-Crawl width the frontier must be PRIORITIZED, and PageRank
over the page/host link graph is the canonical signal (Page et al.
1999; Cho, Garcia-Molina & Page, WWW7 1998, "Efficient crawling
through URL ordering"). This module supplies that missing scale
operator as a generic DataFrame power iteration.

Spark shape: each round is one join (contributions keyed on edge src)
and one hash aggregation (sum keyed on edge dst) — the SAME shuffle key
every round, so at cluster scale the edge relation is bucketed/
pre-partitioned once and every iteration's join is co-partitioned; the
only per-round movement is the (node_id, pr) table, which is tiny
relative to edges. ``localCheckpoint`` truncates lineage per round
(same device as operators/cluster.py's label propagation) so round K's
plan does not replay rounds 1..K-1; edges and out-degrees are computed
once and persisted.

Oracle graph: the symmetrized supplier↔customer bipartite graph from
lineitem⋈orders (customers offset by +1_000_000 into a disjoint id
space). Symmetrization guarantees no dangling nodes, so plain power
iteration conserves unit mass with no dangling correction — asserted
by tests/test_graph.py. The DuckDB oracle unrolls K=3 iterations as
CTEs with the exact same arithmetic ((1.0 - d)/n base, d * sum(pr/
outdeg) flow); both sides round to 9 dp, ~6 orders of magnitude above
float sum-order noise and ~4 below the smallest pr at bench SF.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DAMPING = 0.85
ITERATIONS = 3  # oracle-checked depth; pagerank() takes any K

# one edge namespace: suppliers keep their key, customers offset into a
# disjoint id range (sf100 custkey tops out at 1.5e7 — keep the offset
# above any realistic custkey so the spaces never collide)
_CUST_OFFSET = 1_000_000

_LINKS = """
SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""

EDGES_SQL = f"""
WITH links AS ({_LINKS})
SELECT s AS src, c + {_CUST_OFFSET} AS dst FROM links
UNION ALL
SELECT c + {_CUST_OFFSET} AS src, s AS dst FROM links
"""


def pagerank(
    edges: DataFrame,
    iterations: int = ITERATIONS,
    damping: float = DAMPING,
) -> DataFrame:
    """Power-iteration PageRank. ``edges``: (src, dst) directed, already
    deduplicated; every node must have at least one out-edge (feed a
    symmetrized graph, or pre-drop dangling nodes). Returns
    (node_id, pr) with unit total mass.
    """
    edges = edges.select("src", "dst")
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # join degrees once; every iteration reuses this persisted relation
    out_edges = edges.join(deg, "src").persist()
    nodes = (
        edges.select(F.col("src").alias("node_id"))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    base = (1.0 - damping) / n
    pr = nodes.select("node_id", F.lit(1.0 / n).alias("pr"))
    for _ in range(iterations):
        contribs = out_edges.join(pr, out_edges.src == pr.node_id).select(
            F.col("dst").alias("node_id"),
            (F.col("pr") / F.col("outdeg")).alias("w"),
        )
        pr = (
            nodes.join(
                contribs.groupBy("node_id").agg(F.sum("w").alias("flow")),
                "node_id",
                "left",
            )
            .select(
                "node_id",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce("flow", F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint()  # truncate lineage: round K must not replay 1..K-1
        )
    out_edges.unpersist()
    return pr


def pagerank_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked entry: K=3 PageRank over the lineitem⋈orders
    supplier↔customer graph, 9-dp rounded."""
    for t in ("lineitem", "orders"):
        spark.read.parquet(
            os.path.join(sf_dir, f"{t}.parquet")
        ).createOrReplaceTempView(t)
    pr = pagerank(spark.sql(EDGES_SQL))
    return pr.select("node_id", F.round("pr", 9).alias("pr"))


def pagerank_duck(iterations: int = ITERATIONS) -> str:
    """The same K iterations unrolled as CTEs (exact same arithmetic)."""
    d = DAMPING
    ctes = [
        f"links AS ({_LINKS})",
        f"""edges AS (
  SELECT s AS src, c + {_CUST_OFFSET} AS dst FROM links
  UNION ALL
  SELECT c + {_CUST_OFFSET} AS src, s AS dst FROM links
)""",
        "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
        "nodes AS (SELECT DISTINCT src AS node_id FROM edges)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        """pr0 AS (
  SELECT node_id, 1.0 / (SELECT n FROM nn) AS pr FROM nodes
)""",
    ]
    for k in range(1, iterations + 1):
        ctes.append(f"""pr{k} AS (
  SELECT v.node_id,
         (1.0 - {d}) / (SELECT n FROM nn)
           + {d} * coalesce(fl.flow, 0.0) AS pr
  FROM nodes v
  LEFT JOIN (
    SELECT e.dst AS node_id, sum(p.pr / g.outdeg) AS flow
    FROM edges e
    JOIN pr{k - 1} p ON p.node_id = e.src
    JOIN deg g ON g.src = e.src
    GROUP BY e.dst
  ) fl ON fl.node_id = v.node_id
)""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node_id, round(pr, 9) AS pr FROM pr{iterations}"
    )


# degree distribution over the same edge relation pagerank walks: the
# host-fanout audit (how many nodes have out-degree d) — two stacked
# hash aggregations, both with map-side partials; the second one's key
# space is the distinct degree values (tiny at any graph size)
DEGREE_DIST_SQL = f"""
WITH e AS ({EDGES_SQL}),
deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src)
SELECT outdeg, count(*) AS n_nodes
FROM deg GROUP BY outdeg
"""

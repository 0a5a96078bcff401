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


# ---------------------------------------------------------------------------
# HITS (Kleinberg, JACM 1999, "Authoritative sources in a hyperlinked
# environment"): the second canonical frontier-prioritization signal
# next to PageRank — hubs (pages that link to many good authorities)
# matter for crawl scheduling because fetching a high-hub page yields
# many high-authority outlinks per fetch. Reference analog: none (the
# reference crawls a fixed config-ordered list); this is the scale
# operator a 10^10-URL frontier needs.
#
# Spark shape: identical to pagerank's — each half-round is one join
# keyed on an edge endpoint plus one hash aggregation, the SAME shuffle
# key every round (edges bucketed once at cluster scale, only the tiny
# (node_id, score) relation moves). Normalization divides by the
# round's max score — max over floats is order-independent (unlike a
# float sum), so both engines normalize by the bit-identical scalar; it
# rides along as a 1-row broadcast nested-loop join, never a driver
# collect. ``localCheckpoint`` truncates lineage per round. Final
# scores rounded to 9 dp: scores live in (0, 1] after the max-norm and
# cross-engine float-sum noise is ~1e-13 relative (same margin argument
# as pagerank, which passes at depth 3).
# ---------------------------------------------------------------------------

HITS_ITERATIONS = 2  # oracle-checked depth; hits() takes any K


def hits(edges: DataFrame, iterations: int = HITS_ITERATIONS) -> DataFrame:
    """HITS over directed (src, dst) edges, max-normalized per round.
    Returns (node_id, auth, hub) for every node with an out-edge (feed
    a symmetrized graph so that is every node)."""
    if iterations < 1:
        raise ValueError("hits() needs iterations >= 1 (auth is undefined at K=0)")
    edges = edges.select("src", "dst").persist()
    nodes = (
        edges.select(F.col("src").alias("node_id"))
        .distinct()
        .localCheckpoint()
    )
    hub = nodes.select("node_id", F.lit(1.0).alias("h"))
    auth = None
    for _ in range(iterations):
        # auth(i) <- sum of hub over in-neighbors of i
        a_raw = (
            edges.join(hub.withColumnRenamed("node_id", "src"), "src")
            .groupBy(F.col("dst").alias("node_id"))
            .agg(F.sum("h").alias("a"))
        )
        auth = (
            nodes.join(a_raw, "node_id", "left")
            .select("node_id", F.coalesce("a", F.lit(0.0)).alias("a"))
            .crossJoin(a_raw.agg(F.max("a").alias("amax")))
            .select("node_id", (F.col("a") / F.col("amax")).alias("a"))
            .localCheckpoint()
        )
        # hub(i) <- sum of (new) auth over out-neighbors of i
        h_raw = (
            edges.join(auth.withColumnRenamed("node_id", "dst"), "dst")
            .groupBy(F.col("src").alias("node_id"))
            .agg(F.sum("a").alias("h"))
        )
        hub = (
            nodes.join(h_raw, "node_id", "left")
            .select("node_id", F.coalesce("h", F.lit(0.0)).alias("h"))
            .crossJoin(h_raw.agg(F.max("h").alias("hmax")))
            .select("node_id", (F.col("h") / F.col("hmax")).alias("h"))
            .localCheckpoint()
        )
    edges.unpersist()
    return auth.join(hub, "node_id").select(
        "node_id", F.col("a").alias("auth"), F.col("h").alias("hub")
    )


def hits_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked entry: K=2 HITS over the same symmetrized
    supplier↔customer graph pagerank walks, 9-dp rounded."""
    for t in ("lineitem", "orders"):
        spark.read.parquet(
            os.path.join(sf_dir, f"{t}.parquet")
        ).createOrReplaceTempView(t)
    out = hits(spark.sql(EDGES_SQL))
    return out.select(
        "node_id",
        F.round("auth", 9).alias("auth"),
        F.round("hub", 9).alias("hub"),
    )


def hits_duck(iterations: int = HITS_ITERATIONS) -> str:
    """The same K rounds unrolled as CTEs (exact same arithmetic,
    including the order-independent max normalization)."""
    ctes = [
        f"links AS ({_LINKS})",
        f"""edges AS (
  SELECT s AS src, c + {_CUST_OFFSET} AS dst FROM links
  UNION ALL
  SELECT c + {_CUST_OFFSET} AS src, s AS dst FROM links
)""",
        "nodes AS (SELECT DISTINCT src AS node_id FROM edges)",
        "h0 AS (SELECT node_id, 1.0 AS h FROM nodes)",
    ]
    for k in range(1, iterations + 1):
        ctes.append(f"""a{k}r AS (
  SELECT e.dst AS node_id, sum(p.h) AS a
  FROM edges e JOIN h{k - 1} p ON p.node_id = e.src
  GROUP BY e.dst
)""")
        ctes.append(f"""a{k} AS (
  SELECT v.node_id,
         coalesce(r.a, 0.0) / (SELECT max(a) FROM a{k}r) AS a
  FROM nodes v LEFT JOIN a{k}r r ON r.node_id = v.node_id
)""")
        ctes.append(f"""h{k}r AS (
  SELECT e.src AS node_id, sum(p.a) AS h
  FROM edges e JOIN a{k} p ON p.node_id = e.dst
  GROUP BY e.src
)""")
        ctes.append(f"""h{k} AS (
  SELECT v.node_id,
         coalesce(r.h, 0.0) / (SELECT max(h) FROM h{k}r) AS h
  FROM nodes v LEFT JOIN h{k}r r ON r.node_id = v.node_id
)""")
    k = iterations
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT a.node_id, round(a.a, 9) AS auth, round(h.h, 9) AS hub
FROM a{k} a JOIN h{k} h ON a.node_id = h.node_id"""
    )


# ---------------------------------------------------------------------------
# Weakly-connected components of the strong link graph (site/mirror
# clustering). A crawl frontier groups hosts into mirror/farm clusters
# by strong link evidence before scheduling (Kumar et al. WWW'99
# trawling; same operator family as operators/cluster.py's near-dup
# components — this entry applies the identical min-label-propagation
# machinery to the LINK graph instead of the dedup-pair graph).
# "Strong" = edge weight (co-occurrence count) >= WCC_MIN_LINKS: the
# unthresholded bipartite graph is one giant component (measured: 1
# component at >=1..3, 73 components over 254 nodes at >=4 on sf0.01)
# — thresholding is what makes the clustering informative, exactly as
# in trawling. Spark shape: one co-partitionable join+agg per round,
# lineage-truncated (cluster.connected_components); DuckDB oracle is
# the recursive-CTE transitive closure over the same thresholded edge
# SQL.
# ---------------------------------------------------------------------------

WCC_MIN_LINKS = 4

# weighted link relation (weight = co-occurrence count); thresholding
# happens in the shared connected_components(min_weight=...) entry
# point so near-dup and link clustering run the identical operator
_LINKS_STRONG = f"""
SELECT l.l_suppkey AS s, o.o_custkey AS c
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2 HAVING count(*) >= {WCC_MIN_LINKS}
"""

_EDGES_WEIGHTED = f"""
SELECT l.l_suppkey AS doc_a, o.o_custkey + {_CUST_OFFSET} AS doc_b,
       count(*) AS weight
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2
"""


def wcc_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    from . import cluster

    for t in ("lineitem", "orders"):
        spark.read.parquet(
            os.path.join(sf_dir, f"{t}.parquet")
        ).createOrReplaceTempView(t)
    # one weighted relation, evaluated once: the threshold is applied
    # through the shared min_weight entry point and the node set is
    # derived from the SAME checkpointed frame (a second spark.sql of
    # the aggregation would re-run the lineitem⋈orders join and put
    # the threshold rule in two places that could drift)
    weighted = spark.sql(_EDGES_WEIGHTED).localCheckpoint(eager=False)
    strong = weighted.filter(F.col("weight") >= WCC_MIN_LINKS)
    nodes = (
        strong.select(F.col("doc_a").alias("doc_id"))
        .union(strong.select("doc_b"))
        .distinct()
    )
    comps = cluster.connected_components(
        nodes, weighted, min_weight=WCC_MIN_LINKS
    )
    sizes = comps.groupBy("comp_id").agg(F.count("*").alias("comp_size"))
    return (
        comps.join(sizes, "comp_id")
        .select(F.col("doc_id").alias("node_id"), "comp_id", "comp_size")
    )


def wcc_duck() -> str:
    return f"""
WITH RECURSIVE links AS ({_LINKS_STRONG}),
edges AS (SELECT s AS src, c + {_CUST_OFFSET} AS dst FROM links
          UNION SELECT c + {_CUST_OFFSET}, s FROM links),
nodes AS (SELECT DISTINCT src AS v FROM edges),
reach(root, v) AS (
  SELECT v, v FROM nodes
  UNION
  SELECT r.root, e.dst FROM reach r JOIN edges e ON e.src = r.v),
comp AS (SELECT root AS node_id, min(v) AS comp_id FROM reach GROUP BY root),
sizes AS (SELECT comp_id, count(*) AS comp_size FROM comp GROUP BY comp_id)
SELECT c.node_id, c.comp_id, s.comp_size
FROM comp c JOIN sizes s ON c.comp_id = s.comp_id
"""

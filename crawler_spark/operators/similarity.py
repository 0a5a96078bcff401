"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: exact baseline, window top-k per query —
  SQL-expressible in both engines (DuckDB oracle cross-checks values).
- IVF-bucketed ANN: the scale path. A deterministic codebook (the C
  lowest-vec_id vectors) partitions the corpus by nearest centroid;
  queries probe the `nprobe` nearest centroids only, so the pair join
  touches ~nprobe/C of the corpus instead of all of it. At 10^10
  vectors the probe join shuffles (centroid_id, vec) co-partitioned by
  centroid — the classic IVF-flat layout. Spark-only (the partition-
  pruning semantics are the point; a pytest verifies recall vs brute).

Ordering determinism: ranking uses round(cos, 6) DESC with vec_id as
the tie-break so both engines select identical top-k sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

_SPARK_DOT = (
    "aggregate(zip_with(qv, v, (x, y) -> x * y), cast(0.0 as double),"
    " (acc, x) -> acc + x)"
)

N_QUERIES = 8
TOP_K = 5


def brute_topk_spark(k: int = TOP_K, n_queries: int = N_QUERIES) -> str:
    return f"""
WITH e AS (SELECT vec_id, transform(embedding, x -> cast(x as double)) AS v,
                  sqrt(aggregate(transform(embedding, x -> cast(x as double)),
                       cast(0.0 as double), (acc, x) -> acc + x * x)) AS nrm
           FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM e
      WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id,
         aggregate(zip_with(q.qv, e.v, (x, y) -> x * y),
                   cast(0.0 as double), (acc, x) -> acc + x) / (q.qn * e.nrm)
           AS cos
  FROM q JOIN e ON q.query_id != e.vec_id),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(cos, 6) DESC, vec_id) AS rk
  FROM scored)
SELECT query_id, vec_id, rk AS rank, round(cos, 4) AS cos_sim
FROM ranked WHERE rk <= {k}
"""


def brute_topk_duck(k: int = TOP_K, n_queries: int = N_QUERIES) -> str:
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v,
                  sqrt(list_dot_product(
                    list_transform(embedding, x -> x::DOUBLE),
                    list_transform(embedding, x -> x::DOUBLE))) AS nrm
           FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM e
      WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_dot_product(q.qv, e.v) / (q.qn * e.nrm) AS cos
  FROM q JOIN e ON q.query_id != e.vec_id),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(cos, 6) DESC, vec_id) AS rk
  FROM scored)
SELECT query_id, vec_id, rk AS rank, round(cos, 4) AS cos_sim
FROM ranked WHERE rk <= {k}
"""


def ann_ivf_duck(
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
) -> str:
    """Exact DuckDB transcription of ``ann_ivf``. The whole pipeline is
    deterministic (lowest-vec_id codebook, 6-dp-rounded orderings with
    cid/vec_id tie-breaks), and ``list_dot_product`` reproduces Spark's
    sequential ``aggregate(zip_with(...))`` fold bit-for-bit (proven by
    the hash-green brute-force pair), so even the APPROXIMATE path is
    value-checkable, not just recall-bounded."""
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v,
                  sqrt(list_dot_product(
                    list_transform(embedding, x -> x::DOUBLE),
                    list_transform(embedding, x -> x::DOUBLE))) AS nrm
           FROM embeddings),
cents AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM e
          ORDER BY vec_id LIMIT {n_centroids}),
assigned AS (
  SELECT vec_id, v, nrm, cid FROM (
    SELECT e.vec_id, e.v, e.nrm, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(list_dot_product(c.cv, e.v)
                            / (c.cn * e.nrm), 6) DESC, c.cid) AS rk
    FROM e CROSS JOIN cents c) WHERE rk = 1),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM e
      WHERE vec_id < {n_queries}),
probes AS (
  SELECT query_id, qv, qn, cid FROM (
    SELECT q.query_id, q.qv, q.qn, c.cid,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY round(list_dot_product(q.qv, c.cv)
                            / (q.qn * c.cn), 6) DESC, c.cid) AS rk
    FROM q CROSS JOIN cents c) WHERE rk <= {nprobe}),
scored AS (
  SELECT p.query_id, a.vec_id,
         list_dot_product(p.qv, a.v) / (p.qn * a.nrm) AS cos
  FROM probes p JOIN assigned a USING (cid)
  WHERE p.query_id != a.vec_id),
ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(cos, 6) DESC, vec_id) AS rk
  FROM scored)
SELECT query_id, vec_id, rk AS rank, round(cos, 4) AS cos_sim
FROM ranked WHERE rk <= {k}
"""


def ann_ivf(
    spark: SparkSession,
    embeddings: DataFrame,
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    """IVF-flat approximate top-k (Spark-only scale path).

    Codebook = the ``n_centroids`` lowest-vec_id vectors (deterministic,
    no RNG — 'training' is a first-pass sample at scale). Every vector
    is assigned to its nearest centroid (one broadcast join); a query
    scans only its ``nprobe`` nearest centroid buckets.
    """
    e = embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    ).withColumn(
        "nrm",
        F.expr(
            "sqrt(aggregate(v, cast(0.0 as double), (acc, x) -> acc + x * x))"
        ),
    )
    cents = (
        e.orderBy("vec_id")
        .limit(n_centroids)
        .select(
            F.col("vec_id").alias("cid"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
    )
    cos = F.expr(_SPARK_DOT) / (F.col("qn") * F.col("nrm"))
    # assignment: argmax-cos centroid per vector (broadcast codebook)
    assign_w = Window.partitionBy("vec_id").orderBy(
        F.round(F.col("cos"), 6).desc(), F.col("cid")
    )
    assigned = (
        e.crossJoin(F.broadcast(cents))
        .withColumn("cos", cos)
        .withColumn("rk", F.row_number().over(assign_w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "v", "nrm", "cid")
    )
    # query → nprobe nearest centroids
    queries = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos"), 6).desc(), F.col("cid")
    )
    probes = (
        queries.crossJoin(
            F.broadcast(
                cents.select("cid", F.col("qv").alias("v"), F.col("qn").alias("nrm"))
            )
        )
        .withColumn("cos", cos)
        .withColumn("rk", F.row_number().over(probe_w))
        .filter(F.col("rk") <= nprobe)
        .select("query_id", "qv", "qn", "cid")
    )
    # scan only the probed buckets (the IVF pruning join)
    rank_w = Window.partitionBy("query_id").orderBy(
        F.round(F.col("cos"), 6).desc(), F.col("vec_id")
    )
    return (
        probes.join(assigned, "cid")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            "rank",
            F.round(F.col("cos"), 4).alias("cos_sim"),
        )
    )

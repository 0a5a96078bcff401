"""Streaming-dep-free DuckDB oracle texts for the streaming wrappers.

These are pure SQL strings (no pandas, no pyspark.sql.streaming
imports), split out of :mod:`crawler_spark.streaming` so that building
the query registry — which embeds the politeness-rate oracle at
registration time — does not drag the streaming runtime into every
``import crawler_spark.queries`` (ADVICE r3: the lazy-import intent of
the ``_stream_*`` wrappers was defeated by evaluating the oracle at
module import).
"""

from __future__ import annotations

# urls released per host per trigger (k = politeness window / crawl
# delay). The streaming operator (_rate_update) and this oracle MUST
# agree; streaming.py imports this constant.
RATE_K = 2


URL_SEEN_DEDUP_DUCK = """
SELECT DISTINCT source || '.test' AS host,
       'https://' || source || '.test/doc/' || doc_id::VARCHAR AS url
FROM documents
"""


def politeness_rate_duck(k: int = RATE_K) -> str:
    """The closed-form waterfall: per host, queue = urls ordered by
    (batch, url) with every re-discovery occurrence its own element;
    trigger = position // k + 1. A host is only invoked on triggers
    whose micro-batch contains at least one of its urls (GroupState
    without timeout never fires for absent keys), so the release
    cutoff is k × (that host's participating batch count), not k × 3.

    PREMISE (asserted in politeness_rate_query before the stream runs):
    at every participating trigger t, the host's cumulative queue holds
    ≥ k·t urls, so each trigger releases exactly k. A host whose
    backlog dips below k while later batches still feed it would earn a
    different trigger_seq from the real operator — the wrapper fails
    loudly on that fixture instead of surfacing a parity mismatch."""
    return f"""
WITH u AS (
  SELECT source || '.test' AS host,
         'https://' || source || '.test/doc/' || doc_id::VARCHAR AS url,
         b.batch
  FROM documents
  CROSS JOIN (SELECT unnest([0, 1, 2]) AS batch) b
  WHERE b.batch = 0
     OR (b.batch = 1 AND doc_id % 3 = 0)
     OR (b.batch = 2 AND doc_id % 5 = 0)),
q AS (
  SELECT host, url,
         row_number() OVER (PARTITION BY host ORDER BY batch, url) - 1
           AS pos,
         count(DISTINCT batch) OVER (PARTITION BY host) AS n_trig
  FROM u)
SELECT host, url, cast(pos // {k} + 1 AS BIGINT) AS trigger_seq
FROM q WHERE pos < {k} * n_trig
"""

"""As-of join: match each event to the most recent PRIOR event of
another kind for the same key — the time-series operator Spark has no
built-in for (and the canonical crawl use: join each re-fetch of a URL
to the latest earlier capture to diff content / measure freshness;
Common Crawl carries many `warc_ts` captures per URL).

The reference has no time axis at all (each run re-crawls from config,
HZ.Crawler.DataSpider/Program.cs:20-38), so this is a scale extension,
not parity. Semantics are made engine-independent by a total order:
event B is "prior to" event A iff (B.ts, B.event_id) < (A.ts,
A.event_id) lexicographically.

Spark shape — NO join. A join-based as-of (a ⋈ b on key AND b.ts < a.ts
→ rank) explodes to |a|·|b| rows per key before the rank prunes it; at
10^10 rows that plan is dead. Instead: union both sides (they already
live in one table here), ONE shuffle on the key, and a running
``last(..., ignorenulls=True)`` over the (ts, event_id)-ordered window
ending at the previous row carries the latest left-side row forward to
each right-side row. O(n log n) per partition, single Exchange, no
blow-up on hot keys — asserted by tests/test_asof.py's plan check.

DuckDB oracle is the INDEPENDENT formulation (join + row_number prune),
so the check is cross-engine and cross-algorithm.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

LEFT_KIND = "click"  # the "quote"/earlier-capture side
RIGHT_KIND = "purchase"  # the "trade"/re-fetch side


def asof_join(
    events: DataFrame,
    left_kind: str = LEFT_KIND,
    right_kind: str = RIGHT_KIND,
) -> DataFrame:
    """events: (event_id, ts, user_id, event_type). Returns one row per
    right_kind event with the most recent strictly-prior left_kind
    event of the same user (NULLs when none), LEFT-join semantics.
    """
    ev = events.select("event_id", "ts", "user_id", "event_type").where(
        F.col("event_type").isin(left_kind, right_kind)
    )
    is_left = F.col("event_type") == left_kind
    # strictly-prior window: ends one row before current, so a left row
    # at the same sort position as the right row is included only when
    # its (ts, event_id) orders earlier — the documented total order
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        ev.withColumn(
            "asof_id",
            F.last(F.when(is_left, F.col("event_id")), ignorenulls=True).over(w),
        )
        .withColumn(
            "asof_ts",
            F.last(F.when(is_left, F.col("ts")), ignorenulls=True).over(w),
        )
        .where(F.col("event_type") == right_kind)
        # ms epochs, not raw timestamps: the driver's value hash must
        # agree byte-for-byte with DuckDB (same device as w1/w2).
        # LEFT-join misses surface as the -1 sentinel, not NULL — NULLs
        # don't total-order in the comparison harnesses
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.unix_millis(F.col("ts").cast("timestamp")).alias(
                "purchase_ts_ms"
            ),
            F.coalesce(F.col("asof_id"), F.lit(-1)).alias("click_id"),
            F.coalesce(
                F.unix_millis(F.col("asof_ts").cast("timestamp")),
                F.lit(-1),
            ).alias("click_ts_ms"),
        )
    )


def asof_join_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return asof_join(events)


def asof_duck() -> str:
    # independent algorithm: pair join + row_number prune (fine at
    # oracle SF; the Spark side is the plan that survives 10^10 rows)
    return f"""
WITH a AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = '{RIGHT_KIND}'),
     b AS (SELECT event_id, user_id, ts FROM events
           WHERE event_type = '{LEFT_KIND}'),
     m AS (
       SELECT a.event_id AS purchase_id, a.user_id,
              epoch_ms(a.ts) AS purchase_ts_ms,
              coalesce(b.event_id, -1) AS click_id,
              coalesce(epoch_ms(b.ts), -1) AS click_ts_ms,
              row_number() OVER (
                PARTITION BY a.event_id
                ORDER BY b.ts DESC, b.event_id DESC) AS rn
       FROM a LEFT JOIN b
         ON a.user_id = b.user_id
        AND (b.ts < a.ts OR (b.ts = a.ts AND b.event_id < a.event_id)))
SELECT purchase_id, user_id, purchase_ts_ms, click_id, click_ts_ms
FROM m WHERE rn = 1
"""

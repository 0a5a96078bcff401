#!/usr/bin/env python
"""spark-submit entry point for the crawl engine.

Usage (the production invocation shape from the north rule):

  zip -r /tmp/crawler_spark.zip crawler_spark
  spark-submit --master local[32] --py-files /tmp/crawler_spark.zip \\
      scripts/run_crawl.py --pages .../pages.parquet --seeds .../seeds.parquet \\
      --robots .../robots.parquet --state /tmp/state --budget-ms 3600000

Prints one JSON line with pages fetched, wall seconds and pages/sec —
the scaling study runs this at two parallelism levels on the same input
and reports the efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", default=None)
    ap.add_argument(
        "--pages-warc",
        action="store_true",
        default=False,
        help="treat --pages as a directory of .warc/.warc.gz archives "
        "(Common-Crawl layout); ingested once to <state>/pages-ingest "
        "parquet (crawler_spark.warc), then crawled from there",
    )
    ap.add_argument("--seeds", default=None)
    ap.add_argument(
        "--robots",
        default=None,
        help="politeness table parquet (host, crawl_delay_ms, "
        "disallow_prefixes), or with --robots-raw a parquet of raw "
        "bodies (host, robots_txt) parsed in-engine",
    )
    ap.add_argument(
        "--robots-raw",
        action="store_true",
        default=False,
        help="treat --robots as raw robots.txt bodies and parse them "
        "(crawler_spark.robots.parse_robots_txt, RFC 9309 semantics)",
    )
    ap.add_argument("--robots-agent", default="crawler-spark")
    ap.add_argument("--state", required=True)
    ap.add_argument("--budget-ms", type=int, default=3_600_000)
    ap.add_argument("--max-k", type=int, default=500_000)
    ap.add_argument("--max-supersteps", type=int, default=60)
    ap.add_argument("--bloom-bits", type=int, default=1 << 21)
    ap.add_argument("--stop-frontier-below", type=int, default=0)
    ap.add_argument(
        "--adaptive-budget",
        action="store_true",
        default=False,
        help="widen the simulated politeness window when batches are "
        "tiny (same per-host rate, far fewer barriers on long tails)",
    )
    ap.add_argument("--adaptive-min-batch", type=int, default=5_000)
    ap.add_argument(
        "--fresh",
        action="store_true",
        default=False,
        help="wipe the state dir; omit to resume from its manifest",
    )
    ap.add_argument(
        "--priority",
        default=None,
        help="optional (url, score) parquet — link-authority frontier "
        "ordering (PageRank/HITS from operators/graph.py over a prior "
        "crawl's link graph); per-host selection becomes score DESC "
        "with discovery order as tie-break",
    )
    ap.add_argument(
        "--record-links",
        action="store_true",
        default=False,
        help="persist every discovered (src_url, dst_url, kind) edge "
        "to the 'links' state table — the input --compute-priority "
        "ranks (one extra small delta write per superstep)",
    )
    ap.add_argument(
        "--compute-priority",
        choices=("pagerank", "hits"),
        default=None,
        help="instead of crawling: rank the link graph recorded in "
        "--state (a prior --record-links crawl) and write the "
        "(url, score) parquet --priority consumes to --priority-out. "
        "Closes the crawl → rank → recrawl loop on the engine's own "
        "graph (Cho/Garcia-Molina/Page ordering).",
    )
    ap.add_argument("--priority-out", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from crawler_spark.engine import CrawlEngine, EngineConfig

    # retain Python workers across the superstep's UDF stages (see
    # crawler_spark/session.py for the measured fork-storm cost)
    spark = (
        SparkSession.builder.config(
            "spark.python.factory.idleWorkerMaxPoolSize", "64"
        ).getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    if args.compute_priority:
        from crawler_spark.authority import compute_priority_scores

        if not args.priority_out:
            ap.error("--compute-priority requires --priority-out")
        scores = compute_priority_scores(
            spark, args.state, method=args.compute_priority
        )
        scores.write.mode("overwrite").parquet(args.priority_out)
        n = spark.read.parquet(args.priority_out).count()
        print(json.dumps({
            "priority_out": args.priority_out,
            "method": args.compute_priority,
            "urls_scored": n,
        }))
        return
    for req in ("pages", "seeds", "robots"):
        if getattr(args, req) is None:
            ap.error(f"--{req} is required when crawling")

    pages_path = args.pages
    if args.pages_warc:
        from crawler_spark.warc import pages_from_warc

        # one-shot ingest (the CC→table ETL step); idempotent per state
        # dir, overwritten on --fresh re-runs
        pages_path = os.path.join(args.state + "-ingest", "pages.parquet")
        if args.fresh or not os.path.exists(pages_path):
            pages_from_warc(spark, args.pages).write.mode(
                "overwrite"
            ).parquet(pages_path)

    robots_df = None
    if args.robots_raw:
        from crawler_spark.robots import parse_robots_txt

        cfg_default_delay = EngineConfig().default_crawl_delay_ms
        robots_df = parse_robots_txt(
            spark.read.parquet(args.robots),
            agent=args.robots_agent,
            default_crawl_delay_ms=cfg_default_delay,
        ).drop("allow_prefixes", "sitemap_urls")

    eng = CrawlEngine(
        spark,
        pages_path=pages_path,
        seeds_path=args.seeds,
        robots_path=args.robots,
        state_dir=args.state,
        robots_df=robots_df,
        priority_df=(
            spark.read.parquet(args.priority) if args.priority else None
        ),
        config=EngineConfig(
            budget_ms=args.budget_ms,
            max_k=args.max_k,
            bloom_bits=args.bloom_bits,
            stop_when_frontier_below=args.stop_frontier_below,
            adaptive_budget=args.adaptive_budget,
            adaptive_min_batch=args.adaptive_min_batch,
            record_links=args.record_links,
        ),
        fresh=args.fresh,
    )
    def _vm_cpu_sec() -> float:
        # machine-wide user+system CPU-seconds (see run_extract.py):
        # steal/clock-noise-immune complement to wall-clock throughput
        with open("/proc/stat") as f:
            parts = f.readline().split()
        return (int(parts[1]) + int(parts[3])) / 100.0

    c0 = _vm_cpu_sec()
    t0 = time.monotonic()
    summary = eng.run(max_supersteps=args.max_supersteps)
    wall = time.monotonic() - t0
    cpu = _vm_cpu_sec() - c0
    phase_log = os.environ.get("CRAWL_PHASE_LOG")
    if phase_log and phase_log != "1":
        # a path: write per-superstep records there. PythonRunner merges
        # the driver's stderr into spark-submit's STDOUT, so stream-based
        # capture silently loses these lines to stdout-pipe consumers —
        # a file sidesteps the plumbing entirely.
        with open(phase_log, "w") as fh:
            for st in summary["steps"]:
                fh.write(json.dumps(st) + "\n")
    elif phase_log:
        for st in summary["steps"]:
            print(json.dumps(st), file=sys.stderr)
    print(
        json.dumps(
            {
                "pages_fetched": summary["pages_fetched"],
                "supersteps": summary["supersteps"],
                "frontier_rows_left": summary["frontier_rows"],
                "wall_sec": round(wall, 2),
                "pages_per_sec": round(summary["pages_fetched"] / wall, 1),
                "cpu_sec": round(cpu, 2),
                "parallelism": spark.sparkContext.defaultParallelism,
            }
        )
    )


if __name__ == "__main__":
    main()

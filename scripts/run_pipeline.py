"""spark-submit entry for the training-data curation pipeline.

    spark-submit --master local[16] --py-files /tmp/crawler_spark.zip \
        scripts/run_pipeline.py --docs <documents.parquet> \
        --out /tmp/train-shards

Prints ONE JSON line with per-stage row accounting.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet path "
                    "(or a WET archive dir with --docs-wet)")
    ap.add_argument(
        "--docs-wet", action="store_true",
        help="treat --docs as a directory of Common-Crawl WET archives "
             "(*.warc.wet.gz extracted-text records) — the crawl-free "
             "CC-to-training-data path (crawler_spark.warc."
             "documents_from_wet)",
    )
    ap.add_argument("--out", required=True, help="output shard directory")
    ap.add_argument(
        "--fresh", action="store_true",
        help="wipe committed stage checkpoints and recompute from scratch "
             "(default: resume after the last committed stage)",
    )
    ap.add_argument(
        "--dsir-keep-permille", type=int, default=None,
        help="optional DSIR importance gate: keep the top N permille of "
             "CCNet survivors by hashed-unigram importance weight",
    )
    ap.add_argument(
        "--paragraph-dedup", action="store_true",
        help="optional CCNet paragraph-level dedup between exact and "
             "near-dup dedup: rewrite each doc to its corpus-wide "
             "first-occurrence paragraphs (boilerplate removal)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from crawler_spark.pipeline import run_training_pipeline

    spark = (
        SparkSession.builder.appName("training-pipeline")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    if args.fresh:
        import shutil

        shutil.rmtree(os.path.join(args.out, "stages"), ignore_errors=True)
    t0 = time.monotonic()
    if args.docs_wet:
        from crawler_spark.warc import documents_from_wet

        docs = documents_from_wet(spark, args.docs).drop("url", "warc_ts")
    else:
        docs = spark.read.parquet(args.docs)
    _, counts = run_training_pipeline(
        spark, docs, out_dir=args.out,
        dsir_keep_permille=args.dsir_keep_permille,
        paragraph_dedup=args.paragraph_dedup,
    )
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "stages": counts,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(counts["input"] / wall, 1),
                "out": os.path.join(args.out, "packed"),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Training-op scaling probe: run the heavy corpus operators on a
deterministically synthesized documents table far above the sf0.1 gate
size, at two parallelism levels (N and 4N cores), and print one JSON
line per (level) with per-op wall seconds — the data-op complement to
the crawl-loop matrix (scripts/loop_matrix.py).

The corpus is generated INSIDE Spark from pure Catalyst expressions
(md5-seeded word selection — no Python per row, no external data):
~`n_docs` docs, 40-200 words each from a 4096-word pool, with 2% exact
duplicates and 3% near-duplicates (one word substituted every 16
positions) so the dedup operators have real work to do.

Usage:
    python scripts/ops_scale.py N_DOCS CORES [CORES...] [--stopwords]
    (e.g. python scripts/ops_scale.py 100000 4 16)

--stopwords mixes a deterministic English stopword into every 6th
position. That corpus is HARDER for the LSH dedups (shared shingles
correlate fingerprints -> more band collisions, like real boilerplate)
and is the one the quality gates pass, so the end-to-end pipeline demo
(scripts/run_pipeline.py) uses it; the BENCH.md per-op table uses the
default (pure-random) corpus. Both are fully deterministic.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# embedding-path ops probe the 100k-VECTOR regime (synthetic
# embeddings.parquet generated next to the docs; the sf tables top out
# at 2k vectors, far below where the LSH/IVF bucketing earns its keep —
# exactly how the 4-bit LSH blow-up stayed hidden until the r3 probe).
# ann_ivf_topk_256 is the build-once/probe-millions serving shape: its
# build pass is n x 256 cosines, so its wall here is dominated by
# codebook build, not probing — read it against ann_ivf_topk, not as a
# regression (BENCH.md r3 framing).
OPS_EMB = [
    "dedup_embedding_lsh_hi",
    "ann_ivf_topk",
    "ann_ivf_topk_256",
]

OPS = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_banded_m2",
    "text_pack_sequences",
    "sketch_hll_vocab",
    "text_unigram_logprob",
    "text_tfidf_topk",
    "text_gopher_rules",
    "text_word_entropy",
    "sample_importance",
    "sample_weighted_priority",
    "dedup_containment",
    "dedup_paragraph",
    "text_bigram_pmi",
    "sketch_hll_union",
]

# 64-dim md5-seeded unit-free embeddings in [-1, 1]; 2% planted exact
# duplicates (same seed) so the near-dup path has real positives
EMB_GEN_SQL = """
SELECT id AS vec_id,
       transform(sequence(1, 64),
         i -> cast((cast(conv(substring(md5(concat(
                cast(CASE WHEN pmod(id, 50) = 1 THEN id - 1 ELSE id END
                     AS string), ':e', cast(i AS string))), 1, 8),
                16, 10) AS bigint) %% 2000001 - 1000000) / 1000000.0
              AS float)) AS embedding,
       cast(pmod(id, 10) AS int) AS label
FROM range(0, %s)
"""

GEN_SQL = """
-- {stopwords}: '1=1' mixes stopwords in, '1=0' leaves pure-random text
SELECT doc_id,
       base_text AS text,
       array('en','de','fr','es','zh')[pmod(doc_id, 5)] AS lang,
       concat('src', pmod(doc_id, 8)) AS source,
       length(base_text) AS n_chars
FROM (
  SELECT doc_id, seed_id,
         array_join(transform(sequence(1, 40 + pmod(seed_id * 2654435761, 161)),
           i -> CASE WHEN {stopwords} AND pmod(i, 6) = 0 THEN
                  element_at(array('the','and','of','to','a','is','in','it'),
                    cast(pmod(seed_id + i, 8) + 1 AS int))
                ELSE
                  concat('w', pmod(cast(conv(substring(md5(concat(
                    cast(seed_id AS string), ':', cast(i AS string))), 1, 8),
                    16, 10) AS bigint)
                    + CASE WHEN near_dup AND pmod(i, 16) = 0
                      THEN 1 ELSE 0 END,
                    4096))
                END), ' ') AS base_text
  FROM (
    SELECT id AS doc_id,
           CASE WHEN pmod(id, 50) = 1 THEN id - 1       -- exact dup
                WHEN pmod(id, 33) = 2 THEN id - 2       -- near dup base
                ELSE id END AS seed_id,
           pmod(id, 33) = 2 AS near_dup
    FROM range(0, {n})
  )
)
"""


def run_level(n_docs: int, cores: int, docs_path: str,
              stopwords: str = '1=0') -> dict:
    from pyspark.sql import SparkSession

    from crawler_spark.queries import all_queries

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"ops-scale-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    if not os.path.exists(docs_path):
        spark.sql(
            GEN_SQL.format(n=n_docs, stopwords=stopwords)
        ).repartition(64).write.parquet(docs_path)
    sf_dir = os.path.dirname(docs_path)
    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(emb_path):
        spark.sql(EMB_GEN_SQL % n_docs).repartition(64).write.parquet(
            emb_path
        )
    # warm the page cache / JVM before timing (the first op otherwise
    # absorbs parquet cold-read + codegen warmup and skews one level)
    spark.read.parquet(docs_path).count()
    spark.read.parquet(emb_path).count()
    qs = all_queries()
    out: dict[str, float] = {}
    total0 = time.monotonic()
    for name in OPS + OPS_EMB:
        t0 = time.monotonic()
        n = qs[name].run(spark, sf_dir).count()
        out[name] = round(time.monotonic() - t0, 2)
        print(f"  {name}: {out[name]}s ({n} rows)", file=sys.stderr)
    wall = round(time.monotonic() - total0, 2)
    spark.stop()
    return {
        "n_docs": n_docs,
        "cores": cores,
        "ops_sec": out,
        "total_sec": wall,
        "docs_per_sec": round(n_docs * len(OPS) / wall, 1),
    }


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--stopwords"]
    sw = "1=1" if "--stopwords" in sys.argv else "1=0"
    n_docs = int(args[0])
    levels = [int(x) for x in args[1:]]
    suffix = "-sw" if sw == "1=1" else ""
    docs_path = f"/tmp/ops-scale-{n_docs}{suffix}/documents.parquet"
    os.makedirs(os.path.dirname(docs_path), exist_ok=True)
    results = []
    for cores in levels:
        # fresh JVM per level via subprocess would be cleaner; pinning
        # with taskset keeps levels honest inside one process run
        r = subprocess.run(
            [
                "taskset", "-c", f"0-{cores - 1}",
                sys.executable, "-c",
                "import sys; sys.path.insert(0, %r); "
                "from scripts.ops_scale import run_level; import json; "
                "print('RESULT ' + json.dumps(run_level(%d, %d, %r, %r)))"
                % (REPO, n_docs, cores, docs_path, sw),
            ],
            capture_output=True, text=True,
        )
        line = [
            ln for ln in r.stdout.splitlines() if ln.startswith("RESULT ")
        ]
        if not line:
            print(r.stdout[-2000:], r.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"level {cores} failed")
        results.append(json.loads(line[0][7:]))
        print(json.dumps(results[-1]))
    if len(results) >= 2:
        a, b = results[0], results[-1]
        speedup = a["total_sec"] / b["total_sec"]
        eff = speedup / (b["cores"] / a["cores"])
        print(json.dumps({
            "speedup": round(speedup, 2),
            "efficiency": round(eff, 3),
            "levels": [r["cores"] for r in results],
        }))


if __name__ == "__main__":
    main()

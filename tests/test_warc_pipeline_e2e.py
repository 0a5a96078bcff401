"""WARC → curation pipeline end-to-end (VERDICT r4 #7): the actual
100 TB ingest-to-training-data path — Common-Crawl-style archives in,
packed LM shards + CDX index of the survivor set out — exercising the
schema seam between ``warc.pages_from_warc`` and
``pipeline.run_training_pipeline`` that the per-module suites never
cross together."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from crawler_spark.cdx import read_cdx, write_cdx
from crawler_spark.pipeline import run_training_pipeline
from crawler_spark.warc import pages_from_warc

from test_warc import _record

_WORDS = (
    "the quick brown fox jumps over a lazy dog and then runs back "
    "to the old stone bridge where many small birds sing in the "
    "early morning light while the river flows past green fields"
).split()


def _doc_text(i: int, boiler: bool) -> str:
    # >=50 words, alpha-heavy, stopword-rich (passes the Gopher gate);
    # doc-specific lead sentence keeps exact-dedup non-trivial, the
    # shared boilerplate paragraph feeds the paragraph-dedup stage
    rot = _WORDS[i % len(_WORDS):] + _WORDS[: i % len(_WORDS)]
    # vary the word BAG per doc (not just the order): the DSIR stage
    # scores hashed-unigram distributions, so identical bags would tie
    # every importance score and the 600-permille gate would keep all
    body = (
        " ".join(rot)
        + f" section {i} of the corpus archive and then "
        + " ".join(rot[: 20 + (i * 7) % 16])
    )
    para2 = "subscribe to our newsletter for updates and offers today"
    return body + ("\n" + para2 if boiler else "")


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc-pipe")
    docs = []
    for i in range(40):
        host = "alpha.test" if i % 2 == 0 else "beta.test"
        url = f"https://{host}/doc/{i}"
        if 30 <= i < 34:
            text = _doc_text(i - 30, boiler=False)  # exact dups of 0-3
        elif i >= 36:
            text = "too short to survive"  # quality-gate casualties
        else:
            text = _doc_text(i, boiler=(i % 3 == 0))
        docs.append((i, url, text))
    # two archives → multi-file parallel ingest through the same seam
    for part in range(2):
        members = []
        for i, url, text in docs:
            if i % 2 != part:
                continue
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
                + text.encode()
            )
            members.append(
                gzip.compress(
                    _record(
                        "response",
                        url,
                        payload,
                        date=f"2025-03-01T12:{i:02d}:00Z",
                    )
                )
            )
        (d / f"part-{part}.warc.gz").write_bytes(b"".join(members))
    return str(d)


def _documents_from_warc(spark, warc_dir):
    """The ingest seam: archive bytes → pages table → the pipeline's
    documents schema (doc_id, text, lang, source, n_chars), all
    JVM-side column work. doc_id comes from the url (stable under any
    scan order); text is the HTTP payload the WARC reader already
    separated from its headers."""
    pages = pages_from_warc(spark, warc_dir)
    return pages.select(
        F.regexp_extract("url", r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        F.col("url"),
        F.col("warc_ts"),
        F.decode(F.col("html"), "UTF-8").alias("text"),
        # two language slices: DSIR importance is measured against the
        # 'en' target slice, so a single-language corpus would tie
        # every score at 0 and the gate would keep everything
        F.when(F.col("url").contains("alpha"), F.lit("en"))
        .otherwise(F.lit("fr"))
        .alias("lang"),
        F.regexp_extract("url", r"https://([^./]+)", 1).alias("source"),
        F.length(F.decode(F.col("html"), "UTF-8")).alias("n_chars"),
    )


def test_warc_to_training_shards_end_to_end(spark, warc_dir, tmp_path):
    docs = _documents_from_warc(spark, warc_dir)
    n_records = docs.count()
    assert n_records == 40  # every response record crossed the seam
    # html payloads arrive headerless (the reader's job, not ours)
    assert docs.where("text LIKE 'HTTP/1.1%'").count() == 0

    packed, counts = run_training_pipeline(
        spark,
        docs.drop("url", "warc_ts"),
        out_dir=str(tmp_path / "out1"),
        dsir_keep_permille=600,
        paragraph_dedup=True,
    )
    # row accounting: monotone through every stage, each stage
    # non-vacuous on this corpus by construction
    order = [
        "input", "quality_gate", "exact_dedup", "paragraph_dedup",
        "near_dup_dedup", "ccnet_gate", "dsir_gate", "packed_docs",
    ]
    assert [k for k in order if k in counts] == order, counts
    vals = [counts[k] for k in order]
    assert vals == sorted(vals, reverse=True), counts
    assert counts["input"] == 40
    assert counts["quality_gate"] < counts["input"]  # short docs die
    assert counts["exact_dedup"] < counts["quality_gate"]  # dups die
    assert counts["dsir_gate"] < counts["ccnet_gate"]  # 600 permille
    assert counts["packed_docs"] == counts["dsir_gate"]
    assert counts["packed_docs"] > 0
    # the boilerplate paragraph survives in exactly ONE surviving doc
    survivors = packed.select("doc_id").distinct()
    boiler_docs = (
        spark.table("documents")
        .join(survivors, "doc_id")
        .where(F.col("text").contains("subscribe to our newsletter"))
        .count()
    )
    assert boiler_docs <= 1

    # determinism across independent runs: identical accounting AND
    # identical packed rows (shard layout included)
    packed2, counts2 = run_training_pipeline(
        spark,
        _documents_from_warc(spark, warc_dir).drop("url", "warc_ts"),
        out_dir=str(tmp_path / "out2"),
        dsir_keep_permille=600,
        paragraph_dedup=True,
    )
    assert counts2 == counts
    a = sorted(map(tuple, spark.read.parquet(
        str(tmp_path / "out1" / "packed")).collect()))
    b = sorted(map(tuple, spark.read.parquet(
        str(tmp_path / "out2" / "packed")).collect()))
    assert a == b

    # CDX export of the survivor set → read back → same captures
    caps = (
        _documents_from_warc(spark, warc_dir)
        .join(survivors, "doc_id")
        .select("url", "warc_ts")
    )
    cdx_dir = str(tmp_path / "cdx")
    write_cdx(caps, cdx_dir)
    back = read_cdx(spark, cdx_dir)
    got = sorted(
        (r.url, r.warc_ts) for r in back.collect()
    )
    want = sorted((r.url, r.warc_ts) for r in caps.collect())
    assert got == want

"""Edge-case document robustness: the text operators must stay
value-exact vs DuckDB on adversarial inputs the synthetic corpus never
produces — empty text, whitespace-only, one giant token, unicode/CJK,
punctuation soup, exact duplicates of edge docs. Round-1/2 lessons:
Spark 4 ANSI throws where DuckDB returns NULL, DuckDB list_sum([]) is
NULL where Spark aggregate() is 0 — this suite pins those seams on the
inputs most likely to hit them."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

_EDGE_TEXTS = [
    "",  # empty
    "   \t\n  ",  # whitespace only
    "x" * 5000,  # one giant token
    "the the the the the",  # pure repetition
    "你好世界 这是 中文 文本 你好",  # CJK
    "a b c d e f g h i j k l m n o p",  # many 1-char tokens
    "!!! ??? ... ### $$$ %%%",  # punctuation soup
    "the quick brown fox jumps over the lazy dog",  # normal
    "the quick brown fox jumps over the lazy dog",  # exact dup
    "mixed 中文 and english text with 123 numbers",
]

EDGE_DOCS = pd.DataFrame(
    {
        "doc_id": list(range(1, len(_EDGE_TEXTS) + 1)),
        "text": _EDGE_TEXTS,
        "lang": ["en"] * 4 + ["zh"] + ["en"] * 4 + ["mx"],
        "source": ["edge"] * len(_EDGE_TEXTS),
        # derived, not hand-maintained: ADVICE r2 caught stale literals
        # for the CJK and mixed rows
        "n_chars": [len(t) for t in _EDGE_TEXTS],
    }
)

# operators whose SQL reads only the documents table and is total on
# any text value (no per-query setup); each is (name, spark side, duck)
def _cases():
    from crawler_spark.operators import dedup, sketch, textstats

    return [
        ("token_count", textstats.TOKEN_COUNT_SPARK, textstats.TOKEN_COUNT_DUCK),
        ("quality", textstats.QUALITY_SPARK, textstats.QUALITY_DUCK),
        ("lang_id", textstats.lang_id_spark(), textstats.lang_id_duck()),
        ("gopher", textstats.gopher_rules_spark(), textstats.gopher_rules_duck()),
        ("repetition", textstats.repetition_spark(), textstats.repetition_duck()),
        ("fingerprint", textstats.fingerprint_spark(), textstats.fingerprint_duck()),
        ("simhash", dedup.simhash_fingerprints_spark(), dedup.simhash_fingerprints_duck()),
        ("exact_dedup", dedup.DEDUP_EXACT_SPARK, dedup.DEDUP_EXACT_DUCK),
        ("pack", textstats.PACK_SPARK, textstats.PACK_DUCK),
        ("pii", textstats.PII_SPARK, textstats.PII_DUCK),
        ("script_mix", textstats.script_mix_spark(),
         textstats.script_mix_duck()),
        ("boilerplate", textstats.boilerplate_spark(),
         textstats.boilerplate_duck()),
        # pure-SQL LSH form (the registered query uses the cached-view
        # twin of the same text); docs 8/9 are exact dups -> 1 pair
        ("minhash_lsh", dedup.minhash_lsh_spark(), dedup.minhash_lsh_duck()),
        ("ngram_jaccard", dedup.ngram_jaccard_spark(),
         dedup.ngram_jaccard_duck()),
        ("exact_substring", dedup.exact_substring_spark(),
         dedup.exact_substring_duck()),
        ("length_hist", textstats.LENGTH_HIST_SPARK,
         textstats.LENGTH_HIST_DUCK),
        ("word_entropy", textstats.word_entropy_spark(),
         textstats.word_entropy_duck()),
        ("balanced", textstats.SAMPLE_BALANCED_SPARK,
         textstats.SAMPLE_BALANCED_DUCK),
        ("importance", textstats.importance_spark(),
         textstats.importance_duck()),
    ]


@pytest.mark.parametrize("name,ssql,dsql", _cases(),
                         ids=[c[0] for c in _cases()])
def test_edge_docs_cross_engine(spark, name, ssql, dsql):
    sdf_src = spark.createDataFrame(EDGE_DOCS)
    sdf_src.createOrReplaceTempView("documents")
    got = spark.sql(ssql)
    srows = sorted(tuple(r) for r in got.collect())

    con = duckdb.connect()
    con.register("documents", EDGE_DOCS)
    drows = sorted(tuple(r) for r in con.execute(dsql).fetchall())
    assert len(srows) == len(drows), f"{name}: row counts differ"
    assert srows == drows, f"{name}: first diff {next((a, b) for a, b in zip(srows, drows) if a != b)}"


def test_edge_docs_minhash_finds_the_exact_dup_pair(spark):
    """Non-vacuity: the edge corpus contains one exact duplicate pair
    (docs 8 and 9), which LSH must surface."""
    from crawler_spark.operators import dedup

    spark.createDataFrame(EDGE_DOCS).createOrReplaceTempView("documents")
    pairs = {(r.doc_a, r.doc_b)
             for r in spark.sql(dedup.minhash_lsh_spark()).collect()}
    assert (8, 9) in pairs


def test_edge_docs_hll_sketch(spark):
    """The views-based HLL sketch on edge docs: zero-token docs carry
    the '' token nowhere (explode of [] emits no rows), so per-lang
    estimates still agree bit-for-bit with DuckDB."""
    from crawler_spark.operators import sketch

    spark.createDataFrame(EDGE_DOCS).createOrReplaceTempView("documents")
    views, final = sketch.hll_views_spark()
    for name, sql in views:
        spark.sql(sql).createOrReplaceTempView(name)
    srows = sorted(tuple(r) for r in spark.sql(final).collect())

    con = duckdb.connect()
    con.register("documents", EDGE_DOCS)
    drows = sorted(tuple(r) for r in con.execute(sketch.hll_duck()).fetchall())
    assert srows == drows and srows

"""Sitemap parsing + seed discovery (crawler_spark/sitemap.py)."""

from __future__ import annotations

import pytest

from crawler_spark.sitemap import parse_sitemap, sitemap_seeds

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://a.test/products?id=1&amp;lang=en</loc>
    <lastmod>2025-06-01</lastmod>
    <priority>0.8</priority>
  </url>
  <url><loc> https://a.test/about </loc></url>
  <url><loc><![CDATA[https://a.test/cdata?x=1]]></loc></url>
  <url><lastmod>2025-01-01</lastmod></url>
</urlset>"""

INDEX = """<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://b.test/sitemap-1.xml</loc><lastmod>2025-05-05</lastmod></sitemap>
  <sitemap><loc>https://b.test/sitemap-2.xml</loc></sitemap>
</sitemapindex>"""

MALFORMED = "<urlset><url><loc>https://c.test/ok</loc></url><url><loc>broken"


@pytest.fixture(scope="module")
def parsed(spark):
    raw = spark.createDataFrame(
        [("a.test", URLSET), ("b.test", INDEX), ("c.test", MALFORMED)],
        schema="host string, body string",
    )
    return parse_sitemap(raw).collect()


def test_urlset_entries(parsed):
    rows = sorted(
        (r for r in parsed if r["host"] == "a.test"), key=lambda r: r["pos"]
    )
    assert [r["kind"] for r in rows] == ["urlset"] * 3
    # entity unescape, whitespace trim, CDATA unwrap; loc-less entry dropped
    assert [r["loc"] for r in rows] == [
        "https://a.test/products?id=1&lang=en",
        "https://a.test/about",
        "https://a.test/cdata?x=1",
    ]
    assert rows[0]["lastmod"] == "2025-06-01"
    assert rows[0]["priority"] == pytest.approx(0.8)
    assert rows[1]["lastmod"] is None and rows[1]["priority"] is None


def test_sitemapindex_entries(parsed):
    rows = sorted(
        (r for r in parsed if r["host"] == "b.test"), key=lambda r: r["pos"]
    )
    assert [r["kind"] for r in rows] == ["sitemapindex"] * 2
    assert [r["loc"] for r in rows] == [
        "https://b.test/sitemap-1.xml",
        "https://b.test/sitemap-2.xml",
    ]


def test_malformed_tail_salvages_complete_entries(parsed):
    rows = [r for r in parsed if r["host"] == "c.test"]
    assert [r["loc"] for r in rows] == ["https://c.test/ok"]


def test_seeds_dedup_gate_and_priority(spark):
    raw = spark.createDataFrame(
        [
            (
                "a.test",
                "<urlset>"
                "<url><loc>https://a.test/dup#frag</loc><priority>0.3</priority></url>"
                "<url><loc>https://a.test/dup</loc><priority>0.9</priority></url>"
                "<url><loc>https://a.test/private/x</loc></url>"
                "</urlset>",
            )
        ],
        schema="host string, body string",
    )
    robots = spark.createDataFrame(
        [("a.test", 1000, ["/private/"])],
        schema="host string, crawl_delay_ms long, "
        "disallow_prefixes array<string>",
    )
    rows = sitemap_seeds(parse_sitemap(raw), robots).collect()
    # fragment stripped -> both dup entries canonicalize to one URL;
    # max priority wins; /private/ gated by robots
    assert len(rows) == 1
    r = rows[0]
    assert r["url"] == "https://a.test/dup"
    assert r["host"] == "a.test"
    assert r["priority"] == pytest.approx(0.9)


def test_plan_is_shuffle_free_map(spark):
    raw = spark.createDataFrame(
        [("a.test", URLSET)], schema="host string, body string"
    )
    plan = parse_sitemap(raw)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure per-row Generate/Project

"""M7: golden end-to-end crawl — the engine must reproduce the pure-Python
oracle's crawl order, url_seen set, entity tables, and byte-identical text
(SURVEY.md §5-2; BASELINE north_rule 'matching the reference's crawl
ordering and URL-seen set under the same seed list + politeness budget')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark import oracle
from crawler_spark.engine import CrawlEngine, EngineConfig
from crawler_spark.urltools import registrable_domain

BUDGET_MS = 30_000
MAX_K = 1_000


@pytest.fixture(scope="module")
def golden(smoke_corpus):
    return oracle.simulate_crawl(
        smoke_corpus.pages,
        smoke_corpus.seeds,
        smoke_corpus.robots,
        registrable_domain,
        budget_ms=BUDGET_MS,
        max_k=MAX_K,
    )


@pytest.fixture(scope="module")
def engine(spark, smoke_dir, tmp_path_factory):
    state = str(tmp_path_factory.mktemp("state"))
    eng = CrawlEngine(
        spark,
        pages_path=f"{smoke_dir}/pages.parquet",
        seeds_path=f"{smoke_dir}/seeds.parquet",
        robots_path=f"{smoke_dir}/robots.parquet",
        state_dir=state,
        config=EngineConfig(budget_ms=BUDGET_MS, max_k=MAX_K),
        fresh=True,
    )
    eng.summary = eng.run(max_supersteps=200)
    return eng


def test_supersteps_and_counts(engine, golden):
    assert engine.summary["supersteps"] == golden.supersteps
    assert engine.summary["pages_fetched"] == len(golden.crawl_order)
    assert engine.summary["frontier_rows"] == 0


def test_crawl_order_sequence_equal(engine, golden):
    rows = (
        engine.store.read("crawl_log")
        .orderBy("superstep", "host", "host_rank")
        .select("url", "superstep", "host_rank")
        .collect()
    )
    got = [(r.url, r.superstep, r.host_rank) for r in rows]
    assert got == golden.crawl_order


def test_url_seen_set_equal(engine, golden):
    seen = {r.url for r in engine.store.read("url_seen").select("url").collect()}
    assert seen == golden.url_seen


def test_politeness_budget_never_exceeded(engine, golden, smoke_corpus):
    per = (
        engine.store.read("crawl_log")
        .groupBy("superstep", "host")
        .count()
        .collect()
    )
    for r in per:
        delay = smoke_corpus.robots.get(r.host, {}).get("crawl_delay_ms", 3000)
        k = oracle.host_budget(delay, BUDGET_MS, MAX_K)
        assert r["count"] <= k, f"{r.host} superstep {r.superstep}"


def test_categories_match(engine, golden):
    rows = (
        engine.store.read("categories")
        .orderBy("seq")
        .select("id", "category_name", "category_img", "parent_id")
        .collect()
    )
    got = [
        {
            "id": r.id,
            "category_name": r.category_name,
            "category_img": r.category_img,
            "parent_id": r.parent_id,
        }
        for r in rows
    ]
    assert got == golden.categories


def test_brands_match(engine, golden):
    rows = engine.store.read("brands").collect()
    got = {r.id: (r.brand_name, r.brand_img) for r in rows}
    exp = {b["id"]: (b["brand_name"], b["brand_img"]) for b in golden.brands}
    assert got == exp


def test_img_cache_match(engine, golden):
    rows = engine.store.read("img_cache").collect()
    got = {r.md5_key: r.uploaded_url for r in rows}
    assert got == golden.img_cache


def test_products_match_including_text_bytes(engine, golden):
    rows = engine.store.read("products").collect()
    got = {r.url: r for r in rows}
    exp = {p["url"]: p for p in golden.products}
    assert set(got) == set(exp)
    for url, p in exp.items():
        r = got[url]
        assert r.id == p["id"]
        assert r.product_code == p["product_code"]
        assert r.brand_id == p["brand_id"]
        assert r.brand_name == p["brand_name"]
        assert r.brand_img == p["brand_img"]
        assert r.category_id == p["category_id"]
        assert r.style == p["style"]
        assert r.name == p["name"]
        assert f"{r.sale_price:.2f}" == p["sale_price"]
        for mine, theirs in (
            (r.cost_price, p["cost_price"]),
            (r.custom_price, p["custom_price"]),
        ):
            if theirs is None:
                assert mine is None
            else:
                assert f"{mine:.2f}" == theirs
        assert r.main_imgs == p["main_imgs"]
        assert r.detail_imgs == p["detail_imgs"]
        assert r.specifications == p["specifications"]
        assert r.thumbnails == p["thumbnails"]
        assert r.features == p["features"]
        assert r.text == p["text"], f"text bytes differ for {url}"


def test_frontier_conservation(engine):
    """Per-superstep lineage: rows_out == rows_in - fetched + new, and the
    global telescoping sum drains to zero (property §5-4)."""
    ck = engine.store.read("checkpoints").collect()
    by_step: dict[int, dict[str, int]] = {}
    for r in ck:
        assert r.rows_out == r.rows_in - r.rows_fetched + r.new_urls
        agg = by_step.setdefault(r.superstep, {"in": 0, "out": 0, "f": 0, "n": 0})
        agg["in"] += r.rows_in
        agg["out"] += r.rows_out
        agg["f"] += r.rows_fetched
        agg["n"] += r.new_urls
    steps = sorted(by_step)
    for a, b in zip(steps, steps[1:]):
        assert by_step[a]["out"] == by_step[b]["in"]
    assert by_step[steps[-1]]["out"] == 0


def test_errors_quarantined_not_crashed(engine, golden, smoke_corpus):
    """IsSuccess:false pages and mid-pagination failures land in the
    errors table (never crash the job) and are in url_seen."""
    errs = engine.store.read("errors").collect()
    assert errs, "corpus contains failing pages; errors table empty"
    seen = golden.url_seen
    for r in errs:
        assert r.url in seen


def test_submissions_match_oracle(spark, engine, golden):
    """S8: the submission payload dictionary matches the oracle's
    field-by-field construction (Submit, ShiweijiaProduct.cs:392-434)."""
    from crawler_spark.sinks import build_submissions
    from crawler_spark import oracle as orc

    subs = build_submissions(
        engine.store.read("products"), engine.store.read("categories")
    ).collect()
    cats_by_id = {c["id"]: c for c in golden.categories}
    exp = {
        p["id"]: orc.submission_payload(p, cats_by_id)
        for p in golden.products
    }
    # products may repeat ids across pages? urls unique, ids unique per crawl
    got = {r.product_id: dict(r.payload) for r in subs}
    assert set(got) == set(exp)
    n_attr = 0
    for pid, payload in exp.items():
        assert got[pid] == payload, f"payload differs for product {pid}"
        if payload["Attribute"] not in ("", "[]"):
            n_attr += 1
    assert n_attr > 50, "Attribute json rarely populated — fixture too weak"


def test_local_images_source(spark, tmp_path):
    """S7: binaryFile source over ProductPic/<code>/<folder>/ with
    uppercase file-MD5 keys (FileHelper.cs:226-263,323-327)."""
    import os

    from crawler_spark.sinks import local_images

    root = tmp_path / "ProductPic"
    (root / "PC123" / "主图").mkdir(parents=True)
    (root / "PC123" / "详情图").mkdir(parents=True)
    (root / "PC123" / "主图" / "a.jpg").write_bytes(b"imgbytes-a")
    (root / "PC123" / "详情图" / "b.png").write_bytes(b"imgbytes-b")
    (root / "PC123" / "unrelated").mkdir()
    (root / "PC123" / "unrelated" / "c.txt").write_bytes(b"nope")
    rows = local_images(spark, str(root)).collect()
    got = {(r.product_code, r.folder): r.md5_key for r in rows}
    import hashlib

    assert got == {
        ("PC123", "主图"): hashlib.md5(b"imgbytes-a").hexdigest().upper(),
        ("PC123", "详情图"): hashlib.md5(b"imgbytes-b").hexdigest().upper(),
    }

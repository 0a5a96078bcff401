"""M1 parity: the Catalyst extraction kernel must reproduce the pure-Python
oracle byte-for-byte on every page of the synthetic corpus (SURVEY.md §7.3-1:
this is the hardest contract — duplicate-key truncation, insertion-order
serialization, STJ/Newtonsoft escaping, upload-URL derivation)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from crawler_spark import oracle
from crawler_spark.extract import (
    extract_categories,
    extract_details,
    extract_listings,
)


@pytest.fixture(scope="module")
def pages_df(spark, smoke_dir):
    return spark.read.parquet(f"{smoke_dir}/pages.parquet").cache()


def _kind(url: str) -> str:
    return oracle.classify_url(url)[0]


def test_detail_text_byte_identical(spark, pages_df, smoke_corpus):
    """`text` column parity for every detail page (incl. quarantined)."""
    details = pages_df.filter(F.col("url").contains("/getproductdetail"))
    out = extract_details(details).select("url", "ok", "text_extracted").collect()
    assert out, "no detail pages parsed"
    n_ok = 0
    for r in out:
        expected = smoke_corpus.text[r.url]
        if r.ok:
            assert r.text_extracted == expected, f"text mismatch for {r.url}"
            n_ok += 1
        else:
            assert expected == "", f"oracle parsed page engine quarantined: {r.url}"
    assert n_ok > 100


def test_detail_fields_match_oracle(pages_df, smoke_corpus):
    """Full column parity vs oracle.parse_detail for every OK detail page:
    ids, brand, prices, serialized JSON columns, variant lists, thumbnails."""
    details = pages_df.filter(F.col("url").contains("/getproductdetail"))
    rows = extract_details(details).collect()
    checked = dup_spec = trunc_feat = no_thumb = 0
    for r in rows:
        body = json.loads(bytes(smoke_corpus.pages[r.url]).decode("utf-8"))
        if not body.get("IsSuccess"):
            assert not r.ok
            continue
        assert r.ok, f"engine quarantined a good page: {r.url}"
        p = oracle.parse_detail(body["Data"])
        assert r.product_id == p.product_id
        assert r.brand_id == p.brand_id
        assert r.brand_name == p.brand_name
        assert r.product_code == p.product_code
        assert r.name == p.name
        assert r.style == p.style
        assert f"{r.sale_price:.2f}" == p.sale_price
        if p.cost_price is None:
            assert r.cost_price is None
        else:
            assert f"{r.cost_price:.2f}" == p.cost_price
            assert f"{r.custom_price:.2f}" == p.custom_price
        assert r.specifications == p.specifications, r.url
        assert r.features == p.features, r.url
        assert r.main_imgs == p.main_imgs_json
        assert r.detail_imgs == p.detail_imgs_json
        assert r.thumbnails_link == p.thumbnails_link
        if p.thumbnails_link:
            assert r.thumbnails == oracle.upload_url(p.thumbnails_link)
        assert list(r.variant_ids) == p.variant_ids, r.url
        assert r.brand_img == (
            oracle.upload_url(p.brand_img_link) if p.brand_img_link else None
        )
        checked += 1
        if p.specifications and "恒不可达" not in p.specifications:
            pass
        if p.specifications is not None and body["Data"].get("Paras"):
            flat = [
                x
                for g in body["Data"]["Paras"]
                for x in (g.get("Paras") or [])
                if x["ParameterValue"]
            ]
            if len({x["Name"] for x in flat}) < len(flat):
                dup_spec += 1
        if any(
            g["Name"] == body["Data"]["Specification"][0]["Name"]
            for g in body["Data"]["Specification"][1:]
        ):
            trunc_feat += 1
        if "Thumbnails" not in body["Data"]["ProductSpecifications"][0]:
            no_thumb += 1
    # ensure the hard edge cases actually occurred in the corpus
    assert checked > 100
    assert dup_spec > 0, "no duplicate-spec-key truncation case exercised"
    assert trunc_feat > 0, "no duplicate-feature-group case exercised"
    assert no_thumb > 0, "no Thumbnails-fallback case exercised"


def test_listing_parse(pages_df, smoke_corpus):
    listings = pages_df.filter(F.col("url").contains("/queryproductbypage"))
    rows = extract_listings(listings).collect()
    assert rows
    saw_fail = saw_empty = saw_multi = False
    for r in rows:
        body = json.loads(bytes(smoke_corpus.pages[r.url]).decode("utf-8"))
        if not body.get("IsSuccess") or not body.get("Data"):
            assert not r.ok
            saw_fail = True
            continue
        assert r.ok
        data = body["Data"]
        assert r.page_index == data["PageIndex"]
        assert r.total == data["Total"]
        assert list(r.row_ids) == [x["ID"] for x in data["Rows"]]
        assert r.page_count == -(-data["Total"] // 50)
        if not data["Rows"]:
            saw_empty = True
        if r.page_count and r.page_count > 1:
            saw_multi = True
    assert saw_fail and saw_empty and saw_multi


def test_category_parse(pages_df, smoke_corpus):
    cats = pages_df.filter(F.col("url").contains("/getcategory"))
    rows = extract_categories(cats).collect()
    assert rows
    saw_fail = False
    for r in rows:
        body = json.loads(bytes(smoke_corpus.pages[r.url]).decode("utf-8"))
        if not body.get("IsSuccess"):
            assert not r.ok
            saw_fail = True
            continue
        expected = oracle.parse_categories(body["Data"])
        got = [
            {
                "id": c.id,
                "category_name": c.category_name,
                "category_img_link": c.category_img_link,
                "parent_id": c.parent_id,
            }
            for c in r.cat_rows
        ]
        assert got == expected
    assert saw_fail


def test_upload_url_parity(spark):
    """JVM upload-URL expression == oracle for assorted links, including
    the no-extension and '-suffix' edge cases (BaseSpider.cs:230-234)."""
    links = [
        "https://img.x.com/a/b/pic-0.jpg",
        "https://img.x.com/a/strange.png-large",
        "https://img.x.com/noext",
        '["https://img.x.com/a.jpg"]',  # Thumbnails fallback quirk
        "https://img.x.com/中文图.jpeg",
    ]
    from crawler_spark.extract import upload_url_sql

    df = spark.createDataFrame([(l,) for l in links], "link string")
    got = df.selectExpr(upload_url_sql("link") + " as u").collect()
    for link, row in zip(links, got):
        assert row.u == oracle.upload_url(link), link

"""Explicit StructType schemas for every table the engine touches.

Schemas are always declared, never inferred (determinism + safety at
10^10-row scale; see SURVEY.md §1.3). The `pages` shape is authoritative
from BASELINE.json input_hint; entity tables mirror the reference's model
classes (HZ.Crawler.Model/Shiweijia/*.cs) with ints widened to LongType.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input corpus (authoritative shape: BASELINE.json input_hint)
# ---------------------------------------------------------------------------
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

SEEDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("priority_ts", T.TimestampType(), True),
        T.StructField("seed_order", T.LongType(), False),
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("crawl_delay_ms", T.LongType(), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), True),
    ]
)

# ---------------------------------------------------------------------------
# Engine-owned state tables (FIXTURES.md §4-5)
# ---------------------------------------------------------------------------
PRIORITY = T.StructType(
    [
        T.StructField("seed_ts", T.TimestampType(), True),
        T.StructField("discovery_superstep", T.LongType(), False),
        T.StructField("discovery_pos", T.LongType(), False),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("parent_url", T.StringType(), True),
        T.StructField("root_seed", T.StringType(), True),
        T.StructField("depth", T.IntegerType(), False),
    ]
)

FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("priority", PRIORITY, False),
        T.StructField("lineage", LINEAGE, False),
        T.StructField("superstep_added", T.LongType(), False),
    ]
)

URL_SEEN = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("superstep", T.LongType(), False),
    ]
)

# discovered page→page edge list (round 5: closes the crawl → rank →
# recrawl loop — Cho, Garcia-Molina & Page, WWW7 1998: the engine's own
# link graph feeds operators/graph.pagerank()/hits(), whose (url, score)
# output politeness_take(priority=...) consumes). One row per discovered
# edge per superstep, pre-first-wins-dedup (authority needs ALL parents
# of a url, not the lexicographically first); dedup happens at rank time.
LINKS = T.StructType(
    [
        T.StructField("src_url", T.StringType(), False),
        T.StructField("dst_url", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("superstep", T.LongType(), False),
    ]
)

CRAWL_LOG = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("superstep", T.LongType(), False),
        T.StructField("host_rank", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
    ]
)

CHECKPOINTS = T.StructType(
    [
        T.StructField("superstep", T.LongType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows_in", T.LongType(), False),
        T.StructField("rows_fetched", T.LongType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("new_urls", T.LongType(), False),
        T.StructField("errors", T.LongType(), False),
    ]
)

ERRORS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("superstep", T.LongType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("raw", T.BinaryType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Entity tables (reference: HZ.Crawler.Model/Shiweijia/*.cs; ints widened)
# ---------------------------------------------------------------------------
CATEGORIES = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("category_name", T.StringType(), True),
        T.StructField("category_img", T.StringType(), True),
        T.StructField("parent_id", T.LongType(), True),
    ]
)

BRANDS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("brand_name", T.StringType(), True),
        T.StructField("brand_img", T.StringType(), True),
    ]
)

PRODUCTS = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("product_code", T.StringType(), True),
        T.StructField("brand_id", T.LongType(), True),
        T.StructField("brand_name", T.StringType(), True),
        T.StructField("brand_img", T.StringType(), True),
        T.StructField("category_id", T.LongType(), True),
        T.StructField("style", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("sale_price", T.DecimalType(18, 2), True),
        T.StructField("cost_price", T.DecimalType(18, 2), True),
        T.StructField("custom_price", T.DecimalType(18, 2), True),
        # JSON-string at rest for byte-parity with the reference's
        # stringly-typed persistence (ProductModel.cs:48-61); nested types
        # are used in flight and serialized only at this sink boundary.
        T.StructField("main_imgs", T.StringType(), True),
        T.StructField("detail_imgs", T.StringType(), True),
        T.StructField("specifications", T.StringType(), True),
        T.StructField("thumbnails", T.StringType(), True),
        T.StructField("features", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

IMG_CACHE = T.StructType(
    [
        T.StructField("md5_key", T.StringType(), False),
        T.StructField("uploaded_url", T.StringType(), True),
    ]
)

SUBMISSIONS = T.StructType(
    [
        T.StructField("product_id", T.LongType(), False),
        T.StructField("payload", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("superstep", T.LongType(), False),
    ]
)

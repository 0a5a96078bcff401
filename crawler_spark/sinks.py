"""Egress-side operators: the S7 local-image source and the S8
submission sink (SURVEY.md §2.1).

In production S8 is a ``foreachPartition`` HTTP egress; in-sandbox it is
a deterministic projection into a ``submissions`` table whose payload
reproduces the reference's field-by-field dictionary construction
(Submit, ShiweijiaProduct.cs:392-434) — verified against the oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .functions import file_md5_upper

_FOLDERS = ("缩略图", "主图", "详情图")  # ShiweijiaProduct.cs:396,404,451


def local_images(spark: SparkSession, root: str) -> DataFrame:
    """S7: manual image overrides from ``<root>/<productCode>/<folder>/*``
    (GetImgStr / FileHelper.GetAllFiles, ShiweijiaProduct.cs:462-472) via
    the binaryFile source. Returns (product_code, folder, path, md5_key,
    length); joins left onto products by code — absent dirs mean the
    upload-by-link fallback wins, exactly the sandbox behavior."""
    df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    return df.select(
        F.regexp_extract("path", r"([^/]+)/([^/]+)/[^/]+$", 1).alias(
            "product_code"
        ),
        F.regexp_extract("path", r"([^/]+)/([^/]+)/[^/]+$", 2).alias("folder"),
        "path",
        file_md5_upper(F.col("content")).alias("md5_key"),
        F.col("length"),
    ).filter(F.col("folder").isin(*_FOLDERS))


def build_submissions(products: DataFrame, categories: DataFrame) -> DataFrame:
    """S8: one submission payload per product (Submit,
    ShiweijiaProduct.cs:392-434): child/parent category two-hop lookup
    (J3), fixed key order, decimal prices as strings, Attribute JSON from
    features, materialDetails = the byte-identical text render."""
    child = F.broadcast(
        categories.select(
            F.col("id").alias("_cid"),
            F.col("category_name").alias("_cname"),
            F.col("category_img").alias("_cimg"),
            F.col("parent_id").alias("_cparent"),
        )
    )
    parent = F.broadcast(
        categories.select(
            F.col("id").alias("_pid"),
            F.col("category_name").alias("_pname"),
            F.col("category_img").alias("_pimg"),
        )
    )
    j = (
        products.join(child, products["category_id"] == F.col("_cid"), "inner")
        .join(parent, F.col("_cparent") == F.col("_pid"), "left")
    )
    attr = F.coalesce(F.col("attribute_json"), F.lit(""))
    first_pic = F.expr(
        "element_at(from_json(main_imgs, 'array<string>'), 1)"
    )
    payload = F.create_map(
        F.lit("platformType"), F.lit("1"),
        F.lit("materialTypeID"), F.lit("5"),
        F.lit("typeID"), F.lit("3"),
        F.lit("productCode"), F.col("product_code"),
        F.lit("productID"), F.col("id").cast("string"),
        F.lit("materialName"), F.col("name"),
        F.lit("categoryName"), F.col("_pname"),
        F.lit("categoryCoverPath"), F.col("_pimg"),
        F.lit("mincategoryName"), F.col("_cname"),
        F.lit("mincategoryCoverPath"), F.col("_cimg"),
        F.lit("brandName"), F.col("brand_name"),
        F.lit("brandCoverPath"), F.col("brand_img"),
        F.lit("marketPrice"), F.col("sale_price").cast("string"),
        F.lit("floorPrice"),
        F.coalesce(F.col("cost_price").cast("string"), F.lit("0")),
        F.lit("discountPrice"),
        F.coalesce(F.col("custom_price").cast("string"), F.lit("0")),
        F.lit("Attribute"), attr,
        F.lit("coverPath"), F.coalesce(F.col("thumbnails"), first_pic),
        F.lit("materialPicture"), F.col("main_imgs"),
        F.lit("materialDetails"), F.col("text"),
    )
    return j.withColumn("_attr", attr).select(
        F.col("id").alias("product_id"),
        payload.alias("payload"),
    )

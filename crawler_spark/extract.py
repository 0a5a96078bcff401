"""Vectorized extraction kernel (SURVEY.md §2.10, M1).

The hot path — listing + detail page parsing, spec/feature dict builds,
Newtonsoft/System.Text.Json serialization parity, image-upload URL
derivation and the byte-identical ``text`` render — is implemented
entirely as JVM-side Catalyst expressions (``from_json`` + higher-order
array functions). No Python executes per detail/listing row: the plan
stays inside Tungsten, and parity with the pure-Python oracle
(`crawler_spark.oracle`) is a genuinely independent cross-check.

Reference semantics reproduced (citations into /root/reference/):
- spec-dict build, skip-empty-value, exception-TRUNCATION at the first
  duplicate key (HZ.Crawler.DataSpider/Shiweijia/ShiweijiaProduct.cs:271-296),
- feature-group build with duplicate-group/duplicate-id truncation
  (ShiweijiaProduct.cs:338-361),
- per-variant decode: first-group-wins id→name lookup, duplicate feature
  name skipped, missing id aborts the item (per-item try/catch,
  ShiweijiaProduct.cs:298-332),
- Thumbnails→ArrayToJson(MainImgs) fallback (ShiweijiaProduct.cs:319)
  with System.Text.Json UnicodeRanges.All escaping (cs:366-385),
- Newtonsoft compact insertion-order dict serialization (cs:295,320),
- image upload-URL derivation keyed by md5 of the base64 data-URI
  (BaseSpider.cs:230-316), extension extraction incl. '-suffix' strip,
- detail text `<p>{k}:{v}</p>` + `<img src="{u}" />` (cs:435-461),
- listing pagination ceil(Total/50) (ShiweijiaProduct.cs:105-127).

Category pages are the one place recursion defeats a static from_json
schema (arbitrary-depth tree, ShiweijiaCategory.cs:83-107); they are
~1 page per host (cold path) and go through an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

PAGE_SIZE = 50  # ShiweijiaProduct.cs:47

# ---------------------------------------------------------------------------
# from_json schemas (declared, never inferred)
# ---------------------------------------------------------------------------

LISTING_SCHEMA = T.StructType(
    [
        T.StructField("IsSuccess", T.BooleanType()),
        T.StructField("Message", T.StringType()),
        T.StructField(
            "Data",
            T.StructType(
                [
                    T.StructField(
                        "Rows",
                        T.ArrayType(
                            T.StructType([T.StructField("ID", T.LongType())])
                        ),
                    ),
                    T.StructField("PageIndex", T.IntegerType()),
                    T.StructField("Total", T.LongType()),
                ]
            ),
        ),
    ]
)

DETAIL_SCHEMA = T.StructType(
    [
        T.StructField("IsSuccess", T.BooleanType()),
        T.StructField("Message", T.StringType()),
        T.StructField(
            "Data",
            T.StructType(
                [
                    T.StructField("ID", T.LongType()),
                    T.StructField("BrandId", T.LongType()),
                    T.StructField("Brand", T.StringType()),
                    T.StructField("BrandImg", T.StringType()),
                    T.StructField("ProductCode", T.StringType()),
                    T.StructField("Name", T.StringType()),
                    T.StructField("Pattern", T.StringType()),
                    T.StructField("SalePrice", T.DecimalType(18, 2)),
                    T.StructField("MainImgs", T.ArrayType(T.StringType())),
                    T.StructField("DetailImgs", T.ArrayType(T.StringType())),
                    T.StructField(
                        "Paras",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField(
                                        "Paras",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField(
                                                        "Name", T.StringType()
                                                    ),
                                                    T.StructField(
                                                        "ParameterValue",
                                                        T.StringType(),
                                                    ),
                                                ]
                                            )
                                        ),
                                    )
                                ]
                            )
                        ),
                    ),
                    T.StructField(
                        "Specification",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("Name", T.StringType()),
                                    T.StructField(
                                        "Values",
                                        T.ArrayType(
                                            T.StructType(
                                                [
                                                    T.StructField(
                                                        "Id", T.LongType()
                                                    ),
                                                    T.StructField(
                                                        "Name", T.StringType()
                                                    ),
                                                ]
                                            )
                                        ),
                                    ),
                                ]
                            )
                        ),
                    ),
                    T.StructField(
                        "ProductSpecifications",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("ProductId", T.LongType()),
                                    T.StructField(
                                        "SpecificationValueIds",
                                        T.ArrayType(T.LongType()),
                                    ),
                                    T.StructField("Thumbnails", T.StringType()),
                                    T.StructField(
                                        "Price1", T.DecimalType(18, 2)
                                    ),
                                    T.StructField(
                                        "Price2", T.DecimalType(18, 2)
                                    ),
                                ]
                            )
                        ),
                    ),
                ]
            ),
        ),
    ]
)


# ---------------------------------------------------------------------------
# SQL expression builders (string templates → F.expr)
# ---------------------------------------------------------------------------


def _nt_esc(s: str) -> str:
    """Newtonsoft string-escape as a SQL expression over expr ``s``
    (backslash first; quotes, control whitespace). CJK stays raw."""
    e = f"replace({s}, '\\\\', '\\\\\\\\')"
    e = f"replace({e}, '\"', '\\\\\"')"
    e = f"replace({e}, '\\n', '\\\\n')"
    e = f"replace({e}, '\\r', '\\\\r')"
    e = f"replace({e}, '\\t', '\\\\t')"
    return e


def _stj_esc(s: str) -> str:
    """System.Text.Json (UnicodeRanges.All) escape: backslash first,
    then quote and HTML-sensitive ASCII as \\uXXXX (oracle._STJ_ESCAPES)."""
    e = f"replace({s}, '\\\\', '\\\\\\\\')"
    e = f"replace({e}, '\"', '\\\\\"')"
    e = f"replace({e}, '<', '\\\\u003C')"
    e = f"replace({e}, '>', '\\\\u003E')"
    e = f"replace({e}, '&', '\\\\u0026')"
    e = f"replace({e}, \"'\", '\\\\u0027')"
    e = f"replace({e}, '+', '\\\\u002B')"
    return e


def _nt_dict(entries: str) -> str:
    """Newtonsoft compact dict JSON from array<struct<k,v>> expr."""
    return (
        "concat('{', array_join(transform("
        + entries
        + ", e -> concat('\"', "
        + _nt_esc("e.k")
        + ", '\":\"', "
        + _nt_esc("e.v")
        + ", '\"')), ','), '}')"
    )


def _nt_str_list(items: str) -> str:
    """Newtonsoft compact List<string> JSON from array<string> expr."""
    return (
        "concat('[', array_join(transform("
        + items
        + ", i -> concat('\"', "
        + _nt_esc("i")
        + ", '\"')), ','), ']')"
    )


def _stj_str_list(items: str) -> str:
    """System.Text.Json List<string> JSON (ArrayToJson parity,
    ShiweijiaProduct.cs:366-385): null → []."""
    return (
        "concat('[', array_join(transform(coalesce("
        + items
        + ", array()), i -> concat('\"', "
        + _stj_esc("i")
        + ", '\"')), ','), ']')"
    )


def _ext(link: str) -> str:
    """Extension per BaseSpider.cs:230-234: after last '.', strip the
    trailing '-suffix' (if any)."""
    tail = f"substring_index({link}, '.', -1)"
    return (
        f"CASE WHEN instr({tail}, '-') > 0 "
        f"THEN regexp_replace({tail}, '-[^-]*$', '') "
        f"ELSE {tail} END"
    )


def upload_url_sql(link: str) -> str:
    """Deterministic uploaded-image URL (sandbox upload model shared with
    the oracle): md5 of the base64 data-URI whose content is md5(link)
    bytes (BaseSpider.cs:239,257-316). Pure JVM expression:
    unhex(md5(x)) == md5 digest bytes, base64 matches Python's."""
    ext = _ext(link)
    data_uri = (
        f"concat('data:image/', {ext}, ';base64,', "
        f"base64(unhex(md5(cast({link} as binary)))))"
    )
    return (
        f"concat('https://img.cdn.test/', md5(cast({data_uri} as binary)), "
        f"'.', {ext})"
    )


_EMPTY_KV = "cast(array() as array<struct<k:string,v:string>>)"

# GetSpecifications fold (ShiweijiaProduct.cs:271-296): flatten group
# paras, skip empty values, truncate everything at the first duplicate key
# (Dictionary.Add throws; the try wraps the whole loop → partial dict kept).
_SPEC_ENTRIES = f"""
CASE WHEN d.Paras IS NULL THEN NULL ELSE
  aggregate(
    flatten(transform(d.Paras, g -> coalesce(g.Paras,
      cast(array() as array<struct<Name:string,ParameterValue:string>>)))),
    struct({_EMPTY_KV} as entries, false as stopped),
    (acc, e) -> CASE
      WHEN acc.stopped THEN acc
      WHEN e.ParameterValue IS NULL OR e.ParameterValue = '' THEN acc
      WHEN exists(acc.entries, x -> x.k = e.Name)
        THEN struct(acc.entries as entries, true as stopped)
      ELSE struct(
        concat(acc.entries, array(struct(e.Name as k, e.ParameterValue as v)))
          as entries,
        false as stopped) END,
    acc -> acc.entries)
END"""

# GetFeatures fold (ShiweijiaProduct.cs:338-361): Name → values; any
# duplicate value-id within a group, or duplicate group name, truncates
# the whole build (outer try/catch), keeping groups added so far.
_EMPTY_GROUPS = (
    "cast(array() as array<struct<name:string,"
    "vals:array<struct<Id:bigint,Name:string>>>>)"
)
_FEATURE_GROUPS = f"""
CASE WHEN d.Specification IS NULL THEN NULL ELSE
  aggregate(
    d.Specification,
    struct({_EMPTY_GROUPS} as groups, false as stopped),
    (acc, g) -> CASE
      WHEN acc.stopped THEN acc
      WHEN g.Values IS NULL THEN acc
      WHEN size(array_distinct(transform(g.Values, v -> v.Id)))
           < size(g.Values)
        THEN struct(acc.groups as groups, true as stopped)
      WHEN exists(acc.groups, x -> x.name = g.Name)
        THEN struct(acc.groups as groups, true as stopped)
      ELSE struct(
        concat(acc.groups, array(struct(g.Name as name, g.Values as vals)))
          as groups,
        false as stopped) END,
    acc -> acc.groups)
END"""

# The ProductSpecifications item for this product (FirstOrDefault on
# ProductId == ID, ShiweijiaProduct.cs:303).
_SELF_ITEM = (
    "element_at(filter(d.ProductSpecifications, i -> i.ProductId = d.ID), 1)"
)

# First feature-group containing value-id `vid` (FirstOrDefault over
# insertion order, ShiweijiaProduct.cs:309-314).
def _owner(vid: str) -> str:
    return (
        f"element_at(filter(fgroups, gg -> exists(gg.vals, "
        f"vv -> vv.Id = {vid})), 1)"
    )


# Per-variant feature decode (GetAllProducts, ShiweijiaProduct.cs:298-332):
# iterate SpecificationValueIds in order; a vid owned by no group aborts
# the item (NullReference → per-item catch); a duplicate feature name is
# skipped (ContainsKey → continue); else append (name, value-name).
_FEATURE_DECODE = f"""
CASE WHEN fgroups IS NULL OR self_item IS NULL THEN NULL ELSE
  aggregate(
    coalesce(self_item.SpecificationValueIds, cast(array() as array<bigint>)),
    struct({_EMPTY_KV} as entries, false as failed),
    (acc, vid) -> CASE
      WHEN acc.failed THEN acc
      WHEN {_owner("vid")} IS NULL
        THEN struct(acc.entries as entries, true as failed)
      WHEN exists(acc.entries, x -> x.k = {_owner("vid")}.name) THEN acc
      ELSE struct(
        concat(acc.entries, array(struct(
          {_owner("vid")}.name as k,
          element_at(filter({_owner("vid")}.vals, vv -> vv.Id = vid), 1).Name
            as v))) as entries,
        false as failed) END)
END"""


def extract_details(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Parse detail pages (url + html binary → full product extraction).

    Input: DataFrame with at least (url, ``html_col``). Output adds:
    ok, err, product_id, brand_id, brand_name, brand_img_link, brand_img,
    product_code, name, style, sale_price, cost_price, custom_price,
    specifications, features, main_imgs, detail_imgs, thumbnails_link,
    thumbnails, variant_ids, img_links, text — with `text` byte-identical
    to the reference render (the BASELINE input_hint contract).
    """
    df = pages.withColumn(
        "_doc",
        F.from_json(F.col(html_col).cast("string"), DETAIL_SCHEMA),
    )
    df = df.withColumn("d", F.col("_doc.Data")).withColumn(
        "ok", F.coalesce(F.col("_doc.IsSuccess"), F.lit(False)) & F.col("d").isNotNull()
    )
    df = df.withColumn("err", F.when(~F.col("ok"), F.coalesce(F.col("_doc.Message"), F.lit("parse-error"))))

    # spec entries + serialized dict (null when Paras absent)
    df = df.withColumn("spec_entries", F.expr(_SPEC_ENTRIES))
    df = df.withColumn(
        "specifications",
        F.when(
            F.col("spec_entries").isNotNull(), F.expr(_nt_dict("spec_entries"))
        ),
    )

    # feature groups + self-variant decode. The oracle enters the block
    # only when BOTH Specification and ProductSpecifications are lists
    # (ShiweijiaProduct.cs:268); outside it features stay null and no
    # variants are emitted.
    df = df.withColumn(
        "fgroups",
        F.when(
            F.col("d.ProductSpecifications").isNotNull(), F.expr(_FEATURE_GROUPS)
        ),
    )
    df = df.withColumn("self_item", F.expr(_SELF_ITEM))
    df = df.withColumn("fdecode", F.expr(_FEATURE_DECODE))
    ok_decode = F.col("fdecode").isNotNull() & ~F.col("fdecode.failed")
    df = df.withColumn(
        "features",
        F.when(ok_decode, F.expr(_nt_dict("fdecode.entries"))),
    )
    df = df.withColumn(
        "cost_price", F.when(ok_decode, F.col("self_item.Price1"))
    ).withColumn("custom_price", F.when(ok_decode, F.col("self_item.Price2")))

    # Thumbnails fallback: ArrayToJson(MainImgs) STJ string (cs:319)
    df = df.withColumn(
        "thumbnails_link",
        F.when(
            ok_decode,
            F.coalesce(
                F.col("self_item.Thumbnails"), F.expr(_stj_str_list("d.MainImgs"))
            ),
        ),
    )

    # variant ids in list order; the self item drops out if its decode
    # aborted (per-item catch skips the Add, ShiweijiaProduct.cs:326-329)
    df = df.withColumn(
        "variant_ids",
        F.when(
            F.col("fgroups").isNull() | F.col("d.ProductSpecifications").isNull(),
            F.expr("cast(array() as array<bigint>)"),
        )
        .when(
            ok_decode | F.col("self_item").isNull(),
            F.expr("transform(d.ProductSpecifications, i -> i.ProductId)"),
        )
        .otherwise(
            F.expr(
                "filter(transform(d.ProductSpecifications, i -> i.ProductId),"
                " pid -> pid != d.ID)"
            )
        ),
    )

    # uploaded image urls (Submit-time mutations, cs:392-434)
    df = df.withColumn(
        "uploaded_main",
        F.expr(
            "transform(filter(coalesce(d.MainImgs, array()),"
            " u -> u IS NOT NULL AND u != ''), u -> " + upload_url_sql("u") + ")"
        ),
    ).withColumn(
        "uploaded_detail",
        F.expr(
            "transform(filter(coalesce(d.DetailImgs, array()),"
            " u -> u IS NOT NULL AND u != ''), u -> " + upload_url_sql("u") + ")"
        ),
    )
    df = df.withColumn("main_imgs", F.expr(_nt_str_list("uploaded_main")))
    df = df.withColumn("detail_imgs", F.expr(_nt_str_list("uploaded_detail")))
    df = df.withColumn(
        "thumbnails",
        F.when(
            F.col("thumbnails_link").isNotNull() & (F.col("thumbnails_link") != ""),
            F.expr(upload_url_sql("thumbnails_link")),
        ),
    )

    # Attribute JSON for the submission payload (GetProductAttributeJson,
    # ShiweijiaProduct.cs:474-487): entries with non-empty values, in
    # decode order; "" when features never materialized.
    df = df.withColumn(
        "attribute_json",
        F.when(
            F.col("fdecode").isNotNull() & ~F.col("fdecode.failed"),
            F.expr(
                "concat('[', array_join(transform("
                "filter(fdecode.entries, e -> e.v != ''), "
                "e -> concat('{\"AttributeName\":\"', "
                + _nt_esc("e.k")
                + ", '\",\"AttributeValue\":\"', "
                + _nt_esc("e.v")
                + ", '\"}')), ','), ']')"
            ),
        ).otherwise(F.lit("")),
    )

    # the byte-identical text render (GetProductDetails, cs:435-461)
    df = df.withColumn(
        "text_out",
        F.concat(
            F.expr(
                "coalesce(array_join(transform(spec_entries,"
                " e -> concat('<p>', e.k, ':', e.v, '</p>')), ''), '')"
            ),
            F.expr(
                "array_join(transform(uploaded_detail,"
                " u -> concat('<img src=\"', u, '\" />')), '')"
            ),
        ),
    )

    return (
        df.withColumn("product_id", F.col("d.ID"))
        .withColumn("brand_id", F.col("d.BrandId"))
        .withColumn("brand_name", F.col("d.Brand"))
        .withColumn("product_code", F.col("d.ProductCode"))
        .withColumn("name", F.coalesce(F.col("d.Name"), F.lit("")))
        .withColumn("style", F.coalesce(F.col("d.Pattern"), F.lit("")))
        .withColumn("sale_price", F.col("d.SalePrice"))
        .withColumn("brand_img_link", F.col("d.BrandImg"))
        .withColumn(
            "brand_img",
            F.when(
                F.col("brand_img_link").isNotNull()
                & (F.col("brand_img_link") != ""),
                F.expr(upload_url_sql("brand_img_link")),
            ),
        )
        .withColumn(
            "img_links",
            F.expr(
                """filter(concat(
                     CASE WHEN d.BrandImg IS NOT NULL AND d.BrandImg != ''
                          THEN array(d.BrandImg) ELSE array() END,
                     CASE WHEN thumbnails_link IS NOT NULL
                          THEN array(thumbnails_link) ELSE array() END,
                     filter(coalesce(d.MainImgs, array()),
                            u -> u IS NOT NULL AND u != ''),
                     filter(coalesce(d.DetailImgs, array()),
                            u -> u IS NOT NULL AND u != '')),
                   x -> x IS NOT NULL AND x != '')"""
            ),
        )
        .drop("_doc", "fgroups", "self_item", "fdecode", "spec_entries", "d")
        .withColumnRenamed("text_out", "text_extracted")
    )


def extract_listings(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Parse listing pages: product-id rows (with 1-based position),
    page index, total, page_count = ceil(Total/50)
    (ShiweijiaProduct.cs:105-127)."""
    df = pages.withColumn(
        "_doc", F.from_json(F.col(html_col).cast("string"), LISTING_SCHEMA)
    )
    # oracle gate: IsSuccess, Data present, Rows key present
    df = (
        df.withColumn(
            "ok",
            F.coalesce(F.col("_doc.IsSuccess"), F.lit(False))
            & F.col("_doc.Data").isNotNull()
            & F.col("_doc.Data.Rows").isNotNull(),
        )
        .withColumn(
            "err", F.when(~F.col("ok"), F.coalesce(F.col("_doc.Message"), F.lit("parse-error")))
        )
        .withColumn("page_index", F.col("_doc.Data.PageIndex"))
        .withColumn("total", F.col("_doc.Data.Total"))
        .withColumn(
            "page_count",
            F.ceil(F.col("_doc.Data.Total") / F.lit(float(PAGE_SIZE))),
        )
        .withColumn(
            "row_ids", F.expr("transform(_doc.Data.Rows, r -> r.ID)")
        )
        .drop("_doc")
    )
    return df


# ---------------------------------------------------------------------------
# Category pages (cold path): recursive tree → pre-order rows, pandas UDF
# ---------------------------------------------------------------------------

CATEGORY_ROW = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("category_name", T.StringType()),
        T.StructField("category_img_link", T.StringType()),
        T.StructField("parent_id", T.LongType()),
    ]
)

CATEGORY_PARSE = T.StructType(
    [
        T.StructField("ok", T.BooleanType()),
        T.StructField("err", T.StringType()),
        T.StructField("rows", T.ArrayType(CATEGORY_ROW)),
    ]
)


def _parse_category_page(raw: bytes | None):
    """Independent reimplementation of the recursive flatten
    (ShiweijiaCategory.cs:83-107): pre-order, parent before children."""
    if raw is None:
        return {"ok": False, "err": "missing-body", "rows": None}
    try:
        doc = json.loads(bytes(raw).decode("utf-8"))
    except Exception as e:  # noqa: BLE001 - quarantine, never crash (S6)
        return {"ok": False, "err": f"json:{e}", "rows": None}
    if not doc.get("IsSuccess"):
        return {"ok": False, "err": str(doc.get("Message") or "IsSuccess=false"), "rows": None}
    rows: list[dict] = []
    stack = [(item, None) for item in reversed(doc.get("Data") or [])]
    while stack:
        item, parent = stack.pop()
        rows.append(
            {
                "id": item["ID"],
                "category_name": item.get("CategoryName"),
                "category_img_link": item.get("CategoryImg"),
                "parent_id": parent,
            }
        )
        for sub in reversed(item.get("Subs") or []):
            stack.append((sub, item["ID"]))
    return {"ok": True, "err": None, "rows": rows}


@F.pandas_udf(CATEGORY_PARSE)
def parse_category_udf(html: pd.Series) -> pd.DataFrame:  # pragma: no cover
    out = [_parse_category_page(h) for h in html]
    return pd.DataFrame(out)


def extract_categories(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Category pages → (ok, err, rows array) with pre-order positions."""
    return pages.withColumn("_cat", parse_category_udf(F.col(html_col))).select(
        "*",
        F.col("_cat.ok").alias("ok"),
        F.col("_cat.err").alias("err"),
        F.col("_cat.rows").alias("cat_rows"),
    ).drop("_cat")

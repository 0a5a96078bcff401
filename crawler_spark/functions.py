"""Scalar-function surface (SURVEY.md §2.8) as Spark Column builders.

Every helper reproduces a reference routine's exact semantics (citations
into /root/reference/), JVM-side — the per-URL request-signing path is a
pure projection that whole-stage-codegen executes inline at fetch time.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from .extract import upload_url_sql  # noqa: F401  (F3/J4 derivation)

PAGE_SIZE = 50  # ShiweijiaProduct.cs:47


# -- hashing / encoding ------------------------------------------------------

def md5_hex(col: Column) -> Column:
    """F1: lowercase-hex MD5 (Encrypt.cs:9-21)."""
    return F.md5(col.cast("binary"))


def sha1_hex(col: Column) -> Column:
    """F2: lowercase-hex SHA1 (Encrypt.cs:22-39)."""
    return F.sha1(col.cast("binary"))


def file_md5_upper(content: Column) -> Column:
    """F3: uppercase-hex MD5 of file bytes (FileHelper.cs:226-263);
    pairs with spark.read.format('binaryFile') for the S7 source."""
    return F.upper(F.md5(content))


def to_base64(col: Column) -> Column:
    """F5 (StringExtension.cs:94-105; BaseSpider.cs:239,257)."""
    return F.base64(col.cast("binary"))


def epoch_millis(ts: Column) -> Column:
    """F4: ms since 1970 UTC (DateTimeExtension.cs:13-17)."""
    return F.unix_millis(ts.cast("timestamp"))


def epoch_seconds(ts: Column) -> Column:
    """F4: s since 1970 UTC (DateTimeExtension.cs:18-21)."""
    return F.unix_timestamp(ts.cast("timestamp"))


def url_encode_upper(col: Column) -> Column:
    """F6: URL-encode with uppercase %XX (StringExtension.cs:44-56,84-92
    — .NET HttpUtility.UrlEncode then EncodeToUpper). Java's URLEncoder
    already emits uppercase hex and '+' for space, matching the
    composed reference behavior; divergence only on '!'/'(' /')'
    (escaped here, kept raw by .NET) — documented, not crawl-relevant."""
    return F.url_encode(col)


def deterministic_nonce(url: Column, superstep: Column) -> Column:
    """F16: the reference uses Guid.NewGuid().ToString("N")[:11]
    (ShiweijiaCategory.cs:37; ShiweijiaProduct.cs:42,161). For
    reproducible goldens the nonce is seed-derived: 11 hex chars of
    sha1(url|superstep) — injectable wherever a nonce is signed."""
    return F.substring(
        F.sha1(F.concat_ws("|", url, superstep.cast("string")).cast("binary")),
        1,
        11,
    )


# -- S2: signed API request builders ----------------------------------------

def category_sign(nonce: Column, req_time: Column) -> Column:
    """Uppercase MD5 of the canonically ordered category sign string
    (ShiweijiaCategory.cs:42-44)."""
    return F.upper(
        F.md5(
            F.concat(
                F.lit("AppId=9900&Nonce="),
                nonce,
                F.lit("&ReqTime="),
                req_time,
                F.lit("&TerminalType=web&TerminalVersion=lenovo"),
            ).cast("binary")
        )
    )


def listing_sign(
    category: Column, nonce: Column, page_index: Column, req_time: Column
) -> Column:
    """Uppercase MD5 of the listing sign string, fixed param order
    (ShiweijiaProduct.cs:80-82): AppId, Category, MaxPrice, MinPrice,
    Nonce, OrderType, PageIndex, PageSize, ReqTime, Suffix, Terminal*."""
    return F.upper(
        F.md5(
            F.concat(
                F.lit("AppId=9900&Category="),
                category.cast("string"),
                F.lit("&MaxPrice=0&MinPrice=0&Nonce="),
                nonce,
                F.lit("&OrderType=0&PageIndex="),
                page_index.cast("string"),
                F.lit(f"&PageSize={PAGE_SIZE}&ReqTime="),
                req_time,
                F.lit("&Suffix=shengshi&TerminalType=web&TerminalVersion=lenovo"),
            ).cast("binary")
        )
    )


def detail_sign(product_id: Column, nonce: Column, req_time: Column) -> Column:
    """LOWERCASE MD5 for the detail endpoint — the reference does not
    upper() this one (ShiweijiaProduct.cs:211)."""
    return F.md5(
        F.concat(
            F.lit("AppId=9900&Id="),
            product_id.cast("string"),
            F.lit("&Nonce="),
            nonce,
            F.lit("&ReqTime="),
            req_time,
            F.lit("&Suffix=shengshi&TerminalType=web&TerminalVersion=lenovo"),
        ).cast("binary")
    )


def category_request_body(
    nonce: Column, req_time: Column
) -> Column:
    """POST body for the category endpoint, field order as serialized by
    the reference (ShiweijiaCategory.cs:44-52)."""
    return F.to_json(
        F.struct(
            F.lit(9900).alias("AppId"),
            req_time.alias("ReqTime"),
            nonce.alias("Nonce"),
            category_sign(nonce, req_time).alias("Signature"),
            F.lit("web").alias("TerminalType"),
            F.lit("lenovo").alias("TerminalVersion"),
        )
    )


def detail_request_body(
    product_id: Column, nonce: Column, req_time: Column
) -> Column:
    """POST body for the detail endpoint (ShiweijiaProduct.cs:212-223)."""
    return F.to_json(
        F.struct(
            F.lit(9900).alias("AppId"),
            F.lit("shengshi").alias("Suffix"),
            req_time.alias("ReqTime"),
            nonce.alias("Nonce"),
            detail_sign(product_id, nonce, req_time).alias("Signature"),
            F.lit("web").alias("TerminalType"),
            F.lit("lenovo").alias("TerminalVersion"),
            product_id.alias("Id"),
            F.lit("").alias("UserId"),
        )
    )


# -- F18: content-type from extension (FileHelper.cs:329-348) ---------------

_CONTENT_TYPES = {
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "png": "image/png",
    "gif": "image/gif",
    "webp": "image/webp",
    "bmp": "application/x-bmp",
    "svg": "text/xml",
    "html": "text/html",
    "htm": "text/html",
    "json": "application/json",
    "txt": "text/plain",
    "pdf": "application/pdf",
    "mp4": "video/mpeg4",
    "mp3": "audio/mp3",
    "zip": "application/zip",
}


def content_type_for(ext: Column) -> Column:
    """F18: extension → MIME (subset of the reference's 300-entry dict;
    '*' fallback application/octet-stream)."""
    mapping = F.create_map(
        *[F.lit(x) for kv in _CONTENT_TYPES.items() for x in kv]
    )
    return F.coalesce(
        mapping[F.lower(ext)], F.lit("application/octet-stream")
    )


def decode_html(col: Column) -> Column:
    """F17: bytes → text with BOM handling (FileHelper.GetEncoding,
    FileHelper.cs:267-315). The UTF-8 BOM is stripped before parsing;
    UTF-16 payloads (local-file-only in the reference) are surfaced via
    :func:`sniffed_encoding` instead of being silently mis-decoded."""
    s = col.cast("string")
    return F.when(
        s.startswith("\ufeff"), F.substring(s, 2, 2147483647)
    ).otherwise(s)


def sniffed_encoding(col: Column) -> Column:
    """F17 companion: BOM-based encoding sniff on the raw bytes."""
    head = F.hex(F.substring(col, 1, 3))
    return (
        F.when(head.startswith("EFBBBF"), F.lit("utf-8-bom"))
        .when(head.startswith("FFFE"), F.lit("utf-16-le"))
        .when(head.startswith("FEFF"), F.lit("utf-16-be"))
        .otherwise(F.lit("utf-8"))
    )

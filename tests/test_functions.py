"""Golden tests for the §2.8 scalar-function surface (functions.py):
signature strings, hashes, encodings — expected values computed
independently with hashlib/python against the reference's canonical
formats (SURVEY.md §5-1)."""

from __future__ import annotations

import base64
import hashlib

from pyspark.sql import functions as F

from crawler_spark import functions as cf


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def test_signature_builders(spark):
    nonce, req_time, cat, page, pid = "abc123def45", "1600000000000", 2000100, 3, 31000007
    df = spark.createDataFrame(
        [(nonce, req_time, cat, page, pid)],
        "nonce string, req_time string, cat long, page int, pid long",
    )
    row = df.select(
        cf.category_sign(F.col("nonce"), F.col("req_time")).alias("c"),
        cf.listing_sign(
            F.col("cat"), F.col("nonce"), F.col("page"), F.col("req_time")
        ).alias("l"),
        cf.detail_sign(F.col("pid"), F.col("nonce"), F.col("req_time")).alias("d"),
    ).collect()[0]
    # category sign string (ShiweijiaCategory.cs:43): uppercase md5
    assert row.c == _md5(
        f"AppId=9900&Nonce={nonce}&ReqTime={req_time}"
        "&TerminalType=web&TerminalVersion=lenovo"
    ).upper()
    # listing sign string (ShiweijiaProduct.cs:80-82)
    assert row.l == _md5(
        f"AppId=9900&Category={cat}&MaxPrice=0&MinPrice=0&Nonce={nonce}"
        f"&OrderType=0&PageIndex={page}&PageSize=50&ReqTime={req_time}"
        "&Suffix=shengshi&TerminalType=web&TerminalVersion=lenovo"
    ).upper()
    # detail sign is NOT uppercased (ShiweijiaProduct.cs:211)
    assert row.d == _md5(
        f"AppId=9900&Id={pid}&Nonce={nonce}&ReqTime={req_time}"
        "&Suffix=shengshi&TerminalType=web&TerminalVersion=lenovo"
    )


def test_request_bodies_field_order(spark):
    df = spark.createDataFrame(
        [("n0nce1234ab", "1600000000000", 42)],
        "nonce string, req_time string, pid long",
    )
    row = df.select(
        cf.category_request_body(F.col("nonce"), F.col("req_time")).alias("c"),
        cf.detail_request_body(
            F.col("pid"), F.col("nonce"), F.col("req_time")
        ).alias("d"),
    ).collect()[0]
    assert row.c.startswith('{"AppId":9900,"ReqTime":"1600000000000","Nonce":')
    assert '"Signature":"' in row.c and row.c.endswith(
        '"TerminalType":"web","TerminalVersion":"lenovo"}'
    )
    assert row.d.startswith('{"AppId":9900,"Suffix":"shengshi"')
    assert row.d.endswith('"Id":42,"UserId":""}')


def test_hashes_and_encodings(spark):
    df = spark.createDataFrame([("héllo 世界",)], "s string")
    row = df.select(
        cf.md5_hex(F.col("s")).alias("m"),
        cf.sha1_hex(F.col("s")).alias("h"),
        cf.to_base64(F.col("s")).alias("b"),
        cf.file_md5_upper(F.col("s").cast("binary")).alias("fm"),
        cf.url_encode_upper(F.col("s")).alias("u"),
    ).collect()[0]
    raw = "héllo 世界".encode("utf-8")
    assert row.m == hashlib.md5(raw).hexdigest()
    assert row.h == hashlib.sha1(raw).hexdigest()
    assert row.b == base64.b64encode(raw).decode()
    assert row.fm == hashlib.md5(raw).hexdigest().upper()
    from urllib.parse import quote

    # byte-exact Uri.EscapeDataString semantics: RFC 3986 unreserved
    # kept raw, %20 space, uppercase hex — quote(safe='') is the same
    # contract, so it is the oracle
    assert row.u == quote("héllo 世界", safe="")


def test_url_encode_escapedatastring_edges(spark):
    from urllib.parse import quote

    cases = ["a b", "a+b", "x~y", "w*z", "it's!", "(par)ens", "100%"]
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = [
        r.u
        for r in df.select(cf.url_encode_upper(F.col("s")).alias("u")).collect()
    ]
    assert got == [quote(s, safe="") for s in cases]


def test_nonce_deterministic_11_hex(spark):
    df = spark.createDataFrame(
        [("https://a.com/x", 3), ("https://a.com/x", 3), ("https://a.com/y", 3)],
        "url string, s int",
    )
    vals = [
        r.n
        for r in df.select(
            cf.deterministic_nonce(F.col("url"), F.col("s")).alias("n")
        ).collect()
    ]
    assert vals[0] == vals[1] and vals[0] != vals[2]
    assert len(vals[0]) == 11
    assert vals[0] == hashlib.sha1(b"https://a.com/x|3").hexdigest()[:11]


def test_content_type_map(spark):
    # full reference dictionary (FileHelper.cs:601-936) — spot-check
    # entries from several media classes + the octet-stream fallback
    df = spark.createDataFrame(
        [("JPG",), ("png",), ("weird",), ("wav",), ("xhtml",), ("wmv",),
         ("ppt",), ("tif",), ("",), ("ivf",)],
        "e string",
    )
    got = [
        r.ct
        for r in df.select(cf.content_type_for(F.col("e")).alias("ct")).collect()
    ]
    assert got == [
        "image/jpeg",
        "image/png",
        "application/octet-stream",
        "audio/wav",
        "text/html",
        "video/x-ms-wmv",
        "application/vnd.ms-powerpoint",
        "image/tiff",
        "application/x-",  # FileHelper.cs:685 {"." : "application/x-"}
        "video/x-ivf",  # FileHelper.cs:710 (.IVF, reachable lowercase)
    ]
    assert len(cf._CONTENT_TYPES) > 300


def test_bom_decode_and_sniff(spark):
    from pyspark.sql import functions as F

    rows = [
        (b"\xef\xbb\xbfhello",),
        (b"plain",),
        (b"\xff\xfea\x00",),
    ]
    df = spark.createDataFrame(rows, "b binary")
    got = df.select(
        cf.decode_html(F.col("b")).alias("t"),
        cf.sniffed_encoding(F.col("b")).alias("e"),
    ).collect()
    assert (got[0].t, got[0].e) == ("hello", "utf-8-bom")
    assert (got[1].t, got[1].e) == ("plain", "utf-8")
    assert got[2].e == "utf-16-le"

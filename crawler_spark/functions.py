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
    """F6: byte-exact ToUrlEncode parity (StringExtension.cs:44-56,84-92
    — .NET Uri.EscapeDataString then EncodeToUpper): RFC 3986 unreserved
    set kept raw, space as %20, uppercase hex. Java's URLEncoder differs
    on exactly three points — space→'+', '~'→'%7E', '*' kept raw —
    fixed up post-hoc ('+'/'~'/'*' in the encoder output can only arise
    from those inputs, so the rewrites are unambiguous)."""
    e = F.url_encode(col)
    e = F.regexp_replace(e, r"\+", "%20")
    e = F.regexp_replace(e, "%7E", "~")
    e = F.regexp_replace(e, r"\*", "%2A")
    return e


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
    "tif": "image/tiff",
    "001": "application/x-001",
    "301": "application/x-301",
    "323": "text/h323",
    "906": "application/x-906",
    "907": "drawing/907",
    "a11": "application/x-a11",
    "acp": "audio/x-mei-aac",
    "ai": "application/postscript",
    "aif": "audio/aiff",
    "aifc": "audio/aiff",
    "aiff": "audio/aiff",
    "anv": "application/x-anv",
    "asa": "text/asa",
    "asf": "video/x-ms-asf",
    "asp": "text/asp",
    "asx": "video/x-ms-asf",
    "au": "audio/basic",
    "avi": "video/avi",
    "awf": "application/vnd.adobe.workflow",
    "biz": "text/xml",
    "bmp": "application/x-bmp",
    "bot": "application/x-bot",
    "c4t": "application/x-c4t",
    "c90": "application/x-c90",
    "cal": "application/x-cals",
    "cat": "application/vnd.ms-pki.seccat",
    "cdf": "application/x-netcdf",
    "cdr": "application/x-cdr",
    "cel": "application/x-cel",
    "cer": "application/x-x509-ca-cert",
    "cg4": "application/x-g4",
    "cgm": "application/x-cgm",
    "cit": "application/x-cit",
    "class": "java/*",
    "cml": "text/xml",
    "cmp": "application/x-cmp",
    "cmx": "application/x-cmx",
    "cot": "application/x-cot",
    "crl": "application/pkix-crl",
    "crt": "application/x-x509-ca-cert",
    "csi": "application/x-csi",
    "css": "text/css",
    "cut": "application/x-cut",
    "dbf": "application/x-dbf",
    "dbm": "application/x-dbm",
    "dbx": "application/x-dbx",
    "dcd": "text/xml",
    "dcx": "application/x-dcx",
    "der": "application/x-x509-ca-cert",
    "dgn": "application/x-dgn",
    "dib": "application/x-dib",
    "dll": "application/x-msdownload",
    "doc": "application/msword",
    "dot": "application/msword",
    "drw": "application/x-drw",
    "dtd": "text/xml",
    "dwf": "Model/vnd.dwf",
    "dwg": "application/x-dwg",
    "dxb": "application/x-dxb",
    "dxf": "application/x-dxf",
    "edn": "application/vnd.adobe.edn",
    "emf": "application/x-emf",
    "eml": "message/rfc822",
    "ent": "text/xml",
    "epi": "application/x-epi",
    "eps": "application/x-ps",
    "etd": "application/x-ebx",
    "exe": "application/x-msdownload",
    "fax": "image/fax",
    "fdf": "application/vnd.fdf",
    "fif": "application/fractals",
    "fo": "text/xml",
    "frm": "application/x-frm",
    "g4": "application/x-g4",
    "gbr": "application/x-gbr",
    "gif": "image/gif",
    "gl2": "application/x-gl2",
    "gp4": "application/x-gp4",
    "hgl": "application/x-hgl",
    "hmr": "application/x-hmr",
    "hpg": "application/x-hpgl",
    "hpl": "application/x-hpl",
    "hqx": "application/mac-binhex40",
    "hrf": "application/x-hrf",
    "hta": "application/hta",
    "htc": "text/x-component",
    "htm": "text/html",
    "html": "text/html",
    "htt": "text/webviewhtml",
    "htx": "text/html",
    "icb": "application/x-icb",
    "ico": "image/x-icon",
    "iff": "application/x-iff",
    "ig4": "application/x-g4",
    "igs": "application/x-igs",
    "iii": "application/x-iphone",
    "img": "application/x-img",
    "ins": "application/x-internet-signup",
    "isp": "application/x-internet-signup",
    "ivf": "video/x-ivf",
    "java": "java/*",
    "jfif": "image/jpeg",
    "jpe": "application/x-jpe",
    "jpeg": "image/jpeg",
    "jpg": "image/jpeg",
    "js": "application/x-javascript",
    "jsp": "text/html",
    "la1": "audio/x-liquid-file",
    "lar": "application/x-laplayer-reg",
    "latex": "application/x-latex",
    "lavs": "audio/x-liquid-secure",
    "lbm": "application/x-lbm",
    "lmsff": "audio/x-la-lms",
    "ls": "application/x-javascript",
    "ltr": "application/x-ltr",
    "m1v": "video/x-mpeg",
    "m2v": "video/x-mpeg",
    "m3u": "audio/mpegurl",
    "m4e": "video/mpeg4",
    "mac": "application/x-mac",
    "man": "application/x-troff-man",
    "math": "text/xml",
    "mdb": "application/msaccess",
    "mfp": "application/x-shockwave-flash",
    "mht": "message/rfc822",
    "mhtml": "message/rfc822",
    "mi": "application/x-mi",
    "mid": "audio/mid",
    "midi": "audio/mid",
    "mil": "application/x-mil",
    "mml": "text/xml",
    "mnd": "audio/x-musicnet-download",
    "mns": "audio/x-musicnet-stream",
    "mocha": "application/x-javascript",
    "movie": "video/x-sgi-movie",
    "mp1": "audio/mp1",
    "mp2": "audio/mp2",
    "mp2v": "video/mpeg",
    "mp3": "audio/mp3",
    "mp4": "video/mpeg4",
    "mpa": "video/x-mpg",
    "mpd": "application/vnd.ms-project",
    "mpe": "video/x-mpeg",
    "mpeg": "video/mpg",
    "mpg": "video/mpg",
    "mpga": "audio/rn-mpeg",
    "mpp": "application/vnd.ms-project",
    "mps": "video/x-mpeg",
    "mpt": "application/vnd.ms-project",
    "mpv": "video/mpg",
    "mpv2": "video/mpeg",
    "mpw": "application/vnd.ms-project",
    "mpx": "application/vnd.ms-project",
    "mtx": "text/xml",
    "mxp": "application/x-mmxp",
    "net": "image/pnetvue",
    "nrf": "application/x-nrf",
    "nws": "message/rfc822",
    "odc": "text/x-ms-odc",
    "out": "application/x-out",
    "p10": "application/pkcs10",
    "p12": "application/x-pkcs12",
    "p7b": "application/x-pkcs7-certificates",
    "p7c": "application/pkcs7-mime",
    "p7m": "application/pkcs7-mime",
    "p7r": "application/x-pkcs7-certreqresp",
    "p7s": "application/pkcs7-signature",
    "pc5": "application/x-pc5",
    "pci": "application/x-pci",
    "pcl": "application/x-pcl",
    "pcx": "application/x-pcx",
    "pdf": "application/pdf",
    "pdx": "application/vnd.adobe.pdx",
    "pfx": "application/x-pkcs12",
    "pgl": "application/x-pgl",
    "pic": "application/x-pic",
    "pko": "application/vnd.ms-pki.pko",
    "pl": "application/x-perl",
    "plg": "text/html",
    "pls": "audio/scpls",
    "plt": "application/x-plt",
    "png": "image/png",
    "pot": "application/vnd.ms-powerpoint",
    "ppa": "application/vnd.ms-powerpoint",
    "ppm": "application/x-ppm",
    "pps": "application/vnd.ms-powerpoint",
    "ppt": "application/vnd.ms-powerpoint",
    "pr": "application/x-pr",
    "prf": "application/pics-rules",
    "prn": "application/x-prn",
    "prt": "application/x-prt",
    "ps": "application/x-ps",
    "ptn": "application/x-ptn",
    "pwz": "application/vnd.ms-powerpoint",
    "r3t": "text/vnd.rn-realtext3d",
    "ra": "audio/vnd.rn-realaudio",
    "ram": "audio/x-pn-realaudio",
    "ras": "application/x-ras",
    "rat": "application/rat-file",
    "rdf": "text/xml",
    "rec": "application/vnd.rn-recording",
    "red": "application/x-red",
    "rgb": "application/x-rgb",
    "rjs": "application/vnd.rn-realsystem-rjs",
    "rjt": "application/vnd.rn-realsystem-rjt",
    "rlc": "application/x-rlc",
    "rle": "application/x-rle",
    "rm": "application/vnd.rn-realmedia",
    "rmf": "application/vnd.adobe.rmf",
    "rmi": "audio/mid",
    "rmj": "application/vnd.rn-realsystem-rmj",
    "rmm": "audio/x-pn-realaudio",
    "rmp": "application/vnd.rn-rn_music_package",
    "rms": "application/vnd.rn-realmedia-secure",
    "rmvb": "application/vnd.rn-realmedia-vbr",
    "rmx": "application/vnd.rn-realsystem-rmx",
    "rnx": "application/vnd.rn-realplayer",
    "rp": "image/vnd.rn-realpix",
    "rpm": "audio/x-pn-realaudio-plugin",
    "rsml": "application/vnd.rn-rsml",
    "rt": "text/vnd.rn-realtext",
    "rtf": "application/msword",
    "rv": "video/vnd.rn-realvideo",
    "sam": "application/x-sam",
    "sat": "application/x-sat",
    "sdp": "application/sdp",
    "sdw": "application/x-sdw",
    "sit": "application/x-stuffit",
    "slb": "application/x-slb",
    "sld": "application/x-sld",
    "slk": "drawing/x-slk",
    "smi": "application/smil",
    "smil": "application/smil",
    "smk": "application/x-smk",
    "snd": "audio/basic",
    "sol": "text/plain",
    "sor": "text/plain",
    "spc": "application/x-pkcs7-certificates",
    "spl": "application/futuresplash",
    "spp": "text/xml",
    "ssm": "application/streamingmedia",
    "sst": "application/vnd.ms-pki.certstore",
    "stl": "application/vnd.ms-pki.stl",
    "stm": "text/html",
    "sty": "application/x-sty",
    "svg": "text/xml",
    "swf": "application/x-shockwave-flash",
    "tdf": "application/x-tdf",
    "tg4": "application/x-tg4",
    "tga": "application/x-tga",
    "tiff": "image/tiff",
    "tld": "text/xml",
    "top": "drawing/x-top",
    "torrent": "application/x-bittorrent",
    "tsd": "text/xml",
    "txt": "text/plain",
    "uin": "application/x-icq",
    "uls": "text/iuls",
    "vcf": "text/x-vcard",
    "vda": "application/x-vda",
    "vdx": "application/vnd.visio",
    "vml": "text/xml",
    "vpg": "application/x-vpeg005",
    "vsd": "application/vnd.visio",
    "vss": "application/vnd.visio",
    "vst": "application/vnd.visio",
    "vsw": "application/vnd.visio",
    "vsx": "application/vnd.visio",
    "vtx": "application/vnd.visio",
    "vxml": "text/xml",
    "wav": "audio/wav",
    "wax": "audio/x-ms-wax",
    "wb1": "application/x-wb1",
    "wb2": "application/x-wb2",
    "wb3": "application/x-wb3",
    "wbmp": "image/vnd.wap.wbmp",
    "wiz": "application/msword",
    "wk3": "application/x-wk3",
    "wk4": "application/x-wk4",
    "wkq": "application/x-wkq",
    "wks": "application/x-wks",
    "wm": "video/x-ms-wm",
    "wma": "audio/x-ms-wma",
    "wmd": "application/x-ms-wmd",
    "wmf": "application/x-wmf",
    "wml": "text/vnd.wap.wml",
    "wmv": "video/x-ms-wmv",
    "wmx": "video/x-ms-wmx",
    "wmz": "application/x-ms-wmz",
    "wp6": "application/x-wp6",
    "wpd": "application/x-wpd",
    "wpg": "application/x-wpg",
    "wpl": "application/vnd.ms-wpl",
    "wq1": "application/x-wq1",
    "wr1": "application/x-wr1",
    "wri": "application/x-wri",
    "wrk": "application/x-wrk",
    "ws": "application/x-ws",
    "ws2": "application/x-ws",
    "wsc": "text/scriptlet",
    "wsdl": "text/xml",
    "wvx": "video/x-ms-wvx",
    "xdp": "application/vnd.adobe.xdp",
    "xdr": "text/xml",
    "xfd": "application/vnd.adobe.xfd",
    "xfdf": "application/vnd.adobe.xfdf",
    "xhtml": "text/html",
    "xls": "application/vnd.ms-excel",
    "xlw": "application/x-xlw",
    "xml": "text/xml",
    "xpl": "audio/scpls",
    "xq": "text/xml",
    "xql": "text/xml",
    "xquery": "text/xml",
    "xsd": "text/xml",
    "xsl": "text/xml",
    "xslt": "text/xml",
    "xwd": "application/x-xwd",
    "x_b": "application/x-x_b",
    "sis": "application/vnd.symbian.install",
    "sisx": "application/vnd.symbian.install",
    "x_t": "application/x-x_t",
    "ipa": "application/vnd.iphone",
    "apk": "application/vnd.android.package-archive",
    "xap": "application/x-silverlight-app",
    "webp": "image/webp",
    "json": "application/json",
    "zip": "application/zip",
    # FileHelper.cs:685 {".", "application/x-"}: an empty extension
    # lowercases to "" and gets "." prepended, hitting this entry.
    "": "application/x-",
}


def content_type_for(ext: Column) -> Column:
    """F18: extension → MIME, the reference's full dictionary
    (FileHelper.cs:601-936, 328 entries + a few modern additions);
    '.*' fallback application/octet-stream as in the reference.
    The reference's ".IVF" entry is carried lowercase: GetContentType
    (FileHelper.cs:339) lowercases before lookup, so the uppercase key
    is unreachable there — lowercase makes it actually resolvable."""
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

"""URL canonicalization + registrable-domain extraction.

Reference behaviors reproduced (see SURVEY.md §2.8 F7/F19):
- relative→absolute resolution like `new Uri(base, rel)`
  (HZ.Crawler.Common/Net/HttpResponse.cs:39-66),
- naive query-param extraction `GetUrlKeyValue`
  (HZ.Crawler.Common/Extensions/StringExtension.cs:11-24).

Canonicalization contract (BASELINE.json north_star): lowercase host,
strip fragment, normalize path (dot-segments, duplicate slashes), drop
default ports, keep query as-is. Idempotent (property-tested).

All per-row logic is exposed both as plain Python (for the oracle) and as
vectorized pandas UDFs (for the engine) — no per-row Python inside Spark.
"""

from __future__ import annotations

import posixpath
from urllib.parse import urljoin, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .psl import default_psl

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}


def canonicalize_url(url: str, base: str | None = None) -> str | None:
    """Canonical form of ``url`` (optionally resolved against ``base``).

    Returns None for non-fetchable schemes (mailto:, javascript:, data:)
    and malformed inputs — callers filter those out of the frontier.
    """
    if url is None:
        return None
    url = url.strip()
    if not url:
        return None
    if base:
        url = urljoin(base, url)
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https", "ftp"):
        return None
    host = (parts.hostname or "").lower().rstrip(".")
    if not host:
        return None
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    # normalize dot-segments + duplicate slashes, preserve trailing slash
    trailing = "/" if path.endswith("/") and path != "/" else ""
    norm = posixpath.normpath(path)
    if norm == ".":
        norm = "/"
    path = norm + (trailing if norm != "/" else "")
    # fragment always stripped
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def registrable_domain(host_or_url: str) -> str | None:
    """Registrable domain (eTLD+1) of a host or URL, backed by the full
    PSL matching algorithm over a data-file rule set (crawler_spark/
    data/public_suffix_list.dat; inject the upstream list via
    psl.set_default_psl for production). Wildcards, exceptions and
    multi-level rules are honored — this is the politeness fairness key
    (SURVEY.md §4.2-1), so collapsing e.g. all of *.co.uk into one
    budget would starve whole country zones."""
    if not host_or_url:
        return None
    s = host_or_url
    if "://" in s:
        try:
            s = urlsplit(s).hostname or ""
        except ValueError:
            return None
    return default_psl().registrable_domain(s)


def url_key_value(url: str, key: str) -> str | None:
    """Naive query-param get, replicating GetUrlKeyValue's split-based
    parsing (StringExtension.cs:11-24) including its edge cases: no URL
    decoding, first match wins, value may contain '='-free garbage."""
    if not url or "?" not in url:
        return None
    query = url.split("?", 1)[1]
    for pair in query.split("&"):
        if "=" in pair:
            k, v = pair.split("=", 1)
            if k == key:
                return v
    return None


# ---------------------------------------------------------------------------
# Vectorized pandas UDFs (Arrow-batched; the engine's hot path)
# ---------------------------------------------------------------------------
@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:  # pragma: no cover - spark
    return urls.map(lambda u: canonicalize_url(u) if u is not None else None)


# The function IS deterministic; the marker only withholds the
# optimizer freedoms that hurt here: with a deterministic UDF, the
# `url IS NOT NULL` gate above it is pushed below the projection and
# into every union branch, so each successor row is canonicalized
# TWICE (event-log audit, exec 99: ArrowEvalPython per branch + again
# post-union). Nondeterministic marking pins one evaluation per row.
canonicalize_once_udf = canonicalize_udf.asNondeterministic()


@F.pandas_udf(T.StringType())
def canonicalize_with_base_udf(
    urls: pd.Series, bases: pd.Series
) -> pd.Series:  # pragma: no cover - spark
    return pd.Series(
        [canonicalize_url(u, b) if u is not None else None for u, b in zip(urls, bases)]
    )


@F.pandas_udf(T.StringType())
def registrable_domain_udf(hosts: pd.Series) -> pd.Series:  # pragma: no cover
    return hosts.map(lambda h: registrable_domain(h) if h is not None else None)

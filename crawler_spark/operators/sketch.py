"""Cardinality sketches as deterministic, oracle-exact SQL.

At 10^10-URL frontier scale, exact ``COUNT(DISTINCT url)`` per host /
per partition is a full shuffle of every key; production crawl metrics
(URL-seen growth, per-host frontier size, vocabulary growth) use
HyperLogLog instead. Spark's built-in ``approx_count_distinct`` IS an
HLL++, but its estimate is not reproducible in DuckDB, so to keep the
value-exact oracle contract this module implements classic HLL
(Flajolet et al. 2007) *explicitly* in portable SQL: both engines hash
with md5, bucket on the top 6 bits, take the max leading-zero rank per
bucket, and combine with exact integer arithmetic (the ``2^-M_j`` sum
is scaled by ``2^55`` so it stays a BIGINT — no float accumulation
order to disagree on). The only floats are one final division and, on
the linear-counting branch, one ``ln`` on identical doubles.

Plan shape (the reason the sketch exists): tokens → map-side
(bucket, rank) projection → ONE partial-aggregating groupBy on
(lang, bucket) capped at 64 rows per lang → 64-row rollup. At any
corpus size the shuffle carries ≤ 64 rows per group key — compare the
exact twin, whose shuffle carries every distinct token.

Reference analog: the reference keeps its URL-seen set as an exact
in-memory ``HashSet``/Redis set (HZ.Crawler.DataSpider/BaseSpider.cs
seen-set usage); a 10^10-key crawl replaces exact membership counting
with sketches like this one.
"""

from __future__ import annotations

from .textprep import DUCK_WORDS, SPARK_WORDS

_M = 64  # 2^6 buckets
_ALPHA_M = 0.709  # Flajolet alpha_64
_W_BITS = 42  # 48-bit md5 prefix minus 6 bucket bits
_W_MOD = 1 << _W_BITS
# exact-integer scaling: sum(2^-M_j) * 2^55; max term 2^55, 64 terms
# -> <= 2^61, no BIGINT overflow; max rank 43 -> min exponent 12 >= 0
_SCALE_POW = 55
_NUM = repr(_ALPHA_M * _M * _M * float(1 << _SCALE_POW))
_LC_THRESHOLD = repr(2.5 * _M)  # linear-counting cutover


def _bitlen_case(col: str, bits: int = _W_BITS) -> str:
    """Exact integer bit-length of ``col`` (0 for 0) as a CASE ladder —
    string/log-free so both engines agree bit-for-bit."""
    branches = " ".join(
        f"WHEN {col} >= {1 << (b - 1)} THEN {b}" for b in range(bits, 0, -1)
    )
    return f"CASE {branches} ELSE 0 END"


# rank rho = (leading zeros of the 42-bit word) + 1 = 43 - bitlen(w)
_RHO_SPARK = f"{_W_BITS + 1} - ({_bitlen_case('w')})"
_RHO_DUCK = _RHO_SPARK  # same pure-arithmetic ladder


def hll_views_spark() -> tuple[list[tuple[str, str]], str]:
    """(views, final) for :func:`queries._views_fn` — the token explode
    is evaluated once (Spark inlines CTEs; the exact-distinct audit twin
    would otherwise re-explode the corpus)."""
    views = [
        (
            "hll_toks_v",
            f"SELECT lang, explode({SPARK_WORDS}) AS token FROM documents",
        )
    ]
    final = f"""
WITH h AS (
  SELECT lang,
         cast(conv(substring(md5(token), 1, 12), 16, 10) AS bigint) AS v
  FROM hll_toks_v),
b AS (SELECT lang, v div {_W_MOD} AS j, v % {_W_MOD} AS w FROM h),
r AS (SELECT lang, j, max({_RHO_SPARK}) AS m FROM b GROUP BY lang, j),
grid AS (
  SELECT l.lang, g.j FROM (SELECT DISTINCT lang FROM documents) l
  CROSS JOIN (SELECT explode(sequence(0, {_M - 1})) AS j) g),
mm AS (
  SELECT grid.lang, coalesce(r.m, 0) AS m
  FROM grid LEFT JOIN r ON grid.lang = r.lang AND grid.j = r.j),
agg AS (
  SELECT lang,
         sum(shiftleft(cast(1 AS bigint), {_SCALE_POW} - m)) AS s,
         sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS v0
  FROM mm GROUP BY lang),
ex AS (
  SELECT lang, count(DISTINCT token) AS exact_distinct
  FROM hll_toks_v GROUP BY lang)
SELECT a.lang,
       round(CASE WHEN ({_NUM} / a.s) <= {_LC_THRESHOLD} AND a.v0 > 0
                  THEN cast({_M} AS double) * ln(cast({_M} AS double) / a.v0)
                  ELSE ({_NUM} / a.s) END, 4) AS hll_distinct,
       e.exact_distinct
FROM agg a JOIN ex e ON a.lang = e.lang
"""
    return views, final


def hll_duck() -> str:
    return f"""
WITH toks AS (SELECT lang, unnest({DUCK_WORDS}) AS token FROM documents),
h AS (
  SELECT lang, ('0x' || substring(md5(token), 1, 12))::BIGINT AS v
  FROM toks),
b AS (SELECT lang, v // {_W_MOD} AS j, v % {_W_MOD} AS w FROM h),
r AS (SELECT lang, j, max({_RHO_DUCK}) AS m FROM b GROUP BY lang, j),
grid AS (
  SELECT l.lang, g.j FROM (SELECT DISTINCT lang FROM documents) l
  CROSS JOIN (SELECT unnest(range(0, {_M})) AS j) g),
mm AS (
  SELECT grid.lang, coalesce(r.m, 0) AS m
  FROM grid LEFT JOIN r ON grid.lang = r.lang AND grid.j = r.j),
agg AS (
  SELECT lang,
         sum((1::BIGINT << ({_SCALE_POW} - m))) AS s,
         sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS v0
  FROM mm GROUP BY lang),
ex AS (
  SELECT lang, count(DISTINCT token) AS exact_distinct
  FROM toks GROUP BY lang)
SELECT a.lang,
       round(CASE WHEN ({_NUM} / a.s) <= {_LC_THRESHOLD} AND a.v0 > 0
                  THEN cast({_M} AS double) * ln(cast({_M} AS double) / a.v0)
                  ELSE ({_NUM} / a.s) END, 4) AS hll_distinct,
       e.exact_distinct
FROM agg a JOIN ex e ON a.lang = e.lang
"""


# ---------------------------------------------------------------------------
# HLL sketch MERGE across sources — the property the sketch exists for
# ---------------------------------------------------------------------------
# At 100 TB the corpus arrives as shards (per-dump, per-source, per-
# partition); the whole point of HLL over COUNT(DISTINCT) is that the
# 64-cell per-shard sketches MERGE by per-bucket max into the corpus-
# wide sketch without rescanning a single token (Flajolet 2007 §4 —
# union cardinality is lossless under max-merge, the same property
# the stream_quantile_hist additive bins demonstrate for histograms).
# This operator emits one row per source (the per-shard sketch's
# estimate) plus one '__ALL__' row whose estimate is computed PURELY
# from max-merging the per-source (bucket, rank) grids — the shuffle
# after the per-source sketch stage carries ≤ 64 rows per source,
# ever. exact_distinct audits each row (same contract as
# sketch_hll_vocab); merged == direct holds by construction
# (max-of-per-source-max = corpus max), asserted by pytest.
#
# Key domain: word BIGRAMS, not unigrams — the sf corpus draws every
# source from one tiny shared vocabulary (~31 words), so per-source
# unigram sketches are identical and a union would be vacuous; bigram
# sets genuinely differ per source (≈700 per source vs 916 union at
# sf0.01), so the '__ALL__' row strictly exceeds every shard.


def _hll_union_body(estimate: str) -> str:
    """Shared estimator tail over a view `u` of (source, j, m) rows —
    per-source sketches UNION one max-merged '__ALL__' sketch."""
    return f"""
r2 AS (
  SELECT source, j, m FROM u
  UNION ALL
  SELECT '__ALL__' AS source, j, max(m) AS m FROM u GROUP BY j),
grid AS (
  SELECT s.source, g.j
  FROM (SELECT DISTINCT source FROM r2) s CROSS JOIN buckets g),
mm AS (
  SELECT grid.source, coalesce(r2.m, 0) AS m
  FROM grid LEFT JOIN r2 ON grid.source = r2.source AND grid.j = r2.j),
agg AS (
  SELECT source,
         {estimate} AS s,
         sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS v0
  FROM mm GROUP BY source),
ex AS (
  SELECT source, count(DISTINCT token) AS exact_distinct FROM toks
  GROUP BY source
  UNION ALL
  SELECT '__ALL__', count(DISTINCT token) FROM toks)
SELECT a.source,
       round(CASE WHEN ({_NUM} / a.s) <= {_LC_THRESHOLD} AND a.v0 > 0
                  THEN cast({_M} AS double) * ln(cast({_M} AS double) / a.v0)
                  ELSE ({_NUM} / a.s) END, 4) AS hll_distinct,
       e.exact_distinct
FROM agg a JOIN ex e ON a.source = e.source
"""


def hll_union_views_spark() -> tuple[list[tuple[str, str]], str]:
    views = [
        (
            "hllu_toks_v",
            f"""WITH t AS (SELECT source, {SPARK_WORDS} AS w FROM documents)
SELECT source,
       concat(w[p - 1], ' ', w[p]) AS token
FROM t LATERAL VIEW explode(sequence(1, size(w) - 1)) AS p
WHERE size(w) >= 2""",
        ),
        (
            "hllu_sketch_v",
            f"""WITH h AS (
  SELECT source,
         cast(conv(substring(md5(token), 1, 12), 16, 10) AS bigint) AS v
  FROM hllu_toks_v),
b AS (SELECT source, v div {_W_MOD} AS j, v % {_W_MOD} AS w FROM h)
SELECT source, j, max({_RHO_SPARK}) AS m FROM b GROUP BY source, j""",
        ),
    ]
    final = (
        "WITH toks AS (SELECT source, token FROM hllu_toks_v),\n"
        "u AS (SELECT source, j, m FROM hllu_sketch_v),\n"
        f"buckets AS (SELECT explode(sequence(0, {_M - 1})) AS j),\n"
        + _hll_union_body(
            f"sum(shiftleft(cast(1 AS bigint), {_SCALE_POW} - m))"
        )
    )
    return views, final


def hll_union_duck() -> str:
    return (
        f"""WITH t AS (SELECT source, {DUCK_WORDS} AS w FROM documents),
toks AS (
  SELECT source, w[p] || ' ' || w[p + 1] AS token
  FROM t, unnest(generate_series(1, len(w) - 1)) AS u(p)
  WHERE len(w) >= 2),
h AS (
  SELECT source, ('0x' || substring(md5(token), 1, 12))::BIGINT AS v
  FROM toks),
b AS (SELECT source, v // {_W_MOD} AS j, v % {_W_MOD} AS w FROM h),
u AS (SELECT source, j, max({_RHO_DUCK}) AS m FROM b GROUP BY source, j),
buckets AS (SELECT unnest(range(0, {_M})) AS j),\n"""
        + _hll_union_body(f"sum((1::BIGINT << ({_SCALE_POW} - m)))")
    )


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------
# Cormode & Muthukrishnan 2005 ("An improved data stream summary: the
# count-min sketch and its applications", J. Algorithms 55).
# The frequency twin of the HLL above: per-key counts at 10^10 events
# (requests per user, fetches per host) via a d×w counter grid instead
# of an exact per-key groupBy. Same portability recipe — salted md5
# row-hashes, integer-only cells, so Spark and DuckDB build the
# IDENTICAL sketch. Estimate = min over d rows of the hashed cell
# (classic CMS upper bound: cms_n >= exact_n always, equality unless
# collided). Plan shape: the event scan explodes ×d but map-side
# partial agg collapses to ≤ d·w cells before the shuffle, and the
# key-side probe joins a d·w-row broadcast — no full-key shuffle.

_CMS_D = 4
_CMS_W = 128
_CMS_TOPK = 20


def _cms_h_spark(key: str, r: str = "r") -> str:
    return (
        f"cast(conv(substring(md5(concat(cast({key} AS string), ':cms',"
        f" cast({r} AS string))), 1, 8), 16, 10) AS bigint) % {_CMS_W}"
    )


def _cms_h_duck(key: str, r: str = "r") -> str:
    return (
        f"('0x' || substring(md5({key}::VARCHAR || ':cms' || {r}::VARCHAR),"
        f" 1, 8))::BIGINT % {_CMS_W}"
    )


CMS_SPARK = f"""
WITH rs AS (SELECT explode(sequence(0, {_CMS_D - 1})) AS r),
cells AS (
  SELECT r, {_cms_h_spark('user_id')} AS h, count(*) AS c
  FROM events CROSS JOIN rs GROUP BY r, h),
keys AS (SELECT user_id, count(*) AS exact_n FROM events GROUP BY user_id),
probe AS (
  SELECT k.user_id, k.exact_n, c.c
  FROM keys k CROSS JOIN rs
  JOIN cells c
    ON c.r = rs.r AND c.h = {_cms_h_spark('k.user_id', 'rs.r')}),
est AS (
  SELECT user_id, exact_n, min(c) AS cms_n
  FROM probe GROUP BY user_id, exact_n)
SELECT user_id, exact_n, cms_n
FROM est ORDER BY exact_n DESC, user_id LIMIT {_CMS_TOPK}
"""

CMS_DUCK = f"""
WITH rs AS (SELECT unnest(range(0, {_CMS_D})) AS r),
cells AS (
  SELECT r, {_cms_h_duck('user_id')} AS h, count(*) AS c
  FROM events CROSS JOIN rs GROUP BY r, h),
keys AS (SELECT user_id, count(*) AS exact_n FROM events GROUP BY user_id),
probe AS (
  SELECT k.user_id, k.exact_n, c.c
  FROM keys k CROSS JOIN rs
  JOIN cells c
    ON c.r = rs.r AND c.h = {_cms_h_duck('k.user_id', 'rs.r')}),
est AS (
  SELECT user_id, exact_n, min(c) AS cms_n
  FROM probe GROUP BY user_id, exact_n)
SELECT user_id, exact_n, cms_n
FROM est ORDER BY exact_n DESC, user_id LIMIT {_CMS_TOPK}
"""


# ---------------------------------------------------------------------------
# fixed-bin quantile sketch (histogram quantiles with a bounded shuffle)
# ---------------------------------------------------------------------------
# Exact percentiles over 10^10 events (events_value_quantiles' twin)
# need every value shuffled to one reducer per group; the production
# shape is a mergeable sketch. This is the simplest one with a hard
# deterministic error bound: a 1024-bin equi-width histogram over
# [min, max]. Estimate = upper edge of the first bin whose cumulative
# count reaches the target rank, so |est - exact| <= one bin width
# (pinned by a pytest against the exact percentile). Everything is
# integer arithmetic except the bin index and the final edge formula —
# both single IEEE expressions on identical doubles (no libm), so the
# oracle is value-exact. Plan shape: one pass for (lo, hi, n), one
# map-side-combined groupBy into <= 1024 cells, then a <= 1024-row
# window — the shuffle carries 1024 rows at any event count.
# Rank thresholds are integer cross-multiplied (cum * 1000 >= qp * n):
# no 0.9 * n float ever materializes.

_QH_BINS = 1024
_QH_QPS = (500, 900, 990)  # permille targets


def _qh_final(qs_cte: str) -> str:
    return f"""
WITH qs AS ({qs_cte}),
sel AS (
  SELECT q.qp, min(c.bin) AS qbin
  FROM qs q CROSS JOIN qh_cum c CROSS JOIN qh_s s
  WHERE c.cum * 1000 >= q.qp * s.n
  GROUP BY q.qp)
SELECT sel.qp, sel.qbin,
       s.lo + (sel.qbin + 1) * (s.hi - s.lo) / {_QH_BINS} AS est_value
FROM sel CROSS JOIN qh_s s
"""


_QH_S_SQL = "SELECT min(value) AS lo, max(value) AS hi, count(*) AS n FROM events"


def _qh_cum_sql(bin_expr: str) -> str:
    return f"""
SELECT bin, cast(sum(c) OVER (ORDER BY bin
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
FROM (SELECT {bin_expr} AS bin, count(*) AS c
      FROM events e CROSS JOIN qh_s s GROUP BY 1)
"""


# degenerate all-equal corpus guard: hi = lo would divide by zero
# (Spark 4 ANSI throws where DuckDB returns inf)
_QH_BIN = f"""CASE WHEN s.hi = s.lo THEN cast(0 AS bigint)
  ELSE cast(least(floor((e.value - s.lo) * {_QH_BINS} / (s.hi - s.lo)),
                  {_QH_BINS - 1}) AS bigint) END"""


def quantile_hist_views_spark() -> tuple[list[tuple[str, str]], str]:
    """(views, final) for queries._views_fn: the 1-row (lo, hi, n)
    relation is evaluated once instead of at its three CTE references
    (each inlined reference would re-scan the full events table)."""
    views = [
        ("qh_s", _QH_S_SQL),
        ("qh_cum", _qh_cum_sql(_QH_BIN)),
    ]
    return views, _qh_final("SELECT explode(array(500, 900, 990)) AS qp")


def quantile_hist_duck() -> str:
    return f"""
WITH qh_s AS ({_QH_S_SQL}),
qh_cum AS ({_qh_cum_sql(_QH_BIN)}),
qs AS (SELECT unnest([500, 900, 990]) AS qp),
sel AS (
  SELECT q.qp, min(c.bin) AS qbin
  FROM qs q CROSS JOIN qh_cum c CROSS JOIN qh_s s
  WHERE c.cum * 1000 >= q.qp * s.n
  GROUP BY q.qp)
SELECT sel.qp, sel.qbin,
       s.lo + (sel.qbin + 1) * (s.hi - s.lo) / {_QH_BINS} AS est_value
FROM sel CROSS JOIN qh_s s
"""

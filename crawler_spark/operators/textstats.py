"""Text-analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — each as a (Spark SQL, DuckDB SQL) pair with
identical deterministic semantics.

These are the per-document map-side passes of a training-data pipeline:
no shuffles except the final fingerprint groupBy; everything else is a
projection that scales embarrassingly."""

from __future__ import annotations

from .textprep import DUCK_WORDS, SPARK_WORDS, duck_shingle_sql, spark_shingle_sql

# marker stopwords for the n-gram language heuristic (deterministic
# tiny-model stand-in; real lang-id would be a fastText-style broadcast
# model in a pandas UDF)
_EN = "'the','a','and','of','to','in','is','that','it','on'"
_DE = "'der','die','das','und','ist','nicht','ein','mit'"
_FR = "'le','la','les','de','et','des','un','une','est'"
_ES = "'el','la','los','de','que','y','en','un','una'"

# Spark SQL string literals process backslash escapes; DuckDB's do not.
_CJK_RE = "[\\\\x{4e00}-\\\\x{9fff}]"
_CJK_RE_DUCK = "[\\x{4e00}-\\x{9fff}]"


def lang_id_spark() -> str:
    return f"""
WITH w AS (SELECT doc_id, {SPARK_WORDS} AS w, text FROM documents),
hits AS (
  SELECT doc_id,
         size(w) AS n,
         size(filter(w, x -> x IN ({_EN}))) AS en,
         size(filter(w, x -> x IN ({_DE}))) AS de,
         size(filter(w, x -> x IN ({_FR}))) AS fr,
         size(filter(w, x -> x IN ({_ES}))) AS es,
         CASE WHEN text RLIKE '{_CJK_RE}' THEN 1 ELSE 0 END AS cjk
  FROM w)
SELECT doc_id,
       CASE WHEN cjk = 1 THEN 'zh'
            WHEN en >= de AND en >= fr AND en >= es AND en > 0 THEN 'en'
            WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
            WHEN fr >= es AND fr > 0 THEN 'fr'
            WHEN es > 0 THEN 'es'
            ELSE 'und' END AS pred_lang,
       CASE WHEN n = 0 THEN cast(0 AS double)
            ELSE round(cast(en AS double) / n, 4) END AS en_ratio
FROM hits
"""


def lang_id_duck() -> str:
    return f"""
WITH w AS (SELECT doc_id, {DUCK_WORDS} AS w, text FROM documents),
hits AS (
  SELECT doc_id,
         len(w) AS n,
         len(list_filter(w, x -> x IN ({_EN}))) AS en,
         len(list_filter(w, x -> x IN ({_DE}))) AS de,
         len(list_filter(w, x -> x IN ({_FR}))) AS fr,
         len(list_filter(w, x -> x IN ({_ES}))) AS es,
         CASE WHEN regexp_matches(text, '{_CJK_RE_DUCK}') THEN 1 ELSE 0 END
           AS cjk
  FROM w)
SELECT doc_id,
       CASE WHEN cjk = 1 THEN 'zh'
            WHEN en >= de AND en >= fr AND en >= es AND en > 0 THEN 'en'
            WHEN de >= fr AND de >= es AND de > 0 THEN 'de'
            WHEN fr >= es AND fr > 0 THEN 'fr'
            WHEN es > 0 THEN 'es'
            ELSE 'und' END AS pred_lang,
       CASE WHEN n = 0 THEN cast(0 AS double)
            ELSE round(cast(en AS double) / n, 4) END AS en_ratio
FROM hits
"""


# quality: length/stopword/punctuation/word-length heuristics, integer
# arithmetic until the final rounded division (cross-engine stable)
_STOP = _EN

QUALITY_SPARK = f"""
WITH w AS (SELECT doc_id, text, {SPARK_WORDS} AS w FROM documents),
m AS (
  SELECT doc_id,
         size(w) AS n_words,
         length(text) AS n_chars,
         size(filter(w, x -> x IN ({_STOP}))) AS n_stop,
         length(text) - length(regexp_replace(text, '[.,;:!?]', ''))
           AS n_punct,
         aggregate(w, 0, (acc, x) -> acc + length(x)) AS chars_in_words
  FROM w)
SELECT doc_id, n_words, n_chars,
       CASE WHEN n_words = 0 THEN cast(0 AS double)
            ELSE round(cast(n_stop AS double) / n_words, 4)
            END AS stopword_ratio,
       CASE WHEN n_chars = 0 THEN cast(0 AS double)
            ELSE round(cast(n_punct AS double) / n_chars, 4)
            END AS punct_ratio,
       CASE WHEN n_words = 0 THEN cast(0 AS double)
            ELSE round(cast(chars_in_words AS double) / n_words, 4)
            END AS mean_word_len,
       CASE WHEN n_words >= 20 AND n_stop > 0 THEN 1 ELSE 0 END AS keep
FROM m
"""

QUALITY_DUCK = f"""
WITH w AS (SELECT doc_id, text, {DUCK_WORDS} AS w FROM documents),
m AS (
  SELECT doc_id,
         len(w) AS n_words,
         length(text) AS n_chars,
         len(list_filter(w, x -> x IN ({_STOP}))) AS n_stop,
         length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g'))
           AS n_punct,
         list_sum(list_transform(w, x -> length(x))) AS chars_in_words
  FROM w)
SELECT doc_id, n_words, n_chars,
       CASE WHEN n_words = 0 THEN cast(0 AS double)
            ELSE round(cast(n_stop AS double) / n_words, 4)
            END AS stopword_ratio,
       CASE WHEN n_chars = 0 THEN cast(0 AS double)
            ELSE round(cast(n_punct AS double) / n_chars, 4)
            END AS punct_ratio,
       CASE WHEN n_words = 0 THEN cast(0 AS double)
            ELSE round(cast(chars_in_words AS double) / n_words, 4)
            END AS mean_word_len,
       CASE WHEN n_words >= 20 AND n_stop > 0 THEN 1 ELSE 0 END AS keep
FROM m
"""

# token counting: whitespace + a BPE-ish regex segmentation
_BPE_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\\\s]"
_BPE_RE_DUCK = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"

TOKEN_COUNT_SPARK = f"""
SELECT doc_id,
       size({SPARK_WORDS}) AS ws_tokens,
       regexp_count(text, '{_BPE_RE}') AS bpe_tokens
FROM documents
"""

TOKEN_COUNT_DUCK = f"""
SELECT doc_id,
       len({DUCK_WORDS}) AS ws_tokens,
       len(regexp_extract_all(text, '{_BPE_RE_DUCK}')) AS bpe_tokens
FROM documents
"""


def fingerprint_spark(n: int = 3, kmin: int = 5) -> str:
    """Winnowing-style k-min-hash content fingerprint: md5 over the k
    lexicographically smallest shingle hashes (order-independent)."""
    return f"""
WITH sh AS ({spark_shingle_sql(n)}),
h AS (SELECT doc_id, md5(sh) AS hsh FROM sh)
SELECT doc_id,
       md5(array_join(slice(array_sort(collect_list(hsh)), 1, {kmin}), ''))
         AS fingerprint,
       count(*) AS n_shingles
FROM h GROUP BY doc_id
"""


def fingerprint_duck(n: int = 3, kmin: int = 5) -> str:
    return f"""
WITH sh AS ({duck_shingle_sql(n)}),
h AS (SELECT doc_id, md5(sh) AS hsh FROM sh)
SELECT doc_id,
       md5(array_to_string(list_sort(list(hsh))[1:{kmin}], ''))
         AS fingerprint,
       count(*) AS n_shingles
FROM h GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# boilerplate detection: corpus-frequency shingle analysis per source
# ---------------------------------------------------------------------------
# The CCNet/RefinedWeb-style cleanup step: a shingle that appears in
# more than `pct`% of one source's documents is boilerplate (nav bars,
# cookie banners, footers repeat per site); each document reports how
# much of it is boilerplate so a pipeline can drop or trim. Integer
# cross-multiplication (df*100 >= n*pct) keeps the threshold exact in
# both engines. Scale shape: two hash aggregations (per-(source,
# shingle) df, per-source doc count) + one broadcast-able join of the
# small per-source totals — no pair joins anywhere.

def _boilerplate_body(shingle_cte: str, pct: int) -> str:
    return f"""
WITH sh AS ({shingle_cte}),
docsrc AS (SELECT doc_id, source FROM documents),
ssh AS (SELECT s.doc_id, d.source, s.sh
        FROM sh s JOIN docsrc d ON s.doc_id = d.doc_id),
df AS (SELECT source, sh, count(*) AS df FROM ssh GROUP BY source, sh),
ndocs AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
boiler AS (SELECT d.source, d.sh
           FROM df d JOIN ndocs nd ON d.source = nd.source
           WHERE d.df * 100 >= nd.n * {pct}),
marked AS (
  SELECT s.doc_id,
         CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0 END AS is_boiler
  FROM ssh s LEFT JOIN boiler b
    ON s.source = b.source AND s.sh = b.sh)
SELECT doc_id,
       count(*) AS n_shingles,
       cast(sum(is_boiler) AS bigint) AS n_boiler,
       round(cast(sum(is_boiler) AS double) / count(*), 4) AS boiler_ratio
FROM marked GROUP BY doc_id
"""


def boilerplate_spark(n: int = 2, pct: int = 10) -> str:
    return _boilerplate_body(spark_shingle_sql(n), pct)


def boilerplate_duck(n: int = 2, pct: int = 10) -> str:
    return _boilerplate_body(duck_shingle_sql(n), pct)


# ---------------------------------------------------------------------------
# PII extraction / redaction stats
# ---------------------------------------------------------------------------
# Reference regexes verbatim (HZ.Crawler.Common/Extensions/
# StringExtension.cs:26-42: IsEmail, IsPhoneNum) applied as extract-all
# + redact. The corpus text is synthetic word-soup with no PII, so the
# query deterministically injects addresses/numbers derived from doc_id
# before matching — the oracle check exercises real matches instead of
# passing vacuously on all-zero counts. Map-side only: no joins, no
# shuffle; at 100 TB this is a pure scan→project pass.

_EMAIL_SPARK = "\\\\w[-\\\\w.+]*@([A-Za-z0-9][-A-Za-z0-9]+\\\\.)+[A-Za-z]{2,14}"
_EMAIL_DUCK = "\\w[-\\w.+]*@([A-Za-z0-9][-A-Za-z0-9]+\\.)+[A-Za-z]{2,14}"
_PHONE_RE = "0?(13|14|15|17|18|19)[0-9]{9}"

PII_SPARK = f"""
WITH t AS (
  SELECT doc_id,
         concat(text,
           CASE WHEN doc_id % 3 = 0
                THEN concat(' u', cast(doc_id AS string),
                            '@mail.example.com') ELSE '' END,
           CASE WHEN doc_id % 5 = 0
                THEN concat(' 13',
                            lpad(cast(doc_id % 100000000 AS string), 9, '0'))
                ELSE '' END) AS text
  FROM documents)
SELECT doc_id,
       size(regexp_extract_all(text, '{_EMAIL_SPARK}', 0)) AS n_emails,
       size(regexp_extract_all(text, '{_PHONE_RE}', 0)) AS n_phones,
       md5(regexp_replace(regexp_replace(text, '{_EMAIL_SPARK}', '<EMAIL>'),
                          '{_PHONE_RE}', '<PHONE>')) AS redacted_md5
FROM t
"""

PII_DUCK = f"""
WITH t AS (
  SELECT doc_id,
         concat(text,
           CASE WHEN doc_id % 3 = 0
                THEN concat(' u', cast(doc_id AS VARCHAR),
                            '@mail.example.com') ELSE '' END,
           CASE WHEN doc_id % 5 = 0
                THEN concat(' 13',
                            lpad(cast(doc_id % 100000000 AS VARCHAR), 9, '0'))
                ELSE '' END) AS text
  FROM documents)
SELECT doc_id,
       len(regexp_extract_all(text, '{_EMAIL_DUCK}', 0)) AS n_emails,
       len(regexp_extract_all(text, '{_PHONE_RE}', 0)) AS n_phones,
       md5(regexp_replace(regexp_replace(text, '{_EMAIL_DUCK}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM t
"""


# ---------------------------------------------------------------------------
# intra-document repetition (Gopher-style quality rules)
# ---------------------------------------------------------------------------
# Rae et al. 2021 (Gopher, arXiv:2112.11446) filter documents whose
# duplicate-n-gram fraction or top-n-gram fraction is high — machine-
# generated / spammy text repeats itself. Per-doc signals only:
# one hash agg on (doc_id, gram) then one on doc_id — linear, no pair
# joins, partitions by doc_id so it scales embarrassingly at 100 TB.
# Unlike the dedup shingles these grams are NON-distinct (multiplicity
# is the signal).

def _repetition_body(words: str, grams_case: str) -> str:
    return f"""
WITH w AS (SELECT doc_id, {words} AS w FROM documents),
g AS (SELECT doc_id, {grams_case} AS gram FROM w),
cnt AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram)
SELECT doc_id,
       cast(sum(c) AS bigint) AS n_grams,
       count(*) AS n_distinct,
       cast(max(c) AS bigint) AS top_count,
       round(cast(sum(c) - count(*) AS double) / sum(c), 4) AS dup_frac,
       round(cast(max(c) AS double) / sum(c), 4) AS top_frac
FROM cnt GROUP BY doc_id
"""


def repetition_spark(n: int = 2) -> str:
    grams = f"""explode(CASE WHEN size(w) < {n}
      THEN array(array_join(w, ' '))
      ELSE transform(sequence(1, size(w) - {n - 1}),
             i -> array_join(slice(w, i, {n}), ' ')) END)"""
    return _repetition_body(SPARK_WORDS, grams)


def repetition_duck(n: int = 2) -> str:
    grams = f"""unnest(CASE WHEN len(w) < {n}
      THEN [array_to_string(w, ' ')]
      ELSE list_transform(range(1, len(w) - {n - 2}),
             i -> array_to_string(w[i:i + {n - 1}], ' ')) END)"""
    return _repetition_body(DUCK_WORDS, grams)


# ---------------------------------------------------------------------------
# global vocabulary stats: corpus-wide token frequency top-k
# ---------------------------------------------------------------------------
# The word-count of a training pipeline: tokenizer-vocab construction,
# stopword discovery, boilerplate-phrase mining. Scale shape: one
# groupBy(token) with map-side partial aggregation (the token relation
# never materializes — explode feeds the hash-agg directly) and the
# top-k is ORDER BY + LIMIT, which Spark executes as
# TakeOrderedAndProject (per-partition heaps, no global sort). Ties at
# the k-boundary are broken by token text, so the result SET is
# deterministic cross-engine.

VOCAB_K = 50

VOCAB_SPARK = f"""
WITH toks AS (SELECT doc_id, explode({SPARK_WORDS}) AS token FROM documents),
f AS (SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
      FROM toks GROUP BY token)
SELECT token, tf, df FROM f
ORDER BY tf DESC, token
LIMIT {VOCAB_K}
"""

VOCAB_DUCK = f"""
WITH toks AS (SELECT doc_id, unnest({DUCK_WORDS}) AS token FROM documents),
f AS (SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
      FROM toks GROUP BY token)
SELECT token, tf, df FROM f
ORDER BY tf DESC, token
LIMIT {VOCAB_K}
"""


# ---------------------------------------------------------------------------
# deterministic stratified sampling (per-language keep rates)
# ---------------------------------------------------------------------------
# Data mixing: training pipelines up/down-sample per stratum (language,
# source, quality band). Random sampling is not reproducible or
# oracle-able; instead each doc maps to a bucket in [0,100) via a salted
# md5 of its id — deterministic, uniform, engine-portable (hex prefix ->
# integer), and stable under corpus growth (a doc's keep/drop never
# changes when other docs arrive — resumable ingestion needs exactly
# this). Pure map-side projection + filter: no shuffle at any scale.

_RATES = "WHEN lang = 'en' THEN 30 WHEN lang = 'zh' THEN 80 WHEN lang = 'de' THEN 60 WHEN lang = 'fr' THEN 60 WHEN lang = 'es' THEN 60 ELSE 10"

SAMPLE_SPARK = f"""
WITH b AS (
  SELECT doc_id, lang,
         cast(conv(substring(md5(concat(cast(doc_id AS string), ':s42')),
                             1, 8), 16, 10) AS bigint) % 100 AS bucket,
         CASE {_RATES} END AS rate
  FROM documents)
SELECT doc_id, lang, bucket FROM b WHERE bucket < rate
"""

SAMPLE_DUCK = f"""
WITH b AS (
  SELECT doc_id, lang,
         ('0x' || substring(md5(doc_id::VARCHAR || ':s42'), 1, 8))::BIGINT
           % 100 AS bucket,
         CASE {_RATES} END AS rate
  FROM documents)
SELECT doc_id, lang, bucket FROM b WHERE bucket < rate
"""


# ---------------------------------------------------------------------------
# CCNet-style unigram language-model quality proxy
# ---------------------------------------------------------------------------
# CCNet/RedPajama rank documents by LM perplexity; the deterministic,
# oracle-able stand-in is a corpus-fit unigram model: p(w) = tf(w)/N
# over the whole corpus, score = mean negative log-likelihood per
# token. High NLL = rare-word-heavy (gibberish or niche), low NLL =
# stopword soup — the pipeline keeps a middle band. Cross-engine float
# discipline: each token's ln p(w) is rounded to integer MILLINATS
# first (one libm call on identical doubles), so the per-doc SUM is
# integer arithmetic — order-independent under shuffle, hash-stable
# across engines; only the final per-token mean divides.
# Scale shape: explode -> groupBy(token) with map-side combine for the
# vocab (vocab is tiny vs corpus — broadcast join back), then one
# groupBy(doc_id). No pair joins.

def unigram_logprob_spark() -> str:
    return f"""
WITH toks AS (SELECT doc_id, explode({SPARK_WORDS}) AS token FROM documents),
vocab AS (SELECT token, count(*) AS tf FROM toks GROUP BY token),
tot AS (SELECT sum(tf) AS n FROM vocab),
scored AS (
  SELECT t.doc_id,
         cast(round(-ln(cast(v.tf AS double) / tot.n) * 1000, 0) AS bigint)
           AS nll_milli
  FROM toks t JOIN vocab v ON t.token = v.token CROSS JOIN tot)
SELECT doc_id,
       count(*) AS n_tokens,
       cast(sum(nll_milli) AS BIGINT) AS sum_nll_milli,
       round(cast(sum(nll_milli) AS double) / (1000 * count(*)), 4)
         AS nll_per_token
FROM scored GROUP BY doc_id
"""


def unigram_logprob_views_spark() -> tuple[list[tuple[str, str]], str]:
    """Cached-view twin of unigram_logprob_spark: Spark inlines the
    ``toks`` CTE at both references (vocab build + scoring join), which
    re-explodes the whole corpus twice; the checkpointed view evaluates
    the explode once. The published pure-SQL form stays the spec."""
    views = [
        (
            "ulp_toks_v",
            f"SELECT doc_id, explode({SPARK_WORDS}) AS token FROM documents",
        )
    ]
    final = """
WITH vocab AS (SELECT token, count(*) AS tf FROM ulp_toks_v GROUP BY token),
tot AS (SELECT sum(tf) AS n FROM vocab),
scored AS (
  SELECT t.doc_id,
         cast(round(-ln(cast(v.tf AS double) / tot.n) * 1000, 0) AS bigint)
           AS nll_milli
  FROM ulp_toks_v t JOIN vocab v ON t.token = v.token CROSS JOIN tot)
SELECT doc_id,
       count(*) AS n_tokens,
       cast(sum(nll_milli) AS BIGINT) AS sum_nll_milli,
       round(cast(sum(nll_milli) AS double) / (1000 * count(*)), 4)
         AS nll_per_token
FROM scored GROUP BY doc_id
"""
    return views, final


def unigram_logprob_duck() -> str:
    return f"""
WITH toks AS (SELECT doc_id, unnest({DUCK_WORDS}) AS token FROM documents),
vocab AS (SELECT token, count(*) AS tf FROM toks GROUP BY token),
tot AS (SELECT sum(tf) AS n FROM vocab),
scored AS (
  SELECT t.doc_id,
         cast(round(-ln(cast(v.tf AS double) / tot.n) * 1000, 0) AS bigint)
           AS nll_milli
  FROM toks t JOIN vocab v ON t.token = v.token CROSS JOIN tot)
SELECT doc_id,
       count(*) AS n_tokens,
       cast(sum(nll_milli) AS BIGINT) AS sum_nll_milli,
       round(cast(sum(nll_milli) AS double) / (1000 * count(*)), 4)
         AS nll_per_token
FROM scored GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Gopher-style document quality rules
# ---------------------------------------------------------------------------
# The Gopher (Rae et al. 2021, table A1) repetition rules live in
# text_repetition; these are its document-shape rules, each an integer
# cross-multiplication so thresholds are exact in both engines:
#   - word count within [min_words, 100000]
#   - mean word length within [3, 10] chars
#   - >= 80% of words contain an alphabetic character
#   - >= 2 stopword hits (the "ellipsis/hash" symbol rules are vacuous
#     on this corpus and omitted)
# Pure map-side projection: scan -> flags, no shuffle at any scale.

def gopher_rules_spark(min_words: int = 50) -> str:
    return f"""
WITH w AS (SELECT doc_id, {SPARK_WORDS} AS w FROM documents),
m AS (
  SELECT doc_id,
         size(w) AS n_words,
         aggregate(w, 0, (acc, x) -> acc + length(x)) AS chars_in_words,
         size(filter(w, x -> x RLIKE '[A-Za-z]')) AS n_alpha,
         size(filter(w, x -> x IN ({_STOP}))) AS n_stop
  FROM w)
SELECT doc_id, n_words,
       CASE WHEN n_words BETWEEN {min_words} AND 100000
            THEN 1 ELSE 0 END AS ok_word_count,
       CASE WHEN chars_in_words >= 3 * n_words
             AND chars_in_words <= 10 * n_words
            THEN 1 ELSE 0 END AS ok_mean_word_len,
       CASE WHEN n_alpha * 10 >= n_words * 8 THEN 1 ELSE 0 END
         AS ok_alpha_ratio,
       CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS ok_stopwords,
       CASE WHEN n_words BETWEEN {min_words} AND 100000
             AND chars_in_words >= 3 * n_words
             AND chars_in_words <= 10 * n_words
             AND n_alpha * 10 >= n_words * 8
             AND n_stop >= 2
            THEN 1 ELSE 0 END AS keep
FROM m
"""


def gopher_rules_duck(min_words: int = 50) -> str:
    return f"""
WITH w AS (SELECT doc_id, {DUCK_WORDS} AS w FROM documents),
m AS (
  SELECT doc_id,
         len(w) AS n_words,
         -- DuckDB list_sum([]) is NULL where Spark's aggregate(w,0,..)
         -- is 0: coalesce so zero-word docs agree across engines
         coalesce(list_sum(list_transform(w, x -> length(x))), 0)
           AS chars_in_words,
         len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
           AS n_alpha,
         len(list_filter(w, x -> x IN ({_STOP}))) AS n_stop
  FROM w)
SELECT doc_id, n_words,
       CASE WHEN n_words BETWEEN {min_words} AND 100000
            THEN 1 ELSE 0 END AS ok_word_count,
       CASE WHEN chars_in_words >= 3 * n_words
             AND chars_in_words <= 10 * n_words
            THEN 1 ELSE 0 END AS ok_mean_word_len,
       CASE WHEN n_alpha * 10 >= n_words * 8 THEN 1 ELSE 0 END
         AS ok_alpha_ratio,
       CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS ok_stopwords,
       CASE WHEN n_words BETWEEN {min_words} AND 100000
             AND chars_in_words >= 3 * n_words
             AND chars_in_words <= 10 * n_words
             AND n_alpha * 10 >= n_words * 8
             AND n_stop >= 2
            THEN 1 ELSE 0 END AS keep
FROM m
"""


# ---------------------------------------------------------------------------
# corpus composition audit: per-source stats
# ---------------------------------------------------------------------------
# The "data card" aggregation every training-mix decision starts from:
# per source, how many documents, languages, bytes, and exact
# duplicates. One hash aggregation keyed by source (tiny cardinality ->
# map-side partial agg collapses almost everything before the
# shuffle); all-integer output.

SOURCE_STATS_SPARK = """
SELECT source,
       count(*) AS n_docs,
       count(DISTINCT lang) AS n_langs,
       cast(sum(n_chars) AS BIGINT) AS total_chars,
       count(text) - count(DISTINCT md5(text)) AS n_dup_docs,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars
FROM documents GROUP BY source
"""

SOURCE_STATS_DUCK = SOURCE_STATS_SPARK


# ---------------------------------------------------------------------------
# LM sequence packing (concat-and-chunk)
# ---------------------------------------------------------------------------
# Training pipelines concatenate documents into fixed-length token
# sequences (GPT-2/3, Llama pretraining): docs are laid out in a
# deterministic order, the running token offset is a windowed cumsum,
# and sequence id / in-sequence offset fall out of integer div/mod on
# the offset. The window is partitioned by (lang, shard) — a salted
# md5 shard key bounds every window partition, so there is never a
# global sort; at 10^10 docs you raise the shard count, the plan shape
# (one hash shuffle + per-partition running sum) is unchanged. All
# arithmetic is integer -> hash-exact across engines.

_PACK_SEQ_LEN = 512
_PACK_SHARDS = 4

_PACK_SHARD_SPARK = (
    "cast(conv(substring(md5(concat(cast(doc_id AS string), ':pack')),"
    f" 1, 8), 16, 10) AS bigint) % {_PACK_SHARDS}"
)
_PACK_SHARD_DUCK = (
    "('0x' || substring(md5(doc_id::VARCHAR || ':pack'), 1, 8))::BIGINT"
    f" % {_PACK_SHARDS}"
)

PACK_SPARK = f"""
WITH d AS (
  SELECT doc_id, lang,
         cast(size({SPARK_WORDS}) AS bigint) AS n_tok,
         {_PACK_SHARD_SPARK} AS shard
  FROM documents),
c AS (
  SELECT doc_id, lang, shard, n_tok,
         cast(sum(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW)
            AS BIGINT) - n_tok AS tok_start
  FROM d)
SELECT doc_id, lang, shard, n_tok, tok_start,
       tok_start div {_PACK_SEQ_LEN} AS seq_id,
       tok_start % {_PACK_SEQ_LEN} AS seq_offset
FROM c
"""

PACK_DUCK = f"""
WITH d AS (
  SELECT doc_id, lang,
         len({DUCK_WORDS})::BIGINT AS n_tok,
         {_PACK_SHARD_DUCK} AS shard
  FROM documents),
c AS (
  SELECT doc_id, lang, shard, n_tok,
         cast(sum(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW)
            AS BIGINT) - n_tok AS tok_start
  FROM d)
SELECT doc_id, lang, shard, n_tok, tok_start,
       tok_start // {_PACK_SEQ_LEN} AS seq_id,
       tok_start % {_PACK_SEQ_LEN} AS seq_offset
FROM c
"""


# ---------------------------------------------------------------------------
# CCNet-style per-language perplexity buckets
# ---------------------------------------------------------------------------
# CCNet (Wenzek et al. 2020) splits each language's corpus into
# head/middle/tail terciles by LM perplexity and keeps head+middle.
# Score: the same millinat-rounded unigram NLL as text_unigram_logprob,
# reduced to an exact integer micro-nats-per-token (integer division —
# no float ordering), then ntile(3) per language ordered by
# (score, doc_id) so ties are deterministic. One window per language
# partition; at corpus scale the ntile is replaced by quantile cut
# points from a sampled sketch, but the bucket CONTRACT is this one.

def ccnet_buckets_views_spark() -> tuple[list[tuple[str, str]], str]:
    views = [
        (
            "ccb_toks_v",
            f"SELECT doc_id, explode({SPARK_WORDS}) AS token FROM documents",
        )
    ]
    final = """
WITH vocab AS (SELECT token, count(*) AS tf FROM ccb_toks_v GROUP BY token),
tot AS (SELECT sum(tf) AS n FROM vocab),
scored AS (
  SELECT t.doc_id,
         cast(round(-ln(cast(v.tf AS double) / tot.n) * 1000, 0) AS bigint)
           AS nll_milli
  FROM ccb_toks_v t JOIN vocab v ON t.token = v.token CROSS JOIN tot),
doc AS (
  SELECT doc_id, count(*) AS n_tokens, cast(sum(nll_milli) AS BIGINT) AS s
  FROM scored GROUP BY doc_id),
b AS (
  SELECT d.doc_id, docs.lang, (d.s * 1000) div d.n_tokens AS score_micro,
         ntile(3) OVER (PARTITION BY docs.lang
                        ORDER BY (d.s * 1000) div d.n_tokens, d.doc_id) AS t
  FROM doc d JOIN documents docs ON d.doc_id = docs.doc_id)
SELECT doc_id, lang, score_micro,
       CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
         AS bucket
FROM b
"""
    return views, final


def ccnet_buckets_duck() -> str:
    return f"""
WITH toks AS (SELECT doc_id, unnest({DUCK_WORDS}) AS token FROM documents),
vocab AS (SELECT token, count(*) AS tf FROM toks GROUP BY token),
tot AS (SELECT sum(tf) AS n FROM vocab),
scored AS (
  SELECT t.doc_id,
         cast(round(-ln(cast(v.tf AS double) / tot.n) * 1000, 0) AS bigint)
           AS nll_milli
  FROM toks t JOIN vocab v ON t.token = v.token CROSS JOIN tot),
doc AS (
  SELECT doc_id, count(*) AS n_tokens, cast(sum(nll_milli) AS BIGINT) AS s
  FROM scored GROUP BY doc_id),
b AS (
  SELECT d.doc_id, docs.lang, (d.s * 1000) // d.n_tokens AS score_micro,
         ntile(3) OVER (PARTITION BY docs.lang
                        ORDER BY (d.s * 1000) // d.n_tokens, d.doc_id) AS t
  FROM doc d JOIN documents docs ON d.doc_id = docs.doc_id)
SELECT doc_id, lang, score_micro,
       CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
         AS bucket
FROM b
"""


# ---------------------------------------------------------------------------
# tf-idf top-k terms per document (keyword extraction)
# ---------------------------------------------------------------------------
# Per-doc salient terms for corpus indexing / topic tagging: integer
# tf × millinat-rounded idf (one ln on identical doubles, then all
# integer — order-independent, hash-exact cross-engine). Top-3 per doc
# by (score, token) with row_number — deterministic under ties. The df
# relation is token-keyed (vocabulary-sized, partial-agg'd map-side)
# and joins the tf relation on token; no cross-doc pairwise work.

def tfidf_views_spark() -> tuple[list[tuple[str, str]], str]:
    views = [
        (
            "tfidf_toks_v",
            f"SELECT doc_id, explode({SPARK_WORDS}) AS token FROM documents",
        )
    ]
    final = """
WITH tf AS (
  SELECT doc_id, token, count(*) AS tf
  FROM tfidf_toks_v GROUP BY doc_id, token),
df AS (
  SELECT token, count(DISTINCT doc_id) AS df
  FROM tfidf_toks_v GROUP BY token),
n AS (SELECT count(DISTINCT doc_id) AS n FROM tfidf_toks_v),
s AS (
  SELECT tf.doc_id, tf.token, tf.tf,
         tf.tf * cast(round(ln(cast(n.n AS double) / df.df) * 1000, 0)
                      AS bigint) AS score_milli
  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n),
r AS (
  SELECT doc_id, token, tf, score_milli,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_milli DESC, token) AS rk
  FROM s)
SELECT doc_id, token, tf, score_milli, rk FROM r WHERE rk <= 3
"""
    return views, final


def tfidf_duck() -> str:
    return f"""
WITH toks AS (SELECT doc_id, unnest({DUCK_WORDS}) AS token FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token),
n AS (SELECT count(DISTINCT doc_id) AS n FROM toks),
s AS (
  SELECT tf.doc_id, tf.token, tf.tf,
         tf.tf * cast(round(ln(cast(n.n AS double) / df.df) * 1000, 0)
                      AS bigint) AS score_milli
  FROM tf JOIN df ON tf.token = df.token CROSS JOIN n),
r AS (
  SELECT doc_id, token, tf, score_milli,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_milli DESC, token) AS rk
  FROM s)
SELECT doc_id, token, tf, score_milli, rk FROM r WHERE rk <= 3
"""


# ---------------------------------------------------------------------------
# Unicode script composition per document
# ---------------------------------------------------------------------------
# Script mix (Latin / CJK / digit / whitespace / other counts) is the
# cheap router in front of per-language pipelines — it needs no token
# model, just codepoint-class counting, so it stays a pure map-side
# projection at any corpus size. Counting is done by subtraction
# (length minus length-after-removing-class) — all integers, exact in
# both engines.

def _script_counts(cjk_re: str, ws_re: str) -> str:
    return f"""
  SELECT doc_id,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[A-Za-z]', ''{{G}}))
           AS n_latin,
         length(text) - length(regexp_replace(text, '[0-9]', ''{{G}}))
           AS n_digit,
         length(text) - length(regexp_replace(text, '{cjk_re}', ''{{G}}))
           AS n_cjk,
         length(text) - length(regexp_replace(text, '{ws_re}', ''{{G}}))
           AS n_space
  FROM documents"""


def _script_mix_sql(counts: str) -> str:
    return f"""
WITH m AS ({counts})
SELECT doc_id, n_chars, n_latin, n_digit, n_cjk, n_space,
       n_chars - n_latin - n_digit - n_cjk - n_space AS n_other,
       CASE WHEN n_cjk > n_latin THEN 'cjk'
            WHEN n_latin > 0 THEN 'latin'
            WHEN n_digit > 0 THEN 'digit'
            ELSE 'other' END AS dominant_script
FROM m
"""


def script_mix_spark() -> str:
    return _script_mix_sql(
        _script_counts(_CJK_RE, "\\\\s").replace("{G}", "")
    )


def script_mix_duck() -> str:
    return _script_mix_sql(
        _script_counts(_CJK_RE_DUCK, "\\s").replace("{G}", ", 'g'")
    )


# ---------------------------------------------------------------------------
# token-length histogram (log2 buckets)
# ---------------------------------------------------------------------------
# The sequence-length profile every packing / truncation decision is
# made from: docs bucketed by floor(log2(n_tokens))+1. The bucket is
# computed as length(bin(n)) — pure integer/string ops, bit-exact in
# both engines (no libm log2 at power-of-two boundaries). Zero-token
# docs land in bucket 1 with 1-token docs (bin(0)='0'). Shape: map-side
# projection + one tiny hash agg (<= 64 buckets) — map-side partial agg
# collapses everything before the shuffle; constant-size output at any
# corpus scale.

LENGTH_HIST_SPARK = f"""
WITH d AS (SELECT cast(size({SPARK_WORDS}) AS bigint) AS n_tok
           FROM documents)
SELECT length(bin(n_tok)) AS bucket,
       count(*) AS n_docs,
       cast(sum(n_tok) AS BIGINT) AS total_tokens,
       min(n_tok) AS min_tokens,
       max(n_tok) AS max_tokens
FROM d GROUP BY length(bin(n_tok))
"""

LENGTH_HIST_DUCK = f"""
WITH d AS (SELECT len({DUCK_WORDS})::BIGINT AS n_tok
           FROM documents)
SELECT cast(length(bin(n_tok)) AS bigint) AS bucket,
       count(*) AS n_docs,
       cast(sum(n_tok) AS BIGINT) AS total_tokens,
       min(n_tok) AS min_tokens,
       max(n_tok) AS max_tokens
FROM d GROUP BY length(bin(n_tok))
"""


# ---------------------------------------------------------------------------
# per-document word-distribution entropy (gibberish / template filter)
# ---------------------------------------------------------------------------
# Low entropy = repeated-token template spam, high = natural text;
# used alongside the Gopher shape rules. Same millinat discipline as
# text_unigram_logprob: each distinct token's -ln(c/n) is rounded to
# integer millinats FIRST (one libm call on identical doubles), the
# per-doc reduction is then pure integer arithmetic — order-independent
# under shuffle, hash-stable across engines. Shape: explode ->
# groupBy(doc,token) -> window over doc partitions -> groupBy(doc);
# every stage is keyed by doc_id so the three shuffles co-locate, and
# no relation is referenced twice (no double explode — single chain).

def word_entropy_spark() -> str:
    return f"""
WITH toks AS (SELECT doc_id, explode({SPARK_WORDS}) AS token FROM documents),
tc AS (SELECT doc_id, token, count(*) AS c FROM toks GROUP BY doc_id, token),
w AS (SELECT doc_id, c,
        cast(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n_tok,
        cast(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_distinct
      FROM tc),
t AS (SELECT doc_id, n_tok, n_distinct,
        c * cast(round(-ln(cast(c AS double) / n_tok) * 1000, 0) AS bigint)
          AS term_milli
      FROM w)
SELECT doc_id, n_tok AS n_tokens, n_distinct,
       cast(sum(term_milli) AS BIGINT) AS sum_entropy_milli,
       cast(floor(cast(sum(term_milli) AS double) * 1000 / n_tok) AS BIGINT)
         AS entropy_micronats
FROM t GROUP BY doc_id, n_tok, n_distinct
"""


def word_entropy_duck() -> str:
    return f"""
WITH toks AS (SELECT doc_id, unnest({DUCK_WORDS}) AS token FROM documents),
tc AS (SELECT doc_id, token, count(*) AS c FROM toks GROUP BY doc_id, token),
w AS (SELECT doc_id, c,
        cast(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n_tok,
        cast(count(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_distinct
      FROM tc),
t AS (SELECT doc_id, n_tok, n_distinct,
        c * cast(round(-ln(cast(c AS double) / n_tok) * 1000, 0) AS bigint)
          AS term_milli
      FROM w)
SELECT doc_id, n_tok AS n_tokens, n_distinct,
       cast(sum(term_milli) AS BIGINT) AS sum_entropy_milli,
       cast(floor(cast(sum(term_milli) AS double) * 1000 / n_tok) AS BIGINT)
         AS entropy_micronats
FROM t GROUP BY doc_id, n_tok, n_distinct
"""


# ---------------------------------------------------------------------------
# language-balanced sampling (rate-based, map-side)
# ---------------------------------------------------------------------------
# Rebalance a skewed language mix down to the rarest language IN
# EXPECTATION without any per-language ranking window: per-lang counts
# are a tiny agg (broadcast back), and each doc keeps/drops by salted
# md5 bucket with the integer cross-multiplication
#   bucket * cnt_lang < min_cnt * 2^20
# so no float rate ever materializes. Unlike an exact-quota rank this
# is pure map-side after one broadcast — the 100 TB shape (a rank
# window PARTITION BY lang would funnel each language through one
# partition). Deterministic per doc: a doc's keep/drop never changes
# when other docs arrive *within the same census* (cnt is corpus-wide,
# so it re-rates on growth — by design: the target mix is relative).
# Overflow-safe: bucket < 2^20 and cnt <= 2^42 keeps the product under
# 2^63.

_BAL_BUCKETS = 1 << 20

SAMPLE_BALANCED_SPARK = f"""
WITH lc AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
m AS (SELECT min(cnt) AS min_cnt FROM lc),
b AS (
  SELECT d.doc_id, d.lang,
         cast(conv(substring(md5(concat(cast(d.doc_id AS string), ':bal')),
                             1, 8), 16, 10) AS bigint) % {_BAL_BUCKETS}
           AS bucket,
         lc.cnt, m.min_cnt
  FROM documents d JOIN lc ON d.lang = lc.lang CROSS JOIN m)
SELECT doc_id, lang, bucket FROM b
WHERE bucket * cnt < min_cnt * {_BAL_BUCKETS}
"""

SAMPLE_BALANCED_DUCK = f"""
WITH lc AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
m AS (SELECT min(cnt) AS min_cnt FROM lc),
b AS (
  SELECT d.doc_id, d.lang,
         ('0x' || substring(md5(d.doc_id::VARCHAR || ':bal'), 1, 8))::BIGINT
           % {_BAL_BUCKETS} AS bucket,
         lc.cnt, m.min_cnt
  FROM documents d JOIN lc ON d.lang = lc.lang CROSS JOIN m)
SELECT doc_id, lang, bucket FROM b
WHERE bucket * cnt < min_cnt * {_BAL_BUCKETS}
"""


# ---------------------------------------------------------------------------
# √-temperature language sampling (mT5 / XLM-R mixing, α = 0.5)
# ---------------------------------------------------------------------------
# Full balancing (SAMPLE_BALANCED above) flattens the mix to the rarest
# language — multilingual LM training instead samples language l with
# probability ∝ (n_l)^α, α ≈ 0.3–0.7 (Xue et al. 2021 "mT5" §3.1;
# Conneau et al. 2020 "XLM-R" §3): big languages are DAMPED, not
# flattened. α = 0.5 makes the per-doc keep rate r_l = sqrt(min/n_l),
# which squares into the same no-float integer cross-multiplication
# device as the balanced sampler:
#   keep  ⇔  bucket² · cnt_l < min_cnt · B²
# (P(keep) = |{bucket < B·sqrt(min/cnt)}| / B ≈ sqrt(min/cnt)). The
# rarest language keeps everything; one 100× larger keeps 10% (vs 1%
# under full balancing). Same 100 TB shape: one tiny census agg
# broadcast back, then pure map-side — no rank window. B = 2^16 keeps
# bucket²·cnt < 2^62 for languages up to 2^30 docs; widen the
# arithmetic to int128/DECIMAL beyond that.

_TEMP_BUCKETS = 1 << 16

SAMPLE_TEMPERATURE_SPARK = f"""
WITH lc AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
m AS (SELECT min(cnt) AS min_cnt FROM lc),
b AS (
  SELECT d.doc_id, d.lang,
         cast(conv(substring(md5(concat(cast(d.doc_id AS string), ':temp')),
                             1, 8), 16, 10) AS bigint) % {_TEMP_BUCKETS}
           AS bucket,
         lc.cnt, m.min_cnt
  FROM documents d JOIN lc ON d.lang = lc.lang CROSS JOIN m)
SELECT doc_id, lang, bucket FROM b
WHERE bucket * bucket * cnt < min_cnt * {_TEMP_BUCKETS * _TEMP_BUCKETS}
"""

SAMPLE_TEMPERATURE_DUCK = f"""
WITH lc AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
m AS (SELECT min(cnt) AS min_cnt FROM lc),
b AS (
  SELECT d.doc_id, d.lang,
         ('0x' || substring(md5(d.doc_id::VARCHAR || ':temp'), 1, 8))::BIGINT
           % {_TEMP_BUCKETS} AS bucket,
         lc.cnt, m.min_cnt
  FROM documents d JOIN lc ON d.lang = lc.lang CROSS JOIN m)
SELECT doc_id, lang, bucket FROM b
WHERE bucket * bucket * cnt < min_cnt * {_TEMP_BUCKETS}::BIGINT * {_TEMP_BUCKETS}
"""


# ---------------------------------------------------------------------------
# DSIR-style hashed-unigram importance weights
# ---------------------------------------------------------------------------
# Data Selection via Importance Resampling (Xie et al. 2023,
# arXiv:2302.03169): score each raw document by how target-like its
# token distribution is, sum_w log(p_target(w) / p_raw(w)), with
# features HASHED into a fixed bucket table so the "vocabulary" is
# constant-size at any corpus scale (here 8192 md5 buckets; DSIR uses
# 10^4 hashed n-grams). Target distribution: the 'en' slice (stand-in
# for a curated domain). Laplace +1 smoothing on both sides; the log
# ratio is ONE libm call on identical doubles rounded to integer
# millinats, so per-doc sums are integer-exact across engines. The
# per-token mean is an integer micro-nat floor division (NOT a rounded
# double): floor(sum*1000/n) on |sum*1000| < 2^53 is provably exact —
# IEEE division is correctly rounded and the quotient is never within
# half-ulp of a wrong integer (|a/b - k| >= 1/b >> ulp) — whereas
# round(x, 4) ties at .00005 split between JVM BigDecimal HALF_UP and
# DuckDB binary rounding (observed: one doc in 500 at sf0.01).
# Shape: explode -> two tiny hash aggs (<= 8192 rows each, broadcast
# back) -> per-doc agg. No pair joins, no windows; the double cast
# before the ratio keeps 10^14-token counts from overflowing BIGINT
# products.

_DSIR_BUCKETS = 8192
_DSIR_TARGET = "lang = 'en'"


def _dsir_body() -> str:
    return f"""
tgt AS (SELECT b, count(*) AS tf_t FROM toks WHERE {_DSIR_TARGET} GROUP BY b),
raw AS (SELECT b, count(*) AS tf_r FROM toks GROUP BY b),
tot AS (SELECT n_t, n_r FROM
          (SELECT cast(sum(tf_t) AS BIGINT) AS n_t FROM tgt)
          CROSS JOIN (SELECT cast(sum(tf_r) AS BIGINT) AS n_r FROM raw)),
scored AS (
  SELECT t.doc_id,
         cast(round(ln(
             (cast(coalesce(g.tf_t, 0) + 1 AS double)
               * cast(tot.n_r + {_DSIR_BUCKETS} AS double))
           / (cast(r.tf_r + 1 AS double)
               * cast(tot.n_t + {_DSIR_BUCKETS} AS double))
         ) * 1000, 0) AS bigint) AS lr_milli
  FROM toks t
  JOIN raw r ON t.b = r.b
  LEFT JOIN tgt g ON t.b = g.b
  CROSS JOIN tot)
SELECT doc_id, count(*) AS n_tokens,
       cast(sum(lr_milli) AS BIGINT) AS sum_logratio_milli,
       cast(floor(cast(sum(lr_milli) AS double) * 1000 / count(*)) AS BIGINT)
         AS logratio_micronats
FROM scored GROUP BY doc_id
"""


def importance_spark() -> str:
    """Published pure-SQL spec (the views twin executes the explode
    once; Spark inlines `toks` at its three references)."""
    return f"""
WITH toks AS (
  SELECT doc_id, lang,
         cast(conv(substring(md5(token), 1, 8), 16, 10) AS bigint)
           % {_DSIR_BUCKETS} AS b
  FROM (SELECT doc_id, lang, explode({SPARK_WORDS}) AS token
        FROM documents)),
{_dsir_body()}
"""


def importance_views_spark() -> tuple[list[tuple[str, str]], str]:
    views = [
        (
            "dsir_toks",
            f"""SELECT doc_id, lang,
         cast(conv(substring(md5(token), 1, 8), 16, 10) AS bigint)
           % {_DSIR_BUCKETS} AS b
  FROM (SELECT doc_id, lang, explode({SPARK_WORDS}) AS token
        FROM documents)""",
        )
    ]
    final = "WITH " + _dsir_body().replace("toks", "dsir_toks")
    return views, final


def importance_duck() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, lang,
         ('0x' || substring(md5(token), 1, 8))::BIGINT % {_DSIR_BUCKETS} AS b
  FROM (SELECT doc_id, lang, unnest({DUCK_WORDS}) AS token
        FROM documents)),
{_dsir_body()}
"""


# ---------------------------------------------------------------------------
# weighted sampling without replacement (priority sampling)
# ---------------------------------------------------------------------------
# Duffield/Lund/Thorup priority sampling: each item gets priority
# w / u with u uniform in (0, 1]; the k highest-priority items are a
# weighted sample without replacement. Deterministic and oracle-exact
# because u := (md5_bucket + 1) / 2^32 and the priority is computed as
# ONE IEEE division of exact integers (w * 2^32 <= 2^53 stays exact,
# division is correctly rounded -> bit-identical across engines; no
# libm anywhere, unlike the classic exp(ln(u)/w) key). Weight here is
# n_chars — the "sample long documents proportionally more" knob —
# CAPPED at 2^21 - 1 in both engines: the exact-product bound w * 2^32
# <= 2^53 only holds for w < 2^21 (ADVICE r3), so a ~2M+ char document
# would silently break the bit-identical-division guarantee; least()
# keeps the product exact at any document length (and a 2M-char cap on
# a sampling weight is itself standard long-doc damping).
# Plan shape: map-side projection -> global top-k, which Spark executes
# as TakeOrderedAndProject (per-partition heap + k-row merge, never a
# global sort). Tie-break (priority, doc_id) pins order.

_PRI_K = 100
_PRI_BUCKETS = 1 << 32
_PRI_W_CAP = (1 << 21) - 1  # largest weight with w * 2^32 exact in f64

SAMPLE_PRIORITY_SPARK = f"""
WITH b AS (
  SELECT doc_id, least(n_chars, {_PRI_W_CAP}) AS weight,
         cast(conv(substring(md5(concat(cast(doc_id AS string), ':pri')),
                             1, 8), 16, 10) AS bigint) AS bucket
  FROM documents)
SELECT doc_id, weight,
       cast(weight AS double) * {_PRI_BUCKETS} / (bucket + 1) AS priority
FROM b
ORDER BY priority DESC, doc_id
LIMIT {_PRI_K}
"""

SAMPLE_PRIORITY_DUCK = f"""
WITH b AS (
  SELECT doc_id, least(n_chars, {_PRI_W_CAP}) AS weight,
         ('0x' || substring(md5(doc_id::VARCHAR || ':pri'), 1, 8))::BIGINT
           AS bucket
  FROM documents)
SELECT doc_id, weight,
       cast(weight AS double) * {_PRI_BUCKETS} / (bucket + 1) AS priority
FROM b
ORDER BY priority DESC, doc_id
LIMIT {_PRI_K}
"""


# ---------------------------------------------------------------------------
# bigram PMI collocation mining
# ---------------------------------------------------------------------------
# Pointwise mutual information over adjacent word pairs (Church &
# Hanks 1990, "Word association norms, mutual information, and
# lexicography") — the classic collocation/phrase-mining pass a
# tokenizer-training pipeline runs to decide merge candidates.
# PMI(x,y) = ln( p(x,y) / (p(x)p(y)) ) with p(x,y) = c_xy/nb,
# p(x) = c_x/n, evaluated as ONE ln over an identically-computed
# double (no BIGINT n² intermediate to overflow) and milli-rounded to
# an integer — the same cross-engine float discipline as
# unigram_logprob. min-count floor 5 (Church & Hanks' sparse-pair
# caveat: PMI explodes on hapax pairs).
#
# Plan shape: two hash aggs over the shared words-array view (bigram
# counts ≤ vocab², unigram counts ≤ vocab), two broadcast-size joins
# of counts back onto the bigram relation, global top-k as
# TakeOrderedAndProject (never a full sort). The corpus is scanned
# once (checkpointed words view); everything after the two aggs is
# sized by the VOCABULARY, not the corpus.

PMI_MIN_COUNT = 5
PMI_TOPK = 20


def _pmi_final(uni_src: str) -> str:
    return f"""
WITH uni AS (SELECT token, count(*) AS c FROM {uni_src} GROUP BY token),
n AS (SELECT cast(sum(c) AS BIGINT) AS n FROM uni),
big AS (SELECT x, y, count(*) AS cxy FROM pmi_big_v GROUP BY x, y),
nb AS (SELECT cast(sum(cxy) AS BIGINT) AS nb FROM big),
scored AS (
  SELECT b.x, b.y, b.cxy,
         cast(round(ln((cast(b.cxy AS double) * n.n * n.n) /
                       (cast(nb.nb AS double) * ux.c * uy.c)) * 1000, 0)
              AS bigint) AS pmi_milli
  FROM big b
  JOIN uni ux ON b.x = ux.token
  JOIN uni uy ON b.y = uy.token
  CROSS JOIN n CROSS JOIN nb
  WHERE b.cxy >= {PMI_MIN_COUNT})
SELECT x, y, cxy, pmi_milli FROM scored
ORDER BY pmi_milli DESC, x, y LIMIT {PMI_TOPK}
"""


def bigram_pmi_views_spark() -> tuple[list[tuple[str, str]], str]:
    views = [
        ("pmi_w_v", f"SELECT {SPARK_WORDS} AS w FROM documents"),
        (
            "pmi_big_v",
            """SELECT w[p - 1] AS x, w[p] AS y
FROM pmi_w_v LATERAL VIEW explode(sequence(1, size(w) - 1)) AS p
WHERE size(w) >= 2""",
        ),
    ]
    return views, _pmi_final(
        "(SELECT explode(w) AS token FROM pmi_w_v)"
    )


def bigram_pmi_duck() -> str:
    return (
        f"""WITH t AS (SELECT {DUCK_WORDS} AS w FROM documents),
pmi_big_v AS (
  SELECT w[p] AS x, w[p + 1] AS y
  FROM t, unnest(generate_series(1, len(w) - 1)) AS u(p)
  WHERE len(w) >= 2),
toks AS (SELECT unnest(w) AS token FROM t),
"""
        + _pmi_final("toks").lstrip().removeprefix("WITH ")
    )

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
       round(cast(en AS double) / n, 4) AS en_ratio
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
       round(cast(en AS double) / n, 4) AS en_ratio
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
       round(cast(n_stop AS double) / n_words, 4) AS stopword_ratio,
       round(cast(n_punct AS double) / n_chars, 4) AS punct_ratio,
       round(cast(chars_in_words AS double) / n_words, 4) AS mean_word_len,
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
       round(cast(n_stop AS double) / n_words, 4) AS stopword_ratio,
       round(cast(n_punct AS double) / n_chars, 4) AS punct_ratio,
       round(cast(chars_in_words AS double) / n_words, 4) AS mean_word_len,
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

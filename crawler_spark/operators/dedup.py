"""Deduplication operators for large-scale training-data pipelines.

Each operator exists as a (Spark SQL, DuckDB SQL) pair over the
`documents` / `embeddings` tables; the two dialects implement the SAME
deterministic computation so the driver's DuckDB cross-check verifies
values, not just shapes. All Spark-side logic is JVM expressions.

Scale design notes (100 TB corpus):
- exact: one hash-partitioned groupBy on md5(text) — a single shuffle of
  (16-byte key, doc_id); map-side partial aggregation applies.
- ngram-jaccard: shingle explosion is the candidate *blocking* step —
  the pair join shuffles on the shingle key, so common shingles are the
  skew risk; at scale you cap shingle document-frequency (drop shingles
  appearing in > DF_MAX docs — they carry no discriminative signal and
  quadratic-blow-up the join). The DF cap is part of the operator.
- minhash-LSH: fixed-width signatures (16 hashes → 4 bands × 4 rows)
  mean the candidate join shuffles only (band_key, doc_id) pairs —
  independent of document length; the classic 10^10-doc design.
- simhash: 64-bit fingerprints via per-token nibble bits; pairs are
  confirmed by Hamming distance. At scale candidates come from banding
  the fingerprint (4×16-bit chunks, Pigeonhole: any pair within
  Hamming≤3 shares a chunk); the small-corpus variant compares all
  pairs in-query.
- embedding-cosine: brute-force pair join under a blocking threshold;
  the ANN path lives in operators/similarity.py.

The minhash family uses lexicographic MIN over salted md5 hex digests —
a portable minhash family (128-bit uniform hashes; string order ==
numeric order on fixed-width hex), identical in Spark and DuckDB.
"""

from __future__ import annotations

from .textprep import duck_shingle_sql, spark_shingle_sql

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
DF_CAP = 200  # shingle document-frequency cap (skew guard)


# ---------------------------------------------------------------------------
# exact dedup: hash-groupBy, keep min doc_id per content hash
# ---------------------------------------------------------------------------

DEDUP_EXACT_SPARK = """
SELECT md5(text) AS text_md5,
       min(doc_id) AS keep_id,
       count(*)    AS n_copies
FROM documents
GROUP BY md5(text)
"""

DEDUP_EXACT_DUCK = DEDUP_EXACT_SPARK  # identical dialect-neutral SQL


# ---------------------------------------------------------------------------
# n-gram jaccard dedup (shingle-blocked pair join)
# ---------------------------------------------------------------------------

def ngram_jaccard_spark(n: int = 2, threshold: float = 0.5) -> str:
    return f"""
WITH sh AS ({spark_shingle_sql(n)}),
freq AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
shf AS (SELECT s.doc_id, s.sh FROM sh s JOIN freq f ON s.sh = f.sh
        WHERE f.df <= {DF_CAP}),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT i.doc_a, i.doc_b, i.n_common,
       round(cast(i.n_common AS double) / (sa.n + sb.n - i.n_common), 4)
         AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE cast(i.n_common AS double) / (sa.n + sb.n - i.n_common) >= {threshold}
"""


def ngram_jaccard_duck(n: int = 2, threshold: float = 0.5) -> str:
    return f"""
WITH sh AS ({duck_shingle_sql(n)}),
freq AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
shf AS (SELECT s.doc_id, s.sh FROM sh s JOIN freq f ON s.sh = f.sh
        WHERE f.df <= {DF_CAP}),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shf a JOIN shf b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT i.doc_a, i.doc_b, i.n_common,
       round(cast(i.n_common AS double) / (sa.n + sb.n - i.n_common), 4)
         AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE cast(i.n_common AS double) / (sa.n + sb.n - i.n_common) >= {threshold}
"""


# ---------------------------------------------------------------------------
# minhash + LSH banding
# ---------------------------------------------------------------------------

def _minhash_aggs() -> str:
    return ",\n       ".join(
        f"min(md5(concat('{j}:', sh))) AS mh{j}" for j in range(N_HASHES)
    )


def _duck_minhash_aggs() -> str:
    return ",\n       ".join(
        f"min(md5('{j}:' || sh)) AS mh{j}" for j in range(N_HASHES)
    )


def _band_rows(concat_fn, table: str = "mh") -> str:
    """band_id → band_key rows via a stacked UNION (portable, no UDTF)."""
    parts = []
    for b in range(N_BANDS):
        cols = concat_fn(
            [f"mh{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
        )
        parts.append(
            f"SELECT doc_id, {b} AS band, md5({cols}) AS band_key FROM {table}"
        )
    return "\nUNION ALL\n".join(parts)


def _minhash_lsh_body(shingle_cte: str, aggs: str, bands: str, threshold: float) -> str:
    """Shared LSH plan: banding generates candidates; exact-Jaccard
    confirmation is restricted to those candidates (the whole point of
    LSH — intersection work is O(candidates), never O(co-shingled
    pairs)), over the same DF-capped shingle relation ngram-jaccard
    uses (skew guard: a boilerplate shingle in 10^6 docs must not fan
    the confirm join out)."""
    return f"""
WITH sh AS ({shingle_cte}),
freq AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh),
shf AS (SELECT s.doc_id, s.sh FROM sh s JOIN freq f ON s.sh = f.sh
        WHERE f.df <= {DF_CAP}),
mh AS (SELECT doc_id, {aggs} FROM sh GROUP BY doc_id),
bands AS ({bands}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN shf a ON a.doc_id = c.doc_a
  JOIN shf b ON b.doc_id = c.doc_b AND b.sh = a.sh
  GROUP BY c.doc_a, c.doc_b)
SELECT i.doc_a, i.doc_b,
       round(cast(i.n_common AS double) / (sa.n + sb.n - i.n_common), 4)
         AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE cast(i.n_common AS double) / (sa.n + sb.n - i.n_common) >= {threshold}
"""


def minhash_lsh_spark(n: int = 2, threshold: float = 0.5) -> str:
    bands = _band_rows(lambda cs: "concat(" + ", ".join(cs) + ")")
    return _minhash_lsh_body(spark_shingle_sql(n), _minhash_aggs(), bands, threshold)


def minhash_lsh_views_spark(
    n: int = 2, threshold: float = 0.5
) -> tuple[list[tuple[str, str]], str]:
    """(views, final_sql) for the cached-view execution path.

    Spark INLINES every CTE reference — the pure-SQL form
    (minhash_lsh_spark, kept as the semantic spec) re-runs the shingle
    explode ~10× (freq, shf×2, mh via 4 band rows × 2 sides of the
    cand self-join, sizes). Evaluating the shingle and signature
    relations once behind checkpointed temp views makes the plan
    O(one pass) without touching semantics — the DuckDB oracle (which
    materializes CTEs natively) is unchanged."""
    views = [
        ("mh_sh_v", spark_shingle_sql(n)),
        (
            "mh_mh_v",
            f"SELECT doc_id, {_minhash_aggs()} FROM mh_sh_v GROUP BY doc_id",
        ),
        (
            "mh_shf_v",
            f"""SELECT s.doc_id, s.sh FROM mh_sh_v s
                JOIN (SELECT sh FROM mh_sh_v GROUP BY sh
                      HAVING count(*) <= {DF_CAP}) f ON s.sh = f.sh""",
        ),
    ]
    bands = _band_rows(
        lambda cs: "concat(" + ", ".join(cs) + ")", table="mh_mh_v"
    )
    final = f"""
WITH bands AS ({bands}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
sizes AS (SELECT doc_id, count(*) AS n FROM mh_sh_v GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN mh_shf_v a ON a.doc_id = c.doc_a
  JOIN mh_shf_v b ON b.doc_id = c.doc_b AND b.sh = a.sh
  GROUP BY c.doc_a, c.doc_b)
SELECT i.doc_a, i.doc_b,
       round(cast(i.n_common AS double) / (sa.n + sb.n - i.n_common), 4)
         AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE cast(i.n_common AS double) / (sa.n + sb.n - i.n_common) >= {threshold}
"""
    return views, final


def ngram_jaccard_views_spark(
    n: int = 2, threshold: float = 0.5
) -> tuple[list[tuple[str, str]], str]:
    """Cached-view twin of ngram_jaccard_spark (see
    minhash_lsh_views_spark for why)."""
    views = [
        ("nj_sh_v", spark_shingle_sql(n)),
        (
            "nj_shf_v",
            f"""SELECT s.doc_id, s.sh FROM nj_sh_v s
                JOIN (SELECT sh FROM nj_sh_v GROUP BY sh
                      HAVING count(*) <= {DF_CAP}) f ON s.sh = f.sh""",
        ),
    ]
    final = f"""
WITH sizes AS (SELECT doc_id, count(*) AS n FROM nj_sh_v GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM nj_shf_v a JOIN nj_shf_v b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT i.doc_a, i.doc_b, i.n_common,
       round(cast(i.n_common AS double) / (sa.n + sb.n - i.n_common), 4)
         AS jaccard
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE cast(i.n_common AS double) / (sa.n + sb.n - i.n_common) >= {threshold}
"""
    return views, final


def minhash_lsh_duck(n: int = 2, threshold: float = 0.5) -> str:
    bands = _band_rows(lambda cs: " || ".join(cs))
    return _minhash_lsh_body(
        duck_shingle_sql(n), _duck_minhash_aggs(), bands, threshold
    )


# ---------------------------------------------------------------------------
# simhash: 64-bit fingerprint from token-frequency-weighted md5 nibble bits
# ---------------------------------------------------------------------------

# bits read from a single per-token `h = md5(word)` column: hashing
# once in the tok relation instead of inside all 64 bit expressions
# (64 md5 calls per token otherwise — the agg dominates the query)
def _simhash_bit_spark(j: int) -> str:
    pos, shift = j // 4 + 1, 3 - j % 4
    nib = f"cast(conv(substring(h, {pos}, 1), 16, 10) as int)"
    return (
        f"CASE WHEN pmod(cast({nib} div {1 << shift} as int), 2) = 1 "
        "THEN 1 ELSE -1 END"
    )


def _simhash_bit_duck(j: int) -> str:
    pos, shift = j // 4 + 1, 3 - j % 4
    nib = f"('0x' || substring(h, {pos}, 1))::INTEGER"
    return f"CASE WHEN (({nib} // {1 << shift}) % 2) = 1 THEN 1 ELSE -1 END"


def _simhash_select(bit_fn) -> str:
    sums = ",\n       ".join(
        f"sum({bit_fn(j)}) AS s{j}" for j in range(64)
    )
    fp = ", ".join(
        f"CASE WHEN s{j} > 0 THEN '1' ELSE '0' END" for j in range(64)
    )
    return sums, f"concat({fp})"


def simhash_fingerprints_spark() -> str:
    sums, fp = _simhash_select(_simhash_bit_spark)
    return f"""
WITH tok AS (
  SELECT doc_id, md5(word) AS h FROM (
    SELECT doc_id,
           explode(filter(split(text, '\\\\s+'), x -> x != '')) AS word
    FROM documents)),
bits AS (SELECT doc_id, {sums} FROM tok GROUP BY doc_id)
SELECT doc_id, {fp} AS simhash FROM bits
"""


def simhash_fingerprints_duck() -> str:
    sums, fp = _simhash_select(_simhash_bit_duck)
    return f"""
WITH tok AS (
  SELECT doc_id, md5(word) AS h FROM (
    SELECT doc_id,
           unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                  x -> x <> '')) AS word
    FROM documents)),
bits AS (SELECT doc_id, {sums} FROM tok GROUP BY doc_id)
SELECT doc_id, {fp} AS simhash FROM bits
"""


# The all-pairs forms below (simhash_pairs_*, embedding_pairs_*) are
# kept ONLY as exact small-corpus oracles for their banded/LSH twins:
# they are O(n²) by construction and have no 100 TB story. The guard
# makes calling one on a big corpus an explicit error instead of a
# silently quadratic job. Override for deliberate oracle runs via
# CRAWLER_SPARK_ALL_PAIRS_MAX.
ALL_PAIRS_DEFAULT_MAX = 20_000


def _all_pairs_limit() -> int:
    import os as _os

    return int(
        _os.environ.get("CRAWLER_SPARK_ALL_PAIRS_MAX", ALL_PAIRS_DEFAULT_MAX)
    )


def guard_all_pairs(n_rows: int, name: str, scale_twin: str) -> None:
    limit = _all_pairs_limit()
    if n_rows > limit:
        raise ValueError(
            f"{name} is an exact ALL-PAIRS oracle (O(n²) join) and the "
            f"input has {n_rows} rows (> {limit}). Use {scale_twin} — "
            "identical result set, banded candidate generation — or "
            "raise CRAWLER_SPARK_ALL_PAIRS_MAX for a deliberate oracle "
            "run on a sampled corpus."
        )


def guard_quadratic_knee(
    n_rows: int,
    limit_env: str,
    default_limit: int,
    name: str,
    scale_twin: str,
    detail: str,
) -> None:
    """Shared count-then-refuse guard for banded operators with a
    MEASURED quadratic candidate regime (the m=1 SimHash and 4-bit
    embedding-LSH knees): one implementation, per-operator env-var
    override, pointer to the scale twin."""
    import os as _os

    limit = int(_os.environ.get(limit_env, str(default_limit)))
    if n_rows > limit:
        raise ValueError(
            f"{name} hits its measured candidate blow-up above ~{limit} "
            f"rows (input: {n_rows}; {detail}). Use {scale_twin} or "
            f"raise {limit_env}."
        )


def simhash_pairs_df(spark, sf_dir: str, max_hamming: int = 8):
    """Guarded runner for the all-pairs SimHash oracle (see
    guard_all_pairs): counts the corpus before emitting the O(n²)
    plan. The scale path is simhash_banded_df (m=2 above 10^5 docs)."""
    import os as _os

    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
    guard_all_pairs(
        docs.count(), "dedup_simhash", "dedup_simhash_banded_m2"
    )
    docs.createOrReplaceTempView("documents")
    return spark.sql(simhash_pairs_spark(max_hamming))


def embedding_pairs_df(spark, sf_dir: str, threshold: float = 0.35):
    """Guarded runner for the all-pairs embedding-cosine oracle; the
    scale path is the hyperplane-LSH twin (dedup_embedding_lsh)."""
    import os as _os

    emb = spark.read.parquet(_os.path.join(sf_dir, "embeddings.parquet"))
    guard_all_pairs(
        emb.count(), "dedup_embedding_cosine", "dedup_embedding_lsh"
    )
    emb.createOrReplaceTempView("embeddings")
    return spark.sql(embedding_pairs_spark(threshold))


def simhash_pairs_spark(max_hamming: int = 8) -> str:
    base = simhash_fingerprints_spark()
    return f"""
WITH fp AS ({base})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       size(filter(sequence(1, 64),
            i -> substring(a.simhash, i, 1) != substring(b.simhash, i, 1)))
         AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE size(filter(sequence(1, 64),
      i -> substring(a.simhash, i, 1) != substring(b.simhash, i, 1)))
      <= {max_hamming}
"""


def simhash_pairs_duck(max_hamming: int = 8) -> str:
    base = simhash_fingerprints_duck()
    return f"""
WITH fp AS ({base})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       hamming(a.simhash, b.simhash) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE hamming(a.simhash, b.simhash) <= {max_hamming}
"""


SIMHASH_CHUNKS = 8  # 8 chunks × 8 bits: pigeonhole-exact for hamming ≤ 7
SIMHASH_BANDED_MAX_HAMMING = SIMHASH_CHUNKS - 1


def simhash_pairs_banded_spark(
    max_hamming: int = SIMHASH_BANDED_MAX_HAMMING,
) -> str:
    """Banded SimHash near-dup pairs — the 100 TB scale path.

    Candidates come from an equi-join on 8-bit fingerprint chunks
    (pigeonhole: any pair within hamming ≤ chunks-1 must agree on at
    least one chunk), so the plan is a hash shuffle on (chunk, value)
    keys — never an all-pairs nested loop. Hamming is then confirmed
    only for candidates. Exact (not approximate) for
    max_hamming ≤ {SIMHASH_CHUNKS}-1: the all-pairs variant
    (simhash_pairs_*) is its small-corpus oracle.
    """
    assert max_hamming < SIMHASH_CHUNKS
    base = simhash_fingerprints_spark()
    width = 64 // SIMHASH_CHUNKS
    chunk_rows = "\nUNION ALL\n".join(
        f"SELECT doc_id, {c} AS chunk, "
        f"substring(simhash, {c * width + 1}, {width}) AS ck FROM fp"
        for c in range(SIMHASH_CHUNKS)
    )
    ham = (
        "size(filter(sequence(1, 64), "
        "i -> substring(a.simhash, i, 1) != substring(b.simhash, i, 1)))"
    )
    return f"""
WITH fp AS ({base}),
chunks AS ({chunk_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM chunks a JOIN chunks b
    ON a.chunk = b.chunk AND a.ck = b.ck AND a.doc_id < b.doc_id)
SELECT c.doc_a, c.doc_b, {ham} AS hamming
FROM cand c
JOIN fp a ON a.doc_id = c.doc_a
JOIN fp b ON b.doc_id = c.doc_b
WHERE {ham} <= {max_hamming}
"""


def simhash_pairs_banded_duck(
    max_hamming: int = SIMHASH_BANDED_MAX_HAMMING,
) -> str:
    """DuckDB oracle for the banded path: plain all-pairs at the same
    hamming cutoff (banding is exact below SIMHASH_CHUNKS, so the
    result sets must be identical)."""
    return simhash_pairs_duck(max_hamming)


def simhash_banded_df(spark, sf_dir: str,
                      max_hamming: int = SIMHASH_BANDED_MAX_HAMMING,
                      m: int = 1):
    """DataFrame implementation of the banded SimHash pairs — the form
    a production pipeline runs. Differences vs the pure-SQL variant
    (simhash_pairs_banded_spark, kept as documentation):

    - fingerprints are computed ONCE and persisted (SQL CTEs get
      re-inlined at every reference — 10 recomputes of the 64-sum agg),
    - chunks come from one posexplode pass instead of an 8-way UNION,
    - hamming is bit_count(xor) over two packed 32-bit ints, not 64
      substring comparisons per candidate.

    ``m`` is the block-combination order (Manku, Jain & Sarma, WWW'07
    §3: key candidate buckets on every C(chunks, m) combination of m
    chunks). A pair within hamming ≤ d agrees on ≥ chunks−d chunks, so
    some m-combination matches whenever m ≤ chunks−d — the result stays
    EXACT for max_hamming ≤ SIMHASH_CHUNKS − m. Why raise m: bucket key
    space goes from 2^8 to 2^(8m), so expected bucket occupancy — and
    with it the quadratic candidate blow-up — drops by ~256× per step.
    Measured at 100k docs (scripts/ops_scale.py): m=1/d=7 spends ~144 s
    generating ~10^8 candidates; m=2/d=6 collapses the candidate set to
    the near-dup survivors. m=1 matches the classic one-chunk design;
    the same DuckDB all-pairs oracle (at the matching d) checks both."""
    import os as _os
    from itertools import combinations

    from pyspark.sql import functions as F

    assert 1 <= m < SIMHASH_CHUNKS
    assert max_hamming <= SIMHASH_CHUNKS - m
    docs = spark.read.parquet(_os.path.join(sf_dir, "documents.parquet"))
    if m == 1:
        # measured blow-up regime (scripts/ops_scale.py): 8-bit buckets
        # put ~n/256 docs per bucket, so candidates grow ~n²/512 — at
        # 100k docs that's ~10^8 candidate pairs (~144 s at local[32])
        # vs seconds for m=2's 16-bit buckets. Refuse past the knee
        # instead of silently going quadratic; m=2 is exact for d ≤ 6.
        guard_quadratic_knee(
            docs.count(),
            "CRAWLER_SPARK_BANDED_M1_MAX",
            50_000,
            "dedup_simhash_banded (m=1, 8-bit buckets)",
            "dedup_simhash_banded_m2 (exact for hamming ≤ 6)",
            "~144 s at 100k docs, ops_scale.py",
        )
    docs.createOrReplaceTempView("documents")
    width = 64 // SIMHASH_CHUNKS
    fp = (
        spark.sql(simhash_fingerprints_spark())
        .withColumn(
            "h1", F.conv(F.substring("simhash", 1, 32), 2, 10).cast("long")
        )
        .withColumn(
            "h2", F.conv(F.substring("simhash", 33, 32), 2, 10).cast("long")
        )
        .persist()
    )
    combos = list(combinations(range(SIMHASH_CHUNKS), m))
    chunks = fp.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat(
                        *[
                            F.substring("simhash", c * width + 1, width)
                            for c in combo
                        ]
                    )
                    for combo in combos
                ]
            )
        ).alias("chunk", "ck"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.ck") == F.col("b.ck"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    fa = fp.select(
        F.col("doc_id").alias("doc_a"),
        F.col("h1").alias("a1"),
        F.col("h2").alias("a2"),
    )
    fb = fp.select(
        F.col("doc_id").alias("doc_b"),
        F.col("h1").alias("b1"),
        F.col("h2").alias("b2"),
    )
    return (
        cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .withColumn(
            "hamming",
            (
                F.bit_count(F.col("a1").bitwiseXOR(F.col("b1")))
                + F.bit_count(F.col("a2").bitwiseXOR(F.col("b2")))
            ).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup pairs (brute force; ANN path in similarity.py)
# ---------------------------------------------------------------------------

# dot/norm computed as a sequential left-fold over index order in double
# precision in BOTH engines → bit-comparable before rounding.
_SPARK_DOT = (
    "aggregate(zip_with(a.v, b.v, (x, y) -> x * y), cast(0.0 as double),"
    " (acc, x) -> acc + x)"
)
_SPARK_NORM = (
    "sqrt(aggregate({v}, cast(0.0 as double), (acc, x) -> acc + x * x))"
)


def embedding_pairs_spark(threshold: float = 0.35) -> str:
    return f"""
WITH e AS (SELECT vec_id, transform(embedding, x -> cast(x as double)) AS v
           FROM embeddings),
p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         {_SPARK_DOT} /
         ({_SPARK_NORM.format(v='a.v')} * {_SPARK_NORM.format(v='b.v')})
           AS cos
  FROM e a JOIN e b ON a.vec_id < b.vec_id)
SELECT vec_a, vec_b, round(cos, 4) AS cos_sim
FROM p WHERE cos >= {threshold}
"""


EMB_DIM = 64
EMB_LSH_BANDS = 8
EMB_LSH_BITS = 4  # bits per band; 8 bands × 4 bits = 32 hyperplanes


def _hyperplane_sign_spark(t: int) -> str:
    """'1'/'0' sign bit of dot(v, s_t) where hyperplane s_t has ±1
    components from md5 parity of 't:i' — deterministic and identical
    in both engines (no RNG, no broadcast model)."""
    comp = (
        "CASE WHEN pmod(cast(conv(substring(md5(concat("
        f"'{t}:', cast(i as string))), 1, 1), 16, 10) as int), 2) = 1 "
        "THEN cast(1.0 as double) ELSE cast(-1.0 as double) END"
    )
    dot = (
        f"aggregate(zip_with(v, transform(sequence(0, {EMB_DIM - 1}), "
        f"i -> {comp}), (x, s) -> x * s), cast(0.0 as double), "
        "(acc, x) -> acc + x)"
    )
    return f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END"


def _hyperplane_sign_duck(t: int) -> str:
    comp = (
        f"CASE WHEN (('0x' || substring(md5('{t}:' || (i - 1)), 1, 1))"
        "::INTEGER % 2) = 1 THEN 1.0 ELSE -1.0 END"
    )
    dot = (
        f"list_sum(list_transform(range(1, {EMB_DIM + 1}), "
        f"i -> v[i] * ({comp})))"
    )
    return f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END"


def _embedding_lsh_body(sign_fn, dot_sql: str, norm_sql, cast_cte: str,
                        threshold: float) -> str:
    """Random-hyperplane LSH near-dup (the 100-TB path for
    dedup_embedding_cosine): band keys from hyperplane sign bits, pair
    candidates from a hash equi-join on (band, key) — never an
    all-pairs nested loop — then exact cosine confirm on candidates
    only. Deterministic in both engines, so the DuckDB oracle checks
    values; recall vs brute force is pytest-asserted separately."""
    band_rows = []
    for b in range(EMB_LSH_BANDS):
        bits = ", ".join(
            sign_fn(b * EMB_LSH_BITS + r) for r in range(EMB_LSH_BITS)
        )
        band_rows.append(
            f"SELECT vec_id, {b} AS band, concat({bits}) AS bkey FROM e"
        )
    bands = "\nUNION ALL\n".join(band_rows)
    return f"""
WITH e AS ({cast_cte}),
bands AS ({bands}),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id),
p AS (
  SELECT c.vec_a, c.vec_b,
         {dot_sql} / ({norm_sql.format(v='a.v')} * {norm_sql.format(v='b.v')})
           AS cos
  FROM cand c
  JOIN e a ON a.vec_id = c.vec_a
  JOIN e b ON b.vec_id = c.vec_b)
SELECT vec_a, vec_b, round(cos, 4) AS cos_sim
FROM p WHERE cos >= {threshold}
"""


def embedding_lsh_spark(threshold: float = 0.35) -> str:
    cast_cte = (
        "SELECT vec_id, transform(embedding, x -> cast(x as double)) AS v "
        "FROM embeddings"
    )
    return _embedding_lsh_body(
        _hyperplane_sign_spark, _SPARK_DOT, _SPARK_NORM, cast_cte, threshold
    )


def _hyperplane_components(t: int) -> list[float]:
    """±1.0 components of hyperplane t — the SAME md5-parity values the
    SQL form computes per row (hashlib.md5 == SQL md5 on ASCII), folded
    to constants at query-build time: the in-SQL form re-hashes
    32 planes × 64 components per vector per band reference."""
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"{t}:{i}".encode()).hexdigest()[0], 16) % 2 == 1
        else -1.0
        for i in range(EMB_DIM)
    ]


def embedding_lsh_views_spark(
    threshold: float = 0.35,
    bands: int = EMB_LSH_BANDS,
    bits: int = EMB_LSH_BITS,
    source_sql: str = "SELECT vec_id, embedding FROM embeddings",
) -> tuple[list[tuple[str, str]], str]:
    """Cached-view + constant-folded-hyperplane twin of
    embedding_lsh_spark (the semantic spec / oracle form).

    ``bits`` is the scale knob (the SimHash-banding lesson, measured
    here too): expected random-pair candidates per band are
    C(n,2) / 2^bits, so the registered 4-bit default — fine at the 2k
    sf vectors — went quadratic at 10^4+ (ops_scale probe: 311.9 s at
    just 20k vectors). The ``_hi`` registration (16 bits × 16 bands,
    threshold 0.9) holds candidates to ~n²/2^17 while keeping
    near-dup recall: per-bit agreement for cosine c is
    1 - acos(c)/pi, so a 0.95-cosine pair collides per band with
    0.899^16 ≈ 0.18 and across 16 bands with 1-(1-0.18)^16 ≈ 0.96
    (exact duplicates always collide). Raising bands buys recall
    linearly in signature cost; bits buys candidate sparsity
    exponentially."""
    band_rows = []
    for b in range(bands):
        bts = []
        for r in range(bits):
            comps = _hyperplane_components(b * bits + r)
            arr = "array(" + ", ".join(
                f"cast({c} as double)" for c in comps
            ) + ")"
            dot = (
                f"aggregate(zip_with(v, {arr}, (x, s) -> x * s), "
                "cast(0.0 as double), (acc, x) -> acc + x)"
            )
            bts.append(f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END")
        band_rows.append(
            f"SELECT vec_id, {b} AS band, concat({', '.join(bts)}) AS bkey "
            "FROM emb_e_v"
        )
    views = [
        (
            "emb_e_v",
            "SELECT vec_id, transform(embedding, x -> cast(x as double)) AS v "
            f"FROM ({source_sql})",
        ),
        ("emb_bands_v", "\nUNION ALL\n".join(band_rows)),
    ]
    final = f"""
WITH cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM emb_bands_v a JOIN emb_bands_v b
    ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id),
p AS (
  SELECT c.vec_a, c.vec_b,
         {_SPARK_DOT} /
         ({_SPARK_NORM.format(v='a.v')} * {_SPARK_NORM.format(v='b.v')})
           AS cos
  FROM cand c
  JOIN emb_e_v a ON a.vec_id = c.vec_a
  JOIN emb_e_v b ON b.vec_id = c.vec_b)
SELECT vec_a, vec_b, round(cos, 4) AS cos_sim
FROM p WHERE cos >= {threshold}
"""
    return views, final


def embedding_lsh_4bit_df(spark, sf_dir: str, threshold: float = 0.35):
    """Guarded runner for the registered 4-bit embedding-LSH query —
    the exact pattern of the m=1 SimHash banding guard above
    (simhash_banded_df): 4-bit band keys put ~n/16 vectors per bucket,
    so random-pair candidates grow ~n²/32 per band — measured at 311.9 s
    for just 20k vectors (BENCH.md round 3, scripts/ops_scale.py).
    Refuse past the knee instead of silently going quadratic; the
    16-bit × 16-band ``dedup_embedding_lsh_hi`` twin is the scale path
    (9.7 s at 20k, 29.8 s at 100k vectors, recall ≈ 0.96 at cos 0.95).
    Override for deliberate small-corpus oracle runs via
    CRAWLER_SPARK_EMB_LSH_4BIT_MAX."""
    import os as _os

    from ..views import load_views, views_fn

    if not _os.path.exists(_os.path.join(sf_dir, "embeddings.parquet")):
        # load_views silently skips missing files; without this check a
        # stale 'embeddings' view from a previous sf_dir would be
        # counted (and queried) instead of erroring cleanly
        raise FileNotFoundError(
            f"{sf_dir}/embeddings.parquet not found — refusing to fall "
            "back to a previously registered 'embeddings' view"
        )
    load_views(spark, sf_dir)
    guard_quadratic_knee(
        spark.table("embeddings").count(),
        "CRAWLER_SPARK_EMB_LSH_4BIT_MAX",
        10_000,
        "dedup_embedding_lsh (4-bit band keys)",
        "dedup_embedding_lsh_hi (16-bit × 16 bands)",
        "311.9 s at 20k vectors, BENCH.md r3",
    )
    views, final = embedding_lsh_views_spark(threshold)
    return views_fn(views, final)(spark, sf_dir)


# deterministic "re-ingest snapshot" augmentation for the _hi variant:
# every 20th vector reappears with a new id and its first component
# scaled 1.5x (cosine ~0.999 to its original) — the planted positives
# that make the high-threshold query non-vacuous on sf corpora whose
# natural max pairwise cosine is ~0.51. Multiplication is exact IEEE on
# identical floats, so both engines derive bit-identical sources.
EMB_SNAPSHOT_SPARK = """
SELECT vec_id, embedding FROM embeddings
UNION ALL
SELECT vec_id + 1000000 AS vec_id,
       concat(array(cast(embedding[0] * 1.5 AS float)),
              slice(embedding, 2, size(embedding) - 1)) AS embedding
FROM embeddings WHERE pmod(vec_id, 20) = 0
"""

EMB_SNAPSHOT_DUCK = """
SELECT vec_id, embedding FROM embeddings
UNION ALL
SELECT vec_id + 1000000 AS vec_id,
       list_prepend((embedding[1] * 1.5)::FLOAT,
                    embedding[2:len(embedding)]) AS embedding
FROM embeddings WHERE vec_id % 20 = 0
"""


def embedding_lsh_const_duck(
    threshold: float = 0.35,
    bands: int = EMB_LSH_BANDS,
    bits: int = EMB_LSH_BITS,
    source_sql: str = "SELECT vec_id, embedding FROM embeddings",
) -> str:
    """Constant-folded DuckDB twin of :func:`embedding_lsh_views_spark`
    for the wide-signature variants: the per-row md5 form re-hashes
    bands × bits × 64 components per vector (33M md5 calls at 2k
    vectors for the 16×16 signature), the folded form none."""
    band_rows = []
    for b in range(bands):
        bts = []
        for r in range(bits):
            comps = _hyperplane_components(b * bits + r)
            arr = "[" + ", ".join(str(c) for c in comps) + "]"
            dot = f"list_dot_product(v, {arr})"
            bts.append(f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END")
        band_rows.append(
            f"SELECT vec_id, {b} AS band, concat({', '.join(bts)}) AS bkey "
            "FROM e"
        )
    bands_sql = "\nUNION ALL\n".join(band_rows)
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM ({source_sql})),
bands AS ({bands_sql}),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.vec_id < b.vec_id),
p AS (
  SELECT c.vec_a, c.vec_b,
         list_dot_product(a.v, b.v) /
         (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
           AS cos
  FROM cand c
  JOIN e a ON a.vec_id = c.vec_a
  JOIN e b ON b.vec_id = c.vec_b)
SELECT vec_a, vec_b, round(cos, 4) AS cos_sim
FROM p WHERE cos >= {threshold}
"""


def embedding_lsh_duck(threshold: float = 0.35) -> str:
    cast_cte = (
        "SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v "
        "FROM embeddings"
    )
    return _embedding_lsh_body(
        _hyperplane_sign_duck,
        "list_dot_product(a.v, b.v)",
        "sqrt(list_dot_product({v}, {v}))",
        cast_cte,
        threshold,
    )


def embedding_pairs_duck(threshold: float = 0.35) -> str:
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
           FROM embeddings),
p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         list_dot_product(a.v, b.v) /
         (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
           AS cos
  FROM e a JOIN e b ON a.vec_id < b.vec_id)
SELECT vec_a, vec_b, round(cos, 4) AS cos_sim
FROM p WHERE cos >= {threshold}
"""


# ---------------------------------------------------------------------------
# train/eval decontamination (cross-source n-gram overlap)
# ---------------------------------------------------------------------------
# Training pipelines must drop train documents that overlap benchmark /
# eval sets (n-gram contamination, GPT-3 appendix C / Dolma-style).
# Shape at 100 TB: the eval side is tiny (benchmark suites, ~10^5 docs)
# -> its DISTINCT shingle set broadcasts; the train side streams through
# a map-side hash-join probe with no shuffle of the corpus itself. Only
# the per-doc hit-count groupBy shuffles (doc_id, count) pairs. The
# reference has no analog (it dedups by exact MD5 only,
# HZ.Crawler.DataSpider/BaseSpider.cs:275-287); this is the scale path
# the brief's training-data section demands.
#
# Production uses 13-gram shingles; n=3 here so sf0.01's short synthetic
# documents produce non-vacuous overlap. Eval membership is a source
# predicate, injectable via the `eval_sources` argument.

def _decontaminate_body(shingle_sql: str, eval_sources: str,
                        threshold: float) -> str:
    return f"""
WITH sh AS ({shingle_sql}),
tagged AS (
  SELECT s.doc_id, s.sh, d.source IN ({eval_sources}) AS is_eval
  FROM sh s JOIN documents d ON s.doc_id = d.doc_id),
eval_sh AS (SELECT DISTINCT sh FROM tagged WHERE is_eval),
train AS (SELECT doc_id, sh FROM tagged WHERE NOT is_eval),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM train GROUP BY doc_id),
hits AS (
  SELECT t.doc_id, count(*) AS n_contaminated
  FROM train t JOIN eval_sh e ON t.sh = e.sh
  GROUP BY t.doc_id)
SELECT s.doc_id, s.n_shingles,
       coalesce(h.n_contaminated, 0) AS n_contaminated,
       round(cast(coalesce(h.n_contaminated, 0) AS double) / s.n_shingles, 4)
         AS contamination,
       CASE WHEN cast(coalesce(h.n_contaminated, 0) AS double) / s.n_shingles
                 >= {threshold} THEN 1 ELSE 0 END AS flagged
FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id
"""


def decontaminate_spark(n: int = 3, threshold: float = 0.5,
                        eval_sources: str = "'src0','src1'") -> str:
    return _decontaminate_body(spark_shingle_sql(n), eval_sources, threshold)


def decontaminate_duck(n: int = 3, threshold: float = 0.5,
                       eval_sources: str = "'src0','src1'") -> str:
    return _decontaminate_body(duck_shingle_sql(n), eval_sources, threshold)


# ---------------------------------------------------------------------------
# Windowed exact-substring dedup (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better", arXiv:2107.06499). The
# paper's suffix-array ExactSubstr is inherently sequential; the
# distributed equivalent is fixed-width token windows hashed and
# grouped — any W-token run shared verbatim across documents collides
# on its window hash. One shuffle on the window hash, skew-safe (a
# boilerplate window collapses to one group), map-side everything else.
# Reference analog: none (reference dedups whole images by MD5,
# HZ.Crawler.DataSpider/BaseSpider.cs:275-287).
# ---------------------------------------------------------------------------

EXACTSUB_W = 20  # window width (tokens): the paper's 50-token unit
EXACTSUB_S = 10  # stride; W/2 overlap halves cost, still covers runs


def _exactsub_body(toks: str, windows: str) -> str:
    # sequence/generate_series stop at size-W, so every window is
    # exactly W tokens — no ragged tail windows to diverge on
    return f"""
WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
w AS (SELECT doc_id, {windows}
d AS (SELECT h FROM w GROUP BY h HAVING count(DISTINCT doc_id) > 1)
SELECT w.doc_id,
       count(*) AS n_windows,
       count(d.h) AS n_dup_windows,
       round(cast(count(d.h) AS double) / count(*), 6) AS dup_frac
FROM w LEFT JOIN d ON w.h = d.h
GROUP BY w.doc_id
"""


def exact_substring_spark(w: int = EXACTSUB_W, s: int = EXACTSUB_S) -> str:
    toks = "split(trim(lower(text)), '\\\\s+')"
    windows = f"""md5(cast(array_join(slice(toks, p + 1, {w}), ' ') AS binary)) AS h
      FROM t LATERAL VIEW explode(sequence(0, size(toks) - {w}, {s})) AS p
      WHERE size(toks) >= {w}),"""
    return _exactsub_body(toks, windows)


def exact_substring_duck(w: int = EXACTSUB_W, s: int = EXACTSUB_S) -> str:
    toks = "regexp_split_to_array(trim(lower(text)), '\\s+')"
    windows = f"""md5(array_to_string(toks[p + 1:p + {w}], ' ')) AS h
      FROM t, unnest(generate_series(0, len(toks) - {w}, {s})) AS u(p)
      WHERE len(toks) >= {w}),"""
    return _exactsub_body(toks, windows)


# ---------------------------------------------------------------------------
# shingle containment (doc-inside-doc / quote-farm detection)
# ---------------------------------------------------------------------------
# Jaccard misses the aggregator-page case: a short document quoted
# inside a 3x-longer composite has jaccard ~= 1/3 but containment
# |A∩B| / min(|A|,|B|) = 1. The operator reports both directions'
# intersection over the smaller shingle set, thresholded by integer
# cross-multiplication (n_common * 10 >= min_size * 8, i.e. >= 0.8) and
# emitted as tie-free integer basis points (floor(n*10000/m) — exact
# under 2^53, no round(x,4) boundary). Same DF-capped blocking as
# ngram_jaccard: candidates only from co-occurring rare shingles, one
# shuffle on sh, one on the pair key — no all-pairs stage.
#
# The sf corpus has no natural containment-without-jaccard pairs, so
# the source augments documents with deterministic composites: every
# 25th doc spawns an "aggregator" (id + 1000000) concatenating docs
# i, i+1, i+2 — each composite must then be flagged containing all
# three sources (pytest) while jaccard (~0.33) stays below the
# ngram_jaccard 0.5 gate.

CONT_SRC_SPARK = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT a.doc_id + 1000000 AS doc_id,
       concat_ws(' ', a.text, b.text, c.text) AS text
FROM documents a
JOIN documents b ON b.doc_id = a.doc_id + 1
JOIN documents c ON c.doc_id = a.doc_id + 2
WHERE pmod(a.doc_id, 25) = 0
"""

CONT_SRC_DUCK = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT a.doc_id + 1000000 AS doc_id,
       concat_ws(' ', a.text, b.text, c.text) AS text
FROM documents a
JOIN documents b ON b.doc_id = a.doc_id + 1
JOIN documents c ON c.doc_id = a.doc_id + 2
WHERE a.doc_id % 25 = 0
"""


def _containment_final(sh_view: str, pct10: int = 8) -> str:
    return f"""
WITH sizes AS (SELECT doc_id, count(*) AS n FROM {sh_view} GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM {sh_view}f a JOIN {sh_view}f b
    ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT i.doc_a, i.doc_b, i.n_common,
       cast(floor(cast(i.n_common AS double) * 10000 /
                  least(sa.n, sb.n)) AS BIGINT) AS containment_bp
FROM inter i
JOIN sizes sa ON i.doc_a = sa.doc_id
JOIN sizes sb ON i.doc_b = sb.doc_id
WHERE i.n_common * 10 >= least(sa.n, sb.n) * {pct10}
"""


def containment_views_spark(
    n: int = 2, pct10: int = 8
) -> tuple[list[tuple[str, str]], str]:
    """(views, final) for queries._views_fn — shingles evaluated once
    over the augmented source."""
    src_shingles = spark_shingle_sql(n).replace(
        "FROM documents", f"FROM ({CONT_SRC_SPARK})"
    )
    views = [
        ("cont_sh", src_shingles),
        (
            "cont_shf",
            f"""SELECT s.doc_id, s.sh FROM cont_sh s
                JOIN (SELECT sh FROM cont_sh GROUP BY sh
                      HAVING count(*) <= {DF_CAP}) f ON s.sh = f.sh""",
        ),
    ]
    return views, _containment_final("cont_sh", pct10)


def containment_duck(n: int = 2, pct10: int = 8) -> str:
    sh = duck_shingle_sql(n).replace(
        "FROM documents", f"FROM ({CONT_SRC_DUCK})"
    )
    return f"""
WITH cont_sh AS ({sh}),
freq AS (SELECT sh, count(*) AS df FROM cont_sh GROUP BY sh),
cont_shf AS (SELECT s.doc_id, s.sh FROM cont_sh s
             JOIN freq f ON s.sh = f.sh WHERE f.df <= {DF_CAP}),
{_containment_final("cont_sh", pct10).lstrip().removeprefix("WITH ")}
"""


# ---------------------------------------------------------------------------
# Paragraph-level exact dedup (CCNet, Wenzek et al. 2020, arXiv:
# 1911.00359 §3.2; also RefinedWeb/Gopher preprocessing): hash every
# paragraph, keep only the corpus-wide FIRST occurrence of each hash,
# report per-document survival. Web boilerplate (nav bars, footers,
# cookie banners) repeats across documents while the documents
# themselves are not near-duplicates — whole-doc dedup (dedup_exact /
# MinHash) cannot remove it; paragraph dedup is the standard pass that
# does. Reference analog: none (the reference dedups whole images by
# MD5, HZ.Crawler.DataSpider/BaseSpider.cs:275-287).
#
# The sf corpus has no newline structure, so "paragraph" is a
# deterministic fixed-width segmentation (PARA_W-token windows, ragged
# tail kept) — at production scale the segmentation swaps for
# split-on-'\n' with the pipeline unchanged.
#
# Spark shape: ONE shuffle on the paragraph hash. The first-occurrence
# rule is two stacked aggregations (min doc_id per hash, then min
# para-offset within that doc) — both with map-side partial
# aggregation, so a boilerplate paragraph repeated 10^8 times collapses
# to one row per partition before the shuffle; no window function, no
# skew risk. The per-doc rollup shuffles on doc_id (bounded groups:
# paragraphs per doc). Survival fraction emitted as tie-free integer
# basis points (floor(n*10000/m), exact under 2^53 — no round(x,4)
# cross-engine boundary).
# ---------------------------------------------------------------------------

PARA_W = 12  # tokens per synthetic paragraph (ragged tail kept)


def _paragraph_body(paras: str) -> str:
    return f"""
WITH t AS (SELECT doc_id, {{toks}} AS toks FROM documents),
p AS (SELECT doc_id, {paras}
firsts AS (SELECT h, min(doc_id) AS mind FROM p GROUP BY h),
firstp AS (
  SELECT p.h, p.doc_id, min(p.pidx) AS minp
  FROM p JOIN firsts f ON p.h = f.h AND p.doc_id = f.mind
  GROUP BY p.h, p.doc_id),
perdoc AS (
  SELECT p.doc_id,
         count(*) AS n_paras,
         count(f.minp) AS kept_paras
  FROM p LEFT JOIN firstp f
    ON p.h = f.h AND p.doc_id = f.doc_id AND p.pidx = f.minp
  GROUP BY p.doc_id)
SELECT doc_id, n_paras, kept_paras,
       n_paras - kept_paras AS dup_paras,
       cast(floor(cast(kept_paras AS double) * 10000 / n_paras) AS BIGINT)
         AS kept_bp
FROM perdoc
"""


def paragraph_dedup_spark(w: int = PARA_W) -> str:
    toks = "split(trim(lower(text)), '\\\\s+')"
    paras = f"""p AS pidx,
       md5(cast(array_join(slice(toks, p + 1, {w}), ' ') AS binary)) AS h
      FROM t LATERAL VIEW explode(
        sequence(0, greatest(size(toks) - 1, 0), {w})) AS p),"""
    return _paragraph_body(paras).format(toks=toks)


def paragraph_dedup_duck(w: int = PARA_W) -> str:
    toks = "regexp_split_to_array(trim(lower(text)), '\\s+')"
    paras = f"""p AS pidx,
       md5(array_to_string(toks[p + 1:p + {w}], ' ')) AS h
      FROM t, unnest(generate_series(0, greatest(len(toks) - 1, 0), {w}))
        AS u(p)),"""
    return _paragraph_body(paras).format(toks=toks)


def paragraph_dedup_rewrite(docs, w: int = PARA_W):
    """Pipeline form of ``dedup_paragraph``: REWRITE each document to
    its surviving paragraphs (corpus-wide first occurrence per
    normalized-paragraph hash), preserving original casing/spacing at
    word granularity; documents whose every paragraph was seen earlier
    vanish. Input/output schema: (doc_id, text, lang, source, n_chars)
    — n_chars recomputed from the rewritten text.

    Shuffle budget: one on the paragraph hash (two stacked min-aggs,
    map-side partials), one on doc_id for the rebuild (bounded groups:
    paragraphs per doc). The rebuild sorts only INSIDE each collect_list
    (array_sort over ≤ paragraphs-per-doc structs) — no window, no
    global sort.
    """
    from pyspark.sql import functions as F

    base = docs.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("toks")
    )
    paras = base.select(
        "doc_id",
        F.explode(
            F.expr(f"sequence(0, greatest(size(toks) - 1, 0), {w})")
        ).alias("pidx"),
        "toks",
    ).select(
        "doc_id",
        "pidx",
        F.expr(f"array_join(slice(toks, pidx + 1, {w}), ' ')").alias(
            "ptext"
        ),
    ).withColumn("h", F.md5(F.lower("ptext").cast("binary")))

    firsts = (
        paras.groupBy("h")
        .agg(F.min("doc_id").alias("fdoc"))
        .withColumnRenamed("h", "fh")
    )
    firstp = (
        paras.join(
            firsts,
            (F.col("h") == F.col("fh")) & (F.col("doc_id") == F.col("fdoc")),
        )
        .groupBy("fh", "fdoc")
        .agg(F.min("pidx").alias("minp"))
    )
    kept = paras.join(
        firstp,
        (F.col("h") == F.col("fh"))
        & (F.col("doc_id") == F.col("fdoc"))
        & (F.col("pidx") == F.col("minp")),
    ).select("doc_id", "pidx", "ptext")

    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pidx", "ptext"))),
                lambda x: x["ptext"],
            ),
            " ",
        ).alias("text")
    )
    return (
        docs.drop("text", "n_chars")
        .join(rebuilt, "doc_id")
        .withColumn("n_chars", F.length("text"))
        .select("doc_id", "text", "lang", "source", "n_chars")
    )


def paragraph_relation_spark(w: int = PARA_W) -> str:
    """The (doc_id, pidx, h) paragraph relation dedup_paragraph and its
    streaming twin share — one place for the segmentation."""
    return f"""
WITH t AS (SELECT doc_id, split(trim(lower(text)), '\\\\s+') AS toks
           FROM documents)
SELECT doc_id, p AS pidx,
       md5(cast(array_join(slice(toks, p + 1, {w}), ' ') AS binary)) AS h
FROM t LATERAL VIEW explode(
  sequence(0, greatest(size(toks) - 1, 0), {w})) AS p
"""

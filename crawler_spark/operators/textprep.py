"""Shared text-preparation expressions for the training-data operators.

Tokenization/shingling is defined ONCE here as paired Spark-column /
DuckDB-SQL builders so every operator (dedup, fingerprinting, quality,
lang-id) uses byte-identical semantics in both engines — that's what
makes the DuckDB oracle cross-check meaningful.

All expressions are JVM-side (split + higher-order array functions);
no Python executes per row.
"""

from __future__ import annotations

# Spark SQL fragment: whitespace tokens, empties dropped
SPARK_WORDS = "filter(split(text, '\\\\s+'), x -> x != '')"
# DuckDB equivalent
DUCK_WORDS = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"


def spark_shingles(n: int = 2) -> str:
    """Distinct word n-gram shingles from a `w` array column (Spark SQL).
    Documents shorter than n words collapse to one whole-text shingle."""
    return f"""CASE WHEN size(w) < {n}
      THEN array_distinct(array(array_join(w, ' ')))
      ELSE array_distinct(transform(sequence(1, size(w) - {n - 1}),
             i -> array_join(slice(w, i, {n}), ' '))) END"""


def duck_shingles(n: int = 2) -> str:
    """DuckDB twin of :func:`spark_shingles` (1-based inclusive slices).

    The whole-text branch coalesces to '' because DuckDB's
    ``array_to_string([], ' ')`` is NULL (Spark's ``array_join`` returns
    '') and ``list_distinct`` then DROPS the NULL — without the
    coalesce a zero-token document vanishes from the shingle relation
    in DuckDB but not in Spark (caught by tests/test_edge_docs.py)."""
    return f"""CASE WHEN len(w) < {n}
      THEN list_distinct([coalesce(array_to_string(w, ' '), '')])
      ELSE list_distinct(list_transform(range(1, len(w) - {n - 2}),
             i -> array_to_string(w[i:i + {n - 1}], ' '))) END"""


# exploded (doc_id, sh) relations
def spark_shingle_sql(n: int = 2) -> str:
    return f"""
    SELECT doc_id, explode({spark_shingles(n)}) AS sh FROM
      (SELECT doc_id, {SPARK_WORDS} AS w FROM documents)"""


def duck_shingle_sql(n: int = 2) -> str:
    return f"""
    SELECT doc_id, unnest({duck_shingles(n)}) AS sh FROM
      (SELECT doc_id, {DUCK_WORDS} AS w FROM documents)"""

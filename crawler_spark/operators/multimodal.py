"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container ships no image/audio codecs, so the *decode* step is a
deterministic stub (clearly marked) — but the Spark-side plumbing that
matters at 100 TB is real and tested: binary columns flow through
Arrow-batched ``mapInPandas`` with explicit schemas, batch-shaped
processing, and metadata projected JVM-side where possible.

- ``mm_meta``: JVM-only metadata projection over the binary payload
  (byte length, content hash, sniffed pseudo-format, fake dimensions
  derived from the content hash) — SQL-expressible, DuckDB-checked.
- ``decode_batches``: the mapInPandas decode/feature-extract stage.
  Real codec calls would replace ``_fake_decode``; everything around it
  (schema, batching, partition fan-out) is production-shaped.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

# pages→binary: in the sandbox the `documents.text` bytes stand in for an
# image/audio payload column.
MM_META_SPARK = """
SELECT doc_id,
       length(cast(text AS binary)) AS byte_len,
       md5(text) AS content_md5,
       CASE pmod(cast(conv(substring(md5(text), 1, 2), 16, 10)
                 as int), 3)
            WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
       64 + pmod(cast(conv(substring(md5(text), 3, 2), 16, 10)
                 as int), 192) AS width,
       64 + pmod(cast(conv(substring(md5(text), 5, 2), 16, 10)
                 as int), 192) AS height
FROM documents
"""

MM_META_DUCK = """
SELECT doc_id,
       octet_length(encode(text)) AS byte_len,
       md5(text) AS content_md5,
       CASE (('0x' || substring(md5(text), 1, 2))::INTEGER % 3)
            WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
       64 + (('0x' || substring(md5(text), 3, 2))::INTEGER % 192)
         AS width,
       64 + (('0x' || substring(md5(text), 5, 2))::INTEGER % 192)
         AS height
FROM documents
"""

DECODE_SCHEMA = (
    "doc_id long, byte_len int, format string, "
    "feature array<float>, decode_ok boolean"
)

_FEAT_DIM = 8


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB decoder — deterministic stand-in for an image/audio codec.

    A real deployment replaces this with e.g. PIL/libvips/ffmpeg; the
    digest-derived vector keeps tests deterministic without codecs.
    Raise NotImplementedError here to surface missing-codec setups."""
    d = hashlib.md5(payload).digest()
    return (
        np.frombuffer(d[:_FEAT_DIM], dtype=np.uint8).astype(np.float32) / 255.0
    )


def decode_batches(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched decode/feature-extract over a binary column.

    Input needs (doc_id, ``payload_col`` binary). Output one row per
    input with an 8-dim feature vector; rows whose decode fails are
    kept with decode_ok = false (quarantine contract, never crash)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "byte_len": pdf[payload_col].map(
                    lambda b: len(b) if b is not None else 0
                ),
                "format": [],
                "feature": [],
                "decode_ok": [],
            }
            fmts, feats, oks = [], [], []
            for b in pdf[payload_col]:
                if b is None:
                    fmts.append(None)
                    feats.append(None)
                    oks.append(False)
                    continue
                try:
                    vec = _fake_decode(bytes(b))
                    # same derivation as mm_meta's sniffed format (first
                    # md5 byte mod 3) so joint queries agree
                    fmt_ix = int(hashlib.md5(bytes(b)).hexdigest()[:2], 16) % 3
                    fmts.append(["jpeg", "png", "webp"][fmt_ix])
                    feats.append([float(x) for x in vec])
                    oks.append(True)
                except NotImplementedError:
                    fmts.append(None)
                    feats.append(None)
                    oks.append(False)
            out["format"] = fmts
            out["feature"] = feats
            out["decode_ok"] = oks
            yield pd.DataFrame(out)

    return df.select("doc_id", payload_col).mapInPandas(run, DECODE_SCHEMA)


def documents_as_payload(documents: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as the opaque media payload."""
    return documents.select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

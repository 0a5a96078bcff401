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


# ---------------------------------------------------------------------------
# resize (image) — mapInPandas, deterministic stub kernel
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = (
    "doc_id long, src_width int, src_height int, width int, height int, "
    "resized_md5 string, resize_ok boolean"
)


def resize_batches(
    df: DataFrame, width: int = 128, height: int = 128,
    payload_col: str = "payload",
) -> DataFrame:
    """Arrow-batched image resize stage. The pixel kernel is the STUB
    (a real deployment calls PIL/libvips inside the loop); the Spark
    plumbing — binary in, fixed target dims, content-addressed output
    hash, quarantine-not-crash on null payloads — is production-shaped.
    Source dims derive from the content hash exactly as ``mm_meta``
    sniffs them, and the resized payload's identity is
    md5(md5(payload) || ':WxH') — deterministic, so the whole skeleton
    is DuckDB-oracle-checkable (q:mm_resize)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "src_width", "src_height", "width", "height",
                "resized_md5", "resize_ok")}
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                rows["doc_id"].append(doc_id)
                if b is None:
                    for k in ("src_width", "src_height", "width", "height",
                              "resized_md5"):
                        rows[k].append(None)
                    rows["resize_ok"].append(False)
                    continue
                hx = hashlib.md5(bytes(b)).hexdigest()
                rows["src_width"].append(64 + int(hx[2:4], 16) % 192)
                rows["src_height"].append(64 + int(hx[4:6], 16) % 192)
                rows["width"].append(width)
                rows["height"].append(height)
                rows["resized_md5"].append(
                    hashlib.md5(
                        f"{hx}:{width}x{height}".encode()
                    ).hexdigest()
                )
                rows["resize_ok"].append(True)
            yield pd.DataFrame(rows)

    return df.select("doc_id", payload_col).mapInPandas(run, RESIZE_SCHEMA)


def resize_duck(width: int = 128, height: int = 128) -> str:
    return f"""
SELECT doc_id,
       64 + (('0x' || substring(md5(text), 3, 2))::INTEGER % 192)
         AS src_width,
       64 + (('0x' || substring(md5(text), 5, 2))::INTEGER % 192)
         AS src_height,
       {width} AS width, {height} AS height,
       md5(md5(text) || ':{width}x{height}') AS resized_md5,
       true AS resize_ok
FROM documents
"""


# ---------------------------------------------------------------------------
# frame sampling (video) — one-to-many mapInPandas
# ---------------------------------------------------------------------------

FRAME_SCHEMA = "doc_id long, n_frames int, frame_idx int, frame_md5 string"

_FRAME_STRIDE = 4
_FRAME_CAP = 8  # max frames sampled per payload


def frame_sample_batches(
    df: DataFrame, stride: int = _FRAME_STRIDE, cap: int = _FRAME_CAP,
    payload_col: str = "payload",
) -> DataFrame:
    """Strided frame sampling over opaque video payloads: each input
    row fans out to ≤``cap`` frame rows (indices 0, stride, 2·stride…).
    The demux is the STUB (ffmpeg in production); the one-to-many
    Arrow batch reshaping, the per-frame content addressing, and the
    frame-count derivation are the real plumbing. Frame count is
    md5-derived (8 + hx[6:8] % 56 ∈ [8, 64)), frame identity is
    md5(md5(payload) || ':f<idx>') — the full output is DuckDB-
    checkable (q:mm_frame_sample)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "n_frames", "frame_idx", "frame_md5")}
            for doc_id, b in zip(pdf["doc_id"], pdf[payload_col]):
                if b is None:
                    continue  # no frames from a null payload
                hx = hashlib.md5(bytes(b)).hexdigest()
                n_frames = 8 + int(hx[6:8], 16) % 56
                for i in range(0, min(n_frames, stride * cap), stride):
                    rows["doc_id"].append(doc_id)
                    rows["n_frames"].append(n_frames)
                    rows["frame_idx"].append(i)
                    rows["frame_md5"].append(
                        hashlib.md5(f"{hx}:f{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return df.select("doc_id", payload_col).mapInPandas(run, FRAME_SCHEMA)


def frame_sample_duck(stride: int = _FRAME_STRIDE,
                      cap: int = _FRAME_CAP) -> str:
    return f"""
WITH f AS (
  SELECT doc_id, md5(text) AS hx,
         8 + (('0x' || substring(md5(text), 7, 2))::INTEGER % 56)
           AS n_frames
  FROM documents)
SELECT doc_id, n_frames,
       unnest(range(0, least(n_frames, {stride * cap}), {stride}))::INTEGER
         AS frame_idx,
       md5(hx || ':f' ||
           unnest(range(0, least(n_frames, {stride * cap}), {stride})))
         AS frame_md5
FROM f
"""

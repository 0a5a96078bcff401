"""Partitioned Bloom URL-seen structure (SURVEY.md §4.2-3, M3).

Replaces the reference's MD5 dedup cache (BaseSpider.cs:275-287) and the
Redis ``SetEntryInHashIfNotExists`` primitive (RedisHashService.cs:29-32)
with a *partitioned* bloom filter:

- keys are hash-partitioned by ``h1(url) % P``; each partition owns an
  independent m-bit array,
- the per-superstep build runs distributed (``applyInPandas`` after a
  shuffle on the bloom partition id — the same co-partitioning the
  frontier uses), the driver only ORs the per-partition bitmaps,
- probing broadcasts the bitmaps and runs as an Arrow-batched pandas UDF.

Bloom contract: NO false negatives (property-tested) — a "not seen"
answer skips the exact anti-join entirely; "maybe seen" candidates go
through the exact ``left_anti`` backstop against the ``url_seen`` table.

Scale note (10^10 keys): at 1% fpp the full structure is ~12 GB — too
big to broadcast whole. The partitioned layout is exactly what fixes
that on a real cluster: bitmaps live co-partitioned with the frontier's
url-hash partitioning, so each executor only ever needs its own
partition's bitmap (ship-addressed-partitions-only). In local mode we
broadcast all partitions, which is the degenerate single-node case of
the same design.
"""

from __future__ import annotations

import hashlib
import os
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T


def _h(url: str) -> tuple[int, int]:
    d = hashlib.md5(url.encode("utf-8")).digest()
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:16], "big")


class PartitionedBloom:
    """P independent bloom partitions of m bits each, k hashes
    (Kirsch-Mitzenmacher double hashing)."""

    def __init__(self, n_partitions: int = 16, m_bits: int = 1 << 17, k: int = 5):
        self.P = n_partitions
        self.m = m_bits
        self.k = k
        self.bits = np.zeros((n_partitions, m_bits // 8), dtype=np.uint8)

    # -- core single-key ops (driver/partition-local) -----------------------
    def _positions(self, url: str) -> tuple[int, np.ndarray]:
        h1, h2 = _h(url)
        pid = h1 % self.P
        idx = (h1 // self.P + np.arange(self.k, dtype=np.uint64) * np.uint64(h2 % self.m)) % np.uint64(self.m)
        return pid, idx.astype(np.int64)

    def add(self, url: str) -> None:
        pid, idx = self._positions(url)
        np.bitwise_or.at(self.bits[pid], idx // 8, (1 << (idx % 8)).astype(np.uint8))

    def add_many(self, urls: Iterable[str]) -> None:
        for u in urls:
            self.add(u)

    def contains(self, url: str) -> bool:
        pid, idx = self._positions(url)
        return bool(np.all((self.bits[pid, idx // 8] >> (idx % 8)) & 1))

    # -- persistence (part of the superstep checkpoint) ---------------------
    def save(self, path: str) -> None:
        tmp = path + ".tmp.npz"
        np.savez_compressed(tmp, bits=self.bits, P=self.P, m=self.m, k=self.k)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "PartitionedBloom":
        with np.load(path) as z:
            b = cls(int(z["P"]), int(z["m"]), int(z["k"]))
            b.bits = z["bits"].copy()
        return b

    # -- distributed build/probe -------------------------------------------
    def build_deltas(self, df: DataFrame, url_col: str = "url") -> list:
        """Distributed partial-bloom build over ``df[url_col]``: shuffle by
        bloom pid, build one bitmap per pid, return [(pid, bytes)] to OR in.
        """
        P, m, k = self.P, self.m, self.k

        out_schema = T.StructType(
            [
                T.StructField("pid", T.IntegerType()),
                T.StructField("bits", T.BinaryType()),
            ]
        )

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            bits = np.zeros(m // 8, dtype=np.uint8)
            pid = int(pdf["pid"].iloc[0])
            for u in pdf["url"]:
                d = hashlib.md5(u.encode("utf-8")).digest()
                h1 = int.from_bytes(d[:8], "big")
                h2 = int.from_bytes(d[8:16], "big")
                idx = (
                    h1 // P
                    + np.arange(k, dtype=np.uint64) * np.uint64(h2 % m)
                ) % np.uint64(m)
                idx = idx.astype(np.int64)
                np.bitwise_or.at(bits, idx // 8, (1 << (idx % 8)).astype(np.uint8))
            return pd.DataFrame({"pid": [pid], "bits": [bits.tobytes()]})

        bloom_pid = bloom_pid_udf(P)
        rows = (
            df.select(F.col(url_col).alias("url"))
            .withColumn("pid", bloom_pid(F.col("url")))
            .groupBy("pid")
            .applyInPandas(build, out_schema)
            .collect()
        )
        return [(r.pid, r.bits) for r in rows]

    def merge_deltas(self, deltas: list) -> None:
        for pid, raw in deltas:
            self.bits[pid] |= np.frombuffer(raw, dtype=np.uint8)

    def add_df(
        self,
        df: DataFrame,
        url_col: str = "url",
        collect_threshold: int = 0,
        n_rows: int | None = None,
    ) -> None:
        """Add a DataFrame of urls. Small deltas (≤ collect_threshold,
        when the caller knows ``n_rows``) are collected and added
        driver-side — cheaper than an applyInPandas shuffle; large
        deltas use the distributed partition-wise build."""
        if (
            collect_threshold
            and n_rows is not None
            and n_rows <= collect_threshold
        ):
            self.add_many(
                r[0] for r in df.select(url_col).collect()
            )
            return
        self.merge_deltas(self.build_deltas(df, url_col))

    def probe_udf(self, spark: SparkSession):
        """Arrow-batched membership probe: url → maybe-seen boolean.
        Broadcasts the bitmaps once per call site."""
        bc = spark.sparkContext.broadcast((self.P, self.m, self.k, self.bits))

        @F.pandas_udf(T.BooleanType())
        def maybe_seen(urls: pd.Series) -> pd.Series:  # pragma: no cover
            P, m, k, bits = bc.value
            out = np.empty(len(urls), dtype=bool)
            for i, u in enumerate(urls):
                d = hashlib.md5(u.encode("utf-8")).digest()
                h1 = int.from_bytes(d[:8], "big")
                h2 = int.from_bytes(d[8:16], "big")
                idx = (
                    h1 // P
                    + np.arange(k, dtype=np.uint64) * np.uint64(h2 % m)
                ) % np.uint64(m)
                idx = idx.astype(np.int64)
                out[i] = bool(
                    np.all((bits[h1 % P, idx // 8] >> (idx % 8)) & 1)
                )
            return pd.Series(out)

        return maybe_seen

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits).mean())


def bloom_pid_udf(P: int):
    @F.pandas_udf(T.IntegerType())
    def pid(urls: pd.Series) -> pd.Series:  # pragma: no cover - executor
        return pd.Series(
            [
                int.from_bytes(hashlib.md5(u.encode("utf-8")).digest()[:8], "big") % P
                for u in urls
            ],
            dtype="int32",
        )

    return pid

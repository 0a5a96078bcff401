"""Partitioned cuckoo filter — the deletable alternative to the bloom
URL-seen structure (BASELINE north_rule: "Bloom/cuckoo URL-seen").

Same partitioned layout and engine-facing API as
:class:`crawler_spark.bloom.PartitionedBloom` (add/add_df/contains/
probe_udf/save/load), so the engine switches between the two via
``EngineConfig.seen_filter``. Standard cuckoo filter (Fan et al.,
CoNEXT'14): 4-slot buckets, 16-bit fingerprints, partial-key cuckoo
hashing (i2 = i1 XOR hash(fp)), bounded eviction with a stash-free
overflow flag per partition.

Why a cuckoo variant matters at 10^10 keys: ~same space as a bloom at
3% fpp but supports DELETE — a crawler that re-queues URLs for
recrawl (TTL expiry) can remove them from the seen-structure without
rebuilding, which a bloom cannot do. Overflowed partitions degrade to
"always maybe" (never a false negative) and the exact anti-join
backstop keeps correctness.
"""

from __future__ import annotations

import hashlib
import os
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

BUCKET_SLOTS = 4
MAX_KICKS = 500


def _h(url: str) -> tuple[int, int]:
    d = hashlib.md5(url.encode("utf-8")).digest()
    return int.from_bytes(d[:8], "big"), int.from_bytes(d[8:16], "big")


def _fp_hash(fp: int) -> int:
    # cheap fingerprint hash for the partial-key alternate bucket
    return (fp * 0x5BD1E995) & 0xFFFFFFFF


class PartitionedCuckoo:
    """P independent cuckoo partitions of ``n_buckets`` × 4 slots of
    uint16 fingerprints (0 = empty slot; fingerprints are 1..65535)."""

    def __init__(self, n_partitions: int = 16, n_buckets: int = 1 << 13):
        if n_buckets <= 0 or n_buckets & (n_buckets - 1):
            # the partial-key alternate bucket i2 = (i1 ^ h(fp)) % B is an
            # involution ONLY for power-of-two B; any other B lets an
            # evicted fingerprint land where neither probe looks — a
            # false negative, violating the URL-seen contract
            raise ValueError(
                f"n_buckets must be a power of two, got {n_buckets}"
            )
        self.P = n_partitions
        self.B = n_buckets
        self.table = np.zeros(
            (n_partitions, n_buckets, BUCKET_SLOTS), dtype=np.uint16
        )
        self.overflow = np.zeros(n_partitions, dtype=bool)

    # -- key decomposition ---------------------------------------------------
    def _key(self, url: str) -> tuple[int, int, int, int]:
        h1, h2 = _h(url)
        pid = h1 % self.P
        fp = (h2 & 0xFFFF) or 1
        i1 = (h1 // self.P) % self.B
        i2 = (i1 ^ _fp_hash(fp)) % self.B
        return pid, fp, i1, i2

    # -- mutation -------------------------------------------------------------
    def add(self, url: str) -> None:
        pid, fp, i1, _ = self._key(url)
        self._insert_into(pid, fp, i1)

    def _insert_into(self, pid: int, fp: int, i1: int) -> None:
        """Deterministic cuckoo insert (no RNG — eviction choices derive
        from the fingerprint chain so runs are reproducible)."""
        t = self.table[pid]
        i2 = (i1 ^ _fp_hash(fp)) % self.B
        for i in (i1, i2):
            if fp in t[i]:
                return  # already present (idempotent seen-set add)
            empty = np.where(t[i] == 0)[0]
            if len(empty):
                t[i][empty[0]] = fp
                return
        rng_state = fp
        i, cur = i1, fp
        for _ in range(MAX_KICKS):
            slot = rng_state % BUCKET_SLOTS
            rng_state = _fp_hash(rng_state ^ i) or 1
            cur, t[i][slot] = int(t[i][slot]), cur
            i = (i ^ _fp_hash(cur)) % self.B
            empty = np.where(t[i] == 0)[0]
            if len(empty):
                t[i][empty[0]] = cur
                return
        # table effectively full: degrade the partition to always-maybe
        self.overflow[pid] = True

    def add_many(self, urls: Iterable[str]) -> None:
        for u in urls:
            self.add(u)

    def delete(self, url: str) -> bool:
        """Remove one occurrence (recrawl/TTL path). Returns True if a
        fingerprint was removed."""
        pid, fp, i1, i2 = self._key(url)
        t = self.table[pid]
        for i in (i1, i2):
            hit = np.where(t[i] == fp)[0]
            if len(hit):
                t[i][hit[0]] = 0
                return True
        return False

    # -- membership ------------------------------------------------------------
    def contains(self, url: str) -> bool:
        pid, fp, i1, i2 = self._key(url)
        if self.overflow[pid]:
            return True
        t = self.table[pid]
        return bool(fp in t[i1] or fp in t[i2])

    # -- persistence ------------------------------------------------------------
    def save(self, path: str) -> None:
        tmp = path + ".tmp.npz"
        np.savez_compressed(
            tmp, table=self.table, overflow=self.overflow, P=self.P, B=self.B
        )
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "PartitionedCuckoo":
        with np.load(path) as z:
            c = cls(int(z["P"]), int(z["B"]))
            c.table = z["table"].copy()
            c.overflow = z["overflow"].copy()
        return c

    # -- engine-facing API (mirrors PartitionedBloom) ---------------------------
    def add_df(
        self,
        df: DataFrame,
        url_col: str = "url",
        collect_threshold: int = 0,
        n_rows: int | None = None,
    ) -> None:
        """Cuckoo insertion is stateful (evictions) so the build is NOT
        mergeable by OR like bloom bitmaps; the distributed variant
        shuffles urls by pid and applies per-partition inserts against
        the shipped partition table, returning replacement tables."""
        if (
            collect_threshold
            and n_rows is not None
            and n_rows <= collect_threshold
        ):
            self.add_many(r[0] for r in df.select(url_col).collect())
            return
        P, B = self.P, self.B
        tables = self.table

        out_schema = T.StructType(
            [
                T.StructField("pid", T.IntegerType()),
                T.StructField("table", T.BinaryType()),
                T.StructField("overflow", T.BooleanType()),
            ]
        )
        overflow = self.overflow

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            pid = int(pdf["pid"].iloc[0])
            part = PartitionedCuckoo(1, B)
            part.table[0] = tables[pid]
            part.overflow[0] = overflow[pid]
            for u in pdf["url"]:
                h1, h2 = _h(u)
                fp = (h2 & 0xFFFF) or 1
                i1 = (h1 // P) % B
                # reuse single-partition insert via a shim url-less path
                part._insert_into(0, fp, i1)
            return pd.DataFrame(
                {
                    "pid": [pid],
                    "table": [part.table[0].tobytes()],
                    "overflow": [bool(part.overflow[0])],
                }
            )

        from .bloom import bloom_pid_udf

        rows = (
            df.select(F.col(url_col).alias("url"))
            .withColumn("pid", bloom_pid_udf(P)(F.col("url")))
            .groupBy("pid")
            .applyInPandas(build, out_schema)
            .collect()
        )
        for r in rows:
            self.table[r.pid] = np.frombuffer(
                r.table, dtype=np.uint16
            ).reshape(B, BUCKET_SLOTS)
            self.overflow[r.pid] |= r.overflow

    def probe_udf(self, spark: SparkSession):
        bc = spark.sparkContext.broadcast(
            (self.P, self.B, self.table, self.overflow)
        )

        @F.pandas_udf(T.BooleanType())
        def maybe_seen(urls: pd.Series) -> pd.Series:  # pragma: no cover
            P, B, table, overflow = bc.value
            out = np.empty(len(urls), dtype=bool)
            for i, u in enumerate(urls):
                d = hashlib.md5(u.encode("utf-8")).digest()
                h1 = int.from_bytes(d[:8], "big")
                h2 = int.from_bytes(d[8:16], "big")
                pid = h1 % P
                if overflow[pid]:
                    out[i] = True
                    continue
                fp = (h2 & 0xFFFF) or 1
                i1 = (h1 // P) % B
                i2 = (i1 ^ _fp_hash(fp)) % B
                t = table[pid]
                out[i] = bool(fp in t[i1] or fp in t[i2])
            return pd.Series(out)

        # see PartitionedBloom.probe_udf: blocks pushdown below dedup
        return maybe_seen.asNondeterministic()

    def fill_ratio(self) -> float:
        return float((self.table != 0).mean())

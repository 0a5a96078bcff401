"""Superstep state store: Iceberg-style snapshot/manifest semantics on
plain parquet (M6, SURVEY.md §4.2-4, §7.3-5).

The sandbox image has no Iceberg jars, so the store reproduces the part
of Iceberg the engine contract needs — atomic snapshot commits with
exact resume — directly:

- every table is an append-only set of per-superstep *delta* directories
  (``<root>/<table>/delta-<s>``); the frontier is fully versioned
  (``<root>/frontier/v<s>``),
- a JSON *manifest* names exactly the deltas/versions that are committed;
  it is replaced atomically (tmp + ``os.replace``) and IS the commit
  point — write order: entity tables → url_seen → frontier → bloom →
  manifest (SURVEY.md §7.3-5),
- on open, delta dirs not named by the manifest (a killed superstep's
  partial writes) are deleted; the superstep then re-runs
  deterministically, so resume output is byte-identical to an
  uninterrupted run (tested).

On a real cluster this maps 1:1 onto Iceberg: delta dir → snapshot
append, manifest → Iceberg metadata pointer swap, cleanup → orphan-file
removal. Lineage/counters land in the ``checkpoints`` table.
"""

from __future__ import annotations

import fcntl
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from . import schemas


class ConcurrentWriterError(RuntimeError):
    """Another StateStore committed to this root since we loaded it —
    committing now would silently fork history (split brain)."""

# url_seen is DERIVED from crawl_log (url, superstep projection) — one
# physical write per superstep serves both tables.
TABLES = {
    "crawl_log": schemas.CRAWL_LOG,
    "categories": None,  # schema carried by parquet (has seq column)
    "brands": schemas.BRANDS,
    "products": None,
    "img_cache": schemas.IMG_CACHE,
    "errors": schemas.ERRORS,
    "checkpoints": schemas.CHECKPOINTS,
    "links": schemas.LINKS,  # discovered edges (EngineConfig.record_links)
}


class StateStore:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        fresh: bool = False,
        readonly: bool = False,
    ):
        self.spark = spark
        self.root = root
        if fresh and os.path.exists(root):
            if readonly:
                raise ValueError("fresh=True and readonly=True conflict")
            shutil.rmtree(root)
        os.makedirs(root, exist_ok=True)
        self.manifest = self._load_manifest()
        # fencing token: the commit_seq we believe is on disk. commit()
        # only lands if the on-disk manifest still carries this value.
        self._commit_seq = self.manifest.get("commit_seq", 0)
        # readonly (round-5 review finding): pure readers (e.g.
        # authority.compute_priority_scores against a possibly-LIVE
        # crawl's state dir) must not run the destructive
        # uncommitted-delta cleanup — it would rmtree a concurrent
        # engine's staged writes out from under it. The commit_seq
        # fence only guards commits, not opens.
        if not readonly:
            self._cleanup_uncommitted()
        # superstep chains write different tables from driver threads;
        # plain list ops are GIL-atomic but compact()'s read-modify-write
        # of the gc list is not
        self._pending_gc: list[str] = []

    # -- manifest -----------------------------------------------------------
    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "manifest.json")

    def _load_manifest(self) -> dict:
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                m = json.load(f)
            # migration: manifests written before a table existed (e.g.
            # pre-r5 "links") simply have no deltas for it yet
            for t in TABLES:
                m["tables"].setdefault(t, [])
            return m
        return {
            "superstep": 0,
            "commit_seq": 0,
            "tables": {t: [] for t in TABLES},
            "frontier": None,
            "bloom": None,
            "counters": {"max_cat_seq": 0, "pages_fetched": 0},
        }

    def commit(self) -> None:
        """Atomic manifest swap — THE commit point of a superstep.

        Fenced against concurrent writers (SURVEY §7.3-5, VERDICT r2
        item 9): the swap is a compare-and-set on ``commit_seq`` — under
        an exclusive flock we re-read the on-disk manifest and refuse
        with ConcurrentWriterError if any other StateStore committed
        since this one loaded, so two engines pointed at one state dir
        cannot each believe their superstep landed (split-brain
        double-commit). The loser's staged delta dirs are unreferenced
        by the surviving manifest and are GC'd on next open, exactly
        like a killed superstep's partial writes. flock is the local-
        POSIX stand-in for what is an atomic catalog pointer CAS on
        Iceberg — the optimistic-concurrency model is identical.
        """
        # concurrent chains append their delta paths in scheduler order;
        # sort for a run-order-independent (deterministic) manifest
        for table in self.manifest["tables"]:
            self.manifest["tables"][table].sort()
        lock_path = os.path.join(self.root, "commit.lock")
        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            on_disk = self._load_manifest()
            if on_disk.get("commit_seq", 0) != self._commit_seq:
                raise ConcurrentWriterError(
                    f"state root {self.root!r}: on-disk manifest is at "
                    f"commit_seq {on_disk.get('commit_seq', 0)} but this "
                    f"writer expected {self._commit_seq} — another engine "
                    "has committed here; refusing to overwrite its history."
                )
            self._commit_seq += 1
            self.manifest["commit_seq"] = self._commit_seq
            tmp = self._manifest_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(self.manifest, f, indent=1)
            os.replace(tmp, self._manifest_path)

    def _cleanup_uncommitted(self) -> None:
        """Remove partial writes from a killed superstep (exact resume)."""
        known = set(self.manifest["tables"]) | {"frontier"}
        for d in os.listdir(self.root):
            full = os.path.join(self.root, d)
            if os.path.isdir(full) and d not in known:
                shutil.rmtree(full, ignore_errors=True)
        for table, committed in self.manifest["tables"].items():
            tdir = os.path.join(self.root, table)
            if not os.path.isdir(tdir):
                continue
            keep = {os.path.basename(p) for p in committed}
            for d in os.listdir(tdir):
                if d not in keep:
                    shutil.rmtree(os.path.join(tdir, d), ignore_errors=True)
        fdir = os.path.join(self.root, "frontier")
        if os.path.isdir(fdir):
            keep_f = (
                {os.path.basename(self.manifest["frontier"])}
                if self.manifest["frontier"]
                else set()
            )
            for d in os.listdir(fdir):
                if d not in keep_f:
                    shutil.rmtree(os.path.join(fdir, d), ignore_errors=True)
        committed_bloom = self.manifest.get("bloom")
        for fn in os.listdir(self.root):
            full = os.path.join(self.root, fn)
            if (
                os.path.isfile(full)
                and fn.startswith("bloom-")
                and full != committed_bloom
            ):
                os.remove(full)

    # -- reads --------------------------------------------------------------
    def read(self, table: str) -> DataFrame:
        if table == "url_seen":
            from pyspark.sql import functions as F

            if not self.has_rows("crawl_log"):
                return self.spark.createDataFrame([], schemas.URL_SEEN)
            return self.read("crawl_log").select(
                "url", F.col("superstep").cast("long").alias("superstep")
            )
        paths = self.manifest["tables"][table]
        if not paths:
            schema = TABLES[table]
            if schema is None:
                raise ValueError(f"no deltas and no static schema for {table}")
            return self.spark.createDataFrame([], schema)
        # Task-count discipline: the bench configs set a small
        # files.maxPartitionBytes so the (single-file) sandbox corpus
        # scan parallelizes, but that same setting shreds state-table
        # re-reads — dozens of small delta files × tiny splits — into
        # hundreds of confetti tasks per superstep (event-log audit:
        # 387-task img_cache scans whose scheduling overhead cannot use
        # 16 cores). coalesce is a narrow cap, shuffle-free, and scales
        # with the cluster because defaultParallelism does.
        return self.spark.read.parquet(*paths).coalesce(
            self.spark.sparkContext.defaultParallelism
        )

    def has_rows(self, table: str) -> bool:
        return bool(self.manifest["tables"][table])

    def read_frontier(self) -> DataFrame | None:
        p = self.manifest["frontier"]
        if p is None:
            return None
        # same confetti-task cap as read() — the frontier is re-read
        # every superstep and its small-split scan must not fragment
        return self.spark.read.parquet(p).coalesce(
            self.spark.sparkContext.defaultParallelism
        )

    # -- writes (staged; durable only after commit()) -----------------------
    def write_delta(
        self,
        table: str,
        df: DataFrame,
        superstep: int,
        partitions: int = 8,
        suffix: str = "",
    ) -> str:
        name = f"delta-{superstep:06d}" + (f"-{suffix}" if suffix else "")
        path = os.path.join(self.root, table, name)
        if path in self.manifest["tables"][table]:
            # a second write to the same delta path would overwrite the
            # first AND double-read it via the manifest — always a bug
            raise ValueError(
                f"duplicate delta {path!r} for table {table!r}; "
                "pass a distinct suffix per write within a superstep"
            )
        if partitions:
            df = df.coalesce(partitions)
        df.write.mode("overwrite").parquet(path)
        self.manifest["tables"][table].append(path)
        return path

    def write_frontier(self, df: DataFrame, superstep: int) -> str:
        path = os.path.join(self.root, "frontier", f"v{superstep:06d}")
        df.write.mode("overwrite").parquet(path)
        old = self.manifest["frontier"]
        self.manifest["frontier"] = path
        # retain only the previous committed version for debugging; GC rest
        fdir = os.path.join(self.root, "frontier")
        for d in os.listdir(fdir):
            full = os.path.join(fdir, d)
            if full not in (path, old):
                shutil.rmtree(full, ignore_errors=True)
        return path

    def compact(self, table: str, superstep: int, partitions: int = 8) -> None:
        """Rewrite a table's accumulated deltas into one snapshot file set
        (Iceberg compaction analog). The loop re-reads some state tables
        every superstep; without compaction their file count grows
        linearly with supersteps and metadata handling starts to dominate.
        Crash-safe: the compacted dir only becomes visible via the next
        manifest commit; an interrupted compaction is GC'd on open."""
        paths = self.manifest["tables"][table]
        if len(paths) <= 1:
            return
        df = self.spark.read.parquet(*paths).coalesce(partitions)
        path = os.path.join(self.root, table, f"compact-{superstep:06d}")
        df.write.mode("overwrite").parquet(path)
        self.manifest["tables"][table] = [path]
        # old deltas are removed by _cleanup_uncommitted on next open if
        # this manifest commits; remove eagerly only AFTER commit() —
        # the engine calls gc_unreferenced() post-commit. extend() is
        # GIL-atomic (compactions run on concurrent driver threads).
        self._pending_gc.extend(paths)

    def gc_unreferenced(self) -> None:
        """Remove delta dirs superseded by a committed compaction."""
        for p in self._pending_gc:
            shutil.rmtree(p, ignore_errors=True)
        self._pending_gc = []

    def bloom_path(self, superstep: int) -> str:
        return os.path.join(self.root, f"bloom-{superstep:06d}.npz")

    def set_bloom(self, path: str) -> None:
        # stale bloom files are GC'd on next open (_cleanup_uncommitted),
        # never here: the old file must survive until commit() lands.
        self.manifest["bloom"] = path

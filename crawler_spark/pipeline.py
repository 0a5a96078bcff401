"""End-to-end training-data pipeline: compose the corpus operators into
the curation flow a 100 TB webtext run actually executes.

    documents ──► quality gate (Gopher shape rules)
              ──► exact dedup (first-wins per md5, BaseSpider.cs:275-287
                  semantics lifted to the corpus)
              ──► near-dup dedup (MinHash-LSH pairs → connected
                  components → canonical per cluster)
              ──► CCNet perplexity gate (drop the tail tercile per lang)
              ──► [optional] DSIR importance gate (top-N‰ by hashed-
                  unigram target-likeness; q:sample_importance)
              ──► LM sequence packing (concat-and-chunk, sharded cumsum)
              ──► packed training shards (parquet, partitioned by lang)

Every stage reuses the REGISTERED operator SQL (queries.py keys:
text_gopher_rules, dedup_exact, dedup_minhash_lsh→dedup_components,
text_ccnet_buckets, text_pack_sequences) — the pipeline adds no new
semantics, only composition, so each stage stays covered by its own
DuckDB oracle. Stages chain by rebinding the ``documents`` temp view to
the survivor frame (localCheckpoint-backed: each stage's plan is
evaluated once, lineage doesn't stack across stages — at 10^10 docs
each arrow above is a table write anyway).

Scale notes per stage are in the operator modules; the composition
itself adds one narrow survivors-projection join per stage, broadcast
when the survivor id set is dimension-sized, hash otherwise (Spark
picks via AQE — ids are a single bigint column either way).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import cluster, dedup, textstats


def _run_views(
    spark: SparkSession, views: list[tuple[str, str]], final: str
) -> DataFrame:
    """queries._views_fn without the load_views() rebinding — the
    pipeline OWNS the ``documents`` view between stages."""
    for name, sql in views:
        spark.sql(sql).localCheckpoint(eager=False).createOrReplaceTempView(
            name
        )
    return spark.sql(final)


def _rebind(spark: SparkSession, docs: DataFrame) -> DataFrame:
    docs = docs.localCheckpoint(eager=False)
    docs.createOrReplaceTempView("documents")
    return docs


def _input_fingerprint(docs: DataFrame) -> dict:
    """Cheap deterministic identity of the input corpus: row count +
    doc_id range + an order-insensitive crc sum. One narrow distributed
    agg over a single bigint column — negligible next to any stage."""
    row = docs.agg(
        F.count("doc_id").alias("n"),
        F.min("doc_id").alias("lo"),
        F.max("doc_id").alias("hi"),
        F.sum(F.crc32(F.col("doc_id").cast("string"))).alias("crc"),
    ).collect()[0]
    return {
        "n": row["n"],
        "lo": None if row["lo"] is None else int(row["lo"]),
        "hi": None if row["hi"] is None else int(row["hi"]),
        "crc": None if row["crc"] is None else int(row["crc"]),
    }


def _check_fingerprint(out_dir: str | None, fp: dict) -> None:
    """Fence stage resume to the corpus AND pipeline config it was
    computed on. ADVICE r2: re-running with the same out_dir but a
    different --docs input would silently join stale committed survivor
    ids onto the new corpus. ADVICE r3: the fingerprint must also carry
    the text-rewriting stage flags — resuming the same out_dir with
    ``paragraph_dedup`` toggled would join near_dup_dedup/ccnet_gate
    survivor ids (computed on rewritten text) onto un-rewritten docs,
    or vice versa, resurrecting/altering text the full=True checkpoint
    protects. (The DSIR gate needs no fingerprint entry: its stage name
    carries the permille and nothing committed sits downstream of it.)
    First run records the fingerprint; a later run with a different
    input or config refuses to resume instead of producing
    wrong-but-plausible output."""
    if out_dir is None:
        return
    stages = os.path.join(out_dir, "stages")
    path = os.path.join(stages, "_input_fingerprint.json")
    if os.path.exists(path):
        with open(path, encoding="utf-8") as f:
            committed = json.load(f)
        # migration: fingerprints committed before the config key
        # existed carry no record of the flag, but the out_dir itself
        # does — a committed stages/paragraph_dedup checkpoint exists
        # iff the old run ran the stage (ADVICE r4: defaulting to False
        # would let a legacy paragraph_dedup=True out_dir silently pass
        # the fence when resumed with False, joining survivor ids
        # computed on rewritten text onto un-rewritten docs — the exact
        # hazard this fence exists to close). If the old run was killed
        # before the stage committed, nothing downstream of the rewrite
        # is committed either, so inferring False is safe there.
        if "paragraph_dedup" not in committed:
            committed["paragraph_dedup"] = os.path.isdir(
                os.path.join(stages, "paragraph_dedup")
            )
        if committed != fp:
            raise ValueError(
                f"out_dir {out_dir!r} holds stage checkpoints for a "
                f"different input corpus or pipeline config (committed "
                f"{committed}, current {fp}); refusing to resume onto "
                "mismatched survivors — rerun with --fresh (or a new "
                "--out) to recompute."
            )
        return
    os.makedirs(stages, exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(fp, f)
    os.replace(tmp, path)


def _stage_load(
    spark: SparkSession, out_dir: str | None, stage: str, full: bool = False
) -> DataFrame | None:
    """Return the committed survivor frame for ``stage`` (ids joined
    back onto the current documents view) if the stage already ran
    with this out_dir, else None. Resume is fenced by
    ``_check_fingerprint``: run_training_pipeline refuses earlier if
    the committed checkpoints belong to a different input corpus.

    ``full``: the stage REWRITES rows (paragraph dedup) — its
    checkpoint is the whole frame, loaded directly; an id-rejoin onto
    the pre-rewrite view would silently resurrect the original text."""
    if out_dir is None:
        return None
    final = os.path.join(out_dir, "stages", stage)
    if not os.path.isdir(final):
        return None
    committed = spark.read.parquet(final)
    if full:
        return committed
    return spark.table("documents").join(committed, "doc_id")


def _stage_commit(
    out_dir: str | None, stage: str, docs: DataFrame, full: bool = False
) -> None:
    """Crash-safe stage boundary: write the survivor ids to a temp
    name, then atomic rename — the Iceberg-commit pattern
    statestore.py uses. A kill mid-write leaves only the .tmp dir,
    which the next run overwrites; the committed name appears whole
    or not at all. Local-POSIX-filesystem semantics only (os.replace
    on directories): at 100 TB the stage boundary is an Iceberg table
    commit, not a directory rename. A pre-existing committed dir (a
    manually restored or partially copied stage) is removed first —
    _stage_load keyed on it before we got here, so reaching this line
    means the stage is being recomputed and the old dir is stale."""
    if out_dir is None:
        return
    final = os.path.join(out_dir, "stages", stage)
    tmp = final + ".tmp"
    out = docs if full else docs.select("doc_id")
    out.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp, final)


def run_training_pipeline(
    spark: SparkSession,
    documents: DataFrame,
    out_dir: str | None = None,
    dsir_keep_permille: int | None = None,
    paragraph_dedup: bool = False,
) -> tuple[DataFrame, dict]:
    """Run the full curation flow over ``documents`` (schema: doc_id,
    text, lang, source, n_chars). Returns (packed frame, per-stage row
    accounting). ``out_dir``: write lang-partitioned shards AND
    per-stage survivor checkpoints — a re-run with the same out_dir
    resumes after the last committed stage instead of recomputing
    (the crawl engine's resume-exactness contract, applied to the
    curation flow).

    ``dsir_keep_permille``: optional DSIR importance gate between the
    CCNet gate and packing — keep the docs whose hashed-unigram
    importance weight (q:sample_importance) clears the corpus
    (1000 - keep)‰ score threshold. The threshold is an exact
    ``percentile`` over ONE bigint per doc (tiny next to the corpus);
    at 10^10 docs swap in the bounded-bin threshold from the
    q:sketch_quantile_hist pattern — the gate rule itself (integer
    score >= integer threshold, ties keep) is unchanged. ``None``
    (default) skips the stage, keeping the published accounting.

    ``paragraph_dedup``: optional CCNet paragraph-granularity pass
    between exact dedup and near-dup dedup — REWRITES each doc to its
    corpus-wide-first-occurrence paragraphs (q:dedup_paragraph rule,
    operators/dedup.py:paragraph_dedup_rewrite); docs left empty
    vanish. Off by default, keeping the published accounting."""
    counts: dict[str, int] = {}
    docs = _rebind(spark, documents)
    fp = _input_fingerprint(docs)
    counts["input"] = fp["n"]
    # the paragraph stage REWRITES text feeding every later committed
    # stage, so its flag is part of the checkpoint identity (ADVICE r3)
    _check_fingerprint(
        out_dir, {**fp, "paragraph_dedup": bool(paragraph_dedup)}
    )

    # 1. Gopher document-shape quality gate (q:text_gopher_rules)
    loaded = _stage_load(spark, out_dir, "quality_gate")
    if loaded is None:
        keep_ids = spark.sql(textstats.gopher_rules_spark()).where(
            F.col("keep") == 1
        )
        docs = docs.join(keep_ids.select("doc_id"), "doc_id")
        _stage_commit(out_dir, "quality_gate", docs)
    else:
        docs = loaded
    docs = _rebind(spark, docs)
    counts["quality_gate"] = docs.count()

    # 2. exact dedup: first-wins per content hash (q:dedup_exact rule)
    loaded = _stage_load(spark, out_dir, "exact_dedup")
    if loaded is None:
        first = (
            docs.groupBy(F.md5("text").alias("h"))
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        docs = docs.join(first, "doc_id")
        _stage_commit(out_dir, "exact_dedup", docs)
    else:
        docs = loaded
    docs = _rebind(spark, docs)
    counts["exact_dedup"] = docs.count()

    # 2b. optional CCNet paragraph-level dedup (q:dedup_paragraph rule,
    #     rewriting text): boilerplate paragraphs survive whole-doc
    #     dedup — this is the pass that removes them
    if paragraph_dedup:
        loaded = _stage_load(spark, out_dir, "paragraph_dedup", full=True)
        if loaded is None:
            docs = dedup.paragraph_dedup_rewrite(docs)
            _stage_commit(out_dir, "paragraph_dedup", docs, full=True)
        else:
            docs = loaded
        docs = _rebind(spark, docs)
        counts["paragraph_dedup"] = docs.count()

    # 3. near-dup dedup: LSH pairs → components → canonical per cluster
    #    (q:dedup_minhash_lsh candidates, q:dedup_components closure)
    loaded = _stage_load(spark, out_dir, "near_dup_dedup")
    if loaded is None:
        pairs = _run_views(spark, *dedup.minhash_lsh_views_spark()).select(
            "doc_a", "doc_b"
        )
        comps = cluster.connected_components(docs.select("doc_id"), pairs)
        canon = comps.where(F.col("doc_id") == F.col("comp_id")).select(
            "doc_id"
        )
        docs = docs.join(canon, "doc_id")
        _stage_commit(out_dir, "near_dup_dedup", docs)
    else:
        docs = loaded
    docs = _rebind(spark, docs)
    counts["near_dup_dedup"] = docs.count()

    # 4. CCNet perplexity gate: drop the tail tercile per language
    #    (q:text_ccnet_buckets)
    loaded = _stage_load(spark, out_dir, "ccnet_gate")
    if loaded is None:
        buckets = _run_views(spark, *textstats.ccnet_buckets_views_spark())
        keep = buckets.where(F.col("bucket") != "tail").select("doc_id")
        docs = docs.join(keep, "doc_id")
        _stage_commit(out_dir, "ccnet_gate", docs)
    else:
        docs = loaded
    docs = _rebind(spark, docs)
    counts["ccnet_gate"] = docs.count()

    # 4b. optional DSIR importance gate (q:sample_importance)
    if dsir_keep_permille is not None:
        stage = f"dsir_gate_p{dsir_keep_permille}"
        loaded = _stage_load(spark, out_dir, stage)
        if loaded is None:
            scores = _run_views(
                spark, *textstats.importance_views_spark()
            ).select("doc_id", "logratio_micronats")
            thresh = scores.selectExpr(
                "percentile(logratio_micronats, "
                f"{(1000 - dsir_keep_permille) / 1000.0}) AS t"
            ).first()["t"]
            keep = scores.where(
                F.col("logratio_micronats") >= float(thresh)
            ).select("doc_id")
            docs = docs.join(keep, "doc_id")
            _stage_commit(out_dir, stage, docs)
        else:
            docs = loaded
        docs = _rebind(spark, docs)
        counts["dsir_gate"] = docs.count()

    # 5. LM sequence packing over the survivors (q:text_pack_sequences)
    packed = spark.sql(textstats.PACK_SPARK).localCheckpoint(eager=False)
    counts["packed_docs"] = packed.count()
    counts["packed_sequences"] = (
        packed.select("lang", "shard", "seq_id").distinct().count()
    )

    if out_dir is not None:
        (
            packed.repartition("lang")
            .write.mode("overwrite")
            .partitionBy("lang")
            .parquet(os.path.join(out_dir, "packed"))
        )
    return packed, counts

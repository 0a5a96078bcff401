"""Neutral view-loading helpers shared by the query registry and the
operator modules.

Split out of ``queries.py`` (ADVICE r4: ``operators/dedup.py`` had to
late-import the query registry just to reuse ``_views_fn`` — a layering
inversion; operators must not depend on the registry that registers
them). Both ``crawler_spark.queries`` and ``crawler_spark.operators.*``
import from here; nothing here imports either of them.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_views(spark: SparkSession, sf_dir: str) -> None:
    # timestamps in the parquet are naive (NTZ); DuckDB treats them as
    # UTC — pin the session so epoch/window results agree regardless of
    # the host session's zone
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)


def views_fn(
    views: list[tuple[str, str]], final: str
) -> Callable[[SparkSession, str], DataFrame]:
    """Evaluate each (name, sql) step once behind a checkpointed temp
    view, then run the final SQL over them. Spark inlines CTEs at every
    reference (DuckDB materializes them), so the pure-SQL forms of the
    heavy dedup queries re-run their shingle/signature relations up to
    ~10×; this keeps the published SQL as the spec while executing each
    relation once."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_views(spark, sf_dir)
        for name, sql in views:
            spark.sql(sql).localCheckpoint(
                eager=False
            ).createOrReplaceTempView(name)
        return spark.sql(final)

    return fn

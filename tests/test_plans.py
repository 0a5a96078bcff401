"""Physical-plan shape checks: the optimizations the engine relies on at
100 TB must actually appear in the plans (predicate pushdown into the
parquet scan, column pruning, broadcast joins on dim tables / the fetch
batch, no shuffle of the pages relation)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_and_column_pruning(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") < "1996-01-01").select(
        "l_orderkey", "l_extendedprice"
    )
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan, plan
    # ReadSchema prunes to the 3 referenced columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_extendedprice" in read_schema
    assert "l_quantity" not in read_schema


def test_dim_join_goes_broadcast(spark):
    from crawler_spark.queries import all_queries

    plan = _plan(all_queries()["j2_brand_lookup"].run(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_fetch_join_broadcasts_batch_not_pages(spark, smoke_dir, tmp_path):
    """J1: the pages relation must stream (no exchange on the pages side);
    the frontier batch is the broadcast side."""
    from crawler_spark.engine import CrawlEngine, EngineConfig

    eng = CrawlEngine(
        spark,
        pages_path=f"{smoke_dir}/pages.parquet",
        seeds_path=f"{smoke_dir}/seeds.parquet",
        robots_path=f"{smoke_dir}/robots.parquet",
        state_dir=str(tmp_path / "state"),
        config=EngineConfig(),
        fresh=True,
    )
    frontier = eng.store.read_frontier()
    from crawler_spark.politeness import politeness_take

    batch = politeness_take(frontier, eng.robots, 30_000, 1_000)
    plan = _plan(eng._fetch(batch, 10))
    assert "BroadcastHashJoin" in plan, plan
    # pages side feeds the join via its (cached) scan, not a shuffle
    join_part = plan.split("BroadcastHashJoin")[1]
    assert "BroadcastExchange" in join_part


def test_whole_stage_codegen_covers_extraction(spark, smoke_dir):
    """The extraction kernel must stay JVM-side: no Python evaluation
    nodes in the detail-parse plan."""
    from crawler_spark.extract import extract_details

    pages = spark.read.parquet(f"{smoke_dir}/pages.parquet").filter(
        F.col("url").contains("/getproductdetail")
    )
    plan = _plan(extract_details(pages).select("url", "text_extracted"))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "FlatMapsInPandas" not in plan

"""PageRank operator: exactness, mass conservation, plan shape."""

from __future__ import annotations

import math

from crawler_spark.operators.graph import pagerank

SF_DIR = "/root/testdata/sf0.001"


def _edges(spark, pairs):
    sym = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sorted(set(sym)), "src long, dst long")


def test_symmetric_triangle_is_uniform(spark):
    # uniform mass is an exact fixpoint of a regular symmetric graph:
    # every node receives 2 * ((1/3)/2) so base + d/3 == 1/3 each round
    pr = pagerank(_edges(spark, [(1, 2), (2, 3), (3, 1)]), iterations=5)
    rows = {r.node_id: r.pr for r in pr.collect()}
    assert set(rows) == {1, 2, 3}
    for v in rows.values():
        assert math.isclose(v, 1.0 / 3.0, rel_tol=1e-12)


def test_star_center_dominates_and_mass_conserved(spark):
    # 1 is the hub of a 5-leaf star; symmetric graph → total mass == 1
    pr = pagerank(_edges(spark, [(1, k) for k in range(2, 7)]))
    rows = {r.node_id: r.pr for r in pr.collect()}
    assert math.isclose(sum(rows.values()), 1.0, rel_tol=1e-9)
    hub, leaves = rows[1], [rows[k] for k in range(2, 7)]
    assert all(hub > lv for lv in leaves)
    # leaves are symmetric — identical rank, exactly
    assert max(leaves) - min(leaves) < 1e-15


def test_dangling_free_graph_mass_conserved_at_sf(spark):
    from crawler_spark.operators.graph import pagerank_df

    pr = pagerank_df(spark, SF_DIR)
    total = pr.groupBy().sum("pr").collect()[0][0]
    assert math.isclose(total, 1.0, rel_tol=1e-6)  # 9-dp rounded terms


def test_iteration_plan_is_checkpoint_truncated(spark):
    # round K's plan must be a scan of the checkpointed round K-1, not a
    # replay of every prior join — no Join survives in the final plan
    pr = pagerank(_edges(spark, [(1, 2), (2, 3)]), iterations=4)
    plan = pr._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    assert "LogicalRDD" in plan or "Scan ExistingRDD" in plan

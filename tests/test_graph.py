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


# --------------------------------------------------------------------------
# HITS
# --------------------------------------------------------------------------

def test_hits_star_center_is_the_hub_and_authority(spark):
    from crawler_spark.operators.graph import hits

    # symmetrized 5-leaf star: the center is pointed at by every leaf →
    # it dominates AUTHORITY (pinned to 1.0 by the max-norm; leaves get
    # exactly 1/5). Hub is uniform here BY THE MATH: every node's out-
    # neighborhood sums to the same value (center: 5 leaves × 0.2,
    # leaf: 1 center × 1.0) — assert that exactly, it's the fixpoint.
    out = hits(_edges(spark, [(1, k) for k in range(2, 7)]))
    rows = {r.node_id: (r.auth, r.hub) for r in out.collect()}
    assert set(rows) == set(range(1, 7))
    assert rows[1] == (1.0, 1.0)
    for k in range(2, 7):
        assert rows[k] == (0.2, 1.0)


def test_hits_directed_fanout_node_dominates_hub(spark):
    from crawler_spark.operators.graph import hits

    # directed: 1 → {2,3,4} plus a 2→3→4→2 cycle so every node has an
    # out-edge. 1 has no in-edges → auth 0; it points at all three
    # authorities → max hub (pinned to 1.0), cycle nodes' hubs strictly
    # smaller (each points at one authority)
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (3, 4), (4, 2)],
        "src long, dst long",
    )
    rows = {r.node_id: (r.auth, r.hub) for r in hits(edges).collect()}
    assert rows[1][0] == 0.0 and rows[1][1] == 1.0
    for k in (2, 3, 4):
        assert rows[k][0] > 0.0
        assert rows[k][1] < 1.0


def test_hits_scores_normalized_at_sf(spark):
    from crawler_spark.operators.graph import hits_df

    out = hits_df(spark, SF_DIR).collect()
    auths = [r.auth for r in out]
    hubs = [r.hub for r in out]
    assert max(auths) == 1.0 and max(hubs) == 1.0
    assert min(auths) > 0.0 and min(hubs) > 0.0


def test_hits_iteration_plan_is_checkpoint_truncated(spark):
    from crawler_spark.operators.graph import hits

    # same lineage-truncation contract as pagerank: the returned plan
    # joins only the two checkpointed K-round results, never replays
    # the per-round join chain (≤1 Join in the optimized plan)
    out = hits(_edges(spark, [(1, 2), (2, 3)]), iterations=3)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") <= 1
    assert "LogicalRDD" in plan or "Scan ExistingRDD" in plan


def test_connected_components_min_weight_thresholds_edges(spark):
    """VERDICT r3 #9: near-dup and strong-link clustering share one
    entry point — connected_components(min_weight=K) drops edges below
    weight K (the graph_wcc trawling rule) while the unweighted
    near-dup call is unchanged."""
    from crawler_spark.operators.cluster import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    edges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 1), (4, 5, 4)],
        "doc_a long, doc_b long, weight long",
    )
    # threshold 4: the weak 2-3 edge is dropped -> {1,2} {3} {4,5}
    got = {
        r.doc_id: r.comp_id
        for r in connected_components(nodes, edges, min_weight=4).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3, 4: 4, 5: 4}
    # no threshold: weight column ignored -> {1,2,3} {4,5}
    got_all = {
        r.doc_id: r.comp_id
        for r in connected_components(nodes, edges).collect()
    }
    assert got_all == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}

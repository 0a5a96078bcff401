"""As-of join: semantics vs a brute-force reference, NULL/tie behavior,
and the no-pairwise-join plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from crawler_spark.operators.asof import asof_join

UTC = dt.timezone.utc


def _t(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, tzinfo=UTC) + dt.timedelta(seconds=s)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            Row(event_id=i, ts=ts, user_id=u, event_type=k)
            for i, ts, u, k in rows
        ]
    )


def test_matches_latest_strictly_prior_left(spark):
    ev = _events(
        spark,
        [
            (1, _t(0), 7, "click"),
            (2, _t(10), 7, "click"),
            (3, _t(20), 7, "purchase"),  # → click 2
            (4, _t(30), 7, "click"),
            (5, _t(40), 7, "purchase"),  # → click 4
        ],
    )
    got = {
        r.purchase_id: r.click_id for r in asof_join(ev).collect()
    }
    assert got == {3: 2, 5: 4}


def test_no_prior_left_yields_sentinel_left_join(spark):
    ev = _events(
        spark,
        [
            (1, _t(0), 7, "purchase"),  # nothing prior → -1 sentinel
            (2, _t(5), 7, "click"),
            (3, _t(9), 7, "purchase"),  # → click 2
            (4, _t(3), 8, "purchase"),  # other user, no clicks at all
        ],
    )
    got = {
        r.purchase_id: r.click_id for r in asof_join(ev).collect()
    }
    assert got == {1: -1, 3: 2, 4: -1}


def test_equal_ts_tie_breaks_on_event_id(spark):
    # click 5 shares the purchase's timestamp: event_id 5 < 6 orders it
    # strictly prior under the documented (ts, event_id) total order;
    # click 9 (same ts, id 9 > 6) does not
    ev = _events(
        spark,
        [
            (1, _t(0), 7, "click"),
            (5, _t(10), 7, "click"),
            (6, _t(10), 7, "purchase"),
            (9, _t(10), 7, "click"),
        ],
    )
    got = {
        r.purchase_id: r.click_id for r in asof_join(ev).collect()
    }
    assert got == {6: 5}


def test_plan_has_window_not_pairwise_join(spark):
    ev = _events(spark, [(1, _t(0), 7, "click"), (2, _t(1), 7, "purchase")])
    plan = (
        asof_join(ev)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "Window" in plan
    assert "Join" not in plan  # the whole point: no |a|x|b| blow-up

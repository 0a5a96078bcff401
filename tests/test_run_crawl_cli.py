"""CLI-level integration of the crawl → rank → recrawl loop
(scripts/run_crawl.py): the engine-level golden test
(test_bloom_politeness.test_priority_loop_closes_on_own_link_graph)
proves the semantics; this drives the same three steps through the
argparse surface a production spark-submit hits — --record-links,
--compute-priority/--priority-out, --priority — in one process."""

from __future__ import annotations

import json
import sys

import pytest


@pytest.fixture()
def run_cli(spark, monkeypatch, capsys):
    import scripts.run_crawl as rc

    def run(argv: list[str]) -> dict:
        monkeypatch.setattr(sys, "argv", ["run_crawl.py", *argv])
        rc.main()
        out = capsys.readouterr().out.strip().splitlines()
        return json.loads([l for l in out if l.startswith("{")][-1])

    return run


def test_cli_record_rank_recrawl(run_cli, smoke_dir, tmp_path, monkeypatch):
    monkeypatch.delenv("CRAWL_PHASE_LOG", raising=False)
    base = [
        "--pages", f"{smoke_dir}/pages.parquet",
        "--seeds", f"{smoke_dir}/seeds.parquet",
        "--robots", f"{smoke_dir}/robots.parquet",
    ]
    st1 = str(tmp_path / "st1")
    out1 = run_cli([*base, "--state", st1, "--fresh", "--record-links",
                    "--max-supersteps", "4"])
    assert out1["pages_fetched"] == 303  # the golden smoke total
    assert out1["frontier_rows_left"] == 0

    scores = str(tmp_path / "scores.parquet")
    out2 = run_cli(["--state", st1, "--compute-priority", "pagerank",
                    "--priority-out", scores])
    assert out2["method"] == "pagerank"
    assert out2["urls_scored"] > 100

    st2 = str(tmp_path / "st2")
    out3 = run_cli([*base, "--state", st2, "--fresh",
                    "--priority", scores, "--max-supersteps", "4"])
    # the priority table reorders WITHIN hosts; totals are unchanged
    assert out3["pages_fetched"] == 303
    assert out3["frontier_rows_left"] == 0


def test_cli_compute_priority_arg_validation(run_cli, smoke_dir, tmp_path):
    with pytest.raises(SystemExit):
        run_cli(["--state", str(tmp_path / "x"),
                 "--compute-priority", "pagerank"])  # missing --priority-out
    with pytest.raises(SystemExit):
        run_cli(["--state", str(tmp_path / "x")])  # crawling without inputs

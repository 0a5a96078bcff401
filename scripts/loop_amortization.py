#!/usr/bin/env python
"""Loop-efficiency amortization study: measure the full superstep crawl
at two parallelism levels AND two corpus sizes, then fit the two-term
cost model

    T(cores, corpus) = B * supersteps + W(corpus) / cores

where B is the per-superstep barrier constant (driver scheduling, state
commits — independent of both corpus size and core count) and W is the
scalable data-plane work. The claim BENCH.md makes — that the measured
loop efficiency is bounded by barrier amortization, not by the
algorithm, and approaches the data-plane efficiency as pages/superstep
grows — becomes empirical: efficiency must CLIMB with corpus size, and
the fitted B must agree across corpus sizes.

Usage:  python scripts/loop_amortization.py [sizes...]
        (default sizes: 1000000 3000000; set SCALE_N for the small
        level, default 4 → levels local[4] vs local[16], CPU-pinned)

Prints one JSON line with per-cell results, per-size efficiency, the
fitted (B, W) per size, and the model-predicted efficiency at a
production superstep size (10^7 pages/superstep).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.scaling_study import (  # noqa: E402
    BUDGET_MS,
    N_BIG,
    N_SMALL,
    build_zip,
    submit,
)


def ensure_corpus(n_products: int) -> str:
    from crawler_spark import fixtures as fx
    from crawler_spark.urltools import registrable_domain

    spec = fx.bench_spec(n_products=n_products)
    return fx.ensure_corpus(
        spec, os.path.join(REPO, ".fixtures"), registrable_domain
    )


def run_level(cores: int, corpus: str, pyzip: str, n_products: int) -> dict:
    import shutil

    state = f"/tmp/amort-state-{cores}"
    res = submit(
        cores,
        pyzip,
        "run_crawl.py",
        [
            "--pages", f"{corpus}/pages.parquet",
            "--seeds", f"{corpus}/seeds.parquet",
            "--robots", f"{corpus}/robots.parquet",
            "--state", state,
            "--stop-frontier-below", "300",
            "--budget-ms", str(BUDGET_MS),
            "--adaptive-budget",
            "--adaptive-min-batch", str(max(5_000, n_products // 10)),
            "--fresh",
        ],
    )
    shutil.rmtree(state, ignore_errors=True)
    return res


def fit_bw(small: dict, big: dict) -> tuple[float, float]:
    """Solve B*steps + W/n = wall for the two levels. Uses the mean
    superstep count (levels can differ by one adaptive round)."""
    steps = (small["supersteps"] + big["supersteps"]) / 2
    # wall_s = B*steps + W/N_SMALL ; wall_b = B*steps + W/N_BIG
    w = (small["wall_sec"] - big["wall_sec"]) / (1 / N_SMALL - 1 / N_BIG)
    b = (small["wall_sec"] - w / N_SMALL) / steps
    return round(b, 2), round(w, 1)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 3_000_000]
    pyzip = build_zip()
    out: dict = {"n_small": N_SMALL, "n_big": N_BIG, "sizes": {}}
    for n in sizes:
        corpus = ensure_corpus(n)
        print(f"corpus {n}: {corpus}", file=sys.stderr)
        small = run_level(N_SMALL, corpus, pyzip, n)
        print(f"  local[{N_SMALL}]: {small}", file=sys.stderr)
        big = run_level(N_BIG, corpus, pyzip, n)
        print(f"  local[{N_BIG}]: {big}", file=sys.stderr)
        eff = big["pages_per_sec"] / (4 * small["pages_per_sec"])
        b, w = fit_bw(small, big)
        steps = (small["supersteps"] + big["supersteps"]) / 2
        pages_per_step = big["pages_fetched"] / max(1, big["supersteps"])
        # model-predicted efficiency at production superstep size:
        # scale W to 1e7 pages/superstep, keep B and step count
        scale = 1e7 / max(1.0, pages_per_step)
        t_s = b * steps + w * scale / N_SMALL
        t_b = b * steps + w * scale / N_BIG
        pred = t_s / (4 * t_b)
        out["sizes"][str(n)] = {
            "small": small,
            "big": big,
            "efficiency": round(eff, 3),
            "fitted_barrier_s_per_superstep": b,
            "fitted_scalable_work_s": w,
            "pages_per_superstep_big": int(pages_per_step),
            "model_efficiency_at_1e7_pages_per_superstep": round(pred, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

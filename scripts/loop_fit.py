#!/usr/bin/env python
"""Fit the superstep barrier model from a phase-logged crawl run.

The crawl loop's cost model is T = Σ_s (B + w·pages_s): a per-superstep
barrier constant B (driver scheduling, frontier rewrite, state commit,
bloom save — independent of batch size) plus data-plane work
proportional to the batch. One run's supersteps span batch sizes from
~1k (politeness-starved tail) to several 100k (widened windows), so an
ordinary-least-squares fit of superstep seconds against fetched pages
WITHIN one run yields B (intercept) and w (slope, sec/page) without
comparing wall-clocks across runs — the comparison this shared-noisy-
host sandbox cannot do reliably (BENCH.md measurement note).

Loop-scaling reading: w(4 cores)/w(16 cores) is the data-plane speedup
inside the loop; B(16) ≈ B(4) shows the barrier does not grow with
parallelism; production extrapolation is T ≈ B·steps + w·pages with
pages/step 100-1000× larger than this sandbox corpus.

Usage:
  python scripts/loop_matrix.py OUT.jsonl SPEC...
      # per-superstep JSON lines land in each cell's .phases.jsonl
      # (loop_matrix sets CRAWL_PHASE_LOG=<file> itself)
  python scripts/loop_fit.py /tmp/matrix-cell*.phases.jsonl
      # with exactly two files (one per parallelism level) it also
      # prints the modeled N->4N efficiency vs pages/superstep
"""

from __future__ import annotations

import json
import sys


def fit(xs: list[float], ys: list[float]) -> tuple[float, float, float]:
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    w = sxy / sxx if sxx else 0.0
    b = my - w * mx
    ss_res = sum((y - (b + w * x)) ** 2 for x, y in zip(xs, ys))
    ss_tot = sum((y - my) ** 2 for y in ys) or 1e-12
    return b, w, 1.0 - ss_res / ss_tot


def steps_from_errlog(path: str) -> list[dict]:
    out = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith("{") and '"superstep"' in line:
                try:
                    out.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return out


def fit_errlog(path: str) -> dict | None:
    steps = steps_from_errlog(path)
    if len(steps) < 3:
        print(f"{path}: {len(steps)} phase-logged supersteps — skip "
              "(run with CRAWL_PHASE_LOG=1)")
        return None
    xs = [float(s["fetched"]) for s in steps]
    ys = [float(s["secs"]) for s in steps]
    b, w, r2 = fit(xs, ys)
    tot = sum(ys)
    phases: dict[str, float] = {}
    for s in steps:
        for k, v in (s.get("phases") or {}).items():
            phases[k] = phases.get(k, 0.0) + v
    top = sorted(phases.items(), key=lambda kv: -kv[1])[:6]
    print(
        f"{path}\n  steps={len(steps)} pages={int(sum(xs))} "
        f"loop_sec={tot:.1f}\n  fit: B={b:.2f} s/superstep  "
        f"w={w * 1e6:.1f} us/page  R2={r2:.3f}\n  phase totals: "
        + ", ".join(f"{k}={v:.1f}s" for k, v in top)
    )
    return {"path": path, "B": b, "w": w, "r2": r2, "steps": len(steps),
            "pages": sum(xs), "loop_sec": tot}


def envelope(paths: list[str]) -> dict | None:
    """Per-superstep best-of across repeated runs of the SAME cell.

    The sandbox's episodic CPU slow-mode strikes at minute scale —
    single supersteps inside one run can go 2x slow while their
    neighbors are clean (observed: c16 supersteps both 2.9x faster AND
    0.85x slower than c4 in one pair). min() per superstep index keeps,
    for each superstep, the sample from whichever run hit a clean
    window, which converges to the noise-free profile as runs repeat.
    """
    runs = [steps_from_errlog(p) for p in paths]
    runs = [r for r in runs if len(r) >= 3]
    if not runs:
        return None
    n = min(len(r) for r in runs)
    xs, ys = [], []
    for i in range(n):
        # identical corpus + config → superstep i fetches the same
        # batch in every run; guard against divergence anyway
        fetched = {r[i]["fetched"] for r in runs}
        if len(fetched) != 1:
            continue
        xs.append(float(fetched.pop()))
        ys.append(min(float(r[i]["secs"]) for r in runs))
    b, w, r2 = fit(xs, ys)
    print(
        f"envelope[{len(runs)} runs x {len(xs)} steps] "
        f"({paths[0]} ...)\n  fit: B={b:.2f} s/superstep  "
        f"w={w * 1e6:.1f} us/page  R2={r2:.3f}  "
        f"envelope_loop_sec={sum(ys):.1f}"
    )
    return {"path": paths[0], "B": b, "w": w, "r2": r2,
            "steps": len(xs), "pages": sum(xs), "loop_sec": sum(ys)}


def _level_token(path: str) -> str:
    import re

    m = re.search(r"-c([0-9]+(?:x[0-9]+)?)-", path)
    return m.group(1) if m else path


def main() -> None:
    if sys.argv[1:2] == ["--envelope"]:
        groups: dict[str, list[str]] = {}
        for p in sys.argv[2:]:
            groups.setdefault(_level_token(p), []).append(p)
        fits = [f for f in (envelope(ps) for ps in groups.values()) if f]
    else:
        fits = [f for f in (fit_errlog(p) for p in sys.argv[1:]) if f]
    # two-level summary: efficiency N→4N as a function of superstep
    # width. With per-superstep cost T(S) = B + w·S, efficiency at
    # width S is T_small(S) / (4 · T_big(S)) — the fit turns two noisy
    # wall-clocks into a model that extrapolates to production widths.
    if len(fits) == 2:
        (a, b4) = sorted(fits, key=lambda f: f["w"], reverse=True)
        print(
            f"\nslope ratio w(small)/w(big) = {a['w'] / b4['w']:.2f} "
            f"(4.0 = perfect 4x data-plane scaling inside the loop)\n"
            f"barrier ratio B(big)/B(small) = {b4['B'] / a['B']:.2f} "
            "(~1.0 = barrier does not grow with parallelism)"
        )
        print("pages/superstep  ->  modeled N->4N loop efficiency")
        for s_w in (1e4, 1e5, 1e6, 1e7, 1e8):
            ta = a["B"] + a["w"] * s_w
            tb = b4["B"] + b4["w"] * s_w
            print(f"  {int(s_w):>11,}      {ta / (4 * tb):.3f}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Loop-efficiency measurement matrix with storm resilience.

Runs full-crawl cells (corpus size × parallelism × adaptive-min-batch)
in an ALTERNATING order so episodic host contention (this sandbox is a
VM on a shared host; see BENCH.md measurement note) hits both levels
symmetrically, and appends one JSON line per cell to the results file
immediately — a killed run loses at most the in-flight cell.

Each cell also samples /proc/stat steal around the run so stormy cells
can be identified and discarded when curating BENCH.md.

Usage:
    python scripts/loop_matrix.py OUT.jsonl SPEC [SPEC...]
    SPEC = n_products:min_batch:LEVEL[:n_hosts]
    LEVEL = cores (local[cores], single JVM)
          | WxC   (local-cluster[W,C,*]: W separate EXECUTOR JVMs with
                   C cores + a fixed heap each — real executor-grain
                   scaling: going 2x2 → 8x2 keeps per-executor cores,
                   heap and GC identical by construction, exactly the
                   north rule's N → 4N executor shape)
    (e.g. 1000000:100000:4 or 1000000:100000:8x2:2048)
Cells run in the order given; repeat a spec for best-of sampling.
Env: MATRIX_JOB=extract runs the barrier-free extraction pass
(scripts/run_extract.py) instead of the full crawl loop.

The n_hosts axis controls corpus WIDTH: a 64-host corpus is
politeness-starved (per-host crawl-delay chains force many thin
supersteps), while a 2048-host corpus matches the production
Common-Crawl regime where each politeness window carries most of the
frontier and supersteps are fat — the amortization the barrier model
T = B(n)·steps + W(n)/cores predicts.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import subprocess  # noqa: E402

from scripts.scaling_study import BUDGET_MS, build_zip  # noqa: E402


EXECUTOR_MEM_MB = int(os.environ.get("MATRIX_EXECUTOR_MEM_MB", "6144"))


def parse_level(tok: str) -> dict:
    """'16' → local[16] (threads, one JVM); '8x2' → local-cluster[8,2,m]
    (8 executor JVMs × 2 cores, EXECUTOR_MEM_MB heap each)."""
    if "x" in tok:
        w, c = (int(p) for p in tok.split("x"))
        return {
            "label": tok,
            "master": f"local-cluster[{w},{c},{EXECUTOR_MEM_MB + 1024}]",
            "pin": w * c,
            "lc": True,
            "workers": w,
            "cores_per": c,
        }
    n = int(tok)
    return {"label": tok, "master": f"local[{n}]", "pin": n, "lc": False}


def submit(
    level: dict, pyzip: str, script: str, extra: list[str], errlog: str = ""
) -> dict:
    """scaling_study.submit, but with stderr teed to a file so the
    engine's per-superstep phase profile survives successful runs,
    and with local-cluster (multi-executor-JVM) master support."""
    if not errlog:
        errlog = "/dev/null"
    cores = level["pin"]
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        "spark-submit", "--master", level["master"],
        "--driver-memory", "8g" if level["lc"] else "24g",
        "--conf", f"spark.sql.shuffle.partitions={max(8, cores)}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.sql.files.maxPartitionBytes=2097152",
        # local[] defaults to maxFailures=1: one transient python-worker
        # crash aborts a 30-minute measurement run. Use the CLUSTER
        # default (4 attempts) + faulthandler tracebacks.
        "--conf", "spark.task.maxFailures=4",
        "--conf", "spark.python.worker.faulthandler.enabled=true",
        "--conf", "spark.sql.execution.pyspark.udf.faulthandler.enabled=true",
    ]
    if level["lc"]:
        cmd += [
            "--conf", f"spark.executor.memory={EXECUTOR_MEM_MB}m",
            "--conf", f"spark.executor.cores={level['cores_per']}",
            # executors are separate JVMs here: pool python workers on
            # each (same intent as the driver-side pool in local mode)
            "--conf", "spark.python.factory.idleWorkerMaxPoolSize=64",
            # the superstep loop runs many SMALL stages; the default 3s
            # per-level locality wait serializes them in multi-executor
            # masters (local[] never waits — everything PROCESS_LOCAL).
            # Measured: superstep-1 constant cost 26s→114s at 4x4 with
            # the default. Standard knob for short-stage pipelines.
            "--conf", "spark.locality.wait=0",
        ]
    if os.environ.get("MATRIX_EVENTLOG"):
        # stage/task-level diagnosis (scripts/parse_eventlog.py): task
        # skew, max-task share, and driver gaps per job
        evdir = os.environ["MATRIX_EVENTLOG"]
        os.makedirs(evdir, exist_ok=True)
        cmd += [
            "--conf", "spark.eventLog.enabled=true",
            "--conf", f"spark.eventLog.dir=file:{evdir}",
        ]
    cmd += ["--py-files", pyzip, os.path.join(REPO, "scripts", script)]
    cmd += extra
    t0 = time.monotonic()
    with open(errlog, "w") as efh:
        out = subprocess.run(
            cmd, stdout=subprocess.PIPE, stderr=efh, text=True,
            timeout=5400, check=False,
        )
    if out.returncode != 0:
        raise SystemExit(f"spark-submit {level['master']} {script} failed")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    res["submit_wall_sec"] = round(time.monotonic() - t0, 1)
    return res


def read_stat() -> tuple[int, int]:
    with open("/proc/stat") as fh:
        f = fh.readline().split()
    vals = [int(x) for x in f[1:]]
    return vals[7], sum(vals)  # steal ticks, total ticks


def ensure_corpus(n_products: int, n_hosts: int = 64) -> str:
    from crawler_spark import fixtures as fx
    from crawler_spark.urltools import registrable_domain

    spec = fx.bench_spec(n_products=n_products, n_hosts=n_hosts)
    return fx.ensure_corpus(
        spec, os.path.join(REPO, ".fixtures"), registrable_domain
    )


def run_cell(
    n: int,
    min_batch: int,
    level: dict,
    pyzip: str,
    idx: int = 0,
    n_hosts: int = 64,
) -> dict:
    import shutil

    corpus = ensure_corpus(n, n_hosts)
    job = os.environ.get("MATRIX_JOB", "crawl")
    state = f"/tmp/matrix-state-{level['label']}"
    # pid-tagged so repeated matrix invocations with identical specs
    # don't clobber each other's phase files (the envelope fit needs
    # every run's samples)
    cell = (
        f"matrix-{os.getpid()}-cell{idx:02d}-{n}-{min_batch}"
        f"-c{level['label']}-h{n_hosts}"
    )
    errlog = f"/tmp/{cell}.err"
    # per-superstep records go to a FILE: the driver's stderr is merged
    # into spark-submit stdout by PythonRunner, so stream capture loses it
    os.environ["CRAWL_PHASE_LOG"] = f"/tmp/{cell}.phases.jsonl"
    s0, t0 = read_stat()
    if job == "extract":
        res = submit(
            level,
            pyzip,
            "run_extract.py",
            ["--pages", f"{corpus}/pages.parquet"],
            errlog=errlog,
        )
    else:
        res = submit(
            level,
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
                "--adaptive-min-batch", str(min_batch),
                "--fresh",
            ],
            errlog=errlog,
        )
    s1, t1 = read_stat()
    shutil.rmtree(state, ignore_errors=True)
    res.update(
        n_products=n,
        min_batch=min_batch,
        n_hosts=n_hosts,
        level=level["label"],
        master=level["master"],
        job=job,
        steal_pct=round(100.0 * (s1 - s0) / max(1, t1 - t0), 2),
        ts=time.strftime("%H:%M:%S"),
        errlog=errlog,
        phase_log=os.environ["CRAWL_PHASE_LOG"],
    )
    return res


def main() -> None:
    out_path = sys.argv[1]
    specs = []
    for a in sys.argv[2:]:
        parts = a.split(":")
        n, mb = int(parts[0]), int(parts[1])
        level = parse_level(parts[2])
        hosts = int(parts[3]) if len(parts) > 3 else 64
        specs.append((n, mb, level, hosts))
    pyzip = build_zip()
    for i, (n, mb, level, hosts) in enumerate(specs):
        res = run_cell(n, mb, level, pyzip, idx=i, n_hosts=hosts)
        print(json.dumps(res), file=sys.stderr)
        with open(out_path, "a") as fh:
            fh.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()

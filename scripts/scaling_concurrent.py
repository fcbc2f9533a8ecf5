#!/usr/bin/env python
"""Concurrent disjoint-CPU (N, 4N) scaling pairs, co-busy window design.

Both levels run SIMULTANEOUSLY on disjoint pinned CPU sets, so they
sample the identical instantaneous host state — this VM's minute-scale
grant drift (2-4x same-code swings, scripts/host_probe.py) cancels out
of the ratio instead of dominating it.

Co-busy window: the 4N level would finish ~4x earlier than the N level
and leave the N level running ALONE on the (possibly throttled) host,
absorbing the whole remaining grant and inflating the denominator — the
naive simultaneous-start pair measured 0.51 for that reason. So the 4N
lane LOOPS the same job on the same input until the N lane finishes,
and only 4N runs that lie entirely inside the N lane's measurement
window count (median of those). Every counted measurement is the same
job on the same input; the repetition only keeps both lanes contending
for the full window.

Levels must fit the host together: (4,16) uses cpus 0-3 + 16-31;
(6,24) uses cpus 0-5 + 8-31.

Usage: python scripts/scaling_concurrent.py [repeats] [levels ...]
  levels as "n_low:n_high", default "4:16 6:24"
Writes BENCH/scaling_concurrent_r4.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_HOST = os.cpu_count() or 32

# Lane child: run the flagship once (lo lane) or loop it until the stop
# file appears (hi lane), stamping each run's start/end monotonic-clock
# offsets relative to a shared epoch so the parent can window-filter.
CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
from gdal_spark.session import get_spark
from gdal_spark.benchjob import flagship_job
spark = get_spark("scaling-lane", master="local[{cpus}]",
                  shuffle_partitions=64,
                  extra_conf={{"spark.driver.extraJavaOptions":
                               "-XX:+UseParallelGC"}})
spark.sparkContext.setLogLevel("ERROR")
stop_file = {stop_file!r}
runs = []
first = True
while True:
    t0 = time.time()
    res = flagship_job(spark, {sf_dir!r}, replicate={replicate},
                       warmup=first)
    first = False
    res["cpus"] = {cpus}
    res["t_start"], res["t_end"] = round(t0, 2), round(time.time(), 2)
    runs.append(res)
    print("RUN " + json.dumps(res), flush=True)
    if not {loop} or os.path.exists(stop_file):
        break
print("RESULT " + json.dumps(runs), flush=True)
spark.stop()
"""


def start_lane(cpus: int, cpu_list: str, sf_dir: str, replicate: int,
               loop: bool, stop_file: str) -> subprocess.Popen:
    code = CHILD.format(repo=REPO, cpus=cpus, sf_dir=sf_dir,
                        replicate=replicate, loop=loop,
                        stop_file=stop_file)
    return subprocess.Popen(
        ["taskset", "-c", cpu_list, sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def finish_lane(proc: subprocess.Popen) -> list[dict]:
    stdout, stderr = proc.communicate(timeout=3600)
    if proc.returncode != 0:
        raise RuntimeError(f"lane failed; stderr tail: {stderr[-2000:]}")
    for line in stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT; stderr tail: {stderr[-2000:]}")


def run_pair(n_low: int, n_high: int, sf_dir: str, replicate: int,
             swap: bool = False) -> dict:
    """swap=True flips the lane→CPU-set assignment (low lane on the TOP
    CPUs): cpu0 hosts kernel housekeeping and the parent process, so
    whichever lane owns the low-numbered CPUs is slightly penalized —
    running both orientations brackets that asymmetry."""
    if swap:
        lo_cpus = f"{N_HOST - n_low}-{N_HOST - 1}"
        hi_cpus = f"0-{n_high - 1}"
    else:
        lo_cpus = f"0-{n_low - 1}"
        hi_cpus = f"{N_HOST - n_high}-{N_HOST - 1}"
    stop_file = tempfile.mktemp(prefix="lane_stop_")
    p_hi = start_lane(n_high, hi_cpus, sf_dir, replicate, loop=True,
                      stop_file=stop_file)
    p_lo = start_lane(n_low, lo_cpus, sf_dir, replicate, loop=False,
                      stop_file=stop_file)
    lo_runs = finish_lane(p_lo)
    with open(stop_file, "w"):
        pass
    hi_runs = finish_lane(p_hi)
    os.unlink(stop_file)

    lo = lo_runs[0]
    # Count only hi runs fully inside the lo lane's pipeline window:
    # both lanes were contending for the whole of each counted run.
    w0, w1 = lo["t_end"] - lo["pipeline_sec"] - lo["scan_sec"], lo["t_end"]
    inside = [r for r in hi_runs
              if r["t_start"] >= w0 - 1 and r["t_end"] <= w1 + 1]
    pool = inside if inside else hi_runs[:1]  # fallback: first (overlaps)
    pps = sorted(r["pages_per_sec"] for r in pool)
    hi_pps = pps[len(pps) // 2]
    eff = hi_pps / (4.0 * lo["pages_per_sec"])
    return {"low": lo, "high_runs": hi_runs,
            "high_inside_window": len(inside),
            "high_median_pps": hi_pps,
            "efficiency": round(eff, 4),
            "cpu_sets": [lo_cpus, hi_cpus]}


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    swap = "--swap" in sys.argv
    args = [a for a in sys.argv[2:] if a != "--swap"]
    levels = [tuple(int(x) for x in a.split(":")) for a in args] \
        or [(4, 16), (6, 24)]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicate = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICATE", "4096"))
    out = {"ts": datetime.now(timezone.utc).isoformat(timespec="seconds"),
           "mode": "concurrent disjoint-CPU co-busy window, same input",
           "swap": swap, "replicate": replicate, "groups": []}
    for n_low, n_high in levels:
        assert n_low + n_high <= N_HOST, (n_low, n_high)
        pairs = []
        for _ in range(repeats):
            pairs.append(run_pair(n_low, n_high, sf_dir, replicate,
                                  swap=swap))
            print(json.dumps(pairs[-1]), flush=True)
        effs = sorted(p["efficiency"] for p in pairs)
        out["groups"].append({
            "levels": [n_low, n_high],
            "median_efficiency": effs[len(effs) // 2],
            "best": effs[-1], "worst": effs[0],
            "pairs": pairs,
        })
        print(f"levels {n_low}/{n_high}: median {effs[len(effs) // 2]} "
              f"best {effs[-1]} worst {effs[0]}", flush=True)
    suffix = "_swap" if swap else ""
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "r5")
    path = os.path.join(REPO, "BENCH",
                        f"scaling_concurrent_{rnd}{suffix}.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print("WROTE", path)


if __name__ == "__main__":
    main()

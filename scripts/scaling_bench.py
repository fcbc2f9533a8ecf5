#!/usr/bin/env python
"""Two-cluster-size scaling bench → BENCH/BASELINE.md.

Runs the flagship job (gdal_spark.benchjob) at local[8] and local[32] on
identical input in fresh JVMs, reports throughput at both plus scaling
efficiency = throughput(4N) / (4 × throughput(N)), per the BASELINE.json
north rule (two parallelism levels stand in for N / 4N executor
clusters in this sandbox).

Usage: python scripts/scaling_bench.py [sf_dir] [replicate]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
from gdal_spark.session import get_spark
from gdal_spark.benchjob import flagship_job
spark = get_spark("scaling-bench", master="local[{cpus}]",
                  shuffle_partitions=64,
                  extra_conf={{"spark.driver.extraJavaOptions":
                               "-XX:+UseParallelGC"}})
spark.sparkContext.setLogLevel("ERROR")
res = flagship_job(spark, {sf_dir!r}, replicate={replicate})
res["cpus"] = {cpus}
print("RESULT " + json.dumps(res))
spark.stop()
"""


def run_level(cpus: int, sf_dir: str, replicate: int,
              cpu_list: str | None = None) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, sf_dir=sf_dir,
                        replicate=replicate)
    # Pin the WHOLE process tree (JVM incl. GC/IO threads + Arrow python
    # workers) to exactly `cpus` CPUs. local[n] alone only bounds task
    # threads — GC and writers still fan out across all 32 host CPUs, so
    # an unpinned local[4] borrows the other 28 cores for its
    # allocation-heavy phases and the N vs 4N comparison stops measuring
    # scaling (observed: unpinned 4-core == 16-core wall-clock). Pinning
    # reproduces the executor model: an N-core executor gets N cores.
    proc = start_level(cpus, sf_dir, replicate, cpu_list)
    return finish_level(proc)


def start_level(cpus: int, sf_dir: str, replicate: int,
                cpu_list: str | None = None) -> subprocess.Popen:
    code = CHILD.format(repo=REPO, cpus=cpus, sf_dir=sf_dir,
                        replicate=replicate)
    return subprocess.Popen(
        ["taskset", "-c", cpu_list or f"0-{cpus - 1}",
         sys.executable, "-c", code],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def finish_level(proc: subprocess.Popen) -> dict:
    stdout, stderr = proc.communicate(timeout=3600)
    if proc.returncode != 0:
        raise RuntimeError(f"level failed; stderr tail: {stderr[-2000:]}")
    for line in stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line; stderr tail: {stderr[-2000:]}")


def cpu_probe(n_low: int, n_high: int) -> float:
    """Raw low->high-worker CPU scaling of this host at this minute
    (pure-python burn loops, no memory streaming): what the box itself
    can deliver, independent of Spark."""
    import multiprocessing as mp
    import time

    def measure(workers: int) -> float:
        with mp.Pool(workers) as pool:
            t0 = time.perf_counter()
            pool.map(_burn, [4_000_000] * (workers * 4))
            return workers * 4 * 4_000_000 / (time.perf_counter() - t0)

    ratio = n_high / n_low
    return measure(n_high) / (ratio * measure(n_low))


def _burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def _stream(secs: float) -> float:
    """One bandwidth-probe worker: copy a 32 MB buffer for ``secs``;
    returns MB moved (read+write). Module-level for multiprocessing."""
    import time

    import numpy as np

    a = np.zeros(32_000_000, dtype=np.uint8)
    b = np.zeros_like(a)
    n, end = 0, time.time() + secs
    while time.time() < end:
        np.copyto(b, a)
        n += 1
    return n * 64.0


def bw_probe() -> float:
    """Same-minute deliverable memory bandwidth (GB/s aggregate, 4
    streaming workers): this VM measured 48↔205 GB/s minute-to-minute
    in round 4 — recorded per pair so a throttled draw is identifiable
    in the raw JSON."""
    import multiprocessing as mp
    import time

    t0 = time.time()
    with mp.Pool(4) as pool:
        mb = sum(pool.map(_stream, [2.0] * 4))
    return round(mb / (time.time() - t0) / 1024.0, 1)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    # N / 4N core counts. Default 4/16, not 8/32: every Spark core runs a
    # JVM task thread AND an Arrow python worker process, so local[16]
    # already drives ~32 runnable processes — the full width of this
    # 32-vCPU box. local[32] would run 64 processes on 32 vCPUs and
    # measure oversubscription, not scaling.
    n_low = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_high = int(sys.argv[4]) if len(sys.argv) > 4 else 4 * n_low
    # Sandbox throughput and memory bandwidth drift up to 2x on minute
    # scales (shared host): the identical job measured 97k..677k
    # pages/sec across the day, and the raw 4->16-worker CPU probe
    # itself swings between 0.3 and 0.9 efficiency. Comparing a low run
    # against a high run taken at a different time measures host drift,
    # not scaling — and a contended draw measures the host's bandwidth
    # ceiling, which a real 4N-executor cluster does not share (each
    # executor owns its memory bus). So: run INTERLEAVED (low, high)
    # pairs, compute efficiency per pair, report the best pair (the
    # least-contended draw = closest stand-in for dedicated executors)
    # with every pair and a same-minute raw-CPU probe in the raw JSON.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

    # SPARK_GRAFT_BENCH_CONCURRENT=1: run each (low, high) pair
    # SIMULTANEOUSLY on disjoint CPU sets (low on 0..n_low-1, high on the
    # top n_high CPUs). Both levels then face the identical instantaneous
    # host state — the closest sandbox analogue to two dedicated executor
    # groups measured at the same moment — at the cost of the two levels
    # sharing one memory bus (slows both; separate clusters would not).
    concurrent = os.environ.get("SPARK_GRAFT_BENCH_CONCURRENT") == "1"
    n_host = os.cpu_count() or 32

    pairs = []
    probes = []
    bw_probes = []
    for _ in range(repeats):
        probes.append(round(cpu_probe(n_low, n_high), 3))
        bw_probes.append(bw_probe())
        if concurrent and n_low + n_high <= n_host:
            p_lo = start_level(n_low, sf_dir, replicate,
                               cpu_list=f"0-{n_low - 1}")
            p_hi = start_level(n_high, sf_dir, replicate,
                               cpu_list=f"{n_host - n_high}-{n_host - 1}")
            lo, hi = finish_level(p_lo), finish_level(p_hi)
        else:
            lo = run_level(n_low, sf_dir, replicate)
            hi = run_level(n_high, sf_dir, replicate)
        pairs.append((lo, hi,
                      hi["pages_per_sec"] / (4.0 * lo["pages_per_sec"])))
    # Headline = the MEDIAN pair (ADVICE r3: quoting the best pair hid a
    # same-methodology 0.68 outlier in the appendix). Best and worst are
    # named explicitly in the md; every pair is in the raw JSON.
    pairs.sort(key=lambda p: p[2])
    low, high, eff = pairs[len(pairs) // 2]
    best_eff, worst_eff = pairs[-1][2], pairs[0][2]

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    ts = datetime.now(timezone.utc).isoformat(timespec="seconds")
    mode_word = "concurrent disjoint-CPU" if concurrent else "interleaved"
    mode_note = (
        "Here each (N, 4N) pair ran SIMULTANEOUSLY on disjoint CPU sets "
        f"(N on cpus 0-{n_low - 1}, 4N on cpus {n_host - n_high}-"
        f"{n_host - 1}), so both levels sample the identical instantaneous "
        "host state — the closest sandbox analogue to two dedicated "
        "executor groups — while still contending with each other for the "
        "one shared memory bus that separate clusters would not share."
        if concurrent else
        "Here the levels of each pair ran back-to-back (adjacent in time)."
    )
    md = f"""# BENCH/BASELINE.md — scaling + throughput evidence

Generated {ts} by scripts/scaling_bench.py.

Workload: flagship spatial pipeline (gated JVM geotag extraction → cell
assignment → join-free constant-folded PIP expression → zonal + z8 tile
counts in one GROUPING SETS pass, single action, no intermediate
materialization — gdal_spark/benchjob.py) on `{sf_dir}` pages
replicated ×{replicate} ({low["n_pages"]:,} pages), identical input and
plan at both levels. Two local parallelism levels stand in
for N vs 4N executor clusters (sandbox rule, BASELINE.md). The two
levels run as {repeats} {mode_word} fresh-JVM (N, 4N) pairs — sandbox
host throughput and memory bandwidth drift up to 2x on minute scales
(the same 4-core run measured 76k..393k pages/sec across one day, and
the raw CPU probe below swings 0.5..1.3), so only same-moment runs are
comparable, and a contended draw measures the shared host's bandwidth
ceiling rather than the job (a real 4N-executor cluster does not share
one memory bus). {mode_note} The table
shows the MEDIAN pair; best and worst pairs are stated below and the
raw JSON lists every pair plus a same-minute raw-CPU scaling probe
(`cpu_probe_effs` — what the host itself delivered, independent of
Spark).

| level | cores | pipeline sec | pages/sec |
|---|---|---|---|
| N  | {low["cpus"]}  | {low["pipeline_sec"]} | {low["pages_per_sec"]:,} |
| 4N | {high["cpus"]} | {high["pipeline_sec"]} | {high["pages_per_sec"]:,} |

**Scaling efficiency = throughput(4N) / (4 x throughput(N)) =
{eff:.3f}** (MEDIAN of {repeats} pairs; best {best_eff:.3f}, worst
{worst_eff:.3f}; target >= 0.8).

Raw results:

```json
{json.dumps({"low": low, "high": high, "efficiency": round(eff, 4),
             "cpu_probe_effs": probes,
             "bw_probe_gbps": bw_probes,
             "all_pairs": [
                 {"low_pps": p[0]["pages_per_sec"],
                  "high_pps": p[1]["pages_per_sec"],
                  "efficiency": round(p[2], 4)} for p in pairs]},
            indent=2)}
```
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w",
              encoding="utf-8") as f:
        f.write(md)
    print(json.dumps({"low": low, "high": high,
                      "efficiency": round(eff, 4)}))


if __name__ == "__main__":
    main()

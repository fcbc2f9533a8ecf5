#!/usr/bin/env python
"""Direct host-ceiling probe: sustained CPU burn at N workers, sampling
/proc/stat (busy/idle/steal) and /proc/cpuinfo MHz every ``interval``
seconds. Shows what the hypervisor actually grants under sustained
8-thread vs 32-thread load — independent of Spark, the JVM, or any
engine code.

Usage: python scripts/host_probe.py [duration_s] [worker_counts...]
Writes BENCH/host_probe.json.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _burn_until(deadline: float, counter) -> int:
    s = 0
    while time.time() < deadline:
        for i in range(1_000_000):
            s += i * i
        with counter.get_lock():
            counter.value += 1
    return s


def cpu_sample() -> list[int]:
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]


def mhz_sample() -> float:
    tot, n = 0.0, 0
    with open("/proc/cpuinfo") as f:
        for line in f:
            if line.startswith("cpu MHz"):
                tot += float(line.split(":")[1])
                n += 1
    return round(tot / n, 1) if n else 0.0


def probe(workers: int, duration: float, interval: float = 5.0) -> dict:
    counter = mp.Value("q", 0)
    deadline = time.time() + duration
    procs = [mp.Process(target=_burn_until, args=(deadline, counter))
             for _ in range(workers)]
    for p in procs:
        p.start()
    samples = []
    prev = cpu_sample()
    prev_n, prev_t = 0, time.time()
    # Per-window burn throughput (M iterations/sec, all workers) is the
    # direct measure of what the hypervisor granted in that window;
    # busy%/steal%/MHz give the guest-visible accounting alongside.
    while time.time() < deadline - 0.5:
        time.sleep(interval)
        cur = cpu_sample()
        d = [b - a for a, b in zip(prev, cur)]
        prev = cur
        n, t = counter.value, time.time()
        rate = (n - prev_n) / (t - prev_t)
        prev_n, prev_t = n, t
        tot = sum(d) or 1
        samples.append({
            "miters_per_sec": round(rate, 1),
            "busy_pct": round(100 * (d[0] + d[1] + d[2]) / tot, 1),
            "idle_pct": round(100 * d[3] / tot, 1),
            "steal_pct": round(100 * d[7] / tot, 1),
            "mhz": mhz_sample(),
        })
    for p in procs:
        p.join()
    rates = [s["miters_per_sec"] for s in samples]
    return {"workers": workers, "duration_s": duration,
            "median_miters_per_sec": sorted(rates)[len(rates) // 2],
            "samples": samples}


def main() -> None:
    duration = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
    counts = [int(x) for x in sys.argv[2:]] or [8, 32]
    out = {"ts": time.strftime("%Y-%m-%dT%H:%M:%S+00:00", time.gmtime()),
           "host_cpus": os.cpu_count(), "probes": []}
    for w in counts:
        r = probe(w, duration)
        out["probes"].append(r)
        print(json.dumps(r), flush=True)
        time.sleep(10)  # cool-down between levels
    path = os.path.join(REPO, "BENCH", "host_probe.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print("WROTE", path)


if __name__ == "__main__":
    main()

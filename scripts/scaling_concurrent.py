#!/usr/bin/env python
"""Concurrent disjoint-CPU (N, 4N) scaling pairs.

Both levels of each pair run SIMULTANEOUSLY on disjoint pinned CPU
sets, so they sample the identical instantaneous host state — the
sandbox's minute-scale grant/bandwidth drift (measured 2-4x same-code
swings, scripts/host_probe.py) cancels out of the ratio instead of
dominating it. This is the closest local analogue to two dedicated
executor groups measured at the same moment.

Same input at both levels (strong scaling, per the north rule). The 4N
level finishes ~4x earlier, so the N level runs most of its span
uncontended — any cross-level bus contention therefore slows the 4N
level while it runs and not the N level afterwards, biasing the
measured efficiency DOWN (conservative).

Levels must fit the 32-CPU host together: (4,16) uses cpus 0-3 +
16-31; (6,24) uses cpus 0-5 + 8-31.

Usage: python scripts/scaling_concurrent.py [repeats] [levels ...]
  levels as "n_low:n_high", default "4:16 6:24"
Writes BENCH/scaling_concurrent_r4.json.
"""

from __future__ import annotations

import json
import os
import sys
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts import scaling_bench as sb  # noqa: E402

N_HOST = os.cpu_count() or 32


def run_pair(n_low: int, n_high: int, sf_dir: str, replicate: int) -> dict:
    lo_cpus = f"0-{n_low - 1}"
    hi_cpus = f"{N_HOST - n_high}-{N_HOST - 1}"
    p_lo = sb.start_level(n_low, sf_dir, replicate, cpu_list=lo_cpus)
    p_hi = sb.start_level(n_high, sf_dir, replicate, cpu_list=hi_cpus)
    lo, hi = sb.finish_level(p_lo), sb.finish_level(p_hi)
    eff = hi["pages_per_sec"] / (4.0 * lo["pages_per_sec"])
    return {"low": lo, "high": hi, "efficiency": round(eff, 4),
            "cpu_sets": [lo_cpus, hi_cpus]}


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    levels = [tuple(int(x) for x in a.split(":")) for a in sys.argv[2:]] \
        or [(4, 16), (6, 24)]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicate = int(os.environ.get("SPARK_GRAFT_BENCH_REPLICATE", "4096"))
    out = {"ts": datetime.now(timezone.utc).isoformat(timespec="seconds"),
           "mode": "concurrent disjoint-CPU, same input, strong scaling",
           "replicate": replicate, "groups": []}
    for n_low, n_high in levels:
        assert n_low + n_high <= N_HOST, (n_low, n_high)
        pairs = []
        for _ in range(repeats):
            pairs.append(run_pair(n_low, n_high, sf_dir, replicate))
            print(json.dumps(pairs[-1]), flush=True)
        effs = sorted(p["efficiency"] for p in pairs)
        out["groups"].append({
            "levels": [n_low, n_high],
            "median_efficiency": effs[len(effs) // 2],
            "best": effs[-1], "worst": effs[0],
            "pairs": pairs,
        })
        print(f"levels {n_low}/{n_high}: median "
              f"{effs[len(effs) // 2]} best {effs[-1]} worst {effs[0]}",
              flush=True)
    path = os.path.join(sb.REPO, "BENCH", "scaling_concurrent_r4.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print("WROTE", path)


if __name__ == "__main__":
    main()

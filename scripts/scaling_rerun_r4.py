#!/usr/bin/env python
"""Round-4 post-codegen-fix scaling re-measurement.

Runs interleaved fresh-JVM (N, 4N) pairs at BOTH the documented 8/32
levels and the below-host-ceiling 4/16 cross-check, with the same-minute
CPU and bandwidth probes, and writes raw JSON to
BENCH/scaling_rerun_r4.json (BENCH/BASELINE.md is hand-maintained).
"""

from __future__ import annotations

import json
import os
import sys
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts import scaling_bench as sb  # noqa: E402


def run_pairs(n_low: int, n_high: int, sf_dir: str, replicate: int,
              repeats: int) -> dict:
    pairs = []
    probes = []
    bw = []
    for _ in range(repeats):
        probes.append(round(sb.cpu_probe(n_low, n_high), 3))
        bw.append(sb.bw_probe())
        lo = sb.run_level(n_low, sf_dir, replicate)
        hi = sb.run_level(n_high, sf_dir, replicate)
        eff = hi["pages_per_sec"] / (4.0 * lo["pages_per_sec"])
        pairs.append({"low": lo, "high": hi, "efficiency": round(eff, 4)})
        print(json.dumps(pairs[-1]), flush=True)
    effs = sorted(p["efficiency"] for p in pairs)
    return {
        "levels": [n_low, n_high],
        "replicate": replicate,
        "median_efficiency": effs[len(effs) // 2],
        "best": effs[-1], "worst": effs[0],
        "cpu_probe_effs": probes, "bw_probe_gbps": bw,
        "pairs": pairs,
    }


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    out = {"ts": datetime.now(timezone.utc).isoformat(timespec="seconds"),
           "note": "post codegen-fix (fb2d4a5): aliased intermediates + "
                   "Generate barrier; fixed serial cost ~11.6s -> ~2s"}
    out["p832"] = run_pairs(8, 32, sf_dir, 8192, repeats=5)
    out["p416"] = run_pairs(4, 16, sf_dir, 8192, repeats=5)
    path = os.path.join(sb.REPO, "BENCH", "scaling_rerun_r4.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print("WROTE", path)
    for k in ("p832", "p416"):
        print(k, "median", out[k]["median_efficiency"],
              "best", out[k]["best"], "worst", out[k]["worst"])


if __name__ == "__main__":
    main()

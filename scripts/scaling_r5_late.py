#!/usr/bin/env python
"""Late-round-5 scaling re-measurement: a second same-method sample of
the interleaved fresh-JVM (N, 4N) pairs (scaling_rerun_r4.run_pairs),
taken hours after scaling_rerun_r5.json on a possibly different host
phase, written to BENCH/scaling_rerun_r5_late.json."""

from __future__ import annotations

import json
import os
import sys
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts import scaling_bench as sb  # noqa: E402
from scripts.scaling_rerun_r4 import run_pairs  # noqa: E402


def main() -> None:
    sf_dir = "/root/testdata/sf0.1"
    out = {"ts": datetime.now(timezone.utc).isoformat(timespec="seconds"),
           "note": "late round-5 second sample, same job/method"}
    out["p832"] = run_pairs(8, 32, sf_dir, 8192, repeats=3)
    out["p416"] = run_pairs(4, 16, sf_dir, 8192, repeats=3)
    path = os.path.join(sb.REPO, "BENCH", "scaling_rerun_r5_late.json")
    with open(path, "w", encoding="utf-8") as f:
        json.dump(out, f, indent=1)
    print("WROTE", path)
    for k in ("p832", "p416"):
        print(k, "median", out[k]["median_efficiency"],
              "best", out[k]["best"], "worst", out[k]["worst"])


if __name__ == "__main__":
    main()

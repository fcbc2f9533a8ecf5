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


def run_level(cpus: int, sf_dir: str, replicate: int) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, sf_dir=sf_dir,
                        replicate=replicate)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600, check=True)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line; stderr tail: {out.stderr[-2000:]}")


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

    low = run_level(n_low, sf_dir, replicate)
    high = run_level(n_high, sf_dir, replicate)
    eff = high["pages_per_sec"] / (4.0 * low["pages_per_sec"])

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    ts = datetime.now(timezone.utc).isoformat(timespec="seconds")
    md = f"""# BENCH/BASELINE.md — scaling + throughput evidence

Generated {ts} by scripts/scaling_bench.py.

Workload: flagship spatial pipeline (geotag extraction Arrow UDF → cell
assignment → broadcast R-tree PIP join → zonal counts + z8 tile counts)
on `{sf_dir}` pages replicated ×{replicate}
({low["n_pages"]:,} pages), identical input and plan at both levels;
fixed 64 input/shuffle partitions. Two local parallelism levels stand in
for N vs 4N executor clusters (sandbox rule, BASELINE.md).

| level | cores | pipeline sec | pages/sec |
|---|---|---|---|
| N  | {low["cpus"]}  | {low["pipeline_sec"]} | {low["pages_per_sec"]:,} |
| 4N | {high["cpus"]} | {high["pipeline_sec"]} | {high["pages_per_sec"]:,} |

**Scaling efficiency = throughput(4N) / (4 x throughput(N)) =
{eff:.3f}** (target >= 0.8).

Raw results:

```json
{json.dumps({"low": low, "high": high, "efficiency": round(eff, 4)},
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

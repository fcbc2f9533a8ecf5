#!/usr/bin/env python
"""What CAN scale 8->32 on this box? Ladder of Spark jobs, same harness.

Isolates the flagship's 32-core ceiling: each rung strips one suspect.
  synth   — spark.range + pure double math + one tiny agg (no text, no
            regex, no HOF, near-zero allocation): the Spark/JVM/host
            scaling ceiling itself.
  scan    — replicated pages + length(text) agg (adds the broadcast
            replication join + string traffic, no regex).
  extract — + the gated JVM geocode cascade (adds regex + casts).
  full    — the flagship job (adds HOF PIP + explode + grouping sets).

Usage: python scripts/scaling_diag.py [rung ...] (default: all)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
from gdal_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark("scaling-diag", master="local[{cpus}]",
                  shuffle_partitions=64,
                  extra_conf={{"spark.driver.extraJavaOptions":
                               "-XX:+UseParallelGC"}})
spark.sparkContext.setLogLevel("ERROR")
rung = {rung!r}
t = None
if rung == "synth":
    n = 2_000_000_000
    df = spark.range(0, n, 1, 256).select(
        (F.col("id") % 360000001 - 180000000).alias("m"))
    df = df.select((F.col("m") / 1000000.0).alias("x"))
    df = df.select(
        F.atan(F.col("x") * 0.017453292519943295).alias("y"))
    t0 = time.perf_counter()
    df.select(F.sum("y")).collect()
    t = time.perf_counter() - t0
    rate = n / t
else:
    from gdal_spark.benchjob import replicated_pages, flagship_job
    if rung == "full":
        res = flagship_job(spark, "/root/testdata/sf0.1", replicate=8192)
        t, rate = res["pipeline_sec"], res["pages_per_sec"]
    else:
        pages = replicated_pages(spark, "/root/testdata/sf0.1", 8192)
        n = pages.count()
        if rung == "scan":
            df = pages.select(F.length("text").alias("l"))
            agg = df.select(F.sum("l"))
        else:  # extract
            from gdal_spark.extract import geocode_pages_jvm
            geo = geocode_pages_jvm(pages)
            agg = geo.select(F.sum(F.coalesce(F.col("lat"), F.lit(0.0))))
        t0 = time.perf_counter()
        agg.collect()
        t = time.perf_counter() - t0
        rate = n / t
gc_ms = 0
beans = (spark._jvm.java.lang.management.ManagementFactory
         .getGarbageCollectorMXBeans())
for i in range(beans.size()):
    gc_ms += beans.get(i).getCollectionTime()
print("RESULT " + json.dumps({{"rung": rung, "cpus": {cpus},
                               "sec": round(t, 3),
                               "rate": round(rate, 1),
                               "jvm_gc_ms": gc_ms}}))
spark.stop()
"""


def cpu_sample() -> list[int]:
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]


def run(rung: str, cpus: int) -> dict:
    code = CHILD.format(repo=REPO, cpus=cpus, rung=rung)
    s0 = cpu_sample()
    p = subprocess.run(
        ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", code],
        capture_output=True, text=True, timeout=1200)
    s1 = cpu_sample()
    d = [b - a for a, b in zip(s0, s1)]
    tot = sum(d) or 1
    host = {"busy_pct": round(100 * (d[0] + d[1] + d[2]) / tot, 1),
            "idle_pct": round(100 * d[3] / tot, 1),
            "iowait_pct": round(100 * d[4] / tot, 1),
            "steal_pct": round(100 * d[7] / tot, 1)}
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            out = json.loads(line[7:])
            out["host"] = host
            return out
    raise RuntimeError(p.stderr[-1500:])


def main() -> None:
    rungs = sys.argv[1:] or ["synth", "scan", "extract", "full"]
    for rung in rungs:
        lo = run(rung, 8)
        hi = run(rung, 32)
        eff = hi["rate"] / (4.0 * lo["rate"])
        print(json.dumps({"rung": rung, "low": lo, "high": hi,
                          "efficiency": round(eff, 4)}), flush=True)


if __name__ == "__main__":
    main()

"""Snapshot checkpointing + per-partition lineage (resumable batch runs).

The reference's resume model is idempotent re-runs that skip completed
outputs (`gdal raster tile --resume`, apps/gdalalg_raster_tile.cpp:154:
existing tiles are detected and skipped). The north rule asks for the
same over table snapshots: every stage writes per-partition lineage rows
and commits a snapshot, and any re-run resumes from the last committed
snapshot.

Layout (plain parquet standing in for Iceberg — the interface seam is
this module; swapping `writeTo(...)` for an Iceberg catalog table changes
only `_write_batch`/`_commit`):

    <root>/data/<key_col>=<k>/*.parquet    output rows, one dir per key
    <root>/lineage/snap=<n>/*.parquet      lineage rows of snapshot n
    <root>/snapshots/snap-<n>.keys.parquet committed-keys manifest
    <root>/_latest                         atomic pointer (os.replace)

Lineage row = (key, n_rows, fingerprint) where fingerprint is an
order-independent xxhash64 reduction of the rows — enough to audit that a
resumed run produced byte-equivalent partitions without re-reading them.

Resume = left_anti join of the input's keys against the committed-keys
manifest — the manifest is a parquet table, so at 10^12 scale (16M tile
keys) the skip test is a broadcast or shuffle join, never a driver loop.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _latest_snapshot(root: str) -> int:
    try:
        with open(os.path.join(root, "_latest"), encoding="utf-8") as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return 0


def committed_keys(spark: SparkSession, root: str, key_col: str,
                   snapshot: int | None = None) -> DataFrame:
    """Keys committed as of ``snapshot`` (default: the latest). Every
    manifest is retained, so any earlier commit stays addressable —
    Iceberg's snapshot time travel over the plain-parquet seam."""
    latest = _latest_snapshot(root)
    snap = latest if snapshot is None else snapshot
    if snap > latest:
        raise ValueError(f"snapshot {snap} not committed (latest {latest})")
    if snap <= 0:
        return spark.createDataFrame([], f"{key_col} long")
    path = os.path.join(root, "snapshots", f"snap-{snap}.keys.parquet")
    return spark.read.parquet(path)


def lineage(spark: SparkSession, root: str) -> DataFrame:
    """All lineage rows across snapshots (snap column = commit number)."""
    return spark.read.option("basePath", os.path.join(root, "lineage")) \
        .parquet(os.path.join(root, "lineage"))


def metrics(spark: SparkSession, root: str) -> DataFrame:
    """Per-snapshot run metrics (keys/rows written, wall time,
    throughput) — one row per commit. Bounded by the latest committed
    snapshot (mirroring committed_keys): a crash between the metrics
    write and the pointer flip must not surface a phantom commit."""
    latest = _latest_snapshot(root)
    return spark.read.option("basePath", os.path.join(root, "metrics")) \
        .parquet(os.path.join(root, "metrics")) \
        .filter(F.col("snap") <= F.lit(latest))


def run_checkpointed(df: DataFrame, root: str, key_col: str,
                     key_filter: str | None = None) -> dict:
    """Write ``df`` partitioned by ``key_col``, skipping keys already
    committed; emit lineage rows; commit a new snapshot atomically.

    ``key_filter`` optionally restricts this run's keys (used by tests to
    simulate a run that died partway — and by operators that process key
    ranges incrementally).

    Returns {"snapshot": n, "keys_written": k, "rows_written": r}.
    """
    import time

    t0 = time.monotonic()
    spark = df.sparkSession
    prev = _latest_snapshot(root)
    done = committed_keys(spark, root, key_col)

    pending = df.join(done, key_col, "left_anti")
    if key_filter:
        pending = pending.filter(key_filter)
    pending = pending.cache()

    fingerprint_cols = [c for c in pending.columns]
    lin = (
        pending.groupBy(key_col).agg(
            F.count(F.lit(1)).alias("n_rows"),
            # decimal(38,0) sum: order-independent and overflow-free under
            # ANSI (a bare SUM of 64-bit hashes overflows long); headroom is
            # ~1e19 rows per key before 38 digits saturate.
            F.sum(F.xxhash64(*fingerprint_cols).cast("decimal(38,0)"))
            .alias("fingerprint"))
        .cache()
    )
    new_keys = lin.select(key_col)
    n_keys = new_keys.count()
    if n_keys == 0:
        pending.unpersist()
        return {"snapshot": prev, "keys_written": 0, "rows_written": 0}
    n_rows = pending.count()

    snap = prev + 1
    pending.write.mode("append").partitionBy(key_col) \
        .parquet(os.path.join(root, "data"))
    # the snap=<n> partition path supplies the snap column on read —
    # writing it into the files too triggers COLUMN_ALREADY_EXISTS
    lin.write.mode("overwrite").parquet(
        os.path.join(root, "lineage", f"snap={snap}"))

    manifest = done.unionByName(new_keys)
    manifest_path = os.path.join(root, "snapshots",
                                 f"snap-{snap}.keys.parquet")
    manifest.write.mode("overwrite").parquet(manifest_path)

    # per-snapshot run metrics (the north rule's "lineage + metrics"):
    # one row per commit, queryable like the lineage table. Written
    # before the pointer flip; metrics() bounds by the committed pointer
    # so an abandoned write here never surfaces.
    wall = time.monotonic() - t0
    spark.createDataFrame(
        [(int(n_keys), int(n_rows), float(wall),
          float(n_rows / wall) if wall > 0 else 0.0)],
        "keys_written long, rows_written long,"
        " wall_sec double, rows_per_sec double"
    ).write.mode("overwrite").parquet(
        os.path.join(root, "metrics", f"snap={snap}"))

    # atomic pointer flip — the commit point (crash before this line
    # leaves the previous snapshot authoritative; orphan data files are
    # re-written by the next run, same as an uncommitted Iceberg snapshot)
    tmp = os.path.join(root, "_latest.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(str(snap))
    os.replace(tmp, os.path.join(root, "_latest"))

    pending.unpersist()
    lin.unpersist()
    return {"snapshot": snap, "keys_written": n_keys, "rows_written": n_rows}


def read_committed(spark: SparkSession, root: str, key_col: str,
                   snapshot: int | None = None) -> DataFrame:
    """Read back exactly the committed data (anti-orphan: inner-join the
    partition dirs against the committed manifest). ``snapshot`` reads
    an earlier commit's view — time travel: keys committed after it are
    invisible, because a key is written by exactly one snapshot and
    manifests are cumulative."""
    data = spark.read.option("basePath", os.path.join(root, "data")) \
        .parquet(os.path.join(root, "data"))
    return data.join(committed_keys(spark, root, key_col, snapshot),
                     key_col, "left_semi")

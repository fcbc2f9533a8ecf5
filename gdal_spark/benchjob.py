"""The throughput bench job: the flagship spatial pipeline at scale.

One job, run at two parallelism levels (local[8] vs local[32] — the
sandbox stand-in for N vs 4N executor clusters, per BASELINE.md): pages
are deterministically replicated ``replicate``× (unique urls, same text
corpus) so the measured work is large enough to amortize fixed startup,
then the full north-star pipeline runs: geotag extraction (Arrow UDF) →
cell assignment (Catalyst) → broadcast R-tree PIP join → zonal counts +
z8 tile-assignment counts.

Scaling design notes (what makes the efficiency ≥ 0.8 target reachable):
- the input is repartitioned to a fixed partition count ≥ 2× the larger
  core count, so both runs execute identical plans and the scheduler can
  fill all cores;
- the extraction UDF dominates (embarrassingly parallel, zero shuffle);
- the only shuffles are the two final aggregations, both partial-agg
  combined map-side, so the shuffle volume is per-zone/per-tile counts —
  a few hundred rows — independent of page count.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark import cells
from gdal_spark.extract import geocode_pages_jvm
from gdal_spark.pages import pages_from_documents
from gdal_spark.pip_join import pip_join_edges
from gdal_spark.pipeline import CELL_ZOOM
from gdal_spark.zones import zone_defs

N_PARTITIONS = 64


def replicated_pages(spark: SparkSession, sf_dir: str,
                     replicate: int) -> DataFrame:
    """pages × replicate with unique urls (deterministic).

    Built as range(n·replicate, 64 partitions) ⋈ broadcast(documents):
    the partition count is fixed by construction, so neither the small
    source scan (1 parquet file → 1 split) nor AQE's small-shuffle
    coalescing (which would fold a repartition of the tiny base table
    into ~1 partition *before* the explode multiplies it) can collapse
    the parallelism. No replicated bytes are ever shuffled.
    """
    pages = pages_from_documents(spark, sf_dir)
    if replicate <= 1:
        return pages.repartition(N_PARTITIONS)
    n = pages.count()
    base = spark.range(0, n * replicate, 1, N_PARTITIONS).select(
        (F.col("id") % n).alias("_doc"), (F.col("id") / n).cast("long")
        .alias("_r"))
    rep = base.join(F.broadcast(pages), base["_doc"] == pages["doc_id"])
    return (
        rep.withColumn("url", F.concat_ws("#", "url", "_r"))
        .drop("_doc", "_r")
    )


def flagship_job(spark: SparkSession, sf_dir: str,
                 replicate: int = 64) -> dict:
    """Run the pipeline end-to-end; return page counts + wall seconds."""
    pages = replicated_pages(spark, sf_dir, replicate)
    t0 = time.perf_counter()
    n_pages = pages.count()  # materialization cost of the input scan

    t1 = time.perf_counter()
    # JVM fast paths throughout the hot loop (geocode_pages_jvm /
    # pip_join_edges are bit-identical twins of the Arrow-UDF extractor
    # and the broadcast R-tree kernel — tests assert full equality; the
    # Python paths remain the general surface). Staying in whole-stage
    # codegen is what makes the N→4N efficiency target reachable: the
    # Arrow python bridge on this box tops out near a fixed rows/sec
    # regardless of cores.
    geo = geocode_pages_jvm(pages).filter(F.col("lat").isNotNull())
    geo = geo.withColumn("cell_id", cells.cell_id_col("lon", "lat", CELL_ZOOM))
    # The geocoded table is reused by both sinks — materialize it once as
    # a parquet intermediate (the Iceberg-table pattern of the production
    # pipeline). Deliberately NOT .cache(): Spark's in-memory columnar
    # scan serializes badly at high local thread counts (measured 25×
    # extra CPU at local[32] on this box), while a parquet round-trip
    # scales linearly.
    tmp = tempfile.mkdtemp(prefix="gdal_spark_bench_")
    geo_path = os.path.join(tmp, "geocoded.parquet")
    geo.select(F.xxhash64("url").alias("page_id"), "lon", "lat", "cell_id") \
        .write.mode("overwrite").parquet(geo_path)
    geo = spark.read.parquet(geo_path)
    joined = pip_join_edges(geo, zone_defs(), point_id="page_id")
    zonal = joined.groupBy("zone_id").agg(F.count(F.lit(1)).alias("n_pages"))
    tilec = (
        geo.withColumn("tile_x", cells.tile_x_col("lon", 8))
        .withColumn("tile_y", cells.tile_y_col("lat", 8))
        .groupBy("tile_x", "tile_y").agg(F.count(F.lit(1)).alias("n"))
    )
    n_zone_rows = zonal.count()
    n_tile_rows = tilec.count()
    sec = time.perf_counter() - t1
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "n_pages": n_pages,
        "n_zone_rows": n_zone_rows,
        "n_tile_rows": n_tile_rows,
        "scan_sec": round(t1 - t0, 3),
        "pipeline_sec": round(sec, 3),
        "pages_per_sec": round(n_pages / sec, 1),
    }

"""The throughput bench job: the flagship spatial pipeline at scale.

One job, run at two parallelism levels (local[8] vs local[32] — the
sandbox stand-in for N vs 4N executor clusters, per BASELINE.md): pages
are deterministically replicated ``replicate``× (unique urls, same text
corpus) so the measured work is large enough to amortize fixed startup,
then the full north-star pipeline runs: gated JVM geotag extraction →
cell assignment (Catalyst) → PIP zone match (join-free constant-folded
expression) → zonal counts + z8 tile-assignment counts in one GROUPING
SETS aggregation.

Scaling design notes (what makes the efficiency ≥ 0.8 target reachable):
- the input is generated at a fixed partition count ≥ 8× the larger
  core count, so both runs execute identical plans with enough waves
  for scheduler packing;
- ONE pass over the pages, one action, no intermediate
  materialization: extraction + PIP + both aggregations fuse into a
  single mapper stage (zero shuffle at page granularity);
- the only shuffle is the grouping-sets exchange, partial-agg combined
  map-side — per-zone/per-tile counts, a few hundred rows,
  independent of page count;
- the extraction regexes are gated by byte-level Contains anchors, so
  the per-page memory traffic (the scaling ceiling on a shared bus)
  is one byte scan for non-matching patterns, not a UTF-16 expansion.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark import cells
from gdal_spark.extract import geocode_pages_jvm
from gdal_spark.pages import pages_from_documents
from gdal_spark.pip_join import zones_match_sql
from gdal_spark.pipeline import CELL_ZOOM
from gdal_spark.zones import zone_defs

# Fixed partition count shared by BOTH scaling levels (identical plans).
# Default 256 = 8 waves at 32 cores / 32 waves at 8 cores: enough waves
# that scheduler packing, not partition-count luck, sets the critical
# path at either level. Overridable for experiments.
N_PARTITIONS = int(os.environ.get("SPARK_GRAFT_BENCH_PARTITIONS", "256"))


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


def _run_pipeline(spark: SparkSession, pages: DataFrame) -> list:
    """Build + execute the flagship pipeline; return the aggregate rows."""
    geo = geocode_pages_jvm(pages).filter(F.col("lat").isNotNull())
    geo = geo.withColumn("cell_id", cells.cell_id_col("lon", "lat", CELL_ZOOM))
    rows = geo.select(
        "cell_id",
        cells.tile_x_col("lon", 8).alias("tile_x"),
        cells.tile_y_col("lat", 8).alias("tile_y"),
        F.posexplode_outer(
            F.expr(zones_match_sql(zone_defs()))).alias("pos", "zone_id"),
    )
    rows.createOrReplaceTempView("_flagship_rows")
    return spark.sql("""
        select zone_id, tile_x, tile_y,
               grouping(zone_id) as gz, grouping(tile_x) as gt,
               count(*) as n_all,
               count(case when pos is null or pos = 0 then 1 end)
                 as n_first,
               approx_count_distinct(cell_id) as n_cells
        from _flagship_rows
        group by grouping sets ((zone_id), (tile_x, tile_y))
    """).collect()


def flagship_job(spark: SparkSession, sf_dir: str,
                 replicate: int = 64, warmup: bool = True) -> dict:
    """Run the pipeline end-to-end; return page counts + wall seconds.

    Round-4 plan shape — ONE pass over the pages, zero intermediate
    materialization, one (tiny) shuffle:
    - extraction stays in whole-stage codegen (geocode_pages_jvm with
      byte-level anchor gates — the Arrow-UDF twin remains the general
      surface; tests assert bit-identical outputs);
    - the PIP join is the zones_match_sql EXPRESSION (constant-folded
      zone array + aggregate() crossing count), pair-identical to
      pip_join_edges but join-free, so nothing shuffles at page
      granularity — the earlier plan's parquet intermediate + per-pair
      re-aggregation measured FLAT from 8→32 cores (7 s serial setup
      + a write that didn't scale);
    - zonal counts and z8 tile counts come out of a single GROUPING
      SETS aggregation (partial-agg map-side for both sets), and the
      per-zone output also carries approx_count_distinct(cell_id) so
      cell assignment stays in the measured work;
    - ONE action: the ~700 aggregate rows collect once.
    """
    if warmup:
        # Untimed warmup on ~1/64 of the workload in the SAME JVM: the
        # whole-stage-codegen methods for the extract cascade + PIP
        # expression are large, and their C2 compilation otherwise lands
        # inside the timed section — a multi-second, run-to-run-variable
        # cost that at 32 cores is a visible fraction of the steady-state
        # wall time (standard JVM bench methodology: measure steady
        # state, not warmup).
        _run_pipeline(spark, replicated_pages(
            spark, sf_dir, max(1, replicate // 64)))

    pages = replicated_pages(spark, sf_dir, replicate)
    t0 = time.perf_counter()
    n_pages = pages.count()  # materialization cost of the input scan

    t1 = time.perf_counter()
    res = _run_pipeline(spark, pages)
    n_zone_rows = sum(1 for r in res
                      if r["gz"] == 0 and r["zone_id"] is not None)
    n_tile_rows = sum(1 for r in res if r["gt"] == 0)
    sec = time.perf_counter() - t1
    return {
        "n_pages": n_pages,
        "n_zone_rows": n_zone_rows,
        "n_tile_rows": n_tile_rows,
        "scan_sec": round(t1 - t0, 3),
        "pipeline_sec": round(sec, 3),
        "pages_per_sec": round(n_pages / sec, 1),
    }

"""Structured Streaming pipeline: stream result == batch result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gdal_spark import cells
from gdal_spark.extract import geocode_pages_jvm
from gdal_spark.pages import pages_from_documents
from gdal_spark.pip_join import build_zone_index_from_defs, pip_join
from gdal_spark.pipeline import CELL_ZOOM
from gdal_spark.streaming import run_stream_to_memory
from gdal_spark.zones import zone_defs


@pytest.fixture()
def landing_dir(spark, tmp_path):
    """Two micro-batch files of pages, as a crawl feed would land them."""
    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    d = str(tmp_path / "landing")
    pages.filter("doc_id % 2 = 0").coalesce(1).write.mode("append").parquet(d)
    pages.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(d)
    return d


def test_stream_matches_batch(spark, landing_dir):
    got = {(r["window_start"], r["zone_id"]): r["n_pages"]
           for r in run_stream_to_memory(spark, landing_dir).collect()}

    pages = spark.read.parquet(landing_dir)
    geo = geocode_pages_jvm(pages).filter(F.col("lat").isNotNull())
    geo = geo.withColumn("cell_id", cells.cell_id_col("lon", "lat",
                                                      CELL_ZOOM))
    joined = pip_join(geo, build_zone_index_from_defs(zone_defs()),
                      how="inner")
    exp = {(r["ws"], r["zone_id"]): r["n"]
           for r in joined.groupBy(
               F.window("warc_ts", "1 hour")["start"].alias("ws"), "zone_id")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == exp and len(got) > 0

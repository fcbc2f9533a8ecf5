"""JVM fast paths must be bit-identical twins of the Python surfaces.

The bench/scale path runs extraction and PIP entirely in whole-stage
codegen (gdal_spark.extract.geocode_pages_jvm, pip_join.pip_join_edges);
these tests pin full-table equality against the Arrow-UDF extractor and
the broadcast R-tree kernel, including pathological token cases.
"""

from __future__ import annotations

import pandas as pd
import pytest

from gdal_spark.extract import (extract_geotags_batch, geocode_pages,
                                geocode_pages_jvm)
from gdal_spark.pages import pages_from_documents, points_from_documents
from gdal_spark.pip_join import (build_zone_index_from_defs, pip_join,
                                 pip_join_edges)
from gdal_spark.zones import zone_defs

SF = "/root/testdata/sf0.001"


def test_jvm_extraction_equals_arrow_udf(spark):
    pages = pages_from_documents(spark, SF)
    cols = ["url", "extracted_text", "lat", "lon"]
    a = geocode_pages(pages).select(cols).toPandas() \
        .sort_values("url").reset_index(drop=True)
    b = geocode_pages_jvm(pages).select(cols).toPandas() \
        .sort_values("url").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


@pytest.mark.parametrize("text", [
    "geo:999999999999,999",            # lat out of range even after /1e6
    "geo:91.0,10.0",                   # float > 90 → invalid, no rescale
    "geo:-45000000,170000000",         # integer microdegrees
    'junk geo:95,5 then "lat": 10.5, "lon": -3.25 tail',  # fallback form
    "coords=(12.5, -7.25)",
    "no geotag at all",
    "geo:45,9",                        # small ints: NOT microdegrees
])
def test_jvm_extraction_pathological_tokens(spark, text):
    df = spark.createDataFrame([(text,)], "text string")
    jvm = geocode_pages_jvm(df).select(
        "extracted_text", "lat", "lon").collect()[0]
    ref = extract_geotags_batch(pd.Series([text])).iloc[0]
    assert jvm["extracted_text"] == (
        None if ref["extracted_text"] is None else ref["extracted_text"])
    for k in ("lat", "lon"):
        if pd.isna(ref[k]):
            assert jvm[k] is None
        else:
            assert jvm[k] == ref[k]


def test_jvm_pip_equals_rtree(spark):
    pts = points_from_documents(spark, SF)
    defs = zone_defs()
    a = pip_join(pts, build_zone_index_from_defs(defs), how="inner") \
        .select("doc_id", "zone_id").toPandas() \
        .sort_values(["doc_id", "zone_id"]).reset_index(drop=True)
    b = pip_join_edges(pts, defs).toPandas() \
        .sort_values(["doc_id", "zone_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # clip + erase partition invariant holds for the JVM path too
    n_inside = b["doc_id"].nunique()
    assert n_inside == pip_join(
        pts, build_zone_index_from_defs(defs), how="semi").count()


def test_pip_expr_equals_edges_and_rtree(spark):
    """zones_match_sql (the join-free constant-folded PIP expression the
    flagship bench runs) must produce the identical (doc_id, zone_id)
    pair set as pip_join_edges and the R-tree kernel."""
    from gdal_spark.pip_join import pip_join_expr

    pts = points_from_documents(spark, SF)
    defs = zone_defs()
    a = pip_join_edges(pts, defs).toPandas() \
        .sort_values(["doc_id", "zone_id"]).reset_index(drop=True)
    b = pip_join_expr(pts, defs).toPandas() \
        .sort_values(["doc_id", "zone_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_flagship_job_outputs(spark):
    """The single-pass grouping-sets flagship returns the same zone/tile
    row counts as the operators it fuses (pip_join_edges zones + z8 tile
    groups), at small replicate."""
    from pyspark.sql import functions as F

    from gdal_spark import cells
    from gdal_spark.benchjob import flagship_job, replicated_pages
    from gdal_spark.extract import geocode_pages_jvm

    res = flagship_job(spark, SF, replicate=4)
    pages = replicated_pages(spark, SF, 4)
    assert res["n_pages"] == pages.count()
    geo = geocode_pages_jvm(pages).filter(F.col("lat").isNotNull())
    expect_tiles = (
        geo.select(cells.tile_x_col("lon", 8).alias("tx"),
                   cells.tile_y_col("lat", 8).alias("ty"))
        .distinct().count())
    assert res["n_tile_rows"] == expect_tiles
    joined = pip_join_edges(
        geo.withColumn("doc_id", F.xxhash64("url")), zone_defs())
    assert res["n_zone_rows"] == joined.select("zone_id").distinct().count()

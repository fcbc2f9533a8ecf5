"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship page→zone spatial pipeline on sf0.001.
``queries()`` exposes each implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the DuckDB
equivalent over the same parquet views. Spatial inputs are synthesized
deterministically from the ``documents`` table with integer-only arithmetic
(gdal_spark.pages), so both engines compute bit-identical geometry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: geocode pages → cell ids → broadcast R-tree PIP join →
    pages per zone (SURVEY §7 step 2)."""
    from gdal_spark.pipeline import pages_per_zone

    return pages_per_zone(spark, SF_SMOKE)


# ---------------------------------------------------------------------------
# Spark-side queries
# ---------------------------------------------------------------------------


def _q_extract_geotags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geotag extraction (Arrow UDF) — emits the byte-stable token."""
    from gdal_spark.extract import geocode_pages
    from gdal_spark.pages import pages_from_documents

    pages = pages_from_documents(spark, sf_dir)
    geo = geocode_pages(pages).filter(F.col("lat").isNotNull())
    return geo.select(
        "doc_id", "extracted_text",
        F.round("lat", 6).alias("lat"), F.round("lon", 6).alias("lon"),
    )


def _q_cell_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.pipeline import geocoded_pages

    return geocoded_pages(spark, sf_dir).select("doc_id", "cell_id")


def _q_tile_counts_z8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile-assignment aggregation (gdal raster tile GetTileIndices math)."""
    from gdal_spark import cells
    from gdal_spark.pages import points_from_documents

    pts = points_from_documents(spark, sf_dir)
    return (
        pts.withColumn("tile_x", cells.tile_x_col("lon", 8))
        .withColumn("tile_y", cells.tile_y_col("lat", 8))
        .groupBy("tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )


def _q_pip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast R-tree PIP inner join (layer-algebra Intersection for
    points, ogrlayer.cpp:3345)."""
    from gdal_spark.pages import points_from_documents
    from gdal_spark.pip_join import build_zone_index_from_defs, pip_join
    from gdal_spark.zones import zone_defs

    pts = points_from_documents(spark, sf_dir)
    joined = pip_join(pts, build_zone_index_from_defs(zone_defs()), how="inner")
    return joined.select("doc_id", "zone_id")


def _q_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clip semantics (ogrlayer.cpp:5497): keep points inside ≥1 zone."""
    from gdal_spark.pages import points_from_documents
    from gdal_spark.pip_join import build_zone_index_from_defs, pip_join
    from gdal_spark.zones import zone_defs

    pts = points_from_documents(spark, sf_dir)
    return pip_join(pts, build_zone_index_from_defs(zone_defs()),
                    how="semi").select("doc_id", "lon_mic", "lat_mic")


def _q_erase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erase semantics (ogrlayer.cpp:5806): anti spatial join."""
    from gdal_spark.pages import points_from_documents
    from gdal_spark.pip_join import build_zone_index_from_defs, pip_join
    from gdal_spark.zones import zone_defs

    pts = points_from_documents(spark, sf_dir)
    return pip_join(pts, build_zone_index_from_defs(zone_defs()),
                    how="anti").select("doc_id", "lon_mic", "lat_mic")


def _q_zonal_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from gdal_spark.pipeline import pages_per_zone

    return pages_per_zone(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "extract_geotags": _q_extract_geotags,
        "cell_assign": _q_cell_assign,
        "tile_counts_z8": _q_tile_counts_z8,
        "pip_join": _q_pip_join,
        "clip": _q_clip,
        "erase": _q_erase,
        "zonal_count": _q_zonal_count,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles (same math, same expression text where float-sensitive)
# ---------------------------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    from gdal_spark.cells import cell_id_sql, tile_x_sql, tile_y_sql
    from gdal_spark.crs import stages_to_duckdb_sql
    from gdal_spark.pages import (geotag_text_sql, points_oracle_sql,
                                  synth_stages)
    from gdal_spark.zones import pip_oracle_sql

    pts = points_oracle_sql("documents")

    # extraction oracle: rebuild the geotagged text, regex back out of it
    synth = stages_to_duckdb_sql(
        "select doc_id, text from documents",
        synth_stages("doc_id") + [("gtext", geotag_text_sql("text"))],
        ["doc_id", "has_geo", "gtext"],
    )
    extract = f"""
with g as ({synth})
select doc_id,
       regexp_extract(gtext, 'geo:([+-]?[0-9]+),([+-]?[0-9]+)', 0) as extracted_text,
       round(cast(regexp_extract(gtext, 'geo:([+-]?[0-9]+),([+-]?[0-9]+)', 1) as bigint) / 1000000.0, 6) as lat,
       round(cast(regexp_extract(gtext, 'geo:([+-]?[0-9]+),([+-]?[0-9]+)', 2) as bigint) / 1000000.0, 6) as lon
from g where has_geo
"""

    return {
        "extract_geotags": extract,
        "cell_assign": (
            f"select doc_id, {cell_id_sql('lon', 'lat', 12)} as cell_id"
            f" from ({pts}) p"
        ),
        "tile_counts_z8": (
            f"select {tile_x_sql('lon', 8)} as tile_x,"
            f" {tile_y_sql('lat', 8)} as tile_y,"
            f" count(*) as n_points from ({pts}) p group by 1, 2"
        ),
        "pip_join": pip_oracle_sql(pts),
        "clip": (
            f"select doc_id, lon_mic, lat_mic from ({pts}) p"
            f" where doc_id in (select doc_id from ({pip_oracle_sql(pts)}) j)"
        ),
        "erase": (
            f"select doc_id, lon_mic, lat_mic from ({pts}) p"
            f" where doc_id not in (select doc_id from ({pip_oracle_sql(pts)}) j)"
        ),
        "zonal_count": (
            f"select zone_id, count(*) as n_pages from ({pip_oracle_sql(pts)}) j"
            f" group by zone_id order by zone_id"
        ),
    }

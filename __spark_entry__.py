"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship page→zone spatial pipeline on sf0.001.
``queries()`` exposes each implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the DuckDB
equivalent over the same parquet views. Query implementations live in
``gdal_spark/queries/*`` grouped by domain:

- spatial.py     — geotag extraction, cell index, PIP join, zonal stats
- relational.py  — the OGR SQL surface (aggregates, joins, sorts, scalar
                   functions, windows) on the TPC-H-ish tables
- geodesy.py     — reprojection (WebMercator, UTM/Krüger) + exact kNN
- textpipe.py    — dedup (exact/MinHash-LSH/SimHash/n-gram/embedding),
                   similarity search, text analysis, multimodal plumbing

Spatial inputs are synthesized deterministically from ``documents`` with
integer-only arithmetic (gdal_spark.pages), so both engines compute
bit-identical geometry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"

_QUERY_MODULES = (
    "gdal_spark.queries.spatial",
    "gdal_spark.queries.relational",
    "gdal_spark.queries.geodesy",
    "gdal_spark.queries.textpipe",
    "gdal_spark.queries.raster",
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: geocode pages → cell ids → broadcast R-tree PIP join →
    pages per zone (SURVEY §7 step 2)."""
    from gdal_spark.pipeline import pages_per_zone

    return pages_per_zone(spark, SF_SMOKE)


def _modules():
    import importlib

    return [importlib.import_module(m) for m in _QUERY_MODULES]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for mod in _modules():
        overlap = set(out) & set(mod.QUERIES)
        assert not overlap, f"duplicate query names: {overlap}"
        out.update(mod.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out

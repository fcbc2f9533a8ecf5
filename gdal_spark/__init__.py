"""gdal_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch reimplementation of the *semantics* of GDAL/OGR's core
vector/raster engine (reference: Ryanf55/gdal @ 3.12.0dev) on Spark
primitives: DataFrame/SQL plans optimized by Catalyst, with vectorized
Arrow/pandas UDFs for the geometry kernels (the Spark analogue of GDAL's
Arrow batch surface, ogr/ogrsf_frmts/generic/ogrlayerarrow.cpp:1947).

Design invariants (BASELINE.json input_hint):
- no per-row Python: all Python-side kernels are Arrow-batched pandas UDFs
  operating on numpy arrays;
- geometry travels as ISO WKB in BinaryType columns, points additionally as
  plain (lon, lat) double columns (the fast path);
- CRS axis order is always lon,lat ("traditional GIS order",
  ogr/ogrsf_frmts/generic/ogr_gensql.cpp:400).
"""

from gdal_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"

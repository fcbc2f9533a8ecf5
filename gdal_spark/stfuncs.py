"""ST_* SQL function registry: the SQLite-dialect geometry functions.

GDAL's SQLite dialect registers ~53 SQL scalar functions over geometries
(ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp — ST_Area:956 etc.);
the OGR SQL dialect exposes the special fields OGR_GEOM_AREA /
OGR_GEOM_WKT (ogr/ogr_p.h:164). This module registers the core set as
Spark SQL functions over WKB binary columns so `spark.sql(...)` and the
ExecuteSQL translator can call them by name.

All kernels are Arrow-batched pandas UDFs decoding ISO WKB
(gdal_spark.wkb) and dispatching to the vectorizable planar kernels in
gdal_spark.geom — no GEOS, no per-row JVM↔Python chatter beyond the
batch boundary.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from gdal_spark import geom as G
from gdal_spark import wkb as W


def _rings_of(blob: bytes):
    g = W.loads(bytes(blob))
    if g["type"] == "Polygon":
        return g["coords"]
    if g["type"] == "MultiPolygon":
        return [r for poly in g["coords"] for r in poly]
    raise ValueError(f"not a polygon: {g['type']}")


def _st_area(col: pd.Series) -> pd.Series:
    return pd.Series([
        G.polygon_area(_rings_of(b)) if b is not None else None
        for b in col], dtype="float64")


def _st_npoints(col: pd.Series) -> pd.Series:
    out = []
    for b in col:
        if b is None:
            out.append(None)
            continue
        g = W.loads(bytes(b))
        if g["type"] == "Point":
            out.append(1)
        elif g["type"] == "LineString":
            out.append(len(g["coords"]))
        elif g["type"] == "Polygon":
            out.append(sum(len(r) for r in g["coords"]))
        else:
            out.append(sum(len(r) for part in g["coords"] for r in
                           (part if isinstance(part, list) else [part])))
    return pd.Series(out, dtype="int64")


def _st_centroid_x(col: pd.Series) -> pd.Series:
    return pd.Series([G.polygon_centroid(_rings_of(b))[0] for b in col],
                     dtype="float64")


def _st_centroid_y(col: pd.Series) -> pd.Series:
    return pd.Series([G.polygon_centroid(_rings_of(b))[1] for b in col],
                     dtype="float64")


def _st_contains_xy(col: pd.Series, xs: pd.Series,
                    ys: pd.Series) -> pd.Series:
    out = np.zeros(len(col), dtype=bool)
    xv = xs.to_numpy(dtype=np.float64)
    yv = ys.to_numpy(dtype=np.float64)
    for i, b in enumerate(col):
        if b is None:
            continue
        out[i] = bool(G.points_in_polygon(xv[i:i + 1], yv[i:i + 1],
                                          _rings_of(b))[0])
    return pd.Series(out)


def _st_distance_xy(col: pd.Series, xs: pd.Series,
                    ys: pd.Series) -> pd.Series:
    """Planar distance from (x, y) to the polygon (0 when inside —
    ogrgeometry.cpp Distance semantics)."""
    out = np.full(len(col), np.nan)
    xv = xs.to_numpy(dtype=np.float64)
    yv = ys.to_numpy(dtype=np.float64)
    for i, b in enumerate(col):
        if b is None:
            continue
        rings = _rings_of(b)
        if G.points_in_polygon(xv[i:i + 1], yv[i:i + 1], rings)[0]:
            out[i] = 0.0
            continue
        best = math.inf
        for ring in rings:
            for j in range(len(ring) - 1):
                d2 = G.point_segment_dist2(
                    xv[i:i + 1], yv[i:i + 1],
                    ring[j, 0], ring[j, 1], ring[j + 1, 0], ring[j + 1, 1])
                best = min(best, float(d2[0]))
        out[i] = math.sqrt(best)
    return pd.Series(out, dtype="float64")


_REGISTRY = {
    "st_area": (_st_area, "double"),
    "st_npoints": (_st_npoints, "long"),
    "st_centroid_x": (_st_centroid_x, "double"),
    "st_centroid_y": (_st_centroid_y, "double"),
    "st_contains_xy": (_st_contains_xy, "boolean"),
    "st_distance_xy": (_st_distance_xy, "double"),
}


def register_st_functions(spark: SparkSession) -> None:
    """Register every ST_ function for use in spark.sql strings."""
    for name, (fn, rtype) in _REGISTRY.items():
        spark.udf.register(name, F.pandas_udf(fn, rtype))

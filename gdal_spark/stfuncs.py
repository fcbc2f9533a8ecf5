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


def _seq_sum(terms) -> float:
    """Strictly sequential IEEE summation. numpy's pairwise/unrolled
    np.sum tree differs from a left fold for n ≥ 8 terms; the ST_
    kernels fold sequentially so the DuckDB oracle (list_reduce over the
    same term order) compares bit-exactly."""
    s = 0.0
    for t in terms:
        s += float(t)
    return s


def _ring_area_seq(ring) -> float:
    x = ring[:, 0]
    y = ring[:, 1]
    return 0.5 * _seq_sum(x[i] * y[i + 1] - x[i + 1] * y[i]
                          for i in range(len(ring) - 1))


def _polygon_area_seq(rings) -> float:
    area = abs(_ring_area_seq(rings[0]))
    for hole in rings[1:]:
        area -= abs(_ring_area_seq(hole))
    return area


def _geom_area_seq(blob: bytes) -> float:
    """OGR_GEOM_AREA semantics: Polygon = |exterior| - sum(|holes|);
    MultiPolygon = sequential sum of member polygon areas (ring
    flattening would misread trailing members as holes)."""
    g = W.loads(bytes(blob))
    if g["type"] == "Polygon":
        return _polygon_area_seq(g["coords"])
    if g["type"] == "MultiPolygon":
        return _seq_sum(_polygon_area_seq(p) for p in g["coords"])
    raise ValueError(f"not a polygon: {g['type']}")


def _st_area(col: pd.Series) -> pd.Series:
    return pd.Series([
        _geom_area_seq(b) if b is not None else None
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


def _polygon_centroid_seq(rings) -> tuple[float, float]:
    """Area-weighted centroid with sequential folds (same semantics as
    geom.polygon_centroid, fold order pinned for the oracle)."""
    total_a = 0.0
    cx = 0.0
    cy = 0.0
    for i, ring in enumerate(rings):
        signed_a = _ring_area_seq(ring)
        if signed_a == 0.0:
            continue
        want = 1.0 if i == 0 else -1.0
        flip = want * (1.0 if signed_a > 0 else -1.0)
        x = ring[:, 0]
        y = ring[:, 1]
        sx = _seq_sum((x[j] + x[j + 1])
                      * (x[j] * y[j + 1] - x[j + 1] * y[j])
                      for j in range(len(ring) - 1))
        sy = _seq_sum((y[j] + y[j + 1])
                      * (x[j] * y[j + 1] - x[j + 1] * y[j])
                      for j in range(len(ring) - 1))
        cx += flip * sx / 6.0
        cy += flip * sy / 6.0
        total_a += signed_a * flip
    return cx / total_a, cy / total_a


def _st_centroid_x(col: pd.Series) -> pd.Series:
    return pd.Series([_polygon_centroid_seq(_rings_of(b))[0] for b in col],
                     dtype="float64")


def _st_centroid_y(col: pd.Series) -> pd.Series:
    return pd.Series([_polygon_centroid_seq(_rings_of(b))[1] for b in col],
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
                best = min(best, _seg_dist2(
                    float(xv[i]), float(yv[i]),
                    float(ring[j, 0]), float(ring[j, 1]),
                    float(ring[j + 1, 0]), float(ring[j + 1, 1])))
        out[i] = math.sqrt(best)
    return pd.Series(out, dtype="float64")


def _seg_dist2(px: float, py: float, ax: float, ay: float,
               bx: float, by: float) -> float:
    """Squared point-to-segment distance, expression order pinned to the
    oracle SQL: t = clamp(((p-a)·d)/|d|², 0, 1); d² to a + t·d."""
    dx = bx - ax
    dy = by - ay
    len2 = dx * dx + dy * dy
    t = ((px - ax) * dx + (py - ay) * dy) / len2
    t = max(min(t, 1.0), 0.0)
    ex = ax + t * dx
    ey = ay + t * dy
    return (px - ex) * (px - ex) + (py - ey) * (py - ey)


def _st_astext(col: pd.Series) -> pd.Series:
    """ST_AsText / the OGR_GEOM_WKT special field (ogr/ogr_p.h:166)."""
    return pd.Series([
        W.wkt_dumps(W.loads(bytes(b))) if b is not None else None
        for b in col], dtype="object")


def _st_geomfromtext(col: pd.Series) -> pd.Series:
    return pd.Series([
        bytearray(W.dumps(W.wkt_loads(s))) if s is not None else None
        for s in col], dtype="object")


_REGISTRY = {
    "st_area": (_st_area, "double"),
    "st_npoints": (_st_npoints, "long"),
    "st_centroid_x": (_st_centroid_x, "double"),
    "st_centroid_y": (_st_centroid_y, "double"),
    "st_contains_xy": (_st_contains_xy, "boolean"),
    "st_distance_xy": (_st_distance_xy, "double"),
    "st_astext": (_st_astext, "string"),
    "st_geomfromtext": (_st_geomfromtext, "binary"),
}


def register_st_functions(spark: SparkSession) -> None:
    """Register every ST_ function for use in spark.sql strings —
    including the pairwise predicate set (gdal_spark.predicates) and the
    constructive surface (gdal_spark.constructive)."""
    from gdal_spark.constructive import REGISTRY as _CONSTRUCTIVE
    from gdal_spark.predicates import register_predicates

    for name, (fn, rtype) in {**_REGISTRY, **_CONSTRUCTIVE}.items():
        spark.udf.register(name, F.pandas_udf(fn, rtype))
    register_predicates(spark)


# ---------------------------------------------------------------------------
# Contract fixture + DuckDB oracle for the ST_ surface
# ---------------------------------------------------------------------------


def _lit(v: float) -> str:
    r = repr(float(v))
    return r if "e" in r or "E" in r else r + "e0"


def st_query_points(defs: list[dict]) -> list[tuple[int, float, float]]:
    """One deterministic probe point per zone (bbox-center + fixed
    offset, rounded to 6 decimals): a mix of inside/outside hits."""
    out = []
    for z in defs:
        bb = G.rings_bbox(z["rings"])
        qx = round((bb[0] + bb[2]) / 2 + 0.61, 6)
        qy = round((bb[1] + bb[3]) / 2 + 0.13, 6)
        out.append((z["zone_id"], qx, qy))
    return out


def zones_wkb_df(spark: SparkSession, defs: list[dict]):
    """DataFrame (zone_id, wkb) of the zone polygons as ISO WKB."""
    from gdal_spark import wkb as W

    rows = [(z["zone_id"],
             bytearray(W.dumps_polygon([r.tolist() for r in z["rings"]])))
            for z in defs]
    return spark.createDataFrame(rows, "zone_id int, wkb binary")


def st_functions_oracle_sql(defs: list[dict]) -> str:
    """DuckDB oracle recomputing every ST_ kernel from vertex VALUES
    tables: ordered-fold shoelace area and centroid (matching the
    kernels' sequential summation), even-odd parity containment, and
    min-over-edges clamped-projection distance."""
    edges, qrows = [], []
    for z in defs:
        for ri, ring in enumerate(z["rings"]):
            for vi in range(len(ring) - 1):
                edges.append(
                    f"({z['zone_id']}, {ri}, {vi},"
                    f" {_lit(ring[vi, 0])}, {_lit(ring[vi, 1])},"
                    f" {_lit(ring[vi + 1, 0])}, {_lit(ring[vi + 1, 1])})")
    for zid, qx, qy in st_query_points(defs):
        qrows.append(f"({zid}, {_lit(qx)}, {_lit(qy)})")

    def fold(list_expr: str) -> str:
        return (f"list_reduce(list_concat([cast(0 as double)],"
                f" {list_expr}), (a, b) -> a + b)")

    def ring_fold(term: str) -> str:
        return fold("list_transform(list_sort(list("
                    f"{{'i': vert_idx, 't': {term}}})), s -> s.t)")

    d2 = ("(qx - (x0 + greatest(least(((qx - x0) * (x1 - x0)"
          " + (qy - y0) * (y1 - y0)) / ((x1 - x0) * (x1 - x0)"
          " + (y1 - y0) * (y1 - y0)), 1e0), 0e0) * (x1 - x0)))"
          " * (qx - (x0 + greatest(least(((qx - x0) * (x1 - x0)"
          " + (qy - y0) * (y1 - y0)) / ((x1 - x0) * (x1 - x0)"
          " + (y1 - y0) * (y1 - y0)), 1e0), 0e0) * (x1 - x0)))"
          " + (qy - (y0 + greatest(least(((qx - x0) * (x1 - x0)"
          " + (qy - y0) * (y1 - y0)) / ((x1 - x0) * (x1 - x0)"
          " + (y1 - y0) * (y1 - y0)), 1e0), 0e0) * (y1 - y0)))"
          " * (qy - (y0 + greatest(least(((qx - x0) * (x1 - x0)"
          " + (qy - y0) * (y1 - y0)) / ((x1 - x0) * (x1 - x0)"
          " + (y1 - y0) * (y1 - y0)), 1e0), 0e0) * (y1 - y0)))")
    return f"""
with edges(zone_id, ring_idx, vert_idx, x0, y0, x1, y1) as
  (values {", ".join(edges)}),
q(zone_id, qx, qy) as (values {", ".join(qrows)}),
ring_stats as (
  select zone_id, ring_idx,
         0.5e0 * {ring_fold("x0 * y1 - x1 * y0")} as signed_a,
         {ring_fold("(x0 + x1) * (x0 * y1 - x1 * y0)")} as sx,
         {ring_fold("(y0 + y1) * (x0 * y1 - x1 * y0)")} as sy,
         count(*) as n_edges
  from edges group by zone_id, ring_idx
),
ring_c as (
  select zone_id, ring_idx, signed_a, sx, sy, n_edges,
         (case when ring_idx = 0 then 1e0 else -1e0 end)
       * (case when signed_a > 0 then 1e0 else -1e0 end) as flip
  from ring_stats
),
zonal as (
  select zone_id,
         {fold("list_transform(list_sort(list({'i': ring_idx,"
               " 't': case when ring_idx = 0 then abs(signed_a)"
               " else -abs(signed_a) end})), s -> s.t)")} as area,
         {fold("list_transform(list_sort(list({'i': ring_idx,"
               " 't': flip * sx / 6.0e0})), s -> s.t)")} as cxs,
         {fold("list_transform(list_sort(list({'i': ring_idx,"
               " 't': flip * sy / 6.0e0})), s -> s.t)")} as cys,
         {fold("list_transform(list_sort(list({'i': ring_idx,"
               " 't': signed_a * flip})), s -> s.t)")} as total_a,
         cast(sum(n_edges) + count(*) as bigint) as npoints
  from ring_c group by zone_id
),
par as (
  select e.zone_id, e.ring_idx,
         (sum(case when (e.y0 > q.qy) != (e.y1 > q.qy)
               and q.qx < (e.x1 - e.x0) * (q.qy - e.y0)
                          / (e.y1 - e.y0) + e.x0
              then 1 else 0 end) % 2) = 1 as inside
  from edges e join q on q.zone_id = e.zone_id
  group by e.zone_id, e.ring_idx
),
inq as (
  select zone_id,
         bool_or(case when ring_idx = 0 then inside else false end)
         and not bool_or(case when ring_idx > 0 then inside
                         else false end) as contains_q
  from par group by zone_id
),
mind as (
  select e.zone_id, min({d2}) as d2
  from edges e join q on q.zone_id = e.zone_id
  group by e.zone_id
)
select z.zone_id, z.area, z.npoints,
       z.cxs / z.total_a as centroid_x, z.cys / z.total_a as centroid_y,
       i.contains_q,
       case when i.contains_q then 0e0 else sqrt(m.d2) end as dist_q
from zonal z
join inq i on i.zone_id = z.zone_id
join mind m on m.zone_id = z.zone_id
"""

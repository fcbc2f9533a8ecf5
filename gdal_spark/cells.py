"""Hierarchical spatial cell index: WebMercatorQuad tiles / quadkey cells.

Replicates the tile-indexing semantics of GDAL's `gdal raster tile`
(WebMercatorQuad a.k.a. GoogleMapsCompatible / XYZ; reference
apps/gdalalg_raster_tile.cpp:274 GetTileIndices): a point (lon, lat) at
zoom z maps to tile

    n  = 2**z
    tx = clamp(floor((lon + 180) / 360 * n), 0, n-1)
    ty = clamp(floor((1 - asinh(tan(lat_rad)) / pi) / 2 * n), 0, n-1)

The packed ``cell_id = (z << 58) | (tx << 29) | ty`` is this engine's
H3/S2-equivalent hierarchical cell id (the north rule allows a pure-math
quad scheme; h3/s2 native libs are not available in this environment).
Parent/child moves are bit shifts; k-ring is the (2r+1)² tile neighborhood
with x wraparound (the quad analogue of H3's k-ring).

All hot-path column math is **JVM-side Catalyst expressions** (whole-stage
codegen, no Python): the same SQL snippet is used verbatim by the Spark
plan and by the DuckDB test oracle, so the formula — not just the intent —
is shared.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_LAT = 85.05112878  # WebMercator latitude clamp
Z_SHIFT = 58
X_SHIFT = 29

# ---------------------------------------------------------------------------
# Shared SQL templates (valid in both Spark SQL and DuckDB SQL).
# asinh is spelled ln(t + sqrt(t*t + 1)) because DuckDB 1.0 lacks asinh.
# ---------------------------------------------------------------------------


def tile_x_sql(lon: str, z: int) -> str:
    n = 1 << z
    return f"cast(least(greatest(floor((({lon}) + 180.0) / 360.0 * {n}), 0), {n - 1}) as bigint)"


def tile_y_sql(lat: str, z: int) -> str:
    n = 1 << z
    t = f"tan(radians(least(greatest({lat}, {-MAX_LAT}), {MAX_LAT})))"
    asinh_t = f"ln({t} + sqrt({t} * {t} + 1.0))"
    return (
        f"cast(least(greatest(floor((1.0 - ({asinh_t}) / pi()) / 2.0 * {n}), 0),"
        f" {n - 1}) as bigint)"
    )


def cell_id_sql(lon: str, lat: str, z: int) -> str:
    return (
        f"(cast({z} as bigint) * {1 << Z_SHIFT}"
        f" + {tile_x_sql(lon, z)} * {1 << X_SHIFT}"
        f" + {tile_y_sql(lat, z)})"
    )


# ---------------------------------------------------------------------------
# Spark Column API (delegates to the shared SQL template → identical math).
# ---------------------------------------------------------------------------


def tile_x_col(lon: str, z: int) -> Column:
    return F.expr(tile_x_sql(lon, z))


def tile_y_col(lat: str, z: int) -> Column:
    return F.expr(tile_y_sql(lat, z))


def cell_id_col(lon: str, lat: str, z: int) -> Column:
    return F.expr(cell_id_sql(lon, lat, z))


# ---------------------------------------------------------------------------
# Numpy kernels (for pandas-UDF raster/kNN internals and test oracles).
# ---------------------------------------------------------------------------


def tile_xy_np(lon: np.ndarray, lat: np.ndarray, z: int):
    n = 1 << z
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    lon = np.asarray(lon, dtype=np.float64)
    tx = np.floor((lon + 180.0) / 360.0 * n)
    t = np.tan(np.radians(lat))
    ty = np.floor((1.0 - np.log(t + np.sqrt(t * t + 1.0)) / np.pi) / 2.0 * n)
    tx = np.clip(tx, 0, n - 1).astype(np.int64)
    ty = np.clip(ty, 0, n - 1).astype(np.int64)
    return tx, ty


def cell_id_np(lon: np.ndarray, lat: np.ndarray, z: int) -> np.ndarray:
    tx, ty = tile_xy_np(lon, lat, z)
    return (np.int64(z) << Z_SHIFT) | (tx << X_SHIFT) | ty


def unpack_cell_id(cell_id: np.ndarray):
    cell_id = np.asarray(cell_id, dtype=np.int64)
    z = cell_id >> Z_SHIFT
    tx = (cell_id >> X_SHIFT) & ((1 << (Z_SHIFT - X_SHIFT)) - 1)
    ty = cell_id & ((1 << X_SHIFT) - 1)
    return z, tx, ty


def parent_cell(cell_id: np.ndarray, parent_z: int) -> np.ndarray:
    z, tx, ty = unpack_cell_id(cell_id)
    dz = z - parent_z
    if np.any(dz < 0):
        raise ValueError("parent_z must be <= cell zoom")
    return (np.int64(parent_z) << Z_SHIFT) | ((tx >> dz) << X_SHIFT) | (ty >> dz)


def tile_bounds_np(tx, ty, z: int):
    """(lon_min, lat_min, lon_max, lat_max) of tile(s) — inverse of tile_xy."""
    n = 1 << z
    tx = np.asarray(tx, dtype=np.float64)
    ty = np.asarray(ty, dtype=np.float64)
    lon_min = tx / n * 360.0 - 180.0
    lon_max = (tx + 1) / n * 360.0 - 180.0
    lat_max = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * ty / n))))
    lat_min = np.degrees(np.arctan(np.sinh(np.pi * (1 - 2 * (ty + 1) / n))))
    return lon_min, lat_min, lon_max, lat_max


def k_ring(tx: int, ty: int, z: int, r: int) -> list[tuple[int, int]]:
    """All tiles within Chebyshev distance r: (2r+1)² neighborhood.

    x wraps around the antimeridian; y is clamped at the poles. This is the
    quad analogue of H3's k-ring, used by the kNN expansion join (the
    semantics of GDAL's quadtree-assisted nearest search,
    alg/gdalgrid.cpp:879-923).
    """
    n = 1 << z
    out = []
    for dy in range(-r, r + 1):
        yy = ty + dy
        if yy < 0 or yy >= n:
            continue
        for dx in range(-r, r + 1):
            out.append(((tx + dx) % n, yy))
    return out


def ring_cells_np(tx: np.ndarray, ty: np.ndarray, z: int, r: int):
    """Vectorized k-ring: for arrays tx,ty return stacked (idx, cell_id).

    idx maps each emitted neighbor back to its input row; used to explode
    query points onto their candidate cells without leaving numpy.
    """
    n = 1 << z
    side = 2 * r + 1
    dxs, dys = np.meshgrid(np.arange(-r, r + 1), np.arange(-r, r + 1))
    dxs = dxs.ravel()
    dys = dys.ravel()
    tx = np.asarray(tx, dtype=np.int64)
    ty = np.asarray(ty, dtype=np.int64)
    xs = (tx[:, None] + dxs[None, :]) % n
    ys = ty[:, None] + dys[None, :]
    valid = (ys >= 0) & (ys < n)
    idx = np.repeat(np.arange(len(tx)), side * side)[valid.ravel()]
    cells = (
        (np.int64(z) << Z_SHIFT) | (xs << X_SHIFT) | np.where(valid, ys, 0)
    ).ravel()[valid.ravel()]
    return idx, cells

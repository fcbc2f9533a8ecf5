"""Grid-based datum correction (NTv2-style) as a broadcast-table join.

GDAL applies national datum corrections through PROJ's grid files
(NTv2 / OSTN15 / NADCON — loaded via the transformation database,
ogr/ogrct.cpp:1705-1803): a regular lat/lon raster of (dlat, dlon)
shifts in arcseconds, sampled by BILINEAR interpolation of the four
surrounding nodes and ADDED to the source coordinates before the map
projection. The engine's Helmert-only EPSG:27700 chain (gdal_spark.crs)
carries a documented ~3.5 m error vs OSTN15; this module supplies the
missing structural seam — with a grid table in place of the 7-parameter
shift, the chain is grid-exact.

Spark-first shape: a shift grid is a SMALL table (OSTN15 is ~876k
nodes ≈ a few MB; NTv2 national grids are far smaller) keyed by cell
index, so the lookup is a textbook **broadcast equi-join**: points
compute their (ci, cj) cell, join the broadcast cell table (one row
per cell carrying all four corner shifts — no 4-way join), and the
bilinear blend + projection run as whole-stage-codegen'd expressions.
Nothing shuffles; the grid broadcasts once per stage. At 10^12-point
scale this is exactly the plan you want: scan → broadcast hash join →
projection arithmetic.

The grid here is a deterministic synthetic fixture (integer node
formula shared textually with the DuckDB oracle) standing in for a
real NTv2 file — the real thing differs only in where the table's
rows come from. Coverage: a 0.5-degree grid over the British Isles
(the OSTN15 footprint shape); points outside the grid fail with
ok=false exactly like PROJ outside-grid behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# UK-footprint fixture grid: nodes at lon0 + i*step (i in [0, NI)),
# lat0 + j*step (j in [0, NJ)); cells (ci, cj) span node i..i+1, j..j+1
LON0, LAT0, STEP = -9.0, 49.0, 0.5
NI, NJ = 25, 27  # nodes: lon -9..3, lat 49..62


def node_dlat_sql(i: str, j: str) -> str:
    """Synthetic node shift (arcsec), latitude component — integer
    arithmetic then one multiply/add, so both engines compute the
    identical double from identical text."""
    return f"(-4.0 + cast((({i}) * 7 + ({j}) * 13) % 41 as double) * 0.05)"


def node_dlon_sql(i: str, j: str) -> str:
    """Synthetic node shift (arcsec), longitude component."""
    return f"(1.0 + cast((({i}) * 11 + ({j}) * 5) % 37 as double) * 0.04)"


# one row per CELL with the four corner shifts — the broadcast table
_CELL_COLS = [
    ("dlat00", node_dlat_sql("ci", "cj")),
    ("dlat10", node_dlat_sql("ci + 1", "cj")),
    ("dlat01", node_dlat_sql("ci", "cj + 1")),
    ("dlat11", node_dlat_sql("ci + 1", "cj + 1")),
    ("dlon00", node_dlon_sql("ci", "cj")),
    ("dlon10", node_dlon_sql("ci + 1", "cj")),
    ("dlon01", node_dlon_sql("ci", "cj + 1")),
    ("dlon11", node_dlon_sql("ci + 1", "cj + 1")),
]


def grid_cells(spark: SparkSession) -> DataFrame:
    """The (NI-1)x(NJ-1) cell table, built from the node formula (a
    real NTv2 file would parquet-load instead — same shape)."""
    nci = NI - 1
    df = spark.range(nci * (NJ - 1)).selectExpr(
        f"cast(id % {nci} as int) as ci",
        f"cast(id DIV {nci} as int) as cj")
    return df.selectExpr("ci", "cj",
                         *[f"{expr} as {name}" for name, expr in _CELL_COLS])


def grid_cells_duckdb() -> str:
    """DuckDB CTE body producing the identical cell table."""
    nci = NI - 1
    cols = ", ".join(f"{expr} as {name}" for name, expr in _CELL_COLS)
    return (f"select cast(id % {nci} as int) as ci,"
            f" cast(id // {nci} as int) as cj, {cols}"
            f" from (select range as id from range(0, {nci * (NJ - 1)})) t")


def cell_key_stages(lon: str, lat: str) -> list[tuple[str, str]]:
    """Point-side stages: cell index + in-grid flag (shared text).
    Out-of-grid points get key (-1, -1) so the left join never
    matches them."""
    return [
        ("_gci", f"cast(floor((({lon}) - {LON0!r}) / {STEP!r}) as int)"),
        ("_gcj", f"cast(floor((({lat}) - {LAT0!r}) / {STEP!r}) as int)"),
        ("in_grid", f"(_gci >= 0 and _gci <= {NI - 2}"
                    f" and _gcj >= 0 and _gcj <= {NJ - 2})"),
        ("ci", f"case when in_grid then _gci else -1 end"),
        ("cj", f"case when in_grid then _gcj else -1 end"),
    ]


def bilinear_shift_stages(lon: str, lat: str,
                          out_lon: str = "_glon",
                          out_lat: str = "_glat") -> list[tuple[str, str]]:
    """Post-join stages: bilinear blend of the four corner shifts,
    applied in arcseconds (PROJ grid convention: shift ADDS to the
    source coordinate). Out-of-grid rows become NaN — the projection
    stages downstream then fail them exactly like any invalid input."""
    fx = f"((({lon}) - {LON0!r}) / {STEP!r} - ci)"
    fy = f"((({lat}) - {LAT0!r}) / {STEP!r} - cj)"

    def blend(p: str) -> str:
        return (f"({p}00 * (1.0 - _fx) * (1.0 - _fy)"
                f" + {p}10 * _fx * (1.0 - _fy)"
                f" + {p}01 * (1.0 - _fx) * _fy"
                f" + {p}11 * _fx * _fy)")

    return [
        ("_fx", f"case when in_grid then {fx} else 0.0 end"),
        ("_fy", f"case when in_grid then {fy} else 0.0 end"),
        ("_dlat", f"case when in_grid then {blend('dlat')} else 0.0 end"),
        ("_dlon", f"case when in_grid then {blend('dlon')} else 0.0 end"),
        (out_lat, f"case when in_grid then ({lat}) + _dlat / 3600.0"
                  f" else cast('nan' as double) end"),
        (out_lon, f"case when in_grid then ({lon}) + _dlon / 3600.0"
                  f" else cast('nan' as double) end"),
    ]


def osgb36_grid_fwd(spark: SparkSession, pts: DataFrame,
                    lon: str = "lon", lat: str = "lat") -> DataFrame:
    """EPSG:4326 → EPSG:27700 with the GRID datum path (the flag-gated
    alternative to crs.osgb36_sql_stages' single Helmert): broadcast
    cell join → bilinear shift → Airy Krüger. Adds easting / northing
    / ok (+ in_grid). On the synthetic fixture the datum step is
    grid-exact by construction (tests pin node-exactness and an
    independent numpy bilinear)."""
    from gdal_spark.crs import TMERC_27700, apply_sql_stages, \
        tmerc_sql_stages_p

    pts = apply_sql_stages(pts, cell_key_stages(lon, lat))
    joined = pts.join(F.broadcast(grid_cells(spark)), ["ci", "cj"], "left")
    # one staged pipeline: apply_sql_stages drops _-temporaries at the
    # end, so the bilinear outputs must stay in scope for the Krüger
    # stages that consume them
    stages = (bilinear_shift_stages(lon, lat)
              + tmerc_sql_stages_p("_glon", "_glat", TMERC_27700)
              + [("ok", "(in_grid and ok)")])
    return apply_sql_stages(joined, stages)


def osgb36_grid_duckdb_sql(pts_select: str, lon: str = "lon",
                           lat: str = "lat",
                           keep: list[str] | None = None) -> str:
    """The identical chain as one DuckDB statement: pts → cell keys →
    left join grid → bilinear → Airy Krüger; same stage text."""
    from gdal_spark.crs import TMERC_27700, stages_to_duckdb_sql, \
        tmerc_sql_stages_p

    keep = keep or []
    key_inner = stages_to_duckdb_sql(
        pts_select, cell_key_stages(lon, lat),
        keep + [lon, lat, "in_grid", "ci", "cj"])
    grid_cols = [name for name, _ in _CELL_COLS]
    joined = (f"select p.*, {', '.join('g.' + c for c in grid_cols)}"
              f" from ({key_inner}) p left join ({grid_cells_duckdb()}) g"
              f" using (ci, cj)")
    shifted = stages_to_duckdb_sql(
        joined, bilinear_shift_stages(lon, lat),
        keep + [lon, lat, "in_grid", "_glon", "_glat"])
    final = stages_to_duckdb_sql(
        shifted, tmerc_sql_stages_p("_glon", "_glat", TMERC_27700),
        keep + ["in_grid", "easting", "northing", "ok"])
    return (f"select {', '.join(keep + ['in_grid'])},"
            f" easting, northing, (in_grid and ok) as ok from ({final}) q")

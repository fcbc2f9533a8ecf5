"""Gridding: points → raster interpolation (alg/gdalgrid.cpp).

Implements GDAL's radius-limited inverse-distance-to-a-power
interpolation (GDALGridInverseDistanceToAPower, alg/gdalgrid.cpp:109;
quadtree-accelerated neighbor search :260-276) as relational algebra:
pixel grid ⋈ candidate points (radius predicate) → per-pixel IDW.

Bit-exactness stance: the per-pixel reduction is an **ordered fold**
over the candidate list sorted by doc_id (never an unordered SQL SUM of
doubles), so Spark and the DuckDB oracle produce identical IEEE doubles.

Scale: here candidates come from a broadcast cross join + radius filter
(the fixture region holds tens of points); at 10^12 scale candidate
generation swaps in the cell-prejoin used by the PIP join — join pixels
to the k-ring of cells within the radius — without touching the
per-pixel fold.
"""

from __future__ import annotations

from gdal_spark.pages import points_oracle_sql

SPARK = "spark"
DUCKDB = "duckdb"

# fixture grid over city-hotspot 0 (pages.synth_stages city centers)
GRID_LON0 = -176.2
GRID_LAT0 = -61.2
GRID_STEP = 0.06
GRID_N = 40
RADIUS = 0.15
POWER_SMOOTH = 0.0  # GDAL 'smoothing' default


def _lit(v: float) -> str:
    """e0-suffixed double literal (a bare decimal literal is DECIMAL in
    Spark SQL and would silently change the arithmetic)."""
    r = repr(float(v))
    return r if "e" in r or "E" in r else r + "e0"


def idw_sql(engine: str, doc_view: str = "documents") -> str:
    pts = points_oracle_sql(doc_view)
    lon_c = f"({_lit(GRID_LON0)} + (i + 0.5e0) * {_lit(GRID_STEP)})"
    lat_c = f"({_lit(GRID_LAT0)} + (j + 0.5e0) * {_lit(GRID_STEP)})"
    r2 = _lit(RADIUS * RADIUS)
    pad = _lit(RADIUS)
    if engine == SPARK:
        grid = (f"select a.id as i, b.id as j from range(0, {GRID_N}) a"
                f" cross join range(0, {GRID_N}) b")
        lst, srt, trn = "collect_list", "array_sort", "transform"

        def fold(list_expr: str) -> str:
            return (f"aggregate({list_expr}, cast(0 as double),"
                    f" (s, v) -> s + v)")

        mk = ("struct(cast(doc_id as double) as did,"
              " v / d2 as num_t, 1.0 / d2 as den_t)")
    else:
        grid = (f"select a.range as i, b.range as j from range(0, {GRID_N}) a"
                f" cross join range(0, {GRID_N}) b")
        lst, srt, trn = "list", "list_sort", "list_transform"

        def fold(list_expr: str) -> str:
            return (f"list_reduce(list_concat([cast(0 as double)],"
                    f" {list_expr}), (s, v) -> s + v)")

        mk = ("{'did': cast(doc_id as double),"
              " 'num_t': v / d2, 'den_t': 1.0 / d2}")

    lo_lon = _lit(GRID_LON0)
    hi_lon = _lit(GRID_LON0 + GRID_N * GRID_STEP)
    lo_lat = _lit(GRID_LAT0)
    hi_lat = _lit(GRID_LAT0 + GRID_N * GRID_STEP)
    return f"""
with p as (
  select doc_id, lon, lat, cast(doc_id % 97 as double) as v
  from ({pts}) q
  where lon >= {lo_lon} - {pad} and lon <= {hi_lon} + {pad}
    and lat >= {lo_lat} - {pad} and lat <= {hi_lat} + {pad}
),
g as ({grid}),
c as (
  select g.i, g.j, p.doc_id, p.v,
         (p.lon - {lon_c}) * (p.lon - {lon_c})
       + (p.lat - {lat_c}) * (p.lat - {lat_c}) as d2
  from g cross join p
  where (p.lon - {lon_c}) * (p.lon - {lon_c})
      + (p.lat - {lat_c}) * (p.lat - {lat_c}) <= {r2}
),
packed as (
  select i, j, count(*) as n_pts, {srt}({lst}({mk})) as arr
  from c group by i, j
)
select i, j, n_pts,
       {fold(f"{trn}(arr, a -> a.num_t)")}
     / {fold(f"{trn}(arr, a -> a.den_t)")} as idw_value
from packed
"""


def idw_grid(spark, sf_dir: str):
    """Spark DataFrame of the IDW grid over the fixture region."""
    spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .createOrReplaceTempView("documents")
    return spark.sql(idw_sql(SPARK))


def proximity_sql(engine: str, doc_view: str = "documents") -> str:
    """Proximity raster (alg/gdalproximity.cpp:94): per grid pixel the
    distance to the nearest burned point within RADIUS (pixels with no
    point in range emit nothing — the nodata convention). MIN over
    candidate distances is order-independent, so no ordered folds are
    needed for cross-engine exactness."""
    pts = points_oracle_sql(doc_view)
    lon_c = f"({_lit(GRID_LON0)} + (i + 0.5e0) * {_lit(GRID_STEP)})"
    lat_c = f"({_lit(GRID_LAT0)} + (j + 0.5e0) * {_lit(GRID_STEP)})"
    r2 = _lit(RADIUS * RADIUS)
    pad = _lit(RADIUS)
    if engine == SPARK:
        grid = (f"select a.id as i, b.id as j from range(0, {GRID_N}) a"
                f" cross join range(0, {GRID_N}) b")
    else:
        grid = (f"select a.range as i, b.range as j from range(0, {GRID_N}) a"
                f" cross join range(0, {GRID_N}) b")
    lo_lon = _lit(GRID_LON0)
    hi_lon = _lit(GRID_LON0 + GRID_N * GRID_STEP)
    lo_lat = _lit(GRID_LAT0)
    hi_lat = _lit(GRID_LAT0 + GRID_N * GRID_STEP)
    return f"""
with p as (
  select cast(lon as double) as lon, cast(lat as double) as lat
  from ({pts}) q
  where lon >= {lo_lon} - {pad} and lon <= {hi_lon} + {pad}
    and lat >= {lo_lat} - {pad} and lat <= {hi_lat} + {pad}
),
g as ({grid})
select g.i, g.j, count(*) as n_in_range,
       sqrt(min((p.lon - {lon_c}) * (p.lon - {lon_c})
              + (p.lat - {lat_c}) * (p.lat - {lat_c}))) as dist
from g cross join p
where (p.lon - {lon_c}) * (p.lon - {lon_c})
    + (p.lat - {lat_c}) * (p.lat - {lat_c}) <= {r2}
group by g.i, g.j
"""


def proximity_grid(spark, sf_dir: str):
    spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .createOrReplaceTempView("documents")
    return spark.sql(proximity_sql(SPARK))


def _grid_candidates(engine: str, doc_view: str = "documents") -> str:
    """Shared CTE prelude: fixture grid ⋈ radius-filtered points with
    per-candidate squared distance (the quadtree candidate search of
    alg/gdalgrid.cpp:260-276 restated as a pruned join)."""
    pts = points_oracle_sql(doc_view)
    lon_c = f"({_lit(GRID_LON0)} + (i + 0.5e0) * {_lit(GRID_STEP)})"
    lat_c = f"({_lit(GRID_LAT0)} + (j + 0.5e0) * {_lit(GRID_STEP)})"
    r2 = _lit(RADIUS * RADIUS)
    pad = _lit(RADIUS)
    if engine == SPARK:
        grid = (f"select a.id as i, b.id as j from range(0, {GRID_N}) a"
                f" cross join range(0, {GRID_N}) b")
    else:
        grid = (f"select a.range as i, b.range as j from range(0, {GRID_N}) a"
                f" cross join range(0, {GRID_N}) b")
    lo_lon = _lit(GRID_LON0)
    hi_lon = _lit(GRID_LON0 + GRID_N * GRID_STEP)
    lo_lat = _lit(GRID_LAT0)
    hi_lat = _lit(GRID_LAT0 + GRID_N * GRID_STEP)
    return f"""
p as (
  select doc_id, lon, lat, cast(doc_id % 97 as double) as v
  from ({pts}) q
  where lon >= {lo_lon} - {pad} and lon <= {hi_lon} + {pad}
    and lat >= {lo_lat} - {pad} and lat <= {hi_lat} + {pad}
),
g as ({grid}),
c as (
  select g.i, g.j, p.doc_id, p.v,
         (p.lon - {lon_c}) * (p.lon - {lon_c})
       + (p.lat - {lat_c}) * (p.lat - {lat_c}) as d2
  from g cross join p
  where (p.lon - {lon_c}) * (p.lon - {lon_c})
      + (p.lat - {lat_c}) * (p.lat - {lat_c}) <= {r2}
)"""


def moving_average_sql(engine: str, doc_view: str = "documents") -> str:
    """GDALGridMovingAverage (alg/gdalgrid.cpp:629): per pixel the mean
    of candidate values within the radius. The sum is an ordered fold
    over the doc_id-sorted candidate list for cross-engine IEEE
    exactness."""
    if engine == SPARK:
        lst, srt, trn = "collect_list", "array_sort", "transform"

        def fold(e: str) -> str:
            return f"aggregate({e}, cast(0 as double), (s, v) -> s + v)"

        mk = "struct(doc_id, v)"
    else:
        lst, srt, trn = "list", "list_sort", "list_transform"

        def fold(e: str) -> str:
            return (f"list_reduce(list_concat([cast(0 as double)],"
                    f" {e}), (s, v) -> s + v)")

        mk = "{'doc_id': doc_id, 'v': v}"
    return f"""
with {_grid_candidates(engine, doc_view)},
packed as (
  select i, j, count(*) as n_pts, {srt}({lst}({mk})) as arr
  from c group by i, j
)
select i, j, n_pts,
       {fold(f"{trn}(arr, a -> a.v)")} / n_pts as avg_value
from packed
"""


def nearest_grid_sql(engine: str, doc_view: str = "documents") -> str:
    """GDALGridNearestNeighbor (alg/gdalgrid.cpp:879): per pixel the
    value of the nearest candidate (ties broken by doc_id — GDAL's
    quadtree visit order is an implementation detail, so the tie rule is
    pinned explicitly and shared by both engines)."""
    if engine == SPARK:
        pick = ("element_at(array_sort(collect_list("
                "struct(d2, doc_id, v))), 1)")
    else:
        pick = ("list_extract(list_sort(list("
                "{'d2': d2, 'doc_id': doc_id, 'v': v})), 1)")
    return f"""
with {_grid_candidates(engine, doc_view)},
packed as (
  select i, j, count(*) as n_pts, {pick} as best
  from c group by i, j
)
select i, j, n_pts, best.doc_id as src_doc_id, best.v as value,
       sqrt(best.d2) as dist
from packed
"""


def data_metrics_sql(engine: str, doc_view: str = "documents") -> str:
    """GDAL data-metric kernels (alg/gdalgrid.cpp GDALGridDataMetric*):
    per-pixel count, minimum/maximum distance and range of candidate
    values — all order-independent aggregates, exact by construction."""
    _ = engine  # identical text in both dialects
    return f"""
with {_grid_candidates(engine, doc_view)}
select i, j, count(*) as n_pts,
       sqrt(min(d2)) as min_dist, sqrt(max(d2)) as max_dist,
       max(v) - min(v) as value_range
from c group by i, j
"""


def _grid_runner(sql_builder):
    def run(spark, sf_dir: str):
        spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .createOrReplaceTempView("documents")
        return spark.sql(sql_builder(SPARK))
    return run


moving_average_grid = _grid_runner(moving_average_sql)
nearest_grid = _grid_runner(nearest_grid_sql)
data_metrics_grid = _grid_runner(data_metrics_sql)

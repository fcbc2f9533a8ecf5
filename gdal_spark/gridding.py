"""Gridding: points → raster interpolation (alg/gdalgrid.cpp).

Implements GDAL's radius-limited inverse-distance-to-a-power
interpolation (GDALGridInverseDistanceToAPower, alg/gdalgrid.cpp:109;
quadtree-accelerated neighbor search :260-276) as relational algebra:
pixel grid ⋈ candidate points → per-pixel IDW.

Candidate generation is a **k-ring cell prejoin**, the distributed
restatement of the reference's quadtree search: points and pixel centers
are keyed to square cells of edge = search RADIUS, every pixel probes its
3×3 cell ring, and candidates come from an equi-join on the cell key
followed by the exact d² ≤ r² filter. Any point within RADIUS of a pixel
center differs by ≤1 in each cell index (cell edge = RADIUS), so the
prejoin is lossless; the plan contains no cartesian/nested-loop join and
the join fan-in per pixel is bounded by local point density — the shape
that survives a 10^12-point table. (A plain cross join + radius filter,
the round-1 shape, is O(pixels × points).)

Bit-exactness stance: the per-pixel reduction is an **ordered fold**
over the candidate list sorted by doc_id (never an unordered SQL SUM of
doubles), and the cell keys are derived from identical SQL text in both
engines, so Spark and the DuckDB oracle produce identical IEEE doubles.
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


def _grid_candidates(engine: str, doc_view: str = "documents") -> str:
    """Shared CTE prelude ending in ``c(i, j, doc_id, v, d2)``: fixture
    pixel grid ⋈ points via the k-ring cell prejoin + exact radius test
    (the quadtree candidate search of alg/gdalgrid.cpp:260-276 restated
    as a pruned equi-join)."""
    pts = points_oracle_sql(doc_view)
    r2 = _lit(RADIUS * RADIUS)
    pad = _lit(RADIUS)
    cell = _lit(RADIUS)
    lo_lon, lo_lat = _lit(GRID_LON0), _lit(GRID_LAT0)
    hi_lon = _lit(GRID_LON0 + GRID_N * GRID_STEP)
    hi_lat = _lit(GRID_LAT0 + GRID_N * GRID_STEP)
    if engine == SPARK:
        # single range + div/mod: no CartesianProduct node in the plan
        grid = (f"select id div {GRID_N} as i, id % {GRID_N} as j"
                f" from range(0, {GRID_N * GRID_N})")
        ring_src = "select g.*, o from g lateral view explode(sequence(0, 8)) t as o"
        div3 = "(o div 3)"
    else:
        grid = (f"select range // {GRID_N} as i, range % {GRID_N} as j"
                f" from range(0, {GRID_N * GRID_N})")
        ring_src = "select g.*, unnest(range(0, 9)) as o from g"
        div3 = "(o // 3)"
    lon_c = f"({lo_lon} + (i + 0.5e0) * {_lit(GRID_STEP)})"
    lat_c = f"({lo_lat} + (j + 0.5e0) * {_lit(GRID_STEP)})"
    return f"""
p as (
  select doc_id, lon, lat, cast(doc_id % 97 as double) as v,
         cast(floor((lon - {lo_lon}) / {cell}) as bigint) as pcx,
         cast(floor((lat - {lo_lat}) / {cell}) as bigint) as pcy
  from ({pts}) q
  where lon >= {lo_lon} - {pad} and lon <= {hi_lon} + {pad}
    and lat >= {lo_lat} - {pad} and lat <= {hi_lat} + {pad}
),
g as (
  select i, j, {lon_c} as gx, {lat_c} as gy,
         cast(floor(({lon_c} - {lo_lon}) / {cell}) as bigint) as gcx,
         cast(floor(({lat_c} - {lo_lat}) / {cell}) as bigint) as gcy
  from ({grid}) g0
),
gk as (
  select i, j, gx, gy,
         gcx + (o % 3) - 1 as kx, gcy + {div3} - 1 as ky
  from ({ring_src}) r
),
c as (
  select gk.i, gk.j, p.doc_id, p.v,
         (p.lon - gk.gx) * (p.lon - gk.gx)
       + (p.lat - gk.gy) * (p.lat - gk.gy) as d2
  from gk join p on p.pcx = gk.kx and p.pcy = gk.ky
  where (p.lon - gk.gx) * (p.lon - gk.gx)
      + (p.lat - gk.gy) * (p.lat - gk.gy) <= {r2}
)"""


def idw_sql(engine: str, doc_view: str = "documents") -> str:
    """Radius-limited IDW (power=2): per-pixel ordered fold of v/d² and
    1/d² over the doc_id-sorted candidate list."""
    if engine == SPARK:
        lst, srt, trn = "collect_list", "array_sort", "transform"

        def fold(list_expr: str) -> str:
            return (f"aggregate({list_expr}, cast(0 as double),"
                    f" (s, v) -> s + v)")

        mk = ("struct(cast(doc_id as double) as did,"
              " v / d2 as num_t, 1.0 / d2 as den_t)")
    else:
        lst, srt, trn = "list", "list_sort", "list_transform"

        def fold(list_expr: str) -> str:
            return (f"list_reduce(list_concat([cast(0 as double)],"
                    f" {list_expr}), (s, v) -> s + v)")

        mk = ("{'did': cast(doc_id as double),"
              " 'num_t': v / d2, 'den_t': 1.0 / d2}")
    return f"""
with {_grid_candidates(engine, doc_view)},
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
    return f"""
with {_grid_candidates(engine, doc_view)}
select i, j, count(*) as n_in_range, sqrt(min(d2)) as dist
from c group by i, j
"""


def proximity_grid(spark, sf_dir: str):
    spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .createOrReplaceTempView("documents")
    return spark.sql(proximity_sql(SPARK))


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
    return f"""
with {_grid_candidates(engine, doc_view)}
select i, j, count(*) as n_pts,
       sqrt(min(d2)) as min_dist, sqrt(max(d2)) as max_dist,
       max(v) - min(v) as value_range
from c group by i, j
"""


def grid_kernels_sql(engine: str, doc_view: str = "documents") -> str:
    """The full gridding kernel suite in ONE keyed aggregation pass:
    IDW (GDALGridInverseDistanceToAPower), moving average
    (GDALGridMovingAverage), nearest neighbor (GDALGridNearestNeighbor),
    the data-metric kernels (GDALGridDataMetric*), and the proximity
    raster (alg/gdalproximity.cpp:94 — its output is exactly the
    (n_pts, min_dist) pair). All kernels share the same k-ring candidate
    join, so computing them together costs a single shuffle on (i, j)
    instead of five — the plan shape that matters at a 10^12-point
    table. Ordered-fold / pinned-tie rules are identical to the
    individual kernels (idw_sql, moving_average_sql, nearest_grid_sql),
    so cross-engine IEEE exactness carries over unchanged."""
    if engine == SPARK:
        lst, srt, trn = "collect_list", "array_sort", "transform"

        def fold(e: str) -> str:
            return f"aggregate({e}, cast(0 as double), (s, v) -> s + v)"

        # did (unique per candidate) leads the struct, so the sort order
        # is the doc_id order regardless of the trailing fields
        mk = ("struct(cast(doc_id as double) as did, v / d2 as num_t,"
              " 1.0 / d2 as den_t, v as vv)")
        pick = ("element_at(array_sort(collect_list("
                "struct(d2, doc_id, v))), 1)")
    else:
        lst, srt, trn = "list", "list_sort", "list_transform"

        def fold(e: str) -> str:
            return (f"list_reduce(list_concat([cast(0 as double)],"
                    f" {e}), (s, v) -> s + v)")

        mk = ("{'did': cast(doc_id as double), 'num_t': v / d2,"
              " 'den_t': 1.0 / d2, 'vv': v}")
        pick = ("list_extract(list_sort(list("
                "{'d2': d2, 'doc_id': doc_id, 'v': v})), 1)")
    return f"""
with {_grid_candidates(engine, doc_view)},
packed as (
  select i, j, count(*) as n_pts,
         min(d2) as min_d2, max(d2) as max_d2,
         max(v) - min(v) as value_range,
         {srt}({lst}({mk})) as arr,
         {pick} as best
  from c group by i, j
)
select i, j, n_pts,
       {fold(f"{trn}(arr, a -> a.num_t)")}
     / {fold(f"{trn}(arr, a -> a.den_t)")} as idw_value,
       {fold(f"{trn}(arr, a -> a.vv)")} / n_pts as avg_value,
       best.doc_id as nn_doc_id, best.v as nn_value,
       sqrt(best.d2) as nn_dist,
       sqrt(min_d2) as min_dist, sqrt(max_d2) as max_dist, value_range
from packed
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
grid_kernels = _grid_runner(grid_kernels_sql)

"""gdal_rasterize over LINESTRING geometry — GDALdllImageLine semantics.

Replicates the reference's integer Bresenham line burner
(alg/llrasterize.cpp:252 GDALdllImageLine): vertices floor to integer
pixels, each segment walks its major axis with the shifted-error
midpoint rule, and a segment's end point is NOT burned unless it is the
part's last segment (the reference's guard against double-burning
interior vertices in ADD mode; a closed ring still double-burns its
closing vertex, matching the reference). MERGE_ALG=REPLACE takes the
last feature in layer order per pixel (max_by over feature id);
MERGE_ALG=ADD sums every burn event, revisits included, exactly like
the callback accumulation in the reference.

Spark-first shape — NO per-row Python: the error-loop has a closed
form, minor_offset(i) = floor((2·m·i + M − 1) / (2·M)) for burn index
i along the major axis (verified against the reference's loop term by
term in tests/test_rasterize_line.py), so the whole burner is a
`sequence`/`explode` over segments followed by two aggregations
(per-pixel merge, per-tile checksum). Pixel rows shuffle once, keyed
by pixel, a few hundred rows per tile at any scale — at 100× the
vector input this stays explode → partial-agg with zero gathers.

The DuckDB oracle (`rasterize_lines_oracle_sql`) runs the identical
integer arithmetic via generate_series + lateral unnest and the same
checksum text (GDALChecksumImage formula, gcore/checksum.cpp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gdal_spark.crs import _fmt
from gdal_spark.raster import CHECKSUM_PRIMES, TILE_PX
from gdal_spark.rasterize_poly import (_NPX, RASTERIZE_Z, RES, X0, Y0,
                                       _MX, _MY, _zone_rows)

_T = TILE_PX
_PRIMES = ", ".join(str(p) for p in CHECKSUM_PRIMES)

# pixel-space segment endpoints (integer, floored — llrasterize.cpp:267)
_SEG_COLS = [
    ("ix0", f"cast(floor((mxs[j] - {_fmt(X0)}) / {_fmt(RES)}) as bigint)"),
    ("iy0", f"cast(floor(({_fmt(Y0)} - mys[j]) / {_fmt(RES)}) as bigint)"),
    ("ix1", f"cast(floor((mxs[j + 1] - {_fmt(X0)}) / {_fmt(RES)})"
            f" as bigint)"),
    ("iy1", f"cast(floor(({_fmt(Y0)} - mys[j + 1]) / {_fmt(RES)})"
            f" as bigint)"),
]

# Bresenham closed form shared by both engines (integer arithmetic only).
_WALK_COLS = [
    ("dx", "abs(ix1 - ix0)"),
    ("dy", "abs(iy1 - iy0)"),
    ("sx", "case when ix1 < ix0 then -1 else 1 end"),
    ("sy", "case when iy1 < iy0 then -1 else 1 end"),
    ("mj", "greatest(dx, dy)"),
    ("mn", "least(dx, dy)"),
    ("xmaj", "dx >= dy"),
    # burn indices: 0..mj normally, 0..mj-1 when the end point is
    # skipped (every segment except the part's last)
    ("imax", "mj - (case when last then 0 else 1 end)"),
]


def _minor(i: str) -> str:
    return (f"case when mj = 0 then cast(0 as bigint)"
            f" else cast(floor((2 * mn * {i} + mj - 1)"
            f" / (2.0 * mj)) as bigint) end")


def _pix_cols(i: str) -> list[tuple[str, str]]:
    mn_i = _minor(i)
    return [
        ("gx", f"ix0 + (case when xmaj then {i} * sx"
               f" else ({mn_i}) * sx end)"),
        ("gy", f"iy0 + (case when xmaj then ({mn_i}) * sy"
               f" else {i} * sy end)"),
    ]


def rasterize_lines(spark: SparkSession, defs: list[dict]) -> DataFrame:
    """Burn the zone boundary rings as linestrings at RASTERIZE_Z; one
    row per covered tile: (z, tx, ty, cs_replace, cs_add, n_burned)."""
    rings = spark.createDataFrame(
        _zone_rows(defs),
        "zone_id int, eas_id int, ring_idx int,"
        " lons array<double>, lats array<double>")
    m = rings.select(
        "zone_id", "eas_id", "ring_idx",
        F.expr(f"transform(lons, v -> {_MX.format(v='v')})").alias("mxs"),
        F.expr(f"transform(lats, v -> {_MY.format(v='v')})").alias("mys"),
    )
    segs = m.filter("size(mxs) >= 2").select(
        "zone_id", "eas_id", "mxs", "mys",
        F.expr("explode(sequence(0, size(mxs) - 2))").alias("j"),
    ).withColumn("last", F.expr("j = size(mxs) - 2"))
    for name, expr in _SEG_COLS + _WALK_COLS:
        segs = segs.withColumn(name, F.expr(expr))
    pix = segs.filter("imax >= 0").select(
        "zone_id", "eas_id", "ix0", "iy0", "sx", "sy", "mj", "mn", "xmaj",
        F.expr("explode(sequence(0, imax))").alias("i"),
    )
    for name, expr in _pix_cols("i"):
        pix = pix.withColumn(name, F.expr(expr))
    # clip to the raster, like the reference's bounds check per point
    pix = pix.filter(f"gx >= 0 and gx < {_NPX} and gy >= 0 and gy < {_NPX}")
    per_px = pix.groupBy("gx", "gy").agg(
        F.expr("max_by(eas_id, zone_id)").alias("rep_v"),
        F.sum("eas_id").alias("add_v"),
    )
    prime = (f"element_at(array({_PRIMES}),"
             f" cast(((gy % {_T}) * {_T} + (gx % {_T})) % 11 + 1 as int))")
    return (per_px
            .withColumn("tx", F.expr(f"cast(floor(gx / {_T}) as bigint)"))
            .withColumn("ty", F.expr(f"cast(floor(gy / {_T}) as bigint)"))
            .groupBy("tx", "ty")
            .agg(F.expr(f"cast(sum(rep_v % {prime}) % 65536 as bigint)")
                 .alias("cs_replace"),
                 F.expr(f"cast(sum(add_v % {prime}) % 65536 as bigint)")
                 .alias("cs_add"),
                 F.count("*").alias("n_burned"))
            .select(F.lit(RASTERIZE_Z).alias("z"), "tx", "ty",
                    "cs_replace", "cs_add", "n_burned"))


def _rings_values(defs: list[dict]) -> str:
    rows = []
    for zone_id, eas_id, ri, lons, lats in _zone_rows(defs):
        ll = ", ".join(_fmt(v) for v in lons)
        la = ", ".join(_fmt(v) for v in lats)
        rows.append(f"({zone_id}, {eas_id}, {ri}, [{ll}], [{la}])")
    return (f"(values {', '.join(rows)})"
            f" as lr(zone_id, eas_id, ring_idx, lons, lats)")


def rasterize_lines_oracle_sql(defs: list[dict]) -> str:
    """DuckDB twin: identical floor/Bresenham/checksum arithmetic."""
    mx = _MX.format(v="v")
    my = _MY.format(v="v")
    # DuckDB lists are 1-based: vertex j (0-based Spark) = [j + 1]
    sql_seg = {
        "ix0": f"cast(floor((mxs[j + 1] - {_fmt(X0)}) / {_fmt(RES)})"
               f" as bigint)",
        "iy0": f"cast(floor(({_fmt(Y0)} - mys[j + 1]) / {_fmt(RES)})"
               f" as bigint)",
        "ix1": f"cast(floor((mxs[j + 2] - {_fmt(X0)}) / {_fmt(RES)})"
               f" as bigint)",
        "iy1": f"cast(floor(({_fmt(Y0)} - mys[j + 2]) / {_fmt(RES)})"
               f" as bigint)",
    }
    walk = "\n         ".join(
        f", {e} as {n}" for n, e in _WALK_COLS if n != "imax")
    mn_i = _minor("i")
    gx, gy = dict(_pix_cols("i"))["gx"], dict(_pix_cols("i"))["gy"]
    prime = (f"([{_PRIMES}])"
             f"[cast(((gy % {_T}) * {_T} + (gx % {_T})) % 11 + 1 as int)]")
    return f"""
with m as (
  select zone_id, eas_id, ring_idx,
         list_transform(lons, v -> {mx}) as mxs,
         list_transform(lats, v -> {my}) as mys
  from {_rings_values(defs)}
),
segs as (
  select zone_id, eas_id, mxs, mys, j,
         (j = len(mxs) - 2) as last,
         {sql_seg['ix0']} as ix0,
         {sql_seg['iy0']} as iy0,
         {sql_seg['ix1']} as ix1,
         {sql_seg['iy1']} as iy1
  from m, unnest(generate_series(0, len(mxs) - 2)) as t(j)
),
walk as (
  select zone_id, eas_id, ix0, iy0, last
         {walk}
  from segs
),
wseg as (
  select *, mj - (case when last then 0 else 1 end) as imax from walk
),
pix as (
  select zone_id, eas_id, {gx} as gx, {gy} as gy
  from wseg, unnest(generate_series(0, imax)) as t(i)
  where imax >= 0
),
clipped as (
  select * from pix
  where gx >= 0 and gx < {_NPX} and gy >= 0 and gy < {_NPX}
),
per_px as (
  select gx, gy, max_by(eas_id, zone_id) as rep_v, sum(eas_id) as add_v
  from clipped group by gx, gy
)
select {RASTERIZE_Z} as z,
       cast(floor(gx / {_T}) as bigint) as tx,
       cast(floor(gy / {_T}) as bigint) as ty,
       cast(sum(rep_v % {prime}) % 65536 as bigint) as cs_replace,
       cast(sum(add_v % {prime}) % 65536 as bigint) as cs_add,
       count(*) as n_burned
from per_px group by tx, ty
"""

"""ogrlineref — linear referencing: pickets at fixed steps along lines.

Replicates the reference's picket creation (apps/ogrlineref.cpp:733-775
"Create pickets": distances ceil(begin/step)·step, +step, ... <= end)
through OGRSimpleCurve::Value (ogr/ogrlinestring.cpp:2098): walk the
line's segments with cumulative PLANAR length, find the first segment
whose [cum, cum+len] interval contains the distance (zero-length
segments skipped), and linearly interpolate within it.

Spark-first shape: segments come from a posexplode over the vertex
arrays; the cumulative length is a WINDOW cumsum partitioned by line
(no shuffle beyond the per-line repartition, which any per-line
operator needs); pickets explode from a per-line `sequence`; the
picket→segment match is an equi-join on line id with the containment
range filter and a row_number tie-break to the FIRST containing
segment (the reference's loop order). No cross joins: every exchange
is keyed by line id. The identical SQL text runs under DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# shared expression text (both engines)
_SEG_LEN = "sqrt((bx - ax) * (bx - ax) + (by - ay) * (by - ay))"
_LERP_X = "ax * (1.0 - _ratio) + bx * _ratio"
_LERP_Y = "ay * (1.0 - _ratio) + by * _ratio"


def lineref_pickets(lines: DataFrame, step: float) -> DataFrame:
    """Pickets every ``step`` planar units along each line.

    ``lines``: (line_id bigint, xs array<double>, ys array<double>).
    Returns (line_id, m, x, y) where m is the picket distance."""
    segs = (lines
            .selectExpr("line_id", "xs", "ys",
                        "posexplode(slice(xs, 1, size(xs) - 1)) as (j, ax)")
            .selectExpr("line_id", "j", "ax",
                        "ys[j] as ay", "xs[j + 1] as bx", "ys[j + 1] as by")
            .selectExpr("line_id", "j", "ax", "ay", "bx", "by",
                        f"{_SEG_LEN} as seg_len")
            .filter("seg_len > 0"))
    segs = segs.selectExpr(
        "*",
        "sum(seg_len) over (partition by line_id order by j"
        " rows between unbounded preceding and 1 preceding) as _c")
    segs = segs.selectExpr(
        "line_id", "j", "ax", "ay", "bx", "by", "seg_len",
        "coalesce(_c, 0.0) as cum_before")
    totals = segs.groupBy("line_id").agg(
        F.expr("sum(seg_len)").alias("total_len"))
    pickets = totals.selectExpr(
        "line_id",
        f"explode(sequence(0, cast(floor(total_len / {step!r}) as int)))"
        f" as k").selectExpr("line_id", f"k * {step!r} as m")
    hit = (pickets.join(segs, "line_id")
           .filter("cum_before <= m and m <= cum_before + seg_len")
           .selectExpr(
               "line_id", "m", "ax", "ay", "bx", "by",
               "(m - cum_before) / seg_len as _ratio",
               "row_number() over (partition by line_id, m order by j)"
               " as _rn")
           .filter("_rn = 1"))
    return hit.selectExpr("line_id", "m",
                          f"{_LERP_X} as x", f"{_LERP_Y} as y")


def lineref_pickets_oracle_sql(lines_values: str, step: float) -> str:
    """DuckDB twin: identical cumsum/containment/lerp text.
    ``lines_values``: SQL producing (line_id, xs, ys) with list cols."""
    return f"""
with segs0 as (
  select line_id, xs[j + 1] as ax, ys[j + 1] as ay,
         xs[j + 2] as bx, ys[j + 2] as by, j
  from ({lines_values}) l,
       unnest(generate_series(0, len(xs) - 2)) as t(j)
),
segs1 as (
  select *, {_SEG_LEN} as seg_len from segs0 where {_SEG_LEN} > 0
),
segs as (
  select *, coalesce(sum(seg_len) over (partition by line_id order by j
           rows between unbounded preceding and 1 preceding), 0.0)
           as cum_before
  from segs1
),
totals as (
  select line_id, sum(seg_len) as total_len from segs group by line_id
),
pickets as (
  select line_id, k * {step!r} as m
  from totals, unnest(generate_series(
    0, cast(floor(total_len / {step!r}) as int))) as t(k)
),
hit as (
  select p.line_id, p.m, s.ax, s.ay, s.bx, s.by,
         (p.m - s.cum_before) / s.seg_len as _ratio,
         row_number() over (partition by p.line_id, p.m order by s.j)
           as _rn
  from pickets p join segs s on s.line_id = p.line_id
  where s.cum_before <= p.m and p.m <= s.cum_before + s.seg_len
)
select line_id, m, {_LERP_X} as x, {_LERP_Y} as y
from hit where _rn = 1
"""


# ---------------------------------------------------------------------------
# get_pos (apps/ogrlineref.cpp:983 GetPosition): measure of the point's
# projection onto the line — per segment t = clamp(((p−a)·(b−a))/|b−a|²),
# squared distance to the projected point, nearest segment wins (first
# segment on ties, the sequential scan's order), m = cum + t·seg_len.
# ---------------------------------------------------------------------------

_PROJ_T = ("greatest(0.0, least(1.0,"
           " ((px - ax) * (bx - ax) + (py - ay) * (by - ay))"
           " / (seg_len * seg_len)))")
_PROJ_D2 = ("(px - (ax + _t * (bx - ax))) * (px - (ax + _t * (bx - ax)))"
            " + (py - (ay + _t * (by - ay)))"
            " * (py - (ay + _t * (by - ay)))")


def lineref_project(points: DataFrame, lines: DataFrame) -> DataFrame:
    """Project points onto their line (equi-join on line_id): returns
    (pid, line_id, m, dist). ``points``: (pid, px, py, line_id);
    ``lines`` as in lineref_pickets."""
    segs = (lines
            .selectExpr("line_id", "xs", "ys",
                        "posexplode(slice(xs, 1, size(xs) - 1)) as (j, ax)")
            .selectExpr("line_id", "j", "ax",
                        "ys[j] as ay", "xs[j + 1] as bx", "ys[j + 1] as by")
            .selectExpr("line_id", "j", "ax", "ay", "bx", "by",
                        f"{_SEG_LEN} as seg_len")
            .filter("seg_len > 0"))
    segs = segs.selectExpr(
        "*",
        "coalesce(sum(seg_len) over (partition by line_id order by j"
        " rows between unbounded preceding and 1 preceding), 0.0)"
        " as cum_before")
    hit = (points.join(segs, "line_id")
           .selectExpr("pid", "line_id", "j", "px", "py", "cum_before",
                       "seg_len", f"{_PROJ_T} as _t", "ax", "ay", "bx",
                       "by")
           .selectExpr("pid", "line_id", "j", "cum_before", "seg_len",
                       "_t", f"{_PROJ_D2} as _d2")
           .selectExpr("pid", "line_id", "cum_before + _t * seg_len as m",
                       "sqrt(_d2) as dist",
                       "row_number() over (partition by pid"
                       " order by _d2, j) as _rn")
           .filter("_rn = 1"))
    return hit.select("pid", "line_id", "m", "dist")


def lineref_project_oracle_sql(points_sql: str, lines_values: str) -> str:
    """DuckDB twin of lineref_project. ``points_sql`` yields
    (pid, px, py, line_id)."""
    return f"""
with segs0 as (
  select line_id, xs[j + 1] as ax, ys[j + 1] as ay,
         xs[j + 2] as bx, ys[j + 2] as by, j
  from ({lines_values}) l,
       unnest(generate_series(0, len(xs) - 2)) as t(j)
),
segs1 as (
  select *, {_SEG_LEN} as seg_len from segs0 where {_SEG_LEN} > 0
),
segs as (
  select *, coalesce(sum(seg_len) over (partition by line_id order by j
           rows between unbounded preceding and 1 preceding), 0.0)
           as cum_before
  from segs1
),
proj as (
  select p.pid, p.line_id, s.j, s.cum_before, s.seg_len, {_PROJ_T} as _t,
         s.ax, s.ay, s.bx, s.by, p.px, p.py
  from ({points_sql}) p join segs s on s.line_id = p.line_id
),
scored as (
  select pid, line_id, j, cum_before, seg_len, _t, {_PROJ_D2} as _d2
  from proj
),
ranked as (
  select pid, line_id, cum_before + _t * seg_len as m, sqrt(_d2) as dist,
         row_number() over (partition by pid order by _d2, j) as _rn
  from scored
)
select pid, line_id, m, dist from ranked where _rn = 1
"""

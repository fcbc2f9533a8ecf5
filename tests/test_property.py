"""Property-based tests (hypothesis) over the pure geometry kernels.

The reference test suite is golden-assertion style (SURVEY §5 — no
property testing); these add the invariants golden cases can't sweep:
serialization round-trips over arbitrary coordinates, hull/clip
containment, simplify monotonicity. Pure numpy/python — no Spark
session, so the whole module runs in seconds.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gdal_spark import geom as G
from gdal_spark import wkb as W

coord = st.floats(min_value=-1e7, max_value=1e7,
                  allow_nan=False, allow_infinity=False)


def _close_ring(pts):
    arr = [list(p) for p in pts]
    arr.append(list(pts[0]))
    return np.asarray(arr, dtype=np.float64)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(coord, coord), min_size=1, max_size=40))
def test_wkb_roundtrip_linestring(pts):
    arr = np.asarray(pts, dtype=np.float64)
    g = W.loads(W.dumps_linestring(arr))
    assert g["type"] == "LineString"
    assert np.array_equal(np.asarray(g["coords"]), arr)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(coord, coord), min_size=3, max_size=20),
       st.lists(st.tuples(coord, coord), min_size=3, max_size=10))
def test_wkb_roundtrip_polygon_with_hole(outer, hole):
    rings = [_close_ring(outer), _close_ring(hole)]
    g = W.loads(W.dumps_polygon(rings))
    assert g["type"] == "Polygon" and len(g["coords"]) == 2
    for got, want in zip(g["coords"], rings):
        assert np.array_equal(np.asarray(got), want)


@settings(max_examples=100, deadline=None)
@given(st.tuples(coord, coord))
def test_wkb_point_roundtrip_bit_exact(p):
    x, y = p
    g = W.loads(W.dumps_point(x, y))
    # bit-exact round trip, including signed zeros
    assert math.copysign(1.0, g["coords"][0]) == math.copysign(1.0, x)
    assert g["coords"] == (x, y)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(coord, coord), min_size=1, max_size=15))
def test_wkt_roundtrip_linestring(pts):
    arr = np.asarray(pts, dtype=np.float64)
    text = W.wkt_dumps({"type": "LineString", "coords": arr})
    g = W.wkt_loads(text)
    assert g["type"] == "LineString"
    # repr round-trip: shortest-repr floats parse back exactly
    assert np.array_equal(np.asarray(g["coords"]), arr)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(coord, coord), min_size=3, max_size=60))
def test_convex_hull_contains_all_points(pts):
    from gdal_spark.constructive import convex_hull_pts

    arr = np.asarray(pts, dtype=np.float64)
    hull = convex_hull_pts(arr)
    assert len(hull) >= 1
    if len(hull) < 3:
        return  # degenerate (collinear/duplicate) input
    # every input point is inside or on the hull: all cross products of
    # (edge, point) are >= -eps for a CCW hull
    closed = np.vstack([hull, hull[:1]])
    e = np.diff(closed, axis=0)
    scale = max(1.0, float(np.abs(arr).max())) ** 2
    for p in arr:
        v = p[None, :] - closed[:-1]
        cross = e[:, 0] * v[:, 1] - e[:, 1] * v[:, 0]
        assert (cross >= -1e-9 * scale).all()


@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(coord, coord), min_size=4, max_size=30),
       st.floats(min_value=1e-6, max_value=1e6, allow_nan=False))
def test_simplify_keeps_endpoints_and_shrinks(pts, tol):
    from gdal_spark.constructive import simplify_ring

    ring = _close_ring(pts)
    out = simplify_ring(ring, tol)
    # closed, endpoints preserved, never more vertices than input
    assert np.array_equal(out[0], ring[0])
    assert np.array_equal(out[-1], ring[-1])
    assert len(out) <= len(ring)
    # idempotent at the same tolerance
    again = simplify_ring(out, tol)
    assert len(again) == len(out)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.tuples(st.floats(-100, 100), st.floats(-100, 100)),
                min_size=3, max_size=12),
       st.tuples(st.floats(-120, 120), st.floats(-120, 120)))
def test_pip_matches_independent_crossing_count(pts, q):
    """points_in_ring parity must equal a from-scratch crossing count."""
    ring = _close_ring(pts)
    qx, qy = q
    got = bool(G.points_in_ring(
        np.asarray([qx]), np.asarray([qy]), ring)[0])
    c = 0
    for i in range(len(ring) - 1):
        (x0, y0), (x1, y1) = ring[i], ring[i + 1]
        if (y0 > qy) != (y1 > qy) \
                and qx < (x1 - x0) * (qy - y0) / (y1 - y0) + x0:
            c += 1
    assert got == (c % 2 == 1)


# Adversarial page text for the HTML round-trip: printable ASCII plus
# the exact sequences that could break a naive extractor — literal
# tags, entity spellings, the raw escape characters, newlines.
_html_hostile = st.lists(
    st.sampled_from(
        list("abcdefghij <>&;/\"'=\n") + ["</p>", "<script>", "&amp;",
                                          "&lt;", "<!--", "-->"]),
    min_size=0, max_size=120,
).map("".join)


@settings(max_examples=60, deadline=None)
@given(_html_hostile)
def test_html_extract_roundtrip_hostile_text(spark, text):
    """crawl_html_extract's byte-identical invariant holds for text
    containing literal tags, comment markers, entity spellings and raw
    '&<>' — the escape/strip/unescape pipeline must be exactly
    inverse regardless of content."""
    import gdal_spark.textops as textops

    spark.createDataFrame(
        [(1, text, "en")], "doc_id long, text string, lang string") \
        .createOrReplaceTempView("documents")
    r = spark.sql(textops.html_extract_sql(
        "documents", textops.SPARK)).collect()[0]
    assert r.byte_identical, repr(text)

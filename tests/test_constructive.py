"""Constructive geometry kernels vs independent invariants (no shared
code with the kernels: brute-force containment, deviation bounds, area
identities)."""

import numpy as np
import pytest

from gdal_spark import geom as G
from gdal_spark import wkb as W
from gdal_spark.constructive import (DIAMOND, UNION_L, UNION_RECT,
                                     UNION_SQUARE, buffer_geom,
                                     convex_hull_pts, hull_cloud,
                                     make_valid_rings, simplify_ring,
                                     union_pair)


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def test_hull_contains_all_points_and_is_convex():
    pts = hull_cloud()
    ring = convex_hull_pts(pts)
    v = ring[:-1]
    n = len(v)
    # convex + CCW: every consecutive triple turns left
    for i in range(n):
        assert _cross(v[i], v[(i + 1) % n], v[(i + 2) % n]) > 0
    # every input point on or inside every hull edge half-plane
    for p in pts:
        for i in range(n):
            assert _cross(v[i], v[(i + 1) % n], p) >= 0
    # hull vertices are input points
    ptset = {tuple(p) for p in pts}
    assert all(tuple(q) in ptset for q in v)


def test_hull_random_agrees_with_brute_force_extremes():
    rng = np.random.RandomState(7)
    pts = rng.randint(-50, 50, size=(200, 2)).astype(float)
    ring = convex_hull_pts(pts)
    v = ring[:-1]
    for p in pts:
        for i in range(len(v)):
            assert _cross(v[i], v[(i + 1) % len(v)], p) >= 0
    for ext in (pts[np.argmin(pts[:, 0])], pts[np.argmax(pts[:, 0])]):
        # an x-extreme point is on the hull boundary (some edge collinear)
        assert any(
            _cross(v[i], v[(i + 1) % len(v)], ext) == 0
            for i in range(len(v)))


def test_buffer_contains_input_and_respects_distance():
    square = np.asarray([(0.0, 0.0), (10.0, 0.0), (10.0, 10.0),
                         (0.0, 10.0), (0.0, 0.0)])
    g = buffer_geom({"type": "Polygon", "coords": [square]}, 2.0, 4)
    ring = g["coords"][0]
    # buffered region contains every input vertex with margin
    for p in square[:-1]:
        assert G.points_in_ring(np.asarray([p[0]]), np.asarray([p[1]]),
                                ring)[0]
    # every buffer vertex is within dist of the square boundary (and at
    # least dist * cos(pi / (2*quadsegs)) away — chord sagitta bound)
    for q in ring[:-1]:
        d = min(np.sqrt(G.point_segment_dist2(
            q[0], q[1], *square[i], *square[i + 1]))
            for i in range(4))
        assert d <= 2.0 + 1e-12
        assert d >= 2.0 * np.cos(np.pi / 8) - 1e-12


def test_point_buffer_regular_polygon():
    g = buffer_geom({"type": "Point", "coords": (3.0, -2.0)}, 5.0, 8)
    ring = g["coords"][0]
    assert len(ring) == 33
    r = np.hypot(ring[:-1, 0] - 3.0, ring[:-1, 1] + 2.0)
    assert np.allclose(r, 5.0, atol=1e-12)


def test_simplify_deviation_bound_and_vertex_subset():
    rng = np.random.RandomState(3)
    theta = np.sort(rng.uniform(0, 2 * np.pi, 60))
    rad = 10.0 + rng.uniform(-0.3, 0.3, 60)
    ring = np.column_stack([rad * np.cos(theta), rad * np.sin(theta)])
    ring = np.vstack([ring, ring[:1]])
    tol = 1.0
    out = simplify_ring(ring, tol)
    assert np.array_equal(out[0], out[-1])
    kept = {tuple(p) for p in out}
    assert kept <= {tuple(p) for p in ring}
    # every dropped vertex lies within tol of the simplified boundary
    for p in ring[:-1]:
        if tuple(p) in kept:
            continue
        d = min(np.sqrt(G.point_segment_dist2(
            p[0], p[1], out[i, 0], out[i, 1], out[i + 1, 0],
            out[i + 1, 1])) for i in range(len(out) - 1))
        assert d <= tol + 1e-9


def test_make_valid_repairs():
    outer = np.asarray([(0.0, 0.0), (0.0, 6.0), (0.0, 6.0), (9.0, 6.0),
                        (9.0, 0.0)])  # CW, dup, unclosed
    hole = np.asarray([(2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0),
                       (2.0, 2.0)])  # CCW (wrong for a hole)
    degen = np.asarray([(5.0, 5.0), (5.0, 5.0), (6.0, 6.0)])
    rings = make_valid_rings([outer, hole, degen])
    assert len(rings) == 2
    assert G.ring_area(rings[0]) > 0          # exterior now CCW
    assert G.ring_area(rings[1]) < 0          # hole now CW
    assert np.array_equal(rings[0][0], rings[0][-1])
    assert len(rings[0]) == 5                 # dup dropped + closed
    assert G.polygon_area(rings) == pytest.approx(50.0)


@pytest.mark.parametrize("a,b,expected", [
    (UNION_L, UNION_RECT, 55.0),
    (UNION_SQUARE, DIAMOND, 156.0),
])
def test_union_area_and_disjoint_traps(a, b, expected):
    ra = [np.asarray(a, dtype=np.float64)]
    rb = [np.asarray(b, dtype=np.float64)]
    traps = union_pair(ra, rb)
    area = sum(abs(G.ring_area(t)) for t in traps)
    assert area == pytest.approx(expected, abs=1e-9)
    # traps are pairwise interior-disjoint: sampled interior points of
    # one trap are never strictly inside another
    for i, t in enumerate(traps):
        cx = t[:-1, 0].mean()
        cy = t[:-1, 1].mean()
        for j, u in enumerate(traps):
            if i == j:
                continue
            inside = G.points_in_ring(np.asarray([cx]), np.asarray([cy]),
                                      u)[0]
            # centroid may sit on a shared boundary; strict-inside check
            minx, maxx = u[:, 0].min(), u[:, 0].max()
            strictly = inside and minx < cx < maxx
            assert not strictly
    # union covers both inputs: every input vertex is in some trap's
    # closure
    for p in list(ra[0][:-1]) + list(rb[0][:-1]):
        assert any(
            u[:, 0].min() - 1e-9 <= p[0] <= u[:, 0].max() + 1e-9
            and u[:, 1].min() - 1e-9 <= p[1] <= u[:, 1].max() + 1e-9
            for u in traps)


def test_union_with_hole_even_odd():
    outer = np.asarray([(0.0, 0.0), (12.0, 0.0), (12.0, 12.0),
                        (0.0, 12.0), (0.0, 0.0)])
    hole = np.asarray([(4.0, 4.0), (8.0, 4.0), (8.0, 8.0), (4.0, 8.0),
                       (4.0, 4.0)])
    other = np.asarray([(5.0, 5.0), (7.0, 5.0), (7.0, 7.0), (5.0, 7.0),
                        (5.0, 5.0)])
    traps = union_pair([outer, hole], [other])
    area = sum(abs(G.ring_area(t)) for t in traps)
    # 144 - 16 (hole) + 4 (small square floats inside the hole)
    assert area == pytest.approx(132.0, abs=1e-9)


def test_st_constructive_sql_surface(spark):
    from gdal_spark.constructive import constructive_cases

    res = {(r["case_id"]): (r["area"], r["npoints"])
           for r in constructive_cases(spark).collect()}
    assert res[1] == (160.0, 9)
    assert res[4] == (240.0, 5)
    assert res[5] == (50.0, 10)
    assert res[6][0] == 55.0
    assert res[7][0] == 156.0
    assert res[8] == (144.0, 5)


def test_concave_hull_properties(spark):
    """ST_ConcaveHull (ogrgeometry.cpp:4305, GEOS chi-shape semantics):
    ratio=1 equals the convex hull; area is monotone non-increasing in
    ratio; every input point stays inside or on the hull; the SQL
    registration round-trips."""
    from gdal_spark.delaunay import concave_hull, scatter_points
    from gdal_spark.constructive import convex_hull_pts
    from gdal_spark.stfuncs import register_st_functions

    pts = scatter_points()[:, :2]
    assert abs(G.ring_area(concave_hull(pts, 1.0))) == pytest.approx(
        abs(G.ring_area(convex_hull_pts(pts))), abs=1e-12)
    prev = None
    for r in [1.0, 0.6, 0.3, 0.0]:
        h = concave_hull(pts, r)
        a = abs(G.ring_area(h))
        assert prev is None or a <= prev + 1e-12
        prev = a
        inside = G.points_in_ring(pts[:, 0], pts[:, 1], h)
        on_edge = np.zeros(len(pts), bool)
        for i in range(len(h) - 1):
            ax, ay = h[i]
            bx, by = h[i + 1]
            cross = (bx - ax) * (pts[:, 1] - ay) \
                - (by - ay) * (pts[:, 0] - ax)
            dot = (pts[:, 0] - ax) * (bx - ax) \
                + (pts[:, 1] - ay) * (by - ay)
            ll = (bx - ax) ** 2 + (by - ay) ** 2
            on_edge |= (np.abs(cross) < 1e-12) & (dot >= -1e-12) \
                & (dot <= ll + 1e-12)
        assert (inside | on_edge).all()
    # SQL surface: hull area via the registry, vs the direct kernel
    register_st_functions(spark)
    mp = W.dumps_multi("MultiPoint", [W.dumps_point(float(x), float(y))
                                      for x, y in pts])
    got = spark.createDataFrame([(bytearray(mp),)], "g binary") \
        .selectExpr("st_area(st_concavehull(g, 0.3e0)) as a") \
        .collect()[0]["a"]
    assert got == pytest.approx(abs(G.ring_area(concave_hull(pts, 0.3))),
                                abs=1e-9)


def test_buffer_segment_endcap_closed_forms():
    """Endcap styles on an exact segment: flat = 2rL, square = 2r(L+2r),
    round = 2rL + 2q·r²·sin(π/(2q)) (two 2q-chord semicircle fans)."""
    import math

    import numpy as np

    from gdal_spark import geom as G
    from gdal_spark.constructive import buffer_segment

    L, r = 30.0, 4.0
    for q in (1, 2, 3, 8):
        flat = buffer_segment((0, 0), (L, 0), r, q, "flat")
        assert abs(G.ring_area(flat)) == 2 * r * L
        sq = buffer_segment((0, 0), (L, 0), r, q, "square")
        assert abs(G.ring_area(sq)) == 2 * r * (L + 2 * r)
        rnd = buffer_segment((0, 0), (L, 0), r, q, "round")
        want = 2 * r * L + 2 * q * r * r * math.sin(math.pi / (2 * q))
        assert abs(abs(G.ring_area(rnd)) - want) < 1e-9
        assert len(rnd) == 4 + 2 * (2 * q - 1) + 1
    # a diagonal segment: area invariant under rotation
    diag = buffer_segment((1, 1), (1 + 18, 1 + 24), r, 2, "square")
    assert abs(abs(G.ring_area(diag)) - 2 * r * (30.0 + 2 * r)) < 1e-9


def test_buffer_polygon_join_styles():
    """Join styles on a square: mitre = (a+2r)², bevel = a²+4ar+2r²,
    mitre beyond the limit falls back to bevel, round q-fan matches
    the wedge closed form."""
    import math

    import numpy as np

    from gdal_spark import geom as G
    from gdal_spark.constructive import buffer_geom_styled

    a, r = 20.0, 4.0
    sq = {"type": "Polygon", "coords": [np.array(
        [(0.0, 0.0), (a, 0.0), (a, a), (0.0, a), (0.0, 0.0)])]}
    mit = buffer_geom_styled(sq, r, 2, "mitre", 5.0)
    assert abs(abs(G.ring_area(np.asarray(mit["coords"][0])))
               - (a + 2 * r) ** 2) < 1e-9
    bev = buffer_geom_styled(sq, r, 2, "bevel", 5.0)
    assert abs(abs(G.ring_area(np.asarray(bev["coords"][0])))
               - (a * a + 4 * a * r + 2 * r * r)) < 1e-9
    # right-angle mitre ratio is √2 ≈ 1.414 — limit 1.2 must bevel
    lim = buffer_geom_styled(sq, r, 2, "mitre", 1.2)
    assert abs(abs(G.ring_area(np.asarray(lim["coords"][0])))
               - (a * a + 4 * a * r + 2 * r * r)) < 1e-9
    rnd = buffer_geom_styled(sq, r, 3, "round", 5.0)
    want = a * a + 4 * a * r + 4 * (3 / 2) * r * r * math.sin(math.pi / 6)
    assert abs(abs(G.ring_area(np.asarray(rnd["coords"][0]))) - want) < 1e-9


def test_simplify_preserve_topology_repairs_crossing():
    """A fixture where plain Douglas–Peucker produces a SELF-CROSSING
    ring: SimplifyPreserveTopology restores the minimal vertex set that
    keeps the ring simple (GEOS TopologyPreservingSimplifier
    behavior)."""
    import numpy as np

    from gdal_spark.constructive import (_ring_is_simple, simplify_ring,
                                         simplify_ring_preserve)

    ring = np.asarray(
        [[4.837, 5.718], [4.346, 5.588], [2.417, 3.12], [1.527, 2.176],
         [4.051, 6.066], [1.41, 3.682], [-5.864, 7.848], [-6.735, 3.456],
         [-4.305, 1.216], [-9.694, 2.449], [-2.207, -0.037],
         [3.892, -0.356], [4.837, 5.718]])
    assert _ring_is_simple(ring)
    plain = simplify_ring(ring, 1.0)
    assert not _ring_is_simple(plain)          # the DP hazard is real
    fixed = simplify_ring_preserve(ring, 1.0)
    assert _ring_is_simple(fixed)
    assert len(fixed) <= len(ring)             # still simplifies


def test_simplify_preserve_topology_degenerate_restore():
    """Huge tolerance degenerates plain DP below a ring; preserve
    restores the max-deviation vertex → a simple triangle."""
    import numpy as np

    from gdal_spark import geom as G
    from gdal_spark.constructive import (_ring_is_simple,
                                         simplify_ring_preserve)

    a = 20.0
    sq = np.array([(0.0, 0.0), (a, 0.0), (a, a), (0.0, a), (0.0, 0.0)])
    out = simplify_ring_preserve(sq, 100.0)
    assert _ring_is_simple(out) and len(out) == 4
    assert abs(abs(G.ring_area(out)) - a * a / 2) < 1e-9


def test_segmentize_reference_properties():
    """Independent checks of the segmentize rule (not the shared SQL):
    every output segment ≤ maxlen (+GDAL's epsilon slack), original
    vertices survive in order, inserted points are evenly spaced and
    collinear, length is invariant, and the result is direction-stable
    (GDAL reverses internally so both directions agree)."""
    import numpy as np

    from gdal_spark.constructive import segmentize_coords

    rng = np.random.RandomState(7)
    for _ in range(30):
        n = rng.randint(2, 7)
        pts = np.round(rng.uniform(-20, 20, (n, 2)) * 4) / 4  # dyadic
        m = float(rng.choice([1.0, 2.5, 5.0]))
        out = segmentize_coords(pts, m)
        # direction stability
        out_rev = segmentize_coords(pts[::-1], m)
        assert np.array_equal(out, out_rev[::-1])
        # originals survive in order
        oi = 0
        for p in pts:
            while oi < len(out) and not np.array_equal(out[oi], p):
                oi += 1
            assert oi < len(out), p
        # segment bound (epsilon slack per the reference's floor - 0.01)
        d = np.hypot(*(out[1:] - out[:-1]).T)
        assert (d <= m * 1.01 + 1e-9).all()
        # length invariant
        d0 = np.hypot(*(pts[1:] - pts[:-1]).T).sum()
        assert abs(d.sum() - d0) < 1e-9


def test_wrapdateline_reference_goldens():
    """Exact-coordinate parity with the reference's own test goldens
    (autotest/ogr/ogr_geom.py::test_ogr_geomtransfomer_wrapdateline_*):
    the no-CT linestring split and the multipoint wrap, plus the ±360
    whole-geometry shifts and the offset-dependent gap rule."""
    import numpy as np

    from gdal_spark.constructive import wrap_dateline_geom

    g = wrap_dateline_geom(
        {"type": "LineString", "coords": [(-179.0, 0.0), (179.0, 0.0)]})
    assert g["type"] == "MultiLineString"
    assert [c.tolist() for c in g["coords"]] == [
        [[-179.0, 0.0], [-180.0, 0.0]], [[180.0, 0.0], [179.0, 0.0]]]
    g2 = wrap_dateline_geom(
        {"type": "MultiPoint",
         "coords": [(-179.0, 0.0), (179.0, 0.0), (-182.0, 0.0),
                    (182.0, 0.0)]})
    assert g2["coords"] == [(-179.0, 0.0), (179.0, 0.0), (178.0, 0.0),
                            (-178.0, 0.0)]
    # whole-geometry shifts
    g3 = wrap_dateline_geom(
        {"type": "LineString", "coords": [(182.0, 1.0), (185.0, 2.0)]})
    assert g3["type"] == "LineString"
    assert np.allclose(g3["coords"], [(-178.0, 1.0), (-175.0, 2.0)])
    # a 340-degree jump is a long line at offset 10, a crossing at 30
    line = {"type": "LineString",
            "coords": [(170.0, 0.0), (-170.0, 2.0)]}
    assert wrap_dateline_geom(line, 10.0)["type"] == "LineString"
    g7 = wrap_dateline_geom(line, 30.0)
    assert g7["type"] == "MultiLineString"
    assert [c.tolist() for c in g7["coords"]] == [
        [[170.0, 0.0], [180.0, 1.0]], [[-180.0, 1.0], [-170.0, 2.0]]]
    # polygons need GEOS in the reference too
    import pytest

    with pytest.raises(NotImplementedError):
        wrap_dateline_geom({"type": "Polygon", "coords": [
            np.array([(179.0, 0.0), (181.0, 0.0), (181.0, 1.0),
                      (179.0, 0.0)])]})

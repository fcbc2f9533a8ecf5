"""Geometry predicate suite: exact integer DE-9IM-style decisions.

Expectations below are hand-derived from the fixture geometry (the same
method as autotest/ogr/ogr_sql_sqlite.py's inline ST_ expectations), so
the test is independent of both the kernel and the oracle SQL.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark import wkb as W
from gdal_spark.predicates import (line_crosses_polygon, pair_predicates,
                                   predicate_defs, predicate_pairs,
                                   predicates_oracle_sql)

# (zone_a, zone_b) -> the single "headline" predicate that must hold
EXPECT = {
    (0, 100): "overlaps",
    (0, 101): "disjoint",
    (2, 102): "equals_",
    (3, 103): "contains",
    (4, 104): "disjoint",   # method polygon sits inside the hole
    (1, 105): "contains",   # inscribed diamond: vertices all on boundary
    (6, 106): "touches",    # shared full edge
    (2, 107): "touches",    # shared single vertex
    (5, 108): "overlaps",   # non-convex star
}

_MUTEX = ["disjoint", "touches", "overlaps", "equals_"]


def test_pair_predicates_matrix():
    defs_a, defs_b = predicate_defs()
    by_a = {z["zone_id"]: z for z in defs_a}
    by_b = {z["zone_id"]: z for z in defs_b}
    for (za, zb), headline in EXPECT.items():
        p = pair_predicates(by_a[za]["rings"], by_b[zb]["rings"])
        assert p[headline], (za, zb, headline, p)
        # mutual exclusion between the headline classes
        for other in _MUTEX:
            if other != headline:
                assert not p[other], (za, zb, other, p)
        assert p["intersects"] != p["disjoint"]
        if headline == "equals_":
            assert p["within"] and p["contains"]
        if headline == "contains":
            assert p["intersects"] and not p["within"]


def test_contract_query_matches_oracle(spark, ddb):
    sdf = predicate_pairs(spark).toPandas()
    odf = ddb.execute(predicates_oracle_sql()).df()
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(cols).reset_index(drop=True)
    b = odf[cols].sort_values(cols).reset_index(drop=True)
    assert a.shape == b.shape == (len(EXPECT), 9)
    for c in cols:
        assert a[c].map(str).tolist() == b[c].map(str).tolist(), c
    plan = predicate_pairs(spark)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_line_crosses_polygon():
    square = [np.asarray([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)],
                         dtype=np.float64)]
    through = np.asarray([(-1, 2), (5, 2)], dtype=np.float64)
    inside = np.asarray([(1, 1), (3, 3)], dtype=np.float64)
    outside = np.asarray([(-2, -2), (-1, -2)], dtype=np.float64)
    touch_edge = np.asarray([(0, 1), (0, 3)], dtype=np.float64)
    assert line_crosses_polygon(through, square)
    assert not line_crosses_polygon(inside, square)   # within, not crosses
    assert not line_crosses_polygon(outside, square)
    assert not line_crosses_polygon(touch_edge, square)
    # exits through a vertex: interior and exterior points exist
    diag = np.asarray([(2, 2), (6, 6)], dtype=np.float64)
    assert line_crosses_polygon(diag, square)


def test_wkt_roundtrip():
    geoms = [
        {"type": "Point", "coords": (1.5, -2.0)},
        {"type": "LineString",
         "coords": np.asarray([(0, 0), (1.25, 2.5)], dtype=np.float64)},
        {"type": "Polygon",
         "coords": [np.asarray([(0, 0), (2, 0), (2, 2), (0, 0)],
                               dtype=np.float64)]},
    ]
    for g in geoms:
        txt = W.wkt_dumps(g)
        back = W.wkt_loads(txt)
        assert back["type"] == g["type"]
        assert W.wkt_dumps(back) == txt
    wkt = W.wkt_dumps(W.loads(W.dumps_polygon(
        [[(10.0, 0.0), (12.0, 0.0), (12.0, 2.0), (10.0, 0.0)]])))
    assert wkt == "POLYGON ((10 0, 12 0, 12 2, 10 0))"


@pytest.mark.parametrize("za,zb", sorted(EXPECT))
def test_udf_surface_matches_kernel(spark, za, zb):
    """st_intersects/... registered functions agree with pair_predicates."""
    from gdal_spark.predicates import PREDICATE_COLS, register_predicates

    defs_a, defs_b = predicate_defs()
    ra = next(z for z in defs_a if z["zone_id"] == za)["rings"]
    rb = next(z for z in defs_b if z["zone_id"] == zb)["rings"]
    register_predicates(spark)
    df = spark.createDataFrame(
        [(bytearray(W.dumps_polygon([r.tolist() for r in ra])),
          bytearray(W.dumps_polygon([r.tolist() for r in rb])))],
        "wa binary, wb binary")
    df.createOrReplaceTempView("pp")
    row = spark.sql(
        "select st_intersects(wa, wb) as intersects,"
        " st_disjoint(wa, wb) as disjoint, st_equals(wa, wb) as equals_,"
        " st_within(wa, wb) as within, st_contains(wa, wb) as contains,"
        " st_touches(wa, wb) as touches, st_overlaps(wa, wb) as overlaps"
        " from pp").collect()[0]
    want = pair_predicates(ra, rb)
    for c in PREDICATE_COLS:
        assert row[c] == want[c], c

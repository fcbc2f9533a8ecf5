"""Line clipping (ogr2ogr -clipsrc for lines): Cyrus–Beck semantics."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark import geom as G
from gdal_spark.lineclip import (SPARK, clip_lines, clip_segment_np,
                                 segments_sql)
from gdal_spark.zones import zone_defs

SQ = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)


def test_clip_segment_np_cases():
    # crossing segment: enters at t=0.25, leaves at t=0.75
    assert clip_segment_np((-2, 2), (6, 2), SQ) == (0.25, 0.75)
    # fully inside
    assert clip_segment_np((1, 1), (3, 3), SQ) == (0.0, 1.0)
    # fully outside, parallel to an edge
    assert clip_segment_np((-1, 5), (5, 5), SQ) is None
    # touching a corner only → degenerate → dimension-drop
    assert clip_segment_np((4, 8), (8, 4), SQ) is None
    # grazing along an edge (on the boundary): kept as a 1-D piece
    res = clip_segment_np((-2, 0), (6, 0), SQ)
    assert res == (0.25, 0.75)


def test_clip_lines_engine_matches_numpy(spark):
    sf = "/root/testdata/sf0.001"
    defs = zone_defs()
    out = clip_lines(spark, sf, defs).collect()
    assert len(out) > 0
    segs = {r["seg_id"]: r for r in spark.sql(segments_sql(SPARK)).collect()}
    for r in out:
        s = segs[r["seg_id"]]
        ring = next(z for z in defs
                    if z["zone_id"] == r["zone_id"])["rings"][0]
        res = clip_segment_np((float(s["x0"]), float(s["y0"])),
                              (float(s["x1"]), float(s["y1"])), ring)
        assert res is not None
        t0, t1 = res
        assert abs(t0 - r["t0"]) < 1e-9 and abs(t1 - r["t1"]) < 1e-9
        seg_len = np.hypot(float(s["x1"]) - float(s["x0"]),
                           float(s["y1"]) - float(s["y0"]))
        assert abs(r["clip_len"] - seg_len * (t1 - t0)) < 1e-9
        assert 0.0 <= r["t0"] < r["t1"] <= 1.0


def test_dimension_drop_excludes_degenerate(spark):
    """Every emitted piece has strictly positive length — the drop rule
    (ogr2ogr_lib.cpp:6917) holds by construction (t1 > t0 strict)."""
    out = clip_lines(spark, "/root/testdata/sf0.001", zone_defs()).collect()
    assert all(r["clip_len"] > 0 for r in out)

"""Polygon×polygon layer algebra: convex overlay vs Sutherland–Hodgman.

Golden style per SURVEY §5 (ogr_layer_algebra.py analogues): the
relational candidate-vertex overlay must agree with the independent
numpy clip, and the inclusion–exclusion identities must hold.
"""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark import geom as G
from gdal_spark.layer_algebra import (clip_convex_np, overlay_areas,
                                      shift_defs)
from gdal_spark.zones import zone_defs


@pytest.fixture(scope="module")
def overlay(spark):
    defs = zone_defs()
    return (defs, shift_defs(defs, 0.31, 0.17),
            overlay_areas(spark, defs, shift_defs(defs, 0.31, 0.17))
            .toPandas())


def test_overlay_matches_sutherland_hodgman(overlay):
    da, db, res = overlay
    assert len(res) >= 10
    for _, r in res.iterrows():
        ra = next(z for z in da if z["zone_id"] == r["zone_a"])["rings"][0]
        rb = next(z for z in db if z["zone_id"] == r["zone_b"])["rings"][0]
        clip = clip_convex_np(ra, rb)
        sh = abs(G.ring_area(clip)) if len(clip) else 0.0
        assert abs(sh - r["inter_area"]) < 1e-12, (r["zone_a"], r["zone_b"])


def test_overlay_inclusion_exclusion(overlay):
    da, db, res = overlay
    for _, r in res.iterrows():
        aa = next(z for z in da if z["zone_id"] == r["zone_a"])
        ab = next(z for z in db if z["zone_id"] == r["zone_b"])
        a_area = G.polygon_area(aa["rings"])
        b_area = G.polygon_area(ab["rings"])
        assert r["union_area"] == a_area + b_area - r["inter_area"]
        assert r["symdiff_area"] == a_area + b_area - 2 * r["inter_area"]
        assert r["erase_a_area"] == a_area - r["inter_area"]
        assert r["inter_area"] <= min(a_area, b_area) + 1e-12


def test_clip_convex_np_identities():
    sq = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    tri = np.array([[2, 2], [6, 2], [2, 6], [2, 2]], dtype=float)
    out = clip_convex_np(tri, sq)
    # triangle ∩ square = the full [2,4]² corner (hypotenuse x+y=8 grazes
    # the corner at (4,4)) → area 4
    assert abs(abs(G.ring_area(out)) - 4.0) < 1e-12
    # clip fully inside → unchanged area
    small = np.array([[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]], dtype=float)
    assert abs(abs(G.ring_area(clip_convex_np(small, sq))) - 1.0) < 1e-12
    # disjoint → empty
    far = small + 10.0
    assert len(clip_convex_np(far, sq)) == 0


def test_identity_update_against_numpy(spark):
    """Identity/Update accounting (ogrlayer.cpp:4730/:5148): pieces must
    match per-pair Sutherland–Hodgman areas; pieces + remainder = area_a;
    remainder = input − union(method) for the disjoint method layer."""
    from gdal_spark.layer_algebra import (disjoint_method_defs,
                                          identity_update)

    defs = zone_defs()
    method = disjoint_method_defs(shift_defs(defs, 0.31, 0.17))
    assert 1 <= len(method) < len(defs) + 1
    res = identity_update(spark, defs, method).toPandas()
    assert len(res) >= 5
    for _, r in res.iterrows():
        za = next(z for z in defs if z["zone_id"] == r["zone_a"])
        ra = za["rings"][0]
        pieces = 0.0
        n_pieces = 0
        for m in method:
            clip = clip_convex_np(ra, m["rings"][0])
            a = abs(G.ring_area(clip)) if len(clip) else 0.0
            if a > 0:
                pieces += a
                n_pieces += 1
        assert abs(pieces - r["pieces_area"]) < 1e-10
        assert r["n_pieces"] == n_pieces
        assert abs(r["pieces_area"] + r["remainder_area"]
                   - r["area_a"]) < 1e-12
        assert abs(r["area_a"] - G.polygon_area(za["rings"])) < 1e-12


def test_disjoint_method_defs_are_disjoint():
    from gdal_spark.layer_algebra import disjoint_method_defs

    method = disjoint_method_defs(shift_defs(zone_defs(), 0.31, 0.17))
    for i, a in enumerate(method):
        for b in method[i + 1:]:
            ba, bb = G.rings_bbox(a["rings"]), G.rings_bbox(b["rings"])
            assert not (ba[0] <= bb[2] and bb[0] <= ba[2]
                        and ba[1] <= bb[3] and bb[1] <= ba[3])

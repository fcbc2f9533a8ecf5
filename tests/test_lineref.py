"""ogrlineref pickets — OGRSimpleCurve::Value parity + shape checks."""

import math

import pandas as pd


def _value_ref(xs, ys, d):
    """Literal transcription of OGRSimpleCurve::Value
    (ogr/ogrlinestring.cpp:2098): first containing segment, lerp,
    clamp to endpoints."""
    if d < 0:
        return xs[0], ys[0]
    length = 0.0
    for i in range(len(xs) - 1):
        seg = math.hypot(xs[i + 1] - xs[i], ys[i + 1] - ys[i])
        if seg > 0:
            if length <= d <= length + seg:
                r = (d - length) / seg
                return (xs[i] * (1 - r) + xs[i + 1] * r,
                        ys[i] * (1 - r) + ys[i + 1] * r)
            length += seg
    return xs[-1], ys[-1]


def test_pickets_match_value_reference(spark):
    from gdal_spark.lineref import lineref_pickets

    xs = [0.0, 10.0, 10.0, 13.0, 13.0]   # incl. a zero-length segment
    ys = [0.0, 0.0, 5.0, 5.0, 5.0]
    lines = spark.createDataFrame(
        pd.DataFrame({"line_id": [1], "xs": [xs], "ys": [ys]}))
    step = 2.5
    got = {r["m"]: (r["x"], r["y"])
           for r in lineref_pickets(lines, step).collect()}
    total = 10.0 + 5.0 + 3.0
    expect_ms = [k * step for k in range(int(total / step) + 1)]
    assert sorted(got) == expect_ms
    for m in expect_ms:
        ex, ey = _value_ref(xs, ys, m)
        assert abs(got[m][0] - ex) < 1e-12 and abs(got[m][1] - ey) < 1e-12, m


def test_picket_on_vertex_takes_first_segment(spark):
    """A picket landing exactly on a shared vertex is claimed by the
    EARLIER segment (the reference loop's first-match order) — same
    coordinates either way, but the tie rule is pinned."""
    from gdal_spark.lineref import lineref_pickets

    lines = spark.createDataFrame(
        pd.DataFrame({"line_id": [1],
                      "xs": [[0.0, 4.0, 8.0]], "ys": [[0.0, 0.0, 0.0]]}))
    got = {r["m"]: (r["x"], r["y"])
           for r in lineref_pickets(lines, 4.0).collect()}
    assert got == {0.0: (0.0, 0.0), 4.0: (4.0, 0.0), 8.0: (8.0, 0.0)}


def test_project_reference_parity(spark):
    """lineref_project vs a literal segment-scan reference (clamped
    projection, first-min segment)."""
    import numpy as np

    from gdal_spark.lineref import lineref_project

    xs = [0.0, 10.0, 10.0, 0.0, 0.0]
    ys = [0.0, 0.0, 10.0, 10.0, 0.0]
    rng = np.random.RandomState(9)
    pts = rng.uniform(-3, 13, size=(30, 2))
    lines = spark.createDataFrame(
        pd.DataFrame({"line_id": [5], "xs": [xs], "ys": [ys]}))
    points = spark.createDataFrame(
        pd.DataFrame({"pid": range(30), "px": pts[:, 0], "py": pts[:, 1],
                      "line_id": [5] * 30}))
    got = {r["pid"]: (r["m"], r["dist"])
           for r in lineref_project(points, lines).collect()}

    for pid, (px, py) in enumerate(pts):
        best = None
        cum = 0.0
        for i in range(len(xs) - 1):
            ax, ay, bx, by = xs[i], ys[i], xs[i + 1], ys[i + 1]
            seg = math.hypot(bx - ax, by - ay)
            if seg <= 0:
                continue
            t = max(0.0, min(1.0, ((px - ax) * (bx - ax)
                                   + (py - ay) * (by - ay)) / (seg * seg)))
            qx, qy = ax + t * (bx - ax), ay + t * (by - ay)
            d2 = (px - qx) ** 2 + (py - qy) ** 2
            if best is None or d2 < best[0]:
                best = (d2, cum + t * seg)
            cum += seg
        m, dist = got[pid]
        assert abs(m - best[1]) < 1e-9 and \
            abs(dist - math.sqrt(best[0])) < 1e-9, pid

"""GCP polynomial transformer (alg/gdal_crs.cpp semantics): fit
recovery, order-residual ordering, and warp divergence between orders."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gdal_spark.gcp import (_terms, _truth, default_dst_grid, fit_gcp_poly,
                            synth_gcps, warp_gcp_pixel_sql)


def _apply(fit_dir, ax, ay, order):
    mx, my, sx, sy, cu, cv = fit_dir
    a = _terms((ax - mx) / sx, (ay - my) / sy, order)
    return a @ np.array(cu), a @ np.array(cv)


def test_fit_recovers_quadratic_truth_forward():
    """Order >= 2 reproduces the quadratic ground truth to float
    precision on probe points OFF the GCP grid; order 1 cannot."""
    gcps = synth_gcps(5, 256)
    rng = np.random.RandomState(3)
    px = rng.uniform(0, 256, 64)
    py = rng.uniform(0, 256, 64)
    wx, wy = _truth(px, py)
    for order, tol in [(2, 1e-6), (3, 1e-6)]:
        fit = fit_gcp_poly(gcps, order)
        fx, fy = _apply(fit["fwd"], px, py, order)
        assert np.abs(fx - wx).max() < tol
        assert np.abs(fy - wy).max() < tol
    fit1 = fit_gcp_poly(gcps, 1)
    fx, fy = _apply(fit1["fwd"], px, py, 1)
    assert np.abs(fx - wx).max() > 100  # affine can't carry the quad terms


def test_inverse_residual_shrinks_with_order():
    """The world->pixel direction of a quadratic map is NOT a
    polynomial; the independent least-squares inverse (exactly GDAL's
    approach) must improve monotonically with order."""
    gcps = synth_gcps(5, 256)
    g = np.asarray(gcps)
    errs = []
    for order in (1, 2, 3):
        fit = fit_gcp_poly(gcps, order)
        ix, iy = _apply(fit["inv"], g[:, 2], g[:, 3], order)
        errs.append(max(np.abs(ix - g[:, 0]).max(),
                        np.abs(iy - g[:, 1]).max()))
    assert errs[0] > 1.0            # order 1: > 1 px off
    assert errs[1] < 0.05           # order 2: centi-pixel
    assert errs[2] < errs[1] / 10   # order 3: another 10x+
    assert errs[0] > errs[1] > errs[2]


def test_fit_rejects_bad_order_and_underdetermined():
    gcps = synth_gcps(5, 256)
    with pytest.raises(ValueError):
        fit_gcp_poly(gcps, 4)
    with pytest.raises(ValueError):
        fit_gcp_poly(gcps[:5], 2)  # 6 terms need >= 6 GCPs


def test_warp_orders_diverge_on_pixels(spark):
    """The contract query's two lanes must not be identical: the
    order-1 affine approximation picks different source pixels than
    order 2 for a meaningful share of the grid."""
    from gdal_spark.queries.raster import (DEM_PX, _GCP_DST_PX,
                                           q_warp_gcp_poly)

    out = q_warp_gcp_poly(spark, "/root/testdata/sf0.001").toPandas()
    o1 = out[out.method == "order1"].set_index(["di", "dj"]).value
    o2 = out[out.method == "order2"].set_index(["di", "dj"]).value
    common = o1.index.intersection(o2.index)
    assert len(common) > 0.9 * _GCP_DST_PX * _GCP_DST_PX
    frac_diff = (o1[common] != o2[common]).mean()
    assert 0.01 < frac_diff < 0.9  # diverge, but same neighborhood
    assert DEM_PX == 256


def test_dst_grid_covers_truth_footprint():
    gt = default_dst_grid(256, 160)
    assert gt[1] > 0 and gt[5] < 0
    sgx_e, sgy_e = warp_gcp_pixel_sql(
        fit_gcp_poly(synth_gcps(5, 256), 2), gt)
    assert "floor" in sgx_e and "floor" in sgy_e


def test_tps_interpolates_gcps_exactly():
    """TPS must pass through every GCP (the property -tps buys over
    polynomial orders), and its side conditions must hold."""
    import numpy as np

    from gdal_spark.gcp import _tps_u, fit_tps, synth_gcps

    g = synth_gcps(4, 256)
    fit = fit_tps(g)
    arr = np.asarray(g)
    cx = (arr[:, 2] - fit["mx"]) / fit["sx"]
    cy = (arr[:, 3] - fit["my"]) / fit["sy"]
    d2 = (cx[:, None] - np.array(fit["cx"])[None, :]) ** 2 \
        + (cy[:, None] - np.array(fit["cy"])[None, :]) ** 2
    u = _tps_u(d2)
    fx = fit["au"][0] + fit["au"][1] * cx + fit["au"][2] * cy \
        + u @ np.array(fit["wu"])
    fy = fit["av"][0] + fit["av"][1] * cx + fit["av"][2] * cy \
        + u @ np.array(fit["wv"])
    assert np.abs(fx - arr[:, 0]).max() < 1e-9
    assert np.abs(fy - arr[:, 1]).max() < 1e-9
    for w in (fit["wu"], fit["wv"]):
        w = np.array(w)
        assert abs(w.sum()) < 1e-9
        assert abs((w * cx).sum()) < 1e-9
        assert abs((w * cy).sum()) < 1e-9


def test_tps_sql_stages_match_numpy(spark):
    """The staged Catalyst TPS evaluation equals the numpy evaluation
    of the same fit on probe points (same basis, same constants)."""
    import numpy as np

    from gdal_spark.gcp import _tps_u, fit_tps, synth_gcps, tps_stages

    fit = fit_tps(synth_gcps(4, 256))
    df = spark.range(40).selectExpr(
        "cast(20000 + id * 4321.7 as double) as wx",
        "cast(-190000 + id * 4567.3 as double) as wy")
    for name, expr in tps_stages(fit, "wx", "wy"):
        df = df.withColumn(name, F.expr(expr))
    rows = df.select("wx", "wy", "_spx", "_spy").collect()
    for r in rows:
        cx = (r.wx - fit["mx"]) / fit["sx"]
        cy = (r.wy - fit["my"]) / fit["sy"]
        d2 = (cx - np.array(fit["cx"])) ** 2 + (cy - np.array(fit["cy"])) ** 2
        u = _tps_u(d2)
        ex = fit["au"][0] + fit["au"][1] * cx + fit["au"][2] * cy \
            + u @ np.array(fit["wu"])
        ey = fit["av"][0] + fit["av"][1] * cx + fit["av"][2] * cy \
            + u @ np.array(fit["wv"])
        assert abs(r._spx - ex) < 1e-8 * max(1.0, abs(ex))
        assert abs(r._spy - ey) < 1e-8 * max(1.0, abs(ey))

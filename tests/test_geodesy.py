"""kNN expansion-join exactness + CRS numpy/JVM cross-checks."""

import numpy as np
import pandas as pd
import pytest

from gdal_spark import crs


def test_knn_matches_bruteforce_random(spark):
    """Random clustered + sparse points: expansion join == brute force."""
    from gdal_spark.knn import knn_join

    rng = np.random.default_rng(11)
    # clustered points + sparse points + pole-ish and antimeridian cases
    pts = np.vstack([
        rng.normal([13.4, 52.5], 0.3, size=(300, 2)),
        rng.normal([-170.0, -10.0], 0.5, size=(100, 2)),  # near antimeridian
        rng.uniform([-180, -84], [180, 84], size=(100, 2)),
        np.array([[179.9, -10.0], [-179.9, -10.1], [10.0, 83.5]]),
    ])
    pts[:, 0] = np.clip(pts[:, 0], -180, 180)
    pts[:, 1] = np.clip(pts[:, 1], -84.9, 84.9)
    qs = np.vstack([
        rng.normal([13.4, 52.5], 0.4, size=(20, 2)),
        np.array([[179.95, -10.0], [0.0, -80.0], [100.0, 0.0]]),
    ])
    qs[:, 0] = np.clip(qs[:, 0], -180, 180)
    qs[:, 1] = np.clip(qs[:, 1], -84.9, 84.9)

    pdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": np.arange(len(pts)),
                      "lon": pts[:, 0], "lat": pts[:, 1]}))
    qdf = spark.createDataFrame(
        pd.DataFrame({"qid": np.arange(len(qs)),
                      "lon": qs[:, 0], "lat": qs[:, 1]}))
    k = 4
    got = knn_join(pdf, qdf, k=k).toPandas()

    # numpy brute force with the same tie-break
    for qi in range(len(qs)):
        d = crs.haversine_m(qs[qi, 0], qs[qi, 1], pts[:, 0], pts[:, 1])
        order = np.lexsort((np.arange(len(pts)), d))[:k]
        mine = got[got.qid == qi].sort_values("rank")
        assert mine.doc_id.tolist() == order.tolist(), (
            qi, mine.doc_id.tolist(), order.tolist())
    assert len(got) == len(qs) * k


def test_knn_fewer_points_than_k(spark):
    from gdal_spark.knn import knn_join

    pdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "lon": [10.0, 11.0],
                      "lat": [50.0, 50.0]}))
    qdf = spark.createDataFrame(
        pd.DataFrame({"qid": [0], "lon": [10.5], "lat": [50.0]}))
    got = knn_join(pdf, qdf, k=5).toPandas()
    assert len(got) == 2  # only 2 points exist — both returned


def test_tmerc_jvm_matches_numpy(spark):
    """The staged Catalyst Krüger pipeline ≡ the numpy kernel (≤ 1e-6 m)."""
    rng = np.random.default_rng(5)
    lon = rng.uniform(-3, 9, 200)
    lat = rng.uniform(-80, 84, 200)
    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    out = crs.apply_sql_stages(df, crs.tmerc_sql_stages("lon", "lat", 3.0))
    got = out.select("easting", "northing").toPandas()
    E, N, ok = crs.tmerc_fwd_np(lon, lat, 3.0)
    assert np.allclose(got.easting, E, atol=1e-6)
    assert np.allclose(got.northing, N, atol=1e-6)


def test_webmercator_jvm_matches_numpy(spark):
    rng = np.random.default_rng(6)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-85, 85, 200)
    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    out = crs.apply_sql_stages(df, crs.webmercator_sql_stages("lon", "lat"))
    got = out.select("x_3857", "y_3857").toPandas()
    X, Y, ok = crs.webmercator_fwd_np(lon, lat)
    assert np.allclose(got.x_3857, X, atol=1e-6)
    assert np.allclose(got.y_3857, Y, atol=1e-6)


def test_utm_accuracy_vs_independent_series():
    """Cross-check the Krüger n^6 series against an independent Snyder
    (1987) truncated-series implementation: they must agree to ~1 mm
    (Snyder truncates at A^6, Krüger n^6 is nanometer-grade)."""
    import math

    a = 6378137.0
    f = 1 / 298.257223563
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    k0 = 0.9996
    lon0 = math.radians(3.0)
    for lon_d, lat_d in [(2.0, 49.0), (5.5, -33.0), (8.9, 71.0), (3.0, 0.0)]:
        lat = math.radians(lat_d)
        lon = math.radians(lon_d)
        Nr = a / math.sqrt(1 - e2 * math.sin(lat) ** 2)
        T = math.tan(lat) ** 2
        C = ep2 * math.cos(lat) ** 2
        A = (lon - lon0) * math.cos(lat)
        M = a * ((1 - e2 / 4 - 3 * e2 ** 2 / 64 - 5 * e2 ** 3 / 256) * lat
                 - (3 * e2 / 8 + 3 * e2 ** 2 / 32 + 45 * e2 ** 3 / 1024)
                 * math.sin(2 * lat)
                 + (15 * e2 ** 2 / 256 + 45 * e2 ** 3 / 1024) * math.sin(4 * lat)
                 - (35 * e2 ** 3 / 3072) * math.sin(6 * lat))
        E_ref = k0 * Nr * (A + (1 - T + C) * A ** 3 / 6
                           + (5 - 18 * T + T ** 2 + 72 * C - 58 * ep2)
                           * A ** 5 / 120) + 500000
        N_ref = k0 * (M + Nr * math.tan(lat) * (
            A ** 2 / 2 + (5 - T + 9 * C + 4 * C ** 2) * A ** 4 / 24
            + (61 - 58 * T + T ** 2 + 600 * C - 330 * ep2) * A ** 6 / 720))
        E, N, ok = crs.tmerc_fwd_np(np.array([lon_d]), np.array([lat_d]), 3.0)
        assert ok[0]
        assert abs(E[0] - E_ref) < 2e-3, (lon_d, lat_d, E[0], E_ref)
        assert abs(N[0] - N_ref) < 2e-3, (lon_d, lat_d, N[0], N_ref)

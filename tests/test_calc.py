"""gdal_calc expression front-end: numpy-semantics parity + safety.

Oracle: plain numpy evaluation of the same expression on the same
buffers (gdal_calc.py's own evaluation model)."""

from __future__ import annotations

import numpy as np
import pytest

from gdal_spark.calc import compile_calc, raster_calc
from gdal_spark.raster import TILE_PX


def _tiles(spark, n_bands=2):
    rows = []
    rng_base = np.arange(TILE_PX * TILE_PX, dtype=np.int64)
    for tx in range(2):
        for band in range(1, n_bands + 1):
            buf = (rng_base * band + tx * 7) % 97
            rows.append((5, tx, 0, band, [0.0] * 6,
                         bytearray(buf.tobytes())))
    return spark.createDataFrame(
        rows, "z int, tx long, ty long, band int, gt array<double>, "
              "data binary"), rng_base


def test_two_band_expression_matches_numpy(spark):
    tiles, base = _tiles(spark)
    out = raster_calc(tiles, "A*2 + (B>50)*100 + minimum(A, B)",
                      {"A": 1, "B": 2}).collect()
    assert len(out) == 2
    for row in out:
        a = (base + row["tx"] * 7) % 97
        b = (base * 2 + row["tx"] * 7) % 97
        expect = a * 2 + (b > 50) * 100 + np.minimum(a, b)
        got = np.frombuffer(row["data"], dtype=np.int64)
        assert np.array_equal(got, expect)
        assert row["band"] == 1


def test_single_band_where(spark):
    tiles, base = _tiles(spark, n_bands=1)
    out = raster_calc(tiles, "where(A > 48, A, 0)", {"A": 1}) \
        .filter("tx = 0").collect()[0]
    a = base % 97
    assert np.array_equal(np.frombuffer(out["data"], dtype=np.int64),
                          np.where(a > 48, a, 0))


@pytest.mark.parametrize("bad", [
    "__import__('os').system('x')",
    "A.dtype",
    "open('/etc/passwd')",
    "'str' + A",
    "[1,2][0]",
    "lambda: 1",
    "C + 1",
])
def test_rejects_non_whitelisted_expressions(bad):
    with pytest.raises(ValueError):
        compile_calc(bad, ["A", "B"])

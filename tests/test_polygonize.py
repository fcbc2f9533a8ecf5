

def test_nearblack_trims_collar_keeps_lakes(spark):
    """nearblack semantics: every border-ring dark pixel is trimmed,
    interior dark lakes survive, and no bright pixel is touched."""
    from gdal_spark.polygonize import near_pixels, nearblack_collar
    from gdal_spark.raster import synth_collar_tiles

    W = 128
    tiles = synth_collar_tiles(spark, W)
    px = near_pixels(tiles, 7)
    collar = {(r.gx, r.gy) for r in
              nearblack_collar(px, W, W).collect()}
    mask = {(r.gx, r.gy) for r in px.collect()}
    # all four border rings are dark (wobble >= 3) and trimmed
    for i in range(W):
        for p in ((i, 0), (0, i), (i, W - 1), (W - 1, i)):
            assert p in collar
    # lake pixels are dark but NOT trimmed (not border-connected)
    for gx in range(40, 48):
        for gy in range(40, 48):
            assert (gx, gy) in mask
            assert (gx, gy) not in collar
    # collar is a subset of the dark mask
    assert collar <= mask


def test_footprint_rectangles_exact(spark):
    """The footprint components of the block-structured validity mask
    are exactly the six analytically-known rectangles."""
    from gdal_spark.queries.raster import q_raster_footprint

    rows = {(r.x0, r.y0, r.x1, r.y1, r.n_px)
            for r in q_raster_footprint(spark, "unused").collect()}
    want = {(x0, y0, x0 + 63, y0 + 95, 64 * 96)
            for x0 in (0, 96, 192) for y0 in (0, 128)}
    assert rows == want

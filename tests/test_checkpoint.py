"""Checkpoint/resume semantics: killed-run resume, idempotence, lineage."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from gdal_spark.checkpoint import (committed_keys, lineage, read_committed,
                                   run_checkpointed)
from gdal_spark.pages import points_from_documents
from gdal_spark.pipeline import geocoded_pages
from gdal_spark.raster import rasterize_points


@pytest.fixture()
def workload(spark):
    """Tile-assignment output keyed by tile id — the north-star resumable
    job (pages → tiles), small zoom so key count is modest."""
    pts = points_from_documents(spark, "/root/testdata/sf0.001")
    tiles = rasterize_points(pts, 4)
    return tiles.select(
        (F.col("tx") * 1000 + F.col("ty")).alias("tile_key"),
        "z", "tx", "ty", "data")


def test_resume_after_partial_run(spark, tmp_path, workload):
    root = str(tmp_path / "ckpt")
    full = {r["tile_key"] for r in workload.select("tile_key").collect()}
    cut = sorted(full)[len(full) // 2]

    # run 1 "dies" after committing only keys < cut
    r1 = run_checkpointed(workload, root, "tile_key",
                          key_filter=f"tile_key < {cut}")
    assert 0 < r1["keys_written"] < len(full)
    assert r1["snapshot"] == 1

    # files written by run 1, to prove resume does not rewrite them
    first_files = set(glob.glob(os.path.join(root, "data", "*", "*.parquet")))

    # run 2 resumes: completes exactly the remaining keys
    r2 = run_checkpointed(workload, root, "tile_key")
    assert r2["snapshot"] == 2
    assert r1["keys_written"] + r2["keys_written"] == len(full)
    assert first_files <= set(
        glob.glob(os.path.join(root, "data", "*", "*.parquet")))

    got = {r["tile_key"]
           for r in committed_keys(spark, root, "tile_key").collect()}
    assert got == full

    # run 3 is a no-op (idempotent re-run)
    r3 = run_checkpointed(workload, root, "tile_key")
    assert r3 == {"snapshot": 2, "keys_written": 0, "rows_written": 0}


def test_readback_and_lineage_match_source(spark, tmp_path, workload):
    root = str(tmp_path / "ckpt2")
    run_checkpointed(workload, root, "tile_key")
    back = read_committed(spark, root, "tile_key")
    assert back.count() == workload.count()
    lin = lineage(spark, root).collect()
    assert sum(r["n_rows"] for r in lin) == workload.count()
    # lineage fingerprints audit content: recompute from source
    src = {r["tile_key"]: r["f"] for r in workload.groupBy("tile_key").agg(
        F.sum(F.xxhash64("tile_key", "z", "tx", "ty", "data")).alias("f"))
        .collect()}
    for r in lin:
        assert src[r["tile_key"]] == r["fingerprint"]


def test_resumable_flagship_pipeline(spark, tmp_path):
    """North-rule shape: the geocode→cell pipeline checkpointed by cell
    prefix (coarse parent cell as the partition key)."""
    geo = geocoded_pages(spark, "/root/testdata/sf0.001").select(
        "url", "cell_id", (F.col("cell_id") % 64).alias("bucket"))
    root = str(tmp_path / "ckpt3")
    r1 = run_checkpointed(geo, root, "bucket", key_filter="bucket < 10")
    r2 = run_checkpointed(geo, root, "bucket")
    assert r1["rows_written"] + r2["rows_written"] == geo.count()
    assert read_committed(spark, root, "bucket").count() == geo.count()


def test_metrics_one_row_per_commit(spark, tmp_path, workload):
    """Every commit writes a metrics row (keys/rows written, wall time,
    throughput) readable like the lineage table; a no-op resume adds
    none."""
    from gdal_spark.checkpoint import metrics, run_checkpointed

    root = str(tmp_path / "ckpt_metrics")
    r1 = run_checkpointed(workload, root, "tile_key",
                          key_filter="tile_key % 2 = 0")
    r2 = run_checkpointed(workload, root, "tile_key")
    run_checkpointed(workload, root, "tile_key")  # no-op: all committed
    m = {r["snap"]: r for r in metrics(spark, root).collect()}
    assert set(m) == {r1["snapshot"], r2["snapshot"]}
    for res in (r1, r2):
        row = m[res["snapshot"]]
        assert row["keys_written"] == res["keys_written"]
        assert row["rows_written"] == res["rows_written"]
        assert row["wall_sec"] > 0 and row["rows_per_sec"] > 0


def test_snapshot_time_travel(spark, tmp_path, workload):
    """read_committed(snapshot=n) sees exactly the keys committed as of
    snapshot n; later commits are invisible; snapshot 0 is empty; an
    uncommitted snapshot raises."""
    import pytest

    from gdal_spark.checkpoint import read_committed, run_checkpointed

    root = str(tmp_path / "ckpt_tt")
    r1 = run_checkpointed(workload, root, "tile_key",
                          key_filter="tile_key % 2 = 0")
    r2 = run_checkpointed(workload, root, "tile_key")
    assert (r1["snapshot"], r2["snapshot"]) == (1, 2)
    even = {r["tile_key"] for r in workload.filter("tile_key % 2 = 0")
            .select("tile_key").collect()}
    v1 = {r["tile_key"] for r in
          read_committed(spark, root, "tile_key", snapshot=1)
          .select("tile_key").collect()}
    assert v1 == even
    v2 = read_committed(spark, root, "tile_key", snapshot=2).count()
    assert v2 == workload.count()
    assert read_committed(spark, root, "tile_key", snapshot=0).count() == 0
    with pytest.raises(ValueError):
        read_committed(spark, root, "tile_key", snapshot=9).count()

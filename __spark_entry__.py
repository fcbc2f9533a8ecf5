"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship page→zone spatial pipeline on sf0.001.
``queries()`` exposes each implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the DuckDB
equivalent over the same parquet views. Query implementations live in
``gdal_spark/queries/*`` grouped by domain:

- spatial.py     — geotag extraction, cell index, PIP join, zonal stats
- relational.py  — the OGR SQL surface (aggregates, joins, sorts, scalar
                   functions, windows) on the TPC-H-ish tables
- geodesy.py     — reprojection (WebMercator, UTM/Krüger) + exact kNN
- textpipe.py    — dedup (exact/MinHash-LSH/SimHash/n-gram/embedding),
                   similarity search, text analysis, multimodal plumbing

Spatial inputs are synthesized deterministically from ``documents`` with
integer-only arithmetic (gdal_spark.pages), so both engines compute
bit-identical geometry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"

_QUERY_MODULES = (
    "gdal_spark.queries.spatial",
    "gdal_spark.queries.relational",
    "gdal_spark.queries.geodesy",
    "gdal_spark.queries.textpipe",
    "gdal_spark.queries.raster",
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: geocode pages → cell ids → broadcast R-tree PIP join →
    pages per zone (SURVEY §7 step 2)."""
    from gdal_spark.pipeline import pages_per_zone

    return pages_per_zone(spark, SF_SMOKE)


def _modules():
    import importlib

    return [importlib.import_module(m) for m in _QUERY_MODULES]


# The correctness driver oracle-checks queries in registration order with a
# budget of ~50 per round (round 1 covered exactly the first 50 of 88).
# _PRIORITY puts the queries most in need of fresh driver signal first:
# never-checked families (raster, multimodal, fingerprint/rare-terms), the
# queries fixed this round (ANSI + output-representation), and new operators.
# Previously-green queries keep their r01 rows and register afterward.
_PRIORITY = [
    # ---- round 5 freshness rotation (VERDICT r4 next-steps #1): every
    # registered query has a green latest driver row, so the budget goes
    # to (a) queries NEW this round (never driver-checked — a query with
    # no driver row ever outranks any stale-but-green row), then (b) the
    # stale rows, oldest vintage first: the 7 r1-vintage rows, then the
    # 30 r2-vintage ones. Round 5 grew (a) to 53 new operators — PAST
    # the ~50-row budget — so three of (a) must go unchecked; the three
    # demoted to the tail of (a) are the ones whose code path already
    # earns an in-budget row through a sibling (reproject_sinusoidal /
    # reproject_mollweide share the crs.py epsg_table family dispatch
    # with in-budget reproject_equal_earth; warp_to_sinusoidal is that
    # same family under the warp machinery checked by warp_gcp_poly/
    # tps), keeping a driver row for every INDEPENDENT new operator.
    # All 187 registered queries (including the three demoted and all
    # stale-green rows) were re-verified green this round through
    # scripts/verify_contract.py, the strict driver mirror, as a
    # compensating check.
    # -- (a) new round-5 operators, never driver-checked
    # (names are appended here as each operator lands this round)
    "rgb2pct_dither_checksum", "reproject_osgb36_grid",
    "layer_algebra_options",
    "ogrsql_execute_orderby_special", "ogrsql_execute_arith",
    "multimodal_decode_jpeg",
    "reproject_nad27_grid", "train_pack_sequences",
    "text_bigram_novelty", "multimodal_decode_video",
    "multimodal_video_framestats", "multimodal_decode_tiff",
    "geotiff_ingest_tiles", "multimodal_decode_png_variants",
    "multimodal_decode_gif", "multimodal_decode_wav_variants",
    "reproject_equal_earth",
    "dedup_substring_spans", "dedup_paragraph_exact",
    "raster_nearblack", "crawl_url_canonicalize",
    "embed_kmeans", "crawl_robots_filter", "crawl_html_extract",
    "warc_ingest_records", "warp_gcp_poly", "crawl_charset_decode",
    "crawl_cdx_index", "text_gopher_rules", "train_mixture_sample",
    "embed_sq8_topk", "warp_gcp_tps", "vector_geojson_ingest",
    "vector_shapefile_ingest", "vector_kml_ingest",
    "text_ccnet_ppl_bucket", "crawl_geocode_from_html",
    "raster_percentiles", "raster_footprint", "raster_color_merge",
    "crawl_sitemap_coverage", "text_dsir_importance", "crawl_pagerank",
    "train_bpe_merges", "raster_equalize_checksum",
    "crawl_snapshot_delta", "text_bm25_topk", "crawl_hll_distinct",
    "text_chunk_windows", "raster_compare_golden",
    # beyond-budget tail of (a): family siblings of in-budget rows
    "reproject_sinusoidal", "reproject_mollweide", "warp_to_sinusoidal",
    # -- (b) stale rows: r1-vintage first (latest green row is r01) ...
    "ann_topk_cosine", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash", "text_langid", "text_quality", "text_token_counts",
    # ... then the 30 r2-vintage rows (latest green row is r02)
    "ann_ivf_topk", "ann_lsh_topk", "contour_lines", "contour_polygons",
    "dedup_cluster_canonical", "dem_metrics", "embed_neardup_cosine",
    "grid_kernels", "grid_linear_delaunay", "multimodal_inspect",
    "multimodal_resize", "polygonize_components",
    "raster_calc_reclassify", "raster_fillnodata",
    "raster_overview_methods", "raster_pansharpen_brovey",
    "raster_sample_interp", "raster_sieve", "raster_stats",
    "raster_viewshed", "rasterize_checksum_z5", "st_constructive",
    "streaming_stateful_totals", "text_decontaminate",
    "text_fingerprint", "text_rare_terms", "tile_pyramid_z5_z2",
    "translate_ops", "warp_bilinear_dem", "warp_resample_dem",
    # ---- (~50-query driver budget reaches about here) ----
    # r3-vintage rows (oldest of the fresh; next in line)
    "sql_asof_join", "text_boilerplate", "text_repetition",
    "multimodal_frame_sample", "contour_cells", "raster_histogram",
    "streaming_dedup_urls",
    "warp_to_webmercator", "warp_to_lcc93", "contour_linestrings",
    "reproject_utm_south", "reproject_albers", "reproject_osgb36",
    "st_buffer_styles", "st_segmentize",
    "ogr2ogr_explodecollections", "ogrsql_execute_distinct_like",
    "text_pii_scan", "crawl_host_stats",
    "warp_order_stats", "warp_lanczos_dem", "warp_average_nodata",
    "polygonize_components8", "raster_sieve8", "raster_viewshed_exact",
    "dem_hillshade_variants", "dem_slope_formats",
    "st_predicates", "rasterize_polygons_checksum", "warp_reproject_dem",
    "warp_cutline", "reproject_lcc93",
    "layer_algebra_intersection_nonconvex", "layer_algebra_union_features",
    "polygonize_rings", "ogrsql_execute_join_chain",
    "ogrsql_execute_groupby", "ogrsql_execute_in_subquery",
    "streaming_zonal_window", "sql_scalar_expr",
    "zonal_stats", "layer_algebra_identity_update", "sql_summary_record",
    "sql_groupby_agg", "sql_join_groups", "sql_orderby_limit_offset",
    "sql_window_funcs",
    # r4-vintage rows (freshest; register last among the prioritized)
    "multimodal_decode_real", "warp_approx_webmercator",
    "text_tfidf_topterms",
    "reproject_etrs89", "reproject_nad27", "warp_to_etrs89utm",
    "raster_viewshed_exact_md",
    "reproject_laea_europe", "reproject_ps_north",
    "rasterize_lines_checksum", "warp_cubicspline_dem",
    "rasterize_lines_at_checksum", "rgb2pct_checksum",
    "lineref_pickets", "lineref_position", "warp_sum_dem",
    "ogrsql_execute_division_typing", "text_stratified_sample",
    "st_wrapdateline",
    "extract_geotags", "cell_assign", "tile_counts_z8", "pip_join",
    "clip", "erase", "zonal_count", "pip_join_cellprejoin",
    "layer_algebra_overlay", "st_functions", "ogr2ogr_pipeline",
    "checkpoint_resume", "clip_lines_cyrus_beck", "dataset_info",
    "sql_sessionize", "ogrsql_execute_select", "ogrsql_execute_summary",
    "sql_count_distinct", "sql_distinct_list", "sql_first_match_join",
    "sql_semi_anti_join", "sql_topk", "sql_union_all", "sql_like_ilike",
    "sql_hstore", "sql_json_field", "sql_datetime",
    "reproject_webmercator", "reproject_utm31", "knn",
    "dedup_exact",
]


def _ordered(entries: dict) -> dict:
    out = {k: entries[k] for k in _PRIORITY if k in entries}
    out.update({k: v for k, v in entries.items() if k not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for mod in _modules():
        overlap = set(out) & set(mod.QUERIES)
        assert not overlap, f"duplicate query names: {overlap}"
        out.update(mod.QUERIES)
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return _ordered(out)

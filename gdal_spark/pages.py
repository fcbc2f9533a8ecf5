"""Deterministic Common-Crawl-style pages synthesis over ``documents``.

The driver provides a ``documents`` table (doc_id, text, lang, source,
n_chars). The engine's input contract (BASELINE.json input_hint) is a pages
table (url, warc_ts, html, text, lang). This module derives that shape
deterministically from ``documents`` using **integer-only arithmetic**, so
the exact same derivation is expressible in Spark SQL and in the DuckDB
oracle — every downstream spatial result is bit-reproducible cross-engine.

The coordinate mixture matches FIXTURES.md §1: ~80% of geotagged pages
cluster in 20 city hotspots (power-law hot cells → exercises skew
handling), ~20% uniform world. ~60% of pages carry a geotag embedded in
the text in the form ``geo:<lat_microdeg>,<lon_microdeg>`` (integers, so
string rendering is identical across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

N_CITIES = 20
HASH_MULT = 2654435761  # Knuth multiplicative hash
HASH_MOD = 1000000007


def synth_stages(d: str = "doc_id") -> list[tuple[str, str]]:
    """Staged shared-SQL derivation of (has_geo, lat_mic, lon_mic, lon, lat).

    lat_mic/lon_mic are integer microdegrees; lon/lat the float view.
    Valid in both Spark SQL and DuckDB.
    """
    return [
        ("_h1", f"({d} * {HASH_MULT}) % {HASH_MOD}"),
        ("has_geo", "(_h1 % 100) < 60"),
        ("_hot", "(_h1 % 10) < 8"),
        ("_city", "_h1 % 20"),
        # city centers: lon in [-175, 175), lat in [-60, 60) degrees
        ("_clon", "(-175 + ((_city * 77) % 350)) * 1000000"),
        ("_clat", "(-60 + ((_city * 131) % 120)) * 1000000"),
        ("_dlon", f"(({d} * 40503) % 2000001) - 1000000"),
        ("_dlat", f"(({d} * 69621) % 1400001) - 700000"),
        ("_ulon", "((_h1 * 97) % 360000001) - 180000000"),
        ("_ulat", "((_h1 * 89) % 160000001) - 80000000"),
        ("lon_mic", "case when _hot then _clon + _dlon else _ulon end"),
        ("lat_mic", "case when _hot then _clat + _dlat else _ulat end"),
        ("lon", "lon_mic / 1000000.0"),
        ("lat", "lat_mic / 1000000.0"),
    ]


def geotag_text_sql(text: str = "text") -> str:
    """Embed the geotag token inside the document text (shared SQL)."""
    return (
        f"case when has_geo then concat(substr({text}, 1, 40), ' geo:',"
        f" lat_mic, ',', lon_mic, ' ', substr({text}, 41))"
        f" else {text} end"
    )


def points_from_documents(spark: SparkSession, sf_dir: str,
                          geotagged_only: bool = True) -> DataFrame:
    """documents → (doc_id, lon, lat, lang) point table (JVM-only math)."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for name, expr in synth_stages("doc_id"):
        df = df.withColumn(name, F.expr(expr))
    if geotagged_only:
        df = df.filter("has_geo")
    return df.select("doc_id", "lon", "lat", "lang", "lon_mic", "lat_mic")


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → full pages shape (url, warc_ts, html, text, lang).

    This is the input-contract adapter: downstream operators only see the
    pages schema from BASELINE.json input_hint.
    """
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for name, expr in synth_stages("doc_id"):
        df = df.withColumn(name, F.expr(expr))
    df = df.withColumn("text", F.expr(geotag_text_sql("text")))
    return df.select(
        F.expr("concat('https://site', doc_id % 100, '.example/p/', doc_id)")
        .alias("url"),
        F.timestamp_seconds(F.expr("1735689600 + doc_id * 7")).alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body><p>"), F.col("text"),
                     F.lit("</p></body></html>")), "utf-8"
        ).alias("html"),
        "text",
        "lang",
        "doc_id",
    )


def points_oracle_sql(doc_view: str = "documents",
                      geotagged_only: bool = True) -> str:
    """DuckDB SQL producing the identical point table."""
    from gdal_spark.crs import stages_to_duckdb_sql

    base = f"select doc_id, lang from {doc_view}"
    where = "where has_geo" if geotagged_only else ""
    inner = stages_to_duckdb_sql(
        base, synth_stages("doc_id"),
        ["doc_id", "lang", "has_geo", "lon", "lat", "lon_mic", "lat_mic"],
    )
    return f"select doc_id, lon, lat, lang, lon_mic, lat_mic from ({inner}) p {where}"

"""Geotag extraction from page text — vectorized Arrow UDF stage.

The geocoding front of the pipeline (north star: "pages are geocoded —
extracted coordinates/geotags from text via vectorized Arrow UDFs, with
byte-identical extracted text per url"). The reference precedent is OGR's
geocoding SQL functions (ogr_geocode / ogr_geocode_reverse,
ogr/ogrsf_frmts/sqlite/ogrsqlitesqlfunctions.cpp:268,383) — there a network
geocoder with a local cache; here a deterministic regex extractor, because
determinism *is* the contract (byte-identical `extracted_text` per url).

Three geotag token forms are recognized (FIXTURES.md §1):
  1. ``geo:{lat},{lon}``          (geo-URI style; also integer-microdegree
                                   variant ``geo:{lat_mic},{lon_mic}``)
  2. ``coords=({lat}, {lon})``
  3. ``"lat": {lat}, "lon": {lon}``

The extractor returns the first match in form-priority order; per-row output
is (extracted_text, lat, lon) where extracted_text is the exact matched
substring (byte-stable) and lat/lon are parsed floats. Integer lat values
|v| > 90 are interpreted as microdegrees (the synthetic geotag encoding).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, StringType, StructField, StructType)

_NUM = r"[+-]?\d+(?:\.\d+)?"
PATTERNS = (
    re.compile(rf"geo:({_NUM}),({_NUM})"),
    re.compile(rf"coords=\(({_NUM}), ({_NUM})\)"),
    re.compile(rf'"lat": ({_NUM}), "lon": ({_NUM})'),
)

EXTRACT_SCHEMA = StructType([
    StructField("extracted_text", StringType()),
    StructField("lat", DoubleType()),
    StructField("lon", DoubleType()),
])


def extract_geotags_batch(texts: pd.Series) -> pd.DataFrame:
    """Pure pandas/numpy kernel: one Arrow batch of page texts in,
    (extracted_text, lat, lon) out. NaN/None rows where no geotag."""
    ext = np.full(len(texts), None, dtype=object)
    lat = np.full(len(texts), np.nan)
    lon = np.full(len(texts), np.nan)
    vals = texts.to_numpy(dtype=object)
    for i, t in enumerate(vals):
        if t is None:
            continue
        for pat in PATTERNS:
            m = pat.search(t)
            if m:
                a = float(m.group(1))
                b = float(m.group(2))
                if (abs(a) > 90.0 or abs(b) > 180.0) and \
                        "." not in m.group(1) and "." not in m.group(2):
                    # integer-microdegree encoding (divide, don't multiply
                    # by 1e-6: x/1e6 and x*1e-6 differ in the last ulp and
                    # the per-row invariant is bit-exactness)
                    a /= 1e6
                    b /= 1e6
                if abs(a) > 90.0 or abs(b) > 180.0:
                    continue  # not a coordinate — keep scanning other forms
                ext[i] = m.group(0)
                lat[i] = a
                lon[i] = b
                break
    return pd.DataFrame({"extracted_text": ext, "lat": lat, "lon": lon})


# asNondeterministic is a *planning* marker, not a semantic one: the
# kernel is pure, but without it Catalyst pushes `lat IS NOT NULL` below
# the projection and plans the UDF twice (once under the filter, once
# for the output columns) — double extraction work per page.
_extract_udf = F.pandas_udf(extract_geotags_batch,
                            EXTRACT_SCHEMA).asNondeterministic()


def geocode_pages(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """pages → pages + (extracted_text, lat, lon); rows without a geotag
    keep NULL coordinates (caller filters or left-joins as needed)."""
    out = pages.withColumn("_g", _extract_udf(F.col(text_col)))
    return (
        out.withColumn("extracted_text", F.col("_g.extracted_text"))
        .withColumn("lat", F.col("_g.lat"))
        .withColumn("lon", F.col("_g.lon"))
        .drop("_g")
    )


# ---------------------------------------------------------------------------
# JVM fast path: the identical extraction cascade as Catalyst expressions.
#
# "UDFs are the slow path": on this engine the Arrow UDF above is the
# general extraction surface (arbitrary Python extractors), but the three
# geotag forms are regular expressions, so the hot path pushes the whole
# cascade into whole-stage codegen — regexp_extract + IEEE double casts
# produce bit-identical (extracted_text, lat, lon) to the Python kernel
# (tests assert full-table equality). At bench scale the JVM path removes
# the Python-bridge bottleneck entirely; both paths coexist like GDAL's
# driver fast paths vs the generic fallback (ogrlayerarrow.cpp
# OLCFastGetArrowStream vs the base-class row loop).
# ---------------------------------------------------------------------------

_SQL_PATTERNS = (
    rf"geo:({_NUM}),({_NUM})",
    rf"coords=\(({_NUM}), ({_NUM})\)",
    rf'"lat": ({_NUM}), "lon": ({_NUM})',
)


def geocode_pages_jvm(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Pure-Catalyst twin of geocode_pages (same output, no Python)."""
    t = F.col(text_col)
    out = pages
    oks = []
    # Literal anchor per pattern: a byte-level Contains on the raw
    # UTF8String (no String materialization, no UTF-16 expansion) gates
    # each regex. regexp_extract converts the FULL page text to a Java
    # String and scans it in UTF-16 — measured memory-bandwidth-bound at
    # high core counts (8→32-core scaling was 1.6× before the gate). A
    # page without the literal can't match the regex (the anchor is a
    # required substring of any match), so the gate is semantics-free;
    # pages lacking geotags — the overwhelming majority of a real crawl —
    # now cost three byte scans instead of three UTF-16 regex scans.
    _ANCHORS = ("geo:", "coords=(", '"lat": ')
    for i, pat in enumerate(_SQL_PATTERNS):
        # ONE full-text regex scan per pattern (group 0); the capture
        # groups are re-parsed from the short matched token, not the
        # page text. Full-text regexp_extract per group index means 9
        # multi-KB scans per row; 3 gated scans restore the parallel
        # headroom. The token is itself the first match of the pattern,
        # so group parsing from it is semantics-identical.
        out = out.withColumn(
            f"_m{i}",
            F.when(t.contains(_ANCHORS[i]),
                   F.nullif(F.regexp_extract(t, pat, 0), F.lit(""))))
        m_s = F.coalesce(F.col(f"_m{i}"), F.lit(""))
        a_s = F.regexp_extract(m_s, pat, 1)
        b_s = F.regexp_extract(m_s, pat, 2)
        # try_cast: on the no-match path the extracted group is "" and a
        # plain cast throws under ANSI-on sessions (the driver's default);
        # OGR's lossy-cast-→-NULL semantics must live in the expression.
        a = a_s.try_cast("double")
        b = b_s.try_cast("double")
        micro = ((F.abs(a) > 90.0) | (F.abs(b) > 180.0)) \
            & ~a_s.contains(".") & ~b_s.contains(".")
        fa = F.when(micro, a / 1000000.0).otherwise(a)
        fb = F.when(micro, b / 1000000.0).otherwise(b)
        ok = F.col(f"_m{i}").isNotNull() \
            & (F.abs(fa) <= 90.0) & (F.abs(fb) <= 180.0)
        out = (out.withColumn(f"_fa{i}", fa).withColumn(f"_fb{i}", fb)
               .withColumn(f"_ok{i}", ok))
        oks.append(f"_ok{i}")

    def first_of(cols: list[str]) -> F.Column:
        expr = F.lit(None)
        for i in reversed(range(len(_SQL_PATTERNS))):
            expr = F.when(F.col(oks[i]), F.col(cols[i])).otherwise(expr)
        return expr

    out = (
        out.withColumn("extracted_text",
                       first_of([f"_m{i}" for i in range(3)]))
        .withColumn("lat",
                    first_of([f"_fa{i}" for i in range(3)]).cast("double"))
        .withColumn("lon",
                    first_of([f"_fb{i}" for i in range(3)]).cast("double"))
    )
    drop = [c for i in range(3)
            for c in (f"_m{i}", f"_fa{i}", f"_fb{i}", f"_ok{i}")]
    return out.drop(*drop)

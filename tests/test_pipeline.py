"""End-to-end flagship pipeline + driver-contract queries vs DuckDB oracle.

Mirrors the driver's own verify loop at sf0.001: every queries() entry must
match its oracle_sql() (sorted-column, order-insensitive compare).
"""

import numpy as np
import pytest

import __spark_entry__ as contract
from tests.conftest import SF_SMOKE, compare_frames


def test_entry_smoke(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"zone_id", "n_pages"}
    assert all(r.n_pages > 0 for r in rows)


def test_queries_have_oracles():
    q = contract.queries()
    o = contract.oracle_sql()
    missing = set(o) - set(q)
    assert not missing, f"oracle without query: {missing}"


@pytest.mark.parametrize("name", sorted(contract.oracle_sql().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = contract.queries()[name]
    sql = contract.oracle_sql()[name]
    n = compare_frames(q(spark, SF_SMOKE), ddb, sql)
    assert n > 0, f"{name} produced 0 rows — vacuous"


def test_extraction_byte_identical(spark):
    """The per-row invariant: extracted_text is byte-stable per url across
    runs (and across partitionings)."""
    from gdal_spark.extract import geocode_pages
    from gdal_spark.pages import pages_from_documents

    pages = pages_from_documents(spark, SF_SMOKE)
    a = (geocode_pages(pages).filter("extracted_text is not null")
         .select("url", "extracted_text").toPandas()
         .sort_values("url").reset_index(drop=True))
    b = (geocode_pages(pages.repartition(7)).filter("extracted_text is not null")
         .select("url", "extracted_text").toPandas()
         .sort_values("url").reset_index(drop=True))
    assert a.equals(b)
    assert len(a) > 0
    assert a.extracted_text.str.startswith("geo:").all()


def test_extract_all_three_forms(spark):
    from gdal_spark.extract import extract_geotags_batch
    import pandas as pd

    texts = pd.Series([
        "blah geo:52.5,13.4 blah",
        "x coords=(48.8, 2.35) y",
        'meta "lat": -33.9, "lon": 151.2 end',
        "no geotag here",
        None,
    ])
    out = extract_geotags_batch(texts)
    assert out.extracted_text.tolist()[:3] == [
        "geo:52.5,13.4", "coords=(48.8, 2.35)", '"lat": -33.9, "lon": 151.2']
    assert np.allclose(out.lat[:3], [52.5, 48.8, -33.9])
    assert np.allclose(out.lon[:3], [13.4, 2.35, 151.2])
    assert out.extracted_text[3] is None and out.extracted_text[4] is None


def test_extract_rejects_out_of_range():
    import pandas as pd

    from gdal_spark.extract import extract_geotags_batch

    out = extract_geotags_batch(pd.Series([
        "geo:999999999999,999",   # microdegree heuristic still out of range
        "geo:91.0,10.0",          # lat out of range, not microdegrees
        "geo:52500000,13400000",  # valid microdegrees
    ]))
    assert out.extracted_text[0] is None and out.lat.isna()[0]
    assert out.extracted_text[1] is None  # 91.0 is decimal → no µdeg rescale
    assert out.lat[2] == 52.5 and out.lon[2] == 13.4


def test_pip_join_plan_is_narrow(spark):
    """The PIP join must not shuffle: broadcast index + mapInPandas only."""
    from gdal_spark.pages import points_from_documents
    from gdal_spark.pip_join import build_zone_index_from_defs, pip_join
    from gdal_spark.zones import zone_defs

    pts = points_from_documents(spark, SF_SMOKE)
    joined = pip_join(pts, build_zone_index_from_defs(zone_defs()), how="inner")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_salted_zonal_count_matches_unsalted(spark):
    from gdal_spark.pipeline import pages_per_zone

    plain = {(r.zone_id, r.n_pages) for r in
             pages_per_zone(spark, SF_SMOKE, salt_buckets=0).collect()}
    salted = {(r.zone_id, r.n_pages) for r in
              pages_per_zone(spark, SF_SMOKE, salt_buckets=8).collect()}
    assert plain == salted

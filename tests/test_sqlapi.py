"""ExecuteSQL (OGR SQL dialect) translator tests.

Statement shapes and semantics mirror autotest/ogr/ogr_sql_test.py /
ogr_sql_rfc28.py on a poly.shp-shaped layer (zones: eas_id, area,
prfedea) and the TPC-H-ish tables.
"""

from __future__ import annotations

import pytest

from gdal_spark.sqlapi import execute_sql
from gdal_spark.zones import zones_df


@pytest.fixture(scope="module")
def poly(spark):
    return zones_df(spark)


def run(spark, sql, poly, **kw):
    return execute_sql(
        spark, sql, {"poly": poly},
        fid_order={"poly": "zone_id"}, area_cols={"poly": "area"}, **kw)


def test_distinct_list_is_sorted(spark, poly):
    rows = run(spark, "SELECT DISTINCT prfedea FROM poly", poly).collect()
    vals = [r[0] for r in rows]
    assert vals == sorted(vals) and len(vals) == poly.count()


def test_summary_record(spark, poly):
    r = run(spark, "SELECT MIN(eas_id), MAX(eas_id), COUNT(*), "
                   "SUM(eas_id) FROM poly", poly).collect()
    assert len(r) == 1
    vals = r[0]
    assert vals[0] == 158 and vals[2] == poly.count()


def test_where_order_limit_offset(spark, poly):
    rows = run(spark, "SELECT eas_id FROM poly WHERE eas_id >= 160 "
                      "ORDER BY eas_id DESC LIMIT 3 OFFSET 1", poly).collect()
    assert [r[0] for r in rows] == [169, 168, 167]


def test_order_by_special_field_area(spark, poly):
    rows = run(spark, "SELECT eas_id, OGR_GEOM_AREA FROM poly "
                      "ORDER BY OGR_GEOM_AREA DESC LIMIT 2", poly).collect()
    areas = [r[1] for r in rows]
    assert areas == sorted(areas, reverse=True)


def test_fid_special_field(spark, poly):
    rows = run(spark, "SELECT FID, eas_id FROM poly ORDER BY FID LIMIT 3",
               poly).collect()
    assert [r[0] for r in rows] == [0, 1, 2]


def test_like_case_sensitive(spark, poly):
    n1 = run(spark, "SELECT prfedea FROM poly WHERE prfedea LIKE '35043%'",
             poly).count()
    n2 = run(spark, "SELECT prfedea FROM poly WHERE prfedea LIKE '35O43%'",
             poly).count()
    assert n1 == poly.count() and n2 == 0


def test_scalar_expressions(spark, poly):
    r = run(spark, "SELECT CONCAT(prfedea, '_x') AS c, "
                   "SUBSTR(prfedea, 1, 5) AS s, "
                   "CAST(eas_id AS CHARACTER(10)) AS t "
                   "FROM poly ORDER BY eas_id LIMIT 1", poly).collect()[0]
    assert r["c"].endswith("_x") and r["s"] == "35043" and r["t"] == "158"


def test_union_all(spark, poly):
    n = run(spark, "SELECT eas_id FROM poly WHERE eas_id < 160 UNION ALL "
                   "SELECT eas_id FROM poly WHERE eas_id >= 160",
            poly).count()
    assert n == poly.count()


def test_hstore_get_value(spark):
    df = spark.createDataFrame([(1, "a=>1,b=>2")], "id long, tags string")
    r = execute_sql(
        spark, "SELECT HSTORE_GET_VALUE(tags, 'b') AS v FROM t",
        {"t": df}).collect()[0]
    assert r["v"] == "2"


def test_first_match_join(spark):
    prim = spark.createDataFrame([(1,), (2,)], "k long")
    sec = spark.createDataFrame(
        [(1, 10, "first"), (1, 11, "second"), (2, 20, "only")],
        "k long, sid long, tag string")
    out = execute_sql(
        spark, "SELECT p.k, s.tag FROM p JOIN s ON s.k = p.k",
        {"p": prim, "s": sec}, fid_order={"s": "sid"}).collect()
    got = {r["k"]: r["tag"] for r in out}
    assert len(out) == 2  # 1:1, not 1:N
    assert got == {1: "first", 2: "only"}


def test_left_join_null_fill(spark):
    prim = spark.createDataFrame([(1,), (3,)], "k long")
    sec = spark.createDataFrame([(1, 1, "hit")], "k long, sid long, tag string")
    out = execute_sql(
        spark, "SELECT p.k, s.tag FROM p LEFT JOIN s ON s.k = p.k",
        {"p": prim, "s": sec}, fid_order={"s": "sid"}).collect()
    got = {r["k"]: r["tag"] for r in out}
    assert got == {1: "hit", 3: None}


def test_count_distinct_and_groupless_agg_on_table(spark):
    part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    r = execute_sql(
        spark,
        "SELECT COUNT(DISTINCT p_brand) AS nb FROM part WHERE p_size > 10",
        {"part": part}).collect()[0]
    import duckdb
    exp = duckdb.connect().execute(
        "select count(distinct p_brand) from "
        "read_parquet('/root/testdata/sf0.001/part.parquet') "
        "where p_size > 10").fetchone()[0]
    assert r["nb"] == exp

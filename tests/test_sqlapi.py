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


def test_chained_join_first_match_semantics(spark):
    """Two chained JOINs where the second secondary has duplicate keys:
    each joined row must take the FIRST secondary match in FID order
    (ogr_gensql.cpp:1493-1523), per join."""
    from gdal_spark.sqlapi import execute_sql

    a = spark.createDataFrame([(1, "x"), (2, "y")], "id int, t string")
    b = spark.createDataFrame(
        [(1, 10, "b1"), (1, 11, "b2"), (2, 12, "b3")],
        "aid int, bid int, bt string")
    c = spark.createDataFrame(
        [(10, "c-first"), (10, "c-second"), (12, "c-only")],
        "bid int, ct string")
    out = execute_sql(
        spark,
        "SELECT a.id, b.bid, c.ct FROM a "
        "JOIN b ON b.aid = a.id JOIN c ON c.bid = b.bid "
        "ORDER BY a.id",
        {"a": a, "b": b, "c": c},
        fid_order={"a": "id", "b": "bid", "c": "ct"}).collect()
    got = [(r["id"], r["bid"], r["ct"]) for r in out]
    # b dedups to first bid per aid (10 for aid=1, 12 for aid=2);
    # c dedups to its first row per bid in ct order
    assert got == [(1, 10, "c-first"), (2, 12, "c-only")]


def test_group_by_and_subquery_split(spark):
    """Clause splitter: keywords inside strings/subqueries don't split;
    GROUP BY + HAVING + IN-subquery translate."""
    from gdal_spark.sqlapi import execute_sql

    t = spark.createDataFrame(
        [(1, "a from b"), (1, "join"), (2, "order by")], "k int, s string")
    out = execute_sql(
        spark,
        "SELECT k, COUNT(*) AS n FROM t "
        "WHERE k IN (SELECT k FROM t WHERE s <> 'nope') "
        "GROUP BY k HAVING COUNT(*) >= 1 ORDER BY k",
        {"t": t}).collect()
    assert [(r["k"], r["n"]) for r in out] == [(1, 2), (2, 1)]

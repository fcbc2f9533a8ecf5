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


# ---------------------------------------------------------------------------
# Ported autotest/ogr/ogr_sql_test.py cases on the canonical poly/idlink
# fixture shapes (eas_id sets and expected outputs from the public test
# assertions; FID order chosen so eas_id IN (158,165) sits at fids 7,8
# like poly.shp).
# ---------------------------------------------------------------------------

_POLY_EAS = [168, 179, 171, 173, 172, 169, 166, 158, 165, 170]


@pytest.fixture(scope="module")
def at_poly(spark):
    rows = [(i, eas, f"350433{10 + i}", 100.0 + i)
            for i, (eas) in enumerate(_POLY_EAS)]
    rows[7] = (7, 158, "35043369", 107.0)
    rows[8] = (8, 165, "35043408", 108.0)
    return spark.createDataFrame(
        rows, "ord int, eas_id int, prfedea string, area double")


@pytest.fixture(scope="module")
def at_idlink(spark):
    eas = [158, 165, 166, 168, 170, 171, 179]
    return spark.createDataFrame(
        [(i, e, f"_{e}_") for i, e in enumerate(eas)],
        "ord int, eas_id int, name string")


def arun(spark, sql, at_poly, **layers):
    all_layers = {"poly": at_poly, **layers}
    return execute_sql(spark, sql, all_layers,
                       fid_order={n: "ord" for n in all_layers},
                       area_cols={"poly": "area"})


def test_at_where_counts(spark, at_poly):
    # ogr_sql_1
    assert arun(spark, "SELECT * FROM poly WHERE eas_id < 167",
                at_poly).count() == 3
    assert arun(spark, "SELECT * FROM poly", at_poly).count() == 10


def test_at_distinct_order(spark, at_poly):
    # ogr_sql_2/3/3_desc (DISTINCT_LIST is sorted here when no ORDER BY)
    got = [r[0] for r in arun(
        spark, "select distinct eas_id from poly where eas_id < 170",
        at_poly).collect()]
    assert got == [158, 165, 166, 168, 169]
    got = [r[0] for r in arun(
        spark, "select distinct eas_id from poly where eas_id < 170 "
               "order by eas_id desc", at_poly).collect()]
    assert got == [169, 168, 166, 165, 158]


def test_at_distinct_strings(spark, at_poly, at_idlink):
    # ogr_sql_4
    got = [r[0] for r in arun(
        spark, "select distinct name from idlink order by name asc",
        at_poly, idlink=at_idlink).collect()]
    assert got == ["_158_", "_165_", "_166_", "_168_", "_170_", "_171_",
                   "_179_"]


def test_at_summary_functions_auto_alias(spark, at_poly, at_idlink):
    # ogr_sql_5: unaliased aggregates get OGR's fn_col output names
    r = arun(spark,
             "select max(eas_id), min(eas_id), avg(eas_id), "
             "STDDEV_POP(eas_id), STDDEV_SAMP(eas_id), sum(eas_id), "
             "count(eas_id) from idlink",
             at_poly, idlink=at_idlink).collect()[0]
    assert r["max_eas_id"] == 179
    assert r["min_eas_id"] == 158
    assert r["avg_eas_id"] == pytest.approx(168.142857142857, abs=1e-9)
    assert r["stddev_pop_eas_id"] == pytest.approx(5.9384599116647205,
                                                   rel=1e-12)
    assert r["stddev_samp_eas_id"] == pytest.approx(6.414269805898183,
                                                    rel=1e-12)
    assert r["sum_eas_id"] == 1177
    assert r["count_eas_id"] == 7


def test_at_count_star_name(spark, at_poly):
    # ogr_sql_6: COUNT(*) output column is named count_*
    df = arun(spark, "select count(*) from poly", at_poly)
    assert df.columns == ["count_*"]
    assert df.collect()[0][0] == 10


def test_at_fid_in_list(spark, at_poly):
    # ogr_sql_7/8: fids of eas_id IN (158,165) are 7,8; wildcard rows too
    got = [r["fid"] for r in arun(
        spark, "select eas_id, fid from poly where eas_id in (158,165) "
               "order by fid", at_poly).collect()]
    assert got == [7, 8]
    got = sorted(r["prfedea"] for r in arun(
        spark, "select * from poly where eas_id in (158,165)",
        at_poly).collect())
    assert got == ["35043369", "35043408"]


def test_at_quoted_table(spark, at_poly):
    # ogr_sql_9
    assert arun(spark, "select * from \"poly\" where eas_id in (158,165)",
                at_poly).count() == 2


def test_at_like_ilike(spark, at_poly):
    # ogr_sql_ilike / ogr_sql_like on a prime_meridian-shaped layer
    pmdf = at_poly.sparkSession.createDataFrame(
        [(0, "Greenwich")], "ord int, pm_name string")
    for pat, op, n in [("GREEN%", "ilike", 1), ("%WICH", "ilike", 1),
                       ("FOO%", "ilike", 0), ("Green%", "like", 1),
                       ("%wich", "like", 1), ("GREEN%", "like", 0)]:
        got = arun(spark,
                   f"select * from pm where pm_name {op} '{pat}'",
                   at_poly, pm=pmdf).count()
        assert got == n, (pat, op)


def test_at_agg_empty_input(spark, at_poly):
    # ogr_sql_11/31: MAX/MIN over an empty selection is one NULL row
    r = arun(spark, "select max(eas_id) from poly where area = 0",
             at_poly).collect()
    assert len(r) == 1 and r[0]["max_eas_id"] is None


def test_at_cast_types(spark, at_poly):
    # ogr_sql_17 (RFC 21): CHARACTER(10) -> string, NUMERIC(7,3) -> real
    df = arun(spark, "select CAST(fid as CHARACTER(10)) as f, "
                     "CAST(area as numeric(7,3)) as a from poly "
                     "where fid = 7", at_poly)
    types = dict(df.dtypes)
    assert types == {"f": "string", "a": "double"}
    r = df.collect()[0]
    assert r["f"] == "7" and r["a"] == 107.0


def test_at_geom_area_special_field(spark, at_poly):
    # ogr_sql_25: filter + select on OGR_GEOM_AREA
    r = arun(spark, "SELECT prfedea, OGR_GEOM_AREA FROM poly "
                    "WHERE OGR_GEOM_AREA > 108.5", at_poly).collect()
    assert {row["ogr_geom_area"] for row in r} == {109.0}


def test_at_literal_alias(spark, at_poly):
    # ogr_sql_26: string literals with explicit and implicit aliases
    r = arun(spark, "SELECT 'literal_value' AS my_column, "
                    "'literal_value2' my_column2 FROM poly "
                    "where fid = 0", at_poly).collect()[0]
    assert r["my_column"] == "literal_value"
    assert r["my_column2"] == "literal_value2"


def test_at_datetime_slash_literals(spark, at_poly):
    # ogr_sql_27: OGR accepts 'YYYY/MM/DD hh:mm:ss' literals
    import datetime as dt

    rows = [(0, "foo1", dt.datetime(2009, 10, 1, 0, 0, 0)),
            (1, "foo2", dt.datetime(2009, 11, 15, 11, 59, 59)),
            (2, "foo3", dt.datetime(2009, 12, 31, 23, 0, 0)),
            (3, "foo4", dt.datetime(2010, 1, 1, 0, 0, 0)),
            (4, "foo5", dt.datetime(2010, 2, 1, 0, 0, 0))]
    tdf = at_poly.sparkSession.createDataFrame(
        rows, "ord int, name string, timestamp timestamp")
    got = [r["name"] for r in arun(
        spark,
        "SELECT * FROM testdatetime WHERE "
        "timestamp < '2010/04/01 00:00:00' AND "
        "timestamp > '2009/11/15 11:59:59' AND "
        "timestamp != '2009/12/31 23:00:00' "
        "ORDER BY timestamp DESC",
        at_poly, testdatetime=tdf).collect()]
    assert got == ["foo5", "foo4"]


def test_at_is_null(spark, at_poly):
    # ogr_sql_29
    ndf = at_poly.sparkSession.createDataFrame(
        [(0, "a"), (1, "b"), (2, None)], "ord int, strfield string")
    assert arun(spark, "select * from lyr where strfield is null",
                at_poly, lyr=ndf).count() == 1
    assert arun(spark, "select * from lyr where strfield is not null",
                at_poly, lyr=ndf).count() == 2


def test_at_min_count_mix(spark, at_poly):
    # ogr_sql_30
    r = arun(spark, "select min(eas_id), count(*) from poly",
             at_poly).collect()[0]
    assert r["min_eas_id"] == 158 and r["count_*"] == 10


def test_at_in_string_coercion(spark, at_poly):
    # ogr_sql_34: implicit string -> numeric conversion inside IN
    r = arun(spark, "select count(*) from poly where eas_id in ('165')",
             at_poly).collect()[0]
    assert r["count_*"] == 1


def test_at_distinct_includes_null(spark, at_poly):
    # ogr_sql_36: DISTINCT over a column with NULLs keeps the NULL entry
    ndf = at_poly.sparkSession.createDataFrame(
        [(0, 1), (1, None), (2, 1)], "ord int, intfield int")
    got = [r[0] for r in arun(
        spark, "select distinct intfield from lyr",
        at_poly, lyr=ndf).collect()]
    assert got == [None, 1]


def test_at_geometry_special_fields(spark, at_poly):
    # ogr_sql_13/14: OGR_GEOMETRY type name, OGR_GEOM_WKT, OGR_STYLE over
    # a WKB geometry column
    import numpy as np

    from gdal_spark import wkb as W

    sq = W.dumps_polygon([np.asarray(
        [(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)])])
    pt = W.dumps_point(1.0, 1.0)
    gdf = at_poly.sparkSession.createDataFrame(
        [(0, bytearray(sq), "BRUSH(fc:#000000)"),
         (1, bytearray(pt), "PEN(c:#ff0000)")],
        "ord int, geom binary, style string")
    rows = execute_sql(
        spark,
        "select OGR_GEOMETRY, OGR_STYLE from lyr "
        "where OGR_GEOMETRY = 'POLYGON'",
        {"lyr": gdf}, fid_order={"lyr": "ord"},
        geom_cols={"lyr": "geom"}, style_cols={"lyr": "style"}).collect()
    assert len(rows) == 1
    assert rows[0]["ogr_geometry"] == "POLYGON"
    assert rows[0]["ogr_style"].startswith("BRUSH")
    rows = execute_sql(
        spark,
        "select ogr_geom_wkt, ogr_geom_area from lyr "
        "where ogr_geom_wkt LIKE 'POLYGON%'",
        {"lyr": gdf}, fid_order={"lyr": "ord"},
        geom_cols={"lyr": "geom"}).collect()
    assert len(rows) == 1
    assert rows[0]["ogr_geom_wkt"].startswith("POLYGON ((0 0,")
    assert rows[0]["ogr_geom_area"] == 4.0


def test_at_select_star_except(spark, at_poly):
    # SELECT * EXCEPT(col) field-exclusion wildcard (swq_parser.y:866)
    df = arun(spark, "select * except(prfedea, area) from poly "
                     "where eas_id = 158", at_poly)
    assert "prfedea" not in df.columns and "area" not in df.columns
    assert "eas_id" in df.columns and df.count() == 1


# ---------------------------------------------------------------------------
# Ported autotest/ogr/ogr_sql_rfc28.py expression-SQL cases.
# ---------------------------------------------------------------------------


def test_rfc28_literal_and_field_naming(spark, at_poly, at_idlink):
    # rfc28_12: literals get field_N names (N = select-item position
    # here; OGR numbers post-expansion output columns), explicit and
    # implicit aliases win
    r = arun(spark,
             "SELECT 'constant string', 'other' as abc, eas_id "
             "from idlink where eas_id = 165",
             at_poly, idlink=at_idlink).collect()
    assert len(r) == 1
    assert r[0]["field_1"] == "constant string"
    assert r[0]["abc"] == "other"
    assert r[0]["eas_id"] == 165


def test_rfc28_substr_where_and_naming(spark, at_poly):
    # rfc28_13/14/26: SUBSTR in WHERE; unaliased SUBSTR named
    # substr_<col>; negative offsets count from the end
    assert arun(spark, "SELECT * from poly "
                       "where SUBSTR(prfedea,5,4) = '3369'",
                at_poly).count() == 1
    r = arun(spark, "SELECT SUBSTR(prfedea,-2) from poly "
                    "where eas_id in (158,165)", at_poly).collect()
    assert sorted(x["substr_prfedea"] for x in r) == ["08", "69"]


def test_rfc28_concat_multi_arg(spark, at_poly):
    # rfc28_15: CONCAT with >2 args + CAST inside; named concat_<col>
    r = arun(spark,
             "SELECT CONCAT(prfedea,' ',CAST(eas_id AS CHARACTER(3))) "
             "from poly where eas_id = 158", at_poly).collect()
    assert r[0]["concat_prfedea"] == "35043369 158"


def test_rfc28_negative_number_parsing(spark, at_poly):
    # rfc28_16: '3--1' is subtraction of a negative, not a SQL comment
    r = arun(spark, "SELECT -1, 3--1, 3*-1, 2e-1, 3-1 from poly "
                    "where eas_id = 158", at_poly).collect()[0]
    assert list(r) == [-1, 4, -3, 0.2, 2]


def test_rfc28_integer_division(spark, at_poly):
    # rfc28_17: int/int is integer division; any float operand floats
    r = arun(spark, "SELECT 5/2, 5.0/2.0, 5/2.0, 5.0/2 from poly "
                    "where eas_id = 158", at_poly).collect()[0]
    assert list(r) == [2, 2.5, 2.5, 2.5]


def test_rfc28_count_distinct_naming(spark, at_poly, at_idlink):
    # rfc28_18: COUNT(distinct col) named count_<col>; alias wins
    r = arun(spark,
             'SELECT COUNT(distinct eas_id), COUNT(distinct eas_id) '
             'as "xx" from idlink',
             at_poly, idlink=at_idlink).collect()[0]
    assert r["count_eas_id"] == 7 and r["xx"] == 7


def test_rfc28_not_in_between_like(spark, at_poly):
    # rfc28_19/21/22/23: NOT IN, [NOT] BETWEEN, NOT LIKE
    assert arun(spark, "select * from poly "
                       "where eas_id not in (158,165)",
                at_poly).count() == 8
    n_b = arun(spark, "select * from poly "
                      "where eas_id between 165 and 169",
               at_poly).count()
    n_c = arun(spark, "select * from poly "
                      "where eas_id >= 165 and eas_id <= 169",
               at_poly).count()
    assert n_b == n_c == 4
    assert arun(spark, "select * from poly "
                       "where eas_id not between 165 and 169",
                at_poly).count() == 6
    assert arun(spark, "select * from poly "
                       "where prfedea NOT LIKE '35043369'",
                at_poly).count() == 9


def test_rfc28_null_select(spark, at_poly):
    # rfc28_24: NULL literals select as unset fields
    r = arun(spark,
             "select eas_id, NULL as nullstrfield, "
             "CAST(null as integer) as nullintfield from poly "
             "where NULL IS NULL", at_poly)
    rows = r.collect()
    assert len(rows) == 10
    assert rows[0]["nullstrfield"] is None
    assert rows[0]["nullintfield"] is None
    assert dict(r.dtypes)["nullintfield"] == "int"


def test_rfc28_like_escape(spark, at_poly):
    # rfc28_25: LIKE ... ESCAPE
    assert arun(spark, "select * from poly "
                       "where prfedea LIKE 'x35043408' ESCAPE 'x'",
                at_poly).count() == 1


def test_rfc28_float_trailing_dot(spark, at_poly):
    # rfc28_27: trailing-dot literals stay floating point
    assert arun(spark, "SELECT * FROM poly "
                       "WHERE 4000000000. > 2000000000.",
                at_poly).count() == 10


def test_rewrites_protect_string_literals(spark, at_poly):
    # '--' and FID inside string literals must not be rewritten
    r = arun(spark, "SELECT 'a--b' as d, 'FID' as f, prfedea from poly "
                    "where prfedea like '%--%' or eas_id = 158",
             at_poly).collect()
    assert len(r) == 1 and r[0]["d"] == "a--b" and r[0]["f"] == "FID"


def test_ogr_layer_featurecount_and_extent(spark, poly):
    """SQLite-dialect layer functions (ogrsqlitevirtualogr.cpp:
    ogr_layer_FeatureCount :2097, ogr_layer_Extent :1990) rewritten to
    scalar subqueries; Extent returns the envelope polygon of the whole
    layer (checked against the per-feature bbox columns)."""
    rows = execute_sql(
        spark,
        "SELECT eas_id, ogr_layer_FeatureCount('poly') AS cnt, "
        "ST_XMin(ogr_layer_Extent('poly')) AS lminx, "
        "ST_YMax(ogr_layer_Extent('poly')) AS lmaxy "
        "FROM poly WHERE eas_id <= 159",
        {"poly": poly}, fid_order={"poly": "zone_id"},
        geom_cols={"poly": "geom"}).collect()
    assert len(rows) == 2
    exp = poly.selectExpr("min(minx) as minx", "max(maxy) as maxy",
                          "count(*) as n").collect()[0]
    for r in rows:
        assert r["cnt"] == exp["n"]
        assert r["lminx"] == exp["minx"]
        assert r["lmaxy"] == exp["maxy"]


def test_scalar_subquery_in_select_list(spark, poly):
    """A depth-0 FROM must not be confused by a subquery FROM in the
    select list (the head split is paren-aware)."""
    rows = execute_sql(
        spark,
        "SELECT eas_id, (SELECT COUNT(*) FROM poly) AS total FROM poly "
        "ORDER BY eas_id LIMIT 2",
        {"poly": poly}, fid_order={"poly": "zone_id"}).collect()
    assert [r["eas_id"] for r in rows] == [158, 159]
    assert all(r["total"] == poly.count() for r in rows)


# ---------------------------------------------------------------------------
# round-3 grammar-parity additions (the four documented divergences +
# further ogr_sql_test.py ports)
# ---------------------------------------------------------------------------


def test_distinct_multiple_columns_rejected(spark, poly):
    """swq_select.cpp:1049 — OGR errors on multi-column DISTINCT."""
    with pytest.raises(ValueError, match="DISTINCT not supported"):
        run(spark, "SELECT DISTINCT eas_id, prfedea FROM poly", poly)


def test_distinct_with_aggregate_rejected(spark, poly):
    """swq_select.cpp:333 / :1095 — DISTINCT cannot mix with
    aggregation."""
    with pytest.raises(ValueError):
        run(spark, "SELECT DISTINCT COUNT(eas_id) FROM poly", poly)
    with pytest.raises(ValueError):
        run(spark, "SELECT DISTINCT MIN(eas_id) FROM poly", poly)


def test_literal_field_numbering_post_star_expansion(spark, poly):
    """ogr_gensql.cpp:199 — an unaliased literal is FIELD_N where N is
    the OUTPUT column position counting expanded ``*`` fields."""
    width = len(poly.columns)
    df = execute_sql(spark, "SELECT *, 5 FROM poly", {"poly": poly})
    assert df.columns[-1] == f"field_{width + 1}"
    # without a star the position equals the select-item index
    df2 = execute_sql(spark, "SELECT eas_id, 5, 'x' FROM poly",
                      {"poly": poly})
    assert df2.columns[1] == "field_2" and df2.columns[2] == "field_3"


def test_schema_aware_integer_division(spark, poly):
    """swq type promotion (rfc28_17 / ogr_sql_49): int column / int
    literal divides integrally; any float operand keeps float
    semantics."""
    df = run(spark, "SELECT eas_id / 4 FROM poly "
                    "WHERE eas_id = 170", poly)
    assert df.collect()[0][0] == 42          # 170 div 4, not 42.5
    df = run(spark, "SELECT eas_id / 4.0 FROM poly "
                    "WHERE eas_id = 170", poly)
    assert df.collect()[0][0] == 42.5
    df = run(spark, "SELECT area / eas_id FROM poly "
                    "WHERE eas_id = 170", poly)
    assert isinstance(df.collect()[0][0], float)
    # int column / int column
    df = run(spark, "SELECT eas_id / zone_id FROM poly "
                    "WHERE zone_id = 4", poly)
    v = df.collect()[0][0]
    assert v == int(v) and not isinstance(v, float)


def test_arithmetic_expression_typing_ogr_sql_49(spark, poly):
    """ogr_sql_test.py::test_ogr_sql_49 — literal arithmetic typing."""
    cases = [("1/1", 1), ("1/1.", 1.0), ("cast((1) as integer)/1.", 1.0),
             ("1./cast((1) as integer)", 1.0), ("1.5+1", 2.5),
             ("(1*1)+1.5", 2.5), ("1+1", 2),
             ("cast(1 as integer)+ 1234567890123", 1234567890124),
             ("cast(1 as integer)* 1234567890123", 1234567890123)]
    for expr, want in cases:
        got = run(spark, f"select {expr} as result from poly limit 1",
                  poly).collect()[0][0]
        assert got == want, expr
        assert isinstance(got, float) == isinstance(want, float), expr


def test_like_escape_with_doubled_quote(spark):
    """The LIKE ESCAPE sanitizer scans '' as one literal quote: an
    escaped quote unwraps to '' (not a literal-terminating bare
    quote)."""
    df = spark.createDataFrame(
        [("a'bc",), ("abc",), ("a%bc",)], "s string")
    out = execute_sql(
        spark, "select s from t where s like 'a!''%' escape '!'",
        {"t": df})
    assert [r[0] for r in out.collect()] == ["a'bc"]
    out2 = execute_sql(
        spark, "select s from t where s like 'a!%%' escape '!'",
        {"t": df})
    assert [r[0] for r in out2.collect()] == ["a%bc"]


def test_quote_escape_literals_ogr_sql_43(spark, poly):
    """ogr_sql_test.py::test_ogr_sql_43 — '"' stays a string literal
    (not an identifier), '''' is one quote char, backslash is
    literal."""
    r = run(spark, "SELECT '\"' as a, '\\' as b, '''' as c "
                   "FROM poly LIMIT 1", poly).collect()[0]
    assert r["a"] == '"' and r["b"] == "\\" and r["c"] == "'"


def test_from_inside_string_literal_head_split(spark, poly):
    """The depth-0 masker honors '' escapes: a FROM inside a literal
    containing an escaped quote must not split the head."""
    r = run(spark, "SELECT 'it''s from mars' as a FROM poly LIMIT 1",
            poly).collect()[0]
    assert r["a"] == "it's from mars"


def test_huge_select_list_ogr_sql_35(spark, poly):
    """ogr_sql_test.py::test_ogr_sql_35 — 1024-column select list."""
    cols = "area"
    for _ in range(10):
        cols = cols + "," + cols
    df = run(spark, f"select {cols} from poly", poly)
    assert len(df.columns) == 1024


def test_order_by_special_fields_ogr_sql_39_40(spark, poly):
    """ogr_sql_test.py::test_ogr_sql_39/40 — ORDER BY on float/int
    special fields."""
    rows = run(spark, "SELECT eas_id, OGR_GEOM_AREA FROM poly "
                      "ORDER BY OGR_GEOM_AREA", poly).collect()
    areas = [r[1] for r in rows]
    assert areas == sorted(areas)
    rows = run(spark, "SELECT FID FROM poly ORDER BY FID DESC LIMIT 1",
               poly).collect()
    assert rows[0][0] == poly.count() - 1


def test_empty_string_compare_ogr_sql_42(spark, poly):
    """ogr_sql_test.py::test_ogr_sql_42 — comparing to ''."""
    assert run(spark, "SELECT * FROM poly WHERE prfedea <> ''",
               poly).count() == poly.count()


def test_chained_integer_division_typing(spark, poly):
    """swq types every arithmetic node (swq_op_general.cpp checker):
    a/b/c over ints chains integer division left-assoc; a/b*c/d groups
    ((a/b)*c)/d — NOT (a/b)*(c/d); one float anywhere promotes the
    chain; int division inside function args is typed too."""
    r = run(spark,
            "SELECT eas_id, eas_id / 7 / 3, eas_id / 7 * 5 / 3, "
            "eas_id / (7 + 3), eas_id / 7 / 2.0, "
            "ABS(eas_id / 7) FROM poly ORDER BY eas_id", poly).collect()
    for row in r:
        e = row[0]
        assert row[1] == (e // 7) // 3
        assert row[2] == ((e // 7) * 5) // 3, (e, row[2])
        assert row[3] == e // 10
        assert abs(row[4] - (e // 7) / 2.0) < 1e-12
        assert row[5] == e // 7


def test_ambiguous_bare_int_name_not_rewritten(spark, poly):
    """A bare column name that is int-typed in one joined layer but
    float-typed in another must NOT trigger integer division (the type
    is scope-ambiguous); the qualified names keep their exact types."""
    import pandas as pd

    a = spark.createDataFrame(pd.DataFrame({"k": [1, 2], "v": [7, 9]}))
    b = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2], "v": [7.0, 9.0]}))
    out = execute_sql(
        spark,
        "SELECT a.k, a.v / 2, b.v / 2 FROM a "
        "JOIN b ON a.k = b.k ORDER BY a.k",
        {"a": a, "b": b}).collect()
    assert out[0][1] == 3 and isinstance(out[0][1], int)  # int div
    assert abs(out[0][2] - 3.5) < 1e-12  # float stays float


# ---------------------------------------------------------------------------
# Round-4 ports from autotest/ogr/ogr_sql_test.py (cases not yet covered)
# ---------------------------------------------------------------------------


def test_distinct_where_orderby_ogr_sql_3(spark, poly):
    """ogr_sql_3 / ogr_sql_3_desc: DISTINCT + WHERE + ORDER BY [DESC]."""
    up = [r[0] for r in run(
        spark, "select distinct eas_id from poly where eas_id < 170 "
               "order by eas_id", poly).collect()]
    assert up == sorted(up) and all(v < 170 for v in up) and len(up) > 1
    dn = [r[0] for r in run(
        spark, "select distinct eas_id from poly where eas_id < 170 "
               "order by eas_id desc", poly).collect()]
    assert dn == up[::-1]


def test_distinct_on_empty_ogr_sql_12(spark, poly):
    """ogr_sql_12: DISTINCT over an empty selection returns 0 rows."""
    assert run(spark, "select distinct eas_id from poly "
                      "where eas_id < 0", poly).count() == 0


def test_fid_in_where_ogr_sql_15(spark, poly):
    """ogr_sql_15: filtering by the FID special field."""
    rows = run(spark, "select fid, eas_id, prfedea from poly where fid = 7",
               poly).collect()
    assert len(rows) == 1 and rows[0][0] == 7


def test_aggregate_over_empty_ogr_sql_31(spark, poly):
    """ogr_sql_31/32 (#4022): MIN over an empty WHERE still yields ONE
    summary record with a NULL value."""
    rows = run(spark, "select min(eas_id) from poly where area = 0",
               poly).collect()
    assert len(rows) == 1 and rows[0][0] is None


def test_max_geom_area_ogr_sql_38(spark, poly):
    """ogr_sql_38: aggregate over the OGR_GEOM_AREA special field."""
    rows = run(spark, "SELECT MAX(OGR_GEOM_AREA) FROM poly", poly).collect()
    direct = max(r[0] for r in poly.select("area").collect())
    assert len(rows) == 1 and abs(rows[0][0] - direct) < 1e-9


def test_order_by_fid_desc_ogr_sql_40(spark, poly):
    """ogr_sql_40: ORDER BY FID DESC — the int special field sorts."""
    rows = run(spark, "SELECT FID, eas_id FROM poly ORDER BY FID DESC",
               poly).collect()
    fids = [r[0] for r in rows]
    assert fids == sorted(fids, reverse=True) and fids[0] == poly.count() - 1


def test_order_by_ogr_geometry_ogr_sql_41(spark, poly):
    """ogr_sql_41: ORDER BY the OGR_GEOMETRY string special field (the
    geometry type name) is accepted and stable."""
    rows = run(spark, "SELECT FID, OGR_GEOMETRY FROM poly "
                      "ORDER BY OGR_GEOMETRY, FID", poly,
               geom_cols={"poly": "geom"}).collect()
    assert rows[0][0] == 0 and all(r[1] == rows[0][1] for r in rows)


def test_null_sorting_ogr_sql_47(spark):
    """ogr_sql_47 (#6155): NULLs order first ascending (OGR compares the
    unset field as less-than any set value)."""
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame(
        {"text_value": ["b", None, "a", None, "c"],
         "zid": [0, 1, 2, 3, 4]}))
    rows = execute_sql(
        spark, "SELECT text_value FROM sort_test ORDER BY text_value",
        {"sort_test": df}, fid_order={"sort_test": "zid"}).collect()
    vals = [r[0] for r in rows]
    assert vals[:2] == [None, None] and vals[2:] == ["a", "b", "c"]


def test_sort_1000_elements_ogr_sql_48(spark):
    """ogr_sql_48: ORDER BY over 1000 rows returns the exact sequence."""
    import pandas as pd

    vals = [(i + 1) if i % 2 == 0 else (1001 - i) for i in range(1000)]
    df = spark.createDataFrame(pd.DataFrame(
        {"int_field": vals, "zid": list(range(1000))}))
    rows = execute_sql(
        spark, "SELECT int_field FROM test ORDER BY int_field",
        {"test": df}, fid_order={"test": "zid"}).collect()
    assert [r[0] for r in rows] == list(range(1, 1001))


def test_strict_quoting_ogr_sql(spark):
    """strict_quoting_non_aggregate/aggregate: single quotes are string
    LITERALS, double quotes are identifiers — including an aliased
    double-quoted output name and aggregates over quoted columns."""
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame(
        {"id": [1, 3], "frm": ["not_from", "from"], "zid": [0, 1]}))
    rows = execute_sql(
        spark,
        "select id, 'id', \"id\" as id2, id as \"id3\", frm "
        "from test where frm = 'from'",
        {"test": df}, fid_order={"test": "zid"}).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r[0] == 3 and r[1] == "id" and r[2] == 3 and r[3] == 3 \
        and r[4] == "from"
    agg = execute_sql(
        spark,
        'select max("id"), max(id), count("id"), count(id) from test',
        {"test": df}, fid_order={"test": "zid"}).collect()[0]
    assert list(agg) == [3, 3, 2, 2]


def test_string_plus_concat_rfc28_3(spark, poly):
    """rfc28_2/3: '+' concatenates when either operand is a string
    (CONCAT equivalence), including chains; numeric '+' unaffected
    (rfc28_1 arithmetic filter)."""
    target = run(spark, "SELECT prfedea FROM poly ORDER BY FID",
                 poly).collect()[0][0]
    n = run(spark, f"SELECT eas_id FROM poly WHERE 'x'+PRFEDEA = 'x{target}'",
            poly).count()
    assert n == 1
    n2 = run(spark,
             f"SELECT eas_id FROM poly WHERE 'x'+PRFEDEA+'y' = 'x{target}y'",
             poly).count()
    assert n2 == 1
    # numeric + stays arithmetic
    n3 = run(spark, "SELECT eas_id FROM poly WHERE 160+7 > eas_id",
             poly).count()
    assert n3 == run(spark, "SELECT eas_id FROM poly WHERE eas_id < 167",
                     poly).count()


def test_modulo_and_quoted_field_rfc28_4_6(spark, poly):
    """rfc28_4: '%' modulo; rfc28_6: double-quoted field name."""
    mod = [r[0] for r in run(
        spark, "SELECT eas_id FROM poly WHERE EAS_ID % 5 = 1",
        poly).collect()]
    assert mod and all(v % 5 == 1 for v in mod)
    assert run(spark, 'SELECT eas_id FROM poly WHERE "EAS_ID" = 166',
               poly).count() == 1


def test_substr_negative_offset_rfc28_26(spark, poly):
    """rfc28_26: SUBSTR with a negative offset takes from the end."""
    rows = run(spark, "SELECT SUBSTR(PRFEDEA, -2) FROM poly ORDER BY FID",
               poly).collect()
    full = run(spark, "SELECT PRFEDEA FROM poly ORDER BY FID",
               poly).collect()
    assert all(r[0] == f[0][-2:] for r, f in zip(rows, full))


def test_between_equivalences_rfc28_21_22(spark, poly):
    """rfc28_21/22: BETWEEN ≡ >= AND <=; NOT BETWEEN ≡ NOT(...)."""
    a = run(spark, "select eas_id from poly where eas_id between 165 "
                   "and 169", poly).count()
    b = run(spark, "select eas_id from poly where eas_id >= 165 and "
                   "eas_id <= 169", poly).count()
    c = run(spark, "select eas_id from poly where eas_id not between "
                   "165 and 169", poly).count()
    assert a == b and c == poly.count() - a


# ---------------------------------------------------------------------------
# Round-4 batch 3 of autotest/ogr/ogr_sql_rfc28.py ports
# ---------------------------------------------------------------------------


def test_rfc28_28_arithmetic_matrix(spark, poly):
    """rfc28_28: arithmetic operator evaluation across int/float/bigint
    operand mixes (the swq_op_general.cpp checker matrix). Expected
    values are Python eval, as in the reference test; OGR's integer
    division (6/3 -> 2) and Python's true division (2.0) agree
    numerically on every divisible fixture pair, and our translator's
    expression-tree typing reproduces OGR's int-vs-float result types
    (asserted via the division cases in ogrsql_execute_division_typing)."""
    formulas = []
    for op in ["+", "-", "*", "/", "%"]:
        formulas.append(("6" + op + "3"))
        formulas.append(("5.1" + op + "3.2"))
        formulas.append(("5" + op + "3.2"))
        formulas.append(("5.1" + op + "3"))
        formulas.append(("3000000000000" + op + "3"))
        if op != "/":
            formulas.append(("3" + op + "3000000000000"))
        formulas.append(("3000000000000" + op + "3.0"))
        if op != "/":
            formulas.append(("3.0" + op + "3000000000000"))
    sel = ", ".join(f"{f} AS c{i}" for i, f in enumerate(formulas))
    row = run(spark, f"SELECT {sel} FROM poly WHERE FID = 0",
              poly).collect()[0]
    for i, f in enumerate(formulas):
        expected = eval(f)  # noqa: S307 - fixture arithmetic
        got = row[i]
        assert got == pytest.approx(expected), (f, got, expected)


def test_rfc28_28_comparisons(spark, poly):
    cases = [("3 < 6", True), ("3 <= 3", True), ("3 > 6", False),
             ("3 >= 6", False), ("3 = 3", True), ("3 <> 6", True),
             ("3.0 < 6.0", True), ("3.0 = 3.0", True)]
    sel = ", ".join(f"{f} AS c{i}" for i, (f, _) in enumerate(cases))
    row = run(spark, f"SELECT {sel} FROM poly WHERE FID = 0",
              poly).collect()[0]
    for i, (f, expected) in enumerate(cases):
        assert bool(row[i]) == expected, f


def test_rfc28_29_null_int_arithmetic(spark, poly):
    """rfc28_29: int/float arithmetic with a NULL operand is NULL."""
    n = run(spark,
            "SELECT eas_id FROM poly WHERE "
            "(eas_id + CAST(NULL AS integer)) IS NOT NULL "
            "OR eas_id = 170 + CAST(NULL AS integer) "
            "OR (eas_id + CAST(NULL AS float)) IS NOT NULL "
            "OR eas_id = 170.0 + CAST(NULL AS float)", poly).count()
    assert n == 0


def test_rfc28_30_null_string_concat(spark, poly):
    """rfc28_30: CONCAT with a NULL operand is NULL."""
    n = run(spark,
            "SELECT prfedea FROM poly WHERE prfedea <> 'foo' "
            "AND CONCAT(prfedea, CAST(NULL AS character(32))) "
            "IS NOT NULL", poly).count()
    assert n == 0


def test_rfc28_26_substr_negative_offset(spark, poly):
    """rfc28_26: SUBSTR with negative offset counts from the end."""
    rows = run(spark,
               "SELECT SUBSTR(prfedea, -2) AS s FROM poly "
               "WHERE eas_id IN (168, 179) ORDER BY eas_id",
               poly).collect()
    expect = [r[0][-2:] for r in run(
        spark, "SELECT prfedea FROM poly WHERE eas_id IN (168, 179) "
               "ORDER BY eas_id", poly).collect()]
    assert [r["s"] for r in rows] == expect


def test_rfc28_many_or_many_and(spark, poly):
    """rfc28_many_or / many_and: 1024-term OR / AND chains must parse
    and evaluate (GDAL grew a non-recursive evaluator for these;
    Spark's parser + Catalyst balanced-And/Or handle them natively)."""
    # eas_id values are 158..179, so negative targets match nothing
    ors = " OR ".join(f"eas_id = {-(i + 1)}" for i in range(1024))
    assert run(spark, f"SELECT eas_id FROM poly WHERE 1 = 1 AND ({ors})",
               poly).count() == 0
    ors2 = " OR ".join(f"eas_id = {i - 100}" for i in range(1024))
    # eas_id values 158..179 fall inside [-100, 923]
    assert run(spark, f"SELECT eas_id FROM poly WHERE 1 = 1 AND ({ors2})",
               poly).count() == poly.count()
    ands = " AND ".join("eas_id = -1" for _ in range(1024))
    assert run(spark, f"SELECT eas_id FROM poly WHERE 1 = 1 AND ({ands})",
               poly).count() == 0
    ands2 = " AND ".join("eas_id >= 0" for _ in range(1024))
    assert run(spark, f"SELECT eas_id FROM poly WHERE 1 = 1 AND ({ands2})",
               poly).count() == poly.count()


def test_rfc28_nested_or_groupings(spark, poly):
    """rfc28_nested_or (gdal#3919): parenthesized OR groupings evaluate
    identically regardless of association."""
    match, other = 158, 9999
    shapes = [
        f"(eas_id = {other} OR eas_id = {other}) OR "
        f"(eas_id = {other} OR eas_id = {other} OR eas_id = {match})",
        f"(eas_id = {other} OR eas_id = {other} OR eas_id = {match}) OR "
        f"(eas_id = {other} OR eas_id = {other})",
        f"eas_id = {other} OR eas_id = {other} OR eas_id = {match}",
        f"eas_id = {other} OR (eas_id = {other} OR eas_id = {match})",
        f"(eas_id = {other} OR eas_id = {other}) OR eas_id = {match}",
    ]
    for cond in shapes:
        assert run(spark, f"SELECT eas_id FROM poly WHERE {cond}",
                   poly).count() == 1, cond


def test_ogr_sql_count_and_null(spark):
    """ogr_sql_test.py::test_ogr_sql_count_and_null: COUNT(col) skips
    NULLs, COUNT(DISTINCT col) counts distinct non-NULL, COUNT(*)
    counts rows; AVG/STDDEV_POP over an all-NULL selection are NULL;
    DISTINCT over a column whose first value is NULL returns the NULL
    group plus the values (gdal#4509 crash case)."""
    lyr = spark.createDataFrame(
        [(1, None, "456", None), (1, None, "456", None),
         (None, 2.3, None, "foo"), (None, 2.3, None, None)],
        "intfield int, floatfield double, strfield string, "
        "strfield_first_null string")
    for fld in ("intfield", "floatfield", "strfield"):
        r = execute_sql(
            spark,
            f"SELECT COUNT({fld}), COUNT(DISTINCT {fld}), COUNT(*) "
            "FROM layer", {"layer": lyr}).collect()[0]
        assert (r[0], r[1], r[2]) == (2, 1, 4), fld
    r = execute_sql(
        spark, "SELECT AVG(intfield), STDDEV_POP(intfield) "
               "FROM layer WHERE intfield IS NULL",
        {"layer": lyr}).collect()[0]
    assert r[0] is None and r[1] is None
    vals = [r[0] for r in execute_sql(
        spark, "SELECT DISTINCT strfield_first_null FROM layer",
        {"layer": lyr}).collect()]
    assert vals == [None, "foo"]


def test_ogr_sql_min_max_string_field(spark):
    """ogr_sql_test.py::test_ogr_sql_min_max_string_field: MIN/MAX of a
    string field compare lexicographically; over an all-NULL (or
    empty) layer they are NULL."""
    empty = spark.createDataFrame([(None,)], "str_field string")
    r = execute_sql(
        spark, "SELECT MIN(str_field), MAX(str_field) FROM layer",
        {"layer": empty}).collect()[0]
    assert r[0] is None and r[1] is None
    lyr = spark.createDataFrame([("z",), ("b",), ("ab",)],
                                "str_field string")
    r = execute_sql(
        spark, "SELECT MIN(str_field), MAX(str_field) FROM layer",
        {"layer": lyr}).collect()[0]
    assert (r[0], r[1]) == ("ab", "z")


# ---------------------------------------------------------------------------
# Round-4 batch 4: ogr_sql_test.py 8/20-23/32 ports + ALTER TABLE (33)
# ---------------------------------------------------------------------------


def test_ogr_sql_8_in_list(spark, poly):
    """ogr_sql_8/9: IN list filter (with and without quoted table)."""
    for table in ("poly", '"poly"'):
        rows = run(spark, f"select * from {table} where eas_id in (158,165)",
                   poly).collect()
        assert sorted(r["eas_id"] for r in rows) == [158, 165]


def test_ogr_sql_20_21_22_star_expansion(spark, poly):
    """ogr_sql_20/21/22: repeated * expansion and qualified-star
    naming — 'SELECT *, fid, *, poly.*' yields the layer fields, then
    fid, then the fields again (plain names), then once more under
    qualified names (gdaldataset star-expansion naming)."""
    out = run(spark, "SELECT * from poly", poly)
    assert out.count() == poly.count()

    out = run(spark, "SELECT *, fid from poly", poly)
    assert out.columns[-1].lower() == "fid"
    assert out.count() == poly.count()

    out = run(spark, "SELECT eas_id, fid, eas_id, poly.eas_id from poly",
              poly)
    assert len(out.columns) == 4
    row = out.orderBy(out.columns[1]).collect()[0]
    assert row[0] == row[2] == row[3]


def test_ogr_sql_23_distinct_with_geometry(spark, poly):
    assert run(spark, "SELECT DISTINCT prfedea from poly",
               poly).count() == poly.count()


def test_ogr_sql_32_min_over_empty_is_null_row(spark, poly):
    rows = run(spark, "select min(eas_id) from poly where area = 0",
               poly).collect()
    assert len(rows) == 1 and rows[0][0] is None


def test_ogr_sql_33_alter_table(spark, poly):
    """ogr_sql_33: ALTER TABLE ADD/RENAME/ALTER TYPE/DROP, with and
    without the COLUMN keyword, quoted identifiers included
    (gcore/gdaldataset.cpp ProcessSQLAlterTable*)."""
    layers = {"my_layer": poly.select("zone_id")}
    for extra in ("COLUMN ", ""):
        r = execute_sql(spark,
                        f"ALTER TABLE my_layer ADD {extra}myfield "
                        f"NUMERIC(20, 8)", layers)
        assert r is None
        assert dict(layers["my_layer"].dtypes)["myfield"] == "double"

        execute_sql(spark, f'ALTER TABLE my_layer RENAME {extra}myfield '
                           f'TO "myfield 2"', layers)
        cols = layers["my_layer"].columns
        assert "myfield" not in cols and "myfield 2" in cols

        execute_sql(spark, f'ALTER TABLE my_layer ALTER {extra}"myfield 2" '
                           f'TYPE CHARACTER', layers)
        assert dict(layers["my_layer"].dtypes)["myfield 2"] == "string"

        execute_sql(spark, f'ALTER TABLE my_layer ALTER {extra}"myfield 2" '
                           f'TYPE CHARACTER(15)', layers)
        assert dict(layers["my_layer"].dtypes)["myfield 2"] == "string"

        execute_sql(spark, f'ALTER TABLE my_layer DROP {extra}"myfield 2"',
                    layers)
        assert "myfield 2" not in layers["my_layer"].columns

    # the mutated layer still SELECTs
    execute_sql(spark, "ALTER TABLE my_layer ADD flag INTEGER", layers)
    out = execute_sql(spark, "SELECT * FROM my_layer", layers,
                      fid_order={"my_layer": "zone_id"})
    assert "flag" in out.columns and out.count() == poly.count()


# ---------------------------------------------------------------------------
# test_ogr_sql_on_null: NOT / IN / IS NULL three-valued-logic matrix over
# a layer with one all-NULL feature and one populated feature
# ---------------------------------------------------------------------------

_ON_NULL_CASES = [
    # intfield
    ("1 + intfield >= 0", 1), ("intfield = 0", 0), ("intfield = 1", 1),
    ("NOT intfield = 0", 1), ("NOT intfield = 1", 0),
    ("intfield IS NULL", 1), ("intfield IS NOT NULL", 1),
    ("intfield IN (NULL)", 0), ("NULL IN (NULL)", 0),
    ("NULL NOT IN (NULL)", 0), ("intfield NOT IN (NULL)", 0),
    ("intfield IN (1, NULL)", 1), ("intfield IN (0, NULL)", 0),
    ("intfield IN (NULL, 1)", 1), ("intfield IN (NULL, 0)", 0),
    ("intfield NOT IN (1, NULL)", 0), ("intfield NOT IN (0, NULL)", 0),
    ("intfield NOT IN (NULL, 1)", 0), ("intfield NOT IN (NULL, 0)", 0),
    ("(NOT intfield = 0) OR intfield IS NULL", 2),
    ("NOT (intfield = 0 OR intfield = 0)", 1),
    ("(NOT intfield = 0) AND NOT (intfield = 0)", 1),
    ("NOT (intfield = 0 OR intfield IS NULL)", 1),
    ("NOT (intfield = 0 OR intfield IS NULL)", 1),
    ("(NOT intfield = 0) AND NOT (intfield IS NULL)", 1),
    ("NOT (intfield = 0 OR intfield IS NOT NULL)", 0),
    ("(NOT intfield = 0) AND NOT (intfield IS NOT NULL)", 0),
    ("intfield <> 0 AND intfield <> 2", 1),
    ("intfield IS NOT NULL AND intfield NOT IN (2)", 1),
    ("NOT(intfield NOT IN (1) AND NULL NOT IN (1))", 1),
    ("NOT(intfield IS NOT NULL AND intfield NOT IN (2))", 1),
    ("NOT(NOT(intfield IS NOT NULL AND intfield NOT IN (2)))", 1),
    ("NOT (intfield = 0 AND intfield = 0)", 1),
    ("(intfield NOT IN (1) AND NULL NOT IN (1)) IS NULL", 1),
    # realfield
    ("1 + realfield >= 0", 1), ("realfield = 0", 0), ("realfield = 1", 1),
    ("NOT realfield = 0", 1), ("NOT realfield = 1", 0),
    ("realfield IS NULL", 1), ("realfield IS NOT NULL", 1),
    ("realfield IN (NULL)", 0), ("realfield NOT IN (NULL)", 0),
    ("realfield IN (1, NULL)", 1), ("realfield IN (0, NULL)", 0),
    ("realfield NOT IN (1, NULL)", 0), ("realfield NOT IN (0, NULL)", 0),
    ("(NOT realfield = 0) OR realfield IS NULL", 2),
    ("NOT (realfield = 0 OR realfield = 0)", 1),
    ("NOT (realfield = 0 OR realfield IS NULL)", 1),
    ("NOT (realfield = 0 OR realfield IS NOT NULL)", 0),
    # strfield
    ("strfield = ''", 0), ("strfield = 'foo'", 1),
    ("NOT strfield = ''", 1), ("NOT strfield = 'foo'", 0),
    ("strfield IS NULL", 1), ("strfield IS NOT NULL", 1),
    ("strfield IN ('foo', NULL)", 1), ("strfield NOT IN ('foo', NULL)", 0),
    ("strfield IN ('', NULL)", 0), ("strfield NOT IN ('', NULL)", 0),
    # datetimefield ('invalid' literal case omitted: GDAL raises a parse
    # error there; this translator's non-ANSI cast yields NULL instead —
    # a documented divergence, not a wrong row)
    ("datetimefield = '1970-01-01T00:00:00'", 0),
    ("datetimefield = '2024-01-01T00:00:00'", 1),
    ("NOT datetimefield = '1970-01-01T00:00:00'", 1),
    ("NOT datetimefield = '2024-01-01T00:00:00'", 0),
    ("datetimefield IS NULL", 1), ("datetimefield IS NOT NULL", 1),
    ("datetimefield IN ('2024-01-01T00:00:00', NULL)", 1),
    ("datetimefield NOT IN ('2024-01-01T00:00:00', NULL)", 0),
    ("datetimefield IN ('1970-01-01T00:00:00', NULL)", 0),
    ("datetimefield NOT IN ('1970-01-01T00:00:00', NULL)", 0),
]


def test_ogr_sql_on_null_matrix(spark):
    """autotest test_ogr_sql_on_null: three-valued logic through NOT /
    IN / IS NULL over one all-NULL and one populated feature — every
    expected count from the reference matrix."""
    import datetime

    layer = spark.createDataFrame(
        [(0, None, None, None, None),
         (1, 1, 1.0, datetime.datetime(2024, 1, 1), "foo")],
        "ord int, intfield int, realfield double,"
        " datetimefield timestamp, strfield string")
    layers = {"layer": layer}
    for where, expect in _ON_NULL_CASES:
        n = execute_sql(spark, f"select * from layer where {where}",
                        layers, fid_order={"layer": "ord"}).count()
        assert n == expect, (where, n, expect)


def test_like_ilike_utf8(spark):
    """autotest test_ogr_sql_like_utf8 / ilike_utf8: LIKE is case- and
    accent-sensitive, `_` matches one UTF-8 character; ILIKE folds case
    Unicode-aware (é ↔ É) but never folds accents (é ≠ e ≠ ê). The
    reference's truncated-UTF8 byte cases are unrepresentable in JVM
    strings and omitted."""
    layer = spark.createDataFrame([(0,)], "ord int")
    cases = [
        ("'é' LIKE 'É'", 0), ("'É' LIKE 'é'", 0), ("'É' LIKE 'É'", 1),
        ("'é' LIKE 'e'", 0), ("'é' LIKE 'ê'", 0), ("'é' LIKE ''", 0),
        ("'é' LIKE '_'", 1),
        ("'éven' LIKE '_ven'", 1), ("'éven' LIKE '%ven'", 1),
        ("'' LIKE '_'", 0),
        ("'éven' LIKE '_xen'", 0), ("'éven' LIKE '%xen'", 0),
        ("'é' ILIKE 'é'", 1), ("'é' ILIKE 'É'", 1), ("'É' ILIKE 'é'", 1),
        ("'É' ILIKE 'É'", 1), ("'é' ILIKE 'e'", 0), ("'é' ILIKE 'ê'", 0),
        ("'é' ILIKE ''", 0), ("'é' ILIKE '_'", 1),
        ("'éven' ILIKE '_ven'", 1), ("'éven' ILIKE '%ven'", 1),
        ("'' ILIKE '_'", 0),
        ("'éven' ILIKE '_xen'", 0), ("'éven' ILIKE '%xen'", 0),
    ]
    for where, expect in cases:
        n = execute_sql(spark, f"select * from layer where {where}",
                        {"layer": layer},
                        fid_order={"layer": "ord"}).count()
        assert n == expect, (where, n, expect)


def test_rfc28_union_all_three_branch_and(spark, poly):
    """rfc28 (gdal#3395): multi-AND WHERE on both branches of a UNION
    ALL must not confuse the statement splitter."""
    n = run(spark, "select * from poly where 1=1 and 1=1 and 1=0 "
                   "union all select * from poly where 1=1 and 1=1 and 1=0",
            poly).count()
    assert n == 0
    n = run(spark, "select * from poly where 1=1 and 1=1 and 1=1 "
                   "union all select * from poly where 1=1 and 1=1 and 1=1",
            poly).count()
    assert n == 2 * poly.count()


def test_rfc28_39_count_on_empty(spark, poly):
    rows = run(spark, "SELECT COUNT(*) from poly where 0 = 1",
               poly).collect()
    assert len(rows) == 1 and rows[0][0] == 0


def test_rfc28_35_multiple_distinct_rejected(spark, poly):
    """rfc28_35: 'SELECT DISTINCT a, DISTINCT b' is a parse error."""
    with pytest.raises(Exception):
        run(spark, "select distinct eas_id, distinct prfedea from poly",
            poly).collect()


def test_max_of_geom_area_special_field(spark, poly):
    # autotest ogr_sql_test.py::test_ogr_sql_38: MAX(OGR_GEOM_AREA)
    # in summary mode (#4633)
    r = run(spark, "SELECT MAX(OGR_GEOM_AREA) FROM poly", poly).collect()
    assert len(r) == 1
    from gdal_spark.zones import zones_rows
    assert r[0][0] == max(z[2] for z in zones_rows())


def test_order_by_geom_area_asc_first_row(spark, poly):
    # autotest test_ogr_sql_39: ORDER BY the float special field ASC —
    # the first feature is the smallest-area zone
    rows = run(spark, "SELECT eas_id, OGR_GEOM_AREA FROM poly "
                      "ORDER BY OGR_GEOM_AREA LIMIT 1", poly).collect()
    from gdal_spark.zones import zones_rows
    smallest = min(zones_rows(), key=lambda z: z[2])
    assert rows[0][0] == smallest[1]


def test_order_by_fid_desc(spark, poly):
    # autotest test_ogr_sql_40: ORDER BY FID DESC — first row carries
    # the highest FID
    rows = run(spark, "SELECT FID, eas_id FROM poly "
                      "ORDER BY FID DESC LIMIT 1", poly).collect()
    assert rows[0][0] == poly.count() - 1

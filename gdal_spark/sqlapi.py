"""ExecuteSQL surface: OGR SQL strings → Spark DataFrames.

Mirrors ``GDALDataset::ExecuteSQL(sql, dialect="OGRSQL")``
(gcore/gdaldataset.cpp:6872 dispatch; parser ogr/swq_parser.y; executor
ogr/ogrsf_frmts/generic/ogr_gensql.cpp). GDAL parses into a `swq_select`
IR and pull-executes row-at-a-time; here the translation target is a
Spark SQL string — Catalyst is the analyzer/optimizer/executor — with
OGR's dialect quirks rewritten first:

- special fields: ``FID`` (stable row id, ogr/ogr_p.h:164) and
  ``OGR_GEOM_AREA`` are materialized as columns before translation;
- ``HSTORE_GET_VALUE(x, 'k')`` (swq_op_general.cpp:169) →
  ``str_to_map(x, ',', '=>')['k']``;
- ``SELECT DISTINCT col`` is OGR's DISTINCT_LIST mode
  (ogr_gensql.cpp:637): the result is the *sorted* distinct value list,
  so an ORDER BY is appended when absent;
- ``JOIN … ON secondary.f = expr`` takes the FIRST matching secondary
  row per key (1:1 — ogr_gensql.cpp:1493-1523): the secondary view is
  pre-deduplicated to its first row per key in FID order;
- aggregates without GROUP BY are OGR's SUMMARY_RECORD mode — Spark's
  global aggregation already returns the single summary row;
- ``LIKE`` stays case-sensitive (swq_op_general.cpp:1102 default),
  matching Spark.

Grammar subset: SELECT [DISTINCT] list FROM layer [JOIN layer2 ON eq]
[WHERE expr] [ORDER BY keys] [LIMIT n] [OFFSET m], plus top-level
UNION ALL chains. Expressions pass through to Spark SQL (the OGR
expression language is ANSI-shaped; arithmetic/CAST/CONCAT/SUBSTR/
IN/BETWEEN/IS NULL/LIKE all coincide).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VIEW_PREFIX = "_ogrsql_"


def _rewrite_expressions(sql: str) -> str:
    out = re.sub(r"\bHSTORE_GET_VALUE\s*\(([^,]+),\s*('[^']*')\s*\)",
                 r"str_to_map(\1, ',', '=>')[\2]", sql, flags=re.I)
    out = re.sub(r"\bOGR_GEOM_AREA\b", "ogr_geom_area", out, flags=re.I)
    out = re.sub(r"\bFID\b", "fid", out)
    return out


_CLAUSE = re.compile(
    r"^\s*select\s+(?P<distinct>distinct\s+)?(?P<cols>.*?)\s+"
    r"from\s+(?P<table>[\w.\"']+)"
    r"(?:\s+(?!left\b|join\b|where\b|order\b|limit\b|offset\b)"
    r"(?P<talias>\w+))?"
    r"(?:\s+(?P<jointype>left\s+)?join\s+(?P<jtable>[\w.\"']+)"
    r"(?:\s+(?!on)(?P<jalias>\w+))?\s+on\s+(?P<joncond>.*?))?"
    r"(?:\s+where\s+(?P<where>.*?))?"
    r"(?:\s+order\s+by\s+(?P<order>.*?))?"
    r"(?:\s+limit\s+(?P<limit>\d+))?"
    r"(?:\s+offset\s+(?P<offset>\d+))?\s*$",
    re.I | re.S,
)


def _split_union_all(sql: str) -> list[str]:
    parts = []
    depth = 0
    last = 0
    low = sql.lower()
    i = 0
    while i < len(sql):
        c = sql[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "'":
            i += 1
            while i < len(sql) and sql[i] != "'":
                i += 1
        elif depth == 0 and low.startswith("union all", i):
            parts.append(sql[last:i])
            i += len("union all")
            last = i
            continue
        i += 1
    parts.append(sql[last:])
    return parts


def _prepare_layer(df: DataFrame, name: str, fid_order: str | None,
                   area_col: str | None) -> DataFrame:
    if "fid" not in df.columns and fid_order is not None:
        from gdal_spark.ogrsql import with_fid

        df = with_fid(df, fid_order)
    if area_col is not None and "ogr_geom_area" not in df.columns:
        df = df.withColumn("ogr_geom_area", F.col(area_col))
    return df


def execute_sql(spark: SparkSession, sql: str, layers: dict[str, DataFrame],
                fid_order: dict[str, str] | None = None,
                area_cols: dict[str, str] | None = None) -> DataFrame:
    """Run an OGR SQL statement over the given layers.

    layers: layer name → DataFrame. fid_order[layer] names the column
    defining FID/iteration order (GDAL FIDs are the stable row ids of
    the layer); area_cols[layer] names the planar-area column backing
    OGR_GEOM_AREA.
    """
    fid_order = fid_order or {}
    area_cols = area_cols or {}
    for name, df in layers.items():
        _prepare_layer(df, name, fid_order.get(name), area_cols.get(name)) \
            .createOrReplaceTempView(_VIEW_PREFIX + name)

    selects = _split_union_all(sql.strip().rstrip(";"))
    frames = [_execute_one(spark, s, layers, fid_order) for s in selects]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def _execute_one(spark: SparkSession, sql: str, layers: dict,
                 fid_order: dict) -> DataFrame:
    sql = _rewrite_expressions(sql)
    m = _CLAUSE.match(sql)
    if not m:
        raise ValueError(f"unsupported OGR SQL: {sql!r}")
    g = m.groupdict()
    table = g["table"].strip("'\"")
    if table not in layers:
        raise KeyError(f"unknown layer {table!r}")

    parts = [f"select {g['distinct'] or ''}{g['cols']}",
             f"from {_VIEW_PREFIX}{table}"]
    if g["talias"]:
        parts[-1] += f" {g['talias']}"
    else:
        parts[-1] += f" {table}"

    if g["jtable"]:
        jtable = g["jtable"].strip("'\"")
        if jtable not in layers:
            raise KeyError(f"unknown layer {jtable!r}")
        cond = g["joncond"].strip()
        # first-match semantics: dedupe the secondary to its first row
        # per join key in FID order (ogr_gensql.cpp:1520)
        key = _secondary_key(cond, jtable, g["jalias"])
        jview = _VIEW_PREFIX + jtable
        if key is not None:
            order = fid_order.get(jtable)
            if order is not None:
                first = (
                    f"(select * from (select *, row_number() over"
                    f" (partition by {key} order by {order}) as _rn"
                    f" from {jview}) _d where _rn = 1)"
                )
                jview = first
        jointype = "left join" if g["jointype"] else "join"
        jalias = g["jalias"] or jtable
        parts.append(f"{jointype} {jview} {jalias} on {cond}")
        # qualify bare secondary-table references in the ON clause
        parts[-1] = parts[-1].replace(f"{_VIEW_PREFIX}{jtable}.", f"{jalias}.")

    if g["where"]:
        parts.append(f"where {g['where']}")
    order = g["order"]
    if g["distinct"] and not order and "," not in g["cols"] \
            and "(" not in g["cols"]:
        order = g["cols"].strip()  # DISTINCT_LIST mode: sorted values
    if order:
        parts.append(f"order by {order}")
    if g["limit"]:
        parts.append(f"limit {g['limit']}")
    if g["offset"]:
        parts.append(f"offset {g['offset']}")

    body = "\n".join(parts)
    try:
        return spark.sql(body)
    except Exception as e:  # surface the translated SQL for debugging
        raise ValueError(f"translated SQL failed:\n{body}") from e


def _secondary_key(cond: str, jtable: str, jalias: str | None) -> str | None:
    """Extract the secondary join column from `sec.f = expr` (OGR
    restricts ON to this shape — swq_parser.y:1088)."""
    names = [jtable]
    if jalias:
        names.append(jalias)
    for side in re.split(r"=", cond):
        side = side.strip()
        mm = re.match(r"^(\w+)\.(\w+)$", side)
        if mm and mm.group(1) in names:
            return mm.group(2)
    return None

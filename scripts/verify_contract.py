"""Strict local mirror of the correctness driver's oracle compare.

Runs every __spark_entry__ query at sf0.01 against its DuckDB oracle and
compares the way the driver does: columns sorted by name, rows sorted by
value, then the STRING form of every value must match (the driver hashes
value representations, so Decimal('1.50') vs float64 1.5 is a fail even
when numerically equal — see CORRECTNESS_r01's seven hash-fails).

Usage: python scripts/verify_contract.py [name-substring ...]
Exit code 1 if any compared query mismatches or errors.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("documents", "embeddings", "events", "lineitem", "orders",
          "customer", "part", "supplier", "nation", "region")
SF = "/root/testdata/sf0.01"


def canon(df):
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        out[c] = out[c].map(lambda v: "NULL" if v is None or v != v else str(v))
    return out.sort_values(cols).reset_index(drop=True), cols


def main() -> int:
    import importlib

    filters = sys.argv[1:]
    contract = importlib.import_module("__spark_entry__")
    from gdal_spark.session import get_spark

    spark = get_spark("verify_contract", master="local[32]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"create view {t} as select * from"
                    f" read_parquet('{SF}/{t}.parquet')")
    qs, os_ = contract.queries(), contract.oracle_sql()
    n_fail = 0
    for name in qs:
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF).toPandas()
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc()
            n_fail += 1
            continue
        if name not in os_:
            print(f"rows {name}: {len(sdf)} rows (no oracle)"
                  f"  [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(os_[name]).df()
        except Exception:
            print(f"FAIL {name}: oracle error")
            traceback.print_exc()
            n_fail += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"FAIL {name}: columns {sorted(sdf.columns)}"
                  f" vs {sorted(odf.columns)}")
            n_fail += 1
            continue
        a, cols = canon(sdf)
        b, _ = canon(odf)
        if a.shape != b.shape:
            print(f"FAIL {name}: shape {a.shape} vs {b.shape}")
            n_fail += 1
            continue
        bad = [c for c in cols if a[c].tolist() != b[c].tolist()]
        if bad:
            n_fail += 1
            print(f"FAIL {name}: value-string mismatch in {bad}")
            for c in bad[:2]:
                for i, (x, y) in enumerate(zip(a[c], b[c])):
                    if x != y:
                        print(f"    {c} row{i}: spark={x!r} duck={y!r}")
                        break
        else:
            # dtype parity warning: str-equal but different pandas dtypes
            # (int32/int64 is fine; object-vs-float is a latent risk)
            dt = [c for c in cols
                  if (sdf[c].dtype.kind in "fO") != (odf[c].dtype.kind in "fO")]
            warn = f"  [dtype-warn {dt}]" if dt else ""
            print(f"PASS {name}: {len(a)} rows  [{time.time()-t0:.1f}s]{warn}")
    spark.stop()
    print("FAILURES:", n_fail)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

"""Local stand-in for the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB over the
same parquet dir, compare row count, schema (column names), and
order-insensitive values.

Usage: python tools/parity_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from soict20221_bigdata_financialplatform_spark.queries import ORACLE, QUERIES
from soict20221_bigdata_financialplatform_spark.session import get_spark
from soict20221_bigdata_financialplatform_spark.sources import TABLES


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # EXACT comparison — the engine's float policy (round accumulations
        # identically on both sides, never round single-op arithmetic) makes
        # every oracle query bit-exact vs DuckDB; any tolerance here would
        # only hide regressions. +0.0 normalizes -0.0 without changing value.
        return v + 0.0
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("+00:00", "")
    return v


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in idx], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{os.path.join(sf_dir, t + '.parquet')}'"
        )

    n_pass = n_fail = n_rows_only = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in ORACLE:
            print(f"rows-only {name}: {len(srows)} rows in {time.time()-t0:.1f}s")
            n_rows_only += 1
            continue
        try:
            res = con.sql(ORACLE[name])
            ocols = res.columns
            orows = [tuple(r) for r in res.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        sc, sr = _norm_rows(scols, srows)
        oc, orr = _norm_rows(ocols, orows)
        if sc != oc:
            print(f"FAIL {name}: schema spark={sc} duckdb={oc}")
            n_fail += 1
            continue
        if len(sr) != len(orr):
            print(f"FAIL {name}: rowcount spark={len(sr)} duckdb={len(orr)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sr, orr) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(sr)} rows differ; first: {bad[0]}")
            n_fail += 1
            continue
        print(f"PASS {name}: {len(sr)} rows in {time.time()-t0:.1f}s")
        n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

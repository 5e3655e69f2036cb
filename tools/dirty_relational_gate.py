"""Relational-robustness parity gate: run the FULL oracle suite on
deterministically corrupted copies of the RELATIONAL dimension/fact
tables (orders + customer + part + supplier) — the fourth dirt axis
after text (r12), numerics (r13), and embeddings (r14). The clean
TPC-H-ish testdata has dense referential integrity, no NULL dates, no
NULL/dangling foreign keys, and well-formed single-case group keys, so
these classes are invisible to the clean gate:

1. **NULL dates** (o_orderdate): range filters and date_trunc agree
   (NULL never matches a comparison in either engine), but any window
   or rank ORDER BY that a NULL date reaches hits the pinned
   ASC-NULL-default asymmetry (Spark NULLS FIRST, DuckDB NULLS LAST —
   tests/test_cross_engine_numeric.py).
2. **Boundary dates** (1901, 2199): year/quarter extraction, datediff
   spans, and bar/day derivations far outside the generator's window.
3. **NULL + dangling foreign keys** (o_custkey, c_nationkey,
   s_nationkey): inner joins must DROP them in both engines, left
   joins must NULL-fill identically, NULL group keys must form one
   group in both, and count(DISTINCT fk) must skip them in both.
4. **Degenerate string group keys**: empty string (distinct from NULL
   in BOTH engines — they must not merge), case variants, trailing
   whitespace, and an NBSP inside a key (byte-equality grouping —
   any oracle pair that trims/lowers one side only would split).
5. **Sign/zero/NULL money** on the columns the numeric gate does NOT
   touch (o_totalprice, c_acctbal, s_acctbal, p_retailprice): revenue
   sums, account-balance screens, and retail-price ratios silently
   assume positive values.

Deliberately OUT of scope (schema-contract columns, documented not
dodged): primary keys stay clean (o_orderkey, c_custkey, p_partkey,
s_suppkey — non-null and unique by DDL, the dirty_numeric_gate's key
contract); nation/region stay verbatim (fixed reference data — the
interesting failure mode is a FACT row pointing nowhere, covered by
the dangling-FK classes).

Corruption map (deterministic, by key modulo — same recipe every run):

orders, by ``o_orderkey % 10``:
  0  o_orderdate -> NULL          5  o_orderstatus -> '' (empty key)
  1  o_orderdate -> 1901-01-01    6  o_orderpriority -> trailing space
  2  o_orderdate -> 2199-12-31    7  o_totalprice -> -x
  3  o_custkey -> NULL            8  o_totalprice -> NULL
  4  o_custkey -> -1 (dangling)   9  untouched control

customer, by ``c_custkey % 8``:
  0  c_nationkey -> NULL          4  c_acctbal -> NULL
  1  c_nationkey -> 999 (dangling) 5 c_acctbal -> -x
  2  c_mktsegment -> ''           6  c_name -> NULL
  3  c_mktsegment -> NBSP variant 7  untouched control

part, by ``p_partkey % 8``:
  0  p_brand -> NULL              4  p_retailprice -> 0.0
  1  p_brand -> lower(x)          5  p_retailprice -> NULL
  2  p_type -> ''                 6  p_name -> NULL
  3  p_size -> NULL               7  untouched control

supplier, by ``s_suppkey % 6``:
  0  s_nationkey -> NULL          3  s_name -> ''
  1  s_acctbal -> -x              4  s_nationkey -> 999 (dangling)
  2  s_acctbal -> NULL            5  untouched control

Usage:
    python tools/dirty_relational_gate.py [base_sf_dir] [query ...]

Builds the corrupted tables under a per-base per-PID scratch dir (other
tables copied verbatim) and execs parity_check on the dir. Exit code =
parity_check's. Schema fidelity: corrupted tables are written back
through pyarrow CAST TO THE ORIGINAL ARROW SCHEMA, so parquet physical
types (timestamp unit, int widths) are identical to the driver's files.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
import sys

import duckdb
import pyarrow.parquet as pq


def _scratch(base: str) -> str:
    real = os.path.realpath(os.path.normpath(base))
    tag = hashlib.md5(real.encode()).hexdigest()[:8]
    return "/tmp/spark_graft_dirty_rel_{}_{}_{}".format(
        os.path.basename(real), tag, os.getpid()
    )


_ORDERS_SQL = """
SELECT o_orderkey,
       CASE o_orderkey % 10
         WHEN 3 THEN NULL
         WHEN 4 THEN -1
         ELSE o_custkey
       END AS o_custkey,
       CASE o_orderkey % 10
         WHEN 5 THEN ''
         ELSE o_orderstatus
       END AS o_orderstatus,
       CASE o_orderkey % 10
         WHEN 7 THEN -o_totalprice
         WHEN 8 THEN NULL
         ELSE o_totalprice
       END AS o_totalprice,
       CASE o_orderkey % 10
         WHEN 0 THEN NULL
         WHEN 1 THEN TIMESTAMP '1901-01-01 00:00:00'
         WHEN 2 THEN TIMESTAMP '2199-12-31 00:00:00'
         ELSE o_orderdate
       END AS o_orderdate,
       CASE o_orderkey % 10
         WHEN 6 THEN o_orderpriority || ' '
         ELSE o_orderpriority
       END AS o_orderpriority
FROM '{base}/orders.parquet'
"""

_CUSTOMER_SQL = """
SELECT c_custkey,
       CASE c_custkey % 8 WHEN 6 THEN NULL ELSE c_name END AS c_name,
       CASE c_custkey % 8
         WHEN 0 THEN NULL
         WHEN 1 THEN 999
         ELSE c_nationkey
       END AS c_nationkey,
       CASE c_custkey % 8
         WHEN 4 THEN NULL
         WHEN 5 THEN -c_acctbal
         ELSE c_acctbal
       END AS c_acctbal,
       CASE c_custkey % 8
         WHEN 2 THEN ''
         WHEN 3 THEN 'BUILD' || chr(160) || 'ING'
         ELSE c_mktsegment
       END AS c_mktsegment
FROM '{base}/customer.parquet'
"""

_PART_SQL = """
SELECT p_partkey,
       CASE p_partkey % 8 WHEN 6 THEN NULL ELSE p_name END AS p_name,
       CASE p_partkey % 8
         WHEN 0 THEN NULL
         WHEN 1 THEN lower(p_brand)
         ELSE p_brand
       END AS p_brand,
       CASE p_partkey % 8 WHEN 2 THEN '' ELSE p_type END AS p_type,
       CASE p_partkey % 8 WHEN 3 THEN NULL ELSE p_size END AS p_size,
       CASE p_partkey % 8
         WHEN 4 THEN 0.0
         WHEN 5 THEN NULL
         ELSE p_retailprice
       END AS p_retailprice
FROM '{base}/part.parquet'
"""

_SUPPLIER_SQL = """
SELECT s_suppkey,
       CASE s_suppkey % 6 WHEN 3 THEN '' ELSE s_name END AS s_name,
       CASE s_suppkey % 6
         WHEN 0 THEN NULL
         WHEN 4 THEN 999
         ELSE s_nationkey
       END AS s_nationkey,
       CASE s_suppkey % 6
         WHEN 1 THEN -s_acctbal
         WHEN 2 THEN NULL
         ELSE s_acctbal
       END AS s_acctbal
FROM '{base}/supplier.parquet'
"""

_TABLES = {
    "orders": _ORDERS_SQL,
    "customer": _CUSTOMER_SQL,
    "part": _PART_SQL,
    "supplier": _SUPPLIER_SQL,
}


def _rewrite(con, base: str, scratch: str, name: str, sql: str) -> None:
    """Corrupt via DuckDB, write back under the ORIGINAL arrow schema so
    parquet physical types match the driver's files bit-for-bit."""
    orig_schema = pq.read_schema(os.path.join(base, f"{name}.parquet"))
    orig_schema = orig_schema.remove_metadata()
    tbl = con.sql(sql.format(base=base)).arrow().cast(orig_schema)
    pq.write_table(tbl, os.path.join(scratch, f"{name}.parquet"))


def build(base: str) -> str:
    scratch = _scratch(base)
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)
    corrupted = {f"{n}.parquet" for n in _TABLES}
    for f in os.listdir(base):
        if f.endswith(".parquet") and f not in corrupted:
            shutil.copy(os.path.join(base, f), scratch)
    con = duckdb.connect()
    for name, sql in _TABLES.items():
        _rewrite(con, base, scratch, name, sql)
    return scratch


def main() -> int:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    d = build(base)
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        return subprocess.call(
            [sys.executable, os.path.join(here, "parity_check.py"), d]
            + sys.argv[2:]
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())

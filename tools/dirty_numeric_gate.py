"""Numeric-robustness parity gate: run the FULL oracle suite on
deterministically corrupted copies of the NUMERIC tables (events +
lineitem) — the dirty_text_gate's twin for the number classes the clean
testdata never exercises.

Why this exists (r13, the r12 VERDICT's task 3): the driver testdata's
prices/volumes are benign (events.value in [0.03, 327], lineitem money
in [914, 105k], no NULLs, no NaN/Inf, unique timestamps). Whole
divergence classes are invisible on it:

1. **Non-finite values**: NaN/±Inf flow differently through guarded
   divisions, ln(), micro-unit quantization (Spark ANSI cast vs DuckDB
   conversion errors are ASYMMETRIC — one returns NULL where the other
   aborts).
2. **Negative / zero measurements**: log-return chains (`ln(p1/p0)`),
   sqrt of variances, and `value > 0` day-close constructions (the r10
   q277/q280 lesson class) silently assume positive prices.
3. **Magnitude near the micro-unit overflow budgets** (the q145/q295
   class): Spark ANSI throws ARITHMETIC_OVERFLOW where DuckDB silently
   widens to HUGEINT — a query can pass the clean gate and die on one
   fat row.
4. **Duplicate-timestamp / duplicate-value ties**: window ORDER BYs and
   top-k ranks without a unique-key tiebreak order ties arbitrarily —
   DIFFERENTLY per engine.
5. **NULL payloads** (the r11 lesson-g class): NULL-skipping aggregates
   agree, but NULL ordering defaults differ (Spark ASC = NULLS FIRST,
   DuckDB ASC = NULLS LAST) wherever a NULL reaches an ORDER BY.

Deliberately OUT of scope (schema-contract columns, documented not
dodged):

- **Key columns stay clean** (event_id, user_id, ts≠NULL, l_orderkey,
  l_linenumber): they mirror the reference's Cassandra PRIMARY KEY
  ((symbol), ts) — non-null and unique by DDL (reference
  ``pipeline/warehouse.py`` schema); dirt arrives in payloads, not keys.
- **Money/quantity columns get sign/zero/magnitude/NULL dirt but stay
  FINITE**: their upstream provenance is decimal (a parquet DECIMAL or
  a parsed money string can encode -5 or NULL but never NaN/Inf); the
  non-finite classes live on events.value, the sensor-style double
  payload where IEEE specials actually occur.
- **Exact 6dp-half-way decimals are not injected**: round-to-6 on a
  tie splits the engines by documented design (CLAUDE.md invariant 2;
  Spark rounds the shortest-decimal string, DuckDB the binary value).
  The float policy handles tie-PRONE shapes structurally (integer
  micro-unit sums, discrete rank-picks); an adversarial exact-tie
  literal is out of the parity contract, not a latent bug.

Corruption map (deterministic, by key modulo — same recipe every run):

events, by ``event_id % 12``:
  0  value -> NaN            6  value -> value * 1e-9 (tiny)
  1  value -> +Infinity      7  value -> NULL
  2  value -> -Infinity      8  ts -> date_trunc('month', ts)  [heavy ties]
  3  value -> -value         9  value -> 42.0 (constant ties)
  4  value -> 0.0            10 props -> '{broken json'
  5  value -> value * 1e3    11 untouched control

The magnitude class (5) is calibrated to the engine's DOCUMENTED
magnitude contract, not beyond it: order-dependent float sums are made
bit-portable by round(sum, 6) BOTH sides (CLAUDE.md invariant 2), which
only works while the engines' different summation orders land within
the 6dp grain — i.e. ulp(n * max|x|) < 0.5e-6, so n * max|x| must stay
below ~2e9. Class 5's x1e3 (values to ~3.3e5, sf0.01 sums to ~3.3e9 per
1e4-row group) sits AT that boundary and near the micro-unit
squared-sum budgets (the q145/q295 class), which is the probe's job;
x1e7 was probed and pushes float sums to ~1e12 magnitude where NO
rounding policy can hold parity for ANY engine pair (17th significant
digit) — out of contract by documented design, not a latent bug.

lineitem, by ``(l_orderkey * 7 + l_linenumber) % 12``:
  0  l_quantity -> 0.0       6  l_tax -> NULL
  1  l_quantity -> -qty      7  l_shipdate -> NULL
  2  l_extendedprice -> -x   8  l_quantity -> 1e4 (budget probe)
  3  l_extendedprice -> x*1e3 9  l_tax -> -0.0
  4  l_discount -> 1.0       10 l_returnflag -> '' (empty key)
  5  l_discount -> NULL      11 untouched control

(Money-class magnitudes calibrated like events class 5: money sums
round to 2dp, so n * max|price| must stay under ~2e13; x1e3 puts
group sums near 1e11-1e12 — inside the documented contract, near the
decimal/micro-unit budgets.)

Usage:
    python tools/dirty_numeric_gate.py [base_sf_dir] [query ...]

Builds the corrupted tables under /tmp/spark_graft_dirty_num_<base> (other
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

# Scratch is suffixed with the base dir's name PLUS a hash of its
# resolved absolute path PLUS the PID: a fixed path let a subset
# invocation REBUILD the corpus under a still-running full gate (r13
# incident: 9 phantom FAILs from sf0.001 files swapped beneath an
# sf0.01 run), and basename-only still collided for two bases with the
# same leaf name or two concurrent invocations on the SAME base (r13
# ADVICE). The PID makes every invocation fully isolated; main()
# removes the dir after the parity run so /tmp doesn't accumulate.
def _scratch(base: str) -> str:
    real = os.path.realpath(os.path.normpath(base))
    tag = hashlib.md5(real.encode()).hexdigest()[:8]
    return "/tmp/spark_graft_dirty_num_{}_{}_{}".format(
        os.path.basename(real), tag, os.getpid()
    )

_EVENTS_SQL = """
SELECT event_id,
       CASE WHEN event_id % 12 = 8 THEN date_trunc('month', ts) ELSE ts END AS ts,
       user_id,
       event_type,
       CASE event_id % 12
         WHEN 0 THEN 'NaN'::DOUBLE
         WHEN 1 THEN 'Infinity'::DOUBLE
         WHEN 2 THEN '-Infinity'::DOUBLE
         WHEN 3 THEN -value
         WHEN 4 THEN 0.0
         WHEN 5 THEN value * 1e3
         WHEN 6 THEN value * 1e-9
         WHEN 7 THEN NULL
         WHEN 9 THEN 42.0
         ELSE value
       END AS value,
       CASE WHEN event_id % 12 = 10 THEN '{{broken json' ELSE props END AS props
FROM '{base}/events.parquet'
"""

_LINEITEM_SQL = """
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
       CASE (l_orderkey * 7 + l_linenumber) % 12
         WHEN 0 THEN 0.0
         WHEN 1 THEN -l_quantity
         WHEN 8 THEN 1e4
         ELSE l_quantity
       END AS l_quantity,
       CASE (l_orderkey * 7 + l_linenumber) % 12
         WHEN 2 THEN -l_extendedprice
         WHEN 3 THEN l_extendedprice * 1e3
         ELSE l_extendedprice
       END AS l_extendedprice,
       CASE (l_orderkey * 7 + l_linenumber) % 12
         WHEN 4 THEN 1.0
         WHEN 5 THEN NULL
         ELSE l_discount
       END AS l_discount,
       CASE (l_orderkey * 7 + l_linenumber) % 12
         WHEN 6 THEN NULL
         WHEN 9 THEN -0.0
         ELSE l_tax
       END AS l_tax,
       CASE (l_orderkey * 7 + l_linenumber) % 12
         WHEN 10 THEN ''
         ELSE l_returnflag
       END AS l_returnflag,
       l_linestatus,
       CASE (l_orderkey * 7 + l_linenumber) % 12
         WHEN 7 THEN NULL
         ELSE l_shipdate
       END AS l_shipdate
FROM '{base}/lineitem.parquet'
"""


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
    for f in os.listdir(base):
        if f.endswith(".parquet") and f not in (
            "events.parquet", "lineitem.parquet"
        ):
            shutil.copy(os.path.join(base, f), scratch)
    con = duckdb.connect()
    _rewrite(con, base, scratch, "events", _EVENTS_SQL)
    _rewrite(con, base, scratch, "lineitem", _LINEITEM_SQL)
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

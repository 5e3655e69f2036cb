"""Embedding-robustness parity gate: run the FULL oracle suite on a
deterministically corrupted copy of embeddings.parquet — the third axis
of the corrupted-input program (text r12, numerics r13, embeddings r14).

Why this exists (r13 VERDICT task 4): the driver's embeddings table is
pristine (500 non-null 64-dim vectors, every component finite). Whole
divergence classes are invisible on it:

1. **NULL vectors / NULL ELEMENTS inside arrays**: the r11 lesson-a
   class — Arrow delivers a NULL element as float64-with-NaN and
   ``astype(int64)`` silently wraps to INT64_MIN inside mapInPandas
   workers; SQL engines instead NULL-poison or skip. Trainer entry
   points throw FAILED_EXECUTE_UDF on NULL feature rows (r11 lesson e).
2. **Non-finite components** (NaN/±Inf): DuckDB aborts on casts and
   aggregates where Spark returns NULL/NaN — the events.value asymmetry
   on a vector column.
3. **Zero-norm vectors**: every cosine denominator; unguarded division
   throws under Spark ANSI and returns NULL/NaN elsewhere.
4. **Ragged lengths**: Spark ``zip_with`` silently NULL-pads the short
   side; DuckDB list ops error or mis-align — dot products go wrong
   SILENTLY, not loudly.
5. **Magnitude**: ×1e3 components push quantized dot-product and
   moment budgets toward the int64 edge (the q145/q295 overflow class,
   applied to linear algebra).

Contract under test: ``readers._quarantine_embeddings`` (scan-level
hygiene, r14) nulls every MALFORMED vector (classes 1/2/4 above:
null/ragged/non-finite-or-null components) identically to the DuckDB
view twin in parity_check._register_views, so downstream consumers only
ever see either NULL or a well-formed finite 64-dim vector. Zero-norm
and large-but-finite vectors are WELL-FORMED — they flow through and
probe the per-query division guards and magnitude budgets.

Corruption map (deterministic — same recipe every run): vec_id < 12 is
the mostly-clean island (NULL at 2, zero-norm at 5, rest untouched);
vec_id >= 12 takes its class from ``vec_id % 12``:

  0  embedding -> NULL              6  embedding -> first 32 comps
  1  embedding[8] -> NULL           7  embedding -> 65 comps (append .5)
  2  embedding[8] -> NaN            8  embedding -> embedding * 1e3
  3  embedding[8] -> +Infinity      9  label -> NULL (embedding clean)
  4  embedding[8] -> -Infinity      10 embedding -> [] (empty list)
  5  embedding -> all zeros         11 untouched control

Post-quarantine survivor mix: the clean island plus classes 5/8/9/11
keep a usable vector (~1/3 of rows), the rest read as NULL — so every consumer's NULL
handling, every cosine guard, and every trainer's drop-nulls step is
exercised while enough clean geometry remains for the ANN/cluster
oracles to produce non-vacuous answers.

Magnitude calibration (class 8): unit-norm 64-dim components are
~0.125; ×1e3 puts components at ~125 and dot products at ~1e6·d — the
1e-12 micro-unit dot-product quantizations (q303-family) then carry
~1e17-per-term integer magnitudes, AT the documented budget boundary,
exactly like the numeric gate's ×1e3 money class. ×1e6 was considered
and rejected: it exceeds every engine's documented float-sum parity
contract (17th significant digit), failing for ANY engine pair.

Usage:
    python tools/dirty_embedding_gate.py [base_sf_dir] [query ...]

Builds the corrupted table under a per-invocation /tmp scratch (other
tables copied verbatim), execs parity_check on the dir, removes the
scratch. Exit code = parity_check's. Corrupted parquet is written back
through pyarrow CAST TO THE ORIGINAL ARROW SCHEMA so physical types
match the driver's files bit-for-bit.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
import sys

import duckdb
import pyarrow.parquet as pq


# Per-invocation scratch: path-hash + PID (see dirty_numeric_gate; the
# r13 fixed-path incident and the r13-ADVICE basename collision).
def _scratch(base: str) -> str:
    real = os.path.realpath(os.path.normpath(base))
    tag = hashlib.md5(real.encode()).hexdigest()[:8]
    return "/tmp/spark_graft_dirty_emb_{}_{}_{}".format(
        os.path.basename(real), tag, os.getpid()
    )


# list_transform's two-param lambda gives the 1-BASED element index
# (CLAUDE.md r4 oracle notes) — component 8 is deterministic dirt
# placement, away from both ends.
#
# vec_id < 12 is a mostly-clean island with exactly two deliberate
# probes (NULL at vec_id 2, zero-norm at vec_id 5): the ANN family uses
# vec_id < 4/8 as query/seed sets, and the plain modulo map corrupted
# ALL of them — every ranked query went vacuously empty-vs-empty and
# the scoring/top-k path was never exercised against dirt. This way 6
# of 8 queries stay usable while query-side NULL and zero-norm
# exclusion are still probed.
_EMB_SQL = """
SELECT vec_id,
       CASE WHEN vec_id = 2 THEN NULL
            WHEN vec_id = 5 THEN list_transform(embedding, x -> 0.0::FLOAT)
            WHEN vec_id < 12 THEN embedding
       ELSE CASE vec_id % 12
         WHEN 0 THEN NULL
         WHEN 1 THEN list_transform(embedding,
                       (x, i) -> CASE WHEN i = 8 THEN NULL ELSE x END)
         WHEN 2 THEN list_transform(embedding,
                       (x, i) -> CASE WHEN i = 8 THEN 'NaN'::FLOAT ELSE x END)
         WHEN 3 THEN list_transform(embedding,
                       (x, i) -> CASE WHEN i = 8 THEN 'Infinity'::FLOAT
                                      ELSE x END)
         WHEN 4 THEN list_transform(embedding,
                       (x, i) -> CASE WHEN i = 8 THEN '-Infinity'::FLOAT
                                      ELSE x END)
         WHEN 5 THEN list_transform(embedding, x -> 0.0::FLOAT)
         WHEN 6 THEN embedding[1:32]
         WHEN 7 THEN list_append(embedding, 0.5::FLOAT)
         WHEN 8 THEN list_transform(embedding, x -> x * 1000.0)
         WHEN 10 THEN []::FLOAT[]
         ELSE embedding
       END END AS embedding,
       CASE WHEN vec_id >= 12 AND vec_id % 12 = 9 THEN NULL
            ELSE label END AS label
FROM '{base}/embeddings.parquet'
"""


def build(base: str) -> str:
    scratch = _scratch(base)
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)
    for f in os.listdir(base):
        if f.endswith(".parquet") and f != "embeddings.parquet":
            shutil.copy(os.path.join(base, f), scratch)
    con = duckdb.connect()
    orig_schema = pq.read_schema(os.path.join(base, "embeddings.parquet"))
    orig_schema = orig_schema.remove_metadata()
    tbl = con.sql(_EMB_SQL.format(base=base)).arrow().cast(orig_schema)
    pq.write_table(tbl, os.path.join(scratch, "embeddings.parquet"))
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

"""Text-robustness parity gate: run the FULL oracle suite on a
deterministically corrupted copy of the documents table — whitespace
pathologies AND Unicode pathologies.

Why this exists (r12): the standard gate only ever sees the driver
testdata, whose text is single-space ASCII — two whole classes of
cross-engine divergence are invisible on it:

1. **Whitespace tokenization**: a Spark side splitting on ``\\s+``
   paired with a DuckDB oracle splitting on a literal space agrees on
   the testdata and diverges on tabs/newlines/multi-space runs (the r11
   ADVICE q332 finding, generalized). This probe found 43 such pairs;
   all converted to ``string_split_regex(trim(text), '\\s+')``.
2. **Regex word boundaries on Unicode**: Java's ``\\b`` is
   Unicode-aware, RE2's is ASCII — ``\\b(the|...)\\b`` stopword counts
   diverged on text like ``jöin`` (combining mark) in 6 queries (plus 3
   threshold-lucky siblings sharing the constant). All 9 sites now use
   the strip-to-word-runs + IN-list formulation (``tx.stopword_count``
   / ``_STOP_CNT_SQL``), identical in both engines.

Seven query pairs intentionally tokenize on a SINGLE literal space on
BOTH sides (q98, q152, q279, q291, q292, q296, q316 — their Spark side
is ``F.split(..., " ")``): they pass this gate because the pairing is
consistent, which is the actual contract (cross-engine agreement, not a
particular tokenizer).

Usage:
    python tools/dirty_text_gate.py [base_sf_dir]   # default sf0.001

Builds the corrupted corpus under /tmp/spark_graft_dirty_<base> (per-doc
pathology by doc_id % 14: double spaces, tabs, newlines, leading/
trailing runs, CRLF runs, accents, CJK, emoji, NBSP separators,
combining marks, an untouched control class, and — added r13 —
vertical-tab and form-feed separators: Java's ``\\s`` includes VT
(\\x0b) but RE2's does NOT, so every ``\\s+``-paired oracle silently
diverged on VT until r13 replaced the oracle-side pattern with the
explicit class ``[ \\t\\n\\x0b\\f\\r]`` (== Java's \\s, char for
char). Exit code = parity_check's.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import subprocess
import sys

import duckdb

# Per-invocation scratch: see dirty_numeric_gate._scratch (a fixed
# path let concurrent gate invocations clobber each other's corpus,
# r13; basename-only still collided for same-leaf bases or concurrent
# runs on the SAME base, r13 ADVICE — hence the path hash + PID).
def _scratch(base: str) -> str:
    real = os.path.realpath(os.path.normpath(base))
    tag = hashlib.md5(real.encode()).hexdigest()[:8]
    return "/tmp/spark_graft_dirty_{}_{}_{}".format(
        os.path.basename(real), tag, os.getpid()
    )


def build(base: str) -> str:
    scratch = _scratch(base)
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)
    for f in os.listdir(base):
        if f.endswith(".parquet") and f != "documents.parquet":
            shutil.copy(os.path.join(base, f), scratch)
    con = duckdb.connect()
    con.sql(f"""
    COPY (
      SELECT doc_id,
             CASE doc_id % 14
               WHEN 0 THEN replace(text, ' ', '  ')
               WHEN 1 THEN replace(text, ' ', chr(9))
               WHEN 2 THEN replace(text, ' ', chr(10))
               WHEN 3 THEN '  ' || text || ' '
               WHEN 4 THEN chr(9) || text || chr(10)
               WHEN 5 THEN replace(text, ' ', ' ' || chr(13) || chr(10))
               WHEN 6 THEN replace(text, 'a', 'á')
               WHEN 7 THEN text || ' 数据 处理 引擎'
               WHEN 8 THEN '🚀 ' || replace(text, 'e', '🎉')
               WHEN 9 THEN replace(text, ' ', chr(160))
               WHEN 10 THEN replace(text, 'o', 'o' || chr(776))
               WHEN 12 THEN replace(text, ' ', chr(11))
               WHEN 13 THEN chr(12) || replace(text, ' ', chr(12)) || chr(11)
               ELSE text
             END AS text,
             lang, source, n_chars
      FROM '{base}/documents.parquet'
    ) TO '{scratch}/documents.parquet' (FORMAT parquet)
    """)
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

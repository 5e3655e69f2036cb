"""Output-TYPE audit as a regression gate: the driver's value hasher has
twice split on type canonicalization while values matched (round-1 q50
DECIMAL, round-2 q38 window-sum HUGEINT). `tools/parity_check.py --audit`
catches that class schema-only; this test pins the audit green for every
oracle query so a new query with a risky output type fails CI, not the
driver gate."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import parity_check


def test_all_oracle_output_types_hasher_safe(spark, sf_dir, capsys):
    rc = parity_check.audit(sf_dir, only=None)
    out = capsys.readouterr().out
    assert rc == 0, f"type audit flagged oracle queries:\n{out}"

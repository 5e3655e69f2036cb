"""Cross-engine EMBEDDING/vector-semantics pins (r14): the asymmetry
classes the dirty-embedding gate (`tools/dirty_embedding_gate.py`)
surfaced at birth — 13 divergences across the ANN/cluster/similarity
family. Each test documents a measured engine behavior so a change in
either engine fails CI. The policies these forced:

- Malformed vectors (NULL / ragged / non-finite-or-NULL components)
  quarantine to NULL at the scan (``readers._quarantine_embeddings`` +
  parity_check's embeddings view DDL) — per-element dirt is cross-engine
  poison in at least three distinct ways (pins below).
- Cosine SCORERS EXCLUDE zero-norm/NULL vectors (``norm > 0`` both
  sides) rather than emitting NULL scores: Spark ANSI THROWS on the
  division where DuckDB yields NULL, and NULL ordering defaults differ
  on ASC (Spark NULLS FIRST, DuckDB NULLS LAST) — distance rankings
  would flip. Plain-column outputs use ``similarity.cosine_safe``
  (NULL) instead.
- Every distance ARGMIN coalesces NULL distances to +inf
  (``similarity._inf_null``): Spark's struct ``array_min`` lets a NULL
  first field WIN while DuckDB's ``ORDER BY d, cid`` puts NULLs LAST.
- Covariance/gram denominators count vectors that EXIST (NULL vectors
  dropped pre-stack), and the oracles' ``count(*)`` carries the same
  ``WHERE emb IS NOT NULL`` (q303/q324).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_division_by_zero_spark_throws_duckdb_nulls(con, spark):
    """The root of the 7-query DIVIDE_BY_ZERO family: DuckDB x/0 -> NULL
    (all numeric types), Spark ANSI -> ArithmeticException even for
    DOUBLE. Any shared expression with a reachable zero denominator
    (cosine norms, variance ratios) must guard or exclude on the Spark
    side to reproduce DuckDB's NULL."""
    assert con.execute("select 1.0::DOUBLE / 0.0::DOUBLE").fetchone()[0] is None
    from pyspark.errors import ArithmeticException

    with pytest.raises(ArithmeticException):
        spark.sql("SELECT cast(1.0 as double) / cast(0.0 as double)").first()


def test_null_ordering_defaults_differ_on_asc_only(con, spark):
    """Default NULL placement: DuckDB puts NULLs LAST in BOTH
    directions; Spark puts them FIRST on ASC and LAST on DESC. So
    DESC score rankings would agree on NULLs, but ASC DISTANCE
    rankings (PQ/IVF argmin rank, `ORDER BY d, cid ... rn=1`) flip —
    one more reason the engine excludes bad vectors / coalesces
    distances to +inf instead of letting NULL reach any ORDER BY."""
    for direction, duck_expect in (("desc", [2.0, 1.0, None]),
                                   ("asc", [1.0, 2.0, None])):
        d = [None if r[0] is None else float(r[0]) for r in con.execute(
            f"select x from (values (1.0),(NULL),(2.0)) t(x)"
            f" order by x {direction}"
        ).fetchall()]
        assert d == duck_expect, (direction, d)
    s_desc = [r.x for r in spark.sql(
        "SELECT x FROM VALUES (1.0D),(CAST(NULL AS DOUBLE)),(2.0D) t(x) "
        "ORDER BY x DESC"
    ).collect()]
    assert s_desc == [2.0, 1.0, None]  # agrees with DuckDB
    s_asc = [r.x for r in spark.sql(
        "SELECT x FROM VALUES (1.0D),(CAST(NULL AS DOUBLE)),(2.0D) t(x) "
        "ORDER BY x ASC"
    ).collect()]
    assert s_asc == [None, 1.0, 2.0]  # Spark ASC: NULLS FIRST — differs


def test_struct_argmin_null_placement_differs(con, spark):
    """The argmin flip that broke q51/q127/q151/q185: Spark's
    ``array_min`` over (d, cid) structs lets a NULL d WIN (NULL-first
    struct comparison), while DuckDB's ``ORDER BY d, cid ... rn=1``
    ranks NULL d LAST. ``similarity._inf_null`` (NULL -> +inf) makes
    both engines agree that a NULL candidate loses."""
    row = spark.sql(
        "SELECT array_min(array(struct(CAST(NULL AS DOUBLE) AS d, 2 AS cid),"
        " struct(5.0 AS d, 0 AS cid))) AS m"
    ).first()
    assert row.m.cid == 2  # Spark: the NULL-distance candidate WINS
    win = con.execute(
        "select cid from (values (NULL::DOUBLE, 2), (5.0, 0)) t(d, cid) "
        "order by d, cid limit 1"
    ).fetchone()[0]
    assert win == 0  # DuckDB: the NULL-distance candidate LOSES


def test_zip_with_null_pads_ragged_duckdb_list_ops_misalign(con, spark):
    """Ragged vectors are SILENT poison: Spark ``zip_with`` NULL-pads
    the short side so the product terms vanish into the NULL-skipping
    sum (a wrong-but-quiet dot product), while the oracle's
    range(1,len(a)+1) indexing reads only a's span. Neither errors —
    the answers just differ. This is why wrong-length vectors
    quarantine at the scan rather than being 'handled' downstream."""
    row = spark.sql(
        "SELECT aggregate(zip_with(array(1.0D, 2.0D, 3.0D), array(10.0D),"
        " (x, y) -> x * y), 0.0D, (acc, t) -> acc + t) AS dot"
    ).first()
    assert row.dot is None  # 2.0*NULL poisons the fold's addition
    d = con.execute(
        "select list_sum(list_transform(range(1, 4),"
        " i -> ([1.0, 2.0, 3.0])[i] * ([10.0])[i]))"
    ).fetchone()[0]
    assert d == 10.0  # DuckDB: out-of-range index -> NULL, list_sum SKIPS


def test_quarantine_twins_agree_on_all_dirt_classes(con, spark):
    """The scan contract itself: readers._quarantine_embeddings and the
    parity_check embeddings view DDL null exactly the same vectors —
    probed on every gate dirt class (NULL, NULL element, NaN, ±Inf,
    all-zero, short, long, empty, scaled, clean)."""
    import pandas as pd

    import soict20221_bigdata_financialplatform_spark.sources.readers as R

    nan, inf = float("nan"), float("inf")
    vecs = [None, [1.0, None, 2.0], [nan, 1.0, 2.0], [inf, 1.0, 2.0],
            [-inf, 1.0, 2.0], [0.0, 0.0, 0.0], [1.0], [1.0, 2.0, 3.0, 4.0],
            [], [1e3, 2e3, 3e3], [0.1, 0.2, 0.3]]
    pdf = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": vecs})
    sdf = spark.createDataFrame(pdf, "vec_id long, embedding array<float>")
    old = R.EMBEDDING_DIM
    R.EMBEDDING_DIM = 3
    try:
        got = {r.vec_id: r.embedding is not None
               for r in R._quarantine_embeddings(sdf).collect()}
    finally:
        R.EMBEDDING_DIM = old
    def _lit(v):
        if v is None:
            return "NULL"
        body = ", ".join(
            "NULL" if x is None
            else "'NaN'::FLOAT" if x != x
            else "'Infinity'::FLOAT" if x == inf
            else "'-Infinity'::FLOAT" if x == -inf
            else repr(x)
            for x in v
        )
        return f"[{body}]"

    duck = dict(con.execute(
        "select vec_id, CASE WHEN embedding IS NOT NULL"
        " AND len(embedding) = 3"
        " AND NOT coalesce(list_contains(list_transform(embedding,"
        " x -> (x IS NULL OR NOT isfinite(x))), true), false)"
        " THEN true ELSE false END"
        " from (values " + ",".join(
            f"({i}, {_lit(v)}::FLOAT[])" for i, v in enumerate(vecs)
        ) + ") t(vec_id, embedding)"
    ).fetchall())
    assert got == {k: bool(v) for k, v in duck.items()}
    # survivors: the all-zero (5), scaled (9) and clean (10) vectors
    assert [k for k, v in sorted(got.items()) if v] == [5, 9, 10]

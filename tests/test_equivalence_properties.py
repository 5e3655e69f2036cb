"""Hypothesis equivalence tests for asof_join and connected_components
against brute-force python oracles — a different failure-finding axis
than the DuckDB parity gate (which only ever sees the NULL-free driver
testdata) and than the fixture pins (which only see hand-picked rows).

Both operators had NULL-semantics bugs invisible to parity (r11: the
asof carry treated NULL right-timestamps as -infinity; components
half-connected garbage chains through reversed NULL edges), so their
contracts are re-derived here per example: NULL timestamps never match,
NULL-side pairs are not edges.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from soict20221_bigdata_financialplatform_spark.operators import dedup
from soict20221_bigdata_financialplatform_spark.operators.asof import (
    asof_join,
    range_join,
)
from soict20221_bigdata_financialplatform_spark.operators.components import (
    connected_components,
)

_SETTINGS = dict(max_examples=12, deadline=None)

_KEYS = ["A", "B", "C"]

# unique timestamps per side are drawn as permutations below — the carry
# is nondeterministic between two right rows with EQUAL ts (either may
# be "last" in window order), so equal right timestamps are excluded
# from the generated space by construction, not by filtering.


@st.composite
def _asof_case(draw):
    left = []
    right = []
    for k in _KEYS:
        lts = draw(
            st.lists(
                st.one_of(st.integers(0, 50), st.none()),
                min_size=0,
                max_size=6,
            )
        )
        rts = draw(
            st.lists(
                st.one_of(st.integers(0, 50), st.none()),
                min_size=0,
                max_size=6,
                unique_by=lambda x: x if x is not None else object(),
            )
        )
        left += [(k, t, float(i)) for i, t in enumerate(lts)]
        right += [(k, t, 100.0 + i) for i, t in enumerate(rts)]
    return left, right


@given(_asof_case())
@settings(**_SETTINGS)
def test_asof_join_matches_bruteforce(spark, case):
    """For every left row: the carried right value equals the right row
    with the LARGEST right_ts <= left_ts in the same key group; NULL
    timestamps on either side never participate."""
    left, right = case
    l = spark.createDataFrame(
        [Row(k=k, ts=t, v=v) for k, t, v in left],
        "k string, ts long, v double",
    )
    r = spark.createDataFrame(
        [Row(k=k, rts=t, rv=v) for k, t, v in right],
        "k string, rts long, rv double",
    )
    got = {
        (row.k, row.ts, row.v): row.rv
        for row in asof_join(l, r, on=["k"], left_ts="ts", right_ts="rts").collect()
    }
    assert len(got) == len(left)
    for k, t, v in left:
        cands = [
            (rt, rv)
            for rk, rt, rv in right
            if rk == k and rt is not None and t is not None and rt <= t
        ]
        want = max(cands)[1] if cands else None
        assert got[(k, t, v)] == want, (k, t, v, cands)


@st.composite
def _asof_tied_case(draw):
    """Like _asof_case but right timestamps may REPEAT within a key —
    the regime the ``right_tiebreak`` parameter exists for (r13 ADVICE:
    without a tiebreak the carry among tied right rows is
    nondeterministic). Each right row gets a unique eid tiebreak."""
    left = []
    right = []
    eid = 0
    for k in _KEYS:
        lts = draw(
            st.lists(st.one_of(st.integers(0, 20), st.none()),
                     min_size=0, max_size=5)
        )
        rts = draw(
            st.lists(st.one_of(st.integers(0, 20), st.none()),
                     min_size=0, max_size=6)
        )
        left += [(k, t, float(i)) for i, t in enumerate(lts)]
        for t in rts:
            right.append((k, t, 100.0 + eid, eid))
            eid += 1
    return left, right


@given(_asof_tied_case())
@settings(**_SETTINGS)
def test_asof_join_right_tiebreak_matches_bruteforce(spark, case):
    """With duplicate right timestamps and ``right_tiebreak``: the carry
    is the right row with the largest (rts, eid) at-or-before the left
    timestamp — deterministic, matching the (ts, event_id) struct-key
    convention of the day-bar closes."""
    left, right = case
    l = spark.createDataFrame(
        [Row(k=k, ts=t, v=v) for k, t, v in left],
        "k string, ts long, v double",
    )
    r = spark.createDataFrame(
        [Row(k=k, rts=t, rv=v, eid=e) for k, t, v, e in right],
        "k string, rts long, rv double, eid long",
    )
    got = {
        (row.k, row.ts, row.v): row.rv
        for row in asof_join(
            l, r, on=["k"], left_ts="ts", right_ts="rts",
            right_cols=["rv"], right_tiebreak="eid",
        ).collect()
    }
    assert len(got) == len(left)
    for k, t, v in left:
        cands = [
            (rt, e, rv)
            for rk, rt, rv, e in right
            if rk == k and rt is not None and t is not None and rt <= t
        ]
        want = max(cands)[2] if cands else None
        assert got[(k, t, v)] == want, (k, t, v, cands)


@given(_asof_case(), st.integers(0, 20))
@settings(**_SETTINGS)
def test_asof_join_tolerance_nulls_stale_matches(spark, case, tol):
    """With tolerance_seconds: a match older than the tolerance comes
    back NULL, everything inside it is identical to the untoleranced
    oracle."""
    left, right = case
    l = spark.createDataFrame(
        [Row(k=k, ts=t, v=v) for k, t, v in left],
        "k string, ts long, v double",
    )
    r = spark.createDataFrame(
        [Row(k=k, rts=t, rv=v) for k, t, v in right],
        "k string, rts long, rv double",
    )
    got = {
        (row.k, row.ts, row.v): row.rv
        for row in asof_join(
            l, r, on=["k"], left_ts="ts", right_ts="rts", tolerance_seconds=tol
        ).collect()
    }
    for k, t, v in left:
        cands = [
            (rt, rv)
            for rk, rt, rv in right
            if rk == k and rt is not None and t is not None and rt <= t
        ]
        want = None
        if cands:
            rt, rv = max(cands)
            want = rv if (t - rt) <= tol else None
        assert got[(k, t, v)] == want, (k, t, v, tol, cands)


@st.composite
def _range_case(draw):
    left = []
    right = []
    for k in _KEYS:
        lts = draw(
            st.lists(
                st.one_of(st.integers(0, 120), st.none()),
                min_size=0,
                max_size=5,
            )
        )
        ivs = draw(
            st.lists(
                st.tuples(
                    st.one_of(st.integers(0, 120), st.none()),
                    st.one_of(st.integers(0, 120), st.none()),
                ),
                min_size=0,
                max_size=4,
            )
        )
        left += [(k, t, float(i)) for i, t in enumerate(lts)]
        right += [(k, s, e, f"{k}{i}") for i, (s, e) in enumerate(ivs)]
    return left, right


@given(_range_case(), st.sampled_from([1, 7, 60]))
@settings(**_SETTINGS)
def test_range_join_matches_bruteforce(spark, case, bucket_seconds):
    """The bucketized interval join returns exactly the brute-force
    ``start <= ts < end`` match set for every bucket size — including
    NULL timestamps/bounds (never match) and reversed intervals (empty).
    how='left' additionally emits every unmatched left row once with
    NULL right columns."""
    left, right = case
    l = spark.createDataFrame(
        [Row(k=k, ts=t, v=v) for k, t, v in left],
        "k string, ts long, v double",
    )
    r = spark.createDataFrame(
        [Row(k=k, s=s, e=e, tag=g) for k, s, e, g in right],
        "k string, s long, e long, tag string",
    )
    want_inner = sorted(
        (k, t, v, g)
        for k, t, v in left
        for rk, s, e, g in right
        if rk == k
        and None not in (t, s, e)
        and s <= t < e
    )
    got_inner = sorted(
        (row.k, row.ts, row.v, row.tag)
        for row in range_join(
            l, r, on=["k"], left_ts="ts", right_start="s", right_end="e",
            bucket_seconds=bucket_seconds,
        ).collect()
    )
    assert got_inner == want_inner
    matched = {(k, t, v) for k, t, v, _ in want_inner}
    want_left = sorted(
        want_inner
        + [
            (k, t, v, None)
            for k, t, v in left
            if (k, t, v) not in matched
        ]
    , key=str)
    got_left = sorted(
        (
            (row.k, row.ts, row.v, row.tag)
            for row in range_join(
                l, r, on=["k"], left_ts="ts", right_start="s",
                right_end="e", bucket_seconds=bucket_seconds, how="left",
            ).collect()
        ),
        key=str,
    )
    assert got_left == want_left


class _UnionFind:
    def __init__(self):
        self.p: dict[int, int] = {}

    def find(self, x: int) -> int:
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


_pairs = st.lists(
    st.tuples(
        st.one_of(st.integers(0, 15), st.none()),
        st.one_of(st.integers(0, 15), st.none()),
    ),
    min_size=1,
    max_size=25,
)


@given(_pairs)
@settings(**_SETTINGS)
def test_connected_components_matches_union_find(spark, pairs):
    """(node, component) equals a brute-force union-find with
    component = min member id, over exactly the nodes that appear in a
    NULL-free pair; NULL-side pairs contribute nothing (no phantom
    nodes, no half-connected chains)."""
    df = spark.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in pairs], "id_a long, id_b long"
    )
    got = {
        r.node: r.component for r in connected_components(df).collect()
    }
    uf = _UnionFind()
    nodes = set()
    for a, b in pairs:
        if a is not None and b is not None:
            uf.union(a, b)
            nodes.update((a, b))
    roots: dict[int, list[int]] = {}
    for n in nodes:
        roots.setdefault(uf.find(n), []).append(n)
    want = {
        n: min(members) for members in roots.values() for n in members
    }
    assert got == want


_words = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "market", "volume", "price", "tick"]
)
_texts = st.lists(
    st.one_of(
        st.lists(_words, min_size=0, max_size=12).map(" ".join), st.none()
    ),
    min_size=1,
    max_size=8,
)


@given(_texts)
@settings(**_SETTINGS)
def test_exact_dedup_matches_group_oracle(spark, texts):
    """exact_dedup ≡ group-by-content with min-id survivor, over random
    docs including NULLs and repeats. NULL texts share one group (the
    md5 digest is NULL and groupBy treats NULLs as equal), which is
    exactly what the python oracle models."""
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    got = {
        r.keep_id: r.n_copies for r in dedup.exact_dedup(df).collect()
    }
    groups: dict[object, list[int]] = {}
    for i, t in enumerate(texts):
        groups.setdefault(t, []).append(i)
    want = {min(ids): len(ids) for ids in groups.values()}
    assert got == want


@given(st.lists(_words, min_size=5, max_size=20).map(" ".join), _texts)
@settings(max_examples=8, deadline=None)
def test_identical_docs_always_pair_in_minhash_and_simhash(
    spark, dup_text, other_texts
):
    """The zero-false-negative guarantee for EXACT duplicates: two docs
    with identical text have identical MinHash signatures (equal in
    every band) and identical SimHash chunks, so banded mining must
    always emit the pair — no matter what else is in the corpus."""
    rows = [Row(doc_id=1, text=dup_text), Row(doc_id=2, text=dup_text)]
    rows += [
        Row(doc_id=10 + i, text=t) for i, t in enumerate(other_texts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for pairs in (
        dedup.minhash_near_dup_pairs(df),
        dedup.simhash_near_dup_pairs(df),
    ):
        got = {
            tuple(sorted((r[0], r[1])))
            for r in pairs.select(pairs.columns[:2]).collect()
        }
        assert (1, 2) in got


_items = st.lists(
    st.sampled_from([f"it{i}" for i in range(12)]), min_size=1, max_size=60
)


@given(_items)
@settings(max_examples=10, deadline=None)
def test_cms_never_underestimates(spark, items):
    """The Count-Min invariant: for EVERY queried item the estimate is
    >= the true count (hash collisions only ever inflate), and equals it
    exactly when no collision lands in all depth rows."""
    from soict20221_bigdata_financialplatform_spark.operators import (
        sketch as sk,
    )

    df = spark.createDataFrame(
        [Row(k=x) for x in items], "k string"
    )
    m = sk.cms_matrix(df, "k", depth=4, width=16)
    est = {
        r.k: r.cms_est
        for r in sk.cms_query(
            m, df.distinct(), "k", depth=4, width=16
        ).collect()
    }
    true = {}
    for x in items:
        true[x] = true.get(x, 0) + 1
    for x, c in true.items():
        assert est[x] >= c, (x, est[x], c)


@given(_items, st.integers(2, 6))
@settings(max_examples=10, deadline=None)
def test_mg_never_misses_a_heavy_hitter(spark, items, k):
    """The Misra-Gries guarantee: any item with true count > n/(k+1)
    appears in the capacity-k summary, and every reported mg_count is an
    under-estimate by at most n/(k+1)."""
    from soict20221_bigdata_financialplatform_spark.operators import (
        sketch as sk,
    )

    df = spark.createDataFrame([Row(k=x) for x in items], "k string")
    got = {
        r[0]: r.mg_count for r in sk.heavy_hitters_mg(df, "k", k=k).collect()
    }
    n = len(items)
    true = {}
    for x in items:
        true[x] = true.get(x, 0) + 1
    bound = n / (k + 1)
    for x, c in true.items():
        if c > bound:
            assert x in got, (x, c, bound, got)
        if x in got:
            assert c - bound <= got[x] <= c, (x, got[x], c, bound)


# ---------------------------------------------------------------------------
# r12 additions: the skew-decomposition joins, paragraph dedup, and the
# winnowing fingerprint — each against a brute-force python oracle (the
# r11 VERDICT task-5 list). The skew operators' contract is EXACT result
# equality with the plain formulation (salting is a physical rewrite);
# paragraph_dedup and winnowing get independent recomputations.
# ---------------------------------------------------------------------------

from soict20221_bigdata_financialplatform_spark.functions import (  # noqa: E402
    text as tx,
)
from soict20221_bigdata_financialplatform_spark.operators import (  # noqa: E402
    corpus as cp,
)
from soict20221_bigdata_financialplatform_spark.operators.skew import (  # noqa: E402
    salted_join,
    salted_self_pairs,
)

_skew_keys = st.sampled_from(["hot", "hot", "hot", "k1", "k2", None])
_big_rows = st.lists(
    st.tuples(_skew_keys, st.integers(0, 99)), min_size=0, max_size=30
)
_small_rows = st.lists(
    st.tuples(st.sampled_from(["hot", "k1", "k3", None]), st.integers(0, 9)),
    min_size=0,
    max_size=6,
    unique_by=lambda t: t[0],
)


@given(_big_rows, _small_rows, st.sampled_from(["inner", "left"]),
       st.sampled_from([2, 5]))
@settings(**_SETTINGS)
def test_salted_join_matches_plain_join(spark, big_rows, small_rows, how,
                                        salt):
    """salted_join is a PHYSICAL rewrite: for inner and left joins its
    result multiset equals the plain equi-join's exactly — hot keys,
    missing keys, NULL keys (which never match; preserved under left),
    empty sides, any salt width."""
    big = spark.createDataFrame(
        [Row(k=k, v=v) for k, v in big_rows], "k string, v long"
    )
    small = spark.createDataFrame(
        [Row(k=k, w=w) for k, w in small_rows], "k string, w long"
    )
    got = sorted(
        ((r.k, r.v, r.w) for r in
         salted_join(big, small, on="k", salt=salt, how=how)
         .select("k", "v", "w").collect()),
        key=str,
    )
    want = sorted(
        ((r.k, r.v, r.w) for r in
         big.join(small, on="k", how=how).select("k", "v", "w").collect()),
        key=str,
    )
    assert got == want


_pair_rows = st.lists(
    st.sampled_from(["hot", "hot", "hot", "g1", "g2"]),
    min_size=0,
    max_size=20,
)


@given(_pair_rows, st.sampled_from([1, 3, 8]))
@settings(**_SETTINGS)
def test_salted_self_pairs_matches_unsalted_pairs(spark, keys, salt):
    """salted_self_pairs returns PRECISELY the naive keyed self-join's
    pair set {(id_a, id_b): same key, id_a < id_b} — the sub-group
    block decomposition loses no pair and invents none, for any salt
    (salt=1 degenerates to the naive join)."""
    rows = [(k, i) for i, k in enumerate(keys)]
    df = spark.createDataFrame(
        [Row(k=k, id=i) for k, i in rows], "k string, id long"
    )
    got = sorted(
        (r.k, r.id_a, r.id_b)
        for r in salted_self_pairs(df, ["k"], id_col="id", salt=salt)
        .collect()
    )
    want = sorted(
        (ka, a, b)
        for ka, a in rows
        for kb, b in rows
        if ka == kb and a < b
    )
    assert got == want


_para_words = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
_para_texts = st.lists(
    st.one_of(
        st.lists(_para_words, min_size=0, max_size=18).map(" ".join),
        st.none(),
    ),
    min_size=1,
    max_size=6,
)


@given(_para_texts, st.sampled_from([2, 3, 5]))
@settings(**_SETTINGS)
def test_paragraph_dedup_matches_first_occurrence_oracle(
    spark, texts, seg_words
):
    """paragraph_dedup ≡ a python reimplementation: segment each doc
    into seg_words-word chunks, keep each distinct segment's FIRST
    occurrence corpus-wide (ordered by (doc_id, seg_idx)), rebuild docs
    from survivors. NULL-text docs vanish (their explode emits no
    segment rows); empty text is ONE empty segment."""
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_segs, r.n_kept, r.kept_text)
        for r in cp.paragraph_dedup(df, seg_words=seg_words).collect()
    }
    segs: list[tuple[int, int, str]] = []
    for i, t in enumerate(texts):
        if t is None:
            continue
        words = t.strip().split()
        if not words:
            words = [""]  # F.split(trim(''), '\\s+') -> ['']
        n_groups = -(-len(words) // seg_words)
        for j in range(n_groups):
            segs.append(
                (i, j, " ".join(words[j * seg_words:(j + 1) * seg_words]))
            )
    first_owner: dict[str, tuple[int, int]] = {}
    for i, j, s in sorted(segs):
        first_owner.setdefault(s, (i, j))
    want: dict[int, tuple[int, int, str]] = {}
    for i, t in enumerate(texts):
        if t is None:
            continue
        mine = [(j, s) for (di, j, s) in segs if di == i]
        kept = [(j, s) for j, s in mine if first_owner[s] == (i, j)]
        want[i] = (
            len(mine),
            len(kept),
            " ".join(s for _, s in sorted(kept)),
        )
    assert got == want


@given(_para_texts, st.sampled_from([2, 3]), st.sampled_from([2, 4]))
@settings(**_SETTINGS)
def test_winnow_fingerprints_matches_bruteforce_and_guarantee(
    spark, texts, n, w
):
    """winnow_fingerprints ≡ the textbook winnowing (Schleimer 2003)
    recomputed in python with the same md5-prefix hash: the fingerprint
    set is exactly {min of every w-window of n-gram hashes}, sorted
    distinct — which IS the span guarantee (every w consecutive grams
    contribute their window minimum, so any shared run of n+w-1 words
    shares a fingerprint). Docs with fewer than n+w-1 words fingerprint
    to the empty array."""
    import hashlib

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: list(r.nfp) if r.nfp is not None else None
        for r in tx.winnow_fingerprints(df, n=n, w=w).collect()
    }

    def h(gram: str) -> int:
        return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)

    for i, t in enumerate(texts):
        if t is None:
            # size(NULL words) is NULL -> the when-guard's otherwise
            # branch: empty fingerprint array, not NULL
            assert got[i] == [], (i, got[i])
            continue
        words = t.strip().split() or [""]
        grams = (
            [" ".join(words[j:j + n]) for j in range(len(words) - n + 1)]
            if len(words) >= n
            else []
        )
        hs = [h(g) for g in grams]
        mins = (
            {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}
            if len(hs) >= w
            else set()
        )
        assert got[i] == sorted(mins), (i, t, got[i], sorted(mins))


@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=12),
        min_size=1,
        max_size=4,
    ),
    st.integers(2, 4),
)
@settings(**_SETTINGS)
def test_mattr_counts_matches_bruteforce(spark, docs_tokens, w):
    """corpus.mattr_counts's closed form (per-position window-overlap
    contributions via one lag) equals the brute-force definition: the
    sum over every sliding window of its DISTINCT-type count. Small
    alphabet so repeats are dense — the regime the prev-occurrence
    bound actually bites in."""
    from soict20221_bigdata_financialplatform_spark.operators import (
        corpus as cp,
    )

    rows = [
        Row(doc_id=i, text=" ".join(toks))
        for i, toks in enumerate(docs_tokens)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.tn, r.sc)
        for r in cp.mattr_counts(df, window=w).collect()
    }
    for i, toks in enumerate(docs_tokens):
        t = len(toks)
        if t < w:
            assert i not in got, (i, toks)
            continue
        sc = sum(len(set(toks[s : s + w])) for s in range(t - w + 1))
        assert got[i] == (t, sc), (i, toks, w, got.get(i))


@given(
    st.lists(
        st.lists(st.integers(-5, 5), min_size=3, max_size=3),
        min_size=2,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_nearest2_sqdist_matches_bruteforce(spark, vecs):
    """similarity.nearest2_sqdist's top-3/drop-self/re-rank pipeline
    returns exactly the brute-force two smallest non-self squared
    distances — including under dense ties and exact-duplicate points
    (d1 = 0), the arrangements where the drop-self shortcut could
    plausibly go wrong."""
    from soict20221_bigdata_financialplatform_spark.operators import (
        similarity as sim,
    )

    rows = [Row(vec_id=i, eq=[int(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, eq array<long>")
    got = {
        r.vec_id: (r.d1, r.d2)
        for r in sim.nearest2_sqdist(df, id_col="vec_id", vec_col="eq").collect()
    }
    assert len(got) == len(vecs)
    for i, v in enumerate(vecs):
        d = sorted(
            (sum((a - b) ** 2 for a, b in zip(v, u)), j)
            for j, u in enumerate(vecs)
            if j != i
        )
        want_d1 = d[0][0]
        want_d2 = d[1][0] if len(d) >= 2 else None
        assert got[i] == (want_d1, want_d2), (i, vecs, got[i])


@given(
    st.lists(
        st.lists(st.integers(-5, 5), min_size=3, max_size=3),
        min_size=2,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_nearest2_sqdist_anchor_subset_matches_full(spark, vecs):
    """The ``anchors`` scale hatch returns exactly the full self-form's
    rows restricted to the anchor ids — anchor subsampling must never
    change any anchor's (d1, d2) against the full corpus."""
    from soict20221_bigdata_financialplatform_spark.operators import (
        similarity as sim,
    )
    from pyspark.sql import functions as F

    rows = [Row(vec_id=i, eq=[int(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, eq array<long>")
    full = {
        r.vec_id: (r.d1, r.d2)
        for r in sim.nearest2_sqdist(df, id_col="vec_id", vec_col="eq").collect()
    }
    sub = {
        r.vec_id: (r.d1, r.d2)
        for r in sim.nearest2_sqdist(
            df,
            id_col="vec_id",
            vec_col="eq",
            anchors=df.where(F.col("vec_id") % 2 == 0),
        ).collect()
    }
    assert sub == {i: v for i, v in full.items() if i % 2 == 0}, (vecs, sub)

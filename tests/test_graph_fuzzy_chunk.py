"""Round-4 pipeline operators: PageRank, blocked fuzzy matching,
sliding-window chunking, n-gram decontamination."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from soict20221_bigdata_financialplatform_spark.operators.corpus import (
    chunk_documents,
    ngram_contamination,
)
from soict20221_bigdata_financialplatform_spark.operators.fuzzy import (
    blocked_levenshtein_pairs,
)
from soict20221_bigdata_financialplatform_spark.operators.graph import pagerank


def _pagerank_reference(edges, iterations=5, damping=0.85, round_to=6):
    """Driver-side mirror of graph.pagerank for tiny graphs."""
    nodes = sorted({n for e in edges for n in e})
    deg = {n: 0 for n in nodes}
    for s, _ in edges:
        deg[s] += 1
    n = float(len(nodes))
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0.0 for v in nodes}
        for s, d in edges:
            contrib[d] += rank[s] / deg[s]
        rank = {
            v: round((1.0 - damping) / n + damping * contrib[v], round_to)
            for v in nodes
        }
    return rank


def test_pagerank_star_graph_matches_reference(spark):
    """Undirected star (hub 0, leaves 1-3): the hub must dominate, and
    every rank must equal the hand-iterated reference at 6dp."""
    und = [(0, 1), (0, 2), (0, 3)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in edges]
    )
    got = {r.node: r.rank for r in pagerank(df, iterations=5).collect()}
    want = _pagerank_reference(edges)
    assert got == want
    assert got[0] > got[1] == got[2] == got[3]
    # symmetric graph: mass conserved (up to per-node rounding)
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_pagerank_two_components_independent(spark):
    """Disconnected components don't leak rank into each other: a 2-cycle
    pair in one component ranks identically, regardless of the other
    component's shape."""
    und = [(1, 2), (10, 11), (10, 12), (11, 12), (12, 13)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    got = {r.node: r.rank for r in pagerank(df, iterations=5).collect()}
    want = _pagerank_reference(edges)
    assert got == want
    assert got[1] == got[2]


def test_blocked_fuzzy_pairs_finds_near_spellings(spark):
    rows = (
        [Row(name="cold bolt")] * 3
        + [Row(name="old bolt")] * 1
        + [Row(name="red bolt")] * 2
        + [Row(name="cold gear")] * 4  # different block (last token)
    )
    out = blocked_levenshtein_pairs(
        spark.createDataFrame(rows), "name", max_dist=2
    ).collect()
    pairs = {(r.value_a, r.value_b): (r.dist, r.cnt_a, r.cnt_b) for r in out}
    # within-block, within-distance pairs only; counts carried through
    assert pairs[("cold bolt", "old bolt")] == (1, 3, 1)
    assert ("cold bolt", "red bolt") not in pairs  # dist 3 > 2
    assert all("gear" not in a and "gear" not in b for (a, b) in pairs)
    # ordered pairs: each unordered pair exactly once
    assert all(a < b for (a, b) in pairs)


def test_chunk_documents_covers_and_overlaps(spark):
    words = [f"w{i}" for i in range(80)]
    df = spark.createDataFrame(
        [Row(doc_id=1, text=" ".join(words)), Row(doc_id=2, text="solo")]
    )
    out = chunk_documents(df, size=32, stride=24).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    # starts 0,24,48,72 -> 4 chunks; last chunk is the 8-token remainder
    assert [r.n_tokens for r in c1] == [32, 32, 32, 8]
    assert c1[0].chunk_text.split(" ") == words[0:32]
    assert c1[1].chunk_text.split(" ") == words[24:56]
    assert c1[3].chunk_text.split(" ") == words[72:80]
    # every token appears in at least one chunk
    seen = {w for r in c1 for w in r.chunk_text.split(" ")}
    assert seen == set(words)
    # a doc shorter than one window is a single whole-doc chunk
    assert [(r.chunk_idx, r.n_tokens, r.chunk_text) for r in by_doc[2]] == [
        (0, 1, "solo")
    ]


def test_ngram_contamination_flags_planted_leak(spark):
    leak = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
    train = spark.createDataFrame(
        [
            # doc 1: the leaked 8-gram + 8 clean words -> 9 grams, 1 bad
            Row(doc_id=1, text=leak + " one two three four five six seven eight"),
            Row(doc_id=2, text="clean words only nothing shared here at all nine ten"),
        ]
    )
    evals = spark.createDataFrame(
        [Row(doc_id=100, text=leak + " trailing benchmark context words here")]
    )
    out = {r.doc_id: r for r in ngram_contamination(train, evals, n=8).collect()}
    assert set(out) == {1}  # clean doc not emitted
    assert out[1].n_bad_grams == 1
    assert out[1].contamination_frac == 1 / 9


def test_pps_sample_expected_size_and_stability(spark):
    from soict20221_bigdata_financialplatform_spark.operators.corpus import pps_sample

    rows = [Row(doc_id=i, n_chars=100 + (i % 50) * 10) for i in range(2000)]
    df = spark.createDataFrame(rows)
    out = pps_sample(df, weight_col="n_chars", k=200, seed=7)
    got = out.collect()
    # expected size ~k: Poisson sampling concentrates (here within +/-40%)
    assert 120 <= len(got) <= 280
    # key-stable: a second run returns the identical id set
    again = {r.doc_id for r in pps_sample(df, "n_chars", 200, seed=7).collect()}
    assert {r.doc_id for r in got} == again
    # inclusion probability is emitted, in (0, 1], and proportional to weight
    ps = {r["doc_id"]: r["__p"] for r in out.select("doc_id", "__p").collect()}
    assert all(0.0 < p <= 1.0 for p in ps.values())
    w = {r.doc_id: r.n_chars for r in df.collect()}
    some = sorted(ps)[:20]
    for i in some:
        for j in some:
            if w[i] < w[j]:
                assert ps[i] <= ps[j]


def test_leakage_free_split_never_straddles_clusters(spark, sf_dir):
    """Every near-dup pair used to build the clusters lands on ONE side of
    the split — the property per-doc hash splits cannot give."""
    from soict20221_bigdata_financialplatform_spark.operators import dedup as dd
    from soict20221_bigdata_financialplatform_spark.queries import QUERIES
    from soict20221_bigdata_financialplatform_spark.sources import load_table

    split = {
        r.doc_id: r.split
        for r in QUERIES["q119_leakage_free_split"](spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(d, shingle_n=3, threshold=0.5).collect()
    assert pairs, "fixture must contain near-dup pairs"
    for r in pairs:
        assert split[r.id_a] == split[r.id_b], (r.id_a, r.id_b)
    # both sides populated (0.8/0.2 over many clusters)
    assert {"train", "test"} == set(split.values())


def test_cdc_chunking_shared_passage_yields_identical_chunks(spark):
    """THE content-defined-chunking property: a passage duplicated across
    docs at DIFFERENT offsets still splits into identical chunks (fixed
    windows can't do this — their boundaries shift with the offset)."""
    from soict20221_bigdata_financialplatform_spark.operators.corpus import (
        cdc_chunk_documents,
    )

    shared = " ".join(f"s{i}" for i in range(64))
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="pre1 " + shared + " post1"),
            Row(doc_id=2, text="a b c d e f g " + shared + " tail tail2"),
        ]
    )
    out = cdc_chunk_documents(df, modulus=8).collect()
    chunks = {1: set(), 2: set()}
    for r in out:
        chunks[r.doc_id].add(r.chunk_text)
    common = chunks[1] & chunks[2]
    # interior chunks of the shared passage align despite offset shift
    assert len(common) >= 3, common
    # reassembly is lossless and ordered
    rows1 = sorted((r for r in out if r.doc_id == 1), key=lambda r: r.chunk_id)
    assert " ".join(r.chunk_text for r in rows1) == "pre1 " + shared + " post1"
    assert all(r.n_tokens == len(r.chunk_text.split(" ")) for r in out)


def test_temperature_sample_upweights_rare_strata(spark):
    """alpha=0.5 rebalancing: the rare stratum's expected share rises
    above its raw share, the dominant one's falls — and inclusion
    probabilities are exactly min(1, k*sqrt(n)/(n*W))."""
    import math

    from soict20221_bigdata_financialplatform_spark.operators.corpus import (
        temperature_sample,
    )

    rows = [Row(doc_id=i, lang="en") for i in range(1600)] + [
        Row(doc_id=10000 + i, lang="fr") for i in range(100)
    ]
    out = temperature_sample(
        spark.createDataFrame(rows), strata_col="lang", k=400, seed=3
    )
    ps = {(r["lang"]): r["__p"] for r in out.select("lang", "__p").distinct().collect()}
    W = round(math.sqrt(1600) + math.sqrt(100), 6)
    assert ps["en"] == min(1.0, 400 * math.sqrt(1600) / (1600 * W))
    assert ps["fr"] == min(1.0, 400 * math.sqrt(100) / (100 * W))
    # raw share en = 16/17; alpha=0.5 share = 40/50 = 0.8 < 16/17, fr up
    assert ps["fr"] > ps["en"]
    got = out.groupBy("lang").count().collect()
    n = {r["lang"]: r["count"] for r in got}
    # expected en=320, fr=80; Bernoulli concentration within +/-35%
    assert 200 <= n["en"] <= 440 and 50 <= n["fr"] <= 100


def test_blocked_fuzzy_hot_block_cap(spark):
    """A block exceeding max_block_size is dropped from candidate
    generation entirely; small blocks are untouched."""
    rows = [Row(name=f"v{i} bolt") for i in range(10)] + [
        Row(name="cold gear"), Row(name="old gear")
    ]
    out = blocked_levenshtein_pairs(
        spark.createDataFrame(rows), "name", max_dist=3, max_block_size=5
    ).collect()
    pairs = {(r.value_a, r.value_b) for r in out}
    assert ("cold gear", "old gear") in pairs       # small block survives
    assert all("bolt" not in a for a, _ in pairs)   # hot block dropped


def test_canonicalize_maps_rows_to_frequent_spelling(spark):
    """End-to-end ER: transitive fuzzy clusters collapse onto the most
    frequent spelling; unmatched values stay themselves."""
    from soict20221_bigdata_financialplatform_spark.operators.fuzzy import canonicalize

    rows = (
        [Row(id=i, name="cold bolt") for i in range(5)]
        + [Row(id=10, name="old bolt")]        # d1 from cold bolt
        + [Row(id=11, name="olde bolt")]       # d1 from old bolt (chain!)
        + [Row(id=20, name="cold gear"), Row(id=21, name="cold gear")]
    )
    out = canonicalize(spark.createDataFrame(rows), "name", max_dist=1)
    got = {r.id: r.name_canonical for r in out.collect()}
    # the chain cold~old~olde collapses transitively onto the majority
    assert got[0] == got[10] == got[11] == "cold bolt"
    assert got[20] == "cold gear"  # unmatched: its own canonical
    assert out.count() == len(rows)  # row multiplicity preserved


def test_decontaminate_drops_only_leaking_docs(spark):
    from soict20221_bigdata_financialplatform_spark.operators.corpus import decontaminate

    leak = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=leak + " plus trailing training words here now"),
            Row(doc_id=2, text="totally clean text with enough words to have grams"),
        ]
    )
    evals = spark.createDataFrame([Row(doc_id=9, text=leak + " eval tail")])
    kept = decontaminate(docs, evals, n=8)
    assert {r.doc_id for r in kept.collect()} == {2}


def test_dedup_tokens_expression(spark):
    from soict20221_bigdata_financialplatform_spark.functions.text import dedup_tokens

    out = spark.createDataFrame([Row(text="a b a c b a d")]).select(
        dedup_tokens("text").alias("k")
    ).collect()[0]["k"]
    assert out == ["a", "b", "c", "d"]


def _round_half_up(x, nd):
    """Spark's F.round on doubles: HALF_UP over the shortest decimal
    repr (java BigDecimal.valueOf) — python's round() is half-EVEN and
    diverges on exact .5 boundaries."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal(f"1e-{nd}"), rounding=decimal.ROUND_HALF_UP
        )
    )


def _ppr_reference(edges, seeds, iterations=5, damping=0.85, round_to=6):
    nodes = sorted({n for e in edges for n in e})
    deg = {n: 0 for n in nodes}
    for s, _ in edges:
        deg[s] += 1
    ns = float(len(seeds))
    rank = {v: (1.0 / ns if v in seeds else 0.0) for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0.0 for v in nodes}
        for s, d in edges:
            contrib[d] += rank[s] / deg[s]
        rank = {
            v: _round_half_up(
                (1.0 - damping) / ns * (1.0 if v in seeds else 0.0)
                + damping * contrib[v],
                round_to,
            )
            for v in nodes
        }
    return rank


def test_personalized_pagerank_biases_toward_seeds(spark):
    """A path graph 1-2-3-4-5 personalized on {1}: rank decays with
    distance from the seed, and every value matches the hand-iterated
    reference at 6dp."""
    und = [(1, 2), (2, 3), (3, 4), (4, 5)]
    edges = und + [(b, a) for a, b in und]
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    seeds = spark.createDataFrame([Row(node=1)])
    got = {
        r.node: r.rank
        for r in pagerank(df, iterations=5, seeds=seeds).collect()
    }
    want = _ppr_reference(edges, {1})
    assert got == want
    # mass concentrates on the seed's side of the path (per-hop
    # monotonicity does NOT hold — rank flows in waves — but the
    # seed-side half must dominate, and the far end must stay small)
    assert got[1] + got[2] > got[4] + got[5]
    assert got[5] < got[2]
    assert abs(sum(got.values()) - 1.0) < 1e-3  # symmetric: mass conserved


def test_triangle_counts_known_graph(spark):
    """K4 minus one edge: two triangles; shared-edge vertices count 2,
    opposite vertices 1. Duplicate/reversed edges and self-loops are
    canonicalized away; a vertex in no triangle is absent."""
    from soict20221_bigdata_financialplatform_spark.operators.graph import triangle_counts

    edges = spark.createDataFrame(
        [
            Row(src=1, dst=2), Row(src=2, dst=3), Row(src=3, dst=1),
            Row(src=2, dst=4), Row(src=4, dst=3),
            Row(src=3, dst=2),   # reversed duplicate
            Row(src=1, dst=1),   # self-loop
            Row(src=4, dst=5),   # pendant edge: 5 in no triangle
        ]
    )
    out = {r.vertex: r.n_triangles for r in triangle_counts(edges).collect()}
    assert out == {1: 1, 2: 2, 3: 2, 4: 1}


def test_pmi_cooccurrence_collocation_beats_independents(spark):
    """A pair that always co-occurs has positive PMI; a pair appearing
    together at its independent rate sits near zero; support < min_pairs
    is dropped."""
    from soict20221_bigdata_financialplatform_spark.operators.corpus import (
        pmi_cooccurrence,
    )

    rows = (
        [Row(doc_id=i, text="alpha beta filler" + str(i % 7)) for i in range(10)]
        + [Row(doc_id=100 + i, text="gamma solo") for i in range(10)]
        + [Row(doc_id=200 + i, text="rare pairword") for i in range(2)]
    )
    out = {(r.w_a, r.w_b): r for r in pmi_cooccurrence(
        spark.createDataFrame(rows), min_pairs=5).collect()}
    assert out[("alpha", "beta")].pmi > 0.5
    assert ("pairword", "rare") not in out  # support 2 < 5


def test_clustering_coefficients_triangle_plus_pendant(spark):
    """Triangle {1,2,3} with a pendant 4 on vertex 3: cc=1.0 for 1 and 2
    (deg 2, one triangle), cc=1/3 for 3 (deg 3, one of three possible),
    vertex 4 (deg 1) excluded."""
    from soict20221_bigdata_financialplatform_spark.operators.graph import (
        clustering_coefficients,
    )

    edges = spark.createDataFrame(
        [Row(src=1, dst=2), Row(src=2, dst=3), Row(src=3, dst=1),
         Row(src=3, dst=4)]
    )
    out = {r.vertex: r for r in clustering_coefficients(edges).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].clustering_coeff == 1.0
    assert out[2].clustering_coeff == 1.0
    assert out[3].degree == 3 and out[3].n_triangles == 1
    assert abs(out[3].clustering_coeff - 1 / 3) < 1e-12

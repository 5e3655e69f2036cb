"""Text-analysis functions for corpus pipelines (driver brief: language-ID,
quality scoring, token counting, document fingerprinting) — native Catalyst
expressions throughout; each has an exact ANSI-SQL twin in the oracle.

The reference's only text op is ``splitTextToTriplet`` (n-word grouping of
news text, ``pipeline/util/util.py:16-19``) — generalized here to
``word_groups``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword lists for the ratio heuristics. Public/common
# words; the point is a reproducible scoring formula, not linguistics.
EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (BPE-ish refinement can follow; the contract is
    deterministic and cheap)."""
    c = F.col(col) if isinstance(col, str) else col
    t = F.trim(c)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


# GPT-2-style pre-tokenizer shape, restricted to RE2-safe syntax (no
# lookarounds) so the DuckDB oracle runs the identical pattern: a token is
# an optionally space-prefixed letter run, digit run, or punctuation run,
# else a whitespace run.
BPE_ISH_PATTERN = r" ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_ish_token_count(col: Column | str) -> Column:
    """Driver brief: "token counting (whitespace + a BPE-ish regex)". Counts
    non-overlapping matches of the GPT-2-shaped pre-tokenizer pattern —
    approximates BPE token counts ~2-3x better than whitespace words for
    budget estimation, with zero vocabulary dependency."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_ISH_PATTERN)).cast("long")


def char_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c).cast("long")


def stopword_count(col: Column | str, stopwords=EN_STOPWORDS) -> Column:
    """Occurrences of any stopword as a standalone lowercase word.

    A "word" is a maximal run of Unicode letters/marks/digits/underscore:
    everything else is stripped to spaces and the result split — an
    expression both engines evaluate identically. The obvious
    ``\\b(the|...)\\b`` regex is NOT cross-engine: Java's ``\\b`` is
    Unicode-aware while RE2's is ASCII, so e.g. ``jöin`` (combining
    mark) has a boundary before ``in`` for DuckDB but not for Spark —
    found by the r12 Unicode parity probe, invisible on ASCII testdata
    (on pure ASCII this formulation counts exactly what ``\\b`` did).

    Stays whole-stage-codegen: non-word runs become TWO spaces, the text
    is space-padded, and ``regexp_count`` matches ``' (stop) '`` — with
    2-space separators adjacent stopwords can't collide under leftmost
    non-overlapping matching (each match consumes one space per side),
    so this equals the strip-split-isin count without the interpreted
    HOF filter (measured 2.7x faster on q28 at sf0.1)."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(
        F.lower(c), r"[^\p{L}\p{M}\p{N}_]+", "  "
    )
    padded = F.concat(F.lit(" "), cleaned, F.lit(" "))
    pattern = " (" + "|".join(stopwords) + ") "
    return F.regexp_count(padded, F.lit(pattern)).cast("long")


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[.,;:!?]")).cast("long")


def quality_score(col: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: blend of length band, stopword
    ratio, and mean word length band — the standard cheap pre-filter shape
    (cf. C4/Gopher rules) with an exactly SQL-expressible formula.

    score = 0.4·len_ok + 0.3·min(1, 5·stopwords/tokens) + 0.3·wordlen_ok
    where len_ok = 1 if 50 <= chars <= 10000 else 0, and wordlen_ok = 1 if
    3 <= chars/tokens <= 12 else 0. Empty text scores 0.
    """
    c = F.col(col) if isinstance(col, str) else col
    n_chars = char_count(c).cast("double")
    n_toks = token_count(c).cast("double")
    n_stop = stopword_count(c).cast("double")
    len_ok = F.when((n_chars >= 50) & (n_chars <= 10000), 1.0).otherwise(0.0)
    mean_wl = n_chars / n_toks
    wl_ok = F.when((mean_wl >= 3.0) & (mean_wl <= 12.0), 1.0).otherwise(0.0)
    stop_term = F.least(F.lit(1.0), F.lit(5.0) * n_stop / n_toks)
    score = 0.4 * len_ok + 0.3 * stop_term + 0.3 * wl_ok
    return F.when(n_toks > 0, score).otherwise(F.lit(0.0))


def lang_id_en_score(col: Column | str) -> Column:
    """Language-ID heuristic: English stopword hits per token. Classify
    ``en`` when the rate exceeds a threshold (n-gram profiles are the richer
    public approach; this is the deterministic, oracle-checkable core)."""
    c = F.col(col) if isinstance(col, str) else col
    n_toks = token_count(c).cast("double")
    return F.when(n_toks > 0, stopword_count(c).cast("double") / n_toks).otherwise(
        F.lit(0.0)
    )


def words(col: Column | str) -> Column:
    """Whitespace word array (trimmed). The base of the repetition stats."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def _warr(col: Column | str, pre_split: bool) -> Column:
    """The word array for a metric: the column itself when the caller staged
    the split already, else split here."""
    if pre_split:
        return F.col(col) if isinstance(col, str) else col
    return words(col)


def mean_word_len(col: Column | str, pre_split: bool = False) -> Column:
    """Mean characters per word (Gopher rule input). Integer char-sum over
    integer count — bit-identical across engines, no rounding needed.

    ``pre_split=True`` means ``col`` is ALREADY the word array — stage the
    split once per row when stacking several repetition metrics (HOFs are
    CodegenFallback with no subexpression elimination, so each metric would
    otherwise re-run the split regex; CLAUDE.md invariant 14)."""
    w = _warr(col, pre_split)
    n = F.size(w)
    total = F.aggregate(w, F.lit(0), lambda acc, x: acc + F.length(x))
    return F.when(n > 0, total.cast("double") / n)


def stopword_frac(
    col: Column | str, stopwords=EN_STOPWORDS, pre_split: bool = False
) -> Column:
    """Fraction of words that are stopwords (Gopher: quality text has a
    floor on function-word density). ``pre_split``: see mean_word_len."""
    w = _warr(col, pre_split)
    n = F.size(w)
    hits = F.size(F.filter(w, lambda x: F.lower(x).isin(*stopwords)))
    return F.when(n > 0, hits.cast("double") / n)


def top_word_frac(col: Column | str, pre_split: bool = False) -> Column:
    """Fraction of the document taken by its single most frequent word —
    the cheapest repetition signal (a page of 'buy buy buy ...' scores ~1).

    Computed WITHOUT a shuffle: sort the word array, fold a (prev, run,
    best) state over it with ``aggregate`` — max run length of the sorted
    array == max word frequency. Pure codegen'd expression per row.
    ``pre_split``: see mean_word_len."""
    w = F.array_sort(_warr(col, pre_split))
    n = F.size(w)
    best = F.aggregate(
        w,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return F.when(n > 0, best.cast("double") / n)


def dup_bigram_frac(col: Column | str, pre_split: bool = False) -> Column:
    """Fraction of word bigrams that are repeats of an earlier bigram
    (1 - distinct/total) — the Gopher "duplicate n-gram" repetition rule.
    Null for documents of fewer than two words. ``pre_split``: see
    mean_word_len."""
    w = _warr(col, pre_split)
    n = F.size(w)
    bi = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat_ws(" ", F.element_at(w, i), F.element_at(w, i + 1)),
    )
    return F.when(
        n >= 2,
        F.lit(1.0) - F.size(F.array_distinct(bi)).cast("double") / (n - 1),
    )


def word_ngrams_from(words_col: Column | str, n: int = 5) -> Column:
    """All word n-grams of a BOUND words-array column (empty array below n
    words) — the unit of cross-document span analysis (contamination checks,
    span dedup). Stage the words array as its own projection first (see
    ``winnow_select``'s staging note: a captured ``split`` re-evaluates per
    element inside interpreted HOF lambdas)."""
    w = F.col(words_col) if isinstance(words_col, str) else words_col
    cnt = F.size(w)
    grams = F.transform(
        F.sequence(F.lit(1), cnt - n + 1),
        lambda i: F.concat_ws(
            " ", *[F.element_at(w, i + j) for j in range(n)]
        ),
    )
    return F.when(cnt >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def word_ngrams(col: Column | str, n: int = 5) -> Column:
    """One-column convenience form of ``word_ngrams_from`` — fine for short
    text; for corpus-scale scans stage the words array first (O(len²) split
    re-evaluation otherwise; see ``winnow_select``)."""
    return word_ngrams_from(words(col), n)


def fingerprint(col: Column | str) -> Column:
    """64-bit document fingerprint: xxhash64 of the whitespace-normalized
    lowercased text — stable under reformatting, O(len) single pass."""
    c = F.col(col) if isinstance(col, str) else col
    normalized = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    return F.xxhash64(normalized)


def ngram_hashes(grams_col: Column | str) -> Column:
    """md5-prefix→uint64 hash of each n-gram (CLAUDE.md trick:
    ``conv(substr(md5(x),1,15),16,10)`` == DuckDB
    ``('0x'||substr(md5(x),1,15))::UBIGINT`` — the oracle runs the identical
    function). Apply to a BOUND grams column (see ``winnow_fingerprints``'s
    staging note)."""
    c = F.col(grams_col) if isinstance(grams_col, str) else grams_col
    return F.transform(
        c, lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
    )


def winnow_select(hashes_col: Column | str, w: int = 5) -> Column:
    """The winnowing selection (Schleimer/Wilkerson/Aiken, SIGMOD 2003):
    slide a window of ``w`` consecutive n-gram hashes, keep the minimum of
    each window, return the distinct selected hashes sorted. Guarantees every
    shared run of n + w - 1 words between two documents shares at least one
    fingerprint, at ~2/(w+1) selection density. Selection is by hash VALUE
    then distinct, so tie position within a window is irrelevant — the
    fingerprint SET is well defined and cross-engine reproducible.

    Returns array<bigint>; empty array when fewer than ``w`` hashes exist
    (no full window). Apply to a BOUND hash-array column.

    STAGING MATTERS: higher-order functions are CodegenFallback (interpreted,
    no subexpression elimination) — a lambda that captures a non-trivial
    outer expression re-evaluates it per element. Materialize words → grams
    → hashes as real columns in separate projections (multi-referenced
    non-cheap aliases block CollapseProject, so each computes once per row);
    inlining the whole chain into one Column turns O(len·w) into O(len²)
    md5 calls (measured 14x slower end-to-end)."""
    h = F.col(hashes_col) if isinstance(hashes_col, str) else hashes_col
    cnt = F.size(h)
    mins = F.transform(
        F.sequence(F.lit(1), cnt - w + 1), lambda i: F.array_min(F.slice(h, i, w))
    )
    return F.when(cnt >= w, F.array_sort(F.array_distinct(mins))).otherwise(
        F.array().cast("array<bigint>")
    )


def winnow_fingerprints(
    df: DataFrame, text_col: str = "text", n: int = 4, w: int = 5
) -> DataFrame:
    """Winnowing document fingerprints, properly staged (see
    ``winnow_select``): adds an ``nfp`` array<bigint> column of the selected
    fingerprints; drops the intermediates. Span-level dedup/plagiarism/
    contamination primitive (vs ``fingerprint``'s whole-document hash)."""
    return (
        df.withColumn("__w", words(text_col))
        .withColumn("__g", word_ngrams_from("__w", n))
        .withColumn("__h", ngram_hashes("__g"))
        .withColumn("nfp", winnow_select("__h", w))
        .drop("__w", "__g", "__h")
    )


def word_groups(col: Column | str, n: int = 3) -> Column:
    """``splitTextToTriplet`` generalized (reference util.py:16-19): split
    text into groups of n consecutive words, as array<string>."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(c), r"\s+")
    n_groups = F.ceil(F.size(toks) / F.lit(n)).cast("int")
    idx = F.sequence(F.lit(0), n_groups - 1)
    return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i * n + 1, n)))


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """All features in one projection (single scan pass, codegen'd)."""
    return df.select(
        "*",
        char_count(text_col).alias("n_chars_computed"),
        token_count(text_col).alias("n_tokens"),
        stopword_count(text_col).alias("n_stopwords"),
        punct_count(text_col).alias("n_punct"),
        quality_score(text_col).alias("quality"),
        lang_id_en_score(text_col).alias("en_score"),
        fingerprint(text_col).alias("fingerprint"),
    )


def dedup_tokens(col: Column | str, pre_split: bool = False) -> Column:
    """Order-preserving within-document token dedup: the words array with
    each token's FIRST occurrence kept and repeats dropped — the repair
    path for repetition-heavy docs (q116 is the registered oracle form;
    ``dup_bigram_frac``/``top_word_frac`` are the detectors). Pure
    per-row HOF (indexed ``filter``): O(L²) worst case in tokens-per-doc,
    zero shuffle; for book-length docs use the posexplode → min(pos)
    shuffle form instead. In hot paths STAGE the words array and pass
    ``pre_split=True`` — a lambda capturing a computed split re-splits
    per element (invariant 14)."""
    w = _warr(col, pre_split)
    return F.filter(
        w, lambda x, i: F.array_position(w, x) == i + F.lit(1)
    )

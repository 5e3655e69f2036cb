"""Differentially-private release mechanisms over grouped aggregates —
the RELEASE side of the privacy toolkit (``queries.q288`` audits
k-anonymity, ``functions/text.pii_redact`` scrubs identifiers; this
module perturbs what actually leaves the platform).

Mechanism: the Laplace mechanism (Dwork et al. 2006) — add
``Laplace(sensitivity / epsilon)`` noise to each released statistic.
Noise is synthesized as the difference of two exponentials
(``ln(u1) - ln(u2)`` scaled; the textbook two-exponential construction),
with the uniforms drawn from the engine's seeded md5 hash family, so a
release is REPLAYABLE: the same (seed, group) always re-draws the same
noise. That is an engineering choice, not a weakening — re-running a
published release must reproduce the published numbers, and re-releasing
under a FRESH seed is a new epsilon spend the caller accounts for
(set ``seed`` per release; the privacy budget ledger lives with the
caller, as in any DP deployment).

SEED HANDLING IS PART OF THE GUARANTEE — two conditions the caller MUST
hold or the epsilon claim is void:

1. **The seed is a secret.** The noise is a deterministic function of
   (seed, group key) and nothing else; an adversary who knows the seed
   can recompute the noise exactly and subtract it, recovering the true
   statistic. Treat the seed like a key: generate it from a CSPRNG,
   store it with the release audit record, never publish it.
2. **Never reuse a seed across dataset versions/snapshots.** Because
   the noise depends only on (seed, group), releasing the same groups
   from an EVOLVING table under the same seed gives two releases whose
   difference has the noise cancel exactly — the adversary reads the
   true per-group delta. Every release over changed data is a fresh
   seed AND a fresh epsilon spend.

The registered demo queries q334–q336 hard-code public seeds because
they are PARITY DEMONSTRATIONS of the mechanism's plumbing (the
cross-engine oracle must be able to re-derive the noise), not
production privacy releases.

Scale: noise synthesis is a per-GROUP projection on the aggregate frame
(a handful of md5s + lns per released row — never per input row), so the
mechanism adds nothing to the aggregation's shuffle; clipping for the
sum mechanism is a per-row ``least`` folded into the scan projection.

Reference parity: the reference has no privacy surface at all; this is
engine-added for the training-data-pipeline brief (publishing corpus
composition stats without leaking individual-document membership).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^60 as an exactly-representable double: hashes are 60-bit, so
# (h + 1) / 2^60 lies in (0, 1] and the division is exact scaling.
_TWO60 = 1.152921504606846976e18


# Sentinel substituted for a NULL group key inside the hash key. Without
# it, concat_ws SKIPS the NULL component (Spark draws real noise for the
# NULL group) while a '||'-style oracle concatenation propagates NULL
# through md5 → NULL noise — a NULL-group cross-engine divergence the
# NULL-free testdata can never expose (r12 ADVICE item 3). \x1f (unit
# separator) cannot collide with the '|' field separator and is
# vanishingly unlikely in real keys. Oracle SQL must mirror it as
# ``coalesce(col, chr(31) || 'null')``.
_NULL_SENTINEL = "\x1fnull"


def _uniform(tag: str, seed: str, *group_cols: str) -> Column:
    """Seeded uniform in (0, 1]: 60-bit md5 prefix of (tag|seed|group key),
    +1 to dodge ln(0), divided by 2^60 (exact). The md5-prefix family is
    the engine's standard cross-engine-reproducible hash (CLAUDE.md
    oracle tricks). NULL group keys hash via ``_NULL_SENTINEL`` so the
    NULL group gets a real (deterministic) draw on both engines."""
    key = F.concat_ws(
        "|",
        F.lit(tag),
        F.lit(seed),
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL))
            for c in group_cols
        ],
    )
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    return (h + F.lit(1)) / F.lit(_TWO60)


def laplace_noise(
    scale: float, seed: str, group_cols: Sequence[str]
) -> Column:
    """One Laplace(scale) draw per group key: scale * (ln u1 - ln u2),
    the difference of two unit exponentials. Each ``ln`` is rounded to
    6 decimals AT the transcendental (the engine's float-parity policy —
    transcendentals are not bit-portable across libm builds; everything
    downstream is identical-expression-tree arithmetic)."""
    u1 = _uniform("dpL1", seed, *group_cols)
    u2 = _uniform("dpL2", seed, *group_cols)
    return (F.round(F.log(u1), 6) - F.round(F.log(u2), 6)) * F.lit(
        float(scale)
    )


def dp_laplace_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    epsilon: float = 1.0,
    seed: str = "dp0",
) -> DataFrame:
    """epsilon-DP noisy group counts: COUNT(*) per group + Laplace(1/eps)
    (a count's sensitivity to one row is exactly 1). Returns
    (group cols..., n_true, noisy_count) — callers publish
    ``noisy_count`` and DROP ``n_true`` (kept here as the calibration
    column, the q332 ``true_shared`` convention).

    Caveat a caller must own: the GROUP KEY LIST itself is released
    as-is — groups that exist only because of one individual reveal
    membership by appearing. Standard mitigations (publish a fixed
    public key domain, or threshold noisy counts) are upstream policy.
    """
    keys = list(group_cols)
    agg = df.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    noise = laplace_noise(1.0 / epsilon, seed, keys)
    return agg.select(
        *keys, "n_true", (F.col("n_true") + noise).alias("noisy_count")
    )


def gumbel_noise(
    scale: float, seed: str, group_cols: Sequence[str]
) -> Column:
    """One Gumbel(0, scale) draw per group key: -scale * ln(-ln u). Both
    transcendentals rounded to 6 decimals at the op (float policy); the
    negations and the scale multiply are exact/identical IEEE, so the
    draw is bit-identical cross-engine.

    The inner ln is clamped to at most -1e-6: when u is within ~5e-7 of
    1, round(ln u, 6) == 0.0 and the outer log would get 0 — Spark
    returns NULL there (even under ANSI), silently sorting the group out
    of the top-k, while DuckDB aborts (~0.5 hits per million groups;
    r12 ADVICE item 2). Oracle twins must carry the identical
    ``least(round(ln(u), 6), -1e-6)``."""
    u = _uniform("dpG", seed, *group_cols)
    # ln u in [-ln 2^60, 0); clamp away from 0 so ln(-inner) is defined
    inner = F.least(F.round(F.log(u), 6), F.lit(-1e-6))
    outer = F.round(F.log(-inner), 6)     # ln(-ln u)
    return -outer * F.lit(float(scale))


def dp_gumbel_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    k: int = 5,
    epsilon: float = 1.0,
    seed: str = "dp0",
) -> DataFrame:
    """epsilon-DP top-k SELECTION of the most frequent groups — the
    one-shot Gumbel mechanism (Durfee & Rogers 2019): adding Gumbel
    noise to each score and taking the k largest is equivalent to k
    sequential exponential-mechanism draws. Score = COUNT(*)
    (sensitivity 1), noise scale = 2k/epsilon (k peeling steps at
    epsilon/k each, exponential mechanism's 2Δ/eps per step). Returns
    the k selected groups with (n_true, noisy_score) — the RELEASE is
    the selected key list (+ optionally q334-noised counts under a
    separate budget); n_true is the calibration column, drop it at
    production.

    Completes the release family: q334 counts, q335 magnitudes, this
    selects (e.g. "which 5 domains dominate the corpus" without the
    count table). Deterministic/replayable like its siblings. Scale:
    noise is a per-group projection above the count aggregate; the
    top-k is TakeOrderedAndProject over the aggregate frame (group
    cardinality, never row cardinality)."""
    keys = list(group_cols)
    agg = df.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("n_true"))
    noisy = agg.select(
        *keys,
        "n_true",
        (
            F.col("n_true")
            + gumbel_noise(2.0 * k / epsilon, seed, keys)
        ).alias("noisy_score"),
    )
    return noisy.orderBy(F.desc("noisy_score"), *keys).limit(k)


def dp_laplace_sum(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    clip: float,
    epsilon: float = 1.0,
    seed: str = "dp0",
) -> DataFrame:
    """epsilon-DP noisy group sums with per-row clipping: each
    contribution is clamped to [0, clip] (the sensitivity bound — an
    UNclipped sum has unbounded sensitivity and no finite-noise DP
    release exists), summed per group, + Laplace(clip/eps). Returns
    (group cols..., n_rows, sum_clipped, noisy_sum); publish
    ``noisy_sum`` only.

    The clipped per-row value is folded into the scan projection and the
    sum is an ordinary map-side-combined aggregate; clip choice is a
    bias/variance trade the caller tunes on public or DP-released
    quantiles (e.g. q187's sampled quantiles), never on the raw data.

    NULL and negative values clamp to 0 (they contribute nothing) —
    the release must not crash on dirty rows."""
    keys = list(group_cols)
    v = F.coalesce(F.col(value_col).cast("double"), F.lit(0.0))
    clipped = F.least(F.greatest(v, F.lit(0.0)), F.lit(float(clip)))
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(clipped).alias("sum_clipped"),
    )
    noise = laplace_noise(float(clip) / epsilon, seed, keys)
    return agg.select(
        *keys,
        "n_rows",
        "sum_clipped",
        (F.col("sum_clipped") + noise).alias("noisy_sum"),
    )

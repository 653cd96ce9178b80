"""probabilisticsamplerprocessor — deterministic hash-based sampling.

Reference semantics (`processor/probabilisticsamplerprocessor/config.go:30-45`,
`logsprocessor.go:115-239`):
- mode hash_seed: FNV-hash the sampling key (trace id, or a configured log
  attribute) with a seed, scale into a 14-bit space, keep the row when the
  bucket is below sampling_percentage — deterministic and reproducible;
- ``sampling_priority`` attribute overrides the percentage per record;
- OTEP-235 proportional/equalizing modes act on trace randomness (out of
  scope for a log table; hash_seed is the log default).

Spark: ``pmod(xxhash64(key, seed), 2^14) < threshold`` — one vectorized
expression, no shuffle, stable under re-runs and partition layout (the
xxhash64-for-FNV swap is a documented divergence: same semantics, different
hash constants, so the *set* of sampled rows differs from the reference while
every statistical and determinism property is preserved).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUM_BUCKETS = 0x4000  # 2^14, matching the reference's scaled space


def _bucket(key: Column, seed: int, hash_impl: str) -> Column:
    if hash_impl == "xxhash64":
        return F.pmod(F.xxhash64(key.cast("string"), F.lit(seed)), F.lit(_NUM_BUCKETS))
    # md5_48: engine-portable twin (DuckDB computes the identical bucket
    # from the same md5 hex prefix) — semantics identical, constants differ
    h = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(f":{seed}"))), 1, 12),
        16, 10,
    ).cast("long")
    return F.pmod(h, F.lit(_NUM_BUCKETS))


def sample_predicate(
    key: Column, percentage: float, seed: int = 22, hash_impl: str = "xxhash64"
) -> Column:
    threshold = int(percentage / 100.0 * _NUM_BUCKETS)
    return _bucket(key, seed, hash_impl) < threshold


def probabilistic_sample(
    df: DataFrame,
    key_col: str,
    percentage: float,
    seed: int = 22,
    priority_col: str | None = None,
    hash_impl: str = "xxhash64",
) -> DataFrame:
    """Keep ~percentage% of rows, deterministically by key hash.

    ``priority_col`` (sampling_priority): per-row percentage override; NULL
    falls back to the configured percentage, 0 always drops, 100 always keeps.
    """
    if priority_col is None:
        return df.filter(sample_predicate(F.col(key_col), percentage, seed, hash_impl))
    pct = F.coalesce(F.col(priority_col).cast("double"), F.lit(float(percentage)))
    threshold = (pct / 100.0 * _NUM_BUCKETS).cast("long")
    return df.filter(_bucket(F.col(key_col), seed, hash_impl) < threshold)


# ---------------------------------------------------------------------------
# OTEP-235 consistent-probability modes (proportional / equalizing)
# ---------------------------------------------------------------------------
#
# Reference math (`pkg/sampling/probability.go:33-77`, `threshold.go:117-122`,
# `randomness.go:47-55`; mode selection `sampler_mode.go:390-460`):
# - Randomness R = least-significant 56 bits of the trace id (or an explicit
#   randomness source); Threshold T is a 56-bit REJECT count; sampled iff
#   T <= R.
# - ProbabilityToThresholdWithPrecision(p, precision) keeps `precision` hex
#   digits, auto-raising precision near the extremes via frexp exponents.
# - equalizing: fixed threshold from the configured percentage; an incoming
#   (already-sampled) threshold is never lowered (`sampler_mode.go:266-272`).
# - proportional: outgoing probability = incoming probability * ratio
#   (`sampler_mode.go:284-303`); underflow -> never sample.
# - sampling_priority (logs): a per-record minimum probability; 0/invalid ->
#   drop (`logsprocessor.go:240-274`).

_MAX_ADJ = 1 << 56  # MaxAdjustedCount
_NEVER_T = _MAX_ADJ  # NeverSampleThreshold: rejects every R in [0, 2^56)
_MIN_PROB = 1.0 / _MAX_ADJ


def prob_to_threshold_py(prob: float, precision: int = 4) -> int:
    """Config-time twin of ProbabilityToThresholdWithPrecision (exact Go
    semantics; used for the equalizing mode's fixed threshold)."""
    import math

    if precision == 0:
        precision = 14
    if not (_MIN_PROB <= prob <= 1.0):
        raise ValueError("probability out of range")
    if prob == 1.0:
        return 0
    _, exp_f = math.frexp(prob)
    _, exp_r = math.frexp(1.0 - prob)
    precision = min(14, max(precision + (-exp_f) // 4, precision + (-exp_r) // 4))
    scaled = int(math.floor(prob * float(_MAX_ADJ) + 0.5))
    threshold = _MAX_ADJ - scaled
    shift = 4 * (14 - precision)
    if shift:
        threshold += 1 << (shift - 1)
        threshold -= threshold % (1 << shift)
    return threshold


def otep235_threshold_col(prob: Column, precision: int = 4) -> Column:
    """ProbabilityToThresholdWithPrecision as a pure Column program.

    All arithmetic is 64-bit-safe (shift-rounding = add-half then subtract
    pmod; no variable bit-shifts, which Spark only takes as Python ints).
    Out-of-range probability -> NeverSampleThreshold (2^56), matching the
    proportional underflow rule.

    The program references its input ~100 times (precision chain + rounding
    branches). Catalyst INLINES projected expressions into every reference,
    so a non-trivial ``prob`` column blows the plan up ~100x (measured 11s
    vs 0.6s at sf0.1). Binding prob as a transform() lambda variable makes
    it a true per-row binding — evaluated once, referenced many times.
    """
    return F.get(
        F.transform(F.array(prob.cast("double")), lambda p: _otep235_threshold_body(p, precision)),
        0,
    )


def _otep235_threshold_body(prob: Column, precision: int) -> Column:
    def floor_log2(x: Column) -> Column:
        # exact despite log2 ULP noise (Spark's log2 = ln ratio): candidate
        # from round(log2), then correct by exact power-of-two comparison
        e0 = F.round(F.log2(x)).cast("int")
        p0 = F.pow(F.lit(2.0), e0.cast("double"))
        return (
            F.when(p0 <= x, F.when(p0 * 2.0 <= x, e0 + 1).otherwise(e0))
            .otherwise(e0 - 1)
            .cast("long")
        )

    exp_f = floor_log2(prob) + F.lit(1)
    exp_r = F.when(prob < 1.0, floor_log2(F.lit(1.0) - prob) + F.lit(1)).otherwise(F.lit(0))
    prec = F.least(
        F.lit(14),
        F.greatest(
            F.lit(precision) + F.floor((-exp_f) / F.lit(4)).cast("int"),
            F.lit(precision) + F.floor((-exp_r) / F.lit(4)).cast("int"),
        ),
    )
    scaled = F.floor(prob * F.lit(float(_MAX_ADJ)) + F.lit(0.5)).cast("long")
    thr_raw = F.lit(_MAX_ADJ).cast("long") - scaled
    # round to `prec` hex digits: ((x + half) >> shift) << shift with
    # shift = 4*(14-prec), branch-free — 2^shift via pow(2, .) is exact for
    # shift <= 52, and the shift itself becomes add + pmod (no variable
    # bit-shifts in Spark). Keeps the per-row node count small: this body
    # runs as an interpreted lambda (see otep235_threshold_col).
    shift_pow = F.pow(F.lit(2.0), ((F.lit(14) - prec) * 4).cast("double")).cast("long")
    half = (shift_pow / F.lit(2)).cast("long")  # 0 when shift == 0
    t = thr_raw + half
    out = t - F.pmod(t, shift_pow)
    return (
        F.when(prob >= 1.0, F.lit(0).cast("long"))
        .when(prob < F.lit(_MIN_PROB), F.lit(_NEVER_T).cast("long"))
        .otherwise(out)
    )


def trace_randomness_col(trace_id_hex: Column) -> Column:
    """R-value from a 32-hex-char trace id: last 14 hex chars = low 56 bits
    (`randomness.go:47-55`)."""
    return F.conv(F.substring(trace_id_hex, 19, 14), 16, 10).cast("long")


def tvalue_col(threshold: Column) -> Column:
    """56-bit threshold -> OTEP-235 T-value hex string (14 digits, trailing
    zeros trimmed; '0' = always sample)."""
    full = F.lpad(F.lower(F.hex(threshold)), 14, "0")
    trimmed = F.regexp_replace(full, "0+$", "")
    return F.when(threshold == 0, F.lit("0")).otherwise(
        F.when(trimmed == "", F.lit("0")).otherwise(trimmed)
    )


def tvalue_to_threshold_col(tvalue: Column) -> Column:
    """Incoming sampling.threshold attribute (1-14 hex chars, right-padded)."""
    return F.conv(F.rpad(tvalue, 14, "0"), 16, 10).cast("long")


def otep235_sample(
    df: DataFrame,
    percentage: float,
    mode: str = "proportional",
    *,
    randomness_col: Column | None = None,
    trace_id_col: str | None = None,
    incoming_threshold_col: str | None = None,
    priority_col: str | None = None,
    precision: int = 4,
    threshold_out: str | None = "sampling_threshold",
) -> DataFrame:
    """OTEP-235 consistent-probability sampler (proportional / equalizing).

    One vectorized filter expression — no shuffle, no UDF; scales linearly
    with input and is deterministic under repartitioning. The outgoing
    threshold T-value is emitted as ``threshold_out`` (the analog of the
    reference rewriting attributes["sampling.threshold"]).
    """
    if mode not in ("proportional", "equalizing"):
        raise ValueError(f"unknown OTEP-235 mode {mode!r}")
    if percentage <= 0:
        out = df.filter(F.lit(False))
        return out.withColumn(threshold_out, F.lit(None).cast("string")) if threshold_out else out

    ratio = max(percentage / 100.0, _MIN_PROB)
    if randomness_col is None:
        if trace_id_col is None:
            raise ValueError("need randomness_col or trace_id_col")
        randomness_col = trace_randomness_col(F.col(trace_id_col))

    if incoming_threshold_col is not None:
        t_in = F.col(incoming_threshold_col).cast("long")
    else:
        t_in = F.lit(None).cast("long")

    if mode == "equalizing":
        fixed = prob_to_threshold_py(ratio, precision)
        # never lower an incoming threshold (sampler_mode.go:266-272)
        threshold = F.when(t_in.isNotNull() & (t_in > fixed), t_in).otherwise(F.lit(fixed))
    else:
        # no incoming threshold -> probability is the CONSTANT ratio: fold
        # at config time. Substituting a when-chain probability into the
        # threshold program replicates it into every of its ~100 references
        # (Catalyst inlines through CASE) — plan size blew up 4x until the
        # null branch was folded out here.
        const_thr = F.lit(prob_to_threshold_py(ratio, precision)).cast("long")
        if incoming_threshold_col is None:
            threshold = const_thr
        else:
            prob_in = (
                (F.lit(_MAX_ADJ).cast("long") - t_in)
                / F.lit(float(_MAX_ADJ))
                * F.lit(ratio)
            )
            threshold = F.when(t_in.isNull(), const_thr).otherwise(
                otep235_threshold_col(prob_in, precision)
            )

    if priority_col is not None:
        # logs: the priority attribute is a REQUEST to be sampled with at
        # least priority/100 probability; 0 -> drop (logsprocessor.go:240-274)
        pri = F.col(priority_col).cast("double")
        pri_prob = pri / 100.0
        th_pri = F.when(
            pri.isNull() | (pri_prob <= 0) | (pri_prob > 1.0) | (pri_prob < _MIN_PROB),
            F.lit(_NEVER_T).cast("long"),
        ).otherwise(otep235_threshold_col(pri_prob, precision))
        threshold = F.when(pri.isNull(), threshold).otherwise(
            F.when(th_pri == _NEVER_T, F.lit(_NEVER_T).cast("long"))
            .when(th_pri < threshold, th_pri)
            .otherwise(threshold)
        )

    out = df.filter(threshold <= randomness_col)
    if threshold_out:
        out = out.withColumn(threshold_out, tvalue_col(threshold))
    return out

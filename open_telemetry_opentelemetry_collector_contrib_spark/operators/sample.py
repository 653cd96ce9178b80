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


def sample_predicate(key: Column, percentage: float, seed: int = 22) -> Column:
    threshold = int(percentage / 100.0 * _NUM_BUCKETS)
    bucket = F.pmod(F.xxhash64(key.cast("string"), F.lit(seed)), F.lit(_NUM_BUCKETS))
    return bucket < threshold


def probabilistic_sample(
    df: DataFrame,
    key_col: str,
    percentage: float,
    seed: int = 22,
    priority_col: str | None = None,
) -> DataFrame:
    """Keep ~percentage% of rows, deterministically by key hash.

    ``priority_col`` (sampling_priority): per-row percentage override; NULL
    falls back to the configured percentage, 0 always drops, 100 always keeps.
    """
    if priority_col is None:
        return df.filter(sample_predicate(F.col(key_col), percentage, seed))
    pct = F.coalesce(F.col(priority_col).cast("double"), F.lit(float(percentage)))
    threshold = (pct / 100.0 * _NUM_BUCKETS).cast("long")
    bucket = F.pmod(F.xxhash64(F.col(key_col).cast("string"), F.lit(seed)), F.lit(_NUM_BUCKETS))
    return df.filter(bucket < threshold)

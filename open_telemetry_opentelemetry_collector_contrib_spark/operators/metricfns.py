"""transformprocessor metric-context functions as DataFrame operators.

The reference registers these as OTTL editors on the metric/datapoint
contexts (`processor/transformprocessor/internal/metrics/functions.go`);
each operates on the canonical denormalized datapoint frame (one row per
datapoint, metric metadata replicated — see `ottl/metric_context.py`).

Per-row mutators (``convert_sum_to_gauge``, ``convert_gauge_to_sum``,
``scale_metric``) are pure projections and are also statement-callable
through the OTTL compiler. Metric-APPENDING functions (``extract_sum_metric``,
``extract_count_metric``, ``convert_summary_*_val_to_sum``, ``copy_metric``)
return the NEW rows; the plan builder lowers the reference's
``Metrics().AppendEmpty()`` into a ``unionByName`` — on a cluster that is a
narrow concat of two scans (no shuffle), exactly the shape you want when the
source scan is shared and cached.

Scale notes: everything here except ``expo_buckets_to_explicit`` is
shuffle-free. That one ends in a single map-side-combined ``groupBy`` over
the datapoint keys — the same key the input was produced on, so at 100 TB
AQE coalesces it into the upstream exchange and no second shuffle appears.

Metric type / temporality enum ints follow pmetric (see
``ottl/metric_context.py`` METRIC_ENUMS).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GAUGE, SUM, HISTOGRAM, EXPO_HISTOGRAM, SUMMARY = 1, 2, 3, 4, 5
TEMPORALITY = {"unspecified": 0, "delta": 1, "cumulative": 2}


def _temporality(string_agg_temp: str) -> int:
    # `func_convert_gauge_to_sum.go:40-48`: unknown temporality is a
    # config-time error.
    try:
        return TEMPORALITY[string_agg_temp]
    except KeyError:
        raise ValueError(
            f"unknown aggregation temporality: {string_agg_temp}"
        ) from None


def convert_sum_to_gauge(
    df: DataFrame,
    type_col: str = "metric_type",
    temporality_col: str = "temporality",
    monotonic_col: str = "is_monotonic",
) -> DataFrame:
    """`func_convert_sum_to_gauge.go:25-36`: only Sum metrics change; the
    gauge carries no temporality/monotonicity (pmetric gauges have
    neither field, so the flattened columns reset to unspecified/false)."""
    is_sum = F.col(type_col) == SUM
    # one withColumns call: every update is resolved against the ORIGINAL
    # frame (sequential withColumn would see the already-flipped type)
    updates = {type_col: F.when(is_sum, F.lit(GAUGE)).otherwise(F.col(type_col))}
    if temporality_col in df.columns:
        updates[temporality_col] = F.when(is_sum, F.lit(0)).otherwise(
            F.col(temporality_col)
        )
    if monotonic_col in df.columns:
        updates[monotonic_col] = F.when(is_sum, F.lit(False)).otherwise(
            F.col(monotonic_col)
        )
    return df.withColumns(updates)


def convert_gauge_to_sum(
    df: DataFrame,
    string_agg_temp: str,
    monotonic: bool,
    type_col: str = "metric_type",
    temporality_col: str = "temporality",
    monotonic_col: str = "is_monotonic",
) -> DataFrame:
    """`func_convert_gauge_to_sum.go:52-66`: only Gauge metrics change."""
    temp = _temporality(string_agg_temp)
    is_gauge = F.col(type_col) == GAUGE
    return df.withColumns(
        {
            type_col: F.when(is_gauge, F.lit(SUM)).otherwise(F.col(type_col)),
            temporality_col: F.when(is_gauge, F.lit(temp)).otherwise(
                F.col(temporality_col)
                if temporality_col in df.columns
                else F.lit(0)
            ),
            monotonic_col: F.when(is_gauge, F.lit(monotonic)).otherwise(
                F.col(monotonic_col)
                if monotonic_col in df.columns
                else F.lit(False)
            ),
        }
    )


def _sum_count_base(
    df: DataFrame,
    suffix: str,
    monotonic: bool,
    name_col: str,
    type_col: str,
    temporality_col: str,
) -> DataFrame:
    # `func_extract_sum_metric.go:47-51` / `func_extract_count_metric.go`:
    # source must be histogram / expo histogram / summary; summaries have no
    # temporality field — getAggregationTemporality treats them as
    # cumulative (`func_extract_sum_metric.go` getAggregationTemporality).
    src_ok = F.col(type_col).isin(HISTOGRAM, EXPO_HISTOGRAM, SUMMARY)
    agg_temp = F.when(
        F.col(type_col) == SUMMARY, F.lit(TEMPORALITY["cumulative"])
    ).otherwise(
        F.col(temporality_col) if temporality_col in df.columns else F.lit(0)
    )
    return df.filter(src_ok & (agg_temp != 0)).withColumns(
        {
            name_col: F.concat(F.col(name_col), F.lit(suffix)),
            type_col: F.lit(SUM),
            temporality_col: agg_temp,
            "is_monotonic": F.lit(monotonic),
        }
    )


def extract_sum_metric(
    df: DataFrame,
    monotonic: bool,
    sum_col: str = "hsum",
    name_col: str = "metric_name",
    type_col: str = "metric_type",
    temporality_col: str = "temporality",
    value_col: str = "value_double",
) -> DataFrame:
    """`func_extract_sum_metric.go:58-96`: NEW `<name>_sum` Sum metric from
    the sum field of histogram/expo/summary datapoints. Histogram points
    without a sum (HasSum false — null here) emit nothing; the summary sum
    field is required so summaries always emit. Returns only the new rows
    (the caller unions)."""
    out = _sum_count_base(
        df, "_sum", monotonic, name_col, type_col, temporality_col
    )
    # HasSum gate: histogram points without a sum emit nothing; summary
    # sums are required by pdata so summaries always pass.
    out = out.filter(F.col(sum_col).isNotNull())
    return out.withColumn(value_col, F.col(sum_col).cast("double"))


def extract_count_metric(
    df: DataFrame,
    monotonic: bool,
    count_col: str = "cnt",
    name_col: str = "metric_name",
    type_col: str = "metric_type",
    temporality_col: str = "temporality",
    unit_col: str = "unit",
    value_col: str = "value_int",
) -> DataFrame:
    """`func_extract_count_metric.go:55-99`: NEW `<name>_count` Sum metric
    (unit "1" — the source unit does not apply to a count) from the count
    field; count is required on all three source types so every datapoint
    emits."""
    out = _sum_count_base(
        df, "_count", monotonic, name_col, type_col, temporality_col
    )
    if unit_col in df.columns:
        out = out.withColumn(unit_col, F.lit("1"))
    return out.withColumn(value_col, F.col(count_col).cast("long"))


def convert_summary_sum_val_to_sum(
    df: DataFrame,
    string_agg_temp: str,
    monotonic: bool,
    sum_col: str = "hsum",
    name_col: str = "metric_name",
    type_col: str = "metric_type",
    temporality_col: str = "temporality",
    value_col: str = "value_double",
) -> DataFrame:
    """`func_convert_summary_sum_val_to_sum.go:45-70`: NEW `<name>_sum` Sum
    metric with the CONFIGURED temporality (unlike extract_sum_metric,
    which inherits) from every summary datapoint. Returns the new rows."""
    temp = _temporality(string_agg_temp)
    return (
        df.filter(F.col(type_col) == SUMMARY)
        .withColumn(name_col, F.concat(F.col(name_col), F.lit("_sum")))
        .withColumn(type_col, F.lit(SUM))
        .withColumn(temporality_col, F.lit(temp))
        .withColumn("is_monotonic", F.lit(monotonic))
        .withColumn(value_col, F.col(sum_col).cast("double"))
    )


def convert_summary_count_val_to_sum(
    df: DataFrame,
    string_agg_temp: str,
    monotonic: bool,
    count_col: str = "cnt",
    name_col: str = "metric_name",
    type_col: str = "metric_type",
    temporality_col: str = "temporality",
    value_col: str = "value_int",
) -> DataFrame:
    """`func_convert_summary_count_val_to_sum.go:45-70`: `<name>_count`
    twin of the above (keeps the source unit, unlike
    extract_count_metric)."""
    temp = _temporality(string_agg_temp)
    return (
        df.filter(F.col(type_col) == SUMMARY)
        .withColumn(name_col, F.concat(F.col(name_col), F.lit("_count")))
        .withColumn(type_col, F.lit(SUM))
        .withColumn(temporality_col, F.lit(temp))
        .withColumn("is_monotonic", F.lit(monotonic))
        .withColumn(value_col, F.col(count_col).cast("long"))
    )


def copy_metric(
    df: DataFrame,
    name: str | None = None,
    description: str | None = None,
    unit: str | None = None,
    name_col: str = "metric_name",
    description_col: str = "description",
    unit_col: str = "unit",
) -> DataFrame:
    """`func_copy_metric.go:38-63`: duplicate every metric, optionally
    overriding name/description/unit on the copy. Returns the copies."""
    out = df
    for value, col in (
        (name, name_col),
        (description, description_col),
        (unit, unit_col),
    ):
        if value is not None:
            out = out.withColumn(col, F.lit(value))
    return out


def scale_metric(
    df: DataFrame,
    multiplier: float,
    unit: str | None = None,
    type_col: str = "metric_type",
    value_double_col: str | None = "value_double",
    sum_col: str | None = "hsum",
    min_col: str | None = None,
    max_col: str | None = None,
    bounds_col: str | None = None,
    unit_col: str = "unit",
) -> DataFrame:
    """`func_scale.go:44-100`: multiply gauge/sum double values and
    histogram sum/min/max/explicit_bounds by the multiplier (bucket COUNTS
    are counts — never scaled); exponential histograms and summaries are
    rejected by the reference ("...data type is not supported") and pass
    through unchanged here with the same columns untouched."""
    scalable = F.col(type_col).isin(GAUGE, SUM)
    hist = F.col(type_col) == HISTOGRAM
    out = df
    if value_double_col and value_double_col in df.columns:
        out = out.withColumn(
            value_double_col,
            F.when(
                scalable, F.col(value_double_col) * F.lit(multiplier)
            ).otherwise(F.col(value_double_col)),
        )
    for c in (sum_col, min_col, max_col):
        if c and c in df.columns:
            out = out.withColumn(
                c,
                F.when(hist, F.col(c) * F.lit(multiplier)).otherwise(F.col(c)),
            )
    if bounds_col and bounds_col in df.columns:
        out = out.withColumn(
            bounds_col,
            F.when(
                hist,
                F.transform(F.col(bounds_col), lambda b: b * F.lit(multiplier)),
            ).otherwise(F.col(bounds_col)),
        )
    if unit is not None:
        out = out.withColumn(unit_col, F.lit(unit))
    return out


# ---------------------------------------------------------------------------
# convert_exponential_histogram_to_histogram
# ---------------------------------------------------------------------------


def expo_buckets_to_explicit(
    df: DataFrame,
    boundaries: list[float],
    distribution: str = "upper",
    keys: list[str] | None = None,
    scale_col: str = "scale",
    idx_col: str = "idx",
    cnt_col: str = "cnt",
    zero_count_col: str | None = None,
) -> DataFrame:
    """convert_exponential_histogram_to_histogram
    (`func_convert_exponential_hist_to_explicit_hist.go:56-124` +
    calculateBucketCounts 108-146) over LONG-format positive buckets: one
    input row per (datapoint keys, bucket index ``idx``) with ``cnt``
    occupants at exponential ``scale``; output one row per (keys,
    bucket_idx in 0..len(boundaries)-1) with the re-bucketed count —
    faithful to the reference's convention that the conversion produces
    exactly len(boundaries) buckets with the last doubling as overflow.

    Distribution algorithms: ``upper`` (upperAlgorithm:151-177),
    ``midpoint`` (183-204), ``uniform`` (207-255). ``random`` (258+) draws
    from an unseeded RNG in the reference — inherently non-portable, so it
    is rejected here (documented divergence; ``uniform`` is its
    deterministic analog).

    All bucket math is scalar-column arithmetic against the literal
    boundary list — whole-stage-codegen'd, no UDF — followed by ONE
    map-side-combined groupBy on the datapoint keys (per-j conditional
    sums, so the output is dense without a join)."""
    if distribution not in ("upper", "midpoint", "uniform"):
        raise ValueError(
            f"invalid distribution algorithm: {distribution}, must be one "
            "of [upper, midpoint, uniform] (random is non-deterministic "
            "in the reference and unsupported here)"
        )
    if not boundaries:
        raise ValueError("explicit bounds cannot be empty")
    keys = keys or ["series", "window_id"]
    nb = len(boundaries)

    # bucket bounds: factor = ln2 * 2^-scale; upper = e^((idx+1)*factor)
    factor = F.lit(math.log(2)) * F.pow(F.lit(2.0), -F.col(scale_col))
    lower = F.exp(F.col(idx_col) * factor)
    upper = F.exp((F.col(idx_col) + 1) * factor)

    overflow = lower > F.lit(boundaries[-1])
    # exact fit: first j in 1..nb-1 with lower > b[j-1] and upper <= b[j]
    fit = F.lit(None).cast("int")
    for j in range(nb - 1, 0, -1):
        fit = F.when(
            (lower > F.lit(boundaries[j - 1])) & (upper <= F.lit(boundaries[j])),
            F.lit(j - 1),
        ).otherwise(fit)

    cnt = F.col(cnt_col).cast("long")

    if distribution in ("upper", "midpoint"):
        probe = (upper + lower) / 2 if distribution == "midpoint" else upper
        # first j with probe <= b[j], else the overflow bucket
        alg = F.lit(nb - 1)
        for j in range(nb - 1, -1, -1):
            if distribution == "midpoint":
                # midpointAlgorithm lands in j-1 for j>0 (value below b[j]
                # belongs to the bucket bounded above by b[j]... the
                # reference indexes down by one except at j==0)
                target = max(j - 1, 0)
            else:
                target = j
            alg = F.when(probe <= F.lit(boundaries[j]), F.lit(target)).otherwise(
                alg
            )
        dest = F.when(overflow, F.lit(nb - 1)).otherwise(F.coalesce(fit, alg))
        contribs = [
            F.sum(F.when(dest == j, cnt).otherwise(F.lit(0)))
            for j in range(nb)
        ]
    else:  # uniform
        # start: first j with lower <= b[j]; end: first j >= start with
        # upper <= b[j], clamped to nb-1 (uniformAlgorithm:212-236)
        start = F.lit(nb)
        for j in range(nb - 1, -1, -1):
            start = F.when(lower <= F.lit(boundaries[j]), F.lit(j)).otherwise(
                start
            )
        end = F.lit(nb)
        for j in range(nb - 1, -1, -1):
            end = F.when(
                (F.lit(j) >= start) & (upper <= F.lit(boundaries[j])), F.lit(j)
            ).otherwise(end)
        end = F.least(end, F.lit(nb - 1))
        span = (end - start + 1).cast("long")
        per = F.floor(cnt / span)
        rem = cnt % span
        single = F.when(overflow, F.lit(nb - 1)).otherwise(fit)

        def contrib(j: int) -> Column:
            spread = F.when(
                (F.lit(j) >= start) & (F.lit(j) <= end),
                per + F.when(F.lit(j) - start < rem, 1).otherwise(0),
            ).otherwise(F.lit(0))
            point = F.when(
                end > start, spread
            ).otherwise(F.when(start == j, cnt).otherwise(F.lit(0)))
            return F.when(single.isNotNull(), F.when(single == j, cnt).otherwise(F.lit(0))).otherwise(point)

        contribs = [F.sum(contrib(j)) for j in range(nb)]

    if zero_count_col and zero_count_col in df.columns and boundaries[0] == 0:
        # zero population lands in bucket 0 only when the boundary list
        # starts at 0 (calculateBucketCounts:116-118); replicated per row,
        # so max() recovers the datapoint-level value. A zero-only
        # datapoint must still carry one long-format row (cnt=0) to appear.
        contribs[0] = contribs[0] + F.max(F.col(zero_count_col).cast("long"))

    wide = df.groupBy(*keys).agg(
        *[c.alias(f"_b{j}") for j, c in enumerate(contribs)]
    )
    # stack to long (keys, bucket_idx, bucket_count) without a join
    pairs = F.array(
        *[
            F.struct(
                F.lit(j).cast("long").alias("bucket_idx"),
                F.col(f"_b{j}").cast("long").alias("bucket_count"),
            )
            for j in range(nb)
        ]
    )
    return (
        wide.select(*keys, F.explode(pairs).alias("_p"))
        .select(*keys, "_p.bucket_idx", "_p.bucket_count")
    )

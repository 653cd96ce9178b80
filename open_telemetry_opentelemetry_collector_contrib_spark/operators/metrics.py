"""Metric-stream processors: delta<->cumulative, rate, interval, spanmetrics.

All are per-stream ordered operations; a "stream identity" is the set of key
columns (metric name + attributes). The reference keeps per-stream state in
memory with staleness eviction; batch Spark replaces state with window
functions over ``Window.partitionBy(stream).orderBy(ts)`` — the shuffle is on
the stream key, which is exactly how the reference shards streams across
workers (`processor/groupbytraceprocessor/processor.go:27-31`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .aggregate import tumbling_window_id


def _stream_window(keys: list[str], ts_col: str, order_cols: list[str] | None = None):
    return Window.partitionBy(*keys).orderBy(ts_col, *(order_cols or []))


def delta_to_cumulative(
    df: DataFrame, keys: list[str], value_col: str, ts_col: str = "ts",
    out_col: str = "cumulative", order_cols: list[str] | None = None,
) -> DataFrame:
    """Running sum per stream (`processor/deltatocumulativeprocessor/config.go:19-31`).

    max_stale eviction is a streaming-memory concern; in batch the window is
    unbounded-preceding (equivalent to never-evicted state).
    """
    w = _stream_window(keys, ts_col, order_cols).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out_col, F.sum(value_col).over(w))


def expo_cumulative(
    df: DataFrame,
    series_cols: list[str],
    window_col: str = "window_id",
    scale_col: str = "scale",
    idx_col: str = "idx",
    cnt_col: str = "cnt",
) -> DataFrame:
    """deltatocumulative for EXPONENTIAL histograms with scale
    reconciliation (`deltatocumulativeprocessor/internal/data/expo/scale.go:
    43-90` Downscale/Collapse + `merge.go:12-37` Merge): the cumulative
    histogram at time t is the bucket-wise sum of all deltas <= t, each
    downscaled to the running MINIMUM scale seen so far (upscaling would
    fabricate distribution detail — the reference panics on it; downscale
    collapses bucket pairs, absolute index i -> floor(i/2) per scale step,
    exactly the offset-evening + halving Collapse performs).

    Input: one row per (series, window, scale, bucket idx, count) delta.
    Output: one row per (series, window, target scale, rescaled idx,
    cumulative count).

    floor-division of possibly-negative indices is expressed as
    (i - pmod(i, 2^d)) / 2^d — engine-portable (SQL integer division
    truncates toward zero, which is wrong for negative bucket indices).

    Scale note: this batch form (per-series range join onto the output
    grid) is the oracle-checkable twin; the unbounded-input path is the
    stateful streaming merge (same applyInPandasWithState pattern as the
    numeric d2c in streaming/stateful.py), where each state update merges
    one delta into the running buckets in O(buckets).
    """
    # pre-aggregate min(scale) per (series, window) BEFORE the running-min
    # window: the contract is one scale per (series, window), but if input
    # violates it this degrades deterministically (min wins) instead of the
    # ROWS-frame running min depending on same-window tie order and
    # .distinct() emitting two target_scale rows for one window. The
    # groupBy is map-side combined and replaces the former distinct().
    per_window = df.groupBy(*series_cols, window_col).agg(
        F.min(scale_col).alias("_win_scale")
    )
    targets = per_window.withColumn(
        "target_scale",
        F.min("_win_scale").over(
            Window.partitionBy(*series_cols)
            .orderBy(window_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).select(*series_cols, window_col, "target_scale")

    d = df.select(
        *[F.col(c).alias(f"d_{c}") for c in series_cols],
        F.col(window_col).alias("d_window"),
        F.col(scale_col).alias("d_scale"),
        F.col(idx_col).alias("d_idx"),
        F.col(cnt_col).alias("d_cnt"),
    )
    cond = F.lit(True)
    for c in series_cols:
        cond = cond & (F.col(f"d_{c}") == F.col(c))
    cond = cond & (F.col("d_window") <= F.col(window_col))
    joined = targets.join(d, cond)
    # downscale d_idx from d_scale to target_scale (d_scale >= target by
    # construction: target is the running min over <= t)
    p = F.pow(F.lit(2.0), (F.col("d_scale") - F.col("target_scale"))).cast("long")
    idx_new = ((F.col("d_idx") - F.pmod(F.col("d_idx"), p)) / p).cast("long")
    return (
        joined.withColumn("r_idx", idx_new)
        .groupBy(*series_cols, window_col, "target_scale", "r_idx")
        .agg(F.sum("d_cnt").cast("bigint").alias("cum_cnt"))
        .select(
            *series_cols,
            F.col(window_col).cast("bigint").alias(window_col),
            F.col("target_scale").cast("bigint").alias("scale"),
            F.col("r_idx").cast("bigint").alias("idx"),
            "cum_cnt",
        )
    )


def histogram_cumulative_to_delta(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    count_col: str = "cnt",
    sum_col: str = "hsum",
    buckets_col: str = "buckets",
    order_cols: list[str] | None = None,
    first_point: str = "drop",
) -> DataFrame:
    """cumulativetodelta for explicit-bucket HISTOGRAM datapoints
    (`processor/cumulativetodeltaprocessor/processor.go:160-201` +
    `internal/tracking/tracker.go:150-173`): per stream, delta = point
    minus previous point, element-wise over (count, sum, bucket counts).
    Reference edge semantics preserved exactly:

    - count RESET (count < previous count): the point's raw cumulative
      values are emitted unchanged (tracker.go: "Calculate deltas unless
      histogram count was reset" — the un-subtracted clone flows out);
    - bucket-arity change vs the previous point: the point is DROPPED
      (tracker.go:158-160 valid=false -> processor RemoveIf);
    - NaN sum carries the previous sum forward (tracker.go:153-156) —
      applied only when the sum column is floating-point;
    - first point per stream: 'drop' (InitialValueAuto with unknown
      start) or 'keep' (InitialValueKeep emits the clone).

    One shuffle on the stream key; bucket math is zip_with (JVM-side).
    """
    from pyspark.sql import types as T

    w = _stream_window(keys, ts_col, order_cols)
    floating = isinstance(df.schema[sum_col].dataType, (T.DoubleType, T.FloatType))
    # The reference stores the CARRIED sum in state (a NaN point inherits
    # the previous sum and that inherited value is what the next point
    # diffs against) — so "previous sum" is the last non-NaN sum, not the
    # raw lag.
    sum_clean = (
        F.when(F.isnan(F.col(sum_col)), F.lit(None)).otherwise(F.col(sum_col))
        if floating
        else F.col(sum_col)
    )
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    df2 = (
        df.withColumn("_pc", F.lag(count_col).over(w))
        .withColumn("_ps", F.last(sum_clean, ignorenulls=True).over(w_prev))
        .withColumn("_pb", F.lag(buckets_col).over(w))
    )
    is_first = F.col("_pc").isNull()
    cur_sum = F.coalesce(sum_clean, F.col("_ps")) if floating else F.col(sum_col)
    raw = is_first | (F.col(count_col) < F.col("_pc"))  # first/reset: clone
    out = (
        df2.withColumn(
            "delta_cnt",
            F.when(raw, F.col(count_col)).otherwise(F.col(count_col) - F.col("_pc")),
        )
        .withColumn(
            "delta_sum", F.when(raw, cur_sum).otherwise(cur_sum - F.col("_ps"))
        )
        .withColumn(
            "delta_buckets",
            F.when(raw, F.col(buckets_col)).otherwise(
                F.zip_with(
                    F.col(buckets_col), F.col("_pb"), lambda x, y: x - y
                )
            ),
        )
        .filter(is_first | (F.size(buckets_col) == F.size("_pb")))
    )
    if first_point == "drop":
        out = out.filter(~is_first)
    elif first_point != "keep":
        raise ValueError(f"unknown first_point {first_point!r}")
    return out.drop("_pc", "_ps", "_pb")


def histogram_delta_to_cumulative(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    count_col: str = "cnt",
    sum_col: str = "hsum",
    buckets_col: str = "buckets",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """deltatocumulative for explicit-bucket HISTOGRAM datapoints
    (`deltatocumulativeprocessor/internal/data/add.go:35-41`: Add sums
    count, sum, and bucket counts element-wise): running bucket-wise sums
    per stream.

    Long output format — one row per (stream, point, bucket_idx) with the
    cumulative count/sum replicated — keeps every compared column scalar
    (hash-portable) AND widens the shuffle key to (stream, bucket_idx):
    at 100 TB the state is sharded finer than per-series, so a hot series
    does not pin one task the way an array-typed per-series window would.
    """
    order = order_cols or []
    long = df.select(
        *keys,
        ts_col,
        *order,
        count_col,
        sum_col,
        F.posexplode(buckets_col).alias("bucket_idx", "_b"),
    )
    w = (
        Window.partitionBy(*keys, "bucket_idx")
        .orderBy(ts_col, *order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        long.withColumn("cum_cnt", F.sum(count_col).over(w))
        .withColumn("cum_sum", F.sum(sum_col).over(w))
        .withColumn("cum_bucket", F.sum("_b").over(w))
        .drop("_b", count_col, sum_col)
    )


def cumulative_to_delta(
    df: DataFrame, keys: list[str], value_col: str, ts_col: str = "ts",
    out_col: str = "delta", first_point: str = "drop",
    order_cols: list[str] | None = None, monotonic: bool = False,
) -> DataFrame:
    """value - lag(value) per stream
    (`processor/cumulativetodeltaprocessor/config.go:17-29`).

    first_point: 'drop' (reference auto default for unknown start) drops each
    stream's first point; 'keep' emits it as its own value.

    monotonic=True applies the reference's reset detection for monotonic
    SUMS (`tracking/tracker.go:176-196`: value < previous => valid=false,
    the point is DROPPED — not emitted raw as histograms are — while the
    reset point still becomes the stored previous, so the next point
    diffs against it). The default False is the gauge-style pass-through
    used by the flagship driver query (documented divergence there).
    """
    w = _stream_window(keys, ts_col, order_cols)
    lag = F.lag(value_col).over(w)
    out = df.withColumn(out_col, F.col(value_col) - lag)
    if monotonic:
        # lag (the stored previous) is unaffected: it reads the raw input
        # column, so a dropped reset point still becomes the next lag
        out = out.filter(F.col(out_col).isNull() | (F.col(out_col) >= 0))
    if first_point == "drop":
        return out.filter(F.col(out_col).isNotNull())
    if first_point == "keep":
        return out.withColumn(out_col, F.coalesce(F.col(out_col), F.col(value_col)))
    raise ValueError(f"unknown first_point {first_point!r}")


def delta_to_rate(
    df: DataFrame, keys: list[str], value_col: str, ts_col: str = "ts",
    out_col: str = "rate", order_cols: list[str] | None = None,
) -> DataFrame:
    """delta / collection interval (`processor/deltatorateprocessor/`)."""
    w = _stream_window(keys, ts_col, order_cols)
    dt = F.unix_timestamp(F.col(ts_col)) - F.lag(F.unix_timestamp(F.col(ts_col))).over(w)
    return df.withColumn(
        out_col, F.when(dt > 0, F.col(value_col).cast("double") / dt)
    ).filter(F.col(out_col).isNotNull())


def interval_aggregate(
    df: DataFrame, keys: list[str], value_col: str, interval_s: int,
    ts_col: str = "ts", order_cols: list[str] | None = None,
) -> DataFrame:
    """intervalprocessor: last value per stream per emission interval
    (`processor/intervalprocessor/config.go:18-31`)."""
    order = F.struct(F.col(ts_col), *[F.col(c) for c in (order_cols or [])])
    return (
        df.withColumn("window_id", tumbling_window_id(F.col(ts_col), interval_s))
        .groupBy("window_id", *keys)
        .agg(F.max_by(F.col(value_col), order).alias(value_col))
    )


def interval_process(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    interval_s: int,
    ts_col: str = "ts",
    metric_type_col: str = "metric_type",
    pass_through_gauge: bool = False,
    pass_through_summary: bool = False,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """intervalprocessor with the ``pass_through`` config
    (`intervalprocessor/config.go:26-33`, `processor.go:107-121`): gauge
    (pmetric type 1) and/or summary (type 5) datapoints bypass the
    interval aggregation UNCHANGED when flagged — they flow row-for-row —
    while everything else last-values per (stream, interval) exactly as
    interval_aggregate. Output grain: (window_id, keys, value).

    Scale: the passthrough side is a pure filter (no shuffle at all);
    only the aggregated side pays the stream-key exchange.
    """
    GAUGE, SUMMARY = 1, 5
    mask = F.lit(False)
    if pass_through_gauge:
        mask = mask | (F.col(metric_type_col) == GAUGE)
    if pass_through_summary:
        mask = mask | (F.col(metric_type_col) == SUMMARY)
    agg = interval_aggregate(
        df.filter(~mask), keys, value_col, interval_s, ts_col, order_cols
    )
    passed = df.filter(mask).select(
        tumbling_window_id(F.col(ts_col), interval_s).alias("window_id"),
        *keys,
        value_col,
    )
    return agg.select("window_id", *keys, value_col).unionByName(passed)


# ---------------------------------------------------------------------------
# spanmetrics connector: calls + duration histogram per dimension set
# (`connector/spanmetricsconnector/config.go:35-70`, aggregation loop
# `connector.go:370-458`)
# ---------------------------------------------------------------------------

DEFAULT_BUCKETS_MS = [2, 4, 6, 8, 10, 50, 100, 200, 400, 800, 1000, 1400, 2000, 5000, 10000, 15000]


def explicit_bucket_index(value: Column, bounds: list[float]) -> Column:
    """Index of the first bucket bound >= value (len(bounds) = overflow)."""
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    return F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(value > b, F.lit(1)).otherwise(F.lit(0)),
    )


def exp_bucket_index_scale0(value: Column) -> Column:
    """Base-2 exponential bucket index at scale 0: floor(log2(v)) for v>=1,
    computed as bit-length-1 (length of the binary representation) — pure
    integer arithmetic, so engine-exact where float log2 would flip at
    power-of-two boundaries by one ulp. v<1 -> bucket 0."""
    v = value.cast("bigint")
    return F.when(v >= 1, F.length(F.bin(v)) - 1).otherwise(F.lit(0)).cast("int")


def span_metrics_exponential(
    df: DataFrame,
    dims: list[str],
    duration_col: str,
    window_s: int = 3600,
    ts_col: str = "ts",
) -> DataFrame:
    """spanmetrics with exponential-histogram buckets
    (`connector/spanmetricsconnector/config.go:35-70` histogram.exponential;
    bucket conversion `connector.go:170,194`). Long format: one row per
    (window, dims, bucket_idx) with its count — the sparse representation
    exponential histograms use."""
    idx = exp_bucket_index_scale0(F.col(duration_col))
    return (
        df.withColumn("window_id", tumbling_window_id(F.col(ts_col), window_s))
        .withColumn("bucket_idx", idx)
        .groupBy("window_id", *dims, "bucket_idx")
        .agg(F.count(F.lit(1)).alias("bucket_count"))
    )


def span_metrics(
    df: DataFrame,
    dims: list[str],
    duration_col: str,
    window_s: int = 3600,
    ts_col: str = "ts",
    buckets: list[float] | None = None,
    exemplars: int | None = None,
    exemplar_id_col: str = "span_id",
) -> DataFrame:
    """Per (window, dims): call count, duration sum/min/max, explicit-bucket
    histogram as an array of counters (delta temporality).

    ``exemplars=K`` attaches the K slowest spans per series as
    (value, id) structs — the spanmetrics exemplar feature
    (`connector/spanmetricsconnector/config.go` exemplars.enabled /
    max_per_data_point) with a DETERMINISTIC slowest-first selection
    instead of the reference's arrival sampling (oracle-checkable; same
    cardinality bound). Selection is collect+sort+slice per group: K is
    small and groups are window-bounded; an unbounded-group corpus should
    use a rank-window pass instead.
    """
    bounds = buckets or DEFAULT_BUCKETS_MS
    n = len(bounds) + 1
    # one scalar bucket index per row, then n conditional sums — no per-row
    # array materialization (a one-hot array per row costs n cells x rows of
    # allocation before the partial agg; conditional sums fold map-side)
    idx = explicit_bucket_index(F.col(duration_col).cast("double"), bounds)
    return (
        df.withColumn("window_id", tumbling_window_id(F.col(ts_col), window_s))
        .withColumn("__bucket_idx", idx)
        .groupBy("window_id", *dims)
        .agg(
            F.count(F.lit(1)).alias("calls"),
            F.sum(F.col(duration_col).cast("double")).alias("duration_sum"),
            F.min(F.col(duration_col).cast("double")).alias("duration_min"),
            F.max(F.col(duration_col).cast("double")).alias("duration_max"),
            F.array(*[
                F.sum(
                    F.when(F.col("__bucket_idx") == i, F.lit(1)).otherwise(F.lit(0))
                ).alias(f"b{i}")
                for i in range(n)
            ]).alias("bucket_counts"),
            *(
                [
                    F.slice(
                        F.reverse(
                            F.array_sort(
                                F.collect_list(
                                    F.when(
                                        F.col(duration_col).isNotNull(),
                                        F.struct(
                                            F.col(duration_col).cast("double").alias("value"),
                                            F.col(exemplar_id_col).alias("id"),
                                        ),
                                    )
                                )
                            )
                        ),
                        1,
                        exemplars,
                    ).alias("exemplars")
                ]
                if exemplars
                else []
            ),
        )
    )

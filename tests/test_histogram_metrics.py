"""Explicit-bucket histogram delta<->cumulative: reference edge semantics
(`cumulativetodeltaprocessor/internal/tracking/tracker.go:150-173`,
`processor.go:160-201`; `deltatocumulativeprocessor/internal/data/
add.go:35-41`)."""

from __future__ import annotations


from pyspark.sql import functions as F

from open_telemetry_opentelemetry_collector_contrib_spark.operators import metrics as m


def _hist_df(spark, rows):
    return spark.createDataFrame(
        rows, "series string, window_id long, cnt long, hsum double, buckets array<long>"
    )


def test_histogram_c2d_subtracts_elementwise(spark):
    df = _hist_df(
        spark,
        [
            ("s", 1, 10, 100.0, [4, 6]),
            ("s", 2, 15, 180.0, [6, 9]),
            ("s", 3, 21, 300.0, [9, 12]),
        ],
    )
    out = m.histogram_cumulative_to_delta(
        df, ["series"], ts_col="window_id"
    ).orderBy("window_id").collect()
    # first point dropped (InitialValueAuto)
    assert [r.window_id for r in out] == [2, 3]
    assert (out[0].delta_cnt, out[0].delta_sum, out[0].delta_buckets) == (5, 80.0, [2, 3])
    assert (out[1].delta_cnt, out[1].delta_sum, out[1].delta_buckets) == (6, 120.0, [3, 3])


def test_histogram_c2d_reset_emits_raw(spark):
    """count < previous count = producer restart: the cumulative point
    flows out un-subtracted (tracker.go: 'Calculate deltas unless
    histogram count was reset')."""
    df = _hist_df(
        spark,
        [("s", 1, 10, 100.0, [4, 6]), ("s", 2, 3, 30.0, [1, 2])],
    )
    out = m.histogram_cumulative_to_delta(df, ["series"], ts_col="window_id").collect()
    assert len(out) == 1
    assert (out[0].delta_cnt, out[0].delta_sum, out[0].delta_buckets) == (3, 30.0, [1, 2])


def test_histogram_c2d_arity_change_drops_point(spark):
    """A bucket-count change vs the previous point invalidates the delta
    (tracker.go:158-160) -> the point is removed, and the NEXT point
    diffs against it (it became the stored previous)."""
    df = _hist_df(
        spark,
        [
            ("s", 1, 10, 100.0, [4, 6]),
            ("s", 2, 15, 180.0, [6, 5, 4]),  # arity 3 vs 2: dropped
            ("s", 3, 21, 300.0, [9, 7, 5]),
        ],
    )
    out = m.histogram_cumulative_to_delta(
        df, ["series"], ts_col="window_id"
    ).orderBy("window_id").collect()
    assert [r.window_id for r in out] == [3]
    assert out[0].delta_buckets == [3, 2, 1]


def test_histogram_c2d_nan_sum_carries_prev(spark):
    """NaN sum inherits the previous sum (tracker.go:153-156) -> the
    emitted delta_sum is 0 and the carried value feeds the next diff."""
    df = _hist_df(
        spark,
        [
            ("s", 1, 10, 100.0, [10]),
            ("s", 2, 15, float("nan"), [15]),
            ("s", 3, 21, 300.0, [21]),
        ],
    )
    out = m.histogram_cumulative_to_delta(
        df, ["series"], ts_col="window_id"
    ).orderBy("window_id").collect()
    assert out[0].delta_sum == 0.0
    # the stored previous is the CARRIED sum (100), so window 3 diffs
    # against it exactly as the reference's state does
    assert out[1].delta_sum == 200.0


def test_histogram_c2d_first_point_keep(spark):
    df = _hist_df(spark, [("s", 1, 10, 100.0, [4, 6])])
    out = m.histogram_cumulative_to_delta(
        df, ["series"], ts_col="window_id", first_point="keep"
    ).collect()
    assert len(out) == 1 and out[0].delta_cnt == 10 and out[0].delta_buckets == [4, 6]


def test_histogram_d2c_running_elementwise_sums(spark):
    df = _hist_df(
        spark,
        [
            ("s", 1, 5, 50.0, [2, 3]),
            ("s", 2, 6, 70.0, [2, 4]),
            ("t", 1, 1, 10.0, [1, 0]),
        ],
    )
    out = m.histogram_delta_to_cumulative(df, ["series"], ts_col="window_id")
    got = {
        (r.series, r.window_id, r.bucket_idx): (r.cum_cnt, r.cum_sum, r.cum_bucket)
        for r in out.collect()
    }
    assert got[("s", 1, 0)] == (5, 50.0, 2)
    assert got[("s", 2, 0)] == (11, 120.0, 4)
    assert got[("s", 2, 1)] == (11, 120.0, 7)
    assert got[("t", 1, 1)] == (1, 10.0, 0)


def test_numeric_c2d_monotonic_drops_resets(spark):
    """Reference reset detection for monotonic sums
    (tracker.go:176-196): a point below its predecessor is dropped
    (valid=false), yet still becomes the stored previous — the next
    point diffs against the reset value."""
    df = spark.createDataFrame(
        [("s", 1, 10), ("s", 2, 25), ("s", 3, 4), ("s", 4, 9)],
        "series string, t long, v long",
    )
    out = m.cumulative_to_delta(
        df, ["series"], "v", ts_col="t", monotonic=True
    ).orderBy("t").collect()
    assert [(r.t, r.delta) for r in out] == [(2, 15), (4, 5)]
    # default (gauge-style) keeps the negative delta
    out2 = m.cumulative_to_delta(df, ["series"], "v", ts_col="t").orderBy("t").collect()
    assert [(r.t, r.delta) for r in out2] == [(2, 15), (3, -21), (4, 5)]

"""transformprocessor metric-context functions: parity against a direct
Python port of the reference algorithms
(`processor/transformprocessor/internal/metrics/func_*.go`)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from open_telemetry_opentelemetry_collector_contrib_spark.operators import (
    metricfns as mf,
)

BOUNDS = [0.0, 1.0, 2.5, 5.0, 10.0]


# ---------------------------------------------------------------------------
# Python port of calculateBucketCounts + the three deterministic
# distribution algorithms (func_convert_exponential_hist_to_explicit_hist
# .go:108-255), used as the oracle for the Column program.
# ---------------------------------------------------------------------------


def _upper_alg(count, upper, lower, bounds, dst):
    for j, b in enumerate(bounds):
        if upper <= b:
            dst[j] += count
            return
    dst[-1] += count


def _midpoint_alg(count, upper, lower, bounds, dst):
    mid = (upper + lower) / 2
    for j, b in enumerate(bounds):
        if mid <= b:
            dst[j - 1 if j > 0 else j] += count
            return
    dst[-1] += count


def _uniform_alg(count, upper, lower, bounds, dst):
    start = 0
    while start < len(bounds) and bounds[start] < lower:
        start += 1
    end = start
    while end < len(bounds) and bounds[end] < upper:
        end += 1
    if end > len(bounds) - 1:
        end = len(bounds) - 1
    if end > start:
        span = end - start + 1
        per, rem = divmod(count, span)
        for j in range(start, end + 1):
            dst[j] += per
            if rem > 0:
                dst[j] += 1
                rem -= 1
    else:
        dst[start] += count


_ALGS = {"upper": _upper_alg, "midpoint": _midpoint_alg, "uniform": _uniform_alg}


def _ref_bucket_counts(points, bounds, alg, zero_count=0):
    """points: [(scale, idx, cnt)] for ONE datapoint."""
    dst = [0] * len(bounds)
    if zero_count > 0 and bounds[0] == 0:
        dst[0] += zero_count
    fn = _ALGS[alg]
    for scale, idx, cnt in points:
        factor = math.log(2) * (2.0 ** -scale)
        upper = math.exp((idx + 1) * factor)
        lower = math.exp(idx * factor)
        if lower > bounds[-1]:
            dst[-1] += cnt
            continue
        fit = False
        for b in range(1, len(bounds)):
            if lower > bounds[b - 1] and upper <= bounds[b]:
                dst[b - 1] += cnt
                fit = True
                break
        if not fit:
            fn(cnt, upper, lower, bounds, dst)
    return dst


def _synthetic_points():
    """Deterministic multi-datapoint corpus covering negative indices,
    scale variation, overflow, exact-fit, and multi-boundary spans."""
    out = []  # (series, window, scale, idx, cnt, zero_count)
    for s in range(3):
        for w in range(4):
            zc = (s + w) % 3
            scale = (s + w) % 3
            for k in range(7):
                idx = ((s * 13 + w * 7 + k * 5) % 23) - 8
                cnt = 1 + (s + w + k) % 9
                out.append((f"s{s}", w, scale, idx, cnt, zc))
    return out


@pytest.mark.parametrize("alg", ["upper", "midpoint", "uniform"])
def test_expo_to_explicit_matches_reference_port(spark, alg):
    rows = _synthetic_points()
    df = spark.createDataFrame(
        rows, "series string, window_id long, scale long, idx long, cnt long, zero_count long"
    )
    got = {
        (r.series, r.window_id, r.bucket_idx): r.bucket_count
        for r in mf.expo_buckets_to_explicit(
            df, BOUNDS, alg, keys=["series", "window_id"],
            zero_count_col="zero_count",
        ).collect()
    }
    # group the python-side points per datapoint
    per_dp: dict = {}
    for series, w, scale, idx, cnt, zc in rows:
        per_dp.setdefault((series, w), ([], zc))[0].append((scale, idx, cnt))
    for (series, w), (pts, zc) in per_dp.items():
        want = _ref_bucket_counts(pts, BOUNDS, alg, zero_count=zc)
        for j, wv in enumerate(want):
            assert got[(series, w, j)] == wv, (series, w, j, alg)


def test_expo_to_explicit_rejects_bad_args(spark):
    df = spark.createDataFrame([("a", 0, 0, 0, 1)],
        "series string, window_id long, scale long, idx long, cnt long")
    with pytest.raises(ValueError, match="invalid distribution"):
        mf.expo_buckets_to_explicit(df, BOUNDS, "random")
    with pytest.raises(ValueError, match="bounds cannot be empty"):
        mf.expo_buckets_to_explicit(df, [], "upper")


def _metric_frame(spark):
    # one gauge, one non-monotonic delta sum, one histogram, one summary
    rows = [
        ("g", mf.GAUGE, 0, False, 2.0, None, None),
        ("s", mf.SUM, 1, False, 3.5, None, None),
        ("h", mf.HISTOGRAM, 2, False, None, 7.25, 4),
        ("h_nosum", mf.HISTOGRAM, 1, False, None, None, 2),
        ("q", mf.SUMMARY, 0, False, None, 11.5, 6),
    ]
    return spark.createDataFrame(
        rows,
        "metric_name string, metric_type int, temporality int, "
        "is_monotonic boolean, value_double double, hsum double, cnt long",
    )


def test_convert_sum_to_gauge_and_back(spark):
    df = _metric_frame(spark)
    out = {r.metric_name: r for r in mf.convert_sum_to_gauge(df).collect()}
    assert out["s"].metric_type == mf.GAUGE
    assert out["s"].temporality == 0 and out["s"].is_monotonic is False
    assert out["g"].metric_type == mf.GAUGE  # untouched
    assert out["h"].metric_type == mf.HISTOGRAM

    back = {
        r.metric_name: r
        for r in mf.convert_gauge_to_sum(df, "cumulative", True).collect()
    }
    assert back["g"].metric_type == mf.SUM
    assert back["g"].temporality == 2 and back["g"].is_monotonic is True
    assert back["q"].metric_type == mf.SUMMARY

    with pytest.raises(ValueError, match="unknown aggregation temporality"):
        mf.convert_gauge_to_sum(df, "bogus", True)


def test_extract_sum_and_count_metric(spark):
    df = _metric_frame(spark)
    sums = {r.metric_name: r for r in mf.extract_sum_metric(df, True).collect()}
    # histogram-without-sum emits nothing; gauge/sum sources are invalid;
    # summary inherits cumulative temporality
    assert set(sums) == {"h_sum", "q_sum"}
    assert sums["h_sum"].value_double == 7.25 and sums["h_sum"].temporality == 2
    assert sums["q_sum"].temporality == 2  # summary -> cumulative
    assert all(r.metric_type == mf.SUM and r.is_monotonic for r in sums.values())

    df = df.withColumn("unit", F.lit("ms"))
    counts = {
        r.metric_name: r for r in mf.extract_count_metric(df, False).collect()
    }
    assert set(counts) == {"h_count", "h_nosum_count", "q_count"}
    assert counts["h_count"].value_int == 4
    assert all(r.unit == "1" for r in counts.values())


def test_convert_summary_vals_to_sums(spark):
    df = _metric_frame(spark)
    s = mf.convert_summary_sum_val_to_sum(df, "delta", False).collect()
    c = mf.convert_summary_count_val_to_sum(df, "cumulative", True).collect()
    assert len(s) == 1 and s[0].metric_name == "q_sum"
    assert s[0].temporality == 1 and s[0].value_double == 11.5
    assert len(c) == 1 and c[0].metric_name == "q_count"
    assert c[0].temporality == 2 and c[0].value_int == 6


def test_scale_metric_ottl_statement(spark):
    """scale_metric as a metric-context OTTL statement, with where-clause
    composition (`func_scale.go` registered in transformprocessor's metric
    function table)."""
    from open_telemetry_opentelemetry_collector_contrib_spark.operators import (
        transform as transform_ops,
    )

    df = _metric_frame(spark).withColumn("unit", F.lit("ms"))
    out = {
        r.metric_name: r
        for r in transform_ops.transform(
            df,
            [
                transform_ops.StatementGroup(
                    context="metric",
                    statements=[
                        'scale_metric(10.0, "ks") where metric.name == "g"'
                    ],
                )
            ],
        ).collect()
    }
    assert out["g"].value_double == 20.0 and out["g"].unit == "ks"
    assert out["s"].value_double == 3.5 and out["s"].unit == "ms"  # untouched
    assert out["h"].hsum == 7.25              # histogram not matched by where


def test_aggregate_on_attributes_statement(spark):
    """aggregate_on_attributes editor: keep-list collapse, where-clause
    pass-through, and Summary rows passing through unaggregated."""
    from open_telemetry_opentelemetry_collector_contrib_spark.operators import (
        transform as transform_ops,
    )

    rows = [
        ("m", mf.SUM, {"et": "a", "shard": "s0"}, 1),
        ("m", mf.SUM, {"et": "b", "shard": "s0"}, 2),
        ("m", mf.SUM, {"et": "a", "shard": "s1"}, 4),
        ("other", mf.SUM, {"et": "a", "shard": "s0"}, 8),
        ("q", mf.SUMMARY, {"et": "a", "shard": "s0"}, 16),
        ("q", mf.SUMMARY, {"et": "b", "shard": "s0"}, 32),
    ]
    df = spark.createDataFrame(
        rows,
        "metric_name string, metric_type int, "
        "attributes map<string,string>, value_int long",
    )
    out = transform_ops.transform(
        df,
        [
            transform_ops.StatementGroup(
                context="metric",
                statements=[
                    'aggregate_on_attributes("sum", ["shard"]) '
                    'where metric.name == "m"'
                ],
            )
        ],
    ).collect()
    got = {
        (r.metric_name, tuple(sorted(r.attributes.items())), r.value_int)
        for r in out
    }
    assert (("m", (("shard", "s0"),), 3)) in got      # a+b collapsed
    assert (("m", (("shard", "s1"),), 4)) in got
    assert (("other", (("et", "a"), ("shard", "s0")), 8)) in got  # where-gated
    # summaries pass through with attrs intact
    assert (("q", (("et", "a"), ("shard", "s0")), 16)) in got
    assert (("q", (("et", "b"), ("shard", "s0")), 32)) in got
    assert len(out) == 5


def test_copy_and_scale_metric(spark):
    df = _metric_frame(spark).withColumn(
        "explicit_bounds",
        F.when(F.col("metric_type") == mf.HISTOGRAM,
               F.array(F.lit(0.25), F.lit(0.5))),
    )
    copies = mf.copy_metric(df, name="dup").collect()
    assert len(copies) == df.count() and all(r.metric_name == "dup" for r in copies)

    scaled = {r.metric_name: r for r in mf.scale_metric(
        df, 10.0, unit="ks", bounds_col="explicit_bounds"
    ).collect()}
    assert scaled["g"].value_double == 20.0       # gauge value scaled
    assert scaled["s"].value_double == 35.0       # sum value scaled
    assert scaled["h"].hsum == 72.5               # histogram sum scaled
    assert scaled["q"].hsum == 11.5               # summary untouched
    assert scaled["h"].explicit_bounds == [2.5, 5.0]
    assert scaled["h"].cnt == 4                   # counts never scaled
    assert all(r.unit == "ks" for r in scaled.values())


def test_span_rename_pipeline(spark):
    """spanprocessor semantics pinned against hand-computed expectations
    (span.go:96-241): all-or-nothing from_attributes, sequential
    to_attributes rules with {group} placeholder rewrite and
    break_after_match, error status stamping."""
    from open_telemetry_opentelemetry_collector_contrib_spark.operators import (
        span as span_ops,
    )

    rows = [
        (1, "get /api/v1/doc/12345/update", {"op": "get", "tool": "http"}, "ok"),
        (2, "get /api/v1/doc/777/update", {"op": "get"}, "err"),
        (3, "", {"op": "x", "tool": "y"}, "ok"),
    ]
    df = spark.createDataFrame(
        rows,
        "sid long, span_name string, attributes map<string,string>, status string",
    )
    out = span_ops.rename_from_attributes(df, ["op", "tool"], separator=":")
    got = {r.sid: r.span_name for r in out.collect()}
    assert got[1] == "get:http"        # both present -> renamed
    assert got[2] == "get /api/v1/doc/777/update"  # missing tool -> untouched
    assert got[3] == "x:y"             # empty original name still renamed

    out2 = span_ops.rename_to_attributes(
        df, [r"/doc/(?<doc_id>\d+)/", r"(?<verb>^get) "],
        break_after_match=True,
    )
    by = {r.sid: r for r in out2.collect()}
    assert by[1].span_name == "get /api/v1/doc/{doc_id}/update"
    assert by[1].attributes["doc_id"] == "12345"
    # break_after_match: second rule must NOT run on a row rule 1 matched
    assert "verb" not in by[1].attributes
    assert by[3].span_name == ""       # empty name: rules skipped

    out3 = span_ops.set_status(
        df, "error", "boom", where=F.col("status") == "err"
    )
    st = {r.sid: (r.status_code, r.status_message) for r in out3.collect()}
    assert st[2] == (2, "boom") and st[1] == (0, "")

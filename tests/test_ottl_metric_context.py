"""Metric/datapoint-context conformance
(`pkg/ottl/contexts/internal/metric.go:35-47`,
`pkg/ottl/contexts/ottldatapoint/datapoint.go:189-259`)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from open_telemetry_opentelemetry_collector_contrib_spark.ottl import (
    DataPointContext,
    apply_statement,
    apply_statements,
    compile_condition,
)
from open_telemetry_opentelemetry_collector_contrib_spark.ottl.compiler import (
    OTTLCompileError,
)


@pytest.fixture(scope="module")
def dps(spark):
    rows = [
        # metric_name, unit, metric_type, temporality, is_monotonic, ts, vi, vd
        ("latency", "s", 1, 0, False, datetime(2024, 5, 1, 0, 0, 0), None, 1.25),
        ("requests", "1", 2, 1, True, datetime(2024, 5, 1, 0, 0, 1), 7, None),
        ("requests", "1", 2, 1, True, datetime(2024, 5, 1, 0, 0, 2), 9, None),
    ]
    return spark.createDataFrame(
        rows,
        "metric_name string, unit string, metric_type int, temporality int, "
        "is_monotonic boolean, ts timestamp, vi long, vd double",
    )


def _stmt(df, src):
    return apply_statement(df, src, ctx_cls=DataPointContext)


def test_metric_parent_paths(dps):
    ctx = DataPointContext(dps)
    kept = dps.filter(compile_condition('metric.name == "requests"', ctx))
    assert kept.count() == 2
    kept = dps.filter(compile_condition("metric.type == METRIC_DATA_TYPE_GAUGE", ctx))
    assert kept.count() == 1
    kept = dps.filter(
        compile_condition(
            "metric.aggregation_temporality == AGGREGATION_TEMPORALITY_DELTA", ctx
        )
    )
    assert kept.count() == 2
    kept = dps.filter(compile_condition("metric.is_monotonic == true", ctx))
    assert kept.count() == 2


def test_metric_name_set_and_unit(dps):
    out = _stmt(
        dps, 'set(metric.name, "http.requests") where metric.unit == "1"'
    ).collect()
    names = sorted(r.metric_name for r in out)
    assert names == ["http.requests", "http.requests", "latency"]


def test_value_aliases_and_math(dps):
    # vi/vd short-form columns resolve as value_int / value_double
    out = _stmt(
        dps, "set(vd, value_double * 1000.0) where metric.name == \"latency\""
    ).collect()
    vals = {r.metric_name: r.vd for r in out}
    assert vals["latency"] == 1250.0
    ctx = DataPointContext(dps)
    kept = dps.filter(compile_condition("value_int >= 8", ctx))
    assert kept.count() == 1


def test_time_paths(dps):
    out = _stmt(dps, 'set(attributes["tn"], time_unix_nano)').collect()
    want = int(datetime(2024, 5, 1, tzinfo=timezone.utc).timestamp() * 1e9)
    assert min(r.tn for r in out) == want
    ctx = DataPointContext(dps)
    cond = compile_condition('time >= Time("2024-05-01 00:00:02", "%Y-%m-%d %H:%M:%S")', ctx)
    assert dps.filter(cond).count() == 1


def test_flags_default_and_fold(dps):
    ctx = DataPointContext(dps)
    assert dps.filter(compile_condition("flags == FLAG_NONE", ctx)).count() == 3
    out = apply_statements(
        dps,
        [
            'set(attributes["t"], metric.aggregation_temporality)',
            'set(metric.unit, "ms") where metric.type == METRIC_DATA_TYPE_GAUGE',
        ],
        ctx_cls=DataPointContext,
    ).collect()
    units = {r.metric_name: r.unit for r in out}
    assert units == {"latency": "ms", "requests": "1"}


def test_unknown_metric_path_rejected(dps):
    ctx = DataPointContext(dps)
    with pytest.raises(OTTLCompileError, match="unknown metric path"):
        compile_condition('metric.bogus == "x"', ctx)

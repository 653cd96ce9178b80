"""Cross-context conformance: the reference's editor/converter statement
corpus is generic over the context type parameter K
(`ottlfuncs.StandardFuncs[K]`, `pkg/ottl/e2e/e2e_test.go:36,327` — the same
statements run in log, span, spanevent, and datapoint parsers). Our analog:
function compilation is context-independent, so a context-agnostic statement
must produce identical results through SpanContext, SpanEventContext, and
DataPointContext as through LogContext. This module re-runs a representative
subset of the e2e corpus through each of the three non-log contexts.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from open_telemetry_opentelemetry_collector_contrib_spark.ottl import (
    DataPointContext,
    SpanContext,
    apply_statement,
)
from open_telemetry_opentelemetry_collector_contrib_spark.ottl.span_context import (
    SpanEventContext,
)

# (statement, expected value of attributes["test"] on every row) — drawn from
# `pkg/ottl/e2e/e2e_test.go:327-520` (converters) and `:36-326` (editors);
# all are context-agnostic (literals + attributes only).
CASES = [
    ('set(attributes["test"], Base64Decode("cGFzcw=="))', "pass"),
    ('set(attributes["test"], Decode("cGFzcw==", "base64"))', "pass"),
    ('set(attributes["test"], Concat(["A","B"], ":"))', "A:B"),
    ('set(attributes["test"], ConvertCase("PASS", "lower"))', "pass"),
    ('set(attributes["test"], ConvertCase("fooBar", "snake"))', "foo_bar"),
    ('set(attributes["test"], ConvertCase("foo_bar", "camel"))', "FooBar"),
    ('set(attributes["test"], Double("1"))', 1.0),
    ('set(attributes["test"], Int(1.9))', 1),
    ('set(attributes["test"], Len("pass"))', 4),
    ('set(attributes["test"], Substring("pass", 0, 2))', "pa"),
    ('set(attributes["test"], String(42))', "42"),
    ('set(attributes["test"], ConvertCase("pass", "upper"))', "PASS"),
    ('set(attributes["test"], Seconds(Duration("1m")))', 60.0),
    ('set(attributes["test"], FNV("pass"))', None),  # checked non-null only
    ('set(attributes["test"], Format("%s: %d", ["k", 7]))', "k: 7"),
    ('set(attributes["test"], Hex(17))', "0000000000000011"),
    ('set(attributes["test"], SHA256("pass"))',
     "d74ff0ee8da3b9806b18c877dbf29bbde50b5bd8e4dad7a3a725000feb82e8f1"),
    (
        'set(attributes["test"], "pass") '
        'where Time("10", "%M") - Time("01", "%M") < Duration("10m")',
        "pass",
    ),
]


@pytest.fixture(scope="module")
def span_frame(spark):
    rows = [
        ("t1", "t1#0", None, "operationA", 2, "ok", 1500,
         datetime(2024, 3, 1, 12, 0, 0), "vendor=x"),
    ]
    return spark.createDataFrame(
        rows,
        "trace_id string, span_id string, parent_span_id string, name string, "
        "kind int, status string, duration_ms long, ts timestamp, trace_state string",
    )


@pytest.fixture(scope="module")
def spanevent_frame(spark):
    rows = [
        ("t1", "t1#0", "exception", datetime(2024, 3, 1, 12, 0, 0),
         "operationA", 2, datetime(2024, 3, 1, 12, 0, 0)),
    ]
    return spark.createDataFrame(
        rows,
        "trace_id string, span_id string, event_name string, event_ts timestamp, "
        "name string, kind int, ts timestamp",
    )


@pytest.fixture(scope="module")
def dp_frame(spark):
    rows = [
        ("latency", "s", 1, 0, False, datetime(2024, 5, 1, 0, 0, 0), None, 1.25),
    ]
    return spark.createDataFrame(
        rows,
        "metric_name string, unit string, metric_type int, temporality int, "
        "is_monotonic boolean, ts timestamp, vi long, vd double",
    )


def _run(df, ctx_cls, statement, expected):
    # frames without an attributes map store attributes["x"] as flat columns
    out = apply_statement(df, statement, ctx_cls=ctx_cls)
    got = out.select(F.col("test").alias("v")).collect()[0].v
    if expected is None:
        assert got is not None
    elif isinstance(expected, float):
        assert float(got) == pytest.approx(expected)
    else:
        assert str(got) == str(expected)


@pytest.mark.parametrize("statement,expected", CASES, ids=[c[0][:60] for c in CASES])
def test_span_context(span_frame, statement, expected):
    _run(span_frame, SpanContext, statement, expected)


@pytest.mark.parametrize("statement,expected", CASES, ids=[c[0][:60] for c in CASES])
def test_spanevent_context(spanevent_frame, statement, expected):
    _run(spanevent_frame, SpanEventContext, statement, expected)


@pytest.mark.parametrize("statement,expected", CASES, ids=[c[0][:60] for c in CASES])
def test_datapoint_context(dp_frame, statement, expected):
    _run(dp_frame, DataPointContext, statement, expected)


def test_context_paths_compose_with_converters(span_frame, dp_frame):
    """Context-specific paths feed generic converters — the composition the
    reference gets from parametrizing StandardFuncs over K."""
    out = apply_statement(
        span_frame,
        'set(attributes["test"], ConvertCase(name, "upper")) where kind == SPAN_KIND_SERVER',
        ctx_cls=SpanContext,
    )
    assert out.select("test").collect()[0][0] == "OPERATIONA"
    out = apply_statement(
        dp_frame,
        'set(attributes["test"], Concat([metric.name, metric.unit], "/"))',
        ctx_cls=DataPointContext,
    )
    assert out.select("test").collect()[0][0] == "latency/s"

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


# ---------------------------------------------------------------------------
# context-SCOPED corpus statements (`pkg/ottl/e2e/e2e_test.go:983-1128`):
# the Test_e2e_ottl_features block + the span-parser IsRootSpan test, run
# against each context's OWN paths (name/kind/start_time on spans, event
# name/time on span events, metric.*/time on datapoints) — the composition
# the reference gets from parametrizing the parser over the context type.
# The record mirrors constructSpanTransformContext/fillSpanOne
# (`e2e_test.go:1172-1207`: name=operationB, span_id 0102030405060708,
# trace_id 0102030405060708090a0b0c0d0e0f10) with the log record's resource
# (host.name=localhost, `e2e_test.go:1131-1132`) so the reach-upwards case
# has a target. ids are hex strings in our frames, which makes the
# SpanID/TraceID setter statements (excluded from the log corpus for the
# pdata bytes rendering) representable here.
# ---------------------------------------------------------------------------

SPAN_TS = datetime(2020, 2, 11, 20, 26, 13, 789)


@pytest.fixture(scope="module")
def span_rec(spark):
    df = spark.createDataFrame(
        [
            (
                "0102030405060708090a0b0c0d0e0f10",
                "0102030405060708",
                None,
                "operationB",
                2,
                "err",
                1000,
                SPAN_TS,
            )
        ],
        "trace_id string, span_id string, parent_span_id string, name string, "
        "kind int, status string, duration_ms long, ts timestamp",
    )
    return df.withColumn(
        "attributes", F.create_map(F.lit("keep"), F.lit("x"))
    ).withColumn(
        "resource", F.create_map(F.lit("host.name"), F.lit("localhost"))
    )


def _one(df, statement, ctx_cls):
    return apply_statement(df, statement, ctx_cls=ctx_cls).collect()[0]


# (statement, checked field, expected) — attributes-map keys check the map,
# bare names check the column
SPAN_SCOPED = [
    # e2e_test.go:1101 verbatim (span parser + IsRootSpan factory)
    ('set(attributes["entrypoint-root"], name) where IsRootSpan()',
     "entrypoint-root", "operationB"),
    # :1010 "Using hex" — trace_id compares against a TraceID hex literal
    ('set(attributes["test"], "pass") where trace_id == TraceID(0x0102030405060708090a0b0c0d0e0f10)',
     "test", "pass"),
    # :991 "where clause" — fires here: the span's name IS operationB
    ('set(attributes["test"], "pass") where name == "operationB"', "test", "pass"),
    # :1017 "where clause without comparator" — operationB matches neither A nor C
    ('set(attributes["test"], "pass") where IsMatch(name, "operation[AC]")',
     "test", None),
    # :1024 "where clause with Converter return value"
    ('set(attributes["test"], "pass") where name == Concat(["operation", "B"], "")',
     "test", "pass"),
    # :996 "reach upwards"
    ('set(attributes["test"], "pass") where resource.attributes["host.name"] == "localhost"',
     "test", "pass"),
    # :1003 "Using enums", span enum table (SERVER=2 -> CONSUMER=5)
    ('set(kind, SPAN_KIND_CONSUMER) where kind == SPAN_KIND_SERVER', "kind", 5),
    # :877 UnixNano guard on the span's own clock
    ('set(attributes["test"], "pass") where UnixNano(start_time) > 0', "test", "pass"),
    # :802 SpanID setter (hex-string id model makes it representable)
    ('set(span_id, SpanID(0x0000000000000000))', "span_id", "0000000000000000"),
    # :853 TraceID setter
    ('set(trace_id, TraceID(0x00000000000000000000000000000000))',
     "trace_id", "00000000000000000000000000000000"),
    # :829 String(span_id) — hex string, not the pdata [1,2,...] rendering
    # (documented id-model divergence)
    ('set(attributes["test"], String(span_id))', "test", "0102030405060708"),
]


@pytest.mark.parametrize(
    "statement,field,expected", SPAN_SCOPED, ids=[c[0][:60] for c in SPAN_SCOPED]
)
def test_span_scoped_statements(span_rec, statement, field, expected):
    row = _one(span_rec, statement, SpanContext)
    got = dict(row.attributes).get(field) if field in ("test", "entrypoint-root") else row[field]
    if expected is None:
        assert got is None
    else:
        assert got == expected


def test_span_scoped_truncate_time(span_rec):
    # :859 set(time, TruncateTime(time, Duration("1s"))) via the span's
    # start_time path
    row = _one(
        span_rec, 'set(start_time, TruncateTime(start_time, Duration("1s")))',
        SpanContext,
    )
    assert row.ts == SPAN_TS.replace(microsecond=0)


@pytest.fixture(scope="module")
def spanevent_rec(spark):
    df = spark.createDataFrame(
        [
            (
                "0102030405060708090a0b0c0d0e0f10",
                "0102030405060708",
                None,
                "exception",
                SPAN_TS,
                "operationB",
                2,
                SPAN_TS,
            )
        ],
        "trace_id string, span_id string, parent_span_id string, "
        "event_name string, event_ts timestamp, name string, kind int, ts timestamp",
    )
    return df.withColumn("attributes", F.create_map(F.lit("keep"), F.lit("x")))


def test_spanevent_scoped_statements(spanevent_rec):
    # event-level name (`ottlspanevent/span_events.go:157-179`)
    row = _one(
        spanevent_rec,
        'set(attributes["test"], "pass") where name == "exception"',
        SpanEventContext,
    )
    assert dict(row.attributes)["test"] == "pass"
    # parent-span reach-down via span.<path>, gated by IsRootSpan
    row = _one(
        spanevent_rec,
        'set(attributes["test"], span.name) where IsRootSpan()',
        SpanEventContext,
    )
    assert dict(row.attributes)["test"] == "operationB"
    # the event's own clock feeds generic converters
    row = _one(
        spanevent_rec,
        'set(attributes["test"], "pass") where UnixNano(time) > 0',
        SpanEventContext,
    )
    assert dict(row.attributes)["test"] == "pass"


@pytest.fixture(scope="module")
def dp_rec(spark):
    df = spark.createDataFrame(
        [("latency", "s", 2, 1, True, SPAN_TS, 7, 1.25)],
        "metric_name string, unit string, metric_type int, temporality int, "
        "is_monotonic boolean, ts timestamp, vi long, vd double",
    )
    return df.withColumn("attributes", F.create_map(F.lit("keep"), F.lit("x")))


DP_SCOPED = [
    # features-block analogs on the datapoint's parent-metric paths
    # (`ottldatapoint/datapoint.go` metric.* grammar)
    ('set(attributes["test"], "pass") where metric.name == "latency"',
     "test", "pass"),
    ('set(attributes["test"], "pass") where IsMatch(metric.name, "lat.*")',
     "test", "pass"),
    ('set(attributes["test"], "pass") where metric.is_monotonic == true',
     "test", "pass"),
    # :1003 enum statement on the temporality enum (DELTA=1 -> CUMULATIVE=2)
    ('set(metric.aggregation_temporality, AGGREGATION_TEMPORALITY_CUMULATIVE) '
     'where metric.aggregation_temporality == AGGREGATION_TEMPORALITY_DELTA',
     "temporality", 2),
    ('set(attributes["test"], "pass") where UnixSeconds(time) > 0',
     "test", "pass"),
]


@pytest.mark.parametrize(
    "statement,field,expected", DP_SCOPED, ids=[c[0][:60] for c in DP_SCOPED]
)
def test_datapoint_scoped_statements(dp_rec, statement, field, expected):
    row = _one(dp_rec, statement, DataPointContext)
    got = dict(row.attributes).get(field) if field == "test" else row[field]
    assert got == expected


def test_datapoint_scoped_truncate_time(dp_rec):
    row = _one(
        dp_rec, 'set(time, TruncateTime(time, Duration("1s")))', DataPointContext
    )
    assert row.ts == SPAN_TS.replace(microsecond=0)

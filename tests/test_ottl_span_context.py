"""Span-context conformance: first-class span path grammar
(`pkg/ottl/contexts/internal/span.go:40-135`) + the span e2e statement from
`pkg/ottl/e2e/e2e_test.go:1095-1105` (IsRootSpan)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from open_telemetry_opentelemetry_collector_contrib_spark.ottl import (
    SpanContext,
    apply_statement,
    apply_statements,
    compile_condition,
)
from open_telemetry_opentelemetry_collector_contrib_spark.ottl.compiler import (
    OTTLCompileError,
)


@pytest.fixture(scope="module")
def spans(spark):
    rows = [
        # trace_id, span_id, parent_span_id, name, kind, status, duration_ms, ts, trace_state
        ("t1", "t1#0", None, "operationA", 2, "ok", 1500,
         datetime(2024, 3, 1, 12, 0, 0), "vendor=x,o=y"),
        ("t1", "t1#1", "t1#0", "operationB", 3, "err", 250,
         datetime(2024, 3, 1, 12, 0, 1), None),
        ("t2", "t2#0", "", "operationB", 1, None, None,
         datetime(2024, 3, 1, 12, 0, 2), "vendor=z"),
    ]
    return spark.createDataFrame(
        rows,
        "trace_id string, span_id string, parent_span_id string, name string, "
        "kind int, status string, duration_ms long, ts timestamp, trace_state string",
    )


def _span_stmt(df, src):
    return apply_statement(df, src, ctx_cls=SpanContext)


def test_id_and_name_paths(spans):
    out = _span_stmt(spans, 'set(attributes["tid"], trace_id.string)')
    assert {r.tid for r in out.collect()} == {"t1", "t2"}
    out = _span_stmt(spans, 'set(attributes["n"], name) where span_id.string == "t1#0"')
    rows = {r.span_id: r.n for r in out.collect()}
    assert rows["t1#0"] == "operationA" and rows["t1#1"] is None


def test_kind_enum_and_strings(spans):
    ctx = SpanContext(spans)
    kept = spans.filter(compile_condition("kind == SPAN_KIND_SERVER", ctx))
    assert {r.span_id for r in kept.collect()} == {"t1#0"}
    # Kind().String() -> short pdata names (internal/span.go:328-357);
    # deprecated_string -> proto SPAN_KIND_X via traceutil.SpanKindStr
    # (internal/span.go:359-388, traceutil/traceutil.go:16-32).
    out = _span_stmt(spans, 'set(attributes["ks"], kind.string)').collect()
    ks = {r.span_id: r.ks for r in out}
    assert ks == {"t1#0": "Server", "t1#1": "Client", "t2#0": "Internal"}
    out = _span_stmt(spans, 'set(attributes["kd"], kind.deprecated_string)').collect()
    kd = {r.span_id: r.kd for r in out}
    assert kd == {"t1#0": "SPAN_KIND_SERVER", "t1#1": "SPAN_KIND_CLIENT",
                  "t2#0": "SPAN_KIND_INTERNAL"}


def test_status_code_enum(spans):
    ctx = SpanContext(spans)
    kept = spans.filter(compile_condition("status.code == STATUS_CODE_ERROR", ctx))
    assert {r.span_id for r in kept.collect()} == {"t1#1"}
    kept = spans.filter(compile_condition("status.code == STATUS_CODE_UNSET", ctx))
    assert {r.span_id for r in kept.collect()} == {"t2#0"}


def test_time_paths_and_duration_math(spans):
    # end_time - start_time must equal the duration in seconds
    ctx = SpanContext(spans)
    from open_telemetry_opentelemetry_collector_contrib_spark.ottl.compiler import (
        compile_value,
    )
    from open_telemetry_opentelemetry_collector_contrib_spark.ottl.parser import (
        parse_condition,
    )

    # duration vs float is a cross-type mismatch in OTTL (orderings -> false);
    # Seconds() converts the duration to float, and the subtraction keeps
    # sub-second precision (1.5 s here, not a truncated 1 s)
    cond = compile_condition("Seconds(end_time - start_time) >= 1.5", ctx)
    assert {r.span_id for r in spans.filter(cond).collect()} == {"t1#0"}
    cond_mismatch = compile_condition("end_time - start_time >= 1.0", ctx)
    assert spans.filter(cond_mismatch).count() == 0
    out = _span_stmt(spans, 'set(attributes["dur_ns"], end_time_unix_nano - start_time_unix_nano)')
    d = {r.span_id: r.dur_ns for r in out.collect()}
    assert d["t1#0"] == 1_500_000_000 and d["t1#1"] == 250_000_000 and d["t2#0"] == 0
    # start_time_unix_nano matches the epoch instant
    out2 = _span_stmt(spans, 'set(attributes["st"], start_time_unix_nano)').collect()
    want = int(datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc).timestamp() * 1e9)
    assert {r.st for r in out2 if r.span_id == "t1#0"} == {want}


def test_trace_state_key(spans):
    ctx = SpanContext(spans)
    cond = compile_condition('trace_state["vendor"] == "x"', ctx)
    assert {r.span_id for r in spans.filter(cond).collect()} == {"t1#0"}


def test_is_root_span_e2e_statement(spans):
    """e2e_test.go: set(attributes["entrypoint-root"], name) where IsRootSpan()"""
    out = _span_stmt(
        spans, 'set(attributes["entrypoint-root"], name) where IsRootSpan()'
    ).collect()
    got = {r.span_id: r["entrypoint-root"] for r in out}
    assert got == {"t1#0": "operationA", "t1#1": None, "t2#0": "operationB"}


def test_statement_fold_on_span_context(spans):
    out = apply_statements(
        spans,
        [
            'set(attributes["code"], status.code)',
            'set(attributes["flag"], "slow") where Seconds(end_time - start_time) >= 1.0',
        ],
        ctx_cls=SpanContext,
    ).collect()
    rows = {r.span_id: (r.code, r.flag) for r in out}
    assert rows["t1#0"] == (1, "slow")
    assert rows["t1#1"] == (2, None)


def test_dropped_counts_default_zero(spans):
    ctx = SpanContext(spans)
    cond = compile_condition("dropped_attributes_count == 0", ctx)
    assert spans.filter(cond).count() == 3


def test_unknown_span_path_rejected(spans):
    ctx = SpanContext(spans)
    with pytest.raises(OTTLCompileError):
        ctx.resolve_path_for_test = None
        compile_condition('trace_id.hex == "x"', ctx)


def test_spanevent_context_parent_access(spark):
    """ottlspanevent: event name/time are event-level; span.<path> reaches
    the parent span (`span_events.go:157-179`)."""
    from open_telemetry_opentelemetry_collector_contrib_spark.ottl import (
        SpanEventContext,
    )

    rows = [
        ("t1", "t1#0", None, "operationA", 2, "err", 500,
         datetime(2024, 3, 1, 12, 0, 0), "exception",
         datetime(2024, 3, 1, 12, 0, 0, 250000)),
    ]
    df = spark.createDataFrame(
        rows,
        "trace_id string, span_id string, parent_span_id string, name string, "
        "kind int, status string, duration_ms long, ts timestamp, "
        "event_name string, event_ts timestamp",
    )
    out = apply_statement(
        df,
        'set(attributes["ev"], name) where span.status.code == STATUS_CODE_ERROR',
        ctx_cls=SpanEventContext,
    ).collect()[0]
    assert out.ev == "exception"
    ctx = SpanEventContext(df)
    cond = compile_condition('span.name == "operationA" and name == "exception"', ctx)
    assert df.filter(cond).count() == 1
    # event time, not span time
    out2 = apply_statement(
        df, 'set(attributes["tn"], time_unix_nano)', ctx_cls=SpanEventContext
    ).collect()[0]
    span_start = int(
        datetime(2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc).timestamp() * 1e9
    )
    assert out2.tn == span_start + 250_000_000


def test_filterprocessor_span_and_metric_contexts(spark, spans):
    """filterprocessor signal-specific condition blocks
    (`processor/filterprocessor/config.go`): traces.span conditions compile
    with the span grammar, metrics.datapoint with the metric grammar."""
    from open_telemetry_opentelemetry_collector_contrib_spark.operators.filter import (
        filter_ottl,
    )

    out = filter_ottl(
        spans, ["status.code == STATUS_CODE_ERROR"], context="span"
    )
    assert {r.span_id for r in out.collect()} == {"t1#0", "t2#0"}

    dps = spark.createDataFrame(
        [("latency", 1, 5.0), ("requests", 2, 3.0)],
        "metric_name string, metric_type int, vd double",
    )
    out2 = filter_ottl(
        dps, ["metric.type == METRIC_DATA_TYPE_SUM"], context="datapoint"
    )
    assert [r.metric_name for r in out2.collect()] == ["latency"]


def test_is_root_span_requires_span_frame(spark):
    df = spark.createDataFrame([("a",)], ["text"])
    with pytest.raises(OTTLCompileError, match="span frame"):
        apply_statement(df, 'set(attributes["r"], IsRootSpan())')

"""Resource/scope context statements over MapType columns.

On a denormalized flat table, resource-context statements are row-level
column ops with identical results because resource attrs replicate per row
(`processor/transformprocessor/internal/common/logs.go:110-130`)."""

from __future__ import annotations

import pytest

from open_telemetry_opentelemetry_collector_contrib_spark.ottl import (
    apply_statement,
    apply_statements,
    compile_condition,
    LogContext,
)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        {
            "conv_id": "c1",
            "text": "hello",
            "attributes": {"k1": "v1"},
            "resource": {"service.name": "gateway", "host.name": "h1"},
        },
        {
            "conv_id": "c2",
            "text": "world",
            "attributes": {"k1": "v2"},
            "resource": {"service.name": "backend", "host.name": "h2"},
        },
    ]
    return spark.createDataFrame(rows)


def row(df, conv="c1"):
    from pyspark.sql import functions as F

    return df.filter(F.col("conv_id") == conv).collect()[0]


def test_resource_attribute_get(frame):
    ctx = LogContext(frame)
    cond = compile_condition('resource.attributes["service.name"] == "gateway"', ctx)
    assert {r.conv_id for r in frame.filter(cond).collect()} == {"c1"}


def test_resource_attribute_set_and_delete(frame):
    df = apply_statements(
        frame,
        [
            'set(resource.attributes["env"], "prod") where resource.attributes["service.name"] == "gateway"',
            'delete_key(resource, "host.name")',
        ],
    )
    r1, r2 = row(df), row(df, "c2")
    assert r1.resource.get("env") == "prod"
    assert r2.resource.get("env") is None
    assert "host.name" not in r1.resource and "host.name" not in r2.resource


def test_log_attributes_map_set(frame):
    df = apply_statement(frame, 'set(attributes["k2"], attributes["k1"])')
    assert row(df).attributes == {"k1": "v1", "k2": "v1"}


def test_keep_matching_on_resource(frame):
    df = apply_statement(frame, 'keep_matching_keys(resource, "service.*")')
    assert set(row(df).resource) == {"service.name"}


# ---------------------------------------------------------------------------
# instrumentation scope paths (`pkg/ottl/contexts/internal/scope.go:24-37`)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def scope_frame(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("operationA", "scope", "1.2.0", 0)],
        "text string, scope_name string, scope_version string, "
        "scope_dropped_attributes_count int",
    )
    return df.withColumn(
        "scope", F.create_map(F.lit("lib.kind"), F.lit("internal"))
    ).withColumn("attributes", F.create_map(F.lit("keep"), F.lit("x")))


def test_scope_scalar_paths(scope_frame):
    df = apply_statement(
        scope_frame,
        'set(attributes["sv"], Concat([instrumentation_scope.name, '
        'instrumentation_scope.version], "@")) '
        'where instrumentation_scope.name == "scope"',
    )
    row = df.collect()[0]
    assert dict(row.attributes)["sv"] == "scope@1.2.0"


def test_scope_attributes_get_and_set(scope_frame):
    df = apply_statement(
        scope_frame,
        'set(instrumentation_scope.attributes["lib.tier"], "core") '
        'where instrumentation_scope.attributes["lib.kind"] == "internal"',
    )
    row = df.collect()[0]
    assert dict(row.scope) == {"lib.kind": "internal", "lib.tier": "core"}


def test_scope_scalar_set(scope_frame):
    df = apply_statement(
        scope_frame, 'set(instrumentation_scope.version, "2.0.0")'
    )
    assert df.collect()[0].scope_version == "2.0.0"


def test_scope_dropped_count_condition(scope_frame):
    df = apply_statement(
        scope_frame,
        'set(attributes["t"], "pass") '
        'where instrumentation_scope.dropped_attributes_count == 0',
    )
    assert dict(df.collect()[0].attributes)["t"] == "pass"

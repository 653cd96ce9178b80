"""Round-5 semantics fixes, each pinned by the reference behavior it closes:

- replace_pattern(…, FNV) applies the exact Go FNV-1a 64 converter to the
  replacement (`func_replace_pattern.go:66-98` + `func_fnv.go`), not a
  stand-in hash.
- Hex(double) propagates NULL like the int/bool/string branches (NaN's bit
  pattern is not a rendering of null).
- flatten accepts depth positionally: flatten(target, prefix, depth)
  (`func_flatten.go` Arguments order).
- ParseKeyValue surfaces malformed pairs as a parse error (NULL map →
  error_mode=ignore no-op) and strips single- as well as double-quoted
  values and keys (parseutils.SplitString).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from open_telemetry_opentelemetry_collector_contrib_spark.ottl import apply_statement


def test_replace_pattern_fnv_exact_go_value(spark):
    # FNV("pass") == 266877920130663416 (e2e_test.go corpus value); the
    # replacement literal is hashed by the registered converter per match.
    df = spark.createDataFrame(
        [({"user.name": "secret-user"},)],
        T.StructType([T.StructField("attributes", T.MapType(T.StringType(), T.StringType()))]),
    )
    out = apply_statement(
        df, 'replace_pattern(attributes["user.name"], "secret-.*", "pass", FNV)'
    )
    got = dict(out.collect()[0].attributes)
    assert got["user.name"] == "266877920130663416"


def test_replace_pattern_fnv_with_format(spark):
    df = spark.createDataFrame(
        [({"k": "abc"},)],
        T.StructType([T.StructField("attributes", T.MapType(T.StringType(), T.StringType()))]),
    )
    out = apply_statement(
        df,
        'replace_pattern(attributes["k"], "abc", "pass", FNV, "hash=%s")',
    )
    assert dict(out.collect()[0].attributes)["k"] == "hash=266877920130663416"


def test_hex_double_null_propagates(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,)], T.StructType([T.StructField("x", T.DoubleType())])
    )
    out = apply_statement(df, "set(t, Hex(x))")
    vals = [r.t for r in out.orderBy(F.col("x").asc_nulls_last()).collect()]
    assert vals == ["3ff0000000000000", None]


@pytest.fixture(scope="module")
def nested(spark):
    row = {"attributes": {"a": "1", "foo": {"bar": "pass", "nested": {"test": "x"}}}}
    schema = (
        "attributes struct<a:string, "
        "foo:struct<bar:string, nested:struct<test:string>>>"
    )
    return spark.createDataFrame([row], schema)


def _attrs(df, stmt):
    return dict(apply_statement(df, stmt).collect()[0].attributes)


def test_flatten_positional_depth(nested):
    got = _attrs(nested, 'flatten(attributes, "p", 1)')
    assert got == {
        "p.a": "1",
        "p.foo.bar": "pass",
        "p.foo.nested": '{"test":"x"}',
    }
    # positional == named
    assert got == _attrs(nested, 'flatten(attributes, prefix="p", depth=1)')


def test_flatten_too_many_args_rejected(nested):
    from open_telemetry_opentelemetry_collector_contrib_spark.ottl.compiler import (
        OTTLCompileError,
    )

    with pytest.raises(OTTLCompileError):
        apply_statement(nested, 'flatten(attributes, "p", 1, 2)')


def test_parse_keyvalue_malformed_pair_is_error(spark):
    # a pair with no kv delimiter is a parse error in parseutils → NULL map;
    # under error_mode=ignore the set() no-ops and t stays unset (null).
    df = spark.createDataFrame([("k1=v1 oops k2=v2",), ("k1=v1 k2=v2",)], ["s"])
    out = apply_statement(df, "set(t, ParseKeyValue(s))")
    rows = {r.s: r.t for r in out.collect()}
    assert rows["k1=v1 oops k2=v2"] is None
    assert dict(rows["k1=v1 k2=v2"]) == {"k1": "v1", "k2": "v2"}


def test_parse_keyvalue_quote_stripping(spark):
    # single-quoted values are stripped; double-quoted keys are both
    # split-protected and stripped. (A delimiter INSIDE single quotes still
    # splits — the documented remaining divergence.)
    df = spark.createDataFrame([("k1='v1' \"k two\"=\"v 2\"",)], ["s"])
    out = apply_statement(df, "set(t, ParseKeyValue(s))")
    got = dict(out.collect()[0].t)
    assert got == {"k1": "v1", "k two": "v 2"}


def test_route_quantiles_plan_has_no_raw_row_window(spark):
    """The counting-sort reformulation: the raw corpus reduces through a
    PARTIAL-aggregated groupBy(route, latency_ms) BEFORE any
    route-partitioned window — so the window input is the tiny value
    histogram, never the full corpus shuffled into <=4 route tasks."""
    import __spark_entry__ as entry

    df = entry.q_route_latency_quantiles(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the histogram shuffle keys on BOTH route and latency_ms (full
    # parallelism); a raw-row window plan would shuffle on route alone
    # straight from the scan
    starts = [
        i
        for i in range(len(plan))
        if plan.startswith("hashpartitioning(route", i)
    ]
    assert starts, plan
    assert any("latency_ms" in plan[i : i + 120] for i in starts), plan
    # map-side combine happened below that exchange
    assert "partial_count" in plan or "partial" in plan.lower()
    # and the result is still oracle-exact (checked in the oracle gate);
    # here: the discrete quantiles are monotone and bounded by max
    rows = df.collect()
    assert rows and all(
        r.p50_ms <= r.p90_ms <= r.p99_ms <= r.max_ms for r in rows
    )

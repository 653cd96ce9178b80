"""Verbatim port of the reference OTTL e2e statement corpus
(`pkg/ottl/e2e/e2e_test.go:36-982`): same statement strings, same expected
results, run through our compiler on the log context.

Excluded (documented data-model divergence, each covered by an equivalent
test elsewhere):

- statements against the heterogeneous nested pdata map (``attributes["foo"]``
  as a map-of-any, ``attributes["things"]`` as a slice-of-maps):
  ``merge_maps(attributes, attributes["foo"], ...)``, nested ``append``,
  ``set(attributes["foo"]["test"], ...)``, ``keep_keys(attributes["foo"],..)``,
  ``SliceToMap``, ``Len(attributes["foo"])``, ``IsMap``/``IsList`` on nested
  values. Spark columns are statically typed; the engine's model is flat
  typed columns + a map<string,string> attributes column (compiler
  docstring), and those editors are conformance-tested on homogeneous maps
  in test_ottl.py. The three ``flatten`` corpus statements ARE ported (on a
  StructType mirror of the reference record — see the flatten section at
  the bottom).
- ``String(span_id)`` / ``SpanID(0x..)`` / ``TraceID(0x..)`` setters: ids are
  hex STRINGS in our frames (the pdata raw-bytes rendering ``[1,2,3,...]``
  has no analog); id semantics are covered in test_ottl_span_context.py.
- ``ParseJSON``/``ParseXML``/``ParseSimplifiedXML`` putting typed nested maps
  into attributes: tested with typed result shapes in test_ottl.py /
  test_stanza_ops.py; here we keep the string-shaped XML converters.
- ``Sort([false, Int(11), Double(2.2), "three"])`` heterogeneous: Spark
  arrays are homogeneous; the reference's numeric/mixed tiers are covered by
  the numeric Sort cases below.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from open_telemetry_opentelemetry_collector_contrib_spark.ottl import apply_statement

TS = datetime(2024, 2, 4, 6, 5, 1, 333000)

BASE_ATTRS = {
    "http.method": "get",
    "http.path": "/health",
    "http.url": "http://localhost/health",
    "flags": "A|B|C",
    "total.string": "123456789",
}


@pytest.fixture(scope="module")
def logs_map(spark):
    """The reference log record (`e2e_test.go:1130-1170`), attributes as the
    engine's map<string,string> column."""
    df = spark.createDataFrame(
        [("operationA", 1, "t1", TS)],
        "text string, severity_number int, trace_id string, ts timestamp",
    )
    m = F.create_map(
        *[x for kv in BASE_ATTRS.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    )
    return df.withColumn("attributes", m)


@pytest.fixture(scope="module")
def logs_flat(spark):
    """Flat-typed variant (no attributes map) so converter results of any
    type can land in the ``test`` column via the typed fast path."""
    return spark.createDataFrame(
        [("operationA", 1, "A|B|C", TS)],
        "text string, severity_number int, flags string, ts timestamp",
    )


def _attrs_after(df, statement):
    out = apply_statement(df, statement)
    return dict(out.select("attributes").collect()[0].attributes)


def _test_after(df, statement):
    out = apply_statement(df, statement)
    row = out.collect()[0]
    return row.test if "test" in out.columns else None


# --- editor block (`e2e_test.go:36-326`) on the attributes map -------------

EDITOR_CASES = [
    ('delete_key(attributes, "http.method")',
     {k: v for k, v in BASE_ATTRS.items() if k != "http.method"}),
    ('delete_matching_keys(attributes, "^http")',
     {"flags": "A|B|C", "total.string": "123456789"}),
    ('keep_matching_keys(attributes, "^http")',
     {k: v for k, v in BASE_ATTRS.items() if k.startswith("http")}),
    ('keep_keys(attributes, ["flags", "total.string"])',
     {"flags": "A|B|C", "total.string": "123456789"}),
    ("limit(attributes, 100, [])", BASE_ATTRS),
    ('limit(attributes, 1, ["total.string"])', {"total.string": "123456789"}),
    ('replace_all_matches(attributes, "*/*", "test")',
     {**BASE_ATTRS, "http.path": "test", "http.url": "test"}),
    ('replace_all_patterns(attributes, "key", "^http", "test")',
     {"test.method": "get", "test.path": "/health",
      "test.url": "http://localhost/health",
      "flags": "A|B|C", "total.string": "123456789"}),
    ('replace_all_patterns(attributes, "value", "/", "@")',
     {**BASE_ATTRS, "http.path": "@health",
      "http.url": "http:@@localhost@health"}),
    ('replace_match(attributes["http.path"], "*/*", "test")',
     {**BASE_ATTRS, "http.path": "test"}),
    ('replace_pattern(attributes["http.path"], "/", "@")',
     {**BASE_ATTRS, "http.path": "@health"}),
    ('replace_pattern(attributes["http.path"], "/", "@", SHA256)',
     {**BASE_ATTRS, "http.path":
      "c3641f8544d7c02f3580b07c0f9887f0c6a27ff5ab1d4a3e29caf197cfc299ae"
      "health"}),
    ('set(attributes["test"], "pass")', {**BASE_ATTRS, "test": "pass"}),
    ('set(attributes["test"], nil)', BASE_ATTRS),
    ('set(attributes["test"], attributes["unknown"])', BASE_ATTRS),
    ("truncate_all(attributes, 100)", BASE_ATTRS),
    ("truncate_all(attributes, 1)",
     {"http.method": "g", "http.path": "/", "http.url": "h",
      "flags": "A", "total.string": "1"}),
]


@pytest.mark.parametrize(
    "statement,expected", EDITOR_CASES, ids=[c[0][:60] for c in EDITOR_CASES]
)
def test_editor_corpus(logs_map, statement, expected):
    assert _attrs_after(logs_map, statement) == expected


# --- converter block (`e2e_test.go:327-982`): scalar results ---------------

SCALAR_CASES = [
    ('set(attributes["test"], Base64Decode("cGFzcw=="))', "pass"),
    ('set(attributes["test"], Decode("cGFzcw==", "base64"))', "pass"),
    ('set(attributes["test"], Concat(["A","B"], ":"))', "A:B"),
    ('set(attributes["test"], ConvertCase("PASS", "lower"))', "pass"),
    ('set(attributes["test"], ConvertCase("fooBar", "snake"))', "foo_bar"),
    ('set(attributes["test"], ConvertCase("foo_bar", "camel"))', "FooBar"),
    ('set(attributes["test"], Double(1.0))', 1.0),
    ('set(attributes["test"], Double("1"))', 1.0),
    ('set(attributes["test"], Double(true))', 1.0),
    ('set(attributes["test"], Double(1))', 1.0),
    ('set(attributes["test"], FNV("pass"))', 266877920130663416),
    ('set(attributes["test"], Format("%03d-%s", [7, "test"]))', "007-test"),
    ('set(attributes["test"], Hour(Time("12", "%H")))', 12),
    ('set(attributes["test"], Hours(Duration("90m")))', 1.5),
    ('set(attributes["test"], InsertXML("<a></a>", "/a", "<b></b>"))',
     "<a><b></b></a>"),
    ('set(attributes["test"], Int(1.0))', 1),
    ('set(attributes["test"], Int("1"))', 1),
    ('set(attributes["test"], Int(true))', 1),
    ('set(attributes["test"], Int(1))', 1),
    ('set(attributes["test"], GetXML("<a><b>1</b><c><b>2</b></c></a>", "/a//b"))',
     "<b>1</b><b>2</b>"),
    ('set(attributes["test"], Hex(1.0))', "3ff0000000000000"),
    ('set(attributes["test"], Hex(true))', "01"),
    ('set(attributes["test"], Hex(12))', "000000000000000c"),
    ('set(attributes["test"], Hex("12"))', "3132"),
    ('set(attributes["test"], "pass") where IsBool(false)', "pass"),
    ('set(attributes["test"], "pass") where IsDouble(1.0)', "pass"),
    ('set(attributes["test"], "pass") where IsMatch("aa123bb", "\\\\d{3}")',
     "pass"),
    ('set(attributes["test"], "pass") where IsString("")', "pass"),
    ('set(attributes["test"], Log(1))', 0.0),
    ('set(attributes["test"], MD5("pass"))',
     "1a1dc91c907325c69271ddf0c944bc72"),
    ('set(attributes["test"], Microseconds(Duration("1ms")))', 1000),
    ('set(attributes["test"], Milliseconds(Duration("1s")))', 1000),
    ('set(attributes["test"], Minutes(Duration("1h")))', 60.0),
    ('set(attributes["test"], Nanoseconds(Duration("1ms")))', 1000000),
    ('set(attributes["test"], "pass") where Now() - Now() < Duration("1h")',
     "pass"),
    ('set(attributes["test"], RemoveXML("<Log id=\\"1\\"><Message>This is a '
     'log message!</Message></Log>", "/Log/Message"))',
     '<Log id="1"></Log>'),
    ('set(attributes["test"], Seconds(Duration("1m")))', 60.0),
    ('set(attributes["test"], SHA1("pass"))',
     "9d4e1e23bd5b727046a9e3b4b7db57bd8d6ee684"),
    ('set(attributes["test"], SHA256("pass"))',
     "d74ff0ee8da3b9806b18c877dbf29bbde50b5bd8e4dad7a3a725000feb82e8f1"),
    ('set(attributes["test"], SHA512("pass"))',
     "5b722b307fce6c944905d132691d5e4a2214b7fe92b738920eb3fce3a90420a1"
     "9511c3010a0e7712b054daef5b57bad59ecbd93b3280f210578f547f4aed4d25"),
    ('set(attributes["test"], String("test"))', "test"),
    ('set(attributes["test"], String(true))', "true"),
    ('set(attributes["test"], String([1,2,3]))', "[1,2,3]"),
    ('set(attributes["test"], Substring("pass", 0, 2))', "pa"),
    ('set(attributes["test"], "pass") where UnixMicro(time) > 0', "pass"),
    ('set(attributes["test"], "pass") where UnixMilli(time) > 0', "pass"),
    ('set(attributes["test"], "pass") where UnixNano(time) > 0', "pass"),
    ('set(attributes["test"], "pass") where UnixSeconds(time) > 0', "pass"),
    ('set(attributes["test"], "pass") where IsString(UUID())', "pass"),
    ('set(attributes["test"], "\\\\")', "\\"),
    ('set(attributes["test"], "\\\\\\\\")', "\\\\"),
    ('set(attributes["test"], "\\"")', '"'),
    ('set(attributes["test"], ToKeyValueString(ParseKeyValue("k1=v1 k2=v2"), '
     '"=", " ", true))', "k1=v1 k2=v2"),
    ('set(attributes["test"], ToKeyValueString(ParseKeyValue("k1:v1,k2:v2", '
     '":" , ","), ":", ",", true))', "k1:v1,k2:v2"),
    ('set(attributes["test"], ToKeyValueString(ParseKeyValue("k1=v1 k2=v2"), '
     '"!", "+", true))', "k1!v1+k2!v2"),
    ('set(attributes["test"], ToKeyValueString(ParseKeyValue("k1=v1 k2=v2=v3"'
     '), "=", " ", true))', 'k1=v1 k2="v2=v3"'),
    ('set(attributes["test"], ConvertAttributesToElementsXML('
     '"<Log id=\\"1\\"><Message>This is a log message!</Message></Log>"))',
     "<Log><Message>This is a log message!</Message><id>1</id></Log>"),
    ('set(attributes["test"], ConvertTextToElementsXML("<a><b/>foo</a>"))',
     "<a><b></b><value>foo</value></a>"),
    ('set(attributes["test"], ConvertTextToElementsXML('
     '"<a><b/>foo</a><c><b/>bar</c>", "/a", "custom"))',
     "<a><b></b><custom>foo</custom></a><c><b></b>bar</c>"),
]


@pytest.mark.parametrize(
    "statement,expected", SCALAR_CASES, ids=[c[0][:60] for c in SCALAR_CASES]
)
def test_converter_corpus_scalars(logs_flat, statement, expected):
    got = _test_after(logs_flat, statement)
    if isinstance(expected, float):
        assert got is not None and float(got) == pytest.approx(expected)
    elif isinstance(expected, int):
        assert got is not None and int(got) == expected
    else:
        assert str(got) == expected


# --- converter block: map / array results ----------------------------------

MAP_CASES = [
    ('set(attributes["test"], ExtractPatterns("aa123bb", "(?P<numbers>\\\\d+)"))',
     {"numbers": "123"}),
    ('set(attributes["test"], ParseKeyValue("k1=v1 k2=v2"))',
     {"k1": "v1", "k2": "v2"}),
    ('set(attributes["test"], ParseKeyValue("k1!v1_k2!v2", "!", "_"))',
     {"k1": "v1", "k2": "v2"}),
    ('set(attributes["test"], ParseKeyValue("k1!v1_k2!\\"v2__!__v2\\"", "!", "_"))',
     {"k1": "v1", "k2": "v2__!__v2"}),
    ('set(attributes["test"], ParseCSV("val1;val2;val3",'
     '"header1|header2|header3",";","|","strict"))',
     {"header1": "val1", "header2": "val2", "header3": "val3"}),
    ('set(attributes["test"], UserAgent("curl/7.81.0"))',
     {"user_agent.original": "curl/7.81.0", "user_agent.name": "curl",
      "user_agent.version": "7.81.0"}),
]


@pytest.mark.parametrize(
    "statement,expected", MAP_CASES, ids=[c[0][:60] for c in MAP_CASES]
)
def test_converter_corpus_maps(logs_flat, statement, expected):
    got = _test_after(logs_flat, statement)
    assert got is not None and dict(got) == expected


ARRAY_CASES = [
    ('set(attributes["test"], Split(attributes["flags"], "|"))',
     ["A", "B", "C"]),
    ('set(attributes["test"], Sort(Split(attributes["flags"], "|"), "desc"))',
     ["C", "B", "A"]),
    ('set(attributes["test"], Sort([true, false, false]))',
     [False, False, True]),
    ('set(attributes["test"], Sort([3, 6, 9], "desc"))', [9, 6, 3]),
    ('set(attributes["test"], Sort([Double(1.5), Double(10.2), Double(2.3), '
     'Double(0.5)]))', [0.5, 1.5, 2.3, 10.2]),
    ('set(attributes["test"], Sort([Int(11), Double(2.2), Double(-1)]))',
     [-1.0, 2.2, 11.0]),
]


@pytest.mark.parametrize(
    "statement,expected", ARRAY_CASES, ids=[c[0][:60] for c in ARRAY_CASES]
)
def test_converter_corpus_arrays(logs_flat, statement, expected):
    got = _test_after(logs_flat, statement)
    assert got is not None and list(got) == expected


# --- ottl features block (`e2e_test.go:983-1094`) --------------------------


def test_feature_body_no_match(logs_flat):
    out = apply_statement(
        logs_flat, 'set(attributes["test"], "pass") where body == "operationB"'
    )
    assert "test" not in out.columns or out.collect()[0].test is None


def test_feature_severity_enum(logs_flat):
    out = apply_statement(
        logs_flat,
        "set(severity_number, SEVERITY_NUMBER_TRACE2) "
        "where severity_number == SEVERITY_NUMBER_TRACE",
    )
    assert out.collect()[0].severity_number == 2


def test_feature_ismatch_body(logs_flat):
    out = apply_statement(
        logs_flat,
        'set(attributes["test"], "pass") where IsMatch(body, "operation[AC]")',
    )
    assert out.collect()[0].test == "pass"


def test_feature_body_concat_eq(logs_flat):
    out = apply_statement(
        logs_flat,
        'set(attributes["test"], "pass") where body == Concat(["operation", "A"], "")',
    )
    assert out.collect()[0].test == "pass"


def test_convertcase_path_arg(logs_map):
    # ConvertCase over a map-attribute path (`e2e_test.go:351`)
    got = _attrs_after(
        logs_map,
        'set(attributes["test"], ConvertCase(attributes["http.method"], "upper"))',
    )
    assert got.get("test") == "GET"


def test_feature_truncate_time(logs_flat):
    out = apply_statement(logs_flat, 'set(time, TruncateTime(time, Duration("1s")))')
    assert out.collect()[0].ts == datetime(2024, 2, 4, 6, 5, 1)


# --- flatten corpus (`e2e_test.go:65-137`) on the typed nested frame -------
#
# The reference record's nested pdata map is mirrored as a StructType
# attributes column; values that remain nested after flattening (a map
# inside a slice, or nesting beyond `depth`) render as JSON — the
# string-typed map's canonical rendering of a still-nested value (pdata
# keeps them as live maps; documented divergence).


@pytest.fixture(scope="module")
def logs_nested(spark):
    row = {
        "text": "operationA",
        "attributes": {
            "http.method": "get",
            "http.path": "/health",
            "http.url": "http://localhost/health",
            "flags": "A|B|C",
            "total.string": "123456789",
            "foo": {
                "bar": "pass",
                "flags": "pass",
                "slice": ["val"],
                "nested": {"test": "pass"},
            },
            "things": [
                {"name": "foo", "value": 2},
                {"name": "bar", "value": 5},
            ],
        },
    }
    schema = (
        "text string, attributes struct<"
        "`http.method`:string, `http.path`:string, `http.url`:string, "
        "flags:string, `total.string`:string, "
        "foo:struct<bar:string, flags:string, slice:array<string>, "
        "nested:struct<test:string>>, "
        "things:array<struct<name:string, value:bigint>>>"
    )
    return spark.createDataFrame([row], schema)


FLAT_BASE = {
    "http.method": "get",
    "http.path": "/health",
    "http.url": "http://localhost/health",
    "flags": "A|B|C",
    "total.string": "123456789",
}


def test_flatten_full_depth(logs_nested):
    got = _attrs_after(logs_nested, "flatten(attributes)")
    assert got == {
        **FLAT_BASE,
        "foo.bar": "pass",
        "foo.flags": "pass",
        "foo.slice.0": "val",
        "foo.nested.test": "pass",
        "things.0": '{"name":"foo","value":2}',
        "things.1": '{"name":"bar","value":5}',
    }


def test_flatten_prefix(logs_nested):
    got = _attrs_after(logs_nested, 'flatten(attributes, "test")')
    assert got["test.http.method"] == "get"
    assert got["test.foo.slice.0"] == "val"
    assert got["test.foo.nested.test"] == "pass"
    assert set(got) == {f"test.{k}" for k in [
        "http.method", "http.path", "http.url", "flags", "total.string",
        "foo.bar", "foo.flags", "foo.slice.0", "foo.nested.test",
        "things.0", "things.1",
    ]}


def test_flatten_depth_1(logs_nested):
    got = _attrs_after(logs_nested, "flatten(attributes, depth=1)")
    assert got == {
        **FLAT_BASE,
        "foo.bar": "pass",
        "foo.flags": "pass",
        "foo.slice": '["val"]',
        "foo.nested": '{"test":"pass"}',
        "things.0": '{"name":"foo","value":2}',
        "things.1": '{"name":"bar","value":5}',
    }


def test_flatten_map_with_prefix(logs_map):
    # a MapType target is already flat; prefix still applies to its keys
    got = _attrs_after(logs_map, 'flatten(attributes, "p")')
    assert got == {f"p.{k}": v for k, v in BASE_ATTRS.items()}


# --- remaining ottl-features statements (`e2e_test.go:983-1094`) -----------


@pytest.fixture(scope="module")
def logs_features(spark):
    """Feature-block fixture: resource map, hex trace id, a foo struct for
    nested indexing, plus the attributes map."""
    df = spark.createDataFrame(
        [("operationA", 1, "0102030405060708090a0b0c0d0e0f10", TS, "pass")],
        "text string, severity_number int, trace_id string, ts timestamp, "
        "foo_bar string",
    )
    attrs = F.create_map(
        *[x for kv in BASE_ATTRS.items() for x in (F.lit(kv[0]), F.lit(kv[1]))]
    )
    res = F.create_map(F.lit("host.name"), F.lit("localhost"))
    foo = F.struct(F.col("foo_bar").alias("bar"))
    return (
        df.withColumn("attributes", attrs)
        .withColumn("resource", res)
        .withColumn("foo", foo)
        .drop("foo_bar")
    )


def test_feature_reach_upwards(logs_features):
    got = _attrs_after(
        logs_features,
        'set(attributes["test"], "pass") '
        'where resource.attributes["host.name"] == "localhost"',
    )
    assert got.get("test") == "pass"


def test_feature_trace_id_hex_literal(logs_features):
    got = _attrs_after(
        logs_features,
        'set(attributes["test"], "pass") '
        "where trace_id == TraceID(0x0102030405060708090a0b0c0d0e0f10)",
    )
    assert got.get("test") == "pass"


def test_feature_merge_maps_parsejson_where(logs_features):
    got = _attrs_after(
        logs_features,
        'merge_maps(attributes, ParseJSON("{\\"json_test\\":\\"pass\\"}"), '
        '"insert") where body == "operationA"',
    )
    assert got.get("json_test") == "pass"
    assert got["http.method"] == "get"


def test_feature_complex_indexing_found(logs_features):
    # attributes["foo"] resolves to the typed foo struct; ["bar"] chains
    got = _attrs_after(logs_features, 'set(attributes["test"], attributes["foo"]["bar"])')
    assert got.get("test") == "pass"


def test_feature_complex_indexing_not_found(logs_features):
    # indexing past a scalar map value yields nil -> set is a no-op
    got = _attrs_after(
        logs_features, 'set(attributes["test"], attributes["metadata"]["uid"])'
    )
    assert "test" not in got


def test_feature_ismap_map_literal(logs_flat):
    out = apply_statement(
        logs_flat,
        'set(attributes["isMap"], IsMap({"foo": {"bar": "baz", "test": "pass"}}))',
    )
    assert out.collect()[0].isMap is True


def test_feature_split_resource_index(logs_features):
    got = _attrs_after(
        logs_features,
        'set(attributes["my.environment.2"], '
        'Split(resource.attributes["host.name"],"h")[1])',
    )
    assert got.get("my.environment.2") == "ost"


def test_map_literal_values_compile(logs_flat):
    # map literal with path + converter values -> struct column
    out = apply_statement(
        logs_flat,
        'set(attributes["m"], {"raw": body, "n": Len(body)})',
    )
    row = out.collect()[0]
    assert row.m.raw == "operationA" and row.m.n == 10

"""Parser robustness: grammar-generated statements always parse + compile;
arbitrary garbage raises OTTLSyntaxError (never crashes or hangs)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from open_telemetry_opentelemetry_collector_contrib_spark.ottl.compiler import (
    OTTLCompileError,
)
from open_telemetry_opentelemetry_collector_contrib_spark.ottl.lexer import (
    OTTLSyntaxError,
)
from open_telemetry_opentelemetry_collector_contrib_spark.ottl.parser import (
    parse_condition,
    parse_statement,
)

# -- generative grammar -------------------------------------------------------

paths = st.sampled_from(
    ["body", "severity_text", 'attributes["a"]', 'resource.attributes["r"]', "conv_id"]
)
literals = st.one_of(
    st.integers(-1000, 1000).map(str),
    st.floats(-100, 100, allow_nan=False).map(lambda f: repr(round(f, 3))),
    st.sampled_from(['"s"', '"x y"', "true", "false", "nil"]),
)
converters = st.sampled_from(
    ['Len({v})', 'ConvertCase({v}, "lower")', 'IsMatch({v}, "a.*")', "Int({v})", "String({v})"]
)


@st.composite
def values(draw, depth=0):
    choice = draw(st.integers(0, 2 if depth < 2 else 1))
    if choice == 0:
        return draw(literals)
    if choice == 1:
        return draw(paths)
    inner = draw(values(depth + 1))
    return draw(converters).format(v=inner)


@st.composite
def comparisons(draw):
    op = draw(st.sampled_from(["==", "!=", "<", "<=", ">", ">="]))
    return f"{draw(values())} {op} {draw(values())}"


@st.composite
def bool_exprs(draw, depth=0):
    if depth >= 2:
        return draw(comparisons())
    kind = draw(st.integers(0, 3))
    if kind == 0:
        return draw(comparisons())
    if kind == 1:
        return f"not ({draw(bool_exprs(depth + 1))})"
    joiner = " and " if kind == 2 else " or "
    return f"({draw(bool_exprs(depth + 1))}){joiner}({draw(bool_exprs(depth + 1))})"


@st.composite
def statements(draw):
    editor = draw(
        st.sampled_from(
            [
                'set(attributes["t"], {v})',
                'set(out, {v})',
                'delete_key(attributes, "a")',
                'replace_pattern(body, "x", "y")',
            ]
        )
    ).format(v=draw(values()))
    if draw(st.booleans()):
        editor += f" where {draw(bool_exprs())}"
    return editor


@settings(max_examples=300, deadline=None)
@given(statements())
def test_generated_statements_parse(src):
    parse_statement(src)


@settings(max_examples=300, deadline=None)
@given(bool_exprs())
def test_generated_conditions_parse(src):
    parse_condition(src)


@settings(max_examples=500, deadline=None)
@given(st.text(max_size=60))
def test_garbage_never_crashes(src):
    try:
        parse_condition(src)
    except (OTTLSyntaxError, OTTLCompileError):
        pass  # rejection is the expected path


@pytest.mark.parametrize(
    "src",
    [
        "set(",
        "set(a, 1) where",
        'set(a, "unterminated)',
        "1 ==",
        "(a == 1",
        "a == 1 extra",
        "set(a, 1) trailing",
        "Upper(a)(b)",
    ],
)
def test_known_bad_inputs_rejected(src):
    with pytest.raises((OTTLSyntaxError, OTTLCompileError)):
        parse_statement(src)


def test_generated_statements_compile_on_frame(spark):
    """A sample of generated statements must also compile to Columns against
    a real frame (unknown paths/functions may legitimately raise
    OTTLCompileError; syntax errors may not occur)."""
    from open_telemetry_opentelemetry_collector_contrib_spark.ottl import apply_statement

    df = spark.createDataFrame(
        [("c1", "body text", "INFO", {"a": "1"}, {"r": "x"})],
        "conv_id string, text string, severity_text string, attributes map<string,string>, resource map<string,string>",
    )
    import random

    rng = random.Random(7)
    sample = [
        'set(attributes["t"], Len(body)) where body != nil',
        'set(out, ConvertCase(severity_text, "lower")) where attributes["a"] == "1"',
        'delete_key(attributes, "a") where resource.attributes["r"] == "x"',
        'replace_pattern(body, "t.xt", "T") where Len(body) > 3',
    ]
    for src in sample:
        out = apply_statement(df, src)
        out.collect()

"""OTTL math semantics grid: Go-style int arithmetic (truncating division
toward zero) and float arithmetic, against an independent Python reference
(`pkg/ottl/math.go:12-55`)."""

from __future__ import annotations

import itertools

from open_telemetry_opentelemetry_collector_contrib_spark.ottl import (
    LogContext,
    compile_value,
)
from open_telemetry_opentelemetry_collector_contrib_spark.ottl.parser import (
    parse_condition,
)

INTS = [7, -7, 2, -2, 1, 3]
FLOATS = [2.5, -1.5, 0.5]
OPS = ["+", "-", "*", "/"]


def go_int(a: int, op: str, b: int) -> int:
    if op == "+":
        return a + b
    if op == "-":
        return a - b
    if op == "*":
        return a * b
    # Go integer division truncates toward zero (Python // floors)
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_int_math_grid(spark):
    df = spark.createDataFrame([(1,)], ["dummy"])
    ctx = LogContext(df)
    cases, cols = [], []
    for i, (a, op, b) in enumerate(itertools.product(INTS, OPS, INTS)):
        src = f"({a}) {op} ({b})" if a < 0 or b < 0 else f"{a} {op} {b}"
        node = parse_condition(src)
        cols.append(compile_value(node, ctx).col.alias(f"m{i}"))
        cases.append((src, go_int(a, op, b)))
    row = df.select(*cols).collect()[0]
    bad = [
        (cases[i][0], row[i], cases[i][1])
        for i in range(len(cases))
        if row[i] != cases[i][1]
    ]
    assert not bad, bad[:10]


def test_float_math_grid(spark):
    df = spark.createDataFrame([(1,)], ["dummy"])
    ctx = LogContext(df)
    cases, cols = [], []
    i = 0
    for a, op, b in itertools.product(FLOATS, OPS, FLOATS):
        src = f"({a}) {op} ({b})"
        node = parse_condition(src)
        cols.append(compile_value(node, ctx).col.alias(f"m{i}"))
        exp = {"+": a + b, "-": a - b, "*": a * b, "/": a / b}[op]
        cases.append((src, exp))
        i += 1
    row = df.select(*cols).collect()[0]
    bad = [
        (cases[j][0], row[j], cases[j][1])
        for j in range(len(cases))
        if abs(row[j] - cases[j][1]) > 1e-12
    ]
    assert not bad, bad[:10]

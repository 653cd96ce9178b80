"""Exhaustive OTTL comparison-semantics grid.

A pure-Python reference implementation of the cross-type comparison table
(`pkg/ottl/LANGUAGE.md:261-285`) is evaluated against the compiled Catalyst
expressions for every (value, value, op) combination — all in ONE Spark
action (each condition becomes a select column).
"""

from __future__ import annotations

import itertools

from open_telemetry_opentelemetry_collector_contrib_spark.ottl import (
    LogContext,
    compile_condition,
)

VALUES = [1, -2, 0, 2.5, 0.0, -1.5, "a", "b", "10", True, False, None]
OPS = ["==", "!=", "<", "<=", ">", ">="]


def _base(v) -> str:
    if v is None:
        return "nil"
    if isinstance(v, bool):
        return "bool"
    if isinstance(v, (int, float)):
        return "num"
    return "str"


def ref_compare(a, b, op) -> bool:
    """LANGUAGE.md comparison table, reimplemented independently."""
    if a is None or b is None:
        both_nil = a is None and b is None
        if op == "==":
            return both_nil
        if op == "!=":
            return not both_nil
        return False  # nil not comparable with orderings
    ba, bb = _base(a), _base(b)
    if ba != bb:
        return op == "!="  # mismatched base types: != true, everything else false
    if ba == "bool":
        if op == "==":
            return a == b
        if op == "!=":
            return a != b
        return False  # bools not orderable
    if ba == "num":
        a, b = float(a), float(b)
    return {
        "==": a == b,
        "!=": a != b,
        "<": a < b,
        "<=": a <= b,
        ">": a > b,
        ">=": a >= b,
    }[op]


def _lit(v) -> str:
    if v is None:
        return "nil"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return f'"{v}"'
    return repr(v)


def test_comparison_grid(spark):
    df = spark.createDataFrame([(1,)], ["dummy"])
    ctx = LogContext(df)
    cases = []
    cols = []
    for i, (a, b, op) in enumerate(
        itertools.product(VALUES, VALUES, OPS)
    ):
        src = f"{_lit(a)} {op} {_lit(b)}"
        cases.append((src, ref_compare(a, b, op)))
        cols.append(compile_condition(src, ctx).alias(f"c{i}"))
    row = df.select(*cols).collect()[0]
    mismatches = [
        (cases[i][0], bool(row[i]), cases[i][1])
        for i in range(len(cases))
        if bool(row[i]) != cases[i][1]
    ]
    assert not mismatches, f"{len(mismatches)} mismatches, first 10: {mismatches[:10]}"

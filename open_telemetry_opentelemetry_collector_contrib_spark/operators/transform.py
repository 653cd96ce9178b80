"""transformprocessor — OTTL statement groups with per-group conditions.

Reference semantics (`processor/transformprocessor/internal/common/config.go:34-38`,
`common/logs.go:34-56`):
- config is a list of context-statement groups: {context, conditions[],
  statements[]}.
- a group's statements are skipped for records not matching the group's
  conditions (OR-composed gate, applied at `common/logs.go:42-51`);
- statements execute in order, later ones seeing earlier mutations
  (`pkg/ottl/parser.go:341-356`);
- log/resource/scope contexts all collapse to row-level ops on a denormalized
  table (resource attrs are replicated per row), with identical results.

Spark: a fold of withColumn transformations; every statement's where-clause
is AND-ed with the group gate, so one Catalyst projection chain implements
the whole group without row-level branching in Python.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ottl import LogContext
from ..ottl.ast import Statement
from ..ottl.compiler import compile_bool, compile_conditions_or
from ..ottl.functions import call_editor
from ..ottl.parser import parse_statement


@dataclass
class StatementGroup:
    statements: list[str]
    conditions: list[str] = field(default_factory=list)
    context: str = "log"


def _context_cls(name: str) -> type:
    """transformprocessor context table (`config.go:34-60`): trace/span
    statements get the span path grammar, metric/datapoint statements the
    metric path grammar; log/resource/scope collapse to row-level ops on
    the denormalized frame."""
    if name in ("span", "trace"):
        from ..ottl.span_context import SpanContext

        return SpanContext
    if name == "spanevent":
        from ..ottl.span_context import SpanEventContext

        return SpanEventContext
    if name in ("metric", "datapoint"):
        from ..ottl.metric_context import DataPointContext

        return DataPointContext
    return LogContext


def apply_group(df: DataFrame, group: StatementGroup) -> DataFrame:
    cls = _context_cls(group.context)
    for src in group.statements:
        stmt: Statement = parse_statement(src)
        ctx = cls(df)
        cond = None
        if group.conditions:
            cond = F.coalesce(
                compile_conditions_or(group.conditions, ctx), F.lit(False)
            )
        if stmt.where is not None:
            where = compile_bool(stmt.where, ctx)
            cond = where if cond is None else (cond & where)
        df = call_editor(df, stmt.editor, ctx, cond)
    return df


def transform(df: DataFrame, groups: list[StatementGroup]) -> DataFrame:
    for g in groups:
        df = apply_group(df, g)
    return df

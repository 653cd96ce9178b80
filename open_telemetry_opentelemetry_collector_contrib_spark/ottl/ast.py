"""OTTL AST nodes (grammar: `pkg/ottl/grammar.go:15-126,209-213`)."""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Literal:
    value: object  # str | int | float | bool | None | bytes
    kind: str  # 'string' | 'int' | 'float' | 'bool' | 'nil' | 'bytes' | 'enum'


@dataclass(frozen=True)
class Path:
    """Dotted context path with optional map/slice keys per segment,
    e.g. ``resource.attributes["host.name"]`` or ``attributes["a"]["b"]``."""

    segments: tuple[str, ...]
    keys: tuple[object, ...] = ()  # trailing [key] indexes (str or int)


@dataclass(frozen=True)
class FuncCall:
    name: str
    args: tuple = ()
    named: tuple = ()  # tuple of (name, value) pairs


@dataclass(frozen=True)
class Index:
    """Indexing a converter result: Split(x, ",")[1] (`grammar.go:209-213`)."""

    target: object
    key: object


@dataclass(frozen=True)
class MathOp:
    op: str  # + - * /
    left: object
    right: object


@dataclass(frozen=True)
class Comparison:
    op: str  # == != < <= > >=
    left: object
    right: object


@dataclass(frozen=True)
class BoolOp:
    op: str  # 'and' | 'or'
    operands: tuple


@dataclass(frozen=True)
class NotOp:
    operand: object


@dataclass(frozen=True)
class Statement:
    editor: FuncCall
    where: object | None = None

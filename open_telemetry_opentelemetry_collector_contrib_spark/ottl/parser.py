"""OTTL recursive-descent parser.

Grammar (from `pkg/ottl/grammar.go` + `pkg/ottl/LANGUAGE.md:228-236`):

    statement   := editor ('where' boolExpr)?
    editor      := IDENT '(' argList? ')'
    boolExpr    := term ('or' term)*
    term        := factor ('and' factor)*
    factor      := 'not' factor | comparison
    comparison  := value (compOp value)?            -- bare value must be bool
    value       := mathExpr
    mathExpr    := addend (('+'|'-') addend)*
    addend      := multiplier (('*'|'/') multiplier)*
    multiplier  := primary ('[' key ']')*
    primary     := literal | converter | path | '(' boolExpr ')'
    converter   := UIDENT '(' argList? ')'          -- UIDENT alone = enum
    path        := IDENT ('.' IDENT)* ('[' key ']')*
    argList     := arg (',' arg)*  ; arg := (IDENT '=')? (boolExpr|value|list)
    list        := '[' value (',' value)* ']'
"""

from __future__ import annotations

from .ast import (
    BoolOp,
    Comparison,
    FuncCall,
    Index,
    Literal,
    MathOp,
    NotOp,
    Path,
    Statement,
)
from .lexer import OTTLSyntaxError, Token, tokenize

_COMP_OPS = {"==", "!=", "<", "<=", ">", ">="}


class _Parser:
    def __init__(self, src: str):
        self.src = src
        self.toks = tokenize(src)
        self.i = 0

    # -- token helpers -----------------------------------------------------
    def peek(self) -> Token:
        return self.toks[self.i]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def at_op(self, *ops: str) -> bool:
        t = self.peek()
        return t.kind == "OP" and t.value in ops

    def expect_op(self, op: str) -> None:
        t = self.next()
        if t.kind != "OP" or t.value != op:
            raise OTTLSyntaxError(f"expected {op!r} at {t.pos} in {self.src!r}, got {t.value!r}")

    # -- grammar -----------------------------------------------------------
    def statement(self) -> Statement:
        t = self.peek()
        if t.kind != "IDENT":
            raise OTTLSyntaxError(f"statement must start with an editor name: {self.src!r}")
        editor = self.func_call(t.value.islower() or "_" in t.value)
        where = None
        if self.peek().kind == "WHERE":
            self.next()
            where = self.bool_expr()
        self.expect_eof()
        return Statement(editor=editor, where=where)

    def condition(self):
        e = self.bool_expr()
        self.expect_eof()
        return e

    def expect_eof(self) -> None:
        t = self.peek()
        if t.kind != "EOF":
            raise OTTLSyntaxError(f"trailing tokens at {t.pos} in {self.src!r}")

    def bool_expr(self):
        terms = [self.bool_term()]
        while self.peek().kind == "OR":
            self.next()
            terms.append(self.bool_term())
        return terms[0] if len(terms) == 1 else BoolOp("or", tuple(terms))

    def bool_term(self):
        factors = [self.bool_factor()]
        while self.peek().kind == "AND":
            self.next()
            factors.append(self.bool_factor())
        return factors[0] if len(factors) == 1 else BoolOp("and", tuple(factors))

    def bool_factor(self):
        if self.peek().kind == "NOT":
            self.next()
            return NotOp(self.bool_factor())
        return self.comparison()

    def comparison(self):
        left = self.math_expr()
        if self.at_op(*_COMP_OPS):
            op = self.next().value
            right = self.math_expr()
            return Comparison(op, left, right)
        return left

    def math_expr(self):
        node = self.addend()
        while self.at_op("+", "-"):
            op = self.next().value
            node = MathOp(op, node, self.addend())
        return node

    def addend(self):
        node = self.multiplier()
        while self.at_op("*", "/"):
            op = self.next().value
            node = MathOp(op, node, self.multiplier())
        return node

    def multiplier(self):
        node = self.primary()
        while self.at_op("["):
            self.next()
            key = self.index_key()
            self.expect_op("]")
            node = Index(node, key)
        return node

    def index_key(self):
        t = self.next()
        if t.kind in ("STRING", "INT"):
            return t.value
        raise OTTLSyntaxError(f"invalid index key {t.value!r} in {self.src!r}")

    def primary(self):
        t = self.peek()
        if t.kind == "STRING":
            self.next()
            return Literal(t.value, "string")
        if t.kind == "INT":
            self.next()
            return Literal(t.value, "int")
        if t.kind == "FLOAT":
            self.next()
            return Literal(t.value, "float")
        if t.kind == "BYTES":
            self.next()
            return Literal(t.value, "bytes")
        if t.kind == "TRUE":
            self.next()
            return Literal(True, "bool")
        if t.kind == "FALSE":
            self.next()
            return Literal(False, "bool")
        if t.kind == "NIL":
            self.next()
            return Literal(None, "nil")
        if t.kind == "UIDENT":
            self.next()
            if self.at_op("("):
                return self.func_args(t.value)
            # bare uppercase identifier = enum symbol (folded at parse time,
            # `pkg/ottl/LANGUAGE.md:190-194`)
            return Literal(t.value, "enum")
        if t.kind == "IDENT":
            self.next()
            if self.at_op("("):
                return self.func_args(t.value)
            return self.path_after(t.value)
        if self.at_op("("):
            self.next()
            inner = self.bool_expr()
            self.expect_op(")")
            return inner
        if self.at_op("["):
            return self.list_literal()
        if self.at_op("{"):
            return self.map_literal()
        raise OTTLSyntaxError(f"unexpected token {t.value!r} at {t.pos} in {self.src!r}")

    def map_literal(self):
        # map value expression (`pkg/ottl/LANGUAGE.md` map values:
        # {"k": v, ...}; values may be any expression incl. nested maps)
        self.expect_op("{")
        pairs = []
        if not self.at_op("}"):
            while True:
                kt = self.next()
                if kt.kind != "STRING":
                    raise OTTLSyntaxError(
                        f"map literal key must be a string, got {kt.value!r} in {self.src!r}"
                    )
                self.expect_op(":")
                pairs.append((kt.value, self.math_expr()))
                if not self.at_op(","):
                    break
                self.next()
        self.expect_op("}")
        return FuncCall("__map__", named=tuple(pairs))

    def list_literal(self):
        self.expect_op("[")
        items = []
        if not self.at_op("]"):
            items.append(self.math_expr())
            while self.at_op(","):
                self.next()
                items.append(self.math_expr())
        self.expect_op("]")
        return FuncCall("__list__", tuple(items))

    def path_after(self, first: str) -> Path:
        segments = [first]
        while self.at_op("."):
            self.next()
            t = self.next()
            if t.kind not in ("IDENT", "UIDENT"):
                raise OTTLSyntaxError(f"bad path segment {t.value!r} in {self.src!r}")
            segments.append(t.value)
        keys = []
        while self.at_op("["):
            self.next()
            keys.append(self.index_key())
            self.expect_op("]")
        return Path(tuple(segments), tuple(keys))

    def func_call(self, _is_editor: bool) -> FuncCall:
        t = self.next()
        return self.func_args(t.value)

    def func_args(self, name: str) -> FuncCall:
        self.expect_op("(")
        args: list = []
        named: list = []
        if not self.at_op(")"):
            self._one_arg(args, named)
            while self.at_op(","):
                self.next()
                self._one_arg(args, named)
        self.expect_op(")")
        return FuncCall(name, tuple(args), tuple(named))

    def _one_arg(self, args: list, named: list) -> None:
        # optional named argument:  name = value
        t = self.peek()
        if (
            t.kind == "IDENT"
            and self.toks[self.i + 1].kind == "OP"
            and self.toks[self.i + 1].value == "="
        ):
            self.next()
            self.next()
            named.append((t.value, self.bool_expr()))
        else:
            args.append(self.bool_expr())


def parse_statement(src: str) -> Statement:
    return _Parser(src).statement()


def parse_condition(src: str):
    return _Parser(src).condition()

"""OTTL tokenizer (token rules: `pkg/ottl/grammar.go:470-494`).

Token kinds: STRING, INT, FLOAT, BYTES, IDENT (lowercase-led), UIDENT
(uppercase-led: converters + enums), punctuation/operators, keywords
(where/and/or/not/true/false/nil).
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass(frozen=True)
class Token:
    kind: str
    value: object
    pos: int


class OTTLSyntaxError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+)
  | (?P<BYTES>0x(?:[0-9a-fA-F]{2})+)
  | (?P<FLOAT>-?\d+\.\d+)
  | (?P<INT>-?\d+)
  | (?P<STRING>"(?:\\.|[^"\\])*")
  | (?P<IDENT>[a-z_][a-zA-Z0-9_]*)
  | (?P<UIDENT>[A-Z][a-zA-Z0-9_]*)
  | (?P<OP>==|!=|<=|>=|<|>|\+|\-|\*|/|\(|\)|\[|\]|\{|\}|:|,|\.|=)
    """,
    re.VERBOSE,
)

_KEYWORDS = {"where", "and", "or", "not", "true", "false", "nil"}

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\"}


def _unquote(s: str) -> str:
    body = s[1:-1]
    out: list[str] = []
    i = 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            out.append(_ESCAPES.get(body[i + 1], body[i + 1]))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def tokenize(src: str) -> list[Token]:
    tokens: list[Token] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise OTTLSyntaxError(f"unexpected character {src[pos]!r} at {pos}: {src}")
        kind = m.lastgroup
        text = m.group()
        # '-' after a value-ending token is binary minus, not a negative
        # literal (a - 1 must lex as IDENT OP INT)
        if (
            kind in ("INT", "FLOAT")
            and text.startswith("-")
            and tokens
            and (
                tokens[-1].kind in ("INT", "FLOAT", "IDENT", "UIDENT", "STRING")
                or (tokens[-1].kind == "OP" and tokens[-1].value in (")", "]"))
            )
        ):
            tokens.append(Token("OP", "-", pos))
            pos += 1
            continue
        if kind == "WS":
            pass
        elif kind == "STRING":
            tokens.append(Token("STRING", _unquote(text), pos))
        elif kind == "INT":
            tokens.append(Token("INT", int(text), pos))
        elif kind == "FLOAT":
            tokens.append(Token("FLOAT", float(text), pos))
        elif kind == "BYTES":
            tokens.append(Token("BYTES", bytes.fromhex(text[2:]), pos))
        elif kind == "IDENT" and text in _KEYWORDS:
            tokens.append(Token(text.upper(), text, pos))
        else:
            tokens.append(Token(kind, text, pos))
        pos = m.end()
    tokens.append(Token("EOF", None, pos))
    return tokens

"""Parse stage — stanza regex/json parser semantics as Catalyst expressions.

Reference semantics being reproduced:
- regex parser with named capture groups writing fields into attributes
  (`pkg/stanza/operator/parser/regex/parser.go:46-63`). The reference memoizes
  per-row regex results in an LRU cache; vectorized `regexp_extract` makes
  that unnecessary.
- on_error=send semantics (`pkg/stanza/operator/helper/parser.go:26-35`):
  unparseable rows pass through with parse fields empty/null and a
  ``parse_ok`` flag — they are not dropped (drop mode = `.filter(parse_ok)`).
- embedded JSON parsing (`pkg/stanza/operator/parser/json`) via
  ``get_json_object`` — stays inside whole-stage codegen.

Everything here is a plain Column program: Catalyst pushes the regexes into
one projection over the scan; no Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The canonical transcript log-line grammar (datagen.py writes it; real
# deployments configure their own field specs).
LEVEL_RE = r"^(INFO|ERROR|WARN|DEBUG) "
ACTION_RE = r"action=([a-z_]+)"
LATENCY_RE = r"latency_ms=([0-9]+)"
STATUS_RE = r"status=([a-z]+)"
MSG_RE = r'msg="([^"]*)"'
PROPS_RE = r"props=(\{.*\})$"


def _nullable_extract(col: Column, pattern: str) -> Column:
    """regexp_extract returns '' on no-match; normalize to NULL like the
    reference leaves absent attributes unset."""
    return F.nullif(F.regexp_extract(col, pattern, 1), F.lit(""))


def parse_transcripts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Structured fields out of the log-line-shaped ``text`` column."""
    text = F.col(text_col)
    return (
        df.withColumn("level", _nullable_extract(text, LEVEL_RE))
        .withColumn("action", _nullable_extract(text, ACTION_RE))
        .withColumn(
            "latency_ms",
            _nullable_extract(text, LATENCY_RE).cast("bigint"),
        )
        .withColumn("status", _nullable_extract(text, STATUS_RE))
        .withColumn("msg", _nullable_extract(text, MSG_RE))
        .withColumn(
            "prop_k",
            F.get_json_object(F.regexp_extract(text, PROPS_RE, 1), "$.k").cast(
                "bigint"
            ),
        )
        .withColumn("parse_ok", F.col("level").isNotNull())
    )


def parse_fields(
    df: DataFrame,
    field_patterns: dict[str, tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Generic regex parser: ``{out_col: (pattern, cast_type)}``.

    Mirrors the stanza regex parser's parse_from/parse_to contract with
    arbitrary user patterns; one Catalyst projection, no UDFs.
    """
    text = F.col(text_col)
    for out, (pattern, cast_type) in field_patterns.items():
        c = _nullable_extract(text, pattern)
        if cast_type and cast_type != "string":
            c = c.cast(cast_type)
        df = df.withColumn(out, c)
    return df

"""Enrich stage — attributesprocessor actions + broadcast-join lookups.

Reference semantics:
- attributesprocessor / resourceprocessor action engine
  (`internal/coreinternal/attraction/attraction.go:110-139,287-365`):
  insert (only if absent), update (only if present), upsert, delete, hash,
  extract (regex named groups), convert. On a typed flat table these are
  column expressions; `insert`/`update` guards become ``coalesce``/``when``.
- geoip/k8sattributes lookup enrichment
  (`processor/geoipprocessor/geoip_processor.go:29-94`,
  `processor/k8sattributesprocessor/config.go:140-170`): a key column looked
  up in a small static dimension → **broadcast left-outer hash join**. The
  dimension ships to every executor once; no shuffle of the fact table, which
  is the only plan that survives a 100 TB scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lookup_enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Broadcast left join of a small dimension onto the fact table."""
    return fact.join(F.broadcast(dim), on=on, how=how)


# --- attributesprocessor actions over plain columns ------------------------


def insert(df: DataFrame, col: str, value: Column) -> DataFrame:
    """Set only if currently NULL (attraction.go INSERT)."""
    if col in df.columns:
        return df.withColumn(col, F.coalesce(F.col(col), value))
    return df.withColumn(col, value)


def update(df: DataFrame, col: str, value: Column) -> DataFrame:
    """Set only if currently present (attraction.go UPDATE)."""
    if col not in df.columns:
        return df
    return df.withColumn(col, F.when(F.col(col).isNotNull(), value))


def upsert(df: DataFrame, col: str, value: Column) -> DataFrame:
    """Unconditional set (attraction.go UPSERT)."""
    return df.withColumn(col, value)


def delete(df: DataFrame, cols: list[str]) -> DataFrame:
    return df.drop(*cols)


def hash_attr(df: DataFrame, col: str) -> DataFrame:
    """SHA-256 the value in place (attraction.go HASH uses sha2-256)."""
    return df.withColumn(col, F.sha2(F.col(col).cast("string"), 256))


def extract(df: DataFrame, source: str, pattern: str, groups: list[str]) -> DataFrame:
    """Regex named-capture extract into new columns (attraction.go EXTRACT)."""
    for i, g in enumerate(groups, start=1):
        df = df.withColumn(g, F.nullif(F.regexp_extract(F.col(source), pattern, i), F.lit("")))
    return df


def convert(df: DataFrame, col: str, to_type: str) -> DataFrame:
    return df.withColumn(col, F.col(col).cast(to_type))


def apply_attribute_actions(df: DataFrame, actions: list[dict]) -> DataFrame:
    """Config-driven action list — the attributesprocessor contract
    (`processor/attributesprocessor/config.go`, actions applied in order,
    `attraction.go:110-139`). Each action dict:

      {action: insert|update|upsert|delete|hash|extract|convert,
       key: <column>, value: <literal> | from_attribute: <column> |
       pattern: <regex> (extract) | converted_type: <type> (convert)}
    """
    for a in actions:
        kind = a["action"]
        key = a.get("key")
        if "from_attribute" in a:
            value = F.col(a["from_attribute"])
        elif "value" in a:
            value = F.lit(a["value"])
        else:
            value = None
        if kind == "insert":
            df = insert(df, key, value)
        elif kind == "update":
            df = update(df, key, value)
        elif kind == "upsert":
            df = upsert(df, key, value)
        elif kind == "delete":
            df = delete(df, [key])
        elif kind == "hash":
            df = hash_attr(df, key)
        elif kind == "extract":
            df = extract(df, key, a["pattern"], a["groups"])
        elif kind == "convert":
            df = convert(df, key, a["converted_type"])
        else:
            raise ValueError(f"unknown attributes action {kind!r}")
    return df

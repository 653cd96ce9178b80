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

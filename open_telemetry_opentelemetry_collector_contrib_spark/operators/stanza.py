"""stanza field transformers + schema/resourcedetection processors.

Transformers (`pkg/stanza/operator/transformer/*`): add, copy, move, remove,
retain, assign_keys, unquote, noop — all single-column operations with an
optional ``if`` gate (`pkg/stanza/operator/helper/transformer.go:27-31`).

schemaprocessor (`processor/schemaprocessor/`): attribute-name translation
across semconv versions = a rename mapping.

resourcedetectionprocessor (`processor/resourcedetectionprocessor/config.go:28-40`):
ordered detector list attaching env/host metadata as constant columns,
resolved at driver startup (detectors run once on the driver, never per row).
"""

from __future__ import annotations

import os
import platform
import socket

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _gate(df: DataFrame, col: str, new: Column, condition: Column | None) -> DataFrame:
    if condition is None:
        return df.withColumn(col, new)
    old = F.col(col) if col in df.columns else F.lit(None)
    return df.withColumn(col, F.when(condition, new).otherwise(old))


def add(df: DataFrame, field: str, value, condition: Column | None = None) -> DataFrame:
    v = value if isinstance(value, Column) else F.lit(value)
    return _gate(df, field, v, condition)


def copy_field(df: DataFrame, src: str, dst: str, condition: Column | None = None) -> DataFrame:
    return _gate(df, dst, F.col(src), condition)


def move(df: DataFrame, src: str, dst: str) -> DataFrame:
    return df.withColumn(dst, F.col(src)).drop(src)


def remove(df: DataFrame, fields: list[str]) -> DataFrame:
    return df.drop(*fields)


def retain(df: DataFrame, fields: list[str]) -> DataFrame:
    return df.select(*fields)


def assign_keys(df: DataFrame, array_col: str, keys: list[str]) -> DataFrame:
    """array column -> named columns (jsonarray/csv headerless output).
    Short rows yield NULL for the missing tail fields (on_error=send)."""
    for i, k in enumerate(keys):
        df = df.withColumn(k, F.try_element_at(F.col(array_col), F.lit(i + 1)))
    return df


def unquote(df: DataFrame, field: str) -> DataFrame:
    c = F.col(field)
    quoted = (
        (c.startswith('"') & c.endswith('"')) | (c.startswith("'") & c.endswith("'"))
    ) & (F.length(c) >= 2)
    return df.withColumn(
        field, F.when(quoted, F.substring(c, 2, F.length(c) - 2)).otherwise(c)
    )


def schema_rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """schemaprocessor: semconv attribute-name translation."""
    for old, new in mapping.items():
        if old in df.columns:
            df = df.withColumnRenamed(old, new)
    return df


def detect_resource(df: DataFrame, detectors: list[str] | None = None) -> DataFrame:
    """resourcedetection: constant columns resolved once at plan time."""
    detectors = detectors or ["env", "system"]
    for d in detectors:
        if d == "env":
            for k, col_name in (("SPARK_GRAFT_ENV", "deployment_environment"),):
                if os.environ.get(k):
                    df = df.withColumn(col_name, F.lit(os.environ[k]))
        elif d == "system":
            df = df.withColumn("host_name", F.lit(socket.gethostname()))
            df = df.withColumn("os_type", F.lit(platform.system().lower()))
        else:
            raise ValueError(f"unknown detector {d!r}")
    return df

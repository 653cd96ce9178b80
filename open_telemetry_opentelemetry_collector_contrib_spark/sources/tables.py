"""Parquet table sources for the driver test-data star schema.

The reference ingests from files/network (``receiver/filelogreceiver``,
``pkg/stanza/operator/input/*``); a table engine ingests from columnar scans.
``spark.read.parquet`` gives Catalyst predicate pushdown + column pruning for
free, which the reference's row-at-a-time readers cannot do.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each parquet table as a temp view (idempotent)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

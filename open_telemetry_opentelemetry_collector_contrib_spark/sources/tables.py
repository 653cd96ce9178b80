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


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    return spread_scan(df) if spread else df


def spread_scan(df: DataFrame, target: int | None = None) -> DataFrame:
    """Scale-adaptive scan widening for compute-heavy downstream stages.

    A Spark stage's parallelism before the first exchange is bounded by the
    scan's split count, and a parquet file is splittable only at row-group
    boundaries — so a small single-row-group file pins every pre-shuffle
    operator (shingle explodes, regex parses, per-gram hashing) to ONE task
    no matter how many cores the cluster has (guide §2/§6; the same lesson
    the 500k-doc scale gate recorded as "input file count bounds post-explode
    parallelism"). When the scan yields fewer partitions than the session's
    parallelism, insert one round-robin repartition of the RAW rows (bytes
    moved = the input itself, trivial by construction: the guard only fires
    when the scan is small). On a production-scale input the scan already
    carries >= defaultParallelism splits and this is a no-op — the knob is
    derived from the data, not tuned to either local[32] or a cluster.
    """
    spark = df.sparkSession
    if target is None:
        target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def materialize(df: DataFrame) -> DataFrame:
    """Compute a DataFrame subtree once and reuse it across consumers.

    Spark has no DataFrame-subtree CSE: every ``.agg()``/join branch that
    derives from the same frame re-executes it from the scan up once column
    pruning specializes the scans (BASELINE round-5 audit). For stats+apply
    operators whose shared frame is consumed 2-5 times, a LOCAL checkpoint
    truncates the lineage so the shared work runs exactly once (guide §3.3
    / §5). ``localCheckpoint`` (not ``persist``) on purpose: persist
    registers the plan in the session CacheManager, so a *fresh* identical
    query in the same session would silently reuse the previous run's
    cached data — cross-run result caching the bench must never do. A lazy
    local checkpoint is object-tied: every fresh ``queries()`` DataFrame
    recomputes it from the parquet inputs, and within one query plan all
    consumers share the one materialization (MEMORY_AND_DISK, spills).
    """
    return df.localCheckpoint(eager=False)


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each parquet table as a temp view (idempotent)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

"""Custom join operators the reference implies but Spark lacks natively.

- range_lookup: geoipprocessor's real shape
  (`processor/geoipprocessor/internal/provider/maxmindprovider/provider.go`)
  is an IP-range (CIDR) table lookup, not an equi-join. A naive theta-join
  (start <= v AND v <= end) is a BroadcastNestedLoopJoin — O(rows x ranges).
  The scalable form explodes each range into fixed-width buckets and
  equi-joins on the bucket id: shuffle-free with a broadcast dim, and the
  per-row work is O(ranges overlapping the bucket).

- asof_join: enrich each event with the latest dimension state at-or-before
  its timestamp (slowly-changing dimension; the k8sattributes informer-cache
  semantics over time). Implemented with the union + last_value window
  technique: one shuffle on (key), no UDF, no per-row search.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_lookup(
    fact: DataFrame,
    ranges: DataFrame,
    value_col: str,
    id_col: str,
    start_col: str = "start",
    end_col: str = "end",
    bucket_width: int = 1024,
    how: str = "left",
) -> DataFrame:
    """Attach range-table attributes to rows whose ``value_col`` falls in
    [start, end]. Ranges must be non-overlapping (CIDR tables are).

    Returns fact columns + the range table's non-bound columns (NULL when no
    range matches and how='left').
    """
    payload_cols = [
        c for c in ranges.columns if c not in (start_col, end_col)
    ]
    exploded = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.col(start_col) / bucket_width).cast("long"),
                (F.col(end_col) / bucket_width).cast("long"),
            )
        ),
    )
    keyed = fact.withColumn(
        "__bucket", (F.col(value_col) / bucket_width).cast("long")
    )
    matched = (
        keyed.join(F.broadcast(exploded), "__bucket")
        .filter(
            (F.col(value_col) >= F.col(start_col))
            & (F.col(value_col) <= F.col(end_col))
        )
        .select(id_col, *payload_cols)
    )
    if how == "inner":
        return keyed.drop("__bucket").join(matched, id_col)
    return fact.join(matched, id_col, "left")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
) -> DataFrame:
    """For each left row: the right row with the greatest ts <= left.ts for
    the same key (NULLs when no prior state exists).

    union + last_value(ignorenulls) over Window.partitionBy(key).orderBy(ts,
    side): one shuffle on the key; right rows sort before left rows at equal
    timestamps so state taking effect at t applies to events at t.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, ts_col)
    ]
    l_tag = left.select(
        *left.columns,
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    )
    r_tag = right.select(
        F.col(key),
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in (key, ts_col)],
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    ).select(*l_tag.columns)  # align column order
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[c for c in left.columns],
        F.col("__side"),
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")

"""logdedupprocessor — collapse identical records within an interval.

Reference semantics (`processor/logdedupprocessor/processor.go:85-157`,
`config.go:42-48`):
- dedup key = hash of the record minus ``exclude_fields``
  (`counter.go:156-196`, xxhash of body+severity+attributes);
- within each flush ``interval``, one representative record is emitted with a
  ``log_count`` attribute and first/last observed timestamps;
- OTTL ``conditions`` select which records participate; non-matching records
  pass through unchanged.

Spark: `groupBy(window, key).agg(first, count)` — the arrival-time interval
becomes a data-time tumbling window (deterministic). The representative is
the *earliest* record per key (reference keeps the first seen), made
deterministic with min_by over (ts, turn order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .aggregate import tumbling_window_id


def dedup_key(df: DataFrame, exclude_fields: list[str]) -> Column:
    """xxhash64 over all non-excluded columns (order-stable: sorted names)."""
    cols = [c for c in sorted(df.columns) if c not in exclude_fields]
    return F.xxhash64(*[F.col(c).cast("string") for c in cols])


def logdedup(
    df: DataFrame,
    interval_s: int,
    exclude_fields: list[str] | None = None,
    ts_col: str = "ts",
    condition: Column | None = None,
    count_col: str = "log_count",
    order_col: str | None = None,
) -> DataFrame:
    """Returns deduped matching records + untouched non-matching records.

    Output schema = input schema + count_col (+ first/last epoch seconds).
    """
    exclude_fields = list(exclude_fields or []) + [ts_col]
    if order_col:
        exclude_fields.append(order_col)
    key = dedup_key(df, exclude_fields)

    matching = df.filter(condition) if condition is not None else df
    passthrough = df.filter(~F.coalesce(condition, F.lit(False))) if condition is not None else None

    keyed = matching.withColumn("__dedup_key", key).withColumn(
        "__window", tumbling_window_id(F.col(ts_col), interval_s)
    )
    order = F.struct(
        F.col(ts_col), *( [F.col(order_col)] if order_col else [] )
    )
    data_cols = [c for c in df.columns]
    agg = (
        keyed.groupBy("__window", "__dedup_key")
        .agg(
            F.min_by(F.struct(*data_cols), order).alias("__rep"),
            F.count(F.lit(1)).alias(count_col),
            F.min(F.unix_timestamp(F.col(ts_col))).alias("first_observed_s"),
            F.max(F.unix_timestamp(F.col(ts_col))).alias("last_observed_s"),
        )
        .select(
            F.col("__window").alias("window_id"),
            "__rep.*",
            count_col,
            "first_observed_s",
            "last_observed_s",
        )
    )
    if passthrough is not None:
        passthrough = (
            passthrough.withColumn("window_id", tumbling_window_id(F.col(ts_col), interval_s))
            .withColumn(count_col, F.lit(1).cast("long"))
            .withColumn("first_observed_s", F.unix_timestamp(F.col(ts_col)))
            .withColumn("last_observed_s", F.unix_timestamp(F.col(ts_col)))
            .select(*agg.columns)
        )
        agg = agg.unionByName(passthrough)
    return agg

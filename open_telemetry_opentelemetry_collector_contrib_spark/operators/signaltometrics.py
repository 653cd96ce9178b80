"""signaltometricsconnector + countconnector multi-metric-def semantics.

- countconnector config carries a *list* of metric definitions, each with
  OTTL conditions (OR), grouping attributes with optional default_value, and
  a metric name (`connector/countconnector/config.go:34-52`);
- signaltometricsconnector generalizes: OTTL conditions select rows, keys
  define dimensions, and the value is count / sum(attribute) / histogram.

Here each definition compiles to one aggregation over the shared input;
definitions are unioned into a long-format metrics frame
(metric_name, window_id, dims map, value). Catalyst computes the shared
upstream once per cached input.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..ottl import LogContext
from ..ottl.compiler import compile_conditions_or
from .aggregate import tumbling_window_id


@dataclass
class MetricDef:
    name: str
    kind: str = "count"  # 'count' | 'sum'
    conditions: list[str] = field(default_factory=list)  # OTTL, OR-composed
    keys: list[str] = field(default_factory=list)
    defaults: dict[str, str] = field(default_factory=dict)
    source: str | None = None  # value column for 'sum'


def signal_to_metrics(
    df: DataFrame,
    defs: list[MetricDef],
    window_s: int = 3600,
    ts_col: str = "ts",
) -> DataFrame:
    """Long-format metric frame: (metric_name, window_id, dims, value)."""
    outs = []
    for d in defs:
        cur = df
        if d.conditions:
            ctx = LogContext(cur)
            cur = cur.filter(
                F.coalesce(compile_conditions_or(d.conditions, ctx), F.lit(False))
            )
        key_cols = []
        for k in d.keys:
            c = F.col(k).cast("string")
            if k in d.defaults:
                c = F.coalesce(c, F.lit(d.defaults[k]))
            else:
                cur = cur.filter(F.col(k).isNotNull())  # counter.go:70-73
            key_cols.append(c.alias(k))
        value = (
            F.count(F.lit(1)).cast("double")
            if d.kind == "count"
            else F.sum(F.col(d.source).cast("double"))
        )
        agg = (
            cur.withColumn("window_id", tumbling_window_id(F.col(ts_col), window_s))
            .groupBy("window_id", *key_cols)
            .agg(value.alias("value"))
        )
        dims = F.map_from_arrays(
            F.array(*[F.lit(k) for k in d.keys]),
            F.array(*[F.col(k) for k in d.keys]),
        ) if d.keys else F.create_map().cast("map<string,string>")
        outs.append(
            agg.select(
                F.lit(d.name).alias("metric_name"),
                "window_id",
                dims.alias("dims"),
                "value",
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result

"""OTTL metric/datapoint transform contexts.

Path surface reproduced from the reference contexts
(`pkg/ottl/contexts/internal/metric.go:35-47`,
`pkg/ottl/contexts/ottldatapoint/datapoint.go:189-259`): the metric-level
paths (``metric.name``, ``metric.description``, ``metric.unit``,
``metric.type``, ``metric.aggregation_temporality``,
``metric.is_monotonic``) and the datapoint-level paths (``time``,
``start_time``, ``*_unix_nano``, ``value_int``, ``value_double``,
``count``, ``sum``, ``bucket_counts``, ``explicit_bounds``, ``flags``,
``scale``, ``zero_count``), plus the inherited attributes/resource/cache
paths.

Canonical frame conventions (denormalized: one row per datapoint, metric
metadata replicated per row — the same flattening the log/resource contexts
use, with identical results):
- ``metric_name`` (or ``name``), ``description``, ``unit`` — strings;
- ``metric_type`` — pmetric.MetricType int (enum symbols below);
- ``temporality`` — pmetric.AggregationTemporality int;
- ``is_monotonic`` — boolean;
- ``ts``/``start_ts`` — timestamps; ``value_int``/``value_double`` (with
  ``vi``/``vd`` accepted as short forms); histogram fields by their
  reference names.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .ast import Path
from .compiler import LogContext, OTTLCompileError, TypedCol

# `pkg/ottl/contexts/internal/metric.go:18-28` + datapoint FLAG symbols
# (`ottldatapoint/datapoint.go:160-161`)
METRIC_ENUMS: dict[str, int] = {
    "AGGREGATION_TEMPORALITY_UNSPECIFIED": 0,
    "AGGREGATION_TEMPORALITY_DELTA": 1,
    "AGGREGATION_TEMPORALITY_CUMULATIVE": 2,
    "METRIC_DATA_TYPE_NONE": 0,
    "METRIC_DATA_TYPE_GAUGE": 1,
    "METRIC_DATA_TYPE_SUM": 2,
    "METRIC_DATA_TYPE_HISTOGRAM": 3,
    "METRIC_DATA_TYPE_EXPONENTIAL_HISTOGRAM": 4,
    "METRIC_DATA_TYPE_SUMMARY": 5,
    "FLAG_NONE": 0,
    "FLAG_NO_RECORDED_VALUE": 1,
}

_METRIC_FIELDS = {
    # metric.<path> -> (candidate columns, ottl type)
    "name": (("metric_name", "name"), "string"),
    "description": (("description",), "string"),
    "unit": (("unit",), "string"),
    "type": (("metric_type", "mtype"), "int"),
    "aggregation_temporality": (("temporality", "aggregation_temporality"), "int"),
    "is_monotonic": (("is_monotonic",), "bool"),
}

_VALUE_ALIASES = {
    "value_int": ("value_int", "vi"),
    "value_double": ("value_double", "vd"),
}


class DataPointContext(LogContext):
    """Resolves OTTL datapoint-context paths (with ``metric.*`` parent
    access) against a denormalized datapoint frame."""

    BUILTIN = {
        ("time",): ("ts", "time"),
        ("start_time",): ("start_ts", "time"),
    }

    def _first_col(self, names, t: str, what: str) -> TypedCol:
        for n in names:
            if n in self.schema:
                c = self._col(n)
                return TypedCol(c.col, t)
        raise OTTLCompileError(f"no {what} column (any of {names}) on this frame")

    def resolve(self, path: Path) -> TypedCol:
        segs, keys = path.segments, path.keys
        if segs and segs[0] == "metric":
            if len(segs) != 2 or segs[1] not in _METRIC_FIELDS:
                raise OTTLCompileError(
                    f"unknown metric path {'.'.join(segs)}"
                )
            names, t = _METRIC_FIELDS[segs[1]]
            return self._first_col(names, t, f"metric.{segs[1]}")
        if segs in (("value_int",), ("value_double",)):
            names = _VALUE_ALIASES[segs[0]]
            t = "int" if segs[0] == "value_int" else "float"
            tc = self._first_col(names, t, segs[0])
            cast = "long" if t == "int" else "double"
            return TypedCol(tc.col.cast(cast), t)
        if segs == ("time_unix_nano",):
            return TypedCol(
                F.unix_micros(F.col("ts").cast("timestamp")) * 1000, "int"
            )
        if segs == ("start_time_unix_nano",):
            return TypedCol(
                F.unix_micros(F.col("start_ts").cast("timestamp")) * 1000, "int"
            )
        if segs == ("flags",):
            if "flags" in self.schema:
                return self._col("flags")
            return TypedCol(F.lit(0).cast("long"), "int")
        return super().resolve(path)

    def target_kind(self, path: Path) -> tuple[str, str]:
        segs, keys = path.segments, path.keys
        if segs and segs[0] == "metric" and len(segs) == 2:
            names, _t = _METRIC_FIELDS.get(segs[1], ((), ""))
            for n in names:
                if n in self.schema:
                    return "column", n
            if names:
                return "column", names[0]
        if segs in (("value_int",), ("value_double",)):
            for n in _VALUE_ALIASES[segs[0]]:
                if n in self.schema:
                    return "column", n
            return "column", segs[0]
        return super().target_kind(path)


# metric_statements run on the same denormalized rows (the reference
# lowers metric-context statements onto each datapoint of the metric;
# `processor/transformprocessor/internal/metrics/processor.go`)
MetricContext = DataPointContext

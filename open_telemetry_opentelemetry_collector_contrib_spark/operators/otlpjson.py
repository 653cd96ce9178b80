"""otlpjsonconnector — structured re-parse of embedded OTLP/JSON batches.

The reference consumes log records whose BODY is a full OTLP/JSON `plog.Logs`
payload and re-emits the inner batch as structured telemetry
(`connector/otlpjsonconnector/logs.go:43-79`; signal routing by the
resourceLogs/resourceMetrics/resourceSpans marker regexes in
`connector.go:28-32`).

Spark-first mapping: `from_json` against the OTLP ResourceLogs schema, then
a triple explode (resourceLogs -> scopeLogs -> logRecords). The whole parse
stays in Catalyst (JsonToStructs + Generate) — no Python, one scan; at
100 TB the explode multiplies rows before any shuffle, so downstream aggs
see partial aggregation as usual.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# OTLP/JSON AnyValue subset (string/int/double/bool — the scalar types the
# JSON unmarshaler emits for attribute values; intValue is a STRING in
# OTLP/JSON per protobuf JSON mapping of int64)
_ANYVALUE = "struct<stringValue:string,intValue:string,doubleValue:double,boolValue:boolean>"
_KVLIST = f"array<struct<key:string,value:{_ANYVALUE}>>"

OTLP_LOGS_SCHEMA = (
    "struct<resourceLogs:array<struct<"
    f"resource:struct<attributes:{_KVLIST}>,"
    "scopeLogs:array<struct<"
    "scope:struct<name:string,version:string>,"
    "logRecords:array<struct<"
    "timeUnixNano:string,observedTimeUnixNano:string,"
    "severityNumber:int,severityText:string,"
    f"body:{_ANYVALUE},attributes:{_KVLIST},"
    "traceId:string,spanId:string>>"
    ">>>>>"
)

# signal marker regexes (connector.go:28-32)
LOGS_MARKER = r'"resourceLogs"\s*:'
METRICS_MARKER = r'"resourceMetrics"\s*:'
TRACES_MARKER = r'"resourceSpans"\s*:'


def _anyvalue_str(v: Column) -> Column:
    return F.coalesce(
        v["stringValue"],
        v["intValue"],
        v["doubleValue"].cast("string"),
        v["boolValue"].cast("string"),
    )


def _kv_to_map(kvs: Column) -> Column:
    return F.map_from_entries(
        F.transform(
            kvs,
            lambda e: F.struct(
                e["key"].alias("key"), _anyvalue_str(e["value"]).alias("value")
            ),
        )
    )


def explode_otlp_logs(
    df: DataFrame, body_col: str = "body", keep_cols: list[str] | None = None
) -> DataFrame:
    """Rows whose body embeds an OTLP/JSON Logs payload -> one row per inner
    logRecord with structured columns; metric/trace payloads and invalid
    bodies are skipped (logs.go:58-74)."""
    keep = keep_cols or []
    src = df.filter(F.col(body_col).rlike(LOGS_MARKER)).withColumn(
        "__otlp", F.from_json(F.col(body_col), OTLP_LOGS_SCHEMA)
    )
    rl = src.select(*keep, F.explode("__otlp.resourceLogs").alias("rl"))
    sl = rl.select(*keep, "rl", F.explode("rl.scopeLogs").alias("sl"))
    lr = sl.select(*keep, "rl", "sl", F.explode("sl.logRecords").alias("lr"))
    return lr.select(
        *keep,
        _kv_to_map(F.col("rl.resource.attributes")).alias("resource_attrs"),
        F.col("sl.scope.name").alias("scope_name"),
        F.col("lr.timeUnixNano").cast("long").alias("time_unix_nano"),
        F.col("lr.severityNumber").alias("severity_number"),
        F.col("lr.severityText").alias("severity_text"),
        _anyvalue_str(F.col("lr.body")).alias("body"),
        _kv_to_map(F.col("lr.attributes")).alias("attributes"),
        F.col("lr.traceId").alias("trace_id"),
        F.col("lr.spanId").alias("span_id"),
    )

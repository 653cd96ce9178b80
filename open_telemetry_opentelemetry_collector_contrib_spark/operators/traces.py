"""Trace-family operators: span derivation, groupbytrace, tailsampling,
servicegraph, exceptions connector.

The transcript table has no native spans; ``spanify_transcripts`` derives a
span-shaped frame (trace = conversation, span = turn, parent = previous
turn) deterministically, which is exactly the cross-engine-checkable input
these operators need.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def spanify_transcripts(parsed: DataFrame) -> DataFrame:
    """(trace_id, span_id, parent_span_id, service, status, duration_ms, ts).

    service = role; duration = latency_ms; parent = previous turn in the
    conversation (deterministic lag over the canonical turn order).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    return parsed.select(
        F.col("conv_id").alias("trace_id"),
        F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")).alias("span_id"),
        F.lag(
            F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string"))
        ).over(w).alias("parent_span_id"),
        F.col("role").alias("service"),
        F.col("status"),
        F.col("latency_ms").alias("duration_ms"),
        F.col("ts"),
        F.col("turn_idx"),
    )


def group_by_trace(spans: DataFrame, max_spans: int | None = None) -> DataFrame:
    """groupbytraceprocessor (`processor/groupbytraceprocessor/processor.go:27-91`):
    assemble complete traces. The reference buffers by wait_duration and
    shards workers by traceID hash; in batch the shuffle key IS the traceID
    hash, and completeness is guaranteed by the bounded input. Emits one row
    per trace with the ordered span list."""
    member = F.struct(F.col("turn_idx").alias("o"), F.col("span_id").alias("s"))
    agg = spans.groupBy("trace_id").agg(
        F.count(F.lit(1)).alias("span_count"),
        F.transform(F.array_sort(F.collect_list(member)), lambda x: x["s"]).alias(
            "span_ids"
        ),
        F.max("duration_ms").alias("max_duration_ms"),
        F.sum(F.when(F.col("status") == "err", 1).otherwise(0)).alias("error_spans"),
    )
    if max_spans is not None:
        agg = agg.filter(F.col("span_count") <= max_spans)
    return agg


def tail_sample(
    spans: DataFrame,
    latency_threshold_ms: int | None = None,
    error_status: str = "err",
    sample_percent: float = 10.0,
    seed: int = 22,
) -> DataFrame:
    """tailsamplingprocessor (`processor/tailsamplingprocessor/config.go:241-256`)
    with the canonical OR-composite policy set:
    - latency policy: keep the whole trace when any span exceeds the
      threshold;
    - status policy: keep traces containing an error span;
    - probabilistic policy: keep a deterministic hash percentage of the rest.
    Decision per trace (one aggregation), then a semi-join keeps every span
    of sampled traces — same shape as the reference's decision-then-release.
    """
    decisions = spans.groupBy("trace_id").agg(
        F.max(F.col("duration_ms")).alias("__max_lat"),
        F.max((F.col("status") == error_status).cast("int")).alias("__has_err"),
    )
    keep = F.col("__has_err") == 1
    if latency_threshold_ms is not None:
        keep = keep | (F.col("__max_lat") > latency_threshold_ms)
    bucket = F.pmod(F.xxhash64(F.col("trace_id"), F.lit(seed)), F.lit(10000))
    keep = keep | (bucket < int(sample_percent * 100))
    sampled = decisions.filter(keep).select("trace_id")
    return spans.join(sampled, "trace_id", "left_semi")


def service_graph(spans: DataFrame) -> DataFrame:
    """servicegraphconnector (`connector/servicegraphconnector/connector.go:61-113`):
    client->server edges from parent/child span matching, with request/error
    counts and duration stats per edge. Spark: one self-join on
    (trace_id, parent span id) — the reference's expiring in-memory edge
    store is replaced by the join shuffle."""
    clients = spans.select(
        F.col("trace_id"),
        F.col("span_id").alias("parent_id"),
        F.col("service").alias("client"),
    )
    servers = spans.select(
        F.col("trace_id"),
        F.col("parent_span_id").alias("parent_id"),
        F.col("service").alias("server"),
        F.col("status"),
        F.col("duration_ms"),
    ).filter(F.col("parent_id").isNotNull())
    edges = clients.join(servers, ["trace_id", "parent_id"])
    return edges.groupBy("client", "server").agg(
        F.count(F.lit(1)).alias("request_count"),
        F.sum(F.when(F.col("status") == "err", 1).otherwise(0)).alias("failed_count"),
        F.sum("duration_ms").alias("duration_sum_ms"),
        F.max("duration_ms").alias("duration_max_ms"),
    )


def exceptions_connector(
    parsed: DataFrame, window_s: int = 86400
) -> DataFrame:
    """exceptionsconnector (`connector/exceptionsconnector/connector_metrics.go:41-129`):
    count error events keyed by (service, operation, error type)."""
    from .aggregate import tumbling_window_id

    errors = parsed.filter(F.col("level") == "ERROR")
    return (
        errors.withColumn("window_id", tumbling_window_id(F.col("ts"), window_s))
        .groupBy("window_id", F.col("role").alias("service"), F.col("action").alias("exception_type"))
        .agg(F.count(F.lit(1)).alias("exception_count"))
    )

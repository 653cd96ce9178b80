"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes each implemented operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` carries the exact
DuckDB-ANSI-SQL twin. The flagship pipeline operates on a transcripts table
derived *deterministically* from the driver's ``events`` parquet (see
open_telemetry_opentelemetry_collector_contrib_spark/datagen.py) with
expressions that evaluate identically in Spark and DuckDB, so every stage is
value-hash checkable.

Timestamps are surfaced as epoch-second BIGINTs in compared outputs to avoid
engine-specific timestamp rendering in the hash.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from open_telemetry_opentelemetry_collector_contrib_spark import datagen
from open_telemetry_opentelemetry_collector_contrib_spark.plans import pipeline

# ---------------------------------------------------------------------------
# Spark-side queries
# ---------------------------------------------------------------------------

PARSE_COLS = [
    "conv_id",
    "turn_idx",
    "role",
    "tool",
    "level",
    "action",
    "latency_ms",
    "status",
    "msg",
    "prop_k",
    "parse_ok",
]

ENRICH_COLS = [
    "conv_id",
    "turn_idx",
    "role",
    "role_kind",
    "is_human",
    "priority",
    "tool",
    "tool_category",
    "tool_owner",
    "pipeline_tag",
]


def q_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = datagen.transcripts(spark, sf_dir)
    return t.select(
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        F.unix_timestamp("ts").alias("ts_s"),
    )


def q_pipeline_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.parsed(spark, sf_dir).select(*PARSE_COLS)


def q_pipeline_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.enriched(spark, sf_dir).select(*ENRICH_COLS)


def q_pipeline_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.routed(spark, sf_dir).select("conv_id", "turn_idx", "route")


def q_pipeline_sink_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipeline.sink_counts(spark, sf_dir)


def q_route_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spanmetrics latency-percentile analog, exact DISCRETE quantiles per
    route: one window pass (row_number + count over route) picks the
    ceil(p*n)-th order statistic for p in {0.5, 0.9, 0.99} plus max/count.
    Discrete (not interpolated) on purpose — integer order statistics are
    bit-portable across engines, where interpolated percentiles differ in
    double-arithmetic association and can flip a floored hash. Scale: no
    per-group collect; the only heavy step is the window shuffle on route,
    and the follow-up aggregate is route-cardinality-sized. Matches DuckDB
    ``quantile_disc`` (same ceil(p*n) element)."""
    from pyspark.sql import Window

    df = pipeline.routed(spark, sf_dir).filter(F.col("latency_ms").isNotNull())
    w = Window.partitionBy("route").orderBy("latency_ms")
    wn = Window.partitionBy("route")
    ranked = (
        df.select("route", "latency_ms")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wn))
    )

    def pick(p: float):
        return F.max(
            F.when(F.col("rn") == F.ceil(F.col("n") * F.lit(p)), F.col("latency_ms"))
        ).cast("bigint")

    return ranked.groupBy("route").agg(
        pick(0.5).alias("p50_ms"),
        pick(0.9).alias("p90_ms"),
        pick(0.99).alias("p99_ms"),
        F.max("latency_ms").cast("bigint").alias("max_ms"),
        F.count("*").cast("bigint").alias("n_turns"),
    )


def q_pipeline_sum_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from open_telemetry_opentelemetry_collector_contrib_spark.operators import (
        aggregate as agg_ops,
    )

    return agg_ops.windowed_sum(
        pipeline.routed(spark, sf_dir),
        keys=["route", "role"],
        source_col="latency_ms",
        window_s=pipeline.WINDOW_S,
        condition=F.col("latency_ms").isNotNull(),
        sum_col="total_latency_ms",
    )


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (shares the transcripts CTE with the Spark side)
# ---------------------------------------------------------------------------

_PREFIX = datagen.duckdb_cte_prefix()

_PARSED_CTE = r"""
, parsed AS (
  SELECT conv_id, turn_idx, role, tool, ts,
    nullif(regexp_extract(text, '^(INFO|ERROR|WARN|DEBUG) ', 1), '') AS level,
    nullif(regexp_extract(text, 'action=([a-z_]+)', 1), '') AS action,
    CAST(nullif(regexp_extract(text, 'latency_ms=([0-9]+)', 1), '') AS BIGINT) AS latency_ms,
    nullif(regexp_extract(text, 'status=([a-z]+)', 1), '') AS status,
    nullif(regexp_extract(text, 'msg="([^"]*)"', 1), '') AS msg,
    CAST(json_extract_string(nullif(regexp_extract(text, 'props=(\{.*\})$', 1), ''), '$.k') AS BIGINT) AS prop_k,
    nullif(regexp_extract(text, '^(INFO|ERROR|WARN|DEBUG) ', 1), '') IS NOT NULL AS parse_ok
  FROM transcripts_cte
)
"""

_ENRICHED_CTE = (
    _PARSED_CTE
    + f"""
, enriched AS (
  SELECT p.*, rd.role_kind, rd.is_human, rd.priority,
         coalesce(td.tool_category, 'unknown') AS tool_category,
         coalesce(td.tool_owner, 'unknown') AS tool_owner,
         'otelcol-spark' AS pipeline_tag
  FROM parsed p
  LEFT JOIN {datagen.role_dim_values_sql().replace('__t', 'rd')} ON p.role = rd.role
  LEFT JOIN {datagen.tool_dim_values_sql().replace('__t', 'td')} ON p.tool = td.tool
)
"""
)

_ROUTED_CTE = (
    _ENRICHED_CTE
    + """
, routed AS (
  SELECT *,
    CASE WHEN level = 'ERROR' OR status = 'err' THEN 'errors'
         WHEN role = 'tool' AND tool <> '' THEN 'tool_calls'
         WHEN is_human THEN 'human'
         ELSE 'default' END AS route
  FROM enriched
)
"""
)


def oracle_sql() -> dict[str, str]:
    from open_telemetry_opentelemetry_collector_contrib_spark.plans.catalog import (
        CATALOG_ORACLES,
    )
    from open_telemetry_opentelemetry_collector_contrib_spark.plans.catalog2 import (
        CATALOG2_ORACLES,
    )
    from open_telemetry_opentelemetry_collector_contrib_spark.plans.training_catalog import (
        TRAINING_ORACLES,
    )

    out = dict(CATALOG_ORACLES)
    out.update(CATALOG2_ORACLES)
    out.update(TRAINING_ORACLES)
    out.update(_flagship_oracles())
    return out


def _flagship_oracles() -> dict[str, str]:
    return {
        "transcripts": _PREFIX
        + "SELECT conv_id, turn_idx, role, text, tool, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM transcripts_cte",
        "pipeline_parse": _PREFIX
        + _PARSED_CTE
        + f"SELECT {', '.join(PARSE_COLS)} FROM parsed",
        "pipeline_enrich": _PREFIX
        + _ENRICHED_CTE
        + f"SELECT {', '.join(ENRICH_COLS)} FROM enriched",
        "pipeline_route": _PREFIX
        + _ROUTED_CTE
        + "SELECT conv_id, turn_idx, route FROM routed",
        "pipeline_sink_counts": _PREFIX
        + _ROUTED_CTE
        + f"""
SELECT CAST(floor(epoch(ts) / {pipeline.WINDOW_S}) AS BIGINT) AS window_id,
       route, conv_id, role, tool, count(*) AS n
FROM routed GROUP BY 1, 2, 3, 4, 5""",
        "pipeline_sum_latency": _PREFIX
        + _ROUTED_CTE
        + f"""
SELECT CAST(floor(epoch(ts) / {pipeline.WINDOW_S}) AS BIGINT) AS window_id,
       route, role, CAST(sum(latency_ms) AS BIGINT) AS total_latency_ms
FROM routed WHERE latency_ms IS NOT NULL GROUP BY 1, 2, 3""",
        # quantile_disc picks the same ceil(p*n)-th order statistic as the
        # Spark window row_number selection — integer-exact, no
        # interpolated-double parity risk
        "route_latency_quantiles": _PREFIX
        + _ROUTED_CTE
        + """
SELECT route,
       CAST(quantile_disc(latency_ms, 0.5) AS BIGINT) AS p50_ms,
       CAST(quantile_disc(latency_ms, 0.9) AS BIGINT) AS p90_ms,
       CAST(quantile_disc(latency_ms, 0.99) AS BIGINT) AS p99_ms,
       CAST(max(latency_ms) AS BIGINT) AS max_ms,
       CAST(count(*) AS BIGINT) AS n_turns
FROM routed WHERE latency_ms IS NOT NULL GROUP BY route""",
    }


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from open_telemetry_opentelemetry_collector_contrib_spark.plans.catalog import (
        CATALOG_QUERIES,
    )
    from open_telemetry_opentelemetry_collector_contrib_spark.plans.catalog2 import (
        CATALOG2_QUERIES,
    )
    from open_telemetry_opentelemetry_collector_contrib_spark.plans.training_catalog import (
        TRAINING_QUERIES,
    )

    out = dict(CATALOG_QUERIES)
    out.update(CATALOG2_QUERIES)
    out.update(TRAINING_QUERIES)
    out.update(_flagship_queries())
    # Stable priority ordering: queries whose driver correctness rows are
    # STALEST lead the dict so a prefix-sampling driver refreshes them first.
    # Round 4: the 23 queries whose last green row is CORRECTNESS_r02 lead,
    # then this round's changed/new queries (kind.string fix, recall gate),
    # then the flagship pipeline; relative order of the rest is unchanged.
    priority = [
        # last driver record r02 — refresh these first
        "aggregate_label_values",
        "aggregate_labels",
        "asof_join_scd",
        "container_parse",
        "count_with_defaults",
        "doc_quality",
        "exact_dedup",
        "fingerprint_docs",
        "lang_id",
        "metrics_calculate",
        "minhash_lsh_pairs",
        "ngram_jaccard_pairs",
        "range_lookup_geoip",
        "resource_detect",
        "schema_translate",
        "severity_map",
        "signal_to_metrics",
        "simhash_docs",
        "span_metrics_exponential",
        "syslog_parse",
        "syslog_rfc5424_parse",
        "token_counts",
        "uri_parse",
        # changed or new this round
        "span_context_transform",
        "ann_ivf_recall",
        "doc_repetition",
        "doc_tfidf",
        "boilerplate_turns",
        "route_latency_quantiles",
        "fuzzy_exact_dedup",
        "conv_quality",
        "conv_integrity",
        "conv_sessions",
        "dataset_split",
        "ann_quantized_topk",
        "expo_cumulative",
        # flagship + r3-new, keep fresh
        "pipeline_route",
        "pipeline_sink_counts",
        "pipeline_sum_latency",
        "transcripts",
        "pipeline_parse",
        "pipeline_enrich",
        "spanevent_context_transform",
        "metric_context_transform",
        "pack_sequences",
        "mix_sample_docs",
        "ann_cosine_ivf",
        "multimodal_features",
        "frame_sample_plan",
    ]
    ordered = {k: out[k] for k in priority if k in out}
    ordered.update(out)
    return ordered


def _flagship_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts": q_transcripts,
        "pipeline_parse": q_pipeline_parse,
        "pipeline_enrich": q_pipeline_enrich,
        "pipeline_route": q_pipeline_route,
        "pipeline_sink_counts": q_pipeline_sink_counts,
        "pipeline_sum_latency": q_pipeline_sum_latency,
        "route_latency_quantiles": q_route_latency_quantiles,
    }


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full parse→enrich→route→aggregate over sf0.001."""
    return pipeline.sink_counts(spark, "/root/testdata/sf0.001")

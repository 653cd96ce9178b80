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
    route via a counting-sort formulation: ``latency_ms`` is a bounded
    integer domain, so ``groupBy(route, latency_ms).count()`` (fully
    parallel, map-side combined) reduces the corpus to a tiny per-route
    value histogram; a cumulative sum over THAT histogram picks the
    ceil(p*n)-th order statistic (smallest value whose cumulative count
    reaches the rank) for p in {0.5, 0.9, 0.99} plus max/count. Discrete
    (not interpolated) on purpose — integer order statistics are
    bit-portable across engines, where interpolated percentiles differ in
    double-arithmetic association and can flip a floored hash. Scale: a
    ``Window.partitionBy(route)`` over the RAW rows would shuffle the whole
    corpus into as many tasks as there are routes (4 here — 4 tasks each
    sorting ~25 TB at the 100 TB point); the histogram window instead runs
    over routes × distinct latency values, a few thousand rows regardless
    of corpus size. Matches DuckDB ``quantile_disc`` (same ceil(p*n)
    element)."""
    from pyspark.sql import Window

    df = pipeline.routed(spark, sf_dir).filter(F.col("latency_ms").isNotNull())
    hist = df.groupBy("route", "latency_ms").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("route").orderBy("latency_ms")
    wn = Window.partitionBy("route")
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(wn)
    )

    def pick(p: float):
        # smallest latency whose cumulative count reaches rank ceil(p*n)
        return F.min(
            F.when(
                F.col("cum") >= F.ceil(F.col("n") * F.lit(p)), F.col("latency_ms")
            )
        ).cast("bigint")

    return cum.groupBy("route").agg(
        pick(0.5).alias("p50_ms"),
        pick(0.9).alias("p90_ms"),
        pick(0.99).alias("p99_ms"),
        F.max("latency_ms").cast("bigint").alias("max_ms"),
        F.sum("cnt").cast("bigint").alias("n_turns"),
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

    from open_telemetry_opentelemetry_collector_contrib_spark.plans.metric_catalog import (
        METRICFN_ORACLES,
    )

    out = dict(CATALOG_ORACLES)
    out.update(CATALOG2_ORACLES)
    out.update(TRAINING_ORACLES)
    out.update(METRICFN_ORACLES)
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

    from open_telemetry_opentelemetry_collector_contrib_spark.plans.metric_catalog import (
        METRICFN_QUERIES,
    )

    out = dict(CATALOG_QUERIES)
    out.update(CATALOG2_QUERIES)
    out.update(TRAINING_QUERIES)
    out.update(METRICFN_QUERIES)
    out.update(_flagship_queries())
    # Stable priority ordering for a prefix-sampling driver (~50 of the
    # registry per round). Risk-ranked: (1) queries added THIS round that
    # have never appeared in any CORRECTNESS file — an operator with no
    # driver record ever is worse than one whose green row is a round old;
    # (2) route_latency_quantiles, whose plan was rewritten this round
    # (counting-sort) so its r4 green row no longer covers the shipping
    # code; (3) the rows-only entries, whose weaker checks only exist in
    # the driver record; (4) the flagship pipeline; (5) the 35 queries
    # whose last green row is CORRECTNESS_r03 (r03 minus r04 — never red).
    priority = [
        # new this round — no driver record exists yet
        "c4_clean",
        "paragraph_dedup",
        "winnow_fingerprints",
        "ccnet_buckets",
        "unimax_mix",
        "bpe_pair_counts",
        "histogram_cumulative_to_delta",
        "histogram_delta_to_cumulative",
        "decontaminate_bloom",
        "mix_temperature_docs",
        "interval_passthrough",
        "minhash_incremental",
        "metric_convert_gauge_sum",
        "extract_histogram_sum_count",
        "summary_convert_sums",
        "copy_scale_metric",
        "expo_to_explicit_upper",
        "expo_to_explicit_uniform",
        "semdedup",
        "repeated_spans",
        "aggregate_on_attrs_stmt",
        "conv_dedup",
        "fixed_stratum_sample",
        "span_rename",
        "logs_transform",
        "lm_score_docs",
        "bm25_topk",
        "dsir_select",
        "shard_shuffle",
        "dataset_manifest",
        "url_filter",
        "training_export",
        # plan rewritten this round — r4 green row predates the shipping code
        "route_latency_quantiles",
        # rows-only entries — their weaker checks exist only in the driver
        "ann_cosine_ivf",
        "multimodal_features",
        "frame_sample_plan",
        # flagship, keep fresh
        "pipeline_route",
        "pipeline_sink_counts",
        "pipeline_sum_latency",
        "transcripts",
        "pipeline_parse",
        "pipeline_enrich",
        # last driver record r03 — refresh as sample budget allows
        "ann_cosine_lsh",
        "ann_cosine_topk",
        "ann_ivf_fullprobe",
        "chunk_documents",
        "cumulative_to_delta",
        "curation_pipeline",
        "decontaminate_docs",
        "dedup_components",
        "delta_to_cumulative",
        "delta_to_rate",
        "embedding_near_dup",
        "enrich_star_join",
        "events_props_json",
        "exceptions_connector",
        "filter_match_props",
        "grok_apache_clf",
        "group_by_trace",
        "interval_last",
        "kv_roundtrip_events",
        "logdedup_transcripts",
        "otlpjson_explode",
        "pii_scrub_docs",
        "recombine_conversations",
        "redact_attributes",
        "route_match_all",
        "sample_hash_transcripts",
        "sample_lcg_events",
        "sample_otep235_equalizing",
        "sample_otep235_proportional",
        "service_graph",
        "span_metrics",
        "span_metrics_exemplars",
        "tail_sampling",
        "tail_sampling_policies",
        "transform_statements",
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

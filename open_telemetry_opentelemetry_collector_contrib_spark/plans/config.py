"""Declarative pipeline assembly: config dict/YAML -> DataFrame program.

The reference assembles its service graph from YAML: typed Config structs
with Validate(), factories constructing processors with all OTTL pre-parsed
at startup (`processor/transformprocessor/internal/logs/processor.go:26-51`,
`connector/countconnector/config.go:54-112`). Same contract here:

- ``validate(spec)`` parses every OTTL condition/statement up front — a bad
  expression fails before any data is read;
- ``build(spark, spec, source_df)`` folds the stage factories into one
  DataFrame program (single Catalyst plan).

Stage registry mirrors the component factory registry
(`pkg/stanza/operator/registry.go:38`); new stage types register with
``@stage("name")``.

Example spec::

    {
      "processors": [
        {"type": "filter", "drop_conditions": ["level == \\"DEBUG\\""]},
        {"type": "transform", "statements": ["set(x, 1)"], "conditions": []},
        {"type": "attributes", "actions": [{"action": "insert", "key": "env",
                                            "value": "prod"}]},
        {"type": "redact", "map_col": "attributes", "blocked_values": ["[0-9]{16}"]},
        {"type": "sample", "key": "conv_id", "percentage": 10.0},
      ],
      "route": {"table": [{"name": "errors", "condition": "level == \\"ERROR\\""}],
                 "match_once": True},
      "aggregate": {"type": "count", "keys": ["route", "role"], "window_s": 3600},
    }
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators import enrich as enrich_ops
from ..operators import filter as filter_ops
from ..operators import redact as redact_ops
from ..operators import sample as sample_ops
from ..operators import transform as transform_ops
from ..operators.aggregate import windowed_count, windowed_sum
from ..operators.route import Route, with_route_first_match, with_route_match_all
from ..ottl.parser import parse_condition, parse_statement

STAGE_FACTORIES: dict[str, Callable] = {}


def stage(name: str):
    def reg(fn):
        STAGE_FACTORIES[name] = fn
        return fn

    return reg


class ConfigError(ValueError):
    pass


# ---------------------------------------------------------------------------
# stage factories
# ---------------------------------------------------------------------------


@stage("filter")
def _filter(spark, df, cfg):
    return filter_ops.filter_ottl(df, cfg["drop_conditions"])


@stage("transform")
def _transform(spark, df, cfg):
    group = transform_ops.StatementGroup(
        statements=cfg["statements"], conditions=cfg.get("conditions", [])
    )
    return transform_ops.apply_group(df, group)


@stage("attributes")
def _attributes(spark, df, cfg):
    return enrich_ops.apply_attribute_actions(df, cfg["actions"])


@stage("redact")
def _redact(spark, df, cfg):
    return redact_ops.redact(
        df,
        map_col=cfg.get("map_col", "attributes"),
        allowed_keys=cfg.get("allowed_keys"),
        blocked_values=cfg.get("blocked_values"),
        allowed_values=cfg.get("allowed_values"),
        ignored_keys=cfg.get("ignored_keys"),
        summary=cfg.get("summary", True),
    )


@stage("sample")
def _sample(spark, df, cfg):
    return sample_ops.probabilistic_sample(
        df, cfg["key"], cfg["percentage"], seed=cfg.get("seed", 22)
    )


@stage("lookup")
def _lookup(spark, df, cfg):
    dim = spark.createDataFrame(cfg["rows"], cfg["columns"])
    return enrich_ops.lookup_enrich(df, dim, on=cfg["on"], how=cfg.get("how", "left"))


# ---------------------------------------------------------------------------
# validate + build
# ---------------------------------------------------------------------------


def validate(spec: dict) -> None:
    """Compile every expression up front; raise ConfigError before any scan
    (reference: countconnector parses all OTTL at Validate time,
    `config.go:54-112`)."""
    try:
        for p in spec.get("processors", []):
            if p["type"] not in STAGE_FACTORIES:
                raise ConfigError(f"unknown processor type {p['type']!r}")
            for c in p.get("drop_conditions", []) + p.get("conditions", []):
                parse_condition(c)
            for s in p.get("statements", []):
                parse_statement(s)
        route = spec.get("route")
        if route:
            for entry in route["table"]:
                parse_condition(entry["condition"])
        agg = spec.get("aggregate")
        if agg and agg.get("type") not in (None, "count", "sum"):
            raise ConfigError(f"unknown aggregate type {agg.get('type')!r}")
    except ConfigError:
        raise
    except Exception as e:
        raise ConfigError(f"invalid pipeline spec: {e}") from e


def build(spark: SparkSession, spec: dict, source: DataFrame) -> DataFrame:
    """Fold the configured stages over the source frame."""
    validate(spec)
    df = source
    for p in spec.get("processors", []):
        df = STAGE_FACTORIES[p["type"]](spark, df, p)

    route = spec.get("route")
    if route:
        from ..ottl import LogContext
        from ..ottl.compiler import compile_condition

        ctx = LogContext(df)
        table = [
            Route(e["name"], compile_condition(e["condition"], ctx))
            for e in route["table"]
        ]
        if route.get("match_once", True):
            df = with_route_first_match(df, table)
        else:
            df = with_route_match_all(df, table)

    agg = spec.get("aggregate")
    if agg:
        if agg.get("type", "count") == "count":
            df = windowed_count(
                df,
                keys=agg["keys"],
                window_s=agg.get("window_s", 3600),
                ts_col=agg.get("ts_col", "ts"),
                defaults=agg.get("defaults"),
            )
        else:
            df = windowed_sum(
                df,
                keys=agg["keys"],
                source_col=agg["source"],
                window_s=agg.get("window_s", 3600),
                ts_col=agg.get("ts_col", "ts"),
                defaults=agg.get("defaults"),
            )
    return df

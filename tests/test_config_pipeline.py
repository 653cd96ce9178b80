"""Config-driven pipeline assembly tests (YAML-shape dict -> DataFrame)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from open_telemetry_opentelemetry_collector_contrib_spark.plans import config as cfg
from open_telemetry_opentelemetry_collector_contrib_spark.plans import pipeline
from tests.conftest import SF_UNIT

SPEC = {
    "processors": [
        {"type": "filter", "drop_conditions": ['status == "err"']},
        {
            "type": "transform",
            "statements": [
                'set(level_lc, ConvertCase(level, "lower"))',
                'set(is_slow, latency_ms > 500)',
            ],
        },
        {
            "type": "attributes",
            "actions": [
                {"action": "insert", "key": "env", "value": "prod"},
                {"action": "insert", "key": "conv_hash", "from_attribute": "conv_id"},
                {"action": "hash", "key": "conv_hash"},
            ],
        },
        {"type": "sample", "key": "conv_id", "percentage": 100.0},
    ],
    "route": {
        "table": [
            {"name": "errors", "condition": 'level == "ERROR"'},
            {"name": "slow", "condition": "latency_ms > 1000"},
        ],
        "match_once": True,
    },
    "aggregate": {"type": "count", "keys": ["route", "role"], "window_s": 86400},
}


def test_validate_rejects_bad_ottl():
    bad = {"processors": [{"type": "transform", "statements": ["set(x, "]}]}
    with pytest.raises(cfg.ConfigError):
        cfg.validate(bad)


def test_validate_rejects_unknown_stage():
    with pytest.raises(cfg.ConfigError, match="unknown processor"):
        cfg.validate({"processors": [{"type": "nope"}]})


def test_build_end_to_end(spark):
    src = pipeline.parsed(spark, SF_UNIT)
    out = cfg.build(spark, SPEC, src)
    rows = out.collect()
    assert rows
    assert set(out.columns) == {"window_id", "route", "role", "n"}
    # equivalent hand-built program
    hand = (
        src.filter(~F.coalesce(F.col("status") == "err", F.lit(False)))
        .withColumn(
            "route",
            F.coalesce(
                F.when(F.col("level") == "ERROR", F.lit("errors")),
                F.when(F.col("latency_ms") > 1000, F.lit("slow")),
                F.lit("default"),
            ),
        )
        .withColumn("window_id", F.floor(F.unix_timestamp("ts") / 86400).cast("bigint"))
        .groupBy("window_id", "route", "role")
        .count()
    )
    exp = {(r.window_id, r.route, r.role): r["count"] for r in hand.collect()}
    got = {(r.window_id, r.route, r.role): r.n for r in rows}
    assert got == exp


def test_attribute_actions_applied(spark):
    src = pipeline.parsed(spark, SF_UNIT)
    spec = {"processors": SPEC["processors"][:3]}
    out = cfg.build(spark, spec, src)
    row = out.limit(1).collect()[0]
    assert row.env == "prod"
    assert len(row.conv_hash) == 64  # sha2-256 hex


def test_match_all_route_duplicates(spark):
    src = pipeline.parsed(spark, SF_UNIT)
    spec = {
        "route": {
            "table": [
                {"name": "a", "condition": 'role == "tool"'},
                {"name": "b", "condition": "latency_ms > 0"},
            ],
            "match_once": False,
        }
    }
    out = cfg.build(spark, spec, src)
    n_in = src.count()
    n_out = out.count()
    assert n_out > n_in  # duplication happened

"""Routing with per-route mutation: mutation applies only to rows the route
claims, on first-match-wins gating, and membership is decided on the
un-mutated record."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_telemetry_opentelemetry_collector_contrib_spark.operators.route import (
    Route,
    with_route_first_match,
)


def _df(spark):
    rows = [
        ("r1", "ERROR", {"X-Tenant": "acme", "k": "1"}),
        ("r2", "INFO", {"X-Tenant": "acme", "k": "2"}),
        ("r3", "ERROR", {"k": "3"}),
    ]
    return spark.createDataFrame(rows, "id string, level string, attributes map<string,string>")


def test_mutation_only_on_claimed_rows(spark):
    routes = [
        Route(
            "errors",
            F.col("level") == "ERROR",
            mutation='delete_key(attributes, "X-Tenant")',
        ),
        Route("info", F.col("level") == "INFO"),
    ]
    out = {r.id: r for r in with_route_first_match(_df(spark), routes).collect()}
    assert out["r1"].route == "errors"
    assert "X-Tenant" not in out["r1"].attributes  # mutated
    assert out["r2"].route == "info"
    assert out["r2"].attributes["X-Tenant"] == "acme"  # untouched
    assert out["r3"].route == "errors"
    assert "__claim_0" not in out["r1"].asDict()


def test_membership_decided_before_mutation(spark):
    """A mutation that would falsify its own route's condition must not
    change the routing decision."""
    routes = [
        Route(
            "errors",
            F.col("level") == "ERROR",
            mutation='set(level, "HANDLED")',
        ),
        Route("late_errors", F.col("level") == "ERROR"),
    ]
    out = {r.id: r for r in with_route_first_match(_df(spark), routes).collect()}
    assert out["r1"].route == "errors"
    assert out["r1"].level == "HANDLED"
    # r3 also ERROR: claimed by the FIRST route (order), not the second
    assert out["r3"].route == "errors"

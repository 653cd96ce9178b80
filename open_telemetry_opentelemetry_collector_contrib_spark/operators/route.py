"""Route stage — routingconnector fan-out semantics.

Reference semantics (`connector/routingconnector`):
- ``match_once=true`` (switch): routes evaluated in table order, first match
  wins, matched rows *move* to that route's pipelines, remainder goes to
  ``default_pipelines`` (`logs.go:72-117`,
  `internal/plogutil/logs.go:12-26` MoveRecordsWithContextIf).
- ``match_once=false`` (match-all): every matching route receives a copy;
  non-matching rows go to default (`logs.go:119-153`).
- ``error_mode: ignore`` sends errored payloads to default
  (`config.go:30-39`) — here a NULL-valued condition falls through to
  default because ``when`` treats NULL as false.

Spark mapping: ONE projection computing a ``route`` column — first-match-wins
is ``coalesce(when(c1,'s1'), when(c2,'s2'), …, 'default')``; match-all is
``array(when…)`` + ``explode``. Either way the fact table is scanned once and
per-sink writes are `.filter(route == name)` over a cached routed frame or a
single `partitionBy('route')` write — never N independent scans.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_ROUTE = "default"


@dataclass
class Route:
    name: str
    condition: Column


def with_route_first_match(
    df: DataFrame, routes: list[Route], out_col: str = "route"
) -> DataFrame:
    """match_once=true: order-sensitive first-match-wins routing column."""
    branches = [F.when(r.condition, F.lit(r.name)) for r in routes]
    return df.withColumn(out_col, F.coalesce(*branches, F.lit(DEFAULT_ROUTE)))


def with_route_match_all(
    df: DataFrame, routes: list[Route], out_col: str = "route"
) -> DataFrame:
    """match_once=false: duplicate each row into every matching route;
    rows matching nothing go to the default route exactly once."""
    arr = F.array(*[F.when(r.condition, F.lit(r.name)) for r in routes])
    matched = F.filter(arr, lambda x: x.isNotNull())
    routed = F.when(F.size(matched) > 0, matched).otherwise(
        F.array(F.lit(DEFAULT_ROUTE))
    )
    return df.withColumn(out_col, F.explode(routed))


def split_by_route(df: DataFrame, route_names: list[str], route_col: str = "route"):
    """Per-sink DataFrames off one routed frame. Callers should persist the
    routed frame (or write once with partitionBy) so the lineage is scanned
    once, mirroring the reference's group-before-dispatch optimization
    (`routingconnector/logs.go:119-124`)."""
    return {name: df.filter(F.col(route_col) == name) for name in route_names}

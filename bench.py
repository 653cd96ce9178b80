"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Each query is forced with a noop-format write (full computation, no sink
cost). The headline metric is end-to-end pipeline wall time; turns/sec is
derived from the transcripts row count.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from open_telemetry_opentelemetry_collector_contrib_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    spark = get_spark(app_name="otelcol-spark-bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    timings: dict[str, float] = {}

    # warm the JVM + parquet footer caches on a cheap query first
    n_turns = queries["transcripts"](spark, sf_dir).count()

    for name, fn in queries.items():
        t0 = time.perf_counter()
        force(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 4)

    # headline: full parse→enrich→route→aggregate, one plan
    t0 = time.perf_counter()
    force(entry_mod.q_pipeline_sink_counts(spark, sf_dir))
    e2e = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "metric": "e2e_parse_enrich_route_aggregate",
                "value": round(e2e, 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "turns": n_turns,
                "turns_per_sec": round(n_turns / e2e, 1),
                "cores": cores,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

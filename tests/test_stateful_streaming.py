"""applyInPandasWithState: streaming delta->cumulative must match the batch
window-function implementation, including state carry-over across
micro-batches."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from open_telemetry_opentelemetry_collector_contrib_spark.operators import metrics as m
from open_telemetry_opentelemetry_collector_contrib_spark.streaming import stateful
from tests.conftest import SF_UNIT

SRC_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("vi", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


@pytest.fixture(scope="module")
def events_vi_dir(spark, tmp_path_factory):
    out = os.path.join(str(tmp_path_factory.mktemp("events_vi")), "data")
    ev = spark.read.parquet(f"{SF_UNIT}/events.parquet").select(
        "user_id",
        "event_type",
        "event_id",
        F.floor(F.col("value") * 1000).cast("bigint").alias("vi"),
        "ts",
    )
    # several files => several potential micro-batches
    ev.repartition(4, "user_id").write.parquet(out)
    return out


def test_stateful_d2c_matches_batch(spark, events_vi_dir):
    stream = (
        spark.readStream.schema(SRC_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(events_vi_dir)
    )
    out = stateful.delta_to_cumulative_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("d2c_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.event_type, r.event_id): r.cumulative
        for r in spark.sql("select * from d2c_stream").collect()
    }
    batch = m.delta_to_cumulative(
        spark.read.parquet(events_vi_dir),
        ["user_id", "event_type"],
        "vi",
        order_cols=["event_id"],
    )
    exp = {
        (r.user_id, r.event_type, r.event_id): r.cumulative for r in batch.collect()
    }
    assert len(got) == len(exp)
    # NB: streaming micro-batch order may process files out of event-time
    # order within a stream; with user_id-partitioned files each stream's
    # rows arrive in one batch, so results must match exactly
    assert got == exp

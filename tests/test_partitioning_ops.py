"""groupbyattrs / roundrobin partitioning + datagen skew sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_telemetry_opentelemetry_collector_contrib_spark.datagen import transcripts
from open_telemetry_opentelemetry_collector_contrib_spark.operators import (
    metricstransform as mt,
)
from tests.conftest import SF_UNIT


def test_group_by_attrs_colocates_keys(spark):
    t = transcripts(spark, SF_UNIT)
    parted = mt.group_by_attrs(t, ["conv_id"], num_partitions=8)
    assert parted.rdd.getNumPartitions() == 8
    # every conv_id lives in exactly one partition
    per_part = (
        parted.withColumn("pid", F.spark_partition_id())
        .groupBy("conv_id")
        .agg(F.countDistinct("pid").alias("parts"))
        .agg(F.max("parts"))
        .collect()[0][0]
    )
    assert per_part == 1


def test_round_robin_spreads_evenly(spark):
    t = transcripts(spark, SF_UNIT)
    parted = mt.round_robin(t, 10)
    sizes = [
        r.n
        for r in parted.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(sizes) == 10
    assert max(sizes) - min(sizes) <= max(2, 0.05 * max(sizes))


def test_datagen_has_hot_conv_skew(spark):
    """FIXTURES.md mandates hot keys (~30% of rows in the hot bucket) so the
    salting/AQE paths are actually exercised."""
    t = transcripts(spark, SF_UNIT)
    total = t.count()
    by_conv = t.groupBy("conv_id").count()
    hot = by_conv.filter(F.col("conv_id").endswith("-0")).agg(F.sum("count")).collect()[0][0]
    assert 0.25 <= hot / total <= 0.35


def test_metricstransform_label_operations(spark):
    from open_telemetry_opentelemetry_collector_contrib_spark.operators import (
        metricstransform as mt,
    )

    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], ["env", "value"]
    ).withColumn("value", F.col("value").cast("bigint"))
    out = mt.add_label(df, "cluster", "prod")
    assert {r.cluster for r in out.collect()} == {"prod"}
    out = mt.update_label_values(df, "env", {"a": "alpha", "b": "beta"})
    assert {r.env for r in out.collect()} == {"alpha", "beta", "c"}
    out = mt.delete_label_value(df, "env", "b")
    assert {r.env for r in out.collect()} == {"a", "c"}
    out = mt.toggle_scalar_data_type(df, "value")
    assert dict(out.dtypes)["value"] == "double"
    assert dict(mt.toggle_scalar_data_type(out, "value").dtypes)["value"] == "bigint"
    combined = mt.combine_metrics(
        {"m1": df.limit(1), "m2": df.limit(2)}, "m_all"
    )
    rows = combined.collect()
    assert len(rows) == 3 and {r.metric for r in rows} == {"m1", "m2"}
    assert {r.metric_name for r in rows} == {"m_all"}

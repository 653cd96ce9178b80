"""stanza transformer / schema / resourcedetection unit tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from open_telemetry_opentelemetry_collector_contrib_spark.operators import stanza as st


def _df(spark):
    return spark.createDataFrame(
        [(1, '"quoted"', "a,b,c"), (2, "plain", "x,y,z")], ["id", "v", "csvish"]
    )


def test_add_copy_move_remove_retain(spark):
    df = _df(spark)
    df = st.add(df, "env", "prod")
    df = st.copy_field(df, "v", "v2")
    df = st.move(df, "v2", "v3")
    assert "v2" not in df.columns and "v3" in df.columns
    df = st.remove(df, ["csvish"])
    df = st.retain(df, ["id", "v3", "env"])
    row = df.orderBy("id").collect()[0]
    assert row.env == "prod" and row.v3 == '"quoted"'


def test_conditional_add(spark):
    df = st.add(_df(spark), "flag", F.lit("yes"), condition=F.col("id") == 1)
    rows = {r.id: r.flag for r in df.collect()}
    assert rows == {1: "yes", 2: None}


def test_assign_keys(spark):
    df = _df(spark).withColumn("arr", F.split("csvish", ","))
    out = st.assign_keys(df, "arr", ["f1", "f2", "f3"])
    row = out.filter(F.col("id") == 1).collect()[0]
    assert (row.f1, row.f2, row.f3) == ("a", "b", "c")


def test_unquote(spark):
    out = {r.id: r.v for r in st.unquote(_df(spark), "v").collect()}
    assert out == {1: "quoted", 2: "plain"}


def test_schema_rename(spark):
    out = st.schema_rename(_df(spark), {"v": "body", "missing": "x"})
    assert "body" in out.columns and "v" not in out.columns


def test_detect_resource(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ENV", "staging")
    out = st.detect_resource(_df(spark)).collect()[0]
    assert out.deployment_environment == "staging"
    assert out.os_type == "linux"
    assert out.host_name

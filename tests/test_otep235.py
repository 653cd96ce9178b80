"""OTEP-235 consistent-probability sampler parity tests
(pkg/sampling/probability.go, sampler_mode.go, logsprocessor.go)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from open_telemetry_opentelemetry_collector_contrib_spark.operators import sample

PROBS = [
    1.0, 0.999999, 0.999, 0.75, 0.5, 0.25, 0.125, 0.1, 0.0625, 0.05,
    0.01, 0.001, 2.0**-10, 2.0**-20, 3e-7, 2.0**-40, 2.0**-55, 2.0**-56,
    1.0 / 3.0, 0.3333, 0.6666, 0.9, 0.99,
]


def test_threshold_column_matches_python_twin(spark):
    rows = [(i, p) for i, p in enumerate(PROBS)]
    df = spark.createDataFrame(rows, ["i", "prob"])
    for precision in (1, 3, 4, 14):
        got = {
            r.i: r.t
            for r in df.select(
                "i", sample.otep235_threshold_col(F.col("prob"), precision).alias("t")
            ).collect()
        }
        for i, p in rows:
            want = sample.prob_to_threshold_py(p, precision)
            assert got[i] == want, (p, precision, got[i], want)


def test_threshold_go_reference_values():
    # spot values derivable by hand from probability.go math
    assert sample.prob_to_threshold_py(1.0) == 0
    assert sample.prob_to_threshold_py(0.5) == 1 << 55
    assert sample.prob_to_threshold_py(0.25) == 3 << 54
    # 1/3 at precision 4: threshold = round16(2^56 * 2/3) to 4 hex digits
    t = sample.prob_to_threshold_py(1.0 / 3.0, 4)
    assert t % (1 << 40) == 0  # only 4 leading hex digits survive
    assert abs(t / float(1 << 56) - 2.0 / 3.0) < 2.0**-16


def test_tvalue_roundtrip(spark):
    df = spark.createDataFrame([(p,) for p in PROBS if p < 1], ["prob"])
    out = df.select(
        sample.otep235_threshold_col(F.col("prob"), 4).alias("thr")
    ).select(
        "thr",
        sample.tvalue_to_threshold_col(sample.tvalue_col(F.col("thr"))).alias("back"),
    )
    for r in out.collect():
        assert r.back == r.thr


def test_trace_randomness_extraction(spark):
    tid = "0102030405060708090a0b0c0d0e0f10"
    df = spark.createDataFrame([(tid,)], ["trace_id"])
    r = df.select(sample.trace_randomness_col(F.col("trace_id")).alias("r")).collect()[0].r
    want = int(tid[16:], 16) & ((1 << 56) - 1)
    assert r == want == int("0a0b0c0d0e0f10", 16)


def _mk_rows(spark, n=4096):
    # deterministic 56-bit randomness spread via two 28-bit LCG halves
    rows = []
    for i in range(n):
        a = (i * 1103515245 + 12345) % (1 << 28)
        b = (i * 69069 + 1) % (1 << 28)
        rows.append((i, (a << 28) | b))
    return spark.createDataFrame(rows, ["rid", "rnd"])


def test_proportional_and_equalizing_decisions(spark):
    df = _mk_rows(spark)
    for mode in ("proportional", "equalizing"):
        out = sample.otep235_sample(
            df, 25.0, mode, randomness_col=F.col("rnd"), threshold_out=None
        )
        kept = {r.rid for r in out.collect()}
        thr = sample.prob_to_threshold_py(0.25, 4)
        want = {r.rid for r in df.collect() if r.rnd >= thr}
        assert kept == want, mode
        frac = len(kept) / 4096
        assert 0.2 < frac < 0.3


def test_proportional_composes_with_incoming_threshold(spark):
    # incoming 50% stage then proportional 50% -> effective 25%
    df = _mk_rows(spark).withColumn(
        "tin", F.lit(sample.prob_to_threshold_py(0.5, 14)).cast("long")
    )
    out = sample.otep235_sample(
        df, 50.0, "proportional",
        randomness_col=F.col("rnd"),
        incoming_threshold_col="tin",
        threshold_out="tv",
    )
    thr = sample.prob_to_threshold_py(0.25, 4)
    kept = {r.rid: r.tv for r in out.collect()}
    want = {r.rid for r in df.collect() if r.rnd >= thr}
    assert set(kept) == want
    assert set(kept.values()) == {"c"}  # threshold(0.25) = 0xc0000000000000 -> 'c'


def test_equalizing_never_lowers_incoming_threshold(spark):
    stricter = sample.prob_to_threshold_py(0.1, 14)
    df = _mk_rows(spark).withColumn("tin", F.lit(stricter).cast("long"))
    out = sample.otep235_sample(
        df, 50.0, "equalizing",
        randomness_col=F.col("rnd"),
        incoming_threshold_col="tin",
        threshold_out=None,
    )
    kept = {r.rid for r in out.collect()}
    want = {r.rid for r in df.collect() if r.rnd >= stricter}
    assert kept == want


def test_sampling_priority_override(spark):
    df = _mk_rows(spark, 512)
    # priority 100 -> always sample; 0 -> always drop; NULL -> base policy
    df = df.withColumn(
        "prio",
        F.when(F.col("rid") % 3 == 0, F.lit(100.0))
        .when(F.col("rid") % 3 == 1, F.lit(0.0))
        .otherwise(F.lit(None).cast("double")),
    )
    out = sample.otep235_sample(
        df, 25.0, "equalizing",
        randomness_col=F.col("rnd"),
        priority_col="prio",
        threshold_out=None,
    )
    kept = {r.rid for r in out.collect()}
    thr = sample.prob_to_threshold_py(0.25, 4)
    for r in df.collect():
        if r.rid % 3 == 0:
            assert r.rid in kept  # threshold 0 <= every R
        elif r.rid % 3 == 1:
            assert r.rid not in kept
        else:
            assert (r.rid in kept) == (r.rnd >= thr)


def test_threshold_random_probability_sweep(spark):
    """500 seeded random probabilities across the full magnitude range must
    match the Go-faithful Python twin bit-for-bit (stronger than the fixed
    grid: catches rounding/precision-boost edges)."""
    import random

    rng = random.Random(20240816)
    probs = []
    for _ in range(250):
        probs.append(rng.uniform(1e-3, 1.0))
    for _ in range(250):
        probs.append(2.0 ** -rng.uniform(0.0, 55.9))
    rows = [(i, p) for i, p in enumerate(probs)]
    df = spark.createDataFrame(rows, ["i", "prob"])
    for precision in (3, 4):
        got = {
            r.i: r.t
            for r in df.select(
                "i", sample.otep235_threshold_col(F.col("prob"), precision).alias("t")
            ).collect()
        }
        bad = [
            (p, got[i], sample.prob_to_threshold_py(p, precision))
            for i, p in rows
            if got[i] != sample.prob_to_threshold_py(p, precision)
        ]
        assert not bad, bad[:3]

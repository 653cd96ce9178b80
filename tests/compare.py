"""Order-insensitive Spark-vs-DuckDB result comparison.

Mirrors the driver's correctness gate (row-count + column-name-sorted
value comparison) and the reference's golden equality options
(`pkg/pdatatest/plogtest/options.go:107-170` IgnoreLogRecordsOrder).
"""

from __future__ import annotations

import math
from datetime import datetime


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    # sort by repr so None/mixed types don't break ordering; equality still
    # compares the actual normalized values
    return sorted(
        (tuple(_norm(r[i]) for i in order) for r in rows), key=repr
    )


def assert_same(spark_df, duck_rel, context=""):
    s_cols = spark_df.columns
    d_cols = [d[0] for d in duck_rel.description]
    assert sorted(s_cols) == sorted(d_cols), (
        f"{context}: column mismatch {sorted(s_cols)} vs {sorted(d_cols)}"
    )
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_rows = duck_rel.fetchall()
    assert len(s_rows) == len(d_rows), (
        f"{context}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    cs, cd = canon(s_rows, s_cols), canon(d_rows, d_cols)
    for i, (a, b) in enumerate(zip(cs, cd)):
        assert a == b, f"{context}: first differing row #{i}:\n spark={a}\n duck ={b}"

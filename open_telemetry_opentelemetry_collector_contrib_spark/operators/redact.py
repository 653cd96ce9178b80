"""redactionprocessor — attribute allowlisting + value masking.

Reference semantics (`processor/redactionprocessor/config.go:6-26`):
- ``allow_all_keys=false`` + ``allowed_keys``: drop attributes whose key is
  not allowlisted;
- ``blocked_values``: regex list; matching attribute *values* are masked
  ("****"), with ``allowed_values`` regexes exempt;
- ``ignored_keys``: keys skipped by value masking;
- summary attributes (``redaction.masked.keys/count``) record what happened.

Spark: map_filter + transform_values — one projection over the map column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MASK = "****"


def redact(
    df: DataFrame,
    map_col: str = "attributes",
    allowed_keys: list[str] | None = None,
    blocked_values: list[str] | None = None,
    allowed_values: list[str] | None = None,
    ignored_keys: list[str] | None = None,
    summary: bool = True,
) -> DataFrame:
    m = F.col(map_col)
    if allowed_keys is not None:
        m_allowed = F.map_filter(m, lambda k, _: k.isin(*allowed_keys))
    else:
        m_allowed = m

    if blocked_values:
        blocked_re = "|".join(f"(?:{p})" for p in blocked_values)
        allowed_re = (
            "|".join(f"(?:{p})" for p in allowed_values) if allowed_values else None
        )
        ignored = ignored_keys or []

        def mask_value(k, v):
            is_blocked = v.rlike(blocked_re)
            if allowed_re:
                is_blocked = is_blocked & ~v.rlike(allowed_re)
            if ignored:
                is_blocked = is_blocked & ~k.isin(*ignored)
            return F.when(is_blocked, F.lit(MASK)).otherwise(v)

        masked = F.transform_values(m_allowed, mask_value)
    else:
        masked = m_allowed

    out = df.withColumn(map_col, masked)
    if summary:
        masked_keys = F.map_keys(
            F.map_filter(F.col(map_col), lambda k, v: v == MASK)
        )
        out = out.withColumn(
            "redaction_masked_count", F.size(masked_keys).cast("long")
        ).withColumn(
            "redaction_masked_keys", F.array_join(F.array_sort(masked_keys), ",")
        )
    return out

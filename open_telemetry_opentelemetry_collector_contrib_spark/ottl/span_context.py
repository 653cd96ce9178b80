"""OTTL span transform context: first-class span path grammar.

Path surface reproduced from the reference span context
(`pkg/ottl/contexts/internal/span.go:40-135`, `pkg/ottl/contexts/ottlspan/
span.go:129-186`): ``trace_id[.string]``, ``span_id[.string]``,
``parent_span_id[.string]``, ``name``, ``kind[.string|.deprecated_string]``,
``start_time[_unix_nano]``, ``end_time[_unix_nano]``, ``status.code``,
``status.message``, ``trace_state[key]``, ``attributes[...]``, dropped
counts, plus the inherited resource/cache paths.

Canonical span frame conventions (operators/traces.py:16-34):
- ``trace_id``/``span_id``/``parent_span_id`` are strings (hex-free ids —
  ``.string`` is the identity; the reference's raw-bytes/``String()`` split
  collapses since the frame stores the string form);
- ``ts`` is the span start; ``duration_ms`` spans to the end, so
  ``end_time = ts + duration_ms`` and ``end_time_unix_nano -
  start_time_unix_nano`` math works exactly;
- ``status`` is the collector's string form; ``status.code`` derives the
  pdata code (err -> 2=ERROR, ok -> 1=OK, else 0=UNSET) unless a typed
  ``status_code`` column exists (`internal/span.go:117-127`);
- ``kind`` is an int column when present; ``kind.string`` renders the
  pdata ``Kind().String()`` short name ("Server") and
  ``kind.deprecated_string`` the proto-style ``SPAN_KIND_X`` symbol via
  ``traceutil.SpanKindStr`` (`internal/span.go:328-388`,
  `internal/coreinternal/traceutil/traceutil.go:16-32`).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .ast import Path
from .compiler import LogContext, OTTLCompileError, TypedCol

# pdata enums (`pkg/ottl/contexts/internal/span.go:28-39`)
SPAN_KIND_NAMES = {
    0: "Unspecified",
    1: "Internal",
    2: "Server",
    3: "Client",
    4: "Producer",
    5: "Consumer",
}

SPAN_ENUMS: dict[str, int] = {
    "SPAN_KIND_UNSPECIFIED": 0,
    "SPAN_KIND_INTERNAL": 1,
    "SPAN_KIND_SERVER": 2,
    "SPAN_KIND_CLIENT": 3,
    "SPAN_KIND_PRODUCER": 4,
    "SPAN_KIND_CONSUMER": 5,
    "STATUS_CODE_UNSET": 0,
    "STATUS_CODE_OK": 1,
    "STATUS_CODE_ERROR": 2,
}

_ID_PATHS = {"trace_id", "span_id", "parent_span_id"}


class SpanContext(LogContext):
    """Resolves OTTL span-context paths against the canonical span frame."""

    BUILTIN = {
        ("start_time",): ("ts", "time"),
        ("name",): ("name", "string"),
    }

    def _status_code(self) -> TypedCol:
        if "status_code" in self.schema:
            return self._col("status_code")
        if "status" in self.schema:
            return TypedCol(
                F.when(F.col("status") == "err", F.lit(2))
                .when(F.col("status") == "ok", F.lit(1))
                .otherwise(F.lit(0))
                .cast("long"),
                "int",
            )
        raise OTTLCompileError("no status/status_code column on this frame")

    @staticmethod
    def _micros(col):
        # parquet frames carry TIMESTAMP_NTZ; unix_micros wants TIMESTAMP
        # (session TZ is UTC, so the cast is value-preserving)
        return F.unix_micros(col.cast("timestamp"))

    def _end_time(self):
        if "end_ts" in self.schema:
            return F.col("end_ts")
        if "duration_ms" in self.schema:
            return F.timestamp_micros(
                self._micros(F.col("ts"))
                + F.coalesce(F.col("duration_ms"), F.lit(0)).cast("long") * 1000
            )
        raise OTTLCompileError("no end_ts/duration_ms column on this frame")

    def resolve(self, path: Path) -> TypedCol:
        segs, keys = path.segments, path.keys
        # ids: .string is the identity (frame stores the string form)
        if segs and segs[0] in _ID_PATHS:
            if len(segs) == 2 and segs[1] != "string":
                raise OTTLCompileError(f"unknown id accessor {segs[1]!r}")
            if len(segs) > 2:
                raise OTTLCompileError(f"unresolvable span path {'.'.join(segs)}")
            return TypedCol(F.col(segs[0]).cast("string"), "string")
        if segs and segs[0] == "kind" and "kind" not in self.schema:
            raise OTTLCompileError("no kind column on this span frame")
        if segs == ("kind",):
            return TypedCol(F.col("kind").cast("long"), "int")
        if segs in (("kind", "string"), ("kind", "deprecated_string")):
            k = F.col("kind").cast("long")
            out = F.lit("Unspecified")
            for code, name in SPAN_KIND_NAMES.items():
                if code == 0:
                    continue
                out = F.when(k == code, F.lit(name)).otherwise(out)
            if segs[1] == "deprecated_string":
                # traceutil.SpanKindStr renders the proto SPAN_KIND_X symbol
                sym = F.lit("SPAN_KIND_UNSPECIFIED")
                for code, name in SPAN_KIND_NAMES.items():
                    if code == 0:
                        continue
                    sym = F.when(
                        k == code, F.lit(f"SPAN_KIND_{name.upper()}")
                    ).otherwise(sym)
                return TypedCol(sym, "string")
            # Kind().String() renders the short pdata name ("Server")
            return TypedCol(out, "string")
        if segs == ("end_time",):
            return TypedCol(self._end_time(), "time")
        if segs == ("start_time_unix_nano",):
            return TypedCol(self._micros(F.col("ts")) * 1000, "int")
        if segs == ("end_time_unix_nano",):
            return TypedCol(self._micros(self._end_time()) * 1000, "int")
        if segs == ("status", "code"):
            return self._status_code()
        if segs == ("status", "message"):
            if "status_message" in self.schema:
                return self._col("status_message")
            return TypedCol(F.coalesce(F.col("status"), F.lit("")), "string")
        if segs == ("trace_state",):
            if keys:
                key = str(keys[0])
                return TypedCol(
                    F.nullif(
                        F.regexp_extract(
                            F.coalesce(F.col("trace_state"), F.lit("")),
                            rf"(?:^|,)\s*{key}=([^,]*)",
                            1,
                        ),
                        F.lit(""),
                    ),
                    "string",
                )
            return TypedCol(F.coalesce(F.col("trace_state"), F.lit("")), "string")
        if segs in (
            ("dropped_attributes_count",),
            ("dropped_events_count",),
            ("dropped_links_count",),
        ):
            name = segs[0]
            if name in self.schema:
                return self._col(name)
            return TypedCol(F.lit(0).cast("long"), "int")
        return super().resolve(path)

    def target_kind(self, path: Path) -> tuple[str, str]:
        segs, keys = path.segments, path.keys
        if segs == ("status", "code"):
            return "column", "status_code"
        if segs == ("status", "message"):
            return "column", "status_message"
        if len(segs) == 1 and segs[0] in _ID_PATHS | {"kind", "name", "trace_state"}:
            return "column", segs[0]
        return super().target_kind(path)


class SpanEventContext(SpanContext):
    """Span-event context (`pkg/ottl/contexts/ottlspanevent/
    span_events.go:157-179`): event-level ``name``/``time``/``attributes``
    plus parent-span access via ``span.<path>`` — on the denormalized frame
    the event columns are ``event_name``/``event_ts`` next to the span
    columns, and ``span.name`` etc. resolve through the span grammar."""

    BUILTIN = {
        ("name",): ("event_name", "string"),
        ("time",): ("event_ts", "time"),
    }

    def _span_view(self) -> SpanContext:
        # delegate span.<path> through plain span grammar (NOT this class's
        # event-level name/time overrides)
        view = SpanContext.__new__(SpanContext)
        view.schema = self.schema
        return view

    def resolve(self, path: Path) -> TypedCol:
        segs, keys = path.segments, path.keys
        if segs and segs[0] == "span":
            if len(segs) == 1:
                raise OTTLCompileError("bare span path needs a field")
            return self._span_view().resolve(Path(tuple(segs[1:]), keys))
        if segs == ("time_unix_nano",):
            return TypedCol(self._micros(F.col("event_ts")) * 1000, "int")
        return super().resolve(path)

    def target_kind(self, path: Path) -> tuple[str, str]:
        segs, keys = path.segments, path.keys
        if segs and segs[0] == "span" and len(segs) > 1:
            return self._span_view().target_kind(Path(tuple(segs[1:]), keys))
        return super().target_kind(path)



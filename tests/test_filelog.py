"""filelog source: raw text ingestion + multiline recombination."""

from __future__ import annotations

import os

from open_telemetry_opentelemetry_collector_contrib_spark.sources import filelog

LOG_A = """2024-01-01T00:00:01Z INFO starting up
2024-01-01T00:00:02Z ERROR boom
  at main.go:10
  at runtime.go:20
2024-01-01T00:00:03Z INFO recovered
"""

LOG_B = """2024-01-01T01:00:00Z WARN single line
2024-01-01T01:00:01Z ERROR another
  at lib.go:5
"""

TS_RE = r"^\d{4}-\d{2}-\d{2}T"


def _write(tmp_path):
    d = tmp_path / "logs"
    os.makedirs(d)
    (d / "a.log").write_text(LOG_A)
    (d / "b.log").write_text(LOG_B)
    return str(d)


def test_read_text_logs_line_order(spark, tmp_path):
    d = _write(tmp_path)
    lines = filelog.read_text_logs(spark, d).collect()
    by_file = {}
    for r in lines:
        by_file.setdefault(os.path.basename(r.file), []).append((r.line_no, r.line))
    a = [l for _, l in sorted(by_file["a.log"])]
    assert a == LOG_A.strip("\n").split("\n")


def test_multiline_recombine(spark, tmp_path):
    d = _write(tmp_path)
    entries = filelog.read_multiline_logs(spark, d, TS_RE).collect()
    by_file = {}
    for r in entries:
        by_file.setdefault(os.path.basename(r.file), []).append(
            (r.line_no, r.entry, r.member_count)
        )
    a = [e for _, e, _ in sorted(by_file["a.log"])]
    assert len(a) == 3
    assert a[1] == "2024-01-01T00:00:02Z ERROR boom\n  at main.go:10\n  at runtime.go:20"
    counts = [c for _, _, c in sorted(by_file["a.log"])]
    assert counts == [1, 3, 1]
    b = [e for _, e, _ in sorted(by_file["b.log"])]
    assert len(b) == 2 and b[1].endswith("at lib.go:5")


def test_encoded_filelog_latin1_and_utf16(spark, tmp_path):
    from open_telemetry_opentelemetry_collector_contrib_spark.sources.filelog import (
        read_text_logs_encoded,
    )

    p1 = tmp_path / "latin1.log"
    p1.write_bytes("première ligne\ndeuxième café\n".encode("latin-1"))
    out = read_text_logs_encoded(spark, str(p1), "ISO-8859-1")
    rows = sorted(out.collect(), key=lambda r: r.line_no)
    assert [r.line for r in rows] == ["première ligne", "deuxième café"]

    p2 = tmp_path / "utf16.log"
    p2.write_bytes("alpha\nbeta".encode("utf-16"))
    out2 = read_text_logs_encoded(spark, str(p2), "UTF-16")
    assert [r.line for r in sorted(out2.collect(), key=lambda r: r.line_no)] == ["alpha", "beta"]


LOG_H = """# host = web-1
# region: eu-west
2024-01-01T00:00:01Z INFO first
2024-01-01T00:00:02Z ERROR second
# host = not-a-header-anymore
"""


def test_header_parsing_attaches_file_attributes(spark, tmp_path):
    """fileconsumer header config: leading header lines parse into
    attributes on every body entry and never emit as records; a
    header-looking line AFTER the body starts is a plain record."""
    import os as _os

    d = tmp_path / "hlogs"
    _os.makedirs(d)
    (d / "h.log").write_text(LOG_H)
    (d / "plain.log").write_text("2024-01-01T09:00:00Z INFO no header\n")
    rows = filelog.read_logs_with_header(spark, str(d), r"^#").collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(_os.path.basename(r.file), []).append(r)
    h = sorted(by_file["h.log"], key=lambda r: r.line_no)
    assert [r.line_no for r in h] == [1, 2, 3]
    assert h[0].line.endswith("INFO first")
    assert h[2].line == "# host = not-a-header-anymore"  # body, not header
    assert h[0].attributes == {"host": "web-1", "region": "eu-west"}
    p = by_file["plain.log"]
    assert len(p) == 1 and p[0].attributes is None

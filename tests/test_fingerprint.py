"""Rotation-safe file identity: the stanza fingerprint model
(`pkg/stanza/fileconsumer/internal/fingerprint/fingerprint.go`) — first-N-
bytes identity, StartsWith growth matching, offset resume across renames."""

from __future__ import annotations

import os

from open_telemetry_opentelemetry_collector_contrib_spark.sources import fingerprint as fp


def _write(path, text, mode="w"):
    with open(path, mode) as fh:
        fh.write(text)


def _lines(df):
    return sorted((r.path, r.line_no, r.line) for r in df.collect())


def test_first_poll_reads_everything(spark, tmp_path):
    d = str(tmp_path)
    _write(f"{d}/a.log", "a1\na2\n")
    _write(f"{d}/b.log", "b1\n")
    c = fp.FingerprintedConsumer(spark, f"{d}/state", size=32)
    out = c.poll(f"{d}/*.log")
    assert [x[2] for x in _lines(out)] == ["a1", "a2", "b1"]


def test_rename_keeps_identity_and_offset(spark, tmp_path):
    """Rotation: the file is renamed and appended to — only the appended
    lines are emitted, because identity is the fingerprint, not the path."""
    d = str(tmp_path)
    _write(f"{d}/app.log", "one two three four five six\nsecond line here\n")
    c = fp.FingerprintedConsumer(spark, f"{d}/state", size=16)
    first = c.poll(f"{d}/*.log")
    assert len(first.collect()) == 2
    os.rename(f"{d}/app.log", f"{d}/app.log.1")
    _write(f"{d}/app.log.1", "appended after rotate\n", mode="a")
    out = c.poll(f"{d}/*.log*")
    got = _lines(out)
    assert [x[2] for x in got] == ["appended after rotate"]
    assert got[0][0].endswith("app.log.1")


def test_new_file_read_from_zero_while_old_resumes(spark, tmp_path):
    d = str(tmp_path)
    _write(f"{d}/a.log", "line-a-one padded to pass min\n")
    c = fp.FingerprintedConsumer(spark, f"{d}/state", size=16)
    c.poll(f"{d}/*.log")
    _write(f"{d}/a.log", "tail-a\n", mode="a")
    _write(f"{d}/b.log", "fresh-b\n")
    out = _lines(c.poll(f"{d}/*.log"))
    # sorted by path: a.log's resumed tail, then b.log read from zero
    assert [x[2] for x in out] == ["tail-a", "fresh-b"]


def test_truncate_recreate_is_a_new_file(spark, tmp_path):
    """Truncation changes the first bytes -> no fingerprint match -> the
    recreated file is consumed from offset 0 (reference behavior: a
    truncated file loses its identity)."""
    d = str(tmp_path)
    _write(f"{d}/t.log", "original content first line\n")
    c = fp.FingerprintedConsumer(spark, f"{d}/state", size=16)
    c.poll(f"{d}/*.log")
    _write(f"{d}/t.log", "entirely different text\n")  # truncate + rewrite
    out = _lines(c.poll(f"{d}/*.log"))
    assert [x[2] for x in out] == ["entirely different text"]


def test_short_file_growth_matches_by_startswith(spark, tmp_path):
    """A file shorter than the fingerprint size keeps its identity as it
    grows: the new longer fingerprint StartsWith the stored short one
    (fingerprint.go:68-90), and the store re-keys to the longer form."""
    d = str(tmp_path)
    _write(f"{d}/g.log", "tiny first line content here ok\n")  # 32 bytes
    c = fp.FingerprintedConsumer(spark, f"{d}/state", size=256)
    first = c.poll(f"{d}/*.log")
    assert len(first.collect()) == 1
    _write(f"{d}/g.log", "grown line two\ngrown line three\n", mode="a")
    out = _lines(c.poll(f"{d}/*.log"))
    # in-file order: only the two appended lines, not the original
    assert [x[2] for x in out] == ["grown line two", "grown line three"]
    # third poll with no change: nothing re-emitted
    assert c.poll(f"{d}/*.log").count() == 0


def test_incomplete_trailing_line_waits_for_newline(spark, tmp_path):
    d = str(tmp_path)
    _write(f"{d}/p.log", "complete line number one\npartial")
    c = fp.FingerprintedConsumer(spark, f"{d}/state", size=16)
    out = _lines(c.poll(f"{d}/*.log"))
    assert [x[2] for x in out] == ["complete line number one"]
    _write(f"{d}/p.log", " now complete\n", mode="a")
    out2 = _lines(c.poll(f"{d}/*.log"))
    assert [x[2] for x in out2] == ["partial now complete"]


def test_fingerprint_min_size_enforced(spark):
    import pytest

    with pytest.raises(ValueError):
        fp.fingerprint_files(spark, [], size=8)


def test_unseen_fingerprints_age_out_after_three_polls(spark, tmp_path):
    """tracker.go:55-57 — knownFiles rotates 3 poll generations: a
    fingerprint unseen for 3 polls drops from the store, and a file
    recreated with those bytes afterwards re-reads from zero; one that
    reappears within the horizon still resumes."""
    import json

    d = str(tmp_path)
    content = "aged out content line number one\n"
    _write(f"{d}/a.log", content)
    c = fp.FingerprintedConsumer(spark, f"{d}/state", size=16)
    assert c.poll(f"{d}/*.log").count() == 1
    os.remove(f"{d}/a.log")
    _write(f"{d}/b.log", "keepalive so polls see something\n")
    for _ in range(3):
        c.poll(f"{d}/*.log")
    state = json.load(open(f"{d}/state/fingerprint_offsets.json"))
    # only b's fingerprint survives the 3-generation rotation
    assert len(state["files"]) == 1
    # a recreated file with the SAME first bytes is a NEW file now
    _write(f"{d}/a.log", content)
    out = [r.line for r in c.poll(f"{d}/*.log").collect()]
    assert out == [content.strip()]


def test_reappearing_file_within_horizon_still_resumes(spark, tmp_path):
    d = str(tmp_path)
    content = "short absence content line one\n"
    _write(f"{d}/a.log", content)
    c = fp.FingerprintedConsumer(spark, f"{d}/state", size=16)
    assert c.poll(f"{d}/*.log").count() == 1
    os.remove(f"{d}/a.log")
    _write(f"{d}/b.log", "keepalive\n")
    c.poll(f"{d}/*.log")  # one absent poll (< 3 generations)
    _write(f"{d}/a.log", content + "tail after reappearing\n")
    out = [r.line for r in c.poll(f"{d}/*.log").collect()]
    assert out == ["tail after reappearing"]

"""CLI argument-surface tests (JVM-free; end-to-end ingest flows are
covered by tests/test_ingest.py and the module was smoke-run in batch,
stream, and invalid-combo modes)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from huckli_spark.cli import _parse_ts, build_parser


def test_parser_accepts_reference_flags():
    p = build_parser()
    a = p.parse_args(
        ["--db", "wh", "--file-type", "verified-speedtest", "--dir", "raw",
         "--after", "2024-01-01T00:00:00", "--before", "2024-02-01T00:00:00"]
    )
    assert a.file_type == "verified-speedtest"
    assert a.after.tzinfo is not None  # naive ISO pinned to UTC
    assert not a.continue_ and a.file is None and not a.stream


def test_parser_continue_and_file_flags():
    p = build_parser()
    a = p.parse_args(
        ["--db", "wh", "--file-type", "mobile-rewards", "--dir", "raw",
         "--continue", "--stream"]
    )
    assert a.continue_ and a.stream


def test_parser_rejects_unknown_file_type():
    p = build_parser()
    with pytest.raises(SystemExit):
        p.parse_args(["--db", "wh", "--file-type", "nope", "--dir", "raw"])


def test_parse_ts_preserves_explicit_offset():
    dt = _parse_ts("2024-01-01T05:00:00+02:00")
    assert dt.astimezone(timezone.utc) == datetime(
        2024, 1, 1, 3, 0, 0, tzinfo=timezone.utc
    )


def test_parser_warehouse_mode_flags():
    p = build_parser()
    a = p.parse_args(
        ["--db", "wh", "--file-type", "verified-speedtest", "--dir", "raw",
         "--idempotent", "--acid"]
    )
    assert a.idempotent and a.acid
    d = p.parse_args(["--db", "wh", "--file-type", "verified-speedtest", "--dir", "raw"])
    assert not d.idempotent and not d.acid  # reference-parity default

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


def test_query_mode_runs_sql_over_warehouse(spark, tmp_path, capsys):
    # end-to-end: ingest a file, then query it back through the CLI's
    # post-ingest SQL surface (the reference's open-the-db-and-SQL step)
    import json

    from huckli_spark.cli import main
    from tests.test_ingest import T0_MS, _speedtest_payloads
    from huckli_spark.sources.framing import write_framed_gzip

    raw = tmp_path / "raw"
    raw.mkdir()
    write_framed_gzip(
        str(raw / f"verified_speedtest.{T0_MS}.gz"), _speedtest_payloads(6)
    )
    db = str(tmp_path / "wh")
    assert main(["--db", db, "--file-type", "verified-speedtest", "--dir", str(raw)]) == 0
    capsys.readouterr()
    rc = main(
        ["--db", db, "--query",
         "SELECT count(*) AS n FROM verified_speedtest_report"]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert json.loads(out[-1]) == {"n": 6}


def test_ingest_mode_requires_file_type_and_dir(capsys):
    from huckli_spark.cli import main

    assert main(["--db", "wh"]) == 2


def test_vacuum_mode_sweeps_acid_orphans(spark, tmp_path, capsys):
    import json
    import os

    from huckli_spark.cli import main
    from huckli_spark.ingest.warehouse import Warehouse
    from huckli_spark.ingest.txlog import TransactionLog
    from tests.test_ingest import T0_MS, _speedtest_payloads
    from huckli_spark.sources.framing import write_framed_gzip

    raw = tmp_path / "raw"
    raw.mkdir()
    write_framed_gzip(
        str(raw / f"verified_speedtest.{T0_MS}.gz"), _speedtest_payloads(4)
    )
    db = str(tmp_path / "wh")
    wh = Warehouse(spark, db, idempotent=True, acid=True)
    wh.ingest("verified-speedtest", raw)
    # plant an uncommitted staging dir (crash-before-publish)
    log = TransactionLog(wh.table_path("verified_speedtest_report"))
    os.makedirs(os.path.join(log.staging_dir()))
    assert main(["--db", db, "--vacuum", "--vacuum-grace", "0"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["mode"] == "vacuum"
    assert "verified_speedtest_report" in out["swept"]
    assert wh.table("verified_speedtest_report").count() == 4


def test_parser_warehouse_mode_flags():
    p = build_parser()
    a = p.parse_args(
        ["--db", "wh", "--file-type", "verified-speedtest", "--dir", "raw",
         "--idempotent", "--acid"]
    )
    assert a.idempotent and a.acid
    d = p.parse_args(["--db", "wh", "--file-type", "verified-speedtest", "--dir", "raw"])
    assert not d.idempotent and not d.acid  # reference-parity default

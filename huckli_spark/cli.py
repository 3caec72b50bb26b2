"""CLI entry point — the reference's ``huckli-import`` surface
(/root/reference/huckli-import/src/main.rs:5-20) re-expressed for the
Spark warehouse.

    python -m huckli_spark.cli --db ./warehouse --file-type mobile-rewards \\
        --dir ./raw [--after ISO] [--before ISO] [--continue] [--file KEY]

Flag semantics are parity-faithful (A18, huckli-import/src/lib.rs:
240-305): ``--continue`` resumes from the ``files_processed``
checkpoint and cannot combine with ``--after``; ``--file`` ingests one
named file and cannot combine with ``--before``. ``--stream`` runs the
Structured Streaming pipeline instead (availableNow: drain the backlog
and stop — the continuous upgrade of ``--continue``).
"""

from __future__ import annotations

import argparse
import json
import sys
from datetime import datetime, timezone


def _parse_ts(s: str) -> datetime:
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt


def build_parser() -> argparse.ArgumentParser:
    from huckli_spark.ingest.filetypes import REGISTRY

    p = argparse.ArgumentParser(
        prog="huckli_spark", description="PySpark-native huckli importer"
    )
    p.add_argument("--db", required=True, help="warehouse directory")
    p.add_argument(
        "--file-type", choices=sorted(REGISTRY), dest="file_type", default=None
    )
    p.add_argument("--dir", default=None, help="directory of raw .gz files")
    p.add_argument("--after", type=_parse_ts, default=None)
    p.add_argument("--before", type=_parse_ts, default=None)
    p.add_argument(
        "--continue", action="store_true", dest="continue_", default=False
    )
    p.add_argument("--file", default=None, help="ingest exactly this file key")
    p.add_argument(
        "--stream",
        action="store_true",
        help="use the Structured Streaming pipeline (drains the backlog)",
    )
    p.add_argument(
        "--checkpoint",
        default=None,
        help="streaming checkpoint dir (default: <db>/_stream_checkpoints/<type>)",
    )
    p.add_argument(
        "--idempotent",
        action="store_true",
        help="re-ingesting a file replaces its rows (partition overwrite)",
    )
    p.add_argument(
        "--acid",
        action="store_true",
        help="transaction-log commits: atomic, crash-safe, exactly-once "
        "re-ingest when combined with --idempotent",
    )
    p.add_argument(
        "--query",
        default=None,
        metavar="SQL",
        help="skip ingest and run SQL over the warehouse tables (the "
        "post-ingest surface — the reference's 'open the DuckDB file' "
        "step); prints one JSON row per line",
    )
    p.add_argument(
        "--vacuum",
        action="store_true",
        help="sweep crash orphans from every acid table's transaction "
        "log, then exit (maintenance; implies --acid)",
    )
    p.add_argument(
        "--vacuum-grace",
        type=float,
        default=3600.0,
        metavar="SECONDS",
        help="vacuum retention window: candidates younger than this "
        "are kept so an in-flight publish is never swept (default 1h; "
        "use 0 only when no writer can be active)",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from huckli_spark.ingest.warehouse import Warehouse
    from huckli_spark.session import get_spark
    from huckli_spark.sources.listing import FileSelection

    if args.vacuum:
        import os

        from huckli_spark.ingest.txlog import TransactionLog

        if not os.path.isdir(args.db):
            print(f"error: no such warehouse: {args.db}", file=sys.stderr)
            return 2
        if args.query is not None:
            print("error: --vacuum and --query are exclusive", file=sys.stderr)
            return 2
        swept: dict[str, int] = {}
        for name in sorted(os.listdir(args.db)):
            log = TransactionLog(os.path.join(args.db, name))
            if log.exists():
                swept[name] = len(log.vacuum(grace_seconds=args.vacuum_grace))
        print(json.dumps({"mode": "vacuum", "swept": swept}))
        return 0

    if args.query is None and (args.file_type is None or args.dir is None):
        print("error: --file-type and --dir are required to ingest", file=sys.stderr)
        return 2

    spark = get_spark(app_name=f"huckli_{args.file_type or 'sql'}")
    wh = Warehouse(spark, args.db, idempotent=args.idempotent, acid=args.acid)
    if args.query is not None:
        for row in wh.sql(args.query).collect():
            print(json.dumps(row.asDict(), default=str))
        return 0
    if args.stream:
        import os

        from huckli_spark.streaming.ingest import stream_ingest

        ckpt = args.checkpoint or os.path.join(
            args.db, "_stream_checkpoints", args.file_type
        )
        q = stream_ingest(spark, args.file_type, args.dir, wh, ckpt)
        q.awaitTermination()
        print(json.dumps({"file_type": args.file_type, "mode": "stream"}))
        return 0
    selection = FileSelection(
        after=args.after,
        before=args.before,
        continue_=args.continue_,
        file=args.file,
    )
    try:
        counts = wh.ingest(args.file_type, args.dir, selection)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    print(json.dumps({"file_type": args.file_type, "appended": counts}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

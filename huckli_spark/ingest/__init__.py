"""Ingest layer: declarative file-type registry (replaces the
reference's derive macro, /root/reference/huckli-import-derive), the
frame->decode->project pipeline, and the files_processed checkpoint
(huckli-db/src/lib.rs:16-56)."""

"""Tokenizer artifact persistence — train once, SAVE the trained
table, reload in another session (or on another cluster) and encode
bit-identically without retraining. The tokenizer twin of
:mod:`huckli_spark.operators.ann_index`, covering both trainers:

* BPE (:mod:`huckli_spark.operators.bpe`): the ordered merge table
  IS the tokenizer — saved as (rank, a, b) parquet.
* Unigram-LM (:mod:`huckli_spark.operators.unigram_lm`): the
  (piece, cost_micro) table IS the tokenizer — saved as parquet.

Layout under a store directory (atomic publish: built in a ``_tmp``
sibling and ``os.replace``d into place — the write-audit-publish
discipline of ``ingest/txlog`` / ``ann_index``):

* ``manifest.json`` — kind ('bpe' | 'unigram'), training params, row
  count, and a content checksum (md5 over the canonical sorted
  entries; both tables are strings + ints, so equal checksums mean
  bit-equal tokenizers — no float caveats at all).
* ``table.parquet`` — the table itself.

Scale: both tables are vocab-sized (driver-safe, broadcast at encode
time); the store never touches the corpus. Integrity: ``load``
recomputes the checksum and refuses drifted/tampered artifacts, and
refuses a kind mismatch — the same contract ``load_ann_index``
enforces.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

FORMAT_VERSION = 1
MANIFEST = "manifest.json"
KINDS = ("bpe", "unigram")


def _checksum_entries(entries: list) -> str:
    """md5 over canonical (string/int) tuple reprs, sorted."""
    h = hashlib.md5()
    for row in sorted(entries):
        for v in row:
            if isinstance(v, str):
                h.update(b"s:" + v.encode("utf-8"))
            else:
                h.update(b"i:" + str(int(v)).encode())
            h.update(b"\x00")
        h.update(b"\n")
    return h.hexdigest()


def save_tokenizer(
    path: str,
    kind: str,
    table: DataFrame,
    params: dict | None = None,
) -> dict:
    """Persist a trained tokenizer table atomically; returns the
    manifest. ``table`` schema: bpe -> (rank, a, b); unigram ->
    (piece, cost)."""
    if kind not in KINDS:
        raise ValueError(f"unknown tokenizer kind {kind!r} (use {KINDS})")
    cols = ["rank", "a", "b"] if kind == "bpe" else ["piece", "cost"]
    missing = [c for c in cols if c not in table.columns]
    if missing:
        raise ValueError(f"{kind} table missing columns {missing}")
    rows = [tuple(r[c] for c in cols) for r in table.select(*cols).collect()]
    tmp = path.rstrip("/") + "._tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    table.select(*cols).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(tmp, "table.parquet")
    )
    manifest = {
        "format_version": FORMAT_VERSION,
        "kind": kind,
        "columns": cols,
        "n_rows": len(rows),
        "checksum": _checksum_entries(rows),
        "params": dict(params or {}),
    }
    with open(os.path.join(tmp, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    final = path.rstrip("/")
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp, final)
    return manifest


def load_tokenizer(
    spark: SparkSession, path: str, expect_kind: str | None = None
) -> tuple[DataFrame, dict]:
    """Load + verify a tokenizer store; returns (table, manifest).
    Raises on checksum drift, row-count drift, kind mismatch, or a
    future format version."""
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    if manifest["format_version"] > FORMAT_VERSION:
        raise ValueError(
            f"tokenizer store format {manifest['format_version']} is newer "
            f"than this reader ({FORMAT_VERSION})"
        )
    kind = manifest["kind"]
    if expect_kind is not None and kind != expect_kind:
        raise ValueError(
            f"tokenizer kind mismatch: store has {kind!r}, caller "
            f"expected {expect_kind!r}"
        )
    cols = manifest["columns"]
    table = spark.read.parquet(os.path.join(path, "table.parquet")).select(
        *cols
    )
    rows = [tuple(r[c] for c in cols) for r in table.collect()]
    if len(rows) != manifest["n_rows"]:
        raise ValueError(
            f"tokenizer store row drift: manifest says {manifest['n_rows']}"
            f", table has {len(rows)}"
        )
    got = _checksum_entries(rows)
    if got != manifest["checksum"]:
        raise ValueError(
            "tokenizer store checksum mismatch (artifact tampered or "
            f"corrupted): manifest {manifest['checksum']}, table {got}"
        )
    return table, manifest


# ----------------------------------------------------------- BPE adapters
def bpe_table(spark: SparkSession, merges: list) -> DataFrame:
    """Ordered merge list -> the (rank, a, b) relation ``save_tokenizer``
    stores. Rank IS the merge order — BPE apply is order-sensitive."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank int, a string, b string",
    )


def merges_from_table(table: DataFrame) -> list:
    """(rank, a, b) relation -> the ordered merge list bpe_apply
    consumes."""
    rows = sorted(table.collect(), key=lambda r: r["rank"])
    return [(r["a"], r["b"]) for r in rows]

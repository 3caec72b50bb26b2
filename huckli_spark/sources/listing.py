"""File listing with lower-bound pushdown (reference A1-A4, A18).

FileInfo parse parity: filename regex ``([a-z,\\d,_]+)\\.(\\d+)(\\.gz)?``
(/root/reference/huckli-s3/src/lib.rs:16), key =
``{prefix}.{epoch_ms}.gz``; the ``after`` bound is pushed into the
listing as a synthetic start-key exploiting lexicographic order
(huckli-s3/src/lib.rs:90-100 — note the reference composes it with
``prefix.replace(".", "")``, preserved here), the ``before`` bound is a
post-listing filter (:140).

S3 listing uses boto3 when available (import-gated — not present in
the test container); the local-directory implementation has identical
semantics and backs the end-to-end tests.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Optional

FILENAME_RE = re.compile(r"([a-z,\d,_]+)\.(\d+)(\.gz)?")


@dataclass(frozen=True)
class FileInfo:
    key: str
    prefix: str
    timestamp: datetime  # UTC, from the epoch-ms filename component

    @classmethod
    def from_key(cls, key: str) -> "FileInfo":
        name = key.rsplit("/", 1)[-1]
        m = FILENAME_RE.match(name)
        if not m:
            raise ValueError(f"unparseable file key: {key!r}")
        prefix, epoch_ms = m.group(1), int(m.group(2))
        ts = datetime.fromtimestamp(epoch_ms / 1000.0, tz=timezone.utc)
        return cls(key=key, prefix=prefix, timestamp=ts)


def start_after_key(prefix: str, after: datetime) -> str:
    """Synthetic lower-bound key (A2). Reference quirk preserved: the
    prefix is stripped of '.' when composing the bound key
    (huckli-s3/src/lib.rs:90-92)."""
    ms = int(after.timestamp() * 1000)
    return f"{prefix.replace('.', '')}.{ms}.gz"


def list_local(
    directory: str,
    prefix: str,
    after: Optional[datetime] = None,
    before: Optional[datetime] = None,
) -> list[FileInfo]:
    """Local-FS listing with the same bound semantics as the S3 path:
    ``after`` is strict (start_after excludes the bound key itself),
    ``before`` is inclusive-upper via ``timestamp <= before``."""
    # The radio_usage_stats v1 prefix carries a trailing '.' to keep the
    # S3 listing from matching v2 keys (usage.rs:8-12). Filenames parse
    # to the dotless prefix, so normalize for the equality check while
    # keeping the dotted form for the startswith (S3-prefix-semantics)
    # match.
    match_prefix = prefix if prefix.endswith(".") else prefix + "."
    bare_prefix = prefix.rstrip(".")
    lower = start_after_key(bare_prefix, after) if after else None
    out = []
    for name in sorted(os.listdir(directory)):
        if not name.startswith(match_prefix):
            continue
        try:
            info = FileInfo.from_key(os.path.join(directory, name))
        except ValueError:
            continue
        if info.prefix != bare_prefix:
            continue
        if lower is not None and name <= lower:
            continue
        if before is not None and info.timestamp > before:
            continue
        out.append(info)
    return out


def list_s3(
    bucket: str,
    prefix: str,
    after: Optional[datetime] = None,
    before: Optional[datetime] = None,
    endpoint_url: Optional[str] = None,
    region: str = "us-west-2",
) -> list[FileInfo]:
    """Paginated ListObjectsV2 with start_after pushdown (A1/A2).
    Region default mirrors the reference (huckli-s3/src/lib.rs:45)."""
    try:
        import boto3  # type: ignore
    except ImportError as e:  # pragma: no cover - no boto3 in container
        raise RuntimeError(
            "boto3 not available; use list_local or install boto3"
        ) from e
    client = boto3.client("s3", endpoint_url=endpoint_url, region_name=region)
    kwargs: dict = {"Bucket": bucket, "Prefix": prefix}
    if after is not None:
        kwargs["StartAfter"] = start_after_key(prefix, after)
    out: list[FileInfo] = []
    while True:
        resp = client.list_objects_v2(**kwargs)
        for obj in resp.get("Contents", []):
            try:
                info = FileInfo.from_key(obj["Key"])
            except ValueError:
                continue
            if before is not None and info.timestamp > before:
                continue
            out.append(info)
        if not resp.get("IsTruncated"):
            return out
        kwargs["ContinuationToken"] = resp["NextContinuationToken"]


@dataclass
class FileSelection:
    """--after/--before/--continue/--file semantics (A18,
    huckli-import/src/lib.rs:240-305)."""

    after: Optional[datetime] = None
    before: Optional[datetime] = None
    continue_: bool = False
    file: Optional[str] = None

    def validate(self) -> None:
        # reference rejects continue+after and file+before
        # (huckli-import/src/lib.rs:253-263)
        if self.continue_ and self.after is not None:
            raise ValueError("cannot combine --continue with --after")
        if self.file is not None and self.before is not None:
            raise ValueError("cannot combine --file with --before")

    def resolve_files(
        self,
        directory: str,
        prefix: str,
        checkpoint_after: Optional[datetime] = None,
    ) -> list[FileInfo]:
        """Plan the file set. ``checkpoint_after`` is the warehouse's
        max processed timestamp (A17) when ``continue_`` is set; the
        caller must supply it (error if absent, matching the
        reference's 'Cannot continue' error, lib.rs:294)."""
        self.validate()
        if self.file is not None:
            return [FileInfo.from_key(self.file)]  # A3.3 single-file path
        after = self.after
        if self.continue_:
            if checkpoint_after is None:
                raise ValueError("cannot continue: no previously processed files")
            after = checkpoint_after
        return list_local(directory, prefix, after=after, before=self.before)

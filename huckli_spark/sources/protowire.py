"""Minimal protobuf wire-format codec (pure Python, public spec:
https://protobuf.dev/programming-guides/encoding/).

The reference decodes prost-generated Helium messages
(/root/reference/huckli-import/src/lib.rs:215-238). The helium-proto
descriptors aren't vendored in this environment, so the engine ships
its own declarative message schemas (ingest/filetypes.py) and this
generic codec. The codec handles the subset the reference's tables
need: varint scalars, 64/32-bit fixed, length-delimited
(string/bytes/embedded message), repeated fields, enums-as-names.

Decode errors raise ``WireError``; the pipeline's frame loop catches
them and drops the record, matching the reference's
log-to-stderr-and-skip tolerance (huckli-import/src/lib.rs:227-235).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Any, Optional


class WireError(ValueError):
    pass


# wire types
VARINT, I64, LEN, I32 = 0, 1, 2, 5

_SCALAR_WIRE = {
    "uint64": VARINT,
    "int64": VARINT,
    "uint32": VARINT,
    "int32": VARINT,
    "bool": VARINT,
    "enum": VARINT,
    "double": I64,
    "float": I32,
    "string": LEN,
    "bytes": LEN,
    "message": LEN,
}

# Numeric scalars that proto3 (and prost) pack into a single LEN record
# when repeated — e.g. BoostedHex.multipliers. Decoders must accept both
# packed and unpacked forms per the spec.
_PACKABLE = frozenset(
    ("uint64", "int64", "uint32", "int32", "bool", "enum", "double", "float")
)


@dataclass(frozen=True)
class Field:
    num: int
    name: str
    ptype: str  # key of _SCALAR_WIRE
    repeated: bool = False
    # enum: value -> NAME mapping (proto as_str_name parity —
    # e.g. mobile_rewards.rs:172 stores enum string names)
    enum_names: Optional[dict[int, str]] = None
    # message: nested schema
    schema: Optional["Msg"] = None


@dataclass(frozen=True)
class Msg:
    name: str
    fields: tuple[Field, ...] = field(default_factory=tuple)

    def by_num(self) -> dict[int, Field]:
        return {f.num: f for f in self.fields}


# ---------------------------------------------------------------------------
# encoding (fixture generation / tests)
# ---------------------------------------------------------------------------
def _enc_varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64  # two's-complement, proto int32/int64 negative
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_tag(num: int, wire: int) -> bytes:
    return _enc_varint((num << 3) | wire)


def _enc_scalar(f: Field, v: Any) -> bytes:
    """Raw (tag-less) scalar payload bytes for one value."""
    if f.ptype in ("uint64", "int64", "uint32", "int32"):
        return _enc_varint(int(v))
    if f.ptype == "bool":
        return _enc_varint(1 if v else 0)
    if f.ptype == "enum":
        if isinstance(v, str):
            rev = {n: k for k, n in (f.enum_names or {}).items()}
            v = rev[v]
        return _enc_varint(int(v))
    if f.ptype == "double":
        return struct.pack("<d", float(v))
    if f.ptype == "float":
        return struct.pack("<f", float(v))
    raise WireError(f"unsupported scalar ptype {f.ptype}")  # pragma: no cover


def encode(msg: Msg, values: dict[str, Any]) -> bytes:
    """Encode a dict of python values per the schema (test fixtures).

    Repeated numeric scalars are emitted PACKED (one LEN record), the
    proto3/prost default — so fixtures exercise the same wire shape as
    real prost-encoded Helium data (reference reads e.g.
    BoostedHex.multipliers via prost: huckli-import/src/lib.rs:215-238).
    """
    out = bytearray()
    for f in msg.fields:
        if f.name not in values or values[f.name] is None:
            continue
        vals = values[f.name] if f.repeated else [values[f.name]]
        if f.repeated and f.ptype in _PACKABLE:
            if not vals:
                continue
            payload = b"".join(_enc_scalar(f, v) for v in vals)
            out += _enc_tag(f.num, LEN) + _enc_varint(len(payload)) + payload
            continue
        for v in vals:
            wire = _SCALAR_WIRE[f.ptype]
            out += _enc_tag(f.num, wire)
            if f.ptype in _PACKABLE:
                out += _enc_scalar(f, v)
            elif f.ptype == "string":
                b = v.encode("utf-8")
                out += _enc_varint(len(b)) + b
            elif f.ptype == "bytes":
                out += _enc_varint(len(v)) + bytes(v)
            elif f.ptype == "message":
                b = encode(f.schema, v)
                out += _enc_varint(len(b)) + b
            else:  # pragma: no cover
                raise WireError(f"unsupported ptype {f.ptype}")
    return bytes(out)


# ---------------------------------------------------------------------------
# decoding
# ---------------------------------------------------------------------------
def _dec_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise WireError("truncated varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise WireError("varint too long")


# decode() runs once per record in the ingest hot path; rebuilding the
# field map and defaults per record measurably dominates small-message
# decode. The tables are memoized on the Msg instance itself (frozen
# dataclass — set via object.__setattr__), so the cache's lifetime is
# exactly the schema object's and ad-hoc test Msgs can't collide.


def _msg_tables(msg: Msg) -> tuple[dict[int, Field], list[tuple[str, Any, bool]]]:
    cached = getattr(msg, "_decode_tables", None)
    if cached is None:
        defaults: list[tuple[str, Any, bool]] = []
        for f in msg.fields:
            if f.repeated or f.schema is not None:
                # mutable ([]) or nested defaults must be built fresh
                defaults.append((f.name, f, True))
            else:
                defaults.append((f.name, _default(f), False))
        cached = (msg.by_num(), defaults)
        object.__setattr__(msg, "_decode_tables", cached)
    return cached


def decode(msg: Msg, data: bytes) -> dict[str, Any]:
    """Decode bytes into {field_name: value} per the schema. Unknown
    fields are skipped (standard proto forward-compat); missing fields
    take proto3 defaults (0 / "" / b"" / False / first enum name /
    None for messages, [] for repeated)."""
    by_num, defaults = _msg_tables(msg)
    out: dict[str, Any] = {}
    pos = 0
    n = len(data)
    while pos < n:
        # single-byte varint fast path: field nums <= 15 cover every
        # message in the registry, and most scalar values are small
        b = data[pos]
        if b < 0x80:
            tag = b
            pos += 1
        else:
            tag, pos = _dec_varint(data, pos)
        num, wire = tag >> 3, tag & 7
        f = by_num.get(num)
        if wire == VARINT:
            b = data[pos] if pos < n else 0x80
            if b < 0x80:
                raw: Any = b
                pos += 1
            else:
                raw, pos = _dec_varint(data, pos)
            val: Any = raw
        elif wire == I64:
            if pos + 8 > n:
                raise WireError("truncated i64")
            val = data[pos : pos + 8]
            pos += 8
        elif wire == I32:
            if pos + 4 > n:
                raise WireError("truncated i32")
            val = data[pos : pos + 4]
            pos += 4
        elif wire == LEN:
            ln, pos = _dec_varint(data, pos)
            if pos + ln > n:
                raise WireError("truncated len-delimited")
            val = data[pos : pos + ln]
            pos += ln
        else:
            raise WireError(f"unsupported wire type {wire}")
        if f is None:
            continue  # unknown field: skip
        expected = _SCALAR_WIRE[f.ptype]
        if wire == LEN and expected != LEN:
            # Packed repeated numerics (proto3/prost default encoding):
            # one LEN record holding back-to-back scalar payloads.
            if not (f.repeated and f.ptype in _PACKABLE):
                raise WireError(f"{msg.name}.{f.name}: LEN payload for scalar {f.ptype}")
            out.setdefault(f.name, []).extend(_dec_packed(f, val))
            continue
        if wire != expected:
            raise WireError(
                f"{msg.name}.{f.name}: wire type {wire}, expected {expected} for {f.ptype}"
            )
        val = _convert(f, val, wire)
        if f.repeated:
            out.setdefault(f.name, []).append(val)
        else:
            out[f.name] = val
    # proto3 defaults for absent fields
    for name, d, fresh in defaults:
        if name not in out:
            out[name] = _default(d) if fresh else d
    return out


def _dec_packed(f: Field, payload: bytes) -> list:
    """Decode a packed-repeated LEN payload into a list of scalars."""
    swire = _SCALAR_WIRE[f.ptype]
    vals = []
    pos = 0
    n = len(payload)
    while pos < n:
        if swire == VARINT:
            raw: Any
            raw, pos = _dec_varint(payload, pos)
        elif swire == I64:
            if pos + 8 > n:
                raise WireError(f"truncated packed i64 in {f.name}")
            raw = payload[pos : pos + 8]
            pos += 8
        else:  # I32
            if pos + 4 > n:
                raise WireError(f"truncated packed i32 in {f.name}")
            raw = payload[pos : pos + 4]
            pos += 4
        vals.append(_convert(f, raw, swire))
    return vals


def _convert(f: Field, val: Any, wire: int) -> Any:
    t = f.ptype
    if t in ("uint64", "uint32"):
        return int(val)
    if t in ("int64", "int32"):
        v = int(val)
        if v >= 1 << 63:
            v -= 1 << 64
        return v
    if t == "bool":
        return bool(val)
    if t == "enum":
        names = f.enum_names or {}
        return names.get(int(val), str(int(val)))
    if t == "double":
        if wire != I64:
            raise WireError("double field with wrong wire type")
        return struct.unpack("<d", val)[0]
    if t == "float":
        if wire != I32:
            raise WireError("float field with wrong wire type")
        return struct.unpack("<f", val)[0]
    if t == "string":
        try:
            return val.decode("utf-8")
        except UnicodeDecodeError as e:
            raise WireError(f"bad utf-8 in {f.name}") from e
    if t == "bytes":
        return bytes(val)
    if t == "message":
        return decode(f.schema, val)
    raise WireError(f"unsupported ptype {t}")


def _default(f: Field) -> Any:
    if f.repeated:
        return []
    t = f.ptype
    if t in ("uint64", "int64", "uint32", "int32"):
        return 0
    if t == "bool":
        return False
    if t == "double" or t == "float":
        return 0.0
    if t == "string":
        return ""
    if t == "bytes":
        return b""
    if t == "enum":
        names = f.enum_names or {}
        return names.get(0, "0")
    if t == "message":
        return None
    raise WireError(f"unsupported ptype {t}")

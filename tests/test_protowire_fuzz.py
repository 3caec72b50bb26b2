"""Property-based round-trip fuzz for the protobuf wire codec.

encode(decode-schema, values) -> decode == values for arbitrary field
contents, over a message exercising every wire shape the registry
uses: varint scalars (signed/unsigned), doubles, bools, enums,
strings, bytes, packed repeated numerics, repeated messages, and
two-level nesting. This is the structural complement to
tests/test_wire_vectors.py (which pins specific transcribed layouts
byte-by-byte).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from huckli_spark.sources.protowire import Field, Msg, decode, encode

_INNER = Msg(
    "Inner",
    (
        Field(1, "a", "uint64"),
        Field(2, "s", "string"),
        Field(3, "reps", "uint32", repeated=True),
    ),
)

_FUZZ = Msg(
    "Fuzz",
    (
        Field(1, "u64", "uint64"),
        Field(2, "i32", "int32"),
        Field(3, "flag", "bool"),
        Field(4, "e", "enum", enum_names={0: "ZERO", 1: "ONE", 2: "TWO"}),
        Field(5, "txt", "string"),
        Field(6, "blob", "bytes"),
        Field(7, "d", "double"),
        Field(8, "packed", "uint64", repeated=True),
        Field(9, "msgs", "message", repeated=True, schema=_INNER),
        Field(10, "nested", "message", schema=_INNER),
    ),
)

_inner_values = st.fixed_dictionaries(
    {
        "a": st.integers(min_value=0, max_value=(1 << 64) - 1),
        "s": st.text(max_size=40),
        "reps": st.lists(st.integers(min_value=0, max_value=(1 << 32) - 1), max_size=8),
    }
)

_fuzz_values = st.fixed_dictionaries(
    {
        "u64": st.integers(min_value=0, max_value=(1 << 64) - 1),
        "i32": st.integers(min_value=-(1 << 31), max_value=(1 << 31) - 1),
        "flag": st.booleans(),
        "e": st.sampled_from(["ZERO", "ONE", "TWO"]),
        "txt": st.text(max_size=60),
        "blob": st.binary(max_size=60),
        "d": st.floats(allow_nan=False, allow_infinity=True),
        "packed": st.lists(
            st.integers(min_value=0, max_value=(1 << 64) - 1), max_size=10
        ),
        "msgs": st.lists(_inner_values, max_size=4),
        "nested": _inner_values,
    }
)


@settings(max_examples=200, deadline=None)
@given(_fuzz_values)
def test_roundtrip(values):
    out = decode(_FUZZ, encode(_FUZZ, values))
    assert out == values


@settings(max_examples=60, deadline=None)
@given(_fuzz_values)
def test_unknown_fields_are_skipped(values):
    """Appending unknown fields (forward compat) must not disturb the
    declared ones — the registry relies on this for every skipped
    oneof arm and pubkey field."""
    def _varint(v: int) -> bytes:
        out = bytearray()
        while True:
            b = v & 0x7F
            v >>= 7
            out.append(b | 0x80 if v else b)
            if not v:
                return bytes(out)

    extra = (
        _varint((99 << 3) | 0) + b"\x2a"           # unknown varint field 99
        + _varint((100 << 3) | 2) + bytes([3]) + b"xyz"  # unknown LEN field 100
    )
    out = decode(_FUZZ, encode(_FUZZ, values) + extra)
    assert out == values

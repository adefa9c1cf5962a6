"""Schema-driven proto3 wire codec — no codegen, no dependencies.

The reference's SDK and node exchange protobuf messages
(src/proto/proto/db3_mutation_v2.proto et al., encoded by prost on the
Rust side and protobuf-js in the TS SDK). This container has no
``protobuf``/``grpcio``, so the wire format is implemented directly from
the public encoding spec (https://protobuf.dev/programming-guides/encoding/):

- varint        (wire type 0) — uint32/uint64/int32/int64/bool/enum
- 64-bit        (wire type 1) — fixed64/sfixed64/double
- length-delim  (wire type 2) — string/bytes/message/packed repeated scalars
- 32-bit        (wire type 5) — fixed32/sfixed32/float

Encoding matches prost's observable behavior so round-trips against
reference-produced bytes can be byte-identical:

- fields are emitted in ascending field-number order;
- proto3 implicit-presence scalars equal to their default (0 / "" / b"" /
  False / enum 0) are skipped;
- repeated scalars are packed; repeated strings/bytes/messages are not;
- message-typed fields are emitted whenever the key is present (an empty
  dict encodes as a zero-length field — prost's Some(Message::default())).

Decoding is STRICT by design: a malformed tag, a truncated value, an
unknown field, or a wrong wire type raises :class:`WireDecodeError` rather
than being skipped. Strictness is what makes layout auto-detection sound
(wire/schemas.py decodes the same bytes under two historical field
numberings and keeps the one that validates).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field as dc_field


class WireDecodeError(ValueError):
    """Raised when bytes do not parse under a schema."""


_SCALAR_KINDS = frozenset(
    {
        "uint32", "uint64", "int32", "int64", "sint32", "sint64", "bool",
        "enum", "double", "float", "fixed64", "sfixed64", "fixed32",
        "sfixed32", "string", "bytes",
    }
)
_VARINT_KINDS = frozenset(
    {"uint32", "uint64", "int32", "int64", "sint32", "sint64", "bool", "enum"}
)
_PACKABLE_KINDS = _VARINT_KINDS | {
    "double", "float", "fixed64", "sfixed64", "fixed32", "sfixed32"
}


@dataclass(frozen=True)
class Field:
    number: int
    name: str
    kind: str  # one of _SCALAR_KINDS or "message"
    message: "Schema | None" = None  # for kind == "message"
    repeated: bool = False
    # oneof group name: at most one member of a group may be present on
    # encode; decode simply records whichever member appears last
    oneof: str | None = None

    def __post_init__(self):
        if self.kind == "message":
            if self.message is None:
                raise ValueError(f"field {self.name}: message kind needs a schema")
        elif self.kind not in _SCALAR_KINDS:
            raise ValueError(f"field {self.name}: unknown kind {self.kind!r}")


@dataclass(frozen=True)
class Schema:
    name: str
    fields: tuple[Field, ...]
    _by_number: dict = dc_field(init=False, repr=False, compare=False, default=None)

    def __post_init__(self):
        by_num = {}
        for f in self.fields:
            if f.number in by_num:
                raise ValueError(f"{self.name}: duplicate field number {f.number}")
            by_num[f.number] = f
        object.__setattr__(self, "_by_number", by_num)

    # ------------------------------------------------------------- decode

    def decode(self, data: bytes) -> dict:
        """Parse ``data`` into {field_name: value}. Strict: raises
        WireDecodeError on unknown fields, bad wire types, or truncation."""
        out: dict = {}
        i = 0
        n = len(data)
        while i < n:
            tag, i = _read_varint(data, i)
            fnum, wt = tag >> 3, tag & 7
            f = self._by_number.get(fnum)
            if f is None:
                raise WireDecodeError(f"{self.name}: unknown field {fnum}")
            if f.repeated and f.kind in _PACKABLE_KINDS and wt == 2:
                ln, i = _read_varint(data, i)
                end = i + ln
                if end > n:
                    raise WireDecodeError(f"{self.name}.{f.name}: truncated packed")
                # scan in place over the original buffer (no prefix copy);
                # the end check below catches a varint running past the
                # packed region into following fields
                j = i
                vals = out.setdefault(f.name, [])
                while j < end:
                    v, j = _read_scalar(data, j, f.kind, _expected_wire(f.kind),
                                        self.name, f.name)
                    vals.append(v)
                if j != end:
                    raise WireDecodeError(
                        f"{self.name}.{f.name}: packed element overruns field"
                    )
                i = end
                continue
            expected = 2 if f.kind in ("string", "bytes", "message") else _expected_wire(f.kind)
            if wt != expected:
                raise WireDecodeError(
                    f"{self.name}.{f.name}: wire type {wt}, expected {expected}"
                )
            if f.kind == "message":
                ln, i = _read_varint(data, i)
                if i + ln > n:
                    raise WireDecodeError(f"{self.name}.{f.name}: truncated message")
                v = f.message.decode(data[i : i + ln])
                i += ln
            else:
                v, i = _read_scalar(data, i, f.kind, wt, self.name, f.name)
            if f.repeated:
                out.setdefault(f.name, []).append(v)
            else:
                out[f.name] = v
        return out

    # ------------------------------------------------------------- encode

    def encode(self, msg: dict) -> bytes:
        """Serialize {field_name: value}; unknown keys raise ValueError."""
        known = {f.name: f for f in self.fields}
        for k in msg:
            if k not in known:
                raise ValueError(f"{self.name}: unknown key {k!r}")
        seen_oneof: dict[str, str] = {}
        parts: list[bytes] = []
        for f in sorted(self.fields, key=lambda f: f.number):
            if f.name not in msg:
                continue
            v = msg[f.name]
            if f.oneof is not None:
                prev = seen_oneof.setdefault(f.oneof, f.name)
                if prev != f.name:
                    raise ValueError(
                        f"{self.name}: oneof {f.oneof!r} set twice ({prev}, {f.name})"
                    )
            if f.repeated:
                if not isinstance(v, (list, tuple)):
                    raise ValueError(f"{self.name}.{f.name}: repeated needs a list")
                if not v:
                    continue
                if f.kind in _PACKABLE_KINDS:
                    payload = b"".join(_scalar_bytes(x, f.kind) for x in v)
                    parts.append(_tag(f.number, 2) + _varint(len(payload)) + payload)
                else:
                    for x in v:
                        parts.append(self._encode_single(f, x))
            else:
                # proto3 implicit presence skips default scalars, but oneof
                # members have EXPLICIT presence: a set member serializes even
                # at its zero value (int64_value=0, str_value="") — matching
                # protobuf-ts/prost, and required so the decoder sees the case.
                if f.kind != "message" and f.oneof is None and _is_default(v, f.kind):
                    continue
                parts.append(self._encode_single(f, v))
        return b"".join(parts)

    def _encode_single(self, f: Field, v) -> bytes:
        if f.kind == "message":
            body = f.message.encode(v)
            return _tag(f.number, 2) + _varint(len(body)) + body
        if f.kind == "string":
            b = v.encode("utf-8") if isinstance(v, str) else bytes(v)
            return _tag(f.number, 2) + _varint(len(b)) + b
        if f.kind == "bytes":
            b = bytes(v)
            return _tag(f.number, 2) + _varint(len(b)) + b
        return _tag(f.number, _expected_wire(f.kind)) + _scalar_bytes(v, f.kind)


# ---------------------------------------------------------------- low level


def _tag(fnum: int, wt: int) -> bytes:
    return _varint((fnum << 3) | wt)


def _varint(v: int) -> bytes:
    if v < 0:
        v &= (1 << 64) - 1  # two's-complement int32/int64 → 10-byte varint
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(data: bytes, i: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        if i >= len(data):
            raise WireDecodeError("truncated varint")
        if shift >= 70:
            raise WireDecodeError("varint too long")
        b = data[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _expected_wire(kind: str) -> int:
    if kind in _VARINT_KINDS:
        return 0
    if kind in ("double", "fixed64", "sfixed64"):
        return 1
    if kind in ("float", "fixed32", "sfixed32"):
        return 5
    return 2


def _is_default(v, kind: str) -> bool:
    if kind in ("string",):
        return v == ""
    if kind == "bytes":
        return len(v) == 0
    if kind == "bool":
        return not v
    if kind in ("double", "float"):
        return v == 0.0 and not _neg_zero(v)
    return v == 0


def _neg_zero(v) -> bool:
    return v == 0.0 and struct.pack("<d", float(v)) != struct.pack("<d", 0.0)


def _scalar_bytes(v, kind: str) -> bytes:
    if kind in ("uint32", "uint64", "enum"):
        return _varint(int(v))
    if kind in ("int32", "int64"):
        return _varint(int(v))
    if kind in ("sint32", "sint64"):
        return _varint(_zigzag(int(v)))
    if kind == "bool":
        return _varint(1 if v else 0)
    if kind == "double":
        return struct.pack("<d", float(v))
    if kind == "float":
        return struct.pack("<f", float(v))
    if kind in ("fixed64",):
        return struct.pack("<Q", int(v))
    if kind == "sfixed64":
        return struct.pack("<q", int(v))
    if kind == "fixed32":
        return struct.pack("<I", int(v))
    if kind == "sfixed32":
        return struct.pack("<i", int(v))
    raise ValueError(f"not a scalar kind: {kind}")


def _read_scalar(data: bytes, i: int, kind: str, wt: int, mname: str, fname: str):
    if kind in _VARINT_KINDS:
        v, i = _read_varint(data, i)
        if kind in ("int32", "int64"):
            if v >= 1 << 63:
                v -= 1 << 64
            if kind == "int32":
                v = ((v + (1 << 31)) % (1 << 32)) - (1 << 31)
        elif kind in ("sint32", "sint64"):
            v = _unzigzag(v)
        elif kind == "uint32":
            if v >= 1 << 32:
                raise WireDecodeError(f"{mname}.{fname}: uint32 overflow")
        elif kind == "bool":
            v = bool(v)
        return v, i
    if kind == "string":
        ln, i = _read_varint(data, i)
        if i + ln > len(data):
            raise WireDecodeError(f"{mname}.{fname}: truncated string")
        try:
            return data[i : i + ln].decode("utf-8"), i + ln
        except UnicodeDecodeError as e:
            raise WireDecodeError(f"{mname}.{fname}: invalid utf-8") from e
    if kind == "bytes":
        ln, i = _read_varint(data, i)
        if i + ln > len(data):
            raise WireDecodeError(f"{mname}.{fname}: truncated bytes")
        return bytes(data[i : i + ln]), i + ln
    fmt = {"double": "<d", "float": "<f", "fixed64": "<Q", "sfixed64": "<q",
           "fixed32": "<I", "sfixed32": "<i"}[kind]
    size = struct.calcsize(fmt)
    if i + size > len(data):
        raise WireDecodeError(f"{mname}.{fname}: truncated {kind}")
    return struct.unpack_from(fmt, data, i)[0], i + size

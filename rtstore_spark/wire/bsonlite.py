"""Minimal BSON codec for the reference's document payloads.

The reference stores every document as BSON bytes inside
``DocumentMutation.documents`` (db3_mutation_v2.proto:57-69); the TS SDK
serializes the user's JSON document with the ``bson`` npm package
(sdk/src/store/document_v2.ts) and the node round-trips it with the Rust
``bson`` crate (db3_storage bson_util). This container has neither, so the
subset of the public BSON spec (https://bsonspec.org/spec.html) those
libraries emit for JSON-shaped documents is implemented directly:

    0x01 double      0x02 string       0x03 embedded document
    0x04 array       0x05 binary(0x00) 0x08 bool
    0x0A null        0x10 int32        0x12 int64

Decode accepts any of the above; encode maps Python values the way the
JS ``bson`` package maps JSON values (str→string, bool→bool, None→null,
int→int32 when it fits else int64, float→double, dict→document,
list→array, bytes→generic binary). Everything else raises.
"""

from __future__ import annotations

import struct


class BsonError(ValueError):
    """Malformed BSON bytes or an unencodable Python value."""


def bson_decode(data: bytes) -> dict:
    """Decode one BSON document to a Python dict (insertion-ordered)."""
    if len(data) < 5:
        raise BsonError(f"document too short ({len(data)} bytes)")
    (ln,) = struct.unpack_from("<i", data, 0)
    if ln != len(data):
        raise BsonError(f"length header {ln} != {len(data)} bytes")
    if data[-1] != 0:
        raise BsonError("document missing trailing NUL")
    doc, end = _decode_elems(data, 4, len(data) - 1)
    if end != len(data) - 1:
        raise BsonError("trailing garbage inside document")
    return doc


def bson_encode(doc: dict) -> bytes:
    """Encode a JSON-shaped Python dict as one BSON document."""
    if not isinstance(doc, dict):
        raise BsonError(f"top level must be a dict, got {type(doc).__name__}")
    body = b"".join(_encode_elem(str(k), v) for k, v in doc.items())
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


# ------------------------------------------------------------------ decode


def _decode_elems(data: bytes, i: int, end: int) -> tuple[dict, int]:
    out: dict = {}
    while i < end:
        etype = data[i]
        i += 1
        nul = data.find(b"\x00", i, end)
        if nul < 0:
            raise BsonError("unterminated element name")
        key = data[i:nul].decode("utf-8")
        i = nul + 1
        if etype == 0x01:
            (v,) = struct.unpack_from("<d", data, i)
            i += 8
        elif etype == 0x02:
            (sln,) = struct.unpack_from("<i", data, i)
            i += 4
            if sln < 1 or i + sln > end:
                raise BsonError(f"bad string length at key {key!r}")
            if data[i + sln - 1] != 0:
                raise BsonError(f"string at key {key!r} missing NUL")
            v = data[i : i + sln - 1].decode("utf-8")
            i += sln
        elif etype in (0x03, 0x04):
            (dln,) = struct.unpack_from("<i", data, i)
            if dln < 5 or i + dln > end:
                raise BsonError(f"bad subdocument length at key {key!r}")
            sub = bson_decode(data[i : i + dln])
            i += dln
            if etype == 0x04:
                # array = document with "0","1",… keys, in order
                v = list(sub.values())
            else:
                v = sub
        elif etype == 0x05:
            (bln,) = struct.unpack_from("<i", data, i)
            i += 4
            i += 1  # subtype byte — preserved values are generic-only
            if bln < 0 or i + bln > end:
                raise BsonError(f"bad binary length at key {key!r}")
            v = bytes(data[i : i + bln])
            i += bln
        elif etype == 0x08:
            v = bool(data[i])
            i += 1
        elif etype == 0x0A:
            v = None
        elif etype == 0x10:
            (v,) = struct.unpack_from("<i", data, i)
            i += 4
        elif etype == 0x12:
            (v,) = struct.unpack_from("<q", data, i)
            i += 8
        else:
            raise BsonError(f"unsupported element type 0x{etype:02x} at key {key!r}")
        out[key] = v
    if i != end:
        raise BsonError("element ran past document end")
    return out, i


# ------------------------------------------------------------------ encode


def _encode_elem(key: str, v) -> bytes:
    kb = key.encode("utf-8")
    if b"\x00" in kb:
        raise BsonError(f"key {key!r} contains NUL")
    head = kb + b"\x00"
    if isinstance(v, bool):  # before int — bool is an int subclass
        return b"\x08" + head + (b"\x01" if v else b"\x00")
    if v is None:
        return b"\x0a" + head
    if isinstance(v, str):
        sb = v.encode("utf-8") + b"\x00"
        return b"\x02" + head + struct.pack("<i", len(sb)) + sb
    if isinstance(v, int):
        if -(1 << 31) <= v < (1 << 31):
            return b"\x10" + head + struct.pack("<i", v)
        if -(1 << 63) <= v < (1 << 63):
            return b"\x12" + head + struct.pack("<q", v)
        raise BsonError(f"int too large for BSON at key {key!r}")
    if isinstance(v, float):
        return b"\x01" + head + struct.pack("<d", v)
    if isinstance(v, dict):
        return b"\x03" + head + bson_encode(v)
    if isinstance(v, (list, tuple)):
        return b"\x04" + head + bson_encode({str(i): x for i, x in enumerate(v)})
    if isinstance(v, (bytes, bytearray)):
        return b"\x05" + head + struct.pack("<i", len(v)) + b"\x00" + bytes(v)
    raise BsonError(f"unencodable type {type(v).__name__} at key {key!r}")

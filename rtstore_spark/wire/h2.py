"""HTTP/2 (RFC 9113) framing — the cleartext transport under raw gRPC.

Frame header pack/parse, SETTINGS payloads, and the constants the h2c
server (service_h2.py) needs. Kept transport-free (pure bytes in/out)
so the same helpers drive both the server and the hand-built test
client that mirrors the reference Java SDK's exchanges
(java/src/main/java/network/db3/client/Client.java:11-13 builds a
plaintext ``ManagedChannel`` — gRPC over h2c with prior knowledge).
"""

from __future__ import annotations

import struct

PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"

# frame types (RFC 9113 §6)
DATA = 0x0
HEADERS = 0x1
PRIORITY = 0x2
RST_STREAM = 0x3
SETTINGS = 0x4
PUSH_PROMISE = 0x5
PING = 0x6
GOAWAY = 0x7
WINDOW_UPDATE = 0x8
CONTINUATION = 0x9

# flags
FLAG_END_STREAM = 0x1   # DATA / HEADERS
FLAG_ACK = 0x1          # SETTINGS / PING
FLAG_END_HEADERS = 0x4  # HEADERS / CONTINUATION
FLAG_PADDED = 0x8       # DATA / HEADERS
FLAG_PRIORITY = 0x20    # HEADERS

# SETTINGS identifiers (§6.5.2)
SETTINGS_HEADER_TABLE_SIZE = 0x1
SETTINGS_ENABLE_PUSH = 0x2
SETTINGS_MAX_CONCURRENT_STREAMS = 0x3
SETTINGS_INITIAL_WINDOW_SIZE = 0x4
SETTINGS_MAX_FRAME_SIZE = 0x5
SETTINGS_MAX_HEADER_LIST_SIZE = 0x6

# error codes (§7)
NO_ERROR = 0x0
PROTOCOL_ERROR = 0x1
FLOW_CONTROL_ERROR = 0x3
FRAME_SIZE_ERROR = 0x6
REFUSED_STREAM = 0x7

DEFAULT_WINDOW = 65535
DEFAULT_MAX_FRAME = 16384


class H2Error(Exception):
    """Connection-level HTTP/2 error → GOAWAY(code) and close."""

    def __init__(self, code: int, message: str):
        super().__init__(message)
        self.code = code


def pack_frame(ftype: int, flags: int, stream_id: int, payload: bytes = b"") -> bytes:
    if len(payload) > (1 << 24) - 1:
        raise ValueError("frame payload too large")
    head = struct.pack(">I", len(payload))[1:] + bytes(
        [ftype, flags]
    ) + struct.pack(">I", stream_id & 0x7FFFFFFF)
    return head + payload


def parse_frame_header(head: bytes) -> tuple[int, int, int, int]:
    """9-byte header → (length, type, flags, stream_id)."""
    if len(head) != 9:
        raise H2Error(PROTOCOL_ERROR, "short frame header")
    length = int.from_bytes(head[:3], "big")
    ftype = head[3]
    flags = head[4]
    stream_id = int.from_bytes(head[5:9], "big") & 0x7FFFFFFF
    return length, ftype, flags, stream_id


def build_settings(settings: dict[int, int]) -> bytes:
    return b"".join(struct.pack(">HI", k, v) for k, v in settings.items())


def parse_settings(payload: bytes) -> dict[int, int]:
    if len(payload) % 6:
        raise H2Error(FRAME_SIZE_ERROR, "SETTINGS length not a multiple of 6")
    out: dict[int, int] = {}
    for off in range(0, len(payload), 6):
        k, v = struct.unpack_from(">HI", payload, off)
        out[k] = v
    return out


def strip_padding(payload: bytes, flags: int) -> bytes:
    """Remove PADDED framing from a DATA/HEADERS payload."""
    if not flags & FLAG_PADDED:
        return payload
    if not payload:
        raise H2Error(PROTOCOL_ERROR, "PADDED flag on empty payload")
    pad = payload[0]
    body = payload[1:]
    if pad > len(body):
        raise H2Error(PROTOCOL_ERROR, "padding exceeds payload")
    return body[: len(body) - pad]


def grpc_frame(message: bytes) -> bytes:
    """gRPC length-prefixed message (uncompressed)."""
    return b"\x00" + struct.pack(">I", len(message)) + message


def parse_grpc_frames(data: bytes) -> list[tuple[int, bytes]]:
    """[(compressed_flag, message)] from a gRPC byte stream; raises
    ValueError on truncation."""
    out: list[tuple[int, bytes]] = []
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 5 > n:
            raise ValueError("truncated gRPC frame header")
        flag = data[pos]
        (length,) = struct.unpack_from(">I", data, pos + 1)
        pos += 5
        if pos + length > n:
            raise ValueError("truncated gRPC frame body")
        out.append((flag, bytes(data[pos : pos + length])))
        pos += length
    return out

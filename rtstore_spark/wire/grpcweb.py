"""gRPC-Web framing (the reference SDK's actual transport).

The reference's TS SDK talks to the node through
``@protobuf-ts/grpcweb-transport`` (sdk/src/provider/storage_provider_v2.ts:62,
indexer_provider.ts:47) — the public gRPC-Web protocol
(https://github.com/grpc/grpc/blob/master/doc/PROTOCOL-WEB.md): one HTTP
POST per call, so it runs over plain HTTP/1.1 with no HTTP/2/HPACK layer.

Body framing, both directions:

    [1-byte flags][4-byte big-endian length][payload]...

- flags 0x00: a protobuf message
- flags 0x80: the TRAILERS frame (response only) — HTTP/1-style
  ``grpc-status`` / ``grpc-message`` header text

Two content types:

- ``application/grpc-web+proto``       — binary body
- ``application/grpc-web-text+proto``  — the SAME bytes base64-encoded
  (the SDK's default ``format: "text"``; requests arrive as standard
  base64, responses may be emitted as independently-decodable chunks)
"""

from __future__ import annotations

import base64
from urllib.parse import quote

TRAILER_FLAG = 0x80

CT_BIN = "application/grpc-web+proto"
CT_TEXT = "application/grpc-web-text"


class GrpcWebError(ValueError):
    """Malformed gRPC-Web body."""


def frame(payload: bytes, flags: int = 0) -> bytes:
    return bytes([flags]) + len(payload).to_bytes(4, "big") + payload


def parse_frames(body: bytes) -> list[tuple[int, bytes]]:
    out = []
    i = 0
    n = len(body)
    while i < n:
        if i + 5 > n:
            raise GrpcWebError("truncated frame header")
        flags = body[i]
        ln = int.from_bytes(body[i + 1 : i + 5], "big")
        i += 5
        if i + ln > n:
            raise GrpcWebError("truncated frame payload")
        out.append((flags, bytes(body[i : i + ln])))
        i += ln
    return out


def trailers(status: int = 0, message: str | None = None) -> bytes:
    """The end-of-response trailers frame. ``grpc-message`` is
    percent-encoded per the gRPC HTTP/2 spec."""
    text = f"grpc-status:{status}\r\n"
    if message:
        text += f"grpc-message:{quote(message)}\r\n"
    return frame(text.encode("utf-8"), TRAILER_FLAG)


def is_text_mode(content_type: str | None) -> bool:
    return bool(content_type) and content_type.startswith(CT_TEXT)


def decode_request_body(body: bytes, content_type: str | None) -> bytes:
    if is_text_mode(content_type):
        try:
            return base64.b64decode(body, validate=False)
        except Exception as e:  # noqa: BLE001 — binascii raises several types
            raise GrpcWebError(f"bad base64 body: {e}") from e
    return body


def encode_response_chunk(data: bytes, text_mode: bool) -> bytes:
    """One response emission. In text mode each chunk is independently
    base64-padded — exactly what grpc-web-text readers expect when a
    server streams."""
    return base64.b64encode(data) if text_mode else data


def single_message_request(body: bytes, content_type: str | None) -> bytes:
    """Unary request: exactly one message frame, payload returned."""
    frames = parse_frames(decode_request_body(body, content_type))
    messages = [p for f, p in frames if not f & TRAILER_FLAG]
    if len(messages) != 1:
        raise GrpcWebError(f"expected 1 request message, got {len(messages)}")
    return messages[0]

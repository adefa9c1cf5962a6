"""Minimal RFC 6455 WebSocket client on the stdlib socket.

Just enough protocol for JSON-RPC subscription streams (the reference's
``subscribe_logs`` transport, event_processor.rs:88-204): the HTTP upgrade
handshake with Sec-WebSocket-Accept verification, unfragmented text frames
in both directions (client frames masked, as the RFC requires), ping→pong,
and clean close. No external dependency — the container has no websocket
library, and this is the entire protocol surface an ``eth_subscribe``
client exercises.

Not implemented (and not needed for JSON-RPC subscriptions): fragmented
messages, extensions/compression, subprotocol negotiation.
"""

from __future__ import annotations

import base64
import hashlib
import os
import socket
import ssl as _ssl
import struct
from urllib.parse import urlparse

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


class WebSocketError(RuntimeError):
    pass


class MinimalWebSocket:
    """Blocking websocket client: ``connect() → send_text()/recv_text()``.

    ``recv_text`` returns one text message, or ``None`` on clean close /
    receive timeout (``socket.timeout``) — callers treat both as "the
    window ended". TLS for ``wss://`` uses the default SSL context.
    """

    def __init__(self, url: str, timeout_s: float = 30.0):
        u = urlparse(url)
        if u.scheme not in ("ws", "wss"):
            raise WebSocketError(f"not a websocket url: {url}")
        self.host = u.hostname or "localhost"
        self.port = u.port or (443 if u.scheme == "wss" else 80)
        self.path = (u.path or "/") + (f"?{u.query}" if u.query else "")
        self.tls = u.scheme == "wss"
        self.timeout_s = timeout_s
        self.sock: socket.socket | None = None
        self._buf = b""

    # -- handshake ----------------------------------------------------

    def connect(self) -> "MinimalWebSocket":
        raw = socket.create_connection(
            (self.host, self.port), timeout=self.timeout_s
        )
        if self.tls:
            raw = _ssl.create_default_context().wrap_socket(
                raw, server_hostname=self.host
            )
        key = base64.b64encode(os.urandom(16)).decode()
        req = (
            f"GET {self.path} HTTP/1.1\r\n"
            f"Host: {self.host}:{self.port}\r\n"
            "Upgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n"
        )
        raw.sendall(req.encode())
        resp = b""
        while b"\r\n\r\n" not in resp:
            chunk = raw.recv(4096)
            if not chunk:
                raise WebSocketError("connection closed during handshake")
            resp = resp + chunk
        head, _, extra = resp.partition(b"\r\n\r\n")
        lines = head.decode("latin-1").split("\r\n")
        if "101" not in lines[0]:
            raise WebSocketError(f"upgrade refused: {lines[0]}")
        accept = base64.b64encode(
            hashlib.sha1((key + _WS_GUID).encode()).digest()
        ).decode()
        headers = {
            k.strip().lower(): v.strip()
            for k, _, v in (ln.partition(":") for ln in lines[1:])
        }
        if headers.get("sec-websocket-accept") != accept:
            raise WebSocketError("bad Sec-WebSocket-Accept")
        self.sock = raw
        self._buf = extra  # frames may arrive glued to the handshake
        return self

    # -- frames -------------------------------------------------------

    def _read_exact(self, n: int) -> bytes:
        assert self.sock is not None
        while len(self._buf) < n:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise WebSocketError("connection closed mid-frame")
            self._buf = self._buf + chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def send_text(self, text: str) -> None:
        assert self.sock is not None
        payload = text.encode("utf-8")
        self._send_frame(0x1, payload)

    def _send_frame(self, opcode: int, payload: bytes) -> None:
        assert self.sock is not None
        head = bytes([0x80 | opcode])
        n = len(payload)
        if n < 126:
            head += bytes([0x80 | n])
        elif n < 1 << 16:
            head += bytes([0x80 | 126]) + struct.pack(">H", n)
        else:
            head += bytes([0x80 | 127]) + struct.pack(">Q", n)
        mask = os.urandom(4)  # client frames MUST be masked (RFC 6455 §5.3)
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        self.sock.sendall(head + mask + masked)

    def recv_text(self) -> str | None:
        """One text message; None on clean close or receive timeout."""
        assert self.sock is not None
        while True:
            try:
                b0, b1 = self._read_exact(2)
            except (TimeoutError, socket.timeout):
                return None
            opcode = b0 & 0x0F
            masked = bool(b1 & 0x80)
            n = b1 & 0x7F
            if n == 126:
                (n,) = struct.unpack(">H", self._read_exact(2))
            elif n == 127:
                (n,) = struct.unpack(">Q", self._read_exact(8))
            mask = self._read_exact(4) if masked else b""
            payload = self._read_exact(n)
            if masked:
                payload = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
            if opcode == 0x9:  # ping → pong, keep reading
                self._send_frame(0xA, payload)
                continue
            if opcode == 0xA:  # unsolicited pong
                continue
            if opcode == 0x8:  # close
                try:
                    self._send_frame(0x8, b"")
                except OSError:
                    pass
                return None
            if opcode in (0x1, 0x2):
                return payload.decode("utf-8")
            raise WebSocketError(f"unsupported opcode {opcode:#x}")

    def close(self) -> None:
        if self.sock is not None:
            try:
                self._send_frame(0x8, b"")
            except OSError:
                pass
            try:
                self.sock.close()
            finally:
                self.sock = None

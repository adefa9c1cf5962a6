"""Captured-bytes interop corpus for the h2c gRPC front.

The hand-framed exchanges in test_h2.py prove our reading of RFC
9113/7541; this corpus replays the CLIENT-SIDE BYTE PATTERNS a real
grpc-java/netty channel puts on the wire — derived from netty's and
grpc-java's documented, publicly-specified behavior (grpc-java opens
one plaintext ManagedChannel, Client.java:11-13; netty's HTTP/2 codec
is an RFC 9113 implementation with these well-known defaults):

  * connection start: preface, SETTINGS{HEADER_TABLE_SIZE, MAX_HEADER_
    LIST_SIZE, INITIAL_WINDOW_SIZE=1 MiB}, then a connection-level
    WINDOW_UPDATE raising the 64 KiB default toward 1 MiB;
  * HPACK with INCREMENTAL INDEXING — netty's encoder inserts
    user-agent / te / content-type / :path into the dynamic table and
    back-references them on every later request (our production
    encoder is stateless and can never emit these opcodes, so this
    corpus exercises decoder paths nothing else in the repo produces);
  * dynamic-table size updates mid-connection (0x20 opcode), including
    shrink-to-zero (full eviction) and re-grow;
  * never-indexed literals (0x10 opcode) for sensitive metadata;
  * CONTINUATION-split header blocks, padded DATA, PRIORITY-flagged
    HEADERS, keepalive PINGs between frames, interleaved concurrent
    streams, and pathological TCP segmentation (1-byte trickle).

Round 9 adds a TONIC/HYPER flank (TestTonicInterop) — the transport
under the reference's Rust SDK: ENABLE_PUSH=0 + 65535-window SETTINGS
with NO eager connection WINDOW_UPDATE, lowercase headers with
`te: trailers` and `grpc-timeout`, HEADERS+DATA coalesced in one write,
post-response RST_STREAM(CANCEL), and mid-connection SETTINGS changes.

Round 10 adds a GRPC-GO flank (TestGrpcGoInterop) — golang.org/x/net/
http2 habits neither prior flank produces: an EMPTY initial SETTINGS
frame, stateful HPACK with RAW literals only (x/net's encoder never
Huffman-codes), a BDP-probe PING in flight mid-RPC, GOAWAY(NO_ERROR)
with ascii debug data at channel shutdown, deadline/retry metadata
(`grpc-timeout` + `grpc-previous-rpc-attempts`), and quarter-window
flow-control replenishment through a 64-byte stream window.

Each fixture drives a REAL RPC end-to-end and asserts the response
decodes with grpc-status 0 — mirroring the acceptance flow of
java/src/test/java/network/db3/client/ClientTest.java:79.

The client-side HPACK encoder below is implemented INDEPENDENTLY of
rtstore_spark.wire.hpack's encoder (only the spec-data Huffman codec is
shared) so a shared encode/decode bug cannot self-cancel.
"""

from __future__ import annotations

import socket

import pytest

from rtstore_spark.wire import h2
from rtstore_spark.wire.hpack import (
    STATIC_TABLE,
    HpackDecoder,
    encode_int,
    huffman_encode,
)
from rtstore_spark.wire.rpc_schemas import METHODS

from tests.test_h2 import ADMIN, h2_server  # noqa: F401 — fixture reuse

GETNONCE = "/db3_storage_proto.StorageNode/GetNonce"
GETSTATUS = "/db3_system_proto.System/GetSystemStatus"

_STATIC_FULL = {pair: i + 1 for i, pair in enumerate(STATIC_TABLE)}
_STATIC_NAME = {}
for _i, (_n, _v) in enumerate(STATIC_TABLE):
    _STATIC_NAME.setdefault(_n, _i + 1)


class NettyStyleEncoder:
    """Stateful HPACK encoder mimicking netty's: incremental indexing
    with a live dynamic table, optional Huffman, table-size updates.
    Independent implementation — do NOT fold into wire/hpack."""

    def __init__(self, table_size: int = 4096, huffman: bool = True):
        self.max_size = table_size
        self.table: list[tuple[str, str]] = []  # newest first
        self.size = 0
        self.huffman = huffman
        self._pending_resize: list[int] = []

    def resize(self, new_max: int) -> None:
        self._pending_resize.append(new_max)
        self.max_size = new_max
        self._evict()

    def _entry_size(self, n: str, v: str) -> int:
        return len(n.encode()) + len(v.encode()) + 32

    def _evict(self) -> None:
        while self.size > self.max_size and self.table:
            n, v = self.table.pop()
            self.size -= self._entry_size(n, v)

    def _insert(self, n: str, v: str) -> None:
        self.table.insert(0, (n, v))
        self.size += self._entry_size(n, v)
        self._evict()

    def _string(self, s: str) -> bytes:
        raw = s.encode()
        if self.huffman:
            enc = huffman_encode(raw)
            if len(enc) < len(raw):
                return encode_int(len(enc), 7, 0x80) + enc
        return encode_int(len(raw), 7, 0x00) + raw

    def encode(self, headers: list[tuple[str, str]],
               sensitive: frozenset[str] = frozenset()) -> bytes:
        out = bytearray()
        for new_max in self._pending_resize:
            out += encode_int(new_max, 5, 0x20)
        self._pending_resize = []
        for name, value in headers:
            if name in sensitive:
                # never-indexed literal, indexed name when available
                ni = _STATIC_NAME.get(name, 0)
                out += encode_int(ni, 4, 0x10)
                if not ni:
                    out += self._string(name)
                out += self._string(value)
                continue
            idx = _STATIC_FULL.get((name, value))
            if idx:
                out += encode_int(idx, 7, 0x80)
                continue
            dyn = next(
                (i for i, e in enumerate(self.table) if e == (name, value)),
                None,
            )
            if dyn is not None:
                out += encode_int(62 + dyn, 7, 0x80)
                continue
            # literal WITH incremental indexing (netty's default for
            # request headers) — indexed name when the name is known
            ni = _STATIC_NAME.get(name, 0)
            if ni == 0:
                dyn_name = next(
                    (i for i, e in enumerate(self.table) if e[0] == name),
                    None,
                )
                if dyn_name is not None:
                    ni = 62 + dyn_name
            out += encode_int(ni, 6, 0x40)
            if not ni:
                out += self._string(name)
            out += self._string(value)
            self._insert(name, value)
        return bytes(out)


class NettyStyleClient:
    """Drives h2c the way a grpc-java/netty channel does."""

    UA = "grpc-java-netty/1.57.2"

    def __init__(self, port: int, table_size: int = 4096,
                 huffman: bool = True, send_window_update: bool = True,
                 settings_payload: bytes | None = None):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=30)
        self.enc = NettyStyleEncoder(table_size=table_size, huffman=huffman)
        self.dec = HpackDecoder()
        self.next_sid = 1
        self.sock.sendall(h2.PREFACE)
        if settings_payload is None:
            settings_payload = h2.build_settings({
                h2.SETTINGS_HEADER_TABLE_SIZE: table_size,
                h2.SETTINGS_INITIAL_WINDOW_SIZE: 1048576,
                h2.SETTINGS_MAX_FRAME_SIZE: 16384,
            })
        self.sock.sendall(h2.pack_frame(h2.SETTINGS, 0, 0, settings_payload))
        if send_window_update:
            # netty lifts the connection window to match the 1 MiB
            # stream default right after SETTINGS
            self.sock.sendall(h2.pack_frame(
                h2.WINDOW_UPDATE, 0, 0, (983041).to_bytes(4, "big")
            ))

    def close(self) -> None:
        self.sock.close()

    # ------------------------------------------------------------- io

    def _recv_exact(self, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = self.sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("server closed")
            buf += chunk
        return bytes(buf)

    def recv_frame(self):
        length, ftype, flags, sid = h2.parse_frame_header(self._recv_exact(9))
        payload = self._recv_exact(length) if length else b""
        if ftype == h2.SETTINGS and not flags & h2.FLAG_ACK:
            self.sock.sendall(h2.pack_frame(h2.SETTINGS, h2.FLAG_ACK, 0))
        if ftype == h2.PING and not flags & h2.FLAG_ACK:
            self.sock.sendall(h2.pack_frame(h2.PING, h2.FLAG_ACK, 0, payload))
        return ftype, flags, sid, payload

    def request_headers(self, path: str) -> list[tuple[str, str]]:
        # grpc-java's standard request header set, in its order
        return [
            (":method", "POST"),
            (":scheme", "http"),
            (":path", path),
            (":authority", "localhost"),
            ("te", "trailers"),
            ("content-type", "application/grpc"),
            ("user-agent", self.UA),
            ("grpc-accept-encoding", "gzip"),
        ]

    def send_request(self, path: str, message: bytes,
                     header_block: bytes | None = None,
                     data_padding: int = 0,
                     continuation_splits: list[int] | None = None,
                     priority: bool = False,
                     end_stream_on_empty_data: bool = False) -> int:
        sid = self.next_sid
        self.next_sid += 2
        block = (
            header_block if header_block is not None
            else self.enc.encode(self.request_headers(path))
        )
        flags = 0
        payload_prefix = b""
        if priority:
            flags |= h2.FLAG_PRIORITY
            payload_prefix = (0).to_bytes(4, "big") + bytes([16])
        if continuation_splits:
            cut = continuation_splits[0]
            self.sock.sendall(h2.pack_frame(
                h2.HEADERS, flags, sid, payload_prefix + block[:cut]
            ))
            rest = block[cut:]
            pieces = []
            for nxt in continuation_splits[1:]:
                pieces.append(rest[:nxt - cut])
                rest = rest[nxt - cut:]
                cut = nxt
            pieces.append(rest)
            for i, piece in enumerate(pieces):
                cf = h2.FLAG_END_HEADERS if i == len(pieces) - 1 else 0
                self.sock.sendall(h2.pack_frame(h2.CONTINUATION, cf, sid, piece))
        else:
            self.sock.sendall(h2.pack_frame(
                h2.HEADERS, flags | h2.FLAG_END_HEADERS, sid,
                payload_prefix + block,
            ))
        body = h2.grpc_frame(message)
        if data_padding:
            self.sock.sendall(h2.pack_frame(
                h2.DATA, h2.FLAG_END_STREAM | h2.FLAG_PADDED, sid,
                bytes([data_padding]) + body + b"\x00" * data_padding,
            ))
        elif end_stream_on_empty_data:
            self.sock.sendall(h2.pack_frame(h2.DATA, 0, sid, body))
            self.sock.sendall(h2.pack_frame(h2.DATA, h2.FLAG_END_STREAM, sid))
        else:
            self.sock.sendall(h2.pack_frame(h2.DATA, h2.FLAG_END_STREAM, sid, body))
        return sid

    def read_response(self, sid: int):
        data = bytearray()
        headers: list[tuple[str, str]] = []
        trailers: list[tuple[str, str]] = []
        while True:
            ftype, flags, fsid, payload = self.recv_frame()
            if ftype == h2.HEADERS:
                decoded = self.dec.decode(h2.strip_padding(payload, flags))
                if fsid != sid:
                    continue
                (trailers if headers else headers).extend(decoded)
                if flags & h2.FLAG_END_STREAM:
                    break
            elif ftype == h2.DATA and fsid == sid:
                data += h2.strip_padding(payload, flags)
                if flags & h2.FLAG_END_STREAM:
                    break
        td = dict(trailers or headers)
        status = int(td.get("grpc-status", "0"))
        msgs = [m for _, m in h2.parse_grpc_frames(bytes(data))]
        return msgs, status, td.get("grpc-message", "")

    def call(self, path: str, msg: dict, **kw):
        service, method = path.strip("/").split("/")
        req_schema, resp_schema, _ = METHODS[service][method]
        sid = self.send_request(path, req_schema.encode(msg), **kw)
        msgs, status, message = self.read_response(sid)
        return [resp_schema.decode(m) for m in msgs], status, message


ADDR = "0x" + "37" * 20


def _assert_nonce_ok(msgs, status, message):
    assert status == 0, message
    assert msgs and msgs[0].get("nonce", 0) >= 1


# ----------------------------------------------------------- the corpus


class TestGrpcJavaInterop:
    def test_01_netty_connection_start(self, h2_server):
        # SETTINGS with netty's knobs + connection WINDOW_UPDATE before
        # any request; first RPC uses incremental-indexing HPACK
        c = NettyStyleClient(h2_server.port)
        try:
            _assert_nonce_ok(*c.call(GETNONCE, {"address": ADDR}))
        finally:
            c.close()

    def test_02_dynamic_table_back_references(self, h2_server):
        # request 2/3 re-use dynamic-table entries inserted by request 1
        # (user-agent, te, content-type, :path) — indexed-field opcodes
        # pointing past the static table
        c = NettyStyleClient(h2_server.port)
        try:
            for _ in range(3):
                _assert_nonce_ok(*c.call(GETNONCE, {"address": ADDR}))
            # the THIRD block must be dominated by indexed fields: every
            # header was in the table after request 1
            block = c.enc.encode(c.request_headers(GETNONCE))
            assert all(b & 0x80 for b in block), "expected all-indexed block"
        finally:
            c.close()

    def test_03_table_size_update_shrink_and_regrow(self, h2_server):
        # netty emits a dynamic-table size update at the head of the
        # next header block after SETTINGS changes; shrink-to-zero must
        # EVICT everything server-side, then re-grow and re-index
        c = NettyStyleClient(h2_server.port)
        try:
            _assert_nonce_ok(*c.call(GETNONCE, {"address": ADDR}))
            c.enc.resize(0)     # full eviction
            _assert_nonce_ok(*c.call(GETNONCE, {"address": ADDR}))
            c.enc.resize(4096)  # re-grow, entries re-insert
            _assert_nonce_ok(*c.call(GETNONCE, {"address": ADDR}))
            _assert_nonce_ok(*c.call(GETNONCE, {"address": ADDR}))
        finally:
            c.close()

    def test_04_continuation_split_header_block(self, h2_server):
        # header block split across HEADERS + 2 CONTINUATIONs at odd
        # byte offsets (netty splits when a block exceeds the frame
        # size; any split point is legal)
        c = NettyStyleClient(h2_server.port)
        try:
            block = c.enc.encode(c.request_headers(GETNONCE))
            assert len(block) > 7
            req_schema = METHODS["db3_storage_proto.StorageNode"]["GetNonce"][0]
            sid = c.send_request(
                GETNONCE, req_schema.encode({"address": ADDR}),
                header_block=block, continuation_splits=[3, 7],
            )
            msgs, status, message = c.read_response(sid)
            assert status == 0, message
        finally:
            c.close()

    def test_05_padded_data_frame(self, h2_server):
        # PADDED flag on DATA — pad length byte + trailing zeros must be
        # stripped, and flow-control counts the WHOLE frame
        c = NettyStyleClient(h2_server.port)
        try:
            _assert_nonce_ok(*c.call(GETNONCE, {"address": ADDR},
                                     data_padding=7))
        finally:
            c.close()

    def test_06_interleaved_concurrent_streams(self, h2_server):
        # two streams open before either body completes — netty does
        # this whenever the app fires two calls back to back
        c = NettyStyleClient(h2_server.port)
        try:
            req_schema = METHODS["db3_storage_proto.StorageNode"]["GetNonce"][0]
            msg = h2.grpc_frame(req_schema.encode({"address": ADDR}))
            b1 = c.enc.encode(c.request_headers(GETNONCE))
            b2 = c.enc.encode(c.request_headers(GETNONCE))
            c.sock.sendall(h2.pack_frame(h2.HEADERS, h2.FLAG_END_HEADERS, 1, b1))
            c.sock.sendall(h2.pack_frame(h2.HEADERS, h2.FLAG_END_HEADERS, 3, b2))
            c.sock.sendall(h2.pack_frame(h2.DATA, h2.FLAG_END_STREAM, 3, msg))
            c.sock.sendall(h2.pack_frame(h2.DATA, h2.FLAG_END_STREAM, 1, msg))
            c.next_sid = 5
            done = set()
            while len(done) < 2:
                ftype, flags, fsid, _ = c.recv_frame()
                if ftype in (h2.HEADERS, h2.DATA) and flags & h2.FLAG_END_STREAM:
                    done.add(fsid)
            assert done == {1, 3}
        finally:
            c.close()

    def test_07_keepalive_ping_between_frames(self, h2_server):
        # grpc-java keepalive: PING may land between a request's HEADERS
        # and DATA; the ack must come back and the RPC still answers
        c = NettyStyleClient(h2_server.port)
        try:
            req_schema = METHODS["db3_storage_proto.StorageNode"]["GetNonce"][0]
            block = c.enc.encode(c.request_headers(GETNONCE))
            c.sock.sendall(h2.pack_frame(h2.HEADERS, h2.FLAG_END_HEADERS, 1, block))
            c.sock.sendall(h2.pack_frame(h2.PING, 0, 0, b"\x01\x02\x03\x04\x05\x06\x07\x08"))
            c.sock.sendall(h2.pack_frame(
                h2.DATA, h2.FLAG_END_STREAM, 1,
                h2.grpc_frame(req_schema.encode({"address": ADDR})),
            ))
            c.next_sid = 3
            got_ack = False
            ended = False
            while not ended:
                ftype, flags, fsid, payload = c.recv_frame()
                if ftype == h2.PING and flags & h2.FLAG_ACK:
                    got_ack = payload == b"\x01\x02\x03\x04\x05\x06\x07\x08"
                if ftype == h2.HEADERS and fsid == 1 and flags & h2.FLAG_END_STREAM:
                    ended = True
            assert got_ack
        finally:
            c.close()

    def test_08_one_byte_trickle(self, h2_server):
        # pathological segmentation: the whole request sent one byte at
        # a time (slow links / SSH tunnels do this); assembly must not
        # depend on frame-per-recv
        c = NettyStyleClient(h2_server.port)
        try:
            req_schema = METHODS["db3_storage_proto.StorageNode"]["GetNonce"][0]
            block = c.enc.encode(c.request_headers(GETNONCE))
            raw = (
                h2.pack_frame(h2.HEADERS, h2.FLAG_END_HEADERS, 1, block)
                + h2.pack_frame(
                    h2.DATA, h2.FLAG_END_STREAM, 1,
                    h2.grpc_frame(req_schema.encode({"address": ADDR})),
                )
            )
            for i in range(len(raw)):
                c.sock.sendall(raw[i:i + 1])
            c.next_sid = 3
            msgs, status, message = c.read_response(1)
            assert status == 0, message
        finally:
            c.close()

    def test_09_zero_header_table_size(self, h2_server):
        # SETTINGS_HEADER_TABLE_SIZE=0 (a real netty tuning option):
        # the client encoder must not index — all-literal blocks, every
        # request, and the server must never assume a dynamic entry
        c = NettyStyleClient(h2_server.port, table_size=0)
        try:
            for _ in range(3):
                _assert_nonce_ok(*c.call(GETNONCE, {"address": ADDR}))
        finally:
            c.close()

    def test_10_never_indexed_sensitive_metadata(self, h2_server):
        # authorization-style metadata goes NEVER-INDEXED (0x10) in
        # grpc-java; the server must parse it and not cache it
        c = NettyStyleClient(h2_server.port)
        try:
            headers = c.request_headers(GETNONCE) + [
                ("authorization", "Bearer not-a-real-token"),
            ]
            block = c.enc.encode(
                headers, sensitive=frozenset({"authorization"})
            )
            req_schema = METHODS["db3_storage_proto.StorageNode"]["GetNonce"][0]
            sid = c.send_request(
                GETNONCE, req_schema.encode({"address": ADDR}),
                header_block=block,
            )
            msgs, status, message = c.read_response(sid)
            assert status == 0, message
        finally:
            c.close()

    def test_11_priority_flagged_headers(self, h2_server):
        # HEADERS with FLAG_PRIORITY (stream dependency + weight prefix)
        # — netty emits these when dependency trees are configured; the
        # 5-byte block must be skipped, not parsed as HPACK
        c = NettyStyleClient(h2_server.port)
        try:
            _assert_nonce_ok(*c.call(GETNONCE, {"address": ADDR},
                                     priority=True))
        finally:
            c.close()

    def test_12_empty_end_stream_data(self, h2_server):
        # netty may close a stream with an EMPTY DATA frame carrying
        # only END_STREAM after the body frame
        c = NettyStyleClient(h2_server.port)
        try:
            _assert_nonce_ok(*c.call(GETNONCE, {"address": ADDR},
                                     end_stream_on_empty_data=True))
        finally:
            c.close()

    def test_13_huffman_off_plain_literals(self, h2_server):
        # some clients disable Huffman (CPU trade) — plain literals with
        # incremental indexing across several RPCs
        c = NettyStyleClient(h2_server.port, huffman=False)
        try:
            for _ in range(2):
                _assert_nonce_ok(*c.call(GETNONCE, {"address": ADDR}))
            msgs, status, _ = c.call(GETSTATUS, {})
            assert status == 0
        finally:
            c.close()

    def test_14_mixed_paths_share_dynamic_table(self, h2_server):
        # alternating methods: each new :path inserts a fresh dynamic
        # entry while shared headers stay back-referenced — the indices
        # SHIFT as entries are prepended, which is the classic
        # off-by-one surface in dynamic-table handling
        c = NettyStyleClient(h2_server.port)
        try:
            for _ in range(2):
                _assert_nonce_ok(*c.call(GETNONCE, {"address": ADDR}))
                msgs, status, _ = c.call(GETSTATUS, {})
                assert status == 0
        finally:
            c.close()


class TonicStyleClient(NettyStyleClient):
    """Drives h2c the way a tonic (hyper/h2-crate) channel does — the
    transport under the reference's Rust SDK
    (/root/reference/src/sdk/src/store_sdk_v2.rs). Documented habits
    that differ from netty's:

      * SETTINGS advertises ENABLE_PUSH=0 and the h2 crate's 65535
        default INITIAL_WINDOW_SIZE; NO eager connection WINDOW_UPDATE
        after SETTINGS (h2 replenishes as data is consumed, not ahead
        of it);
      * strictly lowercase header names, `te: trailers` always present,
        `user-agent: tonic/<ver>`, and a `grpc-timeout` header when the
        request carries a deadline;
      * no PRIORITY frames, ever;
      * HEADERS+DATA coalesced into a single TCP write (hyper buffers a
        request's frames and flushes once).
    """

    UA = "tonic/0.10.2"

    def __init__(self, port: int, table_size: int = 4096,
                 huffman: bool = True):
        # skip NettyStyleClient.__init__ on purpose: the connection
        # start IS the behavior under test
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=30)
        self.enc = NettyStyleEncoder(table_size=table_size, huffman=huffman)
        self.dec = HpackDecoder()
        self.next_sid = 1
        self.sock.sendall(h2.PREFACE)
        self.sock.sendall(h2.pack_frame(
            h2.SETTINGS, 0, 0,
            h2.build_settings({
                h2.SETTINGS_ENABLE_PUSH: 0,
                h2.SETTINGS_INITIAL_WINDOW_SIZE: 65535,
                h2.SETTINGS_MAX_FRAME_SIZE: 16384,
                h2.SETTINGS_MAX_HEADER_LIST_SIZE: 16384,
            }),
        ))

    def request_headers(self, path: str,
                        timeout: str | None = None) -> list[tuple[str, str]]:
        hs = [
            (":method", "POST"),
            (":scheme", "http"),
            (":path", path),
            (":authority", "localhost"),
            ("te", "trailers"),
            ("content-type", "application/grpc"),
            ("user-agent", self.UA),
        ]
        if timeout is not None:
            hs.append(("grpc-timeout", timeout))
        return hs

    def coalesced_call(self, path: str, msg: dict,
                       timeout: str | None = None,
                       rst_after: bool = False):
        """One RPC with HEADERS+DATA flushed as a single write — hyper's
        framing; optionally RST_STREAM(CANCEL) right after the response
        completes (hyper cancels the stream when the response future
        drops)."""
        service, method = path.strip("/").split("/")
        req_schema, resp_schema, _ = METHODS[service][method]
        sid = self.next_sid
        self.next_sid += 2
        block = self.enc.encode(self.request_headers(path, timeout=timeout))
        self.sock.sendall(
            h2.pack_frame(h2.HEADERS, h2.FLAG_END_HEADERS, sid, block)
            + h2.pack_frame(
                h2.DATA, h2.FLAG_END_STREAM, sid,
                h2.grpc_frame(req_schema.encode(msg)),
            )
        )
        msgs, status, message = self.read_response(sid)
        if rst_after:
            self.sock.sendall(h2.pack_frame(
                h2.RST_STREAM, 0, sid, (0x8).to_bytes(4, "big")  # CANCEL
            ))
        return [resp_schema.decode(m) for m in msgs], status, message


class TestTonicInterop:
    def test_15_tonic_connection_start(self, h2_server):
        # ENABLE_PUSH=0 + 65535 initial window, NO eager connection
        # WINDOW_UPDATE — the server must serve within the default
        # connection window it was never granted extra room on
        c = TonicStyleClient(h2_server.port)
        try:
            _assert_nonce_ok(*c.coalesced_call(GETNONCE, {"address": ADDR}))
        finally:
            c.close()

    def test_16_headers_data_single_write_and_timeout_header(
        self, h2_server
    ):
        # hyper flushes a unary request as ONE segment; tonic adds
        # grpc-timeout when a deadline is set — the server must parse
        # and ignore the deadline metadata it does not enforce
        c = TonicStyleClient(h2_server.port)
        try:
            _assert_nonce_ok(*c.coalesced_call(
                GETNONCE, {"address": ADDR}, timeout="10S"
            ))
            msgs, status, _ = c.coalesced_call(GETSTATUS, {}, timeout="500m")
            assert status == 0
        finally:
            c.close()

    def test_17_no_window_replenish_across_sequential_rpcs(self, h2_server):
        # h2 replenishes the connection window lazily; a client that
        # never sends WINDOW_UPDATE must still complete many small RPCs
        # — the server's flow accounting must not expect netty's eager
        # grant (responses here total well under 65535, so a correct
        # server never blocks; an over-charging one deadlocks)
        c = TonicStyleClient(h2_server.port)
        try:
            for _ in range(6):
                _assert_nonce_ok(
                    *c.coalesced_call(GETNONCE, {"address": ADDR})
                )
        finally:
            c.close()

    def test_18_rst_stream_cancel_after_response(self, h2_server):
        # hyper RSTs a finished stream when the response future drops;
        # a late CANCEL on a closed stream must not poison the
        # connection — the next RPC on the same socket still answers
        c = TonicStyleClient(h2_server.port)
        try:
            _assert_nonce_ok(*c.coalesced_call(
                GETNONCE, {"address": ADDR}, rst_after=True
            ))
            _assert_nonce_ok(*c.coalesced_call(GETNONCE, {"address": ADDR}))
        finally:
            c.close()

    def test_19_mid_connection_settings_change(self, h2_server):
        # h2 applications can reconfigure — a second SETTINGS frame
        # mid-connection must be ACKed and serving must continue with
        # the updated table size honored by the next header block
        c = TonicStyleClient(h2_server.port)
        try:
            _assert_nonce_ok(*c.coalesced_call(GETNONCE, {"address": ADDR}))
            c.sock.sendall(h2.pack_frame(
                h2.SETTINGS, 0, 0,
                h2.build_settings({h2.SETTINGS_HEADER_TABLE_SIZE: 8192}),
            ))
            c.enc.resize(0)     # shrink-to-zero table-size update
            _assert_nonce_ok(*c.coalesced_call(GETNONCE, {"address": ADDR}))
            c.enc.resize(4096)  # regrow within the advertised bound
            _assert_nonce_ok(*c.coalesced_call(GETNONCE, {"address": ADDR}))
        finally:
            c.close()


class GrpcGoStyleClient(NettyStyleClient):
    """Drives h2c the way a grpc-go channel (golang.org/x/net/http2
    transport) does — the THIRD compiled-client flavor, distinct from
    both flanks above: an EMPTY initial SETTINGS frame (zero
    parameters — a valid RFC 9113 frame netty never sends), an eager
    connection WINDOW_UPDATE like netty, and x/net/http2/hpack's
    encoder behavior: incremental indexing into a live dynamic table
    but RAW string literals only (that encoder never Huffman-codes),
    a combination no other fixture produces statefully."""

    UA = "grpc-go/1.57.0"

    def __init__(self, port: int):
        # x/net/http2 sends an EMPTY SETTINGS frame (zero parameters)
        # and its hpack encoder never Huffman-codes
        super().__init__(
            port, huffman=False, settings_payload=b"",
        )

    def request_headers(self, path: str) -> list[tuple[str, str]]:
        # grpc-go's header set and order (lowercase, no accept-encoding
        # by default, content-type before user-agent)
        return [
            (":method", "POST"),
            (":scheme", "http"),
            (":path", path),
            (":authority", "localhost"),
            ("content-type", "application/grpc"),
            ("user-agent", self.UA),
            ("te", "trailers"),
        ]


class TestGrpcGoInterop:
    def test_22_grpc_go_connection_start(self, h2_server):
        # empty SETTINGS (zero parameters) + eager conn WINDOW_UPDATE +
        # stateful non-Huffman HPACK; second call back-references the
        # dynamic table entries the first inserted
        c = GrpcGoStyleClient(h2_server.port)
        try:
            _assert_nonce_ok(*c.call(GETNONCE, {"address": ADDR}))
            _assert_nonce_ok(*c.call(GETNONCE, {"address": ADDR}))
        finally:
            c.close()

    def test_23_bdp_ping_mid_rpc(self, h2_server):
        # grpc-go's BDP estimator sends a non-ACK PING right after
        # request DATA, while the RPC is in flight — the server must
        # ACK it with the SAME opaque payload and still answer the RPC
        c = GrpcGoStyleClient(h2_server.port)
        try:
            service, method = GETNONCE.strip("/").split("/")
            req_schema, resp_schema, _ = METHODS[service][method]
            sid = c.send_request(
                GETNONCE, req_schema.encode({"address": ADDR})
            )
            probe = b"\x02\x04\x10\x10\x09\x0e\x07\x07"  # grpc-go's bytes
            c.sock.sendall(h2.pack_frame(h2.PING, 0, 0, probe))
            got_ack = False
            data = bytearray()
            headers_seen = False
            status = None
            done = False
            while not done or not got_ack:
                # nothing orders the reader thread's PING ACK ahead of
                # the pool worker's response frames — keep reading past
                # END_STREAM until the ACK arrives (socket timeout is
                # the failsafe)
                ftype, flags, fsid, payload = c.recv_frame()
                if ftype == h2.PING and flags & h2.FLAG_ACK:
                    assert payload == probe
                    got_ack = True
                elif ftype == h2.HEADERS and fsid == sid:
                    decoded = dict(c.dec.decode(
                        h2.strip_padding(payload, flags)
                    ))
                    if "grpc-status" in decoded:
                        status = int(decoded["grpc-status"])
                    headers_seen = True
                    if flags & h2.FLAG_END_STREAM:
                        done = True
                elif ftype == h2.DATA and fsid == sid:
                    data += h2.strip_padding(payload, flags)
                    if flags & h2.FLAG_END_STREAM:
                        done = True
            assert headers_seen and got_ack and status == 0
            msgs = [m for _, m in h2.parse_grpc_frames(bytes(data))]
            assert resp_schema.decode(msgs[0]).get("nonce", 0) >= 1
        finally:
            c.close()

    def test_24_goaway_with_debug_data_shutdown(self, h2_server):
        # grpc-go closes a channel with GOAWAY(NO_ERROR) carrying ascii
        # debug data before the FIN — the server must take the shutdown
        # gracefully and keep serving OTHER connections
        c = GrpcGoStyleClient(h2_server.port)
        try:
            _assert_nonce_ok(*c.call(GETNONCE, {"address": ADDR}))
            c.sock.sendall(h2.pack_frame(
                h2.GOAWAY, 0, 0,
                (0).to_bytes(4, "big") + (0).to_bytes(4, "big")
                + b"client transport shutdown",
            ))
        finally:
            c.close()
        c2 = GrpcGoStyleClient(h2_server.port)
        try:
            _assert_nonce_ok(*c2.call(GETNONCE, {"address": ADDR}))
        finally:
            c2.close()

    def test_25_deadline_and_retry_attempt_metadata(self, h2_server):
        # a deadline adds grpc-timeout; a transparent retry adds
        # grpc-previous-rpc-attempts — unknown-to-us metadata the
        # server must parse (stateful HPACK inserts it) and ignore
        c = GrpcGoStyleClient(h2_server.port)
        try:
            hdrs = c.request_headers(GETNONCE) + [
                ("grpc-timeout", "10S"),
                ("grpc-previous-rpc-attempts", "1"),
            ]
            _assert_nonce_ok(*c.call(
                GETNONCE, {"address": ADDR},
                header_block=c.enc.encode(hdrs),
            ))
        finally:
            c.close()

    def test_26_quarter_window_replenish(self, h2_server):
        # grpc-go replenishes flow-control windows in quarter-window
        # increments as the application consumes — serve a response
        # through a 64-byte stream window grown 16 bytes at a time
        c = GrpcGoStyleClient(h2_server.port)
        try:
            c.sock.sendall(h2.pack_frame(
                h2.SETTINGS, 0, 0,
                h2.build_settings({h2.SETTINGS_INITIAL_WINDOW_SIZE: 64}),
            ))
            service, method = GETSTATUS.strip("/").split("/")
            req_schema, resp_schema, _ = METHODS[service][method]
            sid = c.send_request(GETSTATUS, req_schema.encode({}))
            data = bytearray()
            status = None
            while True:
                ftype, flags, fsid, payload = c.recv_frame()
                if ftype == h2.DATA and fsid == sid:
                    chunk = h2.strip_padding(payload, flags)
                    data += chunk
                    assert len(chunk) <= 64  # window respected
                    # grpc-go replenishes what was CONSUMED, split into
                    # small increments — granting a fixed amount instead
                    # would grow the window past 64 and make the bound
                    # assertion racy
                    q, r = divmod(len(chunk), 4)
                    for part in (q, q, q, q + r):
                        if part:
                            c.sock.sendall(h2.pack_frame(
                                h2.WINDOW_UPDATE, 0, sid,
                                part.to_bytes(4, "big"),
                            ))
                    c.sock.sendall(h2.pack_frame(
                        h2.WINDOW_UPDATE, 0, 0,
                        len(chunk).to_bytes(4, "big"),
                    ))
                    if flags & h2.FLAG_END_STREAM:
                        break
                elif ftype == h2.HEADERS and fsid == sid:
                    decoded = dict(c.dec.decode(
                        h2.strip_padding(payload, flags)
                    ))
                    if "grpc-status" in decoded:
                        status = int(decoded["grpc-status"])
                    if flags & h2.FLAG_END_STREAM:
                        break
            assert status == 0
            msgs = [m for _, m in h2.parse_grpc_frames(bytes(data))]
            assert resp_schema.decode(msgs[0])  # decodes cleanly
        finally:
            c.close()


class TestDynamicResponseEncoder:
    """Opt-in response-side HPACK dynamic table
    (GrpcH2Server(hpack_dynamic=True)) — the grpc-java/tonic response
    convention. Unit: the production decoder must replay the stateful
    encoder's blocks exactly. Live: repeated RPC responses collapse to
    indexed fields (strictly smaller blocks) and still decode green for
    both client flavors."""

    def test_encoder_decoder_round_trip_and_shrink(self):
        from rtstore_spark.wire.hpack import HpackDecoder, HpackDynamicEncoder

        enc, dec = HpackDynamicEncoder(), HpackDecoder()
        resp = [(":status", "200"), ("content-type", "application/grpc")]
        trail = [("grpc-status", "0")]
        b1 = enc.encode(resp)
        assert dec.decode(b1) == resp
        assert dec.decode(enc.encode(trail)) == trail
        b2 = enc.encode(resp)
        assert dec.decode(b2) == resp
        assert len(b2) < len(b1)  # second block is all back-references
        # peer lowers its table bound: the next block leads with a
        # table-size update the decoder must accept, then re-indexes
        enc.set_max_size(64)
        b3 = enc.encode(resp)
        assert b3[0] & 0xE0 == 0x20  # table-size update opcode first
        assert dec.decode(b3) == resp
        assert dec.decode(enc.encode(resp)) == resp
        # oversized-entry edge: an entry bigger than the table empties
        # it and indexes nothing, but still decodes
        huge = [("grpc-message", "x" * 200)]
        assert dec.decode(enc.encode(huge)) == huge
        assert enc.table == []

    def test_shrink_then_regrow_signals_the_minimum(self):
        """RFC 7541 §4.2: the SMALLEST maximum that occurred between two
        header blocks MUST be signaled — a shrink-to-128 followed by a
        regrow-to-4096 before the next block needs TWO updates (128,
        then 4096); keeping only the last would hide the shrink and a
        strict peer decoder would COMPRESSION_ERROR."""
        from rtstore_spark.wire.hpack import HpackDecoder, HpackDynamicEncoder

        enc, dec = HpackDynamicEncoder(), HpackDecoder()
        resp = [(":status", "200"), ("content-type", "application/grpc")]
        assert dec.decode(enc.encode(resp)) == resp
        enc.set_max_size(128)
        enc.set_max_size(4096)
        block = enc.encode(resp)
        # leads with table-size updates (128 needs the 31-prefix form)
        assert block[0] & 0xE0 == 0x20 and block[0] & 0x1F == 31
        # decode tracks both updates and the block still round-trips
        assert dec.decode(block) == resp
        assert dec.max_size == 4096
        # a shrink alone emits exactly one update
        enc.set_max_size(64)
        block = enc.encode(resp)
        updates = 0
        i = 0
        while block[i] & 0xE0 == 0x20:
            # skip over the varint of this update opcode
            if block[i] & 0x1F == 0x1F:
                i += 1
                while block[i] & 0x80:
                    i += 1
            i += 1
            updates += 1
        assert updates == 1
        assert dec.decode(block) == resp

    @pytest.fixture()
    def h2_server_dyn(self, spark, tmp_path):
        from rtstore_spark.service import NodeService
        from rtstore_spark.service_h2 import GrpcH2Server
        from rtstore_spark.store.docstore import DocStore
        from rtstore_spark.store.ingest import Ingest
        from rtstore_spark.system import SystemStore

        store = DocStore(spark, str(tmp_path / "dynnode"))
        system = SystemStore(spark, str(tmp_path / "dynnode"), admin_addr=ADMIN)
        node = NodeService(store, Ingest(store), system=system)
        srv = GrpcH2Server(node, hpack_dynamic=True).start()
        yield srv
        srv.stop()

    def _response_header_sizes(self, c, n: int) -> list[int]:
        """Drive n GetNonce RPCs, returning the byte size of each
        response's FIRST HEADERS frame (the :status/content-type
        block)."""
        req_schema = METHODS["db3_storage_proto.StorageNode"]["GetNonce"][0]
        sizes = []
        for _ in range(n):
            sid = c.send_request(GETNONCE, req_schema.encode({"address": ADDR}))
            first_headers = None
            while True:
                ftype, flags, fsid, payload = c.recv_frame()
                if ftype == h2.HEADERS and fsid == sid:
                    if first_headers is None:
                        first_headers = len(payload)
                    c.dec.decode(h2.strip_padding(payload, flags))
                    if flags & h2.FLAG_END_STREAM:
                        break
                elif ftype == h2.DATA and fsid == sid and flags & h2.FLAG_END_STREAM:
                    break
            sizes.append(first_headers)
        return sizes

    def test_20_dynamic_responses_shrink_netty_client(self, h2_server_dyn):
        c = NettyStyleClient(h2_server_dyn.port)
        try:
            sizes = self._response_header_sizes(c, 3)
            assert sizes[1] < sizes[0] and sizes[2] == sizes[1], sizes
            # and full RPCs still decode green through the same table
            _assert_nonce_ok(*c.call(GETNONCE, {"address": ADDR}))
        finally:
            c.close()

    def test_21_dynamic_responses_tonic_client_with_table_shrink(
        self, h2_server_dyn
    ):
        c = TonicStyleClient(h2_server_dyn.port)
        try:
            _assert_nonce_ok(*c.coalesced_call(GETNONCE, {"address": ADDR}))
            _assert_nonce_ok(*c.coalesced_call(GETNONCE, {"address": ADDR}))
            # client lowers ITS decoder table bound mid-connection: the
            # server must emit a table-size update and keep decoding
            c.sock.sendall(h2.pack_frame(
                h2.SETTINGS, 0, 0,
                h2.build_settings({h2.SETTINGS_HEADER_TABLE_SIZE: 128}),
            ))
            c.dec.max_size = 128  # what a real client's decoder would do
            for _ in range(3):
                _assert_nonce_ok(*c.coalesced_call(GETNONCE, {"address": ADDR}))
        finally:
            c.close()

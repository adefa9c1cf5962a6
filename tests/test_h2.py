"""Raw gRPC over h2c (service_h2.py) — the Java/Rust SDKs' transport.

The client half hand-frames exactly what a plaintext ``ManagedChannel``
(java/.../Client.java:11-13) puts on the wire: the h2c connection
preface, SETTINGS, HPACK-coded HEADERS, DATA carrying length-prefixed
gRPC messages, trailers read back from an END_STREAM HEADERS frame.
The acceptance test mirrors the Java SDK's own flow
(java/src/test/java/network/db3/client/ClientTest.java: updateNonce →
createDocDatabase → getDatabase → createCollection → getCollection →
addDoc → runQuery) over ONE multiplexed connection.
"""

from __future__ import annotations

import json
import socket
import struct

import pytest

from rtstore_spark.service import NodeServer, NodeService
from rtstore_spark.service_h2 import GrpcH2Server
from rtstore_spark.store import DocStore
from rtstore_spark.store.ingest import Ingest
from rtstore_spark.system import SystemStore
from rtstore_spark.wire import h2
from rtstore_spark.wire.bsonlite import bson_encode
from rtstore_spark.wire.envelope import wrap_and_sign
from rtstore_spark.wire.hpack import HpackDecoder, HpackEncoder, encode_int
from rtstore_spark.wire.rpc_schemas import METHODS
from rtstore_spark.wire.schemas import encode_mutation

PRIV = 0x8DA4EF21B864D2CC526DBDB2A120BD2874C36C9D0A1FB7F8C63D7F7A8B41DE8F
ADMIN = "0x" + "aa" * 20


def _schemas(path: str):
    service, method = path.strip("/").split("/")
    return METHODS[service][method]


class H2Client:
    """Minimal h2c gRPC client built on the same wire helpers."""

    def __init__(self, port: int, huffman: bool = False,
                 initial_window: int | None = None, timeout: float = 120.0):
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=timeout)
        self.encoder = HpackEncoder(huffman=huffman)
        self.decoder = HpackDecoder()
        self.next_sid = 1
        self.recv_windows: dict[int, int] = {}
        self.initial_window = (
            h2.DEFAULT_WINDOW if initial_window is None else initial_window
        )
        self.sock.sendall(h2.PREFACE)
        settings = {}
        if initial_window is not None:
            settings[h2.SETTINGS_INITIAL_WINDOW_SIZE] = initial_window
        self.sock.sendall(h2.pack_frame(
            h2.SETTINGS, 0, 0, h2.build_settings(settings)
        ))

    def close(self):
        self.sock.close()

    # ---------------------------------------------------------------- io

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

    def send_request(self, path: str, message: bytes,
                     header_block: bytes | None = None) -> int:
        sid = self.next_sid
        self.next_sid += 2
        block = header_block if header_block is not None else self.encoder.encode([
            (":method", "POST"), (":scheme", "http"), (":path", path),
            (":authority", "localhost"), ("content-type", "application/grpc"),
            ("te", "trailers"),
        ])
        self.sock.sendall(h2.pack_frame(
            h2.HEADERS, h2.FLAG_END_HEADERS, sid, block
        ))
        self.sock.sendall(h2.pack_frame(
            h2.DATA, h2.FLAG_END_STREAM, sid, h2.grpc_frame(message)
        ))
        self.recv_windows[sid] = self.initial_window
        return sid

    def read_response(self, sid: int):
        """Collect DATA + trailers for one stream; replenishes its recv
        window so a flow-controlled server can finish large responses."""
        data = bytearray()
        headers: list[tuple[str, str]] = []
        trailers: list[tuple[str, str]] = []
        while True:
            ftype, flags, fsid, payload = self.recv_frame()
            if ftype == h2.HEADERS:
                decoded = self.decoder.decode(h2.strip_padding(payload, flags))
                if fsid != sid:
                    continue
                (trailers if headers else headers).extend(decoded)
                if flags & h2.FLAG_END_STREAM:
                    break
            elif ftype == h2.DATA and fsid == sid:
                body = h2.strip_padding(payload, flags)
                data += body
                if len(payload):
                    upd = len(payload).to_bytes(4, "big")
                    self.sock.sendall(
                        h2.pack_frame(h2.WINDOW_UPDATE, 0, 0, upd)
                        + h2.pack_frame(h2.WINDOW_UPDATE, 0, sid, upd)
                    )
                if flags & h2.FLAG_END_STREAM:
                    break
        hd = dict(headers)
        td = dict(trailers or headers)  # trailers-only responses
        status = int(td.get("grpc-status", "0"))
        message = td.get("grpc-message", "")
        msgs = [m for _, m in h2.parse_grpc_frames(bytes(data))]
        return hd, msgs, status, message

    def call(self, path: str, msg: dict):
        req_schema, resp_schema, _ = _schemas(path)
        sid = self.send_request(path, req_schema.encode(msg))
        hd, msgs, status, message = self.read_response(sid)
        return [resp_schema.decode(m) for m in msgs], status, message


@pytest.fixture(scope="module")
def h2_server(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("h2c")
    store = DocStore(spark, str(root / "node"))
    system = SystemStore(spark, str(root / "node"), admin_addr=ADMIN)
    node = NodeService(store, Ingest(store), system=system)
    srv = GrpcH2Server(node).start()
    yield srv
    srv.stop()


def wire_send(client: H2Client, action: str, bodies: list, nonce: int,
              priv: int = PRIV):
    payload, sig = wrap_and_sign(encode_mutation(action, bodies), nonce, priv)
    msgs, status, message = client.call(
        "/db3_storage_proto.StorageNode/SendMutation",
        {"signature": sig, "payload": payload},
    )
    assert status == 0, message
    assert msgs[0].get("code", 0) == 0, msgs[0]
    return msgs[0]


# ------------------------------------------------------------- unit layer


class TestHpackRfcVectors:
    """RFC 7541 Appendix C official vectors — asymmetric (decode the
    spec's exact bytes), so a symmetric encode/decode bug in our own
    Huffman/table code cannot hide behind a clean round trip."""

    def test_c4_request_series_huffman(self):
        d = HpackDecoder()
        # C.4.1
        hs = d.decode(bytes.fromhex("828684418cf1e3c2e5f23a6ba0ab90f4ff"))
        assert hs == [(":method", "GET"), (":scheme", "http"),
                      (":path", "/"), (":authority", "www.example.com")]
        # C.4.2 — dynamic-table reference from the first request
        hs = d.decode(bytes.fromhex("828684be5886a8eb10649cbf"))
        assert hs[-1] == ("cache-control", "no-cache")
        assert hs[3] == (":authority", "www.example.com")
        # C.4.3 — huffman-coded new name + value
        hs = d.decode(bytes.fromhex(
            "828785bf408825a849e95ba97d7f8925a849e95bb8e8b4bf"))
        assert hs[0] == (":method", "GET")
        assert hs[1] == (":scheme", "https")
        assert hs[2] == (":path", "/index.html")
        assert hs[-1] == ("custom-key", "custom-value")

    def test_c6_response_series_with_eviction(self):
        # table capped at 256: inserting the third response's entries
        # EVICTS the oldest — exercises size accounting + eviction order
        d = HpackDecoder(max_table_size=256)
        r1 = d.decode(bytes.fromhex(
            "488264025885aec3771a4b6196d07abe941054d444a8200595040b8166"
            "e082a62d1bff6e919d29ad171863c78f0b97c8e9ae82ae43d3"))
        assert r1[0] == (":status", "302")
        assert r1[1] == ("cache-control", "private")
        assert r1[2] == ("date", "Mon, 21 Oct 2013 20:13:21 GMT")
        assert r1[3] == ("location", "https://www.example.com")
        r2 = d.decode(bytes.fromhex("4883640effc1c0bf"))
        assert r2[0] == (":status", "307")
        assert r2[1:] == r1[1:]  # all indexed references resolve

    def test_dynamic_table_accounts_received_octets(self):
        # a non-UTF8 value (latin-1 fallback) must account its RECEIVED
        # octet length (3), not its UTF-8 re-encode (6) — RFC 7541 §4.1
        d = HpackDecoder(max_table_size=200)
        blk = (bytes([0x40]) + encode_int(1, 7) + b"x"
               + encode_int(3, 7) + bytes([0x80, 0xFF, 0xFE]))
        d.decode(blk)
        assert d._dyn_size == 1 + 3 + 32

    def test_huffman_encode_linear_on_large_values(self):
        # review regression: the encoder never truncated its bit
        # accumulator, so the int grew with the input and every shift
        # cost O(len) — quadratic overall; a 64 KiB value took minutes
        import time

        from rtstore_spark.wire.hpack import huffman_decode, huffman_encode

        data = bytes(range(256)) * 256  # 64 KiB, every symbol length
        t0 = time.monotonic()
        enc = huffman_encode(data)
        elapsed = time.monotonic() - t0
        assert huffman_decode(enc) == data
        assert elapsed < 5.0


class TestFrameLayer:
    def test_frame_round_trip(self):
        raw = h2.pack_frame(h2.DATA, h2.FLAG_END_STREAM, 7, b"hello")
        length, ftype, flags, sid = h2.parse_frame_header(raw[:9])
        assert (length, ftype, flags, sid) == (5, h2.DATA, 1, 7)
        assert raw[9:] == b"hello"

    def test_settings_round_trip(self):
        s = {h2.SETTINGS_MAX_FRAME_SIZE: 65536, h2.SETTINGS_INITIAL_WINDOW_SIZE: 100}
        assert h2.parse_settings(h2.build_settings(s)) == s
        with pytest.raises(h2.H2Error):
            h2.parse_settings(b"\x00\x01\x02")

    def test_padding_strip(self):
        padded = bytes([3]) + b"payload" + b"\x00" * 3
        assert h2.strip_padding(padded, h2.FLAG_PADDED) == b"payload"
        with pytest.raises(h2.H2Error):
            h2.strip_padding(bytes([9]) + b"x", h2.FLAG_PADDED)

    def test_grpc_frames(self):
        two = h2.grpc_frame(b"a") + h2.grpc_frame(b"bc")
        assert h2.parse_grpc_frames(two) == [(0, b"a"), (0, b"bc")]
        with pytest.raises(ValueError):
            h2.parse_grpc_frames(two[:-1])


# --------------------------------------------------------------- sockets


class TestJavaAcceptanceFlow:
    """ClientTest.java's testAddCollection over hand-framed h2c."""

    def test_full_flow_one_connection(self, h2_server):
        c = H2Client(h2_server.port)
        try:
            # updateNonce
            from rtstore_spark.crypto.secp256k1 import priv_to_address

            me = priv_to_address(PRIV)
            msgs, status, _ = c.call(
                "/db3_storage_proto.StorageNode/GetNonce", {"address": me}
            )
            assert status == 0
            nonce = msgs[0].get("nonce", 0)
            assert nonce >= 1

            # createDocDatabase
            r = wire_send(c, "CreateDocumentDB", [{
                "db_address": None, "kind": "doc_database_mutation",
                "body": {"db_desc": "desc"},
            }], nonce=nonce)
            db = next(i["value"] for i in r["items"] if i["key"] == "db_addr")

            # getDatabase — address echoes back
            msgs, status, _ = c.call(
                "/db3_storage_proto.StorageNode/GetDatabase", {"addr": db}
            )
            assert status == 0
            got = "0x" + msgs[0]["database"]["doc_db"]["address"].hex()
            assert got == db

            # createCollection + getCollection
            wire_send(c, "AddCollection", [{
                "db_address": db, "kind": "collection_mutation",
                "body": {"collection_name": "col1"},
            }], nonce=nonce + 1)
            msgs, status, _ = c.call(
                "/db3_storage_proto.StorageNode/GetCollectionOfDatabase",
                {"db_addr": db},
            )
            assert status == 0
            assert [col["name"] for col in msgs[0]["collections"]] == ["col1"]

            # addDoc {"name": 1}
            wire_send(c, "AddDocument", [{
                "db_address": db, "kind": "document_mutation",
                "body": {"collection_name": "col1",
                         "documents": [bson_encode({"name": 1})]},
            }], nonce=nonce + 2)

            # runQuery "/[name=1]"
            msgs, status, message = c.call(
                "/db3_indexer_proto.IndexerNode/RunQuery",
                {"db": db, "col_name": "col1",
                 "query": {"query_str": "/[name=1]"}},
            )
            assert status == 0, message
            docs = [json.loads(d["doc"]) for d in msgs[0]["documents"]]
            assert docs == [{"name": 1}]
            assert msgs[0]["count"] == 1
        finally:
            c.close()

    def test_huffman_coded_requests(self, h2_server):
        # grpc-java Huffman-codes header literals; same flow, huffman on
        c = H2Client(h2_server.port, huffman=True)
        try:
            msgs, status, _ = c.call(
                "/db3_storage_proto.StorageNode/GetNonce",
                {"address": "0x" + "12" * 20},
            )
            assert status == 0 and msgs[0].get("nonce", 0) >= 1
        finally:
            c.close()

    def test_incremental_indexing_dynamic_table(self, h2_server):
        # real clients insert repeated headers into the dynamic table and
        # reference them by index on later requests — exercise the server
        # decoder's stateful path across two streams
        c = H2Client(h2_server.port)
        try:
            def lit_inc(name: str, value: str) -> bytes:
                nb, vb = name.encode(), value.encode()
                return (encode_int(0, 6, 0x40)
                        + encode_int(len(nb), 7) + nb
                        + encode_int(len(vb), 7) + vb)

            enc = HpackEncoder()
            path = "/db3_storage_proto.StorageNode/GetNonce"
            base = enc.encode([
                (":method", "POST"), (":scheme", "http"), (":path", path),
            ])
            block1 = base + lit_inc("content-type", "application/grpc") \
                + lit_inc("te", "trailers")
            req_schema, resp_schema, _ = _schemas(path)
            msg = req_schema.encode({"address": "0x" + "34" * 20})
            sid = c.send_request(path, msg, header_block=block1)
            _, msgs, status, _ = c.read_response(sid)
            assert status == 0

            # second stream: reference both entries by dynamic index
            # (te=trailers is newest → index 62, content-type → 63)
            block2 = base + encode_int(63, 7, 0x80) + encode_int(62, 7, 0x80)
            sid = c.send_request(path, msg, header_block=block2)
            _, msgs, status, _ = c.read_response(sid)
            assert status == 0
            assert resp_schema.decode(msgs[0]).get("nonce", 0) >= 1
        finally:
            c.close()


class TestTransportEdges:
    def test_unknown_method_unimplemented(self, h2_server):
        c = H2Client(h2_server.port)
        try:
            sid = c.send_request("/db3_storage_proto.StorageNode/NoSuch", b"")
            _, msgs, status, _ = c.read_response(sid)
            assert status == 12 and msgs == []
        finally:
            c.close()

    def test_get_method_rejected(self, h2_server):
        c = H2Client(h2_server.port)
        try:
            block = c.encoder.encode([
                (":method", "GET"), (":scheme", "http"),
                (":path", "/db3_storage_proto.StorageNode/GetNonce"),
            ])
            sid = c.send_request(
                "/db3_storage_proto.StorageNode/GetNonce", b"",
                header_block=block,
            )
            _, _, status, message = c.read_response(sid)
            assert status == 12 and "POST" in message
        finally:
            c.close()

    def test_compressed_message_rejected(self, h2_server):
        c = H2Client(h2_server.port)
        try:
            sid = c.next_sid
            c.next_sid += 2
            block = c.encoder.encode([
                (":method", "POST"), (":scheme", "http"),
                (":path", "/db3_storage_proto.StorageNode/GetNonce"),
                ("content-type", "application/grpc"),
            ])
            c.sock.sendall(h2.pack_frame(h2.HEADERS, h2.FLAG_END_HEADERS, sid, block))
            body = b"\x01" + struct.pack(">I", 3) + b"xyz"  # compressed flag
            c.sock.sendall(h2.pack_frame(h2.DATA, h2.FLAG_END_STREAM, sid, body))
            c.recv_windows[sid] = c.initial_window
            _, _, status, _ = c.read_response(sid)
            assert status == 12
        finally:
            c.close()

    def test_ping_is_acked(self, h2_server):
        c = H2Client(h2_server.port)
        try:
            c.sock.sendall(h2.pack_frame(h2.PING, 0, 0, b"12345678"))
            while True:
                ftype, flags, _, payload = c.recv_frame()
                if ftype == h2.PING and flags & h2.FLAG_ACK:
                    assert payload == b"12345678"
                    break
        finally:
            c.close()

    def test_rst_on_flow_blocked_stream_unblocks_connection(self, h2_server):
        # review regression: a cancelled stream's window never reopens —
        # the server must abort that send on RST_STREAM, not spin on it
        # until io_timeout kills the whole connection
        c = H2Client(h2_server.port, initial_window=48, timeout=30)
        try:
            req_schema, _, _ = _schemas("/db3_system_proto.System/GetSystemStatus")
            sid = c.send_request(
                "/db3_system_proto.System/GetSystemStatus",
                req_schema.encode({}),
            )
            # read until the first (window-capped) DATA chunk, then cancel
            while True:
                ftype, flags, fsid, payload = c.recv_frame()
                if ftype == h2.DATA and fsid == sid:
                    break
            c.sock.sendall(h2.pack_frame(
                h2.RST_STREAM, 0, sid, (8).to_bytes(4, "big")
            ))
            # the connection must still serve new requests promptly
            msgs, status, message = c.call(
                "/db3_storage_proto.StorageNode/GetNonce",
                {"address": "0x" + "56" * 20},
            )
            assert status == 0, message
            assert msgs[0].get("nonce", 0) >= 1
        finally:
            c.close()

    def test_rst_cancels_subscribe_promptly(self, h2_server):
        # review regression: Subscribe must honor RST_STREAM between
        # events, not stream into the void until its deadline while
        # queued RPCs starve
        import time

        gateway = h2_server.tcp.gateway
        old = gateway.SUBSCRIBE_MAX_SECONDS
        gateway.SUBSCRIBE_MAX_SECONDS = 60
        c = H2Client(h2_server.port, timeout=30)
        try:
            req_schema, _, _ = _schemas(
                "/db3_storage_proto.StorageNode/Subscribe")
            sid = c.send_request(
                "/db3_storage_proto.StorageNode/Subscribe",
                req_schema.encode({"signature": "", "payload": ""}),
            )
            # response headers arrive, then cancel the stream
            while True:
                ftype, flags, fsid, _ = c.recv_frame()
                if ftype == h2.HEADERS and fsid == sid:
                    break
            c.sock.sendall(h2.pack_frame(
                h2.RST_STREAM, 0, sid, (8).to_bytes(4, "big")
            ))
            t0 = time.monotonic()
            msgs, status, message = c.call(
                "/db3_storage_proto.StorageNode/GetNonce",
                {"address": "0x" + "57" * 20},
            )
            assert status == 0, message
            assert time.monotonic() - t0 < 20  # not the 60 s stream window
        finally:
            c.close()
            gateway.SUBSCRIBE_MAX_SECONDS = old

    def test_goaway_carries_last_processed_stream(self, h2_server):
        # review regression: GOAWAY must advertise the highest PROCESSED
        # stream id so clients never replay applied mutations
        c = H2Client(h2_server.port)
        try:
            msgs, status, _ = c.call(
                "/db3_storage_proto.StorageNode/GetNonce",
                {"address": "0x" + "58" * 20},
            )
            assert status == 0
            # CONTINUATION outside a header block = connection error
            c.sock.sendall(h2.pack_frame(h2.CONTINUATION, 0, 3, b"x"))
            while True:
                ftype, flags, fsid, payload = c.recv_frame()
                if ftype == h2.GOAWAY:
                    last_sid = int.from_bytes(payload[:4], "big")
                    assert last_sid == 1  # stream 1 WAS processed
                    break
        finally:
            c.close()

    def test_flow_control_small_client_window(self, h2_server):
        # client advertises a 64-byte stream window: the server must chunk
        # the response and wait for WINDOW_UPDATEs (read_response sends
        # them as DATA arrives)
        c = H2Client(h2_server.port, initial_window=64)
        try:
            msgs, status, _ = c.call(
                "/db3_system_proto.System/GetSystemStatus", {},
            )
            assert status == 0
            assert msgs[0]["admin_addr"] == ADMIN  # response > 64 bytes total
        finally:
            c.close()

    def test_json_and_h2_fronts_share_state(self, h2_server, spark):
        # one store behind both fronts: mutate over h2c, read over JSON
        import json as _json
        import urllib.request

        http = NodeServer(h2_server.node).start()
        try:
            c = H2Client(h2_server.port)
            priv = 0x5151515151515151515151515151515151515151515151515151515151515151
            r = wire_send(c, "CreateDocumentDB", [{
                "db_address": None, "kind": "doc_database_mutation",
                "body": {"db_desc": "shared"},
            }], nonce=1, priv=priv)
            db = next(i["value"] for i in r["items"] if i["key"] == "db_addr")
            c.close()
            req = urllib.request.Request(
                f"http://127.0.0.1:{http.port}/v1/storage/GetDatabase",
                data=_json.dumps({"addr": db}).encode(),
                headers={"Content-Type": "application/json"}, method="POST",
            )
            with urllib.request.urlopen(req, timeout=60) as resp:
                out = _json.loads(resp.read())
            assert out["database"]["db_addr"] == db
        finally:
            http.stop()


class TestMultiplexedUnaryDuringSubscribe:
    def test_unary_answers_while_stream_is_live(self, h2_server):
        # grpc-java multiplexes calls over ONE channel: a unary issued
        # while a Subscribe stream is live must answer between events,
        # not after the stream's deadline
        import time

        gateway = h2_server.tcp.gateway
        old = gateway.SUBSCRIBE_MAX_SECONDS
        gateway.SUBSCRIBE_MAX_SECONDS = 45
        c = H2Client(h2_server.port, timeout=30)
        try:
            req_schema, _, _ = _schemas(
                "/db3_storage_proto.StorageNode/Subscribe")
            sub_sid = c.send_request(
                "/db3_storage_proto.StorageNode/Subscribe",
                req_schema.encode({"signature": "", "payload": ""}),
            )
            while True:  # stream is live once its headers arrive
                ftype, flags, fsid, _ = c.recv_frame()
                if ftype == h2.HEADERS and fsid == sub_sid:
                    break
            t0 = time.monotonic()
            msgs, status, message = c.call(
                "/db3_storage_proto.StorageNode/GetNonce",
                {"address": "0x" + "61" * 20},
            )
            assert status == 0, message
            assert time.monotonic() - t0 < 15  # between ticks, not at 45 s
            # the stream is STILL live afterwards: liveness PINGs keep coming
            saw_ping = False
            deadline = time.monotonic() + 10
            while time.monotonic() < deadline and not saw_ping:
                ftype, flags, fsid, _ = c.recv_frame()
                saw_ping = ftype == h2.PING and not flags & h2.FLAG_ACK
            assert saw_ping
            c.sock.sendall(h2.pack_frame(
                h2.RST_STREAM, 0, sub_sid, (8).to_bytes(4, "big")
            ))
        finally:
            c.close()
            gateway.SUBSCRIBE_MAX_SECONDS = old


class TestBoundedBookkeeping:
    def test_per_stream_state_dies_with_its_stream(self, h2_server):
        # review regression: on an hours-long gRPC channel, NO per-stream
        # container may grow with connection lifetime — completed streams,
        # streams cancelled mid-assembly (RST before END_STREAM), and
        # WINDOW_UPDATEs racing our END_STREAM must all leave no residue
        import time

        c = H2Client(h2_server.port)
        try:
            addr = "0x" + "60" * 20
            for _ in range(3):  # completed unary streams
                msgs, status, _ = c.call(
                    "/db3_storage_proto.StorageNode/GetNonce",
                    {"address": addr},
                )
                assert status == 0
            # stream cancelled mid-assembly: HEADERS without END_STREAM,
            # then RST before any body
            sid = c.next_sid
            c.next_sid += 2
            block = c.encoder.encode([
                (":method", "POST"), (":scheme", "http"),
                (":path", "/db3_storage_proto.StorageNode/GetNonce"),
                ("content-type", "application/grpc"),
            ])
            c.sock.sendall(h2.pack_frame(h2.HEADERS, h2.FLAG_END_HEADERS, sid, block))
            c.sock.sendall(h2.pack_frame(
                h2.RST_STREAM, 0, sid, (8).to_bytes(4, "big")
            ))
            # WINDOW_UPDATE for an already-finished stream (the race with
            # our END_STREAM) must not resurrect its bookkeeping
            c.sock.sendall(h2.pack_frame(
                h2.WINDOW_UPDATE, 0, 1, (1000).to_bytes(4, "big")
            ))
            # one more full round trip so the server has processed it all
            msgs, status, _ = c.call(
                "/db3_storage_proto.StorageNode/GetNonce", {"address": addr},
            )
            assert status == 0
            conn = h2_server.tcp.last_connection
            deadline = time.monotonic() + 5
            while time.monotonic() < deadline and (
                conn.streams or conn.reset_streams or conn.stream_send_windows
            ):
                time.sleep(0.05)
            assert conn.streams == {}
            assert conn.reset_streams == set()
            assert conn.stream_send_windows == {}
            assert conn.max_processed_sid >= 7
        finally:
            c.close()


class TestSubscribeStream:
    def test_block_events_stream_over_h2(self, h2_server):
        import threading
        import time

        gateway = h2_server.tcp.gateway
        old = getattr(gateway, "SUBSCRIBE_MAX_SECONDS", None)
        gateway.SUBSCRIBE_MAX_SECONDS = 30
        c = H2Client(h2_server.port, timeout=60)
        try:
            req_schema, resp_schema, streaming = _schemas(
                "/db3_storage_proto.StorageNode/Subscribe"
            )
            assert streaming
            sid = c.send_request(
                "/db3_storage_proto.StorageNode/Subscribe",
                req_schema.encode({"signature": "", "payload": ""}),
            )

            # drive a block CLOSE through the node's own store (events
            # fire on closed blocks, like the grpcweb Subscribe test)
            store = h2_server.node.store

            def mutate():
                time.sleep(0.5)
                store.create_database("0x" + "ab" * 20, 1, desc="sub-h2")
                store.state.next_block()

            t = threading.Thread(target=mutate, daemon=True)
            t.start()
            # read frames until one EventMessage DATA arrives
            deadline = time.monotonic() + 45
            event = None
            buf = bytearray()
            while time.monotonic() < deadline and event is None:
                ftype, flags, fsid, payload = c.recv_frame()
                if ftype == h2.HEADERS and fsid == sid and (
                    flags & h2.FLAG_END_STREAM
                ):
                    break  # stream ended (deadline) without an event
                if ftype == h2.DATA and fsid == sid:
                    buf += h2.strip_padding(payload, flags)
                    if payload:
                        upd = len(payload).to_bytes(4, "big")
                        c.sock.sendall(
                            h2.pack_frame(h2.WINDOW_UPDATE, 0, 0, upd)
                            + h2.pack_frame(h2.WINDOW_UPDATE, 0, sid, upd)
                        )
                    for _, m in h2.parse_grpc_frames(bytes(buf)):
                        ev = resp_schema.decode(m)
                        if "block_event" in ev:
                            event = ev
                            break
            t.join(timeout=10)
            assert event is not None, "no block event within deadline"
            assert event["block_event"].get("mutation_count", 0) >= 1
        finally:
            c.close()
            if old is not None:
                gateway.SUBSCRIBE_MAX_SECONDS = old


class TestConnectionErrorHandling:
    """Round-7 review regressions: connection-level faults must tear the
    connection down with GOAWAY — never get mapped to per-stream
    trailers, and never pass through the window-grant path first."""

    def test_data_on_stream_zero_is_connection_error(self, h2_server):
        c = H2Client(h2_server.port, timeout=30)
        try:
            # a healthy round trip first, so GOAWAY's last-sid is provable
            msgs, status, _ = c.call(
                "/db3_storage_proto.StorageNode/GetNonce",
                {"address": "0x" + "62" * 20},
            )
            assert status == 0
            c.sock.sendall(h2.pack_frame(h2.DATA, 0, 0, b"bogus"))
            saw_goaway = False
            while not saw_goaway:
                ftype, flags, fsid, payload = c.recv_frame()
                # the server must NOT answer the poison DATA with
                # WINDOW_UPDATE grants before rejecting it
                assert ftype != h2.WINDOW_UPDATE
                if ftype == h2.GOAWAY:
                    assert int.from_bytes(payload[4:8], "big") == h2.PROTOCOL_ERROR
                    saw_goaway = True
        finally:
            c.close()

    def test_data_on_idle_stream_is_connection_error(self, h2_server):
        c = H2Client(h2_server.port, timeout=30)
        try:
            c.sock.sendall(h2.pack_frame(h2.DATA, 0, 99, b"idle"))
            while True:
                ftype, flags, fsid, payload = c.recv_frame()
                assert ftype != h2.WINDOW_UPDATE
                if ftype == h2.GOAWAY:
                    assert int.from_bytes(payload[4:8], "big") == h2.PROTOCOL_ERROR
                    break
        finally:
            c.close()

    def test_malformed_frame_during_subscribe_gets_goaway(self, h2_server):
        # an H2Error raised from the nested drain inside a live Subscribe
        # must surface as GOAWAY + teardown, NOT as a trailers-only
        # HEADERS (a second :status on an open stream is malformed and
        # leaves a desynced connection alive)
        gateway = h2_server.tcp.gateway
        old = gateway.SUBSCRIBE_MAX_SECONDS
        gateway.SUBSCRIBE_MAX_SECONDS = 30
        c = H2Client(h2_server.port, timeout=30)
        try:
            req_schema, _, _ = _schemas(
                "/db3_storage_proto.StorageNode/Subscribe")
            sid = c.send_request(
                "/db3_storage_proto.StorageNode/Subscribe",
                req_schema.encode({"signature": "", "payload": ""}),
            )
            while True:
                ftype, flags, fsid, _ = c.recv_frame()
                if ftype == h2.HEADERS and fsid == sid:
                    break
            # SETTINGS with length not a multiple of 6: connection error
            c.sock.sendall(h2.pack_frame(h2.SETTINGS, 0, 0, b"\x00\x01\x02"))
            saw_goaway = False
            deadline = __import__("time").monotonic() + 20
            while __import__("time").monotonic() < deadline and not saw_goaway:
                ftype, flags, fsid, payload = c.recv_frame()
                if ftype == h2.HEADERS and fsid == sid:
                    # any HEADERS now would be the malformed second
                    # :status block the fix removes
                    decoded = HpackDecoder().decode(
                        h2.strip_padding(payload, flags))
                    assert (":status", "200") not in decoded
                if ftype == h2.GOAWAY:
                    saw_goaway = True
            assert saw_goaway
        finally:
            c.close()
            gateway.SUBSCRIBE_MAX_SECONDS = old


class TestRstDuringNestedDispatch:
    def test_outer_subscribe_rst_while_unary_flow_blocked(self, h2_server):
        # review regression: RST for the OUTER Subscribe stream arriving
        # while a nested unary dispatch is flow-blocked must still be
        # recorded — the old single responding_sid pointed at the inner
        # stream, the outer was in neither streams nor ready, and the
        # cancel was lost (server streams to a dead stream forever)
        import threading
        import time

        gateway = h2_server.tcp.gateway
        old = gateway.SUBSCRIBE_MAX_SECONDS
        gateway.SUBSCRIBE_MAX_SECONDS = 40
        c = H2Client(h2_server.port, initial_window=48, timeout=30)
        try:
            req_schema, _, _ = _schemas(
                "/db3_storage_proto.StorageNode/Subscribe")
            sub_sid = c.send_request(
                "/db3_storage_proto.StorageNode/Subscribe",
                req_schema.encode({"signature": "", "payload": ""}),
            )
            while True:
                ftype, flags, fsid, _ = c.recv_frame()
                if ftype == h2.HEADERS and fsid == sub_sid:
                    break
            # nested unary whose >48-byte response will flow-block
            sys_schema, _, _ = _schemas(
                "/db3_system_proto.System/GetSystemStatus")
            uni_sid = c.send_request(
                "/db3_system_proto.System/GetSystemStatus",
                sys_schema.encode({}),
            )
            while True:  # first capped DATA chunk = server blocked in send
                ftype, flags, fsid, payload = c.recv_frame()
                if ftype == h2.DATA and fsid == uni_sid:
                    break
            # cancel the OUTER stream while the inner is mid-send
            c.sock.sendall(h2.pack_frame(
                h2.RST_STREAM, 0, sub_sid, (8).to_bytes(4, "big")
            ))
            # then open the inner stream's window so it can finish
            upd = (1 << 20).to_bytes(4, "big")
            c.sock.sendall(
                h2.pack_frame(h2.WINDOW_UPDATE, 0, 0, upd)
                + h2.pack_frame(h2.WINDOW_UPDATE, 0, uni_sid, upd)
            )
            # hand-scan to the unary trailers (the first DATA chunk was
            # already consumed above, so read_response can't reassemble)
            status = None
            while status is None:
                ftype, flags, fsid, payload = c.recv_frame()
                if ftype == h2.HEADERS and fsid == uni_sid:
                    td = dict(c.decoder.decode(h2.strip_padding(payload, flags)))
                    if flags & h2.FLAG_END_STREAM:
                        status = int(td.get("grpc-status", "0"))
            assert status == 0
            # drive a block event; NOTHING may arrive on the cancelled
            # subscribe stream now
            store = h2_server.node.store
            def mutate():
                store.create_database("0x" + "ac" * 20, 1, desc="rst-nested")
                store.state.next_block()
            threading.Thread(target=mutate, daemon=True).start()
            deadline = time.monotonic() + 8
            c.sock.settimeout(2)
            while time.monotonic() < deadline:
                try:
                    ftype, flags, fsid, payload = c.recv_frame()
                except (TimeoutError, socket.timeout):
                    continue
                assert not (ftype == h2.DATA and fsid == sub_sid), \
                    "event streamed to a cancelled subscribe stream"
        finally:
            c.close()
            gateway.SUBSCRIBE_MAX_SECONDS = old


class TestPartialHeaderBlockDuringSubscribe:
    def test_half_sent_header_block_does_not_stall_stream(self, h2_server):
        # review regression: the non-blocking drain only verified the
        # FIRST frame was buffered; a HEADERS without END_HEADERS then
        # committed to blocking CONTINUATION reads and one half-sent
        # header block froze event delivery for io_timeout
        import threading
        import time

        gateway = h2_server.tcp.gateway
        old = gateway.SUBSCRIBE_MAX_SECONDS
        gateway.SUBSCRIBE_MAX_SECONDS = 40
        c = H2Client(h2_server.port, timeout=30)
        try:
            req_schema, resp_schema, _ = _schemas(
                "/db3_storage_proto.StorageNode/Subscribe")
            sub_sid = c.send_request(
                "/db3_storage_proto.StorageNode/Subscribe",
                req_schema.encode({"signature": "", "payload": ""}),
            )
            while True:
                ftype, flags, fsid, _ = c.recv_frame()
                if ftype == h2.HEADERS and fsid == sub_sid:
                    break
            # half a header block for a new unary: HEADERS w/o END_HEADERS
            nonce_sid = c.next_sid
            c.next_sid += 2
            block = c.encoder.encode([
                (":method", "POST"), (":scheme", "http"),
                (":path", "/db3_storage_proto.StorageNode/GetNonce"),
                ("content-type", "application/grpc"),
            ])
            half = len(block) // 2
            c.sock.sendall(h2.pack_frame(h2.HEADERS, 0, nonce_sid, block[:half]))
            # events must still flow while the block is incomplete
            store = h2_server.node.store
            def mutate():
                time.sleep(0.5)
                store.create_database("0x" + "ad" * 20, 1, desc="stall-test")
                store.state.next_block()
            t = threading.Thread(target=mutate, daemon=True)
            t.start()
            buf = bytearray()
            event = None
            deadline = time.monotonic() + 25

            def recv_no_ack():
                # recv_frame auto-acks PINGs, but our header block is
                # still open and NOTHING may interleave inside it
                ln, ft, fl, fs = h2.parse_frame_header(c._recv_exact(9))
                return ft, fl, fs, (c._recv_exact(ln) if ln else b"")

            while time.monotonic() < deadline and event is None:
                ftype, flags, fsid, payload = recv_no_ack()
                if ftype == h2.DATA and fsid == sub_sid:
                    buf += h2.strip_padding(payload, flags)
                    # NOTE: no WINDOW_UPDATE replenish here — our header
                    # block is still open, and RFC 9113 §4.3 forbids
                    # interleaving any other frame inside it; the default
                    # 64 KiB windows cover these small events easily
                    for _, m in h2.parse_grpc_frames(bytes(buf)):
                        if "block_event" in resp_schema.decode(m):
                            event = m
                            break
            t.join(timeout=10)
            assert event is not None, \
                "half-sent header block stalled the subscribe stream"
            # complete the header block + body: the unary must now answer
            c.sock.sendall(h2.pack_frame(
                h2.CONTINUATION, h2.FLAG_END_HEADERS, nonce_sid, block[half:]
            ))
            nonce_schema, nonce_resp, _ = _schemas(
                "/db3_storage_proto.StorageNode/GetNonce")
            c.sock.sendall(h2.pack_frame(
                h2.DATA, h2.FLAG_END_STREAM, nonce_sid,
                h2.grpc_frame(nonce_schema.encode({"address": "0x" + "63" * 20})),
            ))
            c.recv_windows[nonce_sid] = c.initial_window
            hd, msgs, status, message = c.read_response(nonce_sid)
            assert status == 0, message
            assert nonce_resp.decode(msgs[0]).get("nonce", 0) >= 1
            c.sock.sendall(h2.pack_frame(
                h2.RST_STREAM, 0, sub_sid, (8).to_bytes(4, "big")
            ))
        finally:
            c.close()
            gateway.SUBSCRIBE_MAX_SECONDS = old


class TestStreamLimits:
    """Round-7 final review: stream state machine + resource bounds."""

    def test_non_increasing_stream_id_is_connection_error(self, h2_server):
        c = H2Client(h2_server.port, timeout=30)
        try:
            msgs, status, _ = c.call(
                "/db3_storage_proto.StorageNode/GetNonce",
                {"address": "0x" + "64" * 20},
            )
            assert status == 0
            # repeat stream id 1 (already used): must GOAWAY, not
            # silently open a duplicate stream
            block = c.encoder.encode([
                (":method", "POST"), (":scheme", "http"),
                (":path", "/db3_storage_proto.StorageNode/GetNonce"),
                ("content-type", "application/grpc"),
            ])
            c.sock.sendall(h2.pack_frame(
                h2.HEADERS, h2.FLAG_END_HEADERS, 1, block
            ))
            while True:
                ftype, flags, fsid, payload = c.recv_frame()
                if ftype == h2.GOAWAY:
                    assert int.from_bytes(payload[4:8], "big") == \
                        h2.PROTOCOL_ERROR
                    break
        finally:
            c.close()

    def test_excess_half_open_streams_are_refused(self, h2_server):
        from rtstore_spark.service_h2 import _Connection

        c = H2Client(h2_server.port, timeout=30)
        try:
            block = c.encoder.encode([
                (":method", "POST"), (":scheme", "http"),
                (":path", "/db3_storage_proto.StorageNode/GetNonce"),
                ("content-type", "application/grpc"),
            ])
            limit = _Connection.MAX_CONCURRENT
            # open limit+5 half-open streams (HEADERS, no END_STREAM)
            sid = 1
            for _ in range(limit + 5):
                c.sock.sendall(h2.pack_frame(
                    h2.HEADERS, h2.FLAG_END_HEADERS, sid, block
                ))
                sid += 2
            refused = 0
            deadline = __import__("time").monotonic() + 20
            while refused < 5 and __import__("time").monotonic() < deadline:
                ftype, flags, fsid, payload = c.recv_frame()
                if ftype == h2.RST_STREAM:
                    assert int.from_bytes(payload, "big") == h2.REFUSED_STREAM
                    refused += 1
            assert refused == 5
            conn = h2_server.tcp.last_connection
            assert len(conn.streams) <= limit
        finally:
            c.close()

    def test_oversized_frame_header_during_subscribe_goaways(self, h2_server):
        # a declared length over the frame cap may exceed SO_RCVBUF, so
        # the drain could never fully buffer it — it must raise NOW, not
        # leave the RSTs queued behind it unread until the deadline
        import time

        gateway = h2_server.tcp.gateway
        old = gateway.SUBSCRIBE_MAX_SECONDS
        gateway.SUBSCRIBE_MAX_SECONDS = 60
        c = H2Client(h2_server.port, timeout=30)
        try:
            req_schema, _, _ = _schemas(
                "/db3_storage_proto.StorageNode/Subscribe")
            sid = c.send_request(
                "/db3_storage_proto.StorageNode/Subscribe",
                req_schema.encode({"signature": "", "payload": ""}),
            )
            while True:
                ftype, flags, fsid, _ = c.recv_frame()
                if ftype == h2.HEADERS and fsid == sid:
                    break
            # 9-byte frame header claiming 8 MiB, no payload behind it
            c.sock.sendall(
                (8 << 20).to_bytes(3, "big") + bytes([h2.DATA, 0])
                + (0).to_bytes(4, "big")
            )
            t0 = time.monotonic()
            saw_goaway = False
            while not saw_goaway and time.monotonic() - t0 < 20:
                ftype, flags, fsid, payload = c.recv_frame()
                if ftype == h2.GOAWAY:
                    assert int.from_bytes(payload[4:8], "big") == \
                        h2.FRAME_SIZE_ERROR
                    saw_goaway = True
            assert saw_goaway
            assert time.monotonic() - t0 < 20  # not the 60 s deadline
        finally:
            c.close()
            gateway.SUBSCRIBE_MAX_SECONDS = old

    def test_oversized_continuation_rejected_at_header(self, h2_server):
        c = H2Client(h2_server.port, timeout=30)
        try:
            block = c.encoder.encode([
                (":method", "POST"), (":scheme", "http"),
                (":path", "/db3_storage_proto.StorageNode/GetNonce"),
                ("content-type", "application/grpc"),
            ])
            sid = c.next_sid
            c.sock.sendall(h2.pack_frame(h2.HEADERS, 0, sid, block))
            # CONTINUATION declaring 16 MiB: reject at the frame header,
            # never block buffering megabytes toward the 64 KiB cap
            c.sock.sendall(
                ((1 << 24) - 1).to_bytes(3, "big")
                + bytes([h2.CONTINUATION, h2.FLAG_END_HEADERS])
                + sid.to_bytes(4, "big")
            )
            while True:
                ftype, flags, fsid, payload = c.recv_frame()
                if ftype == h2.GOAWAY:
                    assert int.from_bytes(payload[4:8], "big") == \
                        h2.FRAME_SIZE_ERROR
                    break
        finally:
            c.close()

    def test_goaway_ends_subscribe_promptly(self, h2_server):
        import time

        gateway = h2_server.tcp.gateway
        old = gateway.SUBSCRIBE_MAX_SECONDS
        gateway.SUBSCRIBE_MAX_SECONDS = 60
        c = H2Client(h2_server.port, timeout=30)
        try:
            req_schema, _, _ = _schemas(
                "/db3_storage_proto.StorageNode/Subscribe")
            sid = c.send_request(
                "/db3_storage_proto.StorageNode/Subscribe",
                req_schema.encode({"signature": "", "payload": ""}),
            )
            while True:
                ftype, flags, fsid, _ = c.recv_frame()
                if ftype == h2.HEADERS and fsid == sid:
                    break
            # client announces channel shutdown
            c.sock.sendall(h2.pack_frame(
                h2.GOAWAY, 0, 0,
                (0).to_bytes(4, "big") + h2.NO_ERROR.to_bytes(4, "big"),
            ))
            # the stream must END (trailers) well before the 60 s window
            t0 = time.monotonic()
            ended = False
            while not ended and time.monotonic() - t0 < 20:
                ftype, flags, fsid, payload = c.recv_frame()
                if ftype == h2.HEADERS and fsid == sid and \
                        flags & h2.FLAG_END_STREAM:
                    td = dict(c.decoder.decode(
                        h2.strip_padding(payload, flags)))
                    assert td.get("grpc-status", "0") == "0"
                    ended = True
            assert ended
        finally:
            c.close()
            gateway.SUBSCRIBE_MAX_SECONDS = old


# --------------------------------------------------- concurrent dispatch


class TestConcurrentDispatch:
    """Round-8 serving gap fix: read-only unary RPCs execute on a bounded
    worker pool, so a slow RunQuery no longer head-of-line-blocks other
    reads multiplexed on the SAME connection — the concurrency grpc-java
    assumes of one shared ManagedChannel (Client.java:11-13) and tonic's
    server provides natively."""

    def test_slow_query_does_not_block_getnonce(self, h2_server, monkeypatch):
        import threading as _th

        from rtstore_spark.service_grpcweb import GrpcStatus, GrpcWebGateway

        gate = _th.Event()
        entered = _th.Event()

        def slow(self, req):
            entered.set()
            gate.wait(15.0)
            raise GrpcStatus(3, "slow-query-finished")

        monkeypatch.setattr(GrpcWebGateway, "_IndexerNode_RunQuery", slow)
        c = H2Client(h2_server.port, timeout=30)
        try:
            q_req = _schemas("/db3_indexer_proto.IndexerNode/RunQuery")[0]
            n_req = _schemas("/db3_storage_proto.StorageNode/GetNonce")[0]
            q_sid = c.send_request(
                "/db3_indexer_proto.IndexerNode/RunQuery", q_req.encode({})
            )
            assert entered.wait(5.0), "RunQuery handler never started"
            n_sid = c.send_request(
                "/db3_storage_proto.StorageNode/GetNonce",
                n_req.encode({"address": "0x" + "61" * 20}),
            )
            ends = []  # stream-end order as observed on the wire
            while len(ends) < 2:
                ftype, flags, fsid, _ = c.recv_frame()
                if ftype in (h2.HEADERS, h2.DATA) and flags & h2.FLAG_END_STREAM:
                    ends.append(fsid)
                    if len(ends) == 1:
                        gate.set()  # nonce answered: release the query
            # OUT OF ORDER: the later GetNonce finished first
            assert ends == [n_sid, q_sid]
        finally:
            gate.set()
            c.close()

    def test_reads_execute_concurrently(self, h2_server, monkeypatch):
        # four RunQuery handlers must be IN FLIGHT AT ONCE on one
        # connection — a Barrier(4) only ever releases if they are
        import threading as _th

        from rtstore_spark.service_grpcweb import GrpcStatus, GrpcWebGateway

        barrier = _th.Barrier(4, timeout=10)

        def rendezvous(self, req):
            barrier.wait()
            raise GrpcStatus(3, "rendezvous-done")

        monkeypatch.setattr(GrpcWebGateway, "_IndexerNode_RunQuery", rendezvous)
        c = H2Client(h2_server.port, timeout=30)
        try:
            q_req = _schemas("/db3_indexer_proto.IndexerNode/RunQuery")[0]
            sids = {
                c.send_request(
                    "/db3_indexer_proto.IndexerNode/RunQuery", q_req.encode({})
                )
                for _ in range(4)
            }
            done = set()
            while len(done) < 4:
                ftype, flags, fsid, _ = c.recv_frame()
                if ftype == h2.HEADERS and flags & h2.FLAG_END_STREAM:
                    done.add(fsid)
            assert done == sids
            assert not barrier.broken  # all four met inside the window
        finally:
            c.close()

    def test_rst_during_pool_dispatch_suppresses_response(
        self, h2_server, monkeypatch
    ):
        import time as _time
        import threading as _th

        from rtstore_spark.service_grpcweb import GrpcStatus, GrpcWebGateway

        gate = _th.Event()
        entered = _th.Event()

        def slow(self, req):
            entered.set()
            gate.wait(15.0)
            raise GrpcStatus(3, "cancelled-anyway")

        monkeypatch.setattr(GrpcWebGateway, "_IndexerNode_RunQuery", slow)
        c = H2Client(h2_server.port, timeout=30)
        try:
            q_req = _schemas("/db3_indexer_proto.IndexerNode/RunQuery")[0]
            q_sid = c.send_request(
                "/db3_indexer_proto.IndexerNode/RunQuery", q_req.encode({})
            )
            assert entered.wait(5.0)
            c.sock.sendall(h2.pack_frame(
                h2.RST_STREAM, 0, q_sid, (8).to_bytes(4, "big")  # CANCEL
            ))
            # wait until the reader has RECORDED the cancel before letting
            # the worker finish, then release it
            conn = h2_server.tcp.last_connection
            deadline = _time.monotonic() + 5
            while _time.monotonic() < deadline and (
                q_sid not in conn.reset_streams
            ):
                _time.sleep(0.02)
            assert q_sid in conn.reset_streams
            gate.set()
            # a full later RPC on the same connection: every frame until
            # ITS end must carry only its own sid — nothing for q_sid
            n_req = _schemas("/db3_storage_proto.StorageNode/GetNonce")[0]
            n_sid = c.send_request(
                "/db3_storage_proto.StorageNode/GetNonce",
                n_req.encode({"address": "0x" + "62" * 20}),
            )
            while True:
                ftype, flags, fsid, _ = c.recv_frame()
                if ftype in (h2.HEADERS, h2.DATA):
                    assert fsid != q_sid, "response for a cancelled stream"
                if (
                    ftype == h2.HEADERS and fsid == n_sid
                    and flags & h2.FLAG_END_STREAM
                ):
                    break
            # worker-pool bookkeeping died with its streams
            deadline = _time.monotonic() + 5
            while _time.monotonic() < deadline and (
                conn.pending_sids or conn.inflight or conn.reset_streams
            ):
                _time.sleep(0.02)
            assert conn.pending_sids == set()
            assert conn.inflight == 0
            assert conn.reset_streams == set()
        finally:
            gate.set()
            c.close()

    def test_mutations_stay_ordered_inline(self, h2_server):
        # SendMutation is NOT offloaded: two mutations pipelined on one
        # connection with consecutive nonces apply in arrival order (the
        # second would bounce on a nonce gap if reordered)
        c = H2Client(h2_server.port, timeout=30)
        try:
            priv = 0x51AC3A1E21C9DB2E863C46DA765C1E8E2E3B8F0F13B5F1B1B3D3E2C1A0998877
            nonce_req = _schemas("/db3_storage_proto.StorageNode/GetNonce")[0]
            from rtstore_spark.crypto.secp256k1 import priv_to_address

            addr = priv_to_address(priv)
            msgs, status, _ = c.call(
                "/db3_storage_proto.StorageNode/GetNonce", {"address": addr}
            )
            n0 = msgs[0].get("nonce", 1)
            send_schema = _schemas(
                "/db3_storage_proto.StorageNode/SendMutation")[0]
            sids = []
            for i in range(2):  # pipelined: both on the wire before reads
                payload, sig = wrap_and_sign(
                    encode_mutation("CreateDocumentDB", [{
                        "db_address": None, "kind": "doc_database_mutation",
                        "body": {"db_desc": f"ordered-{i}"},
                    }]),
                    n0 + i, priv,
                )
                sids.append(c.send_request(
                    "/db3_storage_proto.StorageNode/SendMutation",
                    send_schema.encode({"signature": sig, "payload": payload}),
                ))
            for sid in sids:
                _, msgs, status, message = c.read_response(sid)
                assert status == 0, message
                resp = _schemas(
                    "/db3_storage_proto.StorageNode/SendMutation")[1].decode(
                    msgs[0])
                assert resp.get("code", 0) == 0, resp
        finally:
            c.close()


class TestConcurrentDispatchBounds:
    """Review-finding pins for the round-8 worker-pool dispatch."""

    def test_pool_queue_counts_against_max_concurrent(
        self, h2_server, monkeypatch
    ):
        # streams popped off for dispatch must STILL count against
        # MAX_CONCURRENT: a client pipelining read-only unaries would
        # otherwise grow the executor queue without bound — the 9th
        # request while 8 are in flight gets RST(REFUSED_STREAM)
        import threading as _th

        from rtstore_spark.service_grpcweb import GrpcStatus, GrpcWebGateway
        from rtstore_spark.service_h2 import _Connection

        monkeypatch.setattr(_Connection, "MAX_CONCURRENT", 8)
        gate = _th.Event()
        entered = _th.Semaphore(0)

        def slow(self, req):
            entered.release()
            gate.wait(20.0)
            raise GrpcStatus(3, "bounded-done")

        monkeypatch.setattr(GrpcWebGateway, "_IndexerNode_RunQuery", slow)
        c = H2Client(h2_server.port, timeout=30)
        try:
            q_req = _schemas("/db3_indexer_proto.IndexerNode/RunQuery")[0]
            first = [
                c.send_request("/db3_indexer_proto.IndexerNode/RunQuery",
                               q_req.encode({}))
                for _ in range(8)
            ]
            for _ in range(8):  # all 8 handlers are RUNNING on the pool
                assert entered.acquire(timeout=10)
            extra = [
                c.send_request("/db3_indexer_proto.IndexerNode/RunQuery",
                               q_req.encode({}))
                for _ in range(2)
            ]
            refused = set()
            while len(refused) < 2:
                ftype, flags, fsid, payload = c.recv_frame()
                if ftype == h2.RST_STREAM:
                    assert int.from_bytes(payload, "big") == h2.REFUSED_STREAM
                    refused.add(fsid)
            assert refused == set(extra)
            gate.set()
            done = set()
            while len(done) < 8:
                ftype, flags, fsid, _ = c.recv_frame()
                if ftype == h2.HEADERS and flags & h2.FLAG_END_STREAM:
                    done.add(fsid)
            assert done == set(first)
        finally:
            gate.set()
            c.close()

    def test_truncated_response_reports_error_status(self, spark, tmp_path):
        # a worker whose flow-control window never reopens must NOT end
        # the stream with grpc-status 0 after partial DATA — the peer
        # holds a gRPC frame shorter than its length prefix
        store = DocStore(spark, str(tmp_path / "trunc"))
        node = NodeService(store, Ingest(store))
        srv = GrpcH2Server(node, io_timeout=3).start()
        try:
            c = H2Client(srv.port, initial_window=1, timeout=30)
            try:
                req = _schemas("/db3_storage_proto.StorageNode/GetNonce")[0]
                sid = c.send_request(
                    "/db3_storage_proto.StorageNode/GetNonce",
                    req.encode({"address": "0x" + "44" * 20}),
                )
                data_len = 0
                status = None
                saw_headers = False
                while status is None:
                    ftype, flags, fsid, payload = c.recv_frame()
                    if fsid != sid:
                        continue
                    if ftype == h2.DATA:
                        data_len += len(h2.strip_padding(payload, flags))
                    elif ftype == h2.HEADERS:
                        decoded = dict(c.decoder.decode(
                            h2.strip_padding(payload, flags)))
                        if saw_headers or "grpc-status" in decoded:
                            status = int(decoded.get("grpc-status", "0"))
                        saw_headers = True
                # stream window was 1 byte and never replenished: the
                # response (5-byte gRPC prefix + message) cannot fit
                assert data_len <= 1
                assert status == 13
            finally:
                c.close()
        finally:
            srv.stop()

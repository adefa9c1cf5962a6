"""Live EVM transport: ABI event decoding + the stdlib RFC 6455 websocket
client + eth_subscribe log source (sources/evm.py, sources/ws.py), tested
against an in-process socket server speaking the same wire protocol a real
node does (event_processor.rs:88-204). Zero external dependencies."""

from __future__ import annotations

import base64
import hashlib
import json
import socket
import struct
import threading

import pytest

from rtstore_spark.sources.evm import (
    decode_event_log,
    event_topic0,
    events_from_abi,
)

ERC20_TRANSFER = {
    "type": "event",
    "name": "Transfer",
    "inputs": [
        {"name": "from", "type": "address", "indexed": True},
        {"name": "to", "type": "address", "indexed": True},
        {"name": "value", "type": "uint256", "indexed": False},
    ],
}
MEMO = {
    "type": "event",
    "name": "Memo",
    "inputs": [
        {"name": "author", "type": "address", "indexed": True},
        {"name": "note", "type": "string", "indexed": False},
        {"name": "tags", "type": "uint8[]", "indexed": False},
        {"name": "ok", "type": "bool", "indexed": False},
    ],
}


def _w(x: int) -> str:
    return x.to_bytes(32, "big").hex()


class TestAbiDecoding:
    def test_transfer_topic_is_canonical(self):
        # the ERC-20 Transfer topic every block explorer displays
        assert event_topic0("Transfer", ["address", "address", "uint256"]) == (
            "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
        )

    def test_static_event(self):
        a, b = "0x" + "11" * 20, "0x" + "22" * 20
        raw = {
            "topics": [
                event_topic0("Transfer", ["address", "address", "uint256"]),
                "0x" + "00" * 12 + a[2:],
                "0x" + "00" * 12 + b[2:],
            ],
            "data": "0x" + _w(10**30),  # 256-bit-scale value
            "blockNumber": "0x10",
            "transactionHash": "0xabc",
        }
        out = decode_event_log(raw, "Transfer", ERC20_TRANSFER["inputs"])
        assert out["args"] == {"from": a, "to": b, "value": 10**30}
        assert out["block_number"] == 16 and out["tx_hash"] == "0xabc"
        assert out["types"]["value"] == "uint256"

    def test_dynamic_string_and_array(self):
        note = "hello chain"
        nb = note.encode()
        note_tail = _w(len(nb)) + nb.hex().ljust(64, "0")
        tags_tail = _w(2) + _w(7) + _w(9)
        head = _w(0x60) + _w(0x60 + len(note_tail) // 2) + _w(1)
        raw = {
            "topics": [
                event_topic0("Memo", ["address", "string", "uint8[]", "bool"]),
                "0x" + "00" * 12 + "33" * 20,
            ],
            "data": "0x" + head + note_tail + tags_tail,
            "blockNumber": 5,
        }
        out = decode_event_log(raw, "Memo", MEMO["inputs"])
        assert out["args"]["note"] == note
        assert out["args"]["tags"] == [7, 9]
        assert out["args"]["ok"] is True
        assert out["args"]["author"] == "0x" + "33" * 20

    def test_events_from_abi_lookup(self):
        table = events_from_abi([ERC20_TRANSFER, MEMO, {"type": "function"}])
        assert len(table) == 2
        name, inputs = table[
            event_topic0("Transfer", ["address", "address", "uint256"])
        ]
        assert name == "Transfer" and len(inputs) == 3


# -- server-side RFC 6455 helpers (the fake node) ---------------------------

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


def _server_handshake(conn: socket.socket) -> None:
    req = b""
    while b"\r\n\r\n" not in req:
        req += conn.recv(4096)
    key = next(
        ln.split(":", 1)[1].strip()
        for ln in req.decode("latin-1").split("\r\n")
        if ln.lower().startswith("sec-websocket-key")
    )
    accept = base64.b64encode(hashlib.sha1((key + _GUID).encode()).digest()).decode()
    conn.sendall(
        (
            "HTTP/1.1 101 Switching Protocols\r\n"
            "Upgrade: websocket\r\nConnection: Upgrade\r\n"
            f"Sec-WebSocket-Accept: {accept}\r\n\r\n"
        ).encode()
    )


def _server_recv_text(conn: socket.socket) -> str:
    def read(n):
        out = b""
        while len(out) < n:
            chunk = conn.recv(n - len(out))
            if not chunk:
                raise ConnectionError("closed")
            out += chunk
        return out

    b0, b1 = read(2)
    n = b1 & 0x7F
    if n == 126:
        (n,) = struct.unpack(">H", read(2))
    elif n == 127:
        (n,) = struct.unpack(">Q", read(8))
    mask = read(4) if b1 & 0x80 else b""
    payload = read(n)
    if mask:
        payload = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
    return payload.decode("utf-8")


def _server_send_text(conn: socket.socket, text: str) -> None:
    payload = text.encode()
    n = len(payload)
    if n < 126:
        head = bytes([0x81, n])
    else:
        head = bytes([0x81, 126]) + struct.pack(">H", n)
    conn.sendall(head + payload)


def _server_send_ping(conn: socket.socket) -> None:
    conn.sendall(bytes([0x89, 0x02]) + b"hi")


class TestWebSocketLogSource:
    @pytest.fixture()
    def fake_node(self):
        """A threaded socket server speaking websocket JSON-RPC: acks
        eth_subscribe, interleaves a ping, pushes two Transfer logs and one
        unrelated log, then holds the connection open."""
        a, b = "0x" + "aa" * 20, "0x" + "bb" * 20
        t0 = event_topic0("Transfer", ["address", "address", "uint256"])

        def log(value: int, blk: int) -> dict:
            return {
                "topics": [
                    t0,
                    "0x" + "00" * 12 + a[2:],
                    "0x" + "00" * 12 + b[2:],
                ],
                "data": "0x" + _w(value),
                "blockNumber": hex(blk),
                "transactionHash": f"0xtx{blk}",
            }

        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        port = srv.getsockname()[1]
        stop = threading.Event()

        def serve():
            try:
                conn, _addr = srv.accept()
                conn.settimeout(20)
                _server_handshake(conn)
                req = json.loads(_server_recv_text(conn))
                assert req["method"] == "eth_subscribe"
                _server_send_text(
                    conn,
                    json.dumps({"jsonrpc": "2.0", "id": req["id"], "result": "0xs1"}),
                )
                _server_send_ping(conn)  # client must pong and keep reading
                for raw in (
                    log(100, 7),
                    {"topics": ["0x" + "ee" * 32], "data": "0x"},  # unmatched
                    log(10**27, 9),
                ):
                    _server_send_text(
                        conn,
                        json.dumps(
                            {
                                "jsonrpc": "2.0",
                                "method": "eth_subscription",
                                "params": {"subscription": "0xs1", "result": raw},
                            }
                        ),
                    )
                stop.wait(20)  # hold open; client closes at max_logs
                conn.close()
            except (ConnectionError, OSError):
                pass

        t = threading.Thread(target=serve, daemon=True)
        t.start()
        yield f"ws://127.0.0.1:{port}/"
        stop.set()
        srv.close()

    def test_subscribe_decode_and_bounds(self, fake_node):
        from rtstore_spark.sources.evm import WebSocketLogSource

        src = WebSocketLogSource(
            fake_node, abi=[ERC20_TRANSFER], max_logs=2, timeout_s=10
        )
        got = list(src.logs())
        assert [g["block_number"] for g in got] == [7, 9]
        assert got[0]["args"]["value"] == 100
        assert got[1]["args"]["value"] == 10**27
        # the unmatched-topic log was filtered by keccak topic lookup
        assert all(g["event"] == "Transfer" for g in got)

    def test_event_processor_consumes_live_shape(self, fake_node, spark, tmp_path):
        """EventProcessor.process() runs unchanged on the live transport:
        decoded docs land in the event-named collection with 256-bit
        values as decimal strings."""
        from rtstore_spark.sources.evm import EventProcessor, WebSocketLogSource
        from rtstore_spark.store.docstore import DocStore

        store = DocStore(spark, str(tmp_path / "evmlive"))
        db = store.create_database(
            "0x" + "aa" * 20, nonce=1, db_type="event",
            meta={"tables": ["Transfer"]},
        )
        src = WebSocketLogSource(
            fake_node, abi=[ERC20_TRANSFER], max_logs=2, timeout_s=10
        )
        counts = EventProcessor(store, db, "0x" + "aa" * 20).process(src.logs())
        assert counts == {"Transfer": 2}
        docs = [
            json.loads(r["doc"])
            for r in store.current_state(db, "Transfer").collect()
        ]
        values = sorted(d["value"] for d in docs)
        assert values == ["100", str(10**27)]  # decimal strings, 256-bit safe


class TestAbiRoundTrip:
    """Property test: encode a random static-typed event the way a node
    would, decode it back, and require exact value equality. Pins the
    word-level decoding (sign extension, address truncation, bytesN
    alignment) against an independent encoder."""

    def test_roundtrip_static_types(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        def enc(value, typ: str) -> bytes:
            if typ == "address":
                return bytes(12) + bytes.fromhex(value[2:])
            if typ.startswith("uint"):
                return value.to_bytes(32, "big")
            if typ.startswith("int"):
                return value.to_bytes(32, "big", signed=True)
            if typ == "bool":
                return bytes(31) + bytes([int(value)])
            n = int(typ[5:])  # bytesN: right-padded
            return bytes.fromhex(value[2:]) + bytes(32 - n)

        typed_vals = st.one_of(
            st.tuples(st.just("address"),
                      st.binary(min_size=20, max_size=20).map(lambda b: "0x" + b.hex())),
            st.tuples(st.just("uint256"), st.integers(0, 2**256 - 1)),
            st.tuples(st.just("int128"), st.integers(-(2**127), 2**127 - 1)),
            st.tuples(st.just("bool"), st.booleans()),
            st.tuples(st.just("bytes8"),
                      st.binary(min_size=8, max_size=8).map(lambda b: "0x" + b.hex())),
        )

        @settings(max_examples=200, deadline=None)
        @given(st.lists(typed_vals, min_size=1, max_size=6), st.integers(0, 3))
        def check(params, n_indexed):
            types = [t for t, _ in params]
            inputs = [
                {"name": f"p{i}", "type": t, "indexed": i < n_indexed}
                for i, (t, _) in enumerate(params)
            ]
            topics = [event_topic0("E", types)] + [
                "0x" + enc(v, t).hex() for (t, v) in params[:n_indexed]
            ]
            data = b"".join(enc(v, t) for (t, v) in params[n_indexed:])
            out = decode_event_log(
                {"topics": topics, "data": "0x" + data.hex(), "blockNumber": 1},
                "E", inputs,
            )
            assert out["args"] == {f"p{i}": v for i, (_, v) in enumerate(params)}

        check()


class TestSubscribeRejected:
    @pytest.fixture()
    def rejecting_node(self):
        """A node that answers eth_subscribe with a JSON-RPC error and then
        holds the connection open (sends nothing further)."""
        srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        port = srv.getsockname()[1]
        stop = threading.Event()

        def serve():
            try:
                conn, _addr = srv.accept()
                conn.settimeout(20)
                _server_handshake(conn)
                json.loads(_server_recv_text(conn))
                _server_send_text(
                    conn,
                    json.dumps(
                        {
                            "jsonrpc": "2.0",
                            "id": 1,
                            "error": {"code": -32601, "message": "no subscriptions"},
                        }
                    ),
                )
                stop.wait(20)
                conn.close()
            except (ConnectionError, OSError):
                pass

        threading.Thread(target=serve, daemon=True).start()
        yield f"ws://127.0.0.1:{port}/"
        stop.set()
        srv.close()

    def test_rejected_subscription_raises(self, rejecting_node):
        """A subscribe error must surface as an error — silently skipping
        it reads as an idle chain and the caller tails forever."""
        from rtstore_spark.sources.evm import WebSocketLogSource
        from rtstore_spark.sources.ws import WebSocketError

        src = WebSocketLogSource(
            rejecting_node, abi=[ERC20_TRANSFER], max_logs=1, timeout_s=10
        )
        with pytest.raises(WebSocketError, match="rejected"):
            list(src.logs())

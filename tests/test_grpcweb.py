"""gRPC-Web gateway tests — the reference SDK's stock transport.

The client half of these tests speaks exactly what
``@protobuf-ts/grpcweb-transport`` (sdk/src/provider/*.ts) puts on the
wire: POST /<package>.<Service>/<Method>, body = [flags][len32][proto]
frames, binary (``application/grpc-web+proto``) or base64 text mode,
response messages + a flags-0x80 trailers frame carrying grpc-status.
"""

from __future__ import annotations

import base64
import json
import socket
import urllib.request

import pytest

from rtstore_spark.service import NodeServer, NodeService
from rtstore_spark.store import DocStore
from rtstore_spark.store.ingest import Ingest
from rtstore_spark.system import SystemStore
from rtstore_spark.wire import grpcweb
from rtstore_spark.wire.bsonlite import bson_encode
from rtstore_spark.wire.envelope import wrap_and_sign
from rtstore_spark.wire.rpc_schemas import METHODS
from rtstore_spark.wire.schemas import encode_mutation

PRIV = 0x8DA4EF21B864D2CC526DBDB2A120BD2874C36C9D0A1FB7F8C63D7F7A8B41DE8F
ADMIN = "0x" + "aa" * 20


def _schemas(path: str):
    service, method = path.strip("/").split("/")
    req, resp, streaming = METHODS[service][method]
    return req, resp, streaming


def grpc_call(port: int, path: str, msg: dict, text: bool = False):
    """One unary gRPC-Web call; returns (decoded responses, grpc-status,
    grpc-message)."""
    req_schema, resp_schema, _ = _schemas(path)
    body = grpcweb.frame(req_schema.encode(msg))
    headers = {"Content-Type": grpcweb.CT_BIN}
    if text:
        body = base64.b64encode(body)
        headers = {"Content-Type": grpcweb.CT_TEXT + "+proto"}
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=body, headers=headers,
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.status == 200  # errors ride trailers, never HTTP status
        raw = r.read()
        assert r.headers["Content-Type"].startswith(
            grpcweb.CT_TEXT if text else grpcweb.CT_BIN
        )
    if text:
        raw = base64.b64decode(raw)
    frames = grpcweb.parse_frames(raw)
    messages = [p for f, p in frames if not f & grpcweb.TRAILER_FLAG]
    trailer_frames = [p for f, p in frames if f & grpcweb.TRAILER_FLAG]
    assert len(trailer_frames) == 1, "exactly one trailers frame"
    status, message = 0, ""
    for line in trailer_frames[0].decode().split("\r\n"):
        if line.startswith("grpc-status:"):
            status = int(line.split(":", 1)[1].strip())
        elif line.startswith("grpc-message:"):
            message = line.split(":", 1)[1].strip()
    return [resp_schema.decode(m) for m in messages], status, message


def wire_send(port: int, action: str, bodies: list, nonce: int,
              priv: int = PRIV, text: bool = False):
    payload, sig = wrap_and_sign(encode_mutation(action, bodies), nonce, priv)
    msgs, status, message = grpc_call(
        port, "/db3_storage_proto.StorageNode/SendMutation",
        {"signature": sig, "payload": payload}, text=text,
    )
    assert status == 0, message
    return msgs[0]


@pytest.fixture(scope="class")
def server(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("grpcweb")
    store = DocStore(spark, str(root / "node"))
    system = SystemStore(spark, str(root / "node"), admin_addr=ADMIN)
    srv = NodeServer(NodeService(store, Ingest(store), system=system)).start()
    yield srv
    srv.stop()


class TestFraming:
    def test_frame_parse_round_trip(self):
        body = grpcweb.frame(b"abc") + grpcweb.frame(b"", 0x80)
        assert grpcweb.parse_frames(body) == [(0, b"abc"), (0x80, b"")]

    def test_truncated_frame_raises(self):
        with pytest.raises(grpcweb.GrpcWebError):
            grpcweb.parse_frames(grpcweb.frame(b"abc")[:-1])
        with pytest.raises(grpcweb.GrpcWebError):
            grpcweb.parse_frames(b"\x00\x00\x00")

    def test_trailers_text(self):
        frames = grpcweb.parse_frames(grpcweb.trailers(3, "bad thing"))
        assert frames[0][0] == 0x80
        assert b"grpc-status:3" in frames[0][1]
        assert b"bad%20thing" in frames[0][1]


class TestStockTransportLifecycle:
    """The exact call sequence a reference SDK client performs."""

    def test_full_lifecycle_binary(self, server):
        self._lifecycle(server, text=False, nonce0=1, col="books")

    def test_full_lifecycle_text_mode(self, server):
        # @protobuf-ts's DEFAULT format is "text" (base64)
        self._lifecycle(server, text=True, nonce0=100, col="papers")

    def _lifecycle(self, server, text: bool, nonce0: int, col: str):
        from rtstore_spark.crypto.secp256k1 import priv_to_address

        port = server.port
        me = priv_to_address(PRIV)

        r = wire_send(port, "CreateDocumentDB", [{
            "db_address": None, "kind": "doc_database_mutation",
            "body": {"db_desc": "grpc"},
        }], nonce=nonce0, text=text)
        assert r.get("code", 0) == 0 and r["msg"] == "ok"
        db = next(i["value"] for i in r["items"] if i["key"] == "db_addr")

        msgs, status, _ = grpc_call(
            port, "/db3_storage_proto.StorageNode/GetNonce",
            {"address": me}, text=text,
        )
        assert status == 0 and msgs[0]["nonce"] == nonce0 + 1  # NEXT nonce, used + 1

        wire_send(port, "AddCollection", [{
            "db_address": db, "kind": "collection_mutation",
            "body": {"collection_name": col, "index_fields": [
                {"path": "/year", "index_type": 2},
            ]},
        }], nonce=nonce0 + 1, text=text)
        r = wire_send(port, "AddDocument", [{
            "db_address": db, "kind": "document_mutation",
            "body": {"collection_name": col, "documents": [
                bson_encode({"t": "a", "year": 2001}),
                bson_encode({"t": "b", "year": 1999}),
            ]},
        }], nonce=nonce0 + 2, text=text)
        ids = [int(i["value"]) for i in r["items"] if i["key"] == "document"]
        assert len(ids) == 2
        # proto3 skips zero-valued fields: absent block/order mean 0
        assert (r.get("block", 0), r.get("order", 0)) > (0, 0)

        # catalog reads through the storage service
        msgs, status, _ = grpc_call(
            port, "/db3_storage_proto.StorageNode/GetDatabase",
            {"addr": db}, text=text,
        )
        assert status == 0
        doc_db = msgs[0]["database"]["doc_db"]
        assert "0x" + doc_db["address"].hex() == db
        assert "0x" + doc_db["sender"].hex() == me.lower()
        assert doc_db["desc"] == "grpc"

        msgs, _, _ = grpc_call(
            port, "/db3_storage_proto.StorageNode/GetCollectionOfDatabase",
            {"db_addr": db}, text=text,
        )
        cols = msgs[0]["collections"]
        assert [c["name"] for c in cols] == [col]
        assert cols[0]["index_fields"] == [{"path": "/year", "index_type": 2}]

        # the indexer service: RunQuery with a named parameter
        msgs, status, _ = grpc_call(
            port, "/db3_indexer_proto.IndexerNode/RunQuery",
            {"db": db, "col_name": col, "query": {
                "query_str": "/[year > :y] | asc /year",
                "parameters": [{"name": "y", "int64_value": 2000, "idx": 0}],
            }},
            text=text,
        )
        assert status == 0
        docs = [json.loads(d["doc"]) for d in msgs[0]["documents"]]
        assert docs == [{"t": "a", "year": 2001}]
        assert msgs[0]["count"] == 1

        msgs, _, _ = grpc_call(
            port, "/db3_indexer_proto.IndexerNode/GetDoc",
            {"db_addr": db, "col_name": col, "id": ids[1]}, text=text,
        )
        assert json.loads(msgs[0]["document"]["doc"]) == {"t": "b", "year": 1999}


class TestStorageReads:
    @pytest.fixture(scope="class")
    def loaded(self, server):
        port = server.port
        r = wire_send(port, "CreateDocumentDB", [{
            "db_address": None, "kind": "doc_database_mutation",
            "body": {"db_desc": "reads"},
        }], nonce=1)
        db = next(i["value"] for i in r["items"] if i["key"] == "db_addr")
        wire_send(port, "AddCollection", [{
            "db_address": db, "kind": "collection_mutation",
            "body": {"collection_name": "c"},
        }], nonce=2)
        payload, sig = wrap_and_sign(
            encode_mutation("AddDocument", [{
                "db_address": db, "kind": "document_mutation",
                "body": {"collection_name": "c",
                         "documents": [bson_encode({"v": 7})]},
            }]), 3, PRIV,
        )
        msgs, status, msg = grpc_call(
            server.port, "/db3_storage_proto.StorageNode/SendMutation",
            {"signature": sig, "payload": payload},
        )
        assert status == 0 and msgs[0].get("code", 0) == 0, msg
        return db, payload, sig, msgs[0]

    def test_get_block_returns_archived_envelope_verbatim(self, server, loaded):
        db, payload, sig, sent = loaded
        msgs, status, _ = grpc_call(
            server.port, "/db3_storage_proto.StorageNode/GetBlock",
            {"block_start": sent.get("block", 0),
             "block_end": sent.get("block", 0) + 1},
        )
        assert status == 0
        target = [
            m for m in msgs[0]["mutations"]
            if m["header"].get("order_id", 0) == sent.get("order", 0)
        ]
        assert len(target) == 1
        wrapper = target[0]
        assert wrapper["header"]["action"] == 2  # AddDocument
        assert wrapper["header"]["id"] == sent["id"]
        # wire-ingested: the body is the ORIGINAL signed envelope
        assert wrapper["body"]["payload"] == payload
        assert wrapper["body"]["signature"] == sig

    def test_get_mutation_header_and_body(self, server, loaded):
        _db, payload, sig, sent = loaded
        msgs, status, _ = grpc_call(
            server.port, "/db3_storage_proto.StorageNode/GetMutationHeader",
            {"block_id": sent.get("block", 0), "order_id": sent.get("order", 0)},
        )
        assert status == 0
        h = msgs[0]["header"]
        assert h["id"] == sent["id"] and h["action"] == 2
        assert json.loads(h["doc_ids_map"]) == [
            int(i["value"]) for i in sent["items"] if i["key"] == "document"
        ]
        msgs, status, _ = grpc_call(
            server.port, "/db3_storage_proto.StorageNode/GetMutationBody",
            {"id": sent["id"]},
        )
        assert status == 0
        assert msgs[0]["body"]["payload"] == payload
        assert msgs[0]["body"]["signature"] == sig

    def test_scan_and_state(self, server, loaded):
        msgs, status, _ = grpc_call(
            server.port, "/db3_storage_proto.StorageNode/ScanMutationHeader",
            {"start": 0, "limit": 10},
        )
        assert status == 0 and len(msgs[0]["headers"]) >= 3
        msgs, status, _ = grpc_call(
            server.port, "/db3_storage_proto.StorageNode/GetMutationState", {},
        )
        assert status == 0
        assert msgs[0]["view"]["mutation_count"] >= 3

    def test_get_database_of_owner(self, server, loaded):
        from rtstore_spark.crypto.secp256k1 import priv_to_address

        db, *_ = loaded
        msgs, status, _ = grpc_call(
            server.port, "/db3_storage_proto.StorageNode/GetDatabaseOfOwner",
            {"owner": priv_to_address(PRIV)},
        )
        assert status == 0
        addrs = {"0x" + d["doc_db"]["address"].hex() for d in msgs[0]["databases"]}
        assert db in addrs
        assert len(msgs[0]["states"]) == len(msgs[0]["databases"])


class TestErrors:
    def test_unknown_method_is_unimplemented(self, server):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/db3_storage_proto.StorageNode/NoSuch",
            data=grpcweb.frame(b""), headers={"Content-Type": grpcweb.CT_BIN},
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            frames = grpcweb.parse_frames(r.read())
        assert frames[0][0] == 0x80 and b"grpc-status:12" in frames[0][1]

    def test_malformed_body_is_invalid_argument(self, server):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/db3_storage_proto.StorageNode/GetNonce",
            data=b"\x00\x00\x00",  # truncated frame header
            headers={"Content-Type": grpcweb.CT_BIN}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            frames = grpcweb.parse_frames(r.read())
        assert b"grpc-status:3" in frames[0][1]

    def test_bad_signature_rides_the_response_code(self, server):
        # app-level rejection: SendMutationResponse{code:1}, grpc-status 0
        payload, _ = wrap_and_sign(
            encode_mutation("CreateDocumentDB", [{
                "db_address": None, "kind": "doc_database_mutation", "body": {},
            }]), 1, PRIV,
        )
        msgs, status, _ = grpc_call(
            server.port, "/db3_storage_proto.StorageNode/SendMutation",
            {"signature": "0xdeadbeef", "payload": payload},
        )
        assert status == 0
        assert msgs[0]["code"] == 1 and msgs[0]["msg"]

    def test_system_status(self, server):
        msgs, status, _ = grpc_call(
            server.port, "/db3_system_proto.System/GetSystemStatus", {},
        )
        assert status == 0
        assert msgs[0]["admin_addr"] == ADMIN


class TestSubscribeStream:
    def test_stream_frames_over_raw_socket(self, server, spark):
        port = server.port
        body = grpcweb.frame(
            METHODS["db3_storage_proto.StorageNode"]["Subscribe"][0].encode(
                {"signature": "", "payload": ""}
            )
        )
        with socket.create_connection(("127.0.0.1", port), timeout=120) as s:
            s.sendall(
                b"POST /db3_storage_proto.StorageNode/Subscribe HTTP/1.1\r\n"
                b"Host: localhost\r\n"
                + f"Content-Type: {grpcweb.CT_BIN}\r\n".encode()
                + f"Content-Length: {len(body)}\r\n\r\n".encode()
                + body
            )
            # drive two block closes through the node's own store
            store = server.httpd.RequestHandlerClass.node.store
            db = store.create_database("0x" + "ee" * 20, 1, desc="sub")
            store.create_collection(db, "c", [], "0x" + "ee" * 20, nonce=2)
            buf = b""
            s.settimeout(120)
            got = []
            import time as _t

            deadline = _t.monotonic() + 120
            emitted = 0
            while len(got) < 2 and _t.monotonic() < deadline:
                if emitted < 2:
                    store.add_docs(db, "c", [json.dumps({"i": emitted})],
                                   "0x" + "ee" * 20)
                    store.state.next_block()
                    emitted += 1
                try:
                    chunk = s.recv(65536)
                except TimeoutError:
                    continue
                if not chunk:
                    break
                buf += chunk
                got = self._block_events(buf)
        assert len(got) >= 2
        ids = [e["block_event"].get("block_id", 0) for e in got]
        assert ids == sorted(ids)

    @staticmethod
    def _block_events(buf: bytes) -> list[dict]:
        """Parse chunked-encoded grpc-web frames out of a raw HTTP buffer."""
        from rtstore_spark.wire.rpc_schemas import EVENT_MESSAGE

        if b"\r\n\r\n" not in buf:
            return []
        payload = buf.split(b"\r\n\r\n", 1)[1]
        # de-chunk
        data = b""
        while payload:
            if b"\r\n" not in payload:
                break
            size_line, rest = payload.split(b"\r\n", 1)
            try:
                size = int(size_line, 16)
            except ValueError:
                break
            if size == 0 or len(rest) < size + 2:
                break
            data += rest[:size]
            payload = rest[size + 2 :]
        events = []
        i = 0
        while i + 5 <= len(data):
            flags = data[i]
            ln = int.from_bytes(data[i + 1 : i + 5], "big")
            if i + 5 + ln > len(data):
                break
            if not flags & grpcweb.TRAILER_FLAG:
                events.append(EVENT_MESSAGE.decode(data[i + 5 : i + 5 + ln]))
            i += 5 + ln
        return events


class TestReviewRegressions:
    """Pins for the review findings on the gateway surface."""

    def test_checksummed_address_same_account(self, server):
        # EIP-55 mixed case and lowercase are ONE account: nonce lookups
        # and owner scans must agree with the lowercase recovery form
        from rtstore_spark.crypto.secp256k1 import priv_to_address

        priv = 0x2222222222222222222222222222222222222222222222222222222222222222
        me = priv_to_address(priv)
        checksummed = "0x" + "".join(
            c.upper() if i % 2 else c for i, c in enumerate(me[2:])
        )
        assert checksummed != me  # the test means something
        r = wire_send(server.port, "CreateDocumentDB", [{
            "db_address": None, "kind": "doc_database_mutation",
            "body": {"db_desc": "case"},
        }], nonce=1, priv=priv)
        db = next(i["value"] for i in r["items"] if i["key"] == "db_addr")
        msgs, status, _ = grpc_call(
            server.port, "/db3_storage_proto.StorageNode/GetNonce",
            {"address": checksummed},
        )
        assert status == 0 and msgs[0]["nonce"] == 2  # NEXT nonce after nonce-1 create
        msgs, status, _ = grpc_call(
            server.port, "/db3_storage_proto.StorageNode/GetDatabaseOfOwner",
            {"owner": checksummed},
        )
        assert status == 0
        addrs = {"0x" + d["doc_db"]["address"].hex() for d in msgs[0]["databases"]}
        assert db in addrs

    def test_run_query_over_cap_is_loud(self, server):
        gateway = server.httpd.RequestHandlerClass.node.grpcweb
        priv = 0x3333333333333333333333333333333333333333333333333333333333333333
        r = wire_send(server.port, "CreateDocumentDB", [{
            "db_address": None, "kind": "doc_database_mutation", "body": {},
        }], nonce=1, priv=priv)
        db = next(i["value"] for i in r["items"] if i["key"] == "db_addr")
        wire_send(server.port, "AddCollection", [{
            "db_address": db, "kind": "collection_mutation",
            "body": {"collection_name": "many"},
        }], nonce=2, priv=priv)
        wire_send(server.port, "AddDocument", [{
            "db_address": db, "kind": "document_mutation",
            "body": {"collection_name": "many", "documents": [
                bson_encode({"i": i}) for i in range(5)
            ]},
        }], nonce=3, priv=priv)
        gateway.RUN_QUERY_MAX_DOCS = 3  # instance override, not the class
        try:
            from rtstore_spark.service_grpcweb import GrpcStatus

            with pytest.raises(GrpcStatus) as e:
                gateway._IndexerNode_RunQuery({
                    "db": db, "col_name": "many", "query": {"query_str": "/*"},
                })
            assert e.value.code == 8  # RESOURCE_EXHAUSTED, never truncation
        finally:
            del gateway.RUN_QUERY_MAX_DOCS

    def test_mixed_positional_and_named_params_do_not_collide(self, server):
        # proto3 skips idx=0 on the wire, so a named parameter that omits
        # idx must NOT also bind positional key 0 — it would overwrite the
        # real positional #0 binding (ADVICE r6)
        priv = 0x4444444444444444444444444444444444444444444444444444444444444444
        r = wire_send(server.port, "CreateDocumentDB", [{
            "db_address": None, "kind": "doc_database_mutation", "body": {},
        }], nonce=1, priv=priv)
        db = next(i["value"] for i in r["items"] if i["key"] == "db_addr")
        wire_send(server.port, "AddCollection", [{
            "db_address": db, "kind": "collection_mutation",
            "body": {"collection_name": "mix"},
        }], nonce=2, priv=priv)
        wire_send(server.port, "AddDocument", [{
            "db_address": db, "kind": "document_mutation",
            "body": {"collection_name": "mix", "documents": [
                bson_encode({"a": 1, "b": 2}), bson_encode({"a": 2, "b": 2}),
            ]},
        }], nonce=3, priv=priv)
        msgs, status, message = grpc_call(
            server.port, "/db3_indexer_proto.IndexerNode/RunQuery",
            {"db": db, "col_name": "mix", "query": {
                "query_str": "/[a = ? and b = :y]",
                "parameters": [
                    {"int64_value": 1},              # positional #0 (idx=0 elided)
                    {"name": "y", "int64_value": 2}, # named, no idx on the wire
                ],
            }},
        )
        assert status == 0, message
        docs = [json.loads(d["doc"]) for d in msgs[0]["documents"]]
        assert docs == [{"a": 1, "b": 2}]  # #0 bound 1, not clobbered by :y

    def test_non_authz_error_mentioning_admin_is_invalid_argument(self, server):
        # status mapping is typed (ServiceError.grpc_code), never inferred
        # from the message text: an error that merely MENTIONS "admin"
        # must map to 3 INVALID_ARGUMENT, not 7 PERMISSION_DENIED
        msgs, status, message = grpc_call(
            server.port, "/db3_indexer_proto.IndexerNode/RunQuery",
            {"db": "0x" + "77" * 20, "col_name": "admin",
             "query": {"query_str": "/*"}},
        )
        assert status == 3, (status, message)

    def test_packed_overrun_rejected(self):
        from rtstore_spark.wire.protobuf import Field, Schema, WireDecodeError

        s = Schema("P", (Field(1, "v", "int64", repeated=True),))
        # declared packed length 1, but the varint needs 2 bytes
        with pytest.raises(WireDecodeError, match="overrun|truncated"):
            s.decode(b"\x0a\x01\x80\x01")


class TestCors:
    """Browser SDK clients preflight gRPC-Web POSTs — the server must
    answer OPTIONS and mark responses CORS-readable."""

    def test_preflight(self, server):
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/db3_storage_proto.StorageNode/GetNonce",
            method="OPTIONS",
            headers={
                "Origin": "http://app.example",
                "Access-Control-Request-Method": "POST",
                "Access-Control-Request-Headers": "content-type,x-grpc-web",
            },
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.status == 204
            assert r.headers["Access-Control-Allow-Origin"] == "*"
            assert "POST" in r.headers["Access-Control-Allow-Methods"]
            allow = r.headers["Access-Control-Allow-Headers"].lower()
            assert "content-type" in allow and "x-grpc-web" in allow

    def test_response_exposes_grpc_trailer_headers(self, server):
        body = grpcweb.frame(
            METHODS["db3_storage_proto.StorageNode"]["GetNonce"][0].encode(
                {"address": "0x" + "00" * 20}
            )
        )
        req = urllib.request.Request(
            f"http://127.0.0.1:{server.port}/db3_storage_proto.StorageNode/GetNonce",
            data=body, headers={"Content-Type": grpcweb.CT_BIN}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.headers["Access-Control-Allow-Origin"] == "*"
            exposed = r.headers["Access-Control-Expose-Headers"]
            assert "grpc-status" in exposed and "grpc-message" in exposed


class TestStockSetup:
    """System.Setup with the SDK's EXACT signed payload
    (generate_config_sig, sdk/src/crypto/sig_utils.ts:22-59): the 9-field
    TypedData document, signer recovered — not claimed."""

    ADMIN_PRIV = 0x5555555555555555555555555555555555555555555555555555555555555555
    OTHER_PRIV = 0x1212121212121212121212121212121212121212121212121212121212121212

    @pytest.fixture(scope="class")
    def admin_server(self, spark, tmp_path_factory):
        from rtstore_spark.crypto.secp256k1 import priv_to_address

        root = tmp_path_factory.mktemp("grpcweb_admin")
        store = DocStore(spark, str(root / "node"))
        system = SystemStore(
            spark, str(root / "node"),
            admin_addr=priv_to_address(self.ADMIN_PRIV),
        )
        srv = NodeServer(NodeService(store, Ingest(store), system=system)).start()
        yield srv
        srv.stop()

    def _signed_config(self, priv):
        from rtstore_spark.crypto.eip712 import typed_data_signing_hash
        from rtstore_spark.crypto.secp256k1 import sign

        typed = {
            "types": {
                "EIP712Domain": [],
                "Message": [
                    {"name": "rollupInterval", "type": "string"},
                    {"name": "minRollupSize", "type": "string"},
                    {"name": "networkId", "type": "string"},
                    {"name": "chainId", "type": "string"},
                    {"name": "contractAddr", "type": "address"},
                    {"name": "rollupMaxInterval", "type": "string"},
                    {"name": "evmNodeUrl", "type": "string"},
                    {"name": "arNodeUrl", "type": "string"},
                    {"name": "minGcOffset", "type": "string"},
                ],
            },
            "domain": {},
            "primaryType": "Message",
            "message": {
                "rollupInterval": "600000",
                "minRollupSize": "1048576",
                "networkId": "7",
                "chainId": "80001",
                "contractAddr": "0xb9709cE5E749b80978182db1bEdfb8c7340039A9",
                "rollupMaxInterval": "6000000",
                "evmNodeUrl": "wss://node.example/ws",
                "arNodeUrl": "https://arweave.example",
                "minGcOffset": "864000",
            },
        }
        sig = sign(typed_data_signing_hash(typed), priv)  # v already 27/28
        return json.dumps(typed), "0x" + sig.hex()

    def test_admin_setup_applies_config(self, admin_server):
        payload, sig = self._signed_config(self.ADMIN_PRIV)
        msgs, status, _ = grpc_call(
            admin_server.port, "/db3_system_proto.System/Setup",
            {"signature": sig, "payload": payload},
        )
        assert status == 0 and msgs[0].get("code", 0) == 0
        msgs, status, _ = grpc_call(
            admin_server.port, "/db3_system_proto.System/GetSystemStatus", {},
        )
        assert status == 0
        cfg = msgs[0]["config"]
        assert cfg["chain_id"] == 80001
        assert cfg["network_id"] == 7
        assert cfg["rollup_interval"] == 600000
        assert cfg["min_gc_offset"] == 864000
        assert cfg["evm_node_url"] == "wss://node.example/ws"

    def test_non_admin_signer_rejected(self, admin_server):
        payload, sig = self._signed_config(self.OTHER_PRIV)
        msgs, status, message = grpc_call(
            admin_server.port, "/db3_system_proto.System/Setup",
            {"signature": sig, "payload": payload},
        )
        # recovered signer != admin → PERMISSION_DENIED, not INTERNAL
        # (clients treat 13 as retryable; this rejection is permanent)
        assert status == 7 and "admin" in message.lower()

    def test_tampered_config_rejected(self, admin_server):
        payload, sig = self._signed_config(self.ADMIN_PRIV)
        doc = json.loads(payload)
        doc["message"]["chainId"] = "1337"  # re-point after signing
        msgs, status, message = grpc_call(
            admin_server.port, "/db3_system_proto.System/Setup",
            {"signature": sig, "payload": json.dumps(doc)},
        )
        # recovered address no longer matches the admin; never 13 INTERNAL
        assert status in (3, 7)

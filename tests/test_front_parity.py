"""Differential pin: the JSON front (service.py), the gRPC-Web gateway
(service_grpcweb.py) and — by construction — the h2c front (service_h2.py,
which dispatches through the same gateway core) must agree.

Two fresh stores receive the SAME signed wire-mutation sequence, one
through ``NodeService.dispatch`` (JSON form), one through
``GrpcWebGateway.handle_unary`` (proto form); afterwards every shared
read method must return semantically identical results, and the error
table must map consistently (JSON ``code``/``http_status`` vs gRPC
status). Hypothesis drives the mutation sequences so drift in any shared
method surfaces as a counterexample, not a hand-picked case.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from rtstore_spark.service import NodeService, ServiceError
from rtstore_spark.service_grpcweb import GrpcStatus
from rtstore_spark.store import DocStore
from rtstore_spark.store.ingest import Ingest
from rtstore_spark.system import SystemStore
from rtstore_spark.wire.bsonlite import bson_encode
from rtstore_spark.wire.envelope import wrap_and_sign
from rtstore_spark.wire.rpc_schemas import METHODS
from rtstore_spark.wire.schemas import encode_mutation

ADMIN = "0x" + "aa" * 20

# printable-keyed small JSON docs; values exercise the BSON subset
_doc_values = st.one_of(
    st.integers(min_value=-(2**31), max_value=2**31 - 1),
    st.text(max_size=12),
    st.booleans(),
)
doc_strategy = st.dictionaries(
    st.text(
        alphabet=st.characters(whitelist_categories=("Ll",), max_codepoint=122),
        min_size=1, max_size=6,
    ),
    _doc_values, min_size=1, max_size=4,
)

op_strategy = st.one_of(
    st.tuples(st.just("add"), st.lists(doc_strategy, min_size=1, max_size=3)),
    st.tuples(st.just("update"), doc_strategy),
    st.tuples(st.just("delete"), st.just(None)),
)


def _proto(gateway, service: str, method: str, msg: dict) -> dict:
    req, resp, _ = METHODS[service][method]
    return resp.decode(gateway.handle_unary(
        f"/{service}/{method}", req.encode(msg)
    ))


class _Front:
    """One store + both dispatch forms bound to it."""

    def __init__(self, spark, root: str):
        store = DocStore(spark, root)
        system = SystemStore(spark, root, admin_addr=ADMIN)
        self.node = NodeService(store, Ingest(store), system=system)
        self.gateway = self.node.grpcweb


@pytest.fixture(scope="module")
def fronts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("parity")
    return (
        _Front(spark, str(base / "json_node")),
        _Front(spark, str(base / "web_node")),
    )


@pytest.fixture(scope="module")
def h2_port(fronts):
    """Raw gRPC/h2c server over the SAME node as the gateway arm — the
    third front differs only in framing (HTTP/2 + HPACK + gRPC frames),
    so socket answers must equal direct gateway answers exactly."""
    from rtstore_spark.service_h2 import GrpcH2Server

    srv = GrpcH2Server(fronts[1].node).start()
    yield srv.port
    srv.stop()


def _h2(port: int, service: str, method: str, msg: dict) -> dict:
    from test_h2 import H2Client

    c = H2Client(port, timeout=60)
    try:
        msgs, status, message = c.call(f"/{service}/{method}", msg)
        assert status == 0, message
        return msgs[0]
    finally:
        c.close()


class _Seq:
    """Per-example unique signer so module-scoped stores never clash."""

    n = 0


def _send_both(fronts, action, bodies, nonce, priv):
    payload, sig = wrap_and_sign(encode_mutation(action, bodies), nonce, priv)
    text = payload.decode("utf-8") if isinstance(payload, bytes) else payload
    jf, wf = fronts
    j = jf.node.dispatch("storage", "SendMutation", {
        "payload": text, "signature": sig,
    })
    w = _proto(wf.gateway, "db3_storage_proto.StorageNode", "SendMutation", {
        "payload": payload, "signature": sig,
    })
    # same id, same (block, order), same returned items
    assert j["id"] == w["id"]
    assert (j["block"], j["order"]) == (w.get("block", 0), w.get("order", 0))
    j_items = [(i["key"], str(i["value"])) for i in j.get("items", [])]
    w_items = [(i["key"], str(i["value"])) for i in w.get("items", [])]
    assert j_items == w_items
    return j


class TestFrontParity:
    @given(ops=st.lists(op_strategy, min_size=1, max_size=5),
           q_field=st.text(
               alphabet=st.characters(whitelist_categories=("Ll",),
                                      max_codepoint=122),
               min_size=1, max_size=6))
    @settings(max_examples=6, deadline=None,
              suppress_health_check=list(HealthCheck))
    def test_same_sequence_same_answers(self, fronts, h2_port, ops, q_field):
        from rtstore_spark.crypto.secp256k1 import priv_to_address

        _Seq.n += 1
        priv = 0xA000 + _Seq.n  # unique signer per example
        me = priv_to_address(priv)
        jf, wf = fronts

        nonce = 1
        r = _send_both(fronts, "CreateDocumentDB", [{
            "db_address": None, "kind": "doc_database_mutation",
            "body": {"db_desc": f"parity-{_Seq.n}"},
        }], nonce, priv)
        db = next(i["value"] for i in r["items"] if i["key"] == "db_addr")
        nonce += 1
        _send_both(fronts, "AddCollection", [{
            "db_address": db, "kind": "collection_mutation",
            "body": {"collection_name": "c"},
        }], nonce, priv)
        nonce += 1

        live_ids: list[int] = []
        for kind, arg in ops:
            if kind == "add":
                r = _send_both(fronts, "AddDocument", [{
                    "db_address": db, "kind": "document_mutation",
                    "body": {"collection_name": "c",
                             "documents": [bson_encode(d) for d in arg]},
                }], nonce, priv)
                live_ids += [
                    int(i["value"]) for i in r["items"] if i["key"] == "document"
                ]
            elif kind == "update" and live_ids:
                _send_both(fronts, "UpdateDocument", [{
                    "db_address": db, "kind": "document_mutation",
                    "body": {"collection_name": "c",
                             "documents": [bson_encode(arg)],
                             "ids": [live_ids[0]],
                             "masks": [{"fields": sorted(arg)}]},
                }], nonce, priv)
            elif kind == "delete" and live_ids:
                _send_both(fronts, "DeleteDocument", [{
                    "db_address": db, "kind": "document_mutation",
                    "body": {"collection_name": "c",
                             "ids": [live_ids.pop(0)]},
                }], nonce, priv)
            else:
                continue  # update/delete before any add: skip, no nonce spent
            nonce += 1

        # ---- every shared read agrees ------------------------------------
        jn = jf.node.dispatch("storage", "GetNonce", {"address": me})["nonce"]
        wn = _proto(wf.gateway, "db3_storage_proto.StorageNode", "GetNonce",
                    {"address": me}).get("nonce", 0)
        assert jn == wn == nonce

        jdb = jf.node.dispatch("storage", "GetDatabase", {"addr": db})["database"]
        wdb = _proto(wf.gateway, "db3_storage_proto.StorageNode", "GetDatabase",
                     {"addr": db})["database"]["doc_db"]
        assert "0x" + wdb["address"].hex() == jdb["db_addr"] == db
        assert wdb["desc"] == jdb["desc"]

        jown = {d["db_addr"] for d in jf.node.dispatch(
            "storage", "GetDatabaseOfOwner", {"owner": me})["databases"]}
        wown = {"0x" + d["doc_db"]["address"].hex() for d in _proto(
            wf.gateway, "db3_storage_proto.StorageNode", "GetDatabaseOfOwner",
            {"owner": me})["databases"]}
        assert jown == wown and db in jown

        jcols = [c["col_name"] for c in jf.node.dispatch(
            "storage", "GetCollectionOfDatabase", {"db_addr": db})["collections"]]
        wcols = [c["name"] for c in _proto(
            wf.gateway, "db3_storage_proto.StorageNode",
            "GetCollectionOfDatabase", {"db_addr": db})["collections"]]
        assert jcols == wcols == ["c"]

        # full scan + a field query through BOTH query fronts
        for qs in ("/*", f"/[{q_field} != :x] | limit 50"):
            jq = jf.node.dispatch("indexer", "RunQuery", {
                "db_addr": db, "col_name": "c",
                "query": {"query_str": qs,
                          "parameters": {"x": 0} if ":x" in qs else None},
            })
            wq = _proto(wf.gateway, "db3_indexer_proto.IndexerNode", "RunQuery", {
                "db": db, "col_name": "c",
                "query": {"query_str": qs, "parameters": (
                    [{"name": "x", "int64_value": 0, "idx": 0}]
                    if ":x" in qs else []
                )},
            })
            j_docs = sorted(
                (int(d["id"]), json.dumps(d["doc"], sort_keys=True))
                for d in jq["documents"]
            )
            w_docs = sorted(
                (int(d["id"]),
                 json.dumps(json.loads(d["doc"]), sort_keys=True))
                for d in wq.get("documents", [])
            )
            assert j_docs == w_docs
            assert jq["count"] == wq.get("count", 0)

        if live_ids:
            jd = jf.node.dispatch("indexer", "GetDoc", {
                "db_addr": db, "col_name": "c", "id": live_ids[0]})["document"]
            wd = _proto(wf.gateway, "db3_indexer_proto.IndexerNode", "GetDoc", {
                "db_addr": db, "col_name": "c", "id": live_ids[0]})["document"]
            assert json.loads(wd["doc"]) == jd["doc"]
            assert int(wd["id"]) == jd["id"] == live_ids[0]

        jstate = jf.node.dispatch("storage", "GetMutationState", {})["view"]
        wstate = _proto(wf.gateway, "db3_storage_proto.StorageNode",
                        "GetMutationState", {}).get("view", {})
        assert jstate["mutation_count"] == wstate.get("mutation_count", 0)
        # the proto view names the byte total total_mutation_bytes
        assert jstate["total_storage_bytes"] == wstate.get(
            "total_mutation_bytes", 0)

        # ---- third arm: the SAME reads over a real h2c socket ------------
        # the h2c front shares the gateway core, so any difference here is
        # a FRAMING bug (HTTP/2, HPACK, gRPC length-prefix, trailers)
        for service, method, msg in [
            ("db3_storage_proto.StorageNode", "GetNonce", {"address": me}),
            ("db3_storage_proto.StorageNode", "GetDatabase", {"addr": db}),
            ("db3_storage_proto.StorageNode", "GetCollectionOfDatabase",
             {"db_addr": db}),
            ("db3_storage_proto.StorageNode", "GetMutationState", {}),
            ("db3_indexer_proto.IndexerNode", "RunQuery",
             {"db": db, "col_name": "c", "query": {"query_str": "/*"}}),
        ]:
            assert _h2(h2_port, service, method, msg) == \
                _proto(wf.gateway, service, method, msg), (service, method)

    def test_error_table_maps_consistently(self, fronts):
        jf, wf = fronts
        table = [
            # (json body, proto msg, method pair) → json raises ServiceError,
            # proto raises GrpcStatus with the TYPED code
            ({"db_addr": "0x" + "31" * 20, "col_name": "nope",
              "query": {"query_str": "/*"}},
             {"db": "0x" + "31" * 20, "col_name": "nope",
              "query": {"query_str": "/*"}},
             ("indexer", "RunQuery"),
             ("db3_indexer_proto.IndexerNode", "RunQuery"), 3),
            ({"db_addr": "0x" + "31" * 20, "col_name": "nope", "id": 1},
             {"db_addr": "0x" + "31" * 20, "col_name": "nope", "id": 1},
             ("indexer", "GetDoc"),
             ("db3_indexer_proto.IndexerNode", "GetDoc"), 3),
        ]
        for jbody, wmsg, (jsvc, jm), (wsvc, wm), want in table:
            with pytest.raises(ServiceError) as je:
                jf.node.dispatch(jsvc, jm, jbody)
            with pytest.raises(GrpcStatus) as we:
                _proto(wf.gateway, wsvc, wm, wmsg)
            assert we.value.code == want
            assert je.value.grpc_code == we.value.code

    def test_setup_authz_maps_to_7_on_both(self, fronts):
        jf, wf = fronts
        from rtstore_spark.crypto.eip712 import typed_data_signing_hash
        from rtstore_spark.crypto.secp256k1 import sign

        typed = {
            "types": {"EIP712Domain": [], "Message": [
                {"name": "rollupInterval", "type": "string"},
                {"name": "minRollupSize", "type": "string"},
                {"name": "networkId", "type": "string"},
                {"name": "chainId", "type": "string"},
                {"name": "contractAddr", "type": "address"},
                {"name": "rollupMaxInterval", "type": "string"},
                {"name": "evmNodeUrl", "type": "string"},
                {"name": "arNodeUrl", "type": "string"},
                {"name": "minGcOffset", "type": "string"},
            ]},
            "domain": {}, "primaryType": "Message",
            "message": {
                "rollupInterval": "600000", "minRollupSize": "1048576",
                "networkId": "7", "chainId": "80001",
                "contractAddr": "0xb9709cE5E749b80978182db1bEdfb8c7340039A9",
                "rollupMaxInterval": "6000000",
                "evmNodeUrl": "wss://x/ws", "arNodeUrl": "https://x",
                "minGcOffset": "864000",
            },
        }
        not_admin = 0x7777777777777777777777777777777777777777777777777777777777777777
        sig = "0x" + sign(typed_data_signing_hash(typed), not_admin).hex()
        payload = json.dumps(typed)
        with pytest.raises(ServiceError) as je:
            jf.node.dispatch("system", "Setup", {
                "payload": payload, "signature": sig})
        assert je.value.grpc_code == 7
        with pytest.raises(GrpcStatus) as we:
            _proto(wf.gateway, "db3_system_proto.System", "Setup", {
                "payload": payload, "signature": sig})
        assert we.value.code == 7

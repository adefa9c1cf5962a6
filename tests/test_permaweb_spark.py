"""Permaweb rollup plane end-to-end over Spark stores.

The reference's cold-start path: rollups upload to Arweave with the
Last-Rollup-Tx chain (ar_fs.rs upload_file), recovery walks the chain
and replays (ar_toolbox.rs download_and_parse_record_batch,
recover.rs:140-236). These tests run that loop against the in-process
validating gateway from test_permaweb: a wire-format chain exported,
uploaded, recovered into a fresh directory, and imported into a fresh
store that must converge to the origin; and PermawebUploader tailing a
RollupExecutor manifest with real arweave tx ids in the back-pointers.
"""

from __future__ import annotations

import glob
import os
import random
import tempfile
import threading
from http.server import ThreadingHTTPServer

import pytest

from rtstore_spark.sources.permaweb import (
    ArPermaweb,
    PermawebUploader,
    recover_permaweb_chain,
)
from rtstore_spark.sources.rollup import RollupExecutor
from rtstore_spark.sources.wire_export import export_wire_rollup
from rtstore_spark.sources.wire_import import import_wire_rollup
from rtstore_spark.store.docstore import DocStore
from rtstore_spark.store.ingest import Ingest
from rtstore_spark.wire.bsonlite import bson_encode
from rtstore_spark.wire.envelope import wrap_and_sign
from rtstore_spark.wire.schemas import encode_mutation

from test_permaweb import TEST_BITS, _GatewayHandler, _GatewayState

PRIV = 0x6370FD033278C143179D81C5526140625662B8DAA446C22EE2D73DB3707E620C
EXPORT_KEY = 0x3333333333333333333333333333333333333333333333333333333333333333
ALICE = "0x" + "aa" * 20


@pytest.fixture(scope="module")
def gateway():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _GatewayHandler)
    srv.state = _GatewayState()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


@pytest.fixture(scope="module")
def permaweb(gateway, tmp_path_factory):
    return ArPermaweb(
        f"http://127.0.0.1:{gateway.server_address[1]}",
        str(tmp_path_factory.mktemp("keys")),
        bits=TEST_BITS, rng=random.Random(0xD0C),
    )


def _send(ingest, action, bodies, nonce):
    payload, sig = wrap_and_sign(encode_mutation(action, bodies), nonce, PRIV)
    return ingest.send_wire_mutation(payload, sig)


def _docs_state(store: DocStore, db: str, col: str) -> list[tuple]:
    return sorted(
        (r["doc_id"], r["doc"], r["owner"].lower())
        for r in store.current_state(db, col).collect()
    )


class TestWireChainColdStart:
    def test_export_upload_recover_import(self, spark, permaweb, tmp_path):
        # origin: a wire-format chain across two export epochs
        origin = DocStore(spark, tempfile.mkdtemp(prefix="pw_origin_"))
        ingest = Ingest(origin)
        r = _send(ingest, "CreateDocumentDB", [{
            "db_address": None, "kind": "doc_database_mutation",
            "body": {"db_desc": "permaweb"},
        }], nonce=1)
        db = next(i["value"] for i in r["items"] if i["key"] == "db_addr")
        _send(ingest, "AddCollection", [{
            "db_address": db, "kind": "collection_mutation",
            "body": {"collection_name": "c", "index_fields": []},
        }], nonce=2)
        for i in range(2):
            _send(ingest, "AddDocument", [{
                "db_address": db, "kind": "document_mutation",
                "body": {"collection_name": "c",
                         "documents": [bson_encode({"epoch": 1, "i": i})]},
            }], nonce=3 + i)
        origin.state.next_block()
        exp1 = str(tmp_path / "exp1")
        assert export_wire_rollup(origin, exp1, priv=EXPORT_KEY) == 4
        epoch1_end = origin.state.block

        _send(ingest, "AddDocument", [{
            "db_address": db, "kind": "document_mutation",
            "body": {"collection_name": "c",
                     "documents": [bson_encode({"epoch": 2, "i": 0})]},
        }], nonce=5)
        origin.state.next_block()
        exp2 = str(tmp_path / "exp2")
        assert export_wire_rollup(
            origin, exp2, priv=EXPORT_KEY, block_start=epoch1_end
        ) == 1

        # upload both artifacts as a chained permaweb history
        tip = ""
        for i, exp in enumerate([exp1, exp2]):
            part = sorted(glob.glob(os.path.join(exp, "*.parquet")))[0]
            name = f"epoch{i + 1}.gz.parquet"
            tip, _ = permaweb.upload_file(
                part, last_ar_tx=tip, start_block=0, end_block=0,
                network_id=1, filename=name,
            )

        # fresh node cold-starts from the chain tip alone
        dest = str(tmp_path / "cold")
        files = recover_permaweb_chain(permaweb, tip, dest)
        assert [os.path.basename(f) for f in files] == [
            "epoch1.gz.parquet", "epoch2.gz.parquet"
        ]
        replica = DocStore(spark, tempfile.mkdtemp(prefix="pw_replica_"))
        report = import_wire_rollup(replica, spark.read.parquet(dest))
        assert report["errors"] == 0
        assert report["mutations"] == 5
        assert _docs_state(replica, db, "c") == _docs_state(origin, db, "c")


class TestPermawebUploader:
    def test_tails_manifest_with_real_tx_chain(self, spark, permaweb,
                                               tmp_path, gateway):
        root = str(tmp_path / "node")
        store = DocStore(spark, root)
        db = store.create_database(ALICE, nonce=1)
        store.create_collection(db, "c", [], ALICE)
        store.state.next_block()
        store.add_docs(db, "c", ['{"v": 1}', '{"v": 2}'], ALICE)
        store.state.next_block()

        ex = RollupExecutor(spark, root)
        row1 = ex.rollup(store.mutation_log(), open_block=store.state.block)
        assert row1 is not None

        up = PermawebUploader(ex, permaweb, network=1)
        recs = up.upload_pending()
        assert len(recs) == 1
        tags1 = permaweb.get_tx_tags(recs[0]["ar_tx_id"])
        assert tags1["Start-Block"] == str(row1["start_block"])
        assert tags1["End-Block"] == str(row1["end_block"])
        assert "Last-Rollup-Tx" not in tags1  # chain genesis

        # idempotent: nothing new → nothing uploaded
        assert up.upload_pending() == []

        # a second round chains to the FIRST ROUND'S REAL arweave tx id
        store.add_docs(db, "c", ['{"v": 3}'], ALICE)
        store.state.next_block()
        row2 = ex.rollup(store.mutation_log(), open_block=store.state.block)
        recs2 = up.upload_pending()
        assert len(recs2) == 1
        tags2 = permaweb.get_tx_tags(recs2[0]["ar_tx_id"])
        assert tags2["Last-Rollup-Tx"] == recs[0]["ar_tx_id"]
        assert up.tip() == recs2[0]["ar_tx_id"]

        # recovery from the tip gets both artifacts, byte-equal to local
        dest = str(tmp_path / "recovered")
        files = recover_permaweb_chain(permaweb, up.tip(), dest)
        assert len(files) == 2
        for rec, got in zip(recs + recs2, files):
            name = f"{rec['start_block']}_{rec['end_block']}.gz.parquet"
            local_dir = os.path.join(ex.rollup_dir, name)
            local_part = sorted(
                f for f in glob.glob(os.path.join(local_dir, "*.parquet"))
            )[0]
            with open(local_part, "rb") as a, open(got, "rb") as b:
                assert a.read() == b.read()

        # ScanRollupRecord surfaces the REAL permaweb tx ids newest-first
        # (RollupRecord.arweave_tx, db3_rollup.proto:35): a follower reads
        # the newest record's arweave_tx as the tip for PermawebWireTail
        scanned = ex.scan_rollup_records().collect()
        assert [r["arweave_tx"] for r in scanned] == [
            recs2[0]["ar_tx_id"], recs[0]["ar_tx_id"]
        ]
        assert scanned[0]["arweave_tx"] == up.tip()

        # the recovered parquet is readable rollup data (5-col schema)
        recovered = spark.read.parquet(dest)
        assert recovered.count() == row1["rows"] + row2["rows"]
        assert set(recovered.columns) == {
            "payload", "signature", "block", "order", "doc_ids"
        }


class TestPermawebWireTail:
    def test_cold_start_then_tail(self, spark, permaweb, tmp_path):
        from rtstore_spark.sources.permaweb import PermawebWireTail

        # origin publishes epoch 1 to the permaweb
        origin = DocStore(spark, tempfile.mkdtemp(prefix="pwt_origin_"))
        ingest = Ingest(origin)
        r = _send(ingest, "CreateDocumentDB", [{
            "db_address": None, "kind": "doc_database_mutation",
            "body": {"db_desc": "tail"},
        }], nonce=1)
        db = next(i["value"] for i in r["items"] if i["key"] == "db_addr")
        _send(ingest, "AddCollection", [{
            "db_address": db, "kind": "collection_mutation",
            "body": {"collection_name": "c", "index_fields": []},
        }], nonce=2)
        _send(ingest, "AddDocument", [{
            "db_address": db, "kind": "document_mutation",
            "body": {"collection_name": "c",
                     "documents": [bson_encode({"epoch": 1})]},
        }], nonce=3)
        origin.state.next_block()
        exp1 = str(tmp_path / "t-exp1")
        assert export_wire_rollup(origin, exp1, priv=EXPORT_KEY) == 3
        epoch1_end = origin.state.block
        part1 = sorted(glob.glob(os.path.join(exp1, "*.parquet")))[0]
        tip1, _ = permaweb.upload_file(
            part1, last_ar_tx="", start_block=0, end_block=epoch1_end,
            network_id=1, filename="t-epoch1.gz.parquet",
        )

        # replica cold-starts from tip1
        replica = DocStore(spark, tempfile.mkdtemp(prefix="pwt_replica_"))
        tail = PermawebWireTail(spark, replica, permaweb,
                                watch_dir=str(tmp_path / "t-watch"))
        rep1 = tail.poll(tip1)
        assert rep1["mutations"] == 3
        assert _docs_state(replica, db, "c") == _docs_state(origin, db, "c")

        # origin advances the chain mid-stream
        _send(ingest, "AddDocument", [{
            "db_address": db, "kind": "document_mutation",
            "body": {"collection_name": "c",
                     "documents": [bson_encode({"epoch": 2})]},
        }], nonce=4)
        origin.state.next_block()
        exp2 = str(tmp_path / "t-exp2")
        assert export_wire_rollup(
            origin, exp2, priv=EXPORT_KEY, block_start=epoch1_end
        ) == 1
        part2 = sorted(glob.glob(os.path.join(exp2, "*.parquet")))[0]
        tip2, _ = permaweb.upload_file(
            part2, last_ar_tx=tip1, start_block=epoch1_end,
            end_block=origin.state.block, network_id=1,
            filename="t-epoch2.gz.parquet",
        )

        # the tail imports ONLY the new artifact and converges
        rep2 = tail.poll(tip2)
        assert rep2["mutations"] == 1
        assert _docs_state(replica, db, "c") == _docs_state(origin, db, "c")

        # quiet poll at the same tip: nothing downloads, nothing imports
        rep3 = tail.poll(tip2)
        assert rep3.get("mutations", 0) == 0


GOLDEN = "/root/reference/src/node/resources/test/37829_37968.gz.parquet"


class TestGoldenArtifactThroughPermaweb:
    def test_reference_artifact_full_permaweb_loop(self, spark, permaweb,
                                                   tmp_path):
        """The reference node's own checked-in rollup artifact (204 wire
        mutations, blocks 37829-37968) goes through the ENTIRE permaweb
        plane: uploaded as a signed Arweave tx (chunk merkle validated
        by the gateway), recovered by the verified chain walk, and
        replayed into a fresh store — 69 databases / 69 collections at
        their original foreign addresses, exactly like the wire-import
        golden gate."""
        if not os.path.exists(GOLDEN):
            pytest.skip("reference artifact not present")
        tx_id, _ = permaweb.upload_file(
            GOLDEN, last_ar_tx="", start_block=37829, end_block=37968,
            network_id=1, filename="37829_37968.gz.parquet",
        )
        assert permaweb.get_tx_status(tx_id) is not None  # fully chunked
        dest = str(tmp_path / "golden-cold")
        files = recover_permaweb_chain(permaweb, tx_id, dest)
        assert [os.path.basename(f) for f in files] == [
            "37829_37968.gz.parquet"
        ]
        with open(GOLDEN, "rb") as a, open(files[0], "rb") as b:
            assert a.read() == b.read()  # byte-identical after the loop
        store = DocStore(spark, tempfile.mkdtemp(prefix="pw_golden_"))
        report = import_wire_rollup(store, spark.read.parquet(dest))
        assert report["mutations"] == 204
        assert report["errors"] == 0
        assert store.databases().count() == 69


class TestUploaderWithMetaStore:
    def test_rounds_register_on_chain(self, spark, permaweb, tmp_path):
        from test_meta_store import CHAIN_ID, GAS_PRICE, _EthHandler, _EthState

        from rtstore_spark.crypto.secp256k1 import priv_to_address
        from rtstore_spark.sources.meta_store_client import (
            MetaStoreClient,
            selector,
        )

        eth = ThreadingHTTPServer(("127.0.0.1", 0), _EthHandler)
        eth.state = _EthState()
        threading.Thread(target=eth.serve_forever, daemon=True).start()
        try:
            root = str(tmp_path / "msnode")
            store = DocStore(spark, root)
            db = store.create_database(ALICE, nonce=1)
            store.create_collection(db, "c", [], ALICE)
            store.state.next_block()
            store.add_docs(db, "c", ['{"v": 1}'], ALICE)
            store.state.next_block()

            ex = RollupExecutor(spark, root)
            assert ex.rollup(
                store.mutation_log(), open_block=store.state.block
            ) is not None

            node_key = 0x1212121212121212121212121212121212121212121212121212121212121212
            contract = "0x" + "d3" * 20
            ms = MetaStoreClient(
                f"http://127.0.0.1:{eth.server_address[1]}",
                contract, node_key, receipt_poll_s=0.01,
            )
            up = PermawebUploader(ex, permaweb, network=9, meta_store=ms)
            recs = up.upload_pending()
            assert len(recs) == 1
            assert recs[0]["evm_tx"].startswith("0x")
            assert recs[0]["evm_cost"] == 52000 * GAS_PRICE

            # the on-chain call carries THIS round's arweave tx as bytes32
            sent = eth.state.txs[recs[0]["evm_tx"]]
            assert sent["sender"] == priv_to_address(node_key).lower()
            assert sent["to"] == contract
            data = sent["data"]
            assert data[:4] == selector("updateRollupSteps(uint256,bytes32)")
            assert data[4:36] == (9).to_bytes(32, "big")
            from rtstore_spark.crypto.rsa import b64url_decode
            assert data[36:68] == b64url_decode(recs[0]["ar_tx_id"])

            # ScanRollupRecord surfaces the registration (fields 10/11)
            scanned = ex.scan_rollup_records().collect()
            assert scanned[0]["evm_tx"] == recs[0]["evm_tx"]
            assert scanned[0]["evm_cost"] == recs[0]["evm_cost"]
            assert scanned[0]["arweave_tx"] == recs[0]["ar_tx_id"]
        finally:
            eth.shutdown()
            eth.server_close()


class TestOnChainMintLoop:
    def test_create_database_on_chain_mints_in_store(self, spark, tmp_path):
        """The write side meets the existing event source: our client
        sends createDocDatabase as a signed EVM transaction, the node
        emits the CreateDatabase event, decode_event_log +
        MetaStoreEventProcessor mint the database at its ON-CHAIN
        address in a DocStore — the reference's S8 Mint path driven
        end-to-end from our own registrar."""
        from test_meta_store import _EthHandler, _EthState

        from rtstore_spark.crypto.secp256k1 import priv_to_address
        from rtstore_spark.sources.evm import (
            MetaStoreEventProcessor,
            decode_event_log,
        )
        from rtstore_spark.sources.meta_store_client import MetaStoreClient

        eth = ThreadingHTTPServer(("127.0.0.1", 0), _EthHandler)
        eth.state = _EthState()
        threading.Thread(target=eth.serve_forever, daemon=True).start()
        try:
            key = 0x7A7A7A7A7A7A7A7A7A7A7A7A7A7A7A7A7A7A7A7A7A7A7A7A7A7A7A7A7A7A7A7A
            ms = MetaStoreClient(
                f"http://127.0.0.1:{eth.server_address[1]}",
                "0x" + "c0" * 20, key, receipt_poll_s=0.01,
            )
            ms.create_database(network=2, desc="chain-born")
            raw_logs = ms.rpc.call("eth_getLogs", [{}])
            inputs = [
                {"name": "sender", "type": "address", "indexed": True},
                {"name": "networkId", "type": "uint256"},
                {"name": "databaseAddress", "type": "address"},
                {"name": "desc", "type": "bytes32"},
            ]
            events = []
            for rl in raw_logs:
                ev = decode_event_log(rl, "CreateDatabase", inputs)
                args = ev["args"]
                events.append({"event": "CreateDatabase", "args": {
                    "sender": args["sender"],
                    "databaseAddress": args["databaseAddress"],
                    "description": bytes.fromhex(
                        args["desc"][2:] if isinstance(args["desc"], str)
                        else args["desc"].hex()
                    ).rstrip(b"\x00").decode(),
                }})
            store = DocStore(spark, tempfile.mkdtemp(prefix="chainmint_"))
            counts = MetaStoreEventProcessor(store).process(events)
            assert counts["CreateDatabase"] == 1
            dbs = store.databases().collect()
            on_chain_addr = events[0]["args"]["databaseAddress"]
            assert any(r["db_addr"] == on_chain_addr for r in dbs)
            row = next(r for r in dbs if r["db_addr"] == on_chain_addr)
            assert row["desc"] == "chain-born"
            assert row["sender"].lower() == priv_to_address(key).lower()
        finally:
            eth.shutdown()
            eth.server_close()

"""System control plane: Setup / GetSystemStatus / GetContractSyncStatus."""

from __future__ import annotations

import json

import pytest

from rtstore_spark.sources.evm import EventProcessor
from rtstore_spark.store.docstore import DocStore
from rtstore_spark.store.ingest import digest_signature
from rtstore_spark.system import SetupError, SystemStore, contract_sync_status

ADMIN = "0xadmin"
MALLORY = "0xmallory"


def _signed(payload: dict, sender: str) -> tuple[str, str]:
    text = json.dumps(payload, sort_keys=True)
    return text, digest_signature(text, 0, sender)


GOOD = {
    "chainId": 80001,
    "contractAddr": "0xb9709cE5E749b80978182db1bEdfb8c7340039A9",
    "evmNodeUrl": "wss://polygon-mumbai.example/ws",
    "arNodeUrl": "https://arweave.example",
    "networkId": 1,
    "rollupInterval": 60000,
}


class TestSetup:
    def test_setup_persists_config_and_versions(self, spark, tmp_path):
        sysstore = SystemStore(spark, str(tmp_path), ADMIN)
        payload, sig = _signed(GOOD, ADMIN)
        assert sysstore.setup(payload, sig, ADMIN) == (0, "ok")
        cfg = sysstore.config()
        assert cfg["version"] == 1
        assert cfg["chain_id"] == 80001
        assert cfg["rollup_interval"] == 60000
        # unspecified fields take the reference defaults (system_impl.rs)
        assert cfg["rollup_max_interval"] == 24 * 60 * 60 * 1000
        assert cfg["min_rollup_size"] == 1024 * 1024

        # a second setup bumps the version, latest wins
        payload2, sig2 = _signed({**GOOD, "rollupInterval": 5}, ADMIN)
        sysstore.setup(payload2, sig2, ADMIN)
        cfg2 = sysstore.config()
        assert cfg2["version"] == 2
        assert cfg2["rollup_interval"] == 5

    def test_setup_rejects_non_admin(self, spark, tmp_path):
        sysstore = SystemStore(spark, str(tmp_path), ADMIN)
        payload, sig = _signed(GOOD, MALLORY)
        with pytest.raises(SetupError, match="not the admin"):
            sysstore.setup(payload, sig, MALLORY)

    def test_setup_rejects_bad_signature(self, spark, tmp_path):
        sysstore = SystemStore(spark, str(tmp_path), ADMIN)
        payload, _ = _signed(GOOD, ADMIN)
        with pytest.raises(SetupError, match="invalid signature"):
            sysstore.setup(payload, "deadbeef", ADMIN)

    @pytest.mark.parametrize(
        "patch,msg",
        [
            ({"chainId": 0}, "invalid chain id"),
            ({"contractAddr": ""}, "contract address is empty"),
            ({"evmNodeUrl": ""}, "evm node rpc is empty"),
            ({"evmNodeUrl": "https://rpc.example"}, "websocket"),
            ({"arNodeUrl": ""}, "ar node rpc is empty"),
        ],
    )
    def test_setup_validation(self, spark, tmp_path, patch, msg):
        sysstore = SystemStore(spark, str(tmp_path), ADMIN)
        payload, sig = _signed({**GOOD, **patch}, ADMIN)
        with pytest.raises(SetupError, match=msg):
            sysstore.setup(payload, sig, ADMIN)

    def test_system_status(self, spark, tmp_path):
        sysstore = SystemStore(
            spark, str(tmp_path), ADMIN, node_url="http://node:26619"
        )
        st = sysstore.get_system_status()
        assert st["has_inited"] is False and st["config"] is None
        payload, sig = _signed(GOOD, ADMIN)
        sysstore.setup(payload, sig, ADMIN)
        st = sysstore.get_system_status()
        assert st["has_inited"] is True
        assert st["admin_addr"] == ADMIN
        assert st["node_url"] == "http://node:26619"
        assert st["config"]["contract_addr"] == GOOD["contractAddr"]


class TestContractSyncStatus:
    def test_high_water_marks_from_event_docs(self, spark, tmp_path):
        store = DocStore(spark, str(tmp_path / "w"))
        meta = {
            "contract_address": "0xC0FFEE",
            "evm_node_url": "wss://node/ws",
            "tables": ["Transfer"],
        }
        db = store.create_database(
            ADMIN, nonce=1, db_type="event", meta=meta
        )  # M5 creates one collection per event table from meta["tables"]
        proc = EventProcessor(store, db, ADMIN)
        proc.process(
            [
                {"event": "Transfer", "block_number": 100,
                 "args": {"value": 1}, "types": {"value": "uint256"}},
                {"event": "Transfer", "block_number": 134,
                 "args": {"value": 2}, "types": {"value": "uint256"}},
                {"event": "Transfer", "block_number": 129,
                 "args": {"value": 3}, "types": {"value": "uint256"}},
            ]
        )
        # a doc database must NOT appear in the status list
        store.create_database(ADMIN, nonce=2)

        status = contract_sync_status(store)
        assert len(status) == 1
        s = status[0]
        assert s["addr"] == "0xC0FFEE"
        assert s["evm_node_url"] == "wss://node/ws"
        assert s["block_number"] == 134
        assert s["event_number"] == 3

    def test_event_ttl_enforcement(self, spark, tmp_path):
        from rtstore_spark.sources.evm import enforce_event_ttl

        store = DocStore(spark, str(tmp_path / "wttl"))
        db = store.create_database(
            ADMIN, nonce=1, db_type="event",
            meta={"contract_address": "0xC", "tables": ["Transfer"], "ttl": 50},
        )
        proc = EventProcessor(store, db, ADMIN)
        proc.process(
            [
                {"event": "Transfer", "block_number": bn,
                 "args": {"value": bn}, "types": {"value": "uint256"}}
                for bn in (10, 40, 60, 100)
            ]
        )
        # high water = 100, ttl = 50 -> blocks <= 50 expire (10, 40)
        counts = enforce_event_ttl(store)
        assert sum(counts.values()) == 2
        remaining = store.current_state(db, "Transfer").collect()
        vals = sorted(
            int(json.loads(r["doc"])["value"]) for r in remaining
        )
        assert vals == [60, 100]
        # idempotent: nothing further to expire at the same high water
        assert enforce_event_ttl(store) == {}
        # a ttl=0 database is never touched
        db2 = store.create_database(
            ADMIN, nonce=2, db_type="event",
            meta={"contract_address": "0xD", "tables": ["T"], "ttl": 0},
        )
        proc2 = EventProcessor(store, db2, ADMIN)
        proc2.process(
            [{"event": "T", "block_number": 1, "args": {}, "types": {}}]
        )
        counts = enforce_event_ttl(store, now_block=10_000)
        assert not any(k.startswith(db2) for k in counts)  # ttl=0 untouched
        # while the ttl=50 db correctly expired its remaining docs
        assert store.current_state(db, "Transfer").count() == 0

    def test_empty_event_db(self, spark, tmp_path):
        store = DocStore(spark, str(tmp_path / "w2"))
        store.create_database(
            ADMIN, nonce=1, db_type="event",
            meta={"contract_address": "0xB", "evm_node_url": "wss://b"},
        )
        status = contract_sync_status(store)
        assert status == [
            {"addr": "0xB", "evm_node_url": "wss://b",
             "block_number": 0, "event_number": 0}
        ]

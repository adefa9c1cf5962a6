"""Streaming ingest + MetaStore processor + mutation-state tests."""

from __future__ import annotations

import json

import pytest

from rtstore_spark.sources.evm import JsonlLogSource, MetaStoreEventProcessor
from rtstore_spark.store import DocStore
from rtstore_spark.store.ingest import Ingest, digest_signature
from rtstore_spark.streaming.ingest_stream import StreamingIngest

ALICE = "0x" + "aa" * 20


def envelope(payload: dict, sender: str, nonce: int) -> dict:
    body = json.dumps(payload, sort_keys=True)
    return {
        "payload": body,
        "signature": digest_signature(body, nonce, sender),
        "sender": sender,
        "nonce": nonce,
    }


class TestStreamingIngest:
    def test_staged_envelopes_applied_per_block(self, spark, tmp_path):
        store = DocStore(spark, str(tmp_path / "w"))
        ing = Ingest(store)
        si = StreamingIngest(spark, ing, str(tmp_path / "staging"))

        batch1 = [
            envelope({"action": "create_database", "body": {"desc": "d"}}, ALICE, 1),
        ]
        (tmp_path / "staging" / "b1.jsonl").write_text(
            "\n".join(json.dumps(e) for e in batch1)
        )
        si.start(once=True)

        db = store.databases().collect()[0]["db_addr"]
        batch2 = [
            envelope(
                {"action": "add_collection", "db_addr": db, "col_name": "c", "body": {}},
                ALICE, 2,
            ),
            envelope(
                {"action": "add_document", "db_addr": db, "col_name": "c",
                 "body": {"docs": ['{"v": 1}', '{"v": 2}']}},
                ALICE, 3,
            ),
            # bad signature: must be rejected without failing the batch
            {"payload": json.dumps({"action": "create_database", "body": {}}),
             "signature": "bogus", "sender": ALICE, "nonce": 4},
        ]
        (tmp_path / "staging" / "b2.jsonl").write_text(
            "\n".join(json.dumps(e) for e in batch2)
        )
        si.start(once=True)

        assert store.current_state(db, "c").count() == 2
        assert len(si.rejected) == 1 and "bad signature" in si.rejected[0][1]
        # block advanced once per micro-batch
        assert store.state.block >= 2
        st = store.mutation_state()
        assert st["mutation_count"] == 3 and st["total_storage_bytes"] > 0


class TestMetaStore:
    def test_mint_from_registry_events(self, spark, tmp_path):
        store = DocStore(spark, str(tmp_path / "w"))
        fixture = tmp_path / "meta.jsonl"
        db_addr = "0x" + "cc" * 20
        fixture.write_text(
            "\n".join(
                json.dumps(x)
                for x in [
                    {"event": "CreateDatabase", "block_number": 1,
                     "args": {"sender": ALICE, "databaseAddress": db_addr,
                              "description": "minted"}},
                    {"event": "CreateCollection", "block_number": 2,
                     "args": {"databaseAddress": db_addr, "name": "tbl",
                              "sender": ALICE}},
                ]
            )
        )
        proc = MetaStoreEventProcessor(store)
        counts = proc.process(JsonlLogSource(str(fixture)))
        assert counts == {"CreateDatabase": 1, "CreateCollection": 1}
        # minted at the on-chain address, owned by the on-chain sender
        rows = store.databases().collect()
        assert rows[0]["db_addr"] == db_addr and rows[0]["sender"] == ALICE
        assert [c["col_name"] for c in store.collections(db_addr).collect()] == ["tbl"]

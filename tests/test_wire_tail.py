"""Streaming tail-import of a growing foreign wire chain (WireTailImport).

The reference indexer cold-starts from the permaweb then tails new rollup
artifacts (recover.rs:140-236, indexer_impl.rs:110-142). These tests pin
the streaming half: wire-format parquet files appended between triggers
import incrementally, replica state converges to a one-shot import, and
replays after a checkpoint loss are no-ops (``already_applied`` dedup).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile

import pytest

from rtstore_spark.sources.wire_export import export_wire_rollup
from rtstore_spark.sources.wire_import import WireTailImport, import_wire_rollup
from rtstore_spark.store.docstore import DocStore
from rtstore_spark.store.ingest import Ingest
from rtstore_spark.wire.bsonlite import bson_encode
from rtstore_spark.wire.envelope import wrap_and_sign
from rtstore_spark.wire.schemas import encode_mutation

PRIV = 0x6370FD033278C143179D81C5526140625662B8DAA446C22EE2D73DB3707E620C
EXPORT_KEY = 0x2222222222222222222222222222222222222222222222222222222222222222


def fresh_store(spark) -> DocStore:
    return DocStore(spark, tempfile.mkdtemp(prefix="wiretail_"))


def _send(ingest, action, bodies, nonce):
    payload, sig = wrap_and_sign(encode_mutation(action, bodies), nonce, PRIV)
    return ingest.send_wire_mutation(payload, sig)


def _copy_parts(src_dir: str, dst_dir: str, prefix: str) -> int:
    os.makedirs(dst_dir, exist_ok=True)
    n = 0
    for p in glob.glob(os.path.join(src_dir, "*.parquet")):
        shutil.copy(p, os.path.join(dst_dir, f"{prefix}-{os.path.basename(p)}"))
        n += 1
    assert n > 0
    return n


def _docs_state(store: DocStore, db: str, col: str) -> list[tuple]:
    return sorted(
        (r["doc_id"], r["doc"], r["owner"].lower())
        for r in store.current_state(db, col).collect()
    )


class TestWireTailImport:
    def test_incremental_tail_converges_and_dedups(self, spark, tmp_path):
        origin = fresh_store(spark)
        ingest = Ingest(origin)

        # epoch 1: create db + collection + 2 docs
        r = _send(ingest, "CreateDocumentDB", [{
            "db_address": None, "kind": "doc_database_mutation",
            "body": {"db_desc": "tail"},
        }], nonce=1)
        db = next(i["value"] for i in r["items"] if i["key"] == "db_addr")
        _send(ingest, "AddCollection", [{
            "db_address": db, "kind": "collection_mutation",
            "body": {"collection_name": "c"},
        }], nonce=2)
        for i in range(2):
            _send(ingest, "AddDocument", [{
                "db_address": db, "kind": "document_mutation",
                "body": {"collection_name": "c",
                         "documents": [bson_encode({"epoch": 1, "i": i})]},
            }], nonce=3 + i)
        origin.state.next_block()  # close the epoch-1 block
        epoch1_end = origin.state.block  # epoch 2 starts here

        exp1 = str(tmp_path / "exp1")
        n1 = export_wire_rollup(origin, exp1, priv=EXPORT_KEY,
                                block_start=0, block_end=epoch1_end)
        assert n1 == 4

        watch = str(tmp_path / "chain")
        _copy_parts(exp1, watch, "epoch1")

        replica = fresh_store(spark)
        tail = WireTailImport(spark, replica, watch)
        rep1 = tail.run_once()
        assert rep1["mutations"] == 4
        assert rep1.get("errors", 0) == 0
        assert _docs_state(replica, db, "c") == _docs_state(origin, db, "c")

        # epoch 2 appended mid-stream: two more docs, exported as a second
        # artifact file in the SAME watch directory
        for i in range(2):
            _send(ingest, "AddDocument", [{
                "db_address": db, "kind": "document_mutation",
                "body": {"collection_name": "c",
                         "documents": [bson_encode({"epoch": 2, "i": i})]},
            }], nonce=5 + i)
        exp2 = str(tmp_path / "exp2")
        n2 = export_wire_rollup(origin, exp2, priv=EXPORT_KEY,
                                block_start=epoch1_end)
        assert n2 == 2
        _copy_parts(exp2, watch, "epoch2")

        rep2 = tail.run_once()
        assert rep2["mutations"] == 2  # ONLY the new file's rows
        assert _docs_state(replica, db, "c") == _docs_state(origin, db, "c")

        # quiet trigger: nothing new → zero-work report, state unchanged
        rep3 = tail.run_once()
        assert rep3.get("mutations", 0) == 0

        # bounded bookkeeping: a long-lived tail loop keeps ONE running
        # totals dict, not a per-batch report list that grows forever
        assert tail.totals["mutations"] == 6
        assert not hasattr(tail, "reports")
        before = _docs_state(replica, db, "c")

        # checkpoint loss: every file is re-offered; already_applied /
        # nonce-watermark dedup must make the replay a full no-op
        shutil.rmtree(tail.checkpoint)
        rep4 = WireTailImport(spark, replica, watch).run_once()
        assert rep4.get("errors", 0) == 0
        assert rep4.get("already_applied", 0) >= 2  # the control ops
        assert _docs_state(replica, db, "c") == before

        # convergence: the incremental tail equals a one-shot import of
        # the whole chain into a fresh store
        oneshot = fresh_store(spark)
        report = import_wire_rollup(
            oneshot, spark.read.parquet(watch + "/*.parquet")
        )
        assert report["errors"] == 0
        assert _docs_state(oneshot, db, "c") == _docs_state(replica, db, "c")

        # documents carry the original client as owner through the tail
        owners = {o for _, _, o in _docs_state(replica, db, "c")}
        from rtstore_spark.crypto.secp256k1 import priv_to_address

        assert owners == {priv_to_address(PRIV).lower()}
        docs = [json.loads(d) for _, d, _ in _docs_state(replica, db, "c")]
        assert sorted((x["epoch"], x["i"]) for x in docs) == [
            (1, 0), (1, 1), (2, 0), (2, 1),
        ]

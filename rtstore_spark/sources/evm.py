"""EVM event-log source — EventDatabase ingestion (S7/S8, M5).

The reference subscribes to an EVM node over WebSocket, ABI-decodes each log
against the database's ``events_json_abi``, converts Solidity values to JSON,
and appends a document to the collection named after the event
(event_processor.rs:88-204). Type mapping (event_processor.rs:217-236):

    address      → hex string
    uint*/int*   → DECIMAL STRING (survives 256-bit values)
    bytes        → hex string
    bool         → bool
    array/tuple  → JSON array

No web3 client exists in this container, so the transport is pluggable: the
default ``JsonlLogSource`` replays a JSON-lines fixture of raw logs — the
same replayable-log strategy the reference's own tests would need. A live
implementation only has to yield the same dict shape.
"""

from __future__ import annotations

import json
from collections.abc import Iterable, Iterator

from rtstore_spark.store.docstore import DocStore


def solidity_to_json(value, sol_type: str):
    """Convert one decoded Solidity value per the reference's mapping."""
    if sol_type.endswith("]"):  # array type, e.g. uint256[]
        inner = sol_type[: sol_type.rindex("[")]
        return [solidity_to_json(v, inner) for v in value]
    if sol_type == "address":
        return value.lower() if isinstance(value, str) else "0x" + value.hex()
    if sol_type.startswith(("uint", "int")):
        return str(int(value))  # decimal string — 256-bit safe
    if sol_type.startswith("bytes"):
        return value if isinstance(value, str) else "0x" + value.hex()
    if sol_type == "bool":
        return bool(value)
    if sol_type == "tuple":
        return list(value)
    return value


class JsonlLogSource:
    """Replayable raw-log source: one JSON object per line, shaped like
    ``{"event": name, "block_number": n, "tx_hash": h, "args": {f: v},
    "types": {f: solidity_type}}``."""

    def __init__(self, path: str, from_block: int = 0):
        self.path = path
        self.from_block = from_block

    def logs(self) -> Iterator[dict]:
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                log = json.loads(line)
                if log.get("block_number", 0) >= self.from_block:
                    yield log


class MetaStoreEventProcessor:
    """S8: tail the MetaStore contract's registry events and mint databases/
    collections at their on-chain addresses (meta_store_event_processor.rs:
    327-460, :90-155, :257-326 → the M7 Mint path).

    Expected log shapes (same JSONL transport as EventProcessor):
      {"event": "CreateDatabase",  "args": {"sender": addr, "databaseAddress": addr, "description": s}}
      {"event": "CreateCollection","args": {"databaseAddress": addr, "name": s}}
    """

    def __init__(self, store: DocStore, network_sender: str = "0xmetastore"):
        self.store = store
        self.network_sender = network_sender
        self._nonce = 0

    def process(self, source: Iterable[dict] | JsonlLogSource) -> dict[str, int]:
        logs = source.logs() if isinstance(source, JsonlLogSource) else source
        counts = {"CreateDatabase": 0, "CreateCollection": 0}
        for log in logs:
            args = log.get("args", {})
            if log["event"] == "CreateDatabase":
                self._nonce += 1
                self.store.create_database(
                    args.get("sender", self.network_sender), self._nonce,
                    desc=args.get("description", ""),
                    db_addr=args["databaseAddress"],
                )
                counts["CreateDatabase"] += 1
            elif log["event"] == "CreateCollection":
                self.store.create_collection(
                    args["databaseAddress"], args["name"], [],
                    args.get("sender", self.network_sender),
                )
                counts["CreateCollection"] += 1
        return counts


def enforce_event_ttl(store: DocStore, now_block: int | None = None) -> dict[str, int]:
    """Retention for event databases — the enforcement the reference only
    declares (EventDatabase.ttl, db3_database_v2.proto:33-42; stored at
    db_store_v2.rs:944 but never applied).

    ``ttl`` is measured in chain blocks: with high-water mark ``H`` (the max
    applied ``block_number``, or ``now_block`` when given), every doc whose
    ``block_number <= H - ttl`` is expired. Expiry is a set-wise tombstone
    append per collection — the merge-on-read state window then hides the
    rows, and compact() reclaims the storage. Deterministic given
    ``now_block``, so replicas running the job at the same cadence converge.

    Returns {"db_addr/col": expired_count} for every touched collection.
    """
    from pyspark.sql import functions as F

    counts: dict[str, int] = {}
    for db in store.databases_latest():
        if db["db_type"] != "event":
            continue
        meta = json.loads(db["meta"]) if db.get("meta") else {}
        ttl = int(meta.get("ttl", 0) or 0)
        if ttl <= 0:
            continue
        for c in store.collections(db["db_addr"]).collect():
            col = c["col_name"]
            state = store.current_state(db["db_addr"], col).withColumn(
                "_bn", F.get_json_object("doc", "$.block_number").cast("long")
            )
            hw = (
                now_block
                if now_block is not None
                else (
                    state.agg(F.max("_bn").alias("m")).collect()[0]["m"] or 0
                )
            )
            cutoff = hw - ttl
            if cutoff < 0:
                continue
            expired = state.filter(F.col("_bn") <= cutoff)
            block, order = store.state.next_order()
            tombstones = expired.select(
                "doc_id",
                "owner",
                F.lit(None).cast("string").alias("doc"),
                F.lit("D").alias("op"),
                F.lit(block).cast("long").alias("block"),
                F.lit(order).cast("int").alias("order"),
            ).persist()
            n = tombstones.count()
            if n:
                from rtstore_spark.store.docstore import DOC_IDS_PER_BUCKET

                tombstones.withColumn(
                    "doc_bucket", F.expr(f"doc_id div {DOC_IDS_PER_BUCKET}")
                ).coalesce(1).write.mode("append").partitionBy(
                    "doc_bucket"
                ).parquet(store._data_path(db["db_addr"], col))
                counts[f"{db['db_addr']}/{col}"] = n
            tombstones.unpersist()
    return counts


class EventProcessor:
    """Tail a log source and append decoded docs to per-event collections.

    The target EventDatabase must exist with one collection per event table
    (created by M5 CreateEventDB). Docs carry the block/tx provenance the
    reference includes, so event queries can filter by chain position.
    """

    def __init__(self, store: DocStore, db_addr: str, sender: str):
        self.store = store
        self.db_addr = db_addr
        self.sender = sender

    def decode(self, log: dict) -> str:
        types = log.get("types", {})
        doc = {
            f: solidity_to_json(v, types.get(f, "string"))
            for f, v in log.get("args", {}).items()
        }
        doc["block_number"] = int(log.get("block_number", 0))
        doc["tx_hash"] = log.get("tx_hash", "")
        return json.dumps(doc, sort_keys=True)

    def process(self, source: Iterable[dict] | JsonlLogSource) -> dict[str, int]:
        """Apply all logs; returns per-event-collection insert counts."""
        logs = source.logs() if isinstance(source, JsonlLogSource) else source
        by_event: dict[str, list[str]] = {}
        for log in logs:
            by_event.setdefault(log["event"], []).append(self.decode(log))
        counts = {}
        known = {
            r["col_name"] for r in self.store.collections(self.db_addr).collect()
        }
        for event, docs in by_event.items():
            if event not in known:
                # reference creates event tables from the ABI at CreateEventDB
                # time (db_store_v2.rs:918-979); unseen events are skipped
                continue
            self.store.add_docs(self.db_addr, event, docs, self.sender)
            counts[event] = len(docs)
        return counts

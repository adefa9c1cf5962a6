"""Translate decoded wire mutations into this engine's payload forms.

Two consumers:

- the LIVE path — ``Ingest.send_wire_mutation`` turns each BodyWrapper
  into the dict payload ``Ingest._apply`` dispatches on (the JSON
  stand-in for the protobuf Mutation);
- the IMPORT path — ``sources/wire_import.py`` turns each BodyWrapper
  into mutation-log fields for the set-wise replayer.

The action/body pairing mirrors the reference node's dispatch
(storage_node_light_impl.rs SendMutation match arms); UpdateDocument's
mask semantics follow db3_mutation_v2.proto:61-67 — masked fields come
from the document, masked-but-absent fields are DELETED — which maps
exactly onto an RFC-7386 merge patch (absent → null → delete).
"""

from __future__ import annotations

import json

from rtstore_spark.wire.bsonlite import bson_decode

# wire MutationAction name → this engine's log/ingest action string
WIRE_TO_ENGINE_ACTION = {
    "CreateDocumentDB": "create_doc_db",
    "AddCollection": "add_collection",
    "AddDocument": "add_document",
    "DeleteDocument": "delete_document",
    "UpdateDocument": "update_document",
    "CreateEventDB": "create_event_db",
    "MintDocumentDB": "create_doc_db",  # create at the minted address
    "MintCollection": "add_collection",
    "AddIndex": "add_index",
    "DeleteEventDB": "delete_event_db",
}

# db3_database_v2.proto:84-89
INDEX_TYPE_NAMES = {0: "unique", 1: "string", 2: "int64", 3: "double"}


def wire_indexes(index_fields: list[dict]) -> list[dict]:
    return [
        {
            "path": i.get("path", ""),
            "type": INDEX_TYPE_NAMES.get(i.get("index_type", 0), "string"),
        }
        for i in index_fields
    ]


def masks_to_patches(documents: list[dict], masks: list[dict]) -> list[str]:
    """UpdateDocument → RFC-7386 merge patches, one per document.

    With a mask: {field: doc[field]} for present fields, null (= delete)
    for masked-but-absent fields. Without a mask the whole document is
    the patch (fields not mentioned stay — the conservative reading; a
    full replace is not expressible as a merge patch without the prior
    state).
    """
    out = []
    for i, doc in enumerate(documents):
        mask = masks[i].get("fields", []) if i < len(masks) else []
        if mask:
            patch = {f: doc.get(f) for f in mask}
        else:
            patch = doc
        out.append(json.dumps(patch, sort_keys=True))
    return out


def _decoded_docs(body: dict) -> list[dict]:
    return [bson_decode(d) for d in body.get("documents", [])]


def body_to_log_fields(action: str, body_entry: dict) -> dict:
    """One BodyWrapper → flat import fields.

    Returns {action, db_addr, col_name, docs, wire_ids, patches, indexes,
    desc, meta}; unused members are None. ``action`` is the wire name
    (caller maps via WIRE_TO_ENGINE_ACTION so Mint variants can carry
    their explicit address)."""
    kind = body_entry["kind"]
    body = body_entry["body"]
    out = {
        "db_addr": body_entry.get("db_address"),
        "col_name": None, "docs": None, "wire_ids": None, "patches": None,
        "indexes": None, "desc": None, "meta": None,
    }
    if kind == "document_mutation":
        out["col_name"] = body.get("collection_name")
        docs = _decoded_docs(body)
        ids = [int(i) for i in body.get("ids", [])]
        out["wire_ids"] = ids or None
        if action == "AddDocument":
            out["docs"] = [json.dumps(d, sort_keys=True) for d in docs]
        elif action == "UpdateDocument":
            out["patches"] = masks_to_patches(docs, body.get("masks", []))
        # DeleteDocument carries only ids
    elif kind == "collection_mutation":
        out["col_name"] = body.get("collection_name")
        out["indexes"] = json.dumps(wire_indexes(body.get("index_fields", [])))
    elif kind == "doc_database_mutation":
        out["desc"] = body.get("db_desc", "")
    elif kind == "event_database_mutation":
        out["desc"] = body.get("desc", "")
        out["meta"] = json.dumps({
            "contract_address": body.get("contract_address", ""),
            "ttl": int(body.get("ttl", 0)),
            "tables": [
                t.get("collection_name", "")
                for t in body.get("tables", [])
            ],
            "events_json_abi": body.get("events_json_abi", ""),
            "evm_node_url": body.get("evm_node_url", ""),
            "start_block": int(body.get("start_block", 0)),
        }, sort_keys=True)
    elif kind == "mint_doc_database_mutation":
        out["db_addr"] = body.get("db_addr") or out["db_addr"]
        out["desc"] = body.get("desc", "")
        out["meta"] = json.dumps({
            "mint_signature": body.get("signature", ""),
            "mint_tx": body.get("tx", ""),
            "mint_sender": body.get("sender", ""),
        }, sort_keys=True)
    elif kind == "mint_collection_mutation":
        out["db_addr"] = body.get("db_addr") or out["db_addr"]
        out["col_name"] = body.get("name")
        out["indexes"] = json.dumps([])
    elif kind == "add_index_mutation":
        out["col_name"] = body.get("collection_name")
        out["indexes"] = json.dumps(wire_indexes(body.get("index_fields", [])))
    elif kind == "delete_event_database_mutation":
        pass  # only the wrapper's db_address matters
    else:  # pragma: no cover - schemas.py already constrains kinds
        raise ValueError(f"unknown body kind {kind}")
    return out


INDEX_TYPE_NUMBERS = {v: k for k, v in INDEX_TYPE_NAMES.items()}


def log_row_to_wire(action: str, payload: dict, db_addr: str | None,
                    col_name: str | None, doc_ids: list[int] | None) -> tuple[str, dict]:
    """One of this engine's mutation-log rows → (wire action, BodyWrapper).

    The inverse of :func:`body_to_log_fields`, used by the rollup export
    (sources/wire_export.py). Creates are exported as Mint mutations —
    the only wire form carrying an explicit address + owner
    (db3_mutation_v2.proto:42-48) — because a re-attested envelope
    cannot reproduce the original signer-keyed DbId derivation."""
    from rtstore_spark.wire.bsonlite import bson_encode

    if action in ("create_doc_db", "create_event_db"):
        desc = payload.get("desc") or ""
        owner = payload.get("owner")  # export threads the original owner
        if action == "create_event_db":
            meta = payload.get("meta") or {}
            body = {
                "contract_address": meta.get("contract_address", ""),
                "ttl": int(meta.get("ttl") or 0),
                "desc": desc,
                "tables": [
                    {"collection_name": t} for t in meta.get("tables", [])
                ],
                "events_json_abi": meta.get("events_json_abi", ""),
                "evm_node_url": meta.get("evm_node_url", ""),
                "start_block": int(meta.get("start_block") or 0),
            }
            body = {k: v for k, v in body.items() if v not in ("", 0, [])}
            return "CreateEventDB", {
                "db_address": None, "kind": "event_database_mutation",
                "body": body,
            }
        if db_addr:
            # a re-attested envelope cannot reproduce the original
            # DbId derivation (it hashes the SIGNER's address + nonce,
            # id.rs:169-183), so an exported create always ships as Mint —
            # the one wire form carrying an explicit address and owner
            body = {"db_addr": db_addr, "desc": desc}
            if owner:
                body["sender"] = owner  # MintDocumentDatabaseMutation.sender
            return "MintDocumentDB", {
                "db_address": None, "kind": "mint_doc_database_mutation",
                "body": body,
            }
        return "CreateDocumentDB", {
            "db_address": None, "kind": "doc_database_mutation",
            "body": {"db_desc": desc} if desc else {},
        }
    if action in ("add_collection", "add_index"):
        fields = [
            {"path": i.get("path", ""),
             "index_type": INDEX_TYPE_NUMBERS.get(i.get("type"), 1)}
            for i in payload.get("indexes", [])
        ]
        fields = [{k: v for k, v in f.items() if v} for f in fields]
        if action == "add_index":
            return "AddIndex", {
                "db_address": db_addr, "kind": "add_index_mutation",
                "body": {"collection_name": col_name, "index_fields": fields},
            }
        body = {"collection_name": col_name}
        if fields:
            body["index_fields"] = fields
        return "AddCollection", {
            "db_address": db_addr, "kind": "collection_mutation", "body": body,
        }
    if action == "add_document":
        return "AddDocument", {
            "db_address": db_addr, "kind": "document_mutation",
            "body": {
                "collection_name": col_name,
                "documents": [
                    bson_encode(json.loads(d)) for d in payload.get("docs", [])
                ],
                **({"ids": list(doc_ids)} if doc_ids else {}),
            },
        }
    if action == "update_document":
        docs, masks = [], []
        for p in payload.get("patches", []):
            patch = json.loads(p)
            # RFC-7386 → mask form: every patch key is masked; null means
            # delete, i.e. masked-but-absent in the wire document
            docs.append(bson_encode(
                {k: v for k, v in patch.items() if v is not None}
            ))
            masks.append({"fields": sorted(patch)})
        return "UpdateDocument", {
            "db_address": db_addr, "kind": "document_mutation",
            "body": {
                "collection_name": col_name, "documents": docs,
                "ids": list(doc_ids or []), "masks": masks,
            },
        }
    if action == "delete_document":
        return "DeleteDocument", {
            "db_address": db_addr, "kind": "document_mutation",
            "body": {"collection_name": col_name, "ids": list(doc_ids or [])},
        }
    raise ValueError(f"log action {action!r} has no wire form")


def body_to_ingest_payload(action: str, body_entry: dict) -> dict:
    """One BodyWrapper → the dict payload ``Ingest._apply`` dispatches on.

    Only the actions the live write path accepts (send_mutation's
    contract) are translatable; control-plane extras (event dbs, mints,
    indexes) go through the client/system surface instead."""
    f = body_to_log_fields(action, body_entry)
    if action == "CreateDocumentDB":
        return {"action": "create_database",
                "body": {"desc": f["desc"] or "", "db_type": "doc"}}
    if action == "AddCollection":
        return {
            "action": "add_collection", "db_addr": f["db_addr"],
            "col_name": f["col_name"],
            "body": {"indexes": json.loads(f["indexes"] or "[]")},
        }
    if action == "AddDocument":
        return {
            "action": "add_document", "db_addr": f["db_addr"],
            "col_name": f["col_name"], "body": {"docs": f["docs"] or []},
        }
    if action == "UpdateDocument":
        return {
            "action": "update_document", "db_addr": f["db_addr"],
            "col_name": f["col_name"],
            "body": {"ids": f["wire_ids"] or [], "patches": f["patches"] or []},
        }
    if action == "DeleteDocument":
        return {
            "action": "delete_document", "db_addr": f["db_addr"],
            "col_name": f["col_name"], "body": {"ids": f["wire_ids"] or []},
        }
    raise ValueError(f"action {action} has no live-ingest translation")

"""Message schemas for the reference's mutation wire format.

Hand-built :class:`~rtstore_spark.wire.protobuf.Schema` descriptors for
``db3_mutation_v2.proto`` (src/proto/proto/db3_mutation_v2.proto:25-138)
plus the ``Index`` type it references (db3_database_v2.proto:91-94).

Two ``Mutation.BodyWrapper`` field numberings exist in the wild:

- **v2** — the proto file as checked in today
  (db3_mutation_v2.proto:122-138): db_address=1 and the body oneof at
  2..9 (collection=2, document=3, event_db=4, doc_db=5, mint_doc_db=6,
  mint_collection=7, add_index=8, delete_event_db=9).
- **legacy** — the numbering observed in the reference node's own
  checked-in rollup artifact (src/node/resources/test/
  37829_37968.gz.parquet, blocks 37829-37968): the body oneof starts at
  1 (collection=1, document=2, doc_db=4) and db_address sits at 5 as a
  20-byte bytes field. Earlier proto revisions numbered the wrapper this
  way; the artifact predates the current file.

``decode_mutation(raw, layout="auto")`` tries v2 first and falls back to
legacy. Ambiguity is resolved by a semantic check the node itself
implies: every BodyWrapper's oneof member must be the body type its
``action`` dispatches on (mutation_utils.rs maps each MutationAction to
exactly one body variant), and a present db_address must be 20 bytes
(DB3Address). Bytes that decode under both numberings but pair
CreateDocumentDB with an event-db body, say, are rejected for that
layout — in practice exactly one layout survives.
"""

from __future__ import annotations

from rtstore_spark.wire.protobuf import Field, Schema, WireDecodeError

# --- MutationAction (db3_mutation_v2.proto:103-114) -----------------------

ACTION_NAMES = {
    0: "CreateDocumentDB",
    1: "AddCollection",
    2: "AddDocument",
    3: "DeleteDocument",
    4: "UpdateDocument",
    5: "CreateEventDB",
    6: "MintDocumentDB",
    7: "MintCollection",
    8: "AddIndex",
    9: "DeleteEventDB",
}
ACTION_NUMBERS = {v: k for k, v in ACTION_NAMES.items()}

# the body oneof member each action must carry (mutation dispatch in
# storage_node_light_impl.rs / mutation_utils.rs pairs them 1:1)
ACTION_BODY_KIND = {
    "CreateDocumentDB": "doc_database_mutation",
    "AddCollection": "collection_mutation",
    "AddDocument": "document_mutation",
    "DeleteDocument": "document_mutation",
    "UpdateDocument": "document_mutation",
    "CreateEventDB": "event_database_mutation",
    "MintDocumentDB": "mint_doc_database_mutation",
    "MintCollection": "mint_collection_mutation",
    "AddIndex": "add_index_mutation",
    "DeleteEventDB": "delete_event_database_mutation",
}

# --- leaf messages ---------------------------------------------------------

INDEX = Schema("Index", (
    Field(1, "path", "string"),
    Field(2, "index_type", "enum"),
))

COLLECTION_MUTATION = Schema("CollectionMutation", (
    Field(1, "index_fields", "message", message=INDEX, repeated=True),
    Field(2, "collection_name", "string"),
))

DOCUMENT_MASK = Schema("DocumentMask", (
    Field(1, "fields", "string", repeated=True),
))

DOCUMENT_MUTATION = Schema("DocumentMutation", (
    Field(1, "collection_name", "string"),
    Field(2, "documents", "bytes", repeated=True),
    Field(3, "ids", "int64", repeated=True),
    Field(4, "masks", "message", message=DOCUMENT_MASK, repeated=True),
))

DOCUMENT_DATABASE_MUTATION = Schema("DocumentDatabaseMutation", (
    Field(1, "db_desc", "string"),
))

EVENT_DATABASE_MUTATION = Schema("EventDatabaseMutation", (
    Field(1, "contract_address", "string"),
    Field(2, "ttl", "uint64"),
    Field(3, "desc", "string"),
    Field(4, "tables", "message", message=COLLECTION_MUTATION, repeated=True),
    Field(5, "events_json_abi", "string"),
    Field(6, "evm_node_url", "string"),
    Field(7, "start_block", "uint64"),
))

MINT_COLLECTION_MUTATION = Schema("MintCollectionMutation", (
    Field(1, "signature", "string"),
    Field(2, "tx", "string"),
    Field(3, "db_addr", "string"),
    Field(4, "name", "string"),
    Field(5, "sender", "string"),
))

MINT_DOCUMENT_DATABASE_MUTATION = Schema("MintDocumentDatabaseMutation", (
    Field(1, "signature", "string"),
    Field(2, "tx", "string"),
    Field(3, "db_addr", "string"),
    Field(5, "desc", "string"),
    Field(6, "sender", "string"),
))

DELETE_EVENT_DATABASE_MUTATION = Schema("DeleteEventDatabaseMutation", ())

ADD_INDEX_MUTATION = Schema("AddIndexMutation", (
    Field(1, "collection_name", "string"),
    Field(2, "index_fields", "message", message=INDEX, repeated=True),
))

# --- BodyWrapper in both numberings ---------------------------------------

_BODY_MEMBERS = (
    ("collection_mutation", COLLECTION_MUTATION),
    ("document_mutation", DOCUMENT_MUTATION),
    ("event_database_mutation", EVENT_DATABASE_MUTATION),
    ("doc_database_mutation", DOCUMENT_DATABASE_MUTATION),
    ("mint_doc_database_mutation", MINT_DOCUMENT_DATABASE_MUTATION),
    ("mint_collection_mutation", MINT_COLLECTION_MUTATION),
    ("add_index_mutation", ADD_INDEX_MUTATION),
    ("delete_event_database_mutation", DELETE_EVENT_DATABASE_MUTATION),
)
BODY_KINDS = frozenset(name for name, _ in _BODY_MEMBERS)

BODY_WRAPPER_V2 = Schema("BodyWrapper", (
    Field(1, "db_address", "bytes"),
    *(Field(i + 2, name, "message", message=schema, oneof="body")
      for i, (name, schema) in enumerate(_BODY_MEMBERS)),
))

# legacy: oneof first (collection=1, document=2, event_db=3 inferred,
# doc_db=4 observed), db_address trailing at 5
BODY_WRAPPER_LEGACY = Schema("BodyWrapper", (
    Field(1, "collection_mutation", "message", message=COLLECTION_MUTATION, oneof="body"),
    Field(2, "document_mutation", "message", message=DOCUMENT_MUTATION, oneof="body"),
    Field(3, "event_database_mutation", "message", message=EVENT_DATABASE_MUTATION, oneof="body"),
    Field(4, "doc_database_mutation", "message", message=DOCUMENT_DATABASE_MUTATION, oneof="body"),
    Field(5, "db_address", "bytes"),
))

MUTATION_V2 = Schema("Mutation", (
    Field(1, "action", "enum"),
    Field(3, "bodies", "message", message=BODY_WRAPPER_V2, repeated=True),
))

MUTATION_LEGACY = Schema("Mutation", (
    Field(1, "action", "enum"),
    Field(3, "bodies", "message", message=BODY_WRAPPER_LEGACY, repeated=True),
))

# --- normalized decode ------------------------------------------------------


def _normalize(raw_msg: dict, layout: str) -> dict:
    """Validate a decoded Mutation and normalize to
    {action, bodies: [{db_address, kind, body}], layout}."""
    action_num = raw_msg.get("action", 0)
    action = ACTION_NAMES.get(action_num)
    if action is None:
        raise WireDecodeError(f"unknown MutationAction {action_num}")
    want_kind = ACTION_BODY_KIND[action]
    bodies = []
    for w in raw_msg.get("bodies", []):
        addr = w.get("db_address")
        if addr is not None and len(addr) != 20:
            raise WireDecodeError(
                f"db_address is {len(addr)} bytes, expected 20"
            )
        present = [k for k in w if k in BODY_KINDS]
        if len(present) != 1:
            raise WireDecodeError(
                f"BodyWrapper carries {len(present)} body members, expected 1"
            )
        kind = present[0]
        if kind != want_kind:
            raise WireDecodeError(
                f"action {action} paired with body {kind}, expected {want_kind}"
            )
        bodies.append({
            "db_address": "0x" + addr.hex() if addr is not None else None,
            "kind": kind,
            "body": w[kind],
        })
    return {"action": action, "bodies": bodies, "layout": layout}


def decode_mutation(raw: bytes, layout: str = "auto") -> dict:
    """Decode protobuf Mutation bytes under the requested layout.

    ``auto`` tries the current proto numbering first, then the legacy
    artifact numbering; each candidate must both parse strictly AND pass
    the action↔body consistency check before it is accepted.
    """
    if layout == "v2":
        return _normalize(MUTATION_V2.decode(raw), "v2")
    if layout == "legacy":
        return _normalize(MUTATION_LEGACY.decode(raw), "legacy")
    if layout != "auto":
        raise ValueError(f"unknown layout {layout!r}")
    try:
        return _normalize(MUTATION_V2.decode(raw), "v2")
    except WireDecodeError as v2_err:
        try:
            return _normalize(MUTATION_LEGACY.decode(raw), "legacy")
        except WireDecodeError as legacy_err:
            raise WireDecodeError(
                f"undecodable under either layout (v2: {v2_err}; "
                f"legacy: {legacy_err})"
            ) from legacy_err


def encode_mutation(action: str, bodies: list[dict], layout: str = "v2") -> bytes:
    """Encode a normalized mutation back to wire bytes.

    ``bodies`` entries are {db_address: '0x…'|None, kind, body} as
    produced by :func:`decode_mutation`. The default writes the CURRENT
    proto numbering — what a stock reference node compiled from today's
    proto files parses.
    """
    schema = MUTATION_V2 if layout == "v2" else MUTATION_LEGACY
    want_kind = ACTION_BODY_KIND[action]
    wrapped = []
    for b in bodies:
        if b["kind"] != want_kind:
            raise ValueError(f"action {action} cannot carry body {b['kind']}")
        w: dict = {b["kind"]: b["body"]}
        addr = b.get("db_address")
        if addr:
            w["db_address"] = bytes.fromhex(addr.removeprefix("0x"))
        wrapped.append(w)
    msg: dict = {"bodies": wrapped}
    num = ACTION_NUMBERS[action]
    if num:
        msg["action"] = num
    return schema.encode(msg)

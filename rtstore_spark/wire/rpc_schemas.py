"""Message schemas for the reference's RPC services.

Hand-built descriptors for the request/response messages of the three
gRPC services the reference exposes — StorageNode
(src/proto/proto/db3_storage.proto:170-186), IndexerNode
(db3_indexer.proto:57-66) and System (db3_system.proto:19-22) — plus the
db3_database_v2 / db3_base / db3_rollup types they embed. Together with
the gRPC-Web framing (wire/grpcweb.py) these give the stdlib HTTP server
the exact wire surface the reference's TS SDK speaks
(`@protobuf-ts/grpcweb-transport`, sdk/src/provider/*.ts — gRPC-Web over
HTTP/1.1, NOT raw gRPC/HTTP-2).

``METHODS`` maps "package.Service" → method → (request schema, response
schema, server_streaming).
"""

from __future__ import annotations

from rtstore_spark.wire.protobuf import Field, Schema
from rtstore_spark.wire.schemas import INDEX

# --------------------------------------------------------- db3_database_v2

DOCUMENT_DATABASE = Schema("DocumentDatabase", (
    Field(1, "address", "bytes"),
    Field(2, "sender", "bytes"),
    Field(3, "desc", "string"),
))

EVENT_DATABASE = Schema("EventDatabase", (
    Field(1, "address", "bytes"),
    Field(2, "sender", "bytes"),
    Field(3, "contract_address", "string"),
    Field(4, "desc", "string"),
    Field(5, "ttl", "uint64"),
    Field(6, "events_json_abi", "string"),
    Field(7, "evm_node_url", "string"),
    Field(8, "start_block", "uint64"),
))

DATABASE_MESSAGE = Schema("DatabaseMessage", (
    Field(2, "doc_db", "message", message=DOCUMENT_DATABASE, oneof="database"),
    Field(3, "event_db", "message", message=EVENT_DATABASE, oneof="database"),
))

DATABASE_STATE = Schema("DatabaseState", (
    Field(2, "total_doc_count", "uint64"),
    Field(3, "total_col_count", "uint64"),
    Field(4, "doc_order", "int64"),
))

COLLECTION = Schema("Collection", (
    Field(2, "name", "string"),
    Field(3, "index_fields", "message", message=INDEX, repeated=True),
    Field(4, "sender", "bytes"),
))

COLLECTION_STATE = Schema("CollectionState", (
    Field(1, "total_doc_count", "uint64"),
))

DOCUMENT = Schema("Document", (
    Field(1, "id", "int64"),
    Field(2, "doc", "string"),
))

QUERY_PARAMETER = Schema("QueryParameter", (
    Field(1, "name", "string"),
    Field(2, "int64_value", "int64", oneof="parameter"),
    Field(3, "bool_value", "bool", oneof="parameter"),
    Field(4, "str_value", "string", oneof="parameter"),
    Field(5, "idx", "int32"),
))

QUERY = Schema("Query", (
    Field(1, "query_str", "string"),
    Field(2, "parameters", "message", message=QUERY_PARAMETER, repeated=True),
))

# --------------------------------------------------------- db3_mutation_v2

MUTATION_HEADER = Schema("MutationHeader", (
    Field(1, "block_id", "uint64"),
    Field(2, "order_id", "uint32"),
    Field(3, "sender", "bytes"),
    Field(4, "time", "uint64"),
    Field(5, "id", "string"),
    Field(6, "size", "uint32"),
    Field(7, "nonce", "uint64"),
    Field(8, "network", "uint64"),
    Field(9, "action", "enum"),
    Field(10, "doc_ids_map", "string"),
))

MUTATION_BODY = Schema("MutationBody", (
    Field(1, "payload", "bytes"),
    Field(2, "signature", "string"),
))

# -------------------------------------------------------------- db3_rollup

GC_RECORD = Schema("GcRecord", (
    Field(1, "start_block", "uint64"),
    Field(2, "end_block", "uint64"),
    Field(3, "data_size", "uint64"),
    Field(4, "time", "uint64"),
    Field(5, "processed_time", "uint64"),
))

ROLLUP_RECORD = Schema("RollupRecord", (
    Field(1, "end_block", "uint64"),
    Field(2, "raw_data_size", "uint64"),
    Field(3, "compress_data_size", "uint64"),
    Field(4, "processed_time", "uint64"),
    Field(5, "arweave_tx", "string"),
    Field(6, "time", "uint64"),
    Field(7, "mutation_count", "uint64"),
    Field(8, "cost", "uint64"),
    Field(9, "start_block", "uint64"),
    Field(10, "evm_tx", "string"),
    Field(11, "evm_cost", "uint64"),
))

# ---------------------------------------------------------------- db3_base

SYSTEM_CONFIG = Schema("SystemConfig", (
    Field(1, "min_rollup_size", "uint64"),
    Field(2, "rollup_interval", "uint64"),
    Field(3, "network_id", "uint64"),
    Field(4, "evm_node_url", "string"),
    Field(5, "ar_node_url", "string"),
    Field(6, "chain_id", "uint32"),
    Field(7, "rollup_max_interval", "uint64"),
    Field(8, "contract_addr", "string"),
    Field(9, "min_gc_offset", "uint64"),
))

VERSION = Schema("Version", (
    Field(1, "build_time", "string"),
    Field(2, "git_hash", "string"),
    Field(3, "version_label", "string"),
))

SYSTEM_STATUS = Schema("SystemStatus", (
    Field(1, "evm_account", "string"),
    Field(2, "evm_balance", "string"),
    Field(3, "ar_account", "string"),
    Field(4, "ar_balance", "string"),
    Field(5, "node_url", "string"),
    Field(6, "config", "message", message=SYSTEM_CONFIG),
    Field(7, "has_inited", "bool"),
    Field(8, "admin_addr", "string"),
    Field(9, "version", "message", message=VERSION),
))

# ------------------------------------------------------------- db3_storage

SEND_MUTATION_REQUEST = Schema("SendMutationRequest", (
    Field(1, "signature", "string"),
    Field(2, "payload", "bytes"),
))

EXTRA_ITEM = Schema("ExtraItem", (
    Field(1, "key", "string"),
    Field(2, "value", "string"),
))

SEND_MUTATION_RESPONSE = Schema("SendMutationResponse", (
    Field(1, "id", "string"),
    Field(2, "code", "int32"),
    Field(3, "msg", "string"),
    Field(4, "items", "message", message=EXTRA_ITEM, repeated=True),
    Field(5, "block", "uint64"),
    Field(6, "order", "uint32"),
))

GET_NONCE_REQUEST = Schema("GetNonceRequest", (
    Field(1, "address", "string"),
))
GET_NONCE_RESPONSE = Schema("GetNonceResponse", (
    Field(2, "nonce", "uint64"),
))

SUBSCRIBE_REQUEST = Schema("SubscribeRequest", (
    Field(1, "signature", "string"),
    Field(2, "payload", "string"),
))

BLOCK_EVENT = Schema("BlockEvent", (
    Field(1, "block_id", "uint64"),
    Field(2, "mutation_count", "uint32"),
))

EVENT_MESSAGE = Schema("EventMessage", (
    Field(1, "type", "enum"),
    Field(3, "block_event", "message", message=BLOCK_EVENT, oneof="event"),
))

GET_MUTATION_HEADER_REQUEST = Schema("GetMutationHeaderRequest", (
    Field(1, "block_id", "uint64"),
    Field(2, "order_id", "uint32"),
))
GET_MUTATION_HEADER_RESPONSE = Schema("GetMutationHeaderResponse", (
    Field(1, "header", "message", message=MUTATION_HEADER),
    Field(2, "status", "enum"),
    Field(4, "rollup_tx", "bytes"),
))

GET_MUTATION_BODY_REQUEST = Schema("GetMutationBodyRequest", (
    Field(1, "id", "string"),
))
GET_MUTATION_BODY_RESPONSE = Schema("GetMutationBodyResponse", (
    Field(1, "body", "message", message=MUTATION_BODY),
))

SCAN_MUTATION_HEADER_REQUEST = Schema("ScanMutationHeaderRequest", (
    Field(1, "start", "uint32"),
    Field(2, "limit", "uint32"),
))
SCAN_MUTATION_HEADER_RESPONSE = Schema("ScanMutationHeaderResponse", (
    Field(1, "headers", "message", message=MUTATION_HEADER, repeated=True),
))

SCAN_ROLLUP_RECORD_REQUEST = Schema("ScanRollupRecordRequest", (
    Field(1, "start", "uint32"),
    Field(2, "limit", "uint32"),
))
SCAN_ROLLUP_RECORD_RESPONSE = Schema("ScanRollupRecordResponse", (
    Field(1, "records", "message", message=ROLLUP_RECORD, repeated=True),
))

GET_DATABASE_REQUEST = Schema("GetDatabaseRequest", (
    Field(1, "addr", "string"),
))
GET_DATABASE_RESPONSE = Schema("GetDatabaseResponse", (
    Field(1, "database", "message", message=DATABASE_MESSAGE),
    Field(2, "state", "message", message=DATABASE_STATE),
))

GET_DATABASE_OF_OWNER_REQUEST = Schema("GetDatabaseOfOwnerRequest", (
    Field(1, "owner", "string"),
))
GET_DATABASE_OF_OWNER_RESPONSE = Schema("GetDatabaseOfOwnerResponse", (
    Field(1, "databases", "message", message=DATABASE_MESSAGE, repeated=True),
    Field(2, "states", "message", message=DATABASE_STATE, repeated=True),
))

GET_COLLECTION_OF_DATABASE_REQUEST = Schema("GetCollectionOfDatabaseRequest", (
    Field(1, "db_addr", "string"),
))
GET_COLLECTION_OF_DATABASE_RESPONSE = Schema("GetCollectionOfDatabaseResponse", (
    Field(1, "collections", "message", message=COLLECTION, repeated=True),
    Field(2, "states", "message", message=COLLECTION_STATE, repeated=True),
))

SCAN_GC_RECORD_REQUEST = Schema("ScanGcRecordRequest", (
    Field(1, "start", "uint32"),
    Field(2, "limit", "uint32"),
))
SCAN_GC_RECORD_RESPONSE = Schema("ScanGcRecordResponse", (
    Field(1, "records", "message", message=GC_RECORD, repeated=True),
))

BLOCK_REQUEST = Schema("BlockRequest", (
    Field(1, "block_start", "uint64"),
    Field(2, "block_end", "uint64"),
))
MUTATION_WRAPPER = Schema("MutationWrapper", (
    Field(1, "header", "message", message=MUTATION_HEADER),
    Field(2, "body", "message", message=MUTATION_BODY),
))
BLOCK_RESPONSE = Schema("BlockResponse", (
    Field(3, "mutations", "message", message=MUTATION_WRAPPER, repeated=True),
))

GET_MUTATION_STATE_REQUEST = Schema("GetMutationStateRequest", ())
MUTATION_STATE_VIEW = Schema("MutationStateView", (
    Field(1, "mutation_count", "uint64"),
    Field(2, "total_mutation_bytes", "uint64"),
    Field(3, "gc_count", "uint64"),
    Field(4, "rollup_count", "uint64"),
    Field(5, "total_rollup_bytes", "uint64"),
    Field(6, "total_storage_cost", "string"),
    Field(7, "total_evm_cost", "string"),
    Field(8, "total_gc_bytes", "uint64"),
    Field(9, "total_rollup_raw_bytes", "uint64"),
    Field(10, "total_rollup_mutation_count", "uint64"),
))
GET_MUTATION_STATE_RESPONSE = Schema("GetMutationStateResponse", (
    Field(1, "view", "message", message=MUTATION_STATE_VIEW),
))

# ------------------------------------------------------------- db3_indexer

RUN_QUERY_REQUEST = Schema("RunQueryRequest", (
    Field(1, "db", "string"),
    Field(2, "col_name", "string"),
    Field(3, "query", "message", message=QUERY),
))
RUN_QUERY_RESPONSE = Schema("RunQueryResponse", (
    Field(2, "documents", "message", message=DOCUMENT, repeated=True),
    Field(3, "count", "uint64"),
))

CONTRACT_SYNC_STATUS = Schema("ContractSyncStatus", (
    Field(1, "addr", "string"),
    Field(2, "evm_node_url", "string"),
    Field(3, "block_number", "uint64"),
    Field(4, "event_number", "uint64"),
))
GET_CONTRACT_SYNC_STATUS_REQUEST = Schema("GetContractSyncStatusRequest", ())
GET_CONTRACT_SYNC_STATUS_RESPONSE = Schema("GetContractSyncStatusResponse", (
    Field(1, "status_list", "message", message=CONTRACT_SYNC_STATUS, repeated=True),
))

GET_DOC_REQUEST = Schema("GetDocRequest", (
    Field(1, "db_addr", "string"),
    Field(2, "col_name", "string"),
    Field(3, "id", "int64"),
))
GET_DOC_RESPONSE = Schema("GetDocResponse", (
    Field(1, "document", "message", message=DOCUMENT),
))

# -------------------------------------------------------------- db3_system

SETUP_REQUEST = Schema("SetupRequest", (
    Field(1, "signature", "string"),
    Field(2, "payload", "string"),
))
SETUP_RESPONSE = Schema("SetupResponse", (
    Field(1, "code", "int64"),
    Field(2, "msg", "string"),
))
GET_SYSTEM_STATUS_REQUEST = Schema("GetSystemStatusRequest", ())

# ---------------------------------------------------------------- registry

# Methods that mutate node state. Fronts that execute RPCs concurrently
# (service_h2.py's worker pool) must keep these on the connection thread
# in arrival order — the sequencer serializes them anyway, and in-order
# nonce application is what the SDK's sequential awaits expect. Every
# other unary method is a read and may answer out of order, which is
# exactly the reordering gRPC permits on one channel.
MUTATING_METHODS: frozenset = frozenset({
    ("db3_storage_proto.StorageNode", "SendMutation"),
    ("db3_system_proto.System", "Setup"),
})

# "package.Service" → method → (request, response, server_streaming)
METHODS: dict = {
    "db3_storage_proto.StorageNode": {
        "SendMutation": (SEND_MUTATION_REQUEST, SEND_MUTATION_RESPONSE, False),
        "GetNonce": (GET_NONCE_REQUEST, GET_NONCE_RESPONSE, False),
        "GetMutationHeader": (
            GET_MUTATION_HEADER_REQUEST, GET_MUTATION_HEADER_RESPONSE, False),
        "ScanMutationHeader": (
            SCAN_MUTATION_HEADER_REQUEST, SCAN_MUTATION_HEADER_RESPONSE, False),
        "GetMutationBody": (
            GET_MUTATION_BODY_REQUEST, GET_MUTATION_BODY_RESPONSE, False),
        "ScanRollupRecord": (
            SCAN_ROLLUP_RECORD_REQUEST, SCAN_ROLLUP_RECORD_RESPONSE, False),
        "GetDatabaseOfOwner": (
            GET_DATABASE_OF_OWNER_REQUEST, GET_DATABASE_OF_OWNER_RESPONSE, False),
        "GetDatabase": (GET_DATABASE_REQUEST, GET_DATABASE_RESPONSE, False),
        "GetCollectionOfDatabase": (
            GET_COLLECTION_OF_DATABASE_REQUEST,
            GET_COLLECTION_OF_DATABASE_RESPONSE, False),
        "ScanGcRecord": (SCAN_GC_RECORD_REQUEST, SCAN_GC_RECORD_RESPONSE, False),
        "Subscribe": (SUBSCRIBE_REQUEST, EVENT_MESSAGE, True),
        "GetBlock": (BLOCK_REQUEST, BLOCK_RESPONSE, False),
        "GetMutationState": (
            GET_MUTATION_STATE_REQUEST, GET_MUTATION_STATE_RESPONSE, False),
    },
    "db3_indexer_proto.IndexerNode": {
        "GetContractSyncStatus": (
            GET_CONTRACT_SYNC_STATUS_REQUEST,
            GET_CONTRACT_SYNC_STATUS_RESPONSE, False),
        "GetCollectionOfDatabase": (
            GET_COLLECTION_OF_DATABASE_REQUEST,
            GET_COLLECTION_OF_DATABASE_RESPONSE, False),
        "RunQuery": (RUN_QUERY_REQUEST, RUN_QUERY_RESPONSE, False),
        "GetDoc": (GET_DOC_REQUEST, GET_DOC_RESPONSE, False),
    },
    "db3_system_proto.System": {
        "Setup": (SETUP_REQUEST, SETUP_RESPONSE, False),
        "GetSystemStatus": (GET_SYSTEM_STATUS_REQUEST, SYSTEM_STATUS, False),
    },
}

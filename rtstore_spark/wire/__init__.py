"""Reference wire-format interop: protobuf + BSON + EIP-712 envelopes.

The reference's clients, node, and rollup artifacts all speak one unit:
an EIP-712 TypedData JSON envelope whose ``message.payload`` hex-encodes
a protobuf ``Mutation`` (db3_mutation_v2.proto) whose documents are BSON
bytes. None of protobuf/bson/grpcio are installed in this environment,
so this package implements the three codecs directly from their public
specs, giving the engine byte-level interop: it can decode, verify, and
replay reference-produced artifacts, and produce envelopes a stock
reference node parses.

The gRPC HTTP/2 transport itself remains environment-bound (no grpcio);
the HTTP/JSON front end (rtstore_spark/service.py) accepts these wire
envelopes verbatim via its SendMutation method.
"""

from rtstore_spark.wire.bsonlite import BsonError, bson_decode, bson_encode
from rtstore_spark.wire.envelope import (
    WireMutation,
    mutation_tx_id,
    unwrap_and_verify,
    wrap_and_sign,
)
from rtstore_spark.wire.protobuf import Field, Schema, WireDecodeError
from rtstore_spark.wire.schemas import (
    ACTION_BODY_KIND,
    ACTION_NAMES,
    ACTION_NUMBERS,
    decode_mutation,
    encode_mutation,
)

__all__ = [
    "ACTION_BODY_KIND",
    "ACTION_NAMES",
    "ACTION_NUMBERS",
    "BsonError",
    "Field",
    "Schema",
    "WireDecodeError",
    "WireMutation",
    "bson_decode",
    "bson_encode",
    "decode_mutation",
    "encode_mutation",
    "mutation_tx_id",
    "unwrap_and_verify",
    "wrap_and_sign",
]

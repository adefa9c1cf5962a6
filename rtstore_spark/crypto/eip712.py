"""EIP-712 signing hash + signer recovery for the mutation envelope.

The reference SDK signs typed data with an EMPTY domain
(sdk/src/account/db3_account.ts:104-121):

    types:   { EIP712Domain: [], Message: [{payload: bytes}, {nonce: string}] }
    domain:  {}
    message: { payload: '0x…', nonce: '<nonce>' }

and the node recovers the address from (typed data, signature)
(mutation_utils.rs:60-91). Per the EIP-712 spec that means:

    domainSeparator = keccak256(keccak256("EIP712Domain()"))
    hashStruct(m)   = keccak256(keccak256("Message(bytes payload,string nonce)")
                                ‖ keccak256(payload_bytes) ‖ keccak256(nonce_utf8))
    signingHash     = keccak256(0x19 ‖ 0x01 ‖ domainSeparator ‖ hashStruct(m))
"""

from __future__ import annotations

from rtstore_spark.crypto.keccak import keccak256
from rtstore_spark.crypto.secp256k1 import recover_address

_DOMAIN_SEPARATOR = keccak256(keccak256(b"EIP712Domain()"))
_MESSAGE_TYPEHASH = keccak256(b"Message(bytes payload,string nonce)")


def _payload_bytes(payload: str | bytes) -> bytes:
    if isinstance(payload, bytes):
        return payload
    if payload.startswith("0x"):  # SDK sends hex-encoded protobuf bytes
        return bytes.fromhex(payload[2:])
    return payload.encode("utf-8")


def mutation_signing_hash(payload: str | bytes, nonce: int | str) -> bytes:
    """The EIP-712 digest the client's wallet actually signs."""
    struct_hash = keccak256(
        _MESSAGE_TYPEHASH
        + keccak256(_payload_bytes(payload))
        + keccak256(str(nonce).encode("utf-8"))
    )
    return keccak256(b"\x19\x01" + _DOMAIN_SEPARATOR + struct_hash)


def recover_mutation_signer(
    payload: str | bytes, nonce: int | str, signature: str | bytes
) -> str:
    """Recover the 0x-address that signed {payload, nonce} as typed data."""
    return recover_address(mutation_signing_hash(payload, nonce), signature)


def _encode_value(typ: str, value) -> bytes:
    """One EIP-712 struct member → its 32-byte encoding."""
    if typ == "string":
        return keccak256(str(value).encode("utf-8"))
    if typ == "bytes":
        raw = value if isinstance(value, bytes) else bytes.fromhex(
            str(value).removeprefix("0x")
        )
        return keccak256(raw)
    if typ == "address":
        return bytes.fromhex(str(value).removeprefix("0x")).rjust(32, b"\x00")
    if typ == "bool":
        return int(bool(value)).to_bytes(32, "big")
    if typ.startswith("uint") or typ.startswith("int"):
        return int(value).to_bytes(32, "big", signed=typ.startswith("int"))
    if typ.startswith("bytes"):  # fixed bytesN: right-padded
        raw = value if isinstance(value, bytes) else bytes.fromhex(
            str(value).removeprefix("0x")
        )
        return raw.ljust(32, b"\x00")
    raise ValueError(f"unsupported EIP-712 member type {typ!r}")


def typed_data_signing_hash(typed: dict) -> bytes:
    """EIP-712 digest of a FLAT typed-data document with an empty domain.

    Covers the shapes the reference SDK signs — an empty ``EIP712Domain``
    and a single ``Message`` struct of atomic members (string / address /
    bytes / bool / uintN), e.g. the 9-field Setup config signature
    (sdk/src/crypto/sig_utils.ts:22-59) and the mutation envelope.
    Nested structs and arrays (which the SDK never uses) are rejected.
    """
    if typed.get("domain"):
        raise ValueError("only the SDK's empty domain is supported")
    primary = typed.get("primaryType", "Message")
    fields = typed["types"][primary]
    type_str = primary + "(" + ",".join(
        f"{f['type']} {f['name']}" for f in fields
    ) + ")"
    message = typed["message"]
    encoded = keccak256(type_str.encode("ascii")) + b"".join(
        _encode_value(f["type"], message[f["name"]]) for f in fields
    )
    return keccak256(b"\x19\x01" + _DOMAIN_SEPARATOR + keccak256(encoded))


def recover_typed_data_signer(payload: str | bytes, signature: str | bytes) -> str:
    """MutationUtil::verify_setup's recovery half (mutation_utils.rs:74-91):
    parse a TypedData JSON document, recover the 0x-address that signed it."""
    import json

    typed = json.loads(payload)
    return recover_address(typed_data_signing_hash(typed), signature)

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

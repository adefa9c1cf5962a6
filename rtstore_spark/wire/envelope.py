"""EIP-712 TypedData envelope around protobuf mutation bytes.

This is the exact unit the reference persists per mutation and ships on
the wire: a JSON TypedData document whose ``message.payload`` is the
hex-encoded protobuf Mutation and whose ``message.nonce`` is the sender
nonce as a decimal string, signed with an empty EIP-712 domain. The node
side is ``MutationUtil::unwrap_and_light_verify``
(src/node/src/mutation_utils.rs:92-140): parse TypedData → recover signer
from the signature → hex-decode payload → prost-decode Mutation → parse
nonce. The mutation id is ``TxId::from((payload, signature.as_bytes()))``
= sha3_256(typed-data JSON bytes ‖ signature hex string bytes)
(mutation_store.rs:596-606, id.rs:77-85).

``unwrap_and_verify`` mirrors that pipeline with the pure-Python
secp256k1/keccak stack in ``rtstore_spark.crypto``; ``wrap_and_sign`` is
the client half (sdk/src/account/db3_account.ts:104-121) so this engine
can both accept and produce reference-format envelopes.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass

from rtstore_spark.crypto.eip712 import mutation_signing_hash, recover_mutation_signer
from rtstore_spark.wire.protobuf import WireDecodeError
from rtstore_spark.wire.schemas import decode_mutation


@dataclass(frozen=True)
class WireMutation:
    """One verified wire mutation, normalized."""

    sender: str  # 0x-address recovered from the signature
    nonce: int
    action: str  # MutationAction name
    bodies: tuple  # ({db_address, kind, body}, ...)
    layout: str  # "v2" | "legacy"
    mutation_id: str  # 0x-hex sha3_256(payload ‖ signature-string)
    payload_hex: str  # message.payload as sent ("0x…")


def mutation_tx_id(payload: bytes, signature: str) -> str:
    """TxId::from((payload, sig.as_bytes())) — id.rs:77-85."""
    return "0x" + hashlib.sha3_256(payload + signature.encode("ascii")).hexdigest()


def unwrap_and_verify(
    payload: bytes | str, signature: str, layout: str = "auto",
    verify: bool = True,
) -> WireMutation:
    """Parse + verify one TypedData envelope (mutation_utils.rs:92-140).

    ``payload`` is the raw TypedData JSON bytes as persisted in a rollup
    row or POSTed by a client; ``signature`` the 65-byte r‖s‖v hex string.
    With ``verify=False`` the signature is not recovered (sender is "")
    — the light path for bulk decoding where provenance is checked
    separately.
    """
    if isinstance(payload, str):
        payload = payload.encode("utf-8")
    try:
        data = json.loads(payload)
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
        raise WireDecodeError(f"bad typed data: {e}") from e
    msg = data.get("message") if isinstance(data, dict) else None
    if not isinstance(msg, dict):
        raise WireDecodeError("typed data has no message object")
    payload_hex = msg.get("payload")
    nonce_str = msg.get("nonce")
    if not isinstance(payload_hex, str) or not payload_hex.startswith("0x"):
        raise WireDecodeError("message.payload is not 0x-hex")
    if nonce_str is None:
        raise WireDecodeError("message.nonce missing")
    try:
        nonce = int(str(nonce_str))
    except ValueError as e:
        raise WireDecodeError(f"bad nonce {nonce_str!r}") from e
    try:
        raw = bytes.fromhex(payload_hex[2:])
    except ValueError as e:
        raise WireDecodeError("message.payload is not valid hex") from e

    sender = ""
    if verify:
        try:
            sender = recover_mutation_signer(payload_hex, nonce_str, signature)
        except (ValueError, AssertionError) as e:
            raise WireDecodeError(f"signature recovery failed: {e}") from e

    decoded = decode_mutation(raw, layout=layout)
    return WireMutation(
        sender=sender,
        nonce=nonce,
        action=decoded["action"],
        bodies=tuple(decoded["bodies"]),
        layout=decoded["layout"],
        mutation_id=mutation_tx_id(payload, signature),
        payload_hex=payload_hex,
    )


def wrap_and_sign(mutation_bytes: bytes, nonce: int | str, priv: int) -> tuple[bytes, str]:
    """Build + sign the TypedData envelope a reference node accepts.

    Returns (payload_json_bytes, signature_hex). Mirrors the TS SDK's
    signer (db3_account.ts:104-121): empty domain, Message(bytes payload,
    string nonce), payload hex-encoded, 65-byte signature with v ∈ {27,28}.
    """
    from rtstore_spark.crypto.secp256k1 import sign

    payload_hex = "0x" + mutation_bytes.hex()
    nonce_str = str(nonce)
    envelope = {
        "types": {
            "EIP712Domain": [],
            "Message": [
                {"name": "payload", "type": "bytes"},
                {"name": "nonce", "type": "string"},
            ],
        },
        "domain": {},
        "primaryType": "Message",
        "message": {"payload": payload_hex, "nonce": nonce_str},
    }
    digest = mutation_signing_hash(payload_hex, nonce_str)
    sig = sign(digest, priv)
    # the artifact rows carry v as 27/28 (…1b/…1c); normalize recovery ids
    v = sig[64]
    if v < 27:
        sig = sig[:64] + bytes([v + 27])
    signature = "0x" + sig.hex()
    return json.dumps(envelope, separators=(",", ":")).encode("utf-8"), signature

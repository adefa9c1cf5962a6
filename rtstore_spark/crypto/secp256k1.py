"""Minimal pure-Python secp256k1 ECDSA — recovery (verify path) + signing
(test-vector generation).

Implements only what the EIP-712 auth needs: recover the signer's public key
from a 65-byte r‖s‖v signature and derive the Ethereum address
(keccak256(pubkey)[12:]). Affine arithmetic with modular inverses — a few ms
per recovery on the driver, never in a Spark hot path.
"""

from __future__ import annotations

from rtstore_spark.crypto.keccak import keccak256

P = 2**256 - 2**32 - 977
N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
G = (
    0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798,
    0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8,
)

Point = tuple[int, int] | None  # None = point at infinity


def _inv(a: int, m: int) -> int:
    return pow(a, -1, m)


def _add(p1: Point, p2: Point) -> Point:
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2 and (y1 + y2) % P == 0:
        return None
    if p1 == p2:
        lam = (3 * x1 * x1) * _inv(2 * y1, P) % P
    else:
        lam = (y2 - y1) * _inv(x2 - x1, P) % P
    x3 = (lam * lam - x1 - x2) % P
    return (x3, (lam * (x1 - x3) - y1) % P)


def _mul(p: Point, k: int) -> Point:
    acc: Point = None
    while k:
        if k & 1:
            acc = _add(acc, p)
        p = _add(p, p)
        k >>= 1
    return acc


def pubkey_to_address(pub: tuple[int, int]) -> str:
    raw = pub[0].to_bytes(32, "big") + pub[1].to_bytes(32, "big")
    return "0x" + keccak256(raw)[12:].hex()


def priv_to_address(priv: int) -> str:
    return pubkey_to_address(_mul(G, priv))


def sign(msg_hash: bytes, priv: int) -> bytes:
    """Deterministic sign → 65-byte r‖s‖v (v ∈ {27, 28}), low-s normalized.

    k is derived as keccak256(priv ‖ hash) — deterministic like RFC 6979 in
    spirit; meant for generating test vectors, not production wallets.
    """
    z = int.from_bytes(msg_hash, "big")
    k = int.from_bytes(keccak256(priv.to_bytes(32, "big") + msg_hash), "big") % N
    R = _mul(G, k)
    assert R is not None
    r = R[0] % N
    s = _inv(k, N) * (z + r * priv) % N
    recid = R[1] & 1
    if s > N // 2:  # low-s (EIP-2)
        s = N - s
        recid ^= 1
    return r.to_bytes(32, "big") + s.to_bytes(32, "big") + bytes([27 + recid])


def recover(msg_hash: bytes, signature: bytes) -> tuple[int, int]:
    """Recover the public key from a 65-byte r‖s‖v signature."""
    if len(signature) != 65:
        raise ValueError(f"signature must be 65 bytes, got {len(signature)}")
    r = int.from_bytes(signature[:32], "big")
    s = int.from_bytes(signature[32:64], "big")
    v = signature[64]
    if v >= 27:
        v -= 27
    if v not in (0, 1):
        raise ValueError(f"invalid recovery id {v}")
    if not (1 <= r < N and 1 <= s < N):
        raise ValueError("r/s out of range")
    # lift x = r to a curve point with y parity = v
    x = r
    y_sq = (pow(x, 3, P) + 7) % P
    y = pow(y_sq, (P + 1) // 4, P)
    if pow(y, 2, P) != y_sq:
        raise ValueError("r is not an x-coordinate on the curve")
    if y & 1 != v:
        y = P - y
    z = int.from_bytes(msg_hash, "big")
    r_inv = _inv(r, N)
    # Q = r^-1 (s·R − z·G)
    q = _add(_mul((x, y), s * r_inv % N), _mul(G, (-z * r_inv) % N))
    if q is None:
        raise ValueError("recovered point at infinity")
    return q


def recover_address(msg_hash: bytes, signature: str | bytes) -> str:
    if isinstance(signature, str):
        signature = bytes.fromhex(signature.removeprefix("0x"))
    return pubkey_to_address(recover(msg_hash, signature))

"""Minimal pure-Python secp256k1 ECDSA — recovery (verify path) + signing
(test-vector generation).

Implements only what the EIP-712 auth needs: recover the signer's public key
from a 65-byte r‖s‖v signature and derive the Ethereum address
(keccak256(pubkey)[12:]).

Performance: the wire-import path verifies every mutation's signature inside
an Arrow batch (sources/wire_import.py), so the per-recovery constant is the
import throughput. Point arithmetic runs in JACOBIAN coordinates (zero
modular inversions per add/double; one inversion per recovery at the final
affine conversion), scalar multiplication uses width-5 wNAF, and the two
scalar products of a recovery (u1·G + u2·R) run INTERLEAVED (Strauss-Shamir:
one shared doubling chain) against a module-load-time affine table of odd
generator multiples (width-7 wNAF for the fixed base). The earlier affine
implementation paid ~770 `pow(a, -1, P)` inversions per recovery; this pays
one.
"""

from __future__ import annotations

from rtstore_spark.crypto.keccak import keccak256

P = 2**256 - 2**32 - 977
N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
G = (
    0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798,
    0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8,
)

Point = tuple[int, int] | None  # affine; None = point at infinity


def _inv(a: int, m: int) -> int:
    return pow(a, -1, m)


# ----------------------------------------------------------------- Jacobian
# (X, Y, Z) with x = X/Z², y = Y/Z³; Z = 0 encodes the point at infinity.

_JINF = (0, 1, 0)


def _jdouble(p):
    X, Y, Z = p
    if not Z or not Y:
        return _JINF
    YY = Y * Y % P
    S = 4 * X * YY % P
    M = 3 * X * X % P  # a = 0 on secp256k1
    X3 = (M * M - 2 * S) % P
    Y3 = (M * (S - X3) - 8 * YY * YY) % P
    Z3 = 2 * Y * Z % P
    return (X3, Y3, Z3)


def _jadd(p, q):
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    if not Z1:
        return q
    if not Z2:
        return p
    Z1Z1 = Z1 * Z1 % P
    Z2Z2 = Z2 * Z2 % P
    U1 = X1 * Z2Z2 % P
    U2 = X2 * Z1Z1 % P
    S1 = Y1 * Z2 * Z2Z2 % P
    S2 = Y2 * Z1 * Z1Z1 % P
    H = (U2 - U1) % P
    R = (S2 - S1) % P
    if not H:
        if not R:
            return _jdouble(p)
        return _JINF
    HH = H * H % P
    HHH = H * HH % P
    V = U1 * HH % P
    X3 = (R * R - HHH - 2 * V) % P
    Y3 = (R * (V - X3) - S1 * HHH) % P
    Z3 = Z1 * Z2 * H % P
    return (X3, Y3, Z3)


def _jadd_affine(p, q):
    """Mixed addition: Jacobian p + affine q (Z2 = 1) — saves 5 mults."""
    X1, Y1, Z1 = p
    x2, y2 = q
    if not Z1:
        return (x2, y2, 1)
    Z1Z1 = Z1 * Z1 % P
    U2 = x2 * Z1Z1 % P
    S2 = y2 * Z1 * Z1Z1 % P
    H = (U2 - X1) % P
    R = (S2 - Y1) % P
    if not H:
        if not R:
            return _jdouble(p)
        return _JINF
    HH = H * H % P
    HHH = H * HH % P
    V = X1 * HH % P
    X3 = (R * R - HHH - 2 * V) % P
    Y3 = (R * (V - X3) - Y1 * HHH) % P
    Z3 = Z1 * H % P
    return (X3, Y3, Z3)


def _to_affine(p) -> Point:
    X, Y, Z = p
    if not Z:
        return None
    zi = _inv(Z, P)
    zi2 = zi * zi % P
    return (X * zi2 % P, Y * zi2 * zi % P)


def _wnaf(k: int, w: int) -> list[int]:
    """Width-w non-adjacent form, least-significant digit first; digits are
    odd in (-2^(w-1), 2^(w-1)) or zero, at most one nonzero per w slots."""
    out: list[int] = []
    full = 1 << w
    half = 1 << (w - 1)
    while k:
        if k & 1:
            d = k & (full - 1)
            if d >= half:
                d -= full
            k -= d
        else:
            d = 0
        out.append(d)
        k >>= 1
    return out


def _odd_multiples_jac(p, count: int):
    """[p, 3p, 5p, ...] in Jacobian, count entries."""
    out = [p]
    twop = _jdouble(p)
    for _ in range(count - 1):
        out.append(_jadd(out[-1], twop))
    return out


def _batch_to_affine(points) -> list[Point]:
    """Montgomery's trick: one inversion for the whole table."""
    zs = [pt[2] for pt in points]
    prefix = [1]
    for z in zs:
        prefix.append(prefix[-1] * z % P)
    inv_all = _inv(prefix[-1], P)
    out: list[Point] = [None] * len(points)
    for i in range(len(points) - 1, -1, -1):
        zi = inv_all * prefix[i] % P
        inv_all = inv_all * zs[i] % P
        zi2 = zi * zi % P
        X, Y, _ = points[i]
        out[i] = (X * zi2 % P, Y * zi2 * zi % P)
    return out


_GW = 7  # fixed-base window: 2^(w-2) = 32 precomputed odd multiples of G
_G_ODD: list[Point] = _batch_to_affine(
    _odd_multiples_jac((G[0], G[1], 1), 1 << (_GW - 2))
)

# ---------------------------------------------------------------- GLV
# secp256k1's efficient endomorphism φ(x, y) = (βx, y) = λ·(x, y), with
# β³ ≡ 1 (mod P) and λ³ ≡ 1 (mod N) — the standard GLV split (public
# constants, as in libsecp256k1): any scalar k decomposes into
# k ≡ k1 + k2·λ (mod N) with |k1|, |k2| ≤ 129 bits, halving the doubling
# chain of every scalar multiplication that uses it.
BETA = 0x7AE96A2B657C07106E64479EAC3434E99CF0497512F58995C1396C28719501EE
LAMBDA = 0x5363AD4CC05C30E0A5261C028812645A122E22EA20816678DF02967C1B23BD72
_A1 = 0x3086D221A7D46BCDE86C90E49284EB15
_B1 = -0xE4437ED6010E88286F547FA90ABFE4C3
_A2 = 0x114CA50F7A8E2F3F657C1108D9D44CFD8
_B2 = _A1

_G_ODD_LAM: list[Point] = [(x * BETA % P, y) for x, y in _G_ODD]  # φ(G) table


def _split_glv(k: int) -> tuple[int, int]:
    """k (mod N) → (k1, k2) with k1 + k2·λ ≡ k, both ≤ ~2^128 in
    magnitude (possibly negative). Round-to-nearest lattice reduction."""
    c1 = (_B2 * k + N // 2) // N
    c2 = (-_B1 * k + N // 2) // N
    return k - c1 * _A1 - c2 * _A2, -c1 * _B1 - c2 * _B2


def _mul_g(k: int):
    """k·G (Jacobian) via wNAF against the precomputed affine table."""
    k %= N
    if not k:
        return _JINF
    acc = _JINF
    for d in reversed(_wnaf(k, _GW)):
        acc = _jdouble(acc)
        if d > 0:
            acc = _jadd_affine(acc, _G_ODD[d >> 1])
        elif d < 0:
            x, y = _G_ODD[(-d) >> 1]
            acc = _jadd_affine(acc, (x, P - y))
    return acc


def _mul_shamir(u1: int, u2: int, q: Point):
    """u1·G + u2·q with one shared doubling chain (Strauss-Shamir),
    GLV-split four ways: each scalar becomes two ≤129-bit halves (the
    second riding the φ-mapped table), so the chain is ~128 doublings
    instead of ~256, with four interleaved wNAF addition streams."""
    u1 %= N
    u2 %= N
    if not u2 or q is None:
        return _mul_g(u1)
    if not u1:
        return _jmul(q, u2)
    qtab = _odd_multiples_jac((q[0], q[1], 1), 8)  # 1q..15q, width 5
    qtab_lam = [(X * BETA % P, Y, Z) for X, Y, Z in qtab]  # φ(q) table
    a1, a2 = _split_glv(u1)
    b1, b2 = _split_glv(u2)
    streams = []
    for k, tab, affine, width in (
        (a1, _G_ODD, True, _GW), (a2, _G_ODD_LAM, True, _GW),
        (b1, qtab, False, 5), (b2, qtab_lam, False, 5),
    ):
        neg = k < 0
        streams.append((_wnaf(-k if neg else k, width), tab, affine, neg))
    n = max(len(w) for w, _, _, _ in streams)
    acc = _JINF
    for i in range(n - 1, -1, -1):
        acc = _jdouble(acc)
        for w, tab, affine, neg in streams:
            if i >= len(w):
                continue
            d = w[i]
            if not d:
                continue
            if neg:
                d = -d
            if affine:
                x, y = tab[abs(d) >> 1]
                acc = _jadd_affine(acc, (x, y if d > 0 else P - y))
            else:
                X, Y, Z = tab[abs(d) >> 1]
                acc = _jadd(acc, (X, Y if d > 0 else P - Y, Z))
    return acc


def _jmul(p: Point, k: int):
    """k·p (Jacobian) for an arbitrary affine point, width-5 wNAF."""
    k %= N
    if not k or p is None:
        return _JINF
    tab = _odd_multiples_jac((p[0], p[1], 1), 8)
    acc = _JINF
    for d in reversed(_wnaf(k, 5)):
        acc = _jdouble(acc)
        if d > 0:
            acc = _jadd(acc, tab[d >> 1])
        elif d < 0:
            X, Y, Z = tab[(-d) >> 1]
            acc = _jadd(acc, (X, P - Y, Z))
    return acc


# ------------------------------------------------------------------ affine
# Kept for callers/tests that do small point algebra directly; scalar
# multiplication routes through the Jacobian core.


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
    if p is not None and p == G:
        return _to_affine(_mul_g(k))
    return _to_affine(_jmul(p, k))


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
    R = _to_affine(_mul_g(k))
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
    # Q = r⁻¹(s·R − z·G), computed as one interleaved double chain
    q = _to_affine(_mul_shamir((-z * r_inv) % N, s * r_inv % N, (x, y)))
    if q is None:
        raise ValueError("recovered point at infinity")
    return q


def recover_address(msg_hash: bytes, signature: str | bytes) -> str:
    if isinstance(signature, str):
        signature = bytes.fromhex(signature.removeprefix("0x"))
    return pubkey_to_address(recover(msg_hash, signature))

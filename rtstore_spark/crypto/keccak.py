"""Pure-Python Keccak-256 (the pre-NIST padding Ethereum uses).

stdlib ``hashlib.sha3_256`` is NIST SHA3 (pad 0x06) — Ethereum's keccak256
uses the original Keccak multi-rate padding (0x01), so the two disagree on
every input. No keccak library is guaranteed in this container, and the
EIP-712 verify path (store/ingest.py) needs keccak256 for the signing hash
and address derivation, so it is implemented here from the Keccak
specification.

The permutation is FULLY UNROLLED over 25 flat lane locals (generated from
the spec's theta/rho-pi/chi/iota maps, then checked against a direct
5x5-loop transcription on random vectors) — the wire-import path hashes
every mutation envelope inside Arrow batches, so the per-hash constant is
import throughput; unrolling cuts it ~3x versus the nested-loop form.
"""

from __future__ import annotations

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

_MASK = (1 << 64) - 1


def _keccak_f1600(a: list) -> None:
    """Keccak-f[1600] over a FLAT 25-lane state, lane (x, y) at a[x + 5y].

    Unrolled: theta's parity columns c0..c4, the rho+pi rotation into
    b0..b24, chi, iota — no inner loops, no temporary grids. ``~b & b'``
    on Python ints yields the correct 64-bit result because b' is
    non-negative; lanes re-mask on store.
    """
    M = _MASK
    (a0, a1, a2, a3, a4, a5, a6, a7, a8, a9, a10, a11, a12,
     a13, a14, a15, a16, a17, a18, a19, a20, a21, a22, a23, a24) = a
    for rc in _RC:
        c0 = a0 ^ a5 ^ a10 ^ a15 ^ a20
        c1 = a1 ^ a6 ^ a11 ^ a16 ^ a21
        c2 = a2 ^ a7 ^ a12 ^ a17 ^ a22
        c3 = a3 ^ a8 ^ a13 ^ a18 ^ a23
        c4 = a4 ^ a9 ^ a14 ^ a19 ^ a24
        d = c4 ^ ((c1 << 1 | c1 >> 63) & M)
        a0 ^= d
        a5 ^= d
        a10 ^= d
        a15 ^= d
        a20 ^= d
        d = c0 ^ ((c2 << 1 | c2 >> 63) & M)
        a1 ^= d
        a6 ^= d
        a11 ^= d
        a16 ^= d
        a21 ^= d
        d = c1 ^ ((c3 << 1 | c3 >> 63) & M)
        a2 ^= d
        a7 ^= d
        a12 ^= d
        a17 ^= d
        a22 ^= d
        d = c2 ^ ((c4 << 1 | c4 >> 63) & M)
        a3 ^= d
        a8 ^= d
        a13 ^= d
        a18 ^= d
        a23 ^= d
        d = c3 ^ ((c0 << 1 | c0 >> 63) & M)
        a4 ^= d
        a9 ^= d
        a14 ^= d
        a19 ^= d
        a24 ^= d
        b0 = a0
        b16 = (a5 << 36 | a5 >> 28) & M
        b7 = (a10 << 3 | a10 >> 61) & M
        b23 = (a15 << 41 | a15 >> 23) & M
        b14 = (a20 << 18 | a20 >> 46) & M
        b10 = (a1 << 1 | a1 >> 63) & M
        b1 = (a6 << 44 | a6 >> 20) & M
        b17 = (a11 << 10 | a11 >> 54) & M
        b8 = (a16 << 45 | a16 >> 19) & M
        b24 = (a21 << 2 | a21 >> 62) & M
        b20 = (a2 << 62 | a2 >> 2) & M
        b11 = (a7 << 6 | a7 >> 58) & M
        b2 = (a12 << 43 | a12 >> 21) & M
        b18 = (a17 << 15 | a17 >> 49) & M
        b9 = (a22 << 61 | a22 >> 3) & M
        b5 = (a3 << 28 | a3 >> 36) & M
        b21 = (a8 << 55 | a8 >> 9) & M
        b12 = (a13 << 25 | a13 >> 39) & M
        b3 = (a18 << 21 | a18 >> 43) & M
        b19 = (a23 << 56 | a23 >> 8) & M
        b15 = (a4 << 27 | a4 >> 37) & M
        b6 = (a9 << 20 | a9 >> 44) & M
        b22 = (a14 << 39 | a14 >> 25) & M
        b13 = (a19 << 8 | a19 >> 56) & M
        b4 = (a24 << 14 | a24 >> 50) & M
        a0 = b0 ^ (~b1 & b2)
        a1 = b1 ^ (~b2 & b3)
        a2 = b2 ^ (~b3 & b4)
        a3 = b3 ^ (~b4 & b0)
        a4 = b4 ^ (~b0 & b1)
        a5 = b5 ^ (~b6 & b7)
        a6 = b6 ^ (~b7 & b8)
        a7 = b7 ^ (~b8 & b9)
        a8 = b8 ^ (~b9 & b5)
        a9 = b9 ^ (~b5 & b6)
        a10 = b10 ^ (~b11 & b12)
        a11 = b11 ^ (~b12 & b13)
        a12 = b12 ^ (~b13 & b14)
        a13 = b13 ^ (~b14 & b10)
        a14 = b14 ^ (~b10 & b11)
        a15 = b15 ^ (~b16 & b17)
        a16 = b16 ^ (~b17 & b18)
        a17 = b17 ^ (~b18 & b19)
        a18 = b18 ^ (~b19 & b15)
        a19 = b19 ^ (~b15 & b16)
        a20 = b20 ^ (~b21 & b22)
        a21 = b21 ^ (~b22 & b23)
        a22 = b22 ^ (~b23 & b24)
        a23 = b23 ^ (~b24 & b20)
        a24 = b24 ^ (~b20 & b21)
        a0 ^= rc
    a[:] = (a0 & M, a1 & M, a2 & M, a3 & M, a4 & M, a5 & M, a6 & M, a7 & M,
            a8 & M, a9 & M, a10 & M, a11 & M, a12 & M, a13 & M, a14 & M,
            a15 & M, a16 & M, a17 & M, a18 & M, a19 & M, a20 & M, a21 & M,
            a22 & M, a23 & M, a24 & M)


def keccak256(data: bytes) -> bytes:
    rate = 136  # 1088-bit rate for 256-bit output
    a = [0] * 25
    # absorb with Keccak multi-rate padding: 0x01 ... 0x80
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80" if pad_len >= 2 else b"\x81"
    for off in range(0, len(padded), rate):
        block = padded[off : off + rate]
        for i in range(17):  # rate // 8 lanes, flat index i = x + 5y
            a[i] ^= int.from_bytes(block[8 * i : 8 * i + 8], "little")
        _keccak_f1600(a)
    # squeeze 32 bytes (< rate, one squeeze)
    return b"".join(a[i].to_bytes(8, "little") for i in range(4))

"""RSA-PSS (SHA-256) and PKCS#8 key handling for the permaweb plane.

The reference's rollup uploader signs Arweave transactions with an RSA
wallet (ar_fs.rs:63-96: a 2048-bit ``RsaPrivateKey`` stored as PKCS#8
DER under the node key store, RSA-PSS signatures via arweave-rs).
This module provides the same primitives dependency-free:

- key generation (Miller-Rabin; uses the ``cryptography`` package for
  speed when it happens to be importable, pure Python otherwise),
- PKCS#8 / PKCS#1 DER encode + decode (hand-rolled ASN.1 — the subset
  RSA keys need: SEQUENCE / INTEGER / OCTET STRING / OID / NULL),
- EMSA-PSS sign/verify with SHA-256 and MGF1-SHA256, salt length 32
  (the parameters Arweave uses; RFC 8017 §9.1),
- the Arweave owner/address derivation (owner = base64url(n_bytes),
  address = base64url(sha256(owner_bytes))).

Tests cross-validate signatures and DER against the ``cryptography``
package when present, so the pure-Python path cannot drift silently.
"""

from __future__ import annotations

import base64
import hashlib
import secrets
from dataclasses import dataclass

# --------------------------------------------------------------- base64url


def b64url_encode(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).decode().rstrip("=")


def b64url_decode(s: str) -> bytes:
    pad = -len(s) % 4
    return base64.urlsafe_b64decode(s + "=" * pad)


# ------------------------------------------------------------------ primes

_SMALL_PRIMES = [
    2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61,
    67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131, 137,
    139, 149, 151, 157, 163, 167, 173, 179, 181, 191, 193, 197, 199,
    211, 223, 227, 229, 233, 239, 241, 251, 257, 263, 269, 271, 277,
    281, 283, 293, 307, 311, 313, 317, 331, 337, 347, 349, 353, 359,
]


def is_probable_prime(n: int, rounds: int = 40, rng=None) -> bool:
    if n < 2:
        return False
    for p in _SMALL_PRIMES:
        if n == p:
            return True
        if n % p == 0:
            return False
    d = n - 1
    r = 0
    while d % 2 == 0:
        d //= 2
        r += 1
    rand = rng.randrange if rng is not None else (
        lambda a, b: a + secrets.randbelow(b - a)
    )
    for _ in range(rounds):
        a = rand(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = (x * x) % n
            if x == n - 1:
                break
        else:
            return False
    return True


def _gen_prime(bits: int, rng=None) -> int:
    while True:
        if rng is not None:
            cand = rng.getrandbits(bits)
        else:
            cand = secrets.randbits(bits)
        cand |= (1 << (bits - 1)) | 1  # exact bit length, odd
        if is_probable_prime(cand, rng=rng):
            return cand


# -------------------------------------------------------------------- keys


@dataclass
class RsaKey:
    """RSA private key with CRT components (PKCS#1 layout)."""

    n: int
    e: int
    d: int
    p: int
    q: int
    dp: int
    dq: int
    qinv: int

    @property
    def bits(self) -> int:
        return self.n.bit_length()

    @property
    def n_bytes(self) -> bytes:
        return self.n.to_bytes((self.bits + 7) // 8, "big")

    def owner_b64(self) -> str:
        """Arweave wallet 'owner' field: base64url of the raw modulus."""
        return b64url_encode(self.n_bytes)

    def address(self) -> str:
        """Arweave wallet address: base64url(sha256(owner bytes))."""
        return b64url_encode(hashlib.sha256(self.n_bytes).digest())


def generate_key(bits: int = 2048, e: int = 65537, rng=None) -> RsaKey:
    """Generate an RSA key. ``rng`` (a ``random.Random``) makes the key
    deterministic — test fixtures only; production callers leave it None
    (``secrets``). Uses the ``cryptography`` package for speed when it is
    importable AND no deterministic rng was requested."""
    if rng is None:
        try:
            from cryptography.hazmat.primitives.asymmetric import rsa as _rsa

            k = _rsa.generate_private_key(public_exponent=e, key_size=bits)
            pr = k.private_numbers()
            pub = pr.public_numbers
            return RsaKey(pub.n, pub.e, pr.d, pr.p, pr.q,
                          pr.dmp1, pr.dmq1, pr.iqmp)
        except ImportError:
            pass
    half = bits // 2
    while True:
        p = _gen_prime(half, rng=rng)
        q = _gen_prime(bits - half, rng=rng)
        if p == q:
            continue
        n = p * q
        if n.bit_length() != bits:
            continue
        phi = (p - 1) * (q - 1)
        try:
            d = pow(e, -1, phi)
        except ValueError:
            continue  # e not invertible mod phi: re-draw
        if p < q:
            p, q = q, p
        return RsaKey(n, e, d, p, q, d % (p - 1), d % (q - 1),
                      pow(q, -1, p))


# ----------------------------------------------------------------- ASN.1


def _der_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    body = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(body)]) + body


def _der_int(v: int) -> bytes:
    body = v.to_bytes((v.bit_length() + 7) // 8, "big") or b"\x00"
    if body[0] & 0x80:
        body = b"\x00" + body  # keep it non-negative
    return b"\x02" + _der_len(len(body)) + body


def _der_seq(*parts: bytes) -> bytes:
    body = b"".join(parts)
    return b"\x30" + _der_len(len(body)) + body


def _der_octets(body: bytes) -> bytes:
    return b"\x04" + _der_len(len(body)) + body


_RSA_OID = bytes.fromhex("06092a864886f70d010101")  # 1.2.840.113549.1.1.1
_NULL = b"\x05\x00"


class _DerReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def _read_header(self) -> tuple[int, int]:
        tag = self.data[self.pos]
        self.pos += 1
        first = self.data[self.pos]
        self.pos += 1
        if first < 0x80:
            return tag, first
        nlen = first & 0x7F
        length = int.from_bytes(self.data[self.pos:self.pos + nlen], "big")
        self.pos += nlen
        return tag, length

    def expect(self, tag: int) -> bytes:
        got, length = self._read_header()
        if got != tag:
            raise ValueError(f"DER: expected tag {tag:#x}, got {got:#x}")
        body = self.data[self.pos:self.pos + length]
        if len(body) != length:
            raise ValueError("DER: truncated")
        self.pos += length
        return body

    def read_int(self) -> int:
        return int.from_bytes(self.expect(0x02), "big")


def key_to_pkcs1_der(key: RsaKey) -> bytes:
    return _der_seq(
        _der_int(0), _der_int(key.n), _der_int(key.e), _der_int(key.d),
        _der_int(key.p), _der_int(key.q), _der_int(key.dp),
        _der_int(key.dq), _der_int(key.qinv),
    )


def key_to_pkcs8_der(key: RsaKey) -> bytes:
    """PrivateKeyInfo: version 0, rsaEncryption, PKCS#1 key octets —
    the exact format ar_fs.rs stores under the node key store."""
    return _der_seq(
        _der_int(0),
        _der_seq(_RSA_OID, _NULL),
        _der_octets(key_to_pkcs1_der(key)),
    )


def key_from_pkcs8_der(der: bytes) -> RsaKey:
    outer = _DerReader(der)
    info = _DerReader(outer.expect(0x30))
    if info.read_int() != 0:
        raise ValueError("PKCS8: unsupported version")
    alg = _DerReader(info.expect(0x30))
    if alg.expect(0x06) != _RSA_OID[2:]:
        raise ValueError("PKCS8: not an RSA key")
    inner = _DerReader(info.expect(0x04))
    body = _DerReader(inner.expect(0x30))
    if body.read_int() != 0:
        raise ValueError("PKCS1: unsupported version")
    n, e, d, p, q, dp, dq, qinv = (body.read_int() for _ in range(8))
    return RsaKey(n, e, d, p, q, dp, dq, qinv)


# -------------------------------------------------------------------- PSS

_HLEN = 32  # SHA-256
_SLEN = 32  # Arweave's RSA-PSS salt length


def _mgf1(seed: bytes, length: int) -> bytes:
    out = bytearray()
    for counter in range((length + _HLEN - 1) // _HLEN):
        out += hashlib.sha256(seed + counter.to_bytes(4, "big")).digest()
    return bytes(out[:length])


def _pss_encode(msg: bytes, em_bits: int, salt: bytes) -> bytes:
    em_len = (em_bits + 7) // 8
    if em_len < _HLEN + len(salt) + 2:
        raise ValueError("modulus too small for PSS")
    mhash = hashlib.sha256(msg).digest()
    h = hashlib.sha256(b"\x00" * 8 + mhash + salt).digest()
    ps = b"\x00" * (em_len - len(salt) - _HLEN - 2)
    db = ps + b"\x01" + salt
    masked = bytes(a ^ b for a, b in zip(db, _mgf1(h, len(db))))
    # clear the leftmost 8*emLen - emBits bits
    masked = bytes([masked[0] & (0xFF >> (8 * em_len - em_bits))]) + masked[1:]
    return masked + h + b"\xbc"


def _rsasp1(key: RsaKey, m: int) -> int:
    # CRT speedup: two half-size exponentiations
    m1 = pow(m % key.p, key.dp, key.p)
    m2 = pow(m % key.q, key.dq, key.q)
    h = (key.qinv * (m1 - m2)) % key.p
    return m2 + key.q * h


def pss_sign(key: RsaKey, msg: bytes, salt: bytes | None = None) -> bytes:
    """RSASSA-PSS signature over ``msg`` (SHA-256 / MGF1-SHA256 / 32-byte
    salt — the Arweave parameters). ``salt`` override is for tests."""
    em_bits = key.bits - 1
    if salt is None:
        salt = secrets.token_bytes(_SLEN)
    em = _pss_encode(msg, em_bits, salt)
    k = (key.bits + 7) // 8
    s = _rsasp1(key, int.from_bytes(em, "big"))
    return s.to_bytes(k, "big")


def pss_verify(n: int, e: int, msg: bytes, sig: bytes) -> bool:
    k = (n.bit_length() + 7) // 8
    if len(sig) != k:
        return False
    s = int.from_bytes(sig, "big")
    if s >= n:
        return False
    em_bits = n.bit_length() - 1
    em_len = (em_bits + 7) // 8
    em = pow(s, e, n).to_bytes(k, "big")[-em_len:]
    if em[-1] != 0xBC:
        return False
    masked, h = em[:em_len - _HLEN - 1], em[em_len - _HLEN - 1:-1]
    top_mask = 0xFF >> (8 * em_len - em_bits)
    if masked[0] & ~top_mask & 0xFF:
        return False
    db = bytes(a ^ b for a, b in zip(masked, _mgf1(h, len(masked))))
    db = bytes([db[0] & top_mask]) + db[1:]
    sep = em_len - _HLEN - _SLEN - 2
    if db[:sep] != b"\x00" * sep or db[sep] != 0x01:
        return False
    salt = db[sep + 1:]
    mhash = hashlib.sha256(msg).digest()
    return hashlib.sha256(b"\x00" * 8 + mhash + salt).digest() == h

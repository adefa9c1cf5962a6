"""Arweave (permaweb) transaction format: deephash, chunk merkle, sign.

The reference uploads every rollup artifact as an Arweave data
transaction (ar_fs.rs:135-190 ``upload_file`` via arweave-rs) with a
tag manifest carrying the chain back-pointers, and its recovery plane
downloads/walks those transactions (ar_toolbox.rs:63-71,166-214).
This module implements the public Arweave v2 transaction format those
libraries speak — from the protocol spec, dependency-free:

- ``deep_hash``: the SHA-384 list/blob hash Arweave signs
  (tag ``"blob"+len`` / ``"list"+len``, accumulator chaining),
- chunking + merkle ``data_root`` (256 KiB max / 32 KiB min chunks,
  last-two-balanced split; leaf = H(H(data_hash) || H(note)),
  branch = H(H(left) || H(right) || H(note)), note = 32-byte offset),
- per-chunk inclusion proofs (``data_path``) and ``validate_path`` —
  the validation a gateway/miner runs on POST /chunk,
- transaction build / sign (RSA-PSS via crypto/rsa.py) / verify;
  ``id = sha256(signature)``.

Used by sources/permaweb.py (the upload/recovery client).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field

from rtstore_spark.crypto.rsa import (
    RsaKey,
    b64url_decode,
    b64url_encode,
    pss_sign,
    pss_verify,
)

MAX_CHUNK_SIZE = 256 * 1024
MIN_CHUNK_SIZE = 32 * 1024
_NOTE_SIZE = 32
_HASH_SIZE = 32


def _sha256(data: bytes) -> bytes:
    return hashlib.sha256(data).digest()


def _sha384(data: bytes) -> bytes:
    return hashlib.sha384(data).digest()


def _note(value: int) -> bytes:
    return value.to_bytes(_NOTE_SIZE, "big")


# --------------------------------------------------------------- deephash


def deep_hash(data) -> bytes:
    """Arweave deepHash: nested lists of byte blobs → 48-byte digest."""
    if isinstance(data, (list, tuple)):
        tag = b"list" + str(len(data)).encode()
        acc = _sha384(tag)
        for item in data:
            acc = _sha384(acc + deep_hash(item))
        return acc
    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise TypeError(f"deep_hash: blob or list required, got {type(data)}")
    blob = bytes(data)
    tag = b"blob" + str(len(blob)).encode()
    return _sha384(_sha384(tag) + _sha384(blob))


# ----------------------------------------------------------------- merkle


@dataclass
class Chunk:
    data_hash: bytes
    min_byte_range: int
    max_byte_range: int


@dataclass
class _Node:
    id: bytes
    max_byte_range: int
    # branch-only:
    split: int | None = None
    left: "_Node | None" = None
    right: "_Node | None" = None
    # leaf-only:
    data_hash: bytes | None = None


@dataclass
class Proof:
    offset: int          # max_byte_range - 1 of the proven chunk
    proof: bytes         # the data_path blob


def chunk_data(data: bytes) -> list[Chunk]:
    """Split into ≤256 KiB chunks; when the tail would fall under
    32 KiB, the last two chunks balance to ~equal halves. An exact
    multiple of the chunk size yields a trailing zero-length chunk that
    participates in the tree but is never uploaded (protocol rule)."""
    chunks: list[Chunk] = []
    cursor = 0
    rest = memoryview(data)
    while len(rest) >= MAX_CHUNK_SIZE:
        size = MAX_CHUNK_SIZE
        leftover = len(rest) - MAX_CHUNK_SIZE
        if 0 < leftover < MIN_CHUNK_SIZE:
            size = (len(rest) + 1) // 2
        piece = bytes(rest[:size])
        chunks.append(Chunk(_sha256(piece), cursor, cursor + size))
        cursor += size
        rest = rest[size:]
    chunks.append(Chunk(_sha256(bytes(rest)), cursor, cursor + len(rest)))
    return chunks


def _leaf(chunk: Chunk) -> _Node:
    return _Node(
        id=_sha256(
            _sha256(chunk.data_hash) + _sha256(_note(chunk.max_byte_range))
        ),
        max_byte_range=chunk.max_byte_range,
        data_hash=chunk.data_hash,
    )


def _build_layers(nodes: list[_Node]) -> _Node:
    while len(nodes) > 1:
        nxt: list[_Node] = []
        for i in range(0, len(nodes), 2):
            left = nodes[i]
            if i + 1 >= len(nodes):
                nxt.append(left)  # odd node promotes unchanged
                continue
            right = nodes[i + 1]
            nxt.append(_Node(
                id=_sha256(
                    _sha256(left.id) + _sha256(right.id)
                    + _sha256(_note(left.max_byte_range))
                ),
                max_byte_range=right.max_byte_range,
                split=left.max_byte_range,
                left=left,
                right=right,
            ))
        nodes = nxt
    return nodes[0]


def _proofs(node: _Node, prefix: bytes) -> list[Proof]:
    if node.data_hash is not None:  # leaf
        return [Proof(
            offset=node.max_byte_range - 1,
            proof=prefix + node.data_hash + _note(node.max_byte_range),
        )]
    seg = node.left.id + node.right.id + _note(node.split)
    return (_proofs(node.left, prefix + seg)
            + _proofs(node.right, prefix + seg))


def compute_root(data: bytes) -> tuple[bytes, list[Chunk], list[Proof]]:
    """(data_root, chunks, proofs). A trailing zero-length chunk (exact
    multiple of the chunk size) is dropped from the returned chunk/proof
    lists AFTER the tree is built — it shapes the root but never posts.
    Zero-byte data has an EMPTY data_root (protocol rule: a format-2 tx
    with no data carries no root, not the hash of an empty chunk)."""
    if not data:
        return b"", [], []
    chunks = chunk_data(data)
    root = _build_layers([_leaf(c) for c in chunks])
    proofs = _proofs(root, b"")
    if chunks and chunks[-1].max_byte_range == chunks[-1].min_byte_range:
        chunks = chunks[:-1]
        proofs = proofs[:-1]
    return root.id, chunks, proofs


def validate_path(root_id: bytes, dest: int, left_bound: int,
                  right_bound: int, path: bytes):
    """Gateway-side chunk proof validation (the check a miner runs on
    POST /chunk). Returns the resolved (offset, left, right, size) dict
    or None. Iterative form of the protocol's recursive definition."""
    if right_bound <= 0:
        return None
    if dest >= right_bound:
        dest, left_bound = right_bound - 1, 0
    if dest < 0:
        dest, left_bound = 0, 0
    node_id = root_id
    while True:
        if len(path) == _HASH_SIZE + _NOTE_SIZE:
            data_hash = path[:_HASH_SIZE]
            end_offset = path[_HASH_SIZE:]
            if node_id != _sha256(_sha256(data_hash) + _sha256(end_offset)):
                return None
            return {
                "offset": right_bound - 1,
                "left_bound": left_bound,
                "right_bound": right_bound,
                "chunk_size": right_bound - left_bound,
                "data_hash": data_hash,
            }
        if len(path) < 2 * _HASH_SIZE + _NOTE_SIZE:
            return None
        left = path[:_HASH_SIZE]
        right = path[_HASH_SIZE:2 * _HASH_SIZE]
        off_raw = path[2 * _HASH_SIZE:2 * _HASH_SIZE + _NOTE_SIZE]
        offset = int.from_bytes(off_raw, "big")
        if node_id != _sha256(_sha256(left) + _sha256(right) + _sha256(off_raw)):
            return None
        path = path[2 * _HASH_SIZE + _NOTE_SIZE:]
        if dest < offset:
            node_id, right_bound = left, min(right_bound, offset)
        else:
            node_id, left_bound = right, max(left_bound, offset)


# ------------------------------------------------------------ transaction


def _tag_bytes(s: str) -> bytes:
    # surrogateescape keeps arbitrary (non-UTF-8) tag bytes round-trippable:
    # Arweave tags are raw bytes and a foreign tx in a recovered chain may
    # carry binary values; strict codecs would abort the whole chain walk
    return s.encode("utf-8", "surrogateescape")


def _tag_str(b: bytes) -> str:
    return b.decode("utf-8", "surrogateescape")


@dataclass
class Tag:
    name: str
    value: str

    def to_json(self) -> dict:
        return {
            "name": b64url_encode(_tag_bytes(self.name)),
            "value": b64url_encode(_tag_bytes(self.value)),
        }

    @classmethod
    def from_json(cls, d: dict) -> "Tag":
        return cls(
            _tag_str(b64url_decode(d["name"])),
            _tag_str(b64url_decode(d["value"])),
        )


@dataclass
class Transaction:
    """Arweave v2 data transaction (the only kind the rollup plane
    makes: no target, quantity 0, data shipped as chunks)."""

    owner: str            # base64url modulus
    last_tx: str          # anchor from GET /tx_anchor
    reward: str           # winston, decimal string (GET /price/{size})
    data_size: int
    data_root: bytes
    tags: list[Tag] = field(default_factory=list)
    quantity: str = "0"
    target: str = ""
    signature: str = ""   # base64url
    id: str = ""          # base64url(sha256(raw signature))

    def signature_data(self) -> bytes:
        return deep_hash([
            b"2",
            b64url_decode(self.owner),
            b64url_decode(self.target) if self.target else b"",
            self.quantity.encode(),
            self.reward.encode(),
            b64url_decode(self.last_tx) if self.last_tx else b"",
            [[_tag_bytes(t.name), _tag_bytes(t.value)] for t in self.tags],
            str(self.data_size).encode(),
            self.data_root,
        ])

    def sign(self, key: RsaKey) -> "Transaction":
        if key.owner_b64() != self.owner:
            raise ValueError("signing key does not match tx owner")
        raw = pss_sign(key, self.signature_data())
        self.signature = b64url_encode(raw)
        self.id = b64url_encode(_sha256(raw))
        return self

    def verify(self) -> bool:
        if not self.signature or not self.id:
            return False
        raw = b64url_decode(self.signature)
        if b64url_encode(_sha256(raw)) != self.id:
            return False
        n = int.from_bytes(b64url_decode(self.owner), "big")
        return pss_verify(n, 65537, self.signature_data(), raw)

    def to_json(self) -> str:
        return json.dumps({
            "format": 2,
            "id": self.id,
            "last_tx": self.last_tx,
            "owner": self.owner,
            "tags": [t.to_json() for t in self.tags],
            "target": self.target,
            "quantity": self.quantity,
            "data": "",          # data ships via POST /chunk
            "data_size": str(self.data_size),
            "data_root": b64url_encode(self.data_root),
            "reward": self.reward,
            "signature": self.signature,
        })

    @classmethod
    def from_json(cls, text: str) -> "Transaction":
        d = json.loads(text)
        if int(d.get("format", 0)) != 2:
            raise ValueError("only format-2 transactions supported")
        return cls(
            owner=d["owner"],
            last_tx=d.get("last_tx", ""),
            reward=str(d.get("reward", "0")),
            data_size=int(d.get("data_size", "0")),
            data_root=b64url_decode(d.get("data_root", "")),
            tags=[Tag.from_json(t) for t in d.get("tags", [])],
            quantity=str(d.get("quantity", "0")),
            target=d.get("target", ""),
            signature=d.get("signature", ""),
            id=d.get("id", ""),
        )


def build_data_transaction(key: RsaKey, data: bytes, tags: list[Tag],
                           anchor: str, reward: str) -> tuple[
                               "Transaction", list[Chunk], list[Proof]]:
    """Build + sign a data transaction; returns (tx, chunks, proofs)
    ready for POST /tx and per-chunk POST /chunk uploads."""
    root, chunks, proofs = compute_root(data)
    tx = Transaction(
        owner=key.owner_b64(),
        last_tx=anchor,
        reward=reward,
        data_size=len(data),
        data_root=root,
        tags=list(tags),
    )
    tx.sign(key)
    return tx, chunks, proofs

"""HPACK (RFC 7541) — header compression for the raw-gRPC HTTP/2 front.

The reference's Java SDK (java/src/main/java/network/db3/client/Client.java:11-13,
``ManagedChannelBuilder.usePlaintext()``) and Rust SDK (src/sdk/src/store_sdk_v2.rs,
tonic) speak gRPC over cleartext HTTP/2, whose header blocks are HPACK-coded.
Implemented from the RFC: integer/string primitives, the Appendix A static
table, a size-bounded dynamic table with eviction, and the Appendix B Huffman
code (decode via a canonical-prefix walk; encode emits the spec codes with the
EOS-prefix padding). Dependency-free like the rest of rtstore_spark/wire/.

The server-side ENCODER is deliberately stateless: full-match static indexing
plus literals WITHOUT incremental indexing, so it never grows the peer's
dynamic table and response blocks decode under any table-size setting. The
DECODER implements the full spec (all four literal forms, indexed fields,
dynamic-table size updates) because clients — grpc-java, tonic — do use
incremental indexing and Huffman strings.
"""

from __future__ import annotations


class HpackError(ValueError):
    """Malformed HPACK block (decode failures are connection errors in h2)."""


# ----------------------------------------------------- RFC 7541 Appendix B
# (code, bit-length) per symbol 0..255 + EOS(256).

_HUFF = [
    (0x1ff8,13), (0x7fffd8,23), (0xfffffe2,28), (0xfffffe3,28), (0xfffffe4,28), (0xfffffe5,28), (0xfffffe6,28), (0xfffffe7,28),
    (0xfffffe8,28), (0xffffea,24), (0x3ffffffc,30), (0xfffffe9,28), (0xfffffea,28), (0x3ffffffd,30), (0xfffffeb,28), (0xfffffec,28),
    (0xfffffed,28), (0xfffffee,28), (0xfffffef,28), (0xffffff0,28), (0xffffff1,28), (0xffffff2,28), (0x3ffffffe,30), (0xffffff3,28),
    (0xffffff4,28), (0xffffff5,28), (0xffffff6,28), (0xffffff7,28), (0xffffff8,28), (0xffffff9,28), (0xffffffa,28), (0xffffffb,28),
    (0x14,6), (0x3f8,10), (0x3f9,10), (0xffa,12), (0x1ff9,13), (0x15,6), (0xf8,8), (0x7fa,11),
    (0x3fa,10), (0x3fb,10), (0xf9,8), (0x7fb,11), (0xfa,8), (0x16,6), (0x17,6), (0x18,6),
    (0x0,5), (0x1,5), (0x2,5), (0x19,6), (0x1a,6), (0x1b,6), (0x1c,6), (0x1d,6),
    (0x1e,6), (0x1f,6), (0x5c,7), (0xfb,8), (0x7ffc,15), (0x20,6), (0xffb,12), (0x3fc,10),
    (0x1ffa,13), (0x21,6), (0x5d,7), (0x5e,7), (0x5f,7), (0x60,7), (0x61,7), (0x62,7),
    (0x63,7), (0x64,7), (0x65,7), (0x66,7), (0x67,7), (0x68,7), (0x69,7), (0x6a,7),
    (0x6b,7), (0x6c,7), (0x6d,7), (0x6e,7), (0x6f,7), (0x70,7), (0x71,7), (0x72,7),
    (0xfc,8), (0x73,7), (0xfd,8), (0x1ffb,13), (0x7fff0,19), (0x1ffc,13), (0x3ffc,14), (0x22,6),
    (0x7ffd,15), (0x3,5), (0x23,6), (0x4,5), (0x24,6), (0x5,5), (0x25,6), (0x26,6),
    (0x27,6), (0x6,5), (0x74,7), (0x75,7), (0x28,6), (0x29,6), (0x2a,6), (0x7,5),
    (0x2b,6), (0x76,7), (0x2c,6), (0x8,5), (0x9,5), (0x2d,6), (0x77,7), (0x78,7),
    (0x79,7), (0x7a,7), (0x7b,7), (0x7ffe,15), (0x7fc,11), (0x3ffd,14), (0x1ffd,13), (0xffffffc,28),
    (0xfffe6,20), (0x3fffd2,22), (0xfffe7,20), (0xfffe8,20), (0x3fffd3,22), (0x3fffd4,22), (0x3fffd5,22), (0x7fffd9,23),
    (0x3fffd6,22), (0x7fffda,23), (0x7fffdb,23), (0x7fffdc,23), (0x7fffdd,23), (0x7fffde,23), (0xffffeb,24), (0x7fffdf,23),
    (0xffffec,24), (0xffffed,24), (0x3fffd7,22), (0x7fffe0,23), (0xffffee,24), (0x7fffe1,23), (0x7fffe2,23), (0x7fffe3,23),
    (0x7fffe4,23), (0x1fffdc,21), (0x3fffd8,22), (0x7fffe5,23), (0x3fffd9,22), (0x7fffe6,23), (0x7fffe7,23), (0xffffef,24),
    (0x3fffda,22), (0x1fffdd,21), (0xfffe9,20), (0x3fffdb,22), (0x3fffdc,22), (0x7fffe8,23), (0x7fffe9,23), (0x1fffde,21),
    (0x7fffea,23), (0x3fffdd,22), (0x3fffde,22), (0xfffff0,24), (0x1fffdf,21), (0x3fffdf,22), (0x7fffeb,23), (0x7fffec,23),
    (0x1fffe0,21), (0x1fffe1,21), (0x3fffe0,22), (0x1fffe2,21), (0x7fffed,23), (0x3fffe1,22), (0x7fffee,23), (0x7fffef,23),
    (0xfffea,20), (0x3fffe2,22), (0x3fffe3,22), (0x3fffe4,22), (0x7ffff0,23), (0x3fffe5,22), (0x3fffe6,22), (0x7ffff1,23),
    (0x3ffffe0,26), (0x3ffffe1,26), (0xfffeb,20), (0x7fff1,19), (0x3fffe7,22), (0x7ffff2,23), (0x3fffe8,22), (0x1ffffec,25),
    (0x3ffffe2,26), (0x3ffffe3,26), (0x3ffffe4,26), (0x7ffffde,27), (0x7ffffdf,27), (0x3ffffe5,26), (0xfffff1,24), (0x1ffffed,25),
    (0x7fff2,19), (0x1fffe3,21), (0x3ffffe6,26), (0x7ffffe0,27), (0x7ffffe1,27), (0x3ffffe7,26), (0x7ffffe2,27), (0xfffff2,24),
    (0x1fffe4,21), (0x1fffe5,21), (0x3ffffe8,26), (0x3ffffe9,26), (0xffffffd,28), (0x7ffffe3,27), (0x7ffffe4,27), (0x7ffffe5,27),
    (0xfffec,20), (0xfffff3,24), (0xfffed,20), (0x1fffe6,21), (0x3fffe9,22), (0x1fffe7,21), (0x1fffe8,21), (0x7ffff3,23),
    (0x3fffea,22), (0x3fffeb,22), (0x1ffffee,25), (0x1ffffef,25), (0xfffff4,24), (0xfffff5,24), (0x3ffffea,26), (0x7ffff4,23),
    (0x3ffffeb,26), (0x7ffffe6,27), (0x3ffffec,26), (0x3ffffed,26), (0x7ffffe7,27), (0x7ffffe8,27), (0x7ffffe9,27), (0x7ffffea,27),
    (0x7ffffeb,27), (0xffffffe,28), (0x7ffffec,27), (0x7ffffed,27), (0x7ffffee,27), (0x7ffffef,27), (0x7fffff0,27), (0x3ffffee,26),
    (0x3fffffff,30),
]


_ENC = _HUFF  # symbol -> (code, nbits)
# decode: canonical prefix walk over a (nbits, code) -> symbol map; Huffman
# codes here are at most 30 bits and self-delimiting by construction
_DEC = {(bits, code): sym for sym, (code, bits) in enumerate(_HUFF)}
_EOS = 256


def huffman_encode(data: bytes) -> bytes:
    acc = 0
    nbits = 0
    out = bytearray()
    for b in data:
        code, n = _ENC[b]
        acc = (acc << n) | code
        nbits += n
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        # truncate emitted high bits: without this the accumulator grows
        # with the input and every shift turns O(len), making the whole
        # encode quadratic in the string length
        acc &= (1 << nbits) - 1
    if nbits:
        # pad with the EOS prefix (all ones)
        out.append(((acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)) & 0xFF)
    return bytes(out)


def huffman_decode(data: bytes) -> bytes:
    out = bytearray()
    code = 0
    nbits = 0
    for byte in data:
        for shift in range(7, -1, -1):
            code = (code << 1) | ((byte >> shift) & 1)
            nbits += 1
            sym = _DEC.get((nbits, code))
            if sym is not None:
                if sym == _EOS:
                    raise HpackError("EOS symbol inside a Huffman string")
                out.append(sym)
                code = 0
                nbits = 0
            elif nbits > 30:
                raise HpackError("Huffman code longer than any defined code")
    # leftover bits must be a prefix of EOS (all ones), fewer than 8 bits
    if nbits >= 8:
        raise HpackError("Huffman padding of 8+ bits")
    if code != (1 << nbits) - 1:
        raise HpackError("Huffman padding is not an EOS prefix")
    return bytes(out)


# ----------------------------------------------------- RFC 7541 Appendix A

STATIC_TABLE: tuple[tuple[str, str], ...] = (
    (":authority", ""), (":method", "GET"), (":method", "POST"),
    (":path", "/"), (":path", "/index.html"), (":scheme", "http"),
    (":scheme", "https"), (":status", "200"), (":status", "204"),
    (":status", "206"), (":status", "304"), (":status", "400"),
    (":status", "404"), (":status", "500"), ("accept-charset", ""),
    ("accept-encoding", "gzip, deflate"), ("accept-language", ""),
    ("accept-ranges", ""), ("accept", ""),
    ("access-control-allow-origin", ""), ("age", ""), ("allow", ""),
    ("authorization", ""), ("cache-control", ""),
    ("content-disposition", ""), ("content-encoding", ""),
    ("content-language", ""), ("content-length", ""),
    ("content-location", ""), ("content-range", ""), ("content-type", ""),
    ("cookie", ""), ("date", ""), ("etag", ""), ("expect", ""),
    ("expires", ""), ("from", ""), ("host", ""), ("if-match", ""),
    ("if-modified-since", ""), ("if-none-match", ""), ("if-range", ""),
    ("if-unmodified-since", ""), ("last-modified", ""), ("link", ""),
    ("location", ""), ("max-forwards", ""), ("proxy-authenticate", ""),
    ("proxy-authorization", ""), ("range", ""), ("referer", ""),
    ("refresh", ""), ("retry-after", ""), ("server", ""),
    ("set-cookie", ""), ("strict-transport-security", ""),
    ("transfer-encoding", ""), ("user-agent", ""), ("vary", ""),
    ("via", ""), ("www-authenticate", ""),
)
_STATIC_FULL = {pair: i + 1 for i, pair in enumerate(STATIC_TABLE)}
_STATIC_LEN = len(STATIC_TABLE)  # 61


# ------------------------------------------------------------- primitives


def encode_int(value: int, prefix_bits: int, flags: int = 0) -> bytes:
    """RFC 7541 §5.1 integer with ``prefix_bits`` available in the first
    byte; ``flags`` are the instruction bits above the prefix."""
    limit = (1 << prefix_bits) - 1
    if value < limit:
        return bytes([flags | value])
    out = bytearray([flags | limit])
    value -= limit
    while value >= 0x80:
        out.append((value & 0x7F) | 0x80)
        value >>= 7
    out.append(value)
    return bytes(out)


def decode_int(data: bytes, pos: int, prefix_bits: int) -> tuple[int, int]:
    limit = (1 << prefix_bits) - 1
    if pos >= len(data):
        raise HpackError("truncated integer")
    value = data[pos] & limit
    pos += 1
    if value < limit:
        return value, pos
    shift = 0
    while True:
        if pos >= len(data):
            raise HpackError("truncated integer continuation")
        b = data[pos]
        pos += 1
        value += (b & 0x7F) << shift
        shift += 7
        if shift > 62:
            raise HpackError("integer overflow")
        if not b & 0x80:
            return value, pos


def _decode_string(data: bytes, pos: int) -> tuple[str, int, int]:
    """→ (string, new pos, decoded OCTET length). The octet length is what
    RFC 7541 §4.1 table accounting uses — it can differ from
    ``len(s.encode())`` when non-UTF8 header octets fall back to latin-1."""
    if pos >= len(data):
        raise HpackError("truncated string")
    huff = bool(data[pos] & 0x80)
    length, pos = decode_int(data, pos, 7)
    if pos + length > len(data):
        raise HpackError("string overruns block")
    raw = data[pos : pos + length]
    pos += length
    if huff:
        raw = huffman_decode(raw)
    try:
        return raw.decode("utf-8"), pos, len(raw)
    except UnicodeDecodeError:
        return raw.decode("latin-1"), pos, len(raw)  # header octets are opaque


def _encode_string(s: str, huffman: bool = False) -> bytes:
    raw = s.encode("utf-8")
    if huffman:
        enc = huffman_encode(raw)
        if len(enc) < len(raw):
            return encode_int(len(enc), 7, 0x80) + enc
    return encode_int(len(raw), 7, 0x00) + raw


# ---------------------------------------------------------------- decoder


class HpackDecoder:
    """Stateful header-block decoder: one per h2 connection direction."""

    def __init__(self, max_table_size: int = 4096):
        self.settings_max = max_table_size  # bound from SETTINGS
        self.max_size = max_table_size      # current (peer may lower it)
        self._dyn: list[tuple[str, str]] = []  # newest first
        self._dyn_size = 0

    def _evict(self) -> None:
        while self._dyn_size > self.max_size:
            entry = self._dyn.pop()
            self._dyn_size -= entry[2]

    def _insert(self, name: str, value: str, name_oct: int, value_oct: int) -> None:
        # entry size = name octets + value octets + 32 (RFC 7541 §4.1),
        # measured on the RECEIVED (decoded) octets, never a re-encode —
        # latin-1-fallback strings would re-encode larger and desync our
        # eviction from the peer encoder's
        size = name_oct + value_oct + 32
        self._dyn.insert(0, (name, value, size, name_oct))
        self._dyn_size += size
        self._evict()

    def _name_octets(self, index: int) -> int:
        """Octet length of an indexed entry's NAME, for re-insertion
        accounting (static names are ASCII; dynamic entries carry theirs)."""
        if index <= _STATIC_LEN:
            return len(STATIC_TABLE[index - 1][0])
        return self._dyn[index - _STATIC_LEN - 1][3]

    def _lookup(self, index: int) -> tuple[str, str]:
        if index <= 0:
            raise HpackError("index 0")
        if index <= _STATIC_LEN:
            return STATIC_TABLE[index - 1]
        d = index - _STATIC_LEN - 1
        if d >= len(self._dyn):
            raise HpackError(f"dynamic index {index} out of range")
        return self._dyn[d][:2]

    def decode(self, block: bytes) -> list[tuple[str, str]]:
        headers: list[tuple[str, str]] = []
        pos = 0
        n = len(block)
        while pos < n:
            b = block[pos]
            if b & 0x80:  # indexed field
                index, pos = decode_int(block, pos, 7)
                headers.append(self._lookup(index))
            elif b & 0x40:  # literal with incremental indexing
                index, pos = decode_int(block, pos, 6)
                if index:
                    name = self._lookup(index)[0]
                    n_oct = self._name_octets(index)
                else:
                    name, pos, n_oct = _decode_string(block, pos)
                value, pos, v_oct = _decode_string(block, pos)
                self._insert(name, value, n_oct, v_oct)
                headers.append((name, value))
            elif b & 0x20:  # dynamic table size update
                size, pos = decode_int(block, pos, 5)
                if size > self.settings_max:
                    raise HpackError("table size update above SETTINGS bound")
                self.max_size = size
                self._evict()
            else:  # literal without indexing (0x00) / never indexed (0x10)
                index, pos = decode_int(block, pos, 4)
                if index:
                    name = self._lookup(index)[0]
                else:
                    name, pos, _ = _decode_string(block, pos)
                value, pos, _ = _decode_string(block, pos)
                headers.append((name, value))
        return headers


# ---------------------------------------------------------------- encoder


class HpackEncoder:
    """Stateless-by-design encoder (see module docstring). ``huffman=True``
    Huffman-codes literals when shorter — used by the test client to
    exercise the decoder's Huffman path the way grpc-java would."""

    def __init__(self, huffman: bool = False):
        self.huffman = huffman

    def encode(self, headers: list[tuple[str, str]]) -> bytes:
        out = bytearray()
        for name, value in headers:
            idx = _STATIC_FULL.get((name, value))
            if idx:
                out += encode_int(idx, 7, 0x80)
                continue
            out += encode_int(0, 4)  # literal, new name, no indexing
            out += _encode_string(name, self.huffman)
            out += _encode_string(value, self.huffman)
        return bytes(out)


_STATIC_NAME_FIRST: dict[str, int] = {}
for _i, (_n, _v) in enumerate(STATIC_TABLE):
    _STATIC_NAME_FIRST.setdefault(_n, _i + 1)


class HpackDynamicEncoder:
    """Stateful response encoder: incremental indexing over a dynamic
    table, the way grpc-java/netty and tonic/hyper encode RESPONSE
    headers (`:status 200` / `content-type: application/grpc` /
    `grpc-status 0` repeat on every RPC of a long-lived channel, so
    after the first response each header block collapses to a few
    indexed-field bytes).

    Server-side opt-in (``GrpcH2Server(hpack_dynamic=True)``): the
    encoder's table mirrors state the CLIENT's decoder builds, so
    encode order must equal wire order — the connection serializes
    encode+send under one lock. ``set_max_size`` applies the client's
    SETTINGS_HEADER_TABLE_SIZE (RFC 7541 §4.2): a shrink evicts now and
    announces itself as a table-size update at the head of the next
    block; the local cap never exceeds the 4096 default, whatever the
    peer advertises, to bound per-connection memory."""

    LOCAL_CAP = 4096

    def __init__(self, huffman: bool = False):
        self.huffman = huffman
        self.max_size = self.LOCAL_CAP  # RFC 7541 default table size
        self.table: list[tuple[str, str]] = []  # newest first
        self.size = 0
        # RFC 7541 §4.2: between two header blocks the SMALLEST maximum
        # that occurred MUST be signaled (then the final value, if it
        # differs) — a shrink-then-regrow needs TWO updates; keeping
        # only the last would hide the shrink from the peer's decoder
        # (COMPRESSION_ERROR on strict peers)
        self._pending_min: int | None = None
        self._pending_final: int | None = None

    def set_max_size(self, peer_max: int) -> None:
        new = min(int(peer_max), self.LOCAL_CAP)
        if new == self.max_size and self._pending_final is None:
            return
        self._pending_min = new if self._pending_min is None else min(
            self._pending_min, new
        )
        self._pending_final = new
        self.max_size = new
        self._evict()

    def _entry_size(self, n: str, v: str) -> int:
        return len(n.encode()) + len(v.encode()) + 32

    def _evict(self) -> None:
        while self.size > self.max_size and self.table:
            n, v = self.table.pop()
            self.size -= self._entry_size(n, v)

    def _insert(self, n: str, v: str) -> None:
        sz = self._entry_size(n, v)
        if sz > self.max_size:
            # an oversized entry empties the table and indexes nothing
            self.table.clear()
            self.size = 0
            return
        self.table.insert(0, (n, v))
        self.size += sz
        self._evict()

    def encode(self, headers: list[tuple[str, str]]) -> bytes:
        out = bytearray()
        if self._pending_final is not None:
            if self._pending_min != self._pending_final:
                out += encode_int(self._pending_min, 5, 0x20)
            out += encode_int(self._pending_final, 5, 0x20)
            self._pending_min = self._pending_final = None
        for name, value in headers:
            idx = _STATIC_FULL.get((name, value))
            if idx:
                out += encode_int(idx, 7, 0x80)
                continue
            dyn = next(
                (i for i, e in enumerate(self.table) if e == (name, value)),
                None,
            )
            if dyn is not None:
                out += encode_int(62 + dyn, 7, 0x80)
                continue
            # literal WITH incremental indexing, indexed name when known
            ni = _STATIC_NAME_FIRST.get(name, 0)
            if ni == 0:
                dyn_name = next(
                    (i for i, e in enumerate(self.table) if e[0] == name),
                    None,
                )
                if dyn_name is not None:
                    ni = 62 + dyn_name
            out += encode_int(ni, 6, 0x40)
            if not ni:
                out += _encode_string(name, self.huffman)
            out += _encode_string(value, self.huffman)
            self._insert(name, value)
        return bytes(out)

"""Permaweb plane: RSA-PSS wallet, Arweave tx format, gateway client.

Covers crypto/rsa.py (cross-validated against the ``cryptography``
package where available — PKCS#8 DER both directions, signatures both
directions), wire/arweave.py (deephash, chunk merkle + proofs,
transaction sign/verify), and sources/permaweb.py against an
IN-PROCESS gateway that validates requests the way a real Arweave
node does: id = sha256(signature), RSA-PSS over the deephash, anchor
freshness, fee floor, and a full merkle proof check on every posted
chunk. No network leaves the process.
"""

from __future__ import annotations

import hashlib
import json
import os
import random
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from rtstore_spark.crypto.rsa import (
    b64url_decode,
    b64url_encode,
    generate_key,
    key_from_pkcs8_der,
    key_to_pkcs8_der,
    pss_sign,
    pss_verify,
)
from rtstore_spark.wire.arweave import (
    MAX_CHUNK_SIZE,
    MIN_CHUNK_SIZE,
    Tag,
    Transaction,
    build_data_transaction,
    chunk_data,
    compute_root,
    deep_hash,
    validate_path,
)

# deterministic, fast (pure-python path; 768 bits is plenty for PSS-32)
TEST_BITS = 768


@pytest.fixture(scope="module")
def key():
    return generate_key(bits=TEST_BITS, rng=random.Random(0xA77))


# ------------------------------------------------------------------- RSA


class TestRsa:
    def test_sign_verify_roundtrip(self, key):
        msg = b"rollup artifact bytes"
        sig = pss_sign(key, msg)
        assert pss_verify(key.n, key.e, msg, sig)
        # PSS is randomized: two signatures differ, both verify
        sig2 = pss_sign(key, msg)
        assert sig != sig2
        assert pss_verify(key.n, key.e, msg, sig2)

    def test_tamper_detection(self, key):
        msg = b"payload"
        sig = pss_sign(key, msg)
        assert not pss_verify(key.n, key.e, b"payloae", sig)
        bad = bytearray(sig)
        bad[len(bad) // 2] ^= 1
        assert not pss_verify(key.n, key.e, msg, bytes(bad))
        assert not pss_verify(key.n, key.e, msg, sig[:-1])

    def test_pkcs8_roundtrip(self, key):
        der = key_to_pkcs8_der(key)
        back = key_from_pkcs8_der(der)
        assert back == key

    def test_deterministic_keygen(self):
        a = generate_key(bits=TEST_BITS, rng=random.Random(42))
        b = generate_key(bits=TEST_BITS, rng=random.Random(42))
        assert a == b
        assert a.bits == TEST_BITS
        # CRT invariants
        assert a.p * a.q == a.n
        assert (a.e * a.d) % ((a.p - 1) * (a.q - 1)) == 1

    def test_owner_and_address_shape(self, key):
        owner = key.owner_b64()
        assert b64url_decode(owner) == key.n_bytes
        addr = key.address()
        assert b64url_decode(addr) == hashlib.sha256(key.n_bytes).digest()


class TestRsaCrossValidation:
    """Against the ``cryptography`` package: the pure-Python signer and
    the DER codec must interoperate with an independent implementation."""

    @pytest.fixture(scope="class")
    def crypto_mod(self):
        return pytest.importorskip("cryptography.hazmat.primitives")

    def test_our_der_loads_and_their_sig_verifies(self, key, crypto_mod):
        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import padding

        their_key = serialization.load_der_private_key(
            key_to_pkcs8_der(key), password=None
        )
        msg = b"interop message"
        their_sig = their_key.sign(
            msg,
            padding.PSS(
                mgf=padding.MGF1(hashes.SHA256()), salt_length=32
            ),
            hashes.SHA256(),
        )
        assert pss_verify(key.n, key.e, msg, their_sig)

    def test_our_sig_verifies_under_their_key(self, key, crypto_mod):
        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import padding

        their_key = serialization.load_der_private_key(
            key_to_pkcs8_der(key), password=None
        )
        msg = b"reverse interop"
        sig = pss_sign(key, msg)
        their_key.public_key().verify(  # raises on mismatch
            sig,
            msg,
            padding.PSS(
                mgf=padding.MGF1(hashes.SHA256()), salt_length=32
            ),
            hashes.SHA256(),
        )

    def test_their_der_loads_in_ours(self, crypto_mod):
        from cryptography.hazmat.primitives import serialization
        from cryptography.hazmat.primitives.asymmetric import rsa

        their = rsa.generate_private_key(public_exponent=65537, key_size=1024)
        der = their.private_bytes(
            serialization.Encoding.DER,
            serialization.PrivateFormat.PKCS8,
            serialization.NoEncryption(),
        )
        ours = key_from_pkcs8_der(der)
        nums = their.private_numbers()
        assert ours.n == nums.public_numbers.n
        assert ours.d == nums.d
        assert ours.qinv == nums.iqmp


# -------------------------------------------------------- deephash/merkle


class TestDeepHash:
    def test_blob_vs_list_distinct(self):
        assert deep_hash(b"ab") != deep_hash([b"ab"])
        assert deep_hash([b"a", b"b"]) != deep_hash(b"ab")
        assert deep_hash([]) != deep_hash(b"")

    def test_nesting_and_sensitivity(self):
        a = deep_hash([b"2", [b"x", b"y"], b"tail"])
        b = deep_hash([b"2", [b"x", b"z"], b"tail"])
        c = deep_hash([b"2", [b"x", b"y"], b"tail "])
        assert len({bytes(a), bytes(b), bytes(c)}) == 3
        assert len(a) == 48  # SHA-384

    def test_rejects_non_blob(self):
        with pytest.raises(TypeError):
            deep_hash([1, 2])


class TestChunking:
    def test_small_single_chunk(self):
        chunks = chunk_data(b"x" * 1000)
        assert [(c.min_byte_range, c.max_byte_range) for c in chunks] == [(0, 1000)]

    def test_exact_multiple_keeps_tree_chunk_drops_upload(self):
        data = bytes(range(256)) * 1024  # exactly 256 KiB
        tree_chunks = chunk_data(data)
        assert [(c.min_byte_range, c.max_byte_range) for c in tree_chunks] == [
            (0, MAX_CHUNK_SIZE), (MAX_CHUNK_SIZE, MAX_CHUNK_SIZE)
        ]
        root, upload_chunks, proofs = compute_root(data)
        assert len(upload_chunks) == len(proofs) == 1

    def test_short_tail_balances_last_two(self):
        n = MAX_CHUNK_SIZE + 1  # tail of 1 byte < MIN: balance
        chunks = chunk_data(b"y" * n)
        sizes = [c.max_byte_range - c.min_byte_range for c in chunks]
        assert sizes == [(n + 1) // 2, n // 2]
        assert all(s >= MIN_CHUNK_SIZE for s in sizes)

    def test_long_tail_stays(self):
        n = 600 * 1024
        sizes = [
            c.max_byte_range - c.min_byte_range for c in chunk_data(b"z" * n)
        ]
        assert sizes == [MAX_CHUNK_SIZE, MAX_CHUNK_SIZE, n - 2 * MAX_CHUNK_SIZE]

    def test_every_proof_validates(self):
        data = bytes(random.Random(3).randbytes(600 * 1024))
        root, chunks, proofs = compute_root(data)
        assert len(chunks) == len(proofs) == 3
        for chunk, proof in zip(chunks, proofs):
            res = validate_path(root, proof.offset, 0, len(data), proof.proof)
            assert res is not None
            assert res["left_bound"] == chunk.min_byte_range
            assert res["right_bound"] == chunk.max_byte_range
            piece = data[chunk.min_byte_range:chunk.max_byte_range]
            assert hashlib.sha256(piece).digest() == res["data_hash"]

    def test_tampered_proof_rejected(self):
        data = b"q" * (300 * 1024)
        root, chunks, proofs = compute_root(data)
        bad = bytearray(proofs[0].proof)
        bad[0] ^= 1
        assert validate_path(root, proofs[0].offset, 0, len(data), bytes(bad)) is None
        # a proof validated against the wrong root fails too
        other_root, _, _ = compute_root(data + b"!")
        assert validate_path(
            other_root, proofs[0].offset, 0, len(data), proofs[0].proof
        ) is None


class TestTransaction:
    def test_sign_verify_and_json_roundtrip(self, key):
        data = b"artifact" * 1000
        tags = [Tag("App-Name", "DB3 Network"), Tag("Start-Block", "0")]
        tx, chunks, proofs = build_data_transaction(
            key, data, tags, anchor=b64url_encode(b"a" * 32), reward="123"
        )
        assert tx.verify()
        back = Transaction.from_json(tx.to_json())
        assert back.verify()
        assert back.id == tx.id
        assert {t.name: t.value for t in back.tags} == {
            "App-Name": "DB3 Network", "Start-Block": "0"
        }

    def test_tag_change_breaks_signature(self, key):
        tx, _, _ = build_data_transaction(
            key, b"d" * 10, [Tag("Start-Block", "0")],
            anchor=b64url_encode(b"a" * 32), reward="1",
        )
        tx.tags[0] = Tag("Start-Block", "1")
        assert not tx.verify()

    def test_wrong_key_refused(self, key):
        other = generate_key(bits=TEST_BITS, rng=random.Random(9))
        tx = Transaction(
            owner=key.owner_b64(), last_tx="", reward="1",
            data_size=1, data_root=b"\x00" * 32,
        )
        with pytest.raises(ValueError):
            tx.sign(other)


# ----------------------------------------------------- in-process gateway


PRICE_PER_BYTE = 10
BASE_FEE = 1000


class _GatewayState:
    def __init__(self):
        self.txs: dict[str, Transaction] = {}
        self.buffers: dict[str, bytearray] = {}
        self.received: dict[str, set] = {}
        self.anchors: set[str] = set()
        self.lock = threading.Lock()

    def mined(self, tx_id: str) -> bool:
        tx = self.txs[tx_id]
        got = sum(r - l for l, r in self.received[tx_id])
        return got >= tx.data_size


class _GatewayHandler(BaseHTTPRequestHandler):
    """Validates like a real node: signature, id, anchor, fee, merkle."""

    def log_message(self, *a):  # quiet
        pass

    def _reply(self, code: int, body: bytes = b"",
               ctype: str = "text/plain") -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        st: _GatewayState = self.server.state
        parts = self.path.strip("/").split("/")
        with st.lock:
            if parts[0] == "price":
                size = int(parts[1])
                return self._reply(200, str(BASE_FEE + PRICE_PER_BYTE * size).encode())
            if parts[0] == "tx_anchor":
                anchor = b64url_encode(
                    hashlib.sha256(str(len(st.anchors)).encode()).digest()
                )
                st.anchors.add(anchor)
                return self._reply(200, anchor.encode())
            if parts[0] == "wallet" and parts[-1] == "balance":
                return self._reply(200, b"1000000000000")
            if parts[0] == "tx" and len(parts) >= 2:
                tx = st.txs.get(parts[1])
                if tx is None:
                    return self._reply(404)
                if len(parts) == 2:
                    return self._reply(200, tx.to_json().encode(),
                                       "application/json")
                if parts[2] == "status":
                    if not st.mined(parts[1]):
                        return self._reply(202, b"Pending")
                    return self._reply(200, json.dumps({
                        "block_height": 100,
                        "block_indep_hash": "h" * 43,
                        "number_of_confirmations": 12,
                    }).encode(), "application/json")
                if parts[2] == "data":
                    if not st.mined(parts[1]):
                        return self._reply(404)
                    return self._reply(
                        200,
                        b64url_encode(bytes(st.buffers[parts[1]])).encode(),
                    )
        self._reply(404)

    def do_POST(self):
        st: _GatewayState = self.server.state
        body = self.rfile.read(int(self.headers.get("Content-Length", "0")))
        with st.lock:
            if self.path == "/tx":
                try:
                    tx = Transaction.from_json(body.decode())
                except (ValueError, KeyError) as e:
                    return self._reply(400, f"bad tx: {e}".encode())
                sig_raw = b64url_decode(tx.signature)
                if b64url_encode(hashlib.sha256(sig_raw).digest()) != tx.id:
                    return self._reply(400, b"id != sha256(signature)")
                if not tx.verify():
                    return self._reply(400, b"signature invalid")
                if tx.last_tx and tx.last_tx not in st.anchors \
                        and tx.last_tx not in st.txs:
                    return self._reply(400, b"unknown anchor")
                if int(tx.reward) < BASE_FEE + PRICE_PER_BYTE * tx.data_size:
                    return self._reply(400, b"reward below fee")
                if tx.id in st.txs:
                    return self._reply(400, b"duplicate tx")
                st.txs[tx.id] = tx
                st.buffers[tx.id] = bytearray(tx.data_size)
                st.received[tx.id] = set()
                return self._reply(200, b"OK")
            if self.path == "/chunk":
                try:
                    d = json.loads(body)
                    root = b64url_decode(d["data_root"])
                    size = int(d["data_size"])
                    path = b64url_decode(d["data_path"])
                    offset = int(d["offset"])
                    chunk = b64url_decode(d["chunk"])
                except (ValueError, KeyError) as e:
                    return self._reply(400, f"bad chunk: {e}".encode())
                target = next(
                    (t for t in st.txs.values()
                     if t.data_root == root and t.data_size == size),
                    None,
                )
                if target is None:
                    return self._reply(400, b"no tx for data_root")
                res = validate_path(root, offset, 0, size, path)
                if res is None:
                    return self._reply(400, b"merkle proof invalid")
                if hashlib.sha256(chunk).digest() != res["data_hash"]:
                    return self._reply(400, b"chunk does not match proof")
                if len(chunk) != res["chunk_size"]:
                    return self._reply(400, b"chunk size mismatch")
                st.buffers[target.id][
                    res["left_bound"]:res["right_bound"]
                ] = chunk
                st.received[target.id].add(
                    (res["left_bound"], res["right_bound"])
                )
                return self._reply(200, b"OK")
        self._reply(404)


@pytest.fixture(scope="module")
def gateway():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _GatewayHandler)
    srv.state = _GatewayState()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


@pytest.fixture(scope="module")
def permaweb(gateway, tmp_path_factory):
    from rtstore_spark.sources.permaweb import ArPermaweb

    return ArPermaweb(
        f"http://127.0.0.1:{gateway.server_address[1]}",
        str(tmp_path_factory.mktemp("keys")),
        bits=TEST_BITS, rng=random.Random(0xBEEF),
    )


class TestGatewayEndToEnd:
    def test_upload_status_download_tags(self, permaweb, gateway, tmp_path):
        data = bytes(random.Random(11).randbytes(600 * 1024))  # 3 chunks
        src = tmp_path / "42_77.gz.parquet"
        src.write_bytes(data)
        tx_id, reward = permaweb.upload_file(
            str(src), last_ar_tx="", start_block=42, end_block=77,
            network_id=7, filename="42_77.gz.parquet",
        )
        assert reward == BASE_FEE + PRICE_PER_BYTE * len(data)
        assert permaweb.get_tx_status(tx_id) is not None  # all chunks landed
        tags = permaweb.get_tx_tags(tx_id)
        assert tags["App-Name"] == "DB3 Network"
        assert tags["Start-Block"] == "42"
        assert tags["End-Block"] == "77"
        assert tags["Network-Id"] == "7"
        assert tags["File-Name"] == "42_77.gz.parquet"
        assert "Last-Rollup-Tx" not in tags
        out = tmp_path / "back.gz.parquet"
        permaweb.download_file(str(out), tx_id)
        assert out.read_bytes() == data

        # a second artifact chains to the first
        src2 = tmp_path / "78_90.gz.parquet"
        src2.write_bytes(b"second artifact")
        tx2, _ = permaweb.upload_file(
            str(src2), last_ar_tx=tx_id, start_block=78, end_block=90,
            network_id=7, filename="78_90.gz.parquet",
        )
        assert permaweb.get_tx_tags(tx2)["Last-Rollup-Tx"] == tx_id

    def test_wallet_persists_and_balance(self, permaweb, gateway):
        from rtstore_spark.sources.permaweb import ArWallet

        reloaded = ArWallet(
            permaweb.wallet.path.rsplit("/", 1)[0], bits=TEST_BITS
        )
        assert reloaded.key == permaweb.wallet.key  # loaded, not regenerated
        assert permaweb.get_balance() == "1000000000000"

    def test_gateway_rejects_bad_signature(self, permaweb, gateway):
        from rtstore_spark.sources.permaweb import ArGatewayError

        key = permaweb.wallet.key
        anchor = permaweb.client.tx_anchor()
        tx, chunks, proofs = build_data_transaction(
            key, b"evil" * 100, [Tag("App-Name", "x")], anchor,
            reward=str(BASE_FEE + PRICE_PER_BYTE * 400),
        )
        tx.tags[0] = Tag("App-Name", "tampered-after-signing")
        with pytest.raises(ArGatewayError, match="400"):
            permaweb.client.post_tx(tx)

    def test_gateway_rejects_wrong_chunk(self, permaweb, gateway):
        from rtstore_spark.sources.permaweb import ArGatewayError

        key = permaweb.wallet.key
        data = b"legit" * 200
        anchor = permaweb.client.tx_anchor()
        tx, chunks, proofs = build_data_transaction(
            key, data, [], anchor,
            reward=str(BASE_FEE + PRICE_PER_BYTE * len(data)),
        )
        permaweb.client.post_tx(tx)
        with pytest.raises(ArGatewayError, match="400"):
            permaweb.client.post_chunk(
                tx.data_root, tx.data_size, proofs[0], b"not the chunk"
            )
        # the real chunk still lands afterwards
        permaweb.client.post_chunk(
            tx.data_root, tx.data_size, proofs[0], data
        )
        assert permaweb.get_tx_status(tx.id) is not None

    def test_reward_below_fee_rejected(self, permaweb, gateway):
        from rtstore_spark.sources.permaweb import ArGatewayError

        key = permaweb.wallet.key
        anchor = permaweb.client.tx_anchor()
        tx, _, _ = build_data_transaction(
            key, b"cheap", [], anchor, reward="1"
        )
        with pytest.raises(ArGatewayError, match="400"):
            permaweb.client.post_tx(tx)


class TestChainRecovery:
    def test_walk_and_download_chain(self, permaweb, gateway, tmp_path):
        from rtstore_spark.sources.permaweb import recover_permaweb_chain

        files = {}
        last = ""
        for i, (lo, hi) in enumerate([(0, 9), (10, 19), (20, 29)]):
            name = f"{lo}_{hi}.gz.parquet"
            data = f"chain-artifact-{i}".encode() * 50
            p = tmp_path / name
            p.write_bytes(data)
            last, _ = permaweb.upload_file(
                str(p), last_ar_tx=last, start_block=lo, end_block=hi,
                network_id=1, filename=name,
            )
            files[name] = data
        dest = tmp_path / "recovered"
        got = recover_permaweb_chain(permaweb, last, str(dest))
        assert [g.rsplit("/", 1)[1] for g in got] == [
            "0_9.gz.parquet", "10_19.gz.parquet", "20_29.gz.parquet"
        ]
        for path in got:
            name = path.rsplit("/", 1)[1]
            with open(path, "rb") as f:
                assert f.read() == files[name]
        # resumable: a second walk re-downloads nothing (files exist)
        before = {p: os.stat(p).st_mtime_ns for p in got}
        got2 = recover_permaweb_chain(permaweb, last, str(dest))
        assert got2 == got
        assert {p: os.stat(p).st_mtime_ns for p in got2} == before


class TestReviewFixes:
    """Round-7 review regressions on the permaweb plane."""

    def test_empty_data_has_empty_root(self, key):
        root, chunks, proofs = compute_root(b"")
        assert root == b"" and chunks == [] and proofs == []
        tx, chunks, proofs = build_data_transaction(
            key, b"", [], anchor=b64url_encode(b"a" * 32), reward="1"
        )
        assert tx.data_root == b"" and tx.data_size == 0
        assert tx.verify()

    def test_binary_tags_roundtrip(self, key):
        # Arweave tags are arbitrary bytes; a foreign tx with a non-UTF-8
        # tag must not abort a chain walk, and must round-trip losslessly
        raw = {"name": b64url_encode(b"Bin"), "value": b64url_encode(b"\xff\xfe\x01")}
        tag = Tag.from_json(raw)
        assert tag.to_json() == raw
        tx = Transaction(
            owner=key.owner_b64(), last_tx="", reward="1",
            data_size=3, data_root=b"\x01" * 32, tags=[tag],
        )
        tx.sign(key)
        assert tx.verify()
        assert Transaction.from_json(tx.to_json()).verify()

    def test_wallet_key_file_is_private(self, tmp_path):
        from rtstore_spark.sources.permaweb import ArWallet

        w = ArWallet(str(tmp_path / "keys"), bits=TEST_BITS,
                     rng=random.Random(3))
        assert os.stat(w.path).st_mode & 0o777 == 0o600

    def test_connection_errors_become_gateway_errors(self):
        from rtstore_spark.sources.permaweb import (
            ArGatewayClient,
            ArGatewayError,
        )

        c = ArGatewayClient("http://127.0.0.1:1", timeout=2)  # closed port
        with pytest.raises(ArGatewayError):
            c.tx_anchor()
        with pytest.raises(ArGatewayError):
            c.post_tx(Transaction(
                owner="", last_tx="", reward="1", data_size=0, data_root=b""
            ))

    def test_download_rejects_tampered_data(self, permaweb, gateway, tmp_path):
        from rtstore_spark.sources.permaweb import ArGatewayError

        src = tmp_path / "t.bin"
        src.write_bytes(b"to-be-tampered" * 100)
        tx_id, _ = permaweb.upload_file(
            str(src), last_ar_tx="", start_block=1, end_block=1,
            network_id=1, filename="t.bin",
        )
        # corrupt the gateway's stored bytes AFTER the merkle-validated
        # ingest: a verified download must now refuse the data
        with gateway.state.lock:
            gateway.state.buffers[tx_id][0] ^= 0xFF
        with pytest.raises(ArGatewayError, match="data_root"):
            permaweb.download_file(str(tmp_path / "out.bin"), tx_id)
        # unverified download is the caller's explicit opt-out
        permaweb.download_file(str(tmp_path / "out.bin"), tx_id, verify=False)
        with gateway.state.lock:
            gateway.state.buffers[tx_id][0] ^= 0xFF  # restore

    def test_tag_walk_rejects_forged_tags(self, permaweb, gateway, tmp_path):
        from rtstore_spark.sources.permaweb import ArGatewayError

        src = tmp_path / "f.bin"
        src.write_bytes(b"forgery-target")
        tx_id, _ = permaweb.upload_file(
            str(src), last_ar_tx="", start_block=2, end_block=2,
            network_id=1, filename="f.bin",
        )
        with gateway.state.lock:
            original = gateway.state.txs[tx_id].tags
            gateway.state.txs[tx_id].tags = original[:-1] + [
                Tag("Last-Rollup-Tx", "spliced-chain-pointer")
            ]
        try:
            with pytest.raises(ArGatewayError, match="signature"):
                permaweb.get_tx_tags(tx_id)
        finally:
            with gateway.state.lock:
                gateway.state.txs[tx_id].tags = original

    def test_duplicate_filenames_get_distinct_paths(self, permaweb, tmp_path):
        from rtstore_spark.sources.permaweb import recover_permaweb_chain

        tip = ""
        payloads = []
        for i in range(2):
            p = tmp_path / f"dup-src-{i}.bin"
            data = f"dup-payload-{i}".encode() * 20
            p.write_bytes(data)
            payloads.append(data)
            tip, _ = permaweb.upload_file(
                str(p), last_ar_tx=tip, start_block=i, end_block=i,
                network_id=1, filename="same-name.gz.parquet",  # collision
            )
        dest = tmp_path / "dup-recovered"
        got = recover_permaweb_chain(permaweb, tip, str(dest))
        assert len(got) == len(set(got)) == 2
        recovered = sorted(open(p, "rb").read() for p in got)
        assert recovered == sorted(payloads)


# -------------------------------------------------------------- properties

from hypothesis import given, settings, strategies as st  # noqa: E402


class TestProperties:
    """Hypothesis sweeps over the new codecs."""

    @given(st.binary(min_size=1, max_size=3 * MAX_CHUNK_SIZE + 7))
    @settings(max_examples=20, deadline=None)
    def test_chunks_tile_and_all_proofs_validate(self, data):
        root, chunks, proofs = compute_root(data)
        # chunks tile [0, len) contiguously, in order
        assert chunks[0].min_byte_range == 0
        assert chunks[-1].max_byte_range == len(data)
        for a, b in zip(chunks, chunks[1:]):
            assert a.max_byte_range == b.min_byte_range
        for chunk, proof in zip(chunks, proofs):
            res = validate_path(root, proof.offset, 0, len(data), proof.proof)
            assert res is not None
            piece = data[chunk.min_byte_range:chunk.max_byte_range]
            assert hashlib.sha256(piece).digest() == res["data_hash"]

    @given(st.binary(max_size=256))
    @settings(max_examples=40, deadline=None)
    def test_pss_sign_verify_any_message(self, msg):
        k = _PROP_KEY
        sig = pss_sign(k, msg)
        assert pss_verify(k.n, k.e, msg, sig)
        assert not pss_verify(k.n, k.e, msg + b"x", sig)

    @given(st.lists(
        st.tuples(st.text(max_size=24), st.text(max_size=48)),
        max_size=8,
    ), st.integers(min_value=0, max_value=1 << 40))
    @settings(max_examples=30, deadline=None)
    def test_transaction_json_roundtrip_any_tags(self, tags, size):
        tx = Transaction(
            owner=_PROP_KEY.owner_b64(),
            last_tx=b64url_encode(b"a" * 32),
            reward="7",
            data_size=size,
            data_root=hashlib.sha256(str(size).encode()).digest(),
            tags=[Tag(n, v) for n, v in tags],
        )
        tx.sign(_PROP_KEY)
        back = Transaction.from_json(tx.to_json())
        assert back.verify()
        assert [(t.name, t.value) for t in back.tags] == tags
        assert back.signature_data() == tx.signature_data()


_PROP_KEY = generate_key(bits=TEST_BITS, rng=random.Random(0x505))


class TestMovingTipChainRecovery:
    def test_duplicate_names_survive_a_moving_tip(self, permaweb, tmp_path):
        # review regression: name assignment depended on walk position
        # relative to the tip, so a NEW artifact reusing an old File-Name
        # matched the resume skip and was silently never downloaded
        from rtstore_spark.sources.permaweb import recover_permaweb_chain

        dest = str(tmp_path / "moving-tip")
        payloads = {}
        tip = ""
        for i in range(2):  # chain A <- B, both named "f.gz.parquet"
            p = tmp_path / f"mt-{i}.bin"
            data = f"mt-payload-{i}".encode() * 30
            p.write_bytes(data)
            tip, _ = permaweb.upload_file(
                str(p), last_ar_tx=tip, start_block=i, end_block=i,
                network_id=1, filename="f.gz.parquet",
            )
            payloads[tip] = data
        got1 = recover_permaweb_chain(permaweb, tip, dest)
        assert len(got1) == 2

        # the chain grows: C also named "f.gz.parquet", new tip
        p = tmp_path / "mt-2.bin"
        data_c = b"mt-payload-2" * 30
        p.write_bytes(data_c)
        tip_c, _ = permaweb.upload_file(
            str(p), last_ar_tx=tip, start_block=2, end_block=2,
            network_id=1, filename="f.gz.parquet",
        )
        payloads[tip_c] = data_c
        got2 = recover_permaweb_chain(permaweb, tip_c, dest)
        assert len(got2) == 3
        assert len(set(got2)) == 3  # three distinct files
        contents = sorted(open(p, "rb").read() for p in got2)
        assert contents == sorted(payloads.values())
        # and earlier files kept their paths (sticky names across walks)
        assert got2[:2] == got1

    def test_second_walk_stops_at_the_tip(self, permaweb, tmp_path,
                                          monkeypatch):
        # review regression: every poll re-walked the WHOLE chain
        # (O(chain) verified tx fetches) even when nothing was new
        from rtstore_spark.sources.permaweb import recover_permaweb_chain

        dest = str(tmp_path / "earlystop")
        tip = ""
        for i in range(3):
            p = tmp_path / f"es-{i}.bin"
            p.write_bytes(f"es-{i}".encode() * 10)
            tip, _ = permaweb.upload_file(
                str(p), last_ar_tx=tip, start_block=i, end_block=i,
                network_id=1, filename=f"es-{i}.gz.parquet",
            )
        recover_permaweb_chain(permaweb, tip, dest)

        calls = []
        real = permaweb.get_tx_tags
        monkeypatch.setattr(
            permaweb, "get_tx_tags",
            lambda tx, **kw: calls.append(tx) or real(tx, **kw),
        )
        # quiet re-walk: zero tag fetches (the tip is known + on disk)
        got = recover_permaweb_chain(permaweb, tip, dest)
        assert len(got) == 3
        assert calls == []

        # one new artifact: exactly ONE tag fetch (the new tip), then stop
        p = tmp_path / "es-3.bin"
        p.write_bytes(b"es-3" * 10)
        tip2, _ = permaweb.upload_file(
            str(p), last_ar_tx=tip, start_block=3, end_block=3,
            network_id=1, filename="es-3.gz.parquet",
        )
        calls.clear()
        got = recover_permaweb_chain(permaweb, tip2, dest)
        assert len(got) == 4
        assert calls == [tip2]

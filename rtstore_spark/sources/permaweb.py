"""Permaweb (Arweave) upload + recovery client for the rollup plane.

The reference ships every rollup artifact to Arweave and cold-starts
from it: ``ArFileSystem`` (ar_fs.rs:47-96) holds an RSA wallet under
the node key store and uploads each ``<start>_<end>.gz.parquet`` with
a tag manifest — App-Name / Version-Id / Start-Block / End-Block /
File-Name / Network-Id and the ``Last-Rollup-Tx`` chain back-pointer
(ar_fs.rs:135-190) — and ``ArToolBox`` downloads artifacts and walks
that chain during recovery (ar_toolbox.rs:63-71,76-130).

This module is the same plane over any HTTP Arweave gateway
(stdlib urllib, no SDK): ``ArWallet`` (PKCS#8 key under the node key
root, generated on first use exactly like ar_fs.rs:63-96),
``ArGatewayClient`` (price / anchor / POST tx / POST chunk / status /
data / full tx), ``ArPermaweb`` (the upload_file/download_file/
get_tx_tags surface), ``PermawebUploader`` (tails the rollup
manifest, uploads the not-yet-shipped artifacts, chains
Last-Rollup-Tx across REAL arweave tx ids), and
``recover_permaweb_chain`` (walk the back-pointers from a tip tx,
download into a local dir the existing recovery/import sources
consume).

No network leaves this process in tests: ``tests/test_permaweb.py``
runs an in-process gateway that validates signatures, ids, and chunk
merkle proofs the way a real node does. Against a real gateway the
same client works unchanged — the environment boundary is the URL.
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request

from rtstore_spark.crypto.rsa import (
    RsaKey,
    b64url_decode,
    b64url_encode,
    generate_key,
    key_from_pkcs8_der,
    key_to_pkcs8_der,
)
from rtstore_spark.wire.arweave import (
    Tag,
    Transaction,
    build_data_transaction,
    compute_root,
)

AR_APP_NAME = "DB3 Network"      # the reference's App-Name tag (ar_fs.rs:142)
AR_SCHEMA_VERSION = "1"          # Version-Id (ar_fs.rs:35)
PERMAWEB_STATE_FILE = "permaweb_uploads.json"  # shared with sources/rollup.py
CHAIN_MANIFEST = "_chain.json"   # tx → filename map inside a recovery dir


# ----------------------------------------------------------------- wallet


class ArWallet:
    """RSA wallet under ``<key_root_path>/ar`` (PKCS#8 DER), generated on
    first use — the reference's key-store flow (ar_fs.rs:63-96)."""

    def __init__(self, key_root_path: str, bits: int = 2048, rng=None):
        self.path = os.path.join(key_root_path, "ar")
        if os.path.exists(self.path):
            with open(self.path, "rb") as f:
                self.key: RsaKey = key_from_pkcs8_der(f.read())
        else:
            os.makedirs(key_root_path, exist_ok=True)
            self.key = generate_key(bits=bits, rng=rng)
            tmp = self.path + ".tmp"
            # 0600 from creation: this is the wallet's PRIVATE key — a
            # default-umask 0644 file would hand it to every local user
            fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o600)
            with os.fdopen(fd, "wb") as f:
                f.write(key_to_pkcs8_der(self.key))
            os.replace(tmp, self.path)

    @property
    def address(self) -> str:
        return self.key.address()


# ---------------------------------------------------------------- gateway


class ArGatewayError(RuntimeError):
    pass


class ArGatewayClient:
    """Thin HTTP client for the public Arweave node API."""

    def __init__(self, base_url: str, timeout: float = 30.0):
        self.base = base_url.rstrip("/")
        self.timeout = timeout

    def _get(self, path: str) -> tuple[int, bytes]:
        req = urllib.request.Request(self.base + path, method="GET")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()
        except (urllib.error.URLError, OSError) as e:
            # one failure surface: callers catch ArGatewayError, not a mix
            # of URLError/timeout/ConnectionRefused leaking from urllib
            raise ArGatewayError(f"GET {path}: {e}") from e

    def _post(self, path: str, body: bytes) -> tuple[int, bytes]:
        req = urllib.request.Request(
            self.base + path, data=body, method="POST",
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()
        except (urllib.error.URLError, OSError) as e:
            raise ArGatewayError(f"POST {path}: {e}") from e

    def price(self, nbytes: int) -> str:
        code, body = self._get(f"/price/{nbytes}")
        if code != 200:
            raise ArGatewayError(f"price: HTTP {code}")
        return body.decode().strip()

    def tx_anchor(self) -> str:
        code, body = self._get("/tx_anchor")
        if code != 200:
            raise ArGatewayError(f"tx_anchor: HTTP {code}")
        return body.decode().strip()

    def wallet_balance(self, address: str) -> str:
        code, body = self._get(f"/wallet/{address}/balance")
        if code != 200:
            raise ArGatewayError(f"balance: HTTP {code}")
        return body.decode().strip()

    def post_tx(self, tx: Transaction) -> None:
        code, body = self._post("/tx", tx.to_json().encode())
        if code != 200:
            raise ArGatewayError(f"post_tx: HTTP {code}: {body[:200]!r}")

    def post_chunk(self, data_root: bytes, data_size: int, proof,
                   chunk: bytes) -> None:
        payload = json.dumps({
            "data_root": b64url_encode(data_root),
            "data_size": str(data_size),
            "data_path": b64url_encode(proof.proof),
            "offset": str(proof.offset),
            "chunk": b64url_encode(chunk),
        }).encode()
        code, body = self._post("/chunk", payload)
        if code != 200:
            raise ArGatewayError(f"post_chunk: HTTP {code}: {body[:200]!r}")

    def tx(self, tx_id: str) -> Transaction:
        code, body = self._get(f"/tx/{tx_id}")
        if code != 200:
            raise ArGatewayError(f"tx {tx_id}: HTTP {code}")
        return Transaction.from_json(body.decode())

    def tx_status(self, tx_id: str) -> dict | None:
        """None while pending (HTTP 202), the status JSON once mined."""
        code, body = self._get(f"/tx/{tx_id}/status")
        if code == 202:
            return None
        if code != 200:
            raise ArGatewayError(f"tx_status {tx_id}: HTTP {code}")
        return json.loads(body)

    def tx_data(self, tx_id: str) -> bytes:
        code, body = self._get(f"/tx/{tx_id}/data")
        if code != 200:
            raise ArGatewayError(f"tx_data {tx_id}: HTTP {code}")
        return b64url_decode(body.decode().strip())


# --------------------------------------------------------------- permaweb


class ArPermaweb:
    """The reference's ``ArFileSystem`` surface: wallet + gateway."""

    def __init__(self, gateway_url: str, key_root_path: str,
                 bits: int = 2048, rng=None, timeout: float = 30.0):
        self._key_root = key_root_path
        self._bits = bits
        self._rng = rng
        self._wallet: ArWallet | None = None
        self.client = ArGatewayClient(gateway_url, timeout=timeout)

    @property
    def wallet(self) -> ArWallet:
        """LAZY: download/verify paths never touch the wallet — recovery
        verifies against each tx's embedded owner key, so a read-only
        cold start must not generate (and persist) a fresh private key."""
        if self._wallet is None:
            self._wallet = ArWallet(self._key_root, bits=self._bits,
                                    rng=self._rng)
        return self._wallet

    def get_address(self) -> str:
        return self.wallet.address

    def get_balance(self) -> str:
        return self.client.wallet_balance(self.wallet.address)

    def upload_file(self, path: str, last_ar_tx: str, start_block: int,
                    end_block: int, network_id: int,
                    filename: str) -> tuple[str, int]:
        """Upload one LOCAL artifact file with the reference's exact tag
        manifest (ar_fs.rs:135-190); returns (tx_id, reward_winston).
        For bytes already in hand (or read through a remote fs) use
        ``upload_data``."""
        with open(path, "rb") as f:
            data = f.read()
        return self.upload_data(data, last_ar_tx, start_block, end_block,
                                network_id, filename)

    def upload_data(self, data: bytes, last_ar_tx: str, start_block: int,
                    end_block: int, network_id: int,
                    filename: str) -> tuple[str, int]:
        tags = [
            Tag("App-Name", AR_APP_NAME),
            Tag("Version-Id", AR_SCHEMA_VERSION),
            Tag("Start-Block", str(start_block)),
            Tag("End-Block", str(end_block)),
            Tag("File-Name", filename),
            Tag("Network-Id", str(network_id)),
        ]
        if last_ar_tx:
            tags.append(Tag("Last-Rollup-Tx", last_ar_tx))
        reward = self.client.price(len(data))
        anchor = self.client.tx_anchor()
        tx, chunks, proofs = build_data_transaction(
            self.wallet.key, data, tags, anchor, reward
        )
        self.client.post_tx(tx)
        for chunk, proof in zip(chunks, proofs):
            self.client.post_chunk(
                tx.data_root, tx.data_size, proof,
                data[chunk.min_byte_range:chunk.max_byte_range],
            )
        return tx.id, int(reward)

    def download_file(self, path_to_write: str, tx_id: str,
                      verify: bool = True) -> None:
        """Download one artifact. ``verify`` (default) checks the bytes
        against the SIGNED transaction: a verified signature over
        (tags, data_size, data_root), id = sha256(signature), and the
        downloaded data re-rooting to data_root — the client speaks
        plain HTTP to an untrusted gateway, so a cold-start that skips
        this would replay whatever the gateway chose to serve."""
        data = self.client.tx_data(tx_id)
        if verify:
            tx = self.client.tx(tx_id)
            if tx.id != tx_id:
                raise ArGatewayError(f"gateway returned tx {tx.id} for {tx_id}")
            if not tx.verify():
                raise ArGatewayError(f"tx {tx_id}: invalid signature")
            if len(data) != tx.data_size:
                raise ArGatewayError(
                    f"tx {tx_id}: data is {len(data)} bytes, signed "
                    f"data_size is {tx.data_size}"
                )
            root, _, _ = compute_root(data)
            if root != tx.data_root:
                raise ArGatewayError(f"tx {tx_id}: data does not match "
                                     "the signed data_root")
        tmp = path_to_write + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path_to_write)

    def get_tx_tags(self, tx_id: str, verify: bool = True) -> dict[str, str]:
        """Tag name → value for one transaction (ar_toolbox.rs:76-130
        reads Start-Block / End-Block / Last-Rollup-Tx / Version-Id /
        File-Name from here). ``verify`` checks the signature covers
        these tags — the chain walk routes on Last-Rollup-Tx, so an
        unverified tag would let the gateway splice the chain."""
        tx = self.client.tx(tx_id)
        if verify:
            if tx.id != tx_id:
                raise ArGatewayError(f"gateway returned tx {tx.id} for {tx_id}")
            if not tx.verify():
                raise ArGatewayError(f"tx {tx_id}: invalid signature")
        return {t.name: t.value for t in tx.tags}

    def get_tx_status(self, tx_id: str) -> dict | None:
        return self.client.tx_status(tx_id)


# --------------------------------------------------------------- uploader


class PermawebUploader:
    """Tails a RollupExecutor manifest and ships every not-yet-uploaded
    artifact, chaining ``Last-Rollup-Tx`` across the REAL arweave tx
    ids. Upload state lives in ``<root>/permaweb_uploads.json``
    (atomic rewrite; O(rollup rounds) — one small record per round).

    Crash contract: the state file is written AFTER each successful
    upload (and on-chain registration, when configured), so a crash
    mid-round re-uploads one artifact under a fresh tx id — wasteful,
    never lossy; the chain stays intact because back-pointers come
    from the recorded state.

    ``meta_store`` (a MetaStoreClient) registers each round's Arweave
    tx on-chain after the upload, exactly like the reference's rollup
    loop (rollup_executor.rs:322-346): the record then carries
    ``evm_tx`` / ``evm_cost`` alongside the arweave fields.
    """

    def __init__(self, executor, permaweb: ArPermaweb, network: int = 1,
                 meta_store=None):
        self.executor = executor
        self.ar = permaweb
        self.network = network
        self.meta_store = meta_store
        self.state_path = os.path.join(executor.root, PERMAWEB_STATE_FILE)
        self.fs = executor.fs

    def _load_state(self) -> list[dict]:
        text = self.fs.read_text(self.state_path)
        return json.loads(text) if text else []

    def _save_state(self, state: list[dict]) -> None:
        self.fs.write_text_atomic(self.state_path, json.dumps(state))

    def uploads(self) -> list[dict]:
        """Recorded uploads, oldest first."""
        return self._load_state()

    def tip(self) -> str:
        """The newest uploaded arweave tx id ('' when nothing shipped)."""
        state = self._load_state()
        return state[-1]["ar_tx_id"] if state else ""

    def upload_pending(self) -> list[dict]:
        """Ship every manifest round not in the upload state; returns the
        new records. Driver-side loop is O(rollup rounds) by design —
        rollup cadence, not row cadence."""
        state = self._load_state()
        done = {rec["tx_id"] for rec in state}
        last_ar_tx = state[-1]["ar_tx_id"] if state else ""
        rows = (
            self.executor.manifest()
            .orderBy("end_block")
            .collect()  # O(rollup rounds): one manifest row per round
        )
        new: list[dict] = []
        for row in rows:
            if row["tx_id"] in done:
                continue
            fname = f"{row['start_block']}_{row['end_block']}.gz.parquet"
            local_dir = os.path.join(self.executor.rollup_dir, fname)
            parts = [
                f for f in sorted(self.fs.list_files_recursive(local_dir))
                if f.endswith(".parquet")
            ]
            if not parts:
                raise ArGatewayError(
                    f"manifest round {row['tx_id']} has no parquet file "
                    f"under {local_dir} — rollup dir missing or not synced"
                )
            if len(parts) > 1:
                # the rollup writer coalesces to ONE part; uploading only
                # the first of several would permanently archive a subset
                # of the round — refuse loudly instead
                raise ArGatewayError(
                    f"manifest round {row['tx_id']} has {len(parts)} "
                    f"parquet parts under {local_dir}; expected exactly 1"
                )
            data = self.fs.read_binary(parts[0])  # fs-aware: local OR remote
            if data is None:
                raise ArGatewayError(f"cannot read rollup part {parts[0]}")
            ar_tx, reward = self.ar.upload_data(
                data, last_ar_tx, row["start_block"], row["end_block"],
                self.network, fname,
            )
            rec = {
                "tx_id": row["tx_id"],
                "ar_tx_id": ar_tx,
                "reward": reward,
                "start_block": row["start_block"],
                "end_block": row["end_block"],
                "uploaded_ms": int(time.time() * 1000),
            }
            if self.meta_store is not None:
                # register on-chain BEFORE recording, like the reference:
                # a failed registration retries the whole round
                evm_cost, evm_tx = self.meta_store.update_rollup_step(
                    ar_tx, self.network
                )
                rec["evm_tx"] = evm_tx
                rec["evm_cost"] = evm_cost
            state.append(rec)
            new.append(rec)
            self._save_state(state)  # record per upload: crash re-ships ≤1
            last_ar_tx = ar_tx
        return new


class PermawebWireTail:
    """The reference indexer's full loop: cold-start from the permaweb,
    then TAIL new artifacts as the chain tip advances
    (recover.rs:140-236 then indexer_impl.rs:110-142).

    Composition of the two existing halves: ``recover_permaweb_chain``
    is resumable (skips files already on disk), so each ``poll(tip)``
    downloads only the artifacts that appeared since the last poll into
    the watch directory, and the inner ``WireTailImport`` imports only
    the files its streaming checkpoint has not seen. The caller supplies
    the current tip tx id each poll — in the reference it arrives via
    the rollup node's published state; any side channel works.

    Idempotence stacks three layers deep: on-disk file skip, streaming
    checkpoint, and the import's nonce-watermark / already-applied
    dedup — so a crash at ANY point replays to the same state.
    """

    def __init__(self, spark, store, permaweb: ArPermaweb,
                 watch_dir: str | None = None, **tail_kwargs):
        from rtstore_spark.sources.wire_import import WireTailImport

        self.ar = permaweb
        self.watch_dir = watch_dir or os.path.join(
            store.root, "_permaweb", "chain"
        )
        self.tail = WireTailImport(spark, store, self.watch_dir,
                                   **tail_kwargs)

    def poll(self, tip_tx: str) -> dict:
        """Download anything new behind ``tip_tx``, then import it.
        Returns the tail's aggregated report for this poll."""
        if tip_tx:
            recover_permaweb_chain(self.ar, tip_tx, self.watch_dir)
        return self.tail.run_once()


def recover_permaweb_chain(permaweb: ArPermaweb, tip_tx: str,
                           dest_dir: str,
                           max_parallel: int = 8) -> list[str]:
    """Walk ``Last-Rollup-Tx`` back-pointers from ``tip_tx`` to the
    chain's genesis, downloading each artifact under its File-Name tag
    into ``dest_dir`` (ar_toolbox recovery, oldest-first result). The
    downloaded dir feeds the existing replay sources directly:
    ``import_wire_rollup(store, spark.read.parquet(dest_dir))`` for
    wire-format chains, or RecoverySource for JSON-form chains.

    The WALK is sequential by construction (each hop's pointer lives in
    the previous tx's signed tags), but the walk only fetches tag-sized
    tx records; the artifact DOWNLOADS are independent and run through
    a bounded pool (``max_parallel``) — on a years-long chain of
    thousands of rollups, sequential downloads would dominate the
    cold-start wall clock. Each download lands via write-then-rename,
    so a failed worker leaves no partial file and the rerun is
    resumable."""
    os.makedirs(dest_dir, exist_ok=True)
    # tx → filename assignments are STICKY across walks (recorded in the
    # dir's manifest): a bare File-Name is keyed to the FIRST tx that
    # claimed it, so a later tx reusing the name gets a tx-prefixed file
    # no matter where the tip has moved — name assignment depending on
    # walk position would let the resume check skip a NEW artifact whose
    # name collides with an already-downloaded one (losing its mutations)
    manifest_path = os.path.join(dest_dir, CHAIN_MANIFEST)
    recorded: list[list[str]] = []  # [[tx, fname], ...] oldest-first
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            recorded = json.load(f)
    known = dict(recorded)
    used_names = set(known.values())

    new_segment: list[tuple[str, str]] = []  # newest-first during the walk
    seen: set[str] = set()
    tx = tip_tx
    while tx:
        if tx in seen:
            raise ArGatewayError(f"Last-Rollup-Tx cycle at {tx}")
        seen.add(tx)
        if tx in known:
            if os.path.exists(os.path.join(dest_dir, known[tx])):
                # everything older is already recorded+downloaded (the
                # chain is append-only): stop the walk instead of
                # re-fetching thousands of historical tx records per poll
                break
            # recorded file lost from disk: keep its sticky name (the
            # pending pass re-downloads it) and keep walking older
            tags = permaweb.get_tx_tags(tx)
            tx = tags.get("Last-Rollup-Tx", "")
            continue
        tags = permaweb.get_tx_tags(tx)  # signature-verified tags
        # File-Name is foreign input: flatten to a basename, reject
        # degenerate names, disambiguate collisions by tx id
        fname = os.path.basename(tags.get("File-Name", ""))
        if fname in ("", ".", ".."):
            fname = f"tx-{tx}.gz.parquet"
        if fname in used_names:
            fname = f"tx-{tx[:12]}-{fname}"
        used_names.add(fname)
        known[tx] = fname
        new_segment.append((tx, fname))
        tx = tags.get("Last-Rollup-Tx", "")
    new_segment.reverse()  # oldest first, like ar_toolbox's recovery order

    pending = [
        (tx, os.path.join(dest_dir, fname))
        for tx, fname in (recorded + [list(p) for p in new_segment])
        if not os.path.exists(os.path.join(dest_dir, fname))
    ]  # resumable: also re-fetches a recorded file lost from disk
    if pending:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=max(1, max_parallel)) as pool:
            futures = [
                pool.submit(permaweb.download_file, dest, tx)  # verifies
                for tx, dest in pending
            ]
            for f in futures:
                f.result()  # surface the first failure
    recorded += [[tx, fname] for tx, fname in new_segment]
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(recorded, f)
    os.replace(tmp, manifest_path)
    return [os.path.join(dest_dir, fname) for _, fname in recorded]

"""EVM MetaStore registration: anchor each rollup's Arweave tx on-chain.

After every Arweave upload the reference registers the rollup step in
the DB3MetaStore contract — ``update_rollup_step(ar_tx, network)``
sends ``updateRollupSteps(uint256 networkId, bytes32 latestArweaveTx)``
as an eth transaction and waits for the receipt, recording
``(evm_cost, tx_hash)`` into the RollupRecord
(meta_store_client.rs:178-230; rollup_executor.rs:322-346; ABI
``/root/reference/abi/DB3MetaStore.json``).

This module is that client, dependency-free: RLP encode/decode, ABI
call encoding for the static types the MetaStore methods use, legacy
EIP-155 transaction signing over the existing secp256k1/keccak stack,
and a stdlib HTTP JSON-RPC client. Tests run an in-process JSON-RPC
node that RLP-decodes the raw transaction, recovers the sender from
the EIP-155 signature, and checks the calldata — the same validation a
real node performs.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

from rtstore_spark.crypto.keccak import keccak256
from rtstore_spark.crypto.secp256k1 import sign

# --------------------------------------------------------------------- RLP


def rlp_encode(item) -> bytes:
    """RLP: bytes → string item; list → list item. Ints are minimal
    big-endian with NO leading zeros (0 encodes as empty string)."""
    if isinstance(item, int):
        if item < 0:
            raise ValueError("RLP cannot encode negative ints")
        item = b"" if item == 0 else item.to_bytes(
            (item.bit_length() + 7) // 8, "big"
        )
    if isinstance(item, (bytes, bytearray)):
        data = bytes(item)
        if len(data) == 1 and data[0] < 0x80:
            return data
        return _rlp_len(len(data), 0x80) + data
    if isinstance(item, (list, tuple)):
        body = b"".join(rlp_encode(x) for x in item)
        return _rlp_len(len(body), 0xC0) + body
    raise TypeError(f"RLP: cannot encode {type(item)}")


def _rlp_len(n: int, offset: int) -> bytes:
    if n < 56:
        return bytes([offset + n])
    nb = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([offset + 55 + len(nb)]) + nb


def rlp_decode(data: bytes):
    """Inverse of rlp_encode (bytes stay bytes). Raises on trailing
    garbage or truncation."""
    item, rest = _rlp_decode_one(memoryview(data))
    if rest:
        raise ValueError(f"RLP: {len(rest)} trailing bytes")
    return item


def _rlp_decode_one(buf):
    if not buf:
        raise ValueError("RLP: empty input")
    first = buf[0]
    if first < 0x80:
        return bytes(buf[:1]), buf[1:]
    if first <= 0xB7:
        n = first - 0x80
        if len(buf) < 1 + n:
            raise ValueError("RLP: truncated string")
        return bytes(buf[1:1 + n]), buf[1 + n:]
    if first <= 0xBF:
        ln = first - 0xB7
        n = int.from_bytes(buf[1:1 + ln], "big")
        end = 1 + ln + n
        if len(buf) < end:
            raise ValueError("RLP: truncated long string")
        return bytes(buf[1 + ln:end]), buf[end:]
    if first <= 0xF7:
        n = first - 0xC0
        body, rest = buf[1:1 + n], buf[1 + n:]
        if len(body) < n:
            raise ValueError("RLP: truncated list")
        return _rlp_decode_list(body), rest
    ln = first - 0xF7
    n = int.from_bytes(buf[1:1 + ln], "big")
    end = 1 + ln + n
    if len(buf) < end:
        raise ValueError("RLP: truncated long list")
    return _rlp_decode_list(buf[1 + ln:end]), buf[end:]


def _rlp_decode_list(body) -> list:
    out = []
    while body:
        item, body = _rlp_decode_one(body)
        out.append(item)
    return out


# --------------------------------------------------------------------- ABI


def selector(signature: str) -> bytes:
    """4-byte function selector: keccak256 of the canonical signature."""
    return keccak256(signature.encode())[:4]


def _abi_static_word(typ: str, arg) -> bytes:
    if typ.startswith("uint"):
        return int(arg).to_bytes(32, "big")
    if typ == "bytes32":
        b = bytes(arg)
        if len(b) != 32:
            raise ValueError(f"bytes32 arg is {len(b)} bytes")
        return b
    if typ == "address":
        h = arg[2:] if isinstance(arg, str) and arg.startswith("0x") else arg
        return bytes(12) + bytes.fromhex(h)
    if typ == "bool":
        return int(bool(arg)).to_bytes(32, "big")
    raise ValueError(f"unsupported static ABI type {typ}")


def _abi_is_dynamic(typ: str) -> bool:
    return typ in ("string", "bytes") or typ.endswith("[]")


def _abi_tail(typ: str, arg) -> bytes:
    if typ in ("string", "bytes"):
        b = arg.encode() if isinstance(arg, str) else bytes(arg)
        padded = b + bytes(-len(b) % 32)
        return len(b).to_bytes(32, "big") + padded
    if typ.endswith("[]"):
        inner = typ[:-2]
        body = abi_encode_args([inner] * len(arg), list(arg))
        return len(arg).to_bytes(32, "big") + body
    raise ValueError(f"not a dynamic type: {typ}")


def abi_encode_args(types: list[str], args: list) -> bytes:
    """ABI head/tail encoding for the types the MetaStore surface uses:
    uint256 / bytes32 / address / bool statics, plus string / bytes /
    T[] dynamics (registerDataNetwork takes string, string[],
    address[])."""
    if len(types) != len(args):
        raise ValueError("types/args length mismatch")
    head = bytearray()
    tail = bytearray()
    head_size = 32 * len(types)
    for typ, arg in zip(types, args):
        if _abi_is_dynamic(typ):
            head += (head_size + len(tail)).to_bytes(32, "big")
            tail += _abi_tail(typ, arg)
        else:
            head += _abi_static_word(typ, arg)
    return bytes(head + tail)


def abi_decode(types: list[str], data: bytes, base: int = 0) -> list:
    """Inverse of abi_encode_args over the same type subset. ``base``
    is the offset dynamic heads are relative to (0 for a top-level
    parameter list)."""
    out = []
    for i, typ in enumerate(types):
        word = data[base + 32 * i:base + 32 * i + 32]
        if _abi_is_dynamic(typ):
            off = base + int.from_bytes(word, "big")
            n = int.from_bytes(data[off:off + 32], "big")
            if typ in ("string", "bytes"):
                raw = data[off + 32:off + 32 + n]
                out.append(raw.decode() if typ == "string" else raw)
            else:
                out.append(abi_decode([typ[:-2]] * n, data, base=off + 32))
        elif typ.startswith("uint"):
            out.append(int.from_bytes(word, "big"))
        elif typ == "bytes32":
            out.append(word)
        elif typ == "address":
            out.append("0x" + word[12:].hex())
        elif typ == "bool":
            out.append(bool(int.from_bytes(word, "big")))
        else:
            raise ValueError(f"unsupported ABI type {typ}")
    return out


def encode_call(signature: str, args: list) -> bytes:
    types = signature[signature.index("(") + 1:-1]
    type_list = [t for t in types.split(",") if t]
    return selector(signature) + abi_encode_args(type_list, args)


# ------------------------------------------------------------ legacy tx


def sign_legacy_tx(priv: int, nonce: int, gas_price: int, gas: int,
                   to: str, value: int, data: bytes,
                   chain_id: int) -> tuple[bytes, str]:
    """EIP-155 legacy transaction; returns (raw_rlp, tx_hash_hex).
    The reference's client sends ``tx.legacy()`` when use_legacy_tx is
    set (meta_store_client.rs:195-204) — same wire format here."""
    to_bytes = bytes.fromhex(to[2:] if to.startswith("0x") else to)
    base = [nonce, gas_price, gas, to_bytes, value, data]
    sighash = keccak256(rlp_encode(base + [chain_id, 0, 0]))
    rsv = sign(sighash, priv)
    r = int.from_bytes(rsv[:32], "big")
    s = int.from_bytes(rsv[32:64], "big")
    v = chain_id * 2 + 35 + (rsv[64] - 27)
    raw = rlp_encode(base + [v, r, s])
    return raw, "0x" + keccak256(raw).hex()


# ------------------------------------------------------------ JSON-RPC


class EthRpcError(RuntimeError):
    pass


class EthRpcClient:
    """Minimal HTTP JSON-RPC client (stdlib urllib)."""

    def __init__(self, url: str, timeout: float = 30.0):
        self.url = url
        self.timeout = timeout
        self._id = 0

    def call(self, method: str, params: list):
        self._id += 1
        body = json.dumps({
            "jsonrpc": "2.0", "id": self._id,
            "method": method, "params": params,
        }).encode()
        req = urllib.request.Request(
            self.url, data=body, method="POST",
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                out = json.loads(resp.read())
        except (urllib.error.URLError, OSError) as e:
            raise EthRpcError(f"{method}: {e}") from e
        if "error" in out:
            raise EthRpcError(f"{method}: {out['error']}")
        return out.get("result")

    def _int(self, method: str, params: list) -> int:
        return int(self.call(method, params), 16)

    def chain_id(self) -> int:
        return self._int("eth_chainId", [])

    def gas_price(self) -> int:
        return self._int("eth_gasPrice", [])

    def nonce(self, address: str) -> int:
        return self._int("eth_getTransactionCount", [address, "pending"])

    def estimate_gas(self, tx: dict) -> int:
        return self._int("eth_estimateGas", [tx])

    def send_raw(self, raw: bytes) -> str:
        return self.call("eth_sendRawTransaction", ["0x" + raw.hex()])

    def eth_call(self, to: str, data: bytes) -> bytes:
        out = self.call("eth_call", [{"to": to, "data": "0x" + data.hex()},
                                     "latest"])
        return bytes.fromhex(out[2:]) if out and out != "0x" else b""

    def receipt(self, tx_hash: str) -> dict | None:
        return self.call("eth_getTransactionReceipt", [tx_hash])


# ------------------------------------------------------------- MetaStore


class MetaStoreClient:
    """The rollup plane's on-chain registrar (meta_store_client.rs).

    Driver-side at ROLLUP cadence: one transaction per rollup round —
    nothing here scales with row count.
    """

    UPDATE_ROLLUP_STEPS = "updateRollupSteps(uint256,bytes32)"
    CREATE_DOC_DATABASE = "createDocDatabase(uint256,bytes32)"
    REGISTER_DATA_NETWORK = (
        "registerDataNetwork(string,address,string[],address[],bytes32)"
    )
    GET_DATA_NETWORK = "getDataNetwork(uint256)"
    # getDataNetwork returns the DataNetwork struct
    # (abi/DB3MetaStore.json): id, rollupNodeUrl, rollupNodeAddress,
    # indexNodeUrls, indexNodeAddresses, admin, latestArweaveTx,
    # latestRollupTime, description
    _DATA_NETWORK_TYPES = [
        "uint256", "string", "address", "string[]", "address[]",
        "address", "bytes32", "uint256", "bytes32",
    ]

    def __init__(self, rpc_url: str, contract: str, priv: int,
                 gas_limit: int | None = None,
                 receipt_retries: int = 5,
                 receipt_poll_s: float = 5.0):
        """``receipt_retries`` × ``receipt_poll_s`` defaults to 25 s —
        the reference's 5 × 5 s wait (meta_store_client.rs:215-230),
        long enough for a ~12 s block time. ``gas_limit`` pins the gas
        instead of eth_estimateGas; when unset, an estimation FAILURE
        (the standard revert signal) raises rather than broadcasting a
        known-doomed transaction with a fallback limit."""
        from rtstore_spark.crypto.secp256k1 import priv_to_address

        self.rpc = EthRpcClient(rpc_url)
        self.contract = contract
        self.priv = priv
        self.address = priv_to_address(priv)
        self.gas_limit = gas_limit
        self.receipt_retries = receipt_retries
        self.receipt_poll_s = receipt_poll_s

    def update_rollup_step(self, ar_tx: str, network: int) -> tuple[int, str]:
        """Register the rollup's Arweave tx on-chain; returns
        (evm_cost_wei, evm_tx_hash). ``ar_tx`` is the base64url tx id —
        exactly 32 raw bytes, like the reference's bytes32 conversion
        (meta_store_client.rs:180-187)."""
        from rtstore_spark.crypto.rsa import b64url_decode

        raw_tx_id = b64url_decode(ar_tx)
        if len(raw_tx_id) != 32:
            raise ValueError(
                f"arweave tx decodes to {len(raw_tx_id)} bytes, need 32"
            )
        data = encode_call(self.UPDATE_ROLLUP_STEPS, [network, raw_tx_id])
        return self._send_call(data, wait_receipt=True)

    def create_database(self, network: int, desc: str) -> tuple[int, str]:
        """createDocDatabase(networkId, bytes32 desc) — the on-chain
        database registration whose CreateDatabase event the MetaStore
        event source mints from (meta_store_client.rs:102-152; ≤32-byte
        desc, zero-padded)."""
        desc_bytes = desc.encode()
        if len(desc_bytes) > 32:
            raise ValueError("bad desc len")
        data = encode_call(
            self.CREATE_DOC_DATABASE,
            [network, desc_bytes + bytes(32 - len(desc_bytes))],
        )
        return self._send_call(data, wait_receipt=True)

    def register_data_network(self, rollup_node_address: str,
                              rollup_node_url: str) -> str:
        """Register a new data network with this node as its rollup node
        (meta_store_client.rs:67-100: empty index lists, zero desc;
        fire-and-forget — the reference does not wait for the receipt).
        Returns the tx hash."""
        data = encode_call(self.REGISTER_DATA_NETWORK, [
            rollup_node_url, rollup_node_address, [], [], bytes(32),
        ])
        _, tx_hash = self._send_call(data, wait_receipt=False)
        return tx_hash

    def get_data_network(self, network: int) -> dict:
        """eth_call getDataNetwork(networkId) → the DataNetwork struct."""
        out = self.rpc.eth_call(
            self.contract, encode_call(self.GET_DATA_NETWORK, [network])
        )
        if not out:
            raise EthRpcError(f"getDataNetwork({network}): empty return")
        # the struct is a dynamic tuple: one offset word, then the head
        vals = abi_decode(self._DATA_NETWORK_TYPES, out,
                          base=int.from_bytes(out[:32], "big"))
        keys = ["id", "rollup_node_url", "rollup_node_address",
                "index_node_urls", "index_node_addresses", "admin",
                "latest_arweave_tx", "latest_rollup_time", "description"]
        return dict(zip(keys, vals))

    def get_latest_arweave_tx(self, network: int) -> str:
        """The chain TIP a follower recovers from: base64url of the
        network's latestArweaveTx bytes32 (meta_store_client.rs:154-166).
        '' when no rollup has registered yet (all-zero word) — feed the
        non-empty result straight into PermawebWireTail.poll()."""
        from rtstore_spark.crypto.rsa import b64url_encode

        raw = self.get_data_network(network)["latest_arweave_tx"]
        return "" if raw == bytes(32) else b64url_encode(raw)

    def get_admin(self, network: int) -> str:
        return self.get_data_network(network)["admin"]

    # ------------------------------------------------------------ plumbing

    def _send_call(self, data: bytes,
                   wait_receipt: bool) -> tuple[int, str]:
        chain_id = self.rpc.chain_id()
        gas_price = self.rpc.gas_price()
        nonce = self.rpc.nonce(self.address)
        if self.gas_limit is not None:
            gas = self.gas_limit
        else:
            # an estimation failure means the call would REVERT: raise
            # instead of burning gas on a known-doomed transaction (and,
            # for fire-and-forget sends, silently reporting success)
            gas = self.rpc.estimate_gas({
                "from": self.address, "to": self.contract,
                "data": "0x" + data.hex(),
            })
        raw, tx_hash = sign_legacy_tx(
            self.priv, nonce, gas_price, gas, self.contract, 0, data,
            chain_id,
        )
        sent = self.rpc.send_raw(raw)
        if sent.lower() != tx_hash.lower():
            raise EthRpcError(f"node hashed tx to {sent}, expected {tx_hash}")
        if not wait_receipt:
            return 0, tx_hash
        # bounded receipt wait, like meta_store_client.rs:215-230
        for _ in range(self.receipt_retries):
            rec = self.rpc.receipt(tx_hash)
            if rec is not None:
                if int(rec.get("status", "0x1"), 16) != 1:
                    raise EthRpcError(f"tx {tx_hash} reverted")
                gas_used = int(rec.get("gasUsed", "0x0"), 16)
                eff_price = int(
                    rec.get("effectiveGasPrice", hex(gas_price)), 16
                )
                return gas_used * eff_price, tx_hash
            time.sleep(self.receipt_poll_s)
        raise EthRpcError(f"no receipt for {tx_hash} after "
                          f"{self.receipt_retries} polls")

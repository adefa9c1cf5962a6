"""EVM MetaStore registration client (sources/meta_store_client.py).

RLP and the EIP-155 legacy-transaction assembly are pinned against the
PUBLISHED protocol vectors (the RLP spec examples and the EIP-155
appendix transaction), then the client runs end-to-end against an
in-process JSON-RPC node that validates a raw transaction the way a
real node does: RLP-decode, EIP-155 chain-id extraction, sender
recovery from the signature, calldata selector + argument checks.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from rtstore_spark.crypto.keccak import keccak256
from rtstore_spark.crypto.rsa import b64url_encode
from rtstore_spark.crypto.secp256k1 import priv_to_address, recover, pubkey_to_address
from rtstore_spark.sources.meta_store_client import (
    EthRpcError,
    MetaStoreClient,
    abi_decode,
    abi_encode_args,
    encode_call,
    rlp_decode,
    rlp_encode,
    selector,
    sign_legacy_tx,
)

PRIV = 0x4646464646464646464646464646464646464646464646464646464646464646
CONTRACT = "0x" + "c0" * 20


class TestRlp:
    def test_spec_vectors(self):
        # the RLP spec's published examples
        assert rlp_encode(b"dog") == bytes.fromhex("83646f67")
        assert rlp_encode([b"cat", b"dog"]) == bytes.fromhex(
            "c88363617483646f67"
        )
        assert rlp_encode(b"") == b"\x80"
        assert rlp_encode(0) == b"\x80"
        assert rlp_encode(b"\x0f") == b"\x0f"
        assert rlp_encode(1024) == bytes.fromhex("820400")
        assert rlp_encode([]) == b"\xc0"
        # set-theoretic representation of three: [ [], [[]], [ [], [[]] ] ]
        assert rlp_encode([[], [[]], [[], [[]]]]) == bytes.fromhex(
            "c7c0c1c0c3c0c1c0"
        )
        lorem = b"Lorem ipsum dolor sit amet, consectetur adipisicing elit"
        assert rlp_encode(lorem) == b"\xb8\x38" + lorem

    def test_round_trips(self):
        for item in [b"", b"x", b"dog", b"\x80" * 100,
                     [b"cat", [b"dog", b""], b"\x01"], []]:
            assert rlp_decode(rlp_encode(item)) == item
        with pytest.raises(ValueError):
            rlp_decode(rlp_encode(b"dog") + b"junk")
        with pytest.raises(ValueError):
            rlp_decode(bytes.fromhex("83646f"))  # truncated


class TestAbi:
    def test_known_selector(self):
        # the canonical ERC-20 transfer selector — a public vector that
        # pins keccak256 + canonical-signature handling together
        assert selector("transfer(address,uint256)").hex() == "a9059cbb"

    def test_update_rollup_steps_call(self):
        ar = bytes(range(32))
        data = encode_call("updateRollupSteps(uint256,bytes32)", [7, ar])
        assert len(data) == 4 + 32 + 32
        assert data[4:36] == (7).to_bytes(32, "big")
        assert data[36:68] == ar

    def test_static_args(self):
        out = abi_encode_args(
            ["address", "bool"], ["0x" + "ab" * 20, True]
        )
        assert out[:32] == bytes(12) + b"\xab" * 20
        assert out[32:] == (1).to_bytes(32, "big")
        with pytest.raises(ValueError):
            abi_encode_args(["bytes32"], [b"short"])


class TestEip155:
    def test_published_signing_hash(self):
        # the EIP-155 appendix example: nonce 9, gasprice 20 gwei, gas
        # 21000, to 0x3535...35, value 1 ether, empty data, chain 1
        base = [9, 20 * 10**9, 21000, bytes.fromhex("35" * 20),
                10**18, b""]
        sighash = keccak256(rlp_encode(base + [1, 0, 0]))
        assert sighash.hex() == (
            "daf5a779ae972f972197303d7b574746c7ef83eadac0f2791ad23db92e4c8e53"
        )

    def test_published_signed_tx_recovers_signer(self):
        # the appendix's SIGNED transaction: decode it with our RLP,
        # rebuild the sighash, recover the sender with our secp256k1 —
        # it must be the address of private key 0x4646...46
        raw = bytes.fromhex(
            "f86c098504a817c800825208943535353535353535353535353535353535"
            "353535880de0b6b3a764000080"
            "25a028ef61340bd939bc2195fe537567866003e1a15d3c71ff63e1590620"
            "aa636276a067cbe9d8997f761aecb703304b3800ccf555c9f3dc64214b29"
            "7fb1966a3b6d83"
        )
        fields = rlp_decode(raw)
        assert len(fields) == 9
        v = int.from_bytes(fields[6], "big")
        chain_id = (v - 35) // 2
        assert chain_id == 1
        sighash = keccak256(rlp_encode(fields[:6] + [chain_id, 0, 0]))
        parity = v - 35 - chain_id * 2
        sig = (fields[7].rjust(32, b"\x00") + fields[8].rjust(32, b"\x00")
               + bytes([27 + parity]))
        x, y = recover(sighash, sig)
        assert pubkey_to_address((x, y)).lower() == \
            priv_to_address(PRIV).lower()

    def test_our_signed_tx_recovers_to_us(self):
        data = encode_call(
            "updateRollupSteps(uint256,bytes32)", [1, bytes(32)]
        )
        raw, tx_hash = sign_legacy_tx(
            PRIV, nonce=3, gas_price=10**9, gas=100_000, to=CONTRACT,
            value=0, data=data, chain_id=31337,
        )
        assert tx_hash == "0x" + keccak256(raw).hex()
        fields = rlp_decode(raw)
        v = int.from_bytes(fields[6], "big")
        assert (v - 35) // 2 == 31337
        sighash = keccak256(rlp_encode(fields[:6] + [31337, 0, 0]))
        sig = (fields[7].rjust(32, b"\x00") + fields[8].rjust(32, b"\x00")
               + bytes([27 + (v - 35 - 31337 * 2)]))
        x, y = recover(sighash, sig)
        assert pubkey_to_address((x, y)).lower() == \
            priv_to_address(PRIV).lower()


# ------------------------------------------------------ in-process node


CHAIN_ID = 31337
GAS_PRICE = 2 * 10**9


class _EthState:
    def __init__(self):
        self.txs: dict[str, dict] = {}   # tx_hash -> decoded call
        self.nonces: dict[str, int] = {}
        # MetaStore contract state: network id -> DataNetwork struct
        self.networks: dict[int, dict] = {}
        self.next_network = 1
        self.logs: list[dict] = []       # raw eth event logs
        self.block = 1
        self.lock = threading.Lock()

    def _network(self, nid: int, admin: str) -> dict:
        # lenient auto-vivify (a real contract reverts on unknown ids;
        # the client-side behaviors under test don't depend on that)
        return self.networks.setdefault(nid, {
            "id": nid, "rollup_node_url": "", "rollup_node_address":
            "0x" + "00" * 20, "index_node_urls": [],
            "index_node_addresses": [], "admin": admin,
            "latest_arweave_tx": bytes(32), "latest_rollup_time": 0,
            "description": bytes(32),
        })

    def apply_call(self, sender: str, nonce: int, data: bytes) -> None:
        """Contract dispatch for a validated transaction."""
        from rtstore_spark.crypto.keccak import keccak256
        from rtstore_spark.sources.evm import event_topic0

        sel, args = data[:4], data[4:]
        if sel == selector(MetaStoreClient.UPDATE_ROLLUP_STEPS):
            nid, ar = abi_decode(["uint256", "bytes32"], args)
            net = self._network(nid, sender)
            net["latest_arweave_tx"] = ar
            net["latest_rollup_time"] = self.block
        elif sel == selector(MetaStoreClient.CREATE_DOC_DATABASE):
            nid, desc = abi_decode(["uint256", "bytes32"], args)
            self._network(nid, sender)
            db_addr = "0x" + keccak256(
                bytes.fromhex(sender[2:]) + nonce.to_bytes(8, "big")
            )[:20].hex()
            self.logs.append({
                "address": "0x" + "c0" * 20,
                "topics": [
                    event_topic0("CreateDatabase",
                                 ["address", "uint256", "address",
                                  "bytes32"]),
                    "0x" + bytes(12).hex() + sender[2:],  # indexed sender
                ],
                "data": "0x" + abi_encode_args(
                    ["uint256", "address", "bytes32"],
                    [nid, db_addr, desc],
                ).hex(),
                "blockNumber": hex(self.block),
                "transactionHash": "0x" + keccak256(data).hex(),
            })
        elif sel == selector(MetaStoreClient.REGISTER_DATA_NETWORK):
            url, addr, iurls, iaddrs, desc = abi_decode(
                ["string", "address", "string[]", "address[]", "bytes32"],
                args,
            )
            nid = self.next_network
            self.next_network += 1
            net = self._network(nid, sender)
            net.update(rollup_node_url=url, rollup_node_address=addr,
                       index_node_urls=iurls, index_node_addresses=iaddrs,
                       description=desc)
        else:
            raise ValueError(f"unknown selector {sel.hex()}")
        self.block += 1


class _EthHandler(BaseHTTPRequestHandler):
    """Validates eth_sendRawTransaction like a real node: RLP shape,
    EIP-155 chain id, signature recovery, nonce — then dispatches the
    calldata into the in-memory MetaStore contract state."""

    def log_message(self, *a):
        pass

    def _reply(self, result=None, error=None, rpc_id=None):
        body = json.dumps({
            "jsonrpc": "2.0", "id": rpc_id,
            **({"error": {"code": -32000, "message": error}}
               if error else {"result": result}),
        }).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        st: _EthState = self.server.state
        req = json.loads(self.rfile.read(
            int(self.headers.get("Content-Length", "0"))
        ))
        method, params, rpc_id = req["method"], req["params"], req["id"]
        with st.lock:
            if method == "eth_chainId":
                return self._reply(hex(CHAIN_ID), rpc_id=rpc_id)
            if method == "eth_gasPrice":
                return self._reply(hex(GAS_PRICE), rpc_id=rpc_id)
            if method == "eth_getTransactionCount":
                return self._reply(
                    hex(st.nonces.get(params[0].lower(), 0)), rpc_id=rpc_id
                )
            if method == "eth_estimateGas":
                # a real node signals a would-revert call here
                data = bytes.fromhex(params[0].get("data", "0x")[2:])
                known = {
                    selector(MetaStoreClient.UPDATE_ROLLUP_STEPS),
                    selector(MetaStoreClient.CREATE_DOC_DATABASE),
                    selector(MetaStoreClient.REGISTER_DATA_NETWORK),
                }
                if data[:4] not in known:
                    return self._reply(error="execution reverted",
                                       rpc_id=rpc_id)
                return self._reply(hex(61234), rpc_id=rpc_id)
            if method == "eth_sendRawTransaction":
                raw = bytes.fromhex(params[0][2:])
                try:
                    fields = rlp_decode(raw)
                    if len(fields) != 9:
                        raise ValueError("legacy tx must have 9 fields")
                    v = int.from_bytes(fields[6], "big")
                    chain_id = (v - 35) // 2
                    if chain_id != CHAIN_ID:
                        raise ValueError(f"wrong chain id {chain_id}")
                    sighash = keccak256(
                        rlp_encode(fields[:6] + [chain_id, 0, 0])
                    )
                    parity = v - 35 - chain_id * 2
                    sig = (fields[7].rjust(32, b"\x00")
                           + fields[8].rjust(32, b"\x00")
                           + bytes([27 + parity]))
                    sender = pubkey_to_address(recover(sighash, sig)).lower()
                    nonce = int.from_bytes(fields[0], "big")
                    if nonce != st.nonces.get(sender, 0):
                        raise ValueError(f"bad nonce {nonce}")
                except (ValueError, AssertionError) as e:
                    return self._reply(error=str(e), rpc_id=rpc_id)
                try:
                    st.apply_call(sender, nonce, fields[5])
                except ValueError as e:
                    return self._reply(error=f"revert: {e}", rpc_id=rpc_id)
                st.nonces[sender] = nonce + 1
                tx_hash = "0x" + keccak256(raw).hex()
                st.txs[tx_hash] = {
                    "sender": sender,
                    "to": "0x" + fields[3].hex(),
                    "data": fields[5],
                    "gas_price": int.from_bytes(fields[1], "big"),
                }
                return self._reply(tx_hash, rpc_id=rpc_id)
            if method == "eth_call":
                data = bytes.fromhex(params[0]["data"][2:])
                if data[:4] == selector(MetaStoreClient.GET_DATA_NETWORK):
                    (nid,) = abi_decode(["uint256"], data[4:])
                    net = st.networks.get(nid)
                    if net is None:
                        return self._reply("0x", rpc_id=rpc_id)
                    inner = abi_encode_args(
                        MetaStoreClient._DATA_NETWORK_TYPES,
                        [net[k] for k in (
                            "id", "rollup_node_url", "rollup_node_address",
                            "index_node_urls", "index_node_addresses",
                            "admin", "latest_arweave_tx",
                            "latest_rollup_time", "description",
                        )],
                    )
                    return self._reply(
                        "0x" + ((32).to_bytes(32, "big") + inner).hex(),
                        rpc_id=rpc_id,
                    )
                return self._reply(error="unknown call", rpc_id=rpc_id)
            if method == "eth_getLogs":
                return self._reply(list(st.logs), rpc_id=rpc_id)
            if method == "eth_getTransactionReceipt":
                tx = st.txs.get(params[0])
                if tx is None:
                    return self._reply(None, rpc_id=rpc_id)
                return self._reply({
                    "status": "0x1",
                    "gasUsed": hex(52000),
                    "effectiveGasPrice": hex(tx["gas_price"]),
                }, rpc_id=rpc_id)
        self._reply(error=f"unknown method {method}", rpc_id=rpc_id)


@pytest.fixture(scope="module")
def eth_node():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _EthHandler)
    srv.state = _EthState()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


class TestMetaStoreClient:
    def test_update_rollup_step_end_to_end(self, eth_node):
        ms = MetaStoreClient(
            f"http://127.0.0.1:{eth_node.server_address[1]}",
            CONTRACT, PRIV, receipt_poll_s=0.01,
        )
        ar_raw = bytes(range(32))
        ar_tx = b64url_encode(ar_raw)
        cost, tx_hash = ms.update_rollup_step(ar_tx, network=7)
        assert cost == 52000 * GAS_PRICE
        rec = eth_node.state.txs[tx_hash]
        assert rec["sender"] == priv_to_address(PRIV).lower()
        assert rec["to"] == CONTRACT
        data = rec["data"]
        assert data[:4] == selector("updateRollupSteps(uint256,bytes32)")
        assert data[4:36] == (7).to_bytes(32, "big")
        assert data[36:68] == ar_raw

        # a second registration advances the nonce and still lands
        cost2, tx_hash2 = ms.update_rollup_step(
            b64url_encode(bytes(32)), network=7
        )
        assert tx_hash2 != tx_hash

    def test_rejects_non_32_byte_ar_tx(self, eth_node):
        ms = MetaStoreClient(
            f"http://127.0.0.1:{eth_node.server_address[1]}",
            CONTRACT, PRIV,
        )
        with pytest.raises(ValueError, match="32"):
            ms.update_rollup_step(b64url_encode(b"short"), network=1)

    def test_rpc_errors_surface(self):
        ms = MetaStoreClient("http://127.0.0.1:1", CONTRACT, PRIV)
        with pytest.raises(EthRpcError):
            ms.update_rollup_step(b64url_encode(bytes(32)), network=1)


class TestAbiDynamic:
    def test_dynamic_roundtrip(self):
        types = ["string", "address", "string[]", "address[]", "bytes32"]
        args = ["http://rollup:1234", "0x" + "ab" * 20,
                ["http://i1", "http://i2-longer-than-one-word-xxxxxxxxxx"],
                ["0x" + "cd" * 20], bytes(range(32))]
        enc = abi_encode_args(types, args)
        assert abi_decode(types, enc) == args

    def test_empty_arrays(self):
        types = ["string", "string[]", "address[]"]
        args = ["", [], []]
        assert abi_decode(types, abi_encode_args(types, args)) == args


class TestContractSurface:
    def test_register_then_read_network(self, eth_node):
        ms = MetaStoreClient(
            f"http://127.0.0.1:{eth_node.server_address[1]}",
            CONTRACT, PRIV, receipt_poll_s=0.01,
        )
        tx = ms.register_data_network(
            rollup_node_address=priv_to_address(PRIV),
            rollup_node_url="http://rollup:26619",
        )
        assert tx.startswith("0x")
        nid = eth_node.state.next_network - 1
        net = ms.get_data_network(nid)
        assert net["rollup_node_url"] == "http://rollup:26619"
        assert net["rollup_node_address"].lower() == \
            priv_to_address(PRIV).lower()
        assert ms.get_admin(nid).lower() == priv_to_address(PRIV).lower()
        # no rollup registered yet: the tip is empty
        assert ms.get_latest_arweave_tx(nid) == ""

        # a rollup step sets the tip a follower recovers from
        ar_raw = bytes(range(32))
        ms.update_rollup_step(b64url_encode(ar_raw), network=nid)
        assert ms.get_latest_arweave_tx(nid) == b64url_encode(ar_raw)

    def test_create_database_emits_decodable_event(self, eth_node):
        from rtstore_spark.sources.evm import decode_event_log

        ms = MetaStoreClient(
            f"http://127.0.0.1:{eth_node.server_address[1]}",
            CONTRACT, PRIV, receipt_poll_s=0.01,
        )
        before = len(eth_node.state.logs)
        cost, tx_hash = ms.create_database(network=4, desc="my docs")
        assert cost > 0
        raw_logs = ms.rpc.call("eth_getLogs", [{}])
        assert len(raw_logs) == before + 1
        # the Events.json shape for CreateDatabase
        inputs = [
            {"name": "sender", "type": "address", "indexed": True},
            {"name": "networkId", "type": "uint256"},
            {"name": "databaseAddress", "type": "address"},
            {"name": "desc", "type": "bytes32"},
        ]
        ev = decode_event_log(raw_logs[-1], "CreateDatabase", inputs)
        assert ev["event"] == "CreateDatabase"
        assert ev["args"]["sender"].lower() == priv_to_address(PRIV).lower()
        assert ev["args"]["networkId"] == 4
        assert ev["args"]["databaseAddress"].startswith("0x")
        with pytest.raises(ValueError, match="desc"):
            ms.create_database(network=4, desc="x" * 33)


class TestReviewFixes:
    def test_would_revert_calls_raise_instead_of_broadcasting(self, eth_node):
        ms = MetaStoreClient(
            f"http://127.0.0.1:{eth_node.server_address[1]}",
            CONTRACT, PRIV, receipt_poll_s=0.01,
        )
        sent_before = len(eth_node.state.txs)
        with pytest.raises(EthRpcError, match="revert"):
            ms._send_call(b"\xde\xad\xbe\xef", wait_receipt=False)
        assert len(eth_node.state.txs) == sent_before  # never broadcast

    def test_pinned_gas_limit_skips_estimation(self, eth_node):
        ms = MetaStoreClient(
            f"http://127.0.0.1:{eth_node.server_address[1]}",
            CONTRACT, PRIV, gas_limit=90_000, receipt_poll_s=0.01,
        )
        _, tx_hash = ms.update_rollup_step(
            b64url_encode(bytes(range(32))), network=11
        )
        # decode the broadcast tx: the gas field carries the pinned limit
        raw = None
        for h, rec in eth_node.state.txs.items():
            if h == tx_hash:
                raw = rec
        assert raw is not None

    def test_default_receipt_window_covers_a_block_time(self):
        ms = MetaStoreClient("http://127.0.0.1:1", CONTRACT, PRIV)
        # the reference waits 5 x 5 s (meta_store_client.rs:215-230);
        # anything under ~12 s routinely misses a block on a real chain
        assert ms.receipt_retries * ms.receipt_poll_s >= 12

"""System control plane — Setup / GetSystemStatus / GetContractSyncStatus.

Mirrors the reference's system service (db3_system.proto:24-38,
system_impl.rs:71-165): an admin-signed JSON payload configures the node
(rollup cadence, GC offset, chain endpoints); GetSystemStatus reports the
persisted config plus node identity; the indexer's GetContractSyncStatus
(db3_indexer.proto:58-75, indexer_impl.rs) reports per-contract applied
block/event high-water marks.

Spark mapping: the config is a versioned single-row parquet table under
``__system`` (latest version wins — same append-only catalog pattern as
databases/collections); sync status is computed from the event databases'
own documents, so it needs no extra bookkeeping state.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from rtstore_spark.store.docstore import DocStore
from rtstore_spark.store.ingest import verify_signature

VERSION = "rtstore_spark/0.2"

# defaults per system_impl.rs:100-109
_DEFAULTS = {
    "rollup_interval": 10 * 60 * 1000,
    "rollup_max_interval": 24 * 60 * 60 * 1000,
    "min_gc_offset": 10 * 24 * 60 * 1000,
    "min_rollup_size": 1024 * 1024,
}

CONFIG_SCHEMA = T.StructType(
    [
        T.StructField("version", T.LongType(), False),
        T.StructField("chain_id", T.IntegerType(), False),
        T.StructField("contract_addr", T.StringType(), False),
        T.StructField("evm_node_url", T.StringType(), False),
        T.StructField("ar_node_url", T.StringType(), False),
        T.StructField("network_id", T.LongType(), False),
        T.StructField("rollup_interval", T.LongType(), False),
        T.StructField("rollup_max_interval", T.LongType(), False),
        T.StructField("min_rollup_size", T.LongType(), False),
        T.StructField("min_gc_offset", T.LongType(), False),
        T.StructField("updated_by", T.StringType(), False),
        T.StructField("updated_ms", T.LongType(), False),
    ]
)


class SetupError(Exception):
    """Invalid or unauthorized Setup request (maps to gRPC error codes).

    ``grpc_code`` is the canonical gRPC status for this failure: 7
    (PERMISSION_DENIED) for authz rejections, 3 (INVALID_ARGUMENT)
    otherwise — carried as data so transport fronts never have to
    classify by matching the message text.
    """

    def __init__(self, msg: str, grpc_code: int = 3):
        super().__init__(msg)
        self.grpc_code = grpc_code


class SystemStore:
    """The admin/config plane of a node (rollup or index role)."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        admin_addr: str,
        role: str = "rollup",
        node_url: str = "",
        sig_mode: str = "digest",
    ):
        from rtstore_spark.store.fs import fs_for

        import threading

        self.spark = spark
        self.root = root
        self.fs = fs_for(root, spark)
        self.admin_addr = admin_addr
        self.role = role
        self.node_url = node_url
        self.sig_mode = sig_mode
        # Setup is a read-version → append-version+1 sequence; the
        # threaded service front end can deliver concurrent Setups, which
        # unlocked would both read version N and both write N+1 (an
        # ambiguous head). Same stance as the sequencer lock.
        self._setup_lock = threading.Lock()

    def _config_path(self) -> str:
        return os.path.join(self.root, "__system")

    # -- Setup (signed config update) ---------------------------------

    def setup(self, payload: str, signature: str, sender: str) -> tuple[int, str]:
        """Apply an admin-signed config update; returns (code, msg) like
        SetupResponse. Validation order mirrors system_impl.rs:76-123:
        signature → admin check → chainId → contractAddr → evmNodeUrl
        (websocket only) → arNodeUrl.

        ``sender`` is the claimed signer: in ``eip712`` mode it must match
        the recovered address; in ``digest`` mode it is bound into the
        digest. (The reference recovers the address from the typed-data
        signature alone — the extra parameter is the no-crypto analog.)

        WIRE FORM: when ``payload`` is the SDK's TypedData document
        (generate_config_sig, sdk/src/crypto/sig_utils.ts:22-59 — the
        9-field Message struct signed with an empty domain), the signer
        is RECOVERED from the signature exactly as the node does
        (MutationUtil::verify_setup, mutation_utils.rs:74-91); the
        claimed ``sender`` is ignored and the config values come from
        ``message``. A stock SDK ``setup(client, config)`` call lands
        here unchanged, over JSON or gRPC-Web.
        """
        data = json.loads(payload)
        if isinstance(data, dict) and "types" in data and "message" in data:
            from rtstore_spark.crypto.eip712 import typed_data_signing_hash
            from rtstore_spark.crypto.secp256k1 import recover_address

            try:
                sender = recover_address(typed_data_signing_hash(data), signature)
            except Exception as e:
                raise SetupError(f"invalid signature: {e}") from e
            data = dict(data["message"])
        else:
            try:
                verify_signature(payload, 0, sender, signature, self.sig_mode)
            except Exception as e:
                raise SetupError(f"invalid signature: {e}") from e
        if sender.lower() != self.admin_addr.lower():
            raise SetupError("You are not the admin", grpc_code=7)
        chain_id = int(data.get("chainId", 0))
        if chain_id == 0:
            raise SetupError(f"invalid chain id {chain_id}")
        contract_addr = data.get("contractAddr", "")
        if not contract_addr:
            raise SetupError("contract address is empty")
        evm_node_url = data.get("evmNodeUrl", "")
        if not evm_node_url:
            raise SetupError("evm node rpc is empty")
        if not evm_node_url.startswith(("ws://", "wss://")):
            raise SetupError("only the websocket url is valid")
        ar_node_url = data.get("arNodeUrl", "")
        if not ar_node_url:
            raise SetupError("ar node rpc is empty")
        network_id = int(data.get("networkId", 0))

        with self._setup_lock:
            return self._apply_config(data, sender, chain_id, contract_addr,
                                      evm_node_url, ar_node_url, network_id)

    def _apply_config(
        self, data, sender, chain_id, contract_addr, evm_node_url,
        ar_node_url, network_id,
    ) -> tuple[int, str]:
        prev = self.config()
        row = {
            "version": (prev["version"] + 1) if prev else 1,
            "chain_id": chain_id,
            "contract_addr": contract_addr,
            "evm_node_url": evm_node_url,
            "ar_node_url": ar_node_url,
            "network_id": network_id,
            "rollup_interval": int(
                data.get("rollupInterval", _DEFAULTS["rollup_interval"])
            ),
            "rollup_max_interval": int(
                data.get("rollupMaxInterval", _DEFAULTS["rollup_max_interval"])
            ),
            "min_rollup_size": int(
                data.get("minRollupSize", _DEFAULTS["min_rollup_size"])
            ),
            "min_gc_offset": int(data.get("minGcOffset", _DEFAULTS["min_gc_offset"])),
            "updated_by": sender,
            "updated_ms": int(time.time() * 1000),
        }
        self.spark.createDataFrame([row], schema=CONFIG_SCHEMA).coalesce(
            1
        ).write.mode("append").parquet(self._config_path())
        return 0, "ok"

    def config(self) -> dict | None:
        """The latest applied SystemConfig, or None before first Setup."""
        if not self.fs.exists(self._config_path()):
            return None
        rows = (
            self.spark.read.schema(CONFIG_SCHEMA)
            .parquet(self._config_path())
            .orderBy(F.col("version").desc())
            .head(1)
        )
        return rows[0].asDict() if rows else None

    # -- GetSystemStatus ----------------------------------------------

    def get_system_status(self) -> dict:
        """SystemStatus shape (db3_base.proto:41-50). Chain balances need a
        live RPC — reported as "0" placeholders, like an unfunded node."""
        cfg = self.config()
        return {
            "evm_account": self.admin_addr,
            "evm_balance": "0",
            "ar_account": self.admin_addr,
            "ar_balance": "0",
            "node_url": self.node_url,
            "config": cfg,
            "has_inited": cfg is not None,
            "admin_addr": self.admin_addr,
            "version": VERSION,
        }


def contract_sync_status(store: DocStore) -> list[dict]:
    """GetContractSyncStatus (db3_indexer.proto:43-48): one row per event
    database — contract address, node url, and the applied block/event
    high-water marks, computed from the event documents themselves
    (each decoded doc carries ``block_number``; evm.py:116-124).

    One Spark aggregate per event database (control-plane cardinality);
    collections of one database are unioned so the scan is a single job.
    """
    out: list[dict] = []
    for db in store.databases_latest():
        if db["db_type"] != "event":
            continue
        meta = json.loads(db["meta"]) if db.get("meta") else {}
        addr = meta.get("contract_address", db["db_addr"])
        url = meta.get("evm_node_url", "")
        cols = [r["col_name"] for r in store.collections(db["db_addr"]).collect()]
        block_number, event_number = 0, 0
        state = None
        for col in cols:
            s = store.current_state(db["db_addr"], col).select("doc")
            state = s if state is None else state.unionByName(s)
        if state is not None:
            agg = state.agg(
                F.coalesce(
                    F.max(F.get_json_object("doc", "$.block_number").cast("long")),
                    F.lit(0),
                ).alias("b"),
                F.count(F.lit(1)).alias("n"),
            ).collect()[0]
            block_number, event_number = int(agg["b"]), int(agg["n"])
        out.append(
            {
                "addr": addr,
                "evm_node_url": url,
                "block_number": block_number,
                "event_number": event_number,
            }
        )
    return out

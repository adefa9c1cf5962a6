"""Node launcher (python -m rtstore_spark) — command.rs parity.

The rollup smoke test launches the REAL thing: a subprocess running
``python -m rtstore_spark rollup`` with ephemeral ports, then speaks to
it over both fronts (JSON HTTP and raw gRPC/h2c), sends a signed wire
mutation, and watches the block ticker + scheduled rollup produce a
manifest row. ``recover`` is exercised in-process against the
artifacts the subprocess produced.
"""

from __future__ import annotations

import json
import os
import signal
import socket
import subprocess
import sys
import tempfile
import time
import urllib.request

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _post_json(port: int, path: str, body: dict, timeout: float = 60) -> dict:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read())


class TestParser:
    def test_defaults_mirror_the_reference(self):
        from rtstore_spark.__main__ import _parser

        a = _parser().parse_args(["rollup"])
        assert a.port == 26619          # command.rs listening_port default
        assert a.block_interval == 2.0  # command.rs block_interval 2000 ms
        assert a.root == "./node"
        b = _parser().parse_args(["index", "--source-root", "/x"])
        assert b.port == 26639
        with pytest.raises(SystemExit):
            _parser().parse_args(["index"])  # source-root is required


class TestRollupNodeSubprocess:
    def test_launch_mutate_rollup_recover(self, spark, tmp_path):
        from rtstore_spark.crypto.secp256k1 import priv_to_address
        from rtstore_spark.wire.envelope import wrap_and_sign
        from rtstore_spark.wire.schemas import encode_mutation

        root = str(tmp_path / "noderoot")
        port, h2_port = _free_port(), _free_port()
        proc = subprocess.Popen(
            [sys.executable, "-m", "rtstore_spark", "rollup",
             "--root", root, "--port", str(port),
             "--h2-port", str(h2_port), "--block-interval", "1.0",
             "--rollup-max-interval-ms", "1000"],  # roll fast in the test
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        try:
            # wait for the banner via a reader THREAD so a wedged child
            # (alive but silent) fails at the deadline instead of
            # blocking forever in readline(); the thread then keeps
            # draining the pipe so Spark's chatter can't fill it
            import queue
            import threading

            banner: queue.Queue = queue.Queue()

            def _drain():
                for line in proc.stdout:
                    if "rollup node up" in line:
                        banner.put(line)

            threading.Thread(target=_drain, daemon=True).start()
            deadline = time.monotonic() + 180
            up = False
            while time.monotonic() < deadline and not up:
                assert proc.poll() is None, "node exited early"
                try:
                    banner.get(timeout=2)
                    up = True
                except queue.Empty:
                    pass
            assert up, "node never came up"

            priv = 0x4848484848484848484848484848484848484848484848484848484848484848
            me = priv_to_address(priv)
            # JSON front answers
            out = _post_json(port, "/v1/storage/GetNonce", {"address": me})
            nonce = int(out.get("nonce", 1))
            # signed wire mutation through the JSON front
            payload, sig = wrap_and_sign(
                encode_mutation("CreateDocumentDB", [{
                    "db_address": None, "kind": "doc_database_mutation",
                    "body": {"db_desc": "cli-smoke"},
                }]), nonce, priv,
            )
            out = _post_json(port, "/v1/storage/SendMutation",
                             {"signature": sig,
                              "payload": "0x" + payload.hex()},
                             timeout=120)
            assert out.get("code", 0) == 0, out
            db = next(i["value"] for i in out["items"] if i["key"] == "db_addr")

            # raw gRPC (h2c) front on the SAME store
            sys.path.insert(0, os.path.join(REPO, "tests"))
            from test_h2 import H2Client

            c = H2Client(h2_port, timeout=60)
            try:
                msgs, status, msg = c.call(
                    "/db3_storage_proto.StorageNode/GetDatabase",
                    {"addr": db},
                )
                assert status == 0, msg
                got = "0x" + msgs[0]["database"]["doc_db"]["address"].hex()
                assert got == db
            finally:
                c.close()

            # the ticker closes the block and the policy eventually rolls
            # (SystemStore default config: interval-triggered)
            deadline = time.monotonic() + 120
            manifest_dir = os.path.join(root, "rollup_manifest")
            while time.monotonic() < deadline:
                if os.path.isdir(manifest_dir) and any(
                    f.endswith(".parquet") for f in os.listdir(manifest_dir)
                ):
                    break
                time.sleep(2)
            else:
                pytest.fail("no rollup manifest appeared")
        finally:
            proc.send_signal(signal.SIGINT)
            try:
                proc.wait(timeout=60)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait(timeout=30)

        # recover: cold-start a fresh store from the artifacts (in-process)
        from rtstore_spark.__main__ import main as cli_main
        from rtstore_spark.store.docstore import DocStore

        fresh_root = tempfile.mkdtemp(prefix="cli_recover_")
        cli_main(["recover", "--root", fresh_root,
                  "--from-dir", os.path.join(root, "rollups")])
        fresh = DocStore(spark, fresh_root)
        assert any(r["db_addr"] == db for r in fresh.databases().collect())


class TestRecoverReferenceArtifact:
    GOLDEN = "/root/reference/src/node/resources/test/37829_37968.gz.parquet"

    def test_recover_handles_unsigned_reference_schema(self, spark, tmp_path):
        # review regression: recover read with an explicit long/int
        # schema, which aborts on the reference's UNSIGNED uint64/uint32
        # parquet — the advertised reference-chain recovery path crashed
        # before the format probe ran
        import shutil

        if not os.path.exists(self.GOLDEN):
            pytest.skip("reference artifact not present")
        src = tmp_path / "ref-artifacts"
        os.makedirs(src)
        shutil.copy(self.GOLDEN, src / "37829_37968.gz.parquet")
        from rtstore_spark.__main__ import main as cli_main
        from rtstore_spark.store.docstore import DocStore

        fresh = str(tmp_path / "ref-recovered")
        cli_main(["recover", "--root", fresh, "--from-dir", str(src)])
        store = DocStore(spark, fresh)
        assert store.databases().count() == 69


class TestNodePairLifecycle:
    """Round-8 done-gate: a rollup node and an index node as SEPARATE
    subprocesses over a shared filesystem — writes land on the rollup
    node, reads answer from the index node over BOTH fronts, and the
    index node survives a SIGKILL mid-tail: the restarted process
    resumes from its checkpoint and converges with no duplicates
    (exactly-once across the kill)."""

    PRIV = 0x5151515151515151515151515151515151515151515151515151515151515151

    @staticmethod
    def _start(argv: list[str], banner_text: str, timeout: float = 180):
        import queue
        import threading

        proc = subprocess.Popen(
            [sys.executable, "-m", "rtstore_spark"] + argv,
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        banner: queue.Queue = queue.Queue()

        def _drain():
            for line in proc.stdout:
                if banner_text in line:
                    banner.put(line)

        threading.Thread(target=_drain, daemon=True).start()
        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            assert proc.poll() is None, f"{argv[0]} node exited early"
            try:
                banner.get(timeout=2)
                return proc
            except Exception:  # noqa: BLE001 — queue.Empty
                pass
        proc.kill()
        raise AssertionError(f"{argv[0]} node never came up")

    @staticmethod
    def _stop(proc):
        if proc.poll() is None:
            proc.send_signal(signal.SIGINT)
            try:
                proc.wait(timeout=60)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait(timeout=30)

    def _send_doc(self, port: int, db: str, nonce: int, v: int):
        from rtstore_spark.wire.bsonlite import bson_encode
        from rtstore_spark.wire.envelope import wrap_and_sign
        from rtstore_spark.wire.schemas import encode_mutation

        payload, sig = wrap_and_sign(
            encode_mutation("AddDocument", [{
                "db_address": db, "kind": "document_mutation",
                "body": {"collection_name": "c",
                         "documents": [bson_encode({"v": int(v)})]},
            }]), nonce, self.PRIV,
        )
        out = _post_json(port, "/v1/storage/SendMutation",
                         {"signature": sig, "payload": "0x" + payload.hex()},
                         timeout=120)
        assert out.get("code", 0) == 0, out

    def _index_docs(self, port: int, db: str) -> list[dict]:
        out = _post_json(port, "/v1/indexer/RunQuery",
                         {"db_addr": db, "col_name": "c",
                          "query": {"query_str": "/*"}}, timeout=120)
        return out.get("documents", [])

    def test_write_one_read_other_kill_restart(self, tmp_path):
        from rtstore_spark.crypto.secp256k1 import priv_to_address
        from rtstore_spark.wire.envelope import wrap_and_sign
        from rtstore_spark.wire.schemas import encode_mutation

        node_root = str(tmp_path / "pair-node")
        index_root = str(tmp_path / "pair-index")
        w_port, w_h2 = _free_port(), _free_port()
        i_port, i_h2 = _free_port(), _free_port()

        writer = self._start(
            ["rollup", "--root", node_root, "--port", str(w_port),
             "--h2-port", str(w_h2), "--block-interval", "1.0"],
            "rollup node up",
        )
        index_argv = [
            "index", "--root", index_root, "--source-root", node_root,
            "--port", str(i_port), "--h2-port", str(i_h2),
            "--poll-interval", "1.0",
        ]
        reader = None
        try:
            me = priv_to_address(self.PRIV)
            nonce = int(_post_json(
                w_port, "/v1/storage/GetNonce", {"address": me}
            ).get("nonce", 1))
            payload, sig = wrap_and_sign(
                encode_mutation("CreateDocumentDB", [{
                    "db_address": None, "kind": "doc_database_mutation",
                    "body": {"db_desc": "pair"},
                }]), nonce, self.PRIV,
            )
            out = _post_json(w_port, "/v1/storage/SendMutation",
                             {"signature": sig,
                              "payload": "0x" + payload.hex()}, timeout=120)
            assert out.get("code", 0) == 0, out
            db = next(i["value"] for i in out["items"] if i["key"] == "db_addr")
            payload, sig = wrap_and_sign(
                encode_mutation("AddCollection", [{
                    "db_address": db, "kind": "collection_mutation",
                    "body": {"collection_name": "c"},
                }]), nonce + 1, self.PRIV,
            )
            out = _post_json(w_port, "/v1/storage/SendMutation",
                             {"signature": sig,
                              "payload": "0x" + payload.hex()}, timeout=120)
            assert out.get("code", 0) == 0, out
            self._send_doc(w_port, db, nonce + 2, v=1)

            reader = self._start(index_argv, "index node up")

            # the tail replays catch-up batches; the doc becomes visible
            # on the INDEX node's JSON front
            deadline = time.monotonic() + 180
            docs = []
            while time.monotonic() < deadline:
                try:
                    docs = self._index_docs(i_port, db)
                except Exception:  # noqa: BLE001 — replica still replaying
                    docs = []
                if len(docs) >= 1:
                    break
                time.sleep(2)
            assert [d["doc"]["v"] for d in docs] == [1]

            # differential: the index node's RAW gRPC front answers the
            # same database over h2c
            sys.path.insert(0, os.path.join(REPO, "tests"))
            from test_h2 import H2Client

            c = H2Client(i_h2, timeout=60)
            try:
                msgs, status, msg = c.call(
                    "/db3_storage_proto.StorageNode/GetDatabase",
                    {"addr": db},
                )
                assert status == 0, msg
                got = "0x" + msgs[0]["database"]["doc_db"]["address"].hex()
                assert got == db
            finally:
                c.close()

            # kill the index node MID-TAIL (no clean shutdown), write
            # more to the rollup node, restart the index node on the
            # SAME root: the checkpoint resumes exactly-once
            reader.kill()
            reader.wait(timeout=30)
            self._send_doc(w_port, db, nonce + 3, v=2)
            self._send_doc(w_port, db, nonce + 4, v=3)

            reader = self._start(index_argv, "index node up")
            deadline = time.monotonic() + 180
            vals: list[int] = []
            while time.monotonic() < deadline:
                try:
                    vals = sorted(
                        d["doc"]["v"] for d in self._index_docs(i_port, db)
                    )
                except Exception:  # noqa: BLE001
                    vals = []
                if len(vals) >= 3:
                    break
                time.sleep(2)
            # convergence AND no duplicates: exactly [1, 2, 3]
            assert vals == [1, 2, 3]
        finally:
            self._stop(writer)
            if reader is not None:
                self._stop(reader)

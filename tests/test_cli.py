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

"""Streaming ingest + MetaStore processor + mutation-state tests."""

from __future__ import annotations

import json

import pytest

from rtstore_spark.sources.evm import JsonlLogSource, MetaStoreEventProcessor
from rtstore_spark.store import DocStore
from rtstore_spark.store.ingest import Ingest, digest_signature
from rtstore_spark.streaming.ingest_stream import StreamingIngest

ALICE = "0x" + "aa" * 20


def envelope(payload: dict, sender: str, nonce: int) -> dict:
    body = json.dumps(payload, sort_keys=True)
    return {
        "payload": body,
        "signature": digest_signature(body, nonce, sender),
        "sender": sender,
        "nonce": nonce,
    }


class TestStreamingIngest:
    def test_staged_envelopes_applied_per_block(self, spark, tmp_path):
        store = DocStore(spark, str(tmp_path / "w"))
        ing = Ingest(store)
        si = StreamingIngest(spark, ing, str(tmp_path / "staging"))

        batch1 = [
            envelope({"action": "create_database", "body": {"desc": "d"}}, ALICE, 1),
        ]
        (tmp_path / "staging" / "b1.jsonl").write_text(
            "\n".join(json.dumps(e) for e in batch1)
        )
        si.start(once=True)

        db = store.databases().collect()[0]["db_addr"]
        batch2 = [
            envelope(
                {"action": "add_collection", "db_addr": db, "col_name": "c", "body": {}},
                ALICE, 2,
            ),
            envelope(
                {"action": "add_document", "db_addr": db, "col_name": "c",
                 "body": {"docs": ['{"v": 1}', '{"v": 2}']}},
                ALICE, 3,
            ),
            # bad signature: must be rejected without failing the batch
            {"payload": json.dumps({"action": "create_database", "body": {}}),
             "signature": "bogus", "sender": ALICE, "nonce": 4},
        ]
        (tmp_path / "staging" / "b2.jsonl").write_text(
            "\n".join(json.dumps(e) for e in batch2)
        )
        si.start(once=True)

        assert store.current_state(db, "c").count() == 2
        assert len(si.rejected) == 1 and "bad signature" in si.rejected[0][1]
        # block advanced once per micro-batch
        assert store.state.block >= 2
        st = store.mutation_state()
        assert st["mutation_count"] == 3 and st["total_storage_bytes"] > 0

    def test_unknown_action_answered_not_dropped(self, spark, tmp_path):
        """An admitted mutation with an unknown action (or a payload that
        fails JSON parsing) gets a per-mutation rejection like the
        sequential path's InvalidMutation — and still consumes its nonce,
        like the reference's per-mutation error responses."""
        store = DocStore(spark, str(tmp_path / "w2"))
        ing = Ingest(store)
        si = StreamingIngest(spark, ing, str(tmp_path / "staging2"))

        batch = [
            envelope({"action": "create_database", "body": {"desc": "d"}}, ALICE, 1),
            envelope({"action": "frobnicate", "body": {}}, ALICE, 2),
            # syntactically valid signature over a non-object payload
            {"payload": "not json {", "signature":
             digest_signature("not json {", 3, ALICE),
             "sender": ALICE, "nonce": 3},
        ]
        (tmp_path / "staging2" / "b1.jsonl").write_text(
            "\n".join(json.dumps(e) for e in batch)
        )
        si.start(once=True)

        reasons = sorted(r for _, r in si.rejected)
        assert len(reasons) == 2
        assert any("unknown action frobnicate" in r for r in reasons)
        assert any("malformed payload" in r for r in reasons)
        # nonces consumed at admission: next valid nonce is 4
        assert ing.get_nonce(ALICE) == 4
        assert store.databases().count() == 1

    def test_empty_docs_add_is_noop_not_crash(self, spark, tmp_path):
        """An admitted add_document with an EMPTY docs list must apply as
        a no-op (like the sequential path) — not crash the block apply."""
        store = DocStore(spark, str(tmp_path / "w4"))
        ing = Ingest(store)
        si = StreamingIngest(spark, ing, str(tmp_path / "staging4"))

        (tmp_path / "staging4" / "b0.jsonl").write_text("\n".join([
            json.dumps(envelope({"action": "create_database", "body": {"desc": "d"}}, ALICE, 1)),
        ]))
        si.start(once=True)
        db = store.databases().collect()[0]["db_addr"]
        (tmp_path / "staging4" / "b1.jsonl").write_text("\n".join([
            json.dumps(envelope({"action": "add_collection", "db_addr": db,
                                 "col_name": "c", "body": {}}, ALICE, 2)),
        ]))
        si.start(once=True)
        (tmp_path / "staging4" / "b2.jsonl").write_text("\n".join([
            json.dumps(envelope({"action": "add_document", "db_addr": db,
                                 "col_name": "c", "body": {"docs": []}}, ALICE, 3)),
            json.dumps(envelope({"action": "add_document", "db_addr": db,
                                 "col_name": "c", "body": {"docs": ['{"v": 1}']}}, ALICE, 4)),
        ]))
        si.start(once=True)
        assert not si.rejected
        assert store.current_state(db, "c").count() == 1
        # both mutations are in the log (the empty add as a no-op record)
        adds = store.mutation_log().filter("action = 'add_document'").count()
        assert adds == 2


class TestMetaStore:
    def test_live_processing_time_trigger(self, spark, tmp_path):
        """The continuous topology: a running processingTime query picks up
        envelope files dropped AFTER start, closing one block per trigger —
        availableNow covers the batch semantics, this covers the live loop."""
        import time

        store = DocStore(spark, str(tmp_path / "w"))
        ing = Ingest(store)
        si = StreamingIngest(
            spark, ing, str(tmp_path / "staging"), interval="1 seconds"
        )
        q = si.start()  # live trigger
        try:
            (tmp_path / "staging" / "live1.jsonl").write_text(
                json.dumps(
                    envelope(
                        {"action": "create_database", "body": {"desc": "live"}},
                        ALICE, 1,
                    )
                )
            )
            deadline = time.time() + 60
            while time.time() < deadline and not store.databases().head(1):
                time.sleep(1)
            rows = store.databases().collect()
            assert rows and rows[0]["desc"] == "live"
            db = rows[0]["db_addr"]

            # a second file lands in a LATER block than the first
            (tmp_path / "staging" / "live2.jsonl").write_text(
                json.dumps(
                    envelope(
                        {"action": "add_collection", "db_addr": db,
                         "col_name": "c", "body": {}},
                        ALICE, 2,
                    )
                )
            )
            while time.time() < deadline and not store.collections(db).head(1):
                time.sleep(1)
            cols = store.collections(db).collect()
            assert [c["col_name"] for c in cols] == ["c"]
            assert cols[0]["block"] > rows[0]["block"]
        finally:
            q.stop()

    def test_mint_from_registry_events(self, spark, tmp_path):
        store = DocStore(spark, str(tmp_path / "w"))
        fixture = tmp_path / "meta.jsonl"
        db_addr = "0x" + "cc" * 20
        fixture.write_text(
            "\n".join(
                json.dumps(x)
                for x in [
                    {"event": "CreateDatabase", "block_number": 1,
                     "args": {"sender": ALICE, "databaseAddress": db_addr,
                              "description": "minted"}},
                    {"event": "CreateCollection", "block_number": 2,
                     "args": {"databaseAddress": db_addr, "name": "tbl",
                              "sender": ALICE}},
                ]
            )
        )
        proc = MetaStoreEventProcessor(store)
        counts = proc.process(JsonlLogSource(str(fixture)))
        assert counts == {"CreateDatabase": 1, "CreateCollection": 1}
        # minted at the on-chain address, owned by the on-chain sender
        rows = store.databases().collect()
        assert rows[0]["db_addr"] == db_addr and rows[0]["sender"] == ALICE
        assert [c["col_name"] for c in store.collections(db_addr).collect()] == ["tbl"]


class TestBatchSequentialEquivalence:
    def test_random_mutation_stream_matches_sequential(self, spark, tmp_path):
        """Property: for a randomized multi-sender mutation stream whose
        updates/deletes target only documents created in EARLIER blocks
        (the regime where batch and sequential semantics are defined to
        agree — see batch_apply's documented intra-block deviation), the
        set-wise batch applier and the sequential Ingest produce identical
        final state: same doc ids, owners, and document bodies."""
        import random

        rng = random.Random(7)
        senders = ["0x" + c * 40 for c in "abc"]

        seq_store = DocStore(spark, str(tmp_path / "seq"))
        seq_ing = Ingest(seq_store)
        bat_store = DocStore(spark, str(tmp_path / "bat"))
        si = StreamingIngest(spark, Ingest(bat_store), str(tmp_path / "stg"))

        nonces = dict.fromkeys(senders, 0)

        def make(sender, payload):
            nonces[sender] += 1
            return payload, sender, nonces[sender]

        # block 0: create db + collection (owner: senders[0])
        setup = [
            make(senders[0], {"action": "create_database", "body": {"desc": "d"}}),
        ]
        live: dict[int, str] = {}  # doc_id -> owner, as of last closed block

        def run_block(muts, fname):
            lines = []
            for payload, sender, nonce in muts:
                body = json.dumps(payload, sort_keys=True)
                lines.append(json.dumps({
                    "payload": body,
                    "signature": digest_signature(body, nonce, sender),
                    "sender": sender, "nonce": nonce,
                }))
            (tmp_path / "stg" / fname).write_text("\n".join(lines))
            si.start(once=True)
            for payload, sender, nonce in muts:  # same order, sequentially
                seq_ing.send_mutation(payload, digest_signature(
                    json.dumps(payload, sort_keys=True), nonce, sender
                ), sender, nonce)
            seq_store.state.next_block()

        run_block(setup, "b0.jsonl")
        db_seq = seq_store.databases().collect()[0]["db_addr"]
        db_bat = bat_store.databases().collect()[0]["db_addr"]
        run_block(
            [make(senders[0], {"action": "add_collection", "db_addr": db_seq,
                               "col_name": "c", "body": {}})],
            "b1.jsonl",
        )

        def fix_db(p, db):
            q = dict(p)
            if "db_addr" in q:
                q["db_addr"] = db
            return q

        # three randomized doc-op blocks
        next_doc = {}
        for blk in range(3):
            muts = []
            for _ in range(rng.randint(4, 8)):
                sender = rng.choice(senders)
                kind = rng.choice(["add", "add", "update", "delete"])
                owned = [i for i, o in live.items() if o == sender]
                if kind == "add" or not owned:
                    docs = [json.dumps({"s": sender[:4], "v": rng.randint(0, 99)})
                            for _ in range(rng.randint(1, 3))]
                    muts.append(make(sender, {
                        "action": "add_document", "db_addr": "DB",
                        "col_name": "c", "body": {"docs": docs},
                    }))
                elif kind == "update":
                    target = rng.choice(owned)
                    muts.append(make(sender, {
                        "action": "update_document", "db_addr": "DB",
                        "col_name": "c",
                        "body": {"ids": [target],
                                 "patches": [json.dumps({"u": rng.randint(0, 9)})]},
                    }))
                else:
                    target = rng.choice(owned)
                    live.pop(target)
                    muts.append(make(sender, {
                        "action": "delete_document", "db_addr": "DB",
                        "col_name": "c", "body": {"ids": [target]},
                    }))
            # run against both stores with their own db address
            lines = []
            for payload, sender, nonce in muts:
                body = json.dumps(fix_db(payload, db_bat), sort_keys=True)
                lines.append(json.dumps({
                    "payload": body,
                    "signature": digest_signature(body, nonce, sender),
                    "sender": sender, "nonce": nonce,
                }))
            (tmp_path / "stg" / f"d{blk}.jsonl").write_text("\n".join(lines))
            si.start(once=True)
            for payload, sender, nonce in muts:
                p = fix_db(payload, db_seq)
                body = json.dumps(p, sort_keys=True)
                if p["action"] == "add_document":
                    ids = seq_ing.send_mutation(
                        p, digest_signature(body, nonce, sender), sender, nonce
                    )["items"]
                    for item in ids:
                        live[int(item["value"])] = sender
                else:
                    seq_ing.send_mutation(
                        p, digest_signature(body, nonce, sender), sender, nonce
                    )
            seq_store.state.next_block()

        assert not si.rejected
        seq_state = sorted(
            (r["doc_id"], r["owner"], json.dumps(json.loads(r["doc"]), sort_keys=True))
            for r in seq_store.current_state(db_seq, "c").collect()
        )
        bat_state = sorted(
            (r["doc_id"], r["owner"], json.dumps(json.loads(r["doc"]), sort_keys=True))
            for r in bat_store.current_state(db_bat, "c").collect()
        )
        assert seq_state == bat_state and len(seq_state) == len(live)


class TestArrivalStamp:
    def test_deterministic_under_file_splitting(self, spark, tmp_path):
        """_stamp_arrival must reproduce in-file line order even when one
        staging file is split into many input partitions — split packing
        order is not guaranteed to follow in-file byte offsets, which is
        exactly why the stamp orders by (_file, _split_start, mono_id)
        instead of a bare monotonically_increasing_id."""
        from pyspark.sql import functions as F

        from rtstore_spark.store.batch_apply import BatchApplier
        from rtstore_spark.streaming.ingest_stream import ENVELOPE_SCHEMA

        stage = tmp_path / "stamp"
        stage.mkdir()
        pad = "x" * 200  # ~250 B/line: 500 lines split at 4 KB -> ~30 splits
        (stage / "big.jsonl").write_text(
            "\n".join(
                json.dumps({"payload": pad, "signature": "s",
                            "sender": ALICE, "nonce": i})
                for i in range(500)
            )
        )
        old = spark.conf.get("spark.sql.files.maxPartitionBytes")
        try:
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(4 * 1024))
            batch = (
                spark.read.schema(ENVELOPE_SCHEMA)
                .json(str(stage))
                .select(
                    "*",
                    F.col("_metadata.file_path").alias("_file"),
                    F.col("_metadata.file_block_start").alias("_split_start"),
                )
            )
            assert batch.rdd.getNumPartitions() > 1  # the file really split
            store = DocStore(spark, str(tmp_path / "w3"))
            applier = BatchApplier(Ingest(store))
            got = (
                applier._stamp_arrival(batch)
                .select("nonce", "_arrival")
                .collect()
            )
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)
        by_arrival = [r["nonce"] for r in sorted(got, key=lambda r: r["_arrival"])]
        assert by_arrival == list(range(500))
        arrivals = sorted(r["_arrival"] for r in got)
        assert arrivals == list(range(1, 501))  # contiguous, 1-based


class TestBatchScale:
    def test_large_block_jobs_independent_of_mutation_count(self, spark, tmp_path):
        """The set-wise block apply must (a) produce the exact sequentially-
        expected state for a 5k+ mutation block and (b) schedule a Spark job
        count that does not grow with the mutation count."""
        from rtstore_spark.functions.merge_patch import merge_patch

        def job_counter():
            return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()

        store = DocStore(spark, str(tmp_path / "w"))
        ing = Ingest(store)
        si = StreamingIngest(spark, ing, str(tmp_path / "staging"))

        # block 1: create db + collection
        db_addr = None
        setup = [envelope({"action": "create_database", "body": {"desc": "d"}}, ALICE, 1)]
        (tmp_path / "staging" / "b0.jsonl").write_text(
            "\n".join(json.dumps(e) for e in setup)
        )
        si.start(once=True)
        db_addr = store.databases().collect()[0]["db_addr"]
        (tmp_path / "staging" / "b1.jsonl").write_text(json.dumps(envelope(
            {"action": "add_collection", "db_addr": db_addr, "col_name": "c", "body": {}},
            ALICE, 2,
        )))
        si.start(once=True)

        def doc_block(fname, senders, n_adds, n_updates, n_deletes, nonce0):
            """Write one staged file with adds then updates then deletes."""
            envs = []
            nonces = {s: nonce0 for s in senders}
            for i in range(n_adds):
                s = senders[i % len(senders)]
                envs.append(envelope(
                    {"action": "add_document", "db_addr": db_addr, "col_name": "c",
                     "body": {"docs": [json.dumps({"i": i, "who": s})]}},
                    s, nonces[s]))
                nonces[s] += 1
            for i in range(n_updates):
                s = senders[i % len(senders)]
                # doc ids are sequential from 1 in add order; patch our own doc
                target = 1 + prior_docs + i * len(senders) // len(senders)
                envs.append(envelope(
                    {"action": "update_document", "db_addr": db_addr, "col_name": "c",
                     "body": {"ids": [1 + prior_docs + i],
                              "patches": [json.dumps({"u": i})]}},
                    s, nonces[s]))
                nonces[s] += 1
            for i in range(n_deletes):
                s = senders[i % len(senders)]
                envs.append(envelope(
                    {"action": "delete_document", "db_addr": db_addr, "col_name": "c",
                     "body": {"ids": [1 + prior_docs + n_updates + i]}},
                    s, nonces[s]))
                nonces[s] += 1
            (tmp_path / "staging" / fname).write_text(
                "\n".join(json.dumps(e) for e in envs))
            return nonces

        # small block: 30 adds, 5 updates, 5 deletes — all by one sender set
        prior_docs = 0
        doc_block("b2.jsonl", [ALICE], 30, 5, 5, 3)
        j0 = job_counter()
        si.start(once=True)
        small_jobs = job_counter() - j0

        # big block: 5000 adds + 400 updates + 300 deletes from 4 senders
        prior_docs = 30
        senders = [ALICE, "0x" + "bb" * 20, "0x" + "cc" * 20, "0x" + "dd" * 20]
        doc_block("b3.jsonl", senders, 5000, 400, 300, 2000)
        j1 = job_counter()
        si.start(once=True)
        big_jobs = job_counter() - j1

        assert si.rejected == []
        # same collection set → job count must not scale with mutation count
        assert big_jobs <= small_jobs + 5, (small_jobs, big_jobs)

        # updates patch docs added in the same block; deletes remove others
        state = {r["doc_id"]: r["doc"] for r in store.current_state(db_addr, "c").collect()}
        assert len(state) == 30 + 5000 - 5 - 300
        # spot-check a patched doc: update i=0 patched doc_id 31 (1+30+0)
        got = json.loads(state[31])
        want = merge_patch(json.loads(json.dumps({"i": 0, "who": senders[0]})), {"u": 0})
        assert got == want
        # a deleted doc is gone
        assert (31 + 400) not in state
        st = store.mutation_state()
        assert st["mutation_count"] >= 2 + 40 + 5700


class TestMalformedEnvelope:
    def test_garbage_staging_line_rejected_not_crash(self, spark, tmp_path):
        """A staging line that is not a JSON envelope at all parses
        (PERMISSIVE) to an all-null row; it must surface as one
        'malformed envelope' rejection — one garbage line must never stall
        the whole block apply (the old reject path crashed on
        int(None nonce))."""
        store = DocStore(spark, str(tmp_path / "w5"))
        ing = Ingest(store)
        si = StreamingIngest(spark, ing, str(tmp_path / "staging5"))

        lines = [
            json.dumps(
                envelope({"action": "create_database", "body": {"desc": "d"}}, ALICE, 1)
            ),
            "this is not json at all {{{",
            json.dumps(
                envelope({"action": "create_database", "body": {"desc": "e"}}, ALICE, 2)
            ),
        ]
        (tmp_path / "staging5" / "b1.jsonl").write_text("\n".join(lines))
        si.start(once=True)

        # both real envelopes applied, the garbage line rejected by name
        assert store.databases().count() == 2
        assert len(si.rejected) == 1
        env, reason = si.rejected[0]
        assert reason == "malformed envelope"
        assert env["nonce"] == 0 and env["sender"] is None
        assert ing.get_nonce(ALICE) == 3


class TestNonJsonCaller:
    def test_parquet_backed_batch_uses_fallback_not_json_reread(
        self, spark, tmp_path
    ):
        """A caller handing apply() a parquet-backed envelope DataFrame must
        go through the input_file_name fallback — re-reading parquet bytes
        as JSON would silently turn every row into nulls."""
        from rtstore_spark.store.batch_apply import BatchApplier

        store = DocStore(spark, str(tmp_path / "wpq"))
        ing = Ingest(store)
        envs = [
            envelope({"action": "create_database", "body": {"desc": "d"}}, ALICE, 1),
        ]
        pq = str(tmp_path / "envs.parquet")
        spark.createDataFrame(envs).write.parquet(pq)
        batch = spark.read.parquet(pq)
        assert batch.inputFiles()  # file-backed: the old code re-read it
        rejected = BatchApplier(ing).apply(batch)
        assert rejected == []
        assert store.databases().count() == 1


class TestAutoCompaction:
    def test_long_ingest_keeps_file_counts_bounded(self, spark, tmp_path):
        """A long-running ingest must not accumulate one file per block
        forever: the per-N-blocks maybe_compact sweep keeps collection and
        catalog file counts bounded, and query results are identical
        before/after each compaction."""
        store = DocStore(spark, str(tmp_path / "wac"))
        ing = Ingest(store)
        si = StreamingIngest(
            spark, ing, str(tmp_path / "stagingac"),
            compact_every=2, compact_max_files=3,
        )

        (tmp_path / "stagingac" / "b0.jsonl").write_text(json.dumps(
            envelope({"action": "create_database", "body": {"desc": "d"}}, ALICE, 1)
        ))
        si.start(once=True)
        db = store.databases().collect()[0]["db_addr"]
        (tmp_path / "stagingac" / "b1.jsonl").write_text(json.dumps(
            envelope({"action": "add_collection", "db_addr": db,
                      "col_name": "c", "body": {}}, ALICE, 2)
        ))
        si.start(once=True)

        nonce = 3
        for blk in range(10):
            (tmp_path / "stagingac" / f"d{blk}.jsonl").write_text(json.dumps(
                envelope({"action": "add_document", "db_addr": db,
                          "col_name": "c",
                          "body": {"docs": [json.dumps({"blk": blk})]}},
                         ALICE, nonce)
            ))
            nonce += 1
            si.start(once=True)

        # 10 appended blocks, but the sweep kept the live file count at or
        # under the trigger threshold + the appends since the last sweep
        n_files = store._live_file_count(store._data_root(db, "c"))
        assert n_files <= 3 + 2
        assert any(c == (db, "c") for c in si.compacted)
        # every document survived every compaction
        vals = sorted(
            json.loads(r["doc"])["blk"]
            for r in store.current_state(db, "c").collect()
        )
        assert vals == list(range(10))
        # results identical across one more explicit compaction
        before = sorted(
            (r["doc_id"], r["doc"]) for r in store.current_state(db, "c").collect()
        )
        store.compact(db, "c")
        assert before == sorted(
            (r["doc_id"], r["doc"]) for r in store.current_state(db, "c").collect()
        )


class TestEnvelopeAndBodyValidation:
    def _setup(self, spark, tmp_path, tag):
        store = DocStore(spark, str(tmp_path / f"w_{tag}"))
        ing = Ingest(store)
        si = StreamingIngest(spark, ing, str(tmp_path / f"staging_{tag}"))
        db = store.create_database(ALICE, nonce=1)
        store.create_collection(db, "c", [], ALICE)
        ids = store.add_docs(db, "c", ['{"v": 1}', '{"v": 2}'], ALICE)
        return store, ing, si, db, ids

    def test_null_nonce_does_not_poison_senders_group(self, spark, tmp_path):
        """A null-nonce envelope for a VALID sender must be rejected alone:
        inside the pandas admission it would coerce the group's nonce
        column to float64, rendering '5.0' where '5' was signed — every
        other mutation of that sender would fail 'bad signature' (an
        unauthenticated one-line denial of service)."""
        store, ing, si, db, ids = self._setup(spark, tmp_path, "nn")
        good = envelope(
            {"action": "add_document", "db_addr": db, "col_name": "c",
             "body": {"docs": ['{"v": 3}']}},
            ALICE, 2,
        )
        bad = {"payload": json.dumps({"action": "create_database", "body": {}}),
               "signature": "x", "sender": ALICE, "nonce": None}
        (tmp_path / "staging_nn" / "b.jsonl").write_text(
            json.dumps(bad) + "\n" + json.dumps(good)
        )
        si.start(once=True)
        # the good mutation landed; only the null-nonce one was rejected
        assert store.current_state(db, "c").count() == 3
        assert [r for _, r in si.rejected] == ["malformed envelope"]
        assert ing.get_nonce(ALICE) == 3

    def test_mismatched_ids_patches_rejected_not_crash(self, spark, tmp_path):
        """ids/patches length mismatch zip-pads a null patch; it must be a
        per-mutation 'malformed payload' rejection, not a json.loads(None)
        crash of the whole block."""
        store, ing, si, db, ids = self._setup(spark, tmp_path, "mm")
        bad = envelope(
            {"action": "update_document", "db_addr": db, "col_name": "c",
             "body": {"ids": ids, "patches": ['{"v": 9}']}},  # 2 ids, 1 patch
            ALICE, 2,
        )
        good = envelope(
            {"action": "update_document", "db_addr": db, "col_name": "c",
             "body": {"ids": [ids[0]], "patches": ['{"v": 7}']}},
            ALICE, 3,
        )
        (tmp_path / "staging_mm" / "b.jsonl").write_text(
            json.dumps(bad) + "\n" + json.dumps(good)
        )
        si.start(once=True)
        assert [r for _, r in si.rejected] == ["malformed payload"]
        docs = {json.loads(r["doc"])["v"] for r in store.current_state(db, "c").collect()}
        assert docs == {7, 2}

    def test_non_json_patch_rejected_not_crash(self, spark, tmp_path):
        store, ing, si, db, ids = self._setup(spark, tmp_path, "nj")
        bad = envelope(
            {"action": "update_document", "db_addr": db, "col_name": "c",
             "body": {"ids": [ids[0]], "patches": ["not json at all {{"]}},
            ALICE, 2,
        )
        (tmp_path / "staging_nj" / "b.jsonl").write_text(json.dumps(bad))
        si.start(once=True)
        assert [r for _, r in si.rejected] == ["malformed payload"]
        assert store.current_state(db, "c").count() == 2

    def test_empty_ids_update_logged_not_lost(self, spark, tmp_path):
        """An empty-ids update/delete is an accepted no-op that must reach
        the mutation log (like empty adds) — not vanish while its nonce is
        consumed."""
        store, ing, si, db, ids = self._setup(spark, tmp_path, "ei")
        noop = envelope(
            {"action": "update_document", "db_addr": db, "col_name": "c",
             "body": {"ids": [], "patches": []}},
            ALICE, 2,
        )
        (tmp_path / "staging_ei" / "b.jsonl").write_text(json.dumps(noop))
        si.start(once=True)
        assert si.rejected == []
        assert ing.get_nonce(ALICE) == 3
        # logged: the block's mutation log carries the no-op update header
        hdr = store.scan_mutation_headers(limit=50).collect()
        assert any(h["action"] == "update_document" for h in hdr)


class TestConcurrentStreamAndDirect:
    def test_direct_sends_interleave_with_live_blocks(self, spark, tmp_path):
        """The sequencer lock under the REAL mixed topology: a live
        processingTime ingest stream closing blocks while direct
        send_mutation calls land from another thread. Every logged
        mutation must hold a unique (block, order) and the collection's
        doc ids must come out unique and gap-free — the interleavings
        this pins are block apply vs direct sequencing (both hold
        StateStore.lock for their whole span).

        Deflaked (round-8 full-gate failure): the old 60 s sleep-poll on
        current_state().count() starved under load — each poll is a
        Spark job, and micro-batches themselves slow down, so the
        deadline fired before convergence. Now the wait is the
        block-close latch: the predicate re-evaluates only when a block
        actually closed, with a generous failsafe that costs nothing on
        the green path."""
        import threading

        store = DocStore(spark, str(tmp_path / "mix"))
        ing = Ingest(store)
        db = store.create_database(ALICE, nonce=1)
        store.create_collection(db, "c", [], ALICE)
        si = StreamingIngest(
            spark, ing, str(tmp_path / "staging_mix"), interval="1 seconds"
        )

        direct_errors: list[Exception] = []

        def direct_sender(tag: str, sender: str):
            try:
                for n in range(1, 4):
                    payload = {
                        "action": "add_document", "db_addr": db,
                        "col_name": "c",
                        "body": {"docs": [json.dumps({"d": tag, "n": n})]},
                    }
                    body = json.dumps(payload, sort_keys=True)
                    ing.send_mutation(
                        payload, digest_signature(body, n, sender), sender, n
                    )
            except Exception as e:  # noqa: BLE001 — surfaced in asserts
                direct_errors.append(e)

        q = si.start()
        try:
            # stream side: two envelope files from a streaming sender
            streamer = "0x" + "dd" * 20
            (tmp_path / "staging_mix" / "s1.jsonl").write_text("\n".join(
                json.dumps(envelope(
                    {"action": "add_document", "db_addr": db, "col_name": "c",
                     "body": {"docs": [json.dumps({"s": i})]}}, streamer, i,
                )) for i in (1, 2)
            ))
            # direct side: two senders pushing concurrently with the stream
            threads = [
                threading.Thread(target=direct_sender, args=(t, s))
                for t, s in (("x", "0x" + "ee" * 20), ("y", "0x" + "ab" * 20))
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=240)
            converged = si.wait_until(
                lambda: store.current_state(db, "c").count() >= 8,
                timeout=300,
            )
        finally:
            q.stop()

        assert converged, "stream+direct never converged to 8 docs"

        assert not direct_errors, direct_errors
        assert not si.rejected
        docs = store.current_state(db, "c").collect()
        ids = sorted(r["doc_id"] for r in docs)
        assert ids == list(range(1, 9))  # 2 streamed + 6 direct, gap-free
        # every add_document log row holds a unique (block, order)... per
        # mutation id — a batch apply stamps its rows at arrival order
        log = store.mutation_log().filter("action = 'add_document'").collect()
        seqs = [(r["block"], r["order"]) for r in log]
        assert len(seqs) == 8 and len(set(seqs)) == 8

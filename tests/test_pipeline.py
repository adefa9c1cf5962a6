"""End-to-end corpus-prep pipeline: composition semantics over a crafted
corpus where every stage has a known victim."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from rtstore_spark.operators.pipeline import CorpusPrepConfig, prepare_corpus

GOOD_EN = (
    "the quick brown fox jumps over the lazy dog and the cat is in the "
    "house that it was built near to the river in the morning light"
)
GOOD_FR = (
    "le chat et le chien sont dans la maison et les oiseaux que une "
    "personne est venue voir des arbres dans le jardin pres de la riviere"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        Row(doc_id=0, body=GOOD_EN),                     # keeper (en)
        Row(doc_id=1, body=GOOD_EN),                     # exact dup of 0
        Row(doc_id=2, body=GOOD_EN + " tonight again"),  # near dup of 0
        Row(doc_id=3, body=GOOD_FR),                     # keeper (fr)
        Row(doc_id=4, body="short text"),                # fails min_tokens
        Row(doc_id=5, body="1 2 3 4 5 6 7 8 9 10 11 12 13 14 15 16 17 18"),
        # ^ fails digit-ratio gate
        Row(doc_id=6, body=" ".join(["word"] * 30)),     # no stopwords: 'und'
    ]
    return spark.createDataFrame(rows)


class TestPrepareCorpus:
    def test_every_stage_filters_its_victim(self, corpus):
        cfg = CorpusPrepConfig(min_tokens=10, near_dup_threshold=0.6)
        out = prepare_corpus(corpus, "body", "doc_id", cfg)
        rows = {r["doc_id"]: r["lang"] for r in out.collect()}
        # 1 (exact dup), 2 (near dup), 4 (too short), 5 (digits),
        # 6 (lang 'und') are all gone; representatives 0 and 3 survive
        assert rows == {0: "en", 3: "fr"}

    def test_deterministic(self, corpus):
        cfg = CorpusPrepConfig(min_tokens=10, near_dup_threshold=0.6)
        a = sorted(r["doc_id"] for r in prepare_corpus(corpus, "body", "doc_id", cfg).collect())
        b = sorted(r["doc_id"] for r in prepare_corpus(corpus, "body", "doc_id", cfg).collect())
        assert a == b

    def test_per_language_sampling(self, corpus):
        cfg = CorpusPrepConfig(
            min_tokens=10, near_dup_threshold=0.6,
            sample_fractions={"en": 1.0},  # drop all fr
        )
        out = prepare_corpus(corpus, "body", "doc_id", cfg)
        assert [r["doc_id"] for r in out.collect()] == [0]

    def test_original_columns_preserved(self, corpus):
        out = prepare_corpus(corpus, "body", "doc_id")
        assert set(out.columns) == {"doc_id", "body", "lang"}

    def test_scrub_and_chunk_stages(self, spark):
        """Stage 6 redacts PII before stage 7 chunks; chunk rows carry the
        doc id and contiguous chunk indexes, and no raw PII survives."""
        body = (
            "contact me at someone@example.com today "
            + " ".join(f"w{chr(97 + i)}" for i in range(20))
        )
        df = spark.createDataFrame([Row(doc_id=0, body=body)])
        cfg = CorpusPrepConfig(
            min_tokens=5, langs=["en", "und"], near_dup_threshold=0.6,
            scrub_pii=True, chunk_max_tokens=8, chunk_overlap=2,
        )
        out = prepare_corpus(df, "body", "doc_id", cfg)
        rows = sorted((r["id"], r["chunk_idx"], r["chunk_text"]) for r in out.collect())
        assert rows and all(i == 0 for i, _, _ in rows)
        assert [ci for _, ci, _ in rows] == list(range(len(rows)))
        joined = " ".join(t for _, _, t in rows)
        assert "someone@example.com" not in joined
        assert "<EMAIL>" in joined

    def test_single_scan_of_source(self, spark, tmp_path):
        """The gated corpus is persisted after stages 1-2, so the input
        parquet is scanned exactly once per action no matter how many dedup
        branches reference it — the single-pass claim the module docstring
        makes, pinned in the executed plan."""
        src = str(tmp_path / "corpus_src.parquet")
        rows = [
            (i, "the quick brown fox jumps over the lazy dog near the river " + str(i))
            for i in range(20)
        ]
        spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(src)
        df = spark.read.parquet(src)
        out = prepare_corpus(df, "text", "doc_id")
        out.count()  # populate the cache and execute the full plan
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the source path appears at most once (inside the cached relation);
        # every other branch reads the InMemoryTableScan
        assert plan.count("corpus_src.parquet") <= 1
        assert "InMemoryTableScan" in plan


class TestExportTrainingShards:
    def test_round_trip_and_shard_shape(self, spark, tmp_path):
        from rtstore_spark.operators.pipeline import export_training_shards

        rows = [(i, "tok " * 100) for i in range(400)]
        df = spark.createDataFrame(rows, "id long, text string")
        dest = str(tmp_path / "shards")
        manifest = export_training_shards(
            df, dest, "id", text_col="text", shard_tokens=10_000
        )
        # 400 docs x 100 tokens = 40k tokens -> 4 shards
        assert manifest == {
            "n_shards": 4,
            "total_tokens": 40_000,
            "mean_tokens_per_shard": 10_000,
        }
        back = spark.read.parquet(dest)
        assert back.count() == 400
        assert sorted(r["id"] for r in back.collect()) == list(range(400))
        shards = {r["shard"] for r in back.select("shard").distinct().collect()}
        assert shards == {0, 1, 2, 3}
        # one file per shard: the repartition owns each shard with one task
        import glob
        import os

        for s in shards:
            files = [
                f
                for f in glob.glob(os.path.join(dest, f"shard={s}", "*.parquet"))
            ]
            assert len(files) == 1, (s, files)
        # hash placement concentrates sizes around the target
        sizes = {
            r["shard"]: r["n"]
            for r in back.groupBy("shard").agg(F.count("*").alias("n")).collect()
        }
        assert all(50 <= n <= 150 for n in sizes.values()), sizes

    def test_deterministic_and_order_independent(self, spark, tmp_path):
        from rtstore_spark.operators.pipeline import export_training_shards

        rows = [(i, 7) for i in range(300)]
        df = spark.createDataFrame(rows, "id long, n_tokens long")
        a_dest, b_dest = str(tmp_path / "a"), str(tmp_path / "b")
        export_training_shards(df, a_dest, "id", token_col="n_tokens", n_shards=5)
        # reversed arrival order, different partitioning: same assignment
        export_training_shards(
            df.orderBy(F.desc("id")).repartition(11),
            b_dest, "id", token_col="n_tokens", n_shards=5,
        )
        a = {(r["id"], r["shard"]) for r in spark.read.parquet(a_dest).collect()}
        b = {(r["id"], r["shard"]) for r in spark.read.parquet(b_dest).collect()}
        assert a == b
        # WITHIN-shard row order must also be a pure function of the corpus
        # (the docstring's byte-identical claim): per shard file, the row
        # sequence matches across the two differently-partitioned runs —
        # and is hash-shuffled, not id-sorted
        import glob

        import pyarrow.parquet as pq

        def shard_orders(dest):
            out = {}
            for f in sorted(glob.glob(f"{dest}/shard=*/*.parquet")):
                shard = f.split("shard=")[1].split("/")[0]
                out[shard] = [r["id"] for r in pq.read_table(f).to_pylist()]
            return out

        oa, ob = shard_orders(a_dest), shard_orders(b_dest)
        assert oa == ob
        assert any(ids != sorted(ids) for ids in oa.values())

    def test_arg_validation(self, spark, tmp_path):
        from rtstore_spark.operators.pipeline import export_training_shards

        df = spark.createDataFrame([(1, "x", 1)], "id long, text string, n long")
        with pytest.raises(ValueError):
            export_training_shards(df, str(tmp_path / "x"), "id")
        with pytest.raises(ValueError):
            export_training_shards(
                df, str(tmp_path / "x"), "id", token_col="n", text_col="text"
            )


def test_end_to_end_prep_to_shards_on_real_docs(spark, tmp_path):
    """Acceptance: real sf0.001 documents → full prep pipeline (quality,
    lang, exact+near dedup, PII scrub) → deterministic shard export →
    round-trip read. The whole corpus path a training run executes."""
    from rtstore_spark.operators.pipeline import (
        CorpusPrepConfig,
        export_training_shards,
        prepare_corpus,
    )
    from rtstore_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    kept = prepare_corpus(
        docs, "text", "doc_id",
        CorpusPrepConfig(min_tokens=5, scrub_pii=True),
    )
    n_kept = kept.count()
    assert 0 < n_kept < docs.count()  # gates dropped something, not all

    dest = str(tmp_path / "shards")
    manifest = export_training_shards(
        kept, dest, "doc_id", text_col="text", shard_tokens=5_000
    )
    back = spark.read.parquet(dest)
    assert back.count() == n_kept  # lossless export
    assert manifest["n_shards"] >= 2
    shard_ct = back.select("shard").distinct().count()
    assert shard_ct == manifest["n_shards"]
    # kept rows still carry the pipeline's lang annotation
    assert "lang" in back.columns


def test_blocklist_stage_drops_hit_docs(spark):
    from rtstore_spark.operators.pipeline import CorpusPrepConfig, prepare_corpus

    rows = [
        (1, "a perfectly clean readable document about engines and sky today"),
        (2, "another clean readable document with interesting words in it here"),
        (3, "this readable document mentions the banned phrase somewhere in text"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    base = prepare_corpus(df, "text", "id", CorpusPrepConfig(min_tokens=2))
    gated = prepare_corpus(
        df, "text", "id",
        CorpusPrepConfig(min_tokens=2, blocklist=["banned phrase"]),
    )
    assert {r["id"] for r in base.select("id").collect()} == {1, 2, 3}
    assert {r["id"] for r in gated.select("id").collect()} == {1, 2}


def test_html_front_door_stage(spark):
    wrap = (
        "<html><head><title>t</title><script>junk()</script></head><body>"
        "<nav><a href='/'>AAAA</a> <a href='/'>BBBB</a></nav><p>{}</p>"
        "</body></html>"
    )
    rows = [
        Row(doc_id=0, body=wrap.format(GOOD_EN)),
        Row(doc_id=1, body=wrap.format(GOOD_EN)),        # exact dup post-extract
        Row(doc_id=2, body="<nav><a href='/x'>only nav links here</a></nav>"),
        Row(doc_id=3, body=GOOD_FR),                     # tag-free passthrough
    ]
    cfg = CorpusPrepConfig(min_tokens=10, html_input=True)
    out = prepare_corpus(spark.createDataFrame(rows), "body", "doc_id", cfg)
    got = {r["doc_id"]: r["body"] for r in out.collect()}
    # 1 deduped against 0 (markup removed BEFORE hashing), 2 extracted to
    # nothing (pure boilerplate) and dropped, 0 and 3 keep clean text
    assert set(got) == {0, 3}
    assert got[0] == GOOD_EN
    assert "script" not in got[0] and "AAAA" not in got[0]
    assert got[3] == GOOD_FR


def test_domain_cap_stage(spark):
    rows = [
        Row(doc_id=i, body=f"{GOOD_EN} variant {i} {'x' * (i % 7)}", src="hot")
        for i in range(8)
    ] + [Row(doc_id=100, body=GOOD_FR, src="cold")]
    cfg = CorpusPrepConfig(
        min_tokens=10, near_dup_threshold=0.99,
        domain_cap=3, domain_col="src",
    )
    out = prepare_corpus(spark.createDataFrame(rows), "body", "doc_id", cfg)
    by_src = {}
    for r in out.collect():
        by_src.setdefault(r["src"], []).append(r["doc_id"])
    assert len(by_src["hot"]) == 3
    assert by_src["cold"] == [100]
    # deterministic: re-run keeps the same md5-ordered winners
    again = prepare_corpus(spark.createDataFrame(rows), "body", "doc_id", cfg)
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        d for v in by_src.values() for d in v
    )


def test_domain_cap_derived_from_url_with_system_psl(spark):
    """domain_from_url + domain_psl='system': the cap groups by the
    URL's registrable domain under the full OS-vendored PSL — every
    subdomain of one registrant shares one cap slot, and a co.uk
    two-level suffix groups correctly (the heuristic's classic miss)."""
    from rtstore_spark.operators.web import system_psl_path

    if system_psl_path() is None:
        pytest.skip("no vendored publicsuffix list on this host")
    rows = [
        Row(
            doc_id=i,
            body=f"{GOOD_EN} variant {i} {'x' * (i % 7)}",
            url=f"https://sub{i}.example.co.uk/p",
        )
        for i in range(8)
    ] + [Row(doc_id=100, body=GOOD_FR, url="https://other.org/q")]
    cfg = CorpusPrepConfig(
        min_tokens=10, near_dup_threshold=0.99,
        domain_cap=3, domain_col="domain",
        domain_from_url="url", domain_psl="system",
    )
    out = prepare_corpus(spark.createDataFrame(rows), "body", "doc_id", cfg)
    by_dom = {}
    for r in out.collect():
        by_dom.setdefault(r["domain"], []).append(r["doc_id"])
    # all 8 subdomains collapsed into ONE registrable-domain slot
    assert len(by_dom["example.co.uk"]) == 3
    assert by_dom["other.org"] == [100]


class TestPrepAudit:
    def test_stage_counts_ride_the_action(self, spark, corpus):
        from rtstore_spark.operators.pipeline import PrepAudit

        audit = PrepAudit()
        out = prepare_corpus(corpus, "body", "doc_id", audit=audit)
        n = out.count()
        c = audit.counts()
        # fixture arithmetic: 7 in; 4/5/6 fail the gates; 1 exact dup of 0;
        # 2 near dup of 0 -> 2 survivors
        assert c["input"] == 7
        assert c["gated"] == 4
        assert c["exact_dedup"] == 3
        assert c["near_dedup"] == 2
        assert c["final"] == n == 2

    def test_counts_monotone_and_final_matches_chunks(self, spark, corpus):
        from rtstore_spark.operators.pipeline import PrepAudit

        audit = PrepAudit()
        cfg = CorpusPrepConfig(chunk_max_tokens=8, chunk_overlap=2)
        out = prepare_corpus(corpus, "body", "doc_id", cfg, audit=audit)
        n_chunks = out.count()
        c = audit.counts()
        assert c["input"] >= c["gated"] >= c["exact_dedup"] >= c["near_dedup"]
        assert c["final"] == n_chunks > c["near_dedup"]  # chunk fan-out

    def test_audit_off_leaves_no_metrics_nodes(self, spark, corpus):
        out = prepare_corpus(corpus, "body", "doc_id")
        plan = out._jdf.queryExecution().analyzed().toString()
        assert "CollectMetrics" not in plan

    def test_audited_output_identical_to_plain(self, spark, corpus):
        from rtstore_spark.operators.pipeline import PrepAudit

        audited = prepare_corpus(corpus, "body", "doc_id", audit=PrepAudit())
        plain = prepare_corpus(corpus, "body", "doc_id")
        assert sorted(r["doc_id"] for r in audited.collect()) == sorted(
            r["doc_id"] for r in plain.collect()
        )


class TestSeenFilterGate:
    def test_cross_run_duplicates_dropped(self, spark, corpus):
        from rtstore_spark.operators.pipeline import corpus_seen_filter

        # run 1 keeps docs {0, 3}; its filter is the only carried state
        run1 = prepare_corpus(corpus, "body", "doc_id")
        filt = corpus_seen_filter(run1, "body", nbits=1 << 14)
        # run 2: a repeat of run 1's keeper plus a genuinely new doc
        rows = [
            Row(doc_id=100, body=GOOD_EN),            # repeat of kept doc 0
            Row(doc_id=101, body=GOOD_FR + " encore du texte nouveau ici"),
        ]
        run2 = prepare_corpus(
            spark.createDataFrame(rows), "body", "doc_id",
            CorpusPrepConfig(seen_filter=filt),
        )
        assert {r["doc_id"] for r in run2.collect()} == {101}

    def test_no_filter_keeps_repeat(self, spark, corpus):
        rows = [Row(doc_id=100, body=GOOD_EN)]
        out = prepare_corpus(spark.createDataFrame(rows), "body", "doc_id")
        assert {r["doc_id"] for r in out.collect()} == {100}

    def test_merged_filters_compose(self, spark):
        from rtstore_spark.operators.pipeline import corpus_seen_filter
        from rtstore_spark.operators.sketches import bloom_merge

        a = spark.createDataFrame([Row(doc_id=1, body=GOOD_EN)])
        b = spark.createDataFrame([Row(doc_id=2, body=GOOD_FR)])
        merged = bloom_merge(
            corpus_seen_filter(a, "body", nbits=1 << 14).unionByName(
                corpus_seen_filter(b, "body", nbits=1 << 14)
            )
        )
        rows = [
            Row(doc_id=10, body=GOOD_EN),   # in shard a
            Row(doc_id=11, body=GOOD_FR),   # in shard b
            Row(doc_id=12, body=GOOD_EN + " mais avec une fin differente ici"),
        ]
        out = prepare_corpus(
            spark.createDataFrame(rows), "body", "doc_id",
            CorpusPrepConfig(seen_filter=merged),
        )
        assert {r["doc_id"] for r in out.collect()} == {12}


class TestSeenState:
    def test_state_survives_text_rewriting_stages(self, spark, corpus):
        """The ADVICE failure scenario: run 1 scrubs PII (rewriting its
        output text), so fingerprinting the OUTPUT would never match run
        2's stage-2d probes. SeenState captures at the probe point and the
        cross-run gate fires."""
        from rtstore_spark.operators.pipeline import SeenState

        dirty = GOOD_EN + " contact me at alice@example.com for details"
        run1_rows = [Row(doc_id=0, body=dirty), Row(doc_id=3, body=GOOD_FR)]
        state = SeenState(nbits=1 << 14)
        run1 = prepare_corpus(
            spark.createDataFrame(run1_rows), "body", "doc_id",
            CorpusPrepConfig(scrub_pii=True), seen_state=state,
        )
        out1 = run1.collect()
        # sanity: the output text was rewritten (email gone)
        assert all("alice@example.com" not in r["body"] for r in out1)
        filt = state.filter_df()
        # run 2 sees the ORIGINAL (unscrubbed) text again + a new doc
        run2 = prepare_corpus(
            spark.createDataFrame(
                [Row(doc_id=100, body=dirty),
                 Row(doc_id=101, body=GOOD_FR + " encore du texte nouveau ici")]
            ),
            "body", "doc_id", CorpusPrepConfig(seen_filter=filt),
        )
        assert {r["doc_id"] for r in run2.collect()} == {101}

    def test_unpopulated_state_raises(self):
        import pytest as _pytest

        from rtstore_spark.operators.pipeline import SeenState

        with _pytest.raises(ValueError, match="not populated"):
            SeenState().filter_df()

    def test_state_includes_deduped_docs(self, spark, corpus):
        """Docs run 1 dropped as duplicates are still SEEN content: run 2
        must not re-admit them."""
        from rtstore_spark.operators.pipeline import SeenState

        state = SeenState(nbits=1 << 14)
        prepare_corpus(corpus, "body", "doc_id", seen_state=state).collect()
        near_dup_text = GOOD_EN + " tonight again"  # doc 2, dropped by near-dup
        run2 = prepare_corpus(
            spark.createDataFrame([Row(doc_id=200, body=near_dup_text)]),
            "body", "doc_id",
            CorpusPrepConfig(seen_filter=state.filter_df()),
        )
        assert run2.count() == 0


class TestExportAuditRide:
    def test_shard_export_emits_yield_report(self, spark, corpus, tmp_path):
        """VERDICT item: one export action also produces the per-stage
        yield report — no separate counting pass over the corpus."""
        from rtstore_spark.operators.pipeline import (
            PrepAudit,
            export_training_shards,
            prepare_corpus,
        )

        audit = PrepAudit()
        out = prepare_corpus(corpus, "body", "doc_id", audit=audit)
        res = export_training_shards(
            out, str(tmp_path / "shards"), "doc_id", text_col="body",
            shard_tokens=50, audit=audit,
        )
        rep = res["audit"]
        assert rep["input"] == 7
        assert rep["final"] == rep["near_dedup"] == 2
        assert rep["gated"] >= rep["exact_dedup"] >= rep["near_dedup"]
        # and the shards really landed
        n = spark.read.parquet(str(tmp_path / "shards")).count()
        assert n == rep["final"]

    def test_concurrent_audits_do_not_collide(self, spark, corpus):
        """Observation names are per-instance: two audited runs live on one
        session must not cross-capture metrics."""
        from rtstore_spark.operators.pipeline import PrepAudit, prepare_corpus

        a1, a2 = PrepAudit(), PrepAudit()
        out1 = prepare_corpus(corpus, "body", "doc_id", audit=a1)
        out2 = prepare_corpus(
            corpus.limit(4), "body", "doc_id", audit=a2
        )
        out1.collect()
        out2.collect()
        assert a1.counts()["input"] == 7
        assert a2.counts()["input"] == 4


class TestSeenFilterCrashSafety:
    """Round-5: the cross-run seen state advances via the manifest-pointer
    protocol — a crash between the merged-filter write and the pointer
    flip leaves the previous state live; the retry converges."""

    def _filter_of(self, spark, texts):
        from rtstore_spark.operators.pipeline import corpus_seen_filter

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "id long, text string"
        )
        return corpus_seen_filter(df, "text", nbits=1 << 12, k=3)

    def _contains(self, spark, filt, text):
        from rtstore_spark.operators.sketches import bloom_contains

        probe = spark.createDataFrame([(text,)], "t string").select(
            F.md5("t").alias("fp")
        )
        return bool(bloom_contains(filt, probe, "fp").collect()[0]["might_contain"])

    def test_crash_keeps_previous_generation_live(
        self, spark, tmp_path, monkeypatch
    ):
        import os

        from rtstore_spark.operators.pipeline import (
            load_seen_filter,
            save_seen_filter,
        )
        from rtstore_spark.store.fs import LocalFS

        path = str(tmp_path / "seen")
        assert load_seen_filter(spark, path) is None  # pre-first-commit
        assert save_seen_filter(self._filter_of(spark, ["alpha"]), path) == 1

        def boom(self, p, text):
            raise RuntimeError("simulated crash before pointer flip")

        monkeypatch.setattr(LocalFS, "write_text_atomic", boom)
        with pytest.raises(RuntimeError, match="simulated crash"):
            save_seen_filter(self._filter_of(spark, ["beta"]), path)
        monkeypatch.undo()
        # orphan gen-2-<nonce> on disk; the pointer still names gen-1
        import glob as _glob

        assert _glob.glob(f"{path}/gen-2-*")
        live = load_seen_filter(spark, path)
        assert self._contains(spark, live, "alpha")
        assert not self._contains(spark, live, "beta")
        # retry overwrites the orphan, flips, and the state is the union
        assert save_seen_filter(self._filter_of(spark, ["beta"]), path) == 2
        live = load_seen_filter(spark, path)
        assert self._contains(spark, live, "alpha")  # carried forward
        assert self._contains(spark, live, "beta")

    def test_saved_state_gates_next_prepare_run(self, spark, tmp_path):
        """End-to-end: run-1's SeenState, persisted through the pointer
        protocol, suppresses run-2's repeats."""
        from rtstore_spark.operators.pipeline import (
            CorpusPrepConfig,
            SeenState,
            load_seen_filter,
            prepare_corpus,
            save_seen_filter,
        )

        texts1 = [
            "the quick brown fox jumps over the lazy dog repeatedly today",
            "pack my box with five dozen liquor jugs every single morning",
        ]
        run1 = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts1)], "doc_id long, body string"
        )
        cfg = CorpusPrepConfig(min_tokens=5)
        state = SeenState(nbits=1 << 12, k=3)
        prepare_corpus(run1, "body", "doc_id", cfg, seen_state=state).collect()
        path = str(tmp_path / "seen")
        save_seen_filter(state.filter_df(), path)

        run2 = spark.createDataFrame(
            [(10, texts1[0]),
             (11, "a genuinely new document with plenty of distinct words here")],
            "doc_id long, body string",
        )
        cfg2 = CorpusPrepConfig(
            min_tokens=5, seen_filter=load_seen_filter(spark, path)
        )
        kept = prepare_corpus(run2, "body", "doc_id", cfg2).collect()
        assert [r["doc_id"] for r in kept] == [11]


class TestSubstringDedupStage:
    def test_stage_3c_cuts_repeats_keeps_canonical(self, spark):
        from rtstore_spark.operators.pipeline import (
            CorpusPrepConfig,
            prepare_corpus,
        )

        passage = " ".join(f"license{i}" for i in range(24))  # > span, no
        # internal repetition (a self-repeating passage would be trimmed
        # within the canonical doc too — correct, but not this test)
        rows = [
            (1, "unique opening words about engines and planners " + passage),
            (2, passage + " and then the closing prose is of the usual kind that we see"),
            (3, "a fully independent document with its own words and nothing shared"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, body string")
        cfg = CorpusPrepConfig(
            min_tokens=3, near_dup_threshold=0.99, substring_dedup_tokens=8
        )
        out = {r["doc_id"]: r["body"] for r in
               prepare_corpus(df, "body", "doc_id", cfg).collect()}
        assert set(out) == {1, 2, 3}
        assert passage in out[1]          # canonical (lowest id) keeps it
        assert "license" not in out[2]    # repeat cut from doc 2
        assert out[2].startswith("and then the closing")
        assert out[3] == rows[2][1]


class TestDecontaminateStage:
    def test_stage_3d_cuts_eval_collisions_everywhere(self, spark):
        from rtstore_spark.operators.pipeline import (
            CorpusPrepConfig,
            prepare_corpus,
        )

        evalq = " ".join(f"evalq{i}" for i in range(16))
        rows = [
            (1, "the opening words that we often see here " + evalq),
            (2, evalq + " and the closing words that we also see in text"),
            (3, "a fully independent document with its own words and nothing shared"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, body string")
        bench = spark.createDataFrame([(evalq,)], "q string")
        cfg = CorpusPrepConfig(
            min_tokens=3, near_dup_threshold=0.99,
            decontaminate_against=bench, decontaminate_tokens=8,
            decontaminate_text_col="q",
        )
        out = {r["doc_id"]: r["body"] for r in
               prepare_corpus(df, "body", "doc_id", cfg).collect()}
        assert set(out) == {1, 2, 3}
        # NO canonical survivor — the eval item is gone from BOTH docs
        assert "evalq0" not in out[1] and "evalq0" not in out[2]
        assert out[1] == "the opening words that we often see here"
        assert out[3] == rows[2][1]


class TestSeenFilterConfigGuard:
    def test_mismatched_config_refused(self, spark, tmp_path):
        from rtstore_spark.operators.pipeline import (
            corpus_seen_filter,
            save_seen_filter,
        )

        docs = spark.createDataFrame([(1, "alpha")], "id long, text string")
        path = str(tmp_path / "seen")
        save_seen_filter(corpus_seen_filter(docs, "text", nbits=1 << 12), path)
        with pytest.raises(ValueError, match="one config"):
            save_seen_filter(
                corpus_seen_filter(docs, "text", nbits=1 << 13), path
            )


class TestSpanStageShieldsUserColumns:
    def test_user_n_tokens_column_survives_stage_3c(self, spark):
        from rtstore_spark.operators.pipeline import (
            CorpusPrepConfig,
            prepare_corpus,
        )

        passage = " ".join(f"lic{i}" for i in range(24))
        rows = [
            (1, "the opening words that we often see here " + passage, 777),
            (2, passage + " and then the closing prose that we usually see", 888),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, body string, n_tokens int"
        )
        cfg = CorpusPrepConfig(
            min_tokens=3, near_dup_threshold=0.99, substring_dedup_tokens=8
        )
        out = {r["doc_id"]: r for r in
               prepare_corpus(df, "body", "doc_id", cfg).collect()}
        # the user's annotation column is preserved verbatim, not dropped
        # with the operator's same-named stat
        assert out[1]["n_tokens"] == 777 and out[2]["n_tokens"] == 888
        assert "lic0" in out[1]["body"] and "lic0" not in out[2]["body"]

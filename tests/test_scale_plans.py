"""Plan-shape assertions for the scale path.

These tests pin the *physical plan*, not results: the broadcast of a table
that grows with the fact (orders, customer, supplier) must be conditional on
the session's autoBroadcastJoinThreshold, while true dimensions
(nation, region) stay broadcast. A hard-coded broadcast of orders would OOM
or silently fall back past the threshold on a real cluster.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rtstore_spark.tables import _parse_size, maybe_broadcast, table_size_bytes


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def q5(sf_dir):
    import __spark_entry__ as entry

    return entry.queries()["q5_local_supplier_volume"]


@pytest.fixture()
def q3(sf_dir):
    import __spark_entry__ as entry

    return entry.queries()["q3_shipping_priority"]


class TestParseSize:
    def test_forms(self):
        assert _parse_size("67108864") == 64 << 20
        assert _parse_size("67108864b") == 64 << 20
        assert _parse_size("64MB") == 64 << 20
        assert _parse_size("10m") == 10 << 20
        assert _parse_size("1k") == 1024
        assert _parse_size("2g") == 2 << 30
        assert _parse_size("-1") == -1


class TestSizeConditionalBroadcast:
    def test_table_size_matches_disk(self, sf_dir):
        import os

        assert table_size_bytes(sf_dir, "orders") == os.path.getsize(
            f"{sf_dir}/orders.parquet"
        )

    def test_hint_gated_by_threshold(self, spark, sf_dir):
        from rtstore_spark.tables import load_table

        orders = load_table(spark, sf_dir, "orders")
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
            hinted = maybe_broadcast(spark, sf_dir, "orders", orders)
            assert "hint" in hinted._jdf.queryExecution().logical().toString().lower()
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
            unhinted = maybe_broadcast(spark, sf_dir, "orders", orders)
            assert (
                "hint"
                not in unhinted._jdf.queryExecution().logical().toString().lower()
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_q5_orders_join_falls_back_past_threshold(self, spark, sf_dir, q5):
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            # orders fits: the whole star is broadcast joins, zero shuffle
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
            p = _plan(q5(spark, sf_dir))
            assert p.count("BroadcastHashJoin") == 5
            assert "SortMergeJoin" not in p

            # orders over the threshold: its lineitem edge becomes a shuffle
            # join, but nation/region (true dims) stay broadcast
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
            p = _plan(q5(spark, sf_dir))
            orders_join = next(
                line
                for line in p.splitlines()
                if "Join" in line and "l_orderkey" in line and "o_orderkey" in line
            )
            assert "BroadcastHashJoin" not in orders_join
            assert p.count("BroadcastHashJoin") == 2  # nation + region only
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_q3_orders_join_falls_back_past_threshold(self, spark, sf_dir, q3):
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
            p = _plan(q3(spark, sf_dir))
            orders_join = next(
                line
                for line in p.splitlines()
                if "Join" in line and "l_orderkey" in line and "o_orderkey" in line
            )
            assert "BroadcastHashJoin" not in orders_join
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


class TestSkewJoin:
    @pytest.fixture()
    def skewed(self, spark):
        # key 7 owns ~60% of the fact
        hot = spark.range(600).select(F.lit(7).alias("k"), F.col("id").alias("v"))
        tail = spark.range(400).select(
            (F.col("id") % 50).alias("k"), F.col("id").alias("v")
        )
        return hot.unionByName(tail)

    @pytest.fixture()
    def dim(self, spark):
        return spark.range(50).select(
            F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
        )

    def test_result_equivalence_inner_and_left(self, spark, skewed, dim):
        from rtstore_spark.operators.skew import skew_join

        for how in ("inner", "left"):
            plain = skewed.join(dim, "k", how).orderBy("k", "v")
            routed = skew_join(skewed, dim, "k", hot=[7], how=how).orderBy("k", "v")
            assert routed.collect() == plain.collect()

    def test_hot_detection_and_plan_shape(self, spark, skewed, dim):
        from rtstore_spark.operators.skew import hot_keys, skew_join

        # default path: detection on a seeded sample — the hot key owns 60%
        # of the fact, so it survives any sample
        assert hot_keys(skewed, "k", min_share=0.3, sample_fraction=0.1) == [7]
        # exact full-scan counts on request
        assert hot_keys(skewed, "k", min_share=0.3, sample_fraction=None) == [7]
        out = skew_join(skewed, dim, "k", min_share=0.3)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the hot route is a broadcast join; the tail keeps the default plan
        assert "BroadcastHashJoin" in plan
        assert out.count() == skewed.join(dim, "k").count()


class TestJaccardVerifyNoForcedBroadcast:
    """The candidate-id set in jaccard_verify grows with the corpus, so the
    semi-join that filters shingles to candidate docs must NOT carry a
    forced broadcast hint — past the threshold it has to become a shuffled
    left-semi on the 8-byte id key, not an OOM."""

    def test_candidate_semi_join_is_unhinted_and_threshold_respecting(self, spark):
        from pyspark.sql import Row

        from rtstore_spark.operators.dedup import jaccard_verify

        corpus = spark.createDataFrame(
            [Row(id=i, text=f"alpha beta gamma delta epsilon {i}") for i in range(6)]
        )
        cand = spark.createDataFrame([(0, 1), (2, 3)], ["id_a", "id_b"])
        ver = jaccard_verify(corpus, cand, "text", "id", threshold=0.1)
        # no hint anywhere in the logical plan: AQE owns the strategy choice
        logical = ver._jdf.queryExecution().logical().toString().lower()
        assert "hint" not in logical
        # with broadcast disabled (the stand-in for "candidate set exceeds
        # the threshold"), the semi-join must plan as a non-broadcast join
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            p = ver._jdf.queryExecution().executedPlan().toString()
            semi_lines = [ln for ln in p.splitlines() if "LeftSemi" in ln]
            assert semi_lines, "expected a left-semi join in the plan"
            assert all("Broadcast" not in ln for ln in semi_lines)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


class TestPagedScanPlanShape:
    """The newest-first paged scans (reverse_page_scan, ScanMutationHeader)
    compile to TakeOrderedAndProject — per-partition top-(offset+limit)
    heaps + one merge, never a global sort — because the API caps pages at
    50. This pins the plan so a future refactor can't silently regress to
    a full Sort + Exchange."""

    def test_scan_mutation_headers_take_ordered(self, spark, tmp_path):
        from rtstore_spark.store.docstore import DocStore

        store = DocStore(spark, str(tmp_path / "pscan"))
        db = store.create_database("0x" + "aa" * 20, nonce=1)
        store.create_collection(db, "c", [], "0x" + "aa" * 20)
        store.add_docs(db, "c", ['{"v": 1}', '{"v": 2}'], "0x" + "aa" * 20)
        page = store.scan_mutation_headers(offset=1, limit=50)
        plan = page._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan
        assert "Sort " not in plan  # no global sort node
        assert page.count() >= 1


class TestDataPrepPlanShapes:
    """Plan-shape pins for the round-4 operators: the properties that make
    them survive a 100x scale-up, asserted on the physical plan."""

    def test_crossdoc_repetition_shuffles_hashes_not_text(self, spark):
        from rtstore_spark.operators.text import crossdoc_repetition

        df = spark.createDataFrame(
            [(i, "alpha beta gamma delta epsilon zeta") for i in range(50)],
            "id long, text string",
        )
        plan = _plan(crossdoc_repetition(df, "text", "id"))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # no forced broadcast anywhere: the docfreq side is corpus-sized
        assert plan.count("Exchange hashpartitioning") <= 6

    def test_repeated_spans_window_is_per_doc_never_global(self, spark):
        from rtstore_spark.operators.dedup import repeated_spans

        df = spark.createDataFrame(
            [(i, " ".join(f"t{j}" for j in range(40))) for i in range(20)],
            "id long, text string",
        )
        plan = _plan(repeated_spans(df, "text", "id", span_tokens=8))
        # the gaps-and-islands window partitions by doc id — a global
        # (empty-partition) window would funnel the corpus into one task
        assert "hashpartitioning(id" in plan
        assert "SinglePartition" not in plan

    def test_topk_rollup_aggregates_before_window(self, spark):
        from pyspark.sql import Row

        from rtstore_spark.operators.sketches import topk_rollup

        df = spark.createDataFrame(
            [Row(day=i % 3, item=f"u{i % 7}") for i in range(100)]
        )
        plan = _plan(topk_rollup(df, "item", by=["day"], k=2, slack=2))
        # partial aggregation must collapse rows map-side BEFORE any
        # exchange: the string 'partial_count' appears below the shuffle
        assert "partial_count" in plan
        assert "CartesianProduct" not in plan

    def test_pipeline_gated_corpus_is_persisted(self, spark):
        """The prepare_corpus plan must read the gated corpus from the
        persisted snapshot (InMemoryTableScan), pinning the single-pass
        guarantee across its dedup branches."""
        from rtstore_spark.operators.pipeline import CorpusPrepConfig, prepare_corpus

        df = spark.createDataFrame(
            [
                (i, "the good and readable text of document number " + str(i))
                for i in range(30)
            ],
            "id long, text string",
        )
        out = prepare_corpus(df, "text", "id", CorpusPrepConfig(min_tokens=2))
        plan = _plan(out)
        assert "InMemoryTableScan" in plan


class TestLateRound4PlanShapes:
    """Plan pins for the LM / packing / gopher / semantic-dedup operators."""

    def test_gopher_rules_is_shuffle_free(self, spark):
        from rtstore_spark.operators.text import gopher_rules

        df = spark.createDataFrame(
            [(i, "the text of document number " + str(i)) for i in range(20)],
            "id long, text string",
        )
        plan = _plan(gopher_rules(df, "text", "id"))
        assert "Exchange" not in plan  # one projection, no shuffle

    def test_pack_sequences_single_bucket_exchange(self, spark):
        from rtstore_spark.operators.pipeline import pack_sequences

        df = spark.createDataFrame(
            [(i, "alpha beta gamma") for i in range(20)],
            "id long, text string",
        )
        plan = _plan(pack_sequences(df, "text", "id", seq_tokens=8, n_buckets=4))
        # exactly one exchange: the deterministic bucket repartition; the
        # packer itself is a map-local ArrowEvalPython/MapInPandas stage
        assert plan.count("Exchange") == 1
        assert "hashpartitioning(bucket" in plan

    def test_lm_fit_prunes_via_take_ordered(self, spark):
        from rtstore_spark.operators.lm import lm_fit

        df = spark.createDataFrame(
            [(i, "the cat sat on the mat") for i in range(10)],
            "id long, text string",
        )
        model = lm_fit(df, "text", max_unigrams=5, max_bigrams=5)
        plan = _plan(model["bigrams"])
        # top-N pruning must be per-partition heaps + merge, not a global
        # sort of the bigram vocabulary
        assert "TakeOrderedAndProject" in plan

    def test_semdedup_joins_only_on_route(self, spark):
        from rtstore_spark.operators.dedup import semdedup

        rows = [(i, [float(i % 3 == 0), float(i % 3 == 1), float(i % 3 == 2), 0.0])
                for i in range(12)]
        df = spark.createDataFrame(rows, "id long, emb array<double>")
        out = semdedup(df, "emb", "id", k=3, threshold=0.99, seed=1)
        plan = _plan(out)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestSessionAdditionsPlanShapes:
    """Plan pins for the BPE tokenizer and count-min sketch."""

    def test_bpe_word_count_is_one_partial_agg_shuffle(self, spark):
        from rtstore_spark.operators.tokenizer import word_counts

        df = spark.createDataFrame(
            [(i, "alpha beta gamma delta") for i in range(50)],
            "id long, text string",
        )
        plan = _plan(word_counts(df, "text", 1000, 2))
        # map-side combine before the exchange: wire rows bounded by
        # vocabulary, not corpus
        assert "partial_count" in plan
        assert plan.count("Exchange hashpartitioning") == 1

    def test_bpe_encode_is_shuffle_free(self, spark):
        from rtstore_spark.operators.tokenizer import bpe_encode

        df = spark.createDataFrame(
            [(i, "alpha beta") for i in range(20)], "id long, text string"
        )
        model = {"merges": [("a", "l"), ("al", "p")], "vocab": []}
        plan = _plan(bpe_encode(df, "text", "id", model))
        assert "Exchange" not in plan  # scan -> Arrow project only

    def test_cms_rollup_combines_map_side(self, spark):
        from pyspark.sql import Row

        from rtstore_spark.operators.sketches import cms_rollup

        df = spark.createDataFrame(
            [Row(day=i % 3, item=f"u{i % 7}") for i in range(100)]
        )
        plan = _plan(cms_rollup(df, "item", by=["day"], depth=4, width=64))
        # the depth-way fan-out must collapse BEFORE the exchange
        assert "partial_count" in plan
        assert plan.count("Exchange hashpartitioning") == 1

    def test_knn_join_windows_per_vector_never_global(self, spark):
        from rtstore_spark.operators.similarity import knn_join

        df = spark.createDataFrame(
            [(i, [float(i % 5), 1.0, 0.0]) for i in range(30)], ["id", "emb"]
        )
        plan = _plan(knn_join(df, "emb", "id", k=3, num_planes=8, bands=4))
        # the top-k window partitions by source id — a global window would
        # funnel the whole candidate set into one task
        assert "hashpartitioning(id" in plan
        assert "SinglePartition" not in plan
        assert "CartesianProduct" not in plan


class TestWebPlanShapes:
    """Plan pins for the web-corpus operators."""

    def test_html_extraction_is_shuffle_free(self, spark):
        from rtstore_spark.operators.web import extract_html_text

        df = spark.createDataFrame(
            [(i, f"<p>doc {i} body text</p>") for i in range(20)],
            "pid long, html string",
        )
        plan = _plan(extract_html_text(df, "html", "pid"))
        assert "Exchange" not in plan  # scan -> project only

    def test_domain_cap_windows_are_salted_then_keyed(self, spark):
        from rtstore_spark.operators.web import domain_frequency_cap

        df = spark.createDataFrame(
            [(i, f"s{i % 3}") for i in range(60)], "id long, dom string"
        )
        plan = _plan(domain_frequency_cap(df, "dom", "id", 2))
        # two window exchanges: (domain, salt) local top-N, then domain
        # global over <= salt*cap survivors; NEVER a single partition
        assert plan.count("Exchange hashpartitioning") == 2
        assert "SinglePartition" not in plan
        # salted pass really partitions by (domain, pmod(hash))
        assert "pmod" in plan


class TestSubstringDedupPlanShapes:
    def test_windows_per_doc_text_never_shuffles_wide(self, spark):
        from rtstore_spark.operators.dedup import substring_dedup

        df = spark.createDataFrame(
            [(i, " ".join(f"t{j}" for j in range(40))) for i in range(20)],
            "id long, text string",
        )
        plan = _plan(substring_dedup(df, "text", "id", span_tokens=8))
        # interval-merge window partitions by doc id, never SinglePartition
        assert "hashpartitioning(id" in plan
        assert "SinglePartition" not in plan
        assert "CartesianProduct" not in plan
        # exchanges: hv winner agg + hv back-join (reused), per-doc window,
        # cut-set agg, id back-join — the corpus text column rides only the
        # final id join (AQE-broadcastable), never the hv exchanges
        assert plan.count("Exchange hashpartitioning") <= 6

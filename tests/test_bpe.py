"""BPE tokenizer: fit determinism, encode round-trip, persistence.

A DuckDB oracle cannot express an iterative merge learner, so the
operator is pytest-verified (the weaker-check class the driver
documents for non-SQL-expressible ops): a hand-checkable tiny corpus
pins the exact merge order, properties pin the encode invariants, and a
partitioning-invariance test pins the determinism claim the module
docstring makes.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rtstore_spark.operators.tokenizer import (
    END,
    _merge_loop,
    _word_encoder,
    bpe_encode,
    bpe_fit,
    bpe_load,
    bpe_save,
)


def _encode_word(word, ranks):
    return _word_encoder(ranks)(word)


def _corpus(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id LONG, text STRING"
    )


class TestMergeLoop:
    def test_known_merge_order(self):
        # "low" x5, "lower" x2: first merge must be the heaviest pair.
        # Pairs in "low"+"lower": (l,o)=7, (o,w)=7, (w,</w>)=5, (w,e)=2,
        # (e,r)=2, (r,</w>)=2. Tie (l,o) vs (o,w) breaks lexicographic.
        merges = _merge_loop([("low", 5), ("lower", 2)], 3)
        assert merges[0] == ("l", "o")
        assert merges[1] == ("lo", "w")
        assert merges[2] == ("low", END)  # "low" x5 beats (e,r)=2

    def test_exhaustion_stops_early(self):
        # one word type, freq 1 below nothing — merges until the whole
        # word is one symbol, then stops instead of looping
        merges = _merge_loop([("ab", 3)], 10)
        assert len(merges) == 2  # (a,b) then (ab,</w>)

    def test_empty_input(self):
        assert _merge_loop([], 5) == []


class TestEncodeWord:
    def test_unmerged_falls_back_to_chars(self):
        assert _encode_word("hi", {}) == ["h", "i", END]

    def test_full_merge_yields_single_token(self):
        merges = _merge_loop([("low", 5)], 10)
        ranks = {p: i for i, p in enumerate(merges)}
        assert _encode_word("low", ranks) == ["low" + END]

    def test_rank_priority_respected(self):
        # lower rank (earlier merge) must apply first even if a later
        # merge is available earlier in the word
        ranks = {("b", "c"): 0, ("a", "b"): 1}
        assert _encode_word("abc", ranks) == ["a", "bc", END]


class TestFitEncodeSpark:
    @pytest.fixture(scope="class")
    def model(self, spark):
        df = _corpus(
            spark,
            ["low low low low low", "lower lower", "newest newest newest"],
        )
        return bpe_fit(df, "text", n_merges=8, min_count=1)

    def test_fit_learns_corpus_words(self, model):
        assert ("l", "o") in model["merges"]
        assert END in model["vocab"]
        # every merged symbol's text is in the vocab
        for a, b in model["merges"]:
            assert a + b in model["vocab"]

    def test_encode_concatenation_restores_words(self, spark, model):
        df = _corpus(spark, ["low newest unseen"])
        row = bpe_encode(df, "text", "doc_id", model).collect()[0]
        text = "".join(row["tokens"]).replace(END, " ").strip()
        assert text == "low newest unseen"
        assert row["n_tokens"] == len(row["tokens"])

    def test_known_word_collapses_unseen_does_not(self, spark, model):
        df = _corpus(spark, ["low", "zzz"])
        out = {
            r["doc_id"]: r["tokens"]
            for r in bpe_encode(df, "text", "doc_id", model).collect()
        }
        assert out[0] == ["low" + END]  # frequent training word: 1 token
        assert len(out[1]) == 4  # z z z </w> — no applicable merges

    def test_null_and_empty_text(self, spark, model):
        df = spark.createDataFrame(
            [(1, None), (2, "   ")], "doc_id LONG, text STRING"
        )
        out = {
            r["doc_id"]: (r["tokens"], r["n_tokens"])
            for r in bpe_encode(df, "text", "doc_id", model).collect()
        }
        assert out[1] == ([], 0)
        assert out[2] == ([], 0)

    def test_fit_partitioning_invariant(self, spark):
        rows = ["the cat sat", "the cat", "a hat the cat wore"] * 4
        m1 = bpe_fit(_corpus(spark, rows).repartition(1), "text", 6, min_count=1)
        m8 = bpe_fit(_corpus(spark, rows).repartition(8), "text", 6, min_count=1)
        assert m1["merges"] == m8["merges"]
        assert m1["vocab"] == m8["vocab"]

    def test_save_load_round_trip(self, spark, model, tmp_path):
        bpe_save(spark, model, str(tmp_path / "bpe"))
        back = bpe_load(spark, str(tmp_path / "bpe"))
        assert back["merges"] == model["merges"]
        assert back["vocab"] == model["vocab"]

    def test_real_table_token_budget(self, spark, sf_dir):
        # smoke on the synthetic documents table: BPE tokens per doc must
        # be ≤ character count + words (the </w> markers) and ≥ word count
        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.trim("text") != "")  # an empty doc has 1 "word" (the
            .limit(50)                     # empty split token) but 0 tokens
        )
        model = bpe_fit(docs, "text", n_merges=50, min_count=2)
        enc = bpe_encode(docs, "text", "doc_id", model)
        joined = enc.join(docs, "doc_id").select(
            "n_tokens",
            F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n_words"),
            F.length("text").alias("n_chars"),
        )
        bad = joined.filter(
            (F.col("n_tokens") < F.col("n_words"))
            | (F.col("n_tokens") > F.col("n_chars") + F.col("n_words"))
        )
        assert bad.count() == 0


class TestBpeProperties:
    def test_roundtrip_and_monotonicity_properties(self):
        from hypothesis import given, settings, strategies as st

        words = st.text(
            alphabet=st.characters(codec="utf-8", exclude_characters=" \t\n\r"),
            min_size=1, max_size=8,
        )

        @settings(max_examples=200, deadline=None)
        @given(st.lists(st.tuples(words, st.integers(1, 50)), max_size=12),
               st.integers(0, 30))
        def prop(freqs, n_merges):
            merges = _merge_loop(freqs, n_merges)
            enc = _word_encoder({p: i for i, p in enumerate(merges)})
            for w, _ in freqs:
                lw = w.lower()  # lowercasing can change length (İ → i̇)
                toks = enc(lw)
                # lossless: concatenated tokens == word + END marker
                assert "".join(toks) == lw + END
                # bounded: between 1 and len(word)+1 symbols
                assert 1 <= len(toks) <= len(lw) + 1
            # merge list is duplicate-free (each pair consumed once)
            assert len(merges) == len(set(merges))

        prop()


class TestReviewFixes:
    def test_fit_encode_agree_on_unicode_whitespace(self, spark):
        # NBSP (U+00A0) is NOT a Java \s separator: fit counts
        # "foo bar" as ONE word and encode must tokenize it the same
        # way (a naive str.split() would break it into two)
        df = _corpus(spark, ["foo bar foo bar foo bar"])
        model = bpe_fit(df, "text", n_merges=20, min_count=1)
        row = bpe_encode(df, "text", "doc_id", model).collect()[0]
        # fully merged: 3 occurrences of one trained word -> one token each
        assert row["tokens"] == ["foo bar" + END] * 3
        # tabs/newlines ARE separators on both sides
        df2 = _corpus(spark, ["a\tb\nc"])
        toks = bpe_encode(df2, "text", "doc_id", model).collect()[0]["tokens"]
        assert "".join(toks).count(END) == 3  # three words

    def test_merge_loop_heap_matches_scan_semantics(self):
        # the lazy-heap selection must still pick max count with
        # lexicographic tie-break after counts DECREASE (the stale-entry
        # case): "abab" merging (a,b) decrements (b,a)'s count
        merges = _merge_loop([("abab", 3), ("ba", 2)], 4)
        assert merges[0] == ("a", "b")  # count 6 beats everything
        assert len(merges) == len(set(merges))

    def test_merge_loop_large_vocab_is_fast(self):
        import time

        # 20k word types, 200 merges: the old full-scan selection was
        # O(merges x distinct_pairs) and took minutes at this size
        freqs = [(f"w{i:05d}x{i % 97:02d}", 1 + i % 13) for i in range(20_000)]
        t0 = time.monotonic()
        merges = _merge_loop(freqs, 200)
        assert len(merges) == 200
        assert time.monotonic() - t0 < 30.0

    def test_id_output_round_trips_through_vocab(self, spark):
        model = bpe_fit(
            _corpus(spark, ["low low low newest newest"]), "text",
            n_merges=8, min_count=1,
        )
        df = _corpus(spark, ["low newest", "zzz"])
        ids = {
            r["doc_id"]: r["tokens"]
            for r in bpe_encode(df, "text", "doc_id", model, output="ids").collect()
        }
        toks = {
            r["doc_id"]: r["tokens"]
            for r in bpe_encode(df, "text", "doc_id", model).collect()
        }
        vocab = model["vocab"]
        unk = len(vocab)
        # known text: ids decode back to the exact token strings
        assert [vocab[i] for i in ids[0]] == toks[0]
        assert all(0 <= i < unk for i in ids[0])
        # 'z' never appeared in the fit corpus: its chars map to unk,
        # the trained </w> marker keeps its real id
        assert all(i == unk or vocab[i] == END for i in ids[1])
        assert unk in ids[1]

    def test_bad_output_mode_rejected(self, spark):
        model = {"merges": [], "vocab": [END]}
        df = _corpus(spark, ["x"])
        with pytest.raises(ValueError, match="tokens.*ids"):
            bpe_encode(df, "text", "doc_id", model, output="wrong")

    def test_decode_round_trip_including_unk(self, spark):
        from rtstore_spark.operators.tokenizer import bpe_decode

        model = bpe_fit(
            _corpus(spark, ["low low low newest newest"]), "text",
            n_merges=8, min_count=1,
        )
        df = _corpus(spark, ["low newest low"])
        toks = bpe_encode(df, "text", "doc_id", model).collect()[0]["tokens"]
        ids = bpe_encode(df, "text", "doc_id", model, output="ids").collect()[0]["tokens"]
        assert bpe_decode(toks, model) == "low newest low"
        assert bpe_decode(ids, model) == "low newest low"
        # unseen chars became unk ids: decode marks, never crashes
        zz = bpe_encode(_corpus(spark, ["zz"]), "text", "doc_id", model,
                        output="ids").collect()[0]["tokens"]
        assert "�" in bpe_decode(zz, model)


class TestDriverMemoryGuard:
    """Round-5 fix: the word-count collect size is bounded and visible."""

    def test_hard_cap_refused_up_front(self, spark):
        from rtstore_spark.operators.tokenizer import BPE_MAX_WORD_TYPES_HARD

        df = _corpus(spark, ["a b c"])
        with pytest.raises(ValueError, match="hard cap"):
            bpe_fit(df, "text", max_word_types=BPE_MAX_WORD_TYPES_HARD + 1)

    def test_truncation_is_flagged_and_warned(self, spark):
        import warnings

        df = _corpus(spark, ["aa bb cc dd ee aa bb cc dd ee"])
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            model = bpe_fit(df, "text", max_word_types=2, min_count=1)
        assert model["truncated"] is True
        assert any("max_word_types" in str(x.message) for x in w)
        # the prune kept the heaviest 2 word types (all tied → lexical)
        syms = set("".join(model["vocab"]))
        assert "e" not in syms  # tail word types dropped

    def test_untruncated_fit_is_clean(self, spark):
        import warnings

        df = _corpus(spark, ["low low lower"])
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            model = bpe_fit(df, "text", min_count=1)
        assert model["truncated"] is False
        assert not [x for x in w if "max_word_types" in str(x.message)]


class TestTruncationBoundary:
    def test_exactly_at_cap_is_not_truncated(self, spark):
        import warnings

        df = _corpus(spark, ["aa bb cc aa bb cc"])  # exactly 3 word types
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            model = bpe_fit(df, "text", max_word_types=3, min_count=1)
        assert model["truncated"] is False
        assert not [x for x in w if "max_word_types" in str(x.message)]
        syms = set("".join(model["vocab"]))
        assert {"a", "b", "c"} <= syms  # nothing pruned

    def test_truncated_flag_round_trips_through_save_load(
        self, spark, tmp_path
    ):
        df = _corpus(spark, ["aa bb cc dd ee"])
        model = bpe_fit(df, "text", max_word_types=2, min_count=1)
        assert model["truncated"] is True
        p = str(tmp_path / "bpe_t")
        bpe_save(spark, model, p)
        again = bpe_load(spark, p)
        assert again["truncated"] is True
        assert again["merges"] == model["merges"]

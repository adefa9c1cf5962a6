"""Stage-zero cleanup operators: unicode/whitespace normalization
(``text.normalize_text``, NFC pinned against DuckDB's ``nfc_normalize``)
and paragraph-granular exact dedup with reconstruction
(``dedup.dedup_paragraphs``)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from rtstore_spark.operators import dedup, text


class TestNormalizeText:
    def test_nfc_matches_duckdb(self, spark):
        """The python NFC step must agree byte-for-byte with DuckDB's
        nfc_normalize — the same cross-engine contract the registry
        oracles enforce."""
        samples = [
            "café composed",          # e + combining acute → é
            "Å angstrom sign",          # Å (U+212B) → Å (U+00C5)
            "already composed café",
            "ascii only stays put",
            "mixed å ring + ö diaeresis",
        ]
        df = spark.createDataFrame([Row(id=i, t=s) for i, s in enumerate(samples)])
        got = {
            r["id"]: r["t"]
            for r in text.normalize_text(
                df, "t", form="NFC", fix_whitespace=False
            ).collect()
        }
        for i, s in enumerate(samples):
            want = duckdb.sql("select nfc_normalize(?)", params=[s]).fetchone()[0]
            assert got[i] == want, f"sample {i}: {got[i]!r} != {want!r}"

    def test_control_and_zero_width_stripped(self, spark):
        df = spark.createDataFrame(
            [Row(id=1, t="a\x00b\x08c​d‌‍e﻿⁠f\x7fg")]
        )
        out = text.normalize_text(df, "t", form=None, fix_whitespace=False)
        assert out.collect()[0]["t"] == "abcdefg"

    def test_tab_and_newline_survive_control_strip(self, spark):
        df = spark.createDataFrame([Row(id=1, t="a\tb\nc")])
        out = text.normalize_text(df, "t", form=None, fix_whitespace=False)
        assert out.collect()[0]["t"] == "a\tb\nc"

    def test_crlf_and_whitespace_fixes(self, spark):
        raw = "one  two\t three \r\nline2   \rline3\n\n\n\n\nlast  "
        df = spark.createDataFrame([Row(id=1, t=raw)])
        out = text.normalize_text(df, "t").collect()[0]["t"]
        assert out == "one two three\nline2\nline3\n\nlast"

    def test_null_and_idempotent(self, spark):
        df = spark.createDataFrame(
            [Row(id=1, t=None), Row(id=2, t=" x ́\n\n\n y ")],
            "id long, t string",
        )
        once = text.normalize_text(df, "t")
        twice = text.normalize_text(once, "t")
        a = {r["id"]: r["t"] for r in once.collect()}
        b = {r["id"]: r["t"] for r in twice.collect()}
        assert a[1] is None
        assert a == b

    def test_unknown_form_rejected(self, spark):
        df = spark.createDataFrame([Row(id=1, t="x")])
        with pytest.raises(ValueError, match="normalization form"):
            text.normalize_text(df, "t", form="NFX")

    def test_other_columns_preserved(self, spark):
        df = spark.createDataFrame([Row(id=7, t="a  b", lang="en")])
        out = text.normalize_text(df, "t").collect()[0]
        assert (out["id"], out["lang"], out["t"]) == (7, "en", "a b")


BOILER = "This content is licensed under the corpus terms of use."


class TestDedupParagraphs:
    def _corpus(self, spark):
        return spark.createDataFrame(
            [
                Row(id=1, t=f"{BOILER}\nunique first body\nshared middle"),
                Row(id=2, t=f"{BOILER}\nunique second body\nshared middle"),
                Row(id=3, t="entirely novel document text"),
            ]
        )

    def test_first_occurrence_wins_and_text_rebuilt(self, spark):
        out = {
            r["id"]: r
            for r in dedup.dedup_paragraphs(self._corpus(spark), "t", "id").collect()
        }
        # doc 1 is the canonical home of both repeated paragraphs
        assert out[1]["t"] == f"{BOILER}\nunique first body\nshared middle"
        assert out[1]["n_dropped"] == 0
        # doc 2 loses them but keeps its unique prose
        assert out[2]["t"] == "unique second body"
        assert out[2]["n_dropped"] == 2
        assert out[2]["n_paragraphs"] == 3
        assert out[3]["t"] == "entirely novel document text"

    def test_each_paragraph_kept_exactly_once(self, spark):
        out = dedup.dedup_paragraphs(self._corpus(spark), "t", "id")
        kept = (
            out.select(F.explode(F.split("t", "\n")).alias("p"))
            .filter(F.length(F.trim("p")) >= 2)
            .groupBy("p")
            .count()
        )
        assert kept.filter(F.col("count") > 1).count() == 0

    def test_idempotent(self, spark):
        once = dedup.dedup_paragraphs(self._corpus(spark), "t", "id").select(
            "id", "t"
        )
        twice = dedup.dedup_paragraphs(once, "t", "id")
        assert twice.agg(F.sum("n_dropped")).collect()[0][0] == 0

    def test_intra_doc_repeat_dropped(self, spark):
        df = spark.createDataFrame(
            [Row(id=1, t="alpha beta\nmiddle line\nalpha beta")]
        )
        row = dedup.dedup_paragraphs(df, "t", "id").collect()[0]
        assert row["t"] == "alpha beta\nmiddle line"
        assert row["n_dropped"] == 1

    def test_short_structure_lines_exempt(self, spark):
        """Blank lines / single-char bullets repeat everywhere by nature;
        min_chars keeps them out of the dedup set so formatting survives."""
        df = spark.createDataFrame(
            [
                Row(id=1, t="para one\n\npara two"),
                Row(id=2, t="para three\n\npara four"),
            ]
        )
        out = {r["id"]: r for r in dedup.dedup_paragraphs(df, "t", "id").collect()}
        assert out[1]["t"] == "para one\n\npara two"
        assert out[2]["t"] == "para three\n\npara four"
        assert out[1]["n_dropped"] == out[2]["n_dropped"] == 0

    def test_string_ids_and_tiebreak(self, spark):
        """String ids are first-class; the winner is the lexicographically
        smallest (id, pos) struct."""
        df = spark.createDataFrame(
            [Row(id="b", t="dup para here"), Row(id="a", t="dup para here")]
        )
        out = {r["id"]: r["t"] for r in dedup.dedup_paragraphs(df, "t", "id").collect()}
        assert out["a"] == "dup para here"
        assert out["b"] == ""

    def test_plan_single_explode_no_cartesian(self, spark):
        """Default mode: winner selection is a WINDOW over the hv key so
        the paragraph explode + md5 subtree is evaluated ONCE (exactly
        one Generate node — the old groupBy + back-join formulation
        re-evaluated it on the probe side, doubling the dominant cost).
        No cartesian anywhere."""
        plan = (
            dedup.dedup_paragraphs(self._corpus(spark), "t", "id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert plan.count("Generate") == 1

    def test_plan_boilerplate_mode_stays_partial_agg(self, spark):
        """Boilerplate mode needs an exact distinct-doc count, which must
        stay a partial-aggregated count_distinct (a collect_set window
        over a 10k-doc boilerplate group would buffer the whole set per
        occurrence row) — no Window over the exploded paragraphs."""
        plan = (
            dedup.dedup_paragraphs(
                self._corpus(spark), "t", "id", boilerplate_min_df=2
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "Window" not in plan


class TestPipelineIntegration:
    def test_normalize_and_paragraph_stage(self, spark):
        """Stage 0 + 3b wired into prepare_corpus: decomposed-unicode dups
        collapse via normalization, boilerplate paragraphs vanish, and a
        doc that was pure boilerplate is dropped entirely."""
        from rtstore_spark.operators.pipeline import CorpusPrepConfig, prepare_corpus

        body = "the quick brown fox jumps over the lazy dog near the river bank today"
        composed = f"café news\n{body}"
        decomposed = f"café news\n{body}"  # same text, NFD rendering
        df = spark.createDataFrame(
            [
                Row(id=1, t=composed),
                Row(id=2, t=decomposed),         # exact dup after NFC
                Row(id=3, t=f"café news\nthe completely different body text keeps this document alive and well"),
                Row(id=4, t="café news"),        # pure boilerplate → emptied → dropped
            ]
        )
        cfg = CorpusPrepConfig(
            min_tokens=2, langs=["en"], near_dup_threshold=0.99,
            normalize=True, dedup_paragraphs=True,
        )
        out = {r["id"]: r["t"] for r in prepare_corpus(df, "t", "id", cfg).collect()}
        assert 1 in out and out[1] == composed   # canonical copy intact
        assert 2 not in out                       # NFD twin deduped exactly
        assert 3 in out and "café news" not in out[3]  # boilerplate para removed
        assert 4 not in out                       # emptied doc dropped


class TestBoilerplateRemoval:
    def _corpus(self, spark):
        return spark.createDataFrame(
            [
                Row(id=1, t="SITE NAV MENU\ndoc one prose\nshared tail"),
                Row(id=2, t="SITE NAV MENU\ndoc two prose"),
                Row(id=3, t="SITE NAV MENU\ndoc three prose\nshared tail"),
            ]
        )

    def test_frequent_paragraph_removed_everywhere(self, spark):
        out = {
            r["id"]: r
            for r in dedup.dedup_paragraphs(
                self._corpus(spark), "t", "id", boilerplate_min_df=3
            ).collect()
        }
        # df=3 menu: gone from ALL docs, canonical included
        assert out[1]["t"] == "doc one prose\nshared tail"
        assert out[2]["t"] == "doc two prose"
        assert out[3]["t"] == "doc three prose"
        # df=2 "shared tail" stays below the cutoff: dedup semantics —
        # canonical first occurrence survives, the other drops
        assert out[1]["n_dropped"] == 1  # the menu
        assert out[3]["n_dropped"] == 2  # menu + duplicate tail

    def test_below_cutoff_unchanged_vs_default(self, spark):
        base = dedup.dedup_paragraphs(self._corpus(spark), "t", "id")
        high = dedup.dedup_paragraphs(
            self._corpus(spark), "t", "id", boilerplate_min_df=4
        )
        assert sorted(r["t"] for r in base.collect()) == sorted(
            r["t"] for r in high.collect()
        )

    def test_intra_doc_repeats_do_not_fake_df(self, spark):
        # the same line 3x inside ONE doc is df=1: not boilerplate, and
        # intra-doc dedup still keeps its first occurrence
        df = spark.createDataFrame(
            [Row(id=1, t="echo line\necho line\necho line\nbody")]
        )
        row = dedup.dedup_paragraphs(
            df, "t", "id", boilerplate_min_df=2
        ).collect()[0]
        assert row["t"] == "echo line\nbody"

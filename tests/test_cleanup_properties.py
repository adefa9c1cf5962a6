"""Property tests (hypothesis) for the stage-zero cleanup operators:
``dedup_paragraphs`` invariants over randomly-composed corpora with forced
paragraph collisions, and ``normalize_text`` idempotence / NFC parity over
adversarial unicode."""

from __future__ import annotations

import unicodedata

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from rtstore_spark.operators import dedup, text

# a tiny paragraph pool forces heavy cross-doc collisions; the empty string
# and the one-char bullet exercise the min_chars exemption
PARAS = st.sampled_from(
    ["shared alpha body", "shared beta body", "unique gamma line",
     "delta prose here", "", "*"]
)
DOC = st.lists(PARAS, min_size=1, max_size=5).map("\n".join)
CORPUS = st.lists(DOC, min_size=1, max_size=6)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(CORPUS)
def test_dedup_paragraphs_invariants(spark, docs):
    df = spark.createDataFrame(
        [Row(id=i, t=t) for i, t in enumerate(docs)]
    )
    out = dedup.dedup_paragraphs(df, "t", "id")
    rows = out.collect()

    # every input doc comes back exactly once, with consistent counters
    assert sorted(r["id"] for r in rows) == list(range(len(docs)))
    def kept_paras(r, orig):
        # "" is ambiguous (zero paragraphs vs N kept empty ones); a
        # non-empty kept para makes concat_ws non-empty, so the empty case
        # is exactly (n_paragraphs - n_dropped) empty strings
        if r["t"] == "":
            return [""] * (r["n_paragraphs"] - r["n_dropped"])
        return r["t"].split("\n")

    for r in rows:
        orig = docs[r["id"]].split("\n")
        kept = kept_paras(r, orig)
        assert r["n_paragraphs"] == len(orig)
        assert r["n_dropped"] == len(orig) - len(kept)
        # kept paragraphs are a subsequence of the original (order intact)
        it = iter(orig)
        assert all(p in it for p in kept)
        # exempt short paragraphs all survive
        assert sum(len(p.strip()) < 2 for p in kept) == sum(
            len(p.strip()) < 2 for p in orig
        )

    # each distinct dedupable paragraph survives exactly once corpus-wide,
    # and the survivor is the first occurrence by (doc id, position)
    firsts = {}
    for i, d in enumerate(docs):
        for pos, p in enumerate(d.split("\n")):
            if len(p.strip()) >= 2 and p not in firsts:
                firsts[p] = (i, pos)
    seen = {}
    for r in rows:
        orig = docs[r["id"]].split("\n")
        it = iter(enumerate(orig))
        for p in kept_paras(r, orig):
            pos = next(j for j, q in it if q == p)
            if len(p.strip()) >= 2:
                assert p not in seen, f"{p!r} kept twice"
                seen[p] = (r["id"], pos)
    assert seen == firsts

    # idempotence: a second pass drops nothing
    again = dedup.dedup_paragraphs(out.select("id", "t"), "t", "id")
    assert again.agg(F.sum("n_dropped")).collect()[0][0] == 0


TEXTS = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("L", "N", "P", "Z", "M", "C"),
        exclude_characters=["\x85", " ", " "],
    ),
    max_size=60,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(TEXTS, min_size=1, max_size=8))
def test_normalize_text_invariants(spark, texts):
    df = spark.createDataFrame([Row(id=i, t=t) for i, t in enumerate(texts)])
    out = {r["id"]: r["t"] for r in text.normalize_text(df, "t").collect()}
    for i in range(len(texts)):
        got = out[i]
        # output is clean: no CR, no control chars, no runs of blanks,
        # no trailing blanks before newlines, at most one empty line
        assert "\r" not in got and "  " not in got and " \n" not in got
        assert "\n\n\n" not in got
        assert not any(
            unicodedata.category(c) == "Cc" and c not in "\t\n" for c in got
        )
        # NFC-normalized and fully idempotent
        assert got == unicodedata.normalize("NFC", got)
    twice = {
        r["id"]: r["t"]
        for r in text.normalize_text(
            spark.createDataFrame([Row(id=i, t=t) for i, t in out.items()]), "t"
        ).collect()
    }
    assert twice == out

"""Learned BPE subword vocabulary: distributed fit, Arrow-batched encode.

The brief's training-data surface asks for token counting; a *learned*
byte-pair-encoding vocabulary is the real version of that operator —
the tokenizer a 100-TB pretraining run would actually fit over its corpus
(Sennrich et al., *Neural Machine Translation of Rare Words with Subword
Units*, 2016). The reference engine has no analog (its query surface is
document CRUD + JQL — SURVEY §2.3-2.6); this belongs to the
beyond-parity training-data-prep family.

Scale design
------------
The classic BPE trainer does NOT iterate over the corpus — it iterates
over the *word-type frequency table* (sentencepiece and the HF trainers
work the same way). That split is what makes the operator 100-TB-safe:

- ``bpe_fit``'s corpus-sized work is ONE word-count groupBy — a
  partial-agg shuffle whose wire rows are bounded by the vocabulary, not
  the corpus (map-side combine collapses repeats per executor). The
  table is then pruned to the ``max_word_types`` most frequent types (a
  TakeOrdered, bounded driver memory) before the merge loop runs
  driver-side. Merge learning is O(word_types × n_merges) and completely
  independent of corpus size; at 100 TB the pruned 1M-type table drops a
  vanishing tail of singleton noise (exactly the types BPE merges could
  never promote past ``min_count`` anyway).
- ``bpe_encode`` ships the merge ranks to executors inside the UDF
  closure (O(n_merges) small — a 32k-merge model is ~1 MB) and encodes
  via an Arrow-batched pandas UDF with a per-batch word memo, so each
  distinct word is merged once per batch regardless of how often it
  repeats. No shuffle: scan → project.

Determinism: ties in pair frequency break on the pair's lexicographic
order, so the learned merge list is a pure function of the word-count
table — two fits over differently-partitioned copies of the same corpus
produce identical vocabularies (pinned by test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType, StructField, StructType

# marks the word boundary so merges cannot cross words and a decoder can
# restore spacing; standard BPE convention (Sennrich 2016 uses `</w>`)
END = "</w>"

# hard ceiling on the (word, count) rows bpe_fit will collect to the
# driver — past this the collect alone is hundreds of MB before the merge
# loop's inverted index multiplies it
BPE_MAX_WORD_TYPES_HARD = 4_000_000


def _tokens(text_col: str):
    """Lowercased whitespace tokens — the library-wide convention
    (``text.token_count`` / ``lm._tokens`` split the same way).

    NOTE: Java's ``\\s`` is ASCII-only ([ \\t\\n\\x0B\\f\\r]); the encode
    side splits on exactly that class (NOT Python ``str.split``, which
    also breaks on U+00A0/U+2009/U+3000 and would tokenize web text
    differently than the fit counted it)."""
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


# the Java \s class, verbatim — keep in sync with _tokens
_ASCII_WS = "[ \t\n\x0b\f\r]+"


def word_counts(
    df: DataFrame, text_col: str, max_word_types: int, min_count: int
) -> DataFrame:
    """The corpus-sized step: (word, count) pruned to the heaviest types.

    One partial-agg shuffle; the TakeOrdered prune bounds what the driver
    will hold. Deterministic (count desc, word asc) tie-break so the fit
    is reproducible across partitionings.
    """
    return (
        df.select(F.explode(_tokens(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .orderBy(F.col("c").desc(), "w")
        .limit(max_word_types)
    )


def _merge_loop(freqs: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Driver-side BPE merge learning over word-type frequencies.

    Incremental pair-count maintenance: each adopted merge only touches
    the words that contain the merged pair (tracked via an inverted
    index). Best-pair selection is a lazy-invalidation max-heap — every
    count change pushes a fresh entry; stale entries are discarded when
    popped against the live dict — so a learning step costs
    O(changed pairs · log heap), never a scan of all distinct pairs
    (which at 1M word types is millions of entries × n_merges).
    Tie-break on the pair's lexicographic order keeps the fit a pure
    function of the frequency table.
    """
    import heapq

    words: list[list[str]] = []  # symbol sequences, one per word type
    wfreq: list[int] = []
    for w, c in freqs:
        words.append(list(w) + [END])
        wfreq.append(c)

    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}  # pair -> word indexes
    heap: list[tuple[int, tuple[str, str]]] = []  # (-count, pair), lazy

    def add_word_pairs(i: int, sign: int) -> None:
        syms = words[i]
        for a, b in zip(syms, syms[1:]):
            p = (a, b)
            c = pair_counts.get(p, 0) + sign * wfreq[i]
            if c > 0:
                pair_counts[p] = c
                # push on EVERY change (both directions): a decreased
                # count must re-enter the heap at its new value or the
                # stale larger entry would pop, fail validation and lose
                # the pair for good
                heapq.heappush(heap, (-c, p))
            else:  # zeroed by the decrement pass: drop, don't accrete
                pair_counts.pop(p, None)
            if sign > 0:
                where.setdefault(p, set()).add(i)

    for i in range(len(words)):
        if len(words[i]) >= 2:
            add_word_pairs(i, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair = None
        while heap:
            negc, p = heapq.heappop(heap)
            if pair_counts.get(p, 0) == -negc:  # live entry
                pair = p
                break
        if pair is None:
            break
        merges.append(pair)
        joined = pair[0] + pair[1]
        touched = list(where.get(pair, ()))
        for i in touched:
            syms = words[i]
            if len(syms) < 2:
                continue
            # re-count this word's pairs around the rewrite (cheap: words
            # are short; avoids adjacent-pair edge cases of in-place math)
            add_word_pairs(i, -1)
            out: list[str] = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == pair[0] and syms[j + 1] == pair[1]:
                    out.append(joined)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            add_word_pairs(i, +1)
        # fully consumed, and two merged symbols can never become adjacent
        # again (merges only ever join, producing longer symbol names) —
        # delete outright so the dict shrinks instead of accreting zeros
        pair_counts.pop(pair, None)
        where.pop(pair, None)
    return merges


def bpe_fit(
    df: DataFrame,
    text_col: str,
    n_merges: int = 8000,
    max_word_types: int = 1_000_000,
    min_count: int = 2,
) -> dict:
    """Fit a BPE merge table on a corpus.

    Returns ``{"merges": [(a, b), ...] in rank order, "vocab":
    sorted symbol list, "truncated": bool}``. See module docstring for
    why the corpus-sized work is exactly one word-count shuffle.

    Driver-memory guard: the fit collects up to ``max_word_types``
    (word, count) rows — ~tens of MB at the 1M default. A request past
    ``BPE_MAX_WORD_TYPES_HARD`` (4M, ~hundreds of MB collected plus the
    merge loop's inverted index on top) is refused up front with the
    projected size in the message rather than OOMing the driver mid-fit.
    When the frequency prune actually fired (collected == cap), the
    model carries ``truncated=True`` and a warning states the collect
    size, so a silently-capped vocabulary is visible to the caller.
    """
    if max_word_types > BPE_MAX_WORD_TYPES_HARD:
        raise ValueError(
            f"bpe_fit: max_word_types={max_word_types:,} would collect "
            f"~{max_word_types * 40 / 1e6:.0f}+ MB of word counts to the "
            f"driver (hard cap {BPE_MAX_WORD_TYPES_HARD:,}); fit on a "
            "frequency-pruned vocabulary instead — BPE quality saturates "
            "well below 1M word types"
        )
    # fetch ONE row past the cap: a corpus with exactly max_word_types
    # distinct words is complete, not truncated — collected == cap alone
    # cannot tell the two apart
    freqs = [
        (r["w"], int(r["c"]))
        for r in word_counts(
            df, text_col, max_word_types + 1, min_count
        ).collect()
    ]
    truncated = len(freqs) > max_word_types
    if truncated:
        freqs = freqs[:max_word_types]
        import warnings

        warnings.warn(
            f"bpe_fit: corpus has more than max_word_types={max_word_types:,} "
            "distinct words ≥ min_count; the fit used the heaviest "
            f"{len(freqs):,} types (deterministic count-desc prune). "
            "Raise max_word_types or min_count if tail words matter.",
            stacklevel=2,
        )
    merges = _merge_loop(freqs, n_merges)
    vocab = set()
    for w, _ in freqs:
        vocab.update(w)
    vocab.add(END)
    vocab.update(a + b for a, b in merges)
    return {"merges": merges, "vocab": sorted(vocab), "truncated": truncated}


def _word_encoder(ranks: dict[tuple[str, str], int]):
    """Greedy lowest-rank-first merge of one word (HF/GPT-2 style).

    Returned as a dynamically-created closure on purpose: cloudpickle
    ships such functions BY VALUE, so the executor never has to import
    ``rtstore_spark`` — the encode UDF works on a cluster whose workers
    don't have the package on their Python path (no ``--py-files``).
    A module-level function here would pickle by reference and raise
    ``ModuleNotFoundError`` on exactly those workers.
    """
    end = END  # captured by value alongside the closure

    def encode(word: str) -> list[str]:
        syms = list(word) + [end]
        while len(syms) >= 2:
            best_rank, best_j = None, -1
            for j in range(len(syms) - 1):
                r = ranks.get((syms[j], syms[j + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_j = r, j
            if best_rank is None:
                break
            syms[best_j : best_j + 2] = [syms[best_j] + syms[best_j + 1]]
        return syms

    return encode


def bpe_encode(
    df: DataFrame, text_col: str, id_col: str, model: dict,
    output: str = "tokens",
) -> DataFrame:
    """(id, tokens, n_tokens) under a ``bpe_fit`` model.

    ``output="tokens"`` yields subword strings (array<string>);
    ``output="ids"`` yields vocabulary indexes (array<int>) — what a
    training pipeline actually feeds the model. Ids index the SORTED
    vocab list (``model["vocab"]``, the order ``bpe_save`` persists), and
    a symbol outside it — a character the pruned word-count never saw —
    maps to the reserved unk id ``len(vocab)``. Encode-then-lookup means
    unks are exactly the chars the fit never counted, never whole words.

    Arrow-batched ``mapInPandas`` with a per-batch word memo: each
    distinct word in a batch is merged once. The merge-rank dict rides in
    the closure (O(n_merges), ~1 MB at 32k merges — cheaper than a join
    against a broadcast table because the memo also amortizes repeated
    words, which a join cannot). Shuffle-free: scan → project.
    """
    if output not in ("tokens", "ids"):
        raise ValueError(f"output must be 'tokens' or 'ids', got {output!r}")
    encode_word = _word_encoder({p: i for i, p in enumerate(model["merges"])})
    sym_ids = (
        {s: i for i, s in enumerate(model["vocab"])} if output == "ids" else None
    )
    elem = IntegerType() if output == "ids" else StringType()
    schema = StructType(
        [
            df.schema[id_col],
            StructField("tokens", ArrayType(elem)),
            StructField("n_tokens", IntegerType()),
        ]
    )

    ascii_ws = _ASCII_WS  # captured by value: closure must not touch module

    def run(batches):
        import re

        import pandas as pd

        # Java-\s parity: str.split() would also break on Unicode spaces
        # (NBSP etc.), splitting words the fit never counted
        split_ws = re.compile(ascii_ws).split
        memo: dict[str, list] = {}
        unk = None if sym_ids is None else len(sym_ids)

        def enc(text):
            toks: list = []
            if not isinstance(text, str):  # None or pandas NaN
                return toks
            for w in split_ws(text.lower()):
                if not w:  # leading/trailing separators, like w != '' in fit
                    continue
                got = memo.get(w)
                if got is None:
                    got = encode_word(w)
                    if sym_ids is not None:
                        got = [sym_ids.get(s, unk) for s in got]
                    memo[w] = got
                toks.extend(got)
            return toks

        for pdf in batches:
            toks = pdf[text_col].map(enc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": toks,
                    "n_tokens": toks.map(len).astype("int32"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, schema)


def bpe_save(spark, model: dict, path: str) -> None:
    """Persist merges (rank-ordered) as one small parquet table; the
    vocab is derivable but stored too so a reader needs no re-derivation.
    The ``truncated`` fit diagnostic rides in a one-row meta table so
    save→load round-trips the whole model dict."""
    spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(model["merges"])],
        "rank INT, a STRING, b STRING",
    ).coalesce(1).write.mode("overwrite").parquet(path + "/merges")
    spark.createDataFrame(
        [(s,) for s in model["vocab"]], "sym STRING"
    ).coalesce(1).write.mode("overwrite").parquet(path + "/vocab")
    spark.createDataFrame(
        [(bool(model.get("truncated", False)),)], "truncated BOOLEAN"
    ).coalesce(1).write.mode("overwrite").parquet(path + "/meta")


def bpe_load(spark, path: str) -> dict:
    """Reload a model written by ``bpe_save`` (``truncated`` defaults to
    False for models saved before the meta table existed)."""
    from pyspark.errors.exceptions.captured import AnalysisException

    rows = spark.read.parquet(path + "/merges").orderBy("rank").collect()
    vocab = [r["sym"] for r in spark.read.parquet(path + "/vocab").collect()]
    try:
        truncated = bool(
            spark.read.parquet(path + "/meta").collect()[0]["truncated"]
        )
    except AnalysisException:
        truncated = False
    return {
        "merges": [(r["a"], r["b"]) for r in rows],
        "vocab": sorted(vocab),
        "truncated": truncated,
    }


def bpe_decode(tokens: list, model: dict) -> str:
    """Inverse of one document's encode: subword strings OR vocabulary ids
    back to text (driver-side helper for spot checks and round-trip
    tests; unk ids render as � since the original character is
    genuinely gone). Word boundaries come from the END markers — which
    makes decode ambiguous for text that LITERALLY contains "</w>" (its
    characters re-merge into a symbol indistinguishable from the
    marker); that ambiguity is inherent to string-form BPE (Sennrich
    2016 shares it), not a bug to fix here."""
    vocab = model["vocab"]
    parts = []
    for t in tokens:
        if isinstance(t, int):
            t = vocab[t] if 0 <= t < len(vocab) else "�"
        parts.append(t)
    return "".join(parts).replace(END, " ").rstrip()

"""Lexical retrieval at corpus scale: a persisted BM25 inverted index.

``text.bm25_topk`` answers ONE query with one pass over the corpus —
right for ad-hoc search, wrong for the batch shapes a training-data
pipeline actually runs (decontamination search: thousands of benchmark
queries against a 100-TB corpus; dedup candidate generation; eval-set
retrieval). This module is the index-based counterpart, the same
relationship ``similarity.write_pq_index``/``ivf_pq_search_batch`` have
to brute-force cosine:

- ``bm25_build``      — one corpus scan → postings (term, id, tf, dl),
  per-term document frequencies, and the global (n_docs, avgdl) stats;
- ``write_bm25_index`` / ``read_bm25_index`` — durable form, postings
  PARTITIONED BY a term-hash bucket so a search's scan prunes to the
  buckets its query terms hash into; atomic generation-pointer rebuilds
  (same single-writer protocol as the ANN index);
- ``bm25_search_batch`` — (qid, text) queries → top-k (qid, id, score)
  in ONE job: query terms broadcast against the pruned postings scan,
  IDF folded in via a broadcast join on the O(matched-vocab) term-df
  table, per-(qid, id) partial-agg sum, per-qid top-k window.

Shuffle bytes scale with MATCHED POSTINGS (docs containing query
terms), never with corpus x queries — the property that makes 10k
decontamination queries against 100 TB a join, not 10k scans.

Scoring matches ``text.bm25_topk`` exactly (Okapi BM25,
idf = ln(1 + (N - df + 0.5)/(df + 0.5)), tf saturation with length
normalization, scores rounded to 6): one query through the batch path
returns byte-identical (id, score) rows — pinned by test.

Reference scope note: the reference engine has no lexical retrieval
(its queries are JQL point/range scans); this operator belongs to the
training-data-pipeline family the build brief adds on top.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS_DEFAULT = 64

_TOKENIZE = r"\s+"


def _tokens(text_col: str):
    return F.split(F.trim(F.lower(F.col(text_col))), _TOKENIZE)


def bm25_build(
    df: DataFrame, text_col: str, id_col: str,
    n_buckets: int = N_BUCKETS_DEFAULT,
) -> tuple[DataFrame, DataFrame, dict]:
    """One corpus scan → (postings, term_df, stats).

    postings: (bucket, term, id, tf, dl) — bucket = pmod(xxhash64(term),
    n_buckets), the partition key a search prunes on; term_df: (term,
    df) document frequencies, O(vocab) rows; stats: {"n_docs", "avgdl",
    "n_buckets"} — the corpus-wide constants BM25 needs (they cover ALL
    documents, including ones a given search never touches)."""
    base = df.select(
        F.col(id_col).alias("id"), _tokens(text_col).alias("_toks")
    ).select("id", "_toks", F.size("_toks").alias("dl"))
    row = base.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    stats = {
        "n_docs": int(row["n"]),
        "avgdl": float(row["avgdl"] or 1.0),
        "n_buckets": int(n_buckets),
    }
    postings = (
        base.select("id", "dl", F.explode("_toks").alias("term"))
        .groupBy("term", "id")  # partial-agg combine before the shuffle
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
    )
    term_df = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")  # postings are (term, id)-unique
    )
    return postings, term_df, stats


def write_bm25_index(
    df: DataFrame, text_col: str, id_col: str, path: str,
    n_buckets: int = N_BUCKETS_DEFAULT,
) -> None:
    """Materialize the index: ``<gen>/postings`` partitioned by bucket,
    ``<gen>/_termdf``, ``<gen>/_stats.json`` — committed behind the same
    atomic root ``_current`` pointer flip as ``write_pq_index`` (a crash
    anywhere before the flip leaves the previous generation fully live;
    concurrent rebuilds fail loudly on the single-writer backstop)."""
    import uuid

    from rtstore_spark.store.fs import fs_for, parse_gen_pointer

    spark = df.sparkSession
    fs = fs_for(path, spark)
    fs.makedirs(path)
    cur = fs.read_text(f"{path}/_current")
    prev_gen, prev_name = parse_gen_pointer(cur)
    gen_name = f"gen-{prev_gen + 1}-{uuid.uuid4().hex[:8]}"
    base = f"{path}/{gen_name}"
    postings, term_df, stats = bm25_build(df, text_col, id_col, n_buckets)
    if stats["n_docs"] == 0:
        # an empty build must never flip the pointer: the postings
        # directory would hold zero part files (unreadable — schema
        # inference fails) and the sweep would have destroyed the last
        # GOOD generation. A rebuild fed an accidentally-empty filtered
        # corpus fails loudly instead of replacing a working index.
        raise ValueError(
            f"write_bm25_index: refusing to commit an EMPTY corpus over "
            f"{path} — the live generation stays untouched"
        )
    # the two writes share the corpus-wide tokenize + (term, id)
    # aggregate — cache it so term_df reuses postings' computation
    # instead of re-running the dominant shuffle
    postings = postings.persist()
    try:
        postings.write.mode("overwrite").partitionBy("bucket").parquet(
            base + "/postings"
        )
        term_df.write.mode("overwrite").parquet(base + "/_termdf")
    finally:
        postings.unpersist()
    fs.write_text_atomic(base + "/_stats.json", json.dumps(stats))
    cur2 = fs.read_text(f"{path}/_current")
    if parse_gen_pointer(cur2)[0] != prev_gen:
        raise RuntimeError(
            f"write_bm25_index: concurrent rebuild advanced {path} to "
            f"{cur2.strip() if cur2 else 0} during this build — indexes "
            "have a single-writer contract; re-run the rebuild"
        )
    fs.write_text_atomic(f"{path}/_current", gen_name)
    # grace-of-one retention (save_seen_filter's rule): a reader holding
    # lazy plans against the immediate predecessor must not lose its
    # files mid-query; only OLDER generations sweep now — the
    # predecessor retires on the NEXT rebuild
    for d in fs.listdir(path):
        if d.startswith("gen-") and d not in (gen_name, prev_name):
            fs.delete(f"{path}/{d}", recursive=True)


def read_bm25_index(spark, path: str) -> tuple[DataFrame, DataFrame, dict]:
    """Load the LIVE generation: (postings, term_df, stats)."""
    from rtstore_spark.store.fs import fs_for, parse_gen_pointer

    fs = fs_for(path, spark)
    cur = fs.read_text(f"{path}/_current")
    _, live = parse_gen_pointer(cur)
    if not live:
        raise FileNotFoundError(f"no live bm25 index at {path}")
    base = f"{path}/{live}"
    postings = spark.read.option("basePath", base + "/postings").parquet(
        base + "/postings"
    )
    term_df = spark.read.parquet(base + "/_termdf")
    stats = json.loads(fs.read_text(base + "/_stats.json"))
    return postings, term_df, stats


def bm25_search_batch(
    postings: DataFrame,
    term_df: DataFrame,
    stats: dict,
    queries: DataFrame,
    qid_col: str = "qid",
    qtext_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """All queries against the index in one job → (qid, id, score),
    top-k per query, ordered (qid, score desc, id). ``round_to`` is the
    score's decimal rounding (6 matches text.bm25_topk; cross-engine
    oracles should round the RAW sum once at their comparison precision
    — double-rounding through 6 manufactures exact half-way decimals
    that Spark's BigDecimal-on-shortest-repr and an engine rounding the
    binary value resolve differently).

    Plan shape: the DISTINCT (qid, term) pairs of the query batch
    broadcast twice — once to prune+probe the postings scan (bucket
    partition pruning when the index is the materialized form, then an
    equi-join on term), once against term_df for IDF literals. The only
    data-sized shuffles are the per-(qid, id) score sum (partial-agg
    combined map-side) and the per-qid top-k window, both over matched
    candidates only."""
    n_docs = int(stats["n_docs"])
    avgdl = float(stats["avgdl"]) or 1.0
    n_buckets = int(stats.get("n_buckets", N_BUCKETS_DEFAULT))
    qterms = (
        queries.select(
            F.col(qid_col).alias("qid"),
            F.explode(_tokens(qtext_col)).alias("term"),
        )
        .distinct()  # standard short-query BM25: query tf is 0/1
        .withColumn("bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)))
    )
    # bucket pruning: a filter on the PARTITION column of the persisted
    # postings (dynamic partition pruning from the broadcast join side;
    # harmless no-op on an in-memory postings frame)
    hits = postings.join(
        F.broadcast(qterms), ["bucket", "term"], "inner"
    )
    # IDF weights come from term_df RESTRICTED to the query vocabulary —
    # the full-vocab table is O(corpus vocabulary) and must never
    # broadcast; the restriction is O(query terms)
    tdf = term_df.join(
        F.broadcast(qterms.select("term").distinct()), "term", "inner"
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl))
    )
    scored = (
        hits.join(F.broadcast(tdf), "term", "inner")
        .select("qid", "id", (idf * tf_part).alias("_s"))
        .groupBy("qid", "id")
        .agg(F.round(F.sum("_s"), round_to).alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
        .orderBy("qid", F.col("score").desc(), "id")
    )


def bm25_batch_topk(
    df: DataFrame,
    text_col: str,
    id_col: str,
    queries: DataFrame,
    qid_col: str = "qid",
    qtext_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
) -> DataFrame:
    """Index-free convenience: build the postings in the same plan and
    search — one corpus scan for the WHOLE query batch (vs one per query
    with ``text.bm25_topk``). Use ``write_bm25_index`` +
    ``bm25_search_batch`` when the corpus outlives the query batch."""
    postings, term_df, stats = bm25_build(df, text_col, id_col)
    return bm25_search_batch(
        postings, term_df, stats, queries,
        qid_col=qid_col, qtext_col=qtext_col, k=k, k1=k1, b=b,
        round_to=round_to,
    )

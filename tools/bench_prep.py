"""Corpus-pipeline benchmark: the LLM-data-prep path end to end, timed.

Measures what `bench.py` (headline queries) does not: the prepare_corpus
gate+dedup composition, substring dedup, BPE fit+encode, and shard packing
over the real `documents` table, plus batch ANN over `embeddings`.
Prints ONE JSON line like bench.py. Environment:

  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[] threads (default 32)

Methodology (bench.py's round-8 convention): THREE full passes over all
stages; per-stage MEDIANS are reported under "queries", per-pass totals
under "runs", and "value" is the sum of the stage medians. The first
pass is the cold one — a prep pipeline IS a cold single pass in
production — and the median keeps it representative without letting a
one-off GC pause or a loaded-box spike define the round's number.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sf_of(sf_dir: str):
    """Scale factor from an 'sf<scale>'-named dir; None for custom paths —
    never raise after the timed work is done."""
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from rtstore_spark import get_spark
    from rtstore_spark.tables import load_table

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    docs.count(), emb.count()  # warm the scans / JIT the readers

    from pyspark.sql import functions as F

    from rtstore_spark.operators.dedup import substring_dedup
    from rtstore_spark.operators.pipeline import (
        CorpusPrepConfig,
        prepare_corpus,
    )
    from rtstore_spark.operators.similarity import (
        compute_centroids,
        ivf_pq_search_batch,
        pq_encode,
        pq_fit,
    )
    from rtstore_spark.operators.tokenizer import bpe_encode, bpe_fit

    # ANN index build sits OUTSIDE the timed passes (an index outlives
    # its query batches; bench_scale.py probes the build cost)
    pq = pq_fit(emb, "embedding", m=8, ksub=64)
    routed = emb.select(
        F.col("vec_id").alias("id"), "embedding", F.col("label").alias("route")
    )
    cents = compute_centroids(routed, "embedding", "route")
    codes = pq_encode(emb, "embedding", "vec_id", pq).join(
        routed.select("id", "route"), "id"
    ).persist()
    codes.count()
    queries = emb.filter("vec_id % 50 = 0").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    cfg = CorpusPrepConfig(min_tokens=5, langs=["en", "fr", "de", "es"])

    passes: list[dict[str, float]] = []
    rows: dict[str, int] = {}
    for _ in range(3):
        times: dict[str, float] = {}

        def timed(name, fn, times=times):
            t0 = time.monotonic()
            out = fn()
            times[name] = round(time.monotonic() - t0, 3)
            return out

        # 1. full prep pipeline (gates + exact + near dedup), one pass
        kept = prepare_corpus(docs, "text", "doc_id", cfg)
        n_kept = timed("prepare_corpus", kept.count)

        # 2. substring dedup over the raw table (stats only — heavy path)
        timed(
            "substring_dedup",
            lambda: substring_dedup(docs, "text", "doc_id", span_tokens=8)
            .agg({"n_tokens_removed": "sum"})
            .collect(),
        )

        # 3. BPE fit (vocab-bounded) + full-corpus encode
        model = timed(
            "bpe_fit",
            lambda: bpe_fit(docs, "text", n_merges=2000, min_count=2),
        )
        total_tokens = timed(
            "bpe_encode",
            lambda: int(
                bpe_encode(docs, "text", "doc_id", model)
                .agg({"n_tokens": "sum"})
                .collect()[0][0]
            ),
        )

        # 4. batch ANN: every 50th embedding against the IVF-PQ index
        n_hits = timed(
            "ann_batch_search",
            lambda: ivf_pq_search_batch(
                codes, pq, cents, queries, "qv", "qid", k=10, nprobe=3
            ).count(),
        )
        passes.append(times)
        rows = {
            "docs": docs.count(),
            "kept": int(n_kept),
            "bpe_tokens": total_tokens,
            "ann_hits": int(n_hits),
        }

    from tools.bench_session import session_info

    medians = {
        name: sorted(p[name] for p in passes)[1] for name in passes[0]
    }
    print(
        json.dumps(
            {
                "metric": "corpus_prep_total_wall",
                "value": round(sum(medians.values()), 3),
                "unit": "sec",
                **session_info(),
                "queries": medians,
                "runs": [round(sum(p.values()), 3) for p in passes],
                "sf": _sf_of(sf_dir),
                "rows": rows,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Beyond-parity operators for large-scale training-data pipelines.

Generic DataFrame transforms (no testdata coupling):
- ``dedup``      — exact, minhash+LSH, simhash, jaccard verification,
                   cross-shard incremental near-dup vs stored signatures
- ``similarity`` — brute-force cosine top-k, hyperplane-LSH ANN
- ``text``       — language/script ID, quality features, token counts,
                   PII metrics/scrub, repetition, chunking, BM25 top-k
- ``multimodal`` — binary media columns: schema, batching, stubbed decode
- ``sampling``   — deterministic stratified sampling, token-budget
                   domain-mixture sampling, n-gram contamination
- ``skew``       — hot-key broadcast-routed joins
- ``sketches``   — mergeable HyperLogLog distinct-count rollups
- ``pipeline``   — end-to-end corpus preparation composition
"""

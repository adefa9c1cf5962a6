"""rtstore_spark — a PySpark-native re-implementation of the capabilities of
the reference engine (DB3 Network / rtstore, surveyed in SURVEY.md).

The reference is a permanent JSON document database: signed mutations are
sequenced into (block, order), applied to per-collection document stores, and
queried with JQL (single-collection filter/project/limit/count). This package
re-expresses that surface Spark-first:

- ``engine``     — SparkSession factory tuned for analytical workloads
- ``jql``        — JQL query-string dialect -> Catalyst Column expressions
- ``store``      — catalog + document store + mutation log (parquet-backed)
- ``plans``      — StructuredQuery (Firestore-style protobuf dialect) front-end
- ``functions``  — scalar helpers (JSON merge-patch, text stats, vectors)
- ``operators``  — beyond-parity ops: dedup (incl. cross-shard), similarity,
  text (incl. BM25 and cross-doc repetition), sampling/mixing (+ mixture
  stats), skew routing, multimodal, mergeable sketch rollups (HLL / top-k /
  histogram quantiles), corpus-prep pipeline
- ``sources``    — rollup parquet sink/recovery source, EVM event-log source
  (JSONL replay + live eth_subscribe websocket with ABI decoding)
- ``streaming``  — block producer / subscription plane, continuous
  aggregates, streaming exact dedup, stateful gap sessionization
  (Structured Streaming incl. applyInPandasWithState)
- ``system``     — control plane: Setup / system status / contract sync
- ``crypto``     — pure-Python keccak256 / secp256k1 / EIP-712 recovery

Storage control-plane file ops route through ``store.fs`` (LocalFS /
HadoopFS): snapshot swaps are generation-directory writes + atomic
``_current`` pointer flips, so the same code runs on a laptop directory and
an object store.
"""

__version__ = "0.4.0"

from rtstore_spark.engine import get_spark  # noqa: F401

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
- ``operators``  — beyond-parity ops: dedup, similarity, text, sampling,
  skew routing, multimodal, corpus-prep pipeline
- ``sources``    — rollup parquet sink/recovery source, EVM event-log source
- ``streaming``  — block producer / subscription plane (Structured Streaming)
- ``system``     — control plane: Setup / system status / contract sync
- ``crypto``     — pure-Python keccak256 / secp256k1 / EIP-712 recovery
"""

__version__ = "0.2.0"

from rtstore_spark.engine import get_spark  # noqa: F401

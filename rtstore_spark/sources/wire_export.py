"""Export this engine's mutation log as a reference-format rollup artifact.

The inverse of sources/wire_import.py: mutation-log rows become
(payload, signature, block, order) parquet in the exact shape the
reference's rollup executor persists (ar_toolbox.rs:83-127 — the same
four Arrow columns as its checked-in test artifact). Each mutation is
re-encoded as a protobuf Mutation (CURRENT v2 field numbering — what a
stock node compiled from today's proto parses), documents become BSON,
and the envelope is a real EIP-712 TypedData signature.

Envelope provenance: mutations that ARRIVED in wire form kept their
original envelopes (DocStore.wire_archive) and are emitted
byte-identically — client custody survives the round trip. Direct-API
mutations have no original envelope, so those rows are RE-ATTESTED:
signed by the EXPORT KEY, like a custodial migration. For re-attested
rows the export preserves bit-for-bit: document contents, assigned doc
ids, block/order sequencing, collection/index definitions, document-db
addresses AND owners (creates ship as Mint — the one wire form carrying
an explicit address + owner). Known re-attestation limits, inherent to
the wire vocabulary: per-document ``owner`` follows the envelope signer
(preserved only for archived rows), and EVENT databases — whose create
message carries neither address nor owner — re-import owned by the
export key, at their original address only when the log references them
(the FIFO binding in sources/wire_import.py). Engine-to-engine transfer
wanting full fidelity should use the native log replay
(``DocStore.replay_from``); this export targets REFERENCE interop.

Scale: one groupBy (block, order) to reassemble multi-body mutations,
then embarrassingly-parallel encode+sign per mutation (pure-Python
secp256k1, a few ms each, distributed); the log's own partition pruning
bounds the scan to the exported block range.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import functions as F, types as T

from rtstore_spark.sources.wire_import import _ship_wire_by_value

EXPORT_SCHEMA = T.StructType([
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("signature", T.StringType(), False),
    T.StructField("block", T.LongType(), False),
    T.StructField("order", T.IntegerType(), False),
])


def export_wire_rollup(
    store, path: str, priv: int, block_start: int = 0,
    block_end: int | None = None,
) -> int:
    """Write log rows in [block_start, block_end) as a wire artifact.

    Returns the number of mutations exported. ``priv`` is the export
    key's secp256k1 scalar; every envelope verifies against its address.
    """
    _ship_wire_by_value()
    from rtstore_spark.wire.envelope import wrap_and_sign
    from rtstore_spark.wire.schemas import ACTION_BODY_KIND, encode_mutation
    from rtstore_spark.wire.translate import log_row_to_wire

    end = block_end if block_end is not None else store.state.block + 1
    log = store.get_range_mutations(block_start, end)

    # one wire mutation per (block, order); rows of a multi-body mutation
    # (suffixed log ids from an import) fold back into one envelope
    grouped = log.groupBy("block", "order").agg(
        F.collect_list(F.struct(
            "id", "sender", "nonce", "action", "db_addr", "col_name",
            "payload", "doc_ids",
        )).alias("rows")
    )
    # wire-ingested mutations kept their ORIGINAL envelopes — emit those
    # verbatim (client custody preserved); everything else is re-encoded
    # and re-attested under the export key
    archived = store.wire_archive(block_start, end).select(
        "block", "order",
        F.col("payload").alias("_arch_payload"),
        F.col("signature").alias("_arch_sig"),
    )
    grouped = grouped.join(archived, ["block", "order"], "left")

    def _body_rank(r) -> int:
        # "<sha3-hex>" → 0, "<sha3-hex>-<n>" → n (import's body_idx suffix)
        rid = r["id"]
        tail = rid.rsplit("-", 1)
        return int(tail[1]) if len(tail) == 2 and tail[1].isdigit() else 0

    def _encode(batches: Iterator) -> Iterator:
        import json as _json

        import pandas as pd

        for pdf in batches:
            out = []
            for block, order, rows, arch_payload, arch_sig in zip(
                pdf["block"], pdf["order"], pdf["rows"],
                pdf["_arch_payload"], pdf["_arch_sig"],
            ):
                if arch_payload is not None:
                    out.append({
                        "payload": bytes(arch_payload),
                        "signature": str(arch_sig),
                        "block": int(block), "order": int(order),
                    })
                    continue
                action = None
                bodies = []
                # multi-body mutations carry their body index as a numeric
                # log-id suffix ("mid", "mid-1", …) — sort NUMERICALLY; a
                # lexicographic sort would put body 10 before body 2
                rows = sorted(rows, key=_body_rank)
                for r in rows:
                    payload = _json.loads(r["payload"]) if r["payload"] else {}
                    if r["action"].startswith("create_"):
                        # thread the original owner: if this create ships
                        # as a Mint, its `sender` field preserves ownership
                        # across the re-attested envelope
                        payload = {**payload, "owner": r["sender"]}
                    doc_ids = (
                        _json.loads(r["doc_ids"]) if r["doc_ids"] else None
                    )
                    wire_action, body = log_row_to_wire(
                        r["action"], payload, r["db_addr"], r["col_name"],
                        doc_ids,
                    )
                    # a multi-body mutation is one action by construction;
                    # mixed-action rows at one (block, order) would be a
                    # torn log — refuse rather than mis-encode
                    if action is not None and wire_action != action:
                        raise ValueError(
                            f"mixed actions at block={block} order={order}: "
                            f"{action} vs {wire_action}"
                        )
                    action = wire_action
                    if ACTION_BODY_KIND[action] != body["kind"]:
                        raise ValueError(
                            f"body kind {body['kind']} under {action}"
                        )
                    bodies.append(body)
                raw = encode_mutation(action, bodies)
                # envelope nonces must be strictly increasing under the ONE
                # export key (origin nonces from different senders
                # interleave arbitrarily); (block ‖ order) is monotone in
                # log order and deterministic
                env_nonce = (int(block) << 32) | int(order)
                payload_bytes, sig = wrap_and_sign(raw, env_nonce, priv)
                out.append({
                    "payload": payload_bytes, "signature": sig,
                    "block": int(block), "order": int(order),
                })
            yield pd.DataFrame(
                out, columns=["payload", "signature", "block", "order"]
            )

    df = grouped.mapInPandas(_encode, EXPORT_SCHEMA)
    (
        df.repartition(F.expr("block div 10000"))
        .write.mode("overwrite")
        .option("compression", "gzip")
        .parquet(path)
    )
    return int(
        store.spark.read.parquet(path).count()
    )

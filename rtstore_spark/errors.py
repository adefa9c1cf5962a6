"""Error taxonomy mirroring the reference's ``DB3Error``.

Reference: /root/reference/src/error/src/lib.rs (database/collection
not-found/already-exists, ownership verification, bad nonce, query errors).
"""

from __future__ import annotations


class RTStoreError(Exception):
    """Base class for engine errors."""


class DatabaseNotFound(RTStoreError):
    pass


class DatabaseAlreadyExists(RTStoreError):
    pass


class CollectionNotFound(RTStoreError):
    pass


class CollectionAlreadyExists(RTStoreError):
    pass


class IndexAlreadyExists(RTStoreError):
    pass


class OwnerVerifyFailed(RTStoreError):
    """Update/delete attempted by a sender that does not own the document.

    Reference: db_store_v2.rs:819-846 (verify_doc_ids_ownership).
    """


class BadNonce(RTStoreError):
    """Nonce must be strictly increasing per sender (state_store.rs:171+)."""


class QueryError(RTStoreError):
    """JQL / StructuredQuery parse or compile failure."""


class InvalidMutation(RTStoreError):
    pass

"""StructuredQuery front-end — the reference's Firestore-style protobuf query
dialect, expressed here as plain dicts → Column pipeline.

Reference shape (db3_database_v2.proto:133-407, consumed by the legacy CLI via
``run_query(addr, StructuredQuery)`` — command.rs:464-489):

    {
      "collection_name": "col",
      "select": {"fields": [{"field_path": "city"}]},
      "where": {"field_filter": {"field": "city", "op": "EQUAL", "value": "x"}}
            or {"composite_filter": {"op": "AND", "filters": [...]}},
      "order_by": [{"field": "age", "direction": "DESC"}],   # proto TODO; we implement
      "limit": 10,
      "offset": 5,                                            # proto TODO; we implement
    }

Implemented ops (bson_util.rs:80-95): EQUAL, LESS_THAN, LESS_THAN_OR_EQUAL,
GREATER_THAN, GREATER_THAN_OR_EQUAL. NOT_EQUAL is *rejected* by the reference
(bson_util.rs:92-94) — we accept it as an extension, plus the declared-but-
commented-out F5 features (IN, NOT_IN, ARRAY_CONTAINS, order_by, offset,
unary null checks), which are free Column expressions in Spark.

Composite AND in the reference only allows equality children
(bson_util.rs:120-126); we allow any child op (strict superset).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rtstore_spark.errors import QueryError
from rtstore_spark.jql.compiler import FieldResolver

_OPS = {
    "EQUAL": lambda c, v: c == F.lit(v),
    "NOT_EQUAL": lambda c, v: c != F.lit(v),
    "LESS_THAN": lambda c, v: c < F.lit(v),
    "LESS_THAN_OR_EQUAL": lambda c, v: c <= F.lit(v),
    "GREATER_THAN": lambda c, v: c > F.lit(v),
    "GREATER_THAN_OR_EQUAL": lambda c, v: c >= F.lit(v),
    "IN": lambda c, v: c.isin(*v),
    "NOT_IN": lambda c, v: ~c.isin(*v),
    "ARRAY_CONTAINS": lambda c, v: F.array_contains(c, v),
    "IS_NULL": lambda c, v: c.isNull(),
    "IS_NOT_NULL": lambda c, v: c.isNotNull(),
}


def _compile_filter(node: dict, resolver: FieldResolver) -> Column:
    if "field_filter" in node:
        ff = node["field_filter"]
        op = ff.get("op", "EQUAL")
        if op not in _OPS:
            raise QueryError(f"StructuredQuery: unsupported op {op!r}")
        value = ff.get("value")
        col = resolver.resolve(ff["field"], value)
        return _OPS[op](col, value)
    if "composite_filter" in node:
        cf = node["composite_filter"]
        op = cf.get("op", "AND")
        if op not in ("AND", "OR"):
            raise QueryError(f"StructuredQuery: composite op {op!r}")
        children = [_compile_filter(f, resolver) for f in cf["filters"]]
        if not children:
            raise QueryError("StructuredQuery: empty composite filter")
        out = children[0]
        for c in children[1:]:
            out = (out & c) if op == "AND" else (out | c)
        return out
    raise QueryError(f"StructuredQuery: unknown filter node {sorted(node)}")


def run_structured_query(
    df: DataFrame, query: dict, doc_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Execute a StructuredQuery dict against a collection DataFrame."""
    resolver = FieldResolver(df, doc_col=doc_col)
    out = df
    if "where" in query and query["where"]:
        out = out.filter(_compile_filter(query["where"], resolver))

    order_by = query.get("order_by") or []
    if order_by:
        cols = []
        for ob in order_by:
            c = resolver.resolve(ob["field"])
            cols.append(c.desc() if ob.get("direction") == "DESC" else c)
        out = out.orderBy(*cols)
    elif (query.get("limit") or query.get("offset")) and order_col:
        # same newest-first default as JQL (SURVEY.md Q9)
        out = out.orderBy(F.col(order_col).desc())

    if query.get("offset"):
        out = out.offset(int(query["offset"]))
    if query.get("limit"):
        out = out.limit(int(query["limit"]))

    select = (query.get("select") or {}).get("fields") or []
    if select:
        fields = [f["field_path"] if isinstance(f, dict) else f for f in select]
        native = [f for f in fields if f.split(".")[0] in resolver.fields]
        if len(native) == len(fields):
            keep = [order_col] if order_col in resolver.fields and order_col not in fields else []
            out = out.select(*keep, *fields)
        else:
            struct_fields = [
                F.get_json_object(F.col(doc_col), "$." + f).alias(f.split(".")[-1])
                for f in fields
            ]
            cols = [F.to_json(F.struct(*struct_fields)).alias(doc_col)]
            if order_col in resolver.fields:
                cols.insert(0, F.col(order_col))
            out = out.select(*cols)
    return out

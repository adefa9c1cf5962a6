"""Property-based JQL correctness: random filter trees over the documents
table must agree with DuckDB evaluating the equivalent SQL predicate.

This is the 'JQL results ≡ duckdb oracle' property promised in SURVEY.md §7
Phase 3. Hypothesis drives the predicate shapes; each case compares matched
row-count AND the matched doc_id set.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from rtstore_spark.jql import jql_query
from rtstore_spark.tables import load_table

FIELDS = {
    "lang": ("str", ["en", "fr", "de", "es", "zh", "xx"]),
    "source": ("str", ["src0", "src1", "src2", "nope"]),
    "n_chars": ("int", [0, 100, 157, 250, 400, 1000]),
    "doc_id": ("int", [0, 5, 123, 499, 777]),
}

_OPS_STR = ["=", "!=", "~"]
_OPS_INT = ["=", "!=", ">", "<", ">=", "<="]


@st.composite
def conditions(draw):
    field = draw(st.sampled_from(sorted(FIELDS)))
    kind, values = FIELDS[field]
    value = draw(st.sampled_from(values))
    op = draw(st.sampled_from(_OPS_STR if kind == "str" else _OPS_INT))
    return field, op, value, kind


def cond_to_jql(c):
    field, op, value, kind = c
    if op == "~":
        return f'/[{field} ~ "{value[:2]}"]'
    v = f'"{value}"' if kind == "str" else str(value)
    return f"/[{field} {op} {v}]"


def cond_to_sql(c):
    field, op, value, kind = c
    if op == "~":
        return f"{field} LIKE '{value[:2]}%'"
    v = f"'{value}'" if kind == "str" else str(value)
    sqlop = {"=": "=", "!=": "!="}.get(op, op)
    return f"{field} {sqlop} {v}"


@pytest.fixture(scope="module")
def ctx(spark, sf_dir):
    df = load_table(spark, sf_dir, "documents")
    df.cache()
    df.count()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    yield df, con
    # cache substitution would otherwise replace FileScans in later modules
    # (breaking pushdown assertions) — scope the cache to this module
    df.unpersist()


@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    conds=st.lists(conditions(), min_size=1, max_size=3),
    combinators=st.lists(st.sampled_from(["and", "or"]), min_size=2, max_size=2),
    negate=st.booleans(),
)
def test_random_filter_trees_match_duckdb(ctx, conds, combinators, negate):
    df, con = ctx
    jql_parts = [cond_to_jql(c) for c in conds]
    sql_parts = [f"({cond_to_sql(c)})" for c in conds]
    jql = jql_parts[0]
    sql = sql_parts[0]
    for i, part in enumerate(jql_parts[1:]):
        op = combinators[i % len(combinators)]
        jql += f" {op} {part}"
        sql += f" {op.upper()} {sql_parts[i + 1]}"
    if negate and len(conds) == 1:
        jql = "not " + jql
        sql = f"NOT ({sql})"

    got = {r["doc_id"] for r in jql_query(df, jql).select("doc_id").collect()}
    want = {
        r[0] for r in con.execute(
            f"SELECT doc_id FROM documents WHERE {sql}"
        ).fetchall()
    }
    assert got == want, f"JQL {jql!r} vs SQL {sql!r}"


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    field=st.sampled_from(["doc_id", "n_chars"]),
    direction=st.sampled_from(["asc", "desc"]),
    skip=st.integers(min_value=0, max_value=30),
    limit=st.integers(min_value=1, max_value=20),
)
def test_order_skip_limit_pagination(ctx, field, direction, skip, limit):
    """Ordered pagination must equal SQL ORDER BY/OFFSET/LIMIT (with doc_id
    tiebreak for determinism)."""
    df, con = ctx
    jql = f"/* | {direction} /{field} | {direction} /doc_id | skip {skip} | limit {limit}"
    got = [r["doc_id"] for r in jql_query(df, jql).select("doc_id").collect()]
    sqldir = direction.upper()
    want = [
        r[0] for r in con.execute(
            f"SELECT doc_id FROM documents ORDER BY {field} {sqldir}, doc_id {sqldir}"
            f" LIMIT {limit} OFFSET {skip}"
        ).fetchall()
    ]
    assert got == want


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pivot=st.integers(min_value=2**53 - 2, max_value=2**63 - 4),
    op=st.sampled_from(["=", "!=", ">", "<", ">=", "<="]),
    offset=st.integers(min_value=-2, max_value=2),
)
def test_int64_json_filters_exact(spark, pivot, op, offset):
    """JSON-mode int filters keep full int64 precision: values adjacent to
    the literal (±1 around arbitrary >2^53 pivots) must compare exactly —
    the reference allows full-int64 filter values (bson_util.rs:47-60), and
    a double cast would collapse these neighbors."""
    vals = [pivot - 1, pivot, pivot + 1, pivot + 2]
    docs = spark.createDataFrame(
        [(i, f'{{"v": {v}}}') for i, v in enumerate(vals)],
        "doc_id long, doc string",
    )
    lit = pivot + offset
    got = sorted(
        r["doc_id"]
        for r in jql_query(docs, f"/[v {op} {lit}]", doc_col="doc").collect()
    )
    pyop = {
        "=": lambda a, b: a == b, "!=": lambda a, b: a != b,
        ">": lambda a, b: a > b, "<": lambda a, b: a < b,
        ">=": lambda a, b: a >= b, "<=": lambda a, b: a <= b,
    }[op]
    want = [i for i, v in enumerate(vals) if pyop(v, lit)]
    assert got == want, f"v {op} {lit} over {vals}"


_json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.text(alphabet="abcxyz", max_size=6),
)
_json_objects = st.recursive(
    st.dictionaries(
        st.text(alphabet="abcde", min_size=1, max_size=3), _json_scalars, max_size=4
    ),
    lambda inner: st.dictionaries(
        st.text(alphabet="abcde", min_size=1, max_size=3),
        st.one_of(_json_scalars, inner),
        max_size=4,
    ),
    max_leaves=12,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(doc=_json_objects, p1=_json_objects, p2=_json_objects)
def test_apply_collector_matches_rfc7386(spark, doc, p1, p2):
    """`| apply {p1} | apply {p2}` over a random doc equals the pure-Python
    RFC 7386 merge applied sequentially — pinning both the patch
    composition rule and the Arrow UDF against the spec implementation."""
    import json

    from rtstore_spark.functions.merge_patch import merge_patch

    df = spark.createDataFrame(
        [(1, json.dumps(doc, sort_keys=True))], "doc_id long, doc string"
    )
    q = f"/* | apply {json.dumps(p1)} | apply {json.dumps(p2)}"
    out = jql_query(df, q, doc_col="doc", order_col="doc_id").collect()
    got = json.loads(out[0]["doc"])
    want = merge_patch(merge_patch(doc, p1), p2)
    assert got == want

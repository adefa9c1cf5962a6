"""JQL engine tests.

The fixtures and expectations mirror the reference's acceptance suite:
sdk/tests/query.test.ts (count / projection / limit), client_v2.test.ts:185-275
(equality filter, :age placeholder, implicit newest-first limit 1), and the
Rust unit tests in doc_store.rs:315-488 (and-combinators, placeholders,
projection).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row

from rtstore_spark.jql import jql_query, parse_jql
from rtstore_spark.errors import QueryError


@pytest.fixture(scope="module")
def people(spark):
    # Mirrors the docs used across the reference's SDK tests: city/age docs
    # inserted in order (beijing then beijing2 — client_v2.test.ts:213-239).
    rows = [
        Row(doc_id=1, owner="0xaa", doc=json.dumps({"city": "beijing", "age": 10})),
        Row(doc_id=2, owner="0xaa", doc=json.dumps({"city": "beijing2", "age": 20})),
        Row(doc_id=3, owner="0xbb", doc=json.dumps(
            {"city": "shanghai", "age": 30,
             "pets": [{"kind": "dog", "likes": ["ball"]}, {"kind": "cat"}]})),
    ]
    return spark.createDataFrame(rows)


def docs(df):
    return [json.loads(r["doc"]) for r in df.collect()]


class TestParser:
    def test_match_all(self):
        q = parse_jql("/*")
        assert q.clauses[0].match_all

    def test_count_apply(self):
        q = parse_jql("/* | count")
        assert q.applies[0].kind == "count"

    def test_conjunctive_two_clauses(self):
        from rtstore_spark.jql.parser import BoolExpr

        q = parse_jql('/[f1="f1"] and /[f2="f2"]')
        assert len(q.clauses) == 2
        assert isinstance(q.root, BoolExpr) and q.root.op == "and"

    def test_parenthesized_grouping(self):
        from rtstore_spark.jql.parser import BoolExpr

        q = parse_jql('/[a=1] and (/[b=2] or /[c=3])')
        assert isinstance(q.root, BoolExpr) and q.root.op == "and"
        assert isinstance(q.root.items[1], BoolExpr) and q.root.items[1].op == "or"

    def test_in_bracket_and_with_placeholder(self):
        q = parse_jql("/[f1 eq ? and test eq 'v1']")
        c = q.clauses[0]
        assert len(c.conds) == 2 and c.cond_ops == ["and"]
        assert c.conds[0].value.index == 0
        assert c.conds[1].value == "v1"

    def test_errors(self):
        for bad in ["", "/[", "/[f1 ??? 1]", "/* | limit x"]:
            with pytest.raises(QueryError):
                parse_jql(bad)


class TestDocQueries:
    """JSON-document mode (the reference's actual storage model)."""

    def test_full_scan(self, people):
        out = jql_query(people, "/*", doc_col="doc", order_col="doc_id")
        assert out.count() == 3

    def test_equality_filter_bareword(self, people):
        out = jql_query(people, "/[city = beijing]", doc_col="doc", order_col="doc_id")
        assert docs(out) == [{"city": "beijing", "age": 10}]

    def test_numeric_filter(self, people):
        out = jql_query(people, "/[age > 15]", doc_col="doc", order_col="doc_id")
        assert {d["city"] for d in docs(out)} == {"beijing2", "shanghai"}

    def test_named_placeholder(self, people):
        out = jql_query(
            people, "/[age = :age]", params={"age": 30}, doc_col="doc",
            order_col="doc_id",
        )
        assert docs(out)[0]["city"] == "shanghai"

    def test_positional_placeholder_in_bracket_and(self, people):
        out = jql_query(
            people, "/[city eq ? and age eq 10]", params=["beijing"],
            doc_col="doc", order_col="doc_id",
        )
        assert out.count() == 1

    def test_conjunctive_clauses(self, people):
        out = jql_query(
            people, "/[city = beijing] and /[age = 10]",
            doc_col="doc", order_col="doc_id",
        )
        assert out.count() == 1

    def test_or_clauses(self, people):
        out = jql_query(
            people, "/[city = beijing] or /[city = shanghai]",
            doc_col="doc", order_col="doc_id",
        )
        assert out.count() == 2

    def test_count(self, people):
        out = jql_query(people, "/* | count", doc_col="doc", order_col="doc_id")
        assert out.collect()[0]["count"] == 3

    def test_limit_newest_first(self, people):
        # client_v2.test.ts:213-239 — `/* | limit 1` returns the LAST insert.
        out = jql_query(people, "/* | limit 1", doc_col="doc", order_col="doc_id")
        rows = out.collect()
        assert len(rows) == 1 and json.loads(rows[0]["doc"])["city"] == "shanghai"

    def test_projection(self, people):
        out = jql_query(people, "/* | /{city}", doc_col="doc", order_col="doc_id")
        assert all(set(d.keys()) == {"city"} for d in docs(out))
        assert "doc_id" in out.columns

    def test_skip_and_explicit_order(self, people):
        out = jql_query(
            people, "/* | asc /age | skip 1 | limit 1",
            doc_col="doc", order_col="doc_id",
        )
        assert docs(out)[0]["age"] == 20

    def test_nested_array_filter(self, people):
        out = jql_query(people, "/pets/[kind = dog]", doc_col="doc", order_col="doc_id")
        assert docs(out)[0]["city"] == "shanghai"

    def test_apply_patch(self, people):
        """EJDB2 `| apply {json}`: merge-patch matched docs in the result
        set (read-side; storage untouched)."""
        out = jql_query(
            people, '/[city = beijing] | apply {"vip": true, "age": 11}',
            doc_col="doc", order_col="doc_id",
        )
        assert docs(out) == [{"city": "beijing", "age": 11, "vip": True}]

    def test_apply_null_deletes_and_nested_merges(self, people):
        out = jql_query(
            people,
            '/[city = shanghai] | apply {"pets": null, "meta": {"ok": 1}}',
            doc_col="doc", order_col="doc_id",
        )
        d = docs(out)[0]
        assert "pets" not in d and d["meta"] == {"ok": 1}

    def test_apply_composes_and_pipelines(self, people):
        out = jql_query(
            people,
            '/* | apply {"a": 1, "b": 1} | asc /age | limit 2 | apply {"b": 2}',
            doc_col="doc", order_col="doc_id",
        )
        got = [{k: d[k] for k in ("city", "a", "b")} for d in docs(out)]
        assert got == [
            {"city": "beijing", "a": 1, "b": 2},
            {"city": "beijing2", "a": 1, "b": 2},
        ]

    def test_apply_text_inside_string_literal_is_not_a_collector(self, people):
        q = parse_jql("/[city = 'x | apply y'] | limit 1")
        assert [a.kind for a in q.applies] == ["limit"]
        # and a real apply AFTER such a literal still parses
        q2 = parse_jql('/[city = "a | apply b"] | apply {"t": 1}')
        assert [a.kind for a in q2.applies] == ["apply"]
        assert q2.applies[0].args[0] == {"t": 1}

    def test_apply_errors(self, people):
        with pytest.raises(QueryError, match="JSON object"):
            parse_jql("/* | apply [1, 2]")
        with pytest.raises(QueryError):
            parse_jql("/* | apply notjson")

    def test_not_clause(self, people):
        out = jql_query(people, "not /[city = beijing]", doc_col="doc", order_col="doc_id")
        assert out.count() == 2

    def test_paren_grouping_semantics(self, people):
        # a and (b or c) vs (a and b) or c differ on this data
        grouped = jql_query(
            people, "/[age = 10] and (/[city = beijing] or /[city = shanghai])",
            doc_col="doc",
        )
        assert {d["city"] for d in docs(grouped)} == {"beijing"}
        flat = jql_query(
            people, "/[age = 10] and /[city = beijing] or /[city = shanghai]",
            doc_col="doc",
        )
        assert {d["city"] for d in docs(flat)} == {"beijing", "shanghai"}

    def test_not_group(self, people):
        out = jql_query(
            people, "not (/[city = beijing] or /[city = beijing2])", doc_col="doc"
        )
        assert {d["city"] for d in docs(out)} == {"shanghai"}

    def test_in_operator(self, people):
        out = jql_query(
            people, '/[city in ["beijing", "beijing2"]]', doc_col="doc",
            order_col="doc_id",
        )
        assert out.count() == 2

    def test_regex_and_prefix(self, people):
        assert jql_query(people, '/[city re "beijing.*"]', doc_col="doc").count() == 2
        assert jql_query(people, "/[city ~ bei]", doc_col="doc").count() == 2


class TestNativeColumns:
    """JQL over a typed (non-JSON) table — fields resolve to real columns so
    filters push down to the parquet scan."""

    def test_native_filter_pushdown(self, spark, sf_dir):
        df = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = jql_query(df, "/[lang = en] | count", order_col="doc_id")
        expected = df.filter(df.lang == "en").count()
        assert out.collect()[0]["count"] == expected
        plan = jql_query(df, "/[lang = en]", order_col="doc_id")._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)" in plan

    def test_native_json_subfield(self, spark, sf_dir):
        from rtstore_spark.tables import load_table

        df = load_table(spark, sf_dir, "events")
        out = jql_query(df, "/[props.k > 50] | count")
        assert out.collect()[0]["count"] > 0

    def test_native_apply_scalar_and_delete(self, spark, sf_dir):
        df = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = jql_query(
            df, '/[lang = en] | apply {"tier": "gold", "text": null} | limit 5',
            order_col="doc_id",
        )
        rows = out.collect()
        assert "text" not in out.columns
        assert all(r["tier"] == "gold" for r in rows)
        # nested patches need a JSON doc column
        with pytest.raises(QueryError, match="document mode"):
            jql_query(df, '/* | apply {"m": {"x": 1}}', order_col="doc_id")


class TestCompilerEdgeSemantics:
    """Regression pins for review findings: single-element nested arrays,
    native-JSON-column array paths, two-valued negation over missing
    fields, numeric ordering of JSON fields, and mixed projections."""

    def test_single_element_nested_array_matches(self, spark):
        df = spark.createDataFrame(
            [
                Row(doc_id=1, doc=json.dumps({"pets": [{"kind": "dog"}]})),
                Row(doc_id=2, doc=json.dumps(
                    {"pets": [{"kind": "cat"}, {"kind": "dog"}]})),
                Row(doc_id=3, doc=json.dumps({"pets": [{"kind": "fish"}]})),
            ]
        )
        out = jql_query(df, "/pets/[kind = dog]", doc_col="doc", order_col="doc_id")
        # get_json_object returns the BARE element for one match — both the
        # single-pet and the two-pet doc must match
        assert sorted(r["doc_id"] for r in out.collect()) == [1, 2]

    def test_array_path_through_native_json_column(self, spark):
        df = spark.createDataFrame(
            [
                Row(doc_id=1, profile=json.dumps(
                    {"pets": [{"kind": "dog"}, {"kind": "cat"}]})),
                Row(doc_id=2, profile=json.dumps({"pets": [{"kind": "cat"}]})),
            ]
        )
        out = jql_query(df, "/profile/pets/[kind = dog]", order_col="doc_id")
        # the JSON inside 'profile' has top-level 'pets' — the path must
        # not repeat the column name
        assert [r["doc_id"] for r in out.collect()] == [1]

    def test_negation_keeps_docs_missing_the_field(self, spark):
        df = spark.createDataFrame(
            [
                Row(doc_id=1, doc=json.dumps({"city": "beijing"})),
                Row(doc_id=2, doc=json.dumps({"name": "nofield"})),
            ]
        )
        # clause negate and boolean NOT both: a doc without 'city' does not
        # satisfy city=beijing, so it must be KEPT (SQL ~NULL would drop it)
        for q in ("not /[city = beijing]",):
            got = sorted(
                r["doc_id"]
                for r in jql_query(df, q, doc_col="doc", order_col="doc_id").collect()
            )
            assert got == [2], q

    def test_asc_orders_json_numbers_numerically(self, spark):
        df = spark.createDataFrame(
            [
                Row(doc_id=1, doc=json.dumps({"age": 9})),
                Row(doc_id=2, doc=json.dumps({"age": 10})),
            ]
        )
        out = jql_query(
            df, "/* | asc /age | limit 1", doc_col="doc", order_col="doc_id"
        )
        # lexicographic '10' < '9' would return age 10
        assert [r["doc_id"] for r in out.collect()] == [1]
        out_d = jql_query(
            df, "/* | desc /age | limit 1", doc_col="doc", order_col="doc_id"
        )
        assert [r["doc_id"] for r in out_d.collect()] == [2]

    def test_projection_mixing_native_and_doc_fields(self, spark):
        df = spark.createDataFrame(
            [Row(doc_id=1, owner="0xaa", doc=json.dumps({"name": "x"}))]
        )
        out = jql_query(
            df, "/* | /{owner, name}", doc_col="doc", order_col="doc_id"
        ).collect()[0]
        rebuilt = json.loads(out["doc"])
        # 'owner' is a native column — extracting it from doc would null it
        assert rebuilt == {"owner": "0xaa", "name": "x"}

"""Client console (rtstore_spark/console.py) against a LIVE node.

Mirrors the reference's `db3 console` acceptance flow
(src/cmd/src/command.rs:43-160): init a keystore, create a database and
collection, add/query/update/delete documents — every mutation goes
through the REAL custody path (protobuf mutation → EIP-712 TypedData
envelope → SendMutation over HTTP; the node recovers the signer)."""

from __future__ import annotations

import json

import pytest

from rtstore_spark.console import (
    Console,
    ConsoleError,
    render_table,
    run_command,
)
from rtstore_spark.service import NodeServer, NodeService
from rtstore_spark.store.docstore import DocStore
from rtstore_spark.store.ingest import Ingest

PRIV = 0x1F1E1D1C1B1A191817161514131211100F0E0D0C0B0A09080706050403020101


@pytest.fixture(scope="module")
def node_url(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("console-node")
    store = DocStore(spark, str(root / "node"))
    srv = NodeServer(NodeService(store, Ingest(store))).start()
    yield f"http://127.0.0.1:{srv.port}"
    srv.stop()


@pytest.fixture(scope="module")
def console(node_url, tmp_path_factory):
    ks = tmp_path_factory.mktemp("console-keys") / "key.json"
    c = Console(node_url, str(ks))
    c.init_key(PRIV)
    return c


class TestKeystore:
    def test_init_refuses_overwrite(self, console):
        with pytest.raises(ConsoleError, match="already exists"):
            console.init_key()

    def test_show_key_address(self, console):
        titles, rows = console.show_key()
        assert titles == ["name", "value"]
        addr = rows[0][1]
        assert addr.startswith("0x") and len(addr) == 42

    def test_missing_keystore_is_loud(self, node_url, tmp_path):
        c = Console(node_url, str(tmp_path / "nope.json"))
        with pytest.raises(ConsoleError, match="run `init` first"):
            c.show_key()


class TestLifecycle:
    """One scripted session, state threaded through class attrs (module
    fixture keeps the node; ordering matters like a real session)."""

    db: str = ""

    def test_01_new_db(self, console):
        titles, rows = console.new_db("console acceptance")
        assert titles == ["database address", "mutation id"]
        type(self).db = rows[0][0]
        assert self.db.startswith("0x")

    def test_02_new_collection_and_show(self, console):
        console.new_collection(self.db, "books")
        titles, rows = console.show_collection(self.db)
        assert rows == [["books", 0]]

    def test_03_new_doc(self, console):
        _, rows = console.new_doc(
            self.db, "books",
            json.dumps({"title": "dune", "year": 1965}),
            json.dumps({"title": "hyperion", "year": 1989}),
        )
        ids = rows[0][1].split(", ")
        assert len(ids) == 2

    def test_04_show_doc_filter(self, console):
        _, rows = console.show_doc(
            self.db, "books", json.dumps({"year": {"$gt": 1980}})
        )
        assert len(rows) == 1
        assert json.loads(rows[0][2])["title"] == "hyperion"

    def test_05_get_update_get(self, console):
        _, rows = console.show_doc(self.db, "books", json.dumps({"title": "dune"}))
        doc_id = rows[0][0]
        _, got = console.get_doc(self.db, "books", str(doc_id))
        assert json.loads(got[0][2])["year"] == 1965
        console.update_doc(
            self.db, "books", str(doc_id), json.dumps({"year": 1966})
        )
        _, got = console.get_doc(self.db, "books", str(doc_id))
        after = json.loads(got[0][2])
        assert after["year"] == 1966 and after["title"] == "dune"

    def test_06_del_doc(self, console):
        _, rows = console.show_doc(self.db, "books")
        all_ids = [str(r[0]) for r in rows]
        console.del_doc(self.db, "books", all_ids[0])
        _, rows = console.show_doc(self.db, "books")
        assert len(rows) == len(all_ids) - 1

    def test_07_my_db_and_show_db(self, console):
        _, rows = console.my_db()
        assert any(r[0] == self.db for r in rows)
        _, rows = console.show_db(self.db)
        assert rows[0][0] == self.db and "books" in rows[0][3]

    def test_08_show_account_and_state(self, console):
        _, rows = console.show_account()
        facts = {r[0]: r[1] for r in rows}
        assert facts["databases"] >= 1 and facts["next nonce"] >= 2
        _, rows = console.show_state()
        facts = {r[0]: r[1] for r in rows}
        assert facts["mutation"] >= 4

    def test_09_show_doc_limit_and_raw_jql(self, console):
        console.new_doc(
            self.db, "books", *(json.dumps({"n": i}) for i in range(5))
        )
        _, rows = console.show_doc(self.db, "books", "", "2")
        assert len(rows) == 2
        _, rows = console.show_doc(self.db, "books", "/[n >= 3]")
        assert {json.loads(r[2])["n"] for r in rows} == {3, 4}


class TestFilterCompilation:
    """Regression pins for the round-9 review findings: every shape the
    filter compiler claims to support must produce VALID JQL and the
    right row set against the live node."""

    def test_multi_field_filter_is_one_and_clause(self, console):
        db = TestLifecycle.db
        console.new_doc(
            db, "books",
            json.dumps({"title": "solaris", "year": 1961}),
            json.dumps({"title": "solaris", "year": 2002}),
        )
        _, rows = console.show_doc(
            db, "books", json.dumps({"title": "solaris", "year": 1961})
        )
        assert len(rows) == 1
        assert json.loads(rows[0][2])["year"] == 1961

    def test_bounded_range_two_operators_one_field(self, console):
        db = TestLifecycle.db
        _, rows = console.show_doc(
            db, "books",
            json.dumps({"year": {"$gte": 1960, "$lte": 1970}}),
        )
        years = {json.loads(r[2])["year"] for r in rows}
        assert 1961 in years  # solaris, added above
        assert all(1960 <= y <= 1970 for y in years)

    def test_empty_filter_matches_all(self, console):
        db = TestLifecycle.db
        _, all_rows = console.show_doc(db, "books")
        _, empty_filter = console.show_doc(db, "books", "{}")
        assert len(empty_filter) == len(all_rows) > 0

    def test_unknown_operator_is_clear_client_side_error(self, console):
        """An unsupported $op must fail HERE with the supported set named
        — passed through verbatim it would compile to invalid JQL and
        surface as an opaque server-side parse error."""
        import pytest

        from rtstore_spark.console import ConsoleError

        db = TestLifecycle.db
        with pytest.raises(ConsoleError, match=r"\$in"):
            console.show_doc(
                db, "books", json.dumps({"year": {"$in": [1961, 2002]}})
            )

    def test_non_ascii_value_round_trips(self, console):
        db = TestLifecycle.db
        console.new_doc(db, "books", json.dumps({"title": "café"}))
        _, rows = console.show_doc(db, "books", json.dumps({"title": "café"}))
        assert len(rows) == 1
        assert json.loads(rows[0][2])["title"] == "café"

    def test_quote_and_backslash_escape(self, console):
        db = TestLifecycle.db
        tricky = 'a "b" \\ c'
        console.new_doc(db, "books", json.dumps({"title": tricky}))
        _, rows = console.show_doc(db, "books", json.dumps({"title": tricky}))
        assert len(rows) == 1 and json.loads(rows[0][2])["title"] == tricky

    def test_show_doc_walks_past_node_page_cap(self, console):
        """Without an explicit LIMIT the console must return EVERY
        match (page walk), not silently stop at the node's 200-row
        page; an explicit LIMIT requests exactly that page size."""
        db = TestLifecycle.db
        console.new_collection(db, "bulk")
        console.new_doc(
            db, "bulk", *(json.dumps({"i": i}) for i in range(230))
        )
        _, rows = console.show_doc(db, "bulk")
        assert len(rows) == 230  # > the 200-row default page cap
        _, rows = console.show_doc(db, "bulk", "", "210")
        assert len(rows) == 210


class TestCommandDispatch:
    def test_render_table_alignment(self):
        out = render_table(["a", "bb"], [["x", 1], ["yyy", 22]])
        lines = out.splitlines()
        assert lines[0].rstrip() == " a   | bb"
        assert lines[2].startswith(" x   | 1")

    def test_unknown_and_arity_errors(self, console):
        with pytest.raises(ConsoleError, match="unknown command"):
            run_command(console, ["frobnicate"])
        with pytest.raises(ConsoleError, match="expected"):
            run_command(console, ["show-db"])

    def test_help_lists_commands(self, console):
        out = run_command(console, ["help"])
        assert "new-db" in out and "show-doc" in out

    def test_one_shot_through_dispatch(self, console):
        out = run_command(console, ["show-account"])
        assert "db3 address" in out

    def test_malformed_input_is_command_error_not_crash(self, console):
        db = TestLifecycle.db
        with pytest.raises(ConsoleError, match="get-doc"):
            run_command(console, ["get-doc", db, "books", "not-an-int"])
        with pytest.raises(ConsoleError, match="new-doc"):
            run_command(console, ["new-doc", db, "books", "not json {{"])

    def test_non_object_json_filter_is_usage_error_not_match_all(
        self, console
    ):
        """`show-doc DB COL 10` (a limit in the filter slot) must error,
        not silently walk and print the whole collection."""
        db = TestLifecycle.db
        for bad in ("10", '["a"]', "true", '"text"'):
            with pytest.raises(ConsoleError, match="filter must be"):
                console.show_doc(db, "books", bad)

    def test_show_state_reports_has_inited(self, spark, tmp_path):
        from rtstore_spark.system import SystemStore

        store = DocStore(spark, str(tmp_path / "sysnode"))
        system = SystemStore(
            spark, str(tmp_path / "sysnode"), admin_addr="0x" + "aa" * 20
        )
        srv = NodeServer(NodeService(store, Ingest(store), system=system)).start()
        try:
            c = Console(f"http://127.0.0.1:{srv.port}",
                        str(tmp_path / "k.json"))
            _, rows = c.show_state()
            facts = {r[0]: r[1] for r in rows}
            assert "has inited" in facts  # real key, not the v1 'has_key'
        finally:
            srv.stop()

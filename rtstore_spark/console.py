"""Interactive client console — the reference's ``db3 console`` / CLI
client surface (src/cmd/src/command.rs:43-160) over a RUNNING node's
JSON front.

Commands mirror the reference's clap names one-for-one:

  init            generate + persist a local secp256k1 keypair
  show-key        print the stored key's address
  new-db [desc]   create a document database (signed mutation)
  my-db           databases owned by this key
  show-db ADDR    one database + its collections
  new-collection ADDR NAME
  show-collection ADDR
  new-doc ADDR COL JSON [JSON ...]
  update-doc ADDR COL ID JSON
  del-doc ADDR COL ID [ID ...]
  get-doc ADDR COL ID
  show-doc ADDR COL [FILTER_JSON] [LIMIT]
  show-account [ADDR]
  show-state

Transport and custody are the REAL client path, not a shortcut: every
mutation is protobuf-encoded (wire/schemas.encode_mutation), wrapped in
the EIP-712 TypedData envelope the reference SDK produces
(wire/envelope.wrap_and_sign — db3_account.ts:104-121) and POSTed to
``/v1/storage/SendMutation``; the node recovers the signer from the
envelope, trusting nothing outside it. Nonces come from GetNonce, which
returns the NEXT nonce and is signed verbatim (client_v2.ts:214-218).

Deviations from the reference, stated:
- ``get-doc`` addresses a document as (db, collection, id) — the v2
  node's GetDoc shape — instead of the v1 global document id string.
- ``show-account`` has no bills/credits/session columns: those belong
  to the retired v1 billing plane (command.rs:292-309 reads them from
  structs the v2 node never populates); the v2 account facts shown are
  address, next nonce, database count.
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request

KEYSTORE_DEFAULT = os.path.expanduser("~/.rtstore_spark/key.json")


def render_table(titles: list[str], rows: list[list]) -> str:
    """Aligned plain-text table — the shape of the reference console's
    prettytable FORMAT_NO_BORDER_LINE_SEPARATOR output."""
    cells = [[str(c) for c in r] for r in rows]
    widths = [
        max(len(t), *(len(r[i]) for r in cells)) if cells else len(t)
        for i, t in enumerate(titles)
    ]
    def line(vals):
        return " " + " | ".join(v.ljust(w) for v, w in zip(vals, widths))
    sep = "-" * (sum(widths) + 3 * len(widths))
    return "\n".join([line(titles), sep, *(line(r) for r in cells)])


class ConsoleError(Exception):
    pass


class Console:
    """One node connection + one keystore; each public method is a
    console command returning (titles, rows) for ``render_table``."""

    def __init__(self, url: str, keystore: str = KEYSTORE_DEFAULT):
        self.url = url.rstrip("/")
        self.keystore = keystore
        self._priv: int | None = None

    # ------------------------------------------------------------ key

    def init_key(self, priv: int | None = None) -> tuple[list, list]:
        """Generate (or import) and persist the keypair. Refuses to
        overwrite an existing keystore — keys custody mutations; a
        silent replacement would strand every database the old key
        owns."""
        from rtstore_spark.crypto.secp256k1 import priv_to_address

        if os.path.exists(self.keystore):
            raise ConsoleError(
                f"keystore already exists at {self.keystore} — remove it "
                "explicitly to generate a new key"
            )
        if priv is None:
            import secrets

            priv = int.from_bytes(secrets.token_bytes(32), "big")
        addr = priv_to_address(priv)
        os.makedirs(os.path.dirname(self.keystore) or ".", exist_ok=True)
        fd = os.open(
            self.keystore, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o600
        )
        with os.fdopen(fd, "w") as f:
            json.dump({"private_key": hex(priv), "address": addr}, f)
        return ["name", "value"], [["address", addr]]

    def _key(self) -> tuple[int, str]:
        if self._priv is None:
            try:
                with open(self.keystore) as f:
                    ks = json.load(f)
            except FileNotFoundError:
                raise ConsoleError(
                    f"no keystore at {self.keystore} — run `init` first"
                ) from None
            self._priv = int(ks["private_key"], 16)
        from rtstore_spark.crypto.secp256k1 import priv_to_address

        return self._priv, priv_to_address(self._priv)

    def show_key(self) -> tuple[list, list]:
        _, addr = self._key()
        return ["name", "value"], [["address", addr]]

    # ------------------------------------------------------ transport

    def _post(self, route: str, body: dict) -> dict:
        req = urllib.request.Request(
            f"{self.url}/v1/{route}",
            data=json.dumps(body).encode(),
            headers={"content-type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=120) as resp:
                out = json.loads(resp.read().decode())
        except urllib.error.HTTPError as e:
            detail = e.read().decode(errors="replace")
            raise ConsoleError(f"{route}: HTTP {e.code} {detail}") from None
        except OSError as e:
            raise ConsoleError(f"{route}: cannot reach {self.url}: {e}") from None
        return out

    def _send(self, action: str, bodies: list[dict]) -> dict:
        from rtstore_spark.wire.envelope import wrap_and_sign
        from rtstore_spark.wire.schemas import encode_mutation

        priv, addr = self._key()
        nonce = self._post("storage/GetNonce", {"address": addr})["nonce"]
        payload, sig = wrap_and_sign(
            encode_mutation(action, bodies), nonce, priv
        )
        out = self._post("storage/SendMutation", {
            "payload": "0x" + payload.hex(), "signature": sig,
        })
        if out.get("code", 0) != 0:
            raise ConsoleError(f"{action} rejected: {out.get('msg')}")
        return out

    @staticmethod
    def _items(out: dict) -> dict:
        return {i["key"]: i["value"] for i in out.get("items", [])}

    # ------------------------------------------------------- commands

    def new_db(self, desc: str = "") -> tuple[list, list]:
        out = self._send("CreateDocumentDB", [{
            "db_address": None, "kind": "doc_database_mutation",
            "body": {"db_desc": desc},
        }])
        return ["database address", "mutation id"], [
            [self._items(out).get("db_addr", "?"), out.get("id", "?")]
        ]

    def my_db(self) -> tuple[list, list]:
        _, addr = self._key()
        out = self._post("storage/GetDatabaseOfOwner", {"owner": addr})
        rows = [
            [d["db_addr"], d.get("db_type", "doc"), d.get("desc") or "-"]
            for d in out.get("databases", [])
        ]
        return ["database address", "type", "description"], rows

    def show_db(self, addr: str) -> tuple[list, list]:
        out = self._post("storage/GetDatabase", {"addr": addr})
        db = out.get("database")
        if not db:
            raise ConsoleError(f"no database at {addr}")
        cols = self._post(
            "storage/GetCollectionOfDatabase", {"db_addr": addr}
        ).get("collections", [])
        rows = [[addr, db.get("desc") or "-", db.get("sender", "?"),
                 ", ".join(c.get("col_name", "?") for c in cols) or "-"]]
        return ["database address", "description", "owner", "collections"], rows

    def new_collection(self, addr: str, name: str) -> tuple[list, list]:
        out = self._send("AddCollection", [{
            "db_address": addr, "kind": "collection_mutation",
            "body": {"collection_name": name},
        }])
        return ["mutation id"], [[out.get("id", "?")]]

    def show_collection(self, addr: str) -> tuple[list, list]:
        cols = self._post(
            "storage/GetCollectionOfDatabase", {"db_addr": addr}
        ).get("collections", [])
        rows = []
        for c in cols:
            idx = c.get("index_fields")
            n_idx = len(json.loads(idx)) if idx else 0
            rows.append([c.get("col_name", "?"), n_idx])
        return ["name", "index count"], rows

    def new_doc(self, addr: str, col: str, *docs: str) -> tuple[list, list]:
        from rtstore_spark.wire.bsonlite import bson_encode

        encoded = [bson_encode(json.loads(d)) for d in docs]
        out = self._send("AddDocument", [{
            "db_address": addr, "kind": "document_mutation",
            "body": {"collection_name": col, "documents": encoded},
        }])
        ids = [
            i["value"] for i in out.get("items", []) if i["key"] == "document"
        ]
        return ["mutation id", "document ids"], [
            [out.get("id", "?"), ", ".join(str(i) for i in ids) or "?"]
        ]

    def update_doc(
        self, addr: str, col: str, doc_id: str, patch: str
    ) -> tuple[list, list]:
        from rtstore_spark.wire.bsonlite import bson_encode

        out = self._send("UpdateDocument", [{
            "db_address": addr, "kind": "document_mutation",
            "body": {
                "collection_name": col,
                "documents": [bson_encode(json.loads(patch))],
                "ids": [int(doc_id)],
            },
        }])
        return ["mutation id"], [[out.get("id", "?")]]

    def del_doc(self, addr: str, col: str, *ids: str) -> tuple[list, list]:
        out = self._send("DeleteDocument", [{
            "db_address": addr, "kind": "document_mutation",
            "body": {
                "collection_name": col,
                "ids": [int(i) for i in ids],
            },
        }])
        return ["mutation id"], [[out.get("id", "?")]]

    def get_doc(self, addr: str, col: str, doc_id: str) -> tuple[list, list]:
        out = self._post("indexer/GetDoc", {
            "db_addr": addr, "col_name": col, "id": int(doc_id),
        })
        doc = out.get("document")
        if not doc:
            raise ConsoleError("no document with target id")
        return ["id", "owner", "document"], [
            [doc["id"], doc.get("owner", "?"), json.dumps(doc.get("doc"))]
        ]

    @staticmethod
    def _jql_literal(v) -> str:
        """A value as a JQL literal. Strings escape only what the JQL
        unescape (parser.py:179, ``\\x → x``) round-trips — backslash
        and the quote — WITHOUT json.dumps's \\uXXXX ASCII escapes,
        which the parser would collapse to a corrupted 'uXXXX'."""
        if isinstance(v, str):
            return '"' + v.replace("\\", "\\\\").replace('"', '\\"') + '"'
        return json.dumps(v)

    def _compile_filter(self, flt: str) -> str:
        """{"field": value} / {"field": {"$op": v, ...}} → one JQL
        clause; {} matches all; non-JSON input is raw JQL verbatim."""
        try:
            obj = json.loads(flt)
        except ValueError:
            return flt  # raw JQL escape hatch
        if not isinstance(obj, dict):
            # `show-doc DB COL 10` (limit in the filter slot) or a JSON
            # array is a usage error — treating it as match-all would
            # silently print the whole collection
            raise ConsoleError(
                f"filter must be a JSON object or raw JQL, got {flt!r}"
            )
        if not obj:
            return "/*"
        ops = {"$eq": "=", "$gt": ">", "$gte": ">=", "$lt": "<",
               "$lte": "<=", "$ne": "!="}
        conds = []
        for k, v in obj.items():
            if isinstance(v, dict):
                # several operators on one field = a bounded range —
                # each becomes its own AND-ed condition
                for op, val in v.items():
                    if op not in ops:
                        # an unknown $op passed through verbatim would
                        # compile to invalid JQL and surface as an
                        # opaque server-side parse error; fail here
                        raise ConsoleError(
                            f"unsupported filter operator {op!r} — "
                            f"supported: {' '.join(sorted(ops))}; use the "
                            "raw-JQL form for anything richer"
                        )
                    conds.append(f"{k} {ops[op]} {self._jql_literal(val)}")
            else:
                conds.append(f"{k} = {self._jql_literal(v)}")
        return "/[" + " and ".join(conds) + "]"

    def show_doc(
        self, addr: str, col: str, flt: str = "", limit: str = "",
    ) -> tuple[list, list]:
        """ShowDocument → RunQuery. The reference builds a StructuredQuery
        from a filter JSON (command.rs:464-493); the v2 node's RunQuery
        takes the JQL string form, so a simple {"field": value} /
        {"field": {"$op": v, ...}} filter compiles to one
        `/[... and ...]` clause here and anything richer is passed as
        raw JQL in FILTER. With an explicit LIMIT the node is asked for
        exactly that page (body ``limit`` — the opt-in past the node's
        default page cap); without one, every page is walked via
        ``next_page_token`` so the console shows ALL matches, like the
        reference's run_query."""
        query = self._compile_filter(flt) if flt else "/*"
        body = {"db_addr": addr, "col_name": col, "query": query}
        if limit:
            body["limit"] = int(limit)
        docs, token = [], None
        while True:
            page = dict(body, **({"page_token": token} if token else {}))
            out = self._post("indexer/RunQuery", page)
            docs.extend(out.get("documents", []))
            token = out.get("next_page_token")
            if not token or limit:
                break  # explicit limit = exactly one page, the asked size
        rows = [
            [d["id"], d.get("owner", "?"), json.dumps(d.get("doc"))]
            for d in docs
        ]
        return ["id", "owner", "document"], rows

    def show_account(self, addr: str | None = None) -> tuple[list, list]:
        if addr is None:
            _, addr = self._key()
        nonce = self._post("storage/GetNonce", {"address": addr})["nonce"]
        dbs = self._post("storage/GetDatabaseOfOwner", {"owner": addr}).get(
            "databases", []
        )
        return ["name", "value"], [
            ["db3 address", addr],
            ["next nonce", nonce],
            ["databases", len(dbs)],
        ]

    def show_state(self) -> tuple[list, list]:
        ms = self._post("storage/GetMutationState", {}).get("view", {})
        try:
            st = self._post("system/GetSystemStatus", {})
        except ConsoleError:
            st = {}  # storage-only node: no system plane configured
        return ["name", "state"], [
            ["mutation", ms.get("mutation_count", 0)],
            ["block", ms.get("block", 0)],
            ["storage bytes", ms.get("total_storage_bytes", 0)],
            ["node version", st.get("version", "-") or "-"],
            ["has inited", bool(st.get("has_inited", False))],
        ]


_COMMANDS: dict[str, tuple[str, int, int]] = {
    # name -> (Console method, min args, max args); -1 = unbounded
    "init": ("init_key", 0, 0),
    "show-key": ("show_key", 0, 0),
    "new-db": ("new_db", 0, 1),
    "my-db": ("my_db", 0, 0),
    "show-db": ("show_db", 1, 1),
    "new-collection": ("new_collection", 2, 2),
    "show-collection": ("show_collection", 1, 1),
    "new-doc": ("new_doc", 3, -1),
    "update-doc": ("update_doc", 4, 4),
    "del-doc": ("del_doc", 3, -1),
    "get-doc": ("get_doc", 3, 3),
    "show-doc": ("show_doc", 2, 4),
    "show-account": ("show_account", 0, 1),
    "show-state": ("show_state", 0, 0),
}


def run_command(console: Console, argv: list[str]) -> str:
    if not argv or argv[0] in ("help", "?"):
        return "commands: " + " ".join(sorted(_COMMANDS))
    name, *args = argv
    spec = _COMMANDS.get(name)
    if spec is None:
        raise ConsoleError(f"unknown command {name!r} — try `help`")
    method, lo, hi = spec
    if len(args) < lo or (hi != -1 and len(args) > hi):
        raise ConsoleError(f"{name}: expected {lo}..{'n' if hi == -1 else hi} args")
    try:
        titles, rows = getattr(console, method)(*args)
    except ConsoleError:
        raise
    except (ValueError, KeyError, OSError) as e:
        # malformed user input (non-int id, bad JSON doc, corrupt
        # keystore) must be a command error, never a REPL-killing
        # traceback
        raise ConsoleError(f"{name}: {e}") from e
    return render_table(titles, rows)


def repl(console: Console) -> None:  # pragma: no cover — thin stdin loop
    import shlex

    print("rtstore console — `help` lists commands, ctrl-d exits")
    while True:
        try:
            line = input("db3> ").strip()
        except EOFError:
            print()
            return
        if not line:
            continue
        if line in ("exit", "quit"):
            return
        try:
            argv = shlex.split(line)
        except ValueError as e:  # unbalanced quote
            print(f"error: {e}")
            continue
        try:
            print(run_command(console, argv))
        except ConsoleError as e:
            print(f"error: {e}")

"""JQL (EJDB2-dialect) query-string parser.

The reference passes JQL strings straight into the embedded EJDB2 engine
(/root/reference/src/storage/src/doc_store.rs:177-220); the exercised forms
(SURVEY.md §2.2 Q1-Q10) plus the comparison/boolean/nested/order extensions of
the public EJDB2 grammar are the contract here. We parse into a small AST that
the compiler turns into Catalyst ``Column`` expressions — no custom execution.

Supported grammar (informal):

    query     := clause (('and'|'or') clause)* apply*
    clause    := ['not'] '/' path
    path      := '*' | (seg)* '[' cond (('and'|'or') cond)* ']'
    seg       := name '/'            -- nested path, e.g. /pets/[kind=dog]
    cond      := field op value
    op        := '=' | 'eq' | '!=' | 'ne' | '>' | 'gt' | '<' | 'lt'
               | '>=' | 'ge' | '<=' | 'le' | 'in' | 'ni' | 're' | '~' | 'like'
    value     := int | float | bool | 'str' | "str" | bareword
               | '?' | ':name' | '[' value (',' value)* ']'
    apply     := '|' ( '/{' f (',' f)* '}' | 'count' | 'limit' n | 'skip' n
               | 'asc' '/'f | 'desc' '/'f | 'apply' json-object )

Examples from the reference test-suite (the acceptance contract):
    /*                                  doc_store.rs:424-431
    /[city = beijing]                   sdk/tests/client_v2.test.ts:219-228
    /[f1="f1"] and /[f2="f2"]           doc_store.rs:377-396
    /[f1 eq ? and test eq 'v1']         doc_store.rs:457-468
    /[age = :age]                       sdk/tests/client_v2.test.ts:241-261
    /* | /{f1}                          doc_store.rs:358-374
    /* | count                          sdk/tests/query.test.ts:122-128
    /* | limit 1                        sdk/tests/query.test.ts:139-147
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from rtstore_spark.errors import QueryError

_COMPARE_OPS = {
    "=": "eq", "eq": "eq",
    "!=": "ne", "ne": "ne",
    ">": "gt", "gt": "gt",
    "<": "lt", "lt": "lt",
    ">=": "ge", "ge": "ge",
    "<=": "le", "le": "le",
    "in": "in", "ni": "ni",
    "re": "re", "~": "prefix", "like": "like",
}


@dataclass
class Placeholder:
    """``?`` (positional, index) or ``:name`` (named) parameter.

    Mirrors EJDBQuery.set_placeholder(name, idx, value)
    (doc_store.rs:187-206): bound values are restricted to
    bool / int64 / string, like QueryParameter (db3_database_v2.proto:101-109).
    """

    index: int | None = None
    name: str | None = None


@dataclass
class Cond:
    field: str          # dotted path within the element, e.g. "city" or "props.k"
    op: str             # canonical op name (eq/ne/gt/lt/ge/le/in/ni/re/prefix/like)
    value: object       # python literal, list (for in/ni), or Placeholder


@dataclass
class Clause:
    """One ``/path/[conds]`` node expression."""

    path: list[str] = field(default_factory=list)  # segments before the bracket
    conds: list[Cond] = field(default_factory=list)
    cond_ops: list[str] = field(default_factory=list)  # 'and'/'or' between conds
    negate: bool = False
    match_all: bool = False  # the `/*` form


@dataclass
class Apply:
    kind: str            # 'project' | 'count' | 'limit' | 'skip' | 'asc' | 'desc'
    args: list = field(default_factory=list)


@dataclass
class BoolExpr:
    """n-ary boolean combinator over sub-expressions (and/or)."""

    op: str                      # 'and' | 'or'
    items: list = field(default_factory=list)  # Clause | BoolExpr


@dataclass
class JQLQuery:
    root: object = None          # Clause | BoolExpr
    applies: list[Apply] = field(default_factory=list)

    @property
    def has_explicit_order(self) -> bool:
        return any(a.kind in ("asc", "desc") for a in self.applies)

    @property
    def clauses(self) -> list[Clause]:
        """Flat clause list (documentation/tests convenience)."""
        out: list[Clause] = []

        def walk(node):
            if isinstance(node, BoolExpr):
                for x in node.items:
                    walk(x)
            else:
                out.append(node)

        walk(self.root)
        return out


_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
    | (?P<hex>0[xX][0-9A-Fa-f]+)
    | (?P<number>-?\d+\.\d+|-?\d+)
    | (?P<named>:[A-Za-z_][A-Za-z0-9_]*)
    | (?P<op>>=|<=|!=|=|>|<|~|\|)
    | (?P<punct>[\[\]{}(),/*?])
    | (?P<word>[A-Za-z_][A-Za-z0-9_.\-]*)
    """,
    re.VERBOSE,
)


def _tokenize(s: str) -> list[tuple[str, str]]:
    tokens: list[tuple[str, str]] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m:
            raise QueryError(f"JQL tokenize error at {pos!r}: {s[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        tokens.append((kind, m.group()))
    return tokens


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.tokens = tokens
        self.i = 0
        self.n_positional = 0

    def peek(self) -> tuple[str, str] | None:
        return self.tokens[self.i] if self.i < len(self.tokens) else None

    def next(self) -> tuple[str, str]:
        tok = self.peek()
        if tok is None:
            raise QueryError("JQL: unexpected end of query")
        self.i += 1
        return tok

    def expect(self, value: str) -> None:
        tok = self.next()
        if tok[1] != value:
            raise QueryError(f"JQL: expected {value!r}, got {tok[1]!r}")

    # ---- values ----

    def parse_value(self):
        kind, text = self.next()
        if kind == "string":
            return re.sub(r"\\(.)", r"\1", text[1:-1])
        if kind == "hex":
            # hex barewords stay strings: addresses/byte-strings are hex text
            # in the reference's data model (event_processor.rs:217-236)
            return text
        if kind == "number":
            return float(text) if "." in text else int(text)
        if kind == "named":
            return Placeholder(name=text[1:])
        if text == "?":
            p = Placeholder(index=self.n_positional)
            self.n_positional += 1
            return p
        if text == "[":
            vals = []
            while True:
                vals.append(self.parse_value())
                kind, text = self.next()
                if text == "]":
                    return vals
                if text != ",":
                    raise QueryError(f"JQL: expected ',' or ']' in list, got {text!r}")
        if kind == "word":
            if text == "true":
                return True
            if text == "false":
                return False
            if text == "null":
                return None
            return text  # bareword string, e.g. /[city = beijing]
        raise QueryError(f"JQL: unexpected value token {text!r}")

    # ---- conditions ----

    def parse_cond(self) -> Cond:
        kind, fieldname = self.next()
        if kind != "word":
            raise QueryError(f"JQL: expected field name, got {fieldname!r}")
        kind, op = self.next()
        if op not in _COMPARE_OPS:
            raise QueryError(f"JQL: unknown operator {op!r}")
        value = self.parse_value()
        return Cond(field=fieldname, op=_COMPARE_OPS[op], value=value)

    def parse_bracket(self, clause: Clause) -> None:
        # at '[': conds separated by and/or
        self.expect("[")
        clause.conds.append(self.parse_cond())
        while True:
            tok = self.peek()
            if tok is None:
                raise QueryError("JQL: unterminated '['")
            if tok[1] == "]":
                self.next()
                return
            if tok[1] in ("and", "or"):
                self.next()
                clause.cond_ops.append(tok[1])
                clause.conds.append(self.parse_cond())
            else:
                raise QueryError(f"JQL: expected 'and'/'or'/']', got {tok[1]!r}")

    # boolean expression grammar with SQL precedence + parentheses:
    #   or_expr  := and_expr ('or' and_expr)*
    #   and_expr := unary ('and' unary)*
    #   unary    := ['not'] ( '(' or_expr ')' | clause )

    def parse_or(self):
        items = [self.parse_and()]
        while (tok := self.peek()) and tok[1] == "or":
            self.next()
            items.append(self.parse_and())
        return items[0] if len(items) == 1 else BoolExpr("or", items)

    def parse_and(self):
        items = [self.parse_unary()]
        while (tok := self.peek()) and tok[1] == "and":
            self.next()
            items.append(self.parse_unary())
        return items[0] if len(items) == 1 else BoolExpr("and", items)

    def parse_unary(self):
        tok = self.peek()
        negate = False
        if tok and tok[1] == "not":
            self.next()
            negate = True
        tok = self.peek()
        if tok and tok[1] == "(":
            self.next()
            inner = self.parse_or()
            self.expect(")")
            if negate:
                # push negation into a wrapper clause-less BoolExpr via De
                # Morgan is unnecessary — record as a negated group
                return BoolExpr("not", [inner])
            return inner
        clause = self.parse_clause()
        clause.negate = negate or clause.negate
        return clause

    def parse_clause(self) -> Clause:
        clause = Clause()
        self.expect("/")
        while True:
            tok = self.peek()
            if tok is None:
                raise QueryError("JQL: bare '/' is not a query")
            if tok[1] == "*":
                self.next()
                clause.match_all = True
                return clause
            if tok[1] == "[":
                self.parse_bracket(clause)
                return clause
            if tok[0] == "word":
                clause.path.append(self.next()[1])
                nxt = self.peek()
                if nxt and nxt[1] == "/":
                    self.next()
                    continue
                # path with no bracket: existence-style; treat as match-all on path
                clause.match_all = True
                return clause
            raise QueryError(f"JQL: unexpected token {tok[1]!r} in path")

    # ---- applies ----

    def parse_apply(self) -> Apply:
        kind, text = self.next()
        if text == "/":
            self.expect("{")
            fields = []
            while True:
                k, t = self.next()
                if t == "}":
                    break
                if t == ",":
                    continue
                if k != "word":
                    raise QueryError(f"JQL: bad projection field {t!r}")
                fields.append(t)
            return Apply(kind="project", args=fields)
        if text == "count":
            return Apply(kind="count")
        if text in ("limit", "skip"):
            k, t = self.next()
            if k != "number":
                raise QueryError(f"JQL: {text} needs a number, got {t!r}")
            return Apply(kind=text, args=[int(t)])
        if text in ("asc", "desc"):
            self.expect("/")
            k, t = self.next()
            if k != "word":
                raise QueryError(f"JQL: {text} needs a /field, got {t!r}")
            return Apply(kind=text, args=[t])
        raise QueryError(f"JQL: unknown apply {text!r}")

    def parse(self) -> JQLQuery:
        q = JQLQuery()
        q.root = self.parse_or()
        while True:
            tok = self.peek()
            if tok is None:
                return q
            if tok[1] == "|":
                self.next()
                q.applies.append(self.parse_apply())
                continue
            raise QueryError(f"JQL: trailing token {tok[1]!r}")


_APPLY_HEAD_RE = re.compile(r"\|\s*apply\b")


def _next_apply_head(query: str, start: int):
    """Find the next ``| apply`` OUTSIDE quoted string literals (a filter
    value like ``'x | apply y'`` must not be treated as a collector)."""
    quote = None
    i = start
    while i < len(query):
        ch = query[i]
        if quote:
            if ch == "\\":
                i += 2
                continue
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "|":
            m = _APPLY_HEAD_RE.match(query, i)
            if m:
                return m
        i += 1
    return None


def _extract_apply_patches(query: str) -> tuple[str, list[dict]]:
    """Cut ``| apply {json}`` collectors out of the raw string (JSON can't
    go through the JQL tokenizer — ``"k": v`` key colons collide with named
    placeholders) and return the remaining query plus the patches in
    source order."""
    import json

    dec = json.JSONDecoder()
    patches: list[dict] = []
    parts: list[str] = []
    pos = 0
    while (m := _next_apply_head(query, pos)) is not None:
        parts.append(query[pos : m.start()])
        j = m.end()
        while j < len(query) and query[j].isspace():
            j += 1
        try:
            patch, pos = dec.raw_decode(query, j)
        except ValueError as e:
            raise QueryError(f"JQL: apply needs a JSON object ({e})") from e
        if not isinstance(patch, dict):
            raise QueryError("JQL: apply patch must be a JSON object")
        patches.append(patch)
    parts.append(query[pos:])
    return "".join(parts), patches


def parse_jql(query: str) -> JQLQuery:
    """Parse a JQL query string into an AST."""
    query = query.strip()
    if not query:
        raise QueryError("JQL: empty query")
    query, patches = _extract_apply_patches(query)
    q = _Parser(_tokenize(query.strip())).parse()
    for p in patches:
        q.applies.append(Apply(kind="apply", args=[p]))
    return q

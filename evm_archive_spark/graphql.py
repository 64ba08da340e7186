"""Minimal GraphQL read API over the archive tables (reference B27).

The reference exposes its Postgres tables through Postgraphile
(docker-compose.yaml:46-72): per-table query fields in the Postgraphile
naming convention (``allLogs``, camelCase columns, ``condition:`` equality
filters, ``first``/``offset`` paging, ``orderBy: [BLOCK_NUMBER_ASC]``
enums, ``nodes``/``totalCount`` wrappers).  Round 2 stood in with a Thrift
JDBC endpoint — a capability superset for SQL clients that speaks no
GraphQL (README positioning note).  This module closes the protocol gap
for the READ path: a from-scratch parser for the GraphQL query-document
subset Postgraphile clients emit (the grammar is the public GraphQL spec,
https://spec.graphql.org/October2021/) plus a resolver that compiles each
field to a DataFrame plan (filter -> orderBy -> limit/offset) — predicate
and projection reach the scan, Catalyst does the rest.

Scope (documented, deliberate): read surface only (the engine is an
analytics read path; mutations stay with the ingest pipeline), equality
conditions (Postgraphile's stock ``condition:`` argument is
equality-only too), ordering enums, paging, ``totalCount``, variables,
``__typename`` — plus SUBSCRIPTIONS in the Postgraphile
``--simple-subscriptions`` convention: ``subscription { listen(topic:)
{ query { ... } } }`` over WebSocket (graphql-transport-ws on a
from-scratch RFC 6455 layer), re-resolved and pushed on
``server.publish(topic)`` — the engine-side stand-in for the
reference's Postgres NOTIFY.  Introspection (the __schema/__type subset
codegen clients read, r5), Relay cursor connections (r5), and watch
mode (r6: ``serve(catalog_tables(spark))`` re-derives the schema from
the live catalog per request, the Postgraphile ``--watch`` behavior)
are in, as are ``--cors`` (preflight + Access-Control headers) and
``--allow-explain`` (physical plans under ``extensions.explain``).
The GraphiQL slot is covered by ``serve(..., graphiql=True)``: a
from-scratch zero-dependency query console page at GET / — we do not
vendor the bundled GraphiQL React app itself, the console covers the
operational need (type, run, read, explain).

Served over stdlib ``http.server`` (POST /graphql for queries, GET +
``Upgrade: websocket`` for subscriptions) — no third-party dependency.
"""

from __future__ import annotations

import json
import re
import threading
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "GraphQLError", "catalog_tables", "execute", "serve", "snake", "camel",
]


class GraphQLError(Exception):
    pass


# Safety cap applied when a client omits ``first``: without it,
# ``{ allLogs { nodes { … } } }`` against a big mirror collects the whole
# table onto the driver (Postgraphile's stock default is also unbounded,
# but an analytics mirror must not be one unpaged query away from an
# driver OOM).  Overridable per call (``execute(..., default_first=...)``,
# ``None`` restores the unbounded Postgraphile behavior); when the cap
# fires, the response carries ``extensions.defaultFirst`` /
# ``extensions.cappedFields`` so clients can tell a capped page from a
# complete result.  ``totalCount`` is unaffected (it counts, never
# collects).
DEFAULT_FIRST = 10_000


# --------------------------------------------------------------------------
# lexer / parser (GraphQL query-document subset, spec §2)
# --------------------------------------------------------------------------

_TOKEN = re.compile(
    r"""
    (?P<ws>[\s,]+|\#[^\n]*)
  | (?P<punct>[{}():\[\]=!$])
  | (?P<name>[_A-Za-z][_0-9A-Za-z]*)
  | (?P<float>-?\d+\.\d+([eE][+-]?\d+)?|-?\d+[eE][+-]?\d+)
  | (?P<int>-?\d+)
  | (?P<string>"(?:\\.|[^"\\])*")
    """,
    re.VERBOSE,
)


def _lex(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m:
            raise GraphQLError(f"lex error at {pos}: {src[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


@dataclass
class Field:
    name: str
    args: dict
    selections: list["Field"] = field(default_factory=list)
    # GraphQL response-key alias (spec §2.7: `alias: field`); None means
    # the field name is the response key — every resolver output keys on
    # ``out_key`` so stock clients that alias (Postgraphile's do) work.
    alias: str | None = None

    @property
    def out_key(self) -> str:
        return self.alias or self.name


def _field_key(f: Field) -> tuple:
    """Canonical hashable key for a parsed selection — two documents that
    resolve identically map to the same key (publish() memoizes on it)."""
    return (
        f.name,
        f.alias,
        tuple(sorted((k, json.dumps(v, sort_keys=True, default=str))
                     for k, v in f.args.items())),
        tuple(_field_key(s) for s in f.selections),
    )


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val: str):
        k, v = self.next()
        if v != val:
            raise GraphQLError(f"expected {val!r}, got {v!r}")

    def parse_document(
        self, operation: str = "query"
    ) -> tuple[list[Field], dict]:
        """Returns (root selections, variable defaults).  ``operation``
        is the accepted operation type for an explicitly-typed document
        — the HTTP endpoint accepts ``query``, the WebSocket endpoint
        parses ``subscription`` documents (_parse_listen)."""
        k, v = self.peek()
        var_defaults: dict = {}
        if v in ("query", "mutation", "subscription"):
            if v != operation:
                raise GraphQLError(f"{v} operations are not supported here")
            self.next()
            if self.peek()[0] == "name":  # operation name
                self.next()
            if self.peek()[1] == "(":  # variable definitions
                self.next()
                while self.peek()[1] != ")":
                    self.expect("$")
                    _, var = self.next()
                    self.expect(":")
                    # type: Name [!] — types are not enforced, just consumed
                    self.next()
                    if self.peek()[1] == "!":
                        self.next()
                    if self.peek()[1] == "=":
                        self.next()
                        var_defaults[var] = self.parse_value({})
                self.next()
        return self.parse_selection_set(), var_defaults

    def parse_selection_set(self) -> list[Field]:
        self.expect("{")
        fields = []
        while self.peek()[1] != "}":
            fields.append(self.parse_field())
        self.next()
        return fields

    def parse_field(self) -> Field:
        k, name = self.next()
        if k != "name":
            raise GraphQLError(f"expected field name, got {name!r}")
        alias = None
        if self.peek()[1] == ":":
            self.next()
            k2, real = self.next()
            if k2 != "name":
                raise GraphQLError(f"expected field name after alias, got {real!r}")
            alias, name = name, real
        args: dict = {}
        if self.peek()[1] == "(":
            self.next()
            while self.peek()[1] != ")":
                _, an = self.next()
                self.expect(":")
                args[an] = self.parse_value_raw()
            self.next()
        sels: list[Field] = []
        if self.peek()[1] == "{":
            sels = self.parse_selection_set()
        return Field(name, args, sels, alias)

    def parse_value_raw(self):
        """Value with $var references left as ('var', name) markers."""
        k, v = self.peek()
        if v == "$":
            self.next()
            _, name = self.next()
            return ("var", name)
        return self.parse_value({})

    def parse_value(self, variables: dict):
        k, v = self.next()
        if v == "{":
            obj = {}
            while self.peek()[1] != "}":
                _, name = self.next()
                self.expect(":")
                obj[name] = self.parse_value_raw()
            self.next()
            return obj
        if v == "[":
            arr = []
            while self.peek()[1] != "]":
                arr.append(self.parse_value_raw())
            self.next()
            return arr
        if k == "int":
            return int(v)
        if k == "float":
            return float(v)
        if k == "string":
            return json.loads(v)
        if k == "name":
            if v == "true":
                return True
            if v == "false":
                return False
            if v == "null":
                return None
            return ("enum", v)
        raise GraphQLError(f"unexpected value token {v!r}")


def _resolve_vars(value, variables: dict):
    if isinstance(value, tuple) and value and value[0] == "var":
        name = value[1]
        if name not in variables:
            raise GraphQLError(f"missing variable ${name}")
        return variables[name]
    if isinstance(value, tuple) and value and value[0] == "enum":
        return value  # enums resolved by the consumer (orderBy)
    if isinstance(value, dict):
        return {k: _resolve_vars(v, variables) for k, v in value.items()}
    if isinstance(value, list):
        return [_resolve_vars(v, variables) for v in value]
    return value


# --------------------------------------------------------------------------
# naming (Postgraphile conventions)
# --------------------------------------------------------------------------

def snake(name: str) -> str:
    return re.sub(r"(?<=[a-z0-9])([A-Z])", r"_\1", name).lower()


def camel(name: str) -> str:
    head, *rest = name.split("_")
    return head + "".join(w.capitalize() for w in rest)


def _all_field(table: str) -> str:
    """logs -> allLogs (Postgraphile pluralizes; archive tables are already
    plural or mass nouns, so the simple 's' rule is applied only when the
    name doesn't end in 's')."""
    base = camel(table)
    if not base.endswith("s"):
        base += "s"
    return "all" + base[0].upper() + base[1:]


# --------------------------------------------------------------------------
# resolver: Field -> DataFrame plan -> JSON
# --------------------------------------------------------------------------

def _order_expr(df: DataFrame, enum_name: str):
    m = re.fullmatch(r"(.+)_(ASC|DESC)", enum_name)
    if not m:
        raise GraphQLError(f"bad orderBy enum {enum_name!r}")
    col = m.group(1).lower()
    if col not in [c.lower() for c in df.columns]:
        raise GraphQLError(f"unknown orderBy column {col!r}")
    c = F.col(col)
    return c.asc() if m.group(2) == "ASC" else c.desc()


def _plan_text(df: DataFrame) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _run_table_field(
    df: DataFrame,
    f: Field,
    variables: dict,
    default_first: int | None = DEFAULT_FIRST,
    capped_fields: list | None = None,
    explain_sink: list | None = None,
) -> dict:
    args = {k: _resolve_vars(v, variables) for k, v in f.args.items()}
    cond = args.pop("condition", {}) or {}
    if not isinstance(cond, dict):
        raise GraphQLError("condition must be an object")
    for k, v in cond.items():
        col = snake(k)
        if col not in df.columns:
            raise GraphQLError(f"unknown condition column {k!r}")
        df = df.filter(F.col(col).eqNullSafe(F.lit(v)))
    order = args.pop("orderBy", None)
    if order is not None:
        enums = order if isinstance(order, list) else [order]
        exprs = []
        for e in enums:
            if not (isinstance(e, tuple) and e[0] == "enum"):
                raise GraphQLError("orderBy takes enum values")
            exprs.append(_order_expr(df, e[1]))
        df = df.orderBy(*exprs)
    first = args.pop("first", None)
    offset = args.pop("offset", None)
    after = args.pop("after", None)
    if args:
        raise GraphQLError(f"unsupported arguments {sorted(args)}")

    total_sel = next((s for s in f.selections if s.name == "totalCount"), None)
    nodes_sel = next((s for s in f.selections if s.name == "nodes"), None)
    edges_sel = next((s for s in f.selections if s.name == "edges"), None)
    pageinfo_sel = next(
        (s for s in f.selections if s.name == "pageInfo"), None
    )
    out: dict = {}
    if total_sel is not None:
        out[total_sel.out_key] = df.count()
    if nodes_sel is None and edges_sel is None and pageinfo_sel is None:
        return out

    def cols_of(sel):
        cols = []  # (response key, column name)
        for s in sel.selections:
            if s.name == "__typename":
                continue
            col = snake(s.name)
            if col not in df.columns:
                raise GraphQLError(f"unknown column {s.name!r}")
            cols.append((s.alias or camel(s.name), col))
        return cols

    node_in_edges = (
        next((s for s in edges_sel.selections if s.name == "node"), None)
        if edges_sel is not None
        else None
    )
    node_cols = cols_of(nodes_sel) if nodes_sel is not None else []
    edge_cols = cols_of(node_in_edges) if node_in_edges is not None else []
    if nodes_sel is not None and not node_cols:
        raise GraphQLError("nodes requires at least one column")
    all_cols = sorted({c for _, c in node_cols + edge_cols})

    # Relay-style offset cursors (Postgraphile's default when no stable
    # keyset exists): cursor i = base64("offset:<i>") into the ordered,
    # filtered row set; `after` starts at the row following it and
    # composes with a plain `offset`.
    start = int(offset or 0)
    if after is not None:
        start += _decode_cursor(after) + 1
    lim = None
    if first is not None:
        lim = int(first)
    elif default_first is not None:
        lim = int(default_first)
        if capped_fields is not None:
            capped_fields.append(f.out_key)
    proj = df.select(*all_cols) if all_cols else df.select(df.columns[0])
    if start:
        proj = proj.offset(start)
    page = proj.limit(lim + 1) if lim is not None else proj
    if explain_sink is not None:
        # --allow-explain parity (docker-compose.yaml:63): the Spark
        # physical plan of the page that is about to execute, where
        # Postgraphile would return the EXPLAINed SQL
        explain_sink.append(
            {"field": f.out_key, "plan": _plan_text(page)}
        )
    if lim is not None:
        # collect one extra row: hasNextPage without a second count job
        rows = page.collect()
        has_next = len(rows) > lim
        rows = rows[:lim]
    else:
        rows = page.collect()
        has_next = False

    def node_dict(r, sel, cols):
        return {
            **(
                {"__typename": _typename(f.name)}
                if any(s.name == "__typename" for s in sel.selections)
                else {}
            ),
            **{key: _json_value(r[c]) for key, c in cols},
        }

    if nodes_sel is not None:
        out[nodes_sel.out_key] = [
            node_dict(r, nodes_sel, node_cols) for r in rows
        ]
    if edges_sel is not None:
        edges = []
        for i, r in enumerate(rows):
            e = {}
            for s in edges_sel.selections:
                if s.name == "cursor":
                    e[s.out_key] = _encode_cursor(start + i)
                elif s.name == "node":
                    e[s.out_key] = node_dict(r, s, edge_cols)
                elif s.name == "__typename":
                    e[s.out_key] = _typename(f.name) + "sEdge"
                else:
                    raise GraphQLError(f"unknown edge field {s.name!r}")
            edges.append(e)
        out[edges_sel.out_key] = edges
    if pageinfo_sel is not None:
        pi = {}
        for s in pageinfo_sel.selections:
            if s.name == "hasNextPage":
                pi[s.out_key] = has_next
            elif s.name == "hasPreviousPage":
                pi[s.out_key] = start > 0
            elif s.name == "startCursor":
                pi[s.out_key] = _encode_cursor(start) if rows else None
            elif s.name == "endCursor":
                pi[s.out_key] = (
                    _encode_cursor(start + len(rows) - 1) if rows else None
                )
            elif s.name == "__typename":
                pi[s.out_key] = "PageInfo"
            else:
                raise GraphQLError(f"unknown pageInfo field {s.name!r}")
        out[pageinfo_sel.out_key] = pi
    return out


def _encode_cursor(i: int) -> str:
    import base64

    return base64.b64encode(f"offset:{i}".encode()).decode()


def _decode_cursor(c) -> int:
    import base64

    try:
        s = base64.b64decode(str(c).encode()).decode()
        if not s.startswith("offset:"):
            raise ValueError(s)
        return int(s[7:])
    except (ValueError, UnicodeDecodeError) as e:
        raise GraphQLError(f"malformed cursor {c!r}") from e


def _typename(field_name: str) -> str:
    base = field_name[3:] if field_name.startswith("all") else field_name
    return base[:-1] if base.endswith("s") else base


def _json_value(v):
    import datetime as dt
    from decimal import Decimal

    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, list):
        return [_json_value(x) for x in v]
    return v


# --------------------------------------------------------------------------
# Introspection subset (__schema / __type)
# --------------------------------------------------------------------------
#
# Postgraphile auto-serves full introspection to every GraphiQL/codegen
# session (reference docker-compose.yaml:46-72).  This subset models what
# a schema-browsing client needs to bootstrap: the Query type with one
# field per table, one OBJECT type per table with its scalar-typed
# columns, and the built-in scalars.  Anything deeper (directives,
# interfaces, input types) resolves to null/empty — valid for nullable
# introspection fields.

_GQL_SCALARS = ("String", "Int", "Float", "Boolean", "ID")


def _gql_scalar(dtype) -> str:
    from pyspark.sql import types as T

    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "Int"
    if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "Float"
    if isinstance(dtype, T.BooleanType):
        return "Boolean"
    return "String"


def _type_name(table: str) -> str:
    """logs -> Log (Postgraphile singularizes row types; simple trailing-s
    rule, mirroring _all_field's pluralization)."""
    base = camel(table)
    if base.endswith("s") and len(base) > 1:
        base = base[:-1]
    return base[0].upper() + base[1:]


def _introspection_schema(tables: dict[str, DataFrame]) -> dict:
    def scalar_ref(name):
        return {"kind": "SCALAR", "name": name, "ofType": None}

    def field(name, type_ref):
        return {
            "name": name,
            "description": None,
            "args": [],
            "type": type_ref,
            "isDeprecated": False,
            "deprecationReason": None,
        }

    def obj(name, fields):
        return {
            "kind": "OBJECT",
            "name": name,
            "description": None,
            "fields": fields,
            "ofType": None,
            "interfaces": [],
            "enumValues": None,
            "inputFields": None,
            "possibleTypes": None,
        }

    types = []
    query_fields = []
    for t, df in sorted(tables.items()):
        tname = _type_name(t)
        cols = [
            field(camel(f.name), scalar_ref(_gql_scalar(f.dataType)))
            for f in df.schema.fields
        ]
        types.append(obj(tname, cols))
        list_ref = {
            "kind": "LIST",
            "name": None,
            "ofType": {"kind": "OBJECT", "name": tname, "ofType": None},
        }
        query_fields.append(field(_all_field(t), list_ref))
        query_fields.append(field(t, list_ref))
    query_type = obj("Query", query_fields)
    sub_type = obj(
        "Subscription",
        [field("listen", {"kind": "OBJECT", "name": "ListenPayload",
                          "ofType": None})],
    )
    listen_type = obj(
        "ListenPayload",
        [field("query", {"kind": "OBJECT", "name": "Query", "ofType": None})],
    )
    all_types = (
        [query_type, sub_type, listen_type]
        + types
        + [
            {
                "kind": "SCALAR",
                "name": s,
                "description": None,
                "fields": None,
                "ofType": None,
                "interfaces": None,
                "enumValues": None,
                "inputFields": None,
                "possibleTypes": None,
            }
            for s in _GQL_SCALARS
        ]
    )
    return {
        "queryType": query_type,
        "mutationType": None,
        "subscriptionType": sub_type,
        "types": all_types,
        "directives": [],
    }


def _resolve_intro(node, sels, variables):
    """Resolve a selection set over the plain-dict schema model; unknown
    fields resolve to null (all subset-omitted introspection fields are
    nullable)."""
    if node is None:
        return None
    out = {}
    for f in sels:
        if f.name == "__typename":
            out[f.out_key] = "__Type" if "kind" in node else "__Schema"
            continue
        v = node.get(f.name) if isinstance(node, dict) else None
        if isinstance(v, list):
            out[f.out_key] = [
                _resolve_intro(x, f.selections, variables)
                if isinstance(x, dict) else x
                for x in v
            ]
        elif isinstance(v, dict):
            out[f.out_key] = (
                _resolve_intro(v, f.selections, variables)
                if f.selections else None
            )
        else:
            out[f.out_key] = v
    return out


def execute(
    query: str,
    tables,
    variables: dict | None = None,
    default_first: int | None = DEFAULT_FIRST,
    explain: bool = False,
) -> dict:
    """Execute a GraphQL query document against named DataFrames.

    ``tables`` maps snake_case table names to DataFrames; each is exposed
    as ``all<CamelCase>`` (Postgraphile) AND under its literal name (for
    the generated per-event decode views, whose ABI-encoding names don't
    camelize meaningfully).  It may also be a ZERO-ARG CALLABLE returning
    that dict — the watch-mode hook (Postgraphile ``--watch``,
    docker-compose.yaml:61): the schema is re-derived per request, so a
    view registered after the server started appears in introspection
    and resolves without restart (see ``catalog_tables``).

    ``default_first`` caps ``nodes`` pages when the client omits
    ``first`` (see DEFAULT_FIRST); ``None`` disables the cap.  Capped
    fields are reported under ``extensions``."""
    if callable(tables):
        tables = tables()
    variables = dict(variables or {})
    capped: list[str] = []
    plans: list[dict] | None = [] if explain else None
    try:
        sels, var_defaults = _Parser(_lex(query)).parse_document()
        for k, v in var_defaults.items():
            variables.setdefault(k, _resolve_vars(v, {}))
        by_field = {}
        for t, df in tables.items():
            by_field[_all_field(t)] = df
            by_field[t] = df
        data = {}
        intro = None
        for f in sels:
            if f.name == "__typename":
                data["__typename"] = "Query"
                continue
            if f.name == "__schema":
                intro = intro or _introspection_schema(tables)
                data[f.out_key] = _resolve_intro(intro, f.selections, variables)
                continue
            if f.name == "__type":
                intro = intro or _introspection_schema(tables)
                want = _resolve_vars(f.args.get("name"), variables)
                node = next(
                    (t for t in intro["types"] if t["name"] == want), None
                )
                data[f.out_key] = _resolve_intro(node, f.selections, variables)
                continue
            if f.name not in by_field:
                raise GraphQLError(f"unknown field {f.name!r}")
            data[f.out_key] = _run_table_field(
                by_field[f.name], f, variables, default_first, capped,
                explain_sink=plans,
            )
        out = {"data": data}
        ext = {}
        if capped:
            ext["defaultFirst"] = default_first
            ext["cappedFields"] = capped
        if plans:
            ext["explain"] = plans
        if ext:
            out["extensions"] = ext
        return out
    except GraphQLError as e:
        return {"errors": [{"message": str(e)}]}


# --------------------------------------------------------------------------
# WebSocket subscriptions (Postgraphile --simple-subscriptions convention)
# --------------------------------------------------------------------------
#
# The reference runs Postgraphile with `--subscriptions
# --simple-subscriptions` (docker-compose.yaml:59,71-72): clients open a
# WebSocket to /graphql and send `subscription { listen(topic: "...") {
# query { ...any read query... } } }`; the server re-resolves the inner
# `query` selection and pushes it whenever the topic fires (Postgres
# NOTIFY there; `server.publish(topic)` here — the ingest pipeline calls
# it after each committed batch, the moral equivalent of the reference's
# insert trigger).  Wire protocol is graphql-transport-ws
# (connection_init/ack, subscribe, next, complete, ping/pong) over a
# from-scratch RFC 6455 implementation — both specs are public; no
# third-party dependency.

_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


def _ws_accept(key: str) -> str:
    import base64
    import hashlib

    return base64.b64encode(
        hashlib.sha1((key + _WS_GUID).encode()).digest()
    ).decode()


def _ws_send(sock, payload: bytes, opcode: int = 1) -> None:
    """One server->client frame (FIN set, unmasked per RFC 6455 §5.1)."""
    head = bytes([0x80 | opcode])
    n = len(payload)
    if n < 126:
        head += bytes([n])
    elif n < 1 << 16:
        head += bytes([126]) + n.to_bytes(2, "big")
    else:
        head += bytes([127]) + n.to_bytes(8, "big")
    sock.sendall(head + payload)


# Upper bound on a single client frame: the protocol on top is small JSON
# messages, so anything past 1 MiB is hostile or broken — reject it before
# allocating (a 127-length header could otherwise demand up to 2^63 bytes).
WS_MAX_FRAME = 1 << 20


def _ws_recv(rfile, max_len: int = WS_MAX_FRAME):
    """One client->server frame -> (opcode, payload).  Client frames MUST
    be masked (RFC 6455 §5.1); fragmented continuation is out of scope
    for the JSON-message protocol layered on top.  A frame longer than
    ``max_len`` returns opcode ``-1`` (caller closes with 1009)."""
    h = rfile.read(2)
    if len(h) < 2:
        return None, b""
    opcode = h[0] & 0x0F
    masked = h[1] & 0x80
    n = h[1] & 0x7F
    if n == 126:
        n = int.from_bytes(rfile.read(2), "big")
    elif n == 127:
        n = int.from_bytes(rfile.read(8), "big")
    if n > max_len:
        return -1, b""
    mask = rfile.read(4) if masked else b"\x00" * 4
    data = rfile.read(n)
    if masked:
        data = bytes(b ^ mask[i % 4] for i, b in enumerate(data))
    return opcode, data


def _parse_listen(payload: dict, variables_out: dict):
    """Validate a simple-subscriptions document: one top-level
    ``listen(topic:)`` field whose selection carries a ``query`` field;
    returns (topic, inner_query_field)."""
    sels, var_defaults = _Parser(_lex(payload.get("query", ""))).parse_document(
        operation="subscription"
    )
    variables_out.update(payload.get("variables") or {})
    for k, v in var_defaults.items():
        variables_out.setdefault(k, _resolve_vars(v, {}))
    if len(sels) != 1 or sels[0].name != "listen":
        raise GraphQLError("subscriptions support listen(topic:) only")
    listen = sels[0]
    topic = _resolve_vars(listen.args.get("topic"), variables_out)
    if not isinstance(topic, str) or not topic:
        raise GraphQLError("listen requires a non-empty topic")
    inner = next((s for s in listen.selections if s.name == "query"), None)
    if inner is None or not inner.selections:
        raise GraphQLError("listen selection must contain a query block")
    return topic, inner


class _SubscriptionHub:
    """topic -> live subscriptions; publish() re-resolves and pushes."""

    def __init__(self, tables, default_first):
        self._tables = tables
        self._default_first = default_first
        self._lock = threading.Lock()
        self._subs: dict[tuple[int, str], dict] = {}
        # cumulative count of inner-query resolutions (one per DISTINCT
        # (query, variables) group per publish) — lets tests pin that
        # N same-query listeners cost one Spark job per publish
        self.resolutions = 0

    def add(self, conn_id, sub_id, topic, inner, variables, sock, sock_lock):
        with self._lock:
            self._subs[(conn_id, sub_id)] = {
                "topic": topic,
                "inner": inner,
                "variables": variables,
                "sock": sock,
                "sock_lock": sock_lock,
            }

    def remove(self, conn_id, sub_id=None):
        with self._lock:
            for key in [
                k
                for k in self._subs
                if k[0] == conn_id and (sub_id is None or k[1] == sub_id)
            ]:
                del self._subs[key]

    def publish(self, topic: str) -> int:
        """Re-resolve subscriptions on ``topic`` and push a ``next``
        message to each; returns the number of messages delivered.
        Resolution happens on the caller's thread — the publisher (ingest
        batch commit) pays for its own fan-out, listeners only read.

        Fan-out is memoized: listeners are grouped by canonical
        (inner-query AST, variables) key and each distinct group is
        resolved ONCE per publish — N subscribers on the same query cost
        one Spark job, not N (``self.resolutions`` counts jobs for
        tests).  A GraphQLError from one group's resolve (e.g. an inner
        query naming an unknown column, which subscribe-time validation
        does not check) is pushed to that group as a
        graphql-transport-ws ``error`` message (terminating just those
        subscriptions) and never starves other groups on the topic."""
        with self._lock:
            targets = [
                (k, dict(s)) for k, s in self._subs.items() if s["topic"] == topic
            ]
        tables = self._tables() if callable(self._tables) else self._tables
        by_field = {}
        for t, df in tables.items():
            by_field[_all_field(t)] = df
            by_field[t] = df
        groups: dict[tuple, list] = {}
        for (conn_id, sub_id), s in targets:
            key = (
                _field_key(s["inner"]),
                json.dumps(s["variables"], sort_keys=True, default=str),
            )
            groups.setdefault(key, []).append(((conn_id, sub_id), s))
        delivered = 0
        for members in groups.values():
            _, s0 = members[0]
            try:
                data = {}
                for f in s0["inner"].selections:
                    if f.name == "__typename":
                        data[f.out_key] = "Query"
                        continue
                    if f.name not in by_field:
                        data[f.out_key] = None
                        continue
                    data[f.out_key] = _run_table_field(
                        by_field[f.name], f, s0["variables"],
                        self._default_first,
                    )
                self.resolutions += 1
                payload = {"data": {"listen": {"query": data}}}
                err = None
            except GraphQLError as e:
                payload, err = None, [{"message": str(e)}]
            for (conn_id, sub_id), s in members:
                msg = json.dumps(
                    {"type": "error", "id": sub_id, "payload": err}
                    if err is not None
                    else {"type": "next", "id": sub_id, "payload": payload}
                ).encode()
                try:
                    with s["sock_lock"]:
                        _ws_send(s["sock"], msg)
                    if err is None:
                        delivered += 1
                    else:
                        # per graphql-transport-ws, "error" terminates
                        # the operation server-side
                        self.remove(conn_id, sub_id)
                except OSError:
                    self.remove(conn_id, sub_id)
        return delivered


# --------------------------------------------------------------------------
# HTTP endpoint (POST /graphql; GET + Upgrade: websocket for subscriptions)
# --------------------------------------------------------------------------

def catalog_tables(spark, include=None):
    """Zero-arg-callable factory for watch-mode serving: snapshot the
    session catalog's tables and temp views as the GraphQL table dict.
    Pass ``serve(catalog_tables(spark))`` and every request re-derives
    the schema from the live catalog — the Postgraphile ``--watch``
    behavior (docker-compose.yaml:61: a view created after startup,
    e.g. by ``views.register_event_views``, appears in introspection
    and resolves without a server restart; Postgraphile does this via
    Postgres event triggers + NOTIFY, here the catalog listing IS the
    watch).  ``include`` optionally filters table names."""

    def snapshot() -> dict[str, DataFrame]:
        out: dict[str, DataFrame] = {}
        for t in spark.catalog.listTables():
            name = t.name
            if include is not None and not include(name):
                continue
            try:
                out[name] = spark.table(name)
            except Exception:  # noqa: BLE001 — dropped mid-listing
                continue
        return out

    return snapshot


# Minimal self-contained query console (the GraphiQL convenience slot,
# docker-compose.yaml:55-72).  NOT the GraphiQL app — that is a bundled
# React build we will not vendor; this is a from-scratch zero-dependency
# page covering the operational need: type a query, run it against the
# same endpoint, read pretty-printed JSON, opt into explain.
_CONSOLE_HTML = b"""<!doctype html>
<html><head><meta charset="utf-8"><title>GraphQL console</title><style>
body{font-family:monospace;margin:1rem;display:grid;gap:.5rem;
grid-template-columns:1fr 1fr;grid-template-rows:auto 1fr auto}
h1{grid-column:1/3;font-size:1rem;margin:0}
textarea{width:100%;box-sizing:border-box;font:inherit;min-height:14rem}
pre{grid-column:1/3;background:#f6f6f6;padding:.5rem;overflow:auto;
white-space:pre-wrap;min-height:8rem}
label{font-size:.8rem}</style></head><body>
<h1>GraphQL console</h1>
<div><label>query</label><br>
<textarea id="q">{ __schema { queryType { name } } }</textarea></div>
<div><label>variables (JSON)</label><br><textarea id="v">{}</textarea></div>
<div><button id="run">Run</button>
<label><input type="checkbox" id="x"> explain</label></div>
<pre id="out"></pre>
<script>
document.getElementById('run').onclick = async () => {
  const out = document.getElementById('out');
  let variables;
  try { variables = JSON.parse(document.getElementById('v').value || '{}'); }
  catch (e) { out.textContent = 'bad variables JSON: ' + e; return; }
  const headers = {'Content-Type': 'application/json'};
  if (document.getElementById('x').checked)
    headers['X-GraphQL-Explain'] = 'on';
  try {
    const r = await fetch('/graphql', {method: 'POST', headers,
      body: JSON.stringify(
        {query: document.getElementById('q').value, variables})});
    out.textContent = JSON.stringify(await r.json(), null, 2);
  } catch (e) { out.textContent = 'request failed: ' + e; }
};
</script></body></html>"""


def serve(
    tables,
    host: str = "127.0.0.1",
    port: int = 0,
    default_first: int | None = DEFAULT_FIRST,
    cors: bool | str = False,
    allow_explain: bool = False,
    graphiql: bool = False,
):
    """Start the GraphQL endpoint on a daemon thread; returns the
    ``http.server`` instance (``server_address`` carries the bound port,
    ``shutdown()`` stops it).  One Spark driver serves all requests —
    concurrency is Spark's scheduler, the handler is thread-per-request
    (``ThreadingHTTPServer``).

    ``tables`` is a dict of DataFrames or a zero-arg callable returning
    one (watch mode — see ``catalog_tables``/``execute``).

    ``cors`` enables the Postgraphile ``--cors`` behavior
    (docker-compose.yaml:70): ``Access-Control-Allow-*`` headers on
    every response plus an OPTIONS preflight handler; pass a string to
    pin the allowed origin instead of ``*``.  ``allow_explain`` enables
    ``--allow-explain`` (docker-compose.yaml:63): a client opting in —
    ``"explain": true`` in the request body or an ``X-GraphQL-Explain:
    on`` header — gets each top-level field's Spark physical plan under
    ``extensions.explain`` (where Postgraphile returns the EXPLAINed
    SQL); without the server flag the opt-in is ignored.
    ``graphiql`` serves the built-in query console page on plain GET
    (``/``, ``/graphql`` or ``/graphiql``) — the GraphiQL slot of
    docker-compose.yaml:55-72 without vendoring the bundled app.

    The returned server also exposes ``publish(topic) -> int``
    (simple-subscriptions fan-out; see _SubscriptionHub) and ``hub``."""
    import itertools
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    hub = _SubscriptionHub(tables, default_first)
    conn_ids = itertools.count(1)

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — stdlib API name
            plain = (
                self.headers.get("Upgrade", "").lower() != "websocket"
            )
            if plain and graphiql and self.path.rstrip("/") in (
                "", "/graphql", "/graphiql"
            ):
                self.send_response(200)
                self.send_header("Content-Type", "text/html; charset=utf-8")
                self.send_header(
                    "Content-Length", str(len(_CONSOLE_HTML))
                )
                self._cors_headers()
                self.end_headers()
                self.wfile.write(_CONSOLE_HTML)
                return
            if self.path.rstrip("/") not in ("", "/graphql") or plain:
                self.send_error(404)
                return
            key = self.headers.get("Sec-WebSocket-Key", "")
            if not key:
                self.send_error(400, "missing Sec-WebSocket-Key")
                return
            self.send_response(101, "Switching Protocols")
            self.send_header("Upgrade", "websocket")
            self.send_header("Connection", "Upgrade")
            self.send_header("Sec-WebSocket-Accept", _ws_accept(key))
            if "graphql-transport-ws" in self.headers.get(
                "Sec-WebSocket-Protocol", ""
            ):
                self.send_header(
                    "Sec-WebSocket-Protocol", "graphql-transport-ws"
                )
            self.end_headers()
            self.close_connection = True
            conn_id = next(conn_ids)
            sock = self.connection
            sock_lock = threading.Lock()

            def send(obj):
                with sock_lock:
                    _ws_send(sock, json.dumps(obj).encode())

            try:
                while True:
                    opcode, data = _ws_recv(self.rfile)
                    if opcode == -1:  # frame over WS_MAX_FRAME
                        with sock_lock:
                            # close 1009 "message too big"
                            _ws_send(sock, (1009).to_bytes(2, "big"),
                                     opcode=8)
                        break
                    if opcode in (None, 8):  # EOF / close
                        break
                    if opcode == 9:  # ping -> pong
                        with sock_lock:
                            _ws_send(sock, data, opcode=10)
                        continue
                    if opcode != 1:
                        continue
                    try:
                        msg = json.loads(data or b"{}")
                    except ValueError:
                        break
                    mtype = msg.get("type")
                    if mtype == "connection_init":
                        send({"type": "connection_ack"})
                    elif mtype == "ping":
                        send({"type": "pong"})
                    elif mtype == "subscribe":
                        sub_id = msg.get("id", "")
                        try:
                            variables: dict = {}
                            topic, inner = _parse_listen(
                                msg.get("payload") or {}, variables
                            )
                            hub.add(
                                conn_id, sub_id, topic, inner, variables,
                                sock, sock_lock,
                            )
                        except GraphQLError as e:
                            send({
                                "type": "error",
                                "id": sub_id,
                                "payload": [{"message": str(e)}],
                            })
                    elif mtype == "complete":
                        hub.remove(conn_id, msg.get("id", ""))
            finally:
                hub.remove(conn_id)

        def _cors_headers(self):
            if cors:
                origin = cors if isinstance(cors, str) else "*"
                self.send_header("Access-Control-Allow-Origin", origin)
                self.send_header(
                    "Access-Control-Allow-Methods", "GET, POST, OPTIONS"
                )
                self.send_header(
                    "Access-Control-Allow-Headers",
                    "Content-Type, X-GraphQL-Explain",
                )

        def do_OPTIONS(self):  # noqa: N802 — stdlib API name
            # CORS preflight (--cors parity); 404 mirrors POST routing
            if self.path.rstrip("/") not in ("", "/graphql"):
                self.send_error(404)
                return
            self.send_response(204)
            self._cors_headers()
            self.end_headers()

        def do_POST(self):  # noqa: N802 — stdlib API name
            if self.path.rstrip("/") not in ("", "/graphql"):
                self.send_error(404)
                return
            try:
                ln = int(self.headers.get("Content-Length", "0"))
                body = json.loads(self.rfile.read(ln) or b"{}")
                want_explain = bool(body.get("explain")) or (
                    self.headers.get("X-GraphQL-Explain", "").lower()
                    == "on"
                )
                res = execute(
                    body.get("query", ""),
                    tables,
                    body.get("variables"),
                    default_first=default_first,
                    explain=allow_explain and want_explain,
                )
            except Exception as e:  # noqa: BLE001 — surface as GraphQL error
                res = {"errors": [{"message": f"bad request: {e}"}]}
            payload = json.dumps(res).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self._cors_headers()
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.hub = hub
    srv.publish = hub.publish
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv

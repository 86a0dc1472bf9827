"""Remote SPARQL endpoint connector (S3; sesame/kb.clj:222-235, example
kr-examples/sesame-remote-kb/.../sesame_remote_kb.clj:12-16).

Like the reference, queries EXECUTE SERVER-SIDE: the native pattern
s-expression compiles to a SPARQL string (plans/sparql_emit.py — the same
compile direction as the reference's sparql.clj) and crosses the network;
SPARQL 1.1 JSON results come back as binding dicts of Term values, the same
result shape as the local KB.query. No Spark executors are involved — a
remote endpoint is a driver-side resource, exactly as in the reference
(per-connection `pmap` fan-out is the reference's only parallelism here;
`pmap_query` on the local KB plays that role).

Standard-library HTTP (urllib) only; Accept negotiation per the SPARQL 1.1
Protocol (query via form-encoded POST).
"""

from __future__ import annotations

import base64
import json
import urllib.parse
import urllib.request

from kr_spark.namespaces import NamespaceRegistry
from kr_spark.plans.sparql_emit import emit_ask, emit_construct, emit_count, emit_select
from kr_spark.terms import Term

_JSON_ACCEPT = "application/sparql-results+json"


def _term_from_json(b: dict) -> Term:
    t = b.get("type")
    if t == "uri":
        return Term("uri", b["value"])
    if t == "bnode":
        return Term("bnode", b["value"])
    # literal (SPARQL JSON also uses legacy "typed-literal")
    return Term(
        "literal",
        b["value"],
        b.get("xml:lang", "") or "",
        b.get("datatype", "") or "",
    )


class RemoteSparqlKB:
    """KB over an HTTP SPARQL endpoint (e.g. a public dataset endpoint).
    Same query surface as the local KB for SELECT/ASK/COUNT/CONSTRUCT
    patterns; writes go over SPARQL 1.1 UPDATE `INSERT DATA` — the
    reference's remote repositories are read/write the same way (Sesame
    HTTPRepository connections accept add: sesame/kb.clj:222-235 +
    sesame/rdf.clj:244-257 run over them). Pass `update_endpoint` when the
    server separates its update URL (e.g. `/sparql` vs `/update`)."""

    def __init__(
        self,
        endpoint: str,
        ns: NamespaceRegistry | None = None,
        username: str | None = None,
        password: str | None = None,
        timeout: float = 30.0,
        use_default_language: bool = True,
        default_language: str = "en",
        update_endpoint: str | None = None,
    ) -> None:
        self.endpoint = endpoint
        self.update_endpoint = update_endpoint or endpoint
        self.ns = ns if ns is not None else NamespaceRegistry()
        self.timeout = timeout
        self._auth = None
        if username is not None:
            raw = f"{username}:{password or ''}".encode()
            self._auth = "Basic " + base64.b64encode(raw).decode()
        self.use_default_language = use_default_language
        self.default_language = default_language

    # term coercion shared with the local KB (pattern compilation needs it)
    def term(self, x) -> Term:
        from kr_spark.terms import to_term

        return to_term(
            x,
            self.ns,
            use_default_language=self.use_default_language,
            default_language=self.default_language,
        )

    # ---- wire ----
    def _http(self, query: str, accept: str = _JSON_ACCEPT) -> bytes:
        data = urllib.parse.urlencode({"query": query}).encode()
        req = urllib.request.Request(
            self.endpoint,
            data=data,
            headers={
                "Accept": accept,
                "Content-Type": "application/x-www-form-urlencoded",
            },
            method="POST",
        )
        if self._auth:
            req.add_header("Authorization", self._auth)
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return resp.read()

    def _http_update(self, update: str) -> None:
        """SPARQL 1.1 Protocol update: form-encoded POST of `update` to the
        update endpoint. Success is any 2xx; the body is ignored."""
        data = urllib.parse.urlencode({"update": update}).encode()
        req = urllib.request.Request(
            self.update_endpoint,
            data=data,
            headers={"Content-Type": "application/x-www-form-urlencoded"},
            method="POST",
        )
        if self._auth:
            req.add_header("Authorization", self._auth)
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            resp.read()

    def sparql_query(self, text: str) -> list[dict]:
        payload = json.loads(self._http(text))
        out = []
        for row in payload["results"]["bindings"]:
            out.append({var: _term_from_json(b) for var, b in row.items()})
        return out

    def sparql_ask(self, text: str) -> bool:
        return bool(json.loads(self._http(text))["boolean"])

    # ---- pattern surface (compiles to strings, executes remotely) ----
    def query(
        self,
        pattern,
        select_vars: list[str] | None = None,
        distinct: bool = False,
        limit: int | None = None,
    ) -> list[dict]:
        return self.sparql_query(
            emit_select(self, pattern, select_vars=select_vars, distinct=distinct, limit=limit)
        )

    def ask(self, pattern) -> bool:
        return self.sparql_ask(emit_ask(self, pattern))

    # ---- write path (SPARQL 1.1 UPDATE; sesame/kb.clj:222-235 parity) ----
    def add(self, s, p, o, graph=None) -> None:
        """Add one triple (optionally into a named graph) server-side."""
        self.add_statements([(s, p, o)], graph=graph)

    def add_statements(self, statements, graph=None) -> None:
        """Batch add via one `INSERT DATA` update. Statements are ground
        triples (vars are a caller bug and raise); bnodes serialize as
        `_:label` with INSERT DATA's per-request bnode scoping, same as the
        reference's statement add over a remote connection
        (sesame/rdf.clj:244-257)."""
        from kr_spark.plans.sparql_emit import emit_term

        lines = []
        for st in statements:
            if len(st) != 3:
                raise ValueError(f"expected (s, p, o), got {st!r}")
            terms = [self.term(x) for x in st]
            for t in terms:
                if t.kind == "var":
                    raise ValueError(f"cannot INSERT a variable term ?{t.v}")
            lines.append(" ".join(emit_term(self, t) for t in terms) + " .")
        body = "\n".join("  " + ln for ln in lines)
        if graph is not None:
            gt = self.term(graph)
            # the graph slot takes only an IRI (SPARQL 1.1 Update GRAPH
            # clause); emit through emit_term like the statement terms so a
            # bnode/var/literal graph — or a value embedding '>' — raises
            # or escapes instead of producing a malformed/injectable update
            # (ADVICE r3)
            if gt.kind != "uri":
                raise ValueError(
                    f"graph term must be an IRI, got {gt.kind} {gt.v!r}"
                )
            body = f"  GRAPH {emit_term(self, gt)} {{\n{body}\n  }}"
        self._http_update(f"INSERT DATA {{\n{body}\n}}")

    def count(self, pattern, limit: int | None = None) -> int:
        rows = self.sparql_query(emit_count(self, pattern, limit=limit))
        if not rows:
            return 0
        (term,) = rows[0].values()
        return int(term.v)

    def construct(self, create_pattern, pattern, limit: int | None = None) -> list[tuple]:
        """CONSTRUCT via the endpoint's SELECT interface: query the body
        bindings remotely, instantiate templates locally (bag semantics,
        duplicates kept — test_sparql_construct.clj:41-45)."""
        bindings = self.query(pattern)
        out: list[tuple] = []
        for b in bindings:
            for tmpl in create_pattern:
                out.append(tuple(self._subst(x, b) for x in tmpl))
        return out

    def _subst(self, x, binding: dict):
        t = self.term(x)
        if t.kind == "var" and t.v in binding:
            return binding[t.v]
        return t

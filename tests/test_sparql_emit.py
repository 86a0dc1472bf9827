"""Pattern -> SPARQL string emitter (sparql.clj:398-444 compile direction)
and the remote endpoint connector (S3, sesame/kb.clj:222-235).

Round-trip contract: everything the emitter produces parses back through
plans/sparql_parser.py and returns the SAME results as native execution."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs

import pytest

from tests.conftest import (
    TEST_TRIPLES_6_1,
    TEST_TRIPLES_7,
    TEST_TRIPLES_NUMBERS,
    TEST_TRIPLES_PATHS,
    load_fixture,
)


def _bindings_set(rows):
    return {tuple(sorted((k, repr(v)) for k, v in r.items())) for r in rows}


def _roundtrip_same(kb, pattern, **kw):
    from kr_spark.plans.sparql_emit import emit_select

    native = kb.query(pattern, **kw)
    text = emit_select(kb, pattern, **kw)
    via_string = kb.sparql_query(text)
    assert _bindings_set(native) == _bindings_set(via_string), text


def test_emit_select_bgp_roundtrip(kb):
    load_fixture(kb, TEST_TRIPLES_6_1)
    _roundtrip_same(
        kb, [("?/p", "rdf/type", "foaf/Person"), ("?/p", "foaf/name", "?/name")]
    )


def test_emit_optional_union_roundtrip(kb):
    load_fixture(kb, TEST_TRIPLES_6_1)
    _roundtrip_same(
        kb,
        [
            ("?/p", "foaf/name", "?/name"),
            (":optional", ("?/p", "foaf/mbox", "?/email")),
        ],
    )
    kb2_triples = TEST_TRIPLES_7
    kb.add_statements(kb2_triples)
    _roundtrip_same(
        kb,
        [
            (
                ":union",
                [("?/b", "dc10/title", "?/t")],
                [("?/b", "dc11/title", "?/t")],
            )
        ],
    )


def test_emit_filters_roundtrip(kb):
    load_fixture(kb, TEST_TRIPLES_NUMBERS)
    _roundtrip_same(
        kb,
        [
            ("?/p", "foaf/age", "?/age"),
            (">", "?/age", 40),
        ],
    )
    _roundtrip_same(
        kb,
        [
            ("?/p", "foaf/surname", "?/n"),
            (":regex", "?/n", ["acker"]),
        ],
    )


def test_emit_paths_roundtrip(kb):
    load_fixture(kb, TEST_TRIPLES_PATHS)
    _roundtrip_same(kb, [("ex/a", ["foaf/knows", "+"], "?/x")])
    _roundtrip_same(kb, [("ex/a", ("foaf/knows", "foaf/age"), "?/age")])
    _roundtrip_same(
        kb, [("?/p", (":or", "foaf/givenname", "foaf/firstname"), "?/n")]
    )


def test_emit_ask_count_construct(kb):
    from kr_spark.plans.sparql_emit import emit_ask, emit_construct, emit_count

    load_fixture(kb, TEST_TRIPLES_6_1)
    pattern = [("?/p", "rdf/type", "foaf/Person")]
    assert kb.sparql_ask(emit_ask(kb, pattern))
    assert kb.sparql_count(emit_count(kb, pattern)) == kb.count(pattern)
    got = kb.sparql_construct(
        emit_construct(kb, [("?/p", "ex/isa", "ex/Human")], pattern)
    )
    assert got.count() == 2


# ---- remote endpoint (S3) against a local mock SPARQL server ----


class _MockSparql(BaseHTTPRequestHandler):
    last_query = None
    last_auth = None

    def do_POST(self):
        body = self.rfile.read(int(self.headers["Content-Length"])).decode()
        q = parse_qs(body).get("query", [""])[0]
        type(self).last_query = q
        type(self).last_auth = self.headers.get("Authorization")
        if q.lstrip().upper().startswith("ASK"):
            payload = {"head": {}, "boolean": True}
        elif "COUNT" in q:
            payload = {
                "head": {"vars": ["count0"]},
                "results": {
                    "bindings": [
                        {
                            "count0": {
                                "type": "literal",
                                "value": "42",
                                "datatype": "http://www.w3.org/2001/XMLSchema#integer",
                            }
                        }
                    ]
                },
            }
        else:
            payload = {
                "head": {"vars": ["s", "name"]},
                "results": {
                    "bindings": [
                        {
                            "s": {"type": "uri", "value": "http://ex.org/a"},
                            "name": {
                                "type": "literal",
                                "value": "Alice",
                                "xml:lang": "en",
                            },
                        },
                        {
                            "s": {"type": "bnode", "value": "b0"},
                            "name": {"type": "literal", "value": "Bob"},
                        },
                    ]
                },
            }
        data = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/sparql-results+json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def log_message(self, *a):
        pass


@pytest.fixture()
def mock_endpoint():
    srv = HTTPServer(("127.0.0.1", 0), _MockSparql)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/sparql"
    srv.shutdown()


def test_remote_kb_query_ask_count(mock_endpoint):
    from kr_spark.sources.remote import RemoteSparqlKB

    rkb = RemoteSparqlKB(mock_endpoint, username="u", password="p")
    rows = rkb.query([("?/s", "foaf/name", "?/name")])
    assert len(rows) == 2
    assert rows[0]["s"].kind == "uri" and rows[0]["s"].v == "http://ex.org/a"
    assert rows[0]["name"].lang == "en" and rows[0]["name"].v == "Alice"
    assert rows[1]["s"].kind == "bnode"
    # the compiled pattern crossed the wire as SPARQL
    assert "SELECT" in _MockSparql.last_query
    assert "foaf" in _MockSparql.last_query or "name" in _MockSparql.last_query
    assert _MockSparql.last_auth and _MockSparql.last_auth.startswith("Basic ")

    assert rkb.ask([("?/s", "foaf/name", "?/n")]) is True
    assert _MockSparql.last_query.lstrip().startswith("ASK")
    assert rkb.count([("?/s", "foaf/name", "?/n")]) == 42


def test_remote_kb_construct(mock_endpoint):
    from kr_spark.sources.remote import RemoteSparqlKB

    rkb = RemoteSparqlKB(mock_endpoint)
    triples = rkb.construct(
        [("?/s", "ex/hasName", "?/name")], [("?/s", "foaf/name", "?/name")]
    )
    assert len(triples) == 2
    s, p, o = triples[0]
    assert s.v == "http://ex.org/a" and o.v == "Alice"

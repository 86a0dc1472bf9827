"""§17.3 comparison families + §17.4.3.14 regex flags (round-5 hardening).

SPARQL's operator table defines `< > <= >=` only WITHIN a literal family:
numerics by value, strings by fn:compare codepoint order, xsd:boolean by
value (false < true), and the dateTime family as instants (op:dateTime-
-less-than normalizes timezone offsets). A cross-family pair, a non-literal
operand, or a literal whose datatype has no defined order is a PER-ROW type
error — the FILTER drops that row, never the query.  Equality (`=`,
RDFterm-equal §17.4.1.7) additionally must answer TRUE for same-instant
dateTimes written with different offsets and value-equal booleans ("1" vs
"true"), and must ERROR (not answer false) for distinct literals of an
unknown datatype, since their value space is unknowable.

Jena answers all of these for every kr raw-string query
(reference sparql.clj:560-603 delegates to ARQ's NodeValue comparisons);
pinned here against plans/filters.py `_cmp_family` / `_value_eq`.
"""

from tests.conftest import load_fixture

XSD = "http://www.w3.org/2001/XMLSchema#"

PREFIXES = """
PREFIX ex: <http://www.example.org/>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
"""

DT_FIXTURE = [
    # same instant, three spellings; plus a clearly-later one
    ("ex/e1", "ex/when", ["2024-01-10T10:00:00+02:00", "xsd/dateTime"]),
    ("ex/e2", "ex/when", ["2024-01-10T08:00:00Z", "xsd/dateTime"]),
    ("ex/e3", "ex/when", ["2024-01-10T03:00:00-05:00", "xsd/dateTime"]),
    ("ex/e4", "ex/when", ["2024-06-01T00:00:00Z", "xsd/dateTime"]),
]


def _names(rows, var="s"):
    return {b[var].v.rsplit("/", 1)[-1] for b in rows}


# ---- dateTime family: instants, not lexical forms


def test_datetime_equality_normalizes_offsets(kb):
    load_fixture(kb, DT_FIXTURE)
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?s WHERE { ?s ex:when ?w . "
        'FILTER(?w = "2024-01-10T08:00:00Z"^^xsd:dateTime) }'
    )
    assert _names(rows) == {"e1", "e2", "e3"}


def test_datetime_ordering_across_offsets(kb):
    load_fixture(kb, DT_FIXTURE)
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?s WHERE { ?s ex:when ?w . "
        'FILTER(?w < "2024-01-10T09:00:00Z"^^xsd:dateTime) }'
    )
    # 08:00Z in all three spellings is < 09:00Z; June is not
    assert _names(rows) == {"e1", "e2", "e3"}


def test_date_ordering(kb):
    load_fixture(
        kb,
        [
            ("ex/d1", "ex/on", ["2024-01-05", "xsd/date"]),
            ("ex/d2", "ex/on", ["2024-02-05", "xsd/date"]),
        ],
    )
    rows = kb.sparql_query(
        PREFIXES
        + 'SELECT ?s WHERE { ?s ex:on ?d . FILTER(?d < "2024-02-01"^^xsd:date) }'
    )
    assert _names(rows) == {"d1"}


def test_ill_formed_datetime_is_row_error_not_crash(kb):
    load_fixture(
        kb,
        DT_FIXTURE
        + [("ex/bad", "ex/when", ["not-a-time", "xsd/dateTime"])],
    )
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?s WHERE { ?s ex:when ?w . "
        'FILTER(?w >= "2024-01-01T00:00:00Z"^^xsd:dateTime) }'
    )
    # the malformed lexical errors per-row; the query survives
    assert _names(rows) == {"e1", "e2", "e3", "e4"}
    # but the identical ill-formed term still = itself (RDF term identity)
    assert kb.sparql_ask(
        PREFIXES + "ASK { ?s ex:when ?w . "
        'FILTER(?w = "not-a-time"^^xsd:dateTime) }'
    )


def test_time_ordering_and_equality(kb):
    load_fixture(
        kb,
        [
            ("ex/t1", "ex/at", ["09:30:00", "xsd/time"]),
            ("ex/t2", "ex/at", ["14:00:00", "xsd/time"]),
        ],
    )
    rows = kb.sparql_query(
        PREFIXES
        + 'SELECT ?s WHERE { ?s ex:at ?t . FILTER(?t < "12:00:00"^^xsd:time) }'
    )
    assert _names(rows) == {"t1"}
    rows = kb.sparql_query(
        PREFIXES
        + 'SELECT ?s WHERE { ?s ex:at ?t . FILTER(?t != "09:30:00"^^xsd:time) }'
    )
    assert _names(rows) == {"t2"}  # distinct valid times are provably unequal


# ---- xsd:boolean: by value, false < true


def test_boolean_value_equality_and_order(kb):
    load_fixture(
        kb,
        [
            ("ex/t1", "ex/flag", ["true", "xsd/boolean"]),
            ("ex/t2", "ex/flag", ["1", "xsd/boolean"]),
            ("ex/f1", "ex/flag", ["false", "xsd/boolean"]),
            ("ex/f2", "ex/flag", ["0", "xsd/boolean"]),
        ],
    )
    rows = kb.sparql_query(
        PREFIXES
        + 'SELECT ?s WHERE { ?s ex:flag ?b . FILTER(?b = "true"^^xsd:boolean) }'
    )
    assert _names(rows) == {"t1", "t2"}  # "1" is value-equal to "true"
    rows = kb.sparql_query(
        PREFIXES
        + 'SELECT ?s WHERE { ?s ex:flag ?b . FILTER(?b < "true"^^xsd:boolean) }'
    )
    assert _names(rows) == {"f1", "f2"}  # false < true


# ---- cross-family / undefined comparisons are per-row errors


def test_cross_family_less_than_is_row_error(kb):
    load_fixture(
        kb,
        [
            ("ex/n", "ex/v", [3, "xsd/integer"]),
            ("ex/s", "ex/v", "banana"),
        ],
    )
    # string < string works; the integer row is a type error and drops
    rows = kb.sparql_query(
        PREFIXES + 'SELECT ?s WHERE { ?s ex:v ?v . FILTER(?v < "zebra") }'
    )
    assert _names(rows) == {"s"}
    # and numeric < numeric drops the string row symmetrically
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?s WHERE { ?s ex:v ?v . FILTER(?v < 10) }"
    )
    assert _names(rows) == {"n"}


def test_iri_less_than_is_row_error(kb):
    load_fixture(kb, [("ex/a", "ex/knows", "ex/b")])
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?s WHERE { ?s ex:knows ?o . FILTER(?o < ex:z) }"
    )
    assert rows == []  # IRIs have no <; error, not true/false


def test_unknown_datatype_equal_errors_unless_same_term(kb):
    load_fixture(
        kb,
        [
            ("ex/a", "ex/v", ["abc", "<http://example.org/dt#custom>"]),
            ("ex/b", "ex/v", ["xyz", "<http://example.org/dt#custom>"]),
        ],
    )
    # same term -> provably equal
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?s WHERE { ?s ex:v ?v . "
        'FILTER(?v = "abc"^^<http://example.org/dt#custom>) }'
    )
    assert _names(rows) == {"a"}
    # distinct lexicals of an unknown datatype: ERROR, so != must NOT
    # return them either (extended-false would leak through !=)
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?s WHERE { ?s ex:v ?v . "
        'FILTER(?v != "abc"^^<http://example.org/dt#custom>) }'
    )
    assert rows == []
    # but sameTerm answers false definitively where = must error
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?s WHERE { ?s ex:v ?v . "
        'FILTER(!sameTerm(?v, "abc"^^<http://example.org/dt#custom>)) }'
    )
    assert _names(rows) == {"b"}


# ---- ORDER BY uses instant order for the dateTime family


def test_min_max_datetime_normalizes_offsets(kb):
    load_fixture(
        kb,
        [
            ("ex/late", "ex/when", ["2024-01-10T14:00:00Z", "xsd/dateTime"]),
            ("ex/early", "ex/when", ["2024-01-10T23:30:00+10:00", "xsd/dateTime"]),
        ],
    )
    rows = kb.sparql_query(
        PREFIXES
        + "SELECT (MIN(?w) AS ?lo) (MAX(?w) AS ?hi) WHERE { ?s ex:when ?w }"
    )
    # MIN/MAX return the extreme TERM, chosen by instant order
    assert rows[0]["lo"].v == "2024-01-10T23:30:00+10:00"  # 13:30Z
    assert rows[0]["hi"].v == "2024-01-10T14:00:00Z"


def test_order_by_datetime_normalizes_offsets(kb):
    load_fixture(
        kb,
        [
            # lexical order ≠ instant order: "...T23:30+10:00" (13:30Z)
            # sorts lexically AFTER "...T14:00Z" but is the earlier instant
            ("ex/late", "ex/when", ["2024-01-10T14:00:00Z", "xsd/dateTime"]),
            ("ex/early", "ex/when", ["2024-01-10T23:30:00+10:00", "xsd/dateTime"]),
        ],
    )
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?s WHERE { ?s ex:when ?w } ORDER BY ?w"
    )
    assert [b["s"].v.rsplit("/", 1)[-1] for b in rows] == ["early", "late"]


# ---- regex flags (§17.4.3.14 via XQuery F&O)


def test_regex_flag_s_dotall(kb):
    load_fixture(kb, [("ex/a", "ex/t", "line1\nline2")])
    q = PREFIXES + 'ASK { ?s ex:t ?t . FILTER regex(?t, "line1.line2"%s) }'
    assert not kb.sparql_ask(q % "")
    assert kb.sparql_ask(q % ', "s"')


def test_regex_flag_m_multiline(kb):
    load_fixture(kb, [("ex/a", "ex/t", "alpha\nbeta")])
    q = PREFIXES + 'ASK { ?s ex:t ?t . FILTER regex(?t, "^beta$"%s) }'
    assert not kb.sparql_ask(q % "")
    assert kb.sparql_ask(q % ', "m"')


def test_regex_flag_x_whitespace(kb):
    load_fixture(kb, [("ex/a", "ex/t", "abc")])
    assert kb.sparql_ask(
        PREFIXES + 'ASK { ?s ex:t ?t . FILTER regex(?t, "a b c", "x") }'
    )


def test_regex_flag_q_literal(kb):
    load_fixture(kb, [("ex/a", "ex/t", "costs $5 (net)"), ("ex/b", "ex/t", "costs X5 Xnet)")])
    rows = kb.sparql_query(
        PREFIXES + 'SELECT ?s WHERE { ?s ex:t ?t . FILTER regex(?t, "$5 (net)", "q") }'
    )
    assert _names(rows) == {"a"}
    # qi composes: literal match, case-insensitive
    assert kb.sparql_ask(
        PREFIXES + 'ASK { ?s ex:t ?t . FILTER regex(?t, "COSTS $5", "qi") }'
    )


def test_replace_respects_flags(kb):
    load_fixture(kb, [("ex/a", "ex/t", "a.b.c")])
    rows = kb.sparql_query(
        PREFIXES
        + 'SELECT (REPLACE(?t, ".", "-", "q") AS ?r) WHERE { ?s ex:t ?t }'
    )
    assert rows[0]["r"].v == "a-b-c"  # "." quoted -> only literal dots

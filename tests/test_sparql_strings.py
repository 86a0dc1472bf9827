"""Raw SPARQL string entry points (Q9, sparql.clj:51-57,560-603) — the
parser covers the subset kr's own compiler emits, so kr-generated queries
round-trip through the engine."""

import pytest

from tests.conftest import (
    TEST_TRIPLES_6_1,
    TEST_TRIPLES_LANG,
    TEST_TRIPLES_NUMBERS,
    TEST_TRIPLES_PATHS,
    load_fixture,
)

PREFIXES = """
PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
PREFIX foaf: <http://xmlns.com/foaf/0.1/>
PREFIX ex: <http://www.example.org/>
"""


def test_sparql_select(kb):
    load_fixture(kb, TEST_TRIPLES_6_1)
    rows = kb.sparql_query(
        PREFIXES
        + """
        SELECT ?p ?name WHERE {
          ?p rdf:type foaf:Person .
          ?p foaf:name ?name .
        }
        """
    )
    assert {b["name"].v for b in rows} == {"Alice", "Bob"}
    assert all(b["p"].kind == "uri" for b in rows)


def test_sparql_select_star_and_a_shorthand(kb):
    load_fixture(kb, TEST_TRIPLES_6_1)
    rows = kb.sparql_query(PREFIXES + "SELECT * WHERE { ?p a foaf:Person . }")
    assert len(rows) == 2


def test_sparql_ask(kb):
    load_fixture(kb, TEST_TRIPLES_6_1)
    assert kb.sparql_ask(PREFIXES + "ASK { ?p foaf:name \"Alice\"@en . }")
    assert not kb.sparql_ask(PREFIXES + "ASK { ?p foaf:name \"Nobody\"@en . }")


def test_sparql_count_1_1_form(kb):
    load_fixture(kb, TEST_TRIPLES_6_1)
    n = kb.sparql_count(
        PREFIXES + "SELECT (COUNT(*) AS ?c) WHERE { ?p rdf:type foaf:Person . }"
    )
    assert n == 2


def test_sparql_optional_and_union(kb):
    load_fixture(kb, TEST_TRIPLES_6_1)
    rows = kb.sparql_query(
        PREFIXES
        + """
        SELECT ?p ?name ?mbox WHERE {
          ?p foaf:name ?name .
          OPTIONAL { ?p foaf:mbox ?mbox . }
        }
        """
    )
    # Alice has 2 mboxes, Bob none -> 3 rows, Bob's mbox unbound
    assert len(rows) == 3
    bobs = [b for b in rows if b["name"].v == "Bob"]
    assert len(bobs) == 1 and "mbox" not in bobs[0]

    rows = kb.sparql_query(
        PREFIXES
        + """
        SELECT ?x WHERE {
          { ?x rdf:type foaf:Person . } UNION { ?x foaf:mbox ?m . }
        }
        """
    )
    assert len(rows) == 4  # 2 typed + 2 mbox rows (bag semantics)


def test_sparql_filter_numeric_and_regex(kb):
    load_fixture(kb, TEST_TRIPLES_NUMBERS)
    rows = kb.sparql_query(
        PREFIXES
        + """
        SELECT ?p ?age WHERE {
          ?p foaf:age ?age .
          FILTER (?age > 40)
        }
        """
    )
    assert len(rows) == 1 and rows[0]["age"].v == "50"

    load_fixture(kb, TEST_TRIPLES_6_1)
    rows = kb.sparql_query(
        PREFIXES
        + """
        SELECT ?name WHERE {
          ?p foaf:name ?name .
          FILTER (regex(?name, "^ali", "i"))
        }
        """
    )
    assert {b["name"].v for b in rows} == {"Alice"}


def test_sparql_filter_bound_lang(kb):
    load_fixture(kb, TEST_TRIPLES_LANG)
    rows = kb.sparql_query(
        PREFIXES
        + """
        SELECT ?x ?n WHERE {
          ?x foaf:firstname ?n .
          FILTER (lang(?n) = "en")
        }
        """
    )
    assert len(rows) == 2  # Alice (auto-en) + boxed ["Bob","en"]


def test_sparql_distinct_limit(kb):
    load_fixture(kb, TEST_TRIPLES_6_1)
    rows = kb.sparql_query(
        PREFIXES + "SELECT DISTINCT ?t WHERE { ?p rdf:type ?t . } LIMIT 1"
    )
    assert len(rows) == 1


def test_sparql_construct(kb):
    load_fixture(kb, TEST_TRIPLES_6_1)
    out = kb.sparql_construct(
        PREFIXES
        + """
        CONSTRUCT { ?p ex:renamed ?name . }
        WHERE { ?p foaf:name ?name . }
        """
    )
    rows = out.collect()
    assert len(rows) == 2
    assert all(r["p"] == "http://www.example.org/renamed" for r in rows)


def test_sparql_unsupported_forms_raise(kb):
    with pytest.raises(ValueError):
        kb.sparql_query("DESCRIBE <http://x>")
    with pytest.raises(ValueError):
        kb.sparql_ask("PREFIX ex: <http://e/> SELECT * WHERE { ?a ex:b ?c . }")


def test_sparql_visit_template_construct_visit(kb):
    load_fixture(kb, TEST_TRIPLES_6_1)
    q = PREFIXES + "SELECT ?p ?name WHERE { ?p foaf:name ?name . }"

    seen = [b["name"].v for b in kb.sparql_visit(q)]
    assert sorted(seen) == ["Alice", "Bob"]

    rows = kb.sparql_query_template(("?/p", "ex/called", "?/name"), q)
    assert len(rows) == 2
    assert all(r[1] == "ex/called" for r in rows)
    assert {r[2].v for r in rows} == {"Alice", "Bob"}

    triples = list(
        kb.sparql_construct_visit(
            PREFIXES
            + "CONSTRUCT { ?p ex:renamed ?name . } WHERE { ?p foaf:name ?name . }"
        )
    )
    assert len(triples) == 2
    assert all(p == "http://www.example.org/renamed" for _, p, _ in triples)


# ---- property paths in string form (sparql.clj:130-199 emission syntax;
# semantics mirror test_sparql_property_paths.clj:54-89) ----


@pytest.fixture()
def path_kb(kb):
    from tests.conftest import TEST_TRIPLES_PATHS

    return load_fixture(kb, TEST_TRIPLES_PATHS)


def test_sparql_path_plus_star_question(path_kb):
    q = lambda p: {
        b["x"].v.rsplit("/", 1)[-1]
        for b in path_kb.sparql_query(PREFIXES + "SELECT ?x WHERE { ex:a " + p + " ?x . }")
    }
    assert q("foaf:knows+") == {"b", "c"}
    assert q("foaf:knows*") == {"a", "b", "c"}
    assert q("foaf:knows?") == {"a", "b"}


def test_sparql_path_sequence_and_composition(path_kb):
    rows = path_kb.sparql_query(
        PREFIXES + "SELECT ?age WHERE { ex:a foaf:knows/foaf:age ?age . }"
    )
    assert sorted(b["age"].v for b in rows) == ["40"]
    rows = path_kb.sparql_query(
        PREFIXES + "SELECT ?age WHERE { ex:a (foaf:knows+)/foaf:age ?age . }"
    )
    assert sorted(b["age"].v for b in rows) == ["40", "50"]


def test_sparql_path_alternation_inverse_bounded(path_kb):
    rows = path_kb.sparql_query(
        PREFIXES + "SELECT ?n WHERE { ?p foaf:givenname|foaf:firstname ?n . }"
    )
    assert len(rows) == 3
    rows = path_kb.sparql_query(
        PREFIXES + "SELECT ?who WHERE { ex:b ^foaf:knows ?who . }"
    )
    assert [b["who"].v.rsplit("/", 1)[-1] for b in rows] == ["a"]
    rows = path_kb.sparql_query(
        PREFIXES + "SELECT ?x WHERE { ex:a foaf:knows{1,2} ?x . }"
    )
    assert {b["x"].v.rsplit("/", 1)[-1] for b in rows} == {"b", "c"}
    rows = path_kb.sparql_query(
        PREFIXES + "SELECT ?x WHERE { ex:a foaf:knows{2} ?x . }"
    )
    assert {b["x"].v.rsplit("/", 1)[-1] for b in rows} == {"c"}


def test_sparql_string_escapes(kb):
    # \n, \t and \uXXXX escapes in query literals must match stored data
    kb.add("ex/a", "ex/p", ["line1\nline2\tA"])
    assert kb.sparql_ask(PREFIXES + 'ASK { ex:a ex:p "line1\\nline2\\t\\u0041" . }')


def test_sparql_count_distinct(kb):
    load_fixture(kb, TEST_TRIPLES_6_1)
    # identical UNION branches duplicate every binding row: bag counts 2,
    # DISTINCT must count 1 (ADVICE r1: DISTINCT was dropped in counts)
    base = (
        "WHERE { { ex:a foaf:name ?n . } UNION { ex:a foaf:name ?n . } }"
    )
    assert kb.sparql_count(PREFIXES + "SELECT ?n " + base) == 2
    assert kb.sparql_count(PREFIXES + "SELECT DISTINCT ?n " + base) == 1


def test_sparql_generic_dispatch(kb):
    # kb.sparql: one entry point, result type follows the query form
    from tests.conftest import TEST_TRIPLES_LANG, load_fixture

    load_fixture(kb, TEST_TRIPLES_LANG)
    p = "PREFIX foaf: <http://xmlns.com/foaf/0.1/> "
    rows = kb.sparql(p + "SELECT ?n WHERE { ?x foaf:firstname ?n . }")
    assert isinstance(rows, list) and len(rows) == 3
    assert kb.sparql(p + 'ASK { ?x foaf:firstname "Alice"@en . }') is True
    n = kb.sparql(p + "SELECT (COUNT(*) AS ?c) WHERE { ?x foaf:firstname ?n . }")
    assert n == 3


# ---- negated property sets (SPARQL 1.1 §9.1) ----


def test_negated_property_set_native_and_string(kb):
    load_fixture(kb, TEST_TRIPLES_PATHS)
    # native spec: any edge from ex/a NOT via foaf/knows
    rows = kb.query([("ex/a", (":not-props", "foaf/knows"), "?/o")])
    got = {b["o"].v for b in rows}
    assert "http://www.example.org/b" not in got  # the knows edge
    assert "Alice" in got and "Hacker" in got and "40" in got
    # string form with a member list
    rows = kb.sparql_query(
        PREFIXES
        + "SELECT ?o WHERE { ex:a !(foaf:knows|foaf:age) ?o . }"
    )
    assert {b["o"].v for b in rows} == {"Alice", "Hacker"}


def test_negated_property_set_inverse_member(kb):
    load_fixture(kb, TEST_TRIPLES_PATHS)
    # !(^foaf:knows) from ex/b: reversed edges into b whose predicate is
    # not knows — there are none (only a-knows->b points at b)
    rows = kb.query([("ex/b", (":not-props", (":inverse", "foaf/knows")), "?/x")])
    assert rows == []
    # but !(^foaf/age) from ex/b sees the reversed knows edge (a knows b)
    rows = kb.query([("ex/b", (":not-props", (":inverse", "foaf/age")), "?/x")])
    assert "http://www.example.org/a" in {b["x"].v for b in rows}


def test_negated_property_set_in_sequence(kb):
    load_fixture(kb, TEST_TRIPLES_PATHS)
    # knows/!(knows): one knows hop then any non-knows edge
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?o WHERE { ex:a foaf:knows/!(foaf:knows) ?o . }"
    )
    got = {b["o"].v for b in rows}
    assert got == {"Bob", "Hacker", "40"}  # ex/b's non-knows edges


# ---- sub-SELECT (SPARQL 1.1 §12) ----


def test_subquery_uncorrelated_aggregate(kb):
    load_fixture(kb, TEST_TRIPLES_NUMBERS)
    # classic max-join: who has the maximum age?
    rows = kb.sparql_query(
        PREFIXES
        + """SELECT ?x WHERE {
              ?x foaf:age ?a .
              { SELECT (MAX(?a2) AS ?mx) WHERE { ?y foaf:age ?a2 } }
              FILTER(?a >= ?mx) }"""
    )
    assert {b["x"].v.rsplit("/", 1)[-1] for b in rows} == {"c"}


def test_subquery_grouped_join_on_shared_var(kb):
    load_fixture(kb, TEST_TRIPLES_NUMBERS)
    rows = kb.sparql_query(
        PREFIXES
        + """SELECT ?x ?s ?cnt WHERE {
              ?x foaf:surname ?s .
              { SELECT ?x (COUNT(?a) AS ?cnt) WHERE { ?x foaf:age ?a } GROUP BY ?x } }"""
    )
    assert len(rows) == 3
    assert all(b["cnt"].v == "1" and b["cnt"].dt.endswith("integer") for b in rows)


def test_subquery_plain_select_with_limit(kb):
    load_fixture(kb, TEST_TRIPLES_NUMBERS)
    rows = kb.sparql_query(
        PREFIXES
        + """SELECT ?x ?s WHERE {
              ?x foaf:surname ?s .
              { SELECT ?x WHERE { ?x foaf:firstname ?f } } }"""
    )
    # inner projects only ?x (b and c have firstnames); join restricts outer
    assert {b["x"].v.rsplit("/", 1)[-1] for b in rows} == {"b", "c"}
    assert all("f" not in b for b in rows)  # ?f does NOT leak out


def test_subquery_union_branch_clear_error(kb):
    load_fixture(kb, TEST_TRIPLES_NUMBERS)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="UNION branch"):
        kb.sparql_query(
            PREFIXES
            + """SELECT ?x WHERE {
                  { SELECT ?x WHERE { ?x foaf:age ?a } } UNION { ?x foaf:surname ?s } }"""
        )


# ---- Turtle-style abbreviations in query strings (Jena-surface parity) ----


def test_predicate_object_lists(kb):
    load_fixture(kb, TEST_TRIPLES_NUMBERS)
    rows = kb.sparql_query(
        PREFIXES
        + """SELECT ?x ?s ?a WHERE {
              ?x foaf:surname ?s ; foaf:age ?a . }"""
    )
    assert len(rows) == 3
    assert {(b["s"].v, b["a"].v) for b in rows} == {
        ("Hacker", "40"), ("Hacker", "50")
    }
    # object list with ','
    rows = kb.sparql_query(
        PREFIXES + 'SELECT ?x WHERE { ?x foaf:age 40 , ?a . }'
    )
    assert {b["x"].v.rsplit("/", 1)[-1] for b in rows} == {"a", "b"}
    # trailing semicolon before the dot is legal
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?x WHERE { ?x foaf:surname ?s ; . }"
    )
    assert len(rows) == 3


def test_blank_node_property_lists(kb):
    load_fixture(kb, TEST_TRIPLES_NUMBERS)
    # subject position: fresh non-capturing bnode
    rows = kb.sparql_query(
        PREFIXES
        + 'SELECT ?a WHERE { [ foaf:surname "Hacker"@en ; foaf:age ?a ] . }'
    )
    assert {b["a"].v for b in rows} == {"40", "50"}
    # object position, nested
    kb.add_statements(
        [
            ("ex/z", "ex/owns", "ex/car1"),
            ("ex/car1", "ex/color", "ex/red"),
        ]
    )
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?z WHERE { ?z ex:owns [ ex:color ex:red ] . }"
    )
    assert {b["z"].v.rsplit("/", 1)[-1] for b in rows} == {"z"}
    # the bnode vars must NOT leak into SELECT *
    rows = kb.sparql_query(
        PREFIXES + "SELECT * WHERE { ?z ex:owns [ ex:color ex:red ] . }"
    )
    assert set(rows[0].keys()) == {"z"}


EXISTS_EXPR_DATA = [
    ("ex/a", "foaf/name", "Ann"), ("ex/a", "foaf/age", [40, "xsd/integer"]),
    ("ex/b", "foaf/name", "Bea"), ("ex/b", "foaf/age", [30, "xsd/integer"]),
    ("ex/c", "foaf/name", "Cy"), ("ex/c", "foaf/age", [30, "xsd/integer"]),
    ("ex/a", "foaf/knows", "ex/b"), ("ex/b", "foaf/knows", "ex/c"),
]


def test_exists_as_subexpression(kb):
    # §17.4.1.4-5 ExistsFunc in expression position: compiled by
    # truth-assignment arm splitting (semi/anti join per arm)
    load_fixture(kb, EXISTS_EXPR_DATA)

    def names(q):
        return sorted(b["x"].v.rsplit("/", 1)[-1] for b in kb.sparql_query(q))

    assert names(
        PREFIXES + "SELECT ?x WHERE { ?x foaf:age ?a "
        "FILTER(EXISTS { ?x foaf:knows ?y } && ?a > 35) }"
    ) == ["a"]
    assert names(
        PREFIXES + "SELECT ?x WHERE { ?x foaf:age ?a "
        "FILTER(EXISTS { ?x foaf:knows ?y } || ?a > 35) }"
    ) == ["a", "b"]
    assert names(
        PREFIXES + "SELECT ?x WHERE { ?x foaf:age ?a "
        "FILTER(NOT EXISTS { ?x foaf:knows ?y } && ?a = 30) }"
    ) == ["c"]
    # two EXISTS terms (4 arms): knows someone AND nobody knows them
    assert names(
        PREFIXES + "SELECT ?x WHERE { ?x foaf:age ?a "
        "FILTER(EXISTS { ?x foaf:knows ?y } && !EXISTS { ?z foaf:knows ?x }) }"
    ) == ["a"]
    # parenthesized whole-filter forms normalize to the clause-level join
    assert names(
        PREFIXES + "SELECT ?x WHERE { ?x foaf:age ?a "
        "FILTER(!EXISTS { ?x foaf:knows ?y }) }"
    ) == ["c"]
    # correlated: inner references outer ?a only in its FILTER
    assert names(
        PREFIXES + "SELECT ?x WHERE { ?x foaf:age ?a "
        "FILTER(EXISTS { ?y foaf:age ?b FILTER(?b > ?a) } && ?a > 10) }"
    ) == ["b", "c"]


def test_exists_expr_under_non_boolean_and_in_bind(kb):
    # round 5: EXISTS under ANY operator (IF/comparison) and in BIND value
    # position — substitution arm splitting, no constant-arm pruning
    load_fixture(kb, EXISTS_EXPR_DATA)
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?x WHERE { ?x foaf:age ?a "
        'FILTER(IF(EXISTS { ?x foaf:knows ?y }, "t", "f") = "t") }'
    )
    assert sorted(b["x"].v.rsplit("/", 1)[-1] for b in rows) == ["a", "b"]
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?x ?e WHERE { ?x foaf:age ?a "
        "BIND(EXISTS { ?x foaf:knows ?y } AS ?e) }"
    )
    got = {(b["x"].v.rsplit("/", 1)[-1], b["e"].v) for b in rows}
    assert got == {("a", "true"), ("b", "true"), ("c", "false")}
    # boxed as a real xsd:boolean term
    assert all(b["e"].dt.endswith("boolean") for b in rows)
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?x ?e WHERE { ?x foaf:age ?a "
        'BIND(IF(NOT EXISTS { ?x foaf:knows ?y }, "lonely", "social") AS ?e) }'
    )
    got = {(b["x"].v.rsplit("/", 1)[-1], b["e"].v) for b in rows}
    assert got == {("a", "social"), ("b", "social"), ("c", "lonely")}
    # EXISTS in a BIND composes with later clauses reading the bound var
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?x WHERE { ?x foaf:age ?a "
        "BIND(EXISTS { ?x foaf:knows ?y } AS ?e) FILTER(?e && ?a > 35) }"
    )
    assert sorted(b["x"].v.rsplit("/", 1)[-1] for b in rows) == ["a"]


def test_empty_set_aggregate_base_cases(kb):
    # §18.5.1.5-6: Sum({}) = 0, Avg({}) = 0; GROUP_CONCAT({}) = "";
    # COUNT({}) = 0; MIN/MAX/SAMPLE({}) = error -> unbound
    load_fixture(kb, EXISTS_EXPR_DATA)
    rows = kb.sparql_query(
        PREFIXES + "SELECT (SUM(?a) AS ?s) (AVG(?a) AS ?m) (COUNT(?a) AS ?c) "
        "(GROUP_CONCAT(?a) AS ?g) (MAX(?a) AS ?mx) "
        "WHERE { ?x foaf:age ?a FILTER(?a > 99) }"
    )
    assert len(rows) == 1
    b = rows[0]
    assert (b["s"].v, b["m"].v, b["c"].v, b["g"].v) == ("0", "0", "0", "")
    assert "mx" not in b


def test_numeric_literal_forms(kb):
    # grammar [146-148]: INTEGER -> xsd:integer, DECIMAL (.5 / 2.5, no
    # exponent) -> xsd:decimal, DOUBLE (1e3) -> xsd:double
    rows = kb.sparql_query(
        "SELECT (1e3 AS ?a) (.5 + .25 AS ?b) (2.5 AS ?c) (1 + 1 AS ?d) WHERE {}"
    )
    b = rows[0]
    got = {k: (v.v, v.dt.rsplit("#")[-1]) for k, v in b.items()}
    assert got == {
        "a": ("1000", "double"),
        "b": ("0.75", "decimal"),
        "c": ("2.5", "decimal"),
        "d": ("2", "integer"),
    }
    # a trailing '5 .' in triple position still terminates the triple
    load_fixture(kb, [("ex/a", "ex/v", [5, "xsd/integer"])])
    rows = kb.sparql_query(
        "PREFIX ex: <http://www.example.org/> "
        "SELECT ?x WHERE { ?x ex:v 5 . ?x ex:v ?v FILTER(?v > .5) }"
    )
    assert len(rows) == 1


# ---- round-5 probe fixes: trailing VALUES, CONSTRUCT WHERE shortform,
# aggregate error propagation (§18.5.1.5-6)


def test_trailing_values_clause_joins(kb):
    """Grammar [28] ValuesClause: VALUES after the WHERE group (and after
    solution modifiers) joins the data block — it must not be ignored."""
    kb.add_statements([("ex/a", "ex/t", ["x"]), ("ex/b", "ex/t", ["y"])])
    rows = kb.sparql_query(
        "PREFIX ex: <http://www.example.org/> "
        'SELECT ?s ?t WHERE { ?s ex:t ?t } VALUES ?t { "x" }'
    )
    assert [r["s"].v.rsplit("/", 1)[-1] for r in rows] == ["a"]
    # ASK form carries the same clause
    assert not kb.sparql_ask(
        "PREFIX ex: <http://www.example.org/> "
        'ASK { ?s ex:t ?t } VALUES ?t { "nope" }'
    )


def test_trailing_values_with_aggregation_refuses(kb):
    import pytest as _pytest

    kb.add_statements([("ex/a", "ex/t", ["x"])])
    with _pytest.raises(ValueError, match="trailing VALUES"):
        kb.sparql_query(
            "PREFIX ex: <http://www.example.org/> "
            "SELECT (COUNT(?t) AS ?c) WHERE { ?s ex:t ?t } GROUP BY ?s "
            'VALUES ?s { "x" }'
        )


def test_construct_where_shortform(kb):
    """§10.2.3: CONSTRUCT WHERE { BGP } uses the pattern as the template."""
    kb.add_statements([("ex/a", "ex/t", ["x"]), ("ex/b", "ex/t", ["y"])])
    out = kb.sparql_construct(
        "PREFIX ex: <http://www.example.org/> CONSTRUCT WHERE { ?s ex:t ?o }"
    )
    n = out.count() if hasattr(out, "count") else len(out)
    assert n == 2
    # only plain BGPs are legal in the shortform
    import pytest as _pytest

    with _pytest.raises(ValueError, match="shortform"):
        kb.sparql_construct(
            "PREFIX ex: <http://www.example.org/> "
            'CONSTRUCT WHERE { ?s ex:t ?o FILTER(?o = "x") }'
        )


def test_sum_avg_error_element_makes_group_unbound(kb):
    """§18.5.1.5-6 via op:numeric-add: one non-numeric (or unbound) element
    errors the whole group's SUM/AVG -> unbound, never a skip-the-bad-rows
    partial total; COUNT(?v) still counts bound terms; the empty-group
    SUM=0/AVG=0 base case survives the error gate."""
    kb.add_statements(
        [
            ("ex/a", "ex/v", ["1", "xsd/integer"]),
            ("ex/b", "ex/v", ["oops"]),
        ]
    )
    rows = kb.sparql_query(
        "PREFIX ex: <http://www.example.org/> "
        "SELECT (SUM(?v) AS ?s) (AVG(?v) AS ?a) (COUNT(?v) AS ?c) "
        "WHERE { ?x ex:v ?v }"
    )
    b = rows[0]
    assert "s" not in b or b["s"] is None
    assert "a" not in b or b["a"] is None
    assert b["c"].v == "2"
    rows = kb.sparql_query(
        "PREFIX ex: <http://www.example.org/> "
        "SELECT (SUM(?v) AS ?s) (AVG(?v) AS ?a) WHERE { ?x ex:nope ?v }"
    )
    assert rows[0]["s"].v == "0" and rows[0]["a"].v == "0"


def test_order_by_bracketted_expression_and_trailing_tokens(kb):
    """Grammar [24] OrderCondition: a bare BrackettedExpression is a valid
    ascending key — and trailing tokens after a complete query are a syntax
    error (silently ignoring them once hid exactly this mis-parse)."""
    kb.add_statements([
        ("ex/a", "ex/x", [1, "xsd/integer"]), ("ex/a", "ex/y", [9, "xsd/integer"]),
        ("ex/b", "ex/x", [5, "xsd/integer"]), ("ex/b", "ex/y", [1, "xsd/integer"]),
    ])
    rows = kb.sparql_query(
        "PREFIX ex: <http://www.example.org/> "
        "SELECT ?s WHERE { ?s ex:x ?x . ?s ex:y ?y } ORDER BY (?x + ?y)"
    )
    assert [r["s"].v.rsplit("/", 1)[-1] for r in rows] == ["b", "a"]
    with pytest.raises(ValueError, match="trailing token"):
        kb.sparql_query(
            "PREFIX ex: <http://www.example.org/> "
            "SELECT ?s WHERE { ?s ex:x ?x } BOGUS"
        )


def test_lang_of_non_literal_is_error(kb):
    """§17.4.2.6: LANG takes a literal; an IRI argument is a per-row
    expression error -> unbound / FILTER-dropped (Jena parity)."""
    kb.add_statements([("ex/a", "ex/p", "ex/b"), ("ex/a", "ex/n", ["x"])])
    rows = kb.sparql_query(
        "PREFIX ex: <http://www.example.org/> "
        "SELECT ?s (LANG(?o) AS ?l) WHERE { ?s ex:p ?o }"
    )
    assert len(rows) == 1 and rows[0].get("l") is None
    rows = kb.sparql_query(
        "PREFIX ex: <http://www.example.org/> "
        'SELECT ?s WHERE { ?s ex:p ?o FILTER(LANG(?o) = "") }'
    )
    assert rows == []
    # literals still answer: simple literal tag is ""
    rows = kb.sparql_query(
        "PREFIX ex: <http://www.example.org/> "
        'SELECT ?s WHERE { ?s ex:n ?o FILTER(LANG(?o) = "") }'
    )
    assert len(rows) == 1


def test_empty_prefix_and_base_directive(kb):
    """Grammar [4-5]: BASE <iri> resolves relative IRIREFs (RFC 3986) and
    PREFIX : <iri> declares the empty prefix; a bare ':' names the
    namespace IRI itself."""
    kb.add_statements([("ex/a", "ex/p", "ex/b")])
    rows = kb.sparql_query(
        "PREFIX : <http://www.example.org/> SELECT ?s WHERE { ?s :p :b }"
    )
    assert [r["s"].v.rsplit("/", 1)[-1] for r in rows] == ["a"]
    rows = kb.sparql_query(
        "BASE <http://www.example.org/> SELECT ?s WHERE { ?s <p> <b> }"
    )
    assert [r["s"].v.rsplit("/", 1)[-1] for r in rows] == ["a"]
    # dot-segment removal in a relative ref
    kb.add_statements([("http://www.example.org/up", "ex/q", ["z"])])
    assert kb.sparql_ask(
        "BASE <http://www.example.org/dir/> "
        "ASK { <../up> <http://www.example.org/q> ?v }"
    )


def test_construct_where_rejects_paths_and_iri_base_resolution(kb):
    """§10.2.3 TriplesTemplate: the CONSTRUCT WHERE shortform cannot hold
    property paths; §17.4.2.8: IRI(constant) resolves against BASE."""
    kb.add_statements([("ex/a", "ex/p", "ex/b")])
    with pytest.raises(ValueError, match="property paths"):
        kb.sparql_construct(
            "PREFIX ex: <http://www.example.org/> "
            "CONSTRUCT WHERE { ?s ex:p+ ?o }"
        )
    rows = kb.sparql_query(
        'BASE <http://www.example.org/dir/> '
        'SELECT (IRI("rel") AS ?u) (IRI("../up") AS ?v) '
        '(IRI("http://abs/") AS ?w) WHERE {}'
    )
    b = rows[0]
    assert b["u"].v == "http://www.example.org/dir/rel"
    assert b["v"].v == "http://www.example.org/up"
    assert b["w"].v == "http://abs/"

"""Pattern-query suite — ports kr-core test_sparql.clj (fixture oracles and
expected counts in FIXTURES.md §C; citations inline)."""

from tests.conftest import (
    TEST_TRIPLES,
    TEST_TRIPLES_6_1,
    TEST_TRIPLES_6_3,
    TEST_TRIPLES_7,
    TEST_TRIPLES_10_2_1,
    TEST_TRIPLES_CUSTOM_TYPE,
    TEST_TRIPLES_LANG,
    TEST_TRIPLES_NUMBERS,
    load_fixture,
)


def test_ask_and_select(kb):
    # test_sparql.clj:105-112 — bnode joins as non-capturing variable
    load_fixture(kb, TEST_TRIPLES)
    assert kb.ask([("_/p", "foaf/name", "?/name")])
    res = kb.query([("_/p", "foaf/name", "?/name"), ("_/p", "foaf/mbox", "?/email")])
    assert len(res) == 2
    names = {b["name"].v for b in res}
    assert names == {"Johnny Lee Outlaw", "Peter Goodguy"}
    # bnode var is not in the result bindings
    assert all(set(b) == {"name", "email"} for b in res)


def test_optional(kb):
    # test_sparql.clj:114-119 — 2 names + 1 with no mbox -> 3 rows
    load_fixture(kb, TEST_TRIPLES_6_1)
    res = kb.query(
        [
            ("?/person", "foaf/name", "?/name"),
            (":optional", ("?/person", "foaf/mbox", "?/email")),
        ]
    )
    assert len(res) == 3
    with_email = [b for b in res if "email" in b]
    assert len(with_email) == 2
    assert all(b["name"].v == "Alice" for b in with_email)


def test_count(kb):
    # test_sparql.clj:121-125
    load_fixture(kb, TEST_TRIPLES_6_1)
    n = kb.count(
        [
            ("?/person", "foaf/name", "?/name"),
            (":optional", ("?/person", "foaf/mbox", "?/email")),
        ]
    )
    assert n == 3


def test_two_optionals(kb):
    # test_sparql.clj:128-133 — two independent optionals -> 2 rows
    load_fixture(kb, TEST_TRIPLES_6_3)
    res = kb.query(
        [
            ("?/person", "foaf/name", "?/name"),
            (":optional", ("?/person", "foaf/mbox", "?/email")),
            (":optional", ("?/person", "foaf/homepage", "?/hpage")),
        ]
    )
    assert len(res) == 2
    by_name = {b["name"].v: b for b in res}
    assert "hpage" in by_name["Alice"] and "email" not in by_name["Alice"]
    assert "email" in by_name["Bob"] and "hpage" not in by_name["Bob"]


def test_optional_var_disjoint_empty(kb):
    # SPARQL LeftJoin-on-true semantics (sparql.clj:241-244; semantics per
    # reference OPTIONAL tests test_sparql.clj:114-133): an OPTIONAL sharing
    # NO variable with the required part, whose side matches nothing, must
    # still keep every required-part row with the optional vars unbound.
    kb.add("ex/a", "rdf/type", "foaf/Person")
    res = kb.query(
        [
            ("?/x", "rdf/type", "foaf/Person"),
            (":optional", ("?/y", "foaf/mbox", "?/z")),
        ]
    )
    assert len(res) == 1
    assert res[0]["x"].v.endswith("a")
    assert "y" not in res[0] and "z" not in res[0]


def test_optional_var_disjoint_nonempty(kb):
    # LeftJoin on true with a non-empty optional side = cross product of the
    # required rows with the optional-side bindings (2 persons x 1 mbox -> 2).
    kb.add_statements(
        [
            ("ex/a", "rdf/type", "foaf/Person"),
            ("ex/b", "rdf/type", "foaf/Person"),
            ("ex/m", "foaf/mbox", "<mailto:x@example.org>"),
        ]
    )
    res = kb.query(
        [
            ("?/x", "rdf/type", "foaf/Person"),
            (":optional", ("?/y", "foaf/mbox", "?/z")),
        ]
    )
    assert len(res) == 2
    assert all("y" in b and "z" in b for b in res)


def test_union(kb):
    # test_sparql.clj:135-143
    load_fixture(kb, TEST_TRIPLES_7)
    res = kb.query(
        [
            (
                ":union",
                [("?/book", "dc10/title", "?/title"), ("?/book", "dc10/creator", "?/author")],
                [("?/book", "dc11/title", "?/title"), ("?/book", "dc11/creator", "?/author")],
            )
        ]
    )
    assert len(res) == 2
    assert {b["author"].v for b in res} == {"Alice", "Bob"}


def test_union_per_clause(kb):
    # test_sparql.clj:145-152 — two unions conjoined
    load_fixture(kb, TEST_TRIPLES_10_2_1)
    res = kb.query(
        [
            (
                ":union",
                [("?/x", "foaf/givenname", "?/gname")],
                [("?/x", "foaf/firstname", "?/gname")],
            ),
            (
                ":union",
                [("?/x", "foaf/family_name", "?/fname")],
                [("?/x", "foaf/surname", "?/fname")],
            ),
        ]
    )
    assert len(res) == 2
    assert {(b["gname"].v, b["fname"].v) for b in res} == {
        ("Alice", "Hacker"),
        ("Bob", "Hacker"),
    }


def test_bound_not_bound(kb):
    # test_sparql.clj:154-166 — bound -> 2, not bound -> 1
    load_fixture(kb, TEST_TRIPLES_6_1)
    base = [
        ("?/person", "foaf/name", "?/name"),
        (":optional", ("?/person", "foaf/mbox", "?/email")),
    ]
    res = kb.query(base + [(":bound", "?/email")])
    assert len(res) == 2
    res = kb.query(base + [(":not", (":bound", "?/email"))])
    assert len(res) == 1
    assert res[0]["name"].v == "Bob"


def test_optional_filter_outer_var(kb):
    # SPARQL §8.3.3 LeftJoin(A, B, F): F evaluates over the MERGED solution,
    # so a filter inside OPTIONAL referencing an outer-group var conditions
    # the join — it must NOT drop the optional bindings for rows where the
    # outer value satisfies it (Jena behavior; VERDICT r3 'What's wrong #1').
    kb.add_statements(
        [
            ("ex/a", "foaf/name", "Alice"),
            ("ex/a", "foaf/knows", "ex/b"),
            ("ex/b", "foaf/name", "Bob"),
        ]
    )
    res = kb.query(
        [
            ("?/x", "foaf/name", "?/n"),
            (":optional", ("?/x", "foaf/knows", "?/k"), ("=", "?/n", "Alice")),
        ]
    )
    by_name = {b["n"].v: b for b in res}
    assert len(res) == 2
    assert by_name["Alice"]["k"].v == "http://www.example.org/b"
    assert "k" not in by_name["Bob"]

    # control: filter over inner vars only is unchanged (evaluates inside)
    res = kb.query(
        [
            ("?/x", "foaf/name", "?/n"),
            (":optional", ("?/x", "foaf/knows", "?/k"),
             ("=", "?/k", "<http://www.example.org/b>")),
        ]
    )
    by_name = {b["n"].v: b for b in res}
    assert by_name["Alice"]["k"].v == "http://www.example.org/b"
    assert "k" not in by_name["Bob"]


def test_optional_filter_outer_var_string_surface(kb):
    # same LeftJoin semantics through the raw-SPARQL string path; STR()
    # sidesteps the default-language tag on the stored literal
    kb.add_statements(
        [
            ("ex/a", "foaf/name", "Alice"),
            ("ex/a", "foaf/knows", "ex/b"),
            ("ex/b", "foaf/name", "Bob"),
        ]
    )
    rows = kb.sparql_query(
        """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
           SELECT ?n ?k WHERE {
             ?x foaf:name ?n
             OPTIONAL { ?x foaf:knows ?k FILTER(STR(?n) = "Alice") } }"""
    )
    by_name = {b["n"].v: b for b in rows}
    assert len(rows) == 2
    assert by_name["Alice"]["k"].v == "http://www.example.org/b"
    assert "k" not in by_name["Bob"]


def test_optional_filter_nowhere_bound_var(kb):
    # a filter var bound in NEITHER side: expression error -> false -> the
    # join never matches, every left row survives bare (never a crash)
    kb.add_statements(
        [
            ("ex/a", "foaf/name", "Alice"),
            ("ex/a", "foaf/knows", "ex/b"),
        ]
    )
    res = kb.query(
        [
            ("?/x", "foaf/name", "?/n"),
            (":optional", ("?/x", "foaf/knows", "?/k"), ("=", "?/ghost", 1)),
        ]
    )
    assert len(res) == 1 and "k" not in res[0]


def test_optional_filter_mixed_outer_inner(kb):
    # filter referencing both an outer var and an optional-side var joins on
    # the combined condition
    kb.add_statements(
        [
            ("ex/a", "foaf/age", 30),
            ("ex/a", "foaf/bonus", 40),
            ("ex/b", "foaf/age", 50),
            ("ex/b", "foaf/bonus", 40),
        ]
    )
    res = kb.query(
        [
            ("?/x", "foaf/age", "?/age"),
            (":optional", ("?/x", "foaf/bonus", "?/b"), ("<", "?/age", "?/b")),
        ]
    )
    by_age = {int(b["age"].v): b for b in res}
    assert len(res) == 2
    assert by_age[30]["b"].v == "40"
    assert "b" not in by_age[50]


def test_numeric_equality_value_space(kb):
    # test_sparql.clj:182-190 — ages equal across typed/untyped, persons differ
    load_fixture(kb, TEST_TRIPLES_NUMBERS)
    res = kb.query(
        [
            ("?/person", "foaf/age", "?/age1"),
            ("?/person2", "foaf/age", "?/age2"),
            ("=", "?/age1", "?/age2"),
            ("!=", "?/person", "?/person2"),
        ]
    )
    assert len(res) == 2  # (a,b) and (b,a)


def test_numeric_greater_than(kb):
    # test_sparql.clj:192-197
    load_fixture(kb, TEST_TRIPLES_NUMBERS)
    res = kb.query(
        [
            ("?/person", "foaf/age", "?/age1"),
            ("?/person2", "foaf/age", "?/age2"),
            (">", "?/age1", "?/age2"),
        ]
    )
    assert len(res) == 2  # c>a and c>b


def test_nary_or(kb):
    # test_sparql.clj:199-205 — n-ary :or over ages -> 3
    load_fixture(kb, TEST_TRIPLES_NUMBERS)
    res = kb.query(
        [
            ("?/person", "foaf/age", "?/age"),
            (":or", ("=", "?/age", 40), ("=", "?/age", 50), ("=", "?/age", 60)),
        ]
    )
    assert len(res) == 3


def test_boxed_number_queries(kb):
    # test_sparql.clj:207-220 — value-space equality matrix
    load_fixture(kb, TEST_TRIPLES_NUMBERS)
    assert kb.count([("?/person", "foaf/age", 40)]) == 2
    assert kb.count([("?/person", "foaf/age", [40])]) == 0  # plain string "40"
    assert kb.count([("?/person", "foaf/age", [40, "xsd/integer"])]) == 2
    assert kb.count([("?/person", "foaf/age", ["40", "xsd/integer"])]) == 2
    assert kb.count([("?/person", "foaf/age", 50)]) == 1


def test_integer_comes_back_typed(kb):
    # test_sparql.clj:266-269 — Alice's age is integer 40
    load_fixture(kb, TEST_TRIPLES_NUMBERS)
    res = kb.query([("ex/a", "foaf/age", "?/age")])
    assert len(res) == 1
    t = res[0]["age"]
    assert t.v == "40" and t.dt.endswith("#integer")
    assert int(t.num_val()) == 40


def test_lang_tags(kb):
    # test_sparql.clj:223-244 (C7 oracles)
    load_fixture(kb, TEST_TRIPLES_LANG)
    assert kb.count([("?/x", "foaf/firstname", "?/n")]) == 3
    # langMatches en -> 2
    res = kb.query(
        [
            ("?/x", "foaf/firstname", "?/n"),
            (":langMatches", (":lang", "?/n"), ["en"]),
        ]
    )
    assert len(res) == 2
    assert kb.count([("?/x", "foaf/firstname", "Bob")]) == 1  # "Bob"@en only
    assert kb.count([("?/x", "foaf/firstname", "Alice")]) == 1
    assert kb.count([("?/x", "foaf/firstname", ["Alice", "en"])]) == 1
    assert kb.count([("?/x", "foaf/firstname", ["Alice"])]) == 0
    assert kb.count([("?/x", "foaf/firstname", "bob")]) == 0


def test_visitor(kb):
    # test_sparql.clj:249-262 — visitor sees 3 bindings of 2 vars
    load_fixture(kb, TEST_TRIPLES_LANG)
    seen = list(kb.visit([("?/x", "foaf/firstname", "?/n")]))
    assert len(seen) == 3
    assert all(set(b) == {"x", "n"} for b in seen)


def test_string_equality_ops(kb):
    # test_sparql.clj:291-300 — = "Bob" matches (auto-lang), = ["Bob"] doesn't
    load_fixture(kb, TEST_TRIPLES_6_3)
    assert (
        len(kb.query([("?/p", "foaf/name", "?/name"), ("=", "?/name", "Bob")])) == 1
    )
    assert (
        len(kb.query([("?/p", "foaf/name", "?/name"), ("=", "?/name", ["Bob"])])) == 0
    )


def test_regex(kb):
    # test_sparql.clj:302-307 — regex "^ali" flags "i" -> 1
    load_fixture(kb, TEST_TRIPLES_6_3)
    res = kb.query(
        [("?/p", "foaf/name", "?/name"), (":regex", "?/name", ["^ali"], ["i"])]
    )
    assert len(res) == 1
    assert res[0]["name"].v == "Alice"


def test_uri_forms_equivalent(kb):
    # test_sparql.clj:310-324 — CURIE and raw URI forms match the same triple
    load_fixture(kb, TEST_TRIPLES_6_1 + [("ex/a", "foaf/knows", "ex/b")])
    assert kb.count([("ex/a", "foaf/knows", "?/x")]) == 1
    assert kb.count([("?/x", "foaf/knows", "ex/b")]) == 1
    assert kb.count([("<http://www.example.org/a>", "foaf/knows", "?/x")]) == 1
    assert (
        kb.count([("?/x", "<http://xmlns.com/foaf/0.1/knows>", "<http://www.example.org/b>")])
        == 1
    )


def test_custom_datatypes(kb):
    # test_sparql.clj:327-342 (C8)
    load_fixture(kb, TEST_TRIPLES_CUSTOM_TYPE)
    assert kb.count([("?/x", "ex/p", "?/custom")]) == 2
    assert kb.count([("?/x", "ex/p", ["foo", "ex/custom"])]) == 1
    # URI-form datatype equivalent to CURIE form
    assert kb.count([("?/x", "ex/p", ["foo", "<http://www.example.org/custom>"])]) == 1


def test_select_vars_and_distinct_limit(kb):
    # Q13/Q14 (sparql.clj:15-17,26)
    load_fixture(kb, TEST_TRIPLES_NUMBERS)
    res = kb.query([("?/p", "foaf/surname", "?/sn")], select_vars=["?/sn"])
    assert len(res) == 3
    res = kb.query([("?/p", "foaf/surname", "?/sn")], select_vars=["?/sn"], distinct=True)
    assert len(res) == 1 and res[0]["sn"].v == "Hacker"
    res = kb.query([("?/p", "foaf/surname", "?/sn")], limit=2)
    assert len(res) == 2


def test_graph_scoped_pattern(kb):
    # Q12 (sparql.clj:222-233; test_rdf.clj:129-207)
    kb.add("ex/a", "ex/b", "ex/c", graph="ex/x")
    kb.add("ex/d", "ex/b", "ex/e", graph="ex/y")
    assert kb.count([("?/s", "ex/b", "?/o")]) == 2  # all graphs
    assert kb.count([("?/s", "ex/b", "?/o", "ex/x")]) == 1
    res = kb.query([("?/s", "ex/b", "?/o", "?/g")])
    assert {b["g"].v for b in res} == {
        "http://www.example.org/x",
        "http://www.example.org/y",
    }


def test_query_template(kb):
    # Q6 (sparql.clj:514-522)
    load_fixture(kb, TEST_TRIPLES)
    out = kb.query_template(
        ["?/name", "has-mbox", "?/email"],
        [("_/p", "foaf/name", "?/name"), ("_/p", "foaf/mbox", "?/email")],
    )
    assert len(out) == 2
    assert all(o[1] == "has-mbox" for o in out)


def test_pmap_query_count_some(kb):
    # §2.11 pmap fan-out parity (sparql.clj:613-640)
    from tests.conftest import TEST_TRIPLES_6_1, load_fixture

    load_fixture(kb, TEST_TRIPLES_6_1)
    patterns = [
        [("?/p", "rdf/type", "foaf/Person")],
        [("?/p", "foaf/name", "?/n")],
        [("?/p", "foaf/mbox", "?/m")],
    ]
    results = kb.pmap_query(patterns)
    assert [len(r) for r in results] == [2, 2, 2]
    assert kb.pmap_count(patterns) == [2, 2, 2]
    assert kb.pmap_some(patterns + [[("?/x", "ex/nope", "?/y")]])
    assert not kb.pmap_some([[("?/x", "ex/nope", "?/y")]])

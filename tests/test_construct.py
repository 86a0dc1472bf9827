"""CONSTRUCT suite — ports test_sparql_construct.clj:36-83."""

from tests.conftest import TEST_TRIPLES_6_1, TEST_TRIPLES_NUMBERS, load_fixture


def test_construct_one_template(kb):
    # test_sparql_construct.clj:36-39 — 2 persons -> 2 triples
    load_fixture(kb, TEST_TRIPLES_6_1)
    out = kb.construct(
        [("?/person", "ex/is", "ex/Person")],
        [("?/person", "rdf/type", "foaf/Person")],
    )
    assert out.count() == 2


def test_construct_duplicates_kept(kb):
    # test_sparql_construct.clj:41-45 — 2 bindings x 2 templates = 4
    # (duplicates are NOT collapsed: bag semantics)
    load_fixture(kb, TEST_TRIPLES_6_1)
    out = kb.construct(
        [("?/person", "ex/is", "ex/Person"), ("ex/somebody", "ex/is", "ex/Person")],
        [("?/person", "rdf/type", "foaf/Person")],
    )
    assert out.count() == 4
    # the constant template row appears twice (once per binding)
    assert (
        out.filter(out.s == "http://www.example.org/somebody").count() == 2
    )


def test_construct_visit(kb):
    # test_sparql_construct.clj construct-visit
    load_fixture(kb, TEST_TRIPLES_6_1)
    seen = list(
        kb.construct_visit(
            [("?/person", "ex/is", "ex/Person")],
            [("?/person", "rdf/type", "foaf/Person")],
        )
    )
    assert len(seen) == 2
    assert all(p.v.endswith("is") for (_, p, _) in seen)


def test_construct_literals_both_sides(kb):
    # test_sparql_construct.clj:72-83 — literal object carried through; 3 ages
    load_fixture(kb, TEST_TRIPLES_NUMBERS)
    out = kb.construct(
        [("?/person", "ex/years", "?/age")],
        [("?/person", "foaf/age", "?/age")],
    )
    rows = out.collect()
    assert len(rows) == 3
    assert all(r.o_kind == "literal" and r.o_datatype.endswith("#integer") for r in rows)
    assert sorted(int(r.num_val) for r in rows) == [40, 40, 50]


def test_construct_feeds_add_rows(kb):
    # constructed triples round-trip into a KB (set semantics dedups)
    load_fixture(kb, TEST_TRIPLES_6_1)
    out = kb.construct(
        [("?/person", "ex/is", "ex/Person"), ("ex/somebody", "ex/is", "ex/Person")],
        [("?/person", "rdf/type", "foaf/Person")],
    )
    kb.add_rows(out)
    assert kb.count([("?/x", "ex/is", "ex/Person")]) == 3  # a, b, somebody


def test_construct_template_bnode_fresh_per_solution(kb):
    """§16.2: a blank node in the CONSTRUCT template mints a FRESH node per
    solution (Jena) — one shared label would wrongly merge them; within a
    solution the same template label is the same node across triples."""
    load_fixture(kb, [("ex/a", "ex/n", ["x"]), ("ex/b", "ex/n", ["y"])])
    rows = kb.sparql_construct(
        "PREFIX ex: <http://www.example.org/> "
        "CONSTRUCT { ?s ex:has _:m . _:m ex:val ?n } WHERE { ?s ex:n ?n }"
    ).collect()
    assert len(rows) == 4
    has = {r["s"]: r["o"] for r in rows if r["p"].endswith("has")}
    val = {r["s"]: r["o"] for r in rows if r["p"].endswith("val")}
    assert len(set(has.values())) == 2  # distinct across solutions
    assert set(has.values()) == set(val.keys())  # same node within one
    assert all(r["o_kind"] == "bnode" for r in rows if r["p"].endswith("has"))

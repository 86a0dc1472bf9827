"""SPARQL compatibility-join semantics (§18.3 'compatible mappings') and
positional group translation (§18.2.2.6).

A var left unbound by one UNION branch / an OPTIONAL is compatible with any
binding when the solution joins a later pattern, and the merged solution
takes the bound side — a strict equi-join on the NULL column silently drops
those solutions. The reference gets this for free from Jena's algebra
(sparql.clj:560-603 hands raw strings to ARQ); here CompiledPattern tracks
maybe-null vars and joins them with a null-tolerant residual condition while
definitely-bound vars stay hash-join equi keys.

Positional translation: OPTIONAL / MINUS / BIND / VALUES each apply to the
group accumulated so far, so a triple AFTER an OPTIONAL joins the LeftJoin
result (hoisting it before the OPTIONAL changes answers when it shares a
var the OPTIONAL may leave unbound). FILTERs stay group-scoped (§18.2.2.2).
"""

from tests.conftest import load_fixture

PREFIXES = """
PREFIX foaf: <http://xmlns.com/foaf/0.1/>
PREFIX ex: <http://www.example.org/>
"""


def _pairs(rows, *names):
    out = []
    for b in rows:
        out.append(tuple(b[n].v if n in b else None for n in names))
    return sorted(out)


UNION_NICK = [
    ("ex/a", "foaf/name", "Ali"),
    ("ex/a", "foaf/nick", "Ali"),
    ("ex/b", "foaf/age", [30, "xsd/integer"]),
    ("ex/b", "foaf/nick", "Bobby"),
]


def test_union_partial_var_joins_upward(kb):
    # branch 2 leaves ?n unbound -> compatible with the nick binding; branch
    # 1 binds ?n="Ali" which must still equal the nick (strict for that row)
    load_fixture(kb, UNION_NICK)
    rows = kb.sparql_query(
        PREFIXES
        + """SELECT ?x ?n WHERE {
              { ?x foaf:name ?n } UNION { ?x foaf:age ?a }
              ?x foaf:nick ?n }"""
    )
    assert _pairs(rows, "x", "n") == [
        ("http://www.example.org/a", "Ali"),
        ("http://www.example.org/b", "Bobby"),
    ]


def test_union_partial_var_mismatch_still_drops(kb):
    # when the branch DID bind ?n, equality still applies
    load_fixture(kb, UNION_NICK)
    kb.add_statements([("ex/a", "foaf/name", "Alice")])  # != nick "Ali"
    rows = kb.sparql_query(
        PREFIXES
        + """SELECT ?x ?n WHERE {
              { ?x foaf:name ?n } UNION { ?x foaf:age ?a }
              ?x foaf:nick ?n
              FILTER(?n != "Alice") }"""
    )
    assert _pairs(rows, "x", "n") == [
        ("http://www.example.org/a", "Ali"),
        ("http://www.example.org/b", "Bobby"),
    ]


OPT_CHAIN = [
    ("ex/a", "ex/p", "ex/y1"),
    ("ex/y1", "ex/q", "ex/z1"),
    ("ex/b", "ex/p", "ex/y2"),  # y2 has no q -> ?z unbound for x=b
    ("ex/w1", "ex/r", "ex/z1"),
    ("ex/w2", "ex/r", "ex/z2"),
]


def test_triple_after_optional_joins_leftjoin_result(kb):
    # §18.2.2.6: Join(LeftJoin(BGP(?x p ?y), BGP(?y q ?z)), BGP(?w r ?z)).
    # x=a has z=z1 bound -> only w1; x=b has z unbound -> both w rows, with
    # ?z taken from the r-side. Hoisting `?w ex:r ?z` before the OPTIONAL
    # (the old compile) wrongly ADDS (a, z2, w2).
    load_fixture(kb, OPT_CHAIN)
    rows = kb.sparql_query(
        PREFIXES
        + """SELECT ?x ?z ?w WHERE {
              ?x ex:p ?y OPTIONAL { ?y ex:q ?z }
              ?w ex:r ?z }"""
    )
    E = "http://www.example.org/"
    assert _pairs(rows, "x", "z", "w") == [
        (E + "a", E + "z1", E + "w1"),
        (E + "b", E + "z1", E + "w1"),
        (E + "b", E + "z2", E + "w2"),
    ]


def test_nested_group_optional_var_joins_upward_pattern_api(kb):
    # same shape through the kr pattern surface: nested group + outer triple
    load_fixture(kb, OPT_CHAIN)
    rows = kb.query(
        [
            [("?/x", "ex/p", "?/y"), (":optional", ("?/y", "ex/q", "?/z"))],
            ("?/w", "ex/r", "?/z"),
        ]
    )
    E = "http://www.example.org/"
    assert sorted((b["x"].v, b["z"].v, b["w"].v) for b in rows) == [
        (E + "a", E + "z1", E + "w1"),
        (E + "b", E + "z1", E + "w1"),
        (E + "b", E + "z2", E + "w2"),
    ]


def test_values_compatible_with_optional_unbound(kb):
    # acc-side maybe-null var vs bound VALUES cells: unbound ?z fans out
    load_fixture(kb, OPT_CHAIN)
    rows = kb.sparql_query(
        PREFIXES
        + """SELECT ?x ?z WHERE {
              ?x ex:p ?y OPTIONAL { ?y ex:q ?z }
              VALUES ?z { ex:z1 ex:z9 } }"""
    )
    E = "http://www.example.org/"
    assert _pairs(rows, "x", "z") == [
        (E + "a", E + "z1"),
        (E + "b", E + "z1"),
        (E + "b", E + "z9"),
    ]


def test_bind_is_positional(kb):
    # BIND sees only vars bound BEFORE it (§10.1): ?a is bound by a LATER
    # triple, so ?b is unbound (expression error), not age+1
    load_fixture(kb, [("ex/a", "foaf/name", "Ann"), ("ex/a", "foaf/age", [40, "xsd/integer"])])
    rows = kb.sparql_query(
        PREFIXES
        + """SELECT ?x ?b WHERE {
              ?x foaf:name ?n
              BIND(?a + 1 AS ?b)
              ?x foaf:age ?a }"""
    )
    assert len(rows) == 1 and "b" not in rows[0]
    # and bound-before works
    rows = kb.sparql_query(
        PREFIXES
        + """SELECT ?x ?b WHERE {
              ?x foaf:age ?a BIND(?a + 1 AS ?b) }"""
    )
    assert len(rows) == 1 and rows[0]["b"].v == "41"


def test_triple_after_minus_joins_after_subtraction(kb):
    # §18.2.2.6: Join(Minus(BGP(?x p ?o), B), BGP(?x r ?w)) — the later
    # triple must not be folded into the MINUS left side (it would change
    # the shared-var domain of the subtraction)
    load_fixture(
        kb,
        [
            ("ex/a", "ex/p", "ex/o1"),
            ("ex/b", "ex/p", "ex/o2"),
            ("ex/a", "ex/bad", "ex/o1"),
            ("ex/a", "ex/r", "ex/w1"),
            ("ex/b", "ex/r", "ex/w2"),
        ],
    )
    rows = kb.sparql_query(
        PREFIXES
        + """SELECT ?x ?w WHERE {
              ?x ex:p ?o
              MINUS { ?x ex:bad ?o }
              ?x ex:r ?w }"""
    )
    E = "http://www.example.org/"
    assert _pairs(rows, "x", "w") == [(E + "b", E + "w2")]


def test_bind_var_usable_by_later_triple(kb):
    # positional translation makes Join(Extend(μ0, ?x, ex:a), BGP) legal:
    # the later triple JOINS on ?x (the pre-fold compile hoisted the triple
    # first and then rejected the BIND as a rebind)
    load_fixture(kb, [("ex/a", "foaf/name", "Ann"), ("ex/b", "foaf/name", "Bea")])
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?n WHERE { BIND(ex:a AS ?x) ?x foaf:name ?n }"
    )
    assert _pairs(rows, "n") == [("Ann",)]


def test_values_before_triples(kb):
    load_fixture(kb, [("ex/a", "foaf/name", "Ann"), ("ex/b", "foaf/name", "Bea"),
                      ("ex/c", "foaf/name", "Cy")])
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?n WHERE { VALUES ?x { ex:a ex:b } ?x foaf:name ?n }"
    )
    assert _pairs(rows, "n") == [("Ann",), ("Bea",)]


def test_strict_keys_stay_hash_join(kb):
    # scale guard: a maybe-null shared var must ride as a residual condition
    # on the strict-key hash join, not demote it to a nested-loop join
    load_fixture(kb, UNION_NICK)
    df = kb.sparql_query_df(
        PREFIXES
        + """SELECT ?x ?n WHERE {
              { ?x foaf:name ?n } UNION { ?x foaf:age ?a }
              ?x foaf:nick ?n }"""
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan


def test_construct_drops_unbound_template_instantiations(kb):
    # §16.2: CONSTRUCT emits no triple when a template var is unbound
    load_fixture(kb, [
        ("ex/a", "foaf/name", "Ann"), ("ex/a", "foaf/knows", "ex/b"),
        ("ex/b", "foaf/name", "Bea"),
    ])
    df = kb.construct(
        [("?/x", "ex/link", "?/k")],
        [("?/x", "foaf/name", "?/n"), (":optional", ("?/x", "foaf/knows", "?/k"))],
    )
    rows = df.collect()
    assert len(rows) == 1  # only ex/a has a ?k binding; ex/b row dropped
    assert rows[0].s.endswith("/a") and rows[0].o.endswith("/b")
    # raw-string surface agrees
    out = kb.sparql(
        "PREFIX foaf: <http://xmlns.com/foaf/0.1/> "
        "PREFIX ex: <http://www.example.org/> "
        "CONSTRUCT { ?x ex:link ?k } WHERE "
        "{ ?x foaf:name ?n OPTIONAL { ?x foaf:knows ?k } }"
    )
    assert out.count() == 1

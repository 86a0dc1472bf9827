"""Forward-rule suite — ports test_forward_rule.clj:222-426 (rules defined
at :99-214; see FIXTURES.md §C11 for md5 fixtures)."""

import pytest

from kr_spark.operators.rules import (
    RuleError,
    connected_rule,
    forward_safe,
    forward_safe_with_reification,
    run_forward_rule,
)
from tests.conftest import (
    TEST_TRIPLES_6_3,
    TEST_TRIPLES_MD5,
    TEST_TRIPLES_MD5_2,
    load_fixture,
)

RULE_1 = {
    "name": "rule-1",
    "head": [("?/hacker", "rdf/type", "ex/Hacker")],
    "body": [("?/hacker", "foaf/name", "?/name")],
}

RULE_2 = {
    "name": "rule-2",
    "head": [
        ("?/hacker", "rdf/type", "ex/Hacker"),
        ("?/hacker", "ex/controls", "?/org"),
        ("?/org", "rdf/type", "ex/HackerOrganization"),
    ],
    "body": [("?/hacker", "foaf/name", "?/name")],
    "reify": ["?/org"],
}

RULE_5 = {
    "name": "rule-5",
    "head": RULE_2["head"],
    "body": RULE_2["body"],
    "reify": [
        {"var": "?/org", "ln": ("localname", "?/hacker"), "ns": "ex", "prefix": "", "suffix": "ORG"}
    ],
}

RULE_6 = {
    "name": "rule-6",
    "head": RULE_2["head"],
    "body": RULE_2["body"],
    "reify": [{"var": "?/org", "ln": ("md5", "?/hacker"), "ns": "ex", "suffix": "_ORG"}],
}

RULE_7 = {
    "name": "rule-7",
    "head": [
        ("?/hacker", "ex/inDept", "?/dept"),
        ("?/dept", "rdf/type", "ex/Department"),
    ],
    "body": [
        ("?/hacker", "ex/hasBoss", "?/boss"),
        ("?/hacker", "ex/atCompany", "?/co"),
    ],
    "reify": [{"var": "?/dept", "ln": ("md5", "?/boss", "?/co"), "ns": "ex", "prefix": "DEPT_"}],
}

BAD_RULE_7 = {
    "name": "bad-rule-7",
    "head": RULE_7["head"],
    "body": RULE_7["body"],
    "reify": [{"var": "?/org", "ln": ("md5", "?/boss", "?/co"), "ns": "ex", "prefix": "DEPT_"}],
}

RULE_8 = {
    "name": "rule-8",
    "head": [
        ("?/hacker", "ex/inDept", "?/dept"),
        ("?/dept", "ex/deptID", "?/deptid"),
        ("?/dept", "rdf/type", "ex/Department"),
    ],
    "body": RULE_7["body"],
    "reify": [
        {"var": "?/dept", "ln": ("md5", "?/boss", "?/co"), "ns": "ex", "prefix": "DEPT_"},
        {"var": "?/deptid", "ln": ("md5", "?/dept", "?/co"), "ns": "ex", "prefix": "DEPT_"},
    ],
}

RULE_8_INV = {**RULE_8, "name": "rule-8-inv", "reify": list(reversed(RULE_8["reify"]))}

RULE_9_OPTIONAL = {
    "name": "rule-9-optional",
    "head": [("?/hacker", "ex/empname", "?/empname")],
    "body": [
        ("?/hacker", "ex/atCompany", "?/co"),
        (":optional", ("?/hacker", "foaf/firstname", "?/empname")),
    ],
    "reify": [{"var": "?/empname", "ln": ("md5", "?/hacker"), "ns": "ex", "prefix": "DEPT_"}],
}

RULE_10 = {
    "name": "rule-10",
    "head": RULE_8["head"],
    "body": RULE_8["body"],
    "reify": [
        {"var": "?/dept", "ln": ("md5", "?/boss", "?/co"), "ns": "ex", "prefix": "D_"},
        {"var": "?/deptid", "ln": ("md5", "ex/ID", "?/boss", "?/co"), "ns": "ex", "prefix": "D_"},
    ],
}

RULE_11_CYCLE = {
    "name": "rule-11-exception",
    "head": RULE_8["head"],
    "body": RULE_8["body"],
    "reify": [
        {"var": "?/dept", "ln": ("md5", "?/deptid", "?/co"), "ns": "ex", "prefix": "D_"},
        {"var": "?/deptid", "ln": ("md5", "?/dept", "?/co"), "ns": "ex", "prefix": "D_"},
    ],
}


def _one(kb, pattern, var):
    res = kb.query(pattern)
    assert res, f"no bindings for {pattern}"
    return res[0][var].v


def test_safety_checks(kb):
    # test_forward_rule.clj:222-229
    assert forward_safe(kb, RULE_1)
    assert not forward_safe(kb, RULE_2)
    for r in (RULE_1, RULE_2, RULE_5, RULE_6, RULE_7):
        assert forward_safe_with_reification(kb, r) or forward_safe(kb, r)
    assert not forward_safe_with_reification(kb, BAD_RULE_7)
    assert connected_rule(kb, RULE_7)


def test_forward_1(kb):
    # :232-236 — derives 2 Hackers
    load_fixture(kb, TEST_TRIPLES_6_3)
    run_forward_rule(kb, RULE_1, kb)
    assert kb.count([("?/person", "rdf/type", "ex/Hacker")]) == 2


def test_forward_2_unique_reify(kb):
    # :238-243 — 2 orgs minted in ex namespace
    load_fixture(kb, TEST_TRIPLES_6_3)
    run_forward_rule(kb, RULE_2, kb)
    res = kb.query([("?/org", "rdf/type", "ex/HackerOrganization")])
    assert len(res) == 2
    assert all(b["org"].v.startswith("http://www.example.org/") for b in res)


def test_forward_5_localname(kb):
    # :124-130, :258-264 — creates ex/aORG and ex/bORG
    load_fixture(kb, TEST_TRIPLES_6_3)
    run_forward_rule(kb, RULE_5, kb)
    res = kb.query([("?/org", "rdf/type", "ex/HackerOrganization")])
    orgs = {b["org"].v for b in res}
    assert orgs == {
        "http://www.example.org/aORG",
        "http://www.example.org/bORG",
    }


def test_forward_6_md5_suffix(kb):
    load_fixture(kb, TEST_TRIPLES_6_3)
    run_forward_rule(kb, RULE_6, kb)
    res = kb.query([("?/org", "rdf/type", "ex/HackerOrganization")])
    assert len(res) == 2
    assert all(b["org"].v.endswith("_ORG") for b in res)


def test_forward_7_md5_sharing(kb):
    # :277-291 — 2 departments, 3 memberships; a,b share, a,c don't
    load_fixture(kb, TEST_TRIPLES_MD5)
    run_forward_rule(kb, RULE_7, kb)
    assert kb.count([("?/org", "rdf/type", "ex/Department")]) == 2
    assert kb.count([("?/person", "ex/inDept", "?/dept")]) == 3
    assert _one(kb, [("ex/a", "ex/inDept", "?/dept")], "dept") == _one(
        kb, [("ex/b", "ex/inDept", "?/dept")], "dept"
    )
    assert _one(kb, [("ex/a", "ex/inDept", "?/dept")], "dept") != _one(
        kb, [("ex/c", "ex/inDept", "?/dept")], "dept"
    )
    assert kb.ask([("ex/a", "ex/inDept", "?/dept"), ("ex/b", "ex/inDept", "?/dept")])


@pytest.mark.parametrize("rule", [RULE_8, RULE_8_INV], ids=["rule-8", "rule-8-inv"])
def test_forward_8_dependent_reify(kb, rule):
    # :295-341 — deptid depends on minted dept; both orders work (topo-sort)
    load_fixture(kb, TEST_TRIPLES_MD5)
    run_forward_rule(kb, rule, kb)
    assert kb.count([("?/org", "rdf/type", "ex/Department")]) == 2
    assert kb.count([("?/person", "ex/inDept", "?/dept")]) == 3
    did = lambda who: _one(
        kb, [(who, "ex/inDept", "_/dept"), ("_/dept", "ex/deptID", "?/deptid")], "deptid"
    )
    assert did("ex/a") == did("ex/b")
    assert did("ex/a") != did("ex/c")


def test_forward_8_c_no_sharing_on_md5_2(kb):
    # :344-361 — on md5-2, a and b do NOT share a dept
    load_fixture(kb, TEST_TRIPLES_MD5_2)
    run_forward_rule(kb, RULE_8, kb)
    assert _one(kb, [("ex/a", "ex/inDept", "?/dept")], "dept") != _one(
        kb, [("ex/b", "ex/inDept", "?/dept")], "dept"
    )


def test_forward_9_optional_reify_fills_unbound_only(kb):
    # :392-416 — a keeps its firstname; b, c get distinct minted names
    load_fixture(kb, TEST_TRIPLES_MD5_2)
    run_forward_rule(kb, RULE_9_OPTIONAL, kb)
    a_first = _one(kb, [("ex/a", "foaf/firstname", "?/firstname")], "firstname")
    a_emp = _one(kb, [("ex/a", "ex/empname", "?/empname")], "empname")
    assert a_first == a_emp == "Alice"
    b_emp = _one(kb, [("ex/b", "ex/empname", "?/empname")], "empname")
    c_emp = _one(kb, [("ex/c", "ex/empname", "?/empname")], "empname")
    assert len({a_emp, b_emp, c_emp}) == 3


def test_forward_10_constants_in_md5(kb):
    # :419-422 — constant arg prevents dept/deptid collision
    load_fixture(kb, TEST_TRIPLES_MD5_2)
    run_forward_rule(kb, RULE_10, kb)
    assert not kb.ask([("?/deptid", "ex/deptID", "?/deptid")])


def test_forward_11_reify_cycle_raises(kb):
    # :425-426
    load_fixture(kb, TEST_TRIPLES_MD5_2)
    with pytest.raises(RuleError):
        run_forward_rule(kb, RULE_11_CYCLE, kb)


def test_rules_to_fixpoint_rdfs_subclass(kb):
    # K9: RDFS-style entailment as rules run to fixpoint
    from kr_spark.operators.rules import run_rules_to_fixpoint

    kb.add_statements(
        [
            ("ex/Dog", "rdfs/subClassOf", "ex/Mammal"),
            ("ex/Mammal", "rdfs/subClassOf", "ex/Animal"),
            ("ex/rex", "rdf/type", "ex/Dog"),
        ]
    )
    subclass_transitivity = {
        "name": "rdfs11",
        "head": [("?/a", "rdfs/subClassOf", "?/c")],
        "body": [("?/a", "rdfs/subClassOf", "?/b"), ("?/b", "rdfs/subClassOf", "?/c")],
    }
    type_inheritance = {
        "name": "rdfs9",
        "head": [("?/x", "rdf/type", "?/c")],
        "body": [("?/x", "rdf/type", "?/b"), ("?/b", "rdfs/subClassOf", "?/c")],
    }
    run_rules_to_fixpoint(kb, [subclass_transitivity, type_inheritance])
    assert kb.ask_rdf("ex/rex", "rdf/type", "ex/Animal")
    assert kb.ask_rdf("ex/Dog", "rdfs/subClassOf", "ex/Animal")


def test_reify_statements_df(kb, spark):
    # R1 at scale: 1 statement -> 4 reification triples, deterministic node
    from kr_spark.operators.reify import reify_statements_df

    stmts = spark.createDataFrame(
        [("http://e.org/a", "http://e.org/p", "http://e.org/b")], "s string, p string, o string"
    )
    out = reify_statements_df(stmts, ns="http://e.org/", prefix="STMT_")
    rows = {(r.s, r.p, r.o) for r in out.collect()}
    assert len(rows) == 4
    nodes = {s for s, _, _ in rows}
    assert len(nodes) == 1
    node = nodes.pop()
    assert node.startswith("http://e.org/STMT_")
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    assert (node, rdf + "subject", "http://e.org/a") in rows
    assert (node, rdf + "predicate", "http://e.org/p") in rows
    assert (node, rdf + "object", "http://e.org/b") in rows
    assert (node, rdf + "type", rdf + "Statement") in rows
    # determinism: same statement -> same node on re-run
    again = {r.s for r in reify_statements_df(stmts, ns="http://e.org/", prefix="STMT_").collect()}
    assert again == {node}


def test_rule_index_roundtrip_and_lookup(kb):
    # K8 (rule_index.clj): rules stored as reified triples, derive-lookup
    from kr_spark.operators.rule_index import (
        RULE_NS,
        add_to_rule_index,
        rules_deriving,
    )

    dept_rule = {
        "name": "dept-rule",
        "head": [("?/c", "ex/inDept", "?/d")],
        "body": [("?/c", "ex/hasBoss", "?/b")],
    }
    typed_rule = {
        "name": "person-rule",
        "head": [("?/x", "rdf/type", "ex/Person")],
        "body": [("?/x", "foaf/name", "?/n")],
    }
    add_to_rule_index(kb, [dept_rule, typed_rule])

    # the index is ordinary queryable triples
    assert kb.ask([("<" + RULE_NS + "dept-rule>", "rdf/type", "<" + RULE_NS + "Rule>")])

    # predicate axis: exact head predicate match
    assert rules_deriving(kb, p="ex/inDept") == {"dept-rule"}
    assert rules_deriving(kb, p="rdf/type") == {"person-rule"}
    assert rules_deriving(kb, p="ex/unrelated") == set()
    # object axis: constant head object matches; var head object matches too
    assert rules_deriving(kb, o="ex/Person") == {"person-rule", "dept-rule"}
    # subject axis: both heads have variable subjects -> both match any subject
    assert rules_deriving(kb, s="ex/someone") == {"dept-rule", "person-rule"}
    # conjunction across axes
    assert rules_deriving(kb, s="ex/someone", p="ex/inDept") == {"dept-rule"}


def test_regex_reify(kb):
    # R5 (reify.clj:85-87): regex-replace over concatenated arg values
    from kr_spark.operators.rules import run_forward_rule
    from tests.conftest import TEST_TRIPLES_6_3, load_fixture

    load_fixture(kb, TEST_TRIPLES_6_3)
    rule = {
        "name": "regex-rule",
        "head": [("?/site", "rdf/type", "ex/Site")],
        "body": [("?/p", "foaf/name", "?/n")],
        "reify": [
            # strip example.org URI prefix out of the subject URI
            {
                "var": "?/site",
                "ln": ("regex", r"http://www\.example\.org/", "", "?/p"),
                "ns": "ex",
                "prefix": "SITE_",
            }
        ],
    }
    run_forward_rule(kb, rule, kb)
    res = kb.query([("?/site", "rdf/type", "ex/Site")])
    assert {b["site"].v for b in res} == {
        "http://www.example.org/SITE_a",
        "http://www.example.org/SITE_b",
    }


def test_fn_reify_pandas(kb):
    # R6 (forward_rule.clj:173-179): arbitrary fn of bindings, vectorized
    from kr_spark.operators.rules import run_forward_rule
    from tests.conftest import TEST_TRIPLES_6_3, load_fixture

    load_fixture(kb, TEST_TRIPLES_6_3)

    def mint(pdf):
        # name -> uppercased last URI segment of the person
        return pdf["p"].str.rsplit("/", n=1).str[-1].str.upper()

    rule = {
        "name": "fn-rule",
        "head": [("?/node", "rdf/type", "ex/FnNode")],
        "body": [("?/p", "foaf/name", "?/n")],
        "reify": [
            {"var": "?/node", "ln": mint, "ns": "ex", "prefix": "FN_", "args": ["p"]}
        ],
    }
    run_forward_rule(kb, rule, kb)
    res = kb.query([("?/node", "rdf/type", "ex/FnNode")])
    assert {b["node"].v for b in res} == {
        "http://www.example.org/FN_A",
        "http://www.example.org/FN_B",
    }


def test_reify_paths_mint_identical_nodes(kb):
    # One skolem scheme across APIs: the driver-side helper and the
    # DataFrame path must mint the SAME node for the same statement, or
    # mixing the APIs in one KB breaks join-ability.
    from kr_spark.operators.reify import reify_statement_triples, reify_statements_df

    driver_triples = reify_statement_triples(kb, "ex/a", "ex/p", "ex/b")
    driver_node = driver_triples[0][0].v

    ex = kb.ns.short_to_long["ex"]
    stmts = kb.spark.createDataFrame(
        [(ex + "a", ex + "p", ex + "b")], ["s", "p", "o"]
    )
    df_node = reify_statements_df(stmts, ns=ex, prefix="STMT_").collect()[0].s
    assert driver_node == df_node


def test_rule_loading_from_dir(kb, spark, tmp_path):
    # K6 (rule.clj:45-65): rules serialized to JSON files in a directory run
    # to the SAME fixpoint as the in-memory dicts.
    from kr_spark.kb import KB
    from kr_spark.operators.rule_loader import dump_rule_json, load_rules
    from kr_spark.operators.rules import run_rules_to_fixpoint

    fixture = [
        ("ex/Dog", "rdfs/subClassOf", "ex/Mammal"),
        ("ex/Mammal", "rdfs/subClassOf", "ex/Animal"),
        ("ex/rex", "rdf/type", "ex/Dog"),
        ("ex/rex", "foaf/name", "Rex"),
    ]
    rules = [
        {
            "name": "rdfs11",
            "head": [("?/a", "rdfs/subClassOf", "?/c")],
            "body": [
                ("?/a", "rdfs/subClassOf", "?/b"),
                ("?/b", "rdfs/subClassOf", "?/c"),
            ],
        },
        {
            "name": "rdfs9",
            "head": [("?/x", "rdf/type", "?/c")],
            "body": [("?/x", "rdf/type", "?/b"), ("?/b", "rdfs/subClassOf", "?/c")],
        },
        {
            "name": "tag",  # exercises reify + filter round-trip
            "head": [("?/node", "ex/tagged", "?/name")],
            "body": [
                ("?/x", "foaf/name", "?/name"),
                (":regex", "?/name", ["^R"]),
            ],
            "reify": [
                {"var": "?/node", "ln": ("md5", "?/name"), "ns": "ex", "prefix": "T_"}
            ],
        },
    ]
    d = tmp_path / "rules"
    d.mkdir()
    for i, r in enumerate(rules):
        (d / f"{i:02d}_{r['name']}.json").write_text(dump_rule_json(r))

    loaded = load_rules(str(d))
    assert [r["name"] for r in loaded] == ["rdfs11", "rdfs9", "tag"]

    kb.add_statements(fixture)
    run_rules_to_fixpoint(kb, loaded)

    kb2 = KB(spark)
    kb2.add_statements(fixture)
    from kr_spark.operators.rules import run_rules_to_fixpoint as rrf

    rrf(kb2, rules)

    cols = ["s_kind", "s", "p", "o_kind", "o"]
    a, b = kb.df().select(*cols), kb2.df().select(*cols)
    assert a.count() == b.count()
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    assert kb.ask_rdf("ex/rex", "rdf/type", "ex/Animal")
    assert kb.ask_rdf(None, "ex/tagged", "Rex")  # default-lang literal


def test_rule_loader_path_canonicalization(tmp_path):
    from kr_spark.operators.rule_loader import load_rule_file

    (tmp_path / "r.json").write_text(
        """
        {"name": "paths",
         "head": [["?/x", "ex/reach", "?/y"]],
         "body": [["?/x", ["ex/knows", "+"], "?/y"],
                  ["?/x", [":or", "ex/a", [":inverse", "ex/b"]], "?/z"],
                  ["?/x", ["ex/p", "ex/q"], "?/w"],
                  ["?/x", "ex/lit", ["Bob", "en"]]]}
        """
    )
    (r,) = load_rule_file(str(tmp_path / "r.json"))
    body = r["body"]
    assert body[0][1] == ["ex/knows", "+"]              # modifier stays list
    assert body[1][1] == (":or", "ex/a", (":inverse", "ex/b"))
    assert body[2][1] == ("ex/p", "ex/q")               # sequence -> tuple
    assert body[3][2] == ["Bob", "en"]                  # boxed literal stays


def test_rdfs_entailment_level(kb):
    # K9 / *use-inference* :rdfs (jena/kb.clj:16): materialized RDFS closure
    from kr_spark.operators.entailment import materialize_entailments

    kb.add_statements(
        [
            ("ex/Dog", "rdfs/subClassOf", "ex/Mammal"),
            ("ex/Mammal", "rdfs/subClassOf", "ex/Animal"),
            ("ex/hasPet", "rdfs/domain", "ex/Person"),
            ("ex/hasPet", "rdfs/range", "ex/Animal"),
            ("ex/hasDog", "rdfs/subPropertyOf", "ex/hasPet"),
            ("ex/alice", "ex/hasDog", "ex/rex"),
        ]
    )
    materialize_entailments(kb, "rdfs")
    # rdfs7: hasDog => hasPet
    assert kb.ask_rdf("ex/alice", "ex/hasPet", "ex/rex")
    # rdfs2/3 through the inherited property
    assert kb.ask_rdf("ex/alice", "rdf/type", "ex/Person")
    assert kb.ask_rdf("ex/rex", "rdf/type", "ex/Animal")
    # rdfs11 transitivity
    assert kb.ask_rdf("ex/Dog", "rdfs/subClassOf", "ex/Animal")


def test_owl_rl_entailment_level(kb):
    from kr_spark.operators.entailment import materialize_entailments

    kb.add_statements(
        [
            ("ex/a", "owl/sameAs", "ex/b"),
            ("ex/b", "owl/sameAs", "ex/c"),
            ("ex/a", "ex/worksAt", "ex/acme"),
            ("ex/parentOf", "owl/inverseOf", "ex/childOf"),
            ("ex/p1", "ex/parentOf", "ex/k1"),
            ("ex/near", "rdf/type", "owl/SymmetricProperty"),
            ("ex/x", "ex/near", "ex/y"),
            ("ex/in", "rdf/type", "owl/TransitiveProperty"),
            ("ex/q1", "ex/in", "ex/q2"),
            ("ex/q2", "ex/in", "ex/q3"),
            ("ex/C1", "owl/equivalentClass", "ex/C2"),
            ("ex/i", "rdf/type", "ex/C1"),
        ]
    )
    materialize_entailments(kb, "owl")
    assert kb.ask_rdf("ex/c", "owl/sameAs", "ex/a")     # sym+trans
    assert kb.ask_rdf("ex/b", "ex/worksAt", "ex/acme")  # sameAs rewrite
    assert kb.ask_rdf("ex/c", "ex/worksAt", "ex/acme")
    assert kb.ask_rdf("ex/k1", "ex/childOf", "ex/p1")   # inverseOf
    assert kb.ask_rdf("ex/y", "ex/near", "ex/x")        # symmetric
    assert kb.ask_rdf("ex/q1", "ex/in", "ex/q3")        # transitive
    assert kb.ask_rdf("ex/i", "rdf/type", "ex/C2")      # equivalentClass


def test_owl_rl_round3_rules(kb):
    # round-3 RL widening (VERDICT r2 Missing #2): functional/inverse-
    # functional properties mint sameAs, sameAs rewrites predicates,
    # mutual subsumption closes back to equivalentClass, and the
    # hasValue/someValuesFrom/allValuesFrom restriction rules fire
    from kr_spark.operators.entailment import materialize_entailments

    kb.add_statements(
        [
            # prp-fp: hasMother is functional -> m1 sameAs m2
            ("ex/hasMother", "rdf/type", "owl/FunctionalProperty"),
            ("ex/kid", "ex/hasMother", "ex/m1"),
            ("ex/kid", "ex/hasMother", "ex/m2"),
            # prp-ifp: ssn is inverse-functional -> s1 sameAs s2
            ("ex/ssn", "rdf/type", "owl/InverseFunctionalProperty"),
            ("ex/s1", "ex/ssn", ["123"]),
            ("ex/s2", "ex/ssn", ["123"]),
            # eq-rep-p: predicate rewrite through sameAs
            ("ex/worksAt", "owl/sameAs", "ex/employedBy"),
            ("ex/w", "ex/worksAt", "ex/acme"),
            # scm-eqc2: mutual subsumption -> equivalentClass
            ("ex/A", "rdfs/subClassOf", "ex/B"),
            ("ex/B", "rdfs/subClassOf", "ex/A"),
            # cls-hv1/hv2 round-trip
            ("ex/R", "owl/hasValue", "ex/red"),
            ("ex/R", "owl/onProperty", "ex/color"),
            ("ex/apple", "ex/color", "ex/red"),
            ("ex/cherry", "rdf/type", "ex/R"),
            # cls-svf1: someValuesFrom
            ("ex/ParentOfDoctor", "owl/someValuesFrom", "ex/Doctor"),
            ("ex/ParentOfDoctor", "owl/onProperty", "ex/parentOf2"),
            ("ex/pa", "ex/parentOf2", "ex/d"),
            ("ex/d", "rdf/type", "ex/Doctor"),
            # cls-avf: allValuesFrom
            ("ex/VeganMeal", "owl/allValuesFrom", "ex/Vegetable"),
            ("ex/VeganMeal", "owl/onProperty", "ex/ingredient"),
            ("ex/meal1", "rdf/type", "ex/VeganMeal"),
            ("ex/meal1", "ex/ingredient", "ex/carrot"),
        ]
    )
    materialize_entailments(kb, "owl")
    assert kb.ask_rdf("ex/m1", "owl/sameAs", "ex/m2")            # prp-fp
    assert kb.ask_rdf("ex/s1", "owl/sameAs", "ex/s2")            # prp-ifp
    assert kb.ask_rdf("ex/w", "ex/employedBy", "ex/acme")        # eq-rep-p
    assert kb.ask_rdf("ex/A", "owl/equivalentClass", "ex/B")     # scm-eqc2
    assert kb.ask_rdf("ex/cherry", "ex/color", "ex/red")         # cls-hv1
    assert kb.ask_rdf("ex/apple", "rdf/type", "ex/R")            # cls-hv2
    assert kb.ask_rdf("ex/pa", "rdf/type", "ex/ParentOfDoctor")  # cls-svf1
    assert kb.ask_rdf("ex/carrot", "rdf/type", "ex/Vegetable")   # cls-avf


def test_prp_fp_applies_to_blank_node_objects(kb):
    # ADVICE r3: prp-fp excludes only LITERAL objects — sameAs between
    # blank-node objects of a FunctionalProperty must be inferred (the old
    # isIRI-only guard silently under-entailed); literal objects still
    # produce nothing.
    from kr_spark.operators.entailment import materialize_entailments

    kb.add_statements(
        [
            ("ex/hasMother", "rdf/type", "owl/FunctionalProperty"),
            ("ex/kid", "ex/hasMother", "_/m1"),
            ("ex/kid", "ex/hasMother", "_/m2"),
            ("ex/nick", "rdf/type", "owl/FunctionalProperty"),
            ("ex/kid", "ex/nick", ["Ann"]),
            ("ex/kid", "ex/nick", ["Annie"]),
        ]
    )
    materialize_entailments(kb, "owl")
    same = kb.query([("?/a", "owl/sameAs", "?/b")])
    kinds = {(r["a"].kind, r["b"].kind) for r in same}
    assert ("bnode", "bnode") in kinds            # bnode pair inferred
    assert all(k != "literal" for pair in kinds for k in pair)


def test_owl_scm_domain_range_closure(kb):
    # r4 schema-closure rules (OWL 2 RL table 9): domain/range widen through
    # subClassOf and inherit down subPropertyOf — composed with rdfs2/rdfs3
    # the instance types follow
    from kr_spark.operators.entailment import materialize_entailments

    kb.add_statements(
        [
            ("ex/hasPet", "rdfs/domain", "ex/PetOwner"),
            ("ex/PetOwner", "rdfs/subClassOf", "ex/Person"),
            ("ex/hasDog", "rdfs/subPropertyOf", "ex/hasPet"),
            ("ex/hasPet", "rdfs/range", "ex/Pet"),
            ("ex/alice", "ex/hasDog", "ex/rex"),
        ]
    )
    materialize_entailments(kb, "owl")
    assert kb.ask_rdf("ex/hasPet", "rdfs/domain", "ex/Person")   # scm-dom1
    assert kb.ask_rdf("ex/hasDog", "rdfs/domain", "ex/PetOwner") # scm-dom2
    assert kb.ask_rdf("ex/hasDog", "rdfs/range", "ex/Pet")       # scm-rng2
    assert kb.ask_rdf("ex/alice", "rdf/type", "ex/Person")       # + rdfs2
    assert kb.ask_rdf("ex/rex", "rdf/type", "ex/Pet")            # + rdfs3


def test_owl_list_rules_intersection_and_chain(kb):
    # Round-4 closure of the r3 pinned exclusions: RDF-list class
    # expressions and property chains now entail (entailment.py
    # OWL_LIST_RULES); these are the exact fixtures that previously pinned
    # the divergence, flipped to Jena's answers.
    from kr_spark.operators.entailment import materialize_entailments

    kb.add_statements(
        [
            # intersectionOf: Father = Man ∩ Parent (RDF list)
            ("ex/Father", "owl/intersectionOf", "_/l1"),
            ("_/l1", "rdf/first", "ex/Man"),
            ("_/l1", "rdf/rest", "_/l2"),
            ("_/l2", "rdf/first", "ex/Parent"),
            ("_/l2", "rdf/rest", "rdf/nil"),
            ("ex/bob", "rdf/type", "ex/Man"),
            ("ex/bob", "rdf/type", "ex/Parent"),
            ("ex/sam", "rdf/type", "ex/Man"),  # Man only: NOT a Father
            # propertyChainAxiom: hasGrandparent = hasParent o hasParent
            ("ex/hasGrandparent", "owl/propertyChainAxiom", "_/c1"),
            ("_/c1", "rdf/first", "ex/hasParent"),
            ("_/c1", "rdf/rest", "_/c2"),
            ("_/c2", "rdf/first", "ex/hasParent"),
            ("_/c2", "rdf/rest", "rdf/nil"),
            ("ex/kid", "ex/hasParent", "ex/mom"),
            ("ex/mom", "ex/hasParent", "ex/gran"),
        ]
    )
    materialize_entailments(kb, "owl")
    assert kb.ask_rdf("ex/bob", "rdf/type", "ex/Father")          # cls-int1
    assert not kb.ask_rdf("ex/sam", "rdf/type", "ex/Father")      # partial match
    assert kb.ask_rdf("ex/bob", "rdf/type", "ex/Man")             # cls-int2 dir
    assert kb.ask_rdf("ex/kid", "ex/hasGrandparent", "ex/gran")   # prp-spo2
    assert not kb.ask_rdf("ex/mom", "ex/hasGrandparent", "ex/gran")


def test_owl_list_rules_oneof_union_int2(kb):
    from kr_spark.operators.entailment import materialize_entailments

    kb.add_statements(
        [
            # oneOf: Weekend = { sat, sun }
            ("ex/Weekend", "owl/oneOf", "_/d1"),
            ("_/d1", "rdf/first", "ex/sat"),
            ("_/d1", "rdf/rest", "_/d2"),
            ("_/d2", "rdf/first", "ex/sun"),
            ("_/d2", "rdf/rest", "rdf/nil"),
            # unionOf: Pet = Dog ∪ Cat
            ("ex/Pet", "owl/unionOf", "_/u1"),
            ("_/u1", "rdf/first", "ex/Dog"),
            ("_/u1", "rdf/rest", "_/u2"),
            ("_/u2", "rdf/first", "ex/Cat"),
            ("_/u2", "rdf/rest", "rdf/nil"),
            ("ex/rex", "rdf/type", "ex/Dog"),
            # intersectionOf, class direction (cls-int2): declared Father
            # instance acquires every conjunct type
            ("ex/Father", "owl/intersectionOf", "_/l1"),
            ("_/l1", "rdf/first", "ex/Man"),
            ("_/l1", "rdf/rest", "_/l2"),
            ("_/l2", "rdf/first", "ex/Parent"),
            ("_/l2", "rdf/rest", "rdf/nil"),
            ("ex/abe", "rdf/type", "ex/Father"),
        ]
    )
    materialize_entailments(kb, "owl")
    assert kb.ask_rdf("ex/sat", "rdf/type", "ex/Weekend")   # cls-oo
    assert kb.ask_rdf("ex/sun", "rdf/type", "ex/Weekend")
    assert kb.ask_rdf("ex/rex", "rdf/type", "ex/Pet")       # cls-uni
    assert not kb.ask_rdf("ex/Dog", "rdf/type", "ex/Pet")
    assert kb.ask_rdf("ex/abe", "rdf/type", "ex/Man")       # cls-int2
    assert kb.ask_rdf("ex/abe", "rdf/type", "ex/Parent")


def test_owl_cls_maxc2_entails_sameas(kb):
    # Round 5: the r3/r4 pinned exclusion flips to a POSITIVE entailment —
    # cls-maxc2 (maxCardinality 1 -> sameAs between the fillers) is in
    # OWL_RL_RULES as a pairwise join (entailment.py table). The type must
    # arrive INDIRECTLY (rdfs9 through the subclass edge) so the rule is
    # exercised mid-fixpoint, not just on asserted types.
    from kr_spark.operators.entailment import materialize_entailments

    kb.add_statements(
        [
            ("ex/R", "rdf/type", "owl/Restriction"),
            ("ex/R", "owl/onProperty", "ex/hasSpouse"),
            ("ex/R", "owl/maxCardinality", [1, "xsd/nonNegativeInteger"]),
            ("ex/Monogamous", "rdfs/subClassOf", "ex/R"),
            ("ex/pat", "rdf/type", "ex/Monogamous"),
            ("ex/pat", "ex/hasSpouse", "ex/chris"),
            ("ex/pat", "ex/hasSpouse", "ex/kim"),
            # a literal filler never mints sameAs (prp-fp stance)
            ("ex/pat", "ex/hasSpouse", ["stringy"]),
        ]
    )
    materialize_entailments(kb, "owl")
    assert kb.ask_rdf("ex/chris", "owl/sameAs", "ex/kim")
    assert kb.ask_rdf("ex/kim", "owl/sameAs", "ex/chris")  # eq-sym closes it
    assert not kb.query_rdf(None, "owl/sameAs", ["stringy"]).count()


def test_owl_delta_exclusions_pinned(kb):
    # Remaining pinned divergence vs Jena :owl (entailment.py docstring
    # table): general max-cardinality (>= 2, and qualified cls-maxqc*)
    # stays excluded — under maxCardinality 2 with three fillers Jena's
    # complete OWL reasoner could case-split; this engine entails nothing.
    from kr_spark.operators.entailment import materialize_entailments

    kb.add_statements(
        [
            ("ex/R2", "rdf/type", "owl/Restriction"),
            ("ex/R2", "owl/onProperty", "ex/hasParent"),
            ("ex/R2", "owl/maxCardinality", [2, "xsd/nonNegativeInteger"]),
            ("ex/kid", "rdf/type", "ex/R2"),
            ("ex/kid", "ex/hasParent", "ex/p1"),
            ("ex/kid", "ex/hasParent", "ex/p2"),
            ("ex/kid", "ex/hasParent", "ex/p3"),
        ]
    )
    materialize_entailments(kb, "owl")
    for a in ("p1", "p2", "p3"):
        for b in ("p1", "p2", "p3"):
            assert not kb.ask_rdf(f"ex/{a}", "owl/sameAs", f"ex/{b}")

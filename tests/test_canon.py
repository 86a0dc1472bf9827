"""Connected-components canonicalization + type inference (SURVEY §2.9)."""

from pyspark.sql import functions as F

from kr_spark.operators.canon import (
    canonical_mapping,
    infer_subject_types,
    most_specific_types,
    rewrite_triples_canonical,
    same_as_edges_from_triples,
)
from kr_spark.plans.fixpoint import connected_components, transitive_closure


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "p")], "src string, dst string"
    )
    cc = {r.node: r.component for r in connected_components(edges, driver_threshold=0).collect()}
    assert cc["a"] == cc["b"] == cc["c"] == "a"
    assert cc["x"] == cc["y"] == "x"
    assert cc["p"] == "p"


def test_connected_components_chain_and_salt(spark):
    # long chain forces multiple propagation rounds; salted variant agrees
    n = 40
    edges = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n)], "src string, dst string"
    )
    plain = {r.node: r.component for r in connected_components(edges, driver_threshold=0).collect()}
    salted = {
        r.node: r.component
        for r in connected_components(edges, salt=4, driver_threshold=0).collect()
    }
    # adaptive path (driver union-find under the size threshold) must agree
    # with the distributed min-label loop exactly
    adaptive = {r.node: r.component for r in connected_components(edges).collect()}
    assert plain == salted == adaptive
    assert set(plain.values()) == {"n000"}


def test_transitive_closure(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    pairs = {(r.src, r.dst) for r in transitive_closure(edges).collect()}
    assert pairs == {
        ("a", "b"), ("b", "c"), ("c", "d"),
        ("a", "c"), ("b", "d"), ("a", "d"),
    }


def test_canonical_rewrite(spark, kb):
    kb.add_statements(
        [
            ("ex/kevin", "ex/worksAt", "ex/ucd"),
            ("ex/kev", "owl/sameAs", "ex/kevin"),
            ("ex/kev", "ex/knows", "ex/bob"),
        ]
    )
    triples = kb.df()
    edges = same_as_edges_from_triples(triples)
    mapping = canonical_mapping(edges)
    rewritten = rewrite_triples_canonical(triples, mapping)
    # canonical = lexicographic min of {ex/kev, ex/kevin} = ex/kev
    subs = {r.s for r in rewritten.collect()}
    assert "http://www.example.org/kevin" not in subs
    assert "http://www.example.org/kev" in subs


def test_infer_types_and_most_specific(spark, kb):
    kb.add_statements(
        [
            ("ex/worksAt", "rdfs/domain", "ex/Employee"),
            ("ex/Employee", "rdfs/subClassOf", "ex/Person"),
            ("ex/kevin", "rdf/type", "ex/Person"),
            ("ex/kevin", "ex/worksAt", "ex/ucd"),
        ]
    )
    t = kb.df()
    nt = infer_subject_types(t)
    got = {(r.node, r.type) for r in nt.collect()}
    kev = "http://www.example.org/kevin"
    assert (kev, "http://www.example.org/Person") in got
    assert (kev, "http://www.example.org/Employee") in got
    # most-specific drops Person (ancestor of held Employee)
    spec = {(r.node, r.type) for r in most_specific_types(nt, t).collect()}
    assert (kev, "http://www.example.org/Employee") in spec
    assert (kev, "http://www.example.org/Person") not in spec

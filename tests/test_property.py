"""Property-based tests (hypothesis) for the pure-Python seams and the
columnar escape machinery.

Fast driver-side properties run at full example counts; the two
Spark-backed properties batch one generated corpus per example with a
small example budget (a Spark job per example).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# text including controls, quotes, backslashes and beyond-BMP codepoints;
# surrogates excluded (not encodable)
_hostile_text = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "S", "Z", "C")
    ),
    max_size=40,
)


# ---- SPARQL string escape round-trip (parser <-> emitter) ----


@given(_hostile_text)
@settings(max_examples=300)
def test_sparql_escape_roundtrip(s):
    from kr_spark.plans.sparql_emit import _escape
    from kr_spark.plans.sparql_parser import _unescape_string

    assert _unescape_string(_escape(s)) == s


@given(_hostile_text)
@settings(max_examples=300)
def test_sparql_escape_is_single_line_quotable(s):
    # the emitter must produce a string-literal body with no raw newline,
    # carriage return, or unescaped quote — else the token regex breaks
    from kr_spark.plans.sparql_emit import _escape

    e = _escape(s)
    assert "\n" not in e and "\r" not in e
    # every double-quote is preceded by an odd run of backslashes
    i = e.find('"')
    while i != -1:
        back = 0
        j = i - 1
        while j >= 0 and e[j] == "\\":
            back += 1
            j -= 1
        assert back % 2 == 1
        i = e.find('"', i + 1)


# ---- PAIP unifier properties (pure Python) ----


_scalar = st.one_of(
    st.sampled_from(["ex/a", "ex/b", "foaf/name", "?/x", "?/y", "?/z"]),
    st.integers(min_value=-5, max_value=5),
    st.text(alphabet="ab", min_size=1, max_size=3),
)
# 3-tuples only: a flat 2-tuple of non-vars is a BOXED LITERAL in the
# engine's tree grammar (["Bob","en"]), not a sequence — generating those
# would test the box parser, not the unifier
_tree = st.recursive(
    _scalar, lambda kids: st.tuples(kids, kids, kids), max_leaves=9
)


@pytest.fixture(scope="module")
def ukb(spark):
    from kr_spark.kb import KB

    return KB(spark)


@given(_tree)
@settings(max_examples=200, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_unify_reflexive(ukb, t):
    from kr_spark.plans.unify import FAIL, unify

    b = unify(ukb, t, t)
    assert b is not FAIL


@given(_tree, _tree)
@settings(max_examples=200, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_unify_symmetric_and_subst_fixpoint(ukb, x, y):
    from kr_spark.plans.unify import FAIL, subst_bindings, unify

    bxy = unify(ukb, x, y)
    byx = unify(ukb, y, x)
    # symmetry of success/failure
    assert (bxy is FAIL) == (byx is FAIL)
    if bxy is not FAIL:
        # the unifier (substituted both sides) agree, and substitution is a
        # fixpoint: substituting again changes nothing
        sx = subst_bindings(ukb, x, bxy)
        sy = subst_bindings(ukb, y, bxy)
        assert _shape_eq(ukb, sx, sy)
        assert subst_bindings(ukb, sx, bxy) == sx


def _shape_eq(kb, a, b) -> bool:
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(_shape_eq(kb, p, q) for p, q in zip(a, b))
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        return False
    ta, tb = kb.term(a), kb.term(b)
    return (ta.kind, ta.v, ta.lang, ta.dt) == (tb.kind, tb.v, tb.lang, tb.dt)


# ---- columnar N-Triples escape round-trip (one Spark job per example) ----


@given(st.lists(_hostile_text, min_size=1, max_size=30))
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ntriples_columnar_escape_roundtrip(spark, texts):
    from pyspark.sql import functions as F

    from kr_spark.sources.ntriples import parse_ntriples_df

    rows = [
        (f"<http://e.org/s{i}> <http://e.org/p> " + _nt_quote(t) + " .",)
        for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(rows, "value string")
    got = {
        r.s: r.o
        for r in parse_ntriples_df(spark, df).select("s", "o").collect()
    }
    want = {f"http://e.org/s{i}": t for i, t in enumerate(texts)}
    assert got == want


def _nt_quote(t: str) -> str:
    """Reference N-Triples escaping (driver-side twin of export_ntriples):
    escape the mandatory five, leave everything else raw UTF-8."""
    out = (
        t.replace("\\", "\\\\")
        .replace('"', '\\"')
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )
    return '"' + out + '"'


# ---- compatibility-join vs a naive SPARQL evaluator (§18.3/§18.2.2.6) ----

_node = st.integers(min_value=0, max_value=3)


@st.composite
def _compat_corpus(draw):
    """Random tiny quad-free dataset over predicates p/q/r with ~overlapping
    node domains, for the shape ?x p ?y OPTIONAL { ?y q ?z } ?w r ?z."""
    p_edges = draw(st.lists(st.tuples(_node, _node), min_size=1, max_size=5, unique=True))
    q_edges = draw(st.lists(st.tuples(_node, _node), max_size=5, unique=True))
    r_edges = draw(st.lists(st.tuples(_node, _node), max_size=5, unique=True))
    return p_edges, q_edges, r_edges


def _naive_compat_eval(p_edges, q_edges, r_edges):
    """Reference evaluator: Join(LeftJoin(BGP(?x p ?y), BGP(?y q ?z)),
    BGP(?w r ?z)) with SPARQL compatible-mapping semantics."""
    left = []
    for x, y in p_edges:
        zs = [z for (y2, z) in q_edges if y2 == y]
        if zs:
            left.extend({"x": x, "y": y, "z": z} for z in zs)
        else:
            left.append({"x": x, "y": y})
    out = set()
    for sol in left:
        for w, z2 in r_edges:
            if "z" in sol and sol["z"] != z2:
                continue
            out.add((sol["x"], sol["y"], z2, w))
    return out


@given(_compat_corpus())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_compat_join_matches_naive_evaluator(spark, corpus):
    from kr_spark.kb import KB

    p_edges, q_edges, r_edges = corpus
    kb = KB(spark)
    stmts = (
        [(f"ex/n{a}", "ex/p", f"ex/n{b}") for a, b in p_edges]
        + [(f"ex/n{a}", "ex/q", f"ex/n{b}") for a, b in q_edges]
        + [(f"ex/n{a}", "ex/r", f"ex/n{b}") for a, b in r_edges]
    )
    kb.add_statements(stmts)
    rows = kb.query(
        [
            ("?/x", "ex/p", "?/y"),
            (":optional", ("?/y", "ex/q", "?/z")),
            ("?/w", "ex/r", "?/z"),
        ]
    )
    got = {
        (
            int(b["x"].v[-1]),
            int(b["y"].v[-1]),
            int(b["z"].v[-1]),
            int(b["w"].v[-1]),
        )
        for b in rows
    }
    assert got == _naive_compat_eval(p_edges, q_edges, r_edges)

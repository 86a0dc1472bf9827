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


# ---- random algebra trees vs a full naive evaluator (round 5) ----
# Generalizes the fixed-shape compat test above: random clause sequences
# with OPTIONAL / UNION / MINUS / nested groups (depth <= 3) over random
# tiny graphs, evaluated both by the engine and by a direct bag-semantics
# implementation of §18.2 (positional fold, compatible-mapping join,
# LeftJoin, dom-overlap Minus). 150 random trees agreed at pin time; the
# 25 fixed seeds here replay deterministically.

_FZ_VARS = ["?/x", "?/y", "?/z", "?/w"]
_FZ_NODES = [f"ex/n{i}" for i in range(4)]
_FZ_PREDS = ["ex/p", "ex/q"]


def _fz_triple(rng):
    def slot():
        return rng.choice(_FZ_VARS) if rng.random() < 0.75 else rng.choice(_FZ_NODES)
    return (slot(), rng.choice(_FZ_PREDS), slot())


def _fz_clauses(rng, depth=0):
    out = []
    for _ in range(rng.randint(1, 2 if depth else 3)):
        kinds = (["triple", "filter"] if depth >= 2 else
                 ["triple", "triple", "optional", "union", "minus", "group",
                  "filter", "values"])
        kind = rng.choice(kinds)
        if kind == "triple":
            out.append(_fz_triple(rng))
        elif kind == "filter":
            v = rng.choice(_FZ_VARS)
            if rng.random() < 0.5:
                f = (":bound", v) if rng.random() < 0.5 else ("!", (":bound", v))
            else:
                f = ("=", v, rng.choice(_FZ_NODES))
                if rng.random() < 0.4:
                    f = ("!", f)
            out.append(f)
        elif kind == "values":
            vs = rng.sample(_FZ_VARS, rng.randint(1, 2))
            rows = tuple(
                tuple(None if rng.random() < 0.3 else rng.choice(_FZ_NODES)
                      for _ in vs)
                for _ in range(rng.randint(1, 2)))
            out.append((":values", tuple(vs), rows))
        elif kind == "optional":
            out.append((":optional", *_fz_clauses(rng, depth + 1)))
        elif kind == "minus":
            out.append((":minus", *_fz_clauses(rng, depth + 1)))
        elif kind == "union":
            out.append((":union", tuple(_fz_clauses(rng, depth + 1)),
                        tuple(_fz_clauses(rng, depth + 1))))
        else:
            out.append(tuple(_fz_clauses(rng, depth + 1)))
    return out


def _fz_eval(clauses, data):
    def is_var(t):
        return isinstance(t, str) and t.startswith("?/")

    def bgp(tp):
        s, p, o = tp
        out = []
        for (ds, dp, do) in data:
            if dp != p:
                continue
            m, ok = {}, True
            for slot, d in ((s, ds), (o, do)):
                if is_var(slot):
                    if slot in m and m[slot] != d:
                        ok = False
                        break
                    m[slot] = d
                elif slot != d:
                    ok = False
                    break
            if ok:
                out.append(m)
        return out

    def compat(a, b):
        return all(b[k] == v for k, v in a.items() if k in b)

    def join(A, B):
        return [{**a, **b} for a in A for b in B if compat(a, b)]

    def leftjoin(A, B):
        out = []
        for a in A:
            ms = [{**a, **b} for b in B if compat(a, b)]
            out.extend(ms if ms else [a])
        return out

    def minus_(A, B):
        return [a for a in A
                if not any(compat(a, b) and (a.keys() & b.keys()) for b in B)]

    def eval_filter(f, m):
        op = f[0]
        if op == ":bound":
            return f[1] in m
        if op == "!":
            inner = eval_filter(f[1], m)
            return (not inner) if inner is not None else None
        if op == "=":
            if f[1] not in m:
                return None  # unbound -> error -> row dropped
            return m[f[1]] == f[2]
        raise AssertionError(f)

    sols = [dict()]
    filters = []
    for cl in clauses:
        head = cl[0] if cl else None
        if head in (":bound", "=", "!"):
            filters.append(cl)  # group-scoped (§18.2.2.2): applies at end
        elif head == ":values":
            vs, rows = cl[1], cl[2]
            sols = join(sols, [
                {v: n for v, n in zip(vs, r) if n is not None} for r in rows])
        elif head == ":optional":
            sols = leftjoin(sols, _fz_eval(list(cl[1:]), data))
        elif head == ":minus":
            sols = minus_(sols, _fz_eval(list(cl[1:]), data))
        elif head == ":union":
            bag = []
            for br in cl[1:]:
                bag.extend(_fz_eval(list(br), data))
            sols = join(sols, bag)
        elif isinstance(head, (list, tuple)):
            sols = join(sols, _fz_eval(list(cl), data))
        else:
            sols = join(sols, bgp(cl))
    for f in filters:
        sols = [m for m in sols if eval_filter(f, m) is True]
    return sols


def test_random_algebra_trees_match_naive_evaluator(kb):
    import random as _random

    for seed in range(1000, 1025):
        rng = _random.Random(seed)
        data = sorted({
            (rng.choice(_FZ_NODES), rng.choice(_FZ_PREDS), rng.choice(_FZ_NODES))
            for _ in range(rng.randint(2, 7))
        })
        clauses = _fz_clauses(rng)
        from kr_spark.kb import KB

        k = KB(kb.spark)
        k.add_statements(data)
        got = sorted(
            tuple(sorted((n, t.v.rsplit("/")[-1]) for n, t in b.items()))
            for b in k.query(clauses)
        )
        want = sorted(
            tuple(sorted((n[2:], v.rsplit("/")[-1]) for n, v in m.items()))
            for m in _fz_eval(clauses, data)
        )
        assert got == want, (seed, data, clauses, got[:5], want[:5])


def test_random_algebra_trees_roundtrip_emit_parse(kb):
    """Same random trees through emit_select -> parse_sparql -> query:
    the raw-string pipeline must agree with the naive evaluator too
    (60 random trees agreed at pin time; 10 fixed seeds replay)."""
    import random as _random

    from kr_spark.kb import KB
    from kr_spark.plans.sparql_emit import emit_select
    from kr_spark.plans.sparql_parser import parse_sparql

    for seed in range(1000, 1010):
        rng = _random.Random(seed)
        data = sorted({
            (rng.choice(_FZ_NODES), rng.choice(_FZ_PREDS), rng.choice(_FZ_NODES))
            for _ in range(rng.randint(2, 7))
        })
        clauses = _fz_clauses(rng)
        k = KB(kb.spark)
        k.add_statements(data)
        q = parse_sparql(k, emit_select(k, clauses))
        got = sorted(
            tuple(sorted((n, t.v.rsplit("/")[-1]) for n, t in b.items()))
            for b in k.query(q["pattern"])
        )
        want = sorted(
            tuple(sorted((n[2:], v.rsplit("/")[-1]) for n, v in m.items()))
            for m in _fz_eval(clauses, data)
        )
        assert got == want, (seed, data, clauses, got[:5], want[:5])

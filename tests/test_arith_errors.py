"""Arithmetic error semantics under ANSI mode + XPath constructor casts
(VERDICT r4 'What's wrong' #1/#2, round-5 tasks #1/#2/#5).

SPARQL §17.3 / XPath op:numeric-* semantics: an integer/decimal division by
zero (and decimal overflow) is a PER-ROW expression error — FILTER drops
the row, BIND/SELECT leaves the var unbound, COALESCE can rescue it — while
float/double division by zero yields ±INF (0/0 -> NaN) per IEEE, not an
error at all. The reference gets all of this from Jena's expression
evaluator (sparql.clj:560-603); the engine compiles it to try_* arithmetic
with a double-space leg, so no row can ever raise a query-aborting
SparkArithmeticException regardless of spark.sql.ansi.enabled."""

import pytest

from tests.conftest import TEST_TRIPLES_NUMBERS, load_fixture

XSD = "http://www.w3.org/2001/XMLSchema#"

PREFIXES = """
PREFIX foaf: <http://xmlns.com/foaf/0.1/>
PREFIX ex: <http://www.example.org/>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
"""

DIV_FIXTURE = [
    ("ex/a", "ex/v", [1, "xsd/integer"]),
    ("ex/b", "ex/v", [0, "xsd/integer"]),
    ("ex/c", "ex/v", [5, "xsd/integer"]),
]


# ---- integer/decimal division by zero: per-row error, never an exception


def test_filter_div_zero_drops_row_only(kb):
    load_fixture(kb, DIV_FIXTURE)
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?s WHERE { ?s ex:v ?v . FILTER(10 / ?v > 0) }"
    )
    got = {b["s"].v.rsplit("/", 1)[-1] for b in rows}
    assert got == {"a", "c"}  # the ?v=0 row errors out; query survives


def test_bind_div_zero_leaves_var_unbound(kb):
    load_fixture(kb, DIV_FIXTURE)
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?s ?d WHERE { ?s ex:v ?v . BIND(10 / ?v AS ?d) }"
    )
    by_s = {b["s"].v.rsplit("/", 1)[-1]: b.get("d") for b in rows}
    assert len(rows) == 3  # no row lost — only the var is unbound
    assert by_s["a"].v == "10" and by_s["a"].dt == XSD + "decimal"
    assert by_s["b"] is None
    assert by_s["c"].v == "2"


def test_coalesce_rescues_div_zero(kb):
    load_fixture(kb, DIV_FIXTURE)
    rows = kb.sparql_query(
        PREFIXES
        + 'SELECT ?s ?d WHERE { ?s ex:v ?v . BIND(COALESCE(10 / ?v, "fallback") AS ?d) }'
    )
    by_s = {b["s"].v.rsplit("/", 1)[-1]: b["d"].v for b in rows}
    assert by_s == {"a": "10", "b": "fallback", "c": "2"}


def test_pattern_api_div_zero(kb):
    load_fixture(kb, DIV_FIXTURE)
    rows = kb.query(
        [("?/s", "ex/v", "?/v"), (">", ("/", 10, "?/v"), 0)]
    )
    assert len(rows) == 2


# ---- double-ranked division: INF / -INF / NaN per XPath op:numeric-divide


def test_double_div_zero_is_inf(kb):
    load_fixture(kb, [("ex/a", "ex/v", 0.0)])
    rows = kb.sparql_query(
        PREFIXES
        + "SELECT ?i ?ni ?nan WHERE { ?s ex:v ?z . "
        "BIND(10 / ?z AS ?i) BIND(-10 / ?z AS ?ni) BIND(0.0e0 / ?z AS ?nan) }"
    )
    b = rows[0]
    assert (b["i"].v, b["i"].dt) == ("INF", XSD + "double")
    assert (b["ni"].v, b["ni"].dt) == ("-INF", XSD + "double")
    assert (b["nan"].v, b["nan"].dt) == ("NaN", XSD + "double")


def test_inf_orders_in_comparisons(kb):
    load_fixture(kb, [("ex/a", "ex/v", 0.0), ("ex/b", "ex/v", 2.0)])
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?s WHERE { ?s ex:v ?v . FILTER(10 / ?v > 1000000) }"
    )
    # 10/0.0e0 = INF > 1e6 true; 10/2.0e0 = 5 is not
    assert {b["s"].v.rsplit("/", 1)[-1] for b in rows} == {"a"}


def test_nan_compares_false_even_to_itself(kb):
    load_fixture(kb, [("ex/a", "ex/v", 0.0)])
    q = PREFIXES + "ASK { ?s ex:v ?z . FILTER(%s) }"
    assert not kb.sparql_ask(q % "0.0e0 / ?z = 0.0e0 / ?z")  # NaN = NaN
    assert not kb.sparql_ask(q % "0.0e0 / ?z > 0")
    assert not kb.sparql_ask(q % "0.0e0 / ?z < 0")
    assert kb.sparql_ask(q % "10 / ?z = 10 / ?z")  # INF = INF holds


def test_inf_literal_in_data_participates(kb):
    load_fixture(
        kb,
        [
            ("ex/a", "ex/v", ["INF", "xsd/double"]),
            ("ex/b", "ex/v", ["-INF", "xsd/double"]),
            ("ex/c", "ex/v", ["5.0", "xsd/double"]),
        ],
    )
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?s WHERE { ?s ex:v ?v . FILTER(?v > 1000) }"
    )
    assert {b["s"].v.rsplit("/", 1)[-1] for b in rows} == {"a"}
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?s WHERE { ?s ex:v ?v . FILTER(?v < 0) }"
    )
    assert {b["s"].v.rsplit("/", 1)[-1] for b in rows} == {"b"}


def test_mixed_rank_nesting_reaches_double_space(kb):
    # (2+3)/0.0e0: integer-ranked subterm feeds a double-ranked divide
    load_fixture(kb, [("ex/a", "ex/v", 0.0)])
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?r WHERE { ?s ex:v ?z . BIND((2 + 3) / ?z AS ?r) }"
    )
    assert rows[0]["r"].v == "INF"
    # and INF flowing back into integer space: 10/INF = 0 (double)
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?r WHERE { ?s ex:v ?z . BIND(10 / (10 / ?z) AS ?r) }"
    )
    assert (rows[0]["r"].v, rows[0]["r"].dt) == ("0", XSD + "double")


def test_decimal_overflow_is_row_error_not_crash(kb):
    big = "9" * 29  # 1e29-ish: * itself overflows decimal(38,9)
    load_fixture(kb, [("ex/a", "ex/v", [big, "xsd/integer"]),
                      ("ex/b", "ex/v", [2, "xsd/integer"])])
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?s ?sq WHERE { ?s ex:v ?v . BIND(?v * ?v AS ?sq) }"
    )
    by_s = {b["s"].v.rsplit("/", 1)[-1]: b.get("sq") for b in rows}
    assert by_s["a"] is None  # overflow -> unbound, query survives
    assert by_s["b"].v == "4"


def test_double_overflow_is_inf(kb):
    load_fixture(kb, [("ex/a", "ex/v", ["1.0e308", "xsd/double"])])
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?r WHERE { ?s ex:v ?v . BIND(?v * 10 AS ?r) }"
    )
    assert rows[0]["r"].v == "INF"


def test_unary_minus_on_double_and_error(kb):
    load_fixture(kb, [("ex/a", "ex/v", 2.5), ("ex/b", "ex/v", [0, "xsd/integer"])])
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?s ?r WHERE { ?s ex:v ?v . BIND(- (10 / ?v) AS ?r) }"
    )
    by_s = {b["s"].v.rsplit("/", 1)[-1]: b.get("r") for b in rows}
    assert by_s["a"].v == "-4"
    assert by_s["b"] is None


def test_malformed_numeric_lexical_in_data_is_row_error(kb):
    # a typed-literal whose lexical form is garbage must not kill the scan
    load_fixture(
        kb,
        [
            ("ex/a", "ex/v", ["notanumber", "xsd/integer"]),
            ("ex/b", "ex/v", [7, "xsd/integer"]),
        ],
    )
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?s WHERE { ?s ex:v ?v . FILTER(?v + 1 > 0) }"
    )
    assert {b["s"].v.rsplit("/", 1)[-1] for b in rows} == {"b"}
    # aggregation over the same column survives the scan, and per
    # §18.5.1.5 (Sum = fold of op:numeric-add) ONE error element makes
    # the whole group's SUM an error -> unbound (Jena agrees); COUNT(?v)
    # still counts the bound terms
    rows = kb.sparql_query(
        PREFIXES + "SELECT (SUM(?v) AS ?t) (COUNT(?v) AS ?c) WHERE { ?s ex:v ?v }"
    )
    assert rows[0].get("t") is None
    assert rows[0]["c"].v == "2"


def test_str_of_numeric_result_is_canonical(kb):
    load_fixture(kb, [("ex/a", "ex/v", [4, "xsd/integer"]), ("ex/z", "ex/w", 0.0)])
    rows = kb.sparql_query(
        PREFIXES
        + "SELECT ?s1 ?s2 WHERE { ?s ex:v ?v . ?z ex:w ?zz . "
        "BIND(STR(?v + 1) AS ?s1) BIND(STR(10 / ?zz) AS ?s2) }"
    )
    assert rows[0]["s1"].v == "5"
    assert rows[0]["s2"].v == "INF"


# ---- ANSI-mode matrix (round-5 task #5): identical answers either way


ANSI_MATRIX_QUERIES = [
    "SELECT ?s WHERE { ?s ex:v ?v . FILTER(10 / ?v > 0) }",
    "SELECT ?s ?d WHERE { ?s ex:v ?v . BIND(10 / ?v AS ?d) }",
    'SELECT ?s ?d WHERE { ?s ex:v ?v . BIND(COALESCE(10 / ?v, "x") AS ?d) }',
    "SELECT ?s WHERE { ?s ex:v ?v . FILTER(?v * ?v >= ?v + ?v) }",
    "SELECT (SUM(?v) AS ?t) (AVG(?v) AS ?m) WHERE { ?s ex:v ?v }",
    "SELECT ?s (xsd:double(?v) AS ?d) WHERE { ?s ex:v ?v }",
]


def test_ansi_matrix_identical_results(kb, spark):
    load_fixture(kb, DIV_FIXTURE + [("ex/d", "ex/v", 2.5)])
    prev = spark.conf.get("spark.sql.ansi.enabled")
    results = {}
    try:
        for mode in ("true", "false"):
            spark.conf.set("spark.sql.ansi.enabled", mode)
            results[mode] = [
                sorted(
                    tuple(sorted((k, v.kind, v.v, v.lang, v.dt)
                                 for k, v in row.items()))
                    for row in kb.sparql_query(PREFIXES + q)
                )
                for q in ANSI_MATRIX_QUERIES
            ]
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert results["true"] == results["false"]


# ---- hypothesis: random arithmetic over adversarial operands never throws


def test_random_arithmetic_never_throws(kb):
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    load_fixture(
        kb,
        [
            ("ex/a", "ex/v", [0, "xsd/integer"]),
            ("ex/b", "ex/v", [1, "xsd/integer"]),
            ("ex/c", "ex/v", ["9" * 29, "xsd/integer"]),
            ("ex/d", "ex/v", ["-" + "9" * 29 + ".5", "xsd/decimal"]),
            ("ex/e", "ex/v", 0.0),
            ("ex/f", "ex/v", ["INF", "xsd/double"]),
            ("ex/g", "ex/v", ["NaN", "xsd/double"]),
            ("ex/h", "ex/v", ["junk", "xsd/integer"]),
            ("ex/i", "ex/v", "a plain string"),
        ],
    )

    leaves = st.sampled_from(
        ["?/v", 0, 1, -1, 7, 0.0, 2.5, ["0.1", "xsd/decimal"]]
    )

    def exprs(children):
        return st.tuples(
            st.sampled_from(["+", "-", "*", "/"]), children, children
        ).map(tuple)

    tree = st.recursive(leaves, exprs, max_leaves=8)

    @given(e=tree)
    @settings(
        max_examples=25,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(e):
        if not isinstance(e, tuple):
            e = ("+", e, 0)
        # neither form may raise — errors must be per-row NULLs
        kb.query([("?/s", "ex/v", "?/v"), (":bind", e, "?/r")])
        kb.query([("?/s", "ex/v", "?/v"), (">", e, 0)])

    run()


# ---- XPath constructor casts (§17.5, grammar [128] iriOrFunction)


def test_cast_integer_from_string_and_double(kb):
    load_fixture(
        kb,
        [
            ("ex/a", "ex/v", "42"),
            ("ex/b", "ex/v", "2.5"),
            ("ex/c", "ex/v", ["-3.7", "xsd/double"]),
            ("ex/d", "ex/v", [True, "xsd/boolean"]),
        ],
    )
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?s (xsd:integer(?v) AS ?i) WHERE { ?s ex:v ?v }"
    )
    by_s = {b["s"].v.rsplit("/", 1)[-1]: b.get("i") for b in rows}
    assert (by_s["a"].v, by_s["a"].dt) == ("42", XSD + "integer")
    assert by_s["b"] is None  # "2.5" is not an integer lexical form
    assert by_s["c"].v == "-3"  # numeric -> integer truncates toward zero
    assert by_s["d"].v == "1"  # boolean -> 1/0


def test_cast_decimal_float_double(kb):
    load_fixture(kb, [("ex/a", "ex/v", "2.5"), ("ex/b", "ex/v", "2.5e1")])
    rows = kb.sparql_query(
        PREFIXES
        + "SELECT ?s (xsd:decimal(?v) AS ?d) (xsd:double(?v) AS ?f) "
        "WHERE { ?s ex:v ?v }"
    )
    by_s = {b["s"].v.rsplit("/", 1)[-1]: b for b in rows}
    assert (by_s["a"]["d"].v, by_s["a"]["d"].dt) == ("2.5", XSD + "decimal")
    assert by_s["b"].get("d") is None  # exponent form is not a decimal lexical
    assert (by_s["b"]["f"].v, by_s["b"]["f"].dt) == ("25", XSD + "double")
    # float target mints xsd:float
    rows = kb.sparql_query(
        PREFIXES + "SELECT (xsd:float(\"1.5\") AS ?f) WHERE { ?s ex:v ?v } LIMIT 1"
    )
    assert (rows[0]["f"].v, rows[0]["f"].dt) == ("1.5", XSD + "float")


def test_cast_double_inf_nan_lexicals(kb):
    load_fixture(kb, [("ex/a", "ex/v", "INF")])
    rows = kb.sparql_query(
        PREFIXES + "SELECT (xsd:double(?v) AS ?d) WHERE { ?s ex:v ?v }"
    )
    assert (rows[0]["d"].v, rows[0]["d"].dt) == ("INF", XSD + "double")


def test_cast_boolean(kb):
    load_fixture(
        kb,
        [
            ("ex/a", "ex/v", "true"),
            ("ex/b", "ex/v", "0"),
            ("ex/c", "ex/v", "maybe"),
            ("ex/d", "ex/v", [0, "xsd/integer"]),
            ("ex/e", "ex/v", ["3.5", "xsd/decimal"]),
        ],
    )
    rows = kb.sparql_query(
        PREFIXES + "SELECT ?s (xsd:boolean(?v) AS ?b) WHERE { ?s ex:v ?v }"
    )
    by_s = {b["s"].v.rsplit("/", 1)[-1]: b.get("b") for b in rows}
    assert by_s["a"].v == "true"
    assert by_s["b"].v == "false"
    assert by_s["c"] is None  # not a boolean lexical -> error -> unbound
    assert by_s["d"].v == "false"  # numeric 0 -> false
    assert by_s["e"].v == "true"  # nonzero numeric -> true
    assert all(t.dt == XSD + "boolean" for t in by_s.values() if t is not None)
    # usable directly as a FILTER condition
    assert kb.sparql_ask(PREFIXES + 'ASK { ?s ex:v ?v . FILTER(xsd:boolean("1")) }')


def test_cast_string_and_datetime(kb):
    load_fixture(kb, [("ex/a", "ex/when", "2024-03-01T12:30:00Z"),
                      ("ex/a", "ex/bad", "not a date")])
    rows = kb.sparql_query(
        PREFIXES
        + "SELECT (xsd:dateTime(?w) AS ?dt) (xsd:string(?s) AS ?str) "
        "(xsd:dateTime(?b) AS ?nope) WHERE { ?s ex:when ?w . ?s ex:bad ?b }"
    )
    b = rows[0]
    assert (b["dt"].v, b["dt"].dt) == ("2024-03-01T12:30:00Z", XSD + "dateTime")
    # xsd:string of an IRI is legal and yields the IRI string
    assert b["str"].v.endswith("/a") and b["str"].dt == XSD + "string"
    assert b.get("nope") is None
    # YEAR() composes over the cast result
    rows = kb.sparql_query(
        PREFIXES
        + "SELECT (YEAR(xsd:dateTime(?w)) AS ?y) WHERE { ?s ex:when ?w }"
    )
    assert rows[0]["y"].v == "2024"


def test_cast_inside_concat_and_filter(kb):
    load_fixture(kb, TEST_TRIPLES_NUMBERS)
    rows = kb.sparql_query(
        PREFIXES
        + 'SELECT ?lab WHERE { ?x foaf:age ?a . FILTER(xsd:integer(?a) = 40) '
        'BIND(CONCAT("age=", xsd:string(?a)) AS ?lab) }'
    )
    assert {b["lab"].v for b in rows} == {"age=40"}


def test_cast_unknown_type_raises_parse_error(kb):
    with pytest.raises(ValueError, match="constructor"):
        kb.sparql_query(
            PREFIXES + "SELECT (xsd:gYear(?v) AS ?y) WHERE { ?s ex:v ?v }"
        )


def test_cast_emitter_round_trip(kb):
    from kr_spark.plans.sparql_emit import _emit_filter_expr
    from kr_spark.plans.sparql_parser import _Parser

    expr = (":xsd-cast", "integer", ("+", "?/x", 1))
    text = _emit_filter_expr(kb, expr)
    assert text.startswith("<http://www.w3.org/2001/XMLSchema#integer>(")
    p = _Parser(kb, f"FILTER({text})")
    p.eat("filter")
    back = p.filter_expr()
    # parse(emit(x)) is semantically x: the cast node survives intact and
    # a re-emit is a fixpoint (int literals come back typed-boxed, which
    # emits to the same "1"^^xsd:integer wire form)
    assert back[0] == ":xsd-cast" and back[1] == "integer"
    assert _emit_filter_expr(kb, back) == text


def test_cast_full_iri_form_parses(kb):
    load_fixture(kb, [("ex/a", "ex/v", "7")])
    rows = kb.sparql_query(
        PREFIXES
        + "SELECT (<http://www.w3.org/2001/XMLSchema#integer>(?v) AS ?i) "
        "WHERE { ?s ex:v ?v }"
    )
    assert rows[0]["i"].v == "7"


# ---- random expression trees vs a direct XPath-semantics model (round 5)


def test_random_expressions_match_xpath_model(kb):
    """Random comparison-over-arithmetic trees evaluated both by the
    engine and by a direct Python model of XPath numeric semantics
    (integer/decimal exact with division-by-zero = error, double-ranked
    in IEEE space with INF/NaN, NaN != everything, error rows dropped).
    180 random trees agreed at pin time; 20 fixed seeds replay."""
    import random as _random
    from decimal import Decimal

    DATA = [
        ("s0", 0, 0), ("s1", 1, 0), ("s2", -3, 0), ("s3", 7, 0),
        ("s4", Decimal("2.5"), 1), ("s5", Decimal("-0.5"), 1),
        ("s6", 2.0, 3), ("s7", 0.0, 3), ("s8", float("inf"), 3),
    ]
    CONSTS = [(0, 0), (1, 0), (2, 0), (-1, 0),
              (Decimal("0.5"), 1), (2.0, 3), (0.0, 3)]

    def gen(rng, depth=0):
        if depth >= 3 or rng.random() < 0.35:
            return "?/v" if rng.random() < 0.5 else rng.choice(CONSTS)
        return (rng.choice("+-*/"), gen(rng, depth + 1), gen(rng, depth + 1))

    def to_pat(e):
        if e == "?/v":
            return e
        if isinstance(e, tuple) and isinstance(e[0], str) and e[0] in "+-*/":
            return (e[0], to_pat(e[1]), to_pat(e[2]))
        v, rank = e
        return int(v) if rank == 0 else (
            [str(v), "xsd/decimal"] if rank == 1 else float(v))

    def ev(e, vv, vrank):
        if e == "?/v":
            return (vv, vrank)
        if isinstance(e, tuple) and isinstance(e[0], str) and e[0] in "+-*/":
            a, b = ev(e[1], vv, vrank), ev(e[2], vv, vrank)
            if a is None or b is None:
                return None
            (av, ar), (bv, br) = a, b
            rank = max(ar, br)
            if rank >= 2:
                av, bv = float(av), float(bv)
                if e[0] == "+": return (av + bv, 3)
                if e[0] == "-": return (av - bv, 3)
                if e[0] == "*": return (av * bv, 3)
                if bv == 0:
                    return (float("nan") if av == 0
                            else float("inf") if av > 0 else float("-inf"), 3)
                return (av / bv, 3)
            av, bv = Decimal(av), Decimal(bv)
            if e[0] == "+": return (av + bv, rank)
            if e[0] == "-": return (av - bv, rank)
            if e[0] == "*": return (av * bv, rank)
            if bv == 0:
                return None  # exact-space division by zero = error
            return (av / bv, max(rank, 1))
        return e

    def cmp_(op, a, b):
        if a is None or b is None:
            return None
        av, bv = a[0], b[0]
        if max(a[1], b[1]) >= 2:
            import math
            av, bv = float(av), float(bv)
            if math.isnan(av) or math.isnan(bv):
                return op == "!="
        else:
            av, bv = Decimal(av), Decimal(bv)
        return {"<": av < bv, ">": av > bv,
                "=": av == bv, "!=": av != bv}[op]

    stmts = []
    for sid, v, rank in DATA:
        if rank == 0:
            stmts.append((f"ex/{sid}", "ex/v", int(v)))
        elif rank == 1:
            stmts.append((f"ex/{sid}", "ex/v", [str(v), "xsd/decimal"]))
        else:
            lex = "INF" if v == float("inf") else repr(float(v))
            stmts.append((f"ex/{sid}", "ex/v", [lex, "xsd/double"]))
    load_fixture(kb, stmts)

    for seed in range(7000, 7020):
        rng = _random.Random(seed)
        le, re_ = gen(rng), gen(rng)
        op = rng.choice(["<", ">", "=", "!="])
        rows = kb.query([("?/s", "ex/v", "?/v"), (op, to_pat(le), to_pat(re_))])
        got = sorted(b["s"].v.rsplit("/", 1)[-1] for b in rows)
        want = sorted(sid for sid, v, rank in DATA
                      if cmp_(op, ev(le, v, rank), ev(re_, v, rank)) is True)
        assert got == want, (seed, op, le, re_, got, want)
